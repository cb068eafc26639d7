"""DFT differential tests: fast radix-2 vs naive Vandermonde, round-trips,
coset-LDE degree checks (reference parity: the cross-checks upstream field
crates ran against NaiveDft — SURVEY.md §4)."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import BabyBear, KoalaBear
from plonky3_eon_tpu.ops import NaiveDft, Radix2Dit, np_powers

FIELDS = [BabyBear, KoalaBear]


def poly_eval_host(F, coeffs_ints, x_int):
    """Horner evaluation with Python ints."""
    acc = 0
    for c in reversed(coeffs_ints):
        acc = (acc * x_int + int(c)) % F.order
    return acc


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("log_n", [0, 1, 3, 6])
def test_dft_vs_naive(F, log_n):
    rng = np.random.default_rng(10)
    n, w = 1 << log_n, 3
    mat_ints = rng.integers(0, F.order, size=(n, w), dtype=np.uint64)
    mat = F.from_int(mat_ints)
    fast = Radix2Dit(F).dft_batch(mat)
    naive = NaiveDft(F).dft_batch(mat)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(naive))


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_dft_matches_host_eval(F):
    """DFT output i must equal poly(g^i) for the two-adic generator g."""
    rng = np.random.default_rng(11)
    n = 8
    mat_ints = rng.integers(0, F.order, size=(n, 2), dtype=np.uint64)
    out = F.to_ints(Radix2Dit(F).dft_batch(F.from_int(mat_ints)))
    g = F.two_adic_generator_int(3)
    for i in range(n):
        for c in range(2):
            assert int(out[i, c]) == poly_eval_host(F, mat_ints[:, c], pow(g, i, F.order))


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("log_n", [1, 4, 8])
def test_idft_roundtrip(F, log_n):
    rng = np.random.default_rng(12)
    n, w = 1 << log_n, 5
    mat = F.from_int(rng.integers(0, F.order, size=(n, w), dtype=np.uint64))
    dft = Radix2Dit(F)
    np.testing.assert_array_equal(np.asarray(dft.idft_batch(dft.dft_batch(mat))), np.asarray(mat))


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_coset_dft(F):
    """coset_dft evaluates at shift*g^i."""
    rng = np.random.default_rng(13)
    n = 8
    shift = F.generator_int
    mat_ints = rng.integers(0, F.order, size=(n, 1), dtype=np.uint64)
    dft = Radix2Dit(F)
    spows = dft.shift_powers(shift, n)
    out = F.to_ints(dft.coset_dft_batch(F.from_int(mat_ints), spows))
    g = F.two_adic_generator_int(3)
    for i in range(n):
        x = (shift * pow(g, i, F.order)) % F.order
        assert int(out[i, 0]) == poly_eval_host(F, mat_ints[:, 0], x)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_coset_lde(F):
    """LDE of evals over H must agree with direct evaluation on shift*H'."""
    rng = np.random.default_rng(14)
    n, added = 8, 2
    big_n = n << added
    shift = F.generator_int
    coeff_ints = rng.integers(0, F.order, size=(n, 2), dtype=np.uint64)
    dft = Radix2Dit(F)
    evals = dft.dft_batch(F.from_int(coeff_ints))
    lde = F.to_ints(dft.coset_lde_batch(evals, added, shift))
    g_big = F.two_adic_generator_int(5)
    for i in range(0, big_n, 7):
        x = (shift * pow(g_big, i, F.order)) % F.order
        assert int(lde[i, 0]) == poly_eval_host(F, coeff_ints[:, 0], x)


def test_np_powers():
    p = BabyBear.order
    pw = np_powers(31, 100, p)
    for i in [0, 1, 17, 99]:
        assert int(pw[i]) == pow(31, i, p)
