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


# ---- interpolation / eq-batch / MDS / classic Poseidon / dummies -----------


def test_interpolate_coset_matches_direct_eval():
    from plonky3_eon_tpu.fields import BabyBear as F, BabyBear4 as EF
    from plonky3_eon_tpu.ops.dft import Radix2Dit, np_powers
    from plonky3_eon_tpu.ops.interpolation import interpolate_coset

    rng = np.random.default_rng(0)
    n, w = 16, 3
    coeffs = F.from_int(rng.integers(0, F.order, size=(n, w), dtype=np.uint64))
    dft = Radix2Dit(F)
    shift = int(F.generator_int)
    evals = dft.coset_dft_batch(coeffs, F.from_int(np_powers(shift, n, F.order)))
    zeta = EF.from_int(np.array([5, 6, 7, 8], dtype=np.uint64))
    got = interpolate_coset(F, EF, evals, zeta, shift)
    # direct: sum coeffs * zeta^i
    from plonky3_eon_tpu.commit.pcs import eval_coeffs_at_ext_point

    exp = eval_coeffs_at_ext_point(F, EF, coeffs, zeta)
    assert np.array_equal(np.asarray(got), np.asarray(exp))


def test_eval_eq_batch():
    from plonky3_eon_tpu.fields import BabyBear as F, BabyBear4 as EF
    from plonky3_eon_tpu.ops.eq_batch import eval_eq_batch

    rng = np.random.default_rng(1)
    m, k = 2, 3
    zs_int = rng.integers(0, F.order, size=(m, k, 4), dtype=np.uint64)
    gam_int = rng.integers(0, F.order, size=(m, 4), dtype=np.uint64)
    zs, gammas = EF.from_int(zs_int), EF.from_int(gam_int)
    table = np.asarray(EF.to_ints(eval_eq_batch(EF, zs, gammas)), dtype=object)

    # host reference over the boolean cube (EF arithmetic via ints)
    p = F.order
    W = EF.W_int

    def emul(a, b):
        out = [0] * 4
        for i in range(4):
            for j in range(4):
                k2 = (i + j) % 4
                t = a[i] * b[j] % p
                if i + j >= 4:
                    t = t * W % p
                out[k2] = (out[k2] + t) % p
        return out

    for x in range(1 << k):
        acc = [0, 0, 0, 0]
        for i in range(m):
            term = [int(g) for g in gam_int[i]]
            for j in range(k):
                zj = [int(v) for v in zs_int[i, j]]
                if (x >> j) & 1:
                    term = emul(term, zj)
                else:
                    one_minus = [(1 - zj[0]) % p] + [(-v) % p for v in zj[1:]]
                    term = emul(term, one_minus)
            acc = [(a + t) % p for a, t in zip(acc, term)]
        assert [int(v) for v in table[x]] == acc, f"x={x}"


def test_coset_mds_and_classic_poseidon():
    import jax.numpy as jnp
    from plonky3_eon_tpu.fields import BabyBear as F
    from plonky3_eon_tpu.hashes.mds import CosetMds, Poseidon

    rng = np.random.default_rng(2)
    mds = CosetMds(F, 8)
    x = F.from_int(rng.integers(0, F.order, size=(4, 8), dtype=np.uint64))
    y = mds.permute(x)
    # MDS = N * evals of f on gH where x = evals of f on H
    from plonky3_eon_tpu.ops.dft import Radix2Dit, np_powers

    dft = Radix2Dit(F)
    cf = dft.idft_batch(jnp.swapaxes(x, 0, 1))
    exp = dft.coset_dft_batch(cf, F.from_int(np_powers(F.generator_int, 8, F.order)))
    exp = F.mul(exp, jnp.broadcast_to(F.from_int(8), exp.shape))
    assert np.array_equal(np.asarray(y), np.asarray(jnp.swapaxes(exp, 0, 1)))
    # linearity (the MDS map is linear)
    a = F.from_int(rng.integers(0, F.order, size=(1, 8), dtype=np.uint64))
    b = F.from_int(rng.integers(0, F.order, size=(1, 8), dtype=np.uint64))
    assert np.array_equal(
        np.asarray(mds.permute(F.add(a, b))),
        np.asarray(F.add(mds.permute(a), mds.permute(b))),
    )
    # classic poseidon: deterministic + injective-looking on a sample
    p = Poseidon(F, 8, mds=mds, half_num_full_rounds=2, num_partial_rounds=4)
    o1 = p.permute(a)
    o2 = p.permute(a)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.array_equal(np.asarray(p.permute(b)), np.asarray(o1))


def test_dummy_pcs_roundtrip():
    from plonky3_eon_tpu.fields import BabyBear as F, BabyBear4 as EF
    from plonky3_eon_tpu.commit.pcs import DummyPcs

    rng = np.random.default_rng(3)
    pcs = DummyPcs(F, EF)
    domain = pcs.natural_domain_for_degree(8)
    ev = F.from_int(rng.integers(0, F.order, size=(8, 2), dtype=np.uint64))
    com, pd = pcs.commit([(domain, ev)])
    zeta = EF.from_int(np.array([1, 2, 3, 4], dtype=np.uint64))
    opened, _ = pcs.open([(pd, [[zeta]])], None)
    pcs.verify([(com, [(domain, [(zeta, opened[0][0][0])])])], None, None)
    bad = np.array(np.asarray(opened[0][0][0]))
    bad[0, 0] += 1
    import pytest

    with pytest.raises(ValueError):
        pcs.verify([(com, [(domain, [(zeta, bad)])])], None, None)
