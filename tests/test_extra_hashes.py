"""Rescue / Monolith permutations + the reusable testing-suite library."""

import jax.numpy as jnp
import numpy as np
import pytest

from plonky3_eon_tpu.fields import (
    BabyBear,
    BabyBear4,
    Bn254Fr,
    Goldilocks,
    KoalaBear,
    KoalaBear4,
    Mersenne31,
    Mersenne31Cubic,
)
from plonky3_eon_tpu.hashes import Monolith, Rescue, bar31
from plonky3_eon_tpu.testing import extension_suite, run_all_field_suites


def test_rescue_sbox_pair_inverse():
    """x^alpha then x^(1/alpha) is the identity — the core Rescue identity."""
    F = BabyBear
    r = Rescue(F, 4, num_rounds=2)
    rng = np.random.default_rng(0)
    x = F.from_int(rng.integers(0, F.order, size=64, dtype=np.uint64))
    y = F.exp_const(F.exp_const(x, r.alpha), r.inv_alpha)
    assert np.array_equal(np.asarray(y), np.asarray(x))


def test_rescue_permutation_injective_deterministic():
    F = KoalaBear
    r = Rescue(F, 8, num_rounds=4)
    rng = np.random.default_rng(1)
    st = F.from_int(rng.integers(0, F.order, size=(32, 8), dtype=np.uint64))
    out1 = np.asarray(r.permute(st))
    out2 = np.asarray(r.permute(st))
    assert np.array_equal(out1, out2)
    # distinct inputs -> distinct outputs (injectivity sample)
    flat = {tuple(row) for row in out1.tolist()}
    assert len(flat) == 32
    # it actually permutes (not identity)
    assert not np.array_equal(out1, np.asarray(st))


def test_monolith_bar_bijective_chunks():
    """The 8-bit and 7-bit chunk S-boxes are bijections (exhaustive)."""
    x8 = jnp.arange(256, dtype=jnp.uint32)  # low chunk isolated
    out = np.asarray(bar31(x8)) & 0xFF
    assert len(set(out.tolist())) == 256
    x7 = jnp.arange(128, dtype=jnp.uint32) << 24  # top 7-bit chunk
    out7 = (np.asarray(bar31(x7)) >> 24) & 0x7F
    assert len(set(out7.tolist())) == 128


def test_monolith_bar_fixes_zero_and_p():
    x = jnp.asarray([0, (1 << 31) - 1], dtype=jnp.uint32)
    out = np.asarray(bar31(x))
    assert out[0] == 0 and out[1] == (1 << 31) - 1


def test_monolith_permutation():
    F = Mersenne31
    m = Monolith(F, width=16)
    rng = np.random.default_rng(2)
    st = F.from_int(rng.integers(0, F.order, size=(16, 16), dtype=np.uint64))
    out1 = np.asarray(m.permute(st))
    assert np.array_equal(out1, np.asarray(m.permute(st)))
    assert (np.asarray(out1) < F.order).all()
    flat = {tuple(row) for row in out1.tolist()}
    assert len(flat) == 16
    assert not np.array_equal(out1, np.asarray(st))


@pytest.mark.parametrize("F", [BabyBear, KoalaBear, Mersenne31, Goldilocks, Bn254Fr],
                         ids=lambda f: f.name)
def test_field_suites_library(F):
    """The field-testing-style library suites pass for every field
    (ref: `field-testing/src/lib.rs:824-1117` macro suites)."""
    run_all_field_suites(F, np.random.default_rng(3))


@pytest.mark.parametrize("EF", [BabyBear4, KoalaBear4, Mersenne31Cubic],
                         ids=lambda f: f.name)
def test_extension_suites_library(EF):
    extension_suite(EF, np.random.default_rng(4))
