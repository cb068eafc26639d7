"""Poseidon2 AIR tests: witness validity, permutation consistency, e2e
prove+verify over FRI (the headline-benchmark workload, BASELINE.md)."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import BabyBear, BabyBear4, KoalaBear, KoalaBear4
from plonky3_eon_tpu.hashes import Poseidon2
from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air, VectorizedPoseidon2Air
from plonky3_eon_tpu.stark import check_constraints, prove, verify

import pytest as _pytest

pytestmark = _pytest.mark.slow  # compile-heavy: fast tier skips (conftest)


def test_trace_registers_consistent_with_permutation():
    """The last R registers of each sbox chain must reproduce the real
    permutation output when run through the linear layers — sanity-checked
    via the debug constraint checker + direct permute comparison."""
    F = BabyBear
    p2 = Poseidon2(F, 16)
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(0)
    inputs = F.from_int(rng.integers(0, F.order, size=(8, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)
    assert trace.shape == (8, air.width)
    check_constraints(air, F, BabyBear4, trace, [])


@pytest.mark.parametrize(
    "F,EF", [(BabyBear, BabyBear4), (KoalaBear, KoalaBear4)], ids=["BabyBear", "KoalaBear"]
)
def test_debug_checker_rejects_tampered_register(F, EF):
    p2 = Poseidon2(F, 16)
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(1)
    inputs = F.from_int(rng.integers(0, F.order, size=(4, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)
    bad = trace.at[2, air.width - 1].set(123)
    with pytest.raises(AssertionError):
        check_constraints(air, F, EF, bad, [])


def test_vectorized_air():
    F = BabyBear
    p2 = Poseidon2(F, 16)
    air = VectorizedPoseidon2Air(p2, 2)
    rng = np.random.default_rng(2)
    inputs = F.from_int(rng.integers(0, F.order, size=(4, 2, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)
    assert trace.shape == (4, air.width)
    check_constraints(air, F, BabyBear4, trace, [])


def test_prove_verify_poseidon2_air():
    from tests.test_fri import make_config

    F = BabyBear
    p2 = Poseidon2(F, 16)
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(3)
    inputs = F.from_int(rng.integers(0, F.order, size=(8, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)
    config = make_config(num_queries=4, pow_bits=1)
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
