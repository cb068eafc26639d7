"""Keccak AIR tests: witness validity (debug checker over whole tensor
blocks), differential check of the witness's final state against the
independent keccak_f implementation, tamper rejection, and e2e prove+verify
(2633-column trace — the wide-trace stress test, SURVEY.md §2.7)."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import KoalaBear, KoalaBear4
from plonky3_eon_tpu.models.keccak_air import (
    NUM_KECCAK_COLS,
    NUM_ROUNDS,
    OFF_A_PRIME_PRIME,
    OFF_APPP_00_LIMBS,
    KeccakAir,
)
from plonky3_eon_tpu.stark import check_constraints, prove, verify

import pytest as _pytest

pytestmark = _pytest.mark.slow  # compile-heavy: fast tier skips (conftest)

F, EF = KoalaBear, KoalaBear4


def _final_state_from_trace(trace_np, perm_idx):
    """Recover the A''' output of the last round of permutation perm_idx."""
    row = trace_np[perm_idx * NUM_ROUNDS + NUM_ROUNDS - 1]
    limbs = F.to_ints(row[OFF_A_PRIME_PRIME : OFF_A_PRIME_PRIME + 100]).reshape(5, 5, 4)
    limbs[0, 0] = F.to_ints(row[OFF_APPP_00_LIMBS : OFF_APPP_00_LIMBS + 4])
    lanes = np.zeros((5, 5), dtype=np.uint64)
    for limb in range(4):
        lanes |= limbs[:, :, limb].astype(np.uint64) << np.uint64(16 * limb)
    # lanes[y][x] -> flat lane order i = x + 5y
    return lanes.reshape(25)


def test_witness_satisfies_constraints_and_matches_keccak_f():
    air = KeccakAir()
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 1 << 64, size=(2, 25), dtype=np.uint64)
    trace = air.generate_trace(F, inputs)
    assert trace.shape == (64, NUM_KECCAK_COLS)
    check_constraints(air, F, EF, trace, [])

    # differential: last-round output == keccak_f (independent u32-pair impl)
    import jax.numpy as jnp

    from plonky3_eon_tpu.hashes.keccak import keccak_f

    state = np.stack(
        [(inputs & 0xFFFFFFFF).astype(np.uint32), (inputs >> 32).astype(np.uint32)],
        axis=-1,
    )
    out = np.asarray(keccak_f(jnp.asarray(state)))
    expected = out[..., 0].astype(np.uint64) | (out[..., 1].astype(np.uint64) << 32)
    trace_np = np.asarray(trace)
    for i in range(2):
        got = _final_state_from_trace(trace_np, i)
        assert np.array_equal(got, expected[i]), f"perm {i} mismatch"


def test_debug_checker_rejects_tampered_bit():
    air = KeccakAir()
    rng = np.random.default_rng(1)
    inputs = rng.integers(0, 1 << 64, size=(1, 25), dtype=np.uint64)
    trace = air.generate_trace(F, inputs)
    bad = trace.at[5, 900].set(F.from_int(2))  # non-boolean A' bit
    with pytest.raises(AssertionError):
        check_constraints(air, F, EF, bad, [])


def make_koalabear_config(num_queries=2, pow_bits=1):
    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.commit.merkle import ExtensionMmcs, MerkleTreeMmcs
    from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
    from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
    from plonky3_eon_tpu.stark import StarkConfig

    p2 = Poseidon2(F, 16)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    comp = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, comp)
    pcs = TwoAdicFriPcs(
        F, EF, mmcs, ExtensionMmcs(mmcs, EF.D), FriConfig(1, num_queries, pow_bits)
    )
    return StarkConfig(
        F=F, EF=EF, pcs=pcs, challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8)
    )


def test_prove_verify_keccak():
    air = KeccakAir()
    rng = np.random.default_rng(2)
    inputs = rng.integers(0, 1 << 64, size=(2, 25), dtype=np.uint64)
    trace = air.generate_trace(F, inputs)
    config = make_koalabear_config()
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
