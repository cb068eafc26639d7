"""End-to-end uni-stark tests over the TrivialPcs (no crypto) — the
'minimum slice' milestone of SURVEY.md §7.6; mirrors
`uni-stark/tests/fib_air.rs` (prove+verify, 1-row edge case, negative
wrong-public-value test)."""

import numpy as np
import pytest

from plonky3_eon_tpu.challenger import DuplexChallenger
from plonky3_eon_tpu.commit import TrivialPcs
from plonky3_eon_tpu.fields import BabyBear, BabyBear4
from plonky3_eon_tpu.hashes import Poseidon2
from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_eon_tpu.stark import StarkConfig, VerificationError, check_constraints, prove, verify


def make_config():
    F, EF = BabyBear, BabyBear4
    p2 = Poseidon2(F, 16)
    return StarkConfig(
        F=F,
        EF=EF,
        pcs=TrivialPcs(F, EF),
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )


def test_debug_checker_accepts_valid_trace():
    F = BabyBear
    trace, x = generate_fibonacci_trace(F, 8)
    check_constraints(FibonacciAir(), F, BabyBear4, trace, [0, 1, x])


def test_debug_checker_rejects_bad_trace():
    F = BabyBear
    trace, x = generate_fibonacci_trace(F, 8)
    bad = trace.at[3, 0].set(12345)
    with pytest.raises(AssertionError):
        check_constraints(FibonacciAir(), F, BabyBear4, bad, [0, 1, x])


def test_prove_verify_fibonacci():
    config = make_config()
    trace, x = generate_fibonacci_trace(BabyBear, 16)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x], check_witness=True)
    verify(config, FibonacciAir(), proof, [0, 1, x])


def test_fold_program_reused_across_public_values():
    """Public values are traced arguments, not baked constants: proving
    the same AIR with different publics must NOT recompile the quotient
    fold program (VERDICT r3 weak-5)."""
    from plonky3_eon_tpu.stark import prover as prover_mod

    config = make_config()
    air = FibonacciAir()
    trace, x = generate_fibonacci_trace(BabyBear, 16)
    proof = prove(config, air, trace, [0, 1, x])
    n_compiled = len(prover_mod._FOLD_CACHE)
    # a fresh trace with different public values (fib from [1, 1])
    trace2, y = generate_fibonacci_trace(BabyBear, 16, a=1, b=1)
    proof2 = prove(config, air, trace2, [1, 1, y])
    assert len(prover_mod._FOLD_CACHE) == n_compiled, (
        "fold program recompiled when only public values changed"
    )
    verify(config, air, proof2, [1, 1, y])


def test_verify_rejects_wrong_public_value():
    config = make_config()
    trace, x = generate_fibonacci_trace(BabyBear, 16)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    with pytest.raises((VerificationError, ValueError)):
        verify(config, FibonacciAir(), proof, [0, 1, (x + 1) % BabyBear.order])


def test_verify_rejects_tampered_opening():
    config = make_config()
    trace, x = generate_fibonacci_trace(BabyBear, 16)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    proof.opened_values.trace_local = proof.opened_values.trace_local.copy()
    proof.opened_values.trace_local[0, 0] ^= 1
    with pytest.raises((VerificationError, ValueError)):
        verify(config, FibonacciAir(), proof, [0, 1, x])


def test_proof_serde_roundtrip():
    """Serialize -> deserialize -> verify (ref: postcard/bincode round-trips
    in `uni-stark` tests; `report_proof_size`, examples/src/proofs.rs:248)."""
    from tests.test_fri import make_config

    from plonky3_eon_tpu.stark.serde import (
        deserialize_proof,
        report_proof_size,
        serialize_proof,
    )

    trace, x = generate_fibonacci_trace(BabyBear, 16)
    config = make_config(num_queries=4, pow_bits=1, log_final_poly_len=2)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    blob = serialize_proof(proof)
    assert report_proof_size(proof) == len(blob)
    restored = deserialize_proof(blob)
    verify(config, FibonacciAir(), restored, [0, 1, x])


def test_preprocessed_trace_roundtrip():
    """setup_preprocessed once, prove/verify with a preprocessed selector
    column (ref: `uni-stark/src/preprocessed.rs:12-47`)."""
    import jax.numpy as jnp

    from tests.test_fri import make_config

    from plonky3_eon_tpu.air import BaseAir
    from plonky3_eon_tpu.stark.preprocessed import (
        prove_with_preprocessed,
        setup_preprocessed,
        verify_with_preprocessed,
    )

    F = BabyBear
    n = 16

    class MaskedAir(BaseAir):
        """main[0] must be zero wherever the preprocessed mask is 1."""

        width = 1

        def preprocessed_trace(self):
            mask = np.zeros(n, dtype=np.uint64)
            mask[::2] = 1
            return F.from_int(mask.reshape(n, 1))

        def eval(self, b):
            b.assert_zero(b.preprocessed.local[0] * b.main.local[0])

    air = MaskedAir()
    vals = np.arange(n, dtype=np.uint64)
    vals[::2] = 0  # satisfy the mask
    trace = F.from_int(vals.reshape(n, 1))
    config = make_config(num_queries=4, pow_bits=1)
    pd, vk = setup_preprocessed(config, air)
    proof = prove_with_preprocessed(config, air, trace, [], pd, check_witness=True)
    verify_with_preprocessed(config, air, proof, [], vk)

    # violating the mask must fail the debug checker
    bad = F.from_int(np.arange(1, n + 1, dtype=np.uint64).reshape(n, 1))
    with pytest.raises(AssertionError):
        prove_with_preprocessed(config, air, bad, [], pd, check_witness=True)

    # tampered preprocessed opening must fail PCS verification
    t = np.array(proof.opened_values.preprocessed_local)
    t[0, 0] = (int(t[0, 0]) + 1) % F.order
    proof.opened_values.preprocessed_local = t
    with pytest.raises((VerificationError, ValueError)):
        verify_with_preprocessed(config, air, proof, [], vk)


def test_virtual_pair_col_and_sub_builder():
    """VirtualPairCol affine combinations + SubAirBuilder column windows
    (ref: air/src/virtual_column.rs:14, uni-stark/src/sub_builder.rs:21)."""
    from plonky3_eon_tpu.air import BaseAir
    from plonky3_eon_tpu.air.virtual_column import SubAirBuilder, VirtualPairCol

    F, EF = BabyBear, BabyBear4

    class InnerAir(BaseAir):
        width = 2

        def eval(self, b):
            # within the window: col1 == 2 * col0
            b.assert_eq(b.main.local[1], b.main.local[0] * 2)

    class OuterAir(BaseAir):
        width = 4

        def eval(self, b):
            InnerAir().eval(SubAirBuilder(b, 1, 2))  # window = cols 1..3
            vc = VirtualPairCol([(VirtualPairCol.single_main(0).column_weights[0][0], 3)], 5)
            # col3 == 3*col0 + 5
            b.assert_eq(b.main.local[3], vc.apply(b))

    n = 8
    rng = np.random.default_rng(0)
    c0 = rng.integers(0, 1000, size=n, dtype=np.uint64)
    c1 = rng.integers(0, 1000, size=n, dtype=np.uint64)
    c2 = (2 * c1) % BabyBear.order
    c3 = (3 * c0 + 5) % BabyBear.order
    trace = BabyBear.from_int(np.stack([c0, c1, c2, c3], axis=1))
    check_constraints(OuterAir(), F, EF, trace, [])
    bad = trace.at[2, 2].set(BabyBear.from_int(7))
    with pytest.raises(AssertionError):
        check_constraints(OuterAir(), F, EF, bad, [])
