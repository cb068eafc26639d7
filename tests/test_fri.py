"""FRI PCS tests: commit/open/verify roundtrip, uni-stark e2e over FRI,
negative tampering tests (reference parity: `kzg/src/tests.rs` roundtrip
style + `uni-stark/tests/fib_air.rs` over the real PCS)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_eon_tpu.challenger import DuplexChallenger
from plonky3_eon_tpu.commit import MerkleTreeMmcs, TwoAdicMultiplicativeCoset
from plonky3_eon_tpu.fields import BabyBear, BabyBear4
from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_eon_tpu.stark import StarkConfig, VerificationError, prove, verify

F, EF = BabyBear, BabyBear4


def make_pcs(num_queries=6, pow_bits=2, log_final_poly_len=0):
    p2 = Poseidon2(F, 16)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    compressor = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    return TwoAdicFriPcs(
        F, EF, mmcs, mmcs, FriConfig(log_blowup=1, num_queries=num_queries,
                                     proof_of_work_bits=pow_bits,
                                     log_final_poly_len=log_final_poly_len)
    )


def make_config(**kw):
    p2 = Poseidon2(F, 16)
    return StarkConfig(
        F=F, EF=EF, pcs=make_pcs(**kw),
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )


def test_pcs_commit_open_verify_roundtrip():
    pcs = make_pcs()
    rng = np.random.default_rng(0)
    n = 16
    domain = pcs.natural_domain_for_degree(n)
    evals = F.from_int(rng.integers(0, F.order, size=(n, 3), dtype=np.uint64))
    com, pd = pcs.commit([(domain, evals)])

    p2 = Poseidon2(F, 16)
    ch = DuplexChallenger(F, p2, 16, 8)
    zeta = ch.sample_ext(EF)
    opened, proof = pcs.open([(pd, [[zeta]])], ch)

    ch2 = DuplexChallenger(F, p2, 16, 8)
    zeta2 = ch2.sample_ext(EF)
    rounds = [(com, [(domain, [(zeta2, opened[0][0][0])])])]
    pcs.verify(rounds, proof, ch2)


def test_pcs_verify_rejects_wrong_value():
    pcs = make_pcs()
    rng = np.random.default_rng(1)
    n = 16
    domain = pcs.natural_domain_for_degree(n)
    evals = F.from_int(rng.integers(0, F.order, size=(n, 2), dtype=np.uint64))
    com, pd = pcs.commit([(domain, evals)])
    p2 = Poseidon2(F, 16)
    ch = DuplexChallenger(F, p2, 16, 8)
    zeta = ch.sample_ext(EF)
    opened, proof = pcs.open([(pd, [[zeta]])], ch)
    bad = np.asarray(opened[0][0][0]).copy()
    bad[0, 0] ^= 1
    ch2 = DuplexChallenger(F, p2, 16, 8)
    zeta2 = ch2.sample_ext(EF)
    with pytest.raises(ValueError):
        pcs.verify([(com, [(domain, [(zeta2, jnp.asarray(bad))])])], proof, ch2)


def test_uni_stark_over_fri():
    config = make_config()
    trace, x = generate_fibonacci_trace(F, 16)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    verify(config, FibonacciAir(), proof, [0, 1, x])


def test_uni_stark_over_fri_rejects_bad_public():
    config = make_config()
    trace, x = generate_fibonacci_trace(F, 16)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    with pytest.raises((VerificationError, ValueError)):
        verify(config, FibonacciAir(), proof, [0, 1, (x + 1) % F.order])


def test_uni_stark_over_fri_rejects_tampered_commitment():
    config = make_config()
    trace, x = generate_fibonacci_trace(F, 16)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    tampered = np.asarray(proof.commitments.trace).copy()
    tampered[0] ^= 1
    proof.commitments.trace = tampered
    with pytest.raises((VerificationError, ValueError)):
        verify(config, FibonacciAir(), proof, [0, 1, x])


def test_fri_with_final_poly_len():
    """log_final_poly_len > 0: fewer fold rounds, final coefficients
    evaluated at query points (tail rounds are pure latency on TPU)."""
    from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace

    air = FibonacciAir()
    trace, x = generate_fibonacci_trace(F, 32)
    pvs = [0, 1, x]
    config = make_config(num_queries=4, pow_bits=1, log_final_poly_len=3)
    proof = prove(config, air, trace, pvs)
    verify(config, air, proof, pvs)
    # tampered final poly rejected
    bad = np.array(proof.opening_proof.final_poly)
    bad[1][0] = (int(bad[1][0]) + 1) % F.order
    proof.opening_proof.final_poly = bad
    with pytest.raises((ValueError,)):
        verify(config, air, proof, pvs)
