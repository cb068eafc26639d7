"""Eon engine + LogUp tests (ref: `eon-uni-stark/tests/lookup_air.rs:23-136`
multiset-equality AIR with good/bad traces; `lookup/src/tests.rs:1285-1445`
global-lookup cumulative aggregation)."""

import numpy as np
import pytest

from plonky3_eon_tpu.eon import EonAir, prove, verify, verify_global_interactions
from plonky3_eon_tpu.fields import BabyBear, BabyBear4
from plonky3_eon_tpu.lookup import LOCAL, RECEIVE, SEND, LogUpGadget
from plonky3_eon_tpu.stark import VerificationError, check_constraints

F, EF = BabyBear, BabyBear4


class MultisetAir(EonAir):
    """Column 1 must be a multiset-permutation of column 0 (local lookup)."""

    width = 2

    def __init__(self):
        super().__init__()
        one = lambda b: b.constant(1)
        self.register_lookup(
            LOCAL,
            [
                ([lambda b: b.main.local[0]], one, RECEIVE),
                ([lambda b: b.main.local[1]], one, SEND),
            ],
        )

    def eval(self, builder):
        pass  # constraints come only from the lookup


class SenderAir(EonAir):
    """Sends (value, tag) tuples into a global interaction."""

    width = 2

    def __init__(self, name="bus"):
        super().__init__()
        one = lambda b: b.constant(1)
        self.register_lookup(
            name,
            [([lambda b: b.main.local[0], lambda b: b.main.local[1]], one, SEND)],
        )

    def eval(self, builder):
        pass


class ReceiverAir(EonAir):
    width = 2

    def __init__(self, name="bus"):
        super().__init__()
        one = lambda b: b.constant(1)
        self.register_lookup(
            name,
            [([lambda b: b.main.local[0], lambda b: b.main.local[1]], one, RECEIVE)],
        )

    def eval(self, builder):
        pass


def make_config():
    from tests.test_fri import make_config as mk

    return mk(num_queries=4, pow_bits=1)


def _shuffled_trace(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, F.order, size=n, dtype=np.uint64)
    b = rng.permutation(a)
    return F.from_int(np.stack([a, b], axis=1))


def test_local_lookup_prove_verify():
    air = MultisetAir()
    trace = _shuffled_trace(16, 0)
    config = make_config()
    proof = prove(config, air, trace, [], check_witness=True)
    verify(config, air, proof, [])


def test_local_lookup_bad_trace_fails_checker():
    air = MultisetAir()
    rng = np.random.default_rng(1)
    a = rng.integers(0, F.order, size=16, dtype=np.uint64)
    b = rng.permutation(a)
    b[3] = (b[3] + 1) % F.order  # not a permutation anymore
    trace = F.from_int(np.stack([a, b], axis=1))
    config = make_config()
    with pytest.raises(AssertionError):
        prove(config, air, trace, [], check_witness=True)


def test_local_lookup_tampered_proof_rejected():
    air = MultisetAir()
    trace = _shuffled_trace(16, 2)
    config = make_config()
    proof = prove(config, air, trace, [])
    t = np.array(proof.opened_values.permutation_local)
    t[0, 0] = (int(t[0, 0]) + 1) % F.order
    proof.opened_values.permutation_local = t
    with pytest.raises((VerificationError, ValueError)):
        verify(config, air, proof, [])


def test_global_interaction_roundtrip():
    """Global lookups need shared challenges: prove both AIRs in one batch
    over one transcript, then the per-interaction cumulatives sum to zero."""
    from plonky3_eon_tpu.eon import prove_batch, verify_batch

    sender, receiver = SenderAir(), ReceiverAir()
    rng = np.random.default_rng(3)
    vals = rng.integers(0, F.order, size=(8, 2), dtype=np.uint64)
    t_send = F.from_int(vals)
    t_recv = F.from_int(vals[rng.permutation(8)])
    config = make_config()
    proofs = prove_batch(
        config, [(sender, t_send, []), (receiver, t_recv, [])], check_witness=True
    )
    verify_batch(config, [(sender, []), (receiver, [])], proofs)
    assert verify_global_interactions(F, EF, proofs)

    # a receiver over DIFFERENT values: each proof is internally consistent
    # but the batch verifier must reject the global sum
    t_bad = F.from_int(rng.integers(0, F.order, size=(8, 2), dtype=np.uint64))
    bad_proofs = prove_batch(config, [(sender, t_send, []), (receiver, t_bad, [])])
    assert not verify_global_interactions(F, EF, bad_proofs)
    with pytest.raises(VerificationError):
        verify_batch(config, [(sender, []), (receiver, [])], bad_proofs)
