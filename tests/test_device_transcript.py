"""Device-resident transcript parity (VERDICT r4 item 9).

The fast path keeps the duplex challenger state on device from the trace
commit through the FRI fold phase (stark/prover.py dev_ts +
fri/pcs.py:_absorb_sample_dev), bundling commit-root downloads into the
fold phase's single packed transfer. Transcript bytes — and therefore the
whole proof — must be IDENTICAL to the host-sequenced path.
"""

import numpy as np
import pytest

from plonky3_eon_tpu.challenger import DuplexChallenger
from plonky3_eon_tpu.commit import MerkleTreeMmcs
from plonky3_eon_tpu.fields import BabyBear as F, BabyBear4 as EF
from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_eon_tpu.stark import StarkConfig, prove, verify
from plonky3_eon_tpu.stark.serde import serialize_proof


def _config():
    p2 = Poseidon2(F, 16)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    compressor = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    pcs = TwoAdicFriPcs(
        F, EF, mmcs, mmcs,
        FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1),
    )
    return StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )


def test_device_transcript_prove_byte_identical(monkeypatch):
    air = FibonacciAir()
    trace, x = generate_fibonacci_trace(F, 1 << 6)
    pvs = [0, 1, x]

    cfg_dev = _config()
    assert cfg_dev.pcs.transcript_on_device(cfg_dev.new_challenger(), 7)
    proof_dev = prove(cfg_dev, air, trace, pvs)
    verify(cfg_dev, air, proof_dev, pvs)

    cfg_host = _config()
    monkeypatch.setattr(
        type(cfg_host.pcs), "transcript_on_device",
        lambda self, ch, lm: False,
    )
    proof_host = prove(cfg_host, air, trace, pvs)
    verify(cfg_host, air, proof_host, pvs)

    assert serialize_proof(proof_dev) == serialize_proof(proof_host), (
        "device-resident transcript diverged from the host transcript"
    )


def test_absorb_sample_matches_host_challenger():
    """_absorb_sample_dev == host observe/sample for ragged lengths,
    including a pending partial block carried into device mode."""
    import jax.numpy as jnp

    from plonky3_eon_tpu.fri.pcs import _absorb_sample_dev

    p2 = Poseidon2(F, 16)
    rng = np.random.default_rng(11)
    for lens, nsamp in [((3,), 1), ((8,), 4), ((5, 12), 4), ((16, 1, 7), 9)]:
        host = DuplexChallenger(F, p2, 16, 8)
        host.observe_ints([42])  # leaves one pending input
        dev = DuplexChallenger(F, p2, 16, 8)
        dev.observe_ints([42])
        dev.begin_device_transcript()
        vals = [rng.integers(0, F.order, size=(k,), dtype=np.uint64)
                for k in lens]
        for v in vals:
            host.observe(F.from_int(v))
            dev.observe_device(F.from_int(v))
        want = [host.sample_int() for _ in range(nsamp)]
        got_dev = dev.sample_device(nsamp)
        got = [int(x) for x in np.asarray(F.to_ints(got_dev))]
        assert got == want, (lens, nsamp)
        # fallback reseed must leave the host copy in the exact state
        dev.end_device_transcript()
        assert list(dev._state) == list(host._state)
        assert dev._output == host._output
        assert dev._input == host._input