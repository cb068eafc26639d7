"""Full multi-chip prove through the sharded path (VERDICT r1 item 5).

The PCS/Merkle/quotient stages accept a `jax.sharding.Mesh`: LDE inputs go
column-sharded (column-independent DFTs), Merkle leaves and the quotient
fold row-sharded, with GSPMD inserting the collectives. Modular u32
arithmetic is exact, so the sharded prove must produce BYTE-IDENTICAL
proofs to the single-device prove — asserted here on 8 virtual CPU devices
(conftest sets xla_force_host_platform_device_count=8).

The reference has no distributed backend (SURVEY.md §5.8); this is the
TPU-native scaling replacement for its rayon shared-memory parallelism.
"""

import numpy as np
import pytest

import jax

from plonky3_eon_tpu.challenger import DuplexChallenger
from plonky3_eon_tpu.commit import MerkleTreeMmcs
from plonky3_eon_tpu.fields import BabyBear as F, BabyBear4 as EF
from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air
from plonky3_eon_tpu.parallel.dist import make_mesh
from plonky3_eon_tpu.stark import StarkConfig, prove, verify
from plonky3_eon_tpu.stark.serde import serialize_proof

pytestmark = pytest.mark.slow  # full GSPMD prove compile is heavy on CPU


def _config(mesh=None, num_queries=2, pow_bits=1):
    p2 = Poseidon2(F, 16)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    compressor = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    pcs = TwoAdicFriPcs(
        F, EF, mmcs, mmcs,
        FriConfig(log_blowup=1, num_queries=num_queries, proof_of_work_bits=pow_bits),
        mesh=mesh,
    )
    return StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    ), p2


def test_sharded_prove_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    config1, p2 = _config(mesh=None)
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(0)
    inputs = F.from_int(rng.integers(0, F.order, size=(1 << 8, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)

    proof1 = prove(config1, air, trace, [])
    verify(config1, air, proof1, [])

    mesh = make_mesh(8)
    config8, p2b = _config(mesh=mesh)
    air8 = Poseidon2Air(p2b)
    trace8 = air8.generate_trace(inputs)
    proof8 = prove(config8, air8, trace8, [])
    verify(config8, air8, proof8, [])

    b1, b8 = serialize_proof(proof1), serialize_proof(proof8)
    assert b1 == b8, "sharded prove must be byte-identical to single-device"
