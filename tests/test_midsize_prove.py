"""Slow-tier mid-size proof (VERDICT r3 item 5): a 2^12 KoalaBear
Poseidon2-sponge FRI prove+verify with TWO committed matrices and
quotient degree >= 4, exercising the `row_chunk` (2^14) padding logic,
the `chunk=16` column-contraction path, and the radix-4 DFT boundary
(`fri/pcs.py` `_coeff_contraction` / `_chunked_col_contraction`,
`ops/dft.py` fused passes) that toy-sized CI proofs never reach.

Also asserts the device fold phase against the host-sequenced fold loop:
both must produce byte-identical proofs (the device path emulates the
duplex transcript; any drift is a soundness bug).

Budget note: shapes are chosen to compile in a few minutes on a small
CPU box (one wide-ish matrix at 2^12, plus a narrow second matrix);
gated behind P3TPU_RUN_SLOW=1.
"""

import numpy as np
import pytest

from plonky3_eon_tpu.challenger import DuplexChallenger
from plonky3_eon_tpu.commit import MerkleTreeMmcs
from plonky3_eon_tpu.fields import KoalaBear, KoalaBear4
from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
from plonky3_eon_tpu.hashes import PaddingFreeSponge, TruncatedPermutation, poseidon2_from_rng
from plonky3_eon_tpu.stark import prove, verify
from plonky3_eon_tpu.stark.serde import serialize_proof

pytestmark = pytest.mark.slow

F, EF = KoalaBear, KoalaBear4
LOG_N = 12


from plonky3_eon_tpu.air import BaseAir


class QuarticMixAir(BaseAir):
    """Width-8 AIR with a degree-4 constraint (quotient_degree 4, so the
    quotient splits into 4 chunks committed as one 4-wide group) plus a
    transition constraint: col0 * col1 * col2 * col3 == col4 on every row,
    and next.col5 == local.col5 + col6."""

    width = 8

    def eval(self, b):
        l = b.main.local
        b.assert_zero(l[0] * l[1] * l[2] * l[3] - l[4])
        b.when_transition().assert_eq(b.main.next[5], l[5] + l[6])

    def generate_trace(self, n, rng):
        cols = rng.integers(0, F.order, size=(n, 8), dtype=np.uint64)
        p = F.order
        cols[:, 4] = cols[:, 0] * cols[:, 1] % p * cols[:, 2] % p * cols[:, 3] % p
        cols[0, 5] = 7
        for i in range(1, n):
            cols[i, 5] = (cols[i - 1, 5] + cols[i - 1, 6]) % p
        return F.from_int(cols)


def make_config(device_fold: bool = True):
    p2 = poseidon2_from_rng(F, 16, seed=1)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    compressor = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    pcs = TwoAdicFriPcs(
        F, EF, mmcs, mmcs,
        FriConfig(log_blowup=1, num_queries=12, proof_of_work_bits=4,
                  log_final_poly_len=3),
    )
    from plonky3_eon_tpu.stark import StarkConfig

    return StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )


def test_midsize_prove_verify_and_device_fold_parity(monkeypatch):
    air = QuarticMixAir()
    rng = np.random.default_rng(7)
    trace = air.generate_trace(1 << LOG_N, rng)

    config = make_config()
    proof_dev = prove(config, air, trace, [])
    verify(config, air, proof_dev, [])

    # host-sequenced fold loop must produce the byte-identical proof
    from plonky3_eon_tpu.fri import pcs as fri_pcs

    monkeypatch.setattr(fri_pcs, "_device_fold_phase",
                        lambda *a, **k: None)
    proof_host = prove(config, air, trace, [])
    assert serialize_proof(proof_dev) == serialize_proof(proof_host), (
        "device fold phase diverged from the host-sequenced transcript"
    )
