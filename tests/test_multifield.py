"""MultiField32PaddingFreeSponge + SerializingChallenger64."""

import numpy as np

from plonky3_eon_tpu.challenger import (
    HashChallenger,
    SerializingChallenger32,
    SerializingChallenger64,
    reduce_32,
)
from plonky3_eon_tpu.fields import BabyBear, Bn254Fr, Goldilocks
from plonky3_eon_tpu.hashes import MultiField32PaddingFreeSponge, Poseidon2, sha256_compress

import pytest as _pytest

pytestmark = _pytest.mark.slow  # compile-heavy: fast tier skips (conftest)


def test_multifield_sponge_packing_matches_reduce32():
    """Device packing of small elems into a BN254 lane == host reduce_32."""
    Fs, Fb = BabyBear, Bn254Fr
    p2 = Poseidon2(Fb, 3)
    sponge = MultiField32PaddingFreeSponge(Fs, Fb, p2, 3, 2, 1)
    n = sponge.num_f_elms
    assert n == 7  # floor(253 / 32)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, Fs.order, size=(1, 2 * n), dtype=np.uint64)
    # independent host computation of the absorbed big-field lanes
    lane0 = reduce_32(Fs, Fb, vals[0, :n])
    lane1 = reduce_32(Fs, Fb, vals[0, n:])
    st = np.zeros((1, 3), dtype=object)
    st[0, 0], st[0, 1] = lane0, lane1
    expected = p2.permute_host(st)[0, 0]
    got = sponge.hash(Fs.from_int(vals))
    got_int = Fb.to_ints(np.asarray(got)[:, 0])[0]
    assert int(got_int) == int(expected)


def test_multifield_sponge_batch_shapes():
    Fs, Fb = BabyBear, Bn254Fr
    p2 = Poseidon2(Fb, 3)
    sponge = MultiField32PaddingFreeSponge(Fs, Fb, p2, 3, 2, 1)
    rng = np.random.default_rng(1)
    mat = Fs.from_int(rng.integers(0, Fs.order, size=(4, 33), dtype=np.uint64))
    out = np.asarray(sponge.hash(mat))
    assert out.shape == (4, 1, 16)
    # deterministic + distinct rows
    assert len({tuple(r.ravel()) for r in out}) == 4


def _byte_hash(data: bytes) -> bytes:
    import hashlib

    return hashlib.sha256(data).digest()


def test_serializing_challenger_64():
    F = Goldilocks
    c = SerializingChallenger64(F, HashChallenger(_byte_hash))
    c.observe_ints([5, 7, F.order - 1])
    s1 = c.sample_int()
    assert 0 <= s1 < F.order
    # deterministic replay
    c2 = SerializingChallenger64(F, HashChallenger(_byte_hash))
    c2.observe_ints([5, 7, F.order - 1])
    assert c2.sample_int() == s1
    # different transcript -> different sample
    c3 = SerializingChallenger64(F, HashChallenger(_byte_hash))
    c3.observe_ints([5, 7, F.order - 2])
    assert c3.sample_int() != s1
    # 32-bit variant still distinct code path
    c4 = SerializingChallenger32(BabyBear, HashChallenger(_byte_hash))
    c4.observe_ints([5])
    assert 0 <= c4.sample_int() < BabyBear.order
