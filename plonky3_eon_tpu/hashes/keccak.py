"""Keccak-f[1600] permutation + Keccak-256 hasher, batched.

Reference parity: `keccak/src/lib.rs:65,95` and the SIMD backends
(`avx2.rs` x4 states, `avx512.rs` x8, `neon.rs` x2).

TPU-native design: the reference packs 2/4/8 states into vector registers;
here the batch axis IS the vector axis — a state array has shape
(batch, 25, 2) uint32 (lo, hi halves of each u64 lane; TPU has no 64-bit
ints) and every op runs over all 8x128 VPU lanes at once, so the natural
batch is thousands of states. The permutation is a trace-time-unrolled
24-round straight-line program that XLA fuses into a handful of kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

# Round constants (u64 split lo/hi) — public Keccak parameters.
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)

# Rotation offsets for lane (x, y), flat index x + 5*y.
_ROT = np.zeros(25, dtype=np.int64)
_x, _y, _r = 1, 0, 0
for _t in range(24):
    _r = (_r + _t + 1) % 64
    _ROT[_x + 5 * _y] = _r
    _x, _y = _y, (2 * _x + 3 * _y) % 5


def _rotl64(lo, hi, r: int):
    """Rotate a (lo, hi) u64 pair left by r (static)."""
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = (lo << r) | (hi >> (32 - r))
        nhi = (hi << r) | (lo >> (32 - r))
        return nlo, nhi
    r -= 32
    nlo = (hi << r) | (lo >> (32 - r))
    nhi = (lo << r) | (hi >> (32 - r))
    return nlo, nhi


@jax.jit
def keccak_f(state):
    """Keccak-f[1600] on a batched state (..., 25, 2) uint32 (lo, hi).

    The 24 rounds run under lax.scan (round constants as the scanned xs):
    the fully-unrolled version was ~10k HLO ops per call, and programs
    that inline keccak_f tens of times (the 2^21-leaf serializing merkle
    tree of the reference headline recipe) overwhelmed the XLA compiler —
    a 2^20 keccak-merkle prove never finished compiling. One traced round
    body keeps those programs ~24x smaller; rotations are static so the
    body is identical every round."""

    def round_body(st, rc):
        lo = [st[..., i, 0] for i in range(25)]
        hi = [st[..., i, 1] for i in range(25)]
        # theta
        clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
               for x in range(5)]
        chi_ = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
                for x in range(5)]
        for x in range(5):
            rl, rh = _rotl64(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
            dlo = clo[(x + 4) % 5] ^ rl
            dhi = chi_[(x + 4) % 5] ^ rh
            for y in range(5):
                lo[x + 5 * y] = lo[x + 5 * y] ^ dlo
                hi[x + 5 * y] = hi[x + 5 * y] ^ dhi
        # rho + pi
        blo = [None] * 25
        bhi = [None] * 25
        for x in range(5):
            for y in range(5):
                src = x + 5 * y
                dst = y + 5 * ((2 * x + 3 * y) % 5)
                rl, rh = _rotl64(lo[src], hi[src], int(_ROT[src]))
                blo[dst] = rl
                bhi[dst] = rh
        # chi
        for y in range(5):
            for x in range(5):
                i, i1, i2 = x + 5 * y, (x + 1) % 5 + 5 * y, (x + 2) % 5 + 5 * y
                lo[i] = blo[i] ^ (~blo[i1] & blo[i2])
                hi[i] = bhi[i] ^ (~bhi[i1] & bhi[i2])
        # iota
        lo[0] = lo[0] ^ rc[0]
        hi[0] = hi[0] ^ rc[1]
        out = jnp.stack(
            [jnp.stack([lo[i], hi[i]], axis=-1) for i in range(25)], axis=-2
        )
        return out, None

    rcs = jnp.stack(
        [jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)], axis=-1
    )  # (24, 2)
    out, _ = jax.lax.scan(round_body, state, rcs)
    return out


class KeccakF:
    """Batched Keccak-f permutation object (ref: `keccak/src/lib.rs:65`).

    `Permutation<[[u64; VECTOR_LEN]; 25]>` analogue: permute (batch, 25, 2).
    """

    WIDTH = 25

    def permute(self, state):
        return keccak_f(state)

    def __call__(self, state):
        return keccak_f(state)


def _bytes_to_state_words(blocks: np.ndarray) -> np.ndarray:
    """(batch, 200) uint8 -> (batch, 25, 2) uint32 little-endian."""
    b = blocks.reshape(blocks.shape[0], 25, 8)
    w = b.astype(np.uint64)
    vals = np.zeros((blocks.shape[0], 25), dtype=np.uint64)
    for i in range(8):
        vals |= w[:, :, i] << np.uint64(8 * i)
    out = np.zeros((blocks.shape[0], 25, 2), dtype=np.uint32)
    out[:, :, 0] = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, :, 1] = (vals >> np.uint64(32)).astype(np.uint32)
    return out


def keccak256_bytes(data: bytes) -> bytes:
    """Keccak-256 of a byte string (rate 136, pad 0x01||...||0x80).

    Host-side convenience mirroring `keccak/src/lib.rs:95` (Keccak256Hash);
    batched field-element hashing goes through `sponge.SerializingHasher`.
    """
    rate = 136
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    state = np.zeros((1, 25, 2), dtype=np.uint32)
    for off in range(0, len(padded), rate):
        block = np.frombuffer(bytes(padded[off : off + rate]) + b"\x00" * (200 - rate), dtype=np.uint8)
        state = state ^ _bytes_to_state_words(block[None, :])
        state = np.asarray(keccak_f(jnp.asarray(state)))
    out = state[0, :4]  # first 4 lanes = 32 bytes
    vals = out[:, 0].astype(np.uint64) | (out[:, 1].astype(np.uint64) << np.uint64(32))
    return b"".join(int(v).to_bytes(8, "little") for v in vals)
