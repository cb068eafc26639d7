"""BLAKE3 hash, batched (reference parity: `blake3/src/lib.rs:9`, which wraps
the SIMD-accelerated `blake3` crate).

TPU-native: the compression function runs over (batch, ...) uint32 arrays —
7 rounds unrolled at trace time; the batch axis replaces the reference
crate's SIMD lanes. The host-side `blake3_bytes` implements the full
chunk/parent tree for arbitrary lengths (verified against the official
empty-input vector); the batched `Blake3Hasher.hash` covers the <=64-word
single-block inputs used for Merkle leaf/compression hashing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A, 0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)
MSG_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]
CHUNK_START, CHUNK_END, PARENT, ROOT = 1, 2, 4, 8


def _rotr(x, r: int):
    return (x >> r) | (x << (32 - r))


def _g(st, a, b, c, d, mx, my):
    st[a] = st[a] + st[b] + mx
    st[d] = _rotr(st[d] ^ st[a], 16)
    st[c] = st[c] + st[d]
    st[b] = _rotr(st[b] ^ st[c], 12)
    st[a] = st[a] + st[b] + my
    st[d] = _rotr(st[d] ^ st[a], 8)
    st[c] = st[c] + st[d]
    st[b] = _rotr(st[b] ^ st[c], 7)


@functools.partial(jax.jit, static_argnums=(3, 4))
def blake3_compress(cv, block, counter_lo, block_len: int, flags: int):
    """cv (batch, 8), block (batch, 16), counter_lo (batch,) -> (batch, 16)
    full output state (first 8 = chaining value / digest)."""
    batch = cv.shape[0]
    st = [cv[:, i] for i in range(8)]
    st += [jnp.broadcast_to(jnp.uint32(IV[i]), (batch,)) for i in range(4)]
    st += [
        counter_lo,
        jnp.zeros((batch,), jnp.uint32),  # counter_hi (chunks < 2^32 here)
        jnp.full((batch,), jnp.uint32(block_len)),
        jnp.full((batch,), jnp.uint32(flags)),
    ]
    m = [block[:, i] for i in range(16)]
    for rnd in range(7):
        _g(st, 0, 4, 8, 12, m[0], m[1])
        _g(st, 1, 5, 9, 13, m[2], m[3])
        _g(st, 2, 6, 10, 14, m[4], m[5])
        _g(st, 3, 7, 11, 15, m[6], m[7])
        _g(st, 0, 5, 10, 15, m[8], m[9])
        _g(st, 1, 6, 11, 12, m[10], m[11])
        _g(st, 2, 7, 8, 13, m[12], m[13])
        _g(st, 3, 4, 9, 14, m[14], m[15])
        if rnd < 6:
            m = [m[MSG_PERM[i]] for i in range(16)]
    out = [st[i] ^ st[i + 8] for i in range(8)]
    out += [st[i + 8] ^ cv[:, i] for i in range(8)]
    return jnp.stack(out, axis=1)


class Blake3Hasher:
    """Batched single-chunk BLAKE3 over u32-word inputs (<= 256 words).

    hash: (batch, L) uint32 little-endian words -> (batch, 8) digests.
    Matches official BLAKE3 of the corresponding 4*L-byte strings.
    """

    @functools.partial(jax.jit, static_argnums=0)
    def hash(self, words):
        batch, L = words.shape
        if L > 256:
            raise ValueError("Blake3Hasher covers single-chunk inputs (<=1024 bytes)")
        n_blocks = max(1, (L + 15) // 16)
        padded = jnp.zeros((batch, n_blocks * 16), jnp.uint32)
        padded = padded.at[:, :L].set(words)
        cv = jnp.broadcast_to(jnp.asarray(IV), (batch, 8))
        zero_ctr = jnp.zeros((batch,), jnp.uint32)
        for blk in range(n_blocks):
            flags = (CHUNK_START if blk == 0 else 0) | (
                (CHUNK_END | ROOT) if blk == n_blocks - 1 else 0
            )
            rem = L - blk * 16
            blen = 64 if rem >= 16 else max(rem, 0) * 4
            if blk == n_blocks - 1:
                blen = (L - blk * 16) * 4 if L > blk * 16 else 0
            out = blake3_compress(cv, padded[:, blk * 16 : (blk + 1) * 16], zero_ctr, blen, flags)
            cv = out[:, :8]
        return cv

    def __call__(self, words):
        return self.hash(words)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class Blake3Compress:
    """2-to-1 digest compressor via a BLAKE3 parent node
    (parent flag | root, zero counter): (batch, 2, 8) -> (batch, 8)."""

    def compress(self, parts):
        batch = parts.shape[0]
        cv = jnp.broadcast_to(jnp.asarray(IV), (batch, 8))
        block = parts.reshape(batch, 16)
        out = blake3_compress(cv, block, jnp.zeros((batch,), jnp.uint32), 64, PARENT | ROOT)
        return out[:, :8]

    def __call__(self, parts):
        return self.compress(parts)


def blake3_bytes(data: bytes) -> bytes:
    """Full BLAKE3 of a byte string (host reference path, chunk tree).

    Covers arbitrary lengths; used for test vectors and transcript hashing.
    """
    def words_of(b: bytes) -> np.ndarray:
        pad = (-len(b)) % 64
        arr = np.frombuffer(b + b"\x00" * pad, dtype="<u4").astype(np.uint32)
        return arr

    def compress_host(cv, block_words, counter, block_len, flags):
        out = blake3_compress(
            jnp.asarray(cv[None, :]),
            jnp.asarray(block_words[None, :].astype(np.uint32)),
            jnp.asarray(np.array([counter], dtype=np.uint32)),
            block_len,
            flags,
        )
        return np.asarray(out)[0]

    # split into 1024-byte chunks
    chunks = [data[i : i + 1024] for i in range(0, len(data), 1024)] or [b""]
    n = len(chunks)
    cvs = []
    for ci, chunk in enumerate(chunks):
        blocks = [chunk[i : i + 64] for i in range(0, len(chunk), 64)] or [b""]
        cv = IV.copy()
        for bi, blk in enumerate(blocks):
            flags = (CHUNK_START if bi == 0 else 0) | (CHUNK_END if bi == len(blocks) - 1 else 0)
            if n == 1 and bi == len(blocks) - 1:
                flags |= ROOT
            w = words_of(blk)
            w = np.resize(w, 16) if len(w) >= 16 else np.concatenate([w, np.zeros(16 - len(w), np.uint32)])
            out = compress_host(cv, w, ci, len(blk), flags)
            cv = out[:8]
        cvs.append(cv)
    # parent tree (left-leaning, per spec: largest power-of-two left subtrees)
    def merge(nodes, is_root_level):
        while len(nodes) > 1:
            nxt = []
            for i in range(0, len(nodes) - 1, 2):
                flags = PARENT | (ROOT if len(nodes) == 2 else 0)
                block = np.concatenate([nodes[i], nodes[i + 1]]).astype(np.uint32)
                out = compress_host(IV.copy(), block, 0, 64, flags)
                nxt.append(out[:8])
            if len(nodes) % 2:
                nxt.append(nodes[-1])
            nodes = nxt
        return nodes[0]

    root = merge(cvs, True) if n > 1 else cvs[0]
    return b"".join(int(v).to_bytes(4, "little") for v in root)
