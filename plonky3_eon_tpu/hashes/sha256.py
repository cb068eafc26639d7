"""SHA-256, batched (reference parity: `sha256/src/lib.rs:14,40` — Sha256
hasher + Sha256Compress raw compression function).

TPU-native: message schedule + 64 rounds unrolled at trace time over
(batch, ...) uint32 arrays; differential-tested against hashlib.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
        0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
        0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
        0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
        0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
        0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208, 0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A, 0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)


def _rotr(x, r: int):
    return (x >> r) | (x << (32 - r))


@jax.jit
def sha256_compress(cv, block):
    """One SHA-256 compression: cv (batch, 8) u32, block (batch, 16) u32
    (big-endian words) -> (batch, 8)."""
    w = [block[:, i] for i in range(16)]
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    a, b, c, d, e, f, g, h = (cv[:, i] for i in range(8))
    for i in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + jnp.uint32(_K[i]) + w[i]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out = jnp.stack([a, b, c, d, e, f, g, h], axis=1)
    return out + cv


class Sha256:
    """Batched SHA-256 over u32-word inputs with standard padding.

    hash: (batch, L) uint32 (big-endian word stream) -> (batch, 8) uint32.
    """

    @functools.partial(jax.jit, static_argnums=0)
    def hash(self, words):
        batch, L = words.shape
        bit_len = L * 32
        # pad: 0x80000000 word, zeros, 2-word length
        n_blocks = (L + 1 + 2 + 15) // 16
        padded = jnp.zeros((batch, n_blocks * 16), jnp.uint32)
        padded = padded.at[:, :L].set(words)
        padded = padded.at[:, L].set(jnp.uint32(0x80000000))
        padded = padded.at[:, -2].set(jnp.uint32(bit_len >> 32))
        padded = padded.at[:, -1].set(jnp.uint32(bit_len & 0xFFFFFFFF))
        cv = jnp.broadcast_to(jnp.asarray(_IV), (batch, 8))
        for blk in range(n_blocks):
            cv = sha256_compress(cv, padded[:, blk * 16 : (blk + 1) * 16])
        return cv

    def __call__(self, words):
        return self.hash(words)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class Sha256Compress:
    """Raw compression as a 2-to-1 digest compressor (ref: `sha256/src/lib.rs:42`
    Sha256Compress): state starts at the standard IV, block = left || right,
    no padding. compress (batch, 2, 8) -> (batch, 8)."""

    def compress(self, parts):
        batch = parts.shape[0]
        cv = jnp.broadcast_to(jnp.asarray(_IV), (batch, 8))
        return sha256_compress(cv, parts.reshape(batch, 16))

    def __call__(self, parts):
        return self.compress(parts)
