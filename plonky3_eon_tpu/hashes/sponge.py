"""Sponges, compressors, serializing hashers (reference parity:
`symmetric/src/{sponge,compression,serializing_hasher,hash,hasher,permutation}.rs`).

TPU-native design: every construction is batched — a "hasher" maps
(batch, L) element arrays to (batch, OUT) digests in one jit program; the
Merkle tree calls these with batch = whole tree levels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pallas_sponge_ok(perm, batch: int, L: int = 16) -> bool:
    """Static (trace-time) gate for the Pallas fast path: Poseidon2 over a
    31-bit field, batch divisible by the (VMEM-budgeted) lane tile for an
    L-lane-wide input, TPU backend."""
    from .poseidon2 import Poseidon2

    if not isinstance(perm, Poseidon2) or perm.F.order >= (1 << 32):
        return False
    from ..ops.pallas_poseidon2 import pallas_available, sponge_tile_for

    if batch % sponge_tile_for(L):
        return False
    return pallas_available()


class PaddingFreeSponge:
    """Sponge over a WIDTH-lane permutation, rate RATE, output OUT
    (ref: `symmetric/src/sponge.rs:14`).

    hash: (batch, L) -> (batch, OUT); absorbs RATE lanes per permutation by
    overwrite (no padding — callers must ensure injectivity via fixed L).
    """

    def __init__(self, perm, width: int, rate: int, out: int):
        self.perm = perm
        self.width = width
        self.rate = rate
        self.out = out

    @functools.partial(jax.jit, static_argnums=0)
    def hash(self, inputs):
        batch = inputs.shape[0]
        L = inputs.shape[1]
        sfx = inputs.shape[2:]
        if not sfx and _pallas_sponge_ok(self.perm, batch, int(L)):
            from ..ops.pallas_poseidon2 import sponge_hash_T

            return sponge_hash_T(self.perm, inputs.T, self.rate, self.out).T
        state = jnp.zeros((batch, self.width) + sfx, inputs.dtype)
        n_full, rem = divmod(L, self.rate)
        if n_full:
            # scan over full-rate blocks: ONE absorb+permute body in the HLO
            blocks = jnp.moveaxis(
                inputs[:, : n_full * self.rate].reshape(
                    (batch, n_full, self.rate) + sfx
                ),
                1,
                0,
            )

            def absorb(st, blk):
                st = st.at[:, : self.rate].set(blk)
                return self.perm(st), None

            state, _ = jax.lax.scan(absorb, state, blocks)
        if rem:
            state = state.at[:, :rem].set(inputs[:, n_full * self.rate :])
            state = self.perm(state)
        return state[:, : self.out]

    def __call__(self, inputs):
        return self.hash(inputs)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class TruncatedPermutation:
    """2-to-1 (or CHUNK-to-1) compressor (ref: `symmetric/src/compression.rs:47`).

    compress: (batch, CHUNK, N)+sfx -> (batch, N)+sfx: concatenate chunks into
    the state (zero-padded to WIDTH), permute, truncate to N.
    """

    def __init__(self, perm, chunk: int, n: int, width: int):
        assert chunk * n <= width
        self.perm = perm
        self.chunk = chunk
        self.n = n
        self.width = width

    @functools.partial(jax.jit, static_argnums=0)
    def compress(self, parts):
        batch = parts.shape[0]
        sfx = parts.shape[3:]
        flat = parts.reshape((batch, self.chunk * self.n) + sfx)
        if not sfx and _pallas_sponge_ok(self.perm, batch):
            from ..ops.pallas_poseidon2 import permute_T

            cn = self.chunk * self.n
            stT = jnp.concatenate(
                [flat.T, jnp.zeros((self.width - cn, batch), flat.dtype)]
            ) if cn < self.width else flat.T
            return permute_T(self.perm, stT)[: self.n].T
        state = jnp.zeros((batch, self.width) + sfx, parts.dtype)
        state = state.at[:, : self.chunk * self.n].set(flat)
        state = self.perm(state)
        return state[:, : self.n]

    def __call__(self, parts):
        return self.compress(parts)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class MultiField32PaddingFreeSponge:
    """Hash 31/32-bit field elements into a BIG-field sponge (ref:
    `symmetric/src/sponge.rs:65` `MultiField32PaddingFreeSponge`): each
    big-field rate lane absorbs `num_f_elms` packed small elements
    (sum_i e_i * 2^(32 i), injective since 32*num_f_elms < log2(p_big)).

    hash: (batch, L) small elems -> (batch, OUT) big-field elements
    (digit-suffix arrays). Packing runs on-device: small canonical values
    land in 16-bit digit pairs, then one big-field mul by R^2 converts to
    Montgomery form.
    """

    def __init__(self, F_small, F_big, perm, width: int, rate: int, out: int,
                 num_f_elms: int | None = None):
        self.F_small = F_small
        self.F_big = F_big
        self.perm = perm
        self.width = width
        self.rate = rate
        self.out = out
        self.num_f_elms = num_f_elms or (F_big.order.bit_length() - 1) // 32

    @functools.partial(jax.jit, static_argnums=0)
    def hash(self, inputs):
        Fs, Fb = self.F_small, self.F_big
        batch, L = inputs.shape[0], inputs.shape[1]
        n = self.num_f_elms
        ndig = Fb.shape_suffix[0]
        per_block = self.rate * n
        nblocks = -(-L // per_block)
        canon = Fs.to_canonical(inputs)
        pad = nblocks * per_block - L
        if pad:
            canon = jnp.concatenate(
                [canon, jnp.zeros((batch, pad), canon.dtype)], axis=1
            )
        grouped = canon.reshape(batch, nblocks, self.rate, n)
        # pack n small elems into 16-bit digit positions [2i, 2i+1]
        digits = jnp.zeros((batch, nblocks, self.rate, ndig), jnp.uint32)
        for i in range(n):
            e = grouped[..., i]
            digits = digits.at[..., 2 * i].set(e & jnp.uint32(0xFFFF))
            digits = digits.at[..., 2 * i + 1].set(e >> 16)
        # canonical digits -> Montgomery form: Monty-mul by the element
        # whose raw digits are R^2 (i.e. from_int(R)), since mul divides by R
        r2 = Fb.from_int(Fb.R_int)
        blocks = Fb.mul(digits, jnp.broadcast_to(r2, digits.shape))
        state = Fb.zeros((batch, self.width))
        for b in range(nblocks):
            state = state.at[:, : self.rate].set(blocks[:, b])
            state = self.perm(state)
        return state[:, : self.out]

    def __call__(self, inputs):
        return self.hash(inputs)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class CompressionFunctionFromHasher:
    """2-to-1 compressor from a hasher (ref: `compression.rs:9`)."""

    def __init__(self, hasher, chunk: int, n: int):
        self.hasher = hasher
        self.chunk = chunk
        self.n = n

    def compress(self, parts):
        batch = parts.shape[0]
        flat = parts.reshape((batch, self.chunk * self.n) + parts.shape[3:])
        return self.hasher.hash(flat)

    def __call__(self, parts):
        return self.compress(parts)


class SerializingHasher:
    """Hash field elements through a word-oriented hasher by serializing
    to canonical u32 words (ref: `symmetric/src/serializing_hasher.rs:12`).

    Wraps an inner hasher taking (batch, L_words) uint32.
    """

    def __init__(self, F, inner):
        self.F = F
        self.inner = inner

    def hash(self, inputs):
        words = self.F.to_canonical(inputs)
        return self.inner.hash(words.reshape(words.shape[0], -1))

    def __call__(self, inputs):
        return self.hash(inputs)


class KeccakU64Sponge:
    """Keccak-f[1600] sponge absorbing u32 words into u64 lanes, digest as
    8 u32 words (ref: the `PaddingFreeSponge<KeccakF, 25, 17, 4>` +
    `SerializingHasher` stacks in `examples/src/proofs.rs:44-74`).

    hash: (batch, L) uint32 -> (batch, 8) uint32. Pairs of u32 words pack
    little-endian into u64 lanes; 17-lane rate; overwrite absorption
    (padding-free — fixed-length inputs only, as in the reference MMCS use).
    """

    RATE_U64 = 17

    def __init__(self, keccak_f):
        self.keccak_f = keccak_f

    @functools.partial(jax.jit, static_argnums=0)
    def hash(self, words):
        batch, L = words.shape
        if L % 2:
            words = jnp.concatenate([words, jnp.zeros((batch, 1), jnp.uint32)], axis=1)
            L += 1
        lanes = words.reshape(batch, L // 2, 2)  # (lo, hi) u64 lanes
        state = jnp.zeros((batch, 25, 2), jnp.uint32)
        n_lanes = L // 2
        n_full, rem = divmod(n_lanes, self.RATE_U64)
        if n_full:
            blocks = jnp.moveaxis(
                lanes[:, : n_full * self.RATE_U64].reshape(
                    batch, n_full, self.RATE_U64, 2
                ),
                1,
                0,
            )

            def absorb(st, blk):
                st = st.at[:, : self.RATE_U64].set(blk)
                return self.keccak_f(st), None

            state, _ = jax.lax.scan(absorb, state, blocks)
        if rem:
            state = state.at[:, :rem].set(lanes[:, n_full * self.RATE_U64 :])
            state = self.keccak_f(state)
        return state[:, :4].reshape(batch, 8)

    def __call__(self, words):
        return self.hash(words)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
