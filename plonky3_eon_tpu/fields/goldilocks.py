"""Goldilocks field p = 2^64 - 2^32 + 1 as (lo, hi) uint32 pairs.

Reference parity: the removed upstream `p3-goldilocks` crate (SURVEY.md
§2.8; used by `keccak-air/examples/prove_goldilocks_*`). API shape matches
the other field descriptors.

TPU-native design: no 64-bit integers on the VPU, so an element is a
(..., 2) uint32 array (little-endian 32-bit words, canonical form — the
special-prime reduction is cheap enough that Montgomery buys nothing).
Multiplication builds the 128-bit product from four 32x32->64 partials
(`mulhi32` 16-bit decomposition) and reduces with the 2^64 = 2^32 - 1
identity:  L + H*2^64 = L - x3 + (x2 + x3) * 2^32 - x2  (mod p), computed
as the classic   (L - x3) + x2 * (2^32 - 1)   two-step with branchless
borrow/carry corrections. Everything is wrapping u32 lane arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .field import Field, mulhi32

U32 = jnp.uint32
GOLDILOCKS_P = (1 << 64) - (1 << 32) + 1
EPS = (1 << 32) - 1  # 2^64 mod p


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out (0/1)."""
    lo = alo + blo
    c = (lo < alo).astype(U32)
    hi = ahi + bhi
    c1 = (hi < ahi).astype(U32)
    hi2 = hi + c
    c2 = ((hi2 == 0) & (c == 1)).astype(U32)
    return lo, hi2, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out (0/1)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi2 = hi - b0
    b2 = ((hi == 0) & (b0 == 1)).astype(U32)
    return lo, hi2, b1 | b2


def _mul32x32(a, b):
    """a * b -> (lo, hi) 64-bit product of u32 lanes."""
    return a * b, mulhi32(a, b)



def _reduce_np(x, p: int) -> np.ndarray:
    """Reduce host ints mod p to uint64, handling arbitrarily large Python
    ints (object arrays appear when embedding extension-order constants)."""
    arr = np.asarray(x)
    if arr.dtype == object:
        return np.asarray(arr % p, dtype=np.uint64)
    return np.asarray(arr, dtype=np.uint64) % np.uint64(p)

class GoldilocksField(Field):
    name = "Goldilocks"
    order = GOLDILOCKS_P
    characteristic = GOLDILOCKS_P
    two_adicity = 32
    generator_int = 7
    shape_suffix = (2,)

    def __init__(self):
        self.add = jax.jit(self._add_impl)
        self.sub = jax.jit(self._sub_impl)
        self.neg = jax.jit(self._neg_impl)
        self.mul = jax.jit(self._mul_impl)
        self.square = jax.jit(lambda a: self._mul_impl(a, a))
        self.inv = jax.jit(self._inv_impl)
        self.halve = jax.jit(self._halve_impl)
        self._inv_bits = jnp.asarray(
            [(GOLDILOCKS_P - 2) >> i & 1 for i in range((GOLDILOCKS_P - 2).bit_length())],
            dtype=U32,
        )

    # ---- host <-> device -----------------------------------------------

    def from_int_np(self, x) -> np.ndarray:
        arr = _reduce_np(x, GOLDILOCKS_P)
        lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (arr >> np.uint64(32)).astype(np.uint32)
        return np.stack([lo, hi], axis=-1)

    def from_int(self, x):
        return jnp.asarray(self.from_int_np(x))

    def to_ints(self, a) -> np.ndarray:
        arr = np.asarray(a, dtype=np.uint64)
        return (arr[..., 0] | (arr[..., 1] << np.uint64(32))) % np.uint64(GOLDILOCKS_P)

    def from_canonical(self, a):
        return a

    def to_canonical(self, a):
        return a

    def ones(self, shape=()):
        o = np.zeros(tuple(shape) + (2,), np.uint32)
        o[..., 0] = 1
        return jnp.asarray(o)

    # ---- reduction helpers ------------------------------------------------

    def _canon(self, lo, hi):
        """One conditional subtract p for a value < 2^64."""
        # v >= p  iff  hi == 0xFFFFFFFF and lo >= 0xFFFFFFFF... precisely:
        # p = (0xFFFFFFFF << 32) + 1; v >= p iff hi > 0xFFFFFFFE or
        # (hi == 0xFFFFFFFF... ) — compare (hi, lo) >= (0xFFFFFFFF, 1):
        ge = ((hi == U32(0xFFFFFFFF)) & (lo >= U32(1))).astype(U32)
        # subtract ge * p: p = 2^64 - 2^32 + 1 -> v - p = v + 2^32 - 1 (mod 2^64)
        lo2, hi2, _ = _add64(lo, hi, ge * U32(0xFFFFFFFF), jnp.zeros_like(hi))
        return jnp.where(ge == 1, lo2, lo), jnp.where(ge == 1, hi2, hi)

    # ---- ring ops ----------------------------------------------------------

    def _add_impl(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        lo, hi, c = _add64(a[..., 0], a[..., 1], b[..., 0], b[..., 1])
        # carry: value >= 2^64 -> add EPS (2^64 mod p); cannot re-carry since
        # wrapped value <= 2p - 2^64 < 2^33
        lo2, hi2, _ = _add64(lo, hi, c * U32(EPS & 0xFFFFFFFF), jnp.zeros_like(hi))
        lo, hi = self._canon(lo2, hi2)
        return jnp.stack([lo, hi], axis=-1)

    def _sub_impl(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        lo, hi, brw = _sub64(a[..., 0], a[..., 1], b[..., 0], b[..., 1])
        # borrow: subtract EPS (i.e. subtract 2^64 mod p)
        lo2, hi2, _ = _sub64(lo, hi, brw * U32(EPS & 0xFFFFFFFF), jnp.zeros_like(hi))
        lo, hi = self._canon(lo2, hi2)
        return jnp.stack([lo, hi], axis=-1)

    def _neg_impl(self, a):
        return self._sub_impl(jnp.zeros_like(a), a)

    def _mul_impl(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        # 128-bit product words x0..x3
        p00l, p00h = _mul32x32(a0, b0)
        p01l, p01h = _mul32x32(a0, b1)
        p10l, p10h = _mul32x32(a1, b0)
        p11l, p11h = _mul32x32(a1, b1)
        x0 = p00l
        # x1 = p00h + p01l + p10l (with carries into x2)
        t, c1 = p00h + p01l, (p00h + p01l < p00h).astype(U32)
        x1 = t + p10l
        c2 = (x1 < t).astype(U32)
        # x2 = p01h + p10h + p11l + carries
        s, d1 = p01h + p10h, (p01h + p10h < p01h).astype(U32)
        s2 = s + p11l
        d2 = (s2 < s).astype(U32)
        x2 = s2 + c1 + c2
        d3 = (x2 < s2).astype(U32)
        x3 = p11h + d1 + d2 + d3  # no overflow: p11h <= 2^32 - 2
        # reduce: v = L + 2^64 H == (L - x3) + x2 * EPS (mod p)
        lo, hi, brw = _sub64(x0, x1, x3, jnp.zeros_like(x3))
        lo, hi, _ = _sub64(lo, hi, brw * U32(EPS), jnp.zeros_like(hi))
        # x2 * EPS = (x2 << 32) - x2: 64-bit value (x2*0xFFFFFFFF < 2^64)
        e_lo, e_hi, eb = _sub64(jnp.zeros_like(x2), x2, x2, jnp.zeros_like(x2))
        # (x2<<32) - x2 never borrows as a 64-bit op when x2 > 0; for x2 == 0
        # the borrow result wraps but e == 0 case: select zero explicitly
        e_lo = jnp.where(x2 == 0, jnp.zeros_like(e_lo), e_lo)
        e_hi = jnp.where(x2 == 0, jnp.zeros_like(e_hi), e_hi)
        lo, hi, c = _add64(lo, hi, e_lo, e_hi)
        lo, hi, _ = _add64(lo, hi, c * U32(EPS), jnp.zeros_like(hi))
        lo, hi = self._canon(lo, hi)
        return jnp.stack([lo, hi], axis=-1)

    def _halve_impl(self, a):
        lo, hi = a[..., 0], a[..., 1]
        odd = lo & U32(1)
        # (a + odd*p) / 2 — a+p < 2^65 needs the carry bit
        plo, phi = U32(1), U32(0xFFFFFFFF)
        lo2, hi2, c = _add64(lo, hi, odd * plo, odd * phi)
        slo = (lo2 >> 1) | (hi2 << 31)
        shi = (hi2 >> 1) | (c << 31)
        return jnp.stack([slo, shi], axis=-1)

    def _inv_impl(self, a):
        def step(carry, bit):
            acc, base = carry
            new_acc = self._mul_impl(acc, base)
            acc = jnp.where(bit, new_acc, acc)
            return (acc, self._mul_impl(base, base)), None

        ones = jnp.broadcast_to(self.ones(()), a.shape)
        (acc, _), _ = jax.lax.scan(step, (ones, a), self._inv_bits)
        return acc


Goldilocks = GoldilocksField()
