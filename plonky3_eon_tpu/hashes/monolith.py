"""Monolith permutation for Mersenne31, batched over TPU lanes.

Reference parity: the `p3-monolith` crate is listed in the reference's
README Status table but absent from the source tree (SURVEY.md §2.8), so
this implements the published Monolith-31 construction (Grassi et al.
2023) for p = 2^31 - 1: rounds of Bars (bitwise chunk S-boxes), Bricks
(x_i += x_{i-1}^2 Feistel squaring), and Concrete (MDS matrix-vector).

TPU-native design: Bars is pure 32-bit bit-twiddling on canonical values —
no table lookups (gathers are the slowest primitive on the VPU; the
chunk S-box y = rotl1(x ^ (~rotl1(x) & rotl2(x) & rotl3(x))) is 6 bit-ops
per chunk, branchless over the whole batch). Bricks/Concrete run on
Mersenne31's native representation. Concrete uses a circulant matrix
applied as width small scalar mul-adds (width<=24: cheaper than an MXU
dispatch at these sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field
from .poseidon2 import deterministic_constants


def _rot(x, r: int, bits: int):
    """Rotate-left of the low `bits` bits of a uint32 array."""
    mask = jnp.uint32((1 << bits) - 1)
    x = x & mask
    return ((x << r) | (x >> (bits - r))) & mask


def bar31(x):
    """Monolith-31 Bar on one canonical 31-bit uint32 array.

    Splits into chunks (8,8,8,7) and applies the chi-like chunk S-box
    y = rotl1(x ^ (~rotl1(x) & rotl2(x) & rotl3(x))) on 8-bit chunks and
    y = rotl1(x ^ (~rotl1(x) & rotl2(x))) on the 7-bit top chunk, then
    reassembles. A bijection on [0, 2^31-1] that fixes 0 and 2^31-1, so it
    is a permutation of F_{2^31-1} u {p} restricted to canonical values.
    """
    m8 = jnp.uint32(0xFF)
    out = jnp.zeros_like(x)
    for i in range(3):
        c = (x >> (8 * i)) & m8
        t = c ^ (~_rot(c, 1, 8) & _rot(c, 2, 8) & _rot(c, 3, 8))
        out = out | (_rot(t, 1, 8) << (8 * i))
    c = (x >> 24) & jnp.uint32(0x7F)
    t = c ^ (~_rot(c, 1, 7) & _rot(c, 2, 7))
    out = out | (_rot(t, 1, 7) << 24)
    return out


class Monolith:
    """Monolith permutation over Mersenne31. permute: (batch, W) -> same.

    num_bars words get the Bar layer (the paper uses 8).
    """

    def __init__(
        self,
        F: Field,
        width: int = 16,
        num_rounds: int = 6,
        num_bars: int = 8,
        constants: np.ndarray | None = None,
        circulant_row: np.ndarray | None = None,
    ):
        if F.order != (1 << 31) - 1:
            raise ValueError("Monolith-31 requires the Mersenne31 field")
        self.F = F
        self.width = width
        self.num_rounds = num_rounds
        self.num_bars = min(num_bars, width)
        if constants is None:
            # last round adds no constants (paper §5); generate R-1 rows
            constants = deterministic_constants(
                F, "monolith", (num_rounds - 1) * width
            ).reshape(num_rounds - 1, width)
        self.constants_int = np.asarray(constants, dtype=np.uint64)
        self._consts = F.from_int_np(self.constants_int)
        if circulant_row is None:
            circulant_row = deterministic_constants(F, "monolith-mds", width)
        # circulant MDS candidate: row r is circulant_row rolled by r
        self.circ_int = np.asarray(circulant_row, dtype=np.uint64)
        mat = np.stack(
            [np.roll(self.circ_int, r) for r in range(width)], axis=0
        )
        self._mat = F.from_int_np(mat)  # (W, W)

    def _concrete(self, st):
        """st: (batch, W) -> M @ st per batch row, as W mul-add columns."""
        F = self.F
        mat = jnp.asarray(self._mat)
        acc = None
        for j in range(self.width):
            term = F.mul(st[:, j : j + 1], mat[None, :, j])
            acc = term if acc is None else F.add(acc, term)
        return acc

    def _bricks(self, st):
        """x_i += x_{i-1}^2 for i = W-1..1 (evaluated in parallel on the
        pre-round state, matching the paper's definition)."""
        F = self.F
        sq = F.square(st[:, :-1])
        bumped = F.add(st[:, 1:], sq)
        return jnp.concatenate([st[:, :1], bumped], axis=1)

    def _bars(self, st):
        F = self.F
        canon = F.to_canonical(st[:, : self.num_bars])
        barred = bar31(canon)
        # canonical 2^31-1 can't appear (to_canonical returns [0, p)); the
        # bar fixes p anyway so re-embedding is total
        barred = F.from_canonical(barred)
        return jnp.concatenate([barred, st[:, self.num_bars :]], axis=1)

    @functools.partial(jax.jit, static_argnums=0)
    def permute(self, state):
        F = self.F
        consts = jnp.asarray(self._consts)
        st = self._concrete(state)
        for r in range(self.num_rounds):
            st = self._bars(st)
            st = self._bricks(st)
            st = self._concrete(st)
            if r < self.num_rounds - 1:
                st = F.add(st, consts[r][None])
        return st

    def __call__(self, state):
        return self.permute(state)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
