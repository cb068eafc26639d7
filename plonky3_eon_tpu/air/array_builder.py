"""Shared machinery for array-backed AIR builders (prover folder, verifier
folder, debug checker).

Value layout — **lanes trailing**: every builder value is shaped

    (*block, [N,] [D])

where `*block` are the structured constraint dims (e.g. (5, 5, 64) for a
Keccak bit state), `N` is the row-lane axis (present in the prover/debug
builders, absent at the verifier's out-of-domain point), and `D` is the
extension-coefficient axis (present iff the expression is extension-valued).

Putting the lane axis LAST does two things:
  * numpy-style right-aligned broadcasting between blocks of different rank
    just works — a (5, 64, N) column-parity block combines with a
    (5, 5, 64, N) state block, a scalar (N,) flag with anything — with no
    explicit reshapes, and identically at the verifier where N is absent;
  * the large N axis lands on the TPU's trailing (8, 128) vector tiling, so
    every constraint expression vectorizes over rows by construction.

Matrices are stored TRANSPOSED (W, N): a column is `mat[c]`, a block is
`mat[a:b].reshape(block + tail)` — the same indexing for the prover's lane
matrices and the verifier's opened rows (W, D).
"""

from __future__ import annotations

import math

import numpy as np

from .expr import Expr, RowPair


class ArrayOpsMixin:
    """Ring callbacks + block ops over jnp/np arrays. Host class must set:
    F, EF, num_lanes (int row count, or None at the verifier), and the
    matrix slots via set_main/set_preprocessed/set_permutation."""

    num_lanes = None

    # ---- matrix wiring --------------------------------------------------

    def _init_mats(self):
        self._main_mats = None
        self._main_ext = False
        self._main_rp = None
        self._prep_mats = None
        self._prep_ext = False
        self._prep_rp = None
        self._perm_mats = None
        self._perm_rp = None

    def set_main(self, local, nxt, ext: bool):
        """local/nxt: (W, N) lane matrices or (W, D) opened rows."""
        self._main_mats, self._main_ext = (local, nxt), ext

    def set_preprocessed(self, local, nxt, ext: bool):
        self._prep_mats, self._prep_ext = (local, nxt), ext

    def set_permutation(self, local, nxt):
        """(W*D, N) flattened base lanes (prover) or (W, D) rows (verifier).
        Permutation values are always extension-valued."""
        self._perm_mats = (local, nxt)

    def _columns(self, mats, ext):
        local, nxt = mats
        w = local.shape[0]
        return RowPair(
            [Expr(self, local[c], ext) for c in range(w)],
            [Expr(self, nxt[c], ext) for c in range(w)],
        )

    @property
    def main(self):
        if self._main_rp is None and self._main_mats is not None:
            self._main_rp = self._columns(self._main_mats, self._main_ext)
        return self._main_rp

    @main.setter
    def main(self, rp):
        self._main_rp = rp

    @property
    def preprocessed(self):
        if self._prep_rp is None and self._prep_mats is not None:
            self._prep_rp = self._columns(self._prep_mats, self._prep_ext)
        return self._prep_rp

    @preprocessed.setter
    def preprocessed(self, rp):
        self._prep_rp = rp

    @property
    def permutation(self):
        if self._perm_rp is None and self._perm_mats is not None:
            local, nxt = self._perm_mats
            D = self.EF.D
            if self.num_lanes is not None:  # (W*D, N) -> per-col (N, D)
                w = local.shape[0] // D
                self._perm_rp = RowPair(
                    [Expr(self, local[c * D : (c + 1) * D].T, True) for c in range(w)],
                    [Expr(self, nxt[c * D : (c + 1) * D].T, True) for c in range(w)],
                )
            else:  # (W, D) opened rows
                self._perm_rp = self._columns(self._perm_mats, True)
        return self._perm_rp

    @permutation.setter
    def permutation(self, rp):
        self._perm_rp = rp

    def _block(self, mats, ext, start, shape, nxt):
        mat = mats[1 if nxt else 0]
        shape = tuple(shape)
        k = math.prod(shape)
        v = mat[start : start + k].reshape(shape + mat.shape[1:])
        return Expr(self, v, ext)

    def main_block(self, start, shape, nxt=False):
        return self._block(self._main_mats, self._main_ext, start, shape, nxt)

    def preprocessed_block(self, start, shape, nxt=False):
        return self._block(self._prep_mats, self._prep_ext, start, shape, nxt)

    # ---- ring callbacks -------------------------------------------------

    def _const(self, x):
        return self.F.from_int(int(x) % self.F.order)

    def _const_array(self, arr):
        """Constant block: gets a unit lane axis (before any base limb
        suffix) so it right-aligns against lane-carrying blocks."""
        import jax.numpy as jnp

        v = self.F.from_int(np.asarray(arr, dtype=np.uint64))
        if self.num_lanes is not None:
            v = jnp.expand_dims(v, axis=v.ndim - len(self.F.shape_suffix))
        return v

    def _ext_const(self, v):
        import jax.numpy as jnp

        return jnp.asarray(v)

    def _embed(self, v):
        return self.EF.from_base(v)

    def _add(self, a, b, ea, eb):
        if ea == eb:
            return (self.EF.add(a, b) if ea else self.F.add(a, b)), ea
        if ea:
            return self.EF.add(a, self._embed(b)), True
        return self.EF.add(self._embed(a), b), True

    def _sub(self, a, b, ea, eb):
        if ea == eb:
            return (self.EF.sub(a, b) if ea else self.F.sub(a, b)), ea
        if ea:
            return self.EF.sub(a, self._embed(b)), True
        return self.EF.sub(self._embed(a), b), True

    def _mul(self, a, b, ea, eb):
        if ea and eb:
            return self.EF.mul(a, b), True
        if ea:
            return self.EF.mul_base(a, b), True
        if eb:
            return self.EF.mul_base(b, a), True
        return self.F.mul(a, b), False

    def _neg(self, a, e):
        return (self.EF.neg(a) if e else self.F.neg(a)), e

    # ---- block structure ops --------------------------------------------

    def _tail_ndim(self, ext: bool) -> int:
        sfx = len((self.EF if ext else self.F).shape_suffix)
        return (1 if self.num_lanes is not None else 0) + sfx

    def _expand(self, v, ext, k):
        # leading block axes broadcast automatically (right-alignment);
        # explicit bcast just prepends unit axes
        return v.reshape((1,) * k + v.shape), ext

    def _roll(self, v, ext, shift, axis):
        import jax.numpy as jnp

        return jnp.roll(v, shift, axis=axis)

    def _gather(self, v, ext, flat_idx, out_shape):
        tail = v.shape[v.ndim - self._tail_ndim(ext) :]
        out = v.reshape((-1,) + tail)[np.asarray(flat_idx, dtype=np.int32)]
        return out.reshape(tuple(out_shape) + tail)

    def _block_shape(self, v, ext):
        return v.shape[: v.ndim - self._tail_ndim(ext)]

    def _reshape_block(self, v, ext, shape):
        tail = v.shape[v.ndim - self._tail_ndim(ext) :]
        return v.reshape(tuple(shape) + tail)

    def _sum_block(self, v, ext, axis):
        return (self.EF if ext else self.F).sum(v, axis=axis)
