"""Constraint expression wrapper.

Reference parity: the reference makes `Air::eval` generic over
`AirBuilder::Expr` via Rust trait monomorphization (`air/src/air.rs:47`).
Here an `Expr` wraps a builder-owned value — a jnp lane array in the prover
folder (whole quotient domain per value), an extension scalar in the
verifier folder, or a degree integer in the symbolic builder — and
dispatches arithmetic back to the builder. One AIR definition therefore
serves witness-check, quotient evaluation (traced+fused by XLA), degree
analysis, and out-of-domain verification.
"""

from __future__ import annotations


class Expr:
    __slots__ = ("b", "v", "ext")

    def __init__(self, b, v, ext: bool = False):
        self.b = b
        self.v = v
        self.ext = ext

    def _lift(self, other):
        if isinstance(other, Expr):
            return other
        return Expr(self.b, self.b._const(other), False)

    def __add__(self, o):
        o = self._lift(o)
        v, e = self.b._add(self.v, o.v, self.ext, o.ext)
        return Expr(self.b, v, e)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._lift(o)
        v, e = self.b._sub(self.v, o.v, self.ext, o.ext)
        return Expr(self.b, v, e)

    def __rsub__(self, o):
        return self._lift(o).__sub__(self)

    def __mul__(self, o):
        o = self._lift(o)
        v, e = self.b._mul(self.v, o.v, self.ext, o.ext)
        return Expr(self.b, v, e)

    __rmul__ = __mul__

    def __neg__(self):
        v, e = self.b._neg(self.v, self.ext)
        return Expr(self.b, v, e)

    def square(self):
        return self * self

    def double(self):
        return self + self

    # ---- block structure ops (see air/array_builder.py for the layout) --

    def bcast(self, k: int):
        """Prepend k unit block axes. Rarely needed: with lanes trailing,
        lower-rank blocks right-align automatically."""
        v, e = self.b._expand(self.v, self.ext, k)
        return Expr(self.b, v, e)

    def roll(self, shift: int, axis: int):
        """Cyclically shift a block axis (e.g. Keccak's x-1 / z-1 taps)."""
        return Expr(self.b, self.b._roll(self.v, self.ext, shift, axis), self.ext)

    def gather(self, flat_idx, out_shape):
        """Static permutation/selection of block entries: flatten the block
        dims, take `flat_idx`, reshape to `out_shape` (e.g. Keccak's
        rho-rotation B view of A')."""
        return Expr(self.b, self.b._gather(self.v, self.ext, flat_idx, out_shape), self.ext)

    @property
    def block_shape(self):
        """Shape of the value BLOCK (excluding lane/limb tail axes)."""
        return self.b._block_shape(self.v, self.ext)

    def reshape_block(self, shape):
        return Expr(self.b, self.b._reshape_block(self.v, self.ext, shape), self.ext)

    def sum_block(self, axis: int):
        """Sum block entries along a block axis (degree = max under the
        symbolic builder)."""
        return Expr(self.b, self.b._sum_block(self.v, self.ext, axis), self.ext)


class RowPair:
    """Local/next row views of a trace matrix (ref: `VerticalPair` row pairs,
    `matrix/src/stack.rs:25`; `AirBuilder::main().row_slice(0/1)`)."""

    __slots__ = ("local", "next")

    def __init__(self, local, next):
        self.local = local
        self.next = next
