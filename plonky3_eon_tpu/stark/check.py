"""Debug witness checker (reference parity:
`uni-stark/src/check_constraints.rs:18-72` — the in-prover 'sanitizer' that
evaluates every constraint on every row of the raw trace and asserts zero).

TPU-native: instead of a row loop, each constraint is evaluated as one
vectorized array over all n rows (with wraparound 'next'), with one-hot
first/last-row selectors; the host then checks all-zeros and reports the
failing constraint index + rows.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..air.builder import BuilderBase
from ..air.expr import Expr, RowPair


class DebugConstraintBuilder(BuilderBase):
    def __init__(self, F, EF, trace, public_values, preprocessed=None,
                 permutation=None, permutation_challenges=()):
        self.F = F
        self.EF = EF
        n, w = trace.shape[0], trace.shape[1]
        nxt = jnp.roll(trace, -1, axis=0)
        self.main = RowPair(
            [Expr(self, trace[:, c], False) for c in range(w)],
            [Expr(self, nxt[:, c], False) for c in range(w)],
        )
        if preprocessed is not None:
            pnxt = jnp.roll(preprocessed, -1, axis=0)
            self.preprocessed = RowPair(
                [Expr(self, preprocessed[:, c], False) for c in range(preprocessed.shape[1])],
                [Expr(self, pnxt[:, c], False) for c in range(preprocessed.shape[1])],
            )
        if permutation is not None:
            pnxt = jnp.roll(permutation, -1, axis=0)
            self.permutation = RowPair(
                [Expr(self, permutation[:, c], True) for c in range(permutation.shape[1])],
                [Expr(self, pnxt[:, c], True) for c in range(permutation.shape[1])],
            )
        self.permutation_challenges = [Expr(self, c, True) for c in permutation_challenges]
        self.public_values = [
            Expr(self, F.from_int(int(pv)), False) for pv in np.asarray(public_values).reshape(-1)
        ]
        first = np.zeros(n, dtype=np.uint64)
        first[0] = 1
        last = np.zeros(n, dtype=np.uint64)
        last[n - 1] = 1
        self.is_first_row = Expr(self, F.from_int(first), False)
        self.is_last_row = Expr(self, F.from_int(last), False)
        self.is_transition = Expr(self, F.from_int(1 - last), False)
        self._constraints = []

    def _const(self, x):
        return self.F.from_int(int(x) % self.F.order)

    def _embed(self, v):
        return self.EF.from_base(v)

    def _add(self, a, b, ea, eb):
        if ea == eb:
            return (self.EF.add(a, b) if ea else self.F.add(a, b)), ea
        return (self.EF.add(a, self._embed(b)) if ea else self.EF.add(self._embed(a), b)), True

    def _sub(self, a, b, ea, eb):
        if ea == eb:
            return (self.EF.sub(a, b) if ea else self.F.sub(a, b)), ea
        return (self.EF.sub(a, self._embed(b)) if ea else self.EF.sub(self._embed(a), b)), True

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

    def _accumulate(self, v, ext):
        self._constraints.append(v)


def check_constraints(air, F, EF, trace, public_values, preprocessed=None,
                      permutation=None, permutation_challenges=()):
    """Raise AssertionError naming the first violated constraint."""
    b = DebugConstraintBuilder(
        F, EF, trace, public_values, preprocessed, permutation, permutation_challenges
    )
    air.eval(b)
    for i, c in enumerate(b._constraints):
        arr = np.asarray(c)
        if arr.any():
            axes = tuple(range(1, arr.ndim))
            bad = np.nonzero(arr.any(axis=axes) if axes else arr)[0]
            raise AssertionError(
                f"constraint {i} violated on rows {bad[:10].tolist()} "
                f"(of {len(bad)} rows)"
            )
