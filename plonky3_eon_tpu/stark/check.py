"""Debug witness checker (reference parity:
`uni-stark/src/check_constraints.rs:18-72` — the in-prover 'sanitizer' that
evaluates every constraint on every row of the raw trace and asserts zero).

TPU-native: instead of a row loop, each constraint is evaluated as one
vectorized array over all n rows (with wraparound 'next'), with one-hot
first/last-row selectors; the host then checks all-zeros and reports the
failing constraint index + rows. Values use the lanes-trailing layout of
`air/array_builder.py`; block constraints are checked as whole tensors.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..air.array_builder import ArrayOpsMixin
from ..air.builder import BuilderBase
from ..air.expr import Expr


class DebugConstraintBuilder(ArrayOpsMixin, BuilderBase):
    def __init__(self, F, EF, trace, public_values, preprocessed=None,
                 permutation=None, permutation_challenges=()):
        self.F = F
        self.EF = EF
        n = trace.shape[0]
        self.num_lanes = n
        self._init_mats()
        # moveaxis, not .T: base fields may carry a limb suffix
        tr = lambda m: jnp.moveaxis(m, 1, 0)
        self.set_main(tr(trace), tr(jnp.roll(trace, -1, axis=0)), ext=False)
        if preprocessed is not None:
            self.set_preprocessed(
                tr(preprocessed), tr(jnp.roll(preprocessed, -1, axis=0)), ext=False
            )
        if permutation is not None:  # (N, W*D) flattened base columns
            self.set_permutation(tr(permutation), tr(jnp.roll(permutation, -1, axis=0)))
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

    def _accumulate(self, v, ext):
        self._constraints.append((v, ext))


def check_constraints(air, F, EF, trace, public_values, preprocessed=None,
                      permutation=None, permutation_challenges=()):
    """Raise AssertionError naming the first violated constraint."""
    b = DebugConstraintBuilder(
        F, EF, trace, public_values, preprocessed, permutation, permutation_challenges
    )
    air.eval(b)
    for i, (c, ext) in enumerate(b._constraints):
        arr = np.asarray(c)
        if arr.any():
            # lane axis is the last block-external axis: reduce all others
            lane_axis = arr.ndim - 1 - (1 if ext else 0)
            axes = tuple(a for a in range(arr.ndim) if a != lane_axis)
            bad = np.nonzero(arr.any(axis=axes) if axes else arr)[0]
            raise AssertionError(
                f"constraint {i} violated on rows {bad[:10].tolist()} "
                f"(of {len(bad)} rows)"
            )
