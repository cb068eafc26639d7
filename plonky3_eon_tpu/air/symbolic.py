"""Symbolic constraint analysis (degree + count).

Reference parity: `uni-stark/src/symbolic_builder.rs:18-192`,
`symbolic_expression.rs:78` (cached `degree_multiple`),
`symbolic_variable.rs:9` (Preprocessed/Main/Permutation/Public/Challenge
entries).

TPU-native design: the reference needs the full symbolic AST both for
degree analysis and to re-evaluate constraints generically; we only need
the **degree multiples and constraint count** — concrete evaluation happens
by tracing the same `Air.eval` under jit with array-backed builders. So the
symbolic value is just an integer degree-multiple; `Air.eval` runs on the
`SymbolicAirBuilder` exactly once per AIR shape.

Degree-multiple convention (matching `symbolic_expression.rs`):
trace/preprocessed/permutation variables -> 1; public values & challenges
-> 0; is_first_row / is_last_row -> 1 (full Lagrange selectors);
is_transition -> 0 (single linear factor, vanishing relative degree);
add -> max, mul -> sum.
"""

from __future__ import annotations

import numpy as np

from ..utils import log2_ceil
from .builder import BuilderBase
from .expr import Expr, RowPair


class SymbolicAirBuilder(BuilderBase):
    def __init__(
        self,
        width: int,
        num_public_values: int = 0,
        preprocessed_width: int = 0,
        permutation_width: int = 0,
        num_challenges: int = 0,
    ):
        var = lambda: Expr(self, 1, False)
        evar = lambda: Expr(self, 1, True)
        pub = lambda: Expr(self, 0, False)
        self.main = RowPair([var() for _ in range(width)], [var() for _ in range(width)])
        self.preprocessed = (
            RowPair(
                [var() for _ in range(preprocessed_width)],
                [var() for _ in range(preprocessed_width)],
            )
            if preprocessed_width
            else None
        )
        self.permutation = (
            RowPair(
                [evar() for _ in range(permutation_width)],
                [evar() for _ in range(permutation_width)],
            )
            if permutation_width
            else None
        )
        self.public_values = [pub() for _ in range(num_public_values)]
        self.permutation_challenges = [Expr(self, 0, True) for _ in range(num_challenges)]
        self.is_first_row = Expr(self, 1, False)
        self.is_last_row = Expr(self, 1, False)
        self.is_transition = Expr(self, 0, False)
        self.constraint_degrees: list[int] = []

    # ring callbacks: values are degree multiples (ints, or numpy int
    # arrays for block constraints — elementwise max/sum)
    def _const(self, x):
        return 0

    def _const_array(self, arr):
        return np.zeros(np.asarray(arr).shape, np.int64)

    def _ext_const(self, v):
        return 0

    def _expand(self, v, ext, k):
        if isinstance(v, np.ndarray):
            return v.reshape((1,) * k + v.shape), ext
        return v, ext

    def _roll(self, v, ext, shift, axis):
        return np.roll(v, shift, axis=axis) if isinstance(v, np.ndarray) else v

    def _gather(self, v, ext, flat_idx, out_shape):
        if isinstance(v, np.ndarray):
            return v.reshape(-1)[np.asarray(flat_idx)].reshape(tuple(out_shape))
        return v

    def _block_shape(self, v, ext):
        return v.shape if isinstance(v, np.ndarray) else ()

    def _reshape_block(self, v, ext, shape):
        return v.reshape(tuple(shape)) if isinstance(v, np.ndarray) else v

    def _sum_block(self, v, ext, axis):
        # degree of a sum = max of the summand degrees
        return np.max(v, axis=axis) if isinstance(v, np.ndarray) else v

    def main_block(self, start, shape, nxt=False):
        return Expr(self, np.ones(tuple(shape), np.int64), False)

    def preprocessed_block(self, start, shape, nxt=False):
        return Expr(self, np.ones(tuple(shape), np.int64), False)

    def _add(self, a, b, ea, eb):
        return np.maximum(a, b), ea or eb

    _sub = _add

    def _mul(self, a, b, ea, eb):
        return a + b, ea or eb

    def _neg(self, a, e):
        return a, e

    def _accumulate(self, v, e):
        if isinstance(v, np.ndarray):
            self.constraint_degrees.extend(int(x) for x in v.reshape(-1))
        else:
            self.constraint_degrees.append(int(v))


def get_symbolic_constraints(air, num_public_values: int = 0, preprocessed_width: int = 0,
                             permutation_width: int = 0, num_challenges: int = 0):
    b = SymbolicAirBuilder(
        air.width, num_public_values, preprocessed_width, permutation_width, num_challenges
    )
    air.eval(b)
    return b.constraint_degrees


def get_log_quotient_degree(air, num_public_values: int = 0, preprocessed_width: int = 0,
                            permutation_width: int = 0, num_challenges: int = 0) -> int:
    """log2 of the number of quotient chunks (ref: `symbolic_builder.rs:18-60`):
    constraints of degree-multiple d give a quotient of degree (d-1)*n, i.e.
    2^ceil(log2(d-1)) chunks of trace-degree each."""
    degrees = get_symbolic_constraints(
        air, num_public_values, preprocessed_width, permutation_width, num_challenges
    )
    max_deg = max(degrees, default=2)
    return log2_ceil(max(max_deg - 1, 1))
