"""Virtual columns + sub-AIR builders.

Reference parity: `air/src/virtual_column.rs:14` (`VirtualPairCol` — an
affine combination of main/preprocessed columns) and
`uni-stark/src/sub_builder.rs:21` (`SubAirBuilder` — evaluate a sub-AIR
against a column window of a larger trace).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .expr import RowPair


@dataclass
class PairCol:
    """A column reference: ('main' | 'preprocessed', index)."""

    kind: str
    index: int

    def get(self, builder, nxt: bool = False):
        rp = builder.main if self.kind == "main" else builder.preprocessed
        return (rp.next if nxt else rp.local)[self.index]


@dataclass
class VirtualPairCol:
    """constant + sum_i weight_i * column_i (ref: `virtual_column.rs:14`)."""

    column_weights: list  # [(PairCol, int weight)]
    constant: int = 0

    @staticmethod
    def single_main(index: int) -> "VirtualPairCol":
        return VirtualPairCol([(PairCol("main", index), 1)])

    @staticmethod
    def single_preprocessed(index: int) -> "VirtualPairCol":
        return VirtualPairCol([(PairCol("preprocessed", index), 1)])

    @staticmethod
    def constant_col(c: int) -> "VirtualPairCol":
        return VirtualPairCol([], c)

    @staticmethod
    def sum_main(indices) -> "VirtualPairCol":
        return VirtualPairCol([(PairCol("main", i), 1) for i in indices])

    def apply(self, builder, nxt: bool = False):
        acc = builder.constant(self.constant) if self.constant else None
        for col, w in self.column_weights:
            term = col.get(builder, nxt) * w
            acc = term if acc is None else acc + term
        return acc if acc is not None else builder.constant(0)


class SubAirBuilder:
    """Present a column window [start, start+width) of the outer builder's
    main trace as the whole main trace of a sub-AIR
    (ref: `sub_builder.rs:21`). Assertions flow through unchanged."""

    def __init__(self, inner, start: int, width: int):
        self.inner = inner
        self._start = start
        self._width = width

    def __getattr__(self, name):
        return getattr(self.inner, name)

    @property
    def main(self) -> RowPair:
        rp = self.inner.main
        s, w = self._start, self._width
        return RowPair(rp.local[s : s + w], rp.next[s : s + w])

    def main_block(self, start, shape, nxt=False):
        return self.inner.main_block(self._start + start, shape, nxt)
