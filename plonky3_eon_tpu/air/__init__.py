"""AIR framework (reference parity: `air/`, `eon-air/` — SURVEY.md §2.5)."""

from .air import BaseAir, andn, checked_xor, pack_bits_le, xor, xor3
from .builder import BuilderBase, FilteredBuilder
from .expr import Expr, RowPair
from .symbolic import SymbolicAirBuilder, get_log_quotient_degree, get_symbolic_constraints

__all__ = [
    "BaseAir",
    "BuilderBase",
    "FilteredBuilder",
    "Expr",
    "RowPair",
    "SymbolicAirBuilder",
    "get_symbolic_constraints",
    "get_log_quotient_degree",
    "pack_bits_le",
    "checked_xor",
    "xor",
    "xor3",
    "andn",
]
