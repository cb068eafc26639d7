"""STARK engine (reference parity: `uni-stark/`, `eon-uni-stark/` —
SURVEY.md §2.6)."""

from .check import check_constraints
from .config import StarkConfig
from .folder import ConstraintFolder
from .proof import Commitments, OpenedValues, Proof
from .prover import prove, quotient_values
from .verifier import VerificationError, recompose_quotient_from_chunks, verify

__all__ = [
    "StarkConfig",
    "prove",
    "verify",
    "VerificationError",
    "Proof",
    "Commitments",
    "OpenedValues",
    "ConstraintFolder",
    "check_constraints",
    "quotient_values",
    "recompose_quotient_from_chunks",
]
