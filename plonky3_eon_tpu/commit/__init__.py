"""Commitment layer (reference parity: `commit/`, merkle tree MMCS —
SURVEY.md §2.4)."""

from .domain import Selectors, TwoAdicMultiplicativeCoset
from .merkle import DIGEST_WIDTH, ExtensionMmcs, MerkleProverData, MerkleTreeMmcs
from .pcs import Pcs, TrivialPcs, eval_coeffs_at_ext_point

__all__ = [
    "TwoAdicMultiplicativeCoset",
    "Selectors",
    "MerkleTreeMmcs",
    "ExtensionMmcs",
    "MerkleProverData",
    "DIGEST_WIDTH",
    "Pcs",
    "TrivialPcs",
    "eval_coeffs_at_ext_point",
]
