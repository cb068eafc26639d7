"""FRI low-degree test + PCS (reference parity: removed upstream `p3-fri`;
SURVEY.md §2.8)."""

from .pcs import FriConfig, FriProof, TwoAdicFriPcs

__all__ = ["FriConfig", "FriProof", "TwoAdicFriPcs"]
