"""Multi-chip scaling (TPU-native replacement for the reference's
SIMD+rayon parallelism — SURVEY.md §5.8)."""

from .dist import make_mesh, sharded_merkle_leaves, sharded_prove_core

__all__ = ["make_mesh", "sharded_prove_core", "sharded_merkle_leaves"]
