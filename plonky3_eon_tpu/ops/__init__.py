"""Polynomial / linear-algebra ops (reference parity: `dft/`, `matrix/`,
`interpolation/`, `field/src/batch_inverse.rs` — SURVEY.md §2.1)."""

from .dft import NaiveDft, Radix2Bowers, Radix2DFTSmallBatch, Radix2Dit, Radix2DitParallel, np_powers
from .matrix import flatten_to_base, to_extension

__all__ = [
    "Radix2Dit",
    "Radix2DitParallel",
    "Radix2Bowers",
    "Radix2DFTSmallBatch",
    "NaiveDft",
    "np_powers",
    "flatten_to_base",
    "to_extension",
]
