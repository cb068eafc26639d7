"""Mersenne31 circle STARK layer (reference parity: the removed upstream
`p3-circle` crate — CirclePcs + CFFT over the circle group of M31;
SURVEY.md §2.8). Re-derived from the Circle STARKs construction."""

from .group import circle_generator, domain_points, subgroup_gen
from .cfft import PairTables, cfft, icfft
