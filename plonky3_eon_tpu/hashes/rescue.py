"""Rescue-Prime permutation, batched over TPU lanes.

Reference parity: the `p3-rescue` crate is listed in the reference's
README Status table but absent from the source tree (SURVEY.md §2.8), so
this implements the published Rescue-Prime construction (Szepieniec,
Ashur, Dhooghe 2020) with the same shape as the other permutations here:
alternating forward sbox x^alpha and inverse sbox x^(1/alpha) half-rounds
around an MDS layer, with additive round constants.

TPU-native design: both sboxes are fixed square-and-multiply chains
unrolled at trace time (the inverse exponent is ~|p| bits — ~45 fused
multiplies per round over the whole batch, still VPU-bound and branchless).
Rounds run as a Python loop over a small static count (Rescue uses few
rounds precisely because its inverse sbox gives degree coverage), so the
compiled program is straight-line.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..fields.field import Field
from .mds import CosetMds
from .poseidon2 import deterministic_constants, sbox_degree


class Rescue:
    """Rescue-XLIX / Rescue-Prime permutation over a prime field.

    permute: (batch, WIDTH) -> same shape.
    One round = [sbox x^a, MDS, +rc] then [sbox x^(1/a), MDS, +rc].
    """

    def __init__(
        self,
        F: Field,
        width: int,
        num_rounds: int = 8,
        alpha: int | None = None,
        mds=None,
        constants: np.ndarray | None = None,
    ):
        self.F = F
        self.width = width
        self.num_rounds = num_rounds
        self.alpha = alpha or sbox_degree(F.order)
        # x -> x^alpha is a bijection, so 1/alpha exists mod p-1
        self.inv_alpha = pow(self.alpha, -1, F.order - 1)
        self.mds = mds or CosetMds(F, width)
        if constants is None:
            constants = deterministic_constants(
                F, "rescue-prime", 2 * num_rounds * width
            ).reshape(2 * num_rounds, width)
        self.constants_int = np.asarray(
            constants, dtype=object if F.order >= (1 << 63) else np.uint64
        )
        self._consts = F.from_int_np(self.constants_int)

    @functools.partial(jax.jit, static_argnums=0)
    def permute(self, state):
        import jax.numpy as jnp

        F = self.F
        consts = jnp.asarray(self._consts)
        for r in range(self.num_rounds):
            state = F.exp_const(state, self.alpha)
            state = self.mds.permute(state)
            state = F.add(state, consts[2 * r][None])
            state = F.exp_const(state, self.inv_alpha)
            state = self.mds.permute(state)
            state = F.add(state, consts[2 * r + 1][None])
        return state

    def __call__(self, state):
        return self.permute(state)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
