"""MDS permutations + classic Poseidon.

Reference parity: `mds/src/lib.rs:15` (`MdsPermutation`),
`mds/src/coset_mds.rs:16` (`CosetMds` — Reed-Solomon based: interpret the
state as evaluations over a power-of-two subgroup, output evaluations over
the coset g*H, scaled by N since the Bowers networks skip 1/N),
`poseidon/src/lib.rs:18` (classic Poseidon with full + partial rounds over
a generic MDS layer).

TPU-native design: the reference's Bowers G / G^T in-register butterfly
networks are a cache-layout artifact; on TPU the same map is the fused
iDFT -> shift-scale -> DFT program of `ops/dft.py` batched over states
(states axis = lanes). Poseidon rounds run under lax.scan exactly like
Poseidon2 (`hashes/poseidon2.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field
from ..ops.dft import Radix2Dit, np_powers
from .poseidon2 import deterministic_constants


class CosetMds:
    """y = N * f(g * x_i) where the state holds f's evaluations on H
    (ref: `coset_mds.rs:16`; N-scaling because the reference skips 1/N)."""

    def __init__(self, F: Field, n: int):
        if n & (n - 1):
            raise ValueError(f"CosetMds width must be a power of two, got {n}")
        self.F = F
        self.n = n
        self.dft = Radix2Dit(F)
        self._spows = F.from_int_np(np_powers(F.generator_int, n, F.order))
        self._n_scale = F.from_int_np(np.asarray(n % F.order))

    @functools.partial(jax.jit, static_argnums=0)
    def permute(self, state):
        """state: (batch, N)+sfx -> same shape."""
        F = self.F
        x = jnp.swapaxes(state, 0, 1)  # DFT batches over columns: (N, batch)
        coeffs = self.dft.idft_batch(x)
        y = self.dft.coset_dft_batch(coeffs, jnp.asarray(self._spows))
        y = F.mul(y, jnp.broadcast_to(jnp.asarray(self._n_scale), y.shape))
        return jnp.swapaxes(y, 0, 1)

    def __call__(self, state):
        return self.permute(state)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class Poseidon:
    """Classic Poseidon permutation (full + partial rounds, generic MDS;
    ref: `poseidon/src/lib.rs:18`). Batched: (batch, WIDTH)."""

    def __init__(self, F: Field, width: int, mds=None, alpha: int | None = None,
                 half_num_full_rounds: int = 4, num_partial_rounds: int = 22,
                 constants: np.ndarray | None = None):
        from .poseidon2 import sbox_degree

        self.F = F
        self.width = width
        self.mds = mds or CosetMds(F, width)
        self.alpha = alpha or sbox_degree(F.order)
        self.half_full = half_num_full_rounds
        self.partial = num_partial_rounds
        num_rounds = 2 * half_num_full_rounds + num_partial_rounds
        if constants is None:
            constants = deterministic_constants(
                F, "poseidon-classic", num_rounds * width
            ).reshape(num_rounds, width)
        self.constants_int = np.asarray(constants, dtype=np.uint64)
        self._consts = F.from_int_np(self.constants_int)

    def _sbox(self, x):
        return self.F.exp_const(x, self.alpha)

    @functools.partial(jax.jit, static_argnums=0)
    def permute(self, state):
        F = self.F
        consts = jnp.asarray(self._consts)
        r = 0
        for _ in range(self.half_full):
            state = F.add(state, consts[r][None])
            state = self._sbox(state)
            state = self.mds.permute(state)
            r += 1
        for _ in range(self.partial):
            state = F.add(state, consts[r][None])
            s0 = self._sbox(state[:, 0])
            state = state.at[:, 0].set(s0)
            state = self.mds.permute(state)
            r += 1
        for _ in range(self.half_full):
            state = F.add(state, consts[r][None])
            state = self._sbox(state)
            state = self.mds.permute(state)
            r += 1
        return state

    def __call__(self, state):
        return self.permute(state)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
