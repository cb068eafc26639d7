"""Constraint folders: evaluate an AIR and fold constraints with powers of
the RLC challenge alpha.

Reference parity: `uni-stark/src/folder.rs:16-121` (`ProverConstraintFolder`
with packed alpha-power linear combination) and `:45`
(`VerifierConstraintFolder` Horner accumulation).

TPU-native design: ONE folder class serves both sides. Values follow the
lanes-trailing layout of `air/array_builder.py` — (*block, [N,] [D]) — so
base arithmetic stays in the base field (4x cheaper than lifting everything
to EF) and only the alpha-fold touches EF, exactly the economy of the
reference's `packed_linear_combination` (`folder.rs:106-121`). Both sides
fold as sum_j alpha^j * C_j in assertion order, so prover and verifier agree
by construction. Under jit the whole fold traces into one fused XLA program.

Block constraints: a tensor block of K constraints is folded in ONE
contraction against a (K, D) table of consecutive alpha powers —
sum_k alpha^(j+k) C_{j+k} — instead of K sequential accumulations, keeping
the compiled program size independent of the AIR width (Keccak: 2633
columns; the reference monomorphizes ~4000 scalar constraints).
"""

from __future__ import annotations

import math

from ..air.array_builder import ArrayOpsMixin
from ..air.builder import BuilderBase


class ConstraintFolder(ArrayOpsMixin, BuilderBase):
    def __init__(self, F, EF, alpha, num_lanes=None):
        self.F = F
        self.EF = EF
        self.alpha = alpha  # EF scalar (D,)
        #: row-lane count (prover/debug) or None (verifier's single point)
        self.num_lanes = num_lanes
        self.alpha_pow = EF.ones(())  # running alpha^j
        self.accumulator = None  # EF array
        self._init_mats()
        self.public_values = []
        self.permutation_challenges = []
        self.is_first_row = None
        self.is_last_row = None
        self.is_transition = None

    # ---- alpha fold ----------------------------------------------------

    def _accumulate(self, v, ext):
        EF = self.EF
        bnd = v.ndim - self._tail_ndim(ext)
        if bnd <= 0:  # single constraint
            if ext:
                term = EF.mul(self.alpha_pow, v)
            else:
                # alpha_pow (D,) times base v ([N,]): coefficient-wise product
                term = self.F.mul(self.alpha_pow, v[..., None])
            self.alpha_pow = EF.mul(self.alpha_pow, self.alpha)
        else:  # block of K constraints: one contraction with alpha powers
            k = math.prod(v.shape[:bnd])
            v = v.reshape((k,) + v.shape[bnd:])  # (K, [N,] [D])
            pows = EF.mul(EF.powers(self.alpha, k), self.alpha_pow)  # (K, D)
            pw = pows.reshape((k, 1, EF.D) if self.num_lanes is not None else (k, EF.D))
            if ext:
                term = EF.sum(EF.mul(pw, v), axis=0)
            else:
                term = EF.sum(self.F.mul(v[..., None], pw), axis=0)
            self.alpha_pow = EF.mul(pows[-1], self.alpha)  # alpha_pow * alpha^K
        if self.accumulator is None:
            self.accumulator = term
        else:
            self.accumulator = EF.add(self.accumulator, term)

    def folded(self):
        if self.accumulator is None:
            return self.EF.zeros(())
        return self.accumulator
