"""Constraint folders: evaluate an AIR and fold constraints with powers of
the RLC challenge alpha.

Reference parity: `uni-stark/src/folder.rs:16-121` (`ProverConstraintFolder`
with packed alpha-power linear combination) and `:45`
(`VerifierConstraintFolder` Horner accumulation).

TPU-native design: ONE folder class serves both sides. Values are either
base-field lane arrays (whole quotient domain, prover) or extension scalars
(out-of-domain point, verifier); the ext/base distinction is tracked per
expression so base arithmetic stays in the base field (4x cheaper than
lifting everything to EF) and only the alpha-fold touches EF — exactly the
economy of the reference's `packed_linear_combination` (`folder.rs:106-121`).
Both sides fold as sum_j alpha^j * C_j in assertion order, so the prover and
verifier agree by construction. Under jit the whole fold traces into one
fused XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..air.builder import BuilderBase
from ..air.expr import Expr, RowPair


class ConstraintFolder(BuilderBase):
    def __init__(
        self,
        F,
        EF,
        main: RowPair,
        public_values,
        is_first_row,
        is_last_row,
        is_transition,
        alpha,
        preprocessed: RowPair = None,
        permutation: RowPair = None,
        permutation_challenges=(),
    ):
        self.F = F
        self.EF = EF
        self.main = main
        self.preprocessed = preprocessed
        self.permutation = permutation
        self.public_values = public_values
        self.permutation_challenges = permutation_challenges
        self.is_first_row = is_first_row
        self.is_last_row = is_last_row
        self.is_transition = is_transition
        self.alpha = alpha  # EF scalar (D,)
        self.alpha_pow = EF.ones(())  # running alpha^j
        self.accumulator = None  # EF array

    # ---- ring callbacks ----------------------------------------------

    def _const(self, x):
        return self.F.from_int(int(x) % self.F.order)

    def _embed(self, v):
        return self.EF.from_base(v)

    def _add(self, a, b, ea, eb):
        if ea == eb:
            return (self.EF.add(a, b) if ea else self.F.add(a, b)), ea
        if ea:
            return self.EF.add(a, self._embed(b)), True
        return self.EF.add(self._embed(a), b), True

    def _sub(self, a, b, ea, eb):
        if ea == eb:
            return (self.EF.sub(a, b) if ea else self.F.sub(a, b)), ea
        if ea:
            return self.EF.sub(a, self._embed(b)), True
        return self.EF.sub(self._embed(a), b), True

    def _mul(self, a, b, ea, eb):
        if ea and eb:
            return self.EF.mul(a, b), True
        if ea:
            return self.EF.mul_base(a, b), True
        if eb:
            return self.EF.mul_base(b, a), True
        return self.F.mul(a, b), False

    def _neg(self, a, e):
        return (self.EF.neg(a) if e else self.F.neg(a)), e

    def _accumulate(self, v, ext):
        EF = self.EF
        if ext:
            term = EF.mul(self.alpha_pow, v)
        else:
            # alpha_pow (D,) times base v (...): coefficient-wise base product
            term = self.F.mul(self.alpha_pow, v[..., None])
        if self.accumulator is None:
            self.accumulator = term
        else:
            self.accumulator = EF.add(self.accumulator, term)
        self.alpha_pow = EF.mul(self.alpha_pow, self.alpha)

    def folded(self):
        if self.accumulator is None:
            return self.EF.zeros(())
        return self.accumulator
