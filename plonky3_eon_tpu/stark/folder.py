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

import jax

from ..air.array_builder import ArrayOpsMixin
from ..air.builder import BuilderBase


class ConstraintFolder(ArrayOpsMixin, BuilderBase):
    def __init__(self, F, EF, alpha, num_lanes=None, num_constraints=None):
        self.F = F
        self.EF = EF
        self.alpha = alpha  # EF scalar (D,)
        #: row-lane count (prover/debug) or None (verifier's single point)
        self.num_lanes = num_lanes
        #: total constraint count (from the symbolic pass): lets ONE shared
        #: alpha-power table serve every assert — without it each block
        #: assert traces its own log(K) power chain, which dominates compile
        #: time for wide AIRs (Blake3: ~170 block asserts)
        self._num_constraints = num_constraints
        self._pow_table = None
        self._ofs = 0
        self.alpha_pow = EF.ones(())  # running alpha^j (fallback path)
        self.accumulator = None  # EF array
        self._init_mats()
        self.public_values = []
        self.permutation_challenges = []
        self.is_first_row = None
        self.is_last_row = None
        self.is_transition = None

    # ---- alpha fold ----------------------------------------------------

    def _pows(self, k):
        """Next k consecutive alpha powers, (k, D)."""
        EF = self.EF
        if self._num_constraints is not None:
            if self._pow_table is None:
                self._pow_table = EF.powers(self.alpha, self._num_constraints)
            pw = jax.lax.slice_in_dim(self._pow_table, self._ofs, self._ofs + k)
            self._ofs += k
            return pw
        pw = EF.mul(EF.powers(self.alpha, k), self.alpha_pow)
        self.alpha_pow = EF.mul(pw[-1], self.alpha)
        return pw

    def _accumulate(self, v, ext):
        EF = self.EF
        bnd = v.ndim - self._tail_ndim(ext)
        if bnd <= 0:  # single constraint
            apow = self._pows(1)[0]
            if ext:
                term = EF.mul(apow, v)
            else:
                # alpha^j (EF) times a base lane value: the Algebra op
                term = EF.mul_base(apow, v)
        else:  # block of K constraints: one contraction with alpha powers
            k = math.prod(v.shape[:bnd])
            v = v.reshape((k,) + v.shape[bnd:])  # (K, [N,]) + field suffix
            pows = self._pows(k)  # (K,) + EF suffix
            if self.num_lanes is not None:
                pows = pows.reshape(pows.shape[:1] + (1,) + pows.shape[1:])
            if ext:
                term = EF.sum(EF.mul(pows, v), axis=0)
            else:
                term = EF.sum(EF.mul_base(pows, v), axis=0)
        if self.accumulator is None:
            self.accumulator = term
        else:
            self.accumulator = EF.add(self.accumulator, term)

    def folded(self):
        if self.accumulator is None:
            return self.EF.zeros(())
        return self.accumulator
