"""LogUp lookup argument.

Reference parity: `lookup/src/lookup_traits.rs:42-270` (`LookupGadget`,
`Lookup` descriptor, `Kind`, `Direction`, `AirLookupHandler`) and
`lookup/src/logup.rs:60-563` (`LogUpGadget`: running-sum column, combined
element tuples, degree-cleared constraints, permutation trace generation).

TPU-native design:
  * Element/multiplicity expressions are builder-generic CALLABLES
    `fn(builder) -> Expr` instead of the reference's `SymbolicExpression`
    AST + interpreter (`symbolic_to_expr`, `lookup_traits.rs:387`): the same
    closure runs under the symbolic builder (degrees), the prover folder
    (whole-coset lanes), the verifier folder (one point), and the witness
    builder (whole-trace lanes) — closures are to jit tracing what the AST
    is to Rust monomorphization.
  * `generate_permutation` (ref: `logup.rs:379-563`) evaluates every
    element tuple over ALL rows at once (lanes-trailing arrays), does ONE
    batched extension-field inversion (the reference flattens into one
    `batch_multiplicative_inverse` — already the perfect TPU shape), and
    builds the running sum with a log-depth `associative_scan` mod-p
    cumulative sum instead of the reference's sequential row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

LOCAL = "local"  # Kind::Local; any other string is a Global interaction name

SEND = "send"        # contributes elements: negated multiplicity
RECEIVE = "receive"  # consumes elements: positive multiplicity


@dataclass
class Lookup:
    """One lookup argument (ref: `lookup_traits.rs:188` `Lookup`).

    kind: LOCAL or a global interaction name.
    element_exprs: list of tuples; each tuple is a list of callables
        (builder -> Expr) producing the tuple entries.
    multiplicity_exprs: one callable per tuple (signed per Direction).
    columns: [aux running-sum column index].
    """

    kind: str
    element_exprs: list
    multiplicity_exprs: list
    columns: list


@dataclass
class LookupData:
    """Prover-supplied cumulative value for a Global lookup
    (ref: `lookup_traits.rs` LookupData)."""

    name: str
    aux_idx: int
    expected_cumulated: np.ndarray = None  # (D,) EF value


def _signed(mult_fn, direction):
    if direction == SEND:
        return lambda b: -mult_fn(b)
    return mult_fn


class LogUpGadget:
    """Running-sum LogUp gadget (ref: `logup.rs:60`).

    Proves sum_i m_i / (alpha - combine_beta(tuple_i)) == 0 (Local) or
    == expected_cumulated (Global) with constraints cleared to polynomial
    form by the common denominator:
      s[0] = 0 (first row);
      (s[i+1] - s[i]) * prod_t(alpha - e_t) = sum_t m_t * prod_{u != t}(...)
      applied on all rows for Local (wraparound telescopes to 0), on
      transitions for Global, plus a last-row cumulative anchor.
    """

    NUM_AUX_COLS = 1
    NUM_CHALLENGES = 2  # alpha (running sum), beta (tuple fold)

    # ---- constraint evaluation (any builder) ---------------------------

    def _combined_terms(self, builder, lookup, alpha, beta):
        """[(alpha - sum_j e_{t,j} beta^(n-1-j))] per tuple
        (ref: `logup.rs:70-92` combine_elements)."""
        terms = []
        for tup in lookup.element_exprs:
            acc = None
            for e_fn in tup:
                e = e_fn(builder)
                acc = e if acc is None else e + acc * beta
            terms.append(alpha - acc)
        return terms

    def _sum_terms(self, builder, lookup, alpha, beta):
        """(numerator, common_denominator) of sum_t m_t/(alpha - e_t)
        (ref: `logup.rs:97-142` via prefix/suffix products)."""
        terms = self._combined_terms(builder, lookup, alpha, beta)
        n = len(terms)
        mults = [m_fn(builder) for m_fn in lookup.multiplicity_exprs]
        pref = [None] * (n + 1)  # pref[i] = prod_{j < i} terms[j]
        for i in range(n):
            pref[i + 1] = terms[i] if pref[i] is None else pref[i] * terms[i]
        suff = [None] * (n + 1)
        for i in reversed(range(n)):
            suff[i] = terms[i] if suff[i + 1] is None else suff[i + 1] * terms[i]
        denom = pref[n]
        numer = None
        for i in range(n):
            t = mults[i]
            if pref[i] is not None:
                t = t * pref[i]
            if suff[i + 1] is not None:
                t = t * suff[i + 1]
            numer = t if numer is None else numer + t
        return numer, denom

    def eval_lookups(self, builder, lookups, lookup_data=()):
        """Append all lookup constraints (ref: `lookup_traits.rs:85-122`
        eval_lookups + `logup.rs:154-263` eval_update)."""
        data_iter = iter(lookup_data)
        for lk in lookups:
            col = lk.columns[0]
            alpha = builder.permutation_challenges[self.NUM_CHALLENGES * col]
            beta = builder.permutation_challenges[self.NUM_CHALLENGES * col + 1]
            s_local = builder.permutation.local[col]
            s_next = builder.permutation.next[col]
            builder.when_first_row().assert_zero_ext(s_local)
            numer, denom = self._sum_terms(builder, lk, alpha, beta)
            if lk.kind == LOCAL:
                # all rows: wraparound telescopes the total to zero
                builder.assert_zero_ext((s_next - s_local) * denom - numer)
            else:
                ld = next(data_iter)
                assert ld.aux_idx == col, "lookup_data not sorted by aux index"
                expected = builder.ext_constant(ld.expected_cumulated)
                builder.when_transition().assert_zero_ext(
                    (s_next - s_local) * denom - numer
                )
                builder.when_last_row().assert_zero_ext(
                    (expected - s_local) * denom - numer
                )

    # ---- witness generation (vectorized; ref: logup.rs:379-563) ---------

    def generate_permutation(self, F, EF, trace, public_values, lookups,
                             permutation_challenges, preprocessed=None):
        """Build the (N, num_lookups) EF aux trace and the global cumulative
        values. Returns (perm_flat (N, W*D) base device array, lookup_data).

        All rows are evaluated at once: the element closures run under a
        whole-trace array builder, denominators get ONE batched EF
        inversion, and the running sums are an exclusive log-depth
        mod-p cumulative scan.
        """
        from ..stark.check import DebugConstraintBuilder

        n = trace.shape[0]
        b = DebugConstraintBuilder(F, EF, trace, public_values, preprocessed)
        cols = []
        lookup_data = []
        for lk in lookups:
            col = lk.columns[0]
            alpha = permutation_challenges[self.NUM_CHALLENGES * col]
            beta = permutation_challenges[self.NUM_CHALLENGES * col + 1]
            alpha_e = b.ext_constant(alpha)
            beta_e = b.ext_constant(beta)
            terms = self._combined_terms(b, lk, alpha_e, beta_e)  # T x (N, D)
            denoms = jnp.stack([t.v if t.ext else EF.from_base(t.v) for t in terms])
            invs = EF.inv(denoms)  # ONE batched inversion, (T, N, D)
            contrib = None  # (N, D)
            for i, m_fn in enumerate(lk.multiplicity_exprs):
                m = m_fn(b)
                term = EF.mul(m.v, invs[i]) if m.ext else EF.mul_base(invs[i], m.v)
                contrib = term if contrib is None else EF.add(contrib, term)
            inclusive = _mod_cumsum(F, contrib, axis=0)  # (N, D)
            s = jnp.concatenate(
                [jnp.zeros((1, EF.D), contrib.dtype), inclusive[:-1]], axis=0
            )
            cols.append(s)
            if lk.kind != LOCAL:
                lookup_data.append(
                    LookupData(lk.kind, col, np.asarray(inclusive[-1]))
                )
        # (N, W, D) -> flatten EF coefficients into base columns (N, W*D)
        perm = jnp.stack(cols, axis=1)
        return perm.reshape(n, -1), lookup_data

    def verify_global_final_value(self, F, EF, all_expected_cumulated) -> bool:
        """sum over AIRs of each interaction's cumulative == 0
        (ref: `logup.rs:320-333`)."""
        if not all_expected_cumulated:
            return True
        total = None
        for v in all_expected_cumulated:
            v = jnp.asarray(v)
            total = v if total is None else EF.add(total, v)
        return not np.asarray(total).any()


def _mod_cumsum(F, a, axis=0):
    """Inclusive cumulative sum in F along an axis (log-depth scan; the
    running-sum analogue of the reference's sequential accumulation)."""
    return jax.lax.associative_scan(F.add, a, axis=axis)
