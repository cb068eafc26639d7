"""Eon engine: uni-stark extended with a LogUp permutation (auxiliary)
trace phase.

Reference parity: `eon-air/src/air.rs:29` (`EonAir` super-trait:
BaseAir + public values + lookup registration), `eon-air/src/builder.rs:36`
(`EonAirBuilder` — our builders already expose permutation/challenges, so no
separate trait is needed), `eon-uni-stark/src/prover.rs:28` and
`verifier.rs:143-496` (the extra commit/challenge rounds; call stack in
SURVEY.md §3.3).

Improvement over the reference: the reference's `Proof` does not transport
global-lookup cumulative values (`eon-uni-stark/src/proof.rs:19-44`), so its
verifier passes `lookup_data = None` (`verifier.rs:496`) and only Local
lookups verify end-to-end. Here `Proof.lookup_data` carries them (bound into
the Fiat-Shamir transcript right after the permutation commitment), the
single-proof verifier checks the per-AIR constraints against them, and
`verify_global_interactions` aggregates the Σ=0 check across proofs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..air.air import BaseAir
from ..air.symbolic import SymbolicAirBuilder
from ..lookup import LOCAL, LogUpGadget, Lookup, LookupData, _signed
from ..stark.check import check_constraints
from ..stark.folder import ConstraintFolder
from ..stark.proof import Commitments, OpenedValues, Proof
from ..stark.prover import quotient_values
from ..stark.verifier import (
    VerificationError,
    recompose_quotient_from_chunks,
)
from ..utils import log2_ceil, log2_strict


class EonAir(BaseAir):
    """AIR with lookup registration (ref: `eon-air/src/air.rs:29` EonAir +
    `lookup_traits.rs:223` AirLookupHandler). Subclasses call
    `register_lookup` during __init__; prover and verifier re-derive the
    same descriptors by constructing the same AIR."""

    def __init__(self):
        self._lookups: list = []
        self._num_aux_cols = 0

    def add_lookup_columns(self, gadget_cols: int = 1) -> list:
        cols = list(range(self._num_aux_cols, self._num_aux_cols + gadget_cols))
        self._num_aux_cols += gadget_cols
        return cols

    def register_lookup(self, kind: str, inputs) -> Lookup:
        """inputs: iterable of (elements, multiplicity, direction) with
        elements a list of callables (builder -> Expr), multiplicity a
        callable, direction SEND/RECEIVE (ref: `lookup_traits.rs:229-248`)."""
        element_exprs = [list(tup) for tup, _, _ in inputs]
        mult_exprs = [_signed(m, d) for _, m, d in inputs]
        lk = Lookup(kind, element_exprs, mult_exprs, self.add_lookup_columns())
        self._lookups.append(lk)
        return lk

    def get_lookups(self) -> list:
        return list(self._lookups)


class _WithLookups:
    """Adapter: eval = air.eval + gadget.eval_lookups — run identically by
    the symbolic builder, the prover folder, and the verifier folder."""

    def __init__(self, air, lookups, lookup_data, gadget):
        self.air = air
        self.width = air.width
        self.lookups = lookups
        self.lookup_data = lookup_data
        self.gadget = gadget
        # Stable identity for the fold-program cache (stark/prover.py):
        # the wrapped air (strong ref, not id()) plus the global-lookup
        # cumulative values, which are baked as constants into the traced
        # program and so must bust the cache when they change.
        self.cache_identity = (
            air,
            tuple(bytes(np.asarray(ld.expected_cumulated)) for ld in lookup_data),
        )

    def preprocessed_trace(self):
        return self.air.preprocessed_trace()

    def eval(self, builder):
        self.air.eval(builder)
        if self.lookups:
            self.gadget.eval_lookups(builder, self.lookups, self.lookup_data)


def symbolic_degrees(air, num_public_values, lookups, lookup_data, gadget) -> list:
    """Constraint degree multiples including lookups
    (ref: `eon-uni-stark/src/symbolic_builder.rs:32-60`)."""
    b = SymbolicAirBuilder(
        air.width,
        num_public_values,
        permutation_width=gadget.NUM_AUX_COLS * len(lookups),
        num_challenges=gadget.NUM_CHALLENGES * len(lookups),
    )
    _WithLookups(air, lookups, lookup_data, gadget).eval(b)
    return b.constraint_degrees


def get_log_quotient_degree(air, num_public_values, lookups, lookup_data, gadget) -> int:
    degrees = symbolic_degrees(air, num_public_values, lookups, lookup_data, gadget)
    return log2_ceil(max(max(degrees, default=2) - 1, 1))


def _alloc_challenges(challenger, EF, gadget, all_lookups):
    """Sample lookup challenges AFTER all trace commitments are bound.

    Global interactions must use the SAME (alpha, beta) pair in every AIR
    they touch, or the LogUp sums don't telescope across proofs — the
    reference never wires this up (its verifier runs with
    `lookup_data = None`, SURVEY.md §2.5); here shared pairs are sampled
    once per interaction name (sorted), then per-instance pairs for Local
    lookups, and each instance gets its challenge vector indexed by aux
    column."""
    names = sorted({lk.kind for lks in all_lookups for lk in lks if lk.kind != LOCAL})
    shared = {
        name: [challenger.sample_ext(EF) for _ in range(gadget.NUM_CHALLENGES)]
        for name in names
    }
    per_instance = []
    for lks in all_lookups:
        chs = [None] * (gadget.NUM_CHALLENGES * len(lks))
        for lk in lks:
            col = lk.columns[0]
            pair = (
                shared[lk.kind]
                if lk.kind != LOCAL
                else [challenger.sample_ext(EF) for _ in range(gadget.NUM_CHALLENGES)]
            )
            for j, c in enumerate(pair):
                chs[gadget.NUM_CHALLENGES * col + j] = c
        per_instance.append(chs)
    return per_instance


def prove_batch(config, instances, gadget=None, check_witness: bool = False):
    """Prove a batch of AIR instances over ONE shared transcript, so global
    (cross-AIR) lookup interactions share their challenges.

    instances: list of (air, trace, public_values). Returns a list of
    Proofs; pass them together to `verify_batch` /
    `verify_global_interactions`. (Single-instance use = `prove`.)
    Call stack per instance follows `eon-uni-stark/src/prover.rs:28`,
    SURVEY.md §3.3."""
    F, EF, pcs = config.F, config.EF, config.pcs
    gadget = gadget or LogUpGadget()
    challenger = config.new_challenger()

    preps = []
    for air, trace, public_values in instances:
        n = int(trace.shape[0])
        log_n = log2_strict(n)
        pvs = np.asarray(public_values, dtype=np.uint64).reshape(-1)
        trace_domain = pcs.natural_domain_for_degree(n)
        trace_com, trace_data = pcs.commit([(trace_domain, trace)])
        challenger.observe_ints([log_n])
        pcs.observe_commitment(challenger, trace_com)
        if len(pvs):
            challenger.observe(F.from_int(pvs))
        preps.append((air, trace, pvs, log_n, trace_domain, trace_com, trace_data))

    all_lookups = [air.get_lookups() for air, _, _ in instances]
    per_chs = _alloc_challenges(challenger, EF, gadget, all_lookups)

    # permutation phase per instance: build + commit aux traces, bind
    # cumulatives, all BEFORE sampling the RLC alpha
    perm_phase = []
    for (air, trace, pvs, log_n, trace_domain, trace_com, trace_data), lookups, chs in zip(
        preps, all_lookups, per_chs
    ):
        perm_flat, lookup_data = gadget.generate_permutation(
            F, EF, trace, pvs, lookups, chs
        )
        if check_witness:
            check_constraints(
                _WithLookups(air, lookups, lookup_data, gadget), F, EF, trace,
                pvs, permutation=perm_flat, permutation_challenges=chs,
            )
        perm_com, perm_data = pcs.commit([(trace_domain, perm_flat)])
        pcs.observe_commitment(challenger, perm_com)
        for ld in lookup_data:  # bind prover-supplied cumulatives
            challenger.observe(jnp.asarray(ld.expected_cumulated))
        perm_phase.append((perm_com, perm_data, lookup_data))

    alpha = challenger.sample_ext(EF)

    proofs = []
    for (air, trace, pvs, log_n, trace_domain, trace_com, trace_data), lookups, chs, (
        perm_com, perm_data, lookup_data
    ) in zip(preps, all_lookups, per_chs, perm_phase):
        n = 1 << log_n
        eon_air = _WithLookups(air, lookups, lookup_data, gadget)
        degrees = symbolic_degrees(air, len(pvs), lookups, lookup_data, gadget)
        num_constraints = len(degrees)
        lqd = log2_ceil(max(max(degrees, default=2) - 1, 1))
        quotient_degree = 1 << lqd
        quotient_domain = trace_domain.create_disjoint_domain(n * quotient_degree)
        trace_lde = pcs.get_evaluations_on_domain(trace_data, 0, quotient_domain)
        perm_lde = pcs.get_evaluations_on_domain(perm_data, 0, quotient_domain)

        q_vals = quotient_values(
            eon_air, F, EF, trace_domain, quotient_domain, trace_lde, pvs,
            alpha, permutation_lde=perm_lde,
            permutation_challenges=jnp.stack(chs),
            num_constraints=num_constraints, mesh=getattr(pcs, "mesh", None),
        )
        q_flat = q_vals.reshape(quotient_domain.size, EF.D)
        q_com, q_data = pcs.commit_quotient(quotient_domain, q_flat, quotient_degree)
        pcs.observe_commitment(challenger, q_com)

        zeta = challenger.sample_ext(EF)
        zeta_next = trace_domain.next_point_ext(EF, zeta)

        opened, opening_proof = pcs.open(
            [
                (trace_data, [[zeta, zeta_next]]),
                (perm_data, [[zeta, zeta_next]]),
                (q_data, [[zeta]] * quotient_degree),
            ],
            challenger,
        )
        proofs.append(
            Proof(
                commitments=Commitments(
                    trace=trace_com, quotient_chunks=q_com, permutation=perm_com
                ),
                opened_values=OpenedValues(
                    trace_local=np.asarray(opened[0][0][0]),
                    trace_next=np.asarray(opened[0][0][1]),
                    quotient_chunks=[
                        np.asarray(opened[2][i][0]) for i in range(quotient_degree)
                    ],
                    permutation_local=np.asarray(opened[1][0][0]),
                    permutation_next=np.asarray(opened[1][0][1]),
                ),
                opening_proof=opening_proof,
                degree_bits=log_n,
                lookup_data=lookup_data,
            )
        )
    return proofs


def prove(config, air: EonAir, trace, public_values=(), gadget=None,
          check_witness: bool = False):
    """Prove one AIR with the LogUp permutation phase
    (ref: `eon-uni-stark/src/prover.rs:28`)."""
    return prove_batch(
        config, [(air, trace, public_values)], gadget, check_witness
    )[0]


def verify_batch(config, instances, proofs, gadget=None):
    """Verify a batch proved by `prove_batch`: same shared transcript, plus
    the cross-proof global-interaction sum check.

    instances: list of (air, public_values) in proving order."""
    F, EF, pcs = config.F, config.EF, config.pcs
    gadget = gadget or LogUpGadget()
    challenger = config.new_challenger()

    metas = []
    for (air, public_values), proof in zip(instances, proofs):
        pvs = np.asarray(public_values, dtype=np.uint64).reshape(-1)
        log_n = proof.degree_bits
        challenger.observe_ints([log_n])
        pcs.observe_commitment(challenger, proof.commitments.trace)
        if len(pvs):
            challenger.observe(F.from_int(pvs))
        metas.append((air, pvs, proof))

    all_lookups = [air.get_lookups() for air, _ in instances]
    per_chs = _alloc_challenges(challenger, EF, gadget, all_lookups)

    for (air, pvs, proof), lookups in zip(metas, all_lookups):
        lookup_data = proof.lookup_data or []
        num_globals = sum(1 for lk in lookups if lk.kind != LOCAL)
        if len(lookup_data) != num_globals:
            raise VerificationError("wrong number of global-lookup cumulative values")
        pcs.observe_commitment(challenger, proof.commitments.permutation)
        for ld in lookup_data:
            challenger.observe(jnp.asarray(ld.expected_cumulated))

    alpha = challenger.sample_ext(EF)

    for (air, pvs, proof), lookups, chs in zip(metas, all_lookups, per_chs):
        _verify_instance(config, air, proof, pvs, lookups, chs, alpha, challenger, gadget)

    if not verify_global_interactions(F, EF, proofs, gadget):
        raise VerificationError("global lookup interactions do not sum to zero")


def verify(config, air: EonAir, proof, public_values=(), gadget=None):
    """Verify a single eon proof (ref: `eon-uni-stark/src/verifier.rs:143`).
    Note: a single proof with global lookups only checks internal
    consistency; the Σ=0 cross-AIR check needs the full batch
    (`verify_batch` / `verify_global_interactions`)."""
    _verify_single_no_global_sum(
        config, air, proof, public_values, gadget or LogUpGadget()
    )


def _verify_single_no_global_sum(config, air, proof, public_values, gadget):
    """Single-proof verify without the cross-proof Σ=0 check (a lone proof
    with global lookups is internally consistent but needs its peers)."""
    F, EF, pcs = config.F, config.EF, config.pcs
    challenger = config.new_challenger()
    pvs = np.asarray(public_values, dtype=np.uint64).reshape(-1)
    challenger.observe_ints([proof.degree_bits])
    pcs.observe_commitment(challenger, proof.commitments.trace)
    if len(pvs):
        challenger.observe(F.from_int(pvs))
    lookups = air.get_lookups()
    chs = _alloc_challenges(challenger, EF, gadget, [lookups])[0]
    lookup_data = proof.lookup_data or []
    num_globals = sum(1 for lk in lookups if lk.kind != LOCAL)
    if len(lookup_data) != num_globals:
        raise VerificationError("wrong number of global-lookup cumulative values")
    pcs.observe_commitment(challenger, proof.commitments.permutation)
    for ld in lookup_data:
        challenger.observe(jnp.asarray(ld.expected_cumulated))
    alpha = challenger.sample_ext(EF)
    _verify_instance(config, air, proof, pvs, lookups, chs, alpha, challenger, gadget)


def _verify_instance(config, air, proof, public_values, lookups, perm_challenges,
                     alpha, challenger, gadget):
    """Shared per-proof verification body (transcript positions for the
    quotient commitment, zeta, PCS rounds, and the OOD constraint check)."""
    F, EF, pcs = config.F, config.EF, config.pcs
    ov = proof.opened_values
    log_n = proof.degree_bits
    n = 1 << log_n
    lookup_data = proof.lookup_data or []

    degrees = symbolic_degrees(air, len(public_values), lookups, lookup_data, gadget)
    num_constraints = len(degrees)
    lqd = log2_ceil(max(max(degrees, default=2) - 1, 1))
    quotient_degree = 1 << lqd
    perm_width = gadget.NUM_AUX_COLS * len(lookups)

    # shape checks (verifier.rs:267-279 analogue)
    if np.asarray(ov.trace_local).shape != (air.width, EF.D):
        raise VerificationError("bad trace_local shape")
    if np.asarray(ov.trace_next).shape != (air.width, EF.D):
        raise VerificationError("bad trace_next shape")
    if np.asarray(ov.permutation_local).shape != (perm_width * EF.D, EF.D):
        raise VerificationError("bad permutation_local shape")
    if len(ov.quotient_chunks) != quotient_degree:
        raise VerificationError("bad quotient chunk count")

    trace_domain = pcs.natural_domain_for_degree(n)
    quotient_domain = trace_domain.create_disjoint_domain(n * quotient_degree)
    chunk_domains = quotient_domain.split_domains(quotient_degree)

    pcs.observe_commitment(challenger, proof.commitments.quotient_chunks)
    zeta = challenger.sample_ext(EF)
    zeta_next = trace_domain.next_point_ext(EF, zeta)

    rounds = [
        (
            proof.commitments.trace,
            [(trace_domain, [(zeta, jnp.asarray(ov.trace_local)),
                             (zeta_next, jnp.asarray(ov.trace_next))])],
        ),
        (
            proof.commitments.permutation,
            [(trace_domain, [(zeta, jnp.asarray(ov.permutation_local)),
                             (zeta_next, jnp.asarray(ov.permutation_next))])],
        ),
        (
            proof.commitments.quotient_chunks,
            [(dom, [(zeta, jnp.asarray(ov.quotient_chunks[i]))])
             for i, dom in enumerate(chunk_domains)],
        ),
    ]
    pcs.verify(rounds, proof.opening_proof, challenger)

    quotient = recompose_quotient_from_chunks(EF, chunk_domains, ov.quotient_chunks, zeta)

    # constraint check at zeta — permutation openings are flattened base
    # columns opened as EF values; regroup (W*D, D) -> per-column (D, D)
    # EF-coefficient stacks and recombine into EF elements
    sels = trace_domain.selectors_at_point_ext(EF, zeta)
    eon_air = _WithLookups(air, lookups, lookup_data, gadget)
    folder = ConstraintFolder(F, EF, alpha, num_lanes=None, num_constraints=num_constraints)
    folder.set_main(jnp.asarray(ov.trace_local), jnp.asarray(ov.trace_next), ext=True)
    perm_local = _regroup_perm(EF, np.asarray(ov.permutation_local))
    perm_next = _regroup_perm(EF, np.asarray(ov.permutation_next))
    folder.set_permutation(perm_local, perm_next)
    folder.permutation_challenges = [
        folder.ext_constant(c) for c in perm_challenges
    ]
    from ..air.expr import Expr

    folder.public_values = [
        Expr(folder, F.from_int(int(pv)), False) for pv in public_values
    ]
    folder.is_first_row = Expr(folder, sels.is_first_row, True)
    folder.is_last_row = Expr(folder, sels.is_last_row, True)
    folder.is_transition = Expr(folder, sels.is_transition, True)
    eon_air.eval(folder)
    lhs = EF.mul(folder.folded(), sels.inv_vanishing)
    if not np.array_equal(np.asarray(lhs), np.asarray(quotient)):
        raise VerificationError("out-of-domain evaluation mismatch")


def _regroup_perm(EF, flat_opened):
    """(W*D, D) openings of the flattened aux columns at zeta -> (W, D) EF
    values: sum_e basis_e * opened[c*D + e] (the flattened base columns are
    the EF coefficients; ref: `eon-uni-stark/src/prover.rs:618-650`)."""
    import jax.numpy as jnp

    w = flat_opened.shape[0] // EF.D
    out = []
    basis = [EF.from_int(np.eye(EF.D, dtype=np.uint64)[e]) for e in range(EF.D)]
    for c in range(w):
        acc = None
        for e in range(EF.D):
            t = EF.mul(basis[e], jnp.asarray(flat_opened[c * EF.D + e]))
            acc = t if acc is None else EF.add(acc, t)
        out.append(acc)
    return jnp.stack(out)


def verify_global_interactions(F, EF, proofs, gadget=None) -> bool:
    """Cross-AIR check: per global interaction name, the cumulative values
    from all proofs sum to zero (ref: `logup.rs:320-333`
    verify_global_final_value — exercised only at gadget level in the
    reference; here a first-class API)."""
    gadget = gadget or LogUpGadget()
    by_name: dict = {}
    for proof in proofs:
        for ld in proof.lookup_data or []:
            by_name.setdefault(ld.name, []).append(ld.expected_cumulated)
    return all(
        gadget.verify_global_final_value(F, EF, vals) for vals in by_name.values()
    )
