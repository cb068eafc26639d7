"""Univariate STARK verifier.

Reference parity: `uni-stark/src/verifier.rs:27-125,193-415` (`verify`,
`recompose_quotient_from_chunks`, `verify_constraints`); call stack in
SURVEY.md §3.2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..air.expr import Expr, RowPair
from ..air.symbolic import get_log_quotient_degree, get_symbolic_constraints
from .folder import ConstraintFolder


class VerificationError(Exception):
    pass


def _basis_element(EF, e: int):
    z = np.zeros(EF.D, dtype=np.uint64)
    z[e] = 1
    return EF.from_int(z)


def recompose_quotient_from_chunks(EF, chunk_domains, chunk_values, zeta):
    """quotient(zeta) = sum_i zps_i(zeta) * sum_e basis_e * c_{i,e}
    with zps_i = prod_{j != i} Z_j(zeta) / Z_j(first_point(D_i))
    (ref: `verifier.rs:27-67`)."""
    F = chunk_domains[0].F
    p = F.order
    z_at_zeta = [d.vanishing_poly_at_point_ext(EF, zeta) for d in chunk_domains]
    quotient = None
    for i, (domain_i, chunk) in enumerate(zip(chunk_domains, chunk_values)):
        # denominator: prod_{j != i} Z_j(sample of D_i) — exact host math,
        # via the domain protocol (multiplicative cosets AND circle
        # twin-cosets implement vanishing_at_domain_sample)
        denom = 1
        for j, dj in enumerate(chunk_domains):
            if j == i:
                continue
            denom = (denom * dj.vanishing_at_domain_sample(domain_i)) % p
        denom_inv = F.from_int(pow(denom, p - 2, p))
        zps = None
        for j in range(len(chunk_domains)):
            if j == i:
                continue
            zps = z_at_zeta[j] if zps is None else EF.mul(zps, z_at_zeta[j])
        if zps is None:
            zps = EF.ones(())
        zps = EF.mul_base(zps, denom_inv)
        val = None
        for e in range(EF.D):
            t = EF.mul(_basis_element(EF, e), jnp.asarray(chunk[e]))
            val = t if val is None else EF.add(val, t)
        term = EF.mul(zps, val)
        quotient = term if quotient is None else EF.add(quotient, term)
    return quotient


def verify_constraints(air, F, EF, trace_local, trace_next, public_values,
                       trace_domain, zeta, alpha, quotient,
                       preprocessed_local=None, preprocessed_next=None,
                       num_constraints=None):
    """Evaluate the AIR at zeta and check folded * Z^-1 == quotient
    (ref: `verifier.rs:74-125`)."""
    sels = trace_domain.selectors_at_point_ext(EF, zeta)
    folder = ConstraintFolder(F, EF, alpha, num_lanes=None, num_constraints=num_constraints)
    folder.set_main(jnp.asarray(trace_local), jnp.asarray(trace_next), ext=True)
    if preprocessed_local is not None:
        folder.set_preprocessed(
            jnp.asarray(preprocessed_local), jnp.asarray(preprocessed_next), ext=True
        )
    folder.public_values = [
        Expr(folder, F.from_int(int(pv)), False)
        for pv in np.asarray(public_values).reshape(-1)
    ]
    folder.is_first_row = Expr(folder, sels.is_first_row, True)
    folder.is_last_row = Expr(folder, sels.is_last_row, True)
    folder.is_transition = Expr(folder, sels.is_transition, True)
    air.eval(folder)
    folded = folder.folded()
    lhs = EF.mul(folded, sels.inv_vanishing)
    if not np.array_equal(np.asarray(lhs), np.asarray(quotient)):
        raise VerificationError("out-of-domain evaluation mismatch")


def verify(config, air, proof, public_values=()):
    """Verify a uni-stark proof (ref: `verifier.rs:193` `verify`)."""
    F, EF, pcs = config.F, config.EF, config.pcs
    public_values = np.asarray(
        [int(v) for v in np.asarray(public_values, dtype=object).reshape(-1)],
        dtype=object,
    )
    ov = proof.opened_values
    # ZK (ref: `verifier.rs:244-262,303-325`): degree_bits counts the
    # EXTENDED (randomized) trace degree; constraint selectors use the
    # initial size-n domain; the random round R is replayed as round 0.
    zk = 1 if getattr(pcs, "ZK", False) else 0
    log_ext_degree = proof.degree_bits
    log_n = log_ext_degree - zk
    n = 1 << log_n
    ext_n = 1 << log_ext_degree

    from ..utils import log2_ceil

    degrees = get_symbolic_constraints(air, len(public_values))
    num_constraints = len(degrees)
    lqd = log2_ceil(max(max(degrees, default=2) + zk - 1, 1))
    quotient_degree = 1 << lqd

    trace_domain = pcs.natural_domain_for_degree(n)
    ext_domain = pcs.natural_domain_for_degree(ext_n) if zk else trace_domain
    quotient_domain = ext_domain.create_disjoint_domain(ext_n * quotient_degree)
    num_chunks = quotient_domain.size // trace_domain.size
    chunk_domains = quotient_domain.split_domains(num_chunks)

    # ---- shape checks (ref: verifier.rs:258-279) ----------------------
    row_shape = (air.width, EF.D) + F.shape_suffix
    if np.asarray(ov.trace_local).shape != row_shape:
        raise VerificationError("bad trace_local shape")
    if np.asarray(ov.trace_next).shape != row_shape:
        raise VerificationError("bad trace_next shape")
    if len(ov.quotient_chunks) != num_chunks:
        raise VerificationError("bad quotient chunk count")
    for c in ov.quotient_chunks:
        if np.asarray(c).shape != (EF.D, EF.D) + F.shape_suffix:
            raise VerificationError("bad quotient chunk shape")
    if bool(zk) != (ov.random is not None) or bool(zk) != (
        proof.commitments.random is not None
    ):
        raise VerificationError("random round present iff ZK")
    if zk and np.asarray(ov.random).shape != (EF.D, EF.D) + F.shape_suffix:
        raise VerificationError("bad random opening shape")

    # ---- replay transcript -------------------------------------------
    challenger = config.new_challenger()
    if zk:
        challenger.observe_ints([log_ext_degree])
    challenger.observe_ints([log_n])
    pcs.observe_commitment(challenger, proof.commitments.trace)
    if len(public_values):
        challenger.observe(F.from_int(public_values))
    alpha = challenger.sample_ext(EF)
    pcs.observe_commitment(challenger, proof.commitments.quotient_chunks)
    if zk:
        pcs.observe_commitment(challenger, proof.commitments.random)
    zeta = challenger.sample_ext(EF)
    zeta_next = trace_domain.next_point_ext(EF, zeta)

    # ---- PCS verification --------------------------------------------
    rounds = [
        (
            proof.commitments.trace,
            [
                (
                    ext_domain,
                    [
                        (zeta, jnp.asarray(ov.trace_local)),
                        (zeta_next, jnp.asarray(ov.trace_next)),
                    ],
                )
            ],
        ),
        (
            proof.commitments.quotient_chunks,
            [
                (dom, [(zeta, jnp.asarray(ov.quotient_chunks[i]))])
                for i, dom in enumerate(chunk_domains)
            ],
        ),
    ]
    if zk:
        rounds.insert(
            0,
            (
                proof.commitments.random,
                [(ext_domain, [(zeta, jnp.asarray(ov.random))])],
            ),
        )
    pcs.verify(rounds, proof.opening_proof, challenger)

    # ---- constraint check at zeta ------------------------------------
    quotient = recompose_quotient_from_chunks(EF, chunk_domains, ov.quotient_chunks, zeta)
    verify_constraints(
        air, F, EF, ov.trace_local, ov.trace_next, public_values,
        trace_domain, zeta, alpha, quotient, num_constraints=num_constraints,
    )
