"""Preprocessed-trace support: one-time setup reused across proofs.

Reference parity: `uni-stark/src/preprocessed.rs:12,31,47`
(`PreprocessedProverData` / `PreprocessedVerifierKey` / `setup_preprocessed`)
and `prove_with_preprocessed` / `verify_with_preprocessed`
(`uni-stark/src/prover.rs:23`, `verifier.rs:207`). This is the reference's
only checkpoint/resume-like mechanism (SURVEY.md §5.4): the preprocessed
commitment is computed once and amortized over every subsequent proof.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..utils import log2_ceil, log2_strict
from .proof import Commitments, OpenedValues, Proof
from .prover import quotient_values
from .verifier import (
    VerificationError,
    recompose_quotient_from_chunks,
    verify_constraints,
)


@dataclass
class PreprocessedProverData:
    commitment: Any
    data: Any           # PCS prover data
    trace: Any          # raw preprocessed trace (debug checker)
    width: int
    degree_bits: int


@dataclass
class PreprocessedVerifierKey:
    commitment: Any
    width: int
    degree_bits: int


def setup_preprocessed(config, air):
    """Commit the AIR's preprocessed trace once
    (ref: `preprocessed.rs:47`)."""
    prep = air.preprocessed_trace()
    if prep is None:
        return None, None
    pcs = config.pcs
    n = int(prep.shape[0])
    domain = pcs.natural_domain_for_degree(n)
    com, data = pcs.commit([(domain, prep)])
    pd = PreprocessedProverData(com, data, prep, int(prep.shape[1]), log2_strict(n))
    vk = PreprocessedVerifierKey(com, int(prep.shape[1]), log2_strict(n))
    return pd, vk


def prove_with_preprocessed(config, air, trace, public_values=(),
                            preprocessed: PreprocessedProverData = None,
                            check_witness: bool = False):
    """prove() with the preprocessed phase (ref: `prover.rs:23`)."""
    from ..air.symbolic import get_symbolic_constraints
    from .check import check_constraints

    F, EF, pcs = config.F, config.EF, config.pcs
    n = int(trace.shape[0])
    log_n = log2_strict(n)
    public_values = np.asarray(
        [int(v) for v in np.asarray(public_values, dtype=object).reshape(-1)],
        dtype=object,
    )
    assert preprocessed is not None and preprocessed.degree_bits == log_n, (
        "preprocessed trace height must match the main trace"
    )
    if check_witness:
        check_constraints(air, F, EF, trace, public_values,
                          preprocessed=preprocessed.trace)

    degrees = get_symbolic_constraints(
        air, len(public_values), preprocessed_width=preprocessed.width
    )
    num_constraints = len(degrees)
    lqd = log2_ceil(max(max(degrees, default=2) - 1, 1))
    quotient_degree = 1 << lqd

    challenger = config.new_challenger()
    trace_domain = pcs.natural_domain_for_degree(n)
    trace_com, trace_data = pcs.commit([(trace_domain, trace)])

    challenger.observe_ints([log_n])
    pcs.observe_commitment(challenger, preprocessed.commitment)
    pcs.observe_commitment(challenger, trace_com)
    if len(public_values):
        challenger.observe(F.from_int(public_values))
    alpha = challenger.sample_ext(EF)

    quotient_domain = trace_domain.create_disjoint_domain(n * quotient_degree)
    num_chunks = quotient_domain.size // trace_domain.size
    trace_lde = pcs.get_evaluations_on_domain(trace_data, 0, quotient_domain)
    prep_lde = pcs.get_evaluations_on_domain(preprocessed.data, 0, quotient_domain)

    q_vals = quotient_values(
        air, F, EF, trace_domain, quotient_domain, trace_lde, public_values,
        alpha, preprocessed_lde=prep_lde, num_constraints=num_constraints,
    )
    q_flat = q_vals.reshape((quotient_domain.size, EF.D) + F.shape_suffix)
    q_com, q_data = pcs.commit_quotient(quotient_domain, q_flat, num_chunks)
    pcs.observe_commitment(challenger, q_com)

    zeta = challenger.sample_ext(EF)
    zeta_next = trace_domain.next_point_ext(EF, zeta)

    opened, opening_proof = pcs.open(
        [
            (trace_data, [[zeta, zeta_next]]),
            (q_data, [[zeta]] * num_chunks),
            (preprocessed.data, [[zeta, zeta_next]]),
        ],
        challenger,
    )
    return Proof(
        commitments=Commitments(trace=trace_com, quotient_chunks=q_com),
        opened_values=OpenedValues(
            trace_local=np.asarray(opened[0][0][0]),
            trace_next=np.asarray(opened[0][0][1]),
            quotient_chunks=[np.asarray(opened[1][i][0]) for i in range(num_chunks)],
            preprocessed_local=np.asarray(opened[2][0][0]),
            preprocessed_next=np.asarray(opened[2][0][1]),
        ),
        opening_proof=opening_proof,
        degree_bits=log_n,
    )


def verify_with_preprocessed(config, air, proof, public_values=(),
                             vk: PreprocessedVerifierKey = None):
    """verify() with the preprocessed phase (ref: `verifier.rs:207`)."""
    from ..air.symbolic import get_symbolic_constraints

    F, EF, pcs = config.F, config.EF, config.pcs
    public_values = np.asarray(
        [int(v) for v in np.asarray(public_values, dtype=object).reshape(-1)],
        dtype=object,
    )
    ov = proof.opened_values
    log_n = proof.degree_bits
    n = 1 << log_n
    if vk is None or vk.degree_bits != log_n:
        raise VerificationError("preprocessed verifier key mismatch")

    degrees = get_symbolic_constraints(
        air, len(public_values), preprocessed_width=vk.width
    )
    num_constraints = len(degrees)
    lqd = log2_ceil(max(max(degrees, default=2) - 1, 1))
    quotient_degree = 1 << lqd

    trace_domain = pcs.natural_domain_for_degree(n)
    quotient_domain = trace_domain.create_disjoint_domain(n * quotient_degree)
    num_chunks = quotient_domain.size // trace_domain.size
    chunk_domains = quotient_domain.split_domains(num_chunks)

    row_shape = (air.width, EF.D) + F.shape_suffix
    if np.asarray(ov.trace_local).shape != row_shape:
        raise VerificationError("bad trace_local shape")
    if np.asarray(ov.preprocessed_local).shape != (vk.width, EF.D) + F.shape_suffix:
        raise VerificationError("bad preprocessed_local shape")
    if len(ov.quotient_chunks) != num_chunks:
        raise VerificationError("bad quotient chunk count")

    challenger = config.new_challenger()
    challenger.observe_ints([log_n])
    pcs.observe_commitment(challenger, vk.commitment)
    pcs.observe_commitment(challenger, proof.commitments.trace)
    if len(public_values):
        challenger.observe(F.from_int(public_values))
    alpha = challenger.sample_ext(EF)
    pcs.observe_commitment(challenger, proof.commitments.quotient_chunks)
    zeta = challenger.sample_ext(EF)
    zeta_next = trace_domain.next_point_ext(EF, zeta)

    rounds = [
        (proof.commitments.trace,
         [(trace_domain, [(zeta, jnp.asarray(ov.trace_local)),
                          (zeta_next, jnp.asarray(ov.trace_next))])]),
        (proof.commitments.quotient_chunks,
         [(dom, [(zeta, jnp.asarray(ov.quotient_chunks[i]))])
          for i, dom in enumerate(chunk_domains)]),
        (vk.commitment,
         [(trace_domain, [(zeta, jnp.asarray(ov.preprocessed_local)),
                          (zeta_next, jnp.asarray(ov.preprocessed_next))])]),
    ]
    pcs.verify(rounds, proof.opening_proof, challenger)

    quotient = recompose_quotient_from_chunks(EF, chunk_domains, ov.quotient_chunks, zeta)
    verify_constraints(
        air, F, EF, ov.trace_local, ov.trace_next, public_values,
        trace_domain, zeta, alpha, quotient,
        preprocessed_local=ov.preprocessed_local,
        preprocessed_next=ov.preprocessed_next,
        num_constraints=num_constraints,
    )
