"""Univariate STARK prover.

Reference parity: `uni-stark/src/prover.rs:23-473` (`prove` /
`prove_with_preprocessed` / `quotient_values`); call-stack documented in
SURVEY.md §3.1.

TPU-native design:
  * The quotient evaluation — the reference's hot rayon loop over packed
    row pairs (`prover.rs:379-473`) — is ONE jit-compiled program: the AIR's
    `eval` is traced with whole-coset lane arrays, the alpha-fold and
    inv-vanishing scaling fuse into the same XLA executable, and "next row"
    access is a static roll by the blowup factor (natural-order LDE).
  * Commit / LDE / open run through the PCS which is itself batched jnp.
  * Transcript logic stays on host (tiny, sequential by nature).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..air.expr import Expr, RowPair
from ..air.symbolic import get_log_quotient_degree
from ..utils import log2_strict
from .check import check_constraints
from .folder import ConstraintFolder
from .proof import Commitments, OpenedValues, Proof


def quotient_values(air, F, EF, trace_domain, quotient_domain, trace_lde, public_values,
                    alpha, preprocessed_lde=None):
    """Evaluate sum_j alpha^j C_j(x) * Z_H(x)^-1 over the quotient domain.

    Returns an EF matrix (N, D). Traced+compiled once per shape
    (ref: `quotient_values`, `uni-stark/src/prover.rs:379`).
    """
    sels = trace_domain.selectors_on_coset(quotient_domain)
    next_step = quotient_domain.size // trace_domain.size

    def fold_fn(trace_lde, alpha, is_first, is_last, is_trans, inv_vanishing, prep_lde):
        folder = ConstraintFolder(F, EF, alpha, num_lanes=trace_lde.shape[0])
        # lanes-trailing layout (air/array_builder.py): matrices transposed
        folder.set_main(trace_lde.T, jnp.roll(trace_lde, -next_step, axis=0).T, ext=False)
        if prep_lde is not None:
            folder.set_preprocessed(
                prep_lde.T, jnp.roll(prep_lde, -next_step, axis=0).T, ext=False
            )
        folder.public_values = [
            Expr(folder, F.from_int(int(pv)), False)
            for pv in np.asarray(public_values).reshape(-1)
        ]
        folder.is_first_row = Expr(folder, is_first, False)
        folder.is_last_row = Expr(folder, is_last, False)
        folder.is_transition = Expr(folder, is_trans, False)
        air.eval(folder)
        acc = folder.folded()  # (N, D)
        return EF.mul_base(acc, inv_vanishing)

    fn = jax.jit(fold_fn) if preprocessed_lde is not None else jax.jit(
        lambda t, a, f, l, tr, iv: fold_fn(t, a, f, l, tr, iv, None)
    )
    if preprocessed_lde is not None:
        return fn(trace_lde, alpha, sels.is_first_row, sels.is_last_row,
                  sels.is_transition, sels.inv_vanishing, preprocessed_lde)
    return fn(trace_lde, alpha, sels.is_first_row, sels.is_last_row,
              sels.is_transition, sels.inv_vanishing)


def prove(config, air, trace, public_values=(), check_witness: bool = False):
    """Prove one AIR instance (ref: `uni-stark/src/prover.rs:359` `prove`)."""
    F, EF, pcs = config.F, config.EF, config.pcs
    n = int(trace.shape[0])
    log_n = log2_strict(n)
    public_values = np.asarray(public_values, dtype=np.uint64).reshape(-1)

    if check_witness:  # the reference runs this in debug builds (§5.2)
        check_constraints(air, F, EF, trace, public_values)

    lqd = get_log_quotient_degree(air, len(public_values))
    quotient_degree = 1 << lqd

    challenger = config.new_challenger()
    trace_domain = pcs.natural_domain_for_degree(n)

    trace_com, trace_data = pcs.commit([(trace_domain, trace)])

    challenger.observe_ints([log_n])
    pcs.observe_commitment(challenger, trace_com)
    if len(public_values):
        challenger.observe(F.from_int(public_values))
    alpha = challenger.sample_ext(EF)

    quotient_domain = trace_domain.create_disjoint_domain(n * quotient_degree)
    trace_lde = pcs.get_evaluations_on_domain(trace_data, 0, quotient_domain)

    q_vals = quotient_values(
        air, F, EF, trace_domain, quotient_domain, trace_lde, public_values, alpha
    )
    q_flat = q_vals.reshape(quotient_domain.size, EF.D)  # EF -> D base columns

    q_com, q_data = pcs.commit_quotient(quotient_domain, q_flat, quotient_degree)
    pcs.observe_commitment(challenger, q_com)

    zeta = challenger.sample_ext(EF)
    zeta_next = trace_domain.next_point_ext(EF, zeta)

    opened, opening_proof = pcs.open(
        [
            (trace_data, [[zeta, zeta_next]]),
            (q_data, [[zeta]] * quotient_degree),
        ],
        challenger,
    )
    trace_local, trace_next = opened[0][0][0], opened[0][0][1]
    quotient_chunks = [opened[1][i][0] for i in range(quotient_degree)]

    return Proof(
        commitments=Commitments(trace=trace_com, quotient_chunks=q_com),
        opened_values=OpenedValues(
            trace_local=np.asarray(trace_local),
            trace_next=np.asarray(trace_next),
            quotient_chunks=[np.asarray(c) for c in quotient_chunks],
        ),
        opening_proof=opening_proof,
        degree_bits=log_n,
    )
