"""Multi-chip sharded prove-core (reference parity: the reference has NO
distributed backend — SIMD + rayon only, SURVEY.md §5.8; this module is the
TPU-native replacement: `jax.sharding.Mesh` + sharding annotations, XLA
GSPMD inserting the collectives over ICI).

Sharding layout (scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives):
  * witness generation: rows (permutation instances) sharded — pure data
    parallelism, zero communication;
  * LDE/DFT: columns sharded — each chip FFTs its own polynomial columns
    (the DFT is column-independent), zero communication; the reshard
    row->column is ONE all_to_all over ICI;
  * quotient evaluation: rows sharded (constraints mix all columns of one
    row; the column->row reshard is the second all_to_all); the `next`-row
    roll becomes a GSPMD collective-permute of the boundary rows;
  * Merkle leaf hashing: rows sharded; the top log2(P) tree levels are
    gathered (tiny).

A row-sharded butterfly FFT with an explicit all_to_all at the bit-reversal
boundary (for single-column 2^20+ KZG polynomials) is the planned round-2
extension (SURVEY.md §3.5 notes the two exploitable levels of parallelism).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("chip",))


def sharded_prove_core(mesh: Mesh, air, F, EF, log_n: int, log_blowup: int = 1,
                       public_values=(), trace_arg: bool = False):
    """Build a jitted multi-chip step: inputs -> quotient evals.

    Covers witness gen + coset-LDE + constraint folding with the shardings
    described in the module docstring. With `trace_arg=True` the step takes
    the (row-sharded) trace directly — for AIRs whose witness generation is
    host-side/sequential (e.g. Fibonacci).
    """
    from ..commit.domain import TwoAdicMultiplicativeCoset
    from ..ops.dft import Radix2Dit
    from ..stark.folder import ConstraintFolder
    from ..air.expr import Expr, RowPair

    n = 1 << log_n
    trace_domain = TwoAdicMultiplicativeCoset(F, log_n, 1)
    quotient_domain = trace_domain.create_disjoint_domain(n << log_blowup)
    sels = trace_domain.selectors_on_coset(quotient_domain)
    dft = Radix2Dit(F)
    next_step = quotient_domain.size // trace_domain.size
    public_values = [int(v) for v in public_values]

    col_sharded = NamedSharding(mesh, P(None, "chip"))
    row_sharded = NamedSharding(mesh, P("chip", None))

    def step(inputs, alpha):
        # 1. witness generation — row (instance) parallel
        trace = inputs if trace_arg else air.generate_trace(inputs)
        trace = jax.lax.with_sharding_constraint(trace, row_sharded)

        # 2. LDE — column parallel (one all_to_all reshard)
        trace_cs = jax.lax.with_sharding_constraint(trace, col_sharded)
        lde = dft.coset_lde_batch(trace_cs, log_blowup, F.generator_int)
        lde = jax.lax.with_sharding_constraint(lde, col_sharded)

        # 3. quotient fold — row parallel (second all_to_all)
        lde_rs = jax.lax.with_sharding_constraint(lde, row_sharded)
        from ..air.symbolic import get_symbolic_constraints

        folder = ConstraintFolder(
            F, EF, alpha, num_lanes=lde_rs.shape[0],
            num_constraints=len(get_symbolic_constraints(air, len(public_values))),
        )
        folder.set_main(lde_rs.T, jnp.roll(lde_rs, -next_step, axis=0).T, ext=False)
        folder.public_values = [
            Expr(folder, F.from_int(pv), False) for pv in public_values
        ]
        folder.is_first_row = Expr(folder, sels.is_first_row, False)
        folder.is_last_row = Expr(folder, sels.is_last_row, False)
        folder.is_transition = Expr(folder, sels.is_transition, False)
        air.eval(folder)
        q = EF.mul_base(folder.folded(), sels.inv_vanishing)
        q = jax.lax.with_sharding_constraint(q, NamedSharding(mesh, P("chip", None)))
        return q

    in_shardings = (row_sharded, NamedSharding(mesh, P()))
    return jax.jit(step, in_shardings=in_shardings)


def sharded_merkle_leaves(mesh: Mesh, hasher, mats):
    """Leaf digests with rows sharded across chips."""
    row_sharded = NamedSharding(mesh, P("chip", None))

    def leaves(*ms):
        flat = jnp.concatenate([m.reshape(m.shape[0], -1) for m in ms], axis=1)
        flat = jax.lax.with_sharding_constraint(flat, row_sharded)
        return jax.lax.with_sharding_constraint(hasher.hash(flat), row_sharded)

    return jax.jit(leaves)(*mats)
