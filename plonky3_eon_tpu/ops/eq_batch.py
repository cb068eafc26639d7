"""Batched multilinear eq-table evaluation.

Reference parity: `multilinear-util/src/eq_batch.rs:88,123`
(`eval_eq_batch`: W(x) = sum_i gamma_i * eq(x, z_i) over the boolean cube,
base- and extension-point variants, parallel over table halves).

TPU-native: the table is built by the standard doubling recursion
    T_{k+1} = [T_k * (1 - z_k), T_k * z_k]
vmapped over the batch of points, then contracted with the gamma weights —
log(n) fused tensor passes instead of the reference's rayon split.
"""

from __future__ import annotations

import jax.numpy as jnp


def eval_eq_batch(EF, zs, gammas):
    """zs: (m, k, D) batch of m points in EF^k; gammas: (m, D) weights.
    Returns the (2^k, D) table W(x) = sum_i gamma_i eq(x, z_i), with x
    enumerated with x_0 as the LOWEST bit."""
    m, k = zs.shape[0], zs.shape[1]
    table = gammas[:, None, :]  # (m, 1, D)
    one = EF.ones(())
    for j in range(k):
        zj = zs[:, j][:, None, :]  # (m, 1, D)
        hi = EF.mul(table, jnp.broadcast_to(zj, table.shape))
        lo = EF.sub(table, hi)  # table * (1 - z_j)
        table = jnp.concatenate([lo, hi], axis=1)
    return EF.sum(table, axis=0)  # (2^k, D)


def eval_eq(EF, z):
    """eq(x, z) table for one point (m = 1, gamma = 1)."""
    return eval_eq_batch(EF, z[None], EF.ones(())[None])
