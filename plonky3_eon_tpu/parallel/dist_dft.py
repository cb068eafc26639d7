"""Distributed batched DFT over a device mesh (one all_to_all boundary).

Reference parity: the reference's `Radix2DitParallel` splits the butterfly
network into two halves around a bit-reversal so rayon threads touch
disjoint cache blocks (`dft/src/radix_2_dit_parallel.rs:22-47`); SURVEY.md
§3.5/§5.7 call out that this structure becomes "local stages + one
all_to_all at the boundary" on a TPU mesh. This module is that design as a
four-step Cooley-Tukey factorization n = A*B:

  x[B*j1 + j2]  --DFT_A over j1 (root w^B, local per chip)-->  Y[j1->k1, j2]
  Y *= w^(j2*k1)                                               (local)
  --reshard (the ONE all_to_all, inserted by GSPMD)-->
  --DFT_B over j2 (root w^A, local per chip)-->                Z[k1, k2]
  X[k2*A + k1] = Z[k1, k2]                                     (transpose)

With B = mesh size, every butterfly stage is chip-local; the only
communication is the axis reshard between the two DFTs. Used for
single-polynomial KZG-scale FFTs where column sharding (parallel/dist.py)
has nothing to shard over.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dft import np_powers
from ..utils import log2_strict


def _local_dft_axis0(F, x, root_int: int, log_a: int, inverse: bool):
    """Radix-2 DIT along axis 0 of (A, ...) with a given order-A root."""
    from ..utils import bit_reverse_indices

    p = F.order
    a = 1 << log_a
    g = pow(root_int, p - 2, p) if inverse else root_int
    full = np_powers(g, max(a // 2, 1), p)
    x = jnp.take(x, jnp.asarray(bit_reverse_indices(a)), axis=0)
    rest = tuple(x.shape[1:])
    sfx = F.shape_suffix  # e.g. (16,) for the BN254 Fr digit suffix
    for s in range(log_a):
        m = 1 << s
        x = x.reshape((a // (2 * m), 2, m) + rest)
        tw = F.from_int_np(full[:: (a // 2) // m][:m])
        tshape = (1, m) + (1,) * (len(rest) - len(sfx)) + sfx
        t = F.mul(x[:, 1], jnp.asarray(tw).reshape(tshape))
        x = jnp.stack([F.add(x[:, 0], t), F.sub(x[:, 0], t)], axis=1)
        x = x.reshape((a,) + rest)
    return x


def dist_dft_batch(mesh: Mesh, F, mat, inverse: bool = False):
    """DFT of coefficient columns (n, w) sharded over `mesh` ('chip' axis).

    Returns evaluations in natural order with the same sharding. The local
    stages run on each chip; GSPMD inserts exactly one all_to_all at the
    factorization boundary (visible in the compiled HLO).
    """
    n, w = int(mat.shape[0]), int(mat.shape[1])
    log_n = log2_strict(n)
    B = int(np.prod(mesh.devices.shape))
    log_b = log2_strict(B)
    A = n // B
    log_a = log_n - log_b
    p = F.order
    omega = F.two_adic_generator_int(log_n)
    if inverse:
        omega = pow(omega, p - 2, p)

    # twiddle table w^(j2*k1): (A, B)+suffix — host outer-product index
    pw = np_powers(omega, n, p)
    k1 = np.arange(A, dtype=np.int64)[:, None]
    j2 = np.arange(B, dtype=np.int64)[None, :]
    tw_np = F.from_int_np(pw[(k1 * j2) % n])
    sfx = F.shape_suffix

    shard_j2 = NamedSharding(mesh, P(None, "chip"))  # (A, B, w): j2 on chips
    shard_k1 = NamedSharding(mesh, P("chip", None))  # (A, B, w): k1 on chips

    def program(x):
        # x: (n, w) natural order; j = B*j1 + j2 -> axes (j1, j2)
        v = x.reshape(A, B, *x.shape[1:])
        v = jax.lax.with_sharding_constraint(v, shard_j2)
        v = _local_dft_axis0(F, v, pow(omega, B, p), log_a, inverse=False)
        v = F.mul(
            v,
            jnp.asarray(tw_np).reshape(
                (A, B) + (1,) * (v.ndim - 2 - len(sfx)) + sfx
            ),
        )
        # the all_to_all boundary: j2-sharded -> k1-sharded
        v = jax.lax.with_sharding_constraint(v, shard_k1)
        v = jnp.moveaxis(v, 1, 0)  # (B, A, w)
        v = _local_dft_axis0(F, v, pow(omega, A, p), log_b, inverse=False)
        # v[k2, k1] -> X[k2*A + k1]
        out = v.reshape(n, *x.shape[1:])
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("chip", *([None] * (x.ndim - 1))))
        )

    with mesh:
        return jax.jit(program)(mat)


def dist_idft_batch(mesh: Mesh, F, mat):
    """Inverse DFT: forward network with the inverse root, then 1/n scale."""
    n = int(mat.shape[0])
    out = dist_dft_batch(mesh, F, mat, inverse=True)
    n_inv = F.from_int(pow(n, F.order - 2, F.order))
    return F.mul(out, jnp.broadcast_to(n_inv, out.shape))
