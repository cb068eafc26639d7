"""Matrix helpers (reference parity: `matrix/` — SURVEY.md §2.1).

TPU-native design: the reference's `Matrix` trait + view zoo
(`DenseMatrix`, `BitReversedMatrixView`, `VerticalPair`, strided views —
`matrix/src/*.rs`) exists because Rust iterates rows through trait objects.
In JAX a trace matrix is just a `(height, width)+suffix` uint32 array;
"views" are cheap jnp ops that XLA fuses away, so only a few explicit
helpers are needed:

  * `flatten_to_base` — EF matrix (n, w, D) -> base matrix (n, w*D)
    (ref: `DenseMatrix::flatten_to_base`, `matrix/src/dense.rs:139`);
  * `to_extension` — the inverse regrouping;
  * vertical row pairs (local/next) are plain `jnp.roll`;
  * `columnwise_dot_product` (RLC) is `Field.dot`;
  * bit-reversed views are a gather with `utils.bit_reverse_indices`.
"""

from __future__ import annotations

import jax.numpy as jnp


def flatten_to_base(mat):
    """(n, w, D) extension matrix -> (n, w*D) base matrix (coeff-major per col)."""
    n, w = mat.shape[0], mat.shape[1]
    return mat.reshape(n, -1)


def to_extension(mat, D: int):
    """(n, w*D) base matrix -> (n, w, D) extension matrix."""
    n = mat.shape[0]
    return mat.reshape(n, -1, D)


def row_pair(mat, shift: int = 1):
    """(local, next) row views: next_i = row (i+shift) mod n (ref:
    `VerticalPair` usage in quotient eval, `matrix/src/stack.rs:25`)."""
    return mat, jnp.roll(mat, -shift, axis=0)
