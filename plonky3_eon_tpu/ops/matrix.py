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


def columnwise_dot_product(F, mat, v):
    """sum_r v_r * mat[r, c] per column c — the RLC the verifier-side
    combiners use (ref: `Matrix::columnwise_dot_product`,
    `matrix/src/lib.rs:372-471`). v: (n,)+sfx, mat: (n, w)+sfx."""
    sfx = len(F.shape_suffix)
    vexp = jnp.expand_dims(v, axis=1) if sfx == 0 else jnp.expand_dims(v, axis=1)
    return F.sum(F.mul(mat, jnp.broadcast_to(vexp, mat.shape)), axis=0)


def transpose(mat):
    """(n, w)+sfx -> (w, n)+sfx (ref: `matrix/src/util.rs` transpose)."""
    return jnp.swapaxes(mat, 0, 1)


def vertical_pair(top, bottom):
    """Stack two matrices vertically (ref: `VerticalPair`, `stack.rs:25`)."""
    return jnp.concatenate([top, bottom], axis=0)


def horizontal_pair(left, right):
    """Concatenate two matrices' columns (ref: `HorizontalPair`, `stack.rs:42`)."""
    return jnp.concatenate([left, right], axis=1)


def bit_reversed_view(mat):
    """Rows in bit-reversed index order (ref: `BitReversedMatrixView`,
    `matrix/src/bitrev.rs:27`) — one gather, fused by XLA."""
    from ..utils import bit_reverse_indices

    return jnp.take(mat, jnp.asarray(bit_reverse_indices(int(mat.shape[0]))), axis=0)


def horizontally_truncated(mat, width: int):
    """First `width` columns (ref: `HorizontallyTruncated`)."""
    return mat[:, :width]


def strided_view(mat, stride: int, offset: int = 0):
    """Every stride-th row starting at offset (ref: `matrix/src/strided.rs:9`)."""
    return mat[offset::stride]
