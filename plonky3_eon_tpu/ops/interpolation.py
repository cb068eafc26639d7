"""Barycentric interpolation on two-adic cosets.

Reference parity: `interpolation/src/lib.rs:21,36` (`interpolate_subgroup`,
`interpolate_coset` — evaluate column polynomials at an out-of-domain point
given their evaluations on shift*H; used by DummyPcs and the upstream FRI
verifier).

TPU-native: the Lagrange form over the coset x_i = s*g^i is
    f(z) = (z^n - s^n) / (n * s^n) * sum_i y_i * x_i / (z - x_i),
computed with ONE batched extension-field inversion over the n denominators
and a fused weighted column contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dft import np_powers


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def interpolate_coset(F, EF, evals, zeta, shift_int: int = 1):
    """evals: (n, w)+F.sfx on the coset shift*H; zeta: EF point (D,)+...
    Returns (w, D) evaluations of each column polynomial at zeta."""
    p = F.order
    n, w = evals.shape[0], evals.shape[1]
    xs = F.from_int(np_powers(F.two_adic_generator_int((n - 1).bit_length()), n, p))
    if shift_int != 1:
        xs = F.mul(xs, jnp.broadcast_to(F.from_int(shift_int), xs.shape))
    # denominators (z - x_i): one batched EF inversion
    denom_inv = EF.inv(EF.sub(jnp.broadcast_to(zeta, (n,) + zeta.shape), EF.from_base(xs)))
    wts = EF.mul_base(denom_inv, xs)  # x_i / (z - x_i): (n, D)
    # sum_i w_i * y_i per column
    terms = EF.mul_base(wts[:, None], evals)  # (n, w, D)
    acc = EF.sum(terms, axis=0)  # (w, D)
    # scale by (z^n - s^n) / (n * s^n)
    zn = EF.exp_const(zeta, n)
    sn = pow(shift_int, n, p)
    zn_m_sn = EF.sub(zn, EF.from_int(sn))
    scale_int = pow(n * sn % p, p - 2, p)
    scale = EF.mul_base(zn_m_sn, F.from_int(scale_int))
    return EF.mul(jnp.broadcast_to(scale, acc.shape), acc)


def interpolate_subgroup(F, EF, evals, zeta):
    """Evaluations on H itself (ref: `interpolate_subgroup`)."""
    return interpolate_coset(F, EF, evals, zeta, 1)
