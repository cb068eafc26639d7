"""Circle FFT over J-invariant point sets (standard-position cosets and
twin-cosets).

The transform basis is the canonical global function family
    B_c = y^{c_(n-1)} * x^{c_(n-2)} * pi(x)^{c_(n-3)} * ... ,
pi(x) = 2x^2 - 1, with coefficient index bits MSB->LSB = (y, x, pi, ...).
This makes low-degree extension a STRIDE pad: the size-2^n coefficient c
occupies slot c << (m - n) of the size-2^m basis.

TPU-native design: pairing structure is precomputed on the host as explicit
index tables per layer (layer 0 pairs z with conj(z), later layers pair x
with -x on the projected line domains) — this works uniformly for ANY
J-invariant domain, so standard domains, quotient-chunk twin-cosets, and
the circle-FRI fold all share one device kernel: gather pairs, butterfly,
interleave. Twiddle tables (1/(2y), 1/(2 pi^k(x))) are host ints baked as
XLA constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mersenne31 import Mersenne31 as F
from .group import P


class PairTables:
    """Per-layer (idx_a, idx_b, twiddle, inv_2twiddle) for a J-invariant
    point list. idx_a[k] keeps the representative; its partner idx_b[k] is
    the conjugate (layer 0) / negated-x point (later layers)."""

    def __init__(self, points: list):
        n = len(points)
        self.size = n
        self.layers = []  # (ia, ib, tw_int, inv2tw_int) numpy arrays
        # layer 0: z vs conj(z); twiddle = y
        by_key = {}
        ia, ib, tw = [], [], []
        for i, (x, y) in enumerate(points):
            partner = by_key.pop((x, (-y) % P), None)
            if partner is None:
                by_key[(x, y)] = i
            else:
                ia.append(partner)
                ib.append(i)
                tw.append(points[partner][1])
        assert not by_key, "domain is not J-invariant"
        self._push(ia, ib, tw)
        xs = [points[i][0] for i in ia]
        # later layers: x vs -x, twiddle = x, then x <- 2x^2 - 1
        while len(xs) > 1:
            by_key = {}
            ia, ib, tw = [], [], []
            for j, x in enumerate(xs):
                partner = by_key.pop((-x) % P, None)
                if partner is None:
                    by_key[x] = j
                else:
                    ia.append(partner)
                    ib.append(j)
                    tw.append(xs[partner])
            assert not by_key, "projected domain not negation-closed"
            self._push(ia, ib, tw)
            xs = [(2 * xs[i] * xs[i] - 1) % P for i in ia]

    def _push(self, ia, ib, tw):
        inv2 = [pow(2 * t % P, P - 2, P) for t in tw]
        self.layers.append(
            (
                np.asarray(ia, np.int32),
                np.asarray(ib, np.int32),
                F.from_int_np(np.asarray(tw, np.uint64)),
                F.from_int_np(np.asarray(inv2, np.uint64)),
            )
        )


_HALF = F.from_int_np(np.asarray((P + 1) // 2, np.uint64))


def cfft(tables: PairTables, v):
    """Evaluations (n, w)+sfx on the domain -> coefficients (n, w)+sfx.
    Coefficient index bits MSB->LSB = fold-layer bits (y first)."""
    n, w = v.shape[0], v.shape[1]
    x = v[None]  # (blocks, s, w)
    half = jnp.asarray(_HALF)
    for ia, ib, _, inv2tw in tables.layers:
        a = x[:, jnp.asarray(ia)]
        b = x[:, jnp.asarray(ib)]
        f0 = F.mul(F.add(a, b), jnp.broadcast_to(half, a.shape))
        f1 = F.mul(
            F.sub(a, b),
            jnp.broadcast_to(jnp.asarray(inv2tw)[None, :, None], a.shape),
        )
        # interleave: new layer bit becomes the LSB of the block index
        x = jnp.stack([f0, f1], axis=1).reshape(
            (x.shape[0] * 2, x.shape[1] // 2) + x.shape[2:]
        )
    return x.reshape((n, w) + v.shape[2:])


def icfft(tables: PairTables, c):
    """Coefficients -> evaluations (inverse of cfft)."""
    n, w = c.shape[0], c.shape[1]
    x = c.reshape((n, 1, w) + c.shape[2:])
    for ia, ib, tw, _ in reversed(tables.layers):
        blocks = x.shape[0] // 2
        x = x.reshape((blocks, 2) + x.shape[1:])
        f0, f1 = x[:, 0], x[:, 1]
        t = F.mul(f1, jnp.broadcast_to(jnp.asarray(tw)[None, :, None], f1.shape))
        a = F.add(f0, t)
        b = F.sub(f0, t)
        s = f0.shape[1] * 2
        out = jnp.zeros((blocks, s) + f0.shape[2:], f0.dtype)
        out = out.at[:, jnp.asarray(ia)].set(a)
        out = out.at[:, jnp.asarray(ib)].set(b)
        x = out
    return x.reshape((n, w) + c.shape[2:])


def lde_coeff_pad(coeffs, log_n: int, log_m: int):
    """Stride-pad size-2^log_n coefficients into 2^log_m slots
    (slot c << (log_m - log_n))."""
    n, m = 1 << log_n, 1 << log_m
    out = jnp.zeros((m,) + coeffs.shape[1:], coeffs.dtype)
    idx = jnp.arange(n) << (log_m - log_n)
    return out.at[idx].set(coeffs)


def naive_basis_eval_int(coeff_ints, point) -> int:
    """Host oracle: evaluate sum_c coeff_c * B_c at a point (ints)."""
    n = len(coeff_ints)
    log_n = n.bit_length() - 1
    x, y = point
    # basis factor values per bit position (MSB first: y, x, pi(x), ...)
    factors = [y]
    cur = x
    for _ in range(log_n - 1):
        factors.append(cur)
        cur = (2 * cur * cur - 1) % P
    total = 0
    for c, coeff in enumerate(coeff_ints):
        if coeff == 0:
            continue
        term = int(coeff)
        for bit in range(log_n):
            if (c >> (log_n - 1 - bit)) & 1:
                term = term * factors[bit] % P
        total = (total + term) % P
    return total
