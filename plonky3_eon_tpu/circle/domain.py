"""Circle polynomial-space domains (the `PolynomialSpace` analogue of
`commit/src/domain.rs:52` for the circle group — standard-position cosets
and the twin-coset chunks their quotients split into).

Selector / vanishing closed forms (see circle/group.py header):
  * vanishing of a standard domain D_n:  v(z) = pi^(n-1)(x(z))
    (n-1 squarings; z^(2^(n-1)) lands on (0, +-1));
  * vanishing of a twin-coset chunk:     v(z) = pi^(n-1)(x(z)) - c_T
    (the squaring chain is CONSTANT c_T on a twin-coset);
  * single-point selector building block v0(u) = y(u)/(1+x(u)) — simple
    zero at u = 1, simple pole at u = -1:
      is_first      = v(z) / v0(z - first)
      is_last       = v(z) / v0(z - last)
      is_transition = v0(z - last)
    (group subtraction z - w = z * conj(w)).

The out-of-domain point zeta is carried as the EF scalar t the challenger
sampled; the rational parametrization x = (1-t^2)/(1+t^2), y = 2t/(1+t^2)
maps it onto C(EF) wherever a point is needed, and `next_point_ext` maps
rotation by the trace-domain generator back to a t-value.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..commit.domain import Selectors
from ..fields.mersenne31 import Mersenne31
from ..utils import log2_strict
from .cfft import PairTables
from .group import P, cinv_unit, cmul, domain_points, subgroup_gen


def _pt_to_t(pt) -> int:
    """Inverse stereographic map t = y / (1 + x) (host ints)."""
    return pt[1] * pow((1 + pt[0]) % P, P - 2, P) % P


def t_to_point_ext(EF, t):
    """EF scalar t -> point on C(EF): ((1-t^2)/(1+t^2), 2t/(1+t^2))."""
    one = EF.ones(())
    t2 = EF.mul(t, t)
    inv = EF.inv(EF.add(one, t2))
    x = EF.mul(EF.sub(one, t2), inv)
    y = EF.mul(EF.add(t, t), inv)
    return x, y


def _v0_ext(EF, x, y):
    """v0 = y / (1 + x) in EF."""
    return EF.mul(y, EF.inv(EF.add(EF.ones(()), x)))


def _group_sub_ext(EF, zx, zy, w):
    """(zx, zy) * conj(w) for a host point w."""
    wx = EF.from_int(w[0])
    wy = EF.from_int(w[1])
    x = EF.add(EF.mul(zx, wx), EF.mul(zy, wy))
    y = EF.sub(EF.mul(zy, wx), EF.mul(zx, wy))
    return x, y


class CircleDomainBase:
    """Shared machinery for standard and twin-coset circle domains."""

    F = Mersenne31

    #: set by subclasses: list of host (x, y) points; log_n
    points: list
    log_n: int

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @functools.cached_property
    def pair_tables(self) -> PairTables:
        return PairTables(self.points)

    @functools.cached_property
    def xs_device(self):
        return self.F.from_int(np.asarray([p[0] for p in self.points], dtype=np.uint64))

    @functools.cached_property
    def ys_device(self):
        return self.F.from_int(np.asarray([p[1] for p in self.points], dtype=np.uint64))

    # ---- vanishing ------------------------------------------------------

    @functools.cached_property
    def _vanishing_const(self) -> int:
        """c_T: the constant value of pi^(log_n - 1)(x) on this domain
        (0 for standard position)."""
        x = self.points[0][0]
        for _ in range(self.log_n - 1):
            x = (2 * x * x - 1) % P
        return x

    def vanishing_at_point_int(self, pt) -> int:
        """v(pt) for a host point (used for chunk recombination weights)."""
        x = pt[0]
        for _ in range(self.log_n - 1):
            x = (2 * x * x - 1) % P
        return (x - self._vanishing_const) % P

    def vanishing_poly_at_point_ext(self, EF, zeta_t):
        zx, _ = t_to_point_ext(EF, jnp.asarray(zeta_t))
        for _ in range(self.log_n - 1):
            zx = EF.sub(EF.mul(EF.add(zx, zx), zx), EF.ones(()))
        return EF.sub(zx, EF.from_int(self._vanishing_const))

    def vanishing_at_domain_sample(self, other) -> int:
        """v_self(first point of `other`) as a host int (quotient-chunk
        recombination; the multiplicative analogue is Z_j(first_i))."""
        return self.vanishing_at_point_int(other.points[0])

    # ---- selectors -------------------------------------------------------

    def selectors_at_point_ext(self, EF, zeta_t) -> Selectors:
        zx, zy = t_to_point_ext(EF, jnp.asarray(zeta_t))
        v = EF.sub(self._pi_chain_ext(EF, zx), EF.from_int(self._vanishing_const))
        v0_first = _v0_ext(EF, *_group_sub_ext(EF, zx, zy, self.points[0]))
        v0_last = _v0_ext(EF, *_group_sub_ext(EF, zx, zy, self.points[-1]))
        return Selectors(
            is_first_row=EF.mul(v, EF.inv(v0_first)),
            is_last_row=EF.mul(v, EF.inv(v0_last)),
            is_transition=v0_last,
            inv_vanishing=EF.inv(v),
        )

    def _pi_chain_ext(self, EF, zx):
        for _ in range(self.log_n - 1):
            zx = EF.sub(EF.mul(EF.add(zx, zx), zx), EF.ones(()))
        return zx

    def selectors_on_coset(self, coset: "CircleDomainBase") -> Selectors:
        """Selectors evaluated over another (disjoint) circle domain —
        all base-field lane arrays (ref: `selectors_on_coset`,
        `commit/src/domain.rs:252`)."""
        F = self.F
        xs, ys = coset.xs_device, coset.ys_device
        x = xs
        for _ in range(self.log_n - 1):
            x = F.sub(F.mul(F.add(x, x), x), jnp.broadcast_to(F.from_int(1), x.shape))
        v = F.sub(x, jnp.broadcast_to(F.from_int(self._vanishing_const), x.shape))

        def v0_at(w):
            wx = jnp.broadcast_to(F.from_int(w[0]), xs.shape)
            wy = jnp.broadcast_to(F.from_int(w[1]), xs.shape)
            ux = F.add(F.mul(xs, wx), F.mul(ys, wy))
            uy = F.sub(F.mul(ys, wx), F.mul(xs, wy))
            return F.mul(uy, F.inv(F.add(ux, jnp.broadcast_to(F.from_int(1), ux.shape))))

        v0_first = v0_at(self.points[0])
        v0_last = v0_at(self.points[-1])
        return Selectors(
            is_first_row=F.mul(v, F.inv(v0_first)),
            is_last_row=F.mul(v, F.inv(v0_last)),
            is_transition=v0_last,
            inv_vanishing=F.inv(v),
        )

    def next_point_ext(self, EF, zeta_t):
        """t-value of point(t) rotated by the domain's subgroup generator."""
        zx, zy = t_to_point_ext(EF, jnp.asarray(zeta_t))
        q2 = self._rot_gen()
        gx = EF.from_int(q2[0])
        gy = EF.from_int(q2[1])
        x = EF.sub(EF.mul(zx, gx), EF.mul(zy, gy))
        y = EF.add(EF.mul(zx, gy), EF.mul(zy, gx))
        # t' = y' / (1 + x')
        return EF.mul(y, EF.inv(EF.add(EF.ones(()), x)))

    def _rot_gen(self):
        q = subgroup_gen(self.log_n + 1)
        return cmul(q, q)


class CircleDomain(CircleDomainBase):
    """Standard-position domain D_n = odd powers of q_(n+1)."""

    def __init__(self, log_n: int):
        self.log_n = log_n
        self.points = domain_points(log_n)

    def create_disjoint_domain(self, min_size: int) -> "CircleDomain":
        # always at least DOUBLE the trace domain: same-size standard
        # domains coincide (no shift parameter on the circle), and the
        # engine's chunk count = size ratio keeps chunk heights = trace
        # height for the single-height circle FRI
        log_m = max((min_size - 1).bit_length(), self.log_n + 1)
        return CircleDomain(log_m)

    def split_domains(self, num_chunks: int) -> list:
        """2^k J-invariant twin-cosets: chunk r holds the rows of D with
        index % 2^(k+1) in {r, 2^(k+1)-1-r}."""
        if num_chunks == 1:
            return [self]
        k = log2_strict(num_chunks)
        return [CircleTwinCoset(self, k, r) for r in range(num_chunks)]

    def split_evals(self, num_chunks: int, evals):
        if num_chunks == 1:
            return [evals]
        k = log2_strict(num_chunks)
        return [
            jnp.take(evals, jnp.asarray(_chunk_indices(self.log_n, k, r)), axis=0)
            for r in range(num_chunks)
        ]


def _chunk_indices(log_n: int, k: int, r: int) -> np.ndarray:
    n = 1 << log_n
    m = 1 << (k + 1)
    idx = np.arange(n)
    keep = (idx % m == r) | (idx % m == m - 1 - r)
    return idx[keep]


class CircleTwinCoset(CircleDomainBase):
    """One twin-coset chunk of a standard domain's row split."""

    def __init__(self, parent: CircleDomain, k: int, r: int):
        self.log_n = parent.log_n - k
        self._indices = _chunk_indices(parent.log_n, k, r)
        self.points = [parent.points[i] for i in self._indices]

    def create_disjoint_domain(self, min_size: int) -> CircleDomain:
        log_m = max((min_size - 1).bit_length(), 1)
        return CircleDomain(log_m)
