"""The Mersenne31 circle group C(F_p): x^2 + y^2 = 1, |C| = p + 1 = 2^31.

Reference parity: the removed upstream `p3-circle` crate (SURVEY.md §2.8)
and the `ComplexExtendable` hook retained at
`field/src/extension/complex.rs:9`. All structure re-derived from the
Circle STARKs construction (Haböck-Levit-Papini), not ported.

The circle group is the norm-1 subgroup of Fp[i]* (p = 3 mod 4): host ops
are exact Python-int complex arithmetic; a generator of the full 2^31-order
group is u^(p-1) for a generator u of Fp[i]*.

Key structural facts used throughout (derived in circle/cfft.py tests):
  * q_n := CIRCLE_GEN^(2^(30-n)) has order 2^(n+1); the standard-position
    domain of size 2^n is D_n = { q_n^(2i+1) } — the coset q_n * H_n.
  * rotation by the subgroup generator q_n^2 is index i -> i+1 (the AIR
    "next row" stays a roll);
  * inversion J (x, y) -> (x, -y) is index i -> 2^n - 1 - i;
  * the vanishing function of D_n is v(z) = x(z^(2^(n-1))) — computable
    from x alone by n-1 squarings pi(x) = 2x^2 - 1 — because z^(2^(n-1))
    lands on (0, +-1) exactly for z in D_n;
  * a single point w is cut out by v0(z * w^-1), v0(u) = y(u)/(1 + x(u)) —
    one simple zero (at u = 1) and one simple pole (at u = -1).
"""

from __future__ import annotations

import functools

P = (1 << 31) - 1  # Mersenne31


def cmul(a, b):
    """(x1 + i y1)(x2 + i y2) in Fp[i]."""
    return (
        (a[0] * b[0] - a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def cinv_unit(a):
    """Inverse on the unit circle = conjugate."""
    return (a[0], (-a[1]) % P)


def cpow(a, e: int):
    r = (1, 0)
    while e:
        if e & 1:
            r = cmul(r, a)
        a = cmul(a, a)
        e >>= 1
    return r


@functools.lru_cache(maxsize=1)
def circle_generator() -> tuple:
    """A generator of the order-2^31 circle group: u^(p-1) for u generating
    Fp[i]* (checked: order exactly 2^31)."""
    # find a generator of Fp[i]* (order p^2 - 1 = (p-1)(p+1))
    order = P * P - 1
    factors = [2, 3, 7, 11, 31, 151, 331]  # prime factors of p^2 - 1
    u = (2, 1)
    while True:
        ok = all(cpow(u, order // f) != (1, 0) for f in factors)
        if ok:
            break
        u = (u[0] + 1, u[1])
    g = cpow(u, P - 1)
    assert cpow(g, 1 << 31) == (1, 0) and cpow(g, 1 << 30) != (1, 0)
    return g


@functools.lru_cache(maxsize=64)
def subgroup_gen(log_order: int) -> tuple:
    """Generator of the order-2^log_order subgroup."""
    return cpow(circle_generator(), 1 << (31 - log_order))


def domain_points(log_n: int) -> list:
    """Standard-position domain D_n = odd powers of q_n (|D_n| = 2^n)."""
    q = subgroup_gen(log_n + 1)
    q2 = cmul(q, q)
    pts = []
    cur = q
    for _ in range(1 << log_n):
        pts.append(cur)
        cur = cmul(cur, q2)
    return pts
