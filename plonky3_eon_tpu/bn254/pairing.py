"""BN254 host-side curve + optimal-ate pairing (pure Python ints).

Reference parity: `bn254/src/curve.rs:74-439` (G1/G2/Gt wrappers,
`pairing`, `multi_pairing` via halo2curves' multi-Miller-loop). The
reference runs its pairings on the host CPU through the halo2curves Rust
crate; this is the equivalent host path, used only on the verifier side
(one multi-pairing per proof — microseconds of field work, never a TPU
bottleneck). Device-side batched G1 arithmetic lives in `curve.py`.

Tower: Fp2 = Fp[i]/(i^2+1), Fp6 = Fp2[v]/(v^3 - (9+i)),
Fp12 = Fp6[w]/(w^2 - v). Optimal ate Miller loop over 6u+2 in NAF form with
the two Frobenius line corrections, then the standard easy + hard final
exponentiation (u-power addition chain).
"""

from __future__ import annotations

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
U = 4965661367192848881  # BN parameter

# ---- Fp2 ------------------------------------------------------------------


def f2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def f2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def f2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def f2_mul(a, b):
    # (a0 + a1 i)(b0 + b1 i), i^2 = -1 (Karatsuba)
    t0 = a[0] * b[0] % P
    t1 = a[1] * b[1] % P
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % P
    return ((t0 - t1) % P, (t2 - t0 - t1) % P)


def f2_sqr(a):
    t0 = (a[0] + a[1]) * (a[0] - a[1]) % P
    t1 = 2 * a[0] * a[1] % P
    return (t0, t1)


def f2_muls(a, s: int):
    return (a[0] * s % P, a[1] * s % P)


def f2_inv(a):
    d = pow(a[0] * a[0] + a[1] * a[1], P - 2, P)
    return (a[0] * d % P, (-a[1]) * d % P)


def f2_conj(a):
    return (a[0], (-a[1]) % P)


F2_ZERO = (0, 0)
F2_ONE = (1, 0)
XI = (9, 1)  # v^3 = xi


# ---- Fp6 = Fp2[v]/(v^3 - xi): elements (c0, c1, c2) -----------------------


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0, t1, t2 = f2_mul(a0, b0), f2_mul(a1, b1), f2_mul(a2, b2)
    c0 = f2_add(t0, f2_mul(XI, f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
    c1 = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), f2_add(t0, t1)), f2_mul(XI, t2))
    c2 = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), f2_add(t0, t2)), t1)
    return (c0, c1, c2)


def f6_sqr(a):
    return f6_mul(a, a)


def f6_mul_by_v(a):
    # v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2
    return (f2_mul(XI, a[2]), a[0], a[1])


def f6_inv(a):
    a0, a1, a2 = a
    c0 = f2_sub(f2_sqr(a0), f2_mul(XI, f2_mul(a1, a2)))
    c1 = f2_sub(f2_mul(XI, f2_sqr(a2)), f2_mul(a0, a1))
    c2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
    t = f2_add(f2_mul(XI, f2_add(f2_mul(a2, c1), f2_mul(a1, c2))), f2_mul(a0, c0))
    t = f2_inv(t)
    return (f2_mul(c0, t), f2_mul(c1, t), f2_mul(c2, t))


F6_ZERO = (F2_ZERO,) * 3
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)


# ---- Fp12 = Fp6[w]/(w^2 - v): elements (c0, c1) ----------------------------


def f12_mul(a, b):
    t0 = f6_mul(a[0], b[0])
    t1 = f6_mul(a[1], b[1])
    c0 = f6_add(t0, f6_mul_by_v(t1))
    c1 = f6_sub(f6_mul(f6_add(a[0], a[1]), f6_add(b[0], b[1])), f6_add(t0, t1))
    return (c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_inv(a):
    t = f6_inv(f6_sub(f6_sqr(a[0]), f6_mul_by_v(f6_sqr(a[1]))))
    return (f6_mul(a[0], t), f6_neg(f6_mul(a[1], t)))


def f12_conj(a):
    return (a[0], f6_neg(a[1]))


def f12_pow(a, e: int):
    result = F12_ONE
    base = a
    while e:
        if e & 1:
            result = f12_mul(result, base)
        e >>= 1
        base = f12_sqr(base)
    return result


F12_ONE = (F6_ONE, F6_ZERO)

def _frob_coeffs():
    # xi^((p^k - 1)/6) for k = 1..3, per power j = 0..5
    out = []
    for k in (1, 2, 3):
        e = (P**k - 1) // 6
        base = _f2_pow(XI, e)
        row = [F2_ONE]
        for _ in range(5):
            row.append(f2_mul(row[-1], base))
        out.append(row)
    return out


def _f2_pow(a, e: int):
    result = F2_ONE
    base = a
    while e:
        if e & 1:
            result = f2_mul(result, base)
        e >>= 1
        base = f2_sqr(base)
    return result


_FROB = _frob_coeffs()


def f12_frobenius(a, k: int):
    """a^(p^k) for k = 1, 2, 3."""
    coeffs = _FROB[k - 1]

    def c(x, j):
        # coefficient of v^j w^i: conjugate (if k odd) then scale
        y = f2_conj(x) if k % 2 == 1 else x
        return f2_mul(y, coeffs[j])

    c0 = (c(a[0][0], 0), c(a[0][1], 2), c(a[0][2], 4))
    c1 = (c(a[1][0], 1), c(a[1][1], 3), c(a[1][2], 5))
    return (c0, c1)


# ---- G1 (affine/jacobian host ops) -----------------------------------------


def g1_add(p1, p2):
    """Affine addition; None = identity."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_mul(pt, k: int):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = g1_add(acc, pt)
        pt = g1_add(pt, pt)
        k >>= 1
    return acc


G1_GEN = (1, 2)


# ---- G2 (over Fp2) ----------------------------------------------------------

G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if f2_add(y1, y2) == F2_ZERO:
            return None
        lam = f2_mul(f2_muls(f2_sqr(x1), 3), f2_inv(f2_muls(y1, 2)))
    else:
        lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    y3 = f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_neg(p):
    return None if p is None else (p[0], f2_neg(p[1]))


def g2_mul(pt, k: int):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = g2_add(acc, pt)
        pt = g2_add(pt, pt)
        k >>= 1
    return acc


# ---- optimal ate pairing -----------------------------------------------------


def _line(q1, q2, pt):
    """Evaluate the line through q1, q2 (G2 points, affine Fp2) at the G1
    point pt, as a sparse Fp12 element; also return q1+q2."""
    if q1[0] == q2[0] and q1[1] == q2[1]:
        lam = f2_mul(f2_muls(f2_sqr(q1[0]), 3), f2_inv(f2_muls(q1[1], 2)))
    elif q1[0] == q2[0]:
        raise ValueError("degenerate line (Q1 = -Q2) in Miller loop")
    else:
        lam = f2_mul(f2_sub(q2[1], q1[1]), f2_inv(f2_sub(q2[0], q1[0])))
    x3 = f2_sub(f2_sub(f2_sqr(lam), q1[0]), q2[0])
    y3 = f2_sub(f2_mul(lam, f2_sub(q1[0], x3)), q1[1])
    q3 = (x3, y3)
    ell = _embed_line(lam, q1, pt)
    return ell, q3


def _embed_line(lam, q, pt):
    """Line through psi(q) (q on the twist, slope lam in Fp2), evaluated at
    the G1 point pt = (x_p, y_p), embedded in Fp12.

    With the D-twist map psi: (x', y') -> (x' w^2, y' w^3), w^6 = xi, the
    slope of the untwisted line is lam * w (dy/dx picks up w^3 / w^2), so
        l = (y_p - y_q w^3) - lam w (x_p - x_q w^2)
          = y_p  +  (-lam x_p) w  +  (lam x_q - y_q) w^3 .
    Basis (Fp12 = Fp6 + Fp6 w, Fp6 = Fp2 + Fp2 v + Fp2 v^2, v = w^2):
    w^0 -> c0[0], w^1 -> c1[0], w^3 -> c1[1].
    """
    x_p, y_p = pt
    a = (y_p % P, 0)                                    # w^0
    b = f2_muls(lam, (-x_p) % P)                        # w^1
    c = f2_sub(f2_mul(lam, q[0]), q[1])                 # w^3
    return ((a, F2_ZERO, F2_ZERO), (b, c, F2_ZERO))


# 6u+2 in signed binary (NAF) for the Miller loop
_ATE_LOOP = 6 * U + 2


def miller_loop(q, pt):
    """Optimal ate Miller loop f_{6u+2, Q}(P) with Frobenius corrections."""
    if q is None or pt is None:
        return F12_ONE
    f = F12_ONE
    t = q
    bits = bin(_ATE_LOOP)[3:]  # skip leading 1
    for bit in bits:
        ell, t = _line(t, t, pt)
        f = f12_mul(f12_sqr(f), ell)
        if bit == "1":
            ell, t = _line(t, q, pt)
            f = f12_mul(f, ell)
    # Frobenius corrections: Q1 = pi_p(Q), Q2 = -pi_{p^2}(Q)
    q1 = _g2_frobenius(q, 1)
    q2 = g2_neg(_g2_frobenius(q, 2))
    ell, t = _line(t, q1, pt)
    f = f12_mul(f, ell)
    ell, _ = _line(t, q2, pt)
    f = f12_mul(f, ell)
    return f


# twist Frobenius constants: xi^((p-1)/3), xi^((p-1)/2)
_TW_X = _f2_pow(XI, (P - 1) // 3)
_TW_Y = _f2_pow(XI, (P - 1) // 2)


def _g2_frobenius(q, k: int):
    if q is None:
        return None
    x, y = q
    for _ in range(k):
        x = f2_mul(f2_conj(x), _TW_X)
        y = f2_mul(f2_conj(y), _TW_Y)
    return (x, y)


def final_exponentiation(f):
    """f^((p^12 - 1) / r) — easy part then the hard part via u-chain."""
    # easy: f^(p^6 - 1) = conj(f) * f^-1, then ^(p^2 + 1)
    f = f12_mul(f12_conj(f), f12_inv(f))
    f = f12_mul(f12_frobenius(f, 2), f)
    # hard part: exponent (p^4 - p^2 + 1)/r, computed directly (correct and
    # simple; the optimized u-chain is a pure-host micro-optimization)
    e = (P**4 - P**2 + 1) // R
    return f12_pow(f, e)


def pairing(pt, q):
    """e(P, Q) for P in G1 (affine ints), Q in G2 (affine Fp2)."""
    if pt is None or q is None:
        return F12_ONE
    return final_exponentiation(miller_loop(q, pt))


def multi_pairing(pairs):
    """prod e(P_i, Q_i): shared final exponentiation over the product of
    Miller loops (ref: `bn254/src/curve.rs:439` multi_pairing)."""
    f = F12_ONE
    for pt, q in pairs:
        if pt is None or q is None:
            continue
        f = f12_mul(f, miller_loop(q, pt))
    return final_exponentiation(f)
