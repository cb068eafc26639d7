"""Big prime fields (BN254 Fr/Fp) as 16-digit x 16-bit limb arrays.

Reference parity: `bn254/src/field.rs:98` (`Fr`: Montgomery form, 4 x u64
limbs, schoolbook + interleaved Montgomery mul `bn254/src/helpers.rs:188`,
carry-chain add/sub `:32,:60`, gcd inversion `:417`, `TwoAdicField` with
TWO_ADICITY = 28).

TPU-native design: the TPU has no 64-bit integers and no 32x32 mul-high, so
the reference's 4 x u64 carry chains are re-derived as **16 x 16-bit digits
stored in uint32 lanes**: every partial product a_i*b_j < 2^32 fits a lane,
and the CIOS Montgomery loop bound t[j] + a_i*b_j + carry <= 2^32 - 1 holds
exactly (the classic word-size bound). All carry chains are static unrolls;
an element array has shape (..., 16) and every op vectorizes over the
leading lane axes. Inversion is a fixed-exponent square-and-multiply under
`lax.scan` (p is prime, a^(p-2)), 256 small steps instead of the
reference's branchy Bernstein-Yang GCD — scans beat data-dependent loops on
TPU. Host <-> device conversion goes through Python ints (exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field import _trace_aware_jit, Field

U32 = jnp.uint32
DIGIT_BITS = 16
NUM_DIGITS = 16
MASK = jnp.uint32(0xFFFF)


def _to_digits(x: int) -> np.ndarray:
    return np.array(
        [(x >> (DIGIT_BITS * i)) & 0xFFFF for i in range(NUM_DIGITS)], dtype=np.uint32
    )


def _from_digits(d) -> int:
    return sum(int(v) << (DIGIT_BITS * i) for i, v in enumerate(d))


class BigPrimeField(Field):
    """A ~256-bit prime field in Montgomery form (R = 2^256)."""

    shape_suffix = (NUM_DIGITS,)

    def __init__(self, name: str, p: int, generator: int, two_adicity: int):
        self.name = name
        self.order = p
        self.characteristic = p
        self.generator_int = generator
        self.two_adicity = two_adicity
        self.R_int = (1 << (DIGIT_BITS * NUM_DIGITS)) % p
        self.R2_int = self.R_int * self.R_int % p
        # n0 = -p^-1 mod 2^16 (Montgomery digit constant)
        self.n0_int = (-pow(p, -1, 1 << DIGIT_BITS)) % (1 << DIGIT_BITS)
        self._p_dig = jnp.asarray(_to_digits(p))
        self._n0 = jnp.uint32(self.n0_int)
        self._r2 = jnp.asarray(_to_digits(self.R2_int))
        # (p-2) bits for the inversion scan, LSB first
        self._inv_bits = jnp.asarray(
            [(p - 2) >> i & 1 for i in range((p - 2).bit_length())], dtype=jnp.uint32
        )
        # (p+1)/2 in Montgomery form as a host constant (must NOT be built
        # lazily inside a jit trace — it would cache a tracer)
        self._half = _to_digits((p + 1) // 2 * self.R_int % p)
        # jit the composite ops once per instance
        self.mul = _trace_aware_jit(self._mul_impl)
        self.add = _trace_aware_jit(self._add_impl)
        self.sub = _trace_aware_jit(self._sub_impl)
        self.neg = _trace_aware_jit(self._neg_impl)
        self.inv = _trace_aware_jit(self._inv_impl)
        self.square = _trace_aware_jit(lambda a: self._mul_impl(a, a))

    # ---- host <-> device -----------------------------------------------

    def from_int_np(self, x) -> np.ndarray:
        """Canonical Python ints / numpy -> Montgomery digit arrays (host)."""
        arr = np.asarray(x, dtype=object)
        flat = arr.reshape(-1)
        out = np.zeros((flat.size, NUM_DIGITS), dtype=np.uint32)
        for i, v in enumerate(flat):
            out[i] = _to_digits(int(v) * self.R_int % self.order)
        return out.reshape(arr.shape + (NUM_DIGITS,))

    def from_int(self, x):
        """Canonical Python ints / numpy -> Montgomery-form digit arrays."""
        return jnp.asarray(self.from_int_np(x))

    def to_ints(self, a) -> np.ndarray:
        """Montgomery-form digit arrays -> canonical Python ints (object)."""
        arr = np.asarray(a, dtype=np.uint64)
        flat = arr.reshape(-1, NUM_DIGITS)
        r_inv = pow(self.R_int, -1, self.order)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = _from_digits(flat[i]) * r_inv % self.order
        return out.reshape(arr.shape[:-1])

    def ones(self, shape=()):
        one = _to_digits(self.R_int)
        return jnp.broadcast_to(jnp.asarray(one), tuple(shape) + (NUM_DIGITS,))

    # ---- carry helpers ----------------------------------------------------

    @staticmethod
    def _carry_prop(digits):
        """Propagate carries through a list of u32 lane arrays holding
        (value < 2^32) per digit; returns 16-bit digits + final carry."""
        out = []
        carry = None
        for d in digits:
            x = d if carry is None else d + carry
            out.append(x & MASK)
            carry = x >> DIGIT_BITS
        return out, carry

    def _ge_p(self, d):
        """Branchless d >= p over digit lists (lexicographic from the top)."""
        lt = None
        for i in range(NUM_DIGITS):  # LSB -> MSB so the top digit dominates
            pi = self._p_dig[i]
            lt_i = (d[i] < pi).astype(U32)
            eq_i = (d[i] == pi).astype(U32)
            lt = lt_i if lt is None else lt_i | (eq_i & lt)
        return jnp.uint32(1) - lt  # 1 if d >= p (including d == p)

    def _sub_p(self, d, enable):
        """d - enable*p with borrow chain (enable is 0/1 lanes)."""
        out = []
        borrow = jnp.zeros_like(enable)
        for i in range(NUM_DIGITS):
            x = d[i] + (jnp.uint32(1) << DIGIT_BITS) - enable * self._p_dig[i] - borrow
            out.append(x & MASK)
            borrow = jnp.uint32(1) - (x >> DIGIT_BITS)
        return out

    # ---- ring ops ---------------------------------------------------------

    def _add_impl(self, a, b):
        digs = [a[..., i] + b[..., i] for i in range(NUM_DIGITS)]
        digs, _ = self._carry_prop(digs)
        digs = self._sub_p(digs, self._ge_p(digs))
        return jnp.stack(digs, axis=-1)

    def _sub_impl(self, a, b):
        """(a + p - b) digitwise, then one conditional subtract. The carry
        can be -1 (a borrow): u32 wraparound keeps the chain exact because
        every true digit value stays in [0, 2^18)."""
        out = []
        carry = jnp.zeros_like(a[..., 0])
        offset = jnp.uint32(1 << DIGIT_BITS)
        for i in range(NUM_DIGITS):
            x = a[..., i] + self._p_dig[i] - b[..., i] + carry + offset
            out.append(x & MASK)
            carry = (x >> DIGIT_BITS) - jnp.uint32(1)  # remove the 2^16 offset
        digs = self._sub_p(out, self._ge_p(out))
        return jnp.stack(digs, axis=-1)

    def _neg_impl(self, a):
        zero = jnp.zeros_like(a)
        return self._sub_impl(zero, a)

    def _mul_impl(self, a, b):
        """CIOS Montgomery multiplication in 16-bit digits
        (ref: `bn254/src/helpers.rs:188` monty_mul, re-derived for u32).

        The outer digit loop runs under lax.scan (16 steps, small body) so
        that point formulas composed of ~14 muls — and scans over THOSE,
        like the MSM bit loop — stay compilable; a fully unrolled CIOS is
        ~2000 HLO ops per multiply."""
        s = NUM_DIGITS
        a, b = jnp.broadcast_arrays(a, b)
        av = jnp.moveaxis(a, -1, 0)  # (16, ...) digit-major scan input
        bv = [b[..., j] for j in range(s)]
        t0 = jnp.zeros((s + 2,) + a.shape[:-1], U32)
        p_dig = self._p_dig
        n0 = self._n0

        def step(t, ai):
            # t += a_i * b
            c = jnp.zeros_like(ai)
            tn = []
            for j in range(s):
                x = t[j] + ai * bv[j] + c
                tn.append(x & MASK)
                c = x >> DIGIT_BITS
            x = t[s] + c
            ts = x & MASK
            ts1 = t[s + 1] + (x >> DIGIT_BITS)
            # Montgomery digit reduction (shift down by one digit)
            m = (tn[0] * n0) & MASK
            x = tn[0] + m * p_dig[0]
            c = x >> DIGIT_BITS
            out = []
            for j in range(1, s):
                x = tn[j] + m * p_dig[j] + c
                out.append(x & MASK)
                c = x >> DIGIT_BITS
            x = ts + c
            out.append(x & MASK)
            new_ts = ts1 + (x >> DIGIT_BITS)
            zero = jnp.zeros_like(new_ts)
            return jnp.stack(out + [new_ts, zero]), None

        # unroll=4 on TPU: the 16 digit steps are tiny vector ops —
        # per-iteration loop latency dominates at the ~4-16k lane widths
        # the blocked-scan MSM runs at; 4 steps per trip cuts that 4x for
        # a ~4x larger scan body (still one body instance). On the CPU
        # backend (tests) the larger body only slows the already-minutes
        # compiles, so the loop stays rolled there.
        unroll = 4 if jax.default_backend() in ("tpu", "axon") else 1
        t, _ = jax.lax.scan(step, t0, av, unroll=unroll)
        digs = [t[j] for j in range(s)]
        # result < 2p: one conditional subtract (t[s] holds a possible top bit)
        ge = self._ge_p(digs) | (t[s] > 0).astype(U32)
        digs = self._sub_p(digs, ge)
        return jnp.stack(digs, axis=-1)

    def _inv_impl(self, a):
        """a^(p-2) via lax.scan over the fixed exponent bits (LSB first)."""
        def step(carry, bit):
            acc, base = carry
            new_acc = self._mul_impl(acc, base)
            acc = jnp.where(bit, new_acc, acc)
            base = self._mul_impl(base, base)
            return (acc, base), None

        ones = self.ones(a.shape[: a.ndim - 1])
        (acc, _), _ = jax.lax.scan(step, (ones, a), self._inv_bits)
        return acc

    def halve(self, a):
        return self.mul(a, jnp.broadcast_to(jnp.asarray(self._half), a.shape))

    def rand(self, rng: np.random.Generator, shape=()):
        total = int(np.prod(shape)) if shape else 1
        vals = np.empty(total, dtype=object)
        for i in range(total):
            v = 0
            for _ in range(5):
                v = (v << 62) | int(rng.integers(0, 1 << 62))
            vals[i] = v % self.order
        return self.from_int(vals.reshape(shape) if shape else vals[0])


# BN254 scalar field Fr (ref: `bn254/src/field.rs:29-53` constants;
# generator 5, two-adicity 28)
BN254_FR_P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# BN254 base field Fp (curve coordinates; ref: halo2curves bn256::Fq)
BN254_FP_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583

Bn254Fr = BigPrimeField("Bn254Fr", BN254_FR_P, 5, 28)
Bn254Fp = BigPrimeField("Bn254Fp", BN254_FP_P, 3, 1)
