"""31-bit Montgomery prime fields: BabyBear, KoalaBear.

Reference parity: the removed upstream crates `p3-monty-31`, `p3-baby-bear`,
`p3-koala-bear` (see SURVEY.md §2.8; API shape recovered from call sites in
`examples/src/proofs.rs` and `field/src/field.rs` trait bounds).

TPU-native design: elements live in **Montgomery form** (x * 2^32 mod p) in
`uint32` lanes. All ops are branchless (`jnp.where` selects), exactly the
min(t, t-P) trick of the reference's AVX kernels
(`field/src/packed/x86_64_avx.rs:10-31`) but over whole XLA arrays instead of
8-lane registers. Multiplication is Montgomery REDC built on a 16-bit-digit
mul-high (no 64-bit ints on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .field import Field, U32, _jit_field_methods, mulhi32



def _reduce_np(x, p: int) -> np.ndarray:
    """Reduce host ints mod p to uint64, handling arbitrarily large Python
    ints (object arrays appear when embedding extension-order constants)."""
    arr = np.asarray(x)
    if arr.dtype == object:
        return np.asarray(arr % p, dtype=np.uint64)
    return np.asarray(arr, dtype=np.uint64) % np.uint64(p)

class MontyField31(Field):
    """Generic 31-bit Montgomery field descriptor (ref: `p3-monty-31`)."""

    def __init__(self, name: str, p: int, two_adicity: int, generator: int):
        self.name = name
        self.order = p
        self.characteristic = p
        self.two_adicity = two_adicity
        self.generator_int = generator
        self.shape_suffix = ()
        self.P_int = p
        self.R_int = (1 << 32) % p          # Montgomery R mod p
        self.R2_int = (1 << 64) % p
        self.R_inv_int = pow(self.R_int, p - 2, p)
        # MU = -p^{-1} mod 2^32, so q = lo * MU gives lo + q*p == 0 mod 2^32
        self.MU_int = (-pow(p, -1, 1 << 32)) % (1 << 32)
        self.P = jnp.uint32(p)
        self.MU = jnp.uint32(self.MU_int)
        self._R2 = jnp.uint32(self.R2_int)
        self._one = jnp.uint32(self.R_int)
        _jit_field_methods(self)

    # ---- representation ----------------------------------------------

    def ones(self, shape=()):
        return jnp.full(shape, self._one, U32)

    def from_int_np(self, x) -> np.ndarray:
        arr = _reduce_np(x, self.P_int)
        monty = (arr * np.uint64(self.R_int)) % np.uint64(self.P_int)
        return monty.astype(np.uint32)

    def from_int(self, x):
        return jnp.asarray(self.from_int_np(x))

    def to_ints(self, a) -> np.ndarray:
        arr = np.asarray(a, dtype=np.uint64)
        return ((arr * np.uint64(self.R_inv_int)) % np.uint64(self.P_int)).astype(np.uint64)

    def to_canonical(self, a):
        """Device-side Montgomery -> canonical u32 (for hashing/serialization)."""
        return self._monty_reduce_mul(a, jnp.uint32(1))

    def from_canonical(self, a):
        """Device-side canonical u32 -> Montgomery form."""
        return self._monty_reduce_mul(a, self._R2)

    # ---- arithmetic ---------------------------------------------------

    def add(self, a, b):
        s = a + b  # < 2p < 2^32
        return jnp.where(s >= self.P, s - self.P, s)

    def sub(self, a, b):
        d = a - b  # wraps
        return jnp.where(a < b, d + self.P, d)

    def neg(self, a):
        return jnp.where(a == 0, jnp.uint32(0), self.P - a)

    def _monty_reduce_mul(self, a, b):
        """REDC(a*b): inputs in [0,p), Montgomery product in [0,p).

        t = (a*b + q*p) / 2^32 with q = (a*b mod 2^32) * MU mod 2^32.
        The carry out of the low half is exactly (lo != 0) since
        lo + (q*p mod 2^32) == 0 mod 2^32.
        """
        lo = a * b
        hi = mulhi32(a, b)
        q = lo * self.MU
        u = mulhi32(q, self.P)
        t = hi + u + (lo != 0).astype(U32)
        return jnp.where(t >= self.P, t - self.P, t)

    def mul(self, a, b):
        return self._monty_reduce_mul(a, b)

    def halve(self, a):
        # (a + p*(a odd)) >> 1 ; a + p < 2^32
        return (a + jnp.where(a & 1 == 1, self.P, jnp.uint32(0))) >> 1

    def inv(self, a):
        """Inverse by Fermat exponentiation — fully parallel over the batch.

        The reference uses a Bernstein–Yang GCD (`util/src/lib.rs:694`) which
        is branch-heavy; on TPU a fixed 31-step square-and-multiply chain is
        branchless and batched.
        """
        return self.exp_const(a, self.P_int - 2)

    def __repr__(self):
        return f"MontyField31({self.name})"

    def __hash__(self):
        return hash((self.name, self.P_int))

    def __eq__(self, other):
        return isinstance(other, MontyField31) and other.P_int == self.P_int


# p = 2^31 - 2^27 + 1, two-adicity 27, generator 31 (upstream p3-baby-bear)
BabyBear = MontyField31("BabyBear", (1 << 31) - (1 << 27) + 1, 27, 31)
# p = 2^31 - 2^24 + 1, two-adicity 24, generator 3 (upstream p3-koala-bear)
KoalaBear = MontyField31("KoalaBear", (1 << 31) - (1 << 24) + 1, 24, 3)
