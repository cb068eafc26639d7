"""Mersenne31: p = 2^31 - 1 (reference parity: removed upstream crate
`p3-mersenne-31`; hooks retained at `field/src/extension/complex.rs:9`).

Canonical representation in [0, p). Reduction is shift-and-add — the
cheapest field on the VPU (no Montgomery needed). Two-adicity of p-1 is 1;
FFTs over M31 use the circle group (see `plonky3_eon_tpu/circle/`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .field import Field, U32, _jit_field_methods, mulhi32

_M = (1 << 31) - 1



def _reduce_np(x, p: int) -> np.ndarray:
    """Reduce host ints mod p to uint64, handling arbitrarily large Python
    ints (object arrays appear when embedding extension-order constants)."""
    arr = np.asarray(x)
    if arr.dtype == object:
        return np.asarray(arr % p, dtype=np.uint64)
    return np.asarray(arr, dtype=np.uint64) % np.uint64(p)

class Mersenne31Field(Field):
    def __init__(self):
        self.name = "Mersenne31"
        self.order = _M
        self.characteristic = _M
        self.two_adicity = 1
        self.generator_int = 7
        self.shape_suffix = ()
        self.P = jnp.uint32(_M)
        self.P_int = _M
        _jit_field_methods(self)

    def ones(self, shape=()):
        return jnp.full(shape, jnp.uint32(1), U32)

    def from_int_np(self, x) -> np.ndarray:
        arr = _reduce_np(x, _M)
        return arr.astype(np.uint32)

    def from_int(self, x):
        return jnp.asarray(self.from_int_np(x))

    def to_ints(self, a) -> np.ndarray:
        return np.asarray(a, dtype=np.uint64)

    def to_canonical(self, a):
        return a

    def from_canonical(self, a):
        return jnp.where(a >= self.P, a - self.P, a)

    def add(self, a, b):
        s = a + b  # <= 2p < 2^32
        return jnp.where(s >= self.P, s - self.P, s)

    def sub(self, a, b):
        d = a - b
        return jnp.where(a < b, d + self.P, d)

    def neg(self, a):
        return jnp.where(a == 0, jnp.uint32(0), self.P - a)

    def mul(self, a, b):
        lo = a * b
        hi = mulhi32(a, b)
        # 62-bit product = hi:lo; fold at bit 31: (prod & p) + (prod >> 31)
        lo31 = lo & self.P
        hi31 = (hi << 1) | (lo >> 31)
        t = lo31 + hi31              # <= 2^32 - 2
        t = (t & self.P) + (t >> 31)  # <= p + 1
        return jnp.where(t >= self.P, t - self.P, t)

    def halve(self, a):
        # x/2 mod p: rotate right by 1 (since 2^31 == 1 mod p)
        return ((a >> 1) | (a << 30)) & self.P

    def mul_2exp(self, a, k: int):
        """a * 2^k mod p — a lane rotation, free on M31."""
        k %= 31
        return ((a << k) | (a >> (31 - k))) & self.P

    def div_2exp(self, a, k: int):
        return self.mul_2exp(a, 31 - (k % 31))

    def inv(self, a):
        return self.exp_const(a, _M - 2)

    def __repr__(self):
        return "Mersenne31"

    def __hash__(self):
        return hash("Mersenne31")

    def __eq__(self, other):
        return isinstance(other, Mersenne31Field)


Mersenne31 = Mersenne31Field()
