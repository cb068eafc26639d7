"""Field descriptor base classes (reference parity: `field/src/field.rs`).

TPU-first design: instead of the reference's Rust trait tower
(`PrimeCharacteristicRing -> Field -> PrimeField32/64 -> ExtensionField`,
`field/src/field.rs:55-956`) with element types, we use **field descriptor
singletons** operating on raw `jnp.uint32` arrays:

  * arrays are SoA and shape-polymorphic: an array of field elements has shape
    ``batch_shape + F.shape_suffix`` where ``shape_suffix`` is ``()`` for
    31-bit fields, ``(D,)`` for degree-D extensions and ``(num_limbs,)`` for
    big fields (BN254);
  * every op is a pure jnp function — composable under jit / vmap /
    shard_map, traced once per shape and fused by XLA;
  * "packing" (`field/src/packed/packed_traits.rs`) has no analogue: every
    array op is already vectorized over all 8x128 VPU lanes.

Exponents, field orders and generator derivations are host-side Python ints
(computed once at import), mirroring the reference's compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = jnp.uint32(0xFFFF)

# The host CPU backend compiles each new (primitive, shape) pair slowly;
# jitting composite field ops collapses each into a single compilation and
# lets the persistent compilation cache reuse them across processes. Under an
# outer jit (the production path: whole prover stages jitted) these become
# ordinary traced calls.
_JIT_METHODS = (
    "add",
    "sub",
    "neg",
    "mul",
    "square",
    "double",
    "cube",
    "halve",
    "inv",
    "div",
    "to_canonical",
    "from_canonical",
    "mul_base",
    "from_base",
)
_JIT_STATIC1 = ("exp_const", "frobenius", "mul_2exp", "div_2exp", "powers")


def _trace_aware_jit(fn, **jit_kwargs):
    """jit for EAGER calls only: inside any active trace (an outer jit /
    scan / pallas kernel being traced) the raw function runs instead, so
    composite field ops cost plain jnp binds rather than a nested-pjit
    dispatch.  Profiling (round 3): a cold 2^13 prove made ~450k nested
    pjit dispatches at ~0.5ms each — over half the cold wall time — all
    from these wrappers firing during outer tracing."""
    from jax._src import core as _core

    jfn = jax.jit(fn, **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _core.trace_state_clean():
            return jfn(*args, **kwargs)
        return fn(*args, **kwargs)

    return wrapper


def _jit_field_methods(f):
    """Wrap a field descriptor's composite ops in trace-aware jit (call at
    end of __init__)."""
    for name in _JIT_METHODS:
        fn = getattr(f, name, None)
        if fn is not None:
            setattr(f, name, _trace_aware_jit(fn))
    for name in _JIT_STATIC1:
        fn = getattr(f, name, None)
        if fn is not None:
            setattr(f, name, _trace_aware_jit(fn, static_argnums=1))
    return f


def mulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    TPU has no native 64-bit integers, so we do the classic 16-bit digit
    decomposition (4 u32 multiplies). This is the workhorse under every
    modular multiply — the analogue of the reference's AVX `mul_epu32`-based
    kernels (`field/src/packed/x86_64_avx.rs`). Branchless; no overflow:
    each partial term fits in uint32.
    """
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lo = a0 * b0
    m1 = a1 * b0 + (lo >> 16)
    m2 = a0 * b1 + (m1 & MASK16)
    return a1 * b1 + (m1 >> 16) + (m2 >> 16)


class Ring:
    """Minimal ring interface shared by prime fields and extensions.

    Mirrors `PrimeCharacteristicRing` (`field/src/field.rs:55`): zero/one,
    add/sub/neg/mul, double/square/cube, exp, sums — but as array ops.
    """

    name: str = "?"
    #: trailing dims of an element array, e.g. () or (4,) or (8,)
    shape_suffix: tuple = ()
    dtype = U32

    # ---- constructors -------------------------------------------------
    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + self.shape_suffix, self.dtype)

    def ones(self, shape=()):
        raise NotImplementedError

    # ---- arithmetic ---------------------------------------------------
    def add(self, a, b):
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def neg(self, a):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def square(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def cube(self, a):
        return self.mul(self.square(a), a)

    def exp_const(self, a, e: int):
        """a**e for a static Python-int exponent, via square-and-multiply.

        Unrolled at trace time — XLA sees a straight-line chain of fused
        multiplies (ref: `exp_const_u64` addition chains, `field/src/field.rs`).
        """
        if e < 0:
            raise ValueError("negative exponent; use inv")
        if e == 0:
            return self.ones(a.shape[: len(a.shape) - len(self.shape_suffix)])
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        return result

    def sum(self, a, axis=0):
        """Tree-sum along a batch axis (ref: `sum_array` tree-sums)."""
        sfx = len(self.shape_suffix)
        if axis < 0:
            axis = a.ndim - sfx + axis
        n = a.shape[axis]
        while n > 1:
            half = n // 2
            lo = jnp.take(a, jnp.arange(0, half), axis=axis)
            hi = jnp.take(a, jnp.arange(half, 2 * half), axis=axis)
            s = self.add(lo, hi)
            if n % 2:
                tail = jnp.take(a, jnp.arange(2 * half, n), axis=axis)
                s = jnp.concatenate([s, tail], axis=axis)
                n = half + 1
            else:
                n = half
            a = s
        return jnp.squeeze(a, axis=axis)

    def dot(self, a, b, axis=0):
        """sum_i a_i * b_i along an axis."""
        return self.sum(self.mul(a, b), axis=axis)


class Field(Ring):
    """A field descriptor: adds order, inversion, powers, two-adic roots.

    Mirrors `Field`/`TwoAdicField` (`field/src/field.rs:749,956`).
    """

    order: int = 0  # |F| as a Python int
    characteristic: int = 0
    two_adicity: int = 0
    #: Python int: a multiplicative generator of F* (canonical form)
    generator_int: int = 0

    def inv(self, a):
        raise NotImplementedError

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def halve(self, a):
        raise NotImplementedError

    def powers(self, base, n: int):
        """[1, b, b^2, ..., b^(n-1)], shape (n,)+suffix.

        Log-depth doubling (the parallel analogue of the reference's `Powers`
        iterator with packed parallel collect, `field/src/field.rs:968-1058`).
        `base` is a scalar element array of shape `shape_suffix`.
        """
        if n <= 0:
            return self.zeros((0,))
        p = self.ones((1,))
        cur = base[None] if base.shape == self.shape_suffix else base
        length = 1
        while length < n:
            step = min(length, n - length)
            # multiply the whole prefix by base^length
            shifted = self.mul(p[:step], cur)
            p = jnp.concatenate([p, shifted], axis=0)
            if length * 2 < n:
                cur = self.square(cur)
            length *= 2
        return p[:n]

    def shifted_powers(self, base, shift, n: int):
        """[s, s*b, s*b^2, ...]."""
        return self.mul(self.powers(base, n), shift[None] if shift.shape == self.shape_suffix else shift)

    # ---- two-adic machinery ------------------------------------------

    def two_adic_generator_int(self, bits: int) -> int:
        """Canonical-int generator of the order-2^bits subgroup (host math).

        Ref: `TwoAdicField::two_adic_generator` (`field/src/field.rs:956`).
        """
        if bits > self.two_adicity:
            raise ValueError(f"{self.name}: two-adicity {self.two_adicity} < {bits}")
        return pow(self.generator_int, (self.order - 1) >> bits, self.order)

    def two_adic_generator(self, bits: int):
        return self.from_int(self.two_adic_generator_int(bits))

    # ---- host <-> device conversion ----------------------------------

    def from_int(self, x):
        """Python int / numpy int array (canonical) -> element array."""
        raise NotImplementedError

    def to_ints(self, a) -> np.ndarray:
        """Element array -> numpy object array of canonical Python ints."""
        raise NotImplementedError

    def rand(self, rng: np.random.Generator, shape=()):
        """Uniform random elements (host-side RNG, for tests)."""
        vals = rng.integers(0, self.order, size=shape, dtype=np.uint64) if self.order < (1 << 63) else None
        if vals is None:
            flat = [int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 62)) << 62) | (int(rng.integers(0, 1 << 62)) << 124) | (int(rng.integers(0, 1 << 62)) << 186) for _ in range(int(np.prod(shape)) if shape else 1)]
        if vals is None:
            arr = np.array([v % self.order for v in flat], dtype=object).reshape(shape)
            return self.from_int(arr)
        return self.from_int(vals)


@functools.lru_cache(maxsize=None)
def _pow_cache(base: int, exp: int, mod: int) -> int:
    return pow(base, exp, mod)
