"""Binomial extension fields F[X]/(X^D - W).

Reference parity: `field/src/extension/binomial_extension.rs:28` and the
specialized D=2..8 mul/square/inv circuits at `:738-1267`, plus
`ComplexExtendable` (`field/src/extension/complex.rs:9`).

TPU-native design: an extension element array has shape (..., D) with the
coefficient axis innermost (before any base-field limb axis). Multiplication
is the static double loop c_k = sum_{i+j=k} a_i b_j + W * sum_{i+j=k+D};
unrolled at trace time, XLA fuses it into one elementwise kernel over all
lanes — the analogue of the reference's `PackedFieldExtension` lane packing
(`field/src/packed/packed_binomial_extension.rs`).

Inversion uses the norm map: inv(a) = (prod of Frobenius conjugates) / N(a),
with Frobenius a coefficient-wise scaling (X^p = W^((p-1)/D) * X since
p == 1 mod D) — branchless and O(D) base muls, vs the reference's explicit
per-degree inverse circuits.
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import Field, _jit_field_methods
from .monty31 import BabyBear, KoalaBear
from .mersenne31 import Mersenne31


class BinomialExtension(Field):
    def __init__(self, base: Field, D: int, W_int: int, name: str | None = None):
        if (base.order - 1) % D != 0:
            raise ValueError(f"{base.name}: D={D} must divide p-1 for a binomial extension")
        self.base = base
        self.D = D
        self.W_int = W_int % base.order
        self.name = name or f"{base.name}^{D}"
        self.order = base.order**D
        self.characteristic = base.characteristic
        #: coefficient axis sits BEFORE the base field's own limb suffix
        #: (e.g. (D,) over 31-bit fields, (D, 2) over Goldilocks u32 pairs)
        self.shape_suffix = (D,) + base.shape_suffix
        self._bs = len(base.shape_suffix)
        self._W = base.from_int(self.W_int)
        # Frobenius scalars: frob^k scales coeff i by (W^((p-1)/D))^(i*k)
        z = pow(self.W_int, (base.order - 1) // D, base.order)
        self._frob_consts = [
            base.from_int([pow(z, i * k, base.order) for i in range(D)]) for k in range(D)
        ]
        self.two_adicity = base.two_adicity  # subgroup of base lifts; enough for our use
        self.generator_int = 0  # multiplicative generator not needed on device
        _jit_field_methods(self)

    # ---- representation ----------------------------------------------

    def _c(self, a, i: int):
        """i-th extension coefficient (skipping the base limb suffix)."""
        if self._bs:
            return a[(Ellipsis, i) + (slice(None),) * self._bs]
        return a[..., i]

    def _set0(self, out, val):
        idx = (Ellipsis, 0) + (slice(None),) * self._bs
        return out.at[idx].set(val)

    def _stack(self, cs):
        return jnp.stack(cs, axis=-(1 + self._bs))

    def ones(self, shape=()):
        o = self.zeros(shape)
        return self._set0(o, self.base.ones(shape))

    def from_base(self, a):
        """Embed base-field array -> extension array (..., D[, base sfx])."""
        batch = a.shape[: a.ndim - self._bs]
        out = jnp.zeros(batch + self.shape_suffix, self.dtype)
        return self._set0(out, a)

    def from_int(self, x):
        """Canonical int(s): accepts a single int (embedded) or a last-dim-D array."""
        import numpy as np

        arr = np.asarray(x, dtype=object)
        if arr.ndim == 0 or arr.shape[-1] != self.D:
            base = self.base.from_int(arr)
            return self.from_base(base)
        return self.base.from_int(arr)

    def from_int_np(self, x):
        """Embed canonical ints as host numpy arrays (twiddle tables)."""
        import numpy as np

        arr = np.asarray(x, dtype=object)
        base_np = self.base.from_int_np(arr)
        out = np.zeros(arr.shape + self.shape_suffix, base_np.dtype)
        out[(Ellipsis, 0) + (slice(None),) * self._bs] = base_np
        return out

    def two_adic_generator_int(self, bits: int) -> int:
        """The two-adic subgroup lifts from the base field (DFTs over EF
        matrices use base-field twiddles embedded in EF)."""
        return self.base.two_adic_generator_int(bits)

    def to_ints(self, a):
        return self.base.to_ints(a)

    # ---- arithmetic ---------------------------------------------------

    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def mul(self, a, b):
        F, D = self.base, self.D
        cs = []
        for k in range(D):
            acc = None
            acc_hi = None  # terms needing * W
            for i in range(D):
                j = (k - i) % D
                t = F.mul(self._c(a, i), self._c(b, j))
                if i + j >= D:
                    acc_hi = t if acc_hi is None else F.add(acc_hi, t)
                else:
                    acc = t if acc is None else F.add(acc, t)
            if acc_hi is not None:
                acc_hi = F.mul(acc_hi, jnp.broadcast_to(self._W, acc_hi.shape))
                acc = acc_hi if acc is None else F.add(acc, acc_hi)
            cs.append(acc)
        return self._stack(cs)

    def mul_base(self, a, b):
        """Extension times base — the Algebra op."""
        return self.base.mul(a, jnp.expand_dims(b, axis=-1 - self._bs))

    def halve(self, a):
        return self.base.halve(a)

    def frobenius(self, a, k: int = 1):
        """a^(p^k): coefficient-wise scaling (ref: `HasFrobenius`)."""
        return self.base.mul(a, jnp.broadcast_to(self._frob_consts[k % self.D], a.shape))

    def inv(self, a):
        F, D = self.base, self.D
        # prod of conjugates a^p * a^(p^2) * ... * a^(p^(D-1))
        conj = self.frobenius(a, 1)
        acc = conj
        for k in range(2, D):
            acc = self.mul(acc, self.frobenius(a, k))
        norm_full = self.mul(a, acc)  # lies in base field: coeffs 1..D-1 are 0
        n_inv = F.inv(self._c(norm_full, 0))
        return self.mul_base(acc, n_inv)

    def __repr__(self):
        return f"BinomialExtension({self.base.name}, {self.D}, W={self.W_int})"

    def __hash__(self):
        return hash((self.base, self.D, self.W_int))

    def __eq__(self, other):
        return (
            isinstance(other, BinomialExtension)
            and other.base == self.base
            and other.D == self.D
            and other.W_int == self.W_int
        )


# Upstream parameter parity (p3-baby-bear / p3-koala-bear / p3-mersenne-31):
BabyBear4 = BinomialExtension(BabyBear, 4, 11)
BabyBear5 = BinomialExtension(BabyBear, 5, 2)
KoalaBear4 = BinomialExtension(KoalaBear, 4, 3)
KoalaBear8 = BinomialExtension(KoalaBear, 8, 3)
Mersenne31Cubic = BinomialExtension(Mersenne31, 3, 5)
# Complex extension for the circle group (X^2 + 1, p == 3 mod 4)
Mersenne31Complex = BinomialExtension(Mersenne31, 2, Mersenne31.order - 1, name="M31Complex")
# Goldilocks quadratic extension (upstream p3-goldilocks: X^2 - 7)
from .goldilocks import Goldilocks  # noqa: E402

Goldilocks2 = BinomialExtension(Goldilocks, 2, 7)
