"""AIR base class + arithmetization helpers.

Reference parity: `air/src/air.rs:8-31` (`BaseAir` width + optional
preprocessed trace, `Air::eval`), `air/src/utils.rs:14-202` (bit packing,
xor/adder gadgets used by the Blake3/Keccak AIRs).
"""

from __future__ import annotations


class BaseAir:
    """An AIR: a `width` and an `eval(builder)` defining the constraints.

    The same `eval` runs under four builders: symbolic (degree analysis),
    prover folder (quotient eval over the whole coset, jit-traced),
    verifier folder (out-of-domain point check), and the debug checker.
    """

    width: int = 0

    def preprocessed_trace(self):
        """Optional preprocessed trace (ref: `BaseAir::preprocessed_trace`)."""
        return None

    def eval(self, builder):
        raise NotImplementedError


# ---- arithmetization helpers (ref: air/src/utils.rs) ---------------------


def pack_bits_le(bits):
    """Combine little-endian bit expressions into one value
    (ref: `utils.rs:14` pack_bits_le)."""
    acc = None
    mult = 1
    for b in bits:
        term = b * mult
        acc = term if acc is None else acc + term
        mult *= 2
    return acc


def checked_xor(builder, a, b, out):
    """Assert out == a XOR b for boolean a, b: out = a + b - 2ab
    (ref: `utils.rs` checked_xor)."""
    builder.assert_eq(out, a + b - (a * b).double())


def xor(a, b):
    """XOR expression of two boolean expressions: a + b - 2ab."""
    return a + b - (a * b).double()


def xor3(a, b, c):
    """Three-input XOR of booleans."""
    return xor(xor(a, b), c)


def andn(a, b):
    """(!a) & b for booleans: b - ab (ref: `field.rs` andn / keccak chi)."""
    return b - a * b
