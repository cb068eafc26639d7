"""Reusable field/ring axiom test suites — library form.

Reference parity: the `field-testing` crate (`field-testing/src/lib.rs:35-1117`)
exports macro suites (`test_field!`, `test_prime_field_32!`,
`test_two_adic_field!`, `test_two_adic_extension_field!`) that downstream
field crates instantiate. This module is the same idea as plain functions:
each suite takes a field descriptor and raises AssertionError on the first
violated axiom. Downstream tests (and users defining new fields) call e.g.

    from plonky3_eon_tpu.testing import run_all_field_suites
    run_all_field_suites(MyField, rng)

There is no packing suite: array ops are already lane-vectorized, so the
"packed equals scalar" axioms of the reference are vacuous here.
"""

from __future__ import annotations

import numpy as np


def _rand_ints(F, rng: np.random.Generator, n: int) -> np.ndarray:
    if F.order < (1 << 63):
        return rng.integers(0, F.order, size=n, dtype=np.uint64)
    vals = [
        int.from_bytes(rng.bytes((F.order.bit_length() + 7) // 8), "little") % F.order
        for _ in range(n)
    ]
    return np.array(vals, dtype=object)


def field_suite(F, rng: np.random.Generator, n: int = 64) -> None:
    """Ring + field axioms vs exact host bigint arithmetic
    (ref: `test_field!` / `test_ring!`, `field-testing/src/lib.rs:35`)."""
    p = F.order
    a_int, b_int, c_int = (_rand_ints(F, rng, n) for _ in range(3))
    a, b, c = F.from_int(a_int), F.from_int(b_int), F.from_int(c_int)

    def ints(x):
        return np.asarray(F.to_ints(x), dtype=object)

    ai, bi, ci = (np.asarray(x, dtype=object) for x in (a_int, b_int, c_int))
    assert np.array_equal(ints(F.add(a, b)), (ai + bi) % p), "add"
    assert np.array_equal(ints(F.sub(a, b)), (ai - bi) % p), "sub"
    assert np.array_equal(ints(F.mul(a, b)), (ai * bi) % p), "mul"
    assert np.array_equal(ints(F.neg(a)), (-ai) % p), "neg"
    assert np.array_equal(ints(F.square(a)), (ai * ai) % p), "square"
    assert np.array_equal(ints(F.double(a)), (2 * ai) % p), "double"
    # distributivity a*(b+c) == a*b + a*c
    lhs = F.mul(a, F.add(b, c))
    rhs = F.add(F.mul(a, b), F.mul(a, c))
    assert np.array_equal(ints(lhs), ints(rhs)), "distributivity"
    # identities
    zero, one = F.zeros((n,)), F.ones((n,))
    assert np.array_equal(ints(F.add(a, zero)), ints(a)), "a+0"
    assert np.array_equal(ints(F.mul(a, one)), ints(a)), "a*1"
    assert np.array_equal(ints(F.mul(a, zero)), ints(zero)), "a*0"
    # halve: 2 * halve(a) == a
    assert np.array_equal(ints(F.double(F.halve(a))), ints(a)), "halve"


def inversion_suite(F, rng: np.random.Generator, n: int = 32) -> None:
    """a * a^-1 == 1 for nonzero a; div roundtrip
    (ref: `field-testing/src/lib.rs` try_inverse tests)."""
    vals = _rand_ints(F, rng, n)
    vals = np.where(vals == 0, np.asarray(1, dtype=vals.dtype), vals)
    a = F.from_int(vals)
    one = F.ones((n,))
    got = np.asarray(F.to_ints(F.mul(a, F.inv(a))), dtype=object)
    assert np.array_equal(got, np.asarray(F.to_ints(one), dtype=object)), "inv"
    b_vals = _rand_ints(F, rng, n)
    b = F.from_int(b_vals)
    back = F.mul(F.div(b, a), a)
    assert np.array_equal(
        np.asarray(F.to_ints(back), dtype=object),
        np.asarray(F.to_ints(b), dtype=object),
    ), "div"


def two_adic_suite(F) -> None:
    """Generator-order proofs for every two-adic level
    (ref: `test_two_adic_field!`, `field-testing/src/lib.rs:648` order checks)."""
    for bits in range(0, min(F.two_adicity, 12) + 1):
        g = F.two_adic_generator_int(bits)
        assert pow(g, 1 << bits, F.order) == 1, f"g^(2^{bits}) != 1"
        if bits > 0:
            assert pow(g, 1 << (bits - 1), F.order) != 1, f"order(g) < 2^{bits}"


def generator_suite(F, factors: list[int] | None = None) -> None:
    """F.generator_int generates F* : g^((p-1)/q) != 1 for given prime
    factors q of p-1 (ref: generator-order proofs vs factored group order)."""
    if factors is None:
        # factor out small primes of p-1 (enough to catch wrong generators)
        m = F.order - 1
        factors = []
        d = 2
        while d * d <= m and d < 10_000:
            if m % d == 0:
                factors.append(d)
                while m % d == 0:
                    m //= d
            d += 1
        if m > 1:
            factors.append(m)
    for q in factors:
        assert pow(F.generator_int, (F.order - 1) // q, F.order) != 1, (
            f"generator has order dividing (p-1)/{q}"
        )


def serialization_suite(F, rng: np.random.Generator, n: int = 32) -> None:
    """from_int/to_ints and to_canonical/from_canonical roundtrips
    (ref: serialization round-trips, `field-testing/src/lib.rs:824`)."""
    vals = _rand_ints(F, rng, n)
    a = F.from_int(vals)
    assert np.array_equal(
        np.asarray(F.to_ints(a), dtype=object), np.asarray(vals, dtype=object)
    ), "from_int/to_ints roundtrip"
    if hasattr(F, "from_canonical") and hasattr(F, "to_canonical"):
        back = F.from_canonical(F.to_canonical(a))
        assert np.array_equal(np.asarray(back), np.asarray(a)), "canonical roundtrip"


def extension_suite(EF, rng: np.random.Generator, n: int = 16) -> None:
    """Extension-field axioms: commutative/associative mul, inversion,
    base-field embedding compatibility
    (ref: `test_extension_field!`/`test_two_adic_extension_field!`)."""
    shape = (n,) + EF.shape_suffix
    F = EF.base
    a = EF.from_base(F.from_int(_rand_ints(F, rng, n)))
    raw = np.stack([_rand_ints(F, rng, n) for _ in range(EF.shape_suffix[0])], axis=-1)
    b = EF.from_int(raw)
    c = EF.from_int(
        np.stack([_rand_ints(F, rng, n) for _ in range(EF.shape_suffix[0])], axis=-1)
    )
    assert b.shape == shape
    # commutativity + associativity
    assert np.array_equal(np.asarray(EF.mul(b, c)), np.asarray(EF.mul(c, b))), "comm"
    lhs = EF.mul(EF.mul(a, b), c)
    rhs = EF.mul(a, EF.mul(b, c))
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs)), "assoc"
    # inversion
    nz = EF.add(b, EF.ones((n,)))  # avoid an accidental zero (probabilistic)
    prod = EF.mul(nz, EF.inv(nz))
    assert np.array_equal(np.asarray(prod), np.asarray(EF.ones((n,)))), "ext inv"
    # embedding: mul_base(b, x) == b * from_base(x)
    x = F.from_int(_rand_ints(F, rng, n))
    assert np.array_equal(
        np.asarray(EF.mul_base(b, x)), np.asarray(EF.mul(b, EF.from_base(x)))
    ), "mul_base"


def run_all_field_suites(F, rng: np.random.Generator | None = None) -> None:
    """Everything applicable to a prime field descriptor."""
    rng = rng or np.random.default_rng(0)
    field_suite(F, rng)
    inversion_suite(F, rng)
    serialization_suite(F, rng)
    generator_suite(F)
    if F.two_adicity > 0:
        two_adic_suite(F)
