"""Field axiom + differential tests vs Python bigint (reference parity:
`field-testing/src/lib.rs` test_field!/test_two_adic_field! macro suites)."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import (
    BabyBear,
    BabyBear4,
    BabyBear5,
    KoalaBear,
    KoalaBear4,
    KoalaBear8,
    Mersenne31,
    Mersenne31Complex,
    Mersenne31Cubic,
)
from plonky3_eon_tpu.fields.extension import Mersenne31Quartic

PRIME_FIELDS = [BabyBear, KoalaBear, Mersenne31]
EXT_FIELDS = [BabyBear4, BabyBear5, KoalaBear4, KoalaBear8, Mersenne31Cubic,
              Mersenne31Complex, Mersenne31Quartic]
ALL_FIELDS = PRIME_FIELDS + EXT_FIELDS


def rand_ints(F, rng, n):
    """Random canonical coefficient arrays, shape (n,)+suffix."""
    return rng.integers(0, F.characteristic, size=(n,) + F.shape_suffix, dtype=np.uint64)


@pytest.mark.parametrize("F", PRIME_FIELDS, ids=lambda f: f.name)
def test_prime_field_vs_bigint(F):
    rng = np.random.default_rng(0)
    p = F.order
    xs = rand_ints(F, rng, 256)
    ys = rand_ints(F, rng, 256)
    a, b = F.from_int(xs), F.from_int(ys)
    np.testing.assert_array_equal(F.to_ints(F.add(a, b)), (xs + ys) % p)
    np.testing.assert_array_equal(F.to_ints(F.sub(a, b)), (xs.astype(object) - ys) % p)
    np.testing.assert_array_equal(
        F.to_ints(F.mul(a, b)), (xs.astype(object) * ys.astype(object)) % p
    )
    np.testing.assert_array_equal(F.to_ints(F.neg(a)), (-xs.astype(object)) % p)
    np.testing.assert_array_equal(
        F.to_ints(F.square(a)), (xs.astype(object) * xs.astype(object)) % p
    )


@pytest.mark.parametrize("F", PRIME_FIELDS, ids=lambda f: f.name)
def test_prime_field_inv_halve(F):
    rng = np.random.default_rng(1)
    xs = rand_ints(F, rng, 64)
    xs[xs == 0] = 1
    a = F.from_int(xs)
    prod = F.mul(a, F.inv(a))
    np.testing.assert_array_equal(F.to_ints(prod), np.ones(64, dtype=np.uint64))
    h = F.halve(a)
    np.testing.assert_array_equal(F.to_ints(F.add(h, h)), xs)


@pytest.mark.parametrize("F", PRIME_FIELDS, ids=lambda f: f.name)
def test_edge_values(F):
    p = F.order
    edge = np.array([0, 1, 2, p - 1, p - 2, p // 2], dtype=np.uint64)
    a = F.from_int(edge)
    np.testing.assert_array_equal(F.to_ints(a), edge)
    # a + (-a) == 0
    np.testing.assert_array_equal(F.to_ints(F.add(a, F.neg(a))), np.zeros(6, dtype=np.uint64))
    # (p-1)*(p-1) == 1
    m = F.mul(F.from_int(p - 1), F.from_int(p - 1))
    assert int(F.to_ints(m)) == 1


@pytest.mark.parametrize("F", PRIME_FIELDS, ids=lambda f: f.name)
def test_two_adic_generator(F):
    for bits in range(0, min(F.two_adicity, 8) + 1):
        g = F.two_adic_generator_int(bits)
        assert pow(g, 1 << bits, F.order) == 1
        if bits > 0:
            assert pow(g, 1 << (bits - 1), F.order) != 1


@pytest.mark.parametrize("F", EXT_FIELDS, ids=lambda f: f.name)
def test_extension_irreducibility(F):
    """X^D - W is irreducible iff W is not a d-th power for any prime d | D
    (and extra condition for D % 4 == 0: p % 4 == 1)."""
    if F.W_int is None:
        # Mersenne31Quartic is a TRINOMIAL extension u^4 - 4u^2 + 5 (no
        # degree-4 binomial exists over M31: p == 3 mod 4). Its
        # irreducibility: t^2 - 4t + 5 is irreducible over M31 (its roots
        # 2 +- i need i, a nonresidue), and u^2 = t = 2+i is a nonsquare
        # in CM31 (norm(2+i) = 5 is an M31 nonsquare).
        assert pow(5, (F.base.order - 1) // 2, F.base.order) != 1
        return
    p, D, W = F.base.order, F.D, F.W_int
    for d in {2, 3, 5, 7} & {q for q in range(2, D + 1) if D % q == 0}:
        assert (p - 1) % d == 0
        assert pow(W, (p - 1) // d, p) != 1, f"W={W} is a {d}-th power"
    if D % 4 == 0:
        assert p % 4 == 1


@pytest.mark.parametrize("F", EXT_FIELDS, ids=lambda f: f.name)
def test_extension_field_axioms(F):
    rng = np.random.default_rng(2)
    a = F.from_int(rand_ints(F, rng, 32))
    b = F.from_int(rand_ints(F, rng, 32))
    c = F.from_int(rand_ints(F, rng, 32))
    # commutativity / associativity / distributivity
    np.testing.assert_array_equal(np.asarray(F.mul(a, b)), np.asarray(F.mul(b, a)))
    np.testing.assert_array_equal(
        np.asarray(F.mul(F.mul(a, b), c)), np.asarray(F.mul(a, F.mul(b, c)))
    )
    np.testing.assert_array_equal(
        np.asarray(F.mul(a, F.add(b, c))), np.asarray(F.add(F.mul(a, b), F.mul(a, c)))
    )
    # identity
    np.testing.assert_array_equal(np.asarray(F.mul(a, F.ones((32,)))), np.asarray(a))


@pytest.mark.parametrize("F", EXT_FIELDS, ids=lambda f: f.name)
def test_extension_inv(F):
    rng = np.random.default_rng(3)
    xs = rand_ints(F, rng, 16)
    xs[0] = 0
    xs[0][0] = 1  # ensure nonzero
    a = F.from_int(xs)
    prod = F.mul(a, F.inv(a))
    expected = np.asarray(F.ones((16,)))
    np.testing.assert_array_equal(np.asarray(prod), expected)


@pytest.mark.parametrize("F", EXT_FIELDS, ids=lambda f: f.name)
def test_extension_frobenius(F):
    """frobenius(a) == a^p (checked via repeated frobenius = identity)."""
    if F.frobenius is None:
        pytest.skip("non-binomial extension: no coefficient-scaling Frobenius")
    rng = np.random.default_rng(4)
    a = F.from_int(rand_ints(F, rng, 8))
    x = a
    for _ in range(F.D):
        x = F.frobenius(x, 1)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(a))
    # frobenius is multiplicative
    b = F.from_int(rand_ints(F, rng, 8))
    lhs = F.frobenius(F.mul(a, b), 1)
    rhs = F.mul(F.frobenius(a, 1), F.frobenius(b, 1))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize("F", ALL_FIELDS, ids=lambda f: f.name)
def test_powers(F):
    rng = np.random.default_rng(5)
    base = F.from_int(rand_ints(F, rng, 1))[0]
    n = 13
    pw = F.powers(base, n)
    assert pw.shape == (n,) + F.shape_suffix
    acc = F.ones(())
    for i in range(n):
        np.testing.assert_array_equal(np.asarray(pw[i]), np.asarray(acc))
        acc = F.mul(acc, base)


@pytest.mark.parametrize("F", PRIME_FIELDS, ids=lambda f: f.name)
def test_sum_dot(F):
    rng = np.random.default_rng(6)
    xs = rand_ints(F, rng, 37)
    a = F.from_int(xs)
    s = F.sum(a, axis=0)
    assert int(F.to_ints(s)) == int(xs.astype(object).sum() % F.order)


def test_mersenne31_mul_2exp():
    F = Mersenne31
    rng = np.random.default_rng(7)
    xs = rand_ints(F, rng, 32)
    a = F.from_int(xs)
    for k in [1, 5, 17, 30, 31, 45]:
        np.testing.assert_array_equal(
            F.to_ints(F.mul_2exp(a, k)), (xs.astype(object) * pow(2, k, F.order)) % F.order
        )


# ---- Goldilocks (u32-pair arithmetic + quadratic extension) ---------------


def test_goldilocks_vs_python_ints():
    from plonky3_eon_tpu.fields import Goldilocks as F

    p = F.order
    rng = np.random.default_rng(0)
    a_int = [int(x) for x in rng.integers(0, p, size=16, dtype=np.uint64)]
    b_int = [int(x) for x in rng.integers(0, p, size=16, dtype=np.uint64)]
    # include edge cases
    a_int[:3] = [0, 1, p - 1]
    b_int[:3] = [p - 1, p - 1, p - 1]
    a = F.from_int(np.array(a_int, dtype=np.uint64))
    b = F.from_int(np.array(b_int, dtype=np.uint64))
    assert list(F.to_ints(F.add(a, b))) == [(x + y) % p for x, y in zip(a_int, b_int)]
    assert list(F.to_ints(F.sub(a, b))) == [(x - y) % p for x, y in zip(a_int, b_int)]
    assert list(F.to_ints(F.mul(a, b))) == [(x * y) % p for x, y in zip(a_int, b_int)]
    assert list(F.to_ints(F.neg(a))) == [(-x) % p for x in a_int]
    assert list(F.to_ints(F.halve(a))) == [x * pow(2, -1, p) % p for x in a_int]
    nz = F.from_int(np.array([x or 1 for x in a_int], dtype=np.uint64))
    assert list(F.to_ints(F.inv(nz))) == [pow(x or 1, -1, p) for x in a_int]


def test_goldilocks_two_adic_generator():
    from plonky3_eon_tpu.fields import Goldilocks as F

    g = F.two_adic_generator_int(32)
    assert pow(g, 1 << 32, F.order) == 1
    assert pow(g, 1 << 31, F.order) != 1


def test_goldilocks_quadratic_extension():
    from plonky3_eon_tpu.fields import Goldilocks as F
    from plonky3_eon_tpu.fields.extension import Goldilocks2 as EF

    p = F.order
    rng = np.random.default_rng(1)
    a_int = rng.integers(0, p, size=(8, 2), dtype=np.uint64)
    b_int = rng.integers(0, p, size=(8, 2), dtype=np.uint64)
    a, b = EF.from_int(a_int), EF.from_int(b_int)
    got = np.asarray(EF.to_ints(EF.mul(a, b)), dtype=object)
    for i in range(8):
        a0, a1 = int(a_int[i, 0]), int(a_int[i, 1])
        b0, b1 = int(b_int[i, 0]), int(b_int[i, 1])
        c0 = (a0 * b0 + 7 * a1 * b1) % p
        c1 = (a0 * b1 + a1 * b0) % p
        assert (int(got[i, 0]), int(got[i, 1])) == (c0, c1)
    # inversion roundtrip
    prod = EF.mul(a, EF.inv(a))
    ints = np.asarray(EF.to_ints(prod), dtype=object)
    assert all(int(ints[i, 0]) == 1 and int(ints[i, 1]) == 0 for i in range(8))


def test_goldilocks_dft_roundtrip():
    from plonky3_eon_tpu.fields import Goldilocks as F
    from plonky3_eon_tpu.ops.dft import NaiveDft, Radix2Dit

    rng = np.random.default_rng(2)
    mat = F.from_int(rng.integers(0, F.order, size=(16, 3), dtype=np.uint64))
    fast = Radix2Dit(F)
    naive = NaiveDft(F)
    assert np.array_equal(
        np.asarray(F.to_ints(fast.dft_batch(mat))),
        np.asarray(F.to_ints(naive.dft_batch(mat))),
    )
    back = fast.idft_batch(fast.dft_batch(mat))
    assert np.array_equal(np.asarray(F.to_ints(back)), np.asarray(F.to_ints(mat)))


# ---- unified serialization (fields/serial.py; RawDataSerializable parity,
# ref field/src/field.rs:650-743) ------------------------------------------


def test_serial_into_bytes_reference_semantics():
    """into_bytes == little-endian canonical to_bytes per element, for a
    31-bit field, Goldilocks (8 bytes), and BN254 Fr (32 bytes)."""
    from plonky3_eon_tpu.fields import BabyBear, Goldilocks, serial
    from plonky3_eon_tpu.fields.bigfield import Bn254Fr

    for F, vals in [
        (BabyBear, [0, 1, 12345678, BabyBear.order - 1]),
        (Goldilocks, [0, 1, (1 << 62) + 99, Goldilocks.order - 1]),
        (Bn254Fr, [0, 1, (1 << 200) + 123, Bn254Fr.order - 1]),
    ]:
        nb = serial.num_bytes(F)
        arr = F.from_int(np.asarray(vals, dtype=object))
        got = serial.into_bytes(F, arr)
        want = b"".join(int(v).to_bytes(nb, "little") for v in vals)
        assert got.tobytes() == want, F.name


def test_serial_word_streams_pad_and_pack():
    from plonky3_eon_tpu.fields import BabyBear as F, serial

    vals = [3, 5, 7]
    arr = F.from_int(np.asarray(vals, dtype=np.uint64))
    u32 = serial.into_u32_stream(F, arr)
    assert u32.tolist() == vals  # 4-byte field: identity
    u64 = serial.into_u64_stream(F, arr)
    # pairs pack little-endian; odd tail zero-padded
    assert u64.tolist() == [3 + (5 << 32), 7]


def test_serial_parallel_streams_transpose_equivalence():
    """into_parallel_u32_streams == transpose ∘ per-column into_u32_stream
    ∘ transpose (the trait's documented guarantee), and the u64 variant
    likewise — checked on Goldilocks where NUM_BYTES=8 splits each element
    into two u32 rows."""
    from plonky3_eon_tpu.fields import Goldilocks as F, serial

    rng = np.random.default_rng(3)
    mat_int = rng.integers(0, F.order, size=(5, 3), dtype=np.uint64)
    mat = F.from_int(mat_int)
    got = serial.into_parallel_u32_streams(F, mat)
    want = np.stack(
        [serial.into_u32_stream(F, F.from_int(mat_int[:, j])) for j in range(3)],
        axis=1,
    )
    assert np.array_equal(got, want)
    got64 = serial.into_parallel_u64_streams(F, mat)
    want64 = np.stack(
        [serial.into_u64_stream(F, F.from_int(mat_int[:, j])) for j in range(3)],
        axis=1,
    )
    assert np.array_equal(got64, want64)
