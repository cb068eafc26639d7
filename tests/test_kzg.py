"""KZG PCS tests (ref: `kzg/src/tests.rs:19-139` — commit/open roundtrip,
batch verification across matrices/points, degree-bound errors; plus field
and curve differential oracles already covered in-module)."""

import numpy as np
import pytest

from plonky3_eon_tpu.bn254 import pairing as hostc
from plonky3_eon_tpu.fields.bigfield import Bn254Fr as Fr
from plonky3_eon_tpu.kzg import KzgError, KzgPcs, make_test_srs


def _rand_evals(rng, n, w):
    vals = np.empty((n, w), dtype=object)
    for i in range(n):
        for j in range(w):
            vals[i, j] = int.from_bytes(rng.bytes(32), "little") % Fr.order
    return Fr.from_int(vals)


@pytest.fixture(scope="module")
def pcs():
    return KzgPcs(make_test_srs(32))


def test_commit_open_verify_roundtrip(pcs):
    rng = np.random.default_rng(0)
    n, w = 16, 3
    domain = pcs.natural_domain_for_degree(n)
    evals = _rand_evals(rng, n, w)
    com, pd = pcs.commit([(domain, evals)])
    z = int.from_bytes(rng.bytes(32), "little") % Fr.order
    opened, wits = pcs.open([(pd, [[z]])])
    claimed = opened[0][0][0]  # (w, 16)
    rounds = [(com, [[(z, claimed)]])]
    assert pcs.verify(rounds, wits)
    # cross-check the claimed value against direct interpolation on host
    coeffs = Fr.to_ints(pd.coeffs[0])
    got = Fr.to_ints(claimed)
    for c in range(w):
        expect = sum(
            int(coeffs[i, c]) * pow(z, i, Fr.order) for i in range(n)
        ) % Fr.order
        assert int(np.asarray(got).reshape(-1)[c]) == expect


def test_verify_rejects_wrong_value(pcs):
    rng = np.random.default_rng(1)
    n, w = 8, 2
    domain = pcs.natural_domain_for_degree(n)
    evals = _rand_evals(rng, n, w)
    com, pd = pcs.commit([(domain, evals)])
    z = 42
    opened, wits = pcs.open([(pd, [[z]])])
    bad = np.array(np.asarray(opened[0][0][0]))
    bad[0] = (bad[0] + 1) % (1 << 16)  # perturb a digit of column 0's value
    with pytest.raises(KzgError):
        pcs.verify([(com, [[(z, bad)]])], wits)


def test_batch_verify_multiple_matrices_and_points(pcs):
    rng = np.random.default_rng(2)
    d1 = pcs.natural_domain_for_degree(16)
    d2 = pcs.natural_domain_for_degree(8)
    e1 = _rand_evals(rng, 16, 2)
    e2 = _rand_evals(rng, 8, 1)
    com, pd = pcs.commit([(d1, e1), (d2, e2)])
    z1, z2 = 7, 9
    opened, wits = pcs.open([(pd, [[z1, z2], [z1]])])
    rounds = [
        (
            com,
            [
                [(z1, opened[0][0][0]), (z2, opened[0][0][1])],
                [(z1, opened[0][1][0])],
            ],
        )
    ]
    assert pcs.verify(rounds, wits)


def test_degree_bound_error(pcs):
    rng = np.random.default_rng(3)
    domain = pcs.natural_domain_for_degree(64)  # SRS only has 32
    evals = _rand_evals(rng, 64, 1)
    with pytest.raises(KzgError):
        pcs.commit([(domain, evals)])


def test_kzg_mmcs_roundtrip(pcs):
    from plonky3_eon_tpu.kzg import KzgMmcs, make_test_srs

    mmcs = KzgMmcs(make_test_srs(32))
    rng = np.random.default_rng(4)
    m1 = _rand_evals(rng, 16, 2)  # rows are coefficients
    m2 = _rand_evals(rng, 8, 1)
    com, pd = mmcs.commit([m1, m2])
    idx = 11
    opened, proof = mmcs.open_batch(idx, pd)
    dims = [(16, 2), (8, 1)]
    assert mmcs.verify_batch(com, dims, idx, opened, proof)
    # opened value of the taller matrix is f(11); shorter gets index 11>>1=5
    cf = Fr.to_ints(m2)
    exp = sum(int(cf[i, 0]) * pow(5, i, Fr.order) for i in range(8)) % Fr.order
    assert int(np.asarray(Fr.to_ints(jnp.asarray(opened[1]))).reshape(-1)[0]) == exp
    # tampered value rejected
    bad = [np.array(o) for o in opened]
    bad[0][0, 0] = (int(bad[0][0, 0]) + 1) % (1 << 16)
    assert not mmcs.verify_batch(com, dims, idx, bad, proof)


import jax.numpy as jnp  # noqa: E402

import pytest as _pytest

pytestmark = _pytest.mark.slow  # compile-heavy: fast tier skips (conftest)


def test_bn254_kzg_uni_stark_fibonacci():
    """kzg-example parity: full uni-stark prove+verify over BN254 Fr with
    the KZG PCS (ref: `kzg-example/src/{fibonacci_air,proof}.rs`,
    `uni-stark/tests/fib_air.rs:105-155`)."""
    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.fields.extension import BinomialExtension
    from plonky3_eon_tpu.kzg import KzgStarkPcs, make_test_srs, poseidon2_bn254
    from plonky3_eon_tpu.models.fibonacci import FibonacciAir
    from plonky3_eon_tpu.stark import StarkConfig, VerificationError, prove, verify

    Fr1 = BinomialExtension(Fr, 1, 1, name="Bn254Fr^1")
    n = 16
    # fibonacci trace over Fr (host big ints)
    a, b = 0, 1
    rows = np.empty((n, 2), dtype=object)
    for i in range(n):
        rows[i] = [a, b]
        a, b = b, (a + b) % Fr.order
    trace = Fr.from_int(rows)
    x_last = int(rows[-1][1])

    p2 = poseidon2_bn254(3)
    pcs = KzgStarkPcs(make_test_srs(64))
    config = StarkConfig(
        F=Fr, EF=Fr1, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(Fr, p2, 3, 2),
    )
    air = FibonacciAir()
    pvs = [0, 1, x_last]
    proof = prove(config, air, trace, pvs, check_witness=True)
    verify(config, air, proof, pvs)
    with pytest.raises((VerificationError, Exception)):
        verify(config, air, proof, [0, 1, (x_last + 1) % Fr.order])
