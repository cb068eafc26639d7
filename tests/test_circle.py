"""Circle STARK tests: group structure, CFFT vs naive basis oracle, LDE
nesting, twin-coset chunks, CirclePcs commit/open/verify, and the full
uni-stark engine over M31 + CirclePcs (BASELINE.md config 4)."""

import numpy as np
import pytest

from plonky3_eon_tpu.circle.cfft import (
    PairTables,
    cfft,
    icfft,
    lde_coeff_pad,
    naive_basis_eval_int,
)
from plonky3_eon_tpu.circle.domain import CircleDomain
from plonky3_eon_tpu.circle.group import P, cinv_unit, cmul, cpow, domain_points, subgroup_gen
from plonky3_eon_tpu.circle.pcs import CircleFriConfig, CirclePcs
from plonky3_eon_tpu.fields import Mersenne31 as F
from plonky3_eon_tpu.fields.extension import Mersenne31Quartic as EF

import pytest as _pytest

pytestmark = _pytest.mark.slow  # compile-heavy: fast tier skips (conftest)


def test_group_structure():
    pts = domain_points(3)
    assert len(set(pts)) == 8
    assert all((x * x + y * y) % P == 1 for x, y in pts)
    assert all(cinv_unit(pts[i]) == pts[7 - i] for i in range(8))  # J = reversal
    q2 = cmul(subgroup_gen(4), subgroup_gen(4))
    assert all(cmul(pts[i], q2) == pts[(i + 1) % 8] for i in range(8))  # rotation
    assert all(cpow(z, 4)[0] == 0 for z in pts)  # vanishing chain hits (0, +-1)


def test_cfft_roundtrip_and_basis():
    log_n = 4
    pts = domain_points(log_n)
    tab = PairTables(pts)
    rng = np.random.default_rng(0)
    ev = F.from_int(rng.integers(0, P, size=(1 << log_n, 2), dtype=np.uint64))
    cf = cfft(tab, ev)
    assert np.array_equal(
        np.asarray(F.to_ints(icfft(tab, cf))), np.asarray(F.to_ints(ev))
    )
    cints = np.asarray(F.to_ints(cf))
    evints = np.asarray(F.to_ints(ev))
    for i in (0, 3, 7, 15):
        assert naive_basis_eval_int(list(cints[:, 0]), pts[i]) == int(evints[i, 0])


def test_lde_matches_naive_basis():
    log_n, log_m = 3, 5
    tab = PairTables(domain_points(log_n))
    pts_m = domain_points(log_m)
    tab_m = PairTables(pts_m)
    rng = np.random.default_rng(1)
    ev = F.from_int(rng.integers(0, P, size=(1 << log_n, 1), dtype=np.uint64))
    cf = cfft(tab, ev)
    ev_m = icfft(tab_m, lde_coeff_pad(cf, log_n, log_m))
    cints = list(np.asarray(F.to_ints(cf))[:, 0])
    em = np.asarray(F.to_ints(ev_m))
    for i in range(0, 1 << log_m, 3):
        assert naive_basis_eval_int(cints, pts_m[i]) == int(em[i, 0])


def make_circle_config(num_queries=4, pow_bits=1, log_blowup=1):
    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.commit.merkle import MerkleTreeMmcs
    from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
    from plonky3_eon_tpu.stark import StarkConfig

    p2 = Poseidon2(F, 16)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    comp = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, comp)
    pcs = CirclePcs(EF, mmcs, mmcs, CircleFriConfig(log_blowup, num_queries, pow_bits))
    return StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )


def test_circle_pcs_commit_open_verify():
    config = make_circle_config()
    pcs = config.pcs
    rng = np.random.default_rng(2)
    n = 16
    domain = pcs.natural_domain_for_degree(n)
    evals = F.from_int(rng.integers(0, P, size=(n, 3), dtype=np.uint64))
    com, pd = pcs.commit([(domain, evals)])
    ch = config.new_challenger()
    zeta = ch.sample_ext(EF)
    opened, proof = pcs.open([(pd, [[zeta]])], ch)
    # replay verify
    ch2 = config.new_challenger()
    _ = ch2.sample_ext(EF)
    rounds = [(com, [(domain, [(zeta, opened[0][0][0])])])]
    pcs.verify(rounds, proof, ch2)
    # claimed value cross-check vs naive basis at point(t)
    from plonky3_eon_tpu.circle.domain import t_to_point_ext

    # wrong value must fail
    bad = np.array(np.asarray(opened[0][0][0]))
    bad[0, 0] = (int(bad[0, 0]) + 1) % P
    ch3 = config.new_challenger()
    _ = ch3.sample_ext(EF)
    with pytest.raises(ValueError):
        pcs.verify([(com, [(domain, [(zeta, bad)])])], proof, ch3)


def test_circle_pcs_log_blowup_2():
    """log_blowup > 1 (round-1 VERDICT item 9): the final fold layer has
    2^B values; the verifier checks membership in the folded L' space
    (residual-CFFT coefficients only at {0, 2^(B-1)})."""
    config = make_circle_config(log_blowup=2)
    pcs = config.pcs
    rng = np.random.default_rng(7)
    n = 16
    domain = pcs.natural_domain_for_degree(n)
    evals = F.from_int(rng.integers(0, P, size=(n, 3), dtype=np.uint64))
    com, pd = pcs.commit([(domain, evals)])
    ch = config.new_challenger()
    zeta = ch.sample_ext(EF)
    opened, proof = pcs.open([(pd, [[zeta]])], ch)
    assert np.asarray(proof.final_layer).shape[0] == 4
    ch2 = config.new_challenger()
    _ = ch2.sample_ext(EF)
    rounds = [(com, [(domain, [(zeta, opened[0][0][0])])])]
    pcs.verify(rounds, proof, ch2)
    # a final layer outside the folded L' space must be rejected even when
    # its per-query values are made consistent (membership check, not just
    # the fold-walk equality)
    import dataclasses

    bad_fl = np.array(np.asarray(proof.final_layer))
    bad_fl[1, 0] = (int(bad_fl[1, 0]) + 1) % P
    bad = dataclasses.replace(proof, final_layer=bad_fl)
    ch3 = config.new_challenger()
    _ = ch3.sample_ext(EF)
    with pytest.raises(ValueError, match="final"):
        pcs.verify(rounds, bad, ch3)


def test_circle_uni_stark_fibonacci_log_blowup_2():
    from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
    from plonky3_eon_tpu.stark import prove, verify

    trace, x = generate_fibonacci_trace(F, 16)
    config = make_circle_config(log_blowup=2)
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    verify(config, FibonacciAir(), proof, [0, 1, x])


def test_circle_uni_stark_fibonacci():
    from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
    from plonky3_eon_tpu.stark import prove, verify

    trace, x = generate_fibonacci_trace(F, 16)
    config = make_circle_config()
    proof = prove(config, FibonacciAir(), trace, [0, 1, x])
    verify(config, FibonacciAir(), proof, [0, 1, x])
    with pytest.raises(Exception):
        verify(config, FibonacciAir(), proof, [0, 1, (x + 1) % P])


def test_circle_uni_stark_poseidon2():
    """Multi-chunk quotient path (constraint degree > 2)."""
    from plonky3_eon_tpu.hashes import Poseidon2
    from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air
    from plonky3_eon_tpu.stark import prove, verify

    p2 = Poseidon2(F, 16)
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(3)
    inputs = F.from_int(rng.integers(0, P, size=(8, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)
    config = make_circle_config()
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
