"""Polynomial commitment scheme abstraction + testing doubles.

Reference parity: `commit/src/pcs.rs:21-192` (the `Pcs` trait the prover is
generic over: natural_domain_for_degree / commit / commit_quotient /
get_evaluations_on_domain / open / verify, round indices TRACE_IDX /
QUOTIENT_IDX), `commit/src/testing.rs:19` (`TrivialPcs`),
`commit/src/dummy_pcs.rs:17` (`DummyPcs`).

Conventions:
  * a "round" for `open` is (prover_data, points_per_matrix) where
    points_per_matrix[m] is a list of EF points; `open` returns
    opened[round][matrix][point] -> (width, D) EF values plus a proof;
  * for `verify`, a round is (commitment, per-matrix list of
    (domain, [(point, claimed_values)])).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.field import Field
from ..ops.dft import NaiveDft, Radix2Dit, np_powers
from .domain import TwoAdicMultiplicativeCoset


class Pcs:
    ZK = False
    TRACE_IDX = 0
    QUOTIENT_IDX = 1

    def natural_domain_for_degree(self, degree: int) -> TwoAdicMultiplicativeCoset:
        raise NotImplementedError

    def commit(self, domains_and_evals: list):
        raise NotImplementedError

    def commit_quotient(self, quotient_domain, quotient_flat, num_chunks: int,
                        **commit_kwargs):
        """Default: split the quotient evals into chunks on split domains and
        commit (ref: `pcs.rs:82-107`)."""
        chunks = quotient_domain.split_evals(num_chunks, quotient_flat)
        domains = quotient_domain.split_domains(num_chunks)
        return self.commit(list(zip(domains, chunks)), **commit_kwargs)

    def get_evaluations_on_domain(self, prover_data, idx: int, domain):
        raise NotImplementedError

    def open(self, rounds: list, challenger):
        raise NotImplementedError

    def verify(self, rounds: list, proof, challenger):
        raise NotImplementedError

    def observe_commitment(self, challenger, commitment):
        challenger.observe(commitment)


def eval_coeffs_at_ext_point(F: Field, EF, coeffs, zeta, row_chunk: int = 1 << 14):
    """Evaluate base-coefficient columns at an EF point: (n, w) x (D,) ->
    (w, D), via EF powers of zeta + a base-scaled sum. Rows are scanned in
    chunks so peak memory is (chunk, w, D), not (n, w, D)."""
    import jax

    n, w = coeffs.shape[0], coeffs.shape[1]
    zpows = EF.powers(zeta, n)  # (n, D)
    if n <= row_chunk:
        terms = EF.mul_base(zpows[:, None, :], coeffs)  # (n, w, D)
        return EF.sum(terms, axis=0)
    assert n % row_chunk == 0
    nc = n // row_chunk
    cf = coeffs.reshape((nc, row_chunk) + coeffs.shape[1:])
    zp = zpows.reshape(nc, row_chunk, EF.D)

    def step(acc, xs):
        c, z = xs
        return EF.add(acc, EF.sum(EF.mul_base(z[:, None], c), axis=0)), None

    acc0 = jnp.zeros((w, EF.D), coeffs.dtype)
    acc, _ = jax.lax.scan(step, acc0, (cf, zp))
    return acc


@dataclass
class TrivialProverData:
    domains: list
    evals: list
    coeffs: list


class TrivialPcs(Pcs):
    """Commitment = the full coefficient matrices (no crypto): lets the
    STARK engine be exercised end-to-end without hashing
    (ref: `commit/src/testing.rs:19`)."""

    def __init__(self, F: Field, EF):
        self.F = F
        self.EF = EF
        self.dft = Radix2Dit(F)

    def natural_domain_for_degree(self, degree: int):
        from ..utils import log2_strict

        return TwoAdicMultiplicativeCoset(self.F, log2_strict(degree), 1)

    def commit(self, domains_and_evals):
        domains, coeffs, evals = [], [], []
        for domain, ev in domains_and_evals:
            if domain.shift_int == 1:
                cf = self.dft.idft_batch(ev)
            else:
                inv_s = pow(domain.shift_int, self.F.order - 2, self.F.order)
                ipows = self.F.from_int(np_powers(inv_s, domain.size, self.F.order))
                cf = self.dft.coset_idft_batch(ev, ipows)
            domains.append(domain)
            coeffs.append(cf)
            evals.append(ev)
        commitment = [np.asarray(c) for c in coeffs]
        return commitment, TrivialProverData(domains, evals, coeffs)

    def get_evaluations_on_domain(self, pd: TrivialProverData, idx: int, domain):
        cf = pd.coeffs[idx]
        n = cf.shape[0]
        big_n = domain.size
        if big_n > n:
            cf = jnp.concatenate(
                [cf, jnp.zeros((big_n - n,) + cf.shape[1:], cf.dtype)], axis=0
            )
        spows = self.F.from_int(np_powers(domain.shift_int, big_n, self.F.order))
        return self.dft.coset_dft_batch(cf, spows)

    def open(self, rounds, challenger):
        opened = []
        for pd, points_per_matrix in rounds:
            round_vals = []
            for cf, points in zip(pd.coeffs, points_per_matrix):
                round_vals.append(
                    [eval_coeffs_at_ext_point(self.F, self.EF, cf, z) for z in points]
                )
            opened.append(round_vals)
        return opened, None

    def verify(self, rounds, proof, challenger):
        for commitment, matrices in rounds:
            for cf_np, (domain, points_and_values) in zip(commitment, matrices):
                cf = jnp.asarray(cf_np)
                for zeta, claimed in points_and_values:
                    got = eval_coeffs_at_ext_point(self.F, self.EF, cf, zeta)
                    if not np.array_equal(np.asarray(got), np.asarray(claimed)):
                        raise ValueError("TrivialPcs: opening mismatch")

    def observe_commitment(self, challenger, commitment):
        for cf in commitment:
            challenger.observe(jnp.asarray(cf).reshape(-1))


class DummyPcs(Pcs):
    """Commitment = the evaluation matrices themselves; openings via
    barycentric interpolation; no cryptography. Lets engine logic be tested
    without hashing (ref: `commit/src/dummy_pcs.rs:17,42`)."""

    def __init__(self, F: Field, EF):
        self.F = F
        self.EF = EF

    def natural_domain_for_degree(self, degree: int):
        from ..utils import log2_strict

        return TwoAdicMultiplicativeCoset(self.F, log2_strict(degree), 1)

    def commit(self, domains_and_evals):
        domains = [d for d, _ in domains_and_evals]
        evals = [e for _, e in domains_and_evals]
        return [np.asarray(e) for e in evals], TrivialProverData(domains, evals, None)

    def get_evaluations_on_domain(self, pd, idx: int, domain):
        from ..ops.dft import Radix2Dit, np_powers

        ev = pd.evals[idx]
        src = pd.domains[idx]
        dft = Radix2Dit(self.F)
        if src.shift_int == 1:
            cf = dft.idft_batch(ev)
        else:
            inv_s = pow(src.shift_int, self.F.order - 2, self.F.order)
            cf = dft.coset_idft_batch(
                ev, self.F.from_int(np_powers(inv_s, src.size, self.F.order))
            )
        import jax.numpy as jnp

        big_n = domain.size
        if big_n > cf.shape[0]:
            cf = jnp.concatenate(
                [cf, jnp.zeros((big_n - cf.shape[0],) + cf.shape[1:], cf.dtype)], axis=0
            )
        return dft.coset_dft_batch(
            cf, self.F.from_int(np_powers(domain.shift_int, big_n, self.F.order))
        )

    def open(self, rounds, challenger):
        from ..ops.interpolation import interpolate_coset

        opened = []
        for pd, points_per_matrix in rounds:
            rv = []
            for (domain, ev), points in zip(
                zip(pd.domains, pd.evals), points_per_matrix
            ):
                rv.append(
                    [
                        interpolate_coset(self.F, self.EF, ev, z, domain.shift_int)
                        for z in points
                    ]
                )
            opened.append(rv)
        return opened, None

    def verify(self, rounds, proof, challenger):
        from ..ops.interpolation import interpolate_coset
        import jax.numpy as jnp

        for commitment, matrices in rounds:
            for ev_np, (domain, points_and_values) in zip(commitment, matrices):
                ev = jnp.asarray(ev_np)
                for zeta, claimed in points_and_values:
                    got = interpolate_coset(self.F, self.EF, ev, zeta, domain.shift_int)
                    if not np.array_equal(np.asarray(got), np.asarray(claimed)):
                        raise ValueError("DummyPcs: opening mismatch")

    def observe_commitment(self, challenger, commitment):
        for ev in commitment:
            challenger.observe(jnp.asarray(ev).reshape(-1))


class DummyMmcs:
    """Identity commitment: stores the matrices, opens raw rows
    (ref: `commit/src/dummy_mmcs.rs:12`)."""

    def commit(self, matrices: list):
        return [np.asarray(m) for m in matrices], list(matrices)

    def open_batch(self, indices, pd):
        import jax.numpy as jnp

        idx = np.asarray(indices, dtype=np.int64)
        from ..utils import log2_strict

        max_h = max(int(m.shape[0]) for m in pd)
        log_max = log2_strict(max_h)
        opened = [
            jnp.take(m, jnp.asarray(idx >> (log_max - log2_strict(int(m.shape[0])))), axis=0)
            for m in pd
        ]
        return opened, None

    def verify_batch(self, commitment, dims, indices, opened_values, proof) -> bool:
        from ..utils import log2_strict

        idx = np.asarray(indices, dtype=np.int64)
        log_max = log2_strict(max(h for h, _ in dims))
        for com, (h, _), vals in zip(commitment, dims, opened_values):
            rows = np.asarray(com)[idx >> (log_max - log2_strict(h))]
            if not np.array_equal(rows, np.asarray(vals)):
                return False
        return True
