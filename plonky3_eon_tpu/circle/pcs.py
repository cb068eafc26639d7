"""Circle STARK polynomial commitment scheme (CirclePcs).

Reference parity: the removed upstream `p3-circle` crate's `CirclePcs`
(SURVEY.md §2.8; constructed at `examples/src/proofs.rs:162-198`) —
re-derived from the Circle STARKs construction on top of this package's
CFFT (circle/cfft.py) and domains (circle/domain.py).

Structure mirrors `fri/pcs.py` (TwoAdicFriPcs):
  * commit: CFFT -> stride-pad -> inverse CFFT onto the blowup standard
    domain (natural order), Merkle commit;
  * open: DEEP single-point quotients  (f(z) - f(zeta)) / v0(z - zeta)
    with v0(u) = y/(1+x) (simple zero at zeta, pole at the antipode adds a
    zero), batch-RLC'd with alpha; circle-FRI folds along the domain's
    pairing tables (y-fold first, then x-folds), one Merkle'd round and
    beta per fold, down to a constant; PoW grind; vectorized queries;
  * verify: transcript replay + Merkle checks + per-query fold walk.

All matrices in one proof must share one LDE height (the engine guarantees
this: quotients are split into trace-height twin-coset chunks).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mersenne31 import Mersenne31
from ..utils import log2_strict
from .cfft import cfft, icfft, lde_coeff_pad
from .domain import CircleDomain, t_to_point_ext
from .group import P


@dataclass
class CircleFriConfig:
    log_blowup: int = 1
    num_queries: int = 100
    proof_of_work_bits: int = 16


@dataclass
class CircleProverData:
    domains: list
    coeffs: list       # (n, w) CFFT coefficient matrices
    ldes: list         # (N, w) natural-order evals on the blowup domain
    lde_domain: object
    merkle_data: object


@dataclass
class CircleFriProof:
    commit_phase_commits: list
    input_openings: list          # per round: (rows per matrix, merkle proof)
    commit_phase_openings: list   # per fold: ((q, 2, D) pair rows, proof)
    final_layer: np.ndarray       # (2^log_blowup, D) final fold layer; the
                                  # verifier checks it lies in the folded
                                  # image of L' = FFT space + 1-dim defect
    pow_witness: int
    query_indices: list


class CirclePcs:
    F = Mersenne31

    def __init__(self, EF, mmcs, challenge_mmcs, fri_config=None):
        self.EF = EF
        self.mmcs = mmcs
        self.challenge_mmcs = challenge_mmcs
        self.fri = fri_config or CircleFriConfig()

    def natural_domain_for_degree(self, degree: int):
        return CircleDomain(log2_strict(degree))

    def num_quotient_chunks(self, quotient_degree: int) -> int:
        return quotient_degree

    # ---- commit ----------------------------------------------------------

    def _lde(self, domain, evals):
        coeffs = cfft(domain.pair_tables, evals)
        big = CircleDomain(domain.log_n + self.fri.log_blowup)
        padded = lde_coeff_pad(coeffs, domain.log_n, big.log_n)
        return coeffs, icfft(big.pair_tables, padded), big

    def commit(self, domains_and_evals):
        domains, coeffs, ldes = [], [], []
        lde_domain = None
        for domain, ev in domains_and_evals:
            cf, lde, big = self._lde(domain, ev)
            if lde_domain is None:
                lde_domain = big
            elif big.log_n != lde_domain.log_n:
                raise ValueError("CirclePcs: all matrices must share one height")
            domains.append(domain)
            coeffs.append(cf)
            ldes.append(lde)
        root, mdata = self.mmcs.commit(ldes)
        return np.asarray(root), CircleProverData(
            domains, coeffs, ldes, lde_domain, mdata
        )

    def commit_quotient(self, quotient_domain, quotient_flat, num_chunks: int):
        """Split the quotient evals into trace-height twin-coset chunks and
        commit them as one batch (ref: `commit/src/pcs.rs:82-107`)."""
        chunk_domains = quotient_domain.split_domains(num_chunks)
        chunk_evals = quotient_domain.split_evals(num_chunks, quotient_flat)
        return self.commit(list(zip(chunk_domains, chunk_evals)))

    def get_evaluations_on_domain(self, pd: CircleProverData, idx: int, domain):
        cf = pd.coeffs[idx]
        padded = lde_coeff_pad(cf, log2_strict(cf.shape[0]), domain.log_n)
        return icfft(domain.pair_tables, padded)

    def observe_commitment(self, challenger, commitment):
        challenger.observe(jnp.asarray(commitment).reshape(-1))

    # ---- evaluation at an OOD t-value -------------------------------------

    def _basis_at_point(self, EF, log_n: int, zeta_t):
        """(2^log_n, D) basis values B_c(point(t)) — tensor doubling."""
        zx, zy = t_to_point_ext(EF, jnp.asarray(zeta_t))
        factors = [zy]  # MSB factor first: y, x, pi(x), ...
        cur = zx
        for _ in range(log_n - 1):
            factors.append(cur)
            cur = EF.sub(EF.mul(EF.add(cur, cur), cur), EF.ones(()))
        basis = EF.ones(())[None]
        for f in reversed(factors):  # LSB factor first
            scaled = EF.mul(basis, jnp.broadcast_to(f, basis.shape))
            basis = jnp.concatenate([basis, scaled], axis=0)
        return basis  # (2^log_n, D)

    def _eval_at(self, EF, coeffs, zeta_t):
        basis = self._basis_at_point(EF, log2_strict(coeffs.shape[0]), zeta_t)
        return EF.sum(EF.mul_base(basis[:, None], coeffs), axis=0)  # (w, D)

    # ---- open --------------------------------------------------------------

    def open(self, rounds, challenger):
        F, EF = self.F, self.EF
        lde_domain = rounds[0][0].lde_domain
        big_n = lde_domain.size
        tables = lde_domain.pair_tables

        # 1. claimed evaluations
        opened = []
        for pd, points_per_matrix in rounds:
            rv = []
            for cf, points in zip(pd.coeffs, points_per_matrix):
                rv.append([self._eval_at(EF, cf, t) for t in points])
            opened.append(rv)

        for rv in opened:
            for mats in rv:
                for v in mats:
                    challenger.observe(v.reshape(-1))
        alpha = challenger.sample_ext(EF)

        # 2. DEEP reduced opening over the shared LDE domain
        ro = None
        alpha_pow = EF.ones(())
        for (pd, points_per_matrix), round_vals in zip(rounds, opened):
            for m_idx, (cf, points) in enumerate(zip(pd.coeffs, points_per_matrix)):
                lde = pd.ldes[m_idx]
                w = lde.shape[1]
                for pt_idx, t in enumerate(points):
                    col_pows = EF.mul(EF.powers(alpha, w), alpha_pow)
                    alpha_pow = EF.mul(col_pows[-1], alpha)
                    vals = round_vals[m_idx][pt_idx]
                    term = _deep_quotient(
                        F, EF, lde, lde_domain.xs_device, lde_domain.ys_device,
                        jnp.asarray(t), col_pows, vals,
                    )
                    ro = term if ro is None else EF.add(ro, term)

        # 3. circle-FRI fold along the pairing tables
        commits, fold_data, betas = [], [], []
        cur = ro
        n_folds = lde_domain.log_n - self.fri.log_blowup
        for k in range(n_folds):
            ia, ib, _, inv2tw = tables.layers[k]
            pairs = jnp.stack(
                [jnp.take(cur, jnp.asarray(ia), axis=0),
                 jnp.take(cur, jnp.asarray(ib), axis=0)],
                axis=1,
            )  # (half, 2, D)
            half = pairs.shape[0]
            root, mdata = self.challenge_mmcs.commit([pairs.reshape(half, 2 * EF.D)])
            commits.append(np.asarray(root))
            fold_data.append((mdata, pairs))
            challenger.observe(jnp.asarray(root).reshape(-1))
            beta = challenger.sample_ext(EF)
            betas.append(beta)
            cur = _circle_fold(F, EF, pairs, jnp.asarray(inv2tw), beta)

        # The deep quotients live in L' = FFT space (+) one defect dimension
        # (Circle STARKs paper). The final layer (2^log_blowup values on the
        # fully-folded residual domain) is transported verbatim; the verifier
        # checks membership in the folded image of L' — constants (+) the
        # defect — via a residual CFFT (see verify). With log_blowup = 1 the
        # two values span the whole space and the check is vacuous.
        final_layer = np.asarray(cur)
        challenger.observe(jnp.asarray(final_layer).reshape(-1))
        pow_witness = (
            challenger.grind(self.fri.proof_of_work_bits)
            if self.fri.proof_of_work_bits > 0
            else 0
        )
        query_indices = [
            challenger.sample_bits(lde_domain.log_n)
            for _ in range(self.fri.num_queries)
        ]

        # 4. query openings
        q = np.asarray(query_indices, dtype=np.int64)
        input_openings = []
        for pd, _ in rounds:
            rows, proof = self.mmcs.open_batch(q, pd.merkle_data)
            input_openings.append(([np.asarray(r) for r in rows], np.asarray(proof)))
        commit_phase_openings = []
        pos = q.copy()
        maps = _pair_maps(tables)
        for k, (mdata, pairs) in enumerate(fold_data):
            pair_of, _ = maps[k]
            rows_idx = pair_of[pos]
            rows, proof = self.challenge_mmcs.open_batch(rows_idx, mdata)
            commit_phase_openings.append((np.asarray(rows[0]), np.asarray(proof)))
            pos = rows_idx

        fri_proof = CircleFriProof(
            commit_phase_commits=commits,
            input_openings=input_openings,
            commit_phase_openings=commit_phase_openings,
            final_layer=final_layer,
            pow_witness=pow_witness,
            query_indices=query_indices,
        )
        return opened, fri_proof

    # ---- verify --------------------------------------------------------------

    def verify(self, rounds, proof: CircleFriProof, challenger):
        F, EF = self.F, self.EF
        fri = self.fri

        for commitment, matrices in rounds:
            for _, points_and_values in matrices:
                for _, claimed in points_and_values:
                    challenger.observe(jnp.asarray(claimed).reshape(-1))
        alpha = challenger.sample_ext(EF)

        log_lde = max(d.log_n for _, m in rounds for d, _ in m) + fri.log_blowup
        lde_domain = CircleDomain(log_lde)
        tables = lde_domain.pair_tables
        n_folds = log_lde - fri.log_blowup
        if len(proof.commit_phase_commits) != n_folds:
            raise ValueError("circle FRI: wrong number of fold rounds")

        betas = []
        for root in proof.commit_phase_commits:
            challenger.observe(jnp.asarray(root).reshape(-1))
            betas.append(challenger.sample_ext(EF))
        if np.asarray(proof.final_layer).shape[0] != (1 << fri.log_blowup):
            raise ValueError("circle FRI: wrong final layer size")
        if fri.log_blowup > 1:
            # Low-degree membership of the final layer: the folded reduced
            # opening must lie in constants (+) the one defect dimension of
            # L' (Circle STARKs paper). In the residual CFFT basis (the
            # log_blowup un-folded pair-table layers) those are coefficient
            # indices 0 and 2^(log_blowup-1); all others must vanish. (For
            # log_blowup = 1 the 2-dim space is all of F^2 — nothing to
            # check.)
            res_layers = lde_domain.pair_tables.layers[
                log_lde - fri.log_blowup:
            ]
            coeffs = np.asarray(
                _residual_cfft(F, res_layers, jnp.asarray(proof.final_layer))
            ).astype(np.uint64) % np.uint64(P)
            allowed = (0, 1 << (fri.log_blowup - 1))
            for i in range(coeffs.shape[0]):
                if i not in allowed and coeffs[i].any():
                    raise ValueError(
                        "circle FRI: final layer outside the folded L' space"
                    )
        challenger.observe(jnp.asarray(proof.final_layer).reshape(-1))
        if fri.proof_of_work_bits > 0:
            if not challenger.check_witness(fri.proof_of_work_bits, proof.pow_witness):
                raise ValueError("circle FRI: proof-of-work check failed")
        expected = [challenger.sample_bits(log_lde) for _ in range(fri.num_queries)]
        if expected != list(proof.query_indices):
            raise ValueError("circle FRI: query indices do not match transcript")

        q = np.asarray(proof.query_indices, dtype=np.int64)
        nq = len(q)
        xs_q = F.from_int(
            np.asarray([lde_domain.points[i][0] for i in q], dtype=np.uint64)
        )
        ys_q = F.from_int(
            np.asarray([lde_domain.points[i][1] for i in q], dtype=np.uint64)
        )

        # 1. verify input openings + rebuild the reduced opening at queries
        ro = None
        alpha_pow = EF.ones(())
        for r_idx, (commitment, matrices) in enumerate(rounds):
            opened_rows, mproof = proof.input_openings[r_idx]
            dims = [
                (1 << log_lde, np.asarray(rows).shape[-1])
                for (_, _), rows in zip(matrices, opened_rows)
            ]
            if not self.mmcs.verify_batch(
                jnp.asarray(commitment), dims, q,
                [jnp.asarray(r) for r in opened_rows], jnp.asarray(mproof),
            ):
                raise ValueError("circle FRI: input Merkle verification failed")
            for (domain, points_and_values), rows in zip(matrices, opened_rows):
                rows_dev = jnp.asarray(rows)
                w = rows_dev.shape[-1]
                for t, claimed in points_and_values:
                    col_pows = EF.mul(EF.powers(alpha, w), alpha_pow)
                    alpha_pow = EF.mul(col_pows[-1], alpha)
                    term = _deep_quotient(
                        F, EF, rows_dev, xs_q, ys_q,
                        jnp.asarray(t), col_pows, jnp.asarray(claimed),
                    )
                    ro = term if ro is None else EF.add(ro, term)

        # 2. fold walk
        cur = ro  # (nq, D)
        pos = q.copy()
        maps = _pair_maps(tables)
        for k, ((pair_rows, mproof), beta) in enumerate(
            zip(proof.commit_phase_openings, betas)
        ):
            pair_of, slot_of = maps[k]
            rows_idx = pair_of[pos]
            half = len(tables.layers[k][0])
            if not self.challenge_mmcs.verify_batch(
                jnp.asarray(proof.commit_phase_commits[k]),
                [(half, 2 * EF.D)], rows_idx,
                [jnp.asarray(pair_rows)], jnp.asarray(mproof),
            ):
                raise ValueError(f"circle FRI: fold-round {k} Merkle failed")
            pairs = jnp.asarray(pair_rows).reshape(nq, 2, EF.D)
            slot = jnp.asarray(slot_of[pos].astype(np.int32))
            mine = jnp.take_along_axis(pairs, slot[:, None, None], axis=1)[:, 0]
            if not np.array_equal(np.asarray(mine), np.asarray(cur)):
                raise ValueError(f"circle FRI: fold-round {k} consistency failed")
            inv2tw = tables.layers[k][3]
            tw_q = jnp.take(jnp.asarray(inv2tw), jnp.asarray(rows_idx), axis=0)
            cur = _circle_fold(F, EF, pairs, tw_q, beta)
            pos = rows_idx

        final = jnp.asarray(proof.final_layer)[jnp.asarray(pos)]
        if not np.array_equal(np.asarray(cur), np.asarray(final)):
            raise ValueError("circle FRI: final value mismatch")


def _residual_cfft(F, layers, v):
    """Apply the CFFT butterflies of `layers` to (n, D) base-coordinate
    values (cfft on a sub-tower: the un-folded tail of a PairTables —
    F-linear, so EF values decompose into D independent base columns)."""
    from .cfft import _HALF

    x = v[None]  # (1, n, D)
    half = jnp.asarray(_HALF)
    for ia, ib, _, inv2tw in layers:
        a = x[:, jnp.asarray(ia)]
        b = x[:, jnp.asarray(ib)]
        f0 = F.mul(F.add(a, b), jnp.broadcast_to(half, a.shape))
        f1 = F.mul(
            F.sub(a, b),
            jnp.broadcast_to(jnp.asarray(inv2tw)[None, :, None], a.shape),
        )
        x = jnp.stack([f0, f1], axis=1).reshape(
            (x.shape[0] * 2, x.shape[1] // 2) + x.shape[2:]
        )
    return x.reshape(v.shape)


_PAIR_MAPS: dict = {}


def _pair_maps(tables):
    """Per layer: (pair_of, slot_of) arrays mapping a position in the layer's
    input to its pair row and slot."""
    key = id(tables)
    if key not in _PAIR_MAPS:
        maps = []
        for ia, ib, _, _ in tables.layers:
            m = 2 * len(ia)
            pair_of = np.zeros(m, dtype=np.int64)
            slot_of = np.zeros(m, dtype=np.int64)
            pair_of[ia] = np.arange(len(ia))
            pair_of[ib] = np.arange(len(ib))
            slot_of[ia] = 0
            slot_of[ib] = 1
            maps.append((pair_of, slot_of))
        _PAIR_MAPS[key] = maps
    return _PAIR_MAPS[key]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _deep_quotient(F, EF, lde, xs, ys, zeta_t, col_pows, vals):
    """sum_c apow_c (f_c(z) - v_c) / v0(z - zeta) over rows of `lde`.

    lde: (N, w) base evals; xs/ys: (N,) base point coords; zeta_t: (D,);
    col_pows: (w, D); vals: (w, D). One batched EF inversion."""
    zx, zy = t_to_point_ext(EF, zeta_t)
    # u = z * conj(zeta): EF coords
    ux = EF.add(EF.mul_base(zx[None], xs), EF.mul_base(zy[None], ys))
    uy = EF.sub(EF.mul_base(zx[None], ys), EF.mul_base(zy[None], xs))
    # 1 / v0(u) = (1 + ux) / uy
    inv_v0 = EF.mul(EF.add(_ones_like(EF, ux), ux), EF.inv(uy))
    num = EF.sum(F.mul(col_pows[None], lde[..., None]), axis=1)  # (N, D)
    vsum = EF.sum(EF.mul(col_pows, vals), axis=0)  # (D,)
    return EF.mul(EF.sub(num, vsum[None]), inv_v0)


def _ones_like(EF, a):
    return jnp.broadcast_to(EF.ones(()), a.shape)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _circle_fold(F, EF, pairs, inv2tw, beta):
    """(half, 2, D) pairs -> (half, D): e + beta * o with
    e = (a+b)/2, o = (a-b) * 1/(2 t)."""
    a, b = pairs[:, 0], pairs[:, 1]
    halfc = F.from_int((P + 1) // 2)
    e = EF.mul_base(EF.add(a, b), jnp.broadcast_to(halfc, a.shape[:1]))
    o = EF.mul_base(EF.sub(a, b), inv2tw)
    return EF.add(e, EF.mul(jnp.broadcast_to(beta, a.shape), o))
