"""Two-adic FRI polynomial commitment scheme.

Reference parity: the removed upstream `p3-fri` crate (`TwoAdicFriPcs`,
commit via coset-LDE + bit-reversed Merkle leaves, batched reduced
openings, arity-2 fold rounds with per-round beta, PoW grind, query phase);
API shape recovered from `examples/src/proofs.rs:98-104` and
`challenger/src/grinding_challenger.rs` (which exists solely for FRI).
SURVEY.md §2.8, §3.5.

TPU-native design:
  * commit: iDFT + zero-pad + coset-DFT onto the shift-g domain fuse into
    one jitted LDE program per matrix shape; leaves are stored bit-reversed
    so that (a) natural fold pairs (i, i + N/2) are adjacent leaves and
    (b) the MMCS index>>k rule equals the FRI index-mod rule.
  * reduced openings: one batched EF inversion of (x - zeta) over the whole
    domain + an alpha-weighted column contraction, all fused under jit.
  * fold rounds: whole-array butterfly (pair average + beta-scaled odd
    part), one Merkle commit per round — each level one batched hash call.
  * query phase: ALL queries walk every tree in lock-step with (q,)-batched
    hash/compress/EF ops — no per-query scalar loops on either side.
  * PoW grind: device-wide batched witness search (DuplexChallenger.grind).

Folding soundness note: every round folds over the FIXED coset g*H_k and
reinterprets the output on g*H_{k-1} via index (an affine reindexing
x -> g*x each round, which preserves degree); prover and verifier use
identical per-index formulas.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.domain import TwoAdicMultiplicativeCoset
from ..commit.merkle import DIGEST_WIDTH, MerkleProverData
from ..commit.pcs import Pcs, eval_coeffs_at_ext_point
from ..ops.dft import Radix2Dit, np_powers
from ..utils import bit_reverse_indices, log2_strict, reverse_bits_len
from ..utils.tracing import span


@dataclass
class FriConfig:
    log_blowup: int = 1
    num_queries: int = 100
    proof_of_work_bits: int = 16
    #: stop folding once the codeword has 2^(log_blowup + log_final_poly_len)
    #: evaluations and transport the 2^log_final_poly_len final coefficients
    #: instead — each skipped round saves a Merkle commit + transcript sync
    #: (tail rounds are pure latency); proof grows by a few KB.
    log_final_poly_len: int = 0


@dataclass
class FriProverData:
    domains: list
    coeffs: list      # per matrix: (n, w) coefficient matrices
    ldes_brev: list   # per matrix: (N, w) LDE evals, bit-reversed rows
    merkle_data: object
    log_lde_heights: list


@dataclass
class FriQueryProof:
    input_openings: list   # per input round: (opened_rows per matrix, merkle proof)
    commit_phase_openings: list  # per fold round: (opened pair rows (q,2,D), merkle proof)


@dataclass
class FriProof:
    commit_phase_commits: list
    query_proof: FriQueryProof
    final_poly: np.ndarray  # (D,) EF constant
    pow_witness: int
    query_indices: list


class TwoAdicFriPcs(Pcs):
    def __init__(self, F, EF, mmcs, challenge_mmcs, fri_config: FriConfig | None = None,
                 zk: bool = False, mesh=None):
        self.F = F
        self.EF = EF
        self.mmcs = mmcs
        self.challenge_mmcs = challenge_mmcs  # used for commit-phase (EF) matrices
        self.fri = fri_config or FriConfig()
        self.dft = Radix2Dit(F)
        # Multi-chip mesh (SURVEY.md §5.8 TPU-native equivalent): when set,
        # LDE inputs are placed column-sharded (column-independent DFTs,
        # zero communication) and LDE outputs/Merkle leaves row-sharded
        # (one all_to_all reshard over ICI); jitted stages compile under
        # GSPMD from the argument shardings. Modular u32 arithmetic is
        # exact, so the sharded prove produces byte-identical proofs.
        self.mesh = mesh
        if mesh is not None:
            self.mmcs.mesh = mesh
            inner = getattr(self.challenge_mmcs, "inner", self.challenge_mmcs)
            inner.mesh = mesh
        # ZK (ref: `commit/src/pcs.rs:43-47` const ZK + TRACE_IDX shifting;
        # randomization per eprint 2024/1037 §3): trace commits are
        # randomized t_hat = t + Z_H * r over a doubled domain, and the
        # prover adds a random extension polynomial R as opening round 0 to
        # mask the FRI batch combination. Quotient chunks are functions of
        # the already-randomized t_hat and are committed unrandomized (the
        # reference additionally randomizes chunks with correlated maskers;
        # witness-hiding here comes from t_hat + R).
        self.ZK = bool(zk)
        self.TRACE_IDX = 1 if zk else 0
        self.QUOTIENT_IDX = self.TRACE_IDX + 1
        self._rng = np.random.default_rng()

    # ---- domains ------------------------------------------------------

    def natural_domain_for_degree(self, degree: int):
        return TwoAdicMultiplicativeCoset(self.F, log2_strict(degree), 1)

    # ---- commit -------------------------------------------------------

    #: column-chunk threshold for the LDE pipeline: when big_n * width
    #: exceeds this many base elements, columns are processed in blocks so
    #: the ~5 live full-size buffers (coeffs/padded/lde/brev + input)
    #: never materialize together — the fix that lets keccak-air (2633
    #: cols) and blake3-air (9168 cols) commit at 2^17+ in 16 GB of HBM
    #: (VERDICT r4 item 3)
    LDE_CHUNK_ELEMS = 1 << 27

    def _lde_brev_block(self, evals, n, big_n, shift_int):
        """One column block: iDFT -> zero-pad -> coset DFT -> bit-reverse."""
        F = self.F
        p = F.order
        if shift_int == 1:
            coeffs = self.dft.idft_batch(evals)
        else:
            inv_s = pow(shift_int, p - 2, p)
            coeffs = self.dft.coset_idft_batch(evals, _pow_dev(F, inv_s, n))
        pad = jnp.zeros((big_n - n,) + evals.shape[1:], evals.dtype)
        padded = jnp.concatenate([coeffs, pad], axis=0)
        lde = self.dft.coset_dft_batch(padded, _pow_dev(F, F.generator_int, big_n))
        brev = jnp.take(lde, _brev_dev(big_n), axis=0)
        return coeffs, brev

    def _lde_brev(self, domain, evals):
        """evals over `domain` -> LDE over g*H (size << log_blowup),
        bit-reversed row order. Wide matrices run column-chunked."""
        F = self.F
        n = domain.size
        big_n = n << self.fri.log_blowup
        w = int(evals.shape[1])
        if self.mesh is not None and w >= len(self.mesh.devices):
            from jax.sharding import NamedSharding, PartitionSpec as P

            evals = jax.device_put(
                evals, NamedSharding(self.mesh, P(None, "chip"))
            )
        if big_n * w <= self.LDE_CHUNK_ELEMS or self.mesh is not None:
            return self._lde_brev_block(evals, n, big_n, domain.shift_int)
        # column-chunked: same shapes per block -> ONE compile; the last
        # partial block is zero-padded to the block width
        blk_w = max(1, self.LDE_CHUNK_ELEMS // big_n)
        cfs, brevs = [], []
        for off in range(0, w, blk_w):
            block = evals[:, off : off + blk_w]
            bw = int(block.shape[1])
            if bw < blk_w:
                block = jnp.concatenate(
                    [block, jnp.zeros((n, blk_w - bw) + block.shape[2:],
                                      block.dtype)], axis=1
                )
            cf, brev = self._lde_brev_block(block, n, big_n, domain.shift_int)
            cfs.append(cf[:, :bw])
            brevs.append(brev[:, :bw])
        return jnp.concatenate(cfs, axis=1), jnp.concatenate(brevs, axis=1)

    def _randomize_item(self, domain, evals):
        """ZK trace randomization: evals (n rows, natural subdomain of the
        2n-sized `domain`) -> evaluations of t_hat = t + Z_H*r on `domain`,
        where r is a uniformly random width-matched polynomial of degree <n.
        In coefficient form Z_H = x^n - 1 gives t_hat coeffs
        [t_c - r_c, r_c]; t_hat agrees with t on H so all constraints are
        preserved (eprint 2024/1037 §3)."""
        F = self.F
        n = int(evals.shape[0])
        assert domain.size == 2 * n and domain.shift_int == 1
        t_c = self.dft.idft_batch(evals)
        r_int = self._rng.integers(0, F.order, size=(n,) + tuple(evals.shape[1:]),
                                   dtype=np.uint64)
        r_c = F.from_int(r_int)
        hat_c = jnp.concatenate([F.sub(t_c, r_c), r_c], axis=0)
        return self.dft.dft_batch(hat_c)

    def transcript_on_device(self, challenger, log_max_lde: int) -> bool:
        """True when the WHOLE prover transcript can stay device-resident
        (VERDICT r4 item 9): duplex/Poseidon2/31-bit challenger, a Merkle
        challenge MMCS the fold phase can trace, and enough fold rounds
        that `_device_fold_phase` engages (its download is the single
        point where the host state reseeds)."""
        from ..commit.merkle import ExtensionMmcs, MerkleTreeMmcs
        from ..hashes.poseidon2 import Poseidon2

        if not (hasattr(challenger, "device_capable")
                and challenger.device_capable()):
            return False
        if self.EF.D > challenger.rate:
            return False
        mmcs = self.challenge_mmcs
        if isinstance(mmcs, ExtensionMmcs):
            mmcs = mmcs.inner
        if not isinstance(mmcs, MerkleTreeMmcs):
            return False
        if not isinstance(challenger.perm, Poseidon2):
            return False
        log_final = self.fri.log_blowup + self.fri.log_final_poly_len
        return log_max_lde > log_final

    def commit(self, domains_and_evals, device_root: bool = False):
        items = list(domains_and_evals)
        if self.ZK:
            items = [
                (d, self._randomize_item(d, ev))
                if d.size == 2 * int(ev.shape[0]) and d.shift_int == 1
                else (d, ev)
                for d, ev in items
            ]
        # batch same-(height, shift) matrices through ONE width-concatenated
        # DFT chain (quotient chunks: 4 transforms -> 1)
        groups: dict = {}
        for i, (domain, ev) in enumerate(items):
            groups.setdefault((domain.log_n, domain.shift_int), []).append(i)
        coeffs_by_idx: dict = {}
        ldes_by_idx: dict = {}
        for (log_n, shift), idxs in groups.items():
            widths = [int(items[i][1].shape[1]) for i in idxs]
            cat = (
                items[idxs[0]][1]
                if len(idxs) == 1
                else jnp.concatenate([items[i][1] for i in idxs], axis=1)
            )
            cf_cat, brev_cat = self._lde_brev(items[idxs[0]][0], cat)
            off = 0
            for i, w in zip(idxs, widths):
                coeffs_by_idx[i] = cf_cat[:, off : off + w]
                ldes_by_idx[i] = brev_cat[:, off : off + w]
                off += w
        domains = [d for d, _ in items]
        coeffs = [coeffs_by_idx[i] for i in range(len(items))]
        ldes = [ldes_by_idx[i] for i in range(len(items))]
        log_hs = [d.log_n + self.fri.log_blowup for d, _ in items]
        root, mdata = self.mmcs.commit(ldes)
        pd = FriProverData(domains, coeffs, ldes, mdata, log_hs)
        # device_root: leave the root ON DEVICE (the device-resident
        # transcript absorbs it there; the host copy rides the fold
        # phase's bundled download instead of costing its own round trip)
        return (root if device_root else np.asarray(root)), pd

    def get_opt_randomization_poly_commitment(self, domain):
        """Commit to EF.D uniformly random base columns over `domain` — the
        random polynomial R that joins the FRI batch to mask the combined
        polynomial (ref: `commit/src/pcs.rs:181`, `uni-stark/src/prover.rs:
        260-275`). Returns (commitment, prover_data) or None when not ZK."""
        if not self.ZK:
            return None
        F, EF = self.F, self.EF
        r_int = self._rng.integers(0, F.order, size=(domain.size, EF.D),
                                   dtype=np.uint64)
        return self.commit([(domain, F.from_int(r_int))])

    def get_evaluations_on_domain(self, pd: FriProverData, idx: int, domain):
        """Evals on `domain` (shift g, size <= LDE size): subsample the LDE."""
        F = self.F
        cf = pd.coeffs[idx]
        if domain.shift_int != (F.generator_int % F.order):
            raise ValueError("expected a shift-g evaluation domain")
        big_n = domain.size
        pad_n = big_n - cf.shape[0]
        if pad_n < 0:
            raise ValueError("domain smaller than polynomial degree")
        w = int(cf.shape[1])
        spows = _pow_dev(F, F.generator_int, big_n)

        def block(cfb):
            padded = jnp.concatenate(
                [cfb, jnp.zeros((pad_n,) + cfb.shape[1:], cfb.dtype)], axis=0
            )
            return self.dft.coset_dft_batch(padded, spows)

        if big_n * w <= self.LDE_CHUNK_ELEMS:
            return block(cf)
        # column-chunked for wide AIRs (keccak/blake3) — see LDE_CHUNK_ELEMS
        blk_w = max(1, self.LDE_CHUNK_ELEMS // big_n)
        outs = []
        for off in range(0, w, blk_w):
            cfb = cf[:, off : off + blk_w]
            bw = int(cfb.shape[1])
            if bw < blk_w:
                cfb = jnp.concatenate(
                    [cfb, jnp.zeros((cf.shape[0], blk_w - bw) + cf.shape[2:],
                                    cf.dtype)], axis=1
                )
            outs.append(block(cfb)[:, :bw])
        return jnp.concatenate(outs, axis=1)

    # ---- open ---------------------------------------------------------

    def open(self, rounds, challenger):
        F, EF = self.F, self.EF
        p = F.order

        # 1. compute all claimed evaluations via stored coefficients —
        # ONE jitted program for every (matrix, point) pair: zeta-power
        # tables are shared across matrices and dispatch latency is paid
        # once (sequential small dispatches dominate over a TPU tunnel)
        opened = []
        sp = span("fri: claimed evals"); sp.__enter__()
        flat_coeffs, flat_sig, z_ids, zs = [], [], {}, []
        for pd, points_per_matrix in rounds:
            for cf, points in zip(pd.coeffs, points_per_matrix):
                pt_ids = []
                for z in points:
                    zi = z_ids.get(id(z))
                    if zi is None:
                        zi = len(zs)
                        z_ids[id(z)] = zi
                        zs.append(z)
                    pt_ids.append(zi)
                flat_coeffs.append(cf)
                flat_sig.append(
                    (int(cf.shape[0]), int(cf.shape[1]), tuple(pt_ids))
                )
        all_vals, packed_vals = _claimed_evals_batch(
            F, EF, tuple(flat_sig), tuple(flat_coeffs), jnp.stack(zs)
        )
        vi = 0
        m_flat = 0
        opened_dev = []
        mat_npts = []
        for pd, points_per_matrix in rounds:
            round_vals_dev = []
            rn = []
            for cf, points in zip(pd.coeffs, points_per_matrix):
                npts = len(flat_sig[m_flat][2])
                round_vals_dev.append([all_vals[vi + k] for k in range(npts)])
                rn.append(npts)
                vi += npts
                m_flat += 1
            opened_dev.append(round_vals_dev)
            mat_npts.append(rn)

        # 2. bind claimed evals, sample the batch-RLC alpha. Device
        # transcript mode: the absorb + sample run on device (the packed
        # order matches the host observe order exactly: rounds -> matrices
        # -> points), alpha never touches the host, and the packed
        # download is deferred until after the fold phase dispatches.
        dev_mode = getattr(challenger, "_dev_state", None) is not None
        vals_deferred = dev_mode  # survives a fold-phase fallback
        if dev_mode:
            challenger.observe_device(packed_vals)
            alpha = challenger.sample_ext_device(EF)
            packed_np = None
        else:
            # ONE download of every claimed value (per-array downloads
            # cost a tunnel round trip each)
            packed_np = np.asarray(packed_vals)
            host_vals, off = [], 0
            for v in all_vals:
                w = int(np.prod(v.shape, dtype=np.int64))
                host_vals.append(packed_np[off : off + w].reshape(v.shape))
                off += w
            vi = 0
            for rdev, rn in zip(opened_dev, mat_npts):
                round_vals = []
                for npts in rn:
                    round_vals.append([host_vals[vi + k] for k in range(npts)])
                    vi += npts
                opened.append(round_vals)
            for rv in opened:
                for mats in rv:
                    for v in mats:
                        challenger.observe(v.reshape(-1))
            alpha = challenger.sample_ext(EF)
        sp.__exit__(None, None, None)

        # 3. reduced openings per LDE height, computed DIRECTLY in
        #    bit-reversed row order (the order the fold phase consumes):
        #    the x-coordinate table is gathered bit-reversed once per
        #    (field, log_h) instead of permuting every LDE matrix twice.
        #    The whole phase is one jitted program per shape signature.
        sp = span("fri: reduced openings"); sp.__enter__()
        row_shard = None
        if self.mesh is not None:
            # SURVEY.md §5.8 / VERDICT r3 item 9: the reduced-opening
            # contraction and the fold-phase pair arrays are embarrassingly
            # row-parallel — shard rows over the mesh (pair boundaries stay
            # chip-local because shard sizes are kept even); XLA GSPMD
            # propagates the sharding through the whole fold program.
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndev = int(np.prod(self.mesh.devices.shape))

            def row_shard(arr):
                if int(arr.shape[0]) % (2 * ndev) == 0:
                    return jax.device_put(
                        arr, NamedSharding(self.mesh, P("chip"))
                    ) if arr.ndim == 1 else jax.device_put(
                        arr, NamedSharding(self.mesh, P(*(("chip",) + (None,) * (arr.ndim - 1))))
                    )
                return arr

        ro_sig, ro_ldes, ro_vals, ro_zids = [], [], [], []
        for (pd, points_per_matrix), round_vals in zip(rounds, opened_dev):
            for m_idx, (cf, points) in enumerate(zip(pd.coeffs, points_per_matrix)):
                lde_brev = pd.ldes_brev[m_idx]
                if row_shard is not None:
                    lde_brev = row_shard(lde_brev)
                pt_ids = tuple(z_ids[id(z)] for z in points)
                ro_sig.append(
                    (
                        int(pd.log_lde_heights[m_idx]),
                        int(lde_brev.shape[0]),
                        int(lde_brev.shape[1]),
                        pt_ids,
                    )
                )
                ro_ldes.append(lde_brev)
                ro_vals.extend(round_vals[m_idx])
        ro_by_height = _reduced_openings_batch(
            F, EF, tuple(ro_sig), tuple(ro_ldes), alpha,
            jnp.stack(zs), tuple(ro_vals),
        )
        if row_shard is not None:
            # keep the fold phase's pair arrays row-sharded too
            ro_by_height = {h: row_shard(v) for h, v in ro_by_height.items()}

        # 4. FRI fold phase
        if not dev_mode:  # sync only for span timing — it costs a tunnel RTT
            for v in ro_by_height.values():
                v.block_until_ready()
        sp.__exit__(None, None, None)
        sp = span("fri: fold phase"); sp.__enter__()
        heights = sorted(ro_by_height, reverse=True)
        log_max = heights[0]
        cur = ro_by_height[log_max]
        commits, fold_data = [], []
        log_h = log_max
        log_final = self.fri.log_blowup + self.fri.log_final_poly_len
        dev = _device_fold_phase(
            self, F, EF, challenger, ro_by_height, log_max, log_final
        )
        if dev is not None:
            # fold rounds + final poly + PoW grind + query sampling all ran
            # in ONE device program (transcript emulated on device)
            commits, fold_data, cur, final_poly, pow_witness, query_indices = dev
            sp.__exit__(None, None, None)
        else:
            if dev_mode:
                # device transcript engaged but the fold fast path refused
                # — reseed the host challenger and continue host-sequenced
                challenger.end_device_transcript()
                dev_mode = False
            while log_h > log_final:
                half = 1 << (log_h - 1)
                # keep any base limb suffix (Goldilocks u32 pairs)
                pairs = cur.reshape((half, 2) + cur.shape[1:])
                root, mdata = self.challenge_mmcs.commit(
                    [pairs.reshape(half, -1)]
                )
                commits.append(np.asarray(root))
                fold_data.append((mdata, pairs))
                challenger.observe(jnp.asarray(root).reshape(-1))
                beta = challenger.sample_ext(EF)
                cur = _fold_round(F, EF, pairs, beta, log_h)
                log_h -= 1
                if log_h in ro_by_height:
                    cur = EF.add(cur, ro_by_height[log_h])

            sp.__exit__(None, None, None)
            sp = span("fri: final+grind"); sp.__enter__()
            # 5. final polynomial (coeffs on the reinterpreted coset g*H) + PoW
            final_poly = _final_poly_coeffs(
                F, EF, cur, log_final, self.fri.log_final_poly_len
            )
            challenger.observe(jnp.asarray(final_poly).reshape(-1))
            pow_witness = (
                challenger.grind(self.fri.proof_of_work_bits)
                if self.fri.proof_of_work_bits > 0
                else 0
            )
            query_indices = [
                challenger.sample_bits(log_max) for _ in range(self.fri.num_queries)
            ]
            sp.__exit__(None, None, None)

        if vals_deferred:
            # deferred claimed-values download — the fold phase (and its
            # packed download) already ran, so this transfer overlapped
            # all of the fold's device work instead of blocking before it
            packed_np = np.asarray(packed_vals)
            host_vals, off = [], 0
            for v in all_vals:
                w = int(np.prod(v.shape, dtype=np.int64))
                host_vals.append(packed_np[off : off + w].reshape(v.shape))
                off += w
            vi = 0
            for rdev, rn in zip(opened_dev, mat_npts):
                round_vals = []
                for npts in rn:
                    round_vals.append([host_vals[vi + k] for k in range(npts)])
                    vi += npts
                opened.append(round_vals)

        sp = span("fri: query openings"); sp.__enter__()
        # 6. query openings (vectorized across queries). All gathers are
        # dispatched async; results are packed into ONE (q, total) device
        # buffer and downloaded in a single transfer — per-array downloads
        # cost a tunnel round trip each.
        q = np.asarray(query_indices, dtype=np.int64)
        nq = len(q)
        bufs, splits = [], []  # device pieces + (kind, shape) metadata

        def push(arr):
            bufs.append(arr.reshape(nq, -1))
            splits.append(tuple(int(s) for s in arr.shape))

        input_meta = []
        for pd, _ in rounds:
            log_round_max = max(pd.log_lde_heights)
            idx = q >> (log_max - log_round_max)
            opened_rows, proof = self.mmcs.open_batch(idx, pd.merkle_data)
            for r in opened_rows:
                push(r)
            push(proof)
            input_meta.append(len(opened_rows))
        lh = log_max
        for (mdata, pairs) in fold_data:
            idx = (q >> (log_max - lh)) >> 1
            rows, proof = self.challenge_mmcs.open_batch(idx, mdata)
            push(rows[0])
            push(proof)
            lh -= 1
        packed = np.asarray(jnp.concatenate(bufs, axis=1)) if bufs else None
        pieces, off = [], 0
        for shape in splits:
            w = int(np.prod(shape[1:], dtype=np.int64))
            pieces.append(packed[:, off : off + w].reshape(shape))
            off += w
        pi = 0
        input_openings = []
        for n_mats in input_meta:
            rows = [pieces[pi + k] for k in range(n_mats)]
            proof = pieces[pi + n_mats]
            pi += n_mats + 1
            input_openings.append((rows, proof))
        commit_phase_openings = []
        for _ in fold_data:
            commit_phase_openings.append((pieces[pi], pieces[pi + 1]))
            pi += 2

        sp.__exit__(None, None, None)
        fri_proof = FriProof(
            commit_phase_commits=commits,
            query_proof=FriQueryProof(input_openings, commit_phase_openings),
            final_poly=np.asarray(final_poly),
            pow_witness=pow_witness,
            query_indices=query_indices,
        )
        return opened, fri_proof

    # ---- verify -------------------------------------------------------

    def verify(self, rounds, proof: FriProof, challenger):
        F, EF = self.F, self.EF
        p = F.order
        fri = self.fri

        # replay transcript: observe claimed evals, sample alpha
        for commitment, matrices in rounds:
            for _, points_and_values in matrices:
                for _, claimed in points_and_values:
                    challenger.observe(jnp.asarray(claimed).reshape(-1))
        alpha = challenger.sample_ext(EF)

        log_max = max(
            domain.log_n + fri.log_blowup
            for _, matrices in rounds
            for domain, _ in matrices
        )

        betas = []
        for root in proof.commit_phase_commits:
            challenger.observe(jnp.asarray(root).reshape(-1))
            betas.append(challenger.sample_ext(EF))
        challenger.observe(jnp.asarray(proof.final_poly).reshape(-1))
        if fri.proof_of_work_bits > 0:
            if not challenger.check_witness(fri.proof_of_work_bits, proof.pow_witness):
                raise ValueError("FRI: proof-of-work check failed")
        expected_indices = [
            challenger.sample_bits(log_max) for _ in range(fri.num_queries)
        ]
        if expected_indices != list(proof.query_indices):
            raise ValueError("FRI: query indices do not match transcript")
        log_final = fri.log_blowup + fri.log_final_poly_len
        if len(proof.commit_phase_commits) != log_max - log_final:
            raise ValueError("FRI: wrong number of fold rounds")
        fp_row = (EF.D,) + tuple(F.shape_suffix)  # one EF coeff, any limbs
        if np.asarray(proof.final_poly).reshape((-1,) + fp_row).shape[0] != (
            1 << fri.log_final_poly_len
        ):
            raise ValueError("FRI: wrong final polynomial length")

        q = np.asarray(proof.query_indices, dtype=np.int64)
        nq = len(q)

        # 1. verify input Merkle openings (vectorized) and build reduced
        #    openings per height at the query points
        ro_by_height: dict = {}
        alpha_pow = EF.ones(())
        for r_idx, (commitment, matrices) in enumerate(rounds):
            opened_rows, mproof = proof.query_proof.input_openings[r_idx]
            log_round_max = max(d.log_n + fri.log_blowup for d, _ in matrices)
            idx = q >> (log_max - log_round_max)
            dims = [
                (1 << (d.log_n + fri.log_blowup), np.asarray(rows).shape[-1])
                for (d, _), rows in zip(matrices, opened_rows)
            ]
            ok = self.mmcs.verify_batch(
                jnp.asarray(commitment),
                dims,
                idx,
                [jnp.asarray(r) for r in opened_rows],
                jnp.asarray(mproof),
            )
            if not ok:
                raise ValueError("FRI: input Merkle verification failed")
            for (domain, points_and_values), rows in zip(matrices, opened_rows):
                log_h = domain.log_n + fri.log_blowup
                w = int(np.asarray(rows).shape[1])  # limb suffix may follow
                midx = q >> (log_max - log_h)  # bit-reversed-space index
                # x = g * h^rev(midx), vectorized
                xs = F.from_int(_xs_at_brev_indices(F, log_h, midx))  # (nq,)
                rows_dev = jnp.asarray(rows)  # (nq, w)
                for z, claimed in points_and_values:
                    col_pows = []
                    ap = alpha_pow
                    for _ in range(w):
                        col_pows.append(ap)
                        ap = EF.mul(ap, alpha)
                    alpha_pow = ap
                    col_pows = jnp.stack(col_pows)  # (w, D)
                    ro = _reduced_opening_at_queries(
                        F, EF, rows_dev, xs, z, col_pows, jnp.asarray(claimed)
                    )  # (nq, D)
                    ro_by_height[log_h] = (
                        ro
                        if log_h not in ro_by_height
                        else EF.add(ro_by_height[log_h], ro)
                    )

        # 2. walk the fold rounds
        cur = ro_by_height[log_max]  # (nq, D)
        log_h = log_max
        for r, ((pair_rows, mproof), beta) in enumerate(
            zip(proof.query_proof.commit_phase_openings, betas)
        ):
            idx = q >> (log_max - log_h)
            pair_idx = idx >> 1
            suffix = tuple(F.shape_suffix)  # base limb suffix (Goldilocks)
            n_limb = int(np.prod(suffix, dtype=np.int64)) if suffix else 1
            ok = self.challenge_mmcs.verify_batch(
                jnp.asarray(proof.commit_phase_commits[r]),
                [(1 << (log_h - 1), 2 * EF.D * n_limb)],
                pair_idx,
                [jnp.asarray(pair_rows)],
                jnp.asarray(mproof),
            )
            if not ok:
                raise ValueError(f"FRI: fold-round {r} Merkle verification failed")
            pairs = jnp.asarray(pair_rows).reshape((nq, 2, EF.D) + suffix)
            # consistency: our running value must equal the opened slot
            slot = jnp.asarray((idx & 1).astype(np.int32))
            slot_idx = slot.reshape((nq, 1, 1) + (1,) * len(suffix))
            mine = jnp.take_along_axis(pairs, slot_idx.astype(jnp.int32),
                                       axis=1)[:, 0]
            if not np.array_equal(np.asarray(mine), np.asarray(cur)):
                raise ValueError(f"FRI: fold-round {r} consistency check failed")
            # fold: 1/(2x) at the bit-reversed pair indices comes from the
            # cached device table (one gather; no per-query host pow/inverse
            # loops — VERDICT r3 weak-8). Table slot t holds
            # 1/(2 g h^rev(t, log_h-1)) == 1/(2x) for x = g h^rev(2t, log_h).
            inv2x = jnp.take(
                _inv2x_brev_dev(F, log_h),
                jnp.asarray(pair_idx, dtype=jnp.int32),
                axis=0,
            )
            half = F.from_int((p + 1) // 2)
            e = EF.mul_base(EF.add(pairs[:, 0], pairs[:, 1]),
                            jnp.broadcast_to(half, (nq,) + half.shape))
            o = EF.mul_base(EF.sub(pairs[:, 0], pairs[:, 1]), inv2x)
            cur = EF.add(e, EF.mul(jnp.broadcast_to(beta, (nq,) + beta.shape), o))
            log_h -= 1
            if log_h in ro_by_height:
                cur = EF.add(cur, ro_by_height[log_h])

        # 3. final polynomial check: evaluate the transported coefficients at
        #    each query's point on the (reinterpreted) coset g*H_final
        coeffs = jnp.asarray(proof.final_poly).reshape((-1,) + fp_row)
        idx_fin = q >> (log_max - log_final) if log_max > log_final else q
        xs = F.from_int(_xs_at_brev_indices(F, log_final, idx_fin))  # (nq,)
        val = jnp.zeros((nq,) + fp_row, coeffs.dtype)
        for j in reversed(range(coeffs.shape[0])):  # Horner
            val = EF.add(EF.mul_base(val, xs),
                         jnp.broadcast_to(coeffs[j], (nq,) + fp_row))
        if not np.array_equal(np.asarray(cur), np.asarray(val)):
            raise ValueError("FRI: final polynomial mismatch")

    def observe_commitment(self, challenger, commitment):
        challenger.observe(jnp.asarray(commitment).reshape(-1))


def _xs_at_brev_indices(F, log_h: int, idx: np.ndarray) -> np.ndarray:
    """x = g * h^rev(t) for query indices t (bit-reversed-space), as
    canonical uint64 — fully vectorized numpy square-and-multiply instead
    of a per-query Python pow loop (~1300 bigint pows per verify at 100
    queries x 13 rounds; VERDICT r3 weak-8)."""
    if F.order >= (1 << 32):  # big fields: u64 products would overflow
        pp = F.order
        hg = F.two_adic_generator_int(log_h)
        return np.array(
            [
                (F.generator_int * pow(hg, reverse_bits_len(int(t), log_h), pp)) % pp
                for t in np.asarray(idx).reshape(-1)
            ],
            dtype=np.uint64,
        )
    p = np.uint64(F.order)
    h_gen = F.two_adic_generator_int(log_h)
    # reverse the low log_h bits of each index, vectorized
    t = np.asarray(idx, dtype=np.uint64)
    r = np.zeros_like(t)
    for _ in range(log_h):
        r = (r << np.uint64(1)) | (t & np.uint64(1))
        t = t >> np.uint64(1)
    # h^r by square-and-multiply on (nq,) lanes (31-bit fields: products of
    # two canonical values fit uint64)
    acc = np.full_like(r, 1)
    base = np.uint64(h_gen % F.order)
    e = r
    for _ in range(log_h):
        acc = np.where(e & np.uint64(1), (acc * base) % p, acc)
        base = (base * base) % p
        e = e >> np.uint64(1)
    return (acc * np.uint64(F.generator_int % F.order)) % p


# ---- jitted helpers ------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ef_dft(EF):
    return Radix2Dit(EF)


#: compiled claimed-evals programs keyed by (F, EF, shape signature)
_CLAIMED_EVALS_CACHE: dict = {}

#: compiled reduced-openings programs keyed by (F, EF, shape signature)
_REDUCED_OPENINGS_CACHE: dict = {}

#: compiled device-resident fold-phase programs
_FOLD_PHASE_CACHE: dict = {}


class _DevDuplex:
    """Traced emulation of the host DuplexChallenger on Montgomery lanes.

    Used INSIDE jitted programs to keep the transcript on device across a
    whole prover phase (fold rounds + final poly + grind + query sampling)
    — one dispatch + one small download instead of a host round trip per
    transcript interaction. Pending-input/output bookkeeping is host-side
    Python (element COUNTS are static); only values are traced.

    Equivalence: device permute on Montgomery lanes == host permute on
    canonical ints (the permutation commutes with the Montgomery bijection
    per-element), absorb overwrites state[:k] like `_duplex`, and `sample`
    pops state[rate-1], state[rate-2], ... like the host `_output.pop()`.
    """

    def __init__(self, perm, state, rate):
        self.perm = perm
        self.rate = rate
        self.st = state  # (W,) Montgomery
        self.pending: list = []  # traced Montgomery scalars
        self.n_out = 0  # available outputs (pop from state[n_out-1])

    def _duplex(self):
        st = self.st
        for i, v in enumerate(self.pending):
            st = st.at[i].set(v)
        self.pending = []
        self.st = self.perm.permute(st[None])[0]
        self.n_out = self.rate

    def observe_vec(self, v, n: int):
        """Absorb v[0..n) (Montgomery traced vector, n static). Runs of
        full rate-sized blocks absorb under ONE lax.scan — the compiled
        program contains one duplex body for the whole run instead of
        n/rate inlined permutations (compile-time, not run-time, cost)."""
        self.n_out = 0
        i = 0
        # fill any pending partial block element-wise first
        while self.pending and i < n:
            self.pending.append(v[i])
            i += 1
            if len(self.pending) == self.rate:
                self._duplex()
        full = (n - i) // self.rate
        if full >= 2:
            chunks = v[i : i + full * self.rate].reshape(full, self.rate)

            def step(st, ch):
                st = jax.lax.dynamic_update_slice(st, ch, (0,))
                return self.perm.permute(st[None])[0], None

            self.st, _ = jax.lax.scan(step, self.st, chunks)
            self.n_out = self.rate
            i += full * self.rate
        for j in range(i, n):
            self.pending.append(v[j])
            if len(self.pending) == self.rate:
                self._duplex()

    def sample(self):
        """One Montgomery scalar, matching host `sample_int` order."""
        if self.pending or self.n_out == 0:
            self._duplex()
        self.n_out -= 1
        return self.st[self.n_out]

    def sample_many(self, k: int):
        """k Montgomery scalars in host `sample_int` order; the clean
        full-squeeze duplexes run under ONE lax.scan."""
        outs = []
        while k > 0 and (self.pending or self.n_out > 0):
            outs.append(self.sample())
            k -= 1
        if k == 0:
            return outs
        m = (k + self.rate - 1) // self.rate

        def step(st, _):
            st2 = self.perm.permute(st[None])[0]
            return st2, st2[: self.rate]

        self.st, ys = jax.lax.scan(step, self.st, None, length=m)
        vals = ys[:, ::-1].reshape(-1)  # pop-from-end order per block
        outs.extend(vals[i] for i in range(k))
        self.n_out = m * self.rate - k
        return outs


#: compiled absorb+sample transcript programs (device-mode challenger)
_ABSORB_SAMPLE_CACHE: dict = {}


def _absorb_sample_dev(F, perm, rate, state, vecs, n_samples: int):
    """Absorb 1-D Montgomery vectors into a device duplex state and sample
    n_samples elements, in ONE jitted program (byte-identical to the host
    observe/sample sequence — see _DevDuplex). Returns (new_state,
    (n_samples,) Montgomery samples). Cached per (field, perm, lengths)."""
    key = (F.name, id(perm), rate,
           tuple(int(v.shape[0]) for v in vecs), n_samples)
    fn = _ABSORB_SAMPLE_CACHE.get(key)
    if fn is None:

        def body(state, *vs):
            dx = _DevDuplex(perm, state, rate)
            for v in vs:
                dx.observe_vec(v, int(v.shape[0]))
            out = jnp.stack(dx.sample_many(n_samples))
            return dx.st, out

        fn = jax.jit(body)
        _ABSORB_SAMPLE_CACHE[key] = fn
    # a sample always flushes pending inputs, so the next program may start
    # from (state, no-pending) — callers must sample at least one element
    assert n_samples > 0
    return fn(state, *vecs)


def _device_grind(F, duplex: _DevDuplex, bits: int, batch: int | None = None):
    """PoW witness search inside a traced program (ref:
    `grinding_challenger.rs`; host fallback: DuplexChallenger.grind).
    Finds the smallest canonical w such that absorbing w and sampling
    yields low `bits` zero, using device-wide batches under a while_loop.
    Absorbs the witness into `duplex` and returns it (traced uint32)."""
    if batch is None:
        # big batches amortize nothing on the CPU backend (tests) and
        # cover ~2 expected hits at 16 bits on TPU
        if jax.default_backend() == "cpu":
            batch = min(max(1 << (bits + 1), 1 << 10), 1 << 14)
        else:
            batch = 1 << 17
    perm, rate = duplex.perm, duplex.rate
    k = len(duplex.pending)
    base = duplex.st
    for i, v in enumerate(duplex.pending):
        base = base.at[i].set(v)
    mask = jnp.uint32((1 << bits) - 1)

    def cond(carry):
        _, found, _ = carry
        return ~found

    def body(carry):
        start, _, _ = carry
        cands = start + jnp.arange(batch, dtype=jnp.uint32)
        states = jnp.broadcast_to(base, (batch,) + base.shape)
        states = states.at[:, k].set(F.from_canonical(cands))
        out = perm.permute(states)
        ok = (F.to_canonical(out[:, rate - 1]) & mask) == 0
        idx = jnp.argmax(ok)
        return (start + jnp.uint32(batch), ok[idx], cands[idx])

    _, _, w = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), jnp.bool_(False), jnp.uint32(0))
    )
    duplex.observe_vec(F.from_canonical(w)[None], 1)
    s = duplex.sample()  # the check sample (host asserts the low bits)
    return w, s


def _device_fold_phase(pcs, F, EF, challenger, ro_by_height, log_max, log_final):
    """Run the whole FRI tail in one device program: all fold rounds, the
    final-polynomial iDFT, the PoW grind, and query-index sampling, with
    the duplex challenger emulated on-device — ONE dispatch + ONE small
    download instead of a host round trip per transcript interaction
    (~31ms each over a TPU tunnel) and instead of the host-sequential
    grind (~65k host permutes for 16-bit PoW = ~750ms on one core).

    Returns (commits, fold_data, cur, final_poly, pow_witness,
    query_indices) or None when the transcript shape doesn't fit the fast
    path (non-Poseidon2 challenger, pending inputs, big field) — callers
    fall back to the host-sequenced loop.

    Transcript-equivalence argument: at entry the challenger has no pending
    inputs (sampling flushes them), so each round is exactly
    observe(8-elem root) == one duplex overwrite of state[:RATE], then
    sample_ext pops output[RATE-1-j] for j in 0..D-1; the final-poly
    observe / grind / query sampling replay the host logic element-for-
    element (see _DevDuplex). The host challenger state is reseeded from
    the downloaded final state.
    """
    from ..challenger import DuplexChallenger
    from ..hashes.poseidon2 import Poseidon2

    if not isinstance(challenger, DuplexChallenger):
        return None
    perm = challenger.perm
    if (
        not isinstance(perm, Poseidon2)
        or F.order >= (1 << 32)
        or challenger._input
        or challenger.rate != DIGEST_WIDTH
        or EF.D > challenger.rate
        or log_max <= log_final
    ):
        return None
    from ..commit.merkle import ExtensionMmcs, MerkleTreeMmcs

    mmcs = pcs.challenge_mmcs
    if isinstance(mmcs, ExtensionMmcs):
        # the committed matrices are already base-flattened (half, 2D) —
        # the inner tree builder sees identical leaves
        mmcs = mmcs.inner
    if not isinstance(mmcs, MerkleTreeMmcs):
        return None
    fri = pcs.fri
    log_len = fri.log_final_poly_len
    pow_bits = fri.proof_of_work_bits
    nq = fri.num_queries
    heights = tuple(sorted(ro_by_height, reverse=True))
    # device-mode bundling: extra vectors (commit roots etc.) queued on the
    # challenger ride the fold phase's single packed download
    extras = tuple(getattr(challenger, "_dev_extra", ()) or ())
    extra_lens = tuple(int(v.shape[0]) for v in extras)
    key = (F.name, EF.name, id(perm), id(mmcs), heights, log_max, log_final,
           log_len, pow_bits, nq, extra_lens)
    fn = _FOLD_PHASE_CACHE.get(key)
    rate, D = challenger.rate, EF.D
    num_rounds = log_max - log_final
    n_fp = (1 << log_len) * D  # final-poly base elements observed

    # host-side replay of the pending/output-counter bookkeeping (all
    # element counts are static) to know how many leftover outputs the
    # reseeded host challenger holds at the end
    class _Ctr:
        p = n = 0

        def observe(self, k):
            self.n = 0
            for _ in range(k):
                self.p += 1
                if self.p == rate:
                    self.p, self.n = 0, rate

        def sample(self):
            if self.p or self.n == 0:
                self.p, self.n = 0, rate
            self.n -= 1

    ctr = _Ctr()
    for _ in range(num_rounds):
        ctr.observe(rate)
        for _ in range(D):
            ctr.sample()
    ctr.observe(n_fp)
    if pow_bits > 0:
        ctr.observe(1)
        ctr.sample()
    for _ in range(nq):
        ctr.sample()
    n_out_final = ctr.n

    if fn is None:

        def final_poly_dev(cur):
            """cur: (2^log_final, D) bit-reversed evals on g*H_final ->
            (2^log_len, D) Montgomery coefficient rows (traced inline;
            mirrors the host `_final_poly_coeffs`)."""
            n_fin = cur.shape[0]
            if n_fin == 1:
                return cur
            p = F.order
            nat = jnp.take(cur, jnp.asarray(bit_reverse_indices(n_fin)), axis=0)
            inv_s = pow(F.generator_int, p - 2, p)
            # explicit base embedding: a length-D int vector would otherwise be
            # parsed as ONE extension element's coefficients (n_fin == D edge)
            ipows = EF.from_base(F.from_int(np_powers(inv_s, n_fin, p)))
            coeffs = _ef_dft(EF).coset_idft_batch(nat[:, None], ipows)[:, 0]
            return coeffs[: 1 << log_len]

        def body(state, ros, inv2x_tables, extras):
            ro = dict(zip(heights, ros))
            cur = ro[log_max]
            roots, all_levels, all_pairs = [], [], []
            dx = _DevDuplex(perm, state, rate)
            for log_h in range(log_max, log_final, -1):
                half = 1 << (log_h - 1)
                pairs = cur.reshape(half, 2, D)
                root, levels = mmcs._build_tree([pairs.reshape(half, 2 * D)])
                roots.append(root)
                all_levels.append(tuple(levels))
                all_pairs.append(pairs)
                dx.observe_vec(root, rate)
                beta = jnp.stack([dx.sample() for _ in range(D)])
                cur = _fold_pair(F, EF, pairs, beta, inv2x_tables[log_h])
                if log_h - 1 in ro:
                    cur = EF.add(cur, ro[log_h - 1])
            final_poly = final_poly_dev(cur)
            dx.observe_vec(final_poly.reshape(-1), n_fp)
            if pow_bits > 0:
                witness, check = _device_grind(F, dx, pow_bits)
            else:
                witness = jnp.uint32(0)
                check = jnp.uint32(0)
            q_idx = F.to_canonical(jnp.stack(dx.sample_many(nq))) & jnp.uint32(
                (1 << log_max) - 1
            )
            packed_small = jnp.concatenate(
                [
                    jnp.stack(roots).reshape(-1) if roots else jnp.zeros(0, jnp.uint32),
                    dx.st,
                    final_poly.reshape(-1),
                    witness[None],
                    F.to_canonical(check)[None],
                    q_idx,
                ]
                + [e for e in extras]
            )
            return packed_small, tuple(all_levels), tuple(all_pairs), cur

        fn = jax.jit(body)
        _FOLD_PHASE_CACHE[key] = fn

    dev_state = getattr(challenger, "_dev_state", None)
    state_mont = (
        dev_state
        if dev_state is not None
        else F.from_int(np.asarray(challenger._state, dtype=np.uint64))
    )
    ros = tuple(ro_by_height[h] for h in heights)
    inv2x_tables = {
        log_h: _inv2x_brev_dev(F, log_h)
        for log_h in range(log_max, log_final, -1)
    }
    packed_small, all_levels, all_pairs, cur = fn(
        state_mont, ros, inv2x_tables, extras
    )
    small = np.asarray(packed_small)  # ONE download: whole transcript tail
    off = num_rounds * DIGEST_WIDTH
    roots_np = small[:off].reshape(num_rounds, DIGEST_WIDTH)
    W = challenger.width
    state_mont_np = small[off : off + W]; off += W
    final_poly = small[off : off + n_fp].reshape(1 << log_len, D); off += n_fp
    pow_witness = int(small[off]); off += 1
    check = int(small[off]); off += 1
    if pow_bits > 0 and (check & ((1 << pow_bits) - 1)) != 0:
        raise AssertionError("device grind produced an invalid PoW witness")
    query_indices = [int(x) for x in small[off : off + nq]]
    off += nq
    # deliver bundled extras (e.g. commit roots) to the challenger's host
    # side and exit device-transcript mode
    extras_np = []
    for ln in extra_lens:
        extras_np.append(small[off : off + ln])
        off += ln
    if getattr(challenger, "_dev_state", None) is not None:
        challenger._dev_extra_np = extras_np
        challenger._dev_extra = []
        challenger._dev_state = None
        challenger._dev_pending = []
    # reseed the host transcript: state, empty input, leftover outputs
    state_canon = np.asarray(
        F.to_ints(state_mont_np), dtype=challenger._dtype
    )
    challenger._state = state_canon.copy()
    challenger._input = []
    challenger._output = [int(x) for x in state_canon[:n_out_final]]
    commits, fold_data = [], []
    for r, log_h in enumerate(range(log_max, log_final, -1)):
        half = 1 << (log_h - 1)
        pairs = all_pairs[r]
        mdata = MerkleProverData(
            matrices=[pairs.reshape(half, 2 * D)],
            levels=list(all_levels[r]),
            heights=[half],
        )
        commits.append(roots_np[r])
        fold_data.append((mdata, pairs))
    return commits, fold_data, cur, final_poly, pow_witness, query_indices


def _fold_pair(F, EF, pairs, beta, inv2x_brev):
    """e + beta*o on (half, 2, D) bit-reversed pairs (traced inline)."""
    half_n = pairs.shape[0]
    half = F.from_int((F.order + 1) // 2)
    # broadcast shapes keep any base limb suffix (Goldilocks u32 pairs)
    e = EF.mul_base(EF.add(pairs[:, 0], pairs[:, 1]),
                    jnp.broadcast_to(half, (half_n,) + half.shape))
    o = EF.mul_base(EF.sub(pairs[:, 0], pairs[:, 1]), inv2x_brev)
    return EF.add(e, EF.mul(jnp.broadcast_to(beta, (half_n,) + beta.shape), o))


@functools.lru_cache(maxsize=None)
def _xs_brev_dev(F, log_h: int, n: int):
    """x_i = g * h^rev(i) for the size-2^log_h coset, bit-reversed order."""
    p = F.order
    xs = (np_powers(F.two_adic_generator_int(log_h), n, p)
          * np.uint64(F.generator_int % p)) % np.uint64(p)
    return F.from_int(xs[np.asarray(bit_reverse_indices(n), dtype=np.int64)])


def _reduced_openings_batch(F, EF, sig, ldes, alpha, zs, vals):
    """All reduced openings in ONE jitted program, bit-reversed row order.

    sig: per matrix (log_h, big_n, w, point_indices); ldes: matching
    bit-reversed LDE matrices; zs: (nz, D) distinct points; vals: claimed
    evals (w, D) flattened in (matrix, point) order. Returns
    {log_h: (big_n, D) accumulated reduced opening} (device arrays).
    """
    key = (F.name, EF.name, sig)
    fn = _REDUCED_OPENINGS_CACHE.get(key)
    heights = sorted({s[0] for s in sig}, reverse=True)
    if fn is None:
        total_w = sum(w * len(pt_ids) for (_, _, w, pt_ids) in sig)

        def body(ldes, alpha, zs, vals, xs_tables):
            apows = EF.powers(alpha, total_w)  # (total_w, D)
            # accumulate numerators per (log_h, point) so the expensive
            # EF inversion of (x - z) runs ONCE per distinct denominator
            # (quotient chunks share a point: 6 inversions -> 3 at 2^20)
            diffs: dict = {}
            col0 = 0
            vi = 0
            for lde_brev, (log_h, big_n, w, pt_ids) in zip(ldes, sig):
                for zi in pt_ids:
                    col_pows = apows[col0 : col0 + w]
                    col0 += w
                    v = vals[vi]
                    vi += 1
                    num = _chunked_col_contraction(F, EF, lde_brev, col_pows)
                    vsum = EF.sum(EF.mul(col_pows, v), axis=0)
                    diff = EF.sub(num, vsum)
                    key = (log_h, zi)
                    diffs[key] = diff if key not in diffs else EF.add(diffs[key], diff)
            # one inversion per distinct point, at the MAX height only: in
            # bit-reversed order a lower height's x-table is a prefix of
            # the max height's (same shift g, h_low = h_max^2), so lower
            # heights slice the inverted table instead of re-inverting
            log_hs_present = sorted({k[0] for k in diffs}, reverse=True)
            top = log_hs_present[0]
            inv_by_z = {}
            for (log_h, zi) in diffs:
                if zi not in inv_by_z:
                    denom = EF.sub(EF.from_base(xs_tables[top]), zs[zi])
                    inv_by_z[zi] = EF.inv(denom)
            acc = {h: None for h in heights}
            for (log_h, zi), diff in diffs.items():
                inv_denom = inv_by_z[zi][: diff.shape[0]]
                ro = EF.mul(diff, inv_denom)
                acc[log_h] = ro if acc[log_h] is None else EF.add(acc[log_h], ro)
            return tuple(acc[h] for h in heights)

        fn = jax.jit(body, static_argnames=())
        _REDUCED_OPENINGS_CACHE[key] = fn
    xs_tables = {
        log_h: _xs_brev_dev(F, log_h, big_n) for (log_h, big_n, _w, _p) in sig
    }
    out = fn(tuple(ldes), alpha, zs, tuple(vals), xs_tables)
    return dict(zip(heights, out))


def _claimed_evals_batch(F, EF, sig, coeffs, zs):
    """Evaluate every coefficient matrix at its assigned points in one
    jitted program. sig: per matrix (n, w, point_indices); zs: (nz, D).
    Returns (per-pair values, 1-D packed concat of all values) — the
    packed copy lets the caller download everything in one transfer."""
    key = (F.name, EF.name, sig)
    fn = _CLAIMED_EVALS_CACHE.get(key)
    if fn is None:
        # max table length needed per distinct point
        n_by_z: dict = {}
        for n, _w, pt_ids in sig:
            for zi in pt_ids:
                n_by_z[zi] = max(n_by_z.get(zi, 0), n)

        def body(coeffs, zs):
            tables = {zi: EF.powers(zs[zi], n) for zi, n in n_by_z.items()}
            out = []
            for cf, (n, w, pt_ids) in zip(coeffs, sig):
                for zi in pt_ids:
                    zp = tables[zi][:n]
                    out.append(_coeff_contraction(F, EF, cf, zp))
            packed = jnp.concatenate([v.reshape(-1) for v in out])
            return tuple(out), packed

        fn = jax.jit(body)
        _CLAIMED_EVALS_CACHE[key] = fn
    return fn(tuple(coeffs), zs)


def _coeff_contraction(F, EF, coeffs, zpows, row_chunk: int = 1 << 14):
    """sum_i zpows_i * coeffs[i, :] -> (w, D), chunk-scanned over rows."""
    n, w = coeffs.shape[0], coeffs.shape[1]
    if n <= row_chunk:
        return EF.sum(EF.mul_base(zpows[:, None, :], coeffs), axis=0)
    assert n % row_chunk == 0
    nc = n // row_chunk
    cf = coeffs.reshape((nc, row_chunk) + coeffs.shape[1:])
    zp = zpows.reshape(nc, row_chunk, EF.D)

    def step(acc, xs):
        c, z = xs
        return EF.add(acc, EF.sum(EF.mul_base(z[:, None], c), axis=0)), None

    acc, _ = jax.lax.scan(step, jnp.zeros((w, EF.D), coeffs.dtype), (cf, zp))
    return acc


# device-resident tables, transferred ONCE per (size/base) — repeated
# host->device uploads of 8-16MB power/bit-reversal tables per open() call
# dominate prove latency over a TPU tunnel
@functools.lru_cache(maxsize=None)
def _brev_dev(n: int):
    return jnp.asarray(bit_reverse_indices(n))


@functools.lru_cache(maxsize=None)
def _pow_dev(F, base: int, n: int):
    return F.from_int(np_powers(base, n, F.order))


def _chunked_col_contraction(F, EF, mat, col_pows, chunk: int = 16):
    """sum_c pows_c * mat[:, c] -> (N, D), scanning over column chunks.

    Suffix-generic: base fields with a limb suffix (Goldilocks u32 pairs)
    carry it through — the original 2-D-only padding broke the Goldilocks
    engine's reduced openings (latent since this path landed in round 4;
    caught by tests/test_goldilocks_stark.py)."""
    n, w = mat.shape[0], mat.shape[1]
    suffix = tuple(mat.shape[2:])  # () for single-word fields
    pad = (-w) % chunk
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.zeros((n, pad) + suffix, mat.dtype)], axis=1
        )
        col_pows = jnp.concatenate(
            [col_pows, jnp.zeros((pad,) + col_pows.shape[1:], col_pows.dtype)], axis=0
        )
    nchunks = (w + pad) // chunk
    mat_c = jnp.moveaxis(mat.reshape((n, nchunks, chunk) + suffix), 1, 0)
    pow_c = col_pows.reshape((nchunks, chunk) + tuple(col_pows.shape[1:]))

    def step(acc, xs):
        m, pw = xs
        m_exp = m[..., None, :] if suffix else m[..., None]
        term = EF.sum(F.mul(pw[None], m_exp), axis=1)  # (N, D) + suffix
        return EF.add(acc, term), None

    acc0 = jnp.zeros((n, EF.D) + suffix, mat.dtype)
    acc, _ = jax.lax.scan(step, acc0, (mat_c, pow_c))
    return acc


def _final_poly_coeffs(F, EF, cur, log_final: int, log_len: int) -> np.ndarray:
    """cur: (2^log_final, D) bit-reversed evals on the (reinterpreted) coset
    g*H_final -> the 2^log_len final-polynomial coefficients (the blowup
    guarantees the top coefficients vanish, so they are simply dropped)."""
    n_fin = cur.shape[0]
    if n_fin == 1:
        return np.asarray(cur)
    p = F.order
    nat = jnp.take(cur, jnp.asarray(bit_reverse_indices(n_fin)), axis=0)
    inv_s = pow(F.generator_int, p - 2, p)
    # explicit base embedding (n_fin == D would misparse as one EF element)
    ipows = EF.from_base(F.from_int(np_powers(inv_s, n_fin, p)))
    coeffs = _ef_dft(EF).coset_idft_batch(nat[:, None], ipows)[:, 0]
    return np.asarray(coeffs[: 1 << log_len])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _reduced_opening_at_queries(F, EF, rows, xs, zeta, col_pows, claimed):
    """Same contraction at (nq,) query points: rows (nq, w) + any base
    limb suffix, xs (nq,) + suffix."""
    suffix = tuple(rows.shape[2:])
    rows_exp = rows[..., None, :] if suffix else rows[..., None]
    num = EF.sum(F.mul(col_pows[None], rows_exp), axis=1)
    vsum = EF.sum(EF.mul(col_pows, claimed), axis=0)
    diff = EF.sub(num, vsum)
    denom = EF.sub(EF.from_base(xs), zeta)
    return EF.mul(diff, EF.inv(denom))


@functools.lru_cache(maxsize=None)
def _inv2x_brev_dev(F, log_h: int):
    """1/(2 x_i) with x_i = g*h^i over the half-size coset, bit-reversed —
    a geometric sequence (2g)^-1 * h^-i, cached on device per (F, log_h)."""
    p = F.order
    half_n = 1 << (log_h - 1)
    h_gen = F.two_adic_generator_int(log_h)
    h_inv = pow(h_gen, p - 2, p)
    inv2g = pow((2 * F.generator_int) % p, p - 2, p)
    inv2x = (np_powers(h_inv, half_n, p) * np.uint64(inv2g)) % np.uint64(p)
    brev = np.asarray(bit_reverse_indices(half_n), dtype=np.int64)
    return F.from_int(inv2x[brev])


@functools.lru_cache(maxsize=None)
def _fold_round_fn(F, EF):
    half = F.from_int((F.order + 1) // 2)

    def body(pairs, beta, inv2x_brev):
        half_n = pairs.shape[0]
        e = EF.mul_base(EF.add(pairs[:, 0], pairs[:, 1]),
                        jnp.broadcast_to(half, (half_n,) + half.shape))
        o = EF.mul_base(EF.sub(pairs[:, 0], pairs[:, 1]), inv2x_brev)
        return EF.add(e, EF.mul(jnp.broadcast_to(beta, (half_n,) + beta.shape), o))

    return jax.jit(body)


def _fold_round(F, EF, pairs, beta, log_h):
    """One arity-2 FRI fold: pairs (half, 2, D) in bit-reversed layout ->
    (half, D). e + beta*o with o = (p0 - p1)/(2x). One dispatch; the
    inverse-2x table is a cached device resident."""
    return _fold_round_fn(F, EF)(pairs, beta, _inv2x_brev_dev(F, log_h))
