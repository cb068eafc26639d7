"""Batched radix-2 DFT / coset-LDE over two-adic fields.

Reference parity: `dft/src/traits.rs:27` (`TwoAdicSubgroupDft`: dft/idft/
coset_dft/coset_idft/lde/coset_lde + _batch variants), `dft/src/radix_2_dit.rs`
and `dft/src/radix_2_dit_parallel.rs` (the workhorse), `dft/src/naive.rs`.

TPU-native design (NOT a port):
  * The reference splits the butterfly network into two halves around a
    bit-reversal so rayon threads touch disjoint cache blocks
    (`radix_2_dit_parallel.rs:22-47`). On TPU the whole matrix lives in HBM
    and XLA fuses each butterfly layer into one elementwise pass, so we run
    a single bit-reversal gather followed by log(n) vectorized DIT layers —
    each layer is add/sub/mul over the full (n, w) array on the VPU.
  * Twiddles are precomputed host-side (numpy log-doubling) per (field,
    log_n) — the analogue of the reference's `RwLock<BTreeMap>` twiddle
    caches (`radix_2_dit.rs:39`) — and baked into the jitted program as XLA
    constants.
  * Every public entry point is one jit-compiled program per (n, w) shape:
    iDFT + zero-pad + coset scaling + DFT fuse into a single XLA executable
    (the analogue of `coset_lde_batch`'s fused idft+pad+dft,
    `radix_2_dit_parallel.rs:169`).
  * The distributed version (butterfly stages + one all_to_all at the
    bit-reversal boundary, SURVEY.md §5.8) lives in `parallel/dist_dft.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import Field
from ..utils import bit_reverse_indices, log2_strict


def np_powers(base: int, n: int, p: int) -> np.ndarray:
    """[1, base, ..., base^(n-1)] mod p as uint64 numpy (host, log-doubling).
    For p >= 2^63 (BN254) the powers are exact Python ints (object dtype)."""
    if p >= 1 << 63:
        out = np.empty(max(n, 1), dtype=object)
        out[0] = 1
        b = base % p
        for i in range(1, n):
            out[i] = out[i - 1] * b % p
        return out[:n]
    out = np.ones(max(n, 1), dtype=np.uint64)
    if n <= 1:
        return out[:n]
    cur = np.uint64(base % p)
    length = 1
    pu = np.uint64(p)
    while length < n:
        step = min(length, n - length)
        out[length : length + step] = (out[:step] * cur) % pu
        cur = (cur * cur) % pu
        length *= 2
    return out[:n]


class Radix2Dit:
    """Radix-2 decimation-in-time DFT over matrix columns.

    One instance per field; compiled programs and twiddle tables are cached
    per log_n. Also answers for the reference's `Radix2DitParallel`,
    `Radix2Bowers` and `Radix2DFTSmallBatch` — on TPU those cache/thread
    layouts collapse into the same fused XLA program.
    """

    def __init__(self, F: Field):
        self.F = F
        self._twiddle_cache: dict = {}

    # ---- twiddle tables ----------------------------------------------

    def _twiddles(self, log_n: int, inverse: bool):
        key = (log_n, inverse)
        if key not in self._twiddle_cache:
            F = self.F
            p = F.order
            g = F.two_adic_generator_int(log_n)
            if inverse:
                g = pow(g, p - 2, p)
            full = np_powers(g, 1 << max(log_n - 1, 0), p)
            stages = []
            for s in range(log_n):
                m = 1 << s
                stride = 1 << (log_n - 1 - s)
                # host numpy (internal form) — becomes an XLA constant at each
                # trace site; never cache device arrays (jit tracer safety)
                stages.append(F.from_int_np(full[::stride][:m]))
            self._twiddle_cache[key] = stages
        return self._twiddle_cache[key]

    # ---- core butterfly network --------------------------------------

    def _dit(self, x, log_n: int, inverse: bool):
        """x: (n, w)+sfx coefficient matrix in natural order -> evals in
        natural order, after one bit-reversal gather.

        Stages are fused in PAIRS (radix-4 passes): each pass reads and
        writes the whole matrix once but performs two butterfly stages in
        registers — the layers are HBM-bandwidth-bound on TPU, so halving
        the passes nearly halves DFT time (the reference's analogue is the
        multi-layer fused butterflies of `radix_2_small_batch.rs:584-845`).
        """
        F = self.F
        n = 1 << log_n
        w = x.shape[1]
        sfx = F.shape_suffix
        tws = self._twiddles(log_n, inverse)
        x = jnp.take(x, jnp.asarray(bit_reverse_indices(n)), axis=0)
        s = 0
        while s < log_n:
            m = 1 << s
            if s + 1 < log_n:
                # radix-4 pass: stages s and s+1
                x = x.reshape((n // (4 * m), 4, m, w) + sfx)
                x0, x1, x2, x3 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
                tw1 = jnp.asarray(tws[s]).reshape((1, m, 1) + sfx)
                t1 = F.mul(x1, tw1)
                t3 = F.mul(x3, tw1)
                a0, a1 = F.add(x0, t1), F.sub(x0, t1)
                a2, a3 = F.add(x2, t3), F.sub(x2, t3)
                tw2 = jnp.asarray(tws[s + 1])
                tw2a = tw2[:m].reshape((1, m, 1) + sfx)
                tw2b = tw2[m:].reshape((1, m, 1) + sfx)
                u2 = F.mul(a2, tw2a)
                u3 = F.mul(a3, tw2b)
                x = jnp.stack(
                    [F.add(a0, u2), F.add(a1, u3), F.sub(a0, u2), F.sub(a1, u3)],
                    axis=1,
                )
                s += 2
            else:
                x = x.reshape((n // (2 * m), 2, m, w) + sfx)
                e, o = x[:, 0], x[:, 1]
                t = F.mul(o, jnp.asarray(tws[s]).reshape((1, m, 1) + sfx))
                x = jnp.stack([F.add(e, t), F.sub(e, t)], axis=1)
                s += 1
        return x.reshape((n, w) + sfx)

    # ---- public API (each jitted per shape) ---------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def dft_batch(self, mat):
        """Columns are coefficients; returns evaluations over the size-n
        two-adic subgroup in natural order (ref: `traits.rs:61`)."""
        return self._dit(mat, log2_strict(mat.shape[0]), inverse=False)

    @functools.partial(jax.jit, static_argnums=0)
    def idft_batch(self, mat):
        """Evaluations -> coefficients (ref: `traits.rs:111`)."""
        F = self.F
        n = mat.shape[0]
        out = self._dit(mat, log2_strict(n), inverse=True)
        n_inv = F.from_int(pow(n, F.order - 2, F.order))
        return F.mul(out, jnp.broadcast_to(n_inv, out.shape))

    @functools.partial(jax.jit, static_argnums=0)
    def coset_dft_batch(self, mat, shift_pows):
        """Evaluate coefficient columns on shift*H (ref: `traits.rs:83`).
        shift_pows: (n,)+sfx precomputed powers of the coset shift."""
        F = self.F
        n, w = mat.shape[0], mat.shape[1]
        scaled = F.mul(mat, shift_pows.reshape((n, 1) + F.shape_suffix))
        return self._dit(scaled, log2_strict(n), inverse=False)

    def shift_powers(self, shift_int: int, n: int):
        return self.F.from_int(np_powers(shift_int, n, self.F.order))

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def coset_lde_batch(self, mat, added_bits: int, shift_int: int = 1):
        """Low-degree extension: input = evals over H (natural order), output
        = evals over shift*H' with |H'| = n << added_bits (natural order).

        Fuses iDFT + zero-pad + coset scaling + DFT into one XLA program
        (ref: `radix_2_dit_parallel.rs:169-228`; we return natural order, not
        the reference's bit-reversed view — Merkle layout handles ordering).
        """
        F = self.F
        n, w = mat.shape[0], mat.shape[1]
        big_n = n << added_bits
        coeffs = self.idft_batch(mat)
        pad = jnp.zeros((big_n - n, w) + F.shape_suffix, mat.dtype)
        coeffs = jnp.concatenate([coeffs, pad], axis=0)
        spows = F.from_int(np_powers(shift_int, big_n, F.order))
        return self.coset_dft_batch(coeffs, spows)

    @functools.partial(jax.jit, static_argnums=0)
    def coset_idft_batch(self, mat, inv_shift_pows):
        """Evals on shift*H -> coefficients: idft then scale by shift^-j."""
        F = self.F
        n = mat.shape[0]
        coeffs = self.idft_batch(mat)
        return F.mul(coeffs, inv_shift_pows.reshape((n, 1) + F.shape_suffix))


# Aliases: on TPU the reference's cache-layout variants all lower to the same
# fused program (see class docstring).
Radix2DitParallel = Radix2Dit
Radix2Bowers = Radix2Dit
Radix2DFTSmallBatch = Radix2Dit


class NaiveDft:
    """O(n^2) Vandermonde DFT for differential tests (ref: `dft/src/naive.rs`)."""

    def __init__(self, F: Field):
        self.F = F

    def _vandermonde(self, n: int, inverse: bool):
        F = self.F
        p = F.order
        g = F.two_adic_generator_int(log2_strict(n))
        if inverse:
            g = pow(g, p - 2, p)
        rows = np.outer(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
        pw = np_powers(g, 2 * n - 1, p) if n > 0 else np.ones(1, np.uint64)
        # exponents i*j mod n index into powers of g (g has order n)
        return F.from_int(pw[(rows % np.uint64(max(n, 1))).astype(np.int64)])

    def dft_batch(self, mat):
        F = self.F
        n = mat.shape[0]
        V = self._vandermonde(n, inverse=False)
        sfx = F.shape_suffix
        Vb = V.reshape((n, n, 1) + sfx)
        return F.sum(F.mul(Vb, mat.reshape((1, n) + mat.shape[1:])), axis=1)

    def idft_batch(self, mat):
        F = self.F
        n = mat.shape[0]
        V = self._vandermonde(n, inverse=True)
        sfx = F.shape_suffix
        Vb = V.reshape((n, n, 1) + sfx)
        out = F.sum(F.mul(Vb, mat.reshape((1, n) + mat.shape[1:])), axis=1)
        n_inv = F.from_int(pow(n, F.order - 2, F.order))
        return F.mul(out, jnp.broadcast_to(n_inv, out.shape))
