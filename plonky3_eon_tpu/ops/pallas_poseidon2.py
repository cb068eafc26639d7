"""Pallas TPU kernels for the Poseidon2 sponge/permutation over 31-bit fields.

The XLA scan-based permutation (hashes/poseidon2.py) materializes the whole
(batch, 16) state to HBM after every round — for Merkle leaf hashing of a
(2^21, 164) LDE that is ~21 absorbs x 28 rounds of HBM round trips and
dominates commit time. These kernels keep the state in VMEM for the entire
sponge: one read of the input slab, one write of the digests.

Layout: the state is TRANSPOSED — (16, TILE) with the batch axis on the
TPU's 128-wide lane dimension (a (TILE, 16) block would waste 7/8 lanes).
Inputs arrive as matT (L, N); callers transpose once in XLA (one fused
pass) rather than per absorb block in-kernel.

All arithmetic is branchless uint32 Montgomery exactly as
`fields/monty31.py` (same min(t, t-P) trick as the reference's AVX kernels,
`field/src/packed/x86_64_avx.rs:10-31`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = np.uint32(0xFFFF)


def _mod_ops(P_u32, MU_u32):
    P = np.uint32(P_u32)
    MU = np.uint32(MU_u32)

    def mulhi(a, b):
        a0 = a & MASK16
        a1 = a >> 16
        b0 = b & MASK16
        b1 = b >> 16
        lo = a0 * b0
        m1 = a1 * b0 + (lo >> 16)
        m2 = a0 * b1 + (m1 & MASK16)
        return a1 * b1 + (m1 >> 16) + (m2 >> 16)

    def mm(a, b):
        lo = a * b
        hi = mulhi(a, b)
        q = lo * MU
        u = mulhi(q, P)
        t = hi + u + (lo != 0).astype(jnp.uint32)
        return jnp.where(t >= P, t - P, t)

    def ma(a, b):
        s = a + b
        return jnp.where(s >= P, s - P, s)

    return mm, ma


def _sbox_fn(mm, d: int):
    if d == 3:
        return lambda x: mm(mm(x, x), x)
    if d == 5:
        def s5(x):
            x2 = mm(x, x)
            return mm(mm(x2, x2), x)
        return s5
    if d == 7:
        def s7(x):
            x2 = mm(x, x)
            x3 = mm(x2, x)
            return mm(mm(x3, x3), x)
        return s7
    raise ValueError(f"unsupported sbox degree {d}")


def _permute_body(p2, mm, ma, st_rows: list) -> list:
    """One full Poseidon2 permutation on a list of W (rows, T) lane arrays.
    Mirrors hashes/poseidon2.py exactly (ext layer + scan bodies unrolled;
    round constants are baked in as scalar uint32 constants)."""
    W = p2.width
    d = p2.d
    sbox = _sbox_fn(mm, d)
    ext_c = np.asarray(p2.ext_consts_np, dtype=np.uint32)  # (rounds_f, W) Monty
    int_c = np.asarray(p2.int_consts_np, dtype=np.uint32)  # (rounds_p,)
    diag = np.asarray(p2.diag_np, dtype=np.uint32)  # (W,)
    half_f = p2.rounds_f // 2

    def ext_layer(x):
        out = []
        for c in range(0, W, 4):
            x0, x1, x2, x3 = x[c : c + 4]
            if p2.hl_mat4:
                t0 = ma(x0, x1)
                t1 = ma(x2, x3)
                t2 = ma(ma(x1, x1), t1)
                t3 = ma(ma(x3, x3), t0)
                t4 = ma(ma(ma(t1, t1), ma(t1, t1)), t3)
                t5 = ma(ma(ma(t0, t0), ma(t0, t0)), t2)
                out += [ma(t3, t5), t5, ma(t2, t4), t4]
            else:
                t01 = ma(x0, x1)
                t23 = ma(x2, x3)
                t0123 = ma(t01, t23)
                t01123 = ma(t0123, x1)
                t01233 = ma(t0123, x3)
                out += [
                    ma(t01123, t01),
                    ma(t01123, ma(x2, x2)),
                    ma(t01233, t23),
                    ma(t01233, ma(x0, x0)),
                ]
        sums = []
        for j in range(4):
            s = out[j]
            for c in range(4 + j, W, 4):
                s = ma(s, out[c])
            sums.append(s)
        return [ma(out[i], sums[i % 4]) for i in range(W)]

    def ext_round(x, r):
        x = [sbox(ma(x[i], np.uint32(ext_c[r, i]))) for i in range(W)]
        return ext_layer(x)

    def int_round(x, r):
        x = list(x)
        x[0] = sbox(ma(x[0], np.uint32(int_c[r])))
        s = x[0]
        for i in range(1, W):
            s = ma(s, x[i])
        return [ma(mm(x[i], np.uint32(diag[i])), s) for i in range(W)]

    st = ext_layer(st_rows)
    for r in range(half_f):
        st = ext_round(st, r)
    for r in range(p2.rounds_p):
        st = int_round(st, r)
    for r in range(half_f, p2.rounds_f):
        st = ext_round(st, r)
    return st


def _make_sponge_kernel(p2, L: int, rate: int, out_n: int, tile: int):
    W = p2.width
    F = p2.F
    mm, ma = _mod_ops(F.P_int, F.MU_int)
    n_full, rem = divmod(L, rate)

    def kernel(mat_ref, out_ref):
        # mat_ref: (L, tile); out_ref: (out_n, tile)
        st0 = tuple(jnp.zeros((1, tile), jnp.uint32) for _ in range(W))

        # fori_loop over full-rate absorb blocks: the compiled program holds
        # ONE permutation body (28 unrolled rounds), not absorb_count of them
        def absorb(blk, st):
            st = list(st)
            base = blk * rate
            for j in range(rate):
                st[j] = mat_ref[pl.ds(base + j, 1), :]
            return tuple(_permute_body(p2, mm, ma, st))

        st = jax.lax.fori_loop(0, n_full, absorb, st0)
        if rem:
            st = list(st)
            for j in range(rem):
                k = n_full * rate + j
                st[j] = mat_ref[k : k + 1, :]
            st = _permute_body(p2, mm, ma, st)
        for j in range(out_n):
            out_ref[j : j + 1, :] = st[j]

    return kernel


@functools.lru_cache(maxsize=None)
def _sponge_call(p2, L: int, rate: int, out_n: int, n: int, tile: int):
    kernel = _make_sponge_kernel(p2, L, rate, out_n, tile)
    grid = (n // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_n, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (out_n, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or "TPU" in (
            jax.devices()[0].device_kind or ""
        )
    except Exception:
        return False


def sponge_hash_T(p2, matT, rate: int, out_n: int, tile: int = 512):
    """Padding-free sponge over columns: matT (L, N) -> (out_n, N).

    The entire sponge (all absorb blocks + permutations) runs in VMEM.
    Requires N % tile == 0 (callers fall back to the XLA scan otherwise).
    """
    L, n = int(matT.shape[0]), int(matT.shape[1])
    return _sponge_call(p2, L, rate, out_n, n, tile)(matT)


@functools.lru_cache(maxsize=None)
def _permute_call(p2, n: int, tile: int):
    W = p2.width
    F = p2.F
    mm, ma = _mod_ops(F.P_int, F.MU_int)

    def kernel(in_ref, out_ref):
        st = [in_ref[j : j + 1, :] for j in range(W)]
        st = _permute_body(p2, mm, ma, st)
        for j in range(W):
            out_ref[j : j + 1, :] = st[j]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((W, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (W, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )


def permute_T(p2, stT, tile: int = 512):
    """Batched permutation on a transposed state slab (W, N) -> (W, N)."""
    W, n = int(stT.shape[0]), int(stT.shape[1])
    assert W == p2.width
    return _permute_call(p2, n, tile)(stT)
