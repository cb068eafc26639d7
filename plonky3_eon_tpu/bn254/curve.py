"""Device-side batched BN254 G1 arithmetic + multi-scalar multiplication.

Reference parity: `bn254/src/curve.rs:74-269` (`G1` add/double/scalar-mul,
`G1::multi_exp` -> halo2curves Pippenger `msm_best`).

TPU-native design: points are (..., 3, 16) projective (X:Y:Z) coordinate
arrays over the 16-digit Fp limbs of `fields/bigfield.py`. Addition uses the
COMPLETE projective formulas for j-invariant-0 curves (Renes-Costello-Batina
2016, Algorithm 7): one branchless 12M formula handles generic addition,
doubling, and the identity (0:1:0) uniformly — exactly what batched lanes
and `lax.scan` need (halo2curves branches per point; a TPU lane cannot).
The MSM runs as a scan over the 254 scalar bits with lane-parallel
conditional accumulation, then a log-depth tree reduction across points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bigfield import Bn254Fp as Fp, Bn254Fr as Fr, NUM_DIGITS, _to_digits
from . import pairing as host

# 3*b = 9 in Montgomery digit form — a host numpy constant (safe to close
# over inside jit traces, unlike a device array built mid-trace)
_B3 = _to_digits(9 * Fp.R_int % Fp.order)


def _b3():
    return jnp.asarray(_B3)


def g1_identity(shape=()):
    """(0 : 1 : 0)."""
    z = jnp.zeros(tuple(shape) + (3, NUM_DIGITS), jnp.uint32)
    one = Fp.ones(tuple(shape))
    return z.at[..., 1, :].set(one)


def g1_add(p, q):
    """Complete projective addition (RCB16 Alg. 7, a=0, b3=9).
    p, q: (..., 3, 16) -> (..., 3, 16)."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    b3 = jnp.broadcast_to(_b3(), X1.shape)
    mul, add, sub = Fp.mul, Fp.add, Fp.sub
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = sub(sub(mul(add(Y1, Z1), add(Y2, Z2)), t1), t2)
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(sub(X3, t0), t2)  # X1Z2 + X2Z1
    X3 = add(t0, t0)
    t0 = add(X3, t0)  # 3 X1X2
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return jnp.stack([X3, Y3, Z3], axis=-2)


g1_add_jit = jax.jit(g1_add)


def g1_double(p):
    return g1_add(p, p)


# ---- host <-> device -------------------------------------------------------


def points_from_affine_ints(pts) -> jnp.ndarray:
    """[(x, y) | None, ...] host ints -> (N, 3, 16) projective device array."""
    n = len(pts)
    xs = np.zeros(n, dtype=object)
    ys = np.zeros(n, dtype=object)
    zs = np.zeros(n, dtype=object)
    for i, pt in enumerate(pts):
        if pt is None:
            xs[i], ys[i], zs[i] = 0, 1, 0
        else:
            xs[i], ys[i], zs[i] = int(pt[0]), int(pt[1]), 1
    return jnp.stack(
        [Fp.from_int(xs), Fp.from_int(ys), Fp.from_int(zs)], axis=-2
    )


def points_to_affine_ints(p) -> list:
    """(..., 3, 16) -> [(x, y) | None] host ints."""
    arr = np.asarray(p).reshape(-1, 3, NUM_DIGITS)
    xs = Fp.to_ints(arr[:, 0])
    ys = Fp.to_ints(arr[:, 1])
    zs = Fp.to_ints(arr[:, 2])
    out = []
    for x, y, z in zip(xs.reshape(-1), ys.reshape(-1), zs.reshape(-1)):
        if int(z) == 0:
            out.append(None)
        else:
            zi = pow(int(z), -1, Fp.order)
            out.append((int(x) * zi % Fp.order, int(y) * zi % Fp.order))
    return out


# ---- MSM --------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=())
def _msm_scan(points, bits):
    """points: (N, 3, 16); bits: (254, N) uint32 MSB-first.
    Per-lane double-and-add under lax.scan, then tree-reduce across N."""
    n = points.shape[0]
    acc0 = g1_identity((n,))

    def step(acc, bit_row):
        acc = g1_add(acc, acc)
        added = g1_add(acc, points)
        sel = bit_row[:, None, None].astype(jnp.uint32)
        acc = jnp.where(sel != 0, added, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, bits)
    # tree reduction across the point axis
    m = acc.shape[0]
    while m > 1:
        half = m // 2
        lo, hi = acc[:half], acc[half : 2 * half]
        red = g1_add(lo, hi)
        if m % 2:
            red = jnp.concatenate([red, acc[2 * half : m]], axis=0)
            m = half + 1
        else:
            m = half
        acc = red
    return acc[0]


def _scalars_to_ints(scalars):
    if hasattr(scalars, "shape") and not isinstance(scalars, (list, tuple, np.ndarray)):
        scalars = Fr.to_ints(scalars)
    return [int(s) % Fr.order for s in np.asarray(scalars, dtype=object).reshape(-1)]


# ---- Pippenger (windowed-bucket) MSM ---------------------------------------
#
# TPU formulation of halo2curves `msm_best` (ref: `curve.rs:158` ->
# Pippenger bucket method), per SURVEY.md hard-part 3 "sort-by-window +
# segment-sum":
#   per window w (c bits):  digit_i = (s_i >> wc) & (2^c - 1)
#     1. argsort points by digit -> equal digits contiguous
#     2. SEGMENTED inclusive scan with the elliptic add as the (associative)
#        combiner (`lax.associative_scan`, work-efficient ~2N adds, depth
#        ~2 log N) -> each segment end holds its bucket sum
#     3. scatter segment ends into the (2^c,) bucket array
#     4. window_sum = sum_j j*B_j via suffix scan over buckets + tree-sum
#   combine: result = sum_w 2^{wc} * window_sum_w (c doublings per window).
# Work ~ nwin*(2N + 3*2^c) elliptic adds vs. the old double-and-add scan's
# 508N — ~14x fewer at N=2^20, c=16, and every add stays lane-parallel.


def _tree_sum(pts, add=None):
    """Group sum over axis 0 of (m, ...), log-depth."""
    add = add or g1_add
    m = pts.shape[0]
    while m > 1:
        half = m // 2
        red = add(pts[:half], pts[half : 2 * half])
        if m % 2:
            red = jnp.concatenate([red, pts[2 * half : m]], axis=0)
            m = half + 1
        else:
            m = half
        pts = red
    return pts[0]


def _hs_segmented_scan(vals, seg_start, add, fmask):
    """Segmented inclusive scan (Hillis-Steele) along axis 0; segment ends
    hold their segment sums. ONE `add` instance in the program."""
    n = vals.shape[0]
    if n == 1:
        return vals
    logn = (n - 1).bit_length()
    iota = jnp.arange(n, dtype=jnp.int32)

    def step(j, carry):
        v, f = carry
        off = jnp.left_shift(jnp.int32(1), j)
        idx = jnp.maximum(iota - off, 0)
        in_range = iota >= off
        prev_v = v[idx]
        prev_f = jnp.where(in_range, f[idx], True)
        do_add = (~f) & in_range
        v2 = jnp.where(fmask(do_add), add(prev_v, v), v)
        return v2, f | prev_f

    v, _ = jax.lax.fori_loop(0, logn, step, (vals, seg_start.astype(bool)))
    return v


# ---- work-efficient blocked scans (VERDICT r4 item 1b) ---------------------
#
# The pure Hillis-Steele scans above run ONE add instance but do ~log N
# times the work, and every add runs at full-array lane width, where the
# CIOS inner-scan carry ((s+2, N) u32 ~ 18 MB at N=2^18) no longer fits
# VMEM — every H-S step thrashes HBM. The blocked formulation reshapes the
# array into (nblk lanes) x (blk steps), runs a SEQUENTIAL lax.scan over
# the blk axis (work-efficient: one add per element, and at ~4k-lane width
# the CIOS carry stays on-chip), then resolves cross-block carries with a
# small H-S pass over the nblk block tails. Still O(1) add instances per
# scan, so compile size stays flat.


def _blocked_scan_params(n: int):
    """(blk, nblk): blk sequential steps x nblk parallel lanes, both
    powers-of-two-ish with nblk*blk >= n. Targets ~4k lanes (enough to
    saturate the VPU while keeping CIOS scan carries in VMEM), capping
    sequential depth at 64."""
    blk = max(1, min(64, n // 4096))
    blk = 1 << (blk.bit_length() - 1)
    nblk = -(-n // blk)
    return blk, nblk


def _pad_to(vals, total, identity):
    pad = total - vals.shape[0]
    if pad:
        vals = jnp.concatenate([vals, identity((pad,))], axis=0)
    return vals


def _blocked_segmented_scan_parts(vals, seg_start, add, identity, fmask):
    """Work-efficient segmented inclusive scan along axis 0.

    Returns (scanned, carry_in, open, blk) WITHOUT applying cross-block
    carries: `scanned` (padded flat) holds the within-block inclusive
    segmented scan, `carry_in[b]` is the group element owed to block b's
    leading open run, and `open[i]` marks elements whose segment began in
    an earlier block. Callers that only consume a few positions (the
    bucket fill) apply the carry at those positions only — the full-array
    fix-up would cost another n adds."""
    n = vals.shape[0]
    blk, nblk = _blocked_scan_params(n)
    total = nblk * blk
    vals = _pad_to(vals, total, identity)
    seg_start = seg_start.astype(bool)
    if total > n:
        # padded elements each start their own (discarded) segment
        seg_start = jnp.concatenate(
            [seg_start, jnp.ones((total - n,), bool)]
        )
    feat_shape = vals.shape[1:]
    f = seg_start.reshape(nblk, blk)
    v = vals.reshape((nblk, blk) + feat_shape)

    def step(carry, xs):
        x, start = xs
        acc = jnp.where(fmask(start), x, add(carry, x))
        return acc, acc

    _, ys = jax.lax.scan(
        step, identity((nblk,)), (jnp.moveaxis(v, 1, 0), f.T)
    )
    scanned = jnp.moveaxis(ys, 0, 1)  # (nblk, blk, ...)
    tails = scanned[:, -1]
    has_start = f.any(axis=1)
    # I[b] = tails[b] if has_start[b] else I[b-1] + tails[b]  — an
    # inclusive segmented scan over block tails
    I = _hs_segmented_scan(tails, has_start, add, fmask)
    carry_in = jnp.concatenate([identity((1,)), I[:-1]], axis=0)
    open_ = jnp.cumsum(f.astype(jnp.int32), axis=1) == 0
    return (
        scanned.reshape((total,) + feat_shape),
        carry_in,
        open_.reshape(total),
        blk,
    )


def _blocked_suffix_scan(vals, add, identity, fmask):
    """Work-efficient (unsegmented) suffix inclusive scan along axis 0."""
    n = vals.shape[0]
    rev = jnp.flip(vals, 0)
    blk, nblk = _blocked_scan_params(n)
    total = nblk * blk
    rev = _pad_to(rev, total, identity)
    feat_shape = rev.shape[1:]
    v = rev.reshape((nblk, blk) + feat_shape)

    def step(carry, x):
        acc = add(carry, x)
        return acc, acc

    _, ys = jax.lax.scan(step, identity((nblk,)), jnp.moveaxis(v, 1, 0))
    scanned = jnp.moveaxis(ys, 0, 1)
    tails = scanned[:, -1]
    I = _hs_segmented_scan(tails, jnp.zeros((nblk,), bool), add, fmask)
    excl = jnp.concatenate([identity((1,)), I[:-1]], axis=0)
    fixed = add(jnp.broadcast_to(excl[:, None], scanned.shape), scanned)
    # block 0 has no incoming carry; adding identity is exact for a group
    # add, so no mask is needed
    out = fixed.reshape((total,) + feat_shape)[:n]
    return jnp.flip(out, 0)


def _blocked_total(vals, add, identity, fmask):
    """Group sum over axis 0, work-efficient, O(1) add instances."""
    n = vals.shape[0]
    blk, nblk = _blocked_scan_params(n)
    total = nblk * blk
    vals = _pad_to(vals, total, identity)
    v = vals.reshape((nblk, blk) + vals.shape[1:])

    def step(carry, x):
        return add(carry, x), None

    tails, _ = jax.lax.scan(step, identity((nblk,)), jnp.moveaxis(v, 1, 0))
    I = _hs_segmented_scan(tails, jnp.zeros((nblk,), bool), add, fmask)
    return I[-1]


def _msm_window_sums(points, digits, c, add, identity):
    """Group-generic Pippenger window machinery: points (N, ...feature),
    digits (nwin, N) uint32 (window 0 = least significant), `add` a batched
    associative group op, `identity(shape)` its identity constructor.
    Returns (nwin, ...feature) per-window bucket-weighted sums.
    Parameterized so the sort/segment-scan/bucket-fill/suffix logic is
    unit-testable on CPU under a cheap mock group (the BN254 instantiation
    is compile-bound off-TPU; VERDICT r3 item 4).

    Compile-lean formulation: every reduction is a blocked scan (O(1)
    inlined group-adds each, work-efficient — see _blocked_scan_params)
    and the bucket fill is searchsorted+gather, NOT a scatter — measured
    pathologies on hardware: a 2^20-update scatter ran >30 min, the
    associative_scan version spent ~40 min in XLA compile at 2^15, and
    the round-4 pure Hillis-Steele version burned ~log N extra work with
    every add at full-array width (CIOS carries spilling to HBM)."""
    nbuckets = 1 << c
    feat = points.ndim - 1  # trailing feature dims of one group element

    def fmask(flags):
        return flags.reshape(flags.shape + (1,) * feat)

    def one_window(digits_w):
        order = jnp.argsort(digits_w)
        d = digits_w[order]
        pts = points[order]
        seg_start = jnp.concatenate([jnp.ones(1, bool), d[1:] != d[:-1]])
        scanned, carry_in, open_, blk = _blocked_segmented_scan_parts(
            pts, seg_start, add, identity, fmask
        )
        # digits are sorted, so bucket j's segment end sits at
        # searchsorted(d, j, 'right')-1 — one binary search + one gather;
        # cross-block carries are applied at the gathered positions only
        targets = jnp.arange(1, nbuckets, dtype=d.dtype)
        pos = jnp.clip(jnp.searchsorted(d, targets, side="right") - 1,
                       0, d.shape[0] - 1)
        hit = d[pos] == targets
        vals_pos = scanned[pos]
        carr = carry_in[pos // blk]
        vals_pos = jnp.where(fmask(open_[pos]), add(carr, vals_pos), vals_pos)
        buckets = jnp.where(fmask(hit), vals_pos, identity((nbuckets - 1,)))
        # sum_j j*B_j = sum_k S_k with S_k = sum_{j>=k} B_j: one suffix
        # scan for the S_k, then one total
        suffix = _blocked_suffix_scan(buckets, add, identity, fmask)
        return _blocked_total(suffix, add, identity, fmask)

    return jax.lax.map(one_window, digits)  # (nwin, ...feature)


def _msm_combine_windows(window_sums, c, add, identity):
    """result = sum_w 2^{wc} * window_sum_w (c doublings per window)."""

    def step(acc, wsum):
        acc = jax.lax.fori_loop(0, c, lambda j, a: add(a, a), acc)
        return add(acc, wsum), None

    acc, _ = jax.lax.scan(step, identity(()), window_sums[::-1])
    return acc


def _msm_pippenger_core(points, digits, c, add, identity):
    """Full group-generic Pippenger: window sums + doubling combine."""
    return _msm_combine_windows(
        _msm_window_sums(points, digits, c, add, identity), c, add, identity
    )


def msm_pippenger_sharded(points, digits, c, mesh, axis_name="chip",
                          add=None, identity=None):
    """Mesh-sharded Pippenger MSM: windows are embarrassingly parallel, so
    the window axis is sharded over `axis_name` — each chip sorts/scans its
    own windows against replicated points, and only the (nwin, point-sized)
    window sums are gathered for the doubling combine (north-star axis /
    VERDICT r4 item 1c: "points/buckets partitioned across chips").

    Group-generic like `_msm_pippenger_core` so correctness is testable on
    a CPU mesh under a mock group (BN254 compiles impractically slowly off
    TPU). digits: (nwin, N) uint32, window 0 least significant."""
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    add = add or g1_add
    identity = identity or g1_identity
    ndev = mesh.shape[axis_name]
    nwin = digits.shape[0]
    pad = (-nwin) % ndev
    if pad:
        # zero digits -> every bucket empty -> identity window sums
        digits = jnp.concatenate(
            [digits, jnp.zeros((pad,) + digits.shape[1:], digits.dtype)]
        )

    # check_vma=False: the group-generic scan bodies mix replicated
    # identity constants into device-varying carries, which the varying-
    # manual-axis checker rejects; the computation is per-window pure.
    @_ft.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis_name)), out_specs=P(axis_name),
        check_vma=False,
    )
    def shard_fn(pts, dg):
        return _msm_window_sums(pts, dg, c, add, identity)

    ws = shard_fn(points, digits)
    return _msm_combine_windows(ws[:nwin], c, add, identity)


@functools.partial(jax.jit, static_argnums=(2,))
def _msm_pippenger(points, digits, c):
    """points: (N, 3, 16); digits: (nwin, N) uint32, window 0 = least
    significant. Returns one (3, 16) projective point."""
    return _msm_pippenger_core(points, digits, c, g1_add, g1_identity)


def _ints_to_digit_rows(ints, c: int) -> np.ndarray:
    """Canonical scalar ints -> (nwin, N) uint32 window digits, LSB window
    first — fully vectorized (no per-(scalar, window) Python loop; the old
    double loop was 16M iterations at 2^20, VERDICT r3 weak-3)."""
    n = len(ints)
    nbits = Fr.order.bit_length()  # 254
    nwin = (nbits + c - 1) // c
    buf = b"".join(int(s).to_bytes(32, "little") for s in ints)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(n, 32)
    if c == 8:
        return np.ascontiguousarray(by.T[:nwin]).astype(np.uint32)
    if c == 16:
        return np.ascontiguousarray(by.view("<u2").T[:nwin]).astype(np.uint32)
    bits = np.unpackbits(by, axis=1, bitorder="little")  # (n, 256)
    if bits.shape[1] < nwin * c:
        bits = np.pad(bits, ((0, 0), (0, nwin * c - bits.shape[1])))
    bits = bits[:, : nwin * c].reshape(n, nwin, c)
    weights = (1 << np.arange(c, dtype=np.uint32)).astype(np.uint32)
    return np.ascontiguousarray((bits.astype(np.uint32) @ weights).T)


def msm(points, scalars, window_bits: int | None = None) -> jnp.ndarray:
    """sum_i scalars_i * points_i (ref: `G1::multi_exp`, `curve.rs:158` ->
    halo2curves Pippenger `msm_best`).

    points: (N, 3, 16) device array; scalars: an Fr device array
    (Montgomery form, digit-decoded on device) or an iterable of ints.
    Returns one (3, 16) projective point."""
    if isinstance(scalars, jnp.ndarray) and scalars.dtype == jnp.uint32:
        # device Montgomery Fr scalars: decode windows on device
        from ..kzg import msm_monty

        return msm_monty(points, scalars.reshape(-1, NUM_DIGITS))
    ints = _scalars_to_ints(scalars)
    n = len(ints)
    if window_bits is None:
        # Pippenger sweet spot ~log2 N; cap so the bucket stage (3*2^c adds)
        # stays below the scan stage (2N adds)
        window_bits = max(2, min(16, n.bit_length() - 1))
    c = window_bits
    return _msm_pippenger(points, jnp.asarray(_ints_to_digit_rows(ints, c)), c)


def msm_scan(points, scalars) -> jnp.ndarray:
    """Reference double-and-add MSM (kept as a differential-test oracle for
    the Pippenger path)."""
    ints = _scalars_to_ints(scalars)
    nbits = Fr.order.bit_length()
    n = len(ints)
    bits = np.zeros((nbits, n), dtype=np.uint32)
    for i, s in enumerate(ints):
        for j in range(nbits):
            bits[j, i] = (s >> (nbits - 1 - j)) & 1
    return _msm_scan(points, jnp.asarray(bits))


def g1_scalar_mul(point, k: int):
    """Single-point scalar mul via the batched path."""
    return msm(point[None], [k])


# ---- fixed-base batch scalar multiplication --------------------------------
#
# [s_i]G for one shared base G and many scalars — the SRS-generation shape
# (`kzg/src/params.rs:123` `init_srs_unsafe` computes [tau^i]G1 in a serial
# host loop; at 2^20 that is a million 254-bit ladders). TPU formulation:
# precompute per-window tables T_w[d] = [d * 2^{cw}]G with ONE prefix
# associative_scan per window, then every scalar is nwin table gathers +
# a log-depth tree sum — no per-scalar ladder anywhere.


@functools.partial(jax.jit, static_argnums=(1,))
def _fixed_base_table(bases, c: int):
    """bases: (nwin, 3, 16) window base points [2^{cw}]G ->
    (nwin, 2^c, 3, 16) tables T_w[d] = d * bases_w — a prefix scan as a
    Hillis-Steele fori_loop (ONE inlined g1_add; the associative_scan
    version took ~11 min of XLA compile at c=8)."""
    nwin = bases.shape[0]
    nb = 1 << c
    rep = jnp.broadcast_to(bases[:, None], (nwin, nb, 3, NUM_DIGITS))
    seq = jnp.concatenate([g1_identity((nwin, 1)), rep[:, 1:]], axis=1)
    ident_row = g1_identity((nb,))
    iota = jnp.arange(nb, dtype=jnp.int32)

    def prefix(v):
        def step(j, vv):
            off = jnp.left_shift(jnp.int32(1), j)
            idx = jnp.maximum(iota - off, 0)
            prev = jnp.where((iota >= off)[:, None, None], vv[idx], ident_row)
            return g1_add(vv, prev)

        return jax.lax.fori_loop(0, c, step, v)

    return jax.vmap(prefix)(seq)


@functools.partial(jax.jit, static_argnums=(2,))
def _fixed_base_eval(table, digits, chunk: int):
    """table: (nwin, 2^c, 3, 16); digits: (nwin, N) uint32 ->
    (N, 3, 16) points [s_i]G, lax.map-chunked over scalars to bound the
    gathered working set."""
    nwin, n = digits.shape
    nch = -(-n // chunk)
    pad = nch * chunk - n
    if pad:
        digits = jnp.concatenate(
            [digits, jnp.zeros((nwin, pad), digits.dtype)], axis=1
        )
    dig = digits.reshape(nwin, nch, chunk).transpose(1, 0, 2)  # (nch, nwin, chunk)

    def body(dg):
        pts = jax.vmap(lambda t, d: t[d])(table, dg)  # (nwin, chunk, 3, 16)
        return _tree_sum(pts)  # (chunk, 3, 16)

    out = jax.lax.map(body, dig).reshape(nch * chunk, 3, NUM_DIGITS)
    return out[:n]


def g1_fixed_base_msm(base_affine, scalars_ints, c: int = 8,
                      chunk: int = 1 << 14) -> jnp.ndarray:
    """[s_i] * base for a host affine point and canonical scalar ints.
    Returns (N, 3, 16) projective device points.

    c=8 default: the table prefix-scan compiles ~2x faster than c=16
    (every inlined g1_add is ~12 CIOS scan bodies; compile time, not run
    time, dominates the one-off table build) while the eval stage stays
    a few tens of millions of lane-parallel adds at 2^20 scalars."""
    nbits = Fr.order.bit_length()
    nwin = (nbits + c - 1) // c
    bases = []
    cur = base_affine
    for w in range(nwin):
        bases.append(cur)
        if w + 1 < nwin:
            cur = host.g1_mul(cur, 1 << c)
    table = _fixed_base_table(points_from_affine_ints(bases), c)
    digits = jnp.asarray(_ints_to_digit_rows(scalars_ints, c))
    return _fixed_base_eval(table, digits, chunk)
