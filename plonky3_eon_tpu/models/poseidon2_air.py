"""Poseidon2 AIR: one permutation per row (reference parity:
`poseidon2-air/src/air.rs:19,108,188-253`, `columns.rs:12,62`,
`generation.rs:76,134`, `vectorized.rs:136`).

TPU-native column design: only the NONLINEAR values (S-box registers) are
witness columns — every linear-layer output stays a degree-1 expression DAG
over those columns, shared via Python object identity exactly like the
reference's `GenericPoseidon2LinearLayers` reuse (`poseidon2/src/generic.rs:32`).
S-boxes split to keep constraint degree <= 3:
    d=3: one register r = x^3;
    d=5: r1 = x^3, r2 = r1 * x * x;
    d=7: r1 = x^3, r2 = r1 * r1 * x.
Column count (width 16): 16 + Rf*16*R + Rp*R (298 for BabyBear d=7,
164 for KoalaBear d=3). Witness generation is one jitted program — the
permutation re-run with register taps, batched over all rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..air import BaseAir
from ..hashes.poseidon2 import Poseidon2


def _sbox_registers(d: int) -> int:
    return {3: 1, 5: 2, 7: 2}[d]


def _air_external_layer(state, hl: bool):
    """External MDS-light layer on expressions (add/double only)."""
    w = len(state)
    if w == 2:
        s = state[0] + state[1]
        return [state[0] + s, state[1] + s]
    if w == 3:
        s = state[0] + state[1] + state[2]
        return [x + s for x in state]
    out = []
    for c in range(0, w, 4):
        x0, x1, x2, x3 = state[c : c + 4]
        if hl:
            t0 = x0 + x1
            t1 = x2 + x3
            t2 = x1 + x1 + t1
            t3 = x3 + x3 + t0
            t4 = t1.double().double() + t3
            t5 = t0.double().double() + t2
            out += [t3 + t5, t5, t2 + t4, t4]
        else:
            t01 = x0 + x1
            t23 = x2 + x3
            t0123 = t01 + t23
            t01123 = t0123 + x1
            t01233 = t0123 + x3
            out += [t01123 + t01, t01123 + x2.double(), t01233 + t23, t01233 + x0.double()]
    sums = []
    for j in range(4):
        s = out[j]
        for c in range(4 + j, w, 4):
            s = s + out[c]
        sums.append(s)
    return [out[i] + sums[i % 4] for i in range(w)]


def _air_internal_layer(state, diag_ints):
    s = state[0]
    for x in state[1:]:
        s = s + x
    return [x * int(diag_ints[i]) + s for i, x in enumerate(state)]


class Poseidon2Air(BaseAir):
    """AIR proving a batch of Poseidon2 permutations (one per row)."""

    def __init__(self, p2: Poseidon2):
        self.p2 = p2
        self.W = p2.width
        self.R = _sbox_registers(p2.d)
        num_sboxes = p2.rounds_f * self.W + p2.rounds_p
        self.width = self.W + num_sboxes * self.R

    # ---- sbox gadget --------------------------------------------------

    def _sbox(self, b, x, cols):
        """Constrain registers in `cols` to compute x^d; return output expr."""
        d = self.p2.d
        if d == 3:
            (r,) = cols
            b.assert_eq(r, x * x * x)
            return r
        if d == 5:
            r1, r2 = cols
            b.assert_eq(r1, x * x * x)
            b.assert_eq(r2, r1 * x * x)
            return r2
        if d == 7:
            r1, r2 = cols
            b.assert_eq(r1, x * x * x)
            b.assert_eq(r2, r1 * r1 * x)
            return r2
        raise ValueError(f"unsupported sbox degree {d}")

    def eval(self, b):
        """Tensor-block constraint evaluation (width % 4 == 0), falling back
        to the per-lane scalar path otherwise.

        Because every S-box output is a witness REGISTER, round residuals do
        not chain: all external-round constraints of a half are ONE
        (half_f-1, G)-shaped block assert per lane-position/register — the
        folded quotient program is ~1k HLO ops instead of ~120k from 2664
        unrolled scalar constraints (round-3 profiling: the unrolled fold
        took 21s to lower and 47s to compile per process)."""
        if self.W % 4 == 0:
            return self._eval_blocks(b)
        return self._eval_scalar(b)

    def _eval_blocks(self, b):
        p2, W, R = self.p2, self.W, self.R
        G = W // 4
        d = p2.d
        half_f = p2.rounds_f // 2
        rp = p2.rounds_p
        ext_c = np.asarray(p2.ext_consts_int, dtype=np.uint64)  # (rounds_f, W)
        int_c = np.asarray(p2.int_consts_int, dtype=np.uint64)  # (rounds_p,)
        off_a = W
        off_b = W + half_f * W * R
        off_c = off_b + rp * R

        def lanes(i):
            return np.arange(G) * 4 + i

        def grouped_regs(block, K, i, comp):
            """(K, W, R) register block -> (K, G) grouped view."""
            flat = ((np.arange(K)[:, None] * W + lanes(i)[None, :]) * R + comp)
            return block.gather(flat.reshape(-1), (K, G))

        def m4(xs):
            x0, x1, x2, x3 = xs
            if p2.hl_mat4:
                t0 = x0 + x1
                t1 = x2 + x3
                t2 = x1.double() + t1
                t3 = x3.double() + t0
                t4 = t1.double().double() + t3
                t5 = t0.double().double() + t2
                return [t3 + t5, t5, t2 + t4, t4]
            t01 = x0 + x1
            t23 = x2 + x3
            t0123 = t01 + t23
            t01123 = t0123 + x1
            t01233 = t0123 + x3
            return [t01123 + t01, t01123 + x2.double(), t01233 + t23,
                    t01233 + x0.double()]

        def ext_layer_g(xs, lead_shape):
            """xs: 4 Exprs (*lead, G) -> 4 Exprs, with the cross-group sum."""
            out = m4(xs)
            k = len(lead_shape)
            return [
                o + o.sum_block(k).reshape_block(tuple(lead_shape) + (1,))
                for o in out
            ]

        def sbox_assert(x, regs):
            """x, regs[c]: same-shape Exprs; assert regs compute x^d."""
            if d == 3:
                b.assert_eq_block(regs[0], x * x * x)
                return regs[0]
            if d == 5:
                b.assert_eq_block(regs[0], x * x * x)
                b.assert_eq_block(regs[1], regs[0] * x * x)
                return regs[1]
            b.assert_eq_block(regs[0], x * x * x)
            b.assert_eq_block(regs[1], regs[0] * regs[0] * x)
            return regs[1]

        def ext_half_blocks(reg_block, first_in_groups, rc_rows):
            """One external half: round 0 from `first_in_groups`, rounds
            1..half_f-1 from the previous round's registers (parallel).
            Returns the half's LAST round outputs as W scalar Exprs."""
            K = half_f
            # round 0 (lead = ())
            for i in range(4):
                x = first_in_groups[i] + b.constant_array(rc_rows[0][lanes(i)])
                regs = [grouped_regs(reg_block, K, i, c).gather(
                    np.arange(G), (G,)) for c in range(R)]
                # row 0 of the (K, G) grouped view
                sbox_assert(x, regs)
            if K > 1:
                # rounds 1..K-1 (lead = (K-1,))
                prev_out = [grouped_regs(reg_block, K, i, R - 1) for i in range(4)]
                prev = [p.gather(
                    (np.arange(K - 1)[:, None] * G + np.arange(G)[None, :]).reshape(-1),
                    (K - 1, G)) for p in prev_out]
                ins = ext_layer_g(prev, (K - 1,))
                for i in range(4):
                    x = ins[i] + b.constant_array(rc_rows[1:, lanes(i)])
                    regs = []
                    for c in range(R):
                        g = grouped_regs(reg_block, K, i, c)
                        regs.append(g.gather(
                            ((np.arange(K - 1) + 1)[:, None] * G
                             + np.arange(G)[None, :]).reshape(-1),
                            (K - 1, G)))
                    sbox_assert(x, regs)
            # last round's outputs as W scalars
            base = (K - 1) * W * R
            return [reg_block.gather([base + l * R + (R - 1)], ()) for l in range(W)]

        def ext_layer_scalar(state):
            return _air_external_layer(state, p2.hl_mat4)

        # ---- first external half ----------------------------------------
        in_state = b.main_block(0, (W,))
        in_groups = [in_state.gather(lanes(i), (G,)) for i in range(4)]
        in_groups = ext_layer_g(in_groups, ())
        block_a = b.main_block(off_a, (half_f, W, R))
        state = ext_layer_scalar(ext_half_blocks(block_a, in_groups, ext_c[:half_f]))

        # ---- internal rounds (scalar chain — genuinely sequential) -------
        block_b = b.main_block(off_b, (rp, R))
        for r in range(rp):
            x = state[0] + int(int_c[r])
            regs = [block_b.gather([r * R + c], ()) for c in range(R)]
            out0 = sbox_assert(x, regs)
            state[0] = out0
            state = _air_internal_layer(state, p2.diag_int)

        # ---- terminal external half --------------------------------------
        block_c = b.main_block(off_c, (half_f, W, R))
        # terminal round half_f takes the internal-phase state (scalar);
        # remaining rounds run as blocks off block_c's registers
        rc0 = ext_c[half_f]
        last_regs = []
        for l in range(W):
            x = state[l] + int(rc0[l])
            regs = [block_c.gather([l * R + c], ()) for c in range(R)]
            last_regs.append(sbox_assert(x, regs))
        if half_f > 1:
            prev_out = [grouped_regs(block_c, half_f, i, R - 1) for i in range(4)]
            prev = [p.gather(
                (np.arange(half_f - 1)[:, None] * G + np.arange(G)[None, :]).reshape(-1),
                (half_f - 1, G)) for p in prev_out]
            ins = ext_layer_g(prev, (half_f - 1,))
            for i in range(4):
                x = ins[i] + b.constant_array(ext_c[half_f + 1 :, lanes(i)])
                regs = []
                for c in range(R):
                    g = grouped_regs(block_c, half_f, i, c)
                    regs.append(g.gather(
                        ((np.arange(half_f - 1) + 1)[:, None] * G
                         + np.arange(G)[None, :]).reshape(-1),
                        (half_f - 1, G)))
                sbox_assert(x, regs)

    def _eval_scalar(self, b):
        p2, W, R = self.p2, self.W, self.R
        cols = b.main.local
        state = list(cols[:W])
        ptr = W

        def take(n):
            nonlocal ptr
            out = cols[ptr : ptr + n]
            ptr += n
            return out

        half_f = p2.rounds_f // 2
        state = _air_external_layer(state, p2.hl_mat4)
        for r in range(half_f):
            state = [
                self._sbox(b, state[i] + int(p2.ext_consts_int[r, i]), take(R))
                for i in range(W)
            ]
            state = _air_external_layer(state, p2.hl_mat4)
        for r in range(p2.rounds_p):
            x = state[0] + int(p2.int_consts_int[r])
            state[0] = self._sbox(b, x, take(R))
            state = _air_internal_layer(state, p2.diag_int)
        for r in range(half_f, p2.rounds_f):
            state = [
                self._sbox(b, state[i] + int(p2.ext_consts_int[r, i]), take(R))
                for i in range(W)
            ]
            state = _air_external_layer(state, p2.hl_mat4)
        assert ptr == self.width

    # ---- witness generation (ref: generation.rs) ----------------------

    @functools.partial(jax.jit, static_argnums=0)
    def generate_trace(self, inputs):
        """inputs: (n, W) states -> (n, width) trace.

        Rounds run under lax.scan (one round body in the HLO); the S-box
        registers are collected as scan outputs and laid out in the AIR's
        (round, lane, register) column order."""
        p2, W, R = self.p2, self.W, self.R
        F = p2.F
        d = p2.d
        n = inputs.shape[0]
        half_f = p2.rounds_f // 2

        def sbox_regs(x):
            x3 = F.mul(F.square(x), x)
            if d == 3:
                return x3, x3[..., None]
            if d == 5:
                r2 = F.mul(F.mul(x3, x), x)
                return r2, jnp.stack([x3, r2], axis=-1)
            r2 = F.mul(F.square(x3), x)
            return r2, jnp.stack([x3, r2], axis=-1)

        def ext_round(st, rc):
            out, regs = sbox_regs(F.add(st, rc[None, :]))
            return p2._ext_layer_arr(out), regs  # regs (n, W, R)

        def int_round(st, rc):
            out0, regs = sbox_regs(F.add(st[:, 0], rc))
            st = st.at[:, 0].set(out0)
            s = st[:, 0]
            for i in range(1, W):
                s = F.add(s, st[:, i])
            return F.add(F.mul(st, p2.diag[None, :]), s[:, None]), regs  # (n, R)

        st = p2._ext_layer_arr(inputs)
        st, regs1 = jax.lax.scan(ext_round, st, p2.ext_consts[:half_f])
        st, regsp = jax.lax.scan(int_round, st, p2.int_consts)
        st, regs2 = jax.lax.scan(ext_round, st, p2.ext_consts[half_f:])

        cols = [
            inputs,
            jnp.moveaxis(regs1, 1, 0).reshape(n, -1),
            jnp.moveaxis(regsp, 1, 0).reshape(n, -1),
            jnp.moveaxis(regs2, 1, 0).reshape(n, -1),
        ]
        return jnp.concatenate(cols, axis=1)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class VectorizedPoseidon2Air(BaseAir):
    """VECTOR_LEN permutations per row (ref: `vectorized.rs:136`) — packs
    more work per trace row to amortize per-row commitment cost."""

    def __init__(self, p2: Poseidon2, vector_len: int):
        self.inner = Poseidon2Air(p2)
        self.vector_len = vector_len
        self.width = self.inner.width * vector_len

    def eval(self, b):
        from ..air.expr import RowPair

        iw = self.inner.width
        for v in range(self.vector_len):
            sub = _SubBuilder(b, v * iw, iw)
            self.inner.eval(sub)

    @functools.partial(jax.jit, static_argnums=0)
    def generate_trace(self, inputs):
        """inputs: (n, VECTOR_LEN, W) -> (n, width)."""
        n = inputs.shape[0]
        traces = [
            self.inner.generate_trace(inputs[:, v]) for v in range(self.vector_len)
        ]
        return jnp.concatenate(traces, axis=1)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class _SubBuilder:
    """Window view of a builder's main columns (ref: `SubAirBuilder`,
    `uni-stark/src/sub_builder.rs:21`)."""

    def __init__(self, inner, offset, width):
        from ..air.expr import RowPair

        self.inner = inner
        self._offset = offset
        self.main = RowPair(
            inner.main.local[offset : offset + width],
            inner.main.next[offset : offset + width],
        )
        self.preprocessed = inner.preprocessed
        self.public_values = inner.public_values
        self.is_first_row = inner.is_first_row
        self.is_last_row = inner.is_last_row
        self.is_transition = inner.is_transition

    def main_block(self, start, shape, nxt=False):
        return self.inner.main_block(self._offset + start, shape, nxt)

    def __getattr__(self, name):
        return getattr(self.inner, name)
