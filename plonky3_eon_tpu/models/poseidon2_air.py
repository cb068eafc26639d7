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
        self.main = RowPair(
            inner.main.local[offset : offset + width],
            inner.main.next[offset : offset + width],
        )
        self.preprocessed = inner.preprocessed
        self.public_values = inner.public_values
        self.is_first_row = inner.is_first_row
        self.is_last_row = inner.is_last_row
        self.is_transition = inner.is_transition

    def __getattr__(self, name):
        return getattr(self.inner, name)
