"""Blake3 compression-function AIR — one compression per row.

Reference parity: `blake3-air/src/columns.rs:10-96` (Blake3Cols layout:
inputs/chaining/counter bits, 7 FullRounds of 4 states, final xors),
`air.rs:19-430` (quarter-round constraints via add2/add3/xor_32_shift from
`air/src/utils.rs:82-227`), `generation.rs` (witness).

TPU-native design: the reference evaluates 4 column + 4 diagonal
quarter-round functions per round as separate monomorphized calls; here the
4 parallel quarter rounds ARE the leading block axis — a state row is one
(4, 2)-limb or (4, 32)-bit tensor block, the diagonal pattern is a roll
along the word axis, the message schedule is a static gather, and each
add2/add3/xor-shift family lands as one tensor assertion. Witness
generation is vectorized u32 bit arithmetic over all rows at once.

State convention (Blake3 spec): rows 0 and 2 of the 4x4 word state are
stored as 2x16-bit limbs, rows 1 and 3 as 32 bits (`columns.rs:34-43`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..air.air import BaseAir, add_u32_limbs, pack_bits_to_limbs, xor, xor_32_shift

BITS_PER_LIMB = 16
U32_LIMBS = 2

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

# message schedule permutation (blake3 spec)
MSG_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8])

# ---- column offsets (layout identical to `columns.rs` Blake3Cols) ----------
OFF_INPUTS = 0                       # (16, 32) bits
OFF_CHAINING = 512                   # (2, 4, 32) bits
OFF_COUNTER_LOW = 768                # (32,)
OFF_COUNTER_HI = 800                 # (32,)
OFF_BLOCK_LEN = 832                  # (32,)
OFF_FLAGS = 864                      # (32,)
OFF_INITIAL_ROW0 = 896               # (4, 2) limbs
OFF_INITIAL_ROW2 = 904               # (4, 2) limbs
OFF_FULL_ROUNDS = 912                # 7 x FullRound
# Blake3State: row0 (4,2), row1 (4,32), row2 (4,2), row3 (4,32) = 272 cols
STATE_COLS = 272
FULL_ROUND_COLS = 4 * STATE_COLS     # state_prime/middle/middle_prime/output
OFF_FINAL_HELPERS = OFF_FULL_ROUNDS + 7 * FULL_ROUND_COLS  # (4, 32)
OFF_OUTPUTS = OFF_FINAL_HELPERS + 128                      # (4, 4, 32)
NUM_BLAKE3_COLS = OFF_OUTPUTS + 512

_W16 = (np.uint64(1) << np.arange(BITS_PER_LIMB, dtype=np.uint64)).astype(np.uint64)


class _StateView:
    """Block Exprs for one Blake3State at a column offset."""

    def __init__(self, b, off, nxt=False):
        self.row0 = b.main_block(off, (4, U32_LIMBS), nxt)            # limbs
        self.row1 = b.main_block(off + 8, (4, 32), nxt)               # bits
        self.row2 = b.main_block(off + 136, (4, U32_LIMBS), nxt)      # limbs
        self.row3 = b.main_block(off + 144, (4, 32), nxt)             # bits


def _pack2(bits, weights):
    """(4, 32)-bit block -> (4, 2) 16-bit limb block."""
    return (bits.reshape_block((4, U32_LIMBS, BITS_PER_LIMB)) * weights).sum_block(2)


class Blake3Air(BaseAir):
    """Blake3 compression AIR (ref: `blake3-air/src/air.rs:19`)."""

    width = NUM_BLAKE3_COLS

    # ---- constraint helpers: the shared library gadgets of air/air.py
    # (ref: air/src/utils.rs:82-227), thin-bound to this AIR's shapes

    def _add_n(self, b, out, terms):
        add_u32_limbs(b, out, terms)

    def _xor_32_shift(self, b, a_limbs, bits, c_bits, shift):
        xor_32_shift(b, a_limbs, bits, c_bits, shift, b.constant_array(_W16))

    def _quarter_round(self, b, a, bb, c, d, m_even, m_odd,
                       a_p, b_p, c_p, d_p, a_o, b_o, c_o, d_o):
        """One batch of 4 parallel quarter rounds (ref: air.rs:38-107)."""
        weights = b.constant_array(_W16)
        pack_bits = lambda e: _pack2(e, weights)
        # a' = a + b + m_2i
        self._add_n(b, a_p, [a, pack_bits(bb), m_even])
        # d' = (a' ^ d) >>> 16
        self._xor_32_shift(b, a_p, d, d_p, 16)
        # c' = c + d'
        self._add_n(b, c_p, [c, pack_bits(d_p)])
        # b' = (c' ^ b) >>> 12
        self._xor_32_shift(b, c_p, bb, b_p, 12)
        # a'' = a' + b' + m_{2i+1}
        self._add_n(b, a_o, [a_p, pack_bits(b_p), m_odd])
        # d'' = (a'' ^ d') >>> 8
        self._xor_32_shift(b, a_o, d_p, d_o, 8)
        # c'' = c' + d''
        self._add_n(b, c_o, [c_p, pack_bits(d_o)])
        # b'' = (c'' ^ b') >>> 7
        self._xor_32_shift(b, c_o, b_p, b_o, 7)

    def eval(self, b):
        weights = b.constant_array(_W16)
        inputs = b.main_block(OFF_INPUTS, (16, 32))
        chain0 = b.main_block(OFF_CHAINING, (4, 32))
        chain1 = b.main_block(OFF_CHAINING + 128, (4, 32))
        row3_init = b.main_block(OFF_COUNTER_LOW, (4, 32))  # ctr_lo/hi/len/flags
        init_row0 = b.main_block(OFF_INITIAL_ROW0, (4, U32_LIMBS))
        init_row2 = b.main_block(OFF_INITIAL_ROW2, (4, U32_LIMBS))

        # booleanity of all initialization bit columns (air.rs:246-256)
        b.assert_bool_block(inputs)
        b.assert_bool_block(chain0)
        b.assert_bool_block(chain1)
        b.assert_bool_block(row3_init)

        # initial row0 = packed chaining[0]; row2 = IV[0..4] (air.rs:258-283)
        b.assert_zero_block(_pack2(chain0, weights) - init_row0)
        iv_limbs = np.stack(
            [IV[:4] & 0xFFFF, IV[:4] >> 16], axis=-1
        ).astype(np.uint64)
        b.assert_zero_block(init_row2 - b.constant_array(iv_limbs))

        # message schedule as a (16, 2) limb expression block
        m = (inputs.reshape_block((16, U32_LIMBS, BITS_PER_LIMB)) * weights).sum_block(2)

        state = _StateView.__new__(_StateView)
        state.row0, state.row1, state.row2, state.row3 = (
            init_row0, chain1, init_row2, row3_init
        )

        perm = np.arange(16)
        for r in range(7):
            off = OFF_FULL_ROUNDS + r * FULL_ROUND_COLS
            sp = _StateView(b, off)                      # state_prime
            sm = _StateView(b, off + STATE_COLS)         # state_middle
            smp = _StateView(b, off + 2 * STATE_COLS)    # state_middle_prime
            so = _StateView(b, off + 3 * STATE_COLS)     # state_output
            mp = m.gather(np.stack([perm * 2, perm * 2 + 1], axis=1).reshape(-1), (16, 2))
            # column quarter rounds (4 in parallel)
            ev = mp.gather([0, 1, 4, 5, 8, 9, 12, 13], (4, 2))
            od = mp.gather([2, 3, 6, 7, 10, 11, 14, 15], (4, 2))
            self._quarter_round(
                b, state.row0, state.row1, state.row2, state.row3, ev, od,
                sp.row0, sp.row1, sp.row2, sp.row3,
                sm.row0, sm.row1, sm.row2, sm.row3,
            )
            # diagonal quarter rounds: rotate rows 1..3 (air.rs:141-168)
            ev = mp.gather([16, 17, 20, 21, 24, 25, 28, 29], (4, 2))
            od = mp.gather([18, 19, 22, 23, 26, 27, 30, 31], (4, 2))
            self._quarter_round(
                b,
                sm.row0, sm.row1.roll(-1, 0), sm.row2.roll(-2, 0), sm.row3.roll(-3, 0),
                ev, od,
                smp.row0, smp.row1.roll(-1, 0), smp.row2.roll(-2, 0), smp.row3.roll(-3, 0),
                so.row0, so.row1.roll(-1, 0), so.row2.roll(-2, 0), so.row3.roll(-3, 0),
            )
            state = so
            perm = perm[MSG_PERM]

        # final xors (air.rs:367-430)
        helpers = b.main_block(OFF_FINAL_HELPERS, (4, 32))
        out0 = b.main_block(OFF_OUTPUTS, (4, 32))
        out1 = b.main_block(OFF_OUTPUTS + 128, (4, 32))
        out2 = b.main_block(OFF_OUTPUTS + 256, (4, 32))
        out3 = b.main_block(OFF_OUTPUTS + 384, (4, 32))
        # helpers are the bits of state_output.row2
        b.assert_bool_block(helpers)
        b.assert_bool_block(out0)
        b.assert_zero_block(_pack2(helpers, weights) - state.row2)
        # out0 ^ helpers = row0  (xor with shift 0, packs against row0 limbs)
        b.assert_zero_block(_pack2(xor(out0, helpers), weights) - state.row0)
        # out1 = row1 ^ row3 (bitwise; also range checks out1)
        b.assert_zero_block(out1 - xor(state.row1, state.row3))
        # out2 = helpers ^ chaining[0]
        b.assert_zero_block(out2 - xor(helpers, chain0))
        # out3 = row3 ^ chaining[1]
        b.assert_zero_block(out3 - xor(state.row3, chain1))

    # ---- witness generation (ref: generation.rs) --------------------------

    def generate_trace(self, F, inputs: np.ndarray, chaining: np.ndarray | None = None,
                       counter=0, block_len=64, flags=0):
        """inputs: (P, 16) uint32 message words; chaining: (P, 8) uint32 (IV
        by default). Returns a (next_pow2(P), NUM_BLAKE3_COLS) trace."""
        inputs = np.asarray(inputs, dtype=np.uint32).reshape(-1, 16)
        num = inputs.shape[0]
        n_rows = 1 << max(0, (num - 1).bit_length())
        pad = np.zeros((n_rows - num, 16), dtype=np.uint32)
        inputs = np.concatenate([inputs, pad], axis=0)
        if chaining is None:
            chaining = np.broadcast_to(IV, (n_rows, 8)).copy()
        else:
            chaining = np.asarray(chaining, dtype=np.uint32).reshape(-1, 8)
            chaining = np.concatenate(
                [chaining, np.broadcast_to(IV, (n_rows - num, 8))], axis=0
            )
        aux = np.array([counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF,
                        block_len, flags], dtype=np.uint32)
        rows = _blake3_trace_rows(
            jnp.asarray(inputs), jnp.asarray(chaining),
            jnp.asarray(np.broadcast_to(aux, (n_rows, 4)).copy()),
        )
        return F.from_canonical(rows)


def _bits(words, n=32):
    """(..., W) u32 -> (..., W, n) bits."""
    sh = jnp.arange(n, dtype=jnp.uint32)
    return (words[..., None] >> sh) & jnp.uint32(1)


def _limbs(words):
    """(..., W) u32 -> (..., W, 2) 16-bit limbs."""
    return jnp.stack([words & jnp.uint32(0xFFFF), words >> 16], axis=-1)


def _ror(x, r):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


@jax.jit
def _blake3_trace_rows(inputs, chaining, aux):
    """inputs (P,16), chaining (P,8), aux (P,4) u32 -> (P, W) canonical."""
    P = inputs.shape[0]

    def state_cols(row0, row1, row2, row3):
        return jnp.concatenate(
            [
                _limbs(row0).reshape(P, -1),
                _bits(row1).reshape(P, -1),
                _limbs(row2).reshape(P, -1),
                _bits(row3).reshape(P, -1),
            ],
            axis=1,
        )

    cols = [
        _bits(inputs).reshape(P, -1),
        _bits(chaining[:, :4]).reshape(P, -1),
        _bits(chaining[:, 4:]).reshape(P, -1),
        _bits(aux).reshape(P, -1),
        _limbs(chaining[:, :4]).reshape(P, -1),
        _limbs(jnp.broadcast_to(jnp.asarray(IV[:4]), (P, 4))).reshape(P, -1),
    ]

    row0 = chaining[:, :4]
    row1 = chaining[:, 4:]
    row2 = jnp.broadcast_to(jnp.asarray(IV[:4]), (P, 4))
    row3 = aux
    m = inputs  # (P, 16)

    def qr(a, bb, c, d, me, mo):
        a1 = a + bb + me
        d1 = _ror(d ^ a1, 16)
        c1 = c + d1
        b1 = _ror(bb ^ c1, 12)
        a2 = a1 + b1 + mo
        d2 = _ror(d1 ^ a2, 8)
        c2 = c1 + d2
        b2 = _ror(b1 ^ c2, 7)
        return a1, b1, c1, d1, a2, b2, c2, d2

    perm = np.arange(16)
    for r in range(7):
        mp = m[:, perm]
        # column quarter rounds
        a1, b1, c1, d1, a2, b2, c2, d2 = qr(
            row0, row1, row2, row3, mp[:, 0:8:2], mp[:, 1:8:2]
        )
        cols.append(state_cols(a1, b1, c1, d1))   # state_prime
        cols.append(state_cols(a2, b2, c2, d2))   # state_middle
        # diagonal quarter rounds (rotate rows)
        rb = jnp.roll(b2, -1, axis=1)
        rc = jnp.roll(c2, -2, axis=1)
        rd = jnp.roll(d2, -3, axis=1)
        a1x, b1x, c1x, d1x, a2x, b2x, c2x, d2x = qr(
            a2, rb, rc, rd, mp[:, 8:16:2], mp[:, 9:16:2]
        )
        # un-rotate for storage
        cols.append(state_cols(a1x, jnp.roll(b1x, 1, axis=1),
                               jnp.roll(c1x, 2, axis=1), jnp.roll(d1x, 3, axis=1)))
        cols.append(state_cols(a2x, jnp.roll(b2x, 1, axis=1),
                               jnp.roll(c2x, 2, axis=1), jnp.roll(d2x, 3, axis=1)))
        row0, row1 = a2x, jnp.roll(b2x, 1, axis=1)
        row2, row3 = jnp.roll(c2x, 2, axis=1), jnp.roll(d2x, 3, axis=1)
        perm = perm[MSG_PERM]

    cols.append(_bits(row2).reshape(P, -1))  # final_round_helpers
    cols.append(_bits(row0 ^ row2).reshape(P, -1))              # outputs[0]
    cols.append(_bits(row1 ^ row3).reshape(P, -1))              # outputs[1]
    cols.append(_bits(row2 ^ chaining[:, :4]).reshape(P, -1))   # outputs[2]
    cols.append(_bits(row3 ^ chaining[:, 4:]).reshape(P, -1))   # outputs[3]
    return jnp.concatenate(cols, axis=1)
