"""Keccak-f[1600] AIR — 24 rows per permutation, 2633 columns.

Reference parity: `keccak-air/src/columns.rs:18-120` (column layout,
`NUM_KECCAK_COLS = 2633`), `air.rs:38-211` (theta/rho/pi/chi/iota
constraints), `round_flags.rs:22-57` (rotating step flags),
`generation.rs:17-137` (witness), `constants.rs` (rho rotations R, round
constants RC).

TPU-native design: the reference monomorphizes ~4400 scalar constraints over
2633 named struct fields; here the trace is addressed as structured tensor
BLOCKS (the block-constraint API of `air/builder.py`): the theta parity
state is one (5, 64) block, the A' bit state one (5, 5, 64) block, and each
constraint family is ONE tensor assertion — rolls express the x-1/x+1/z-1
taps, a static gather expresses the rho/pi "B" view, and bit->limb packing
is a weighted sum_block. The compiled quotient program is a few dozen fused
array ops regardless of width. Witness generation runs on-device as a
`lax.scan` over the 24 rounds of XOR/AND bit tensors (batched over
permutations — the reference vectorizes 4-8 states with AVX; we do the whole
batch per VPU lane).

State convention (Keccak spec): bit tensors are indexed [x][y][z]; lane i of
the input is (x = i % 5, y = i // 5). Column blocks are stored y-major
([y][x][limb/z]) exactly as the reference's `KeccakCols`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..air.air import BaseAir, andn, xor, xor3

NUM_ROUNDS = 24
U64_LIMBS = 4
BITS_PER_LIMB = 16

# rho rotation offsets r[x][y] (ref: `constants.rs:1-7` R)
R = np.array(
    [
        [0, 36, 3, 41, 18],
        [1, 44, 10, 45, 2],
        [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56],
        [27, 20, 39, 8, 14],
    ],
    dtype=np.int64,
)

# round constants (ref: `constants.rs:9-34` RC)
RC = np.array(
    [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
        0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
        0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
        0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
        0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
        0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
        0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
        0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ],
    dtype=np.uint64,
)
RC_BITS = ((RC[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
    np.uint64
)  # (24, 64) little-endian

# ---- column offsets (layout identical to `columns.rs` KeccakCols) ---------
OFF_FLAGS = 0                       # (24,)
OFF_EXPORT = 24                     # ()
OFF_PREIMAGE = 25                   # (5y, 5x, 4limb)
OFF_A = 125                         # (5y, 5x, 4limb)
OFF_C = 225                         # (5x, 64z)
OFF_C_PRIME = 545                   # (5x, 64z)
OFF_A_PRIME = 865                   # (5y, 5x, 64z)
OFF_A_PRIME_PRIME = 2465            # (5y, 5x, 4limb)
OFF_APP_00_BITS = 2565              # (64,)
OFF_APPP_00_LIMBS = 2629            # (4,)
NUM_KECCAK_COLS = 2633

_LIMB_WEIGHTS = (np.uint64(1) << np.arange(BITS_PER_LIMB, dtype=np.uint64)).astype(
    np.uint64
)


def _b_view_flat_idx() -> np.ndarray:
    """Flat indices into the (5y, 5x, 64z) A' block giving Byx[y, x, z] =
    B[x, y, z] — the rho-rotated pi-permuted view (ref: `columns.rs:64-79`
    `fn b`: B[x, y] = ROT(A'[(x+3y)%5, x], R[(x+3y)%5][x]))."""
    idx = np.zeros((5, 5, 64), dtype=np.int64)
    for y in range(5):
        for x in range(5):
            xs = (x + 3 * y) % 5  # source x (= "a" in the reference)
            ys = x               # source y (= "b")
            rot = int(R[xs][ys])
            for z in range(64):
                # A' block is stored [y][x][z]
                idx[y, x, z] = (ys * 5 + xs) * 64 + ((z - rot) % 64)
    return idx.reshape(-1)


_B_FLAT_IDX = _b_view_flat_idx()


def _pack16(block, lead_shape, weights):
    """(…, 64)-bit block -> (…, 4) 16-bit limbs (little-endian within each
    limb, matching `air/src/utils.rs` u64_to_16_bit_limbs)."""
    r = block.reshape_block(tuple(lead_shape) + (U64_LIMBS, BITS_PER_LIMB))
    return (r * weights).sum_block(len(lead_shape) + 1)


class KeccakAir(BaseAir):
    """Keccak-f[1600] AIR (ref: `keccak-air/src/air.rs:18`)."""

    width = NUM_KECCAK_COLS

    def eval(self, b):
        weights = b.constant_array(_LIMB_WEIGHTS)

        # ---- round flags (ref: round_flags.rs:22-57) -------------------
        flags = b.main_block(OFF_FLAGS, (NUM_ROUNDS,))
        flags_next = b.main_block(OFF_FLAGS, (NUM_ROUNDS,), nxt=True)
        first_flag = b.main_block(OFF_FLAGS, ())
        b.when_first_row().assert_one(first_flag)
        rest = b.main_block(OFF_FLAGS + 1, (NUM_ROUNDS - 1,))
        b.assert_zero_block(b.is_first_row * rest)
        # local flag i == next flag (i+1) % 24 on transitions
        b.assert_zero_block(b.is_transition * (flags - flags_next.roll(-1, 0)))

        first_step = b.main_block(OFF_FLAGS, ())
        final_step = b.main_block(OFF_FLAGS + NUM_ROUNDS - 1, ())
        not_final = 1 - final_step

        # ---- preimage consistency (air.rs:55-76) ------------------------
        preimage = b.main_block(OFF_PREIMAGE, (5, 5, U64_LIMBS))
        preimage_next = b.main_block(OFF_PREIMAGE, (5, 5, U64_LIMBS), nxt=True)
        a = b.main_block(OFF_A, (5, 5, U64_LIMBS))
        b.assert_zero_block(first_step * (preimage - a))
        b.assert_zero_block(not_final * b.is_transition * (preimage - preimage_next))

        # ---- export flag (air.rs:78-84) ----------------------------------
        export = b.main_block(OFF_EXPORT, ())
        b.assert_bool(export)
        b.assert_zero(not_final * export)

        # ---- theta: C and C' (air.rs:86-99) ------------------------------
        c = b.main_block(OFF_C, (5, 64))
        c_prime = b.main_block(OFF_C_PRIME, (5, 64))
        b.assert_bool_block(c)
        # C'[x, z] = xor3(C[x, z], C[x-1, z], C[x+1, z-1])
        b.assert_zero_block(c_prime - xor3(c, c.roll(1, 0), c.roll(-1, 0).roll(1, 1)))

        # ---- A' bits and A limb consistency (air.rs:101-131) -------------
        a_prime = b.main_block(OFF_A_PRIME, (5, 5, 64))
        b.assert_bool_block(a_prime)
        # A[y, x, limb] == pack16(xor3(A'[y, x, z], C[x, z], C'[x, z]))
        # ((5, 64) parity blocks right-align against the (5, 5, 64) state)
        a_bits = xor3(a_prime, c, c_prime)
        b.assert_zero_block(_pack16(a_bits, (5, 5), weights) - a)

        # ---- theta parity: xor_y A'[y, x, z] == C'[x, z] (air.rs:133-143)
        diff = a_prime.sum_block(0) - c_prime
        b.assert_zero_block(diff * (diff - 2) * (diff - 4))

        # ---- chi: A'' (air.rs:145-164) ------------------------------------
        # Byx[y, x, z] = B[x, y, z]: static gather of the rho/pi view
        byx = a_prime.gather(_B_FLAT_IDX, (5, 5, 64))
        b1 = byx.roll(-1, 1)  # B[x+1, y, z]
        b2 = byx.roll(-2, 1)  # B[x+2, y, z]
        app_bits = xor(byx, andn(b1, b2))
        app = b.main_block(OFF_A_PRIME_PRIME, (5, 5, U64_LIMBS))
        b.assert_zero_block(_pack16(app_bits, (5, 5), weights) - app)

        # ---- A''[0, 0] bit decomposition (air.rs:166-177) ----------------
        app00_bits = b.main_block(OFF_APP_00_BITS, (64,))
        b.assert_bool_block(app00_bits)
        app00 = b.main_block(OFF_A_PRIME_PRIME, (U64_LIMBS,))
        b.assert_zero_block(_pack16(app00_bits, (), weights) - app00)

        # ---- iota: A'''[0, 0] = A''[0, 0] xor RC[round] (air.rs:179-197) --
        rc_consts = b.constant_array(RC_BITS)  # (24, 64)
        rc_bits = (flags.reshape_block((NUM_ROUNDS, 1)) * rc_consts).sum_block(0)
        appp00 = b.main_block(OFF_APPP_00_LIMBS, (U64_LIMBS,))
        b.assert_zero_block(_pack16(xor(rc_bits, app00_bits), (), weights) - appp00)

        # ---- output == next round's input (air.rs:199-209) ----------------
        # A''' equals A'' with the [0, 0] lane replaced by the iota limbs
        onehot00 = b.constant_array(
            np.eye(1, 25, dtype=np.uint64).reshape(5, 5)[:, :, None]
        )  # (5, 5, 1), 1 at [0, 0]
        appp = app + onehot00 * (appp00 - app00)
        a_next = b.main_block(OFF_A, (5, 5, U64_LIMBS), nxt=True)
        b.assert_zero_block(b.is_transition * not_final * (appp - a_next))

    # ---- witness generation (ref: generation.rs:17-137) ------------------

    def generate_trace(self, F, inputs: np.ndarray):
        """inputs: (num_perms, 25) uint64 lanes (lane i at x=i%5, y=i//5).
        Returns a (next_pow2(num_perms*24), 2633) trace in F's device form.
        Padding rows continue with all-zero permutations, exactly like the
        reference (`generation.rs:34-37`)."""
        inputs = np.asarray(inputs, dtype=np.uint64).reshape(-1, 25)
        num_rows = max(1, int(inputs.shape[0]) * NUM_ROUNDS)
        num_rows = 1 << (num_rows - 1).bit_length()
        num_perms = -(-num_rows // NUM_ROUNDS)  # ceil
        pad = np.zeros((num_perms - inputs.shape[0], 25), dtype=np.uint64)
        inputs = np.concatenate([inputs, pad], axis=0)
        # bit tensors (P, 5x, 5y, 64z)
        bits = ((inputs[:, :, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.uint32
        )
        s0 = bits.reshape(-1, 5, 5, 64).transpose(0, 2, 1, 3)  # [y][x] -> [x][y]
        rows = _keccak_trace_rows(jnp.asarray(s0))  # (P*24, 2633) canonical
        return F.from_canonical(rows[:num_rows])


def _pack_limbs_yx(bits_xy):
    """(P, 5x, 5y, 64) bit tensor -> (P, 5y*5x*4) little-endian 16-bit limbs
    stored y-major."""
    byx = jnp.transpose(bits_xy, (0, 2, 1, 3))  # (P, y, x, z)
    r = byx.reshape(byx.shape[0], 5, 5, U64_LIMBS, BITS_PER_LIMB)
    w = jnp.asarray(_LIMB_WEIGHTS.astype(np.uint32))
    return (r * w).sum(axis=-1, dtype=jnp.uint32).reshape(byx.shape[0], -1)


@jax.jit
def _keccak_trace_rows(s0):
    """s0: (P, 5x, 5y, 64z) input bits. Returns (P*24, 2633) canonical u32
    rows — one lax.scan over the 24 rounds, batched over permutations."""
    P = s0.shape[0]
    preimage_limbs = _pack_limbs_yx(s0)  # constant across the rounds
    b_idx = jnp.asarray(_B_FLAT_IDX.astype(np.int32))
    rc_bits = jnp.asarray(RC_BITS.astype(np.uint32))  # (24, 64)
    flags_eye = jnp.eye(NUM_ROUNDS, dtype=jnp.uint32)

    def round_body(s, xs):
        flags_row, rc_row = xs
        c = s[:, :, 0] ^ s[:, :, 1] ^ s[:, :, 2] ^ s[:, :, 3] ^ s[:, :, 4]
        c_prime = c ^ jnp.roll(c, 1, axis=1) ^ jnp.roll(jnp.roll(c, -1, axis=1), 1, axis=2)
        a_prime = s ^ c[:, :, None, :] ^ c_prime[:, :, None, :]  # (P, x, y, z)
        # Byx[y, x, z] via the same static flat view (indices are into the
        # y-major (5y, 5x, 64z) layout)
        ap_ymajor = jnp.transpose(a_prime, (0, 2, 1, 3)).reshape(P, -1)
        byx = ap_ymajor[:, b_idx].reshape(P, 5, 5, 64)  # (P, y, x, z)
        b1 = jnp.roll(byx, -1, axis=2)
        b2 = jnp.roll(byx, -2, axis=2)
        app_yx = byx ^ ((b1 ^ 1) & b2)  # (P, y, x, z)
        app00_bits = app_yx[:, 0, 0]  # (P, 64)
        appp00_bits = app00_bits ^ rc_row[None, :]
        # next state (x, y, z)
        s_next = jnp.transpose(app_yx, (0, 2, 1, 3))
        s_next = s_next.at[:, 0, 0].set(appp00_bits)

        w = jnp.asarray(_LIMB_WEIGHTS.astype(np.uint32))
        pack64 = lambda v: (v.reshape(v.shape[:-1] + (U64_LIMBS, BITS_PER_LIMB)) * w).sum(
            axis=-1, dtype=jnp.uint32
        )
        row = jnp.concatenate(
            [
                jnp.broadcast_to(flags_row, (P, NUM_ROUNDS)),
                jnp.zeros((P, 1), jnp.uint32),  # export
                preimage_limbs,
                _pack_limbs_yx(s),  # A
                c.reshape(P, -1),
                c_prime.reshape(P, -1),
                jnp.transpose(a_prime, (0, 2, 1, 3)).reshape(P, -1),  # A' y-major
                pack64(app_yx).reshape(P, -1),  # A''
                app00_bits,
                pack64(appp00_bits),
            ],
            axis=1,
        )
        return s_next, row

    _, rows = jax.lax.scan(round_body, s0, (flags_eye, rc_bits))
    # (24, P, W) -> (P, 24, W) -> (P*24, W)
    return jnp.transpose(rows, (1, 0, 2)).reshape(P * NUM_ROUNDS, NUM_KECCAK_COLS)
