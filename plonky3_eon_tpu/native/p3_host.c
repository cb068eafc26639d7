/* Native host-side kernels for the sequential transcript path.
 *
 * Reference parity: the reference's Fiat-Shamir challenger runs its sponge
 * permutation on the CPU as native (Rust) code; our Python/numpy host
 * permutation costs ~1ms per duplex and a prove performs hundreds of
 * duplexes (claimed-eval observations, fold-round roots, final-poly
 * absorption, PoW grind replay, query sampling). This file provides the
 * same permutation as straight C for any 31-bit prime field:
 * canonical u64 lanes, products fit in u64, reduce with one %.
 *
 * Built at import time by plonky3_eon_tpu/native/__init__.py via cc -O3;
 * every entry point is ctypes-friendly (no structs, u64 pointers only).
 *
 * Layout contract (matches hashes/poseidon2.py):
 *   external rounds: add rc -> x^d -> external linear layer (M4 blocks +
 *     column sums), first applying the external layer once before round 0;
 *   internal rounds: x0 += rc -> x0^d -> diag mul + state sum.
 */

#include <stdint.h>
#include <stddef.h>

typedef uint64_t u64;
typedef uint32_t u32;

static inline u64 mod_mul(u64 a, u64 b, u64 p) { return (a * b) % p; }

static inline u64 mod_add(u64 a, u64 b, u64 p) {
  u64 s = a + b;
  return s >= p ? s - p : s;
}

static inline u64 mod_pow(u64 a, u64 e, u64 p) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = mod_mul(r, a, p);
    a = mod_mul(a, a, p);
    e >>= 1;
  }
  return r;
}

/* external linear layer: M4-block mix then column sums (widths 2, 3, 4k).
 * hl selects the HL matrix [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]]
 * instead of the cheap [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]. */
static void ext_layer(u64 *x, int w, u64 p, int hl) {
  if (w == 2) {
    u64 s = mod_add(x[0], x[1], p);
    x[0] = mod_add(x[0], s, p);
    x[1] = mod_add(x[1], s, p);
    return;
  }
  if (w == 3) {
    u64 s = mod_add(mod_add(x[0], x[1], p), x[2], p);
    x[0] = mod_add(x[0], s, p);
    x[1] = mod_add(x[1], s, p);
    x[2] = mod_add(x[2], s, p);
    return;
  }
  for (int c = 0; c < w; c += 4) {
    u64 x0 = x[c], x1 = x[c + 1], x2 = x[c + 2], x3 = x[c + 3];
    if (hl) {
      u64 t0 = mod_add(x0, x1, p);
      u64 t1 = mod_add(x2, x3, p);
      u64 t2 = mod_add(mod_add(x1, x1, p), t1, p);
      u64 t3 = mod_add(mod_add(x3, x3, p), t0, p);
      u64 t4 = mod_add(mod_add(mod_add(t1, t1, p), mod_add(t1, t1, p), p), t3, p);
      u64 t5 = mod_add(mod_add(mod_add(t0, t0, p), mod_add(t0, t0, p), p), t2, p);
      x[c] = mod_add(t3, t5, p);
      x[c + 1] = t5;
      x[c + 2] = mod_add(t2, t4, p);
      x[c + 3] = t4;
    } else {
      u64 t01 = mod_add(x0, x1, p);
      u64 t23 = mod_add(x2, x3, p);
      u64 t0123 = mod_add(t01, t23, p);
      u64 t01123 = mod_add(t0123, x1, p);
      u64 t01233 = mod_add(t0123, x3, p);
      x[c + 3] = mod_add(t01233, mod_add(x0, x0, p), p);
      x[c + 1] = mod_add(t01123, mod_add(x2, x2, p), p);
      x[c] = mod_add(t01123, t01, p);
      x[c + 2] = mod_add(t01233, t23, p);
    }
  }
  if (w > 4) {
    u64 sums[4] = {0, 0, 0, 0};
    for (int j = 0; j < w; j++) sums[j % 4] = mod_add(sums[j % 4], x[j], p);
    for (int j = 0; j < w; j++) x[j] = mod_add(x[j], sums[j % 4], p);
  }
}

/* One full Poseidon2 permutation on `count` states of `w` u64 lanes each,
 * in place. consts layout: ext_consts[rounds_f][w], int_consts[rounds_p],
 * diag[w]. */
void poseidon2_permute_host(u64 *states, long count, int w, u64 p, int d,
                            int rounds_f, int rounds_p, int hl,
                            const u64 *ext_consts, const u64 *int_consts,
                            const u64 *diag) {
  int half_f = rounds_f / 2;
  for (long s = 0; s < count; s++) {
    u64 *x = states + (size_t)s * w;
    ext_layer(x, w, p, hl);
    for (int r = 0; r < half_f; r++) {
      const u64 *rc = ext_consts + (size_t)r * w;
      for (int i = 0; i < w; i++) x[i] = mod_pow(mod_add(x[i], rc[i], p), d, p);
      ext_layer(x, w, p, hl);
    }
    for (int r = 0; r < rounds_p; r++) {
      x[0] = mod_pow(mod_add(x[0], int_consts[r], p), d, p);
      u64 sum = 0;
      for (int i = 0; i < w; i++) sum = mod_add(sum, x[i], p);
      for (int i = 0; i < w; i++) x[i] = mod_add(mod_mul(x[i], diag[i], p), sum, p);
    }
    for (int r = half_f; r < rounds_f; r++) {
      const u64 *rc = ext_consts + (size_t)r * w;
      for (int i = 0; i < w; i++) x[i] = mod_pow(mod_add(x[i], rc[i], p), d, p);
      ext_layer(x, w, p, hl);
    }
  }
}

/* Proof-of-work grind (ref: grinding_challenger.rs): find the smallest
 * witness value whose duplex output has `bits` low zero bits.
 *
 * base_state: the sponge state before the witness observation (w lanes);
 * pending[n_pending]: already-buffered inputs that precede the witness in
 * the rate section. The duplex overwrites state[0..n_pending+1] with
 * pending + candidate, permutes, and checks lane rate-1. Returns the
 * witness, or (u64)-1 if none found below `limit`. */
u64 poseidon2_grind_host(const u64 *base_state, int w, u64 p, int d,
                         int rounds_f, int rounds_p, int hl,
                         const u64 *ext_consts, const u64 *int_consts,
                         const u64 *diag, const u64 *pending, int n_pending,
                         int rate, int bits, u64 limit) {
  u64 mask = (bits >= 64) ? ~(u64)0 : (((u64)1 << bits) - 1);
  u64 st[64];
  for (u64 cand = 0; cand < limit; cand++) {
    for (int i = 0; i < w; i++) st[i] = base_state[i];
    for (int i = 0; i < n_pending; i++) st[i] = pending[i];
    st[n_pending] = cand % p;
    poseidon2_permute_host(st, 1, w, p, d, rounds_f, rounds_p, hl, ext_consts,
                           int_consts, diag);
    if ((st[rate - 1] & mask) == 0) return cand;
  }
  return ~(u64)0;
}
