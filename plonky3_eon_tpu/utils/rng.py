"""rand-crate-compatible RNG reconstruction for reference-matching
parameter generation.

The reference instantiates every Poseidon2 permutation from
``SmallRng::seed_from_u64(1)`` (``examples/src/tests.rs:36``,
``poseidon2-air/examples/prove_poseidon2_baby_bear_keccak_zk.rs``) via
``Poseidon2::new_from_rng_128`` (``poseidon2/src/lib.rs:89``):

  * external constants: ``rounds_f/2`` initial ``[F; WIDTH]`` samples, then
    ``rounds_f/2`` terminal ones (``poseidon2/src/external.rs:199-211``);
  * internal constants: ``rounds_p`` single-element samples
    (``poseidon2/src/lib.rs:66-74``).

``SmallRng`` in rand 0.9 on 64-bit targets is Xoshiro256++ seeded through
``SeedableRng::seed_from_u64`` (SplitMix64 stream filling the 32-byte
seed).  Reproducing that generator plus each field's ``StandardUniform``
sampling rule makes our Poseidon2 instances bit-identical to the
reference's, which is a precondition for bit-exact transcripts/proofs
(BASELINE.md north star).

Sampling rules:
  * BN254 Fr: 32 uniform bytes, top 2 bits cleared, accepted iff < p, and
    the accepted value IS the Montgomery representation
    (``bn254/src/field.rs:534-551`` — ``from_bytes_monty`` does no
    conversion).
  * 31-bit Monty fields (BabyBear/KoalaBear): ``next_u32() >> 1`` accepted
    iff < p; the accepted value is the Montgomery representation
    (upstream ``p3-monty-31`` ``Distribution<MontyField31>`` —
    reconstructed; the crate is removed from the reference workspace).
  * Mersenne31: ``next_u32() >> 1`` accepted iff != p (canonical form —
    M31 has no Montgomery representation).
  * Goldilocks: ``next_u64()`` accepted iff < p.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1


class SplitMix64:
    """rand_core's ``seed_from_u64`` seed-stream generator."""

    def __init__(self, seed: int):
        self.state = seed & _M64

    def next_u64(self) -> int:
        self.state = (self.state + 0x9E3779B97F4A7C15) & _M64
        z = self.state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        return z ^ (z >> 31)


def _rotl64(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _M64


class SmallRng:
    """rand 0.9 ``SmallRng`` == ``Xoshiro256PlusPlus`` on 64-bit targets."""

    def __init__(self, s0: int, s1: int, s2: int, s3: int):
        self.s = [s0 & _M64, s1 & _M64, s2 & _M64, s3 & _M64]

    @classmethod
    def seed_from_u64(cls, seed: int) -> "SmallRng":
        sm = SplitMix64(seed)
        return cls(sm.next_u64(), sm.next_u64(), sm.next_u64(), sm.next_u64())

    def next_u64(self) -> int:
        s = self.s
        result = (_rotl64((s[0] + s[3]) & _M64, 23) + s[0]) & _M64
        t = (s[1] << 17) & _M64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = _rotl64(s[3], 45)
        return result

    def next_u32(self) -> int:
        # rand_core::impls::next_u32_via_u64 — low 32 bits
        return self.next_u64() & 0xFFFFFFFF

    def fill_bytes(self, n: int) -> bytes:
        # rand_core::impls::fill_bytes_via_next — u64 little-endian chunks
        out = bytearray()
        while len(out) < n:
            out += self.next_u64().to_bytes(8, "little")
        return bytes(out[:n])

    # ---- StandardUniform field sampling -------------------------------

    def sample_monty31(self, p: int) -> int:
        """Montgomery-form residue for a 31-bit Monty field."""
        while True:
            v = self.next_u32() >> 1
            if v < p:
                return v

    def sample_mersenne31(self) -> int:
        p = (1 << 31) - 1
        while True:
            v = self.next_u32() >> 1
            if v != p:
                return v

    def sample_goldilocks(self) -> int:
        p = (1 << 64) - (1 << 32) + 1
        while True:
            v = self.next_u64()
            if v < p:
                return v

    def sample_bn254_monty(self, p: int) -> int:
        """Montgomery-form residue for BN254 Fr (`bn254/src/field.rs:534-551`).

        The reference samples `rng.random::<[u8; 32]>()`: rand 0.9's
        StandardUniform for `[u8; N]` draws each byte SEPARATELY, and each
        u8 draw is `next_u32() as u8` — i.e. the low byte of a full
        `next_u64()` (rand_xoshiro truncates next_u32 from next_u64).
        NOT `fill_bytes` semantics (that would pack 8 bytes per draw)."""
        while True:
            b = bytearray(self.next_u64() & 0xFF for _ in range(32))
            b[31] &= (1 << 6) - 1
            v = int.from_bytes(bytes(b), "little")
            if v < p:
                return v


def sample_field_monty(rng: SmallRng, F) -> int:
    """One StandardUniform draw, returned in the field's NATIVE stored form
    (Montgomery residue for Monty fields, canonical otherwise)."""
    p = F.order
    name = getattr(F, "name", "")
    if name == "Mersenne31":
        return rng.sample_mersenne31()
    if name == "Goldilocks":
        return rng.sample_goldilocks()
    if p < (1 << 32):
        return rng.sample_monty31(p)
    return rng.sample_bn254_monty(p)


def sample_field_canonical(rng: SmallRng, F) -> int:
    """One StandardUniform draw, converted to the CANONICAL integer value
    (undoing the Montgomery representation for Monty fields — the rand
    draw lands directly in stored/Monty form, see module docstring)."""
    v = sample_field_monty(rng, F)
    r = getattr(F, "R_int", None)
    if r is not None:  # Monty-represented field (MontyField31 / BigPrimeField)
        return int(v) * pow(r, -1, F.order) % F.order
    return int(v)


def poseidon2_constants_from_rng(F, width: int, rounds_f: int, rounds_p: int,
                                 seed: int = 1, rng: SmallRng | None = None):
    """(external (rounds_f, width), internal (rounds_p,)) CANONICAL integer
    constants, in the exact draw order of ``new_from_rng``
    (`poseidon2/src/lib.rs:66-74`, `external.rs:199-211`: initial half,
    terminal half, then internal singles).

    Pass a shared ``rng`` to replicate multi-instance draw order — the
    reference threads ONE rng through consecutive constructions
    (`examples/src/tests.rs:57-59`: AIR constants, perm16, perm24)."""
    import numpy as np

    if rng is None:
        rng = SmallRng.seed_from_u64(seed)
    half_f = rounds_f // 2
    big = F.order >= (1 << 63)
    dt = object if big else np.uint64
    ext = np.zeros((rounds_f, width), dtype=dt)
    for r in range(half_f):  # initial
        for i in range(width):
            ext[r, i] = sample_field_canonical(rng, F)
    for r in range(half_f, rounds_f):  # terminal
        for i in range(width):
            ext[r, i] = sample_field_canonical(rng, F)
    internal = np.zeros(rounds_p, dtype=dt)
    for r in range(rounds_p):
        internal[r] = sample_field_canonical(rng, F)
    return ext, internal
