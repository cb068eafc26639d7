#!/usr/bin/env python
"""CLI harness: prove a batch of hash permutations over a 31-bit field.

Reference parity: `examples/examples/prove_prime_field_31.rs:33-56` (clap
CLI: field x objective x dft x merkle-hash selection),
`examples/src/proofs.rs:82-235` (config assembly), `parsers.rs:12-34`.

Usage:
  python examples/prove_prime_field_31.py \
      --field koala-bear --objective poseidon-2-permutations \
      --log-trace-length 13 --merkle-hash poseidon-2 [--tpu]

Prints a tracing-forest-style phase timing tree and the proof size.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    # mersenne-31 selects the circle-STARK engine (CirclePcs over the CFFT;
    # ref `examples/src/parsers.rs:12-34`, `proofs.rs:162-198`)
    ap.add_argument(
        "--field",
        choices=["baby-bear", "koala-bear", "mersenne-31"],
        default="koala-bear",
    )
    ap.add_argument(
        "--objective",
        choices=[
            "poseidon-2-permutations",
            "keccak-f-permutations",
            "blake-3-permutations",
            "fibonacci",
        ],
        default="poseidon-2-permutations",
    )
    ap.add_argument("--log-trace-length", type=int, default=10)
    ap.add_argument(
        "--discrete-fourier-transform",
        choices=["radix-2-dit-parallel", "recursive-dft", "small-batch-dft"],
        default="radix-2-dit-parallel",  # all lower to the same fused program
    )
    ap.add_argument("--merkle-hash", choices=["poseidon-2", "keccak-f"], default="poseidon-2")
    ap.add_argument("--log-blowup", type=int, default=1)
    ap.add_argument("--num-queries", type=int, default=100)
    ap.add_argument("--pow-bits", type=int, default=16)
    ap.add_argument("--log-final-poly-len", type=int, default=5)
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend (default: CPU)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        # env var alone is overridden by the harness's axon plugin
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/p3tpu_xla" if args.tpu else "~/.cache/p3tpu_xla_cpu")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.commit.merkle import MerkleTreeMmcs
    from plonky3_eon_tpu.fields import BabyBear, BabyBear4, KoalaBear, KoalaBear4
    from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
    from plonky3_eon_tpu.hashes import (
        KeccakF,
        PaddingFreeSponge,
        Poseidon2,
        TruncatedPermutation,
    )
    from plonky3_eon_tpu.stark import StarkConfig, prove, verify
    from plonky3_eon_tpu.stark.serde import report_proof_size, serialize_proof
    from plonky3_eon_tpu.utils.tracing import enable_tracing, span, tracing_report

    if args.field == "baby-bear":
        F, EF = BabyBear, BabyBear4
    elif args.field == "koala-bear":
        F, EF = KoalaBear, KoalaBear4
    else:  # mersenne-31: circle STARK (quartic challenge field)
        from plonky3_eon_tpu.fields import Mersenne31, Mersenne31Quartic

        F, EF = Mersenne31, Mersenne31Quartic
    rng = np.random.default_rng(0)
    n = 1 << args.log_trace_length

    # ---- AIR + witness --------------------------------------------------
    if args.objective == "poseidon-2-permutations":
        from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air

        p2 = Poseidon2(F, 16)
        air = Poseidon2Air(p2)
        inputs = F.from_int(rng.integers(0, F.order, size=(n, 16), dtype=np.uint64))
        trace = air.generate_trace(inputs)
    elif args.objective == "keccak-f-permutations":
        from plonky3_eon_tpu.models.keccak_air import NUM_ROUNDS, KeccakAir

        air = KeccakAir()
        perms = max(1, n // NUM_ROUNDS)
        inputs = rng.integers(0, 1 << 64, size=(perms, 25), dtype=np.uint64)
        trace = air.generate_trace(F, inputs)
    elif args.objective == "blake-3-permutations":
        from plonky3_eon_tpu.models.blake3_air import Blake3Air

        air = Blake3Air()
        msgs = rng.integers(0, 1 << 32, size=(n, 16), dtype=np.uint32)
        trace = air.generate_trace(F, msgs)
    else:
        from plonky3_eon_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace

        air = FibonacciAir()
        trace, x_last = generate_fibonacci_trace(F, n)

    # ---- config assembly (ref: proofs.rs:82-235) -------------------------
    if args.merkle_hash == "poseidon-2":
        perm = Poseidon2(F, 16)
        hasher = PaddingFreeSponge(perm, 16, 8, 8)
        compressor = TruncatedPermutation(perm, 2, 8, 16)
    else:
        from plonky3_eon_tpu.hashes import (
            CompressionFunctionFromHasher,
            KeccakU64Sponge,
            SerializingHasher,
            keccak_f,
        )

        hasher = SerializingHasher(F, KeccakU64Sponge(keccak_f))
        compressor = CompressionFunctionFromHasher(hasher, 2, 8)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    if args.field == "mersenne-31":
        # circle-STARK PCS: M31 is not two-adic in the multiplicative
        # sense; commitments ride the CFFT over the circle group
        from plonky3_eon_tpu.circle.pcs import CircleFriConfig, CirclePcs

        pcs = CirclePcs(
            EF, mmcs, mmcs,
            CircleFriConfig(args.log_blowup, args.num_queries, args.pow_bits),
        )
    else:
        pcs = TwoAdicFriPcs(
            F, EF, mmcs, mmcs,
            FriConfig(args.log_blowup, args.num_queries, args.pow_bits,
                      args.log_final_poly_len),
        )
    ch_perm = Poseidon2(F, 16)
    config = StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, ch_perm, 16, 8),
    )

    # ---- prove + verify ---------------------------------------------------
    pvs = [0, 1, x_last] if args.objective == "fibonacci" else []
    enable_tracing(True)
    import jax.numpy as jnp

    jnp.asarray(trace).block_until_ready()
    print(f"trace: {trace.shape[0]} x {trace.shape[1]} over {F.name}", flush=True)
    t0 = time.perf_counter()
    with span("prove (cold, incl. compile)"):
        proof = prove(config, air, trace, pvs)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    with span("prove (warm)"):
        proof = prove(config, air, trace, pvs)
    t_warm = time.perf_counter() - t0
    with span("verify"):
        verify(config, air, proof, pvs)
    print(tracing_report())
    print(f"prove: cold {t_cold:.2f}s, warm {t_warm:.2f}s")
    print(f"proof size: {report_proof_size(proof)} bytes")


if __name__ == "__main__":
    main()
