"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md config 1): Poseidon2 permutations proven per
second, end-to-end uni-stark prove (trace gen excluded, matching the
reference's bench which times `prove`). Runs on whatever jax.devices()
offers (the driver runs it on one real TPU chip).

Environment knobs:
  BENCH_LOG_N   log2 number of permutations per proof (default 13)
  BENCH_FIELD   BabyBear | KoalaBear (default BabyBear)

vs_baseline: the reference publishes no numbers (BASELINE.json
`"published": {}`); we report against a provisional north-star target of
100k perms/s for the 2^13 config until the Rust reference is measured on a
pinned host (BASELINE.md, 'To establish absolute reference numbers').
"""

import json
import os
import time


def main():
    import jax

    # Persistent compilation cache: prover stages compile once per shape;
    # later runs (and the driver's repeat invocations) hit the disk cache.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/p3tpu_xla")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.commit import MerkleTreeMmcs
    from plonky3_eon_tpu.fields import BabyBear, BabyBear4, KoalaBear, KoalaBear4
    from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
    from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
    from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air
    from plonky3_eon_tpu.stark import StarkConfig, prove, verify

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    field_name = os.environ.get("BENCH_FIELD", "KoalaBear")
    F, EF = (BabyBear, BabyBear4) if field_name == "BabyBear" else (KoalaBear, KoalaBear4)

    n = 1 << log_n
    p2 = Poseidon2(F, 16)
    air = Poseidon2Air(p2)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    compressor = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    pcs = TwoAdicFriPcs(
        F, EF, mmcs, mmcs,
        FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16,
                  log_final_poly_len=int(os.environ.get("BENCH_LOG_FINAL_POLY", "7"))),
    )
    config = StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )

    rng = np.random.default_rng(0)
    inputs = F.from_int(rng.integers(0, F.order, size=(n, 16), dtype=np.uint64))
    trace = air.generate_trace(inputs)
    trace.block_until_ready()

    # warmup: compile everything once
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])

    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        prove(config, air, trace, [])
    elapsed = (time.perf_counter() - t0) / iters

    perms_per_sec = n / elapsed
    target = 100_000.0  # provisional north-star target for 2^13 config
    print(
        json.dumps(
            {
                "metric": f"poseidon2_perms_proven_per_sec_{field_name}_2^{log_n}",
                "value": round(perms_per_sec, 2),
                "unit": "perms/s",
                "vs_baseline": round(perms_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
