"""Benchmark harness — prints one JSON line per completed config:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Output is STAGED (VERDICT round 1, next-round item 1): the fast config-1
result (BabyBear 2^13 Poseidon2 perms, poseidon-2 merkle — BASELINE.md
config 1) is emitted and flushed as soon as it is measured, so a driver
timeout during the later, heavier config still leaves a parsed result.
If wall-clock budget remains, the README headline config (KoalaBear 2^20
Poseidon2 perms, keccak-f merkle — /root/reference/README.md:69,
BASELINE.md config 2) is measured and emitted as a second line.

Timing matches the reference's bench: `prove` only (trace generation and
verification excluded from the timed region; warmup compiles prove once).

Environment knobs:
  BENCH_LOG_N      log2 perms for config 1 (default 13)
  BENCH_FIELD      config-1 field: BabyBear | KoalaBear (default BabyBear)
  BENCH_BUDGET_S   total wall budget in seconds (default 480); the headline
                   config only starts if enough budget remains
  BENCH_HEADLINE   "0" disables the 2^20 headline attempt entirely
  BENCH_HEADLINE_LOG_N  log2 perms for the headline (default 20)

vs_baseline: the reference publishes no numbers (BASELINE.json
`"published": {}`); we report against a provisional north-star target of
100k perms/s until the Rust reference is measured on a pinned host
(BASELINE.md, 'To establish absolute reference numbers').
"""

import json
import os
import sys
import time

START = time.perf_counter()
TARGET_PERMS_PER_SEC = 100_000.0


def _log(msg: str) -> None:
    print(f"# [{time.perf_counter() - START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _budget_left() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "480")) - (time.perf_counter() - START)


def _emit(metric, perms_per_sec):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(perms_per_sec, 2),
                "unit": "perms/s",
                "vs_baseline": round(perms_per_sec / TARGET_PERMS_PER_SEC, 4),
            }
        ),
        flush=True,
    )


def _build_config(F, EF, log_n, merkle_hash):
    import numpy as np

    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.commit import MerkleTreeMmcs
    from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
    from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation
    from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air
    from plonky3_eon_tpu.stark import StarkConfig

    p2 = Poseidon2(F, 16)
    air = Poseidon2Air(p2)
    if merkle_hash == "poseidon-2":
        hasher = PaddingFreeSponge(p2, 16, 8, 8)
        compressor = TruncatedPermutation(p2, 2, 8, 16)
    else:  # keccak-f (README.md:69 headline recipe)
        from plonky3_eon_tpu.hashes import (
            CompressionFunctionFromHasher,
            KeccakU64Sponge,
            SerializingHasher,
            keccak_f,
        )

        hasher = SerializingHasher(F, KeccakU64Sponge(keccak_f))
        compressor = CompressionFunctionFromHasher(hasher, 2, 8)
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
    inputs = F.from_int(rng.integers(0, F.order, size=(1 << log_n, 16), dtype=np.uint64))
    _log(f"generating witness trace 2^{log_n}")
    trace = air.generate_trace(inputs)
    trace.block_until_ready()
    _log("trace ready")
    return config, air, trace


def _measure_prove(config, air, trace, iters):
    from plonky3_eon_tpu.stark import prove

    _log("warmup prove (cold compile)")

    prove(config, air, trace, [])  # warmup: compile everything once
    _log("warmup done; timing")
    t0 = time.perf_counter()
    for _ in range(iters):
        prove(config, air, trace, [])
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    # Persistent compilation cache: prover stages compile once per shape;
    # later runs (and the driver's repeat invocations) hit the disk cache.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/p3tpu_xla")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from plonky3_eon_tpu.fields import BabyBear, BabyBear4, KoalaBear, KoalaBear4

    # ---- config 1: fast, always emitted first ---------------------------
    log_n = int(os.environ.get("BENCH_LOG_N", "13"))
    field_name = os.environ.get("BENCH_FIELD", "BabyBear")
    F, EF = (BabyBear, BabyBear4) if field_name == "BabyBear" else (KoalaBear, KoalaBear4)
    _log(f"devices: {jax.devices()}")
    _log(f"building config 1: {field_name} 2^{log_n} poseidon-2 merkle")
    config, air, trace = _build_config(F, EF, log_n, "poseidon-2")
    elapsed = _measure_prove(config, air, trace, iters=3)
    _emit(f"poseidon2_perms_proven_per_sec_{field_name}_2^{log_n}", (1 << log_n) / elapsed)
    _log("config 1 emitted")

    # ---- headline: KoalaBear 2^20, keccak-f merkle (README.md:69) --------
    if os.environ.get("BENCH_HEADLINE", "1") == "0":
        return
    hl_log_n = int(os.environ.get("BENCH_HEADLINE_LOG_N", "20"))
    # Leave room for one cold compile (~120s worst case over the tunnel)
    # plus a warmup prove and one timed prove at 2^20.
    if _budget_left() < 240.0:
        print(f"# skipping headline config: {_budget_left():.0f}s budget left",
              file=sys.stderr, flush=True)
        return
    try:
        config, air, trace = _build_config(KoalaBear, KoalaBear4, hl_log_n, "keccak-f")
        elapsed = _measure_prove(config, air, trace, iters=1)
        _emit(f"poseidon2_perms_proven_per_sec_KoalaBear_keccakf_2^{hl_log_n}",
              (1 << hl_log_n) / elapsed)
    except Exception as e:  # headline failure must not eat the config-1 line
        print(f"# headline config failed: {e!r}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
