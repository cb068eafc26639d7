"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md config 2, TPU-native recipe): prove 2^20
Poseidon2 width-16 permutations over KoalaBear, FRI log_blowup 1,
100 queries, 16-bit PoW, Poseidon2 merkle hashing. The reference's
README.md:69 recipe hashes the merkle tree with keccak-f because keccak
is the cheap hash on CPU SIMD; on TPU keccak is VPU-bound bitwise work
while Poseidon2 rides the same modular-mul lanes as everything else, so
the TPU-native recipe keeps the workload (2^20 Poseidon2 perms proven)
and swaps the tree hash. Set BENCH_MERKLE=keccak-f to measure the exact
CPU recipe.

Robustness (VERDICT r1 item 1): a fallback config (2^13, same stack) is
measured FIRST but not emitted; a watchdog thread emits it if the
headline hasn't produced a line by the time the budget is nearly spent,
so a driver kill during the 2^20 phase still leaves a parsed result.
Exactly one JSON line is printed in every outcome.

Timing matches the reference's bench: `prove` only (trace generation and
verification excluded; warmup compiles everything once).

Environment knobs:
  BENCH_LOG_N           log2 perms for the fallback config (default 13)
  BENCH_FIELD           fallback field: BabyBear | KoalaBear (default BabyBear)
  BENCH_BUDGET_S        wall budget in seconds (default 480)
  BENCH_HEADLINE        "0" disables the 2^20 headline (fallback only)
  BENCH_HEADLINE_LOG_N  log2 perms for the headline (default 20)
  BENCH_MERKLE          headline merkle hash: poseidon-2 (default) | keccak-f

vs_baseline: the reference publishes no numbers (BASELINE.json
`"published": {}`); we report against the provisional north-star target
of 100k perms/s (BASELINE.md).
"""

import json
import os
import sys
import threading
import time

START = time.perf_counter()
TARGET_PERMS_PER_SEC = 100_000.0

_emit_lock = threading.Lock()
_emitted = False


def _log(msg: str) -> None:
    print(f"# [{time.perf_counter() - START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _budget_left() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "480")) - (time.perf_counter() - START)


def _emit(metric, perms_per_sec):
    """Print the single result line (first caller wins)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
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
    else:  # keccak-f (README.md:69 CPU recipe)
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

    from plonky3_eon_tpu.utils import warm_transfer_channel

    warm_transfer_channel()  # overlap the axon d2h claim with the cold path

    from plonky3_eon_tpu.fields import BabyBear, BabyBear4, KoalaBear, KoalaBear4

    _log(f"devices: {jax.devices()}")

    # ---- fallback config: measured first, emitted only by the watchdog
    # (or if the headline is disabled/skipped) -----------------------------
    log_n = int(os.environ.get("BENCH_LOG_N", "13"))
    field_name = os.environ.get("BENCH_FIELD", "BabyBear")
    F, EF = (BabyBear, BabyBear4) if field_name == "BabyBear" else (KoalaBear, KoalaBear4)
    _log(f"building fallback config: {field_name} 2^{log_n} poseidon-2 merkle")
    config, air, trace = _build_config(F, EF, log_n, "poseidon-2")
    elapsed = _measure_prove(config, air, trace, iters=3)
    fb_metric = f"poseidon2_perms_proven_per_sec_{field_name}_2^{log_n}"
    fb_value = (1 << log_n) / elapsed
    _log(f"fallback measured: {fb_value:.0f} perms/s (held)")

    headline_on = os.environ.get("BENCH_HEADLINE", "1") != "0"
    hl_log_n = int(os.environ.get("BENCH_HEADLINE_LOG_N", "20"))
    merkle = os.environ.get("BENCH_MERKLE", "poseidon-2")

    # Leave room for trace gen (~15s warm) + one cold-ish prove + one
    # timed prove at 2^20 (~3s each warm; minutes if the XLA disk cache
    # is somehow cold — hence the watchdog).
    if not headline_on or _budget_left() < 60.0:
        _emit(fb_metric, fb_value)
        _log("headline skipped; fallback emitted")
        return

    # Watchdog: if the headline hasn't emitted by budget-15s, emit the
    # fallback so a driver kill still leaves a parsed line.
    def _watchdog():
        while _budget_left() > 15.0:
            if _emitted:
                return
            time.sleep(1.0)
        _emit(fb_metric, fb_value)
        _log("watchdog emitted fallback (headline still running)")

    threading.Thread(target=_watchdog, daemon=True).start()

    try:
        config, air, trace = _build_config(KoalaBear, KoalaBear4, hl_log_n, merkle)
        elapsed = _measure_prove(config, air, trace, iters=1)
        tag = "" if merkle == "poseidon-2" else "_keccakf"
        _emit(f"poseidon2_perms_proven_per_sec_KoalaBear{tag}_2^{hl_log_n}",
              (1 << hl_log_n) / elapsed)
        _log("headline emitted")
    except Exception as e:  # headline failure must not eat the result
        _log(f"headline config failed: {e!r}")
        _emit(fb_metric, fb_value)


if __name__ == "__main__":
    main()
