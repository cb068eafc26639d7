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

Ordering (VERDICT r3 item 1): the HEADLINE runs FIRST — it is the number
that matters, and r3 lost it because a fallback-first watchdog fired
during the 2^20 cold compile. The headline runs in a worker thread; the
main thread is a sentinel that starts measuring the cheap 2^13 fallback
only if the headline is still compiling close to the budget, and a
watchdog emits the best available number before the budget expires.
Exactly one JSON line is printed in every outcome.

Compile latency: stages cache into the repo-local `.xla_cache`
persistent XLA compilation cache (committed to the repo), so the
driver's bench invocation hits warm compiles. Cold-compile behavior is
still covered by the sentinel + a 1350s budget (driver demonstrably
allows >=1400s: r2 finished at 657s rc=0, r3 at 1403s rc=0).

Timing matches the reference's bench: `prove` only (trace generation and
verification excluded; warmup compiles everything once).

Poseidon2 instance: constants drawn from SmallRng seed 1 exactly like
the reference's examples (`examples/src/tests.rs:36`) via
`poseidon2_from_rng`; the upstream internal-diagonal vectors lived in
the removed per-field crates, so the documented deterministic diag is
used (see `hashes/poseidon2.py:poseidon2_from_rng`).

Environment knobs:
  BENCH_LOG_N           log2 perms for the fallback config (default 13)
  BENCH_FIELD           fallback field: BabyBear | KoalaBear (default BabyBear)
  BENCH_BUDGET_S        wall budget in seconds (default 1350)
  BENCH_HEADLINE        "0" disables the 2^20 headline (fallback only)
  BENCH_HEADLINE_LOG_N  log2 perms for the headline (default 20)
  BENCH_MERKLE          headline merkle hash: poseidon-2 (default) | keccak-f
  BENCH_EXTRA           comma list of extra stderr-only benches (default
                        "keccakf-headline,circle,kzg" — budget permitting):
                        keccakf-headline (2^20 headline with the reference
                          recipe's keccak-f merkle hash, config 2 exact),
                        circle (M31 circle-STARK Poseidon2 2^16, config 4),
                        kzg (BN254 KZG commit/open 2^20, BASELINE config 5),
                        keccak-air (KoalaBear keccak-f AIR 2^17, config 3),
                        blake3-air (KoalaBear blake3 AIR 2^17, config 3)
  BENCH_PROFILE         "0" disables the phase-profile report (default on)
  BENCH_CACHE_DIR       XLA persistent cache dir (default <repo>/.xla_cache)

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
REPO = os.path.dirname(os.path.abspath(__file__))

_emit_lock = threading.Lock()
_emitted = False

#: best measurement so far: (metric, perms_per_sec) — the watchdog's ammo
_best = None


def _log(msg: str) -> None:
    print(f"# [{time.perf_counter() - START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _budget() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "1350"))


def _budget_left() -> float:
    return _budget() - (time.perf_counter() - START)


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


def _make_stark_config(F, EF, merkle_hash):
    """(StarkConfig, width-16 Poseidon2) for a given field + merkle hash."""
    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.commit import MerkleTreeMmcs
    from plonky3_eon_tpu.fri import FriConfig, TwoAdicFriPcs
    from plonky3_eon_tpu.hashes import (
        PaddingFreeSponge,
        TruncatedPermutation,
        poseidon2_from_rng,
    )
    from plonky3_eon_tpu.stark import StarkConfig

    # seed-1 rng-exact round constants, matching the reference's
    # constants-from-rng convention (examples/src/tests.rs:36)
    p2 = poseidon2_from_rng(F, 16, seed=1)
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
    return StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    ), p2


def _build_config(F, EF, log_n, merkle_hash):
    import numpy as np

    from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air

    config, p2 = _make_stark_config(F, EF, merkle_hash)
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(0)
    inputs = F.from_int(rng.integers(0, F.order, size=(1 << log_n, 16), dtype=np.uint64))
    _log(f"generating witness trace 2^{log_n}")
    trace = air.generate_trace(inputs)
    trace.block_until_ready()
    _log("trace ready")
    return config, air, trace


def _measure_prove(config, air, trace, iters, tag=""):
    from plonky3_eon_tpu.stark import prove

    from plonky3_eon_tpu.utils.tracing import enable_tracing, tracing_report

    _log(f"warmup prove{tag} (compiling uncached stages)")
    t0 = time.perf_counter()
    enable_tracing(True)
    try:
        prove(config, air, trace, [])  # warmup: compile everything once
    finally:
        enable_tracing(False)
    _log(f"warmup done in {time.perf_counter() - t0:.1f}s; timing")
    for line in tracing_report().splitlines():
        _log(f"warmup{tag}: {line}")
    t0 = time.perf_counter()
    for _ in range(iters):
        prove(config, air, trace, [])
    return (time.perf_counter() - t0) / iters


def _profile_prove(config, air, trace):
    """One traced prove: phase-span tree + challenger-duplex count to
    stderr (VERDICT r3 item 2: time challenger vs PCS vs fold)."""
    from plonky3_eon_tpu.stark import prove
    from plonky3_eon_tpu.utils.tracing import enable_tracing, tracing_report

    ch = config.new_challenger()
    n_duplex = {"n": 0}
    orig = type(ch)._duplex

    def counting(self):
        n_duplex["n"] += 1
        return orig(self)

    type(ch)._duplex = counting
    enable_tracing(True)
    t0 = time.perf_counter()
    try:
        prove(config, air, trace, [])
    finally:
        type(ch)._duplex = orig
    total = time.perf_counter() - t0
    _log(f"profile: one prove = {total * 1e3:.0f}ms, "
         f"{n_duplex['n']} host duplex calls")
    for line in tracing_report().splitlines():
        _log(f"profile: {line}")
    enable_tracing(False)


def _bench_kzg():
    """BASELINE config 5: BN254 KZG commit + open at 2^20 coefficients
    (Pippenger MSM at scale; SRS built by the device fixed-base path).
    stderr only."""
    import numpy as np

    from plonky3_eon_tpu.challenger import MultiField32Challenger
    from plonky3_eon_tpu.fields import BabyBear
    from plonky3_eon_tpu.fields.bigfield import Bn254Fr as Fr
    from plonky3_eon_tpu.hashes import poseidon2_from_rng
    from plonky3_eon_tpu.kzg import KzgPcs, KzgSrs

    log_n = int(os.environ.get("BENCH_KZG_LOG_N", "20"))
    n = 1 << log_n
    _log(f"kzg: building 2^{log_n} SRS (device fixed-base)")
    t0 = time.perf_counter()
    srs = KzgSrs.unsafe_new(123456789123456789, n)
    _log(f"kzg: srs ready in {time.perf_counter() - t0:.1f}s")
    pcs = KzgPcs(srs)
    domain = pcs.natural_domain_for_degree(n)
    rng = np.random.default_rng(0)
    evals = Fr.from_int(rng.integers(0, 1 << 63, size=(n, 1), dtype=np.uint64))
    _log("kzg: warmup commit (cold compile)")
    pcs.commit([(domain, evals)])[0]
    t0 = time.perf_counter()
    com, pd = pcs.commit([(domain, evals)])
    np.asarray(com)
    t_commit = time.perf_counter() - t0
    _log(f"kzg: commit 2^{log_n} = {t_commit:.3f}s "
         f"({n / t_commit / 1e6:.2f} M coeff/s)")
    p2_bn = poseidon2_from_rng(Fr, 3, seed=42)
    ch = MultiField32Challenger(BabyBear, Fr, p2_bn, 3, 2)
    zeta = Fr.from_int(np.asarray([12345], dtype=np.uint64))[0]
    _log("kzg: warmup open")
    pcs.open([(pd, [[zeta]])], ch)
    t0 = time.perf_counter()
    pcs.open([(pd, [[zeta]])], ch)
    t_open = time.perf_counter() - t0
    _log(f"kzg: open 2^{log_n} = {t_open:.3f}s")


def _bench_keccakf_headline(hl_log_n: int):
    """The reference recipe EXACTLY (README.md:69 / BASELINE config 2):
    2^20 KoalaBear Poseidon2 perms with keccak-f merkle hashing. stderr
    only (the JSON headline is the TPU-native poseidon-2-merkle recipe);
    VERDICT r4 item 2 demands a measured number for this variant."""
    from plonky3_eon_tpu.fields import KoalaBear, KoalaBear4

    config, air, trace = _build_config(KoalaBear, KoalaBear4, hl_log_n, "keccak-f")
    elapsed = _measure_prove(config, air, trace, iters=1, tag=f"-keccakf 2^{hl_log_n}")
    value = (1 << hl_log_n) / elapsed
    _log(f"keccakf-headline: {value:.0f} perms/s "
         f"(2^{hl_log_n} KoalaBear Poseidon2 perms, keccak-f merkle; "
         f"vs 100k target = {value / TARGET_PERMS_PER_SEC:.2f}x)")


def _bench_circle():
    """BASELINE config 4: Mersenne31 circle-STARK — CirclePcs over the
    CFFT, Poseidon2 merkle, 2^16 Poseidon2 perms proven. stderr only.
    (Ref recipe: examples/src/proofs.rs:162-198 m31_keccak; first measured
    number for the circle engine — VERDICT r4 item 4.)"""
    import numpy as np

    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.circle.pcs import CircleFriConfig, CirclePcs
    from plonky3_eon_tpu.commit import MerkleTreeMmcs
    from plonky3_eon_tpu.fields import Mersenne31, Mersenne31Quartic
    from plonky3_eon_tpu.hashes import (
        PaddingFreeSponge,
        Poseidon2,
        TruncatedPermutation,
    )
    from plonky3_eon_tpu.models.poseidon2_air import Poseidon2Air
    from plonky3_eon_tpu.stark import StarkConfig, prove

    F, EF = Mersenne31, Mersenne31Quartic
    log_n = int(os.environ.get("BENCH_CIRCLE_LOG_N", "16"))
    p2 = Poseidon2(F, 16)
    hasher = PaddingFreeSponge(p2, 16, 8, 8)
    compressor = TruncatedPermutation(p2, 2, 8, 16)
    mmcs = MerkleTreeMmcs(hasher, compressor)
    pcs = CirclePcs(EF, mmcs, mmcs, CircleFriConfig(1, 100, 16))
    config = StarkConfig(
        F=F, EF=EF, pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(F, p2, 16, 8),
    )
    air = Poseidon2Air(p2)
    rng = np.random.default_rng(0)
    inputs = F.from_int(rng.integers(0, F.order, size=(1 << log_n, 16),
                                     dtype=np.uint64))
    _log(f"circle: generating witness trace 2^{log_n}")
    trace = air.generate_trace(inputs)
    trace.block_until_ready()
    _log("circle: trace ready; warmup prove")
    prove(config, air, trace, [])
    t0 = time.perf_counter()
    prove(config, air, trace, [])
    dt = time.perf_counter() - t0
    _log(f"circle: M31 CirclePcs prove 2^{log_n} Poseidon2 perms = {dt:.3f}s "
         f"({(1 << log_n) / dt:.0f} perms/s)")


def _bench_hash_air(which: str):
    """BASELINE config 3: keccak-f / blake3 AIR over KoalaBear. stderr only."""
    import numpy as np

    from plonky3_eon_tpu.fields import KoalaBear, KoalaBear4
    from plonky3_eon_tpu.stark import prove

    log_rows = int(os.environ.get("BENCH_AIR_LOG_N", "17"))
    base_cfg, _p2 = _make_stark_config(KoalaBear, KoalaBear4, "poseidon-2")
    rng = np.random.default_rng(0)
    if which == "keccak-air":
        from plonky3_eon_tpu.models.keccak_air import KeccakAir

        air = KeccakAir()
        n_perms = (1 << log_rows) // 24
        inputs = rng.integers(0, np.uint64(1) << 63, size=(n_perms, 25),
                              dtype=np.uint64)
        _log(f"{which}: generating trace ({n_perms} perms, ~2^{log_rows} rows)")
        trace = air.generate_trace(KoalaBear, inputs)
    else:
        from plonky3_eon_tpu.models.blake3_air import Blake3Air

        air = Blake3Air()
        inputs = rng.integers(0, 1 << 32, size=(1 << log_rows, 16),
                              dtype=np.uint64).astype(np.uint32)
        _log(f"{which}: generating trace (2^{log_rows} rows)")
        trace = air.generate_trace(KoalaBear, inputs)
    trace.block_until_ready()
    _log(f"{which}: trace ready {tuple(trace.shape)}; warmup prove")
    prove(base_cfg, air, trace, [])
    t0 = time.perf_counter()
    prove(base_cfg, air, trace, [])
    dt = time.perf_counter() - t0
    n_rows = int(trace.shape[0])
    _log(f"{which}: prove {n_rows} rows x {trace.shape[1]} cols = {dt:.3f}s "
         f"({n_rows / dt:.0f} rows/s)")


def main():
    import jax

    # Persistent compilation cache: prover stages compile once per shape;
    # the repo-local cache dir is committed so the driver's invocation
    # (and any fresh checkout on the same image) hits warm compiles.
    cache_dir = os.environ.get("BENCH_CACHE_DIR", os.path.join(REPO, ".xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        cache_dir = os.path.expanduser("~/.cache/p3tpu_xla")
        os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from plonky3_eon_tpu.utils import warm_transfer_channel

    warm_transfer_channel()  # overlap the axon d2h claim with the cold path

    from plonky3_eon_tpu.fields import BabyBear, BabyBear4, KoalaBear, KoalaBear4

    _log(f"devices: {jax.devices()}")
    _log(f"xla cache: {cache_dir} "
         f"({len(os.listdir(cache_dir))} entries)")

    global _best
    headline_on = os.environ.get("BENCH_HEADLINE", "1") != "0"
    hl_log_n = int(os.environ.get("BENCH_HEADLINE_LOG_N", "20"))
    merkle = os.environ.get("BENCH_MERKLE", "poseidon-2")

    log_n = int(os.environ.get("BENCH_LOG_N", "13"))
    field_name = os.environ.get("BENCH_FIELD", "BabyBear")
    F, EF = (BabyBear, BabyBear4) if field_name == "BabyBear" else (KoalaBear, KoalaBear4)
    fb_metric = f"poseidon2_perms_proven_per_sec_{field_name}_2^{log_n}"

    # Watchdog: emit whatever has been measured before the budget expires.
    def _watchdog():
        while _budget_left() > 20.0:
            if _emitted:
                return
            time.sleep(1.0)
        if _best is not None:
            _emit(*_best)
            _log(f"watchdog emitted {_best[0]} (headline still running)")

    threading.Thread(target=_watchdog, daemon=True).start()

    hl_done = threading.Event()

    def _run_headline():
        global _best
        try:
            config, air, trace = _build_config(KoalaBear, KoalaBear4, hl_log_n, merkle)
            elapsed = _measure_prove(config, air, trace, iters=1, tag=f" 2^{hl_log_n}")
            tag = "" if merkle == "poseidon-2" else "_keccakf"
            metric = f"poseidon2_perms_proven_per_sec_KoalaBear{tag}_2^{hl_log_n}"
            value = (1 << hl_log_n) / elapsed
            _log(f"headline measured: {value:.0f} perms/s")
            _emit(metric, value)
        except Exception as e:  # headline failure must not eat the result
            _log(f"headline config failed: {e!r}")
        finally:
            hl_done.set()

    if headline_on:
        t = threading.Thread(target=_run_headline, daemon=True)
        t.start()
        # Sentinel: give the headline the whole budget minus what a
        # fallback measurement needs cold (~300s). If it lands earlier
        # (warm cache: a couple of minutes), move on immediately.
        hl_done.wait(timeout=max(_budget_left() - 340.0, 0.0))
        if not hl_done.is_set():
            _log("sentinel: headline still compiling; measuring fallback concurrently")

    if not _emitted:
        # fallback measurement — either the headline is off, failed, or is
        # still compiling (in which case this arms the watchdog).
        try:
            config, air, trace = _build_config(F, EF, log_n, "poseidon-2")
            elapsed = _measure_prove(config, air, trace, iters=3, tag=f" 2^{log_n}")
            fb_value = (1 << log_n) / elapsed
            _best = (fb_metric, fb_value)
            _log(f"fallback measured: {fb_value:.0f} perms/s (held)")
        except Exception as e:
            _log(f"fallback failed: {e!r}")
        if headline_on:
            hl_done.wait(timeout=max(_budget_left() - 25.0, 0.0))
        if not _emitted and _best is not None:
            _emit(*_best)
            _log("fallback emitted")
        elif not _emitted:
            _emit("bench_failed", 0.0)
            return
    else:
        # headline already emitted — measure the fallback for the record
        # (stderr only) and profile it, budget permitting.
        if _budget_left() > 280.0 and os.environ.get("BENCH_FALLBACK", "1") != "0":
            try:
                config, air, trace = _build_config(F, EF, log_n, "poseidon-2")
                elapsed = _measure_prove(config, air, trace, iters=3, tag=f" 2^{log_n}")
                _log(f"fallback (stderr): {(1 << log_n) / elapsed:.0f} perms/s")
                if os.environ.get("BENCH_PROFILE", "1") != "0" and _budget_left() > 60.0:
                    _profile_prove(config, air, trace)
            except Exception as e:
                _log(f"fallback failed: {e!r}")

    # extra stderr-only benches (BASELINE configs 2-exact, 3, 4, 5).
    # keccakf-headline first: it is the reference recipe EXACTLY (VERDICT
    # r4 item 2 wants its number in the round artifacts) and its programs
    # ship warm in .xla_cache; the per-extra wall floors below keep one
    # slow extra from starving the rest (each is skipped whole, never
    # half-run, when the remaining budget cannot fit it).
    extras = os.environ.get("BENCH_EXTRA", "keccakf-headline,kzg,circle")
    #: rough cold-path wall floors; an extra is skipped, not started, when
    #: the remaining budget could not fit it (a half-run extra produces no
    #: number AND starves everything after it)
    _extra_floor = {"kzg": 240.0, "keccakf-headline": 500.0, "circle": 300.0,
                    "keccak-air": 300.0, "blake3-air": 300.0}
    for extra in [x for x in extras.split(",") if x]:
        if _budget_left() < _extra_floor.get(extra, 120.0):
            _log(f"skipping extra bench {extra}: budget exhausted")
            continue
        try:
            if extra == "kzg":
                _bench_kzg()
            elif extra == "keccakf-headline":
                _bench_keccakf_headline(hl_log_n)
            elif extra == "circle":
                _bench_circle()
            elif extra in ("keccak-air", "blake3-air"):
                _bench_hash_air(extra)
            else:
                _log(f"unknown BENCH_EXTRA entry: {extra}")
        except Exception as e:
            _log(f"extra bench {extra} failed: {e!r}")


if __name__ == "__main__":
    main()
