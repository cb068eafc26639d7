#!/usr/bin/env python
"""End-to-end Fibonacci STARK over BN254 + KZG with timing printouts.

Reference parity: `kzg-example/examples/fibonacci_kzg.rs` (CLI assembling
`StarkConfig<KzgPcs, Fr, DuplexChallenger<Fr, Poseidon2Bn254<3>, 3, 2>>`
with per-phase timing) and `kzg-example/src/{fibonacci_air,proof}.rs`.

Usage:
  python examples/fibonacci_kzg.py --log-trace-length 6 [--tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log-trace-length", type=int, default=4)
    ap.add_argument("--tpu", action="store_true", help="run on the TPU backend (default: CPU)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/p3tpu_xla" if args.tpu else "~/.cache/p3tpu_xla_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from plonky3_eon_tpu.challenger import DuplexChallenger
    from plonky3_eon_tpu.fields.bigfield import Bn254Fr as Fr
    from plonky3_eon_tpu.fields.extension import BinomialExtension
    from plonky3_eon_tpu.kzg import KzgStarkPcs, make_test_srs, poseidon2_bn254
    from plonky3_eon_tpu.models.fibonacci import FibonacciAir
    from plonky3_eon_tpu.stark import StarkConfig, prove, verify
    from plonky3_eon_tpu.stark.serde import report_proof_size
    from plonky3_eon_tpu.utils.tracing import enable_tracing, span, tracing_report

    n = 1 << args.log_trace_length
    Fr1 = BinomialExtension(Fr, 1, 1, name="Bn254Fr^1")

    a, b = 0, 1
    rows = np.empty((n, 2), dtype=object)
    for i in range(n):
        rows[i] = [a, b]
        a, b = b, (a + b) % Fr.order
    trace = Fr.from_int(rows)
    x_last = int(rows[-1][1])

    t0 = time.perf_counter()
    srs = make_test_srs(2 * n)
    print(f"srs setup ({2 * n} G1 powers): {time.perf_counter() - t0:.2f}s")

    # The reference's live instance: SmallRng::seed_from_u64(42),
    # new_from_rng(8, 22) (`kzg-example/src/proof.rs:116-117`) — our rng
    # reconstruction makes the constants (and hence the whole transcript)
    # bit-identical to the reference pipeline.
    from plonky3_eon_tpu.hashes import poseidon2_from_rng

    p2 = poseidon2_from_rng(Fr, 3, rounds_f=8, rounds_p=22, seed=42)
    config = StarkConfig(
        F=Fr, EF=Fr1, pcs=KzgStarkPcs(srs),
        challenger_factory=lambda: DuplexChallenger(Fr, p2, 3, 2),
    )
    air = FibonacciAir()
    pvs = [0, 1, x_last]

    enable_tracing(True)
    t0 = time.perf_counter()
    with span("prove (cold, incl. compile)"):
        proof = prove(config, air, trace, pvs)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    with span("prove (warm)"):
        proof = prove(config, air, trace, pvs)
    t_warm = time.perf_counter() - t0
    with span("verify (one batched multi-pairing)"):
        verify(config, air, proof, pvs)
    print(tracing_report())
    print(f"prove: cold {t_cold:.2f}s, warm {t_warm:.2f}s")
    print(f"proof size: {report_proof_size(proof)} bytes")
    print(f"fib({n}) = {x_last % 100000}... verified")


if __name__ == "__main__":
    main()
