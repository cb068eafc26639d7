"""Scaling-structure measurement on the 8-virtual-device CPU mesh
(VERDICT r4 item 6: the north-star scaling axis).

One box cannot measure real multi-chip speedup, but it CAN measure the
collective/overhead STRUCTURE of the sharded program: the same prove-core
step is compiled for a 1-device and an 8-device mesh, timed (virtual
devices share one CPU, so 8-dev wall time ~= 1-dev wall time + collective
overhead), and the compiled HLO is inventoried for the collectives GSPMD
inserted. Run:

    python scripts/bench_scaling.py [log_n]
"""

import os
import re
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/p3tpu_xla_cpu")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

COLLECTIVES = (
    "all-to-all", "all-gather", "all-reduce", "collective-permute",
    "reduce-scatter",
)


def _collective_inventory(compiled) -> dict:
    txt = compiled.as_text()
    return {c: len(re.findall(rf"\b{c}", txt)) for c in COLLECTIVES}


def main():
    # The Fibonacci AIR keeps the GSPMD compile tractable on a 1-core CPU
    # host while exercising the IDENTICAL sharding structure (row-sharded
    # witness, column-sharded LDE, row-sharded fold) — the collective
    # inventory is the measurement, and it does not depend on the AIR's
    # constraint count.
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    from plonky3_eon_tpu.fields import BabyBear as F, BabyBear4 as EF
    from plonky3_eon_tpu.models.fibonacci import (
        FibonacciAir,
        generate_fibonacci_trace,
    )
    from plonky3_eon_tpu.parallel import make_mesh, sharded_prove_core

    air = FibonacciAir()
    trace, x = generate_fibonacci_trace(F, 1 << log_n)
    alpha = EF.from_int(np.arange(1, EF.D + 1, dtype=np.uint64))

    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        step = sharded_prove_core(
            mesh, air, F, EF, log_n, log_blowup=1,
            public_values=(0, 1, x), trace_arg=True,
        )
        with mesh:
            t0 = time.perf_counter()
            lowered = step.lower(trace, alpha)
            compiled = lowered.compile()
            t_compile = time.perf_counter() - t0
            out = compiled(trace, alpha)
            out.block_until_ready()
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                compiled(trace, alpha).block_until_ready()
                times.append(time.perf_counter() - t0)
        inv = _collective_inventory(compiled)
        inv_s = ", ".join(f"{k}={v}" for k, v in inv.items() if v)
        print(
            f"prove-core 2^{log_n} x {ndev} dev: step={min(times)*1e3:.1f}ms "
            f"(compile {t_compile:.1f}s) collectives: {inv_s or 'none'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
