"""TPU MSM benchmark + at-scale differential (VERDICT r4 item 1).

Runs on real TPU hardware (NOT under tests/conftest.py, which pins CPU):
    python scripts/bench_msm.py [log_n]

Correctness at scale via the known-dlog trick: points P_i = [a_i]G with
host-known a_i, so sum_i s_i P_i must equal [(sum_i s_i a_i) mod r] G —
one host scalar-mul verifies a 2^18-point device MSM exactly.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".xla_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from plonky3_eon_tpu.utils import warm_transfer_channel

warm_transfer_channel()  # the axon relay's first d2h claim takes 60-490s

from plonky3_eon_tpu.bn254 import curve as C
from plonky3_eon_tpu.bn254 import pairing as host
from plonky3_eon_tpu.fields.bigfield import Bn254Fr as Fr


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << log_n
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(7)

    def rand_scalars(k):
        out = []
        for _ in range(k):
            v = 0
            for _ in range(5):
                v = (v << 62) | int(rng.integers(0, 1 << 62))
            out.append(v % Fr.order)
        return out

    a_ints = rand_scalars(n)
    t0 = time.perf_counter()
    pts = C.g1_fixed_base_msm(host.G1_GEN, a_ints)
    pts.block_until_ready()
    print(f"fixed-base [a_i]G 2^{log_n}: {time.perf_counter() - t0:.2f}s",
          flush=True)

    s_ints = rand_scalars(n)
    c = 16 if n >= (1 << 18) else 8
    digits = jnp.asarray(C._ints_to_digit_rows(s_ints, c))
    t0 = time.perf_counter()
    out = C._msm_pippenger(pts, digits, c)
    out.block_until_ready()
    print(f"msm 2^{log_n} c={c} warm+compile: {time.perf_counter() - t0:.2f}s",
          flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        out = C._msm_pippenger(pts, digits, c)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"msm 2^{log_n} c={c}: {dt:.3f}s  ({n / dt / 1e6:.2f} Mpts/s)",
              flush=True)

    got = C.points_to_affine_ints(out[None])[0]
    expect_scalar = sum(a * s for a, s in zip(a_ints, s_ints)) % Fr.order
    expect = host.g1_mul(host.G1_GEN, expect_scalar)
    assert got == expect, f"MSM MISMATCH at 2^{log_n}"
    print(f"known-dlog differential at 2^{log_n}: OK", flush=True)


if __name__ == "__main__":
    main()
