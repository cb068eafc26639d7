"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths (Mesh/shard_map) are exercised without TPU hardware
(SURVEY.md §4 'Implication for the TPU build')."""

import os
import sys

# Hard-set (not setdefault): the harness environment pins JAX_PLATFORMS to the
# real TPU tunnel, which makes every jit compile remotely — tests must run on
# the local CPU backend with 8 virtual devices instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the host CPU backend compiles slowly; cache
# compiled executables across test processes.
import jax  # noqa: E402

# The env var alone is NOT enough: the harness's axon plugin re-registers
# itself into jax_platforms ("axon,cpu") after env processing, and the axon
# entry then wins. The config update below is authoritative.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/p3tpu_xla_cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# ---- fast/slow tiers (VERDICT r1 item 10) ---------------------------------
# Compile-heavy suites (BN254 CIOS programs, wide-AIR folds, KAT sweeps) can
# take many minutes of cold XLA CPU compile on a small box. They are marked
# `slow` and skipped unless P3TPU_RUN_SLOW=1; the default tier is the fast
# suite that must stay green everywhere.

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("P3TPU_RUN_SLOW", "0") == "1":
        return
    skip_slow = pytest.mark.skip(reason="slow tier: set P3TPU_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
