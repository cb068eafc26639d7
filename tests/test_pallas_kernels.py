"""Pallas Poseidon2 kernels vs the XLA scan path (bit-exactness).

These only run on a TPU backend — the kernels are gated off elsewhere
(`_pallas_sponge_ok`) so the CPU suite exercises the scan path. Run
manually on hardware with:  JAX_PLATFORMS='' pytest tests/test_pallas_kernels.py
"""

import jax
import numpy as np
import pytest

from plonky3_eon_tpu.fields import BabyBear, KoalaBear

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="pallas kernels require a TPU backend",
)


@requires_tpu
@pytest.mark.parametrize("F", [KoalaBear, BabyBear], ids=lambda f: f.name)
def test_pallas_sponge_matches_scan(F):
    import jax.numpy as jnp

    from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2
    from plonky3_eon_tpu.ops.pallas_poseidon2 import sponge_hash_T

    p2 = Poseidon2(F, 16)
    rng = np.random.default_rng(0)
    mat = F.from_int(rng.integers(0, F.order, size=(512, 9), dtype=np.uint64))
    sponge = PaddingFreeSponge(p2, 16, 8, 8)
    # scan reference: bypass the pallas gate by using a non-multiple batch
    ref = np.asarray(sponge.hash(mat[:500]))
    got = np.asarray(sponge_hash_T(p2, jnp.asarray(mat).T, 8, 8).T)[:500]
    assert np.array_equal(ref, got)


@requires_tpu
def test_pallas_permute_matches_scan():
    import jax.numpy as jnp

    from plonky3_eon_tpu.hashes import Poseidon2
    from plonky3_eon_tpu.ops.pallas_poseidon2 import permute_T

    F = KoalaBear
    p2 = Poseidon2(F, 16)
    rng = np.random.default_rng(1)
    st = F.from_int(rng.integers(0, F.order, size=(512, 16), dtype=np.uint64))
    ref = np.asarray(p2.permute(st))
    got = np.asarray(permute_T(p2, jnp.asarray(st).T).T)
    assert np.array_equal(ref, got)
