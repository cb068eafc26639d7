"""Blake3 AIR tests: witness validity, differential check against the
independent blake3_compress implementation, tamper rejection, e2e
prove+verify (ref: `blake3-air` test surface, SURVEY.md §2.7)."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import KoalaBear, KoalaBear4
from plonky3_eon_tpu.models.blake3_air import (
    NUM_BLAKE3_COLS,
    OFF_OUTPUTS,
    Blake3Air,
)
from plonky3_eon_tpu.stark import check_constraints, prove, verify

import pytest as _pytest

pytestmark = _pytest.mark.slow  # compile-heavy: fast tier skips (conftest)

F, EF = KoalaBear, KoalaBear4


def _outputs_from_trace(trace_np, row):
    bits = F.to_ints(trace_np[row, OFF_OUTPUTS : OFF_OUTPUTS + 512]).reshape(16, 32)
    return (bits * (1 << np.arange(32, dtype=np.uint64))).sum(axis=1).astype(np.uint64)


def test_blake3_witness_and_differential():
    air = Blake3Air()
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 1 << 32, size=(2, 16), dtype=np.uint32)
    trace = air.generate_trace(F, msgs, counter=5, block_len=64, flags=11)
    assert trace.shape == (2, NUM_BLAKE3_COLS)
    check_constraints(air, F, EF, trace, [])

    from plonky3_eon_tpu.hashes.blake3 import IV as HOST_IV, blake3_compress
    import jax.numpy as jnp

    for i in range(2):
        got = _outputs_from_trace(np.asarray(trace), i)
        exp = blake3_compress(
            jnp.asarray(np.broadcast_to(np.asarray(HOST_IV, dtype=np.uint32), (1, 8)).copy()),
            jnp.asarray(msgs[i][None]),
            5, 64, 11,
        )
        exp = np.asarray(exp).reshape(-1)[:16]
        assert np.array_equal(got.astype(np.uint32), exp.astype(np.uint32)), f"row {i}"


def test_blake3_tamper_rejected():
    air = Blake3Air()
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 1 << 32, size=(1, 16), dtype=np.uint32)
    trace = air.generate_trace(F, msgs)
    bad = trace.at[0, OFF_OUTPUTS + 3].set(F.from_int(2))  # non-boolean output bit
    with pytest.raises(AssertionError):
        check_constraints(air, F, EF, bad, [])


def test_blake3_prove_verify():
    from tests.test_keccak_air import make_koalabear_config

    air = Blake3Air()
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 1 << 32, size=(2, 16), dtype=np.uint32)
    trace = air.generate_trace(F, msgs)
    config = make_koalabear_config()
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
