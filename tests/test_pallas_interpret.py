"""Pallas Poseidon2 kernels in interpret mode on CPU (VERDICT r1 weak-11:
the kernel code path was TPU-only-tested). Interpret mode executes the
same kernel body with reference jax semantics, cross-checked against the
XLA scan sponge/permutation."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import BabyBear, KoalaBear
from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2
from plonky3_eon_tpu.ops import pallas_poseidon2 as pp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pp, "_INTERPRET", True)


@pytest.mark.parametrize("F", [KoalaBear, BabyBear], ids=lambda f: f.name)
def test_sponge_kernel_interpret_matches_scan(F):
    p2 = Poseidon2(F, 16)
    rng = np.random.default_rng(0)
    mat = F.from_int(rng.integers(0, F.order, size=(9, 512), dtype=np.uint64))
    out = np.asarray(pp.sponge_hash_T(p2, mat, 8, 8))
    ref = np.asarray(PaddingFreeSponge(p2, 16, 8, 8).hash(mat.T)).T
    assert np.array_equal(out, ref)


def test_permute_kernel_interpret_matches_scan():
    F = KoalaBear
    p2 = Poseidon2(F, 16)
    rng = np.random.default_rng(1)
    st = F.from_int(rng.integers(0, F.order, size=(16, 512), dtype=np.uint64))
    out = np.asarray(pp.permute_T(p2, st))
    ref = np.asarray(p2.permute(st.T)).T
    assert np.array_equal(out, ref)
