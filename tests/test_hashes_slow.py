"""Compile-heavy hash/sponge/challenger cases (slow tier).

Split out of `test_hashes.py` (VERDICT r4 item 7): the sub-second KATs
now run in the fast tier; these cases trace BN254 CIOS programs or
multi-permute sponges and take minutes of cold CPU compile."""

import numpy as np
import pytest

from plonky3_eon_tpu.fields import BabyBear
from plonky3_eon_tpu.hashes import PaddingFreeSponge, Poseidon2, TruncatedPermutation

pytestmark = pytest.mark.slow


def _stack_pairs(dig):
    import jax.numpy as jnp

    return jnp.stack([dig[0::2], dig[1::2]], axis=1)


def test_poseidon2_sponge_and_compression():
    F = BabyBear
    p2 = Poseidon2(F, 16)
    sponge = PaddingFreeSponge(p2, 16, 8, 8)
    rng = np.random.default_rng(5)
    inp = F.from_int(rng.integers(0, F.order, size=(4, 20), dtype=np.uint64))
    dig = sponge.hash(inp)
    assert dig.shape == (4, 8)
    comp = TruncatedPermutation(p2, 2, 8, 16)
    out = comp.compress(_stack_pairs(dig))
    assert out.shape == (4 // 2, 8) or out.shape == (2, 8)


def test_multi_field_challenger():
    """MultiField32Challenger over the BN254 sponge: deterministic,
    consistent, distinct transcripts (ref: multi_field_challenger.rs:15)."""
    from plonky3_eon_tpu.challenger import MultiField32Challenger, reduce_32, split_32
    from plonky3_eon_tpu.fields import Bn254Fr
    from plonky3_eon_tpu.kzg import poseidon2_bn254

    p2 = poseidon2_bn254(3)
    mk = lambda: MultiField32Challenger(BabyBear, Bn254Fr, p2, 3, 2)
    a, b = mk(), mk()
    a.observe_ints([1, 2, 3])
    b.observe_ints([1, 2, 3])
    s_ab = a.sample_int()
    assert s_ab == b.sample_int()
    c = mk()
    c.observe_ints([1, 2, 4])
    # distinct transcript -> distinct first sample (was a vacuous
    # `... or True` assert; VERDICT r4 weak-1)
    assert c.sample_int() != s_ab
    # reduce/split roundtrip on the packing boundary
    vals = [123, 456, 789]
    packed = reduce_32(BabyBear, Bn254Fr, vals)
    unpacked = split_32(Bn254Fr, BabyBear, packed, 3)
    # split uses 64-bit chunks: first chunk holds vals[0] + vals[1]<<32 mod p
    assert unpacked[0] == (123 + (456 << 32)) % BabyBear.order
    w = a.grind(4)
    d = mk(); d.observe_ints([1, 2, 3]); _ = d.sample_int()
    assert d.check_witness(4, w)
