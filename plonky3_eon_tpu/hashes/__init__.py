"""Symmetric crypto layer (reference parity: `symmetric/`, `poseidon2/`,
`keccak/`, `blake3/`, `sha256/`, `poseidon/`, `mds/` — SURVEY.md §2.2)."""

from .keccak import KeccakF, keccak256_bytes, keccak_f
from .mds import CosetMds, Poseidon
from .monolith import Monolith, bar31
from .rescue import Rescue
from .poseidon2 import (Poseidon2, default_poseidon2, external_linear_layer,
                        internal_linear_layer, poseidon2_from_rng)
from .sha256 import Sha256, Sha256Compress, sha256_compress
from .blake3 import Blake3Compress, Blake3Hasher, blake3_bytes, blake3_compress
from .sponge import (
    CompressionFunctionFromHasher,
    KeccakU64Sponge,
    MultiField32PaddingFreeSponge,
    PaddingFreeSponge,
    SerializingHasher,
    TruncatedPermutation,
)

__all__ = [
    "CosetMds",
    "Poseidon",
    "Monolith",
    "bar31",
    "Rescue",
    "KeccakF",
    "keccak_f",
    "keccak256_bytes",
    "Poseidon2",
    "default_poseidon2",
    "poseidon2_from_rng",
    "external_linear_layer",
    "internal_linear_layer",
    "Sha256",
    "Sha256Compress",
    "sha256_compress",
    "Blake3Hasher",
    "Blake3Compress",
    "blake3_bytes",
    "blake3_compress",
    "MultiField32PaddingFreeSponge",
    "PaddingFreeSponge",
    "TruncatedPermutation",
    "CompressionFunctionFromHasher",
    "SerializingHasher",
    "KeccakU64Sponge",
]
