"""Unified field byte-serialization (reference parity: the
`RawDataSerializable` trait, `field/src/field.rs:650-743` — NUM_BYTES,
into_bytes / into_byte_stream / into_u32_stream / into_u64_stream and the
transposed `into_parallel_*_streams` used by vectorized hashers).

TPU-native design: the reference exposes per-element iterators; here every
function is a BATCHED numpy transform over canonical little-endian bytes
(one vectorized reshape/view instead of an iterator chain). Inputs may be
device arrays in Montgomery form (converted via `F.to_ints`) or canonical
host integers. These helpers back the host-side transcript/serde paths;
device-side hashing keeps words on device (for 4-byte fields the canonical
u32 lane IS the u32 stream — see `hashes/sponge.py:SerializingHasher`).
"""

from __future__ import annotations

import numpy as np


def num_bytes(F) -> int:
    """Bytes per canonical element (ref: `RawDataSerializable::NUM_BYTES`)."""
    return (F.order.bit_length() + 7) // 8


def _canonical_ints(F, a) -> np.ndarray:
    ints = np.atleast_1d(np.asarray(F.to_ints(a)))
    return ints.reshape(-1)


def _bytes_from_ints(ints: np.ndarray, nb: int) -> np.ndarray:
    if ints.dtype == object:  # big fields (BN254): exact Python ints
        return np.frombuffer(
            b"".join(int(v).to_bytes(nb, "little") for v in ints), dtype=np.uint8
        ).copy()
    by = ints.astype("<u8").reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    return np.ascontiguousarray(by[:, :nb]).reshape(-1)


def into_bytes(F, a) -> np.ndarray:
    """(n,) elements -> (n * NUM_BYTES,) uint8, little-endian per element
    (ref: `into_bytes` / `into_byte_stream`)."""
    return _bytes_from_ints(_canonical_ints(F, a), num_bytes(F))


def _pad_to(arr: np.ndarray, k: int) -> np.ndarray:
    pad = (-len(arr)) % k
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    return arr


def into_u32_stream(F, a) -> np.ndarray:
    """(n,) elements -> uint32 word stream, zero-padded tail
    (ref: `into_u32_stream`)."""
    return _pad_to(into_bytes(F, a), 4).view("<u4").copy()


def into_u64_stream(F, a) -> np.ndarray:
    """(n,) elements -> uint64 word stream, zero-padded tail
    (ref: `into_u64_stream`)."""
    return _pad_to(into_bytes(F, a), 8).view("<u8").copy()


def into_parallel_byte_streams(F, a) -> np.ndarray:
    """(n, N) element matrix -> (n * NUM_BYTES, N) uint8: each element row
    becomes NUM_BYTES byte rows (the transposed layout vectorized hashers
    consume; ref: `into_parallel_byte_streams`)."""
    a2 = np.asarray(F.to_ints(a))
    if a2.ndim != 2:
        raise ValueError("parallel streams need a (n, N) element matrix")
    n, N = a2.shape
    nb = num_bytes(F)
    by = _bytes_from_ints(a2.reshape(-1), nb).reshape(n, N, nb)
    return np.ascontiguousarray(np.swapaxes(by, 1, 2).reshape(n * nb, N))


def _parallel_word_streams(F, a, word: int, dtype) -> np.ndarray:
    rows = into_parallel_byte_streams(F, a)
    N = rows.shape[1]
    pad = (-rows.shape[0]) % word
    if pad:
        rows = np.concatenate([rows, np.zeros((pad, N), np.uint8)], axis=0)
    grouped = rows.reshape(-1, word, N)  # little-endian byte significance
    shifts = (1 << (8 * np.arange(word, dtype=np.uint64))).astype(np.uint64)
    return (grouped.astype(np.uint64) * shifts[None, :, None]).sum(axis=1).astype(dtype)


def into_parallel_u32_streams(F, a) -> np.ndarray:
    """(n, N) -> (ceil(n*NUM_BYTES/4), N) uint32 — guaranteed equal to
    transposing, applying `into_u32_stream` per column, and transposing
    back (ref: `into_parallel_u32_streams`)."""
    return _parallel_word_streams(F, a, 4, np.uint32)


def into_parallel_u64_streams(F, a) -> np.ndarray:
    """(n, N) -> (ceil(n*NUM_BYTES/8), N) uint64 (ref:
    `into_parallel_u64_streams`)."""
    return _parallel_word_streams(F, a, 8, np.uint64)
