"""Small utilities (reference parity: `util/src/lib.rs`).

TPU-first design notes: everything here is either host-side Python-int math
(log2, constant derivation) or returns numpy index arrays that become XLA
constants (bit-reversal permutations). Nothing here is a device hot loop.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "log2_strict",
    "log2_ceil",
    "reverse_bits",
    "bit_reverse_indices",
    "reverse_bits_len",
    "warm_transfer_channel",
]


def warm_transfer_channel() -> "object":
    """Kick off the first device->host transfer on a daemon thread.

    Under the axon TPU relay, the FIRST d2h transfer in a process blocks
    on the relay's data-plane claim (measured 60-490s wall); every
    subsequent transfer is ~30ms. Uploads, compiles, and executions do
    not pay this. Entry points (bench, CLI) call this right after the
    backend is up so the claim overlaps tracing/compilation, and the
    prover's first real transcript download finds a warm channel.

    Returns the Thread (joinable); errors are swallowed — a failed warm
    just means the first real transfer pays the cost instead.
    """
    import threading

    def _warm():
        try:
            import jax.numpy as jnp

            np.asarray(jnp.zeros((), jnp.uint32))
        except Exception:
            pass

    th = threading.Thread(target=_warm, daemon=True, name="p3tpu-warm-d2h")
    th.start()
    return th


def log2_strict(n: int) -> int:
    """log2 of a power of two; raises otherwise (ref: `util/src/lib.rs:39`)."""
    if n <= 0 or (n & (n - 1)) != 0:
        raise ValueError(f"expected a power of two, got {n}")
    return n.bit_length() - 1


def log2_ceil(n: int) -> int:
    """Smallest k with 2**k >= n (ref: `util/src/lib.rs` log2_ceil_usize)."""
    if n <= 1:
        return 0
    return (n - 1).bit_length()


def reverse_bits_len(x: int, bits: int) -> int:
    """Reverse the low `bits` bits of x."""
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def reverse_bits(x: int, n: int) -> int:
    """Reverse bits of x within a domain of size n (power of two)."""
    return reverse_bits_len(x, log2_strict(n))


@functools.lru_cache(maxsize=64)
def bit_reverse_indices(n: int) -> np.ndarray:
    """Bit-reversal permutation of [0, n) as a uint32 numpy array.

    Used to permute FFT inputs/outputs (ref: `util/src/lib.rs:103`
    `reverse_slice_index_bits`). The array becomes an XLA constant feeding a
    single gather — one fused device op, no scalar loop.
    """
    bits = log2_strict(n)
    idx = np.arange(n, dtype=np.uint32)
    r = np.zeros_like(idx)
    for b in range(bits):
        r |= ((idx >> b) & 1) << (bits - 1 - b)
    return r
