"""Native (C) host kernels for the sequential transcript path.

The device (TPU) runs everything batched; the Fiat-Shamir transcript is
host-side by design (see `challenger/`), and its sponge permutation was the
last Python-speed hot loop (~1ms per duplex in numpy, hundreds of duplexes
per prove). This module compiles `p3_host.c` with the system C compiler at
first import (cached as a .so next to the source) and exposes it via
ctypes. Falls back silently to None when no compiler is available — all
callers keep their numpy path as fallback.

Reference parity note: the reference's challenger is native (Rust) for the
same reason; this is the TPU build's equivalent of that runtime component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "p3_host.c")
_SO = os.path.join(_DIR, "_p3_host.so")

_lib = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return _SO
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    so = _build()
    if so is None:
        _lib = False
        return None
    lib = ctypes.CDLL(so)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.poseidon2_permute_host.argtypes = [
        u64p, ctypes.c_long, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, u64p, u64p, u64p,
    ]
    lib.poseidon2_permute_host.restype = None
    lib.poseidon2_grind_host.argtypes = [
        u64p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u64p, u64p, u64p, u64p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.poseidon2_grind_host.restype = ctypes.c_uint64
    _lib = lib
    return lib


def _u64p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def poseidon2_permute_native(p2, states: np.ndarray) -> np.ndarray | None:
    """Native batched host permutation for 31-bit-field Poseidon2 instances.
    states: (..., W) uint64 canonical. Returns None if native unavailable."""
    if p2.F.order >= (1 << 32):
        return None
    lib = get_lib()
    if lib is None:
        return None
    st = np.ascontiguousarray(states, dtype=np.uint64).copy()
    count = st.size // p2.width
    ext = np.ascontiguousarray(p2.ext_consts_int, dtype=np.uint64)
    intc = np.ascontiguousarray(p2.int_consts_int, dtype=np.uint64)
    diag = np.ascontiguousarray(p2.diag_int, dtype=np.uint64)
    lib.poseidon2_permute_host(
        _u64p(st), count, p2.width, p2.F.order, p2.d,
        p2.rounds_f, p2.rounds_p, int(p2.hl_mat4),
        _u64p(ext), _u64p(intc), _u64p(diag),
    )
    return st


def poseidon2_grind_native(
    p2, base_state: np.ndarray, pending: list, rate: int, bits: int
) -> int | None:
    """Native PoW witness search. Returns witness int or None if unavailable."""
    if p2.F.order >= (1 << 32) or p2.width > 64 or len(pending) >= rate:
        return None
    lib = get_lib()
    if lib is None:
        return None
    st = np.ascontiguousarray(base_state, dtype=np.uint64)
    pend = np.ascontiguousarray(np.asarray(pending, dtype=np.uint64))
    ext = np.ascontiguousarray(p2.ext_consts_int, dtype=np.uint64)
    intc = np.ascontiguousarray(p2.int_consts_int, dtype=np.uint64)
    diag = np.ascontiguousarray(p2.diag_int, dtype=np.uint64)
    w = lib.poseidon2_grind_host(
        _u64p(st), p2.width, p2.F.order, p2.d, p2.rounds_f, p2.rounds_p,
        int(p2.hl_mat4), _u64p(ext), _u64p(intc), _u64p(diag),
        _u64p(pend), len(pending), rate, bits, p2.F.order,
    )
    if w == np.iinfo(np.uint64).max:
        return None
    return int(w)
