"""Proof (de)serialization + size reporting.

Reference parity: `Proof` serde derives (`uni-stark/src/proof.rs:17-24`,
postcard/bincode round-trips in `uni-stark/Cargo.toml:46` tests) and
`report_proof_size` (`examples/src/proofs.rs:248`).

Format: a zip (numpy .npz) of all array leaves plus a JSON manifest of the
tree structure — stable, compact, no pickling.
"""

from __future__ import annotations

import io
import json
from dataclasses import fields, is_dataclass

import numpy as np

from ..fri.pcs import FriProof, FriQueryProof
from .proof import Commitments, OpenedValues, Proof

_CLASSES = {
    "Proof": Proof,
    "Commitments": Commitments,
    "OpenedValues": OpenedValues,
    "FriProof": FriProof,
    "FriQueryProof": FriQueryProof,
}


def _encode(obj, arrays: dict, path: str):
    if is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__dc__": type(obj).__name__,
            "fields": {
                f.name: _encode(getattr(obj, f.name), arrays, f"{path}.{f.name}")
                for f in fields(obj)
            },
        }
    if isinstance(obj, (list, tuple)):
        return {
            "__list__": [
                _encode(v, arrays, f"{path}[{i}]") for i, v in enumerate(obj)
            ]
        }
    if obj is None or isinstance(obj, (int, str, bool)):
        return obj
    arr = np.asarray(obj)
    key = f"a{len(arrays)}"
    arrays[key] = arr
    return {"__arr__": key}


def _decode(node, arrays):
    if isinstance(node, dict):
        if "__dc__" in node:
            cls = _CLASSES[node["__dc__"]]
            kwargs = {k: _decode(v, arrays) for k, v in node["fields"].items()}
            # LookupData lists survive as plain lists of dicts; keep simple
            return cls(**kwargs)
        if "__list__" in node:
            return [_decode(v, arrays) for v in node["__list__"]]
        if "__arr__" in node:
            return arrays[node["__arr__"]]
    return node


def serialize_proof(proof: Proof) -> bytes:
    arrays: dict = {}
    manifest = _encode(proof, arrays, "proof")
    buf = io.BytesIO()
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def deserialize_proof(data: bytes) -> Proof:
    with np.load(io.BytesIO(data)) as z:
        arrays = {k: z[k] for k in z.files}
    manifest = json.loads(bytes(arrays.pop("__manifest__")).decode())
    return _decode(manifest, arrays)


def report_proof_size(proof: Proof) -> int:
    """Serialized proof size in bytes (ref: `report_proof_size`,
    `examples/src/proofs.rs:248`)."""
    return len(serialize_proof(proof))
