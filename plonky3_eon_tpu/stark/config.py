"""STARK configuration (reference parity: `uni-stark/src/config.rs:24-87`
`StarkGenericConfig`/`StarkConfig` binding Pcs + Challenge + Challenger).

Where the reference resolves field/DFT/hash/PCS choices as compile-time
generics, here a config is a plain dataclass of descriptor objects; jit
specializes per (config, shape) the way rustc monomorphizes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass
class StarkConfig:
    F: Any  # value (base) field descriptor
    EF: Any  # challenge extension field descriptor
    pcs: Any
    challenger_factory: Callable[[], Any]

    def new_challenger(self):
        return self.challenger_factory()
