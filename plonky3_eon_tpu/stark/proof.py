"""Proof objects (reference parity: `uni-stark/src/proof.rs:19-40`;
`eon-uni-stark/src/proof.rs:29` adds the permutation commitment/openings).

All leaves are numpy arrays / Python ints so proofs serialize with
plain np.save / json — the analogue of the reference's serde derives.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class Commitments:
    trace: Any
    quotient_chunks: Any
    permutation: Any = None  # eon extension
    random: Any = None  # ZK: FRI-batch randomization commitment (`proof.rs` random)


@dataclass
class OpenedValues:
    trace_local: Any
    trace_next: Any
    quotient_chunks: Any  # list per chunk: (D, D) base-cols x EF coeffs
    preprocessed_local: Any = None
    preprocessed_next: Any = None
    permutation_local: Any = None  # eon extension
    permutation_next: Any = None
    random: Any = None  # ZK: R(zeta) openings, EF.D base columns


@dataclass
class Proof:
    commitments: Commitments
    opened_values: OpenedValues
    opening_proof: Any
    degree_bits: int
    lookup_data: Optional[list] = None  # eon: global-lookup cumulative sums
