"""plonky3_eon_tpu — a TPU-native library of zero-knowledge proving
primitives (JAX / XLA / Pallas), with the capability surface of the
Plonky3-eon toolkit. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
