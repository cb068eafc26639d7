"""BN254 curve layer: host pairing/G1/G2 (pairing.py) + device batched G1
arithmetic and MSM (curve.py). Reference parity: `bn254/src/curve.rs`."""
