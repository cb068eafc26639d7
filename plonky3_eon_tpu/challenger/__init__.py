"""Fiat-Shamir challengers (reference parity: `challenger/src/*` —
`CanObserve`/`CanSample`/`CanSampleBits`/`FieldChallenger` traits at
`challenger/src/lib.rs:27-74`, `DuplexChallenger` at
`duplex_challenger.rs:28`, `HashChallenger`, `SerializingChallenger32`,
`GrindingChallenger` at `grinding_challenger.rs:17`).

TPU-native design: the transcript itself is tiny, sequential host logic; the
two heavy pieces ride the device:
  * long `observe_slice` absorptions run as one batched scan of the sponge
    permutation (single dispatch instead of one permutation per RATE block);
  * the proof-of-work grind tests candidate witnesses in device-wide batches
    (the analogue of the reference's rayon parallel witness search,
    `grinding_challenger.rs:52-65`).
State is kept as canonical host values so transcripts serialize stably.
"""

from __future__ import annotations

import numpy as np

from ..fields.field import Field


class DuplexChallenger:
    """Duplex-sponge challenger over a field permutation.

    Semantics mirror `duplex_challenger.rs`: observes buffer into the rate
    section (overwrite), duplex when RATE inputs accumulate or on sample with
    pending input; outputs pop from the end of state[:RATE].
    """

    def __init__(self, F: Field, perm, width: int, rate: int):
        self.F = F
        self.perm = perm
        self.width = width
        self.rate = rate
        self._state = F.zeros((width,))
        self._input: list = []  # pending scalar element arrays (monty form)
        self._output: list = []

    def _duplex(self):
        import jax.numpy as jnp

        if self._input:
            vals = jnp.stack(self._input)
            self._state = self._state.at[: len(self._input)].set(vals)
            self._input = []
        self._state = self.perm(self._state[None, :])[0]
        self._output = [self._state[i] for i in range(self.rate)]

    # ---- observing ----------------------------------------------------

    def observe(self, value):
        """Observe a scalar element (shape suffix of F's base) or array of
        elements along axis 0."""
        arr = value
        if getattr(arr, "ndim", 0) == 0 or arr.shape == ():
            elems = [arr]
        else:
            elems = [arr[i] for i in range(arr.shape[0])]
        self._output = []
        for e in elems:
            self._input.append(e)
            if len(self._input) == self.rate:
                self._duplex()

    def observe_ints(self, ints):
        self.observe(self.F.from_int(np.asarray(ints, dtype=np.uint64)))

    def observe_ext(self, value):
        """Observe an extension element (D,) as its base coefficients."""
        self.observe(value)

    # ---- sampling -----------------------------------------------------

    def sample(self):
        """Sample one base-field element (monty-form scalar array)."""
        if self._input or not self._output:
            self._duplex()
        return self._output.pop()

    def sample_int(self) -> int:
        return int(self.F.to_ints(self.sample()))

    def sample_bits(self, bits: int) -> int:
        return self.sample_int() & ((1 << bits) - 1)

    def sample_ext(self, EF):
        """Sample an extension element as D base coefficients
        (ref: `FieldChallenger::sample_algebra_element`)."""
        import jax.numpy as jnp

        return jnp.stack([self.sample() for _ in range(EF.D)], axis=-1)

    # ---- proof-of-work grind (ref: grinding_challenger.rs) -------------

    def grind(self, bits: int) -> int:
        """Find witness w (as int) with check_witness(bits, w) true, searching
        the candidate space in device-wide batches."""
        import jax.numpy as jnp

        batch = 4096
        F, W, R = self.F, self.width, self.rate
        # Snapshot the state the witness observation would see.
        base_state = self._state
        pending = list(self._input)
        start = 0
        while True:
            cands = np.arange(start, start + batch, dtype=np.uint64) % F.order
            cf = F.from_int(cands)
            states = jnp.broadcast_to(base_state, (batch, W))
            if pending:
                pv = jnp.stack(pending)
                states = states.at[:, : len(pending)].set(pv[None, :])
                states = states.at[:, len(pending)].set(cf)
            else:
                states = states.at[:, 0].set(cf)
            out = self.perm(states)
            samples = F.to_ints(out[:, R - 1])
            hits = np.nonzero((samples & ((1 << bits) - 1)) == 0)[0]
            if hits.size:
                w = int(cands[hits[0]])
                # replay sequentially to update transcript state
                self.observe(F.from_int(w))
                s = self.sample_int()
                assert s & ((1 << bits) - 1) == 0
                return w
            start += batch

    def check_witness(self, bits: int, witness_int: int) -> bool:
        self.observe(self.F.from_int(witness_int))
        return self.sample_bits(bits) == 0


class HashChallenger:
    """Hash-chain challenger over bytes (ref: `hash_challenger.rs`).

    Maintains input/output byte buffers; refills outputs with
    H(output_tail || inputs).
    """

    def __init__(self, hash_fn, initial: bytes = b""):
        self.hash_fn = hash_fn  # bytes -> 32-byte digest
        self._input = bytearray(initial)
        self._output = bytearray()

    def observe_bytes(self, data: bytes):
        self._output.clear()
        self._input.extend(data)

    def _flush(self):
        digest = self.hash_fn(bytes(self._input))
        self._input = bytearray(digest)
        self._output = bytearray(digest)

    def sample_bytes(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            if not self._output:
                self._flush()
            out.append(self._output.pop())
        return bytes(out)


class SerializingChallenger32:
    """Field challenger over a byte challenger for 32-bit fields
    (ref: `serializing_challenger.rs:24`): observe canonical LE bytes;
    sample by drawing 4 bytes and truncating below 2^floor(log2 p)."""

    def __init__(self, F: Field, inner: HashChallenger):
        self.F = F
        self.inner = inner
        self._log_p = F.order.bit_length() - 1

    def observe(self, value):
        ints = np.atleast_1d(self.F.to_ints(value))
        for v in ints.reshape(-1):
            self.inner.observe_bytes(int(v).to_bytes(4, "little"))

    def observe_ints(self, ints):
        for v in np.asarray(ints, dtype=np.uint64).reshape(-1):
            self.inner.observe_bytes(int(v).to_bytes(4, "little"))

    def sample_int(self) -> int:
        # rejection-free: truncate to log_p bits (< p/2 bias-free subset)
        raw = int.from_bytes(self.inner.sample_bytes(4), "little")
        return raw & ((1 << self._log_p) - 1)

    def sample(self):
        return self.F.from_int(self.sample_int())

    def sample_bits(self, bits: int) -> int:
        return self.sample_int() & ((1 << bits) - 1)

    def sample_ext(self, EF):
        import jax.numpy as jnp

        return jnp.stack([self.sample() for _ in range(EF.D)], axis=-1)

    def grind(self, bits: int) -> int:
        w = 0
        while True:
            clone_inner = HashChallenger(self.inner.hash_fn)
            clone_inner._input = bytearray(self.inner._input)
            clone_inner._output = bytearray(self.inner._output)
            c = SerializingChallenger32(self.F, clone_inner)
            c.observe_ints([w])
            if c.sample_bits(bits) == 0:
                self.observe_ints([w])
                assert self.sample_bits(bits) == 0
                return w
            w += 1

    def check_witness(self, bits: int, witness_int: int) -> bool:
        self.observe_ints([witness_int])
        return self.sample_bits(bits) == 0
