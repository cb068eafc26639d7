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

    The transcript lives entirely on the HOST as canonical ints (the duplex
    permutation runs via `perm.permute_host`): it is sequential, one state
    wide, and interleaved with host control flow, so device dispatch would
    cost a round trip per observation (catastrophic over a TPU tunnel).
    Device arrays observed are pulled to host once per `observe` call.
    Only the PoW grind uses the device (one batched permute per candidate
    block).
    """

    def __init__(self, F: Field, perm, width: int, rate: int):
        self.F = F
        self.perm = perm
        self.width = width
        self.rate = rate
        big = F.order >= (1 << 63)
        self._dtype = object if big else np.uint64
        self._state = np.zeros(width, dtype=self._dtype)  # canonical
        if big:
            self._state[:] = 0
        self._input: list = []  # pending canonical Python ints
        self._output: list = []  # canonical ints, pop from end
        #: device-resident transcript mode (None = host mode). While set,
        #: the duplex state lives ON DEVICE as a (width,) Montgomery array
        #: and `observe_device`/`sample_device` run _DevDuplex programs —
        #: zero host round trips until the FRI fold phase downloads the
        #: final state and reseeds the host fields (fri/pcs.py).
        self._dev_state = None
        #: device vectors queued for download-bundling into the fold
        #: phase's single packed transfer (e.g. commit roots the proof
        #: needs on host but that should not each cost a d2h round trip)
        self._dev_extra: list = []
        self._dev_extra_np: list = []  # host copies, filled at fold-phase end

    # ---- device-resident transcript (VERDICT r4 item 9) -----------------
    #
    # Over a tunneled TPU every host<->device interaction costs ~30ms; a
    # 2^13 prove used to spend its whole floor on ~6 such trips. In device
    # mode the commit->observe->sample round trips run inside jitted
    # programs (fri/pcs.py:_DevDuplex emulation, byte-identical transcript)
    # and the host state is reseeded once, from the fold phase's single
    # packed download.

    def device_capable(self) -> bool:
        from ..hashes.poseidon2 import Poseidon2

        return (
            isinstance(self.perm, Poseidon2)
            and self.F.order < (1 << 32)
            and self.rate == 8
            and not self._output  # outputs would be lost by the handoff
        )

    def begin_device_transcript(self) -> None:
        """Upload state (+ pending inputs) and switch to device mode."""
        assert self._dev_state is None
        state = self.F.from_int(np.asarray(self._state, dtype=self._dtype))
        # pending inputs become the leading partial block of the first
        # device absorb (_DevDuplex replays the same fill logic)
        self._dev_pending = (
            [self.F.from_int(np.asarray(self._input, dtype=self._dtype))]
            if self._input else []
        )
        self._dev_state = state
        # host-side replay of the pending/output counters (static counts)
        # so a fallback reseed can reconstruct the leftover outputs; the
        # pending inputs were queued as a vector above, so the counter
        # starts at 0 and the vector replays like any other observe
        self._dev_ctr_p = 0
        self._dev_ctr_n = 0
        self._input = []
        self._output = []

    def observe_device(self, vec) -> None:
        """Queue a 1-D Montgomery device vector for absorption (lazy: the
        absorb happens inside the next sample_device program)."""
        assert self._dev_state is not None
        self._dev_pending.append(vec.reshape(-1))

    def sample_device(self, n: int):
        """Absorb queued vectors and sample n elements, all in ONE jitted
        program. Returns an (n,) Montgomery device array."""
        from ..fri.pcs import _absorb_sample_dev

        assert self._dev_state is not None
        # replay the host pending/output counters (static counts only —
        # values stay on device) so a fallback reseed knows the leftover
        # output count exactly
        p, nn = self._dev_ctr_p, self._dev_ctr_n
        for v in self._dev_pending:
            nn = 0
            p += int(v.shape[0])
            if p >= self.rate:
                p, nn = p % self.rate, (0 if p % self.rate else self.rate)
        for _ in range(n):
            if p or nn == 0:
                p, nn = 0, self.rate
            nn -= 1
        self._dev_ctr_p, self._dev_ctr_n = p, nn
        self._dev_state, out = _absorb_sample_dev(
            self.F, self.perm, self.rate, self._dev_state,
            tuple(self._dev_pending), n,
        )
        self._dev_pending = []
        return out

    def sample_ext_device(self, EF):
        """sample_ext in device mode: (D,) Montgomery device array."""
        return self.sample_device(EF.D)

    def queue_download(self, vec) -> None:
        """Bundle `vec` (1-D u32 device array) into the fold phase's single
        packed download; host copy lands in `_dev_extra_np` in order."""
        self._dev_extra.append(vec.reshape(-1))

    def end_device_transcript(self) -> None:
        """Fallback exit from device mode (the normal exit is the FRI fold
        phase's packed download): download the state, reseed the host
        transcript, and replay any still-queued observations on host."""
        assert self._dev_state is not None
        state_canon = np.asarray(
            self.F.to_ints(np.asarray(self._dev_state)), dtype=self._dtype
        )
        queued = self._dev_pending
        self._state = state_canon.copy()
        self._input = []
        self._output = [int(x) for x in state_canon[: self._dev_ctr_n]]
        self._dev_state = None
        self._dev_pending = []
        for v in queued:  # never absorbed on device — replay on host
            self.observe(v)
        # bundled extras must be downloaded individually on this path
        self._dev_extra_np = [np.asarray(v) for v in self._dev_extra]
        self._dev_extra = []

    def _duplex(self):
        if self._input:
            self._state[: len(self._input)] = np.asarray(self._input, dtype=self._dtype)
            self._input = []
        self._state = self.perm.permute_host(self._state)
        self._output = [int(x) for x in self._state[: self.rate]]

    # ---- observing ----------------------------------------------------

    def observe(self, value):
        """Observe a scalar element or an array of elements along axis 0.
        Accepts device (Montgomery-form) arrays or canonical numpy ints."""
        ints = np.atleast_1d(self.F.to_ints(value)).reshape(-1)
        self._output = []
        for e in ints:
            self._input.append(int(e))
            if len(self._input) == self.rate:
                self._duplex()

    def observe_ints(self, ints):
        self._output = []
        arr = np.asarray(ints, dtype=self._dtype)
        for e in arr.reshape(-1):
            self._input.append(int(e) % self.F.order)
            if len(self._input) == self.rate:
                self._duplex()

    def observe_ext(self, value):
        """Observe an extension element (D,) as its base coefficients."""
        self.observe(value)

    # ---- sampling -----------------------------------------------------

    def sample_int(self) -> int:
        if self._input or not self._output:
            self._duplex()
        return self._output.pop()

    def sample(self):
        """Sample one base-field element (device scalar array)."""
        return self.F.from_int(self.sample_int())

    def sample_bits(self, bits: int) -> int:
        return self.sample_int() & ((1 << bits) - 1)

    def sample_ext(self, EF):
        """Sample an extension element as D base coefficients
        (ref: `FieldChallenger::sample_algebra_element`)."""
        return EF.from_int(
            np.asarray([self.sample_int() for _ in range(EF.D)], dtype=self._dtype)
        )

    # ---- proof-of-work grind (ref: grinding_challenger.rs) -------------

    def grind(self, bits: int) -> int:
        """Find witness w (as int) with check_witness(bits, w) true, searching
        the candidate space in device-wide batches (the analogue of the
        reference's rayon parallel witness search)."""
        batch = 1 << 16
        F, W, R = self.F, self.width, self.rate
        # Snapshot the state the witness observation would see.
        base_state = self._state.copy()
        pending = list(self._input)
        # native single-thread search first (microseconds/candidate, no
        # device round trip at all)
        from ..hashes.poseidon2 import Poseidon2

        if isinstance(self.perm, Poseidon2) and F.order < (1 << 32):
            from ..native import poseidon2_grind_native

            w = poseidon2_grind_native(self.perm, base_state, pending, R, bits)
            if w is not None:
                self.observe_ints([w])
                s = self.sample_int()
                assert s & ((1 << bits) - 1) == 0
                return w
        start = 0
        while True:
            cands = np.arange(start, start + batch, dtype=np.uint64).astype(self._dtype) % F.order
            states = np.broadcast_to(base_state, (batch, W)).copy()
            if pending:
                states[:, : len(pending)] = np.asarray(pending, dtype=np.uint64)[None, :]
                states[:, len(pending)] = cands
            else:
                states[:, 0] = cands
            out = F.to_ints(self.perm(F.from_int(states)))
            hits = np.nonzero((out[:, R - 1] & ((1 << bits) - 1)) == 0)[0]
            if hits.size:
                w = int(cands[hits[0]])
                # replay sequentially to update transcript state
                self.observe_ints([w])
                s = self.sample_int()
                assert s & ((1 << bits) - 1) == 0
                return w
            start += batch

    def check_witness(self, bits: int, witness_int: int) -> bool:
        self.observe_ints([witness_int])
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
        # unified serialization (`fields/serial.py`, RawDataSerializable
        # parity): one vectorized byte stream instead of per-int to_bytes
        from ..fields.serial import into_bytes

        self.inner.observe_bytes(into_bytes(self.F, value).tobytes())

    def observe_ints(self, ints):
        arr = np.asarray(ints, dtype=np.uint64).reshape(-1)
        self.inner.observe_bytes(
            np.ascontiguousarray(arr.astype("<u8")).view(np.uint8)
            .reshape(-1, 8)[:, :4].tobytes()
        )

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


class SerializingChallenger64:
    """Field challenger over a byte challenger for 64-bit fields
    (ref: `serializing_challenger.rs:39`): observe canonical LE u64 bytes;
    sample by drawing 8 bytes and truncating below 2^floor(log2 p)."""

    def __init__(self, F: Field, inner: HashChallenger):
        self.F = F
        self.inner = inner
        self._log_p = F.order.bit_length() - 1

    def observe(self, value):
        # unified serialization (`fields/serial.py`, RawDataSerializable
        # parity): one vectorized byte stream instead of per-int to_bytes
        from ..fields.serial import into_bytes

        self.inner.observe_bytes(into_bytes(self.F, value).tobytes())

    def observe_ints(self, ints):
        arr = np.asarray(ints, dtype=np.uint64).reshape(-1)
        self.inner.observe_bytes(np.ascontiguousarray(arr.astype("<u8")).tobytes())

    def sample_int(self) -> int:
        raw = int.from_bytes(self.inner.sample_bytes(8), "little")
        return raw & ((1 << self._log_p) - 1)

    def sample(self):
        return self.F.from_int(self.sample_int())

    def sample_bits(self, bits: int) -> int:
        return self.sample_int() & ((1 << bits) - 1)

    def sample_ext(self, EF):
        import jax.numpy as jnp

        return jnp.stack([self.sample() for _ in range(EF.D)], axis=-1)

    def grind(self, bits: int) -> int:
        """PoW witness search (ref: `grinding_challenger.rs:52-65` — the
        reference implements GrindingChallenger for SerializingChallenger64
        too; round-1 gap). Each candidate is tried on a transcript clone so
        failures leave this challenger untouched."""
        w = 0
        while True:
            clone_inner = HashChallenger(self.inner.hash_fn)
            clone_inner._input = bytearray(self.inner._input)
            clone_inner._output = bytearray(self.inner._output)
            c = SerializingChallenger64(self.F, clone_inner)
            c.observe_ints([w])
            if c.sample_bits(bits) == 0:
                self.observe_ints([w])
                assert self.sample_bits(bits) == 0
                return w
            w += 1

    def check_witness(self, bits: int, witness_int: int) -> bool:
        self.observe_ints([witness_int])
        return self.sample_bits(bits) == 0


def reduce_32(F_small, F_big, elems) -> int:
    """Pack canonical 32-bit field elements into one big-field element:
    sum_i e_i * 2^(32 i) mod p_big (ref: `field/src/helpers.rs` reduce_32,
    used by MultiField32Challenger)."""
    acc = 0
    for i, e in enumerate(np.asarray(elems, dtype=np.uint64).reshape(-1)):
        acc += int(e) << (32 * i)
    return acc % F_big.order


def split_32(F_big, F_small, value: int, n: int) -> list:
    """Split a big-field element into n small-field elements (64-bit chunks
    reduced mod p_small; ref: `field/src/helpers.rs` split_32)."""
    out = []
    v = int(value)
    for _ in range(n):
        out.append((v & ((1 << 64) - 1)) % F_small.order)
        v >>= 64
    return out


class MultiField32Challenger:
    """Observe 31/32-bit field elements into a big-field (BN254) sponge and
    squeeze them back out (ref: `challenger/src/multi_field_challenger.rs:15`,
    used by the BN254 Merkle stacks over small-field traces).

    num_f_elms small elements pack into each big-field rate slot via
    reduce_32; sampling splits each squeezed big element via split_32.
    """

    def __init__(self, F_small, F_big, perm, width: int, rate: int = None):
        self.Fs = F_small
        self.Fb = F_big
        self.perm = perm
        self.width = width
        self.rate = rate if rate is not None else width - 1
        self.num_f_elms = F_big.order.bit_length() // 64  # 64-bit margin
        self._state = np.zeros(width, dtype=object)
        self._state[:] = 0
        self._input: list = []  # pending small-field canonical ints
        self._output: list = []

    def _duplex(self):
        if self._input:
            for slot in range(self.rate):
                chunk = self._input[slot * self.num_f_elms : (slot + 1) * self.num_f_elms]
                if chunk:
                    self._state[slot] = reduce_32(self.Fs, self.Fb, chunk)
            self._input = []
        self._state = self.perm.permute_host(self._state)
        self._output = []
        for slot in range(self.rate):
            self._output += split_32(self.Fb, self.Fs, int(self._state[slot]), self.num_f_elms)

    def observe(self, value):
        ints = np.atleast_1d(self.Fs.to_ints(value)).reshape(-1)
        self.observe_ints(ints)

    def observe_ints(self, ints):
        self._output = []
        cap = self.rate * self.num_f_elms
        for e in np.asarray(ints, dtype=np.uint64).reshape(-1):
            self._input.append(int(e) % self.Fs.order)
            if len(self._input) == cap:
                self._duplex()

    def sample_int(self) -> int:
        if self._input or not self._output:
            self._duplex()
        return self._output.pop()

    def sample(self):
        return self.Fs.from_int(self.sample_int())

    def sample_bits(self, bits: int) -> int:
        return self.sample_int() & ((1 << bits) - 1)

    def sample_ext(self, EF):
        return EF.from_int(
            np.asarray([self.sample_int() for _ in range(EF.D)], dtype=np.uint64)
        )

    def grind(self, bits: int) -> int:
        """Host witness search (BN254 sponge; rarely hot)."""
        w = 0
        while True:
            save = (self._state.copy(), list(self._input), list(self._output))
            self.observe_ints([w])
            if self.sample_bits(bits) == 0:
                return w
            self._state, self._input, self._output = save
            w += 1

    def check_witness(self, bits: int, witness_int: int) -> bool:
        self.observe_ints([witness_int])
        return self.sample_bits(bits) == 0
