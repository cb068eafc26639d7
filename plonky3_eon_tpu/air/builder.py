"""AIR builder base + filtered sub-builders.

Reference parity: `air/src/air.rs:47-241` (`AirBuilder` with `main()`,
selectors, `assert_zero/eq/bool`, `when_*` filtered builders;
`AirBuilderWithPublicValues:172`; `PairBuilder:181` preprocessed;
`ExtensionBuilder:187`; `PermutationAirBuilder:221`).

Concrete builders (prover folder / verifier folder / symbolic / debug)
subclass `BuilderBase` and provide the ring callbacks; AIR authors only see
`Expr` arithmetic and the assert/when API, so a single AIR definition drives
every phase.

TPU-native extension — **block constraints**: where the reference's wide
AIRs (Keccak: 2633 columns, `keccak-air/src/columns.rs:120`) assert
thousands of scalar constraints one at a time (each one Rust-monomorphized),
here a whole structured block of trace columns is one `Expr` carrying a
tensor value, e.g. shape (rows, 5, 5, 64) for a Keccak bit state. One
`assert_zero_block` folds the entire block with a *vector* of consecutive
alpha powers in a single contraction, so the traced XLA program size is
independent of the AIR width and the fold runs as one fused kernel.
`main_block(start, shape)` gives block views of the main trace; scalar and
block asserts can be mixed freely (alpha-power numbering stays consistent
between prover and verifier because both run the same `eval` order).
"""

from __future__ import annotations

from .expr import Expr, RowPair


class BuilderBase:
    """Shared assert/filter machinery. Subclasses provide:
      _const(int) -> value
      _const_array(np_arr) -> value           (block constants)
      _add/_sub/_mul(va, vb, ea, eb) -> (value, ext_flag)
      _neg(v, e) -> (value, ext_flag)
      _expand(v, e, k) -> (value, ext_flag)   (insert k block axes)
      _accumulate(value, ext_flag)            (receive one asserted-zero
                                               constraint or block)
      main_block(start, shape, nxt=False) -> Expr
    and populate: main (RowPair), preprocessed (RowPair | None),
    public_values (list), is_first_row/is_last_row/is_transition (Expr).
    """

    main: RowPair = None
    preprocessed: RowPair = None
    permutation: RowPair = None
    public_values: list = ()
    permutation_challenges: list = ()
    is_first_row: Expr = None
    is_last_row: Expr = None
    is_transition: Expr = None

    def expr(self, v, ext: bool = False) -> Expr:
        return Expr(self, v, ext)

    def constant(self, x: int) -> Expr:
        return Expr(self, self._const(x), False)

    def constant_array(self, arr) -> Expr:
        """Block of constants (e.g. round-constant bit tables)."""
        return Expr(self, self._const_array(arr), False)

    def ext_constant(self, v) -> Expr:
        """A fixed extension-field element (e.g. a prover-supplied cumulative
        value transported in the proof)."""
        return Expr(self, self._ext_const(v), True)

    def main_block(self, start: int, shape, nxt: bool = False) -> Expr:
        """Columns [start, start+prod(shape)) of the main trace as one block
        Expr of the given block shape."""
        raise NotImplementedError

    def preprocessed_block(self, start: int, shape, nxt: bool = False) -> Expr:
        raise NotImplementedError

    # ---- assertions ---------------------------------------------------

    def assert_zero(self, e):
        if not isinstance(e, Expr):
            e = self.constant(e)
        self._accumulate(e.v, e.ext)

    def assert_zeros(self, es):
        for e in es:
            self.assert_zero(e)

    def assert_eq(self, a, b):
        a = a if isinstance(a, Expr) else self.constant(a)
        self.assert_zero(a - b)

    def assert_bool(self, e):
        self.assert_zero(e * (e - 1))

    def assert_bools(self, es):
        for e in es:
            self.assert_bool(e)

    def assert_one(self, e):
        self.assert_eq(e, 1)

    # ---- block assertions (TPU-native; see module docstring) -----------

    def assert_zero_block(self, e: Expr):
        """Assert an entire tensor block of constraints is zero; folds with
        consecutive alpha powers in one contraction."""
        self._accumulate(e.v, e.ext)

    def assert_eq_block(self, a: Expr, b: Expr):
        self.assert_zero_block(a - b)

    def assert_bool_block(self, e: Expr):
        self.assert_zero_block(e * (e - 1))

    # ---- extension-field assertions (ref: ExtensionBuilder) -----------

    def assert_zero_ext(self, e):
        self._accumulate(e.v, e.ext)

    def assert_eq_ext(self, a, b):
        self.assert_zero_ext(a - b)

    # ---- filtered sub-builders ---------------------------------------

    def when(self, cond) -> "FilteredBuilder":
        return FilteredBuilder(self, cond)

    def when_ne(self, a, b) -> "FilteredBuilder":
        return FilteredBuilder(self, a - b)

    def when_first_row(self) -> "FilteredBuilder":
        return FilteredBuilder(self, self.is_first_row)

    def when_last_row(self) -> "FilteredBuilder":
        return FilteredBuilder(self, self.is_last_row)

    def when_transition(self) -> "FilteredBuilder":
        return FilteredBuilder(self, self.is_transition)


class FilteredBuilder:
    """Constraints asserted through this builder are multiplied by the
    filter condition (ref: `FilteredAirBuilder`, `air/src/air.rs:187`).
    All other state/ops delegate to the inner builder, so nothing is
    materialized until an assert happens."""

    def __init__(self, inner, condition):
        self.inner = inner
        self.condition = condition

    def __getattr__(self, name):
        # main / preprocessed / public_values / is_* / expr / constant /
        # main_block / _expand ... all delegate to the inner builder.
        return getattr(self.inner, name)

    def assert_zero(self, e):
        if not isinstance(e, Expr):
            e = self.inner.constant(e)
        self.inner.assert_zero(self.condition * e)

    def assert_zeros(self, es):
        for e in es:
            self.assert_zero(e)

    def assert_eq(self, a, b):
        a = a if isinstance(a, Expr) else self.inner.constant(a)
        self.assert_zero(a - b)

    def assert_bool(self, e):
        self.assert_zero(e * (e - 1))

    def assert_bools(self, es):
        for e in es:
            self.assert_bool(e)

    def assert_one(self, e):
        self.assert_eq(e, 1)

    def assert_zero_block(self, e):
        # The AIR must pre-broadcast the condition against block constraints
        # (shapes are builder-specific); use `cond.bcast(k) * block` with
        # plain assert_zero_block instead.
        raise NotImplementedError(
            "block asserts through when(): multiply the (bcast) condition explicitly"
        )

    def assert_zero_ext(self, e):
        self.inner.assert_zero_ext(self.condition * e)

    def assert_eq_ext(self, a, b):
        self.assert_zero_ext(a - b)

    def when(self, cond):
        return FilteredBuilder(self.inner, self.condition * cond)

    def when_transition(self):
        return FilteredBuilder(self.inner, self.condition * self.inner.is_transition)

    def when_first_row(self):
        return FilteredBuilder(self.inner, self.condition * self.inner.is_first_row)

    def when_last_row(self):
        return FilteredBuilder(self.inner, self.condition * self.inner.is_last_row)
