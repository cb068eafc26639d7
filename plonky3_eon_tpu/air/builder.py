"""AIR builder base + filtered sub-builders.

Reference parity: `air/src/air.rs:47-241` (`AirBuilder` with `main()`,
selectors, `assert_zero/eq/bool`, `when_*` filtered builders;
`AirBuilderWithPublicValues:172`; `PairBuilder:181` preprocessed;
`ExtensionBuilder:187`; `PermutationAirBuilder:221`).

Concrete builders (prover folder / verifier folder / symbolic / debug)
subclass `BuilderBase` and provide the four ring callbacks; AIR authors only
see `Expr` arithmetic and the assert/when API, so a single AIR definition
drives every phase.
"""

from __future__ import annotations

from .expr import Expr, RowPair


class BuilderBase:
    """Shared assert/filter machinery. Subclasses provide:
      _const(int) -> value
      _add/_sub/_mul(va, vb, ea, eb) -> (value, ext_flag)
      _neg(v, e) -> (value, ext_flag)
      _accumulate(value, ext_flag)  # receive one asserted-zero constraint
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
    filter condition (ref: `FilteredAirBuilder`, `air/src/air.rs:187`)."""

    def __init__(self, inner, condition):
        self.inner = inner
        self.condition = condition
        # mirror the inner builder's visible state
        self.main = inner.main
        self.preprocessed = inner.preprocessed
        self.permutation = inner.permutation
        self.public_values = inner.public_values
        self.permutation_challenges = inner.permutation_challenges
        self.is_first_row = inner.is_first_row
        self.is_last_row = inner.is_last_row
        self.is_transition = inner.is_transition

    def expr(self, v, ext=False):
        return self.inner.expr(v, ext)

    def constant(self, x):
        return self.inner.constant(x)

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

    def assert_zero_ext(self, e):
        self.inner.assert_zero_ext(self.condition * e)

    def assert_eq_ext(self, a, b):
        self.assert_zero_ext(a - b)

    def when(self, cond):
        return FilteredBuilder(self.inner, self.condition * cond)

    def when_transition(self):
        return FilteredBuilder(self.inner, self.condition * self.is_transition)

    def when_first_row(self):
        return FilteredBuilder(self.inner, self.condition * self.is_first_row)

    def when_last_row(self):
        return FilteredBuilder(self.inner, self.condition * self.is_last_row)
