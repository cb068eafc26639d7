"""Phase-labelled span timing (reference parity: the `tracing` spans on
every prover phase — `#[instrument]` on prove/quotient_values/verify,
`info_span!("commit to trace data")` etc., `uni-stark/src/prover.rs:21,154`,
SURVEY.md §5.1 — and the tracing-forest hierarchical printout installed by
`kzg-example/examples/fibonacci_kzg.rs:26-33`).

TPU-native: spans also enter `jax.profiler` traces via `TraceAnnotation`
so device timelines line up with the host phase tree. Spans nest; the
report prints a tree with wall times. Zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class _Span:
    name: str
    start: float = 0.0
    elapsed: float = 0.0
    children: list = field(default_factory=list)


class Tracer:
    """Hierarchical span timer. Use the module-level `span` / `report`."""

    def __init__(self):
        self.root = _Span("root")
        self._stack = [self.root]
        self.enabled = False

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        s = _Span(name, start=time.perf_counter())
        self._stack[-1].children.append(s)
        self._stack.append(s)
        try:
            import jax

            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:  # profiler unavailable
            ctx = contextlib.nullcontext()
        try:
            with ctx:
                yield
        finally:
            s.elapsed = time.perf_counter() - s.start
            self._stack.pop()

    def report(self) -> str:
        """tracing-forest style tree printout."""
        lines = []

        def walk(s: _Span, depth: int):
            for c in s.children:
                lines.append(f"{'  ' * depth}{c.name:<40s} {c.elapsed * 1e3:10.2f}ms")
                walk(c, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)

    def reset(self):
        self.root = _Span("root")
        self._stack = [self.root]


TRACER = Tracer()
span = TRACER.span


def enable_tracing(on: bool = True):
    TRACER.enabled = on
    TRACER.reset()


def tracing_report() -> str:
    return TRACER.report()
