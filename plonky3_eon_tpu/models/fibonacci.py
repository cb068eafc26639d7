"""Fibonacci AIR (reference parity: `kzg-example/src/fibonacci_air.rs:28`
and `uni-stark/tests/fib_air.rs` — 2 columns, public values (a, b, x)).

Columns: (left, right). First row pinned to public (a, b); transition
left' = right, right' = left + right; last row right pinned to public x.
"""

from __future__ import annotations

import numpy as np

from ..air import BaseAir


class FibonacciAir(BaseAir):
    width = 2

    def eval(self, b):
        local = b.main.local
        nxt = b.main.next
        pa, pb, px = b.public_values

        first = b.when_first_row()
        first.assert_eq(local[0], pa)
        first.assert_eq(local[1], pb)

        t = b.when_transition()
        t.assert_eq(nxt[0], local[1])
        t.assert_eq(nxt[1], local[0] + local[1])

        b.when_last_row().assert_eq(local[1], px)


def generate_fibonacci_trace(F, n: int, a: int = 0, b: int = 1):
    """(n, 2) trace of Fibonacci pairs + final value (host gen, tiny)."""
    rows = np.zeros((n, 2), dtype=np.uint64)
    x, y = a % F.order, b % F.order
    for i in range(n):
        rows[i] = (x, y)
        x, y = y, (x + y) % F.order
    return F.from_int(rows), int(rows[n - 1, 1])
