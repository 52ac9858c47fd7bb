"""Misra–Gries heavy-hitters sketch (public algorithm).

Replaces the reference's exact mode / ``SimpleImputer(most_frequent)``
(/root/reference/tanml/ui/views/preprocessing.py:168-171) and the
top-values display in profiling at scales where an exact
``groupby(col).count()`` shuffle is not warranted. Mergeable: merge =
counter addition followed by a decrement-to-capacity step (standard
MG merge, error ≤ n/k).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


class MisraGries:
    def __init__(self, k: int = 32):
        self.k = k
        self.counters: Counter = Counter()

    def update(self, arr: pa.ChunkedArray | pa.Array) -> None:
        if isinstance(arr, pa.Array):
            arr = pa.chunked_array([arr])
        vc = arr.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        values = vc.field("values").to_pylist()
        counts = vc.field("counts").to_pylist()
        for v, c in zip(values, counts):
            if v is None:
                continue
            self.counters[v] += c
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.counters.update(other.counters)
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        # decrement all by the (k+1)-th largest count, drop non-positive
        kth = sorted(self.counters.values(), reverse=True)[self.k]
        self.counters = Counter({v: c - kth for v, c in self.counters.items() if c > kth})

    def top(self, n: int = 10) -> list[tuple]:
        return self.counters.most_common(n)

    def to_state(self) -> dict:
        return {"k": self.k, "counters": dict(self.counters)}

    @classmethod
    def from_state(cls, s: dict) -> "MisraGries":
        m = cls(k=s["k"])
        m.counters = Counter(s["counters"])
        return m
