"""Count-Min sketch (Cormode & Muthukrishnan 2005, public algorithm).

Fixed-size frequency sketch with one-sided error: estimate(x) ≥
true(x), and estimate(x) ≤ true(x) + ε·N with probability 1−δ for
width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉. Complements the exact-under-skew
Misra–Gries sketch (kernels/heavyhitters.py): MG answers "what are
the top items", CMS answers "how often did THIS item occur" for
arbitrary queried items — the per-key frequency primitive for
hot-key detection before salting a shuffle.

Mergeable by elementwise table addition (same seeds/shape required),
so per-block sketches combine in a tree exactly like the Welford /
HLL / t-digest partials in this package. Hash rows are independent
blake2b-keyed 64-bit hashes (seeded per row; keyed, so adversarial
web tokens cannot align collisions across rows).
"""

from __future__ import annotations

import hashlib

import numpy as np


class CountMin:
    def __init__(self, width: int = 2048, depth: int = 4):
        if width < 1 or depth < 1:
            raise ValueError("width and depth must be >= 1")
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0  # total weight inserted

    def _rows(self, items: list) -> np.ndarray:
        """(depth, len(items)) int64 column indices."""
        out = np.empty((self.depth, len(items)), dtype=np.int64)
        for j, x in enumerate(items):
            b = str(x).encode("utf-8")
            for d in range(self.depth):
                h = hashlib.blake2b(b, digest_size=8,
                                    key=d.to_bytes(8, "little")).digest()
                out[d, j] = int.from_bytes(h, "little") % self.width
        return out

    def update(self, items: list, counts: list | None = None) -> None:
        if not items:
            return
        w = (np.asarray(counts, dtype=np.int64) if counts is not None
             else np.ones(len(items), dtype=np.int64))
        idx = self._rows(items)
        for d in range(self.depth):
            # np.add.at: correct under repeated column indices
            np.add.at(self.table[d], idx[d], w)
        self.n += int(w.sum())

    def query(self, item) -> int:
        idx = self._rows([item])
        return int(min(self.table[d, idx[d, 0]] for d in range(self.depth)))

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("CountMin shape mismatch")
        self.table += other.table
        self.n += other.n
        return self

    # -- serialization (shuffle-friendly fixed-size blob) ------------
    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.n], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMin":
        head = np.frombuffer(blob[:24], dtype=np.int64)
        sk = cls(width=int(head[0]), depth=int(head[1]))
        sk.n = int(head[2])
        sk.table = np.frombuffer(blob[24:], dtype=np.int64).reshape(
            sk.depth, sk.width).copy()
        return sk
