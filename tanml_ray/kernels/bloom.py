"""Bloom filter (Bloom 1970; Kirsch–Mitzenmacher double hashing).

The ray_guide semi/anti-join pattern: "broadcast the key set (or a
Bloom filter of it) and filter inside map_batches". The filter is the
scale path when the key set itself is too big to broadcast exactly —
m bits ≪ 8·n·keysize bytes. No false negatives; false-positive rate
≈ (1 − e^{−kn/m})^k, so an exact verify pass (small, post-filter)
restores exactness when required.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = 1 << max(6, (m - 1).bit_length())   # power of two for masking
        self.k = max(1, round(self.m / max(capacity, 1) * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _hashes(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        arr = np.asarray(values)
        if arr.dtype == object:
            h1 = pd.util.hash_array(arr.astype(object), categorize=False)
        else:
            h1 = pd.util.hash_array(arr)
        # independent second hash: re-hash the first
        h2 = pd.util.hash_array(h1) | np.uint64(1)
        return h1, h2

    def _positions(self, h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
        return (h1 + np.uint64(i) * h2) & np.uint64(self.m - 1)

    def add(self, values: np.ndarray) -> None:
        h1, h2 = self._hashes(values)
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, values: np.ndarray) -> np.ndarray:
        h1, h2 = self._hashes(values)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if other.m != self.m or other.k != self.k:
            raise ValueError("bloom parameter mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_state(self) -> tuple:
        return (self.m, self.k, self.bits.tobytes())

    @classmethod
    def from_state(cls, s: tuple) -> "BloomFilter":
        b = cls.__new__(cls)
        b.m, b.k = s[0], s[1]
        b.bits = np.frombuffer(s[2], dtype=np.uint64).copy()
        return b
