"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public alg).

Replaces the reference's exact ``Series.nunique()``
(/root/reference/tanml/ui/views/profiling.py:38-43) which cannot run on
10^12 rows without a shuffle. Vectorized over Arrow batches using
pandas' stable 64-bit ``hash_array`` (deterministic across processes),
registers merged with elementwise max — associative and commutative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    p = int(np.log2(m))
    if p in _ALPHA:
        return _ALPHA[p]
    return 0.7213 / (1.0 + 1.079 / m)


def hash_array_stable(arr: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of an arrow/numpy array (nulls dropped)."""
    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.drop_null()
        if len(arr) == 0:
            return np.empty(0, dtype=np.uint64)
        np_arr = arr.to_numpy(zero_copy_only=False)
    else:
        np_arr = np.asarray(arr)
    if np_arr.dtype == object:
        np_arr = np_arr.astype(str)
        return pd.util.hash_array(np_arr.astype(object), categorize=True)
    return pd.util.hash_array(np_arr)


class HyperLogLog:
    """Standard HLL with linear-counting small-range correction.

    p=12 → 4096 registers, ~1.6% standard error, 4 KB state.
    """

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, arr: pa.ChunkedArray | pa.Array | np.ndarray) -> None:
        h = hash_array_stable(arr)
        if h.size == 0:
            return
        self.update_hashes(h)

    def update_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        wbits = 64 - self.p
        w = h & np.uint64((1 << wbits) - 1)
        # rho = leading-zero count within wbits + 1; float64 log2 is exact
        # for integers < 2^53 (wbits <= 52 ⇒ safe for p >= 12)
        rho = np.full(h.shape, wbits + 1, dtype=np.uint8)
        nz = w > 0
        if nz.any():
            rho[nz] = (wbits - np.floor(np.log2(w[nz].astype(np.float64)))).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("HLL precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> int:
        m = float(self.m)
        est = _alpha(self.m) * m * m / float(np.power(2.0, -self.registers.astype(np.float64)).sum())
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting
        return int(round(est))

    def to_state(self) -> tuple:
        return (self.p, self.registers.tobytes())

    @classmethod
    def from_state(cls, s: tuple) -> "HyperLogLog":
        h = cls(p=s[0])
        h.registers = np.frombuffer(s[1], dtype=np.uint8).copy()
        return h
