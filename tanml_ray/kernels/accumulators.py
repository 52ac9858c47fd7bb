"""Mergeable per-column statistics over Arrow arrays.

Reference semantics being reproduced (citations into /root/reference):
  - count / null count / %      tanml/ui/views/profiling.py:85-102
  - describe() stats            tanml/ui/views/profiling.py:222-224
  - fixed-bin histogram         tanml/ui/views/profiling.py:194, tanml/analysis/drift.py:62-70
  - IQR outlier bounds          tanml/ui/views/profiling.py:176-187,236-244

The reference computes these on a whole in-memory pandas Series; here
each statistic is a partial state updated per Arrow batch and merged
associatively (Chan/Welford parallel variance merge), so the same
numbers emerge from any partitioning of the input.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _to_numpy_valid(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Non-null values of a numeric arrow array as a float64 ndarray."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=np.float64)
    return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


@dataclass
class NumericMoments:
    """count/sum/mean/M2/min/max with Chan et al. parallel merge.

    Exactly mergeable: merge(a, b) == merge(b, a) and any split of the
    input yields the same (n, mean, M2) up to float roundoff.
    """

    n: int = 0
    mean: float = 0.0
    m2: float = 0.0
    total: float = 0.0
    vmin: float = math.inf
    vmax: float = -math.inf

    def update(self, arr: pa.ChunkedArray | pa.Array | np.ndarray) -> None:
        x = arr if isinstance(arr, np.ndarray) else _to_numpy_valid(arr)
        x = x[np.isfinite(x)]
        if x.size == 0:
            return
        n_b = int(x.size)
        mean_b = float(x.mean())
        m2_b = float(((x - mean_b) ** 2).sum())
        self._merge_parts(n_b, mean_b, m2_b, float(x.sum()), float(x.min()), float(x.max()))

    def merge(self, other: "NumericMoments") -> "NumericMoments":
        self._merge_parts(other.n, other.mean, other.m2, other.total, other.vmin, other.vmax)
        return self

    def _merge_parts(self, n_b: int, mean_b: float, m2_b: float,
                     total_b: float, min_b: float, max_b: float) -> None:
        if n_b == 0:
            return
        n_a = self.n
        if n_a == 0:
            self.n, self.mean, self.m2 = n_b, mean_b, m2_b
        else:
            delta = mean_b - self.mean
            n = n_a + n_b
            self.mean = self.mean + delta * (n_b / n)
            self.m2 = self.m2 + m2_b + delta * delta * (n_a * n_b / n)
            self.n = n
        self.total += total_b
        self.vmin = min(self.vmin, min_b)
        self.vmax = max(self.vmax, max_b)

    @property
    def variance(self) -> float:
        """Sample variance (ddof=1), matching pandas Series.std()."""
        return self.m2 / (self.n - 1) if self.n > 1 else float("nan")

    @property
    def std(self) -> float:
        v = self.variance
        return math.sqrt(v) if v == v else float("nan")

    def finalize(self) -> dict[str, Any]:
        if self.n == 0:
            return {"n": 0, "mean": None, "std": None, "min": None, "max": None, "sum": 0.0}
        return {
            "n": self.n,
            "mean": self.mean,
            "std": self.std,
            "min": self.vmin,
            "max": self.vmax,
            "sum": self.total,
        }

    def to_state(self) -> tuple:
        return (self.n, self.mean, self.m2, self.total, self.vmin, self.vmax)

    @classmethod
    def from_state(cls, s: tuple) -> "NumericMoments":
        return cls(n=s[0], mean=s[1], m2=s[2], total=s[3], vmin=s[4], vmax=s[5])


@dataclass
class FixedHistogram:
    """Histogram over fixed, pre-agreed bin edges — exactly mergeable.

    Matches np.histogram(col, bins=edges) semantics (right-closed final
    bin), which is what the reference uses for both display histograms
    and PSI bins (tanml/analysis/drift.py:62-70). Values outside
    [edges[0], edges[-1]] land in below/above counters (np.histogram
    drops them; PSI needs them tracked for the actual side).
    """

    edges: np.ndarray = field(default_factory=lambda: np.empty(0))
    counts: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.int64))
    below: int = 0
    above: int = 0

    def __post_init__(self) -> None:
        self.edges = np.asarray(self.edges, dtype=np.float64)
        if self.counts is None or len(self.counts) != max(len(self.edges) - 1, 0):
            self.counts = np.zeros(max(len(self.edges) - 1, 0), dtype=np.int64)
        self.counts = np.asarray(self.counts, dtype=np.int64)

    def update(self, arr: pa.ChunkedArray | pa.Array | np.ndarray) -> None:
        x = arr if isinstance(arr, np.ndarray) else _to_numpy_valid(arr)
        x = x[np.isfinite(x)]
        if x.size == 0 or len(self.edges) < 2:
            return
        lo, hi = self.edges[0], self.edges[-1]
        self.below += int((x < lo).sum())
        self.above += int((x > hi).sum())
        inside = x[(x >= lo) & (x <= hi)]
        if inside.size:
            c, _ = np.histogram(inside, bins=self.edges)
            self.counts += c

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        if len(other.edges) and not len(self.edges):
            self.edges = other.edges
            self.counts = other.counts.copy()
            self.below, self.above = other.below, other.above
            return self
        if len(other.edges):
            if not np.array_equal(self.edges, other.edges):
                raise ValueError("cannot merge histograms with different edges")
            self.counts += other.counts
            self.below += other.below
            self.above += other.above
        return self

    @property
    def n(self) -> int:
        return int(self.counts.sum()) + self.below + self.above

    def finalize(self) -> dict[str, Any]:
        return {
            "edges": self.edges.tolist(),
            "counts": self.counts.tolist(),
            "below": self.below,
            "above": self.above,
        }

    def to_state(self) -> tuple:
        return (self.edges, self.counts, self.below, self.above)

    @classmethod
    def from_state(cls, s: tuple) -> "FixedHistogram":
        return cls(edges=s[0], counts=s[1], below=s[2], above=s[3])


class ColumnProfileAcc:
    """Full per-column profile: count/null/min/max (+ numeric moments,
    t-digest quantiles, HLL distinct, heavy hitters for strings).

    One accumulator per column; kind in {"numeric", "string",
    "timestamp", "other"} chosen from the Arrow type.
    """

    def __init__(self, name: str, kind: str,
                 hll_p: int = 12, tdigest_delta: int = 256, topk: int = 32):
        from tanml_ray.kernels.hll import HyperLogLog
        from tanml_ray.kernels.tdigest import TDigest
        from tanml_ray.kernels.heavyhitters import MisraGries

        self.name = name
        self.kind = kind
        self.count = 0          # total rows seen (incl. null)
        self.null_count = 0
        self.hll = HyperLogLog(p=hll_p)
        self.moments = NumericMoments() if kind == "numeric" else None
        self.tdigest = TDigest(delta=tdigest_delta) if kind == "numeric" else None
        self.heavy = MisraGries(k=topk) if kind in ("string", "other") else None
        # min/max for non-numeric kinds tracked as python scalars
        self._gmin: Any = None
        self._gmax: Any = None

    @staticmethod
    def kind_of(dtype: pa.DataType) -> str:
        if pa.types.is_floating(dtype) or pa.types.is_integer(dtype) or pa.types.is_decimal(dtype):
            return "numeric"
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
            return "string"
        if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
            return "timestamp"
        return "other"

    def update(self, arr: pa.ChunkedArray | pa.Array) -> None:
        n = len(arr)
        self.count += n
        # pandas semantics (the reference's isnull): NaN counts as missing
        if pa.types.is_floating(arr.type):
            null_mask = pc.is_null(arr, nan_is_null=True)
            nulls = pc.sum(null_mask).as_py() or 0
            valid = arr.filter(pc.invert(null_mask)) if nulls else arr
        else:
            nulls = arr.null_count
            valid = arr.drop_null() if nulls else arr
        self.null_count += nulls
        if nulls == n:
            return
        self.hll.update(valid)
        if self.kind == "numeric":
            x = _to_numpy_valid(valid)
            self.moments.update(x)
            self.tdigest.update(x)
        else:
            if self.heavy is not None:
                self.heavy.update(valid)
            try:
                mm = pc.min_max(valid)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if lo is not None:
                    self._gmin = lo if self._gmin is None else min(self._gmin, lo)
                if hi is not None:
                    self._gmax = hi if self._gmax is None else max(self._gmax, hi)
            except pa.ArrowNotImplementedError:
                pass

    def merge(self, other: "ColumnProfileAcc") -> "ColumnProfileAcc":
        self.count += other.count
        self.null_count += other.null_count
        self.hll.merge(other.hll)
        if self.moments is not None and other.moments is not None:
            self.moments.merge(other.moments)
        if self.tdigest is not None and other.tdigest is not None:
            self.tdigest.merge(other.tdigest)
        if self.heavy is not None and other.heavy is not None:
            self.heavy.merge(other.heavy)
        for attr in ("_gmin",):
            o = other._gmin
            if o is not None:
                self._gmin = o if self._gmin is None else min(self._gmin, o)
        o = other._gmax
        if o is not None:
            self._gmax = o if self._gmax is None else max(self._gmax, o)
        return self

    def finalize(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "column": self.name,
            "kind": self.kind,
            "count": self.count,
            "null_count": self.null_count,
            "null_pct": (100.0 * self.null_count / self.count) if self.count else 0.0,
            "approx_distinct": self.hll.estimate(),
        }
        if self.kind == "numeric":
            if self.moments.n > 0:
                m = self.moments.finalize()
                q = self.tdigest
                q25, q50, q75 = q.quantile(0.25), q.quantile(0.5), q.quantile(0.75)
                iqr = q75 - q25
                out.update({
                    "mean": m["mean"], "std": m["std"], "min": m["min"], "max": m["max"],
                    "sum": m["sum"], "q25": q25, "q50": q50, "q75": q75,
                    # IQR outlier bounds, reference profiling.py:176-187
                    "iqr_lo": q25 - 1.5 * iqr, "iqr_hi": q75 + 1.5 * iqr,
                })
            else:
                # stable schema even when every value is null (drift.py:59-66:
                # empty/all-null must not crash, stats are NaN/None)
                out.update({k: None for k in ("mean", "std", "min", "max", "sum",
                                              "q25", "q50", "q75", "iqr_lo", "iqr_hi")})
        else:
            out.update({"min": self._gmin, "max": self._gmax})
            if self.heavy is not None:
                out["top_values"] = self.heavy.top(10)
        # data-quality risk flags with reference thresholds (profiling.py:37-43)
        flags = []
        if out["null_pct"] > 5.0:
            flags.append("high_missing")
        d = out["approx_distinct"]
        if self.count and self.null_count < self.count:
            if d <= 1:
                flags.append("constant")
            if self.kind == "string" and d > 50:
                flags.append("high_cardinality")
        out["risk_flags"] = flags
        return out

    def to_state(self) -> dict:
        return {
            "name": self.name, "kind": self.kind,
            "count": self.count, "null_count": self.null_count,
            "hll": self.hll.to_state(),
            "moments": self.moments.to_state() if self.moments else None,
            "tdigest": self.tdigest.to_state() if self.tdigest else None,
            "heavy": self.heavy.to_state() if self.heavy else None,
            "gmin": self._gmin, "gmax": self._gmax,
        }

    @classmethod
    def from_state(cls, s: dict) -> "ColumnProfileAcc":
        from tanml_ray.kernels.hll import HyperLogLog
        from tanml_ray.kernels.tdigest import TDigest
        from tanml_ray.kernels.heavyhitters import MisraGries

        acc = cls(s["name"], s["kind"])
        acc.count = s["count"]
        acc.null_count = s["null_count"]
        acc.hll = HyperLogLog.from_state(s["hll"])
        acc.moments = NumericMoments.from_state(s["moments"]) if s["moments"] else None
        acc.tdigest = TDigest.from_state(s["tdigest"]) if s["tdigest"] else None
        acc.heavy = MisraGries.from_state(s["heavy"]) if s["heavy"] else None
        acc._gmin, acc._gmax = s["gmin"], s["gmax"]
        return acc
