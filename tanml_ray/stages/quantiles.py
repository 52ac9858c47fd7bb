"""Exact distributed quantiles via sort + streamed index pick.

The profile path uses t-digest (approximate, mergeable) for 10^12-row
quantiles; this module is the EXACT path for bounded-scale needs —
IQR outlier bounds (reference tanml/ui/views/profiling.py:176-187,
236-244) verified against DuckDB's quantile_cont. Semantics match
numpy/DuckDB linear interpolation: q-position = q·(n−1), value =
lerp(sorted[floor], sorted[ceil]).

Cost: one distributed sort (all-to-all) + a driver stream that stops
at the last needed index. Use the t-digest path instead when an
approximate answer is acceptable.
"""

from __future__ import annotations

import math

import pyarrow as pa


def exact_quantiles(ds, col: str, qs: list[float]) -> dict[float, float]:
    n = ds.count()
    if n == 0:
        return {q: float("nan") for q in qs}
    # needed element indices (0-based) per quantile
    need: dict[float, tuple[int, int, float]] = {}
    max_idx = 0
    for q in qs:
        pos = q * (n - 1)
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        need[q] = (lo, hi, pos - math.floor(pos))
        max_idx = max(max_idx, hi)

    sorted_ds = ds.select_columns([col]).sort(col)
    found: dict[int, float] = {}
    want = {i for q in qs for i in need[q][:2]}
    seen = 0
    for b in sorted_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        arr = b.column(col).to_numpy(zero_copy_only=False)
        for idx in sorted(want):
            if seen <= idx < seen + len(arr):
                found[idx] = float(arr[idx - seen])
        seen += len(arr)
        if seen > max_idx:
            break
    return {q: found[lo] + frac * (found[hi] - found[lo])
            for q, (lo, hi, frac) in need.items()}


def iqr_outlier_summary(ds, col: str) -> dict[str, float]:
    """Reference IQR rule: bounds Q1−1.5·IQR / Q3+1.5·IQR, then one
    counting pass for rows outside (profiling.py:306-327)."""
    import pyarrow.compute as pc

    from tanml_ray.functions.collect import collect_pylist

    qv = exact_quantiles(ds, col, [0.25, 0.75])
    q1, q3 = qv[0.25], qv[0.75]
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr

    def count_out(batch: pa.Table) -> pa.Table:
        x = batch.column(col)
        below = pc.sum(pc.cast(pc.less(x, lo), pa.int64())).as_py() or 0
        above = pc.sum(pc.cast(pc.greater(x, hi), pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64()),
                         "below": pa.array([below], type=pa.int64()),
                         "above": pa.array([above], type=pa.int64())})

    tot = {"n": 0, "below": 0, "above": 0}
    for r in collect_pylist(ds.map_batches(count_out, batch_format="pyarrow")):
        for k in tot:
            tot[k] += r[k]
    n_out = tot["below"] + tot["above"]
    return {"q1": q1, "q3": q3, "iqr_lo": lo, "iqr_hi": hi,
            "n": tot["n"], "n_outliers": n_out,
            "outlier_pct": 100.0 * n_out / tot["n"] if tot["n"] else 0.0}


def quantile_cont_from_counts(vals, cum, q: float) -> float:
    """quantile_cont / np.percentile-parity linear interpolation over a
    SORTED value grid with cumulative counts (the value-count path the
    integer-grid operators use instead of a distributed sort): position
    h = q·(n−1), value = v_lo + frac·(v_hi − v_lo) where v_lo/v_hi are
    the expanded-array elements at floor(h)/ceil(h). Shared by the
    robust scaler, winsorization and the ppl-tertile bucketing so the
    oracle-parity formula lives in exactly one place."""
    import numpy as np

    vals = np.asarray(vals, dtype=np.float64)
    cum = np.asarray(cum)
    n = int(cum[-1])
    h = (n - 1) * q
    lo = int(math.floor(h))
    hi = min(lo + 1, n - 1)
    v_lo = float(vals[np.searchsorted(cum, lo + 1)])
    v_hi = float(vals[np.searchsorted(cum, hi + 1)])
    return v_lo + (h - lo) * (v_hi - v_lo)
