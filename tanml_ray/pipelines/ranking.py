"""Feature ranking + distributed linear-model cross-validation.

Reference semantics (citations into /root/reference):
  - power score: |pearson(x, target)| scaled so the max = 100, sorted
    descending                         tanml/ui/views/ranking.py:224-288
  - univariate p-values (per-feature OLS slope t-test)
                                       tanml/ui/views/ranking.py:310-341
  - pseudo-IV = (power/100)·0.5, pseudo-Gini = (power/100)·0.8
                                       tanml/ui/views/ranking.py:357-362
  - repeated K-fold CV with per-fold metric distribution
                                       tanml/ui/services/cv.py:11-237

Everything derives from single-pass sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy² per feature / per fold), so the whole CV of
a univariate linear model is ONE streaming pass + closed-form algebra —
no per-fold refit passes (k-fold fit = total-sums − fold-sums).
Fold assignment is deterministic by key modulo — retry/partition-safe.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from tanml_ray.functions.collect import collect_pylist
from tanml_ray.kernels.stats import pearson_r_pvalue


def _suff_stats(ds, x_cols: list[str], y_col: str,
                fold_of=None) -> dict[tuple, dict[str, float]]:
    """{(feature, fold): sufficient stats}; fold = -1 if no fold_fn."""
    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        folds = fold_of(batch) if fold_of else np.full(len(y), -1, dtype=np.int64)
        rows = []
        for c in x_cols:
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for f in np.unique(folds):
                m = folds == f
                xm, ym = x[m], y[m]
                rows.append({"feature": c, "fold": int(f), "n": int(m.sum()),
                             "sx": float(xm.sum()), "sy": float(ym.sum()),
                             "sxy": float((xm * ym).sum()),
                             "sxx": float((xm * xm).sum()),
                             "syy": float((ym * ym).sum())})
        return pa.Table.from_pylist(rows)

    out: dict[tuple, dict[str, float]] = {}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        k = (r["feature"], r["fold"])
        m = out.setdefault(k, {s: 0.0 for s in ("n", "sx", "sy", "sxy", "sxx", "syy")})
        for s in m:
            m[s] += r[s]
    return out


def _pearson(st: dict[str, float]) -> float:
    n = st["n"]
    num = n * st["sxy"] - st["sx"] * st["sy"]
    den = math.sqrt((n * st["sxx"] - st["sx"] ** 2) * (n * st["syy"] - st["sy"] ** 2))
    return num / den if den > 0 else float("nan")


def feature_ranking(ds, x_cols: list[str], y_col: str) -> pa.Table:
    """Power scores + p-values + pseudo-IV/Gini, sorted by power desc
    (reference ranking.py:366 sort; K2)."""
    stats = _suff_stats(ds, x_cols, y_col)
    rows = []
    for c in x_cols:
        st = stats[(c, -1)]
        r = _pearson(st)
        rows.append({"feature": c, "r": r, "abs_r": abs(r),
                     "p_value": pearson_r_pvalue(r, int(st["n"]))})
    max_abs = max((row["abs_r"] for row in rows if row["abs_r"] == row["abs_r"]),
                  default=1.0) or 1.0
    for row in rows:
        power = 100.0 * row["abs_r"] / max_abs
        row["power"] = power
        row["pseudo_iv"] = (power / 100.0) * 0.5    # ranking.py:357-362
        row["pseudo_gini"] = (power / 100.0) * 0.8
    rows.sort(key=lambda r: -r["power"])
    return pa.Table.from_pylist(rows)


def linear_cv(ds, x_col: str, y_col: str, key_col: str, k: int = 5) -> pa.Table:
    """K-fold CV of the univariate OLS model y = a + b·x in ONE pass:
    fold f's model is fit from (total − fold f) sufficient stats, then
    fold f's RMSE/R² follow from its own stats. Per-fold rows +
    the reference's mean/std/min/max summary (cv.py:205-222)."""
    def fold_of(batch: pa.Table) -> np.ndarray:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return (keys % k).astype(np.int64)

    stats = _suff_stats(ds, [x_col], y_col, fold_of=fold_of)
    total = {s: sum(stats[(x_col, f)][s] for f in range(k))
             for s in ("n", "sx", "sy", "sxy", "sxx", "syy")}
    rows = []
    for f in range(k):
        te = stats[(x_col, f)]
        tr = {s: total[s] - te[s] for s in total}
        n = tr["n"]
        den = n * tr["sxx"] - tr["sx"] ** 2
        b = (n * tr["sxy"] - tr["sx"] * tr["sy"]) / den if den else 0.0
        a = (tr["sy"] - b * tr["sx"]) / n
        # test-side SSE = Σ(y − a − bx)² expanded in sufficient stats
        sse = (te["syy"] + te["n"] * a * a + b * b * te["sxx"]
               - 2 * a * te["sy"] - 2 * b * te["sxy"] + 2 * a * b * te["sx"])
        ss_tot = te["syy"] - te["sy"] ** 2 / te["n"]
        rows.append({"fold": f, "n_test": int(te["n"]),
                     "rmse": math.sqrt(max(sse, 0.0) / te["n"]),
                     "r2": 1 - sse / ss_tot if ss_tot > 0 else float("nan")})
    return pa.Table.from_pylist(rows)


def cv_summary(per_fold: pa.Table, metric: str = "rmse") -> dict[str, float]:
    vals = np.asarray(per_fold.column(metric).to_pylist(), dtype=np.float64)
    return {"mean": float(vals.mean()), "std": float(vals.std(ddof=1)),
            "min": float(vals.min()), "max": float(vals.max()),
            "p05": float(np.percentile(vals, 5)),
            "p50": float(np.percentile(vals, 50)),
            "p95": float(np.percentile(vals, 95))}
