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


REPEAT_FOLD_PRIME = 1_000_003


def repeated_fold(keys: np.ndarray, rep: int, k: int) -> np.ndarray:
    """Deterministic per-repeat fold assignment (the deterministic
    analog of the reference's per-repeat RNG seeds, ui/services/cv.py:
    37-48). Repeat 0 is the engine-wide `key % k` contract; repeat
    r ≥ 1 mixes through the prime P=1000003 with a LARGE per-repeat
    multiplier (Lehmer-style): `((key % P)·(48271·r + 12345)) % P % k`.
    Multiplication mod a PRIME is a bijection for any multiplier, and
    the multiplier must be large enough that key·A wraps P even for
    small keys — the P-wraparound is what scrambles the residue
    classes mod k (an affine map mod k alone would only RELABEL the
    key % k classes, so every repeat would test the same splits; a
    small multiplier never wraps P for small keys and degenerates the
    same way). Trivially SQL-expressible, so repeated CV stays fully
    oracle-able. Fold granularity is key % P — ~10⁶ equivalence
    classes, ample balance at any scale; max intermediate
    (P−1)·(48271·r+12345) stays int64-safe through r ≈ 10⁸, and a
    multiplier that hits ≡ 0 mod P (first at rep 568583) is normalized
    to 1 so no repeat can ever collapse to a single fold."""
    keys = keys.astype(np.int64)
    if rep == 0:
        return (keys % k).astype(np.int64)
    P = REPEAT_FOLD_PRIME
    m = (48271 * rep + 12345) % P or 1
    return (((keys % P) * m) % P % k).astype(np.int64)


def linear_cv_repeated(ds, x_col: str, y_col: str, key_col: str,
                       k: int = 5, n_repeats: int = 3) -> pa.Table:
    """Repeated K-fold CV of the univariate OLS model y = a + b·x in
    ONE streaming pass (reference ui/services/cv.py:37-48 Repeated*KFold
    semantics): per-(repeat, fold) sufficient stats accumulate in a
    single map_batches sweep; every (repeat, fold) model is then
    closed-form algebra on the driver (fit = repeat-total − fold sums).
    Returns (rep, fold, n_test, rmse, r2) sorted by (rep, fold) —
    k·n_repeats rows from one pass over the data, vs the reference's
    k·n_repeats refits."""
    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        rows = []
        for rep in range(n_repeats):
            folds = repeated_fold(keys, rep, k)
            for f in np.unique(folds):
                m = folds == f
                xm, ym = x[m], y[m]
                rows.append({"rep": rep, "fold": int(f), "n": int(m.sum()),
                             "sx": float(xm.sum()), "sy": float(ym.sum()),
                             "sxy": float((xm * ym).sum()),
                             "sxx": float((xm * xm).sum()),
                             "syy": float((ym * ym).sum())})
        return pa.Table.from_pylist(rows)

    stats: dict[tuple[int, int], dict[str, float]] = {}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        m = stats.setdefault((r["rep"], r["fold"]),
                             {s: 0.0 for s in ("n", "sx", "sy", "sxy", "sxx", "syy")})
        for s in m:
            m[s] += r[s]

    rows = []
    for rep in range(n_repeats):
        total = {s: sum(stats.get((rep, f), {}).get(s, 0.0) for f in range(k))
                 for s in ("n", "sx", "sy", "sxy", "sxx", "syy")}
        for f in range(k):
            te = stats.get((rep, f))
            if te is None or te["n"] == 0:
                continue
            tr = {s: total[s] - te[s] for s in total}
            n = tr["n"]
            den = n * tr["sxx"] - tr["sx"] ** 2
            b = (n * tr["sxy"] - tr["sx"] * tr["sy"]) / den if den else 0.0
            a = (tr["sy"] - b * tr["sx"]) / n
            # test-side SSE = Σ(y − a − bx)² expanded in sufficient stats
            sse = (te["syy"] + te["n"] * a * a + b * b * te["sxx"]
                   - 2 * a * te["sy"] - 2 * b * te["sxy"] + 2 * a * b * te["sx"])
            ss_tot = te["syy"] - te["sy"] ** 2 / te["n"]
            rows.append({"rep": rep, "fold": f, "n_test": int(te["n"]),
                         "rmse": math.sqrt(max(sse, 0.0) / te["n"]),
                         "r2": 1 - sse / ss_tot if ss_tot > 0 else float("nan")})
    return pa.Table.from_pylist(rows)


def linear_cv(ds, x_col: str, y_col: str, key_col: str, k: int = 5) -> pa.Table:
    """K-fold CV of the univariate OLS model y = a + b·x in ONE pass:
    fold f's model is fit from (total − fold f) sufficient stats, then
    fold f's RMSE/R² follow from its own stats (fold = key % k — the
    repeat-0 case of linear_cv_repeated). Per-fold rows + the
    reference's mean/std/min/max summary (cv.py:205-222)."""
    out = linear_cv_repeated(ds, x_col, y_col, key_col, k=k, n_repeats=1)
    return out.drop_columns(["rep"])


def cv_summary(per_fold: pa.Table, metric: str = "rmse") -> dict[str, float]:
    vals = np.asarray(per_fold.column(metric).to_pylist(), dtype=np.float64)
    return {"mean": float(vals.mean()), "std": float(vals.std(ddof=1)),
            "min": float(vals.min()), "max": float(vals.max()),
            "p05": float(np.percentile(vals, 5)),
            "p50": float(np.percentile(vals, 50)),
            "p95": float(np.percentile(vals, 95))}
