"""Model evaluation metrics from mergeable partials (SURVEY §2.5 A15/A16).

Reference semantics (citations into /root/reference):
  - classification: accuracy, precision, recall, F1, balanced accuracy,
    MCC, brier, log-loss, gini=2·AUC−1
    tanml/ui/views/evaluation/tabs/metrics.py:43-65, tanml/ui/services/cv.py:90-179
  - regression: RMSE, MAE, median-AE, R²
    tanml/ui/views/evaluation/tabs/metrics.py:66-78, cv.py:181-197

Engine design: confusion-matrix counts and error sums are per-batch
partials merged associatively; ROC-AUC is computed EXACTLY by the
Mann-Whitney rank formula over a distributed sort (`ds.sort(score)` +
per-block rank offsets), not a histogram approximation — ties handled
by midrank. The scorer is a broadcast pure function (the T1 actor-pool
stage degenerates to a stateless map for closed-form models).
"""

from __future__ import annotations

import math
import numpy as np
import pyarrow as pa

from tanml_ray.functions.collect import collect_pylist


def classification_counts(ds, label_col: str, score_col: str,
                          threshold: float = 0.5) -> dict[str, float]:
    """TP/FP/TN/FN + brier/log-loss sums via map_batches partials."""
    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pred = (p >= threshold).astype(np.int64)
        eps = 1e-15
        pc_ = np.clip(p, eps, 1 - eps)
        return pa.Table.from_pylist([{
            "tp": int(((pred == 1) & (y == 1)).sum()),
            "fp": int(((pred == 1) & (y == 0)).sum()),
            "tn": int(((pred == 0) & (y == 0)).sum()),
            "fn": int(((pred == 0) & (y == 1)).sum()),
            "brier_sum": float(((p - y) ** 2).sum()),
            "logloss_sum": float(-(y * np.log(pc_) + (1 - y) * np.log(1 - pc_)).sum()),
            "n": len(y),
        }])

    totals = {"tp": 0, "fp": 0, "tn": 0, "fn": 0,
              "brier_sum": 0.0, "logloss_sum": 0.0, "n": 0}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        for k in totals:
            totals[k] += r[k]
    return totals


def auc_exact(ds, label_col: str, score_col: str) -> float:
    """Exact ROC-AUC via the Mann-Whitney U statistic over a
    distributed sort: rank all scores ascending (midrank for ties),
    AUC = (Σ ranks of positives − n₊(n₊+1)/2) / (n₊ n₋).

    The sort is Ray's distributed sort; rank offsets are accumulated
    per block in order (driver holds one counter, blocks stream by)."""
    sorted_ds = ds.select_columns([score_col, label_col]).sort(score_col)
    offset = 0
    rank_sum_pos = 0.0
    n_pos = 0
    n_neg = 0
    pending_score = None
    pending_labels: list[int] = []

    def flush(score_group_labels: list[int], start_rank: int) -> float:
        # midrank for the tie group starting at rank start_rank (1-based)
        g = len(score_group_labels)
        midrank = start_rank + (g - 1) / 2.0
        return midrank * sum(score_group_labels)

    for batch in sorted_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        scores = batch.column(score_col).to_numpy(zero_copy_only=False)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_pos += int((labels == 1).sum())
        n_neg += int((labels == 0).sum())
        for s, y in zip(scores, labels):
            if pending_score is None or s == pending_score:
                pending_labels.append(int(y))
                pending_score = s
            else:
                rank_sum_pos += flush(pending_labels, offset + 1)
                offset += len(pending_labels)
                pending_labels = [int(y)]
                pending_score = s
    if pending_labels:
        rank_sum_pos += flush(pending_labels, offset + 1)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def classification_metrics(ds, label_col: str, score_col: str,
                           threshold: float = 0.5,
                           with_auc: bool = True) -> dict[str, float]:
    t = classification_counts(ds, label_col, score_col, threshold)
    tp, fp, tn, fn, n = t["tp"], t["fp"], t["tn"], t["fn"], t["n"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    specificity = tn / (tn + fp) if tn + fp else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    mcc_den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    out = {
        "n": n,
        "accuracy": (tp + tn) / n if n else float("nan"),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "balanced_accuracy": (recall + specificity) / 2,
        "mcc": ((tp * tn - fp * fn) / mcc_den) if mcc_den else 0.0,
        "brier": t["brier_sum"] / n if n else float("nan"),
        "log_loss": t["logloss_sum"] / n if n else float("nan"),
    }
    if with_auc:
        auc = auc_exact(ds, label_col, score_col)
        out["roc_auc"] = auc
        out["gini"] = 2 * auc - 1  # reference model_dev.py:885-910
    return out


def regression_metrics(ds, y_col: str, pred_col: str,
                       exact_median: bool = True) -> dict[str, float]:
    """RMSE / MAE / R² from exact partials; median-AE via distributed
    sort (exact) or t-digest (approx at extreme scale)."""
    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        p = batch.column(pred_col).to_numpy(zero_copy_only=False).astype(np.float64)
        err = p - y
        return pa.Table.from_pylist([{
            "n": len(y), "se_sum": float((err ** 2).sum()),
            "ae_sum": float(np.abs(err).sum()),
            "y_sum": float(y.sum()), "yy_sum": float((y * y).sum()),
        }])

    tot = {"n": 0, "se_sum": 0.0, "ae_sum": 0.0, "y_sum": 0.0, "yy_sum": 0.0}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        for k in tot:
            tot[k] += r[k]
    n = tot["n"]
    if n == 0:
        return {k: float("nan") for k in ("n", "rmse", "mae", "median_ae", "r2")}
    ss_tot = tot["yy_sum"] - tot["y_sum"] ** 2 / n
    out = {
        "n": n,
        "rmse": math.sqrt(tot["se_sum"] / n),
        "mae": tot["ae_sum"] / n,
        "r2": 1 - tot["se_sum"] / ss_tot if ss_tot > 0 else float("nan"),
    }
    if exact_median:
        def abs_err(batch: pa.Table) -> pa.Table:
            y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
            p = batch.column(pred_col).to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({"ae": np.abs(p - y)})

        ae = ds.map_batches(abs_err, batch_format="pyarrow").sort("ae")
        # exact median by streaming the sorted column to the midpoint
        k_lo = (n - 1) // 2
        k_hi = n // 2
        seen = 0
        vals = []
        for b in ae.iter_batches(batch_size=65536, batch_format="pyarrow"):
            a = b.column("ae").to_numpy(zero_copy_only=False)
            if seen + len(a) > k_lo:
                for idx in range(len(a)):
                    if seen + idx in (k_lo, k_hi):
                        vals.append(float(a[idx]))
                if seen + len(a) > k_hi and len(vals) == (2 if k_lo != k_hi else 1):
                    break
            seen += len(a)
        out["median_ae"] = float(np.mean(vals)) if vals else float("nan")
    return out


def infer_task_type(ds, target_col: str, max_classes: int = 5) -> str:
    """M15 task-type inference (reference models/registry.py:528-558):
    float-with-decimals → regression; ≤ max_classes distinct → classification."""
    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(target_col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        uniq = np.unique(x)[:max_classes + 1]
        return pa.Table.from_pylist([{
            "any_frac": bool((x != np.rint(x)).any()),
            "uniq": uniq.tolist(),
        }])

    any_frac = False
    uniq: set = set()
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        any_frac |= r["any_frac"]
        uniq.update(r["uniq"])
    if any_frac:
        return "regression"
    return "classification" if len(uniq) <= max_classes else "regression"
