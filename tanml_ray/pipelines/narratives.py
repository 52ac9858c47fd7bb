"""Human-readable narrative generation over engine artifacts.

Re-expresses the reference's narrative layer
(/root/reference/tanml/ui/narratives.py) for this engine's result
shapes. Band thresholds are kept verbatim so the wording matches the
reference's judgment on identical inputs:
  - performance bands (AUC 0.9/0.75/0.6, R² 0.8/0.3):  narratives.py:24-70
  - top-feature dominance phrasing:                     narratives.py:73-109
  - overfitting delta bands (0.1 / 0.05, error-metric
    sign flip):                                         narratives.py:112-169
  - drift PSI bands (0.2 / 0.1) + counts:               narratives.py:172-206
  - stress drop bands (0.02 / 0.05):                    narratives.py:209-249

All functions are driver-side string renderers over SMALL artifacts
(summary dicts, top-k tables) — narrative generation never touches the
distributed data.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def _get(m: dict[str, Any], key: str, default: float = 0.0) -> float:
    for k, v in m.items():
        if k.lower() == key.lower():
            return v
    return default


def story_performance(metrics: dict[str, Any], task_type: str) -> str:
    """narratives.py:24-70 bands."""
    s: list[str] = []
    if task_type == "classification":
        auc = _get(metrics, "roc_auc") or _get(metrics, "auc")
        if auc:
            s.append(f"The model achieved an ROC AUC of {auc:.3f}.")
            if auc > 0.9:
                s.append("This indicates excellent discriminatory power.")
            elif auc > 0.75:
                s.append("This performance is considered good.")
            elif auc > 0.6:
                s.append("The model has moderate predictive skill.")
            else:
                s.append("The performance is relatively weak, suggesting "
                         "more features or data may be needed.")
        f1 = _get(metrics, "f1")
        acc = _get(metrics, "accuracy")
        if acc and f1 and abs(acc - f1) > 0.15:
            s.append(f"Note the gap between Accuracy ({acc:.2f}) and F1 "
                     f"({f1:.2f}), suggesting class imbalance issues.")
    else:
        r2 = _get(metrics, "r2")
        rmse = _get(metrics, "rmse")
        s.append(f"The model captured {r2:.1%} of the variance in the "
                 "target (R2 Score).")
        s.append(f"On average, predictions are off by {rmse:.3f} units (RMSE).")
        if r2 > 0.8:
            s.append("This is a high-precision model.")
        elif r2 < 0.3:
            s.append("The low R2 suggests the features explain very little "
                     "of the target's behavior.")
    return " ".join(s)


def story_features(ranking: "pa.Table | list[dict]", top_n: int = 3) -> str:
    """Feature dominance over a ranking table with (feature, <score>)
    columns already sorted descending — e.g. feature_ranking or
    permutation_importance output (narratives.py:73-109)."""
    rows = ranking.to_pylist() if isinstance(ranking, pa.Table) else list(ranking)
    if not rows:
        return "Feature importance data is not available."
    top = [r["feature"] for r in rows[:top_n]]
    if len(top) >= 3:
        return (f"The model is heavily influenced by {top[0]}, {top[1]}, "
                f"and {top[2]}. These features contribute the most to "
                "predictions.")
    if len(top) == 2:
        return f"Key drivers are {top[0]} and {top[1]}."
    return f"The dominant feature is {top[0]}."


def story_overfitting(train_m: dict[str, Any], test_m: dict[str, Any]) -> str:
    """Train/test divergence bands (narratives.py:112-169)."""
    tr_norm = {k.lower(): v for k, v in train_m.items()}
    te_norm = {k.lower(): v for k, v in test_m.items()}
    keys = ["roc_auc", "r2", "accuracy", "f1", "rmse", "mae"]
    metric = next((k for k in keys if k in tr_norm and k in te_norm), None)
    if metric is None:
        return ("Could not analyze stability. Metrics not matched in both "
                "datasets.")
    tr, te = tr_norm[metric], te_norm[metric]
    delta = tr - te
    s = [f"Comparing {metric.upper()}: Train {tr:.3f} vs Test {te:.3f}."]
    is_error = metric in ("rmse", "mae", "log_loss", "brier")
    problematic = (delta < -0.1) if is_error else (delta > 0.1)
    if problematic:
        s.append("Significant overfitting detected: the model performs much "
                 "better on training data than unseen test data. Consider "
                 "regularization or reducing complexity.")
    elif abs(delta) > 0.05:
        s.append("There is mild divergence between Train and Test, but it "
                 "may be within acceptable limits.")
    else:
        s.append("The model generalizes well, with consistent performance "
                 "across both datasets.")
    return " ".join(s)


def story_drift(drift_table: "pa.Table | list[dict]") -> str:
    """PSI band counts over the engine's drift table rows
    ((lang, bucket, psi, psi_level, …) — pipelines/drift.py) with the
    reference's 0.2/0.1 bands and alert phrasing
    (narratives.py:172-206)."""
    rows = (drift_table.to_pylist() if isinstance(drift_table, pa.Table)
            else list(drift_table))
    if not rows:
        return "No drift analysis performed."
    high = [r for r in rows if (r.get("psi") or 0) > 0.2]
    med = [r for r in rows if 0.1 < (r.get("psi") or 0) <= 0.2]
    if high:
        feats = ", ".join(
            f"{r.get('lang', r.get('feature', '?'))}/{r.get('bucket', '')}".rstrip("/")
            for r in high[:3])
        return (f"Critical drift alert: {len(high)} groups (including "
                f"{feats}) show significant distribution shifts (PSI > 0.2). "
                "Model reliability may be compromised.")
    if med:
        return (f"Monitor: {len(med)} groups show slight drift "
                "(PSI 0.1-0.2). This is usually acceptable but worth "
                "watching.")
    return ("Stable: no significant data drift detected. The current "
            "distribution closely matches the baseline.")


def story_stress(stress_rows: "pa.Table | list[dict]") -> str:
    """Largest metric drop under perturbation, reference 0.02/0.05
    bands (narratives.py:209-249). Rows carry (metric, baseline,
    stressed)."""
    rows = (stress_rows.to_pylist() if isinstance(stress_rows, pa.Table)
            else list(stress_rows))
    if not rows:
        return "No stress-test data available."
    max_drop, worst = 0.0, None
    for r in rows:
        b, st = r.get("baseline"), r.get("stressed")
        if b is None or st is None:
            continue
        drop = abs(b - st)
        if drop > max_drop:
            max_drop, worst = drop, r.get("metric")
    if max_drop < 0.02:
        return "Model is highly robust: performance barely changes under stress."
    if max_drop < 0.05:
        return (f"The model shows moderate resilience. Largest drop was "
                f"{max_drop:.3f} in {worst}.")
    return (f"Model sensitivity detected: {worst} dropped by {max_drop:.3f} "
            "under noise. Consider ensemble methods or regularization.")


def story_validation(summary: dict[str, Any]) -> str:
    """Narrative over the flagship ValidationReport summary
    (pipelines/validate.py) — engine-specific; phrased in the
    reference's alert register."""
    s = [f"Validated {summary.get('rows', 0):,} rows across "
         f"{summary.get('partitions', 0)} partitions."]
    tv = summary.get("total_violations", 0)
    du = summary.get("duplicate_urls", 0)
    if tv:
        s.append(f"{tv:,} constraint violations were found in "
                 f"{summary.get('failed_partitions', 0)} partitions.")
    else:
        s.append("No constraint violations were found.")
    if du:
        s.append(f"{du:,} duplicate urls violate the uniqueness constraint.")
    s.append("Overall status: "
             f"{'FAIL' if summary.get('overall') == 'fail' else 'PASS'}.")
    return " ".join(s)


def render_report_narratives(report: dict[str, Any]) -> dict[str, str]:
    """Assemble every available narrative section from a report dict
    with optional keys: validation_summary, drift_table, metrics/task,
    train_metrics/test_metrics, ranking, stress_rows."""
    out: dict[str, str] = {}
    if "validation_summary" in report:
        out["validation"] = story_validation(report["validation_summary"])
    if "drift_table" in report:
        out["drift"] = story_drift(report["drift_table"])
    if "metrics" in report:
        out["performance"] = story_performance(report["metrics"],
                                               report.get("task", "classification"))
    if "train_metrics" in report and "test_metrics" in report:
        out["overfitting"] = story_overfitting(report["train_metrics"],
                                               report["test_metrics"])
    if "ranking" in report:
        out["features"] = story_features(report["ranking"])
    if "stress_rows" in report:
        out["stress"] = story_stress(report["stress_rows"])
    return out
