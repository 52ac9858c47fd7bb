"""Executive pass/fail roll-up (SURVEY §2.5 A24).

Reference thresholds preserved verbatim
(/root/reference/tanml/ui/reports/generators.py:344-431, narratives
tanml/ui/narratives.py:112-248):

    critical drift      : any PSI ≥ 0.2 ("severe")          → warning item
    stress fragility    : any |metric delta| > 0.1          → warning item
    overfitting         : train−test metric gap > 0.15      → warning item
    OOD exposure        : out-of-distribution rows > 10%    → warning item
    poor coverage       : cluster coverage < 80%            → warning item
    any constraint fail : violations > 0                    → fail item

overall: fail if any fail item, warning if any warning item, else pass.
"""

from __future__ import annotations

from typing import Any

from tanml_ray.registry import CheckResult
from tanml_ray.sources.ingest import read_parquet_clean

DRIFT_SEVERE_PSI = 0.2
STRESS_DELTA_MAX = 0.1
OVERFIT_GAP_MAX = 0.15
OOD_PCT_MAX = 10.0
COVERAGE_MIN_PCT = 80.0


def executive_rollup(validation_summary: dict[str, Any] | None = None,
                     drift_summary: dict[str, Any] | None = None,
                     stress_rows: list[dict[str, Any]] | None = None,
                     coverage_rows: list[dict[str, Any]] | None = None,
                     train_metric: float | None = None,
                     test_metric: float | None = None,
                     drift_rows: list[dict[str, Any]] | None = None) -> CheckResult:
    issues: list[str] = []
    fails: list[str] = []
    metrics: dict[str, Any] = {}

    if validation_summary:
        metrics["total_violations"] = validation_summary.get("total_violations", 0)
        metrics["duplicate_urls"] = validation_summary.get("duplicate_urls", 0)
        if validation_summary.get("overall") == "fail":
            fails.append(
                f"{metrics['total_violations']} constraint violations, "
                f"{metrics['duplicate_urls']} duplicate urls")

    if drift_summary:
        metrics["drift_severe_groups"] = drift_summary.get("severe", 0)
        if drift_summary.get("severe", 0) > 0:
            issues.append(f"critical drift in {drift_summary['severe']} group(s)")

    if stress_rows:
        worst = max((abs(r.get("delta", 0.0) or 0.0) for r in stress_rows), default=0.0)
        metrics["max_stress_delta"] = worst
        base = next((abs(r["rmse"]) for r in stress_rows
                     if r.get("perturbation") == 0.0 and r.get("rmse")), None)
        rel = worst / base if base else worst
        if rel > STRESS_DELTA_MAX:
            issues.append(f"stress fragility: max relative delta {rel:.3f} > 0.1")

    if coverage_rows:
        n = sum(r["n"] for r in coverage_rows)
        ood = sum(r.get("n_ood", 0) for r in coverage_rows)
        ood_pct = 100.0 * ood / n if n else 0.0
        coverage_pct = 100.0 - ood_pct
        metrics["ood_pct"] = ood_pct
        metrics["coverage_pct"] = coverage_pct
        if ood_pct > OOD_PCT_MAX:
            issues.append(f"OOD exposure {ood_pct:.1f}% > 10%")
        if coverage_pct < COVERAGE_MIN_PCT:
            issues.append(f"coverage {coverage_pct:.1f}% < 80%")

    if train_metric is not None and test_metric is not None:
        gap = abs(train_metric - test_metric)
        metrics["train_test_gap"] = gap
        if gap > OVERFIT_GAP_MAX:
            issues.append(f"overfitting: train-test gap {gap:.3f} > 0.15")

    status = "fail" if fails else ("warning" if issues else "pass")
    summary = ("healthy" if status == "pass"
               else "; ".join(fails + issues))

    # human-readable findings (reference narrative layer semantics,
    # pipelines/narratives.py) alongside the machine-readable items
    from tanml_ray.pipelines.narratives import (
        story_drift,
        story_validation,
    )

    narratives: dict[str, str] = {}
    if validation_summary:
        narratives["validation"] = story_validation(validation_summary)
    if drift_rows is not None:
        narratives["drift"] = story_drift(drift_rows)
    return CheckResult(name="executive_rollup", status=status,
                       metrics=metrics, summary=summary,
                       report_data={"issues": issues, "fails": fails,
                                    "narratives": narratives})


def run_full_report(input_dir: str, out_dir: str,
                    baseline_artifact: str | None = None,
                    constraints=None) -> dict[str, Any]:
    """End-to-end report job (the `ray job submit` user surface): one
    validation run + optional drift vs a saved baseline + executive
    roll-up with narratives, all written under out_dir:

        out_dir/violations/        violation rows (partitioned parquet)
        out_dir/drift.parquet      per-group drift table (if baseline)
        out_dir/report.json        summary + roll-up + narratives

    Returns the report dict. Composes the same pipelines the driver
    queries exercise — no separate code path to drift out of sync."""
    import json
    import os

    import pyarrow.parquet as pq

    import ray.data as rd

    from tanml_ray.pipelines.narratives import render_report_narratives
    from tanml_ray.pipelines.validate import run_pages_validation

    rep = run_pages_validation(input_dir, out_dir=out_dir,
                               constraints=constraints)
    report: dict[str, Any] = {"validation_summary": rep.summary}

    drift_summary = None
    if baseline_artifact:
        from tanml_ray.pipelines.drift import DriftBaseline, compute_drift

        baseline = DriftBaseline.load(baseline_artifact)
        table, drift_summary = compute_drift(baseline, read_parquet_clean(input_dir))
        pq.write_table(table, os.path.join(out_dir, "drift.parquet"))
        report["drift_summary"] = drift_summary
        report["drift_table"] = table.to_pylist()

    rollup = executive_rollup(validation_summary=rep.summary,
                              drift_summary=drift_summary,
                              drift_rows=report.get("drift_table"))
    narratives = render_report_narratives(report)
    out = {
        "validation": rep.summary,
        "drift": drift_summary,
        "rollup": {"status": rollup.status, "summary": rollup.summary,
                   "metrics": rollup.metrics,
                   **rollup.report_data},
        "narratives": narratives,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(out, f, indent=2, default=str)
    return out
