"""Feed-health monitor job: one pass over an event feed producing the
full SPC / coverage report (Shewhart volume control, CUSUM, EWMA,
hourly coverage gaps, runs test, Theil-Sen trend) as a single JSON
summary plus optional per-day chart parquet.

This is the operational wrapper around the exact-oracled chart queries
in pipelines/queries.py — same arithmetic, pointed at an arbitrary
events parquet instead of the testdata layout. The input may be a
directory containing ``events.parquet`` (the testdata layout) or any
parquet file/dir with a timestamp column; non-standard layouts are
adapted with a symlink shim so every chart reuses the oracled code
path unchanged.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa


def _as_events_dir(input_path: str) -> str:
    """Return a directory that contains ``events.parquet``.

    The oracled chart queries read ``{sf_dir}/events.parquet``; when the
    caller hands us a bare parquet file (or a directory of shards not
    named events.parquet) we build a one-symlink shim dir instead of
    copying data.
    """
    if os.path.isdir(input_path) and os.path.exists(
            os.path.join(input_path, "events.parquet")):
        return input_path
    shim = tempfile.mkdtemp(prefix="tanml_monitor_")
    os.symlink(os.path.abspath(input_path),
               os.path.join(shim, "events.parquet"))
    return shim


def run_feed_monitor(input_path: str) -> tuple[dict, pa.Table]:
    """Compute the full feed-health report.

    Returns (summary_json, per_day_chart_table). The summary carries
    one alert block per detector plus an overall pass/alert status; the
    chart table joins the Shewhart/CUSUM/EWMA walks per day for sinking
    to parquet.
    """
    from tanml_ray.pipelines.queries import (
        coverage_gaps_events,
        cusum_chart_events,
        ewma_volume_events,
        runs_test_events,
        theilsen_daily_trend_events,
        volume_control_events,
    )

    sf_dir = _as_events_dir(input_path)

    shewhart = volume_control_events(sf_dir).to_pylist()
    cusum = cusum_chart_events(sf_dir).to_pylist()
    ewma = ewma_volume_events(sf_dir).to_pylist()
    gaps = coverage_gaps_events(sf_dir).to_pylist()[0]
    runs = runs_test_events(sf_dir).to_pylist()[0]
    trend = theilsen_daily_trend_events(sf_dir).to_pylist()[0]

    shewhart_alerts = [r["day"] for r in shewhart if r["alert"]]
    cusum_alerts = [r["day"] for r in cusum if r["alert"]]
    ewma_alerts = [r["day"] for r in ewma if r["alert"]]
    nonrandom = abs(runs["z"]) > 3.0

    summary = {
        "days": len(shewhart),
        "shewhart_alert_days": shewhart_alerts,
        "cusum_alert_days": cusum_alerts,
        "ewma_alert_days": ewma_alerts,
        "coverage": {"hours_expected": gaps["hours_expected"],
                     "hours_observed": gaps["hours_observed"],
                     "gaps": gaps["gaps"]},
        "runs_test": {"runs": runs["runs"], "z": runs["z"],
                      "nonrandom": nonrandom},
        "trend": {"slope_per_day": trend["slope_per_day"],
                  "n_days": trend["n_days"]},
        "status": ("alert" if (shewhart_alerts or cusum_alerts
                               or ewma_alerts or gaps["gaps"] > 0)
                   else "pass"),
    }

    by_day = {r["day"]: dict(r) for r in shewhart}
    for r in cusum:
        by_day[r["day"]].update(cusum_pos=r["cusum_pos"],
                                cusum_neg=r["cusum_neg"],
                                cusum_alert=r["alert"])
    for r in ewma:
        by_day[r["day"]].update(ewma=r["ewma"], ewma_alert=r["alert"])
    chart = pa.Table.from_pylist(
        [by_day[d] for d in sorted(by_day)])
    return summary, chart
