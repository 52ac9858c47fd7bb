"""Distribution-drift suite: grouped PSI / KS against a baseline profile.

Reference semantics reproduced (citations into /root/reference):
  - PSI with 10 equal-width bins taken from the *expected* side's
    min/max, zero→1e-8:             tanml/analysis/drift.py:34-84
  - KS two-sample statistic:        tanml/analysis/drift.py:87-113
  - bands: psi ≥0.2 severe / ≥0.1 moderate / else none; KS stat
    bands 0.3/0.2/0.1:              drift.py:159-181, ui/views/evaluation/tabs/drift.py:39-53
  - summary fail/warning/pass:      drift.py:184-206

Scale design (north_star): drift is keyed by (lang, time_bucket(warc_ts)).
Instead of shuffling 10^12 rows into a groupby, each map_batches task
pre-aggregates its block into per-group partial histograms (counts are
associative), so only O(blocks × groups) tiny partial rows leave the
map stage — the skew from dominant languages / crawl hotspots never
materializes as a hot shuffle partition (this per-block combine is the
salted-key pattern taken to its limit: every block is its own salt).
The KS statistic at scale is computed from fine equi-width histograms
(documented approximation, error ≤ max bin mass; SURVEY.md §7.5 item 1).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tanml_ray.functions.collect import from_pandas_clean
from tanml_ray.kernels.drift_math import (
    drift_summary_status,
    ks_from_histograms,
    psi_from_counts,
    psi_level,
)

N_PSI_BINS = 10      # reference: np.histogram(expected, bins=10), drift.py:62
N_FINE_BINS = 200    # KS approximation resolution


def ks_level(d: float) -> str:
    """KS-stat bands from the reference UI (tabs/drift.py:39-53)."""
    if d != d:
        return "unknown"
    if d > 0.3:
        return "severe"
    if d > 0.2:
        return "moderate"
    if d > 0.1:
        return "mild"
    return "none"


def _augment(batch: pa.Table, value_col: str, bucket_unit: str) -> pd.DataFrame:
    """pages batch → (lang, bucket, value) frame; html never touched."""
    if value_col == "text_len":
        vals = pc.cast(pc.utf8_length(batch.column("text")), pa.float64())
    else:
        vals = pc.cast(batch.column(value_col), pa.float64())
    bucket = pc.strftime(pc.floor_temporal(batch.column("warc_ts"), unit=bucket_unit),
                         format="%Y-%m-%d")
    return pd.DataFrame({
        "lang": batch.column("lang").to_pylist(),
        "bucket": bucket.to_pylist(),
        "value": vals.to_numpy(zero_copy_only=False),
    })


@dataclass
class DriftBaseline:
    """Per-(lang, bucket) baseline distribution artifact. Small (KBs per
    group) — broadcast to verify tasks via ray.put, or held by an actor
    pool when the group count is very large (SURVEY.md §2.3 T4)."""

    value_col: str
    bucket_unit: str
    groups: dict[tuple, dict[str, Any]] = field(default_factory=dict)
    # each group dict: n, vmin, vmax, edges, counts, fine_edges, fine_counts

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path: str) -> "DriftBaseline":
        with open(path, "rb") as f:
            return pickle.load(f)


def _minmax_partials(ds, value_col: str, bucket_unit: str):
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = _augment(batch, value_col, bucket_unit)
        df = df.dropna(subset=["value"])
        return (df.groupby(["lang", "bucket"], as_index=False)
                  .agg(n=("value", "size"), vmin=("value", "min"),
                       vmax=("value", "max")))

    return ds.map_batches(partial, batch_format="pyarrow")


def _hist_partials(ds, value_col: str, bucket_unit: str, edges_by_group: dict):
    """Per-batch per-group histogram counts with broadcast edges."""
    import ray

    edges_ref = ray.put(edges_by_group)

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        edges_map = _ray.get(edges_ref)
        df = _augment(batch, value_col, bucket_unit).dropna(subset=["value"])
        rows = []
        for (lang, bucket), sub in df.groupby(["lang", "bucket"]):
            key = (lang, bucket)
            e = edges_map.get(key)
            if e is None:
                # group unseen in baseline: record count only
                rows.append({"lang": lang, "bucket": bucket, "n": len(sub),
                             "below": 0, "above": 0,
                             "counts": b"", "fine_counts": b""})
                continue
            v = sub["value"].to_numpy()
            c, _ = np.histogram(v[(v >= e["edges"][0]) & (v <= e["edges"][-1])],
                                bins=e["edges"])
            fc, _ = np.histogram(v[(v >= e["fine_edges"][0]) & (v <= e["fine_edges"][-1])],
                                 bins=e["fine_edges"])
            rows.append({
                "lang": lang, "bucket": bucket, "n": len(sub),
                "below": int((v < e["edges"][0]).sum()),
                "above": int((v > e["edges"][-1]).sum()),
                "counts": c.astype(np.int64).tobytes(),
                "fine_counts": fc.astype(np.int64).tobytes(),
            })
        return pa.Table.from_pylist(rows) if rows else pa.table({
            "lang": pa.array([], type=pa.string()),
            "bucket": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "below": pa.array([], type=pa.int64()),
            "above": pa.array([], type=pa.int64()),
            "counts": pa.array([], type=pa.binary()),
            "fine_counts": pa.array([], type=pa.binary()),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def _merge_hist_partials(partials) -> dict[tuple, dict[str, Any]]:
    merged: dict[tuple, dict[str, Any]] = {}
    for t in partials.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for r in t.to_pylist():
            key = (r["lang"], r["bucket"])
            m = merged.setdefault(key, {"n": 0, "below": 0, "above": 0,
                                        "counts": None, "fine_counts": None})
            m["n"] += r["n"]
            m["below"] += r["below"]
            m["above"] += r["above"]
            for fld in ("counts", "fine_counts"):
                if r[fld]:
                    arr = np.frombuffer(r[fld], dtype=np.int64)
                    m[fld] = arr.copy() if m[fld] is None else m[fld] + arr
    return merged


def build_drift_baseline(ds, value_col: str = "text_len",
                         bucket_unit: str = "week",
                         single_pass: bool | None = None) -> DriftBaseline:
    """Baseline build. Default for integer-valued metrics (text_len =
    utf8_length is integral by construction): ONE pass of per-group
    value-counts partials, from which n/min/max AND the exact
    histograms all derive — bit-identical to the two-pass result
    (np.histogram over the distinct values weighted by their counts is
    the same float path as histogramming the raw rows). General float
    columns use the two-pass path (min/max → edges → counts), since
    unbounded distinct values make count partials unmergeable."""
    if single_pass is None:
        single_pass = value_col == "text_len"
    if single_pass:
        return _build_baseline_counts(ds, value_col, bucket_unit)
    mm = _merge_minmax(_minmax_partials(ds, value_col, bucket_unit))
    edges_by_group = {}
    for key, m in mm.items():
        lo, hi = m["vmin"], m["vmax"]
        if hi <= lo:
            hi = lo + 1.0
        edges_by_group[key] = {
            "edges": np.linspace(lo, hi, N_PSI_BINS + 1),
            "fine_edges": np.linspace(lo, hi, N_FINE_BINS + 1),
        }
    hist = _merge_hist_partials(_hist_partials(ds, value_col, bucket_unit, edges_by_group))
    baseline = DriftBaseline(value_col=value_col, bucket_unit=bucket_unit)
    for key, h in hist.items():
        e = edges_by_group.get(key)
        baseline.groups[key] = {
            "n": h["n"], "below": h["below"], "above": h["above"],
            "vmin": mm[key]["vmin"], "vmax": mm[key]["vmax"],
            "edges": e["edges"] if e else None,
            "counts": h["counts"], "fine_edges": e["fine_edges"] if e else None,
            "fine_counts": h["fine_counts"],
        }
    return baseline


def _value_count_partials(ds, value_col: str, bucket_unit: str):
    """Per-block per-group value-count partial rows (lang, bucket,
    value, n) — the exact-distribution representation for
    integer-valued metrics."""
    def partial(batch: pa.Table) -> pa.Table:
        df = _augment(batch, value_col, bucket_unit).dropna(subset=["value"])
        g = (df.groupby(["lang", "bucket", "value"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow")


def _merge_value_count_partials(partials, pre_combine: bool = True) -> dict[tuple, dict[float, int]]:
    """Merge of per-block value-count partials. A distributed
    pre-combine round (repartition + local groupby-sum) first caps the
    driver-side volume at combine-partitions × groups × distinct values
    — invariant to input block count, which is what makes this path
    hold at 10⁶ blocks; the driver then does ONE vectorized pandas
    groupby-sum (a per-row Python loop here scales with row count —
    the C path doesn't)."""
    if pre_combine:
        def combine(t: pa.Table) -> pa.Table:
            g = (t.to_pandas().groupby(["lang", "bucket", "value"],
                                       as_index=False)["n"].sum())
            return from_pandas_clean(g, preserve_index=False)

        partials = (partials.repartition(8)
                    .map_batches(combine, batch_format="pyarrow",
                                 batch_size=None))
    frames = [t.to_pandas() for t in
              partials.iter_batches(batch_size=65536, batch_format="pyarrow")]
    if not frames:
        return {}
    df = (pd.concat(frames, ignore_index=True)
          .groupby(["lang", "bucket", "value"], as_index=False)["n"].sum())
    merged: dict[tuple, dict[float, int]] = {}
    for (lang, bucket), sub in df.groupby(["lang", "bucket"], sort=False):
        merged[(lang, bucket)] = dict(
            zip(sub["value"].astype(float), sub["n"].astype(int)))
    return merged


def _build_baseline_counts(ds, value_col: str, bucket_unit: str) -> DriftBaseline:
    """Single-pass exact baseline for integer-valued metrics: per-block
    per-group value-counts (rows ≤ groups × distinct-values per block —
    text lengths span a few thousand distinct ints, so partials stay
    tiny), merged driver-side, then edges + histograms derived from the
    merged counts with the IDENTICAL np.histogram call the two-pass
    path uses."""
    merged = _merge_value_count_partials(
        _value_count_partials(ds, value_col, bucket_unit))
    baseline = DriftBaseline(value_col=value_col, bucket_unit=bucket_unit)
    for key, counts_map in merged.items():
        vals = np.array(sorted(counts_map), dtype=np.float64)
        cnts = np.array([counts_map[v] for v in vals], dtype=np.float64)
        n = int(cnts.sum())
        vmin, vmax = float(vals[0]), float(vals[-1])
        lo, hi = vmin, vmax if vmax > vmin else vmin + 1.0
        edges = np.linspace(lo, hi, N_PSI_BINS + 1)
        fine_edges = np.linspace(lo, hi, N_FINE_BINS + 1)
        counts = np.histogram(vals, bins=edges, weights=cnts)[0].astype(np.int64)
        fine_counts = np.histogram(vals, bins=fine_edges, weights=cnts)[0].astype(np.int64)
        baseline.groups[key] = {
            "n": n, "below": 0, "above": 0, "vmin": vmin, "vmax": vmax,
            "edges": edges, "counts": counts,
            "fine_edges": fine_edges, "fine_counts": fine_counts,
            # exact per-group distribution (distinct integer values are
            # bounded) — enables EXACT KS on the compare side
            "vals": vals, "cnts": cnts.astype(np.int64),
        }
    return baseline


def _merge_minmax(partials) -> dict[tuple, dict[str, float]]:
    merged: dict[tuple, dict[str, float]] = {}
    for t in partials.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for r in t.to_pylist():
            key = (r["lang"], r["bucket"])
            m = merged.setdefault(key, {"n": 0, "vmin": np.inf, "vmax": -np.inf})
            m["n"] += r["n"]
            m["vmin"] = min(m["vmin"], r["vmin"])
            m["vmax"] = max(m["vmax"], r["vmax"])
    return merged


def compute_drift(baseline: DriftBaseline, current_ds,
                  exact_ks: bool | None = None) -> tuple[pa.Table, dict[str, Any]]:
    """Single pass over the current table → per-group drift table +
    executive summary with reference thresholds.

    When the baseline carries exact per-group value counts (the
    single-pass build for integer metrics), the compare side streams
    value-count partials too and KS is EXACT — statistic on the true
    ECDFs, p-value exact for small groups (ks_from_value_counts) —
    removing the histogram approximation entirely; `ks_method` in the
    output records which path produced each row. PSI binning is
    unchanged either way (reference equal-width bins from the baseline
    min/max, full-n denominators)."""
    has_counts = bool(baseline.groups) and all(
        "vals" in g for g in baseline.groups.values())
    if exact_ks is None:
        exact_ks = has_counts
    if exact_ks and has_counts:
        cur_counts = _merge_value_count_partials(
            _value_count_partials(current_ds, baseline.value_col,
                                  baseline.bucket_unit))
        return _drift_rows_exact(baseline, cur_counts)
    edges_by_group = {k: {"edges": g["edges"], "fine_edges": g["fine_edges"]}
                      for k, g in baseline.groups.items() if g["edges"] is not None}
    cur = _merge_hist_partials(
        _hist_partials(current_ds, baseline.value_col, baseline.bucket_unit,
                       edges_by_group))
    return _drift_rows(baseline, cur)


def _drift_rows_exact(baseline: DriftBaseline,
                      cur: dict[tuple, dict[float, int]]) -> tuple[pa.Table, dict[str, Any]]:
    from tanml_ray.kernels.drift_math import ks_from_value_counts

    rows = []
    for key in sorted(set(baseline.groups) | set(cur)):
        b = baseline.groups.get(key)
        c = cur.get(key)
        lang, bucket = key
        if b is None or b.get("counts") is None:
            rows.append({"lang": lang, "bucket": bucket, "column": baseline.value_col,
                         "n_expected": 0,
                         "n_actual": int(sum(c.values())) if c else 0,
                         "psi": float("nan"), "psi_level": "new_group",
                         "ks_stat": float("nan"), "ks_pvalue": float("nan"),
                         "ks_level": "unknown", "ks_method": "exact"})
            continue
        if not c:
            rows.append({"lang": lang, "bucket": bucket, "column": baseline.value_col,
                         "n_expected": b["n"], "n_actual": 0,
                         "psi": float("nan"), "psi_level": "unknown",
                         "ks_stat": float("nan"), "ks_pvalue": float("nan"),
                         "ks_level": "unknown", "ks_method": "exact"})
            continue
        vals_c = np.array(sorted(c), dtype=np.float64)
        cnts_c = np.array([c[v] for v in vals_c], dtype=np.int64)
        n_c = int(cnts_c.sum())
        # PSI: identical np.histogram call as the histogram path, with
        # the full-n denominator (out-of-range mass in n_c)
        hist_c = np.histogram(vals_c, bins=b["edges"],
                              weights=cnts_c.astype(np.float64))[0]
        psi = psi_from_counts(b["counts"], hist_c,
                              expected_n=b["n"], actual_n=n_c)
        d, p = ks_from_value_counts(b["vals"], b["cnts"], vals_c, cnts_c)
        rows.append({"lang": lang, "bucket": bucket, "column": baseline.value_col,
                     "n_expected": b["n"], "n_actual": n_c,
                     "psi": psi, "psi_level": psi_level(psi),
                     "ks_stat": d, "ks_pvalue": p, "ks_level": ks_level(d),
                     "ks_method": "exact"})
    return _finish_drift_rows(rows)


def _drift_rows(baseline: DriftBaseline, cur: dict) -> tuple[pa.Table, dict[str, Any]]:
    rows = []
    for key in sorted(set(baseline.groups) | set(cur)):
        b = baseline.groups.get(key)
        c = cur.get(key)
        lang, bucket = key
        if b is None or b.get("counts") is None:
            rows.append({"lang": lang, "bucket": bucket, "column": baseline.value_col,
                         "n_expected": 0, "n_actual": c["n"] if c else 0,
                         "psi": float("nan"), "psi_level": "new_group",
                         "ks_stat": float("nan"), "ks_pvalue": float("nan"),
                         "ks_level": "unknown", "ks_method": "histogram_approx"})
            continue
        if c is None or c.get("counts") is None:
            rows.append({"lang": lang, "bucket": bucket, "column": baseline.value_col,
                         "n_expected": b["n"], "n_actual": 0,
                         "psi": float("nan"), "psi_level": "unknown",
                         "ks_stat": float("nan"), "ks_pvalue": float("nan"),
                         "ks_level": "unknown", "ks_method": "histogram_approx"})
            continue
        # Reference parity (drift.py:71-84): proportions are
        # counts / FULL group size, so below/above-range mass lowers the
        # in-range proportions instead of being renormalized away. A
        # current group entirely outside the baseline range yields a
        # large PSI (all ap → eps), not NaN.
        psi = psi_from_counts(b["counts"], c["counts"],
                              expected_n=b["n"], actual_n=c["n"])
        d, p = ks_from_histograms(b["fine_counts"], c["fine_counts"],
                                  expected_below=b["below"], actual_below=c["below"],
                                  expected_above=b["above"], actual_above=c["above"])
        rows.append({"lang": lang, "bucket": bucket, "column": baseline.value_col,
                     "n_expected": b["n"], "n_actual": c["n"],
                     "psi": psi, "psi_level": psi_level(psi),
                     "ks_stat": d, "ks_pvalue": p, "ks_level": ks_level(d),
                     "ks_method": "histogram_approx"})
    return _finish_drift_rows(rows)


def _finish_drift_rows(rows: list[dict]) -> tuple[pa.Table, dict[str, Any]]:
    table = pa.Table.from_pylist(rows)
    levels = [r["psi_level"] for r in rows if r["psi_level"] in ("severe", "moderate", "none")]
    summary = {
        "groups": len(rows),
        "severe": sum(1 for r in rows if r["psi_level"] == "severe"),
        "moderate": sum(1 for r in rows if r["psi_level"] == "moderate"),
        "new_groups": sum(1 for r in rows if r["psi_level"] == "new_group"),
        "status": drift_summary_status(levels),
    }
    return table, summary


def lang_mix_drift(baseline_ds, current_ds) -> dict[str, Any]:
    """Categorical PSI over the global lang distribution (the lang-mix
    shift check). Counts via per-batch value_counts partials."""
    def counts_of(ds) -> dict[str, int]:
        def partial(batch: pa.Table) -> pa.Table:
            vc = batch.column("lang").combine_chunks().value_counts()
            return pa.table({"lang": vc.field("values"),
                             "n": pc.cast(vc.field("counts"), pa.int64())})

        out: dict[str, int] = {}
        for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_size=4096, batch_format="pyarrow"):
            for lang, n in zip(t.column("lang").to_pylist(), t.column("n").to_pylist()):
                out[lang] = out.get(lang, 0) + n
        return out

    b, c = counts_of(baseline_ds), counts_of(current_ds)
    langs = sorted(set(b) | set(c))
    eb = np.array([b.get(l, 0) for l in langs], dtype=np.float64)
    ac = np.array([c.get(l, 0) for l in langs], dtype=np.float64)
    psi = psi_from_counts(eb, ac)
    return {"psi": psi, "psi_level": psi_level(psi), "langs": len(langs),
            "n_expected": int(eb.sum()), "n_actual": int(ac.sum())}


class BaselineHolderVerify:
    """Actor-pool variant of the current-side verify stage (north_star:
    "baseline-histogram holders live in actor pools"): each actor
    fetches the baseline edge map ONCE in __init__ and histograms every
    batch against it. Use via:

        ds.map_batches(BaselineHolderVerify,
                       fn_constructor_kwargs={"edges_ref": ray.put(edges),
                                              "value_col": ..., "bucket_unit": ...},
                       batch_format="pyarrow", concurrency=N)

    Preferable to the broadcast-closure path when the baseline is large
    (many lang×bucket cells): the object-store fetch happens per actor,
    not per task.
    """

    def __init__(self, edges_ref, value_col: str, bucket_unit: str):
        import ray

        self.edges_map = ray.get(edges_ref)
        self.value_col = value_col
        self.bucket_unit = bucket_unit

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = _augment(batch, self.value_col, self.bucket_unit).dropna(subset=["value"])
        rows = []
        for (lang, bucket), sub in df.groupby(["lang", "bucket"]):
            e = self.edges_map.get((lang, bucket))
            if e is None:
                rows.append({"lang": lang, "bucket": bucket, "n": len(sub),
                             "below": 0, "above": 0, "counts": b"",
                             "fine_counts": b""})
                continue
            v = sub["value"].to_numpy()
            c, _ = np.histogram(v[(v >= e["edges"][0]) & (v <= e["edges"][-1])],
                                bins=e["edges"])
            fc, _ = np.histogram(v[(v >= e["fine_edges"][0]) & (v <= e["fine_edges"][-1])],
                                 bins=e["fine_edges"])
            rows.append({"lang": lang, "bucket": bucket, "n": len(sub),
                         "below": int((v < e["edges"][0]).sum()),
                         "above": int((v > e["edges"][-1]).sum()),
                         "counts": c.astype(np.int64).tobytes(),
                         "fine_counts": fc.astype(np.int64).tobytes()})
        return pa.Table.from_pylist(rows) if rows else pa.table({
            "lang": pa.array([], type=pa.string()),
            "bucket": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "below": pa.array([], type=pa.int64()),
            "above": pa.array([], type=pa.int64()),
            "counts": pa.array([], type=pa.binary()),
            "fine_counts": pa.array([], type=pa.binary()),
        })


class ValueCountVerify:
    """Actor-pool verify stage for the EXACT (value-counts) compare
    path: per-batch per-group value counts. Holds only the metric
    definition — the exact representation needs no baseline state on
    the worker at all (the comparison happens at merge time)."""

    def __init__(self, value_col: str, bucket_unit: str):
        self.value_col = value_col
        self.bucket_unit = bucket_unit

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = _augment(batch, self.value_col, self.bucket_unit).dropna(subset=["value"])
        g = (df.groupby(["lang", "bucket", "value"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)


def compute_drift_actor_pool(baseline: DriftBaseline, current_ds,
                             concurrency: int = 4,
                             exact_ks: bool | None = None) -> tuple[pa.Table, dict[str, Any]]:
    """compute_drift with the actor-pool verify stage — identical
    results; per-actor setup instead of per task."""
    import ray

    has_counts = bool(baseline.groups) and all(
        "vals" in g for g in baseline.groups.values())
    if exact_ks is None:
        exact_ks = has_counts
    if exact_ks and has_counts:
        partials = current_ds.map_batches(
            ValueCountVerify,
            fn_constructor_kwargs={"value_col": baseline.value_col,
                                   "bucket_unit": baseline.bucket_unit},
            batch_format="pyarrow", concurrency=concurrency)
        return _drift_rows_exact(baseline, _merge_value_count_partials(partials))

    edges_by_group = {k: {"edges": g["edges"], "fine_edges": g["fine_edges"]}
                      for k, g in baseline.groups.items() if g["edges"] is not None}
    edges_ref = ray.put(edges_by_group)
    partials = current_ds.map_batches(
        BaselineHolderVerify,
        fn_constructor_kwargs={"edges_ref": edges_ref,
                               "value_col": baseline.value_col,
                               "bucket_unit": baseline.bucket_unit},
        batch_format="pyarrow", concurrency=concurrency)
    cur = _merge_hist_partials(partials)
    return _drift_rows(baseline, cur)
