"""Drift suite tests: identical → no drift; shifted current → drift in
the shifted languages; grouped PSI matches a pandas oracle computed
with the reference's exact formula (drift.py:34-84 semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pytest

from tanml_ray.kernels.drift_math import psi_from_counts
from tanml_ray.pipelines.drift import (
    DriftBaseline,
    build_drift_baseline,
    compute_drift,
    ks_level,
    lang_mix_drift,
)
from tanml_ray.sources.pages import pages_dataset


@pytest.mark.usefixtures("ray_session")
class TestDriftSuite:
    def test_identical_no_drift(self, sf_dir):
        base = pages_dataset(sf_dir)
        baseline = build_drift_baseline(base, "text_len", "week")
        table, summary = compute_drift(baseline, pages_dataset(sf_dir))
        assert summary["status"] == "pass"
        psis = [p for p in table.column("psi").to_pylist() if p == p]
        assert all(abs(p) < 1e-12 for p in psis)
        ks = [k for k in table.column("ks_stat").to_pylist() if k == k]
        assert all(abs(k) < 1e-12 for k in ks)

    def test_shifted_current_drifts(self, sf_dir):
        baseline = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week")
        cur = pages_dataset(sf_dir, variant="current")
        table, summary = compute_drift(baseline, cur)
        df = table.to_pandas()
        # padding shift hits es/de text lengths → severe PSI there
        shifted = df[df.lang.isin(["es", "de"]) & df.psi.notna()]
        assert (shifted.psi >= 0.2).any()
        assert summary["status"] == "fail"
        # en rows lose some pages to the es remap but lengths unchanged →
        # PSI should stay far below the shifted langs' levels
        en = df[(df.lang == "en") & df.psi.notna()]
        assert en.psi.mean() < shifted.psi.mean()

    def test_grouped_psi_matches_pandas_oracle(self, sf_dir):
        """Engine's per-(lang, week) PSI == single-process reference
        formula computed straight on the materialized table."""
        baseline_ds = pages_dataset(sf_dir)
        current_ds = pages_dataset(sf_dir, variant="current")
        baseline = build_drift_baseline(baseline_ds, "text_len", "week")
        table, _ = compute_drift(baseline, current_ds)
        got = {(r["lang"], r["bucket"]): r["psi"] for r in table.to_pylist()
               if r["psi"] == r["psi"]}

        def frame(ds):
            t = ds.materialize().to_pandas()
            t = t[t.text.notna()]
            week = pd.Series(t.warc_ts).dt.to_period("W-SUN").dt.start_time
            return pd.DataFrame({"lang": t.lang,
                                 "bucket": week.dt.strftime("%Y-%m-%d"),
                                 "value": t.text.str.len().astype(float)})

        bdf, cdf = frame(baseline_ds), frame(current_ds)
        checked = 0
        for key, psi_engine in got.items():
            b = bdf[(bdf.lang == key[0]) & (bdf.bucket == key[1])]["value"]
            c = cdf[(cdf.lang == key[0]) & (cdf.bucket == key[1])]["value"]
            if len(b) < 2 or len(c) == 0:
                continue
            lo, hi = b.min(), b.max()
            if hi <= lo:
                continue
            edges = np.linspace(lo, hi, 11)
            eb, _ = np.histogram(b, bins=edges)
            ac, _ = np.histogram(c, bins=edges)
            # independent oracle: the reference's exact formula
            # (drift.py:71-84) — divide by FULL len incl. out-of-range
            ep = np.where(eb / len(b) == 0, 1e-8, eb / len(b))
            ap = np.where(ac / len(c) == 0, 1e-8, ac / len(c))
            expect = float(np.sum((ap - ep) * np.log(ap / ep)))
            assert psi_engine == pytest.approx(expect, abs=1e-12), key
            checked += 1
        assert checked >= 5

    def test_out_of_range_mass_counts_in_denominator(self, ray_session):
        """A current group entirely OUTSIDE the baseline bin range is the
        most severe drift: PSI must be large (all actual in-range
        proportions → eps), never NaN/'unknown' (reference drift.py:71-84
        divides by len(actual), not the in-range count)."""
        import ray

        def tbl(vals, lang="en"):
            n = len(vals)
            return pd.DataFrame({
                "url": [f"http://x/{i}" for i in range(n)],
                "warc_ts": pd.to_datetime(["2024-01-03"] * n),
                "html": [b""] * n,
                "text": ["x" * int(v) for v in vals],
                "lang": [lang] * n,
            })

        base = ray.data.from_pandas(tbl(np.linspace(10, 100, 50)))
        cur = ray.data.from_pandas(tbl(np.full(50, 5000.0)))  # all above range
        baseline = build_drift_baseline(base, "text_len", "week")
        table, summary = compute_drift(baseline, cur)
        row = table.to_pylist()[0]
        assert row["psi"] == row["psi"]  # not NaN
        assert row["psi"] > 0.2 and row["psi_level"] == "severe"
        assert summary["status"] == "fail"
        # partial out-of-range: oracle = reference formula with full-n denominators
        cur2 = ray.data.from_pandas(tbl(np.r_[np.linspace(10, 100, 25), np.full(25, 5000.0)]))
        t2, _ = compute_drift(baseline, cur2)
        got = t2.to_pylist()[0]["psi"]
        edges = np.linspace(10, 100, 11)
        eb, _ = np.histogram(np.linspace(10, 100, 50), bins=edges)
        ac, _ = np.histogram(np.r_[np.linspace(10, 100, 25), np.full(25, 5000.0)], bins=edges)
        ep = np.where(eb / 50 == 0, 1e-8, eb / 50)
        ap = np.where(ac / 50 == 0, 1e-8, ac / 50)
        assert got == pytest.approx(float(np.sum((ap - ep) * np.log(ap / ep))), abs=1e-12)

    def test_single_pass_baseline_identical_to_two_pass(self, sf_dir):
        """The fused value-counts baseline build must be bit-identical
        to the two-pass (min/max → histogram) build for integer-valued
        metrics."""
        ds = pages_dataset(sf_dir)
        b1 = build_drift_baseline(ds, "text_len", "week", single_pass=True)
        b2 = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week",
                                  single_pass=False)
        assert set(b1.groups) == set(b2.groups)
        for key in b1.groups:
            g1, g2 = b1.groups[key], b2.groups[key]
            for fld in ("n", "below", "above", "vmin", "vmax"):
                assert g1[fld] == g2[fld], (key, fld)
            for fld in ("edges", "counts", "fine_edges", "fine_counts"):
                assert np.array_equal(g1[fld], g2[fld]), (key, fld)

    def test_exact_ks_matches_sample_kernel(self, sf_dir):
        """With a counts-carrying baseline (integer metric), KS is
        EXACT: per-group stat/p must equal ks_2samp_exact on the
        materialized raw samples — no histogram approximation."""
        from tanml_ray.kernels.drift_math import ks_2samp_exact

        baseline_ds = pages_dataset(sf_dir)
        current_ds = pages_dataset(sf_dir, variant="current")
        baseline = build_drift_baseline(baseline_ds, "text_len", "week")
        table, _ = compute_drift(baseline, current_ds)
        assert set(table.column("ks_method").to_pylist()) == {"exact"}

        def frame(ds):
            t = ds.materialize().to_pandas()
            t = t[t.text.notna()]
            week = pd.Series(t.warc_ts).dt.to_period("W-SUN").dt.start_time
            return pd.DataFrame({"lang": t.lang,
                                 "bucket": week.dt.strftime("%Y-%m-%d"),
                                 "value": t.text.str.len().astype(float)})

        bdf, cdf = frame(baseline_ds), frame(current_ds)
        checked = 0
        for r in table.to_pylist():
            if r["ks_stat"] != r["ks_stat"]:
                continue
            b = bdf[(bdf.lang == r["lang"]) & (bdf.bucket == r["bucket"])]["value"]
            c = cdf[(cdf.lang == r["lang"]) & (cdf.bucket == r["bucket"])]["value"]
            if len(b) == 0 or len(c) == 0:
                continue
            d, p = ks_2samp_exact(b.to_numpy(), c.to_numpy())
            assert r["ks_stat"] == pytest.approx(d, abs=1e-12), (r["lang"], r["bucket"])
            assert r["ks_pvalue"] == pytest.approx(p, abs=1e-12)
            checked += 1
        assert checked >= 5

    def test_exact_and_actor_pool_paths_agree(self, sf_dir):
        from tanml_ray.pipelines.drift import compute_drift_actor_pool

        baseline = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week")
        cur = pages_dataset(sf_dir, variant="current")
        t_task, s_task = compute_drift(baseline, cur)
        t_actor, s_actor = compute_drift_actor_pool(baseline, cur, concurrency=2)
        assert s_task == s_actor
        assert sorted(t_task.to_pylist(), key=lambda r: (r["lang"], r["bucket"])) \
            == sorted(t_actor.to_pylist(), key=lambda r: (r["lang"], r["bucket"]))

    def test_histogram_path_still_sound(self, sf_dir):
        """The float-metric (histogram) compare path stays available via
        exact_ks=False: same PSI as the exact path (identical binning),
        KS within the documented bin-mass error bound."""
        baseline = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week")
        cur = pages_dataset(sf_dir, variant="current")
        t_exact, s_exact = compute_drift(baseline, cur)
        t_hist, s_hist = compute_drift(baseline, cur, exact_ks=False)
        assert set(t_hist.column("ks_method").to_pylist()) == {"histogram_approx"}
        ex = {(r["lang"], r["bucket"]): r for r in t_exact.to_pylist()}
        checked = 0
        for r in t_hist.to_pylist():
            e = ex[(r["lang"], r["bucket"])]
            if r["psi"] == r["psi"]:
                assert r["psi"] == pytest.approx(e["psi"], abs=1e-12)
            if r["ks_stat"] == r["ks_stat"] and e["ks_stat"] == e["ks_stat"]:
                # error ≤ max bin mass of the 200-bin fine histogram
                assert abs(r["ks_stat"] - e["ks_stat"]) <= 0.05
                checked += 1
        assert checked >= 5
        assert s_hist["severe"] == s_exact["severe"]  # PSI summary identical

    def test_baseline_artifact_roundtrip(self, sf_dir, tmp_path):
        baseline = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week")
        p = str(tmp_path / "baseline.pkl")
        baseline.save(p)
        loaded = DriftBaseline.load(p)
        assert loaded.value_col == "text_len"
        assert set(loaded.groups) == set(baseline.groups)
        table, summary = compute_drift(loaded, pages_dataset(sf_dir))
        assert summary["status"] == "pass"

    def test_lang_mix_drift(self, sf_dir):
        same = lang_mix_drift(pages_dataset(sf_dir), pages_dataset(sf_dir))
        assert same["psi"] == pytest.approx(0.0, abs=1e-12)
        shifted = lang_mix_drift(pages_dataset(sf_dir),
                                 pages_dataset(sf_dir, variant="current"))
        assert shifted["psi"] > same["psi"]

    def test_ks_level_bands(self):
        assert ks_level(0.35) == "severe"
        assert ks_level(0.25) == "moderate"
        assert ks_level(0.15) == "mild"
        assert ks_level(0.05) == "none"


@pytest.mark.usefixtures("ray_session")
class TestActorPoolDrift:
    def test_actor_pool_matches_task_path(self, sf_dir):
        """The baseline-holder actor pool (north_star T4) produces the
        identical drift table to the broadcast-closure task path."""
        from tanml_ray.pipelines.drift import compute_drift_actor_pool

        baseline = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week")
        cur = pages_dataset(sf_dir, variant="current")
        t_task, s_task = compute_drift(baseline, cur)
        t_actor, s_actor = compute_drift_actor_pool(baseline, cur, concurrency=2)
        assert s_task == s_actor
        a = sorted(t_task.to_pylist(), key=lambda r: (r["lang"], r["bucket"]))
        b = sorted(t_actor.to_pylist(), key=lambda r: (r["lang"], r["bucket"]))
        for ra, rb in zip(a, b):
            for k in ("lang", "bucket", "n_expected", "n_actual", "psi_level", "ks_level"):
                assert ra[k] == rb[k]


# ---------------------------------------------------------------------------
# JS divergence + Wasserstein-1 drift statistics
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_js_wasserstein_hand_case(tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tanml_ray.pipelines.queries import js_wasserstein_orders

    # even side: all mass at 1.00; odd side: all mass at 3.00
    # -> W1 = 2.00 exactly; JS = ln 2 (disjoint supports)
    t = pa.table({
        "o_orderkey": pa.array([0, 2, 4, 1, 3, 5], type=pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 1.0, 3.0, 3.0, 3.0])})
    pq.write_table(t, os.path.join(str(tmp_path), "orders.parquet"))
    r = js_wasserstein_orders(str(tmp_path)).to_pylist()[0]
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["w1"] == 2.0
    assert r["js"] == round(float(np.log(2)), 6)

    # identical sides -> both zero
    t2 = pa.table({
        "o_orderkey": pa.array([0, 1, 2, 3], type=pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 2.0, 2.0])})
    pq.write_table(t2, os.path.join(str(tmp_path), "orders.parquet"))
    r2 = js_wasserstein_orders(str(tmp_path)).to_pylist()[0]
    assert r2["w1"] == 0.0 and r2["js"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_cusum_finds_planted_level_shift(tmp_path):
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tanml_ray.pipelines.queries import cusum_changepoint_events

    # 20 days at level 10.00, then 20 days at level 20.00 -> the
    # |CUSUM| peak sits exactly on the last low day (day 20)
    rows = []
    for d in range(40):
        for k in range(5):
            rows.append({
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=d,
                                                                hours=k),
                "value": 10.0 if d < 20 else 20.0})
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(str(tmp_path), "events.parquet"))
    r = cusum_changepoint_events(str(tmp_path)).to_pylist()[0]
    assert r["n_days"] == 40
    assert r["changepoint_day"] == pd.Timestamp("2024-01-20")
    # peak |CUSUM| = 20 days x |10 - 15| = 100
    assert r["max_abs_cusum"] == 100.0
