"""Ranking / CV / special-function tests."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from tanml_ray.kernels.stats import betainc_reg, pearson_r_pvalue, t_pvalue_two_sided


class TestStats:
    def test_betainc_known_values(self):
        # I_x(a,b) reference values (Abramowitz & Stegun / verified vs scipy)
        assert betainc_reg(0.5, 0.5, 0.5) == pytest.approx(0.5, abs=1e-10)
        assert betainc_reg(1, 1, 0.3) == pytest.approx(0.3, abs=1e-12)
        assert betainc_reg(2, 3, 0.4) == pytest.approx(0.5248, abs=1e-4)

    def test_t_pvalues_match_tables(self):
        # classic t-table: df=10, t=2.228 → p≈0.05 two-sided
        assert t_pvalue_two_sided(2.228, 10) == pytest.approx(0.05, abs=2e-3)
        # large df → normal: t=1.96 → p≈0.05
        assert t_pvalue_two_sided(1.959964, 100000) == pytest.approx(0.05, abs=1e-3)
        assert t_pvalue_two_sided(0.0, 10) == pytest.approx(1.0, abs=1e-12)

    def test_pearson_pvalue_behavior(self):
        assert pearson_r_pvalue(0.9, 1000) < 1e-10
        assert pearson_r_pvalue(0.01, 100) > 0.5
        assert pearson_r_pvalue(1.0, 100) == 0.0


def _ds_from(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestRanking:
    def test_power_scores(self):
        from tanml_ray.pipelines.ranking import feature_ranking

        rng = np.random.default_rng(42)
        n = 4000
        strong = rng.normal(0, 1, n)
        weak = rng.normal(0, 1, n)
        noise = rng.normal(0, 1, n)
        y = 3 * strong + 0.3 * weak + rng.normal(0, 1, n)
        tbl = pa.table({"strong": strong, "weak": weak, "noise": noise, "y": y})
        out = feature_ranking(_ds_from(tbl), ["strong", "weak", "noise"], "y").to_pylist()
        assert out[0]["feature"] == "strong"
        assert out[0]["power"] == pytest.approx(100.0)
        assert out[1]["feature"] == "weak"
        assert out[2]["feature"] == "noise"
        assert out[0]["p_value"] < 1e-10
        assert out[2]["p_value"] > 0.001
        # pseudo metrics (ranking.py:357-362)
        assert out[0]["pseudo_iv"] == pytest.approx(0.5)
        assert out[0]["pseudo_gini"] == pytest.approx(0.8)

    def test_linear_cv_matches_direct_fit(self):
        from tanml_ray.pipelines.ranking import cv_summary, linear_cv

        rng = np.random.default_rng(9)
        n = 5000
        key = np.arange(n)
        x = rng.normal(10, 3, n)
        y = 2.5 * x + 7 + rng.normal(0, 1, n)
        tbl = pa.table({"k": key, "x": x, "y": y})
        out = linear_cv(_ds_from(tbl), "x", "y", "k", k=5)
        # oracle: per-fold numpy fit on train, eval on test
        for r in out.to_pylist():
            f = r["fold"]
            te = key % 5 == f
            tr = ~te
            b, a = np.polyfit(x[tr], y[tr], 1)
            pred = a + b * x[te]
            rmse = np.sqrt(((pred - y[te]) ** 2).mean())
            assert r["rmse"] == pytest.approx(rmse, rel=1e-6), f
        s = cv_summary(out)
        assert 0.9 < s["mean"] < 1.1  # noise σ=1
        assert s["std"] < 0.1

    def test_linear_cv_repeated(self):
        """Repeat 0 must reproduce plain linear_cv (key % k); every
        (rep, fold) row must match a direct numpy refit under the same
        affine re-keying; the distribution roll-up covers percentiles."""
        from tanml_ray.pipelines.ranking import (
            cv_summary,
            linear_cv,
            linear_cv_repeated,
            repeated_fold,
        )

        rng = np.random.default_rng(3)
        n = 4000
        key = np.arange(n)
        x = rng.normal(5, 2, n)
        y = 1.5 * x - 3 + rng.normal(0, 1, n)
        tbl = pa.table({"k": key, "x": x, "y": y})
        out = linear_cv_repeated(_ds_from(tbl), "x", "y", "k",
                                 k=4, n_repeats=3).to_pylist()
        assert len(out) == 12
        plain = linear_cv(_ds_from(tbl), "x", "y", "k", k=4).to_pylist()
        rep0 = [{k_: v for k_, v in r.items() if k_ != "rep"}
                for r in out if r["rep"] == 0]
        for a, b in zip(rep0, plain):
            assert a["fold"] == b["fold"] and a["n_test"] == b["n_test"]
            assert a["rmse"] == pytest.approx(b["rmse"], rel=1e-12)
        for r in out:
            te = repeated_fold(key, r["rep"], 4) == r["fold"]
            b, a = np.polyfit(x[~te], y[~te], 1)
            rmse = np.sqrt((((a + b * x[te]) - y[te]) ** 2).mean())
            assert r["rmse"] == pytest.approx(rmse, rel=1e-6), (r["rep"], r["fold"])
        s = cv_summary(pa.Table.from_pylist(out))
        assert s["p05"] <= s["p50"] <= s["p95"]
        assert 0.9 < s["mean"] < 1.1


@pytest.mark.usefixtures("ray_session")
def test_kendall_full_grid_matches_naive(tmp_path):
    """The grid-sweep tau-b must equal the naive O(n²) sign kernel on
    a small corpus with heavy ties in both columns."""
    import pyarrow.parquet as pq

    from tanml_ray.pipelines.queries import kendall_lineitem

    rng = np.random.default_rng(3)
    n = 800
    q = rng.integers(1, 8, n).astype(np.float64)          # heavy x ties
    price = (rng.integers(100, 140, n) / 1.0).astype(np.float64)  # y ties
    pq.write_table(pa.table({"l_quantity": q,
                             "l_extendedprice": price}),
                   str(tmp_path / "lineitem.parquet"))
    out = kendall_lineitem(str(tmp_path)).to_pylist()[0]

    qi = np.rint(q).astype(np.int64)
    ci = np.rint(price * 100).astype(np.int64)
    dx = np.sign(qi[:, None] - qi[None, :])
    dy = np.sign(ci[:, None] - ci[None, :])
    iu = np.triu_indices(n, 1)
    s = dx[iu] * dy[iu]
    nc = int((s > 0).sum())
    nd = int((s < 0).sum())
    tx = int((dx[iu] == 0).sum())
    ty = int((dy[iu] == 0).sum())
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / np.sqrt(float(n0 - tx) * float(n0 - ty))
    assert out["nc"] == nc and out["nd"] == nd
    assert out["ties_x"] == tx and out["ties_y"] == ty
    assert out["tau_b"] == pytest.approx(round(tau, 6), abs=1e-9)
