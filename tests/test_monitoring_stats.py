"""Planted-defect tests for the session-7 monitoring / stats operators:
each detector must FIRE on a synthetic defect and stay quiet on clean
data, independent of the DuckDB-parity gate (which proves exactness,
not sensitivity)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000
EPOCH_DAY = 19_723  # 2024-01-01


def _write_events(tmp_path, ts_us: list[int]) -> str:
    pq.write_table(
        pa.table({"ts": pa.array(ts_us, type=pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _daily(tmp_path, counts: list[int]) -> str:
    ts = []
    for d, n in enumerate(counts):
        ts.extend([(EPOCH_DAY + d) * DAY_US + i for i in range(n)])
    return _write_events(tmp_path, ts)


class TestSpcCharts:
    def test_cusum_chart_flags_level_shift(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import cusum_chart_events

        # 15 days at 100, then a persistent +2-sigma-ish shift to 115:
        # a small step a 3-sigma Shewhart chart misses but CUSUM
        # accumulates past h=5 within ~10 days.
        rows = cusum_chart_events(
            _daily(tmp_path, [100] * 15 + [115] * 15)).to_pylist()
        assert len(rows) == 30
        assert rows[-1]["cusum_pos"] > 5.0 and rows[-1]["alert"]
        assert rows[0]["cusum_pos"] == 0.0

    def test_cusum_chart_quiet_on_flat_series(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import cusum_chart_events

        rows = cusum_chart_events(
            _daily(tmp_path, [100, 101] * 10)).to_pylist()
        assert not any(r["alert"] for r in rows)

    def test_ewma_flags_shift_from_baseline(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import ewma_volume_events

        # 7-day in-control baseline (mu=102, sigma=2), then a shift to
        # 130: the smoothed statistic crosses mu + 3*sigma*sqrt(l/(2-l))
        # = 104 within one day and stays out of control.
        base = [100, 104, 100, 104, 100, 104, 102]
        rows = ewma_volume_events(
            _daily(tmp_path, base + [130] * 10)).to_pylist()
        assert not any(r["alert"] for r in rows[:7])
        assert all(r["alert"] for r in rows[8:])
        # e_t converges toward the shifted level
        assert rows[-1]["ewma"] > 125

    def test_ewma_quiet_in_control(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import ewma_volume_events

        rows = ewma_volume_events(
            _daily(tmp_path, [100, 104] * 10)).to_pylist()
        assert not any(r["alert"] for r in rows)


class TestTrendSeasonality:
    def test_theilsen_recovers_exact_linear_trend(self, ray_session,
                                                  tmp_path):
        from tanml_ray.pipelines.queries import theilsen_daily_trend_events

        out = theilsen_daily_trend_events(
            _daily(tmp_path, [10 + 2 * d for d in range(12)])).to_pylist()[0]
        assert out["slope_per_day"] == 2.0
        assert out["intercept"] == 10.0 - 2.0 * EPOCH_DAY
        assert out["n_pairs"] == 12 * 11 // 2

    def test_theilsen_robust_to_one_outlier_day(self, ray_session,
                                                tmp_path):
        from tanml_ray.pipelines.queries import theilsen_daily_trend_events

        counts = [10 + 2 * d for d in range(12)]
        counts[5] = 500  # one corrupted day; median slope must survive
        out = theilsen_daily_trend_events(
            _daily(tmp_path, counts)).to_pylist()[0]
        assert abs(out["slope_per_day"] - 2.0) < 0.5

    def test_acf_detects_period_2_alternation(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import acf_daily_events

        rows = acf_daily_events(_daily(tmp_path, [10, 20] * 15)).to_pylist()
        acf = {r["lag"]: r["acf"] for r in rows}
        assert acf[1] < -0.9 and acf[2] > 0.9

    def test_dow_seasonality_flags_weekend_drop(self, ray_session,
                                                tmp_path):
        from tanml_ray.pipelines.queries import dow_seasonality_events

        # 2024-01-01 is a Monday; 4 full weeks, weekends at half load.
        counts = []
        for d in range(28):
            counts.append(50 if (d % 7) >= 5 else 100)
        rows = dow_seasonality_events(_daily(tmp_path, counts)).to_pylist()
        idx = {r["isodow"]: r["seasonal_index"] for r in rows}
        assert idx[6] < 0.7 < 1.0 < idx[1]
        assert all(r["days"] == 4 for r in rows)


class TestFeedAudits:
    def test_coverage_gaps_counts_missing_hours(self, ray_session,
                                                tmp_path):
        from tanml_ray.pipelines.queries import coverage_gaps_events

        ts = [h * HOUR_US for h in (0, 1, 2, 4)]  # hour 3 silent
        out = coverage_gaps_events(_write_events(tmp_path, ts)).to_pylist()[0]
        assert out["hours_expected"] == 5
        assert out["hours_observed"] == 4
        assert out["gaps"] == 1

    def test_coverage_gaps_clean_feed(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import coverage_gaps_events

        ts = [h * HOUR_US + i for h in range(6) for i in range(3)]
        out = coverage_gaps_events(_write_events(tmp_path, ts)).to_pylist()[0]
        assert out["gaps"] == 0 and out["coverage"] == 1.0

    def test_benford_uniform_digits_diverge(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import benford_totalprice_orders

        # one order per leading digit -> uniform 1/9 shares, far from
        # Benford's 30.1% mass on digit 1
        pq.write_table(
            pa.table({"o_totalprice": pa.array(
                [float(d) for d in range(1, 10)] * 9, type=pa.float64())}),
            str(tmp_path / "orders.parquet"))
        rows = benford_totalprice_orders(str(tmp_path)).to_pylist()
        assert all(r["share"] == pytest.approx(1 / 9, abs=1e-6)
                   for r in rows)
        assert rows[0]["expected"] == pytest.approx(0.30103, abs=1e-5)
        assert sum(r["chi2_term"] for r in rows) > 16.92  # chi2 .95, 8 dof


class TestMahalanobis:
    def _lineitem(self, tmp_path, rows):
        q, p, disc = zip(*rows)
        pq.write_table(pa.table({
            "l_quantity": pa.array(q, type=pa.float64()),
            "l_extendedprice": pa.array(p, type=pa.float64()),
            "l_discount": pa.array(disc, type=pa.float64())}),
            str(tmp_path / "lineitem.parquet"))
        return str(tmp_path)

    def test_flags_joint_outlier_marginals_ordinary(self, ray_session,
                                                    tmp_path):
        from tanml_ray.pipelines.queries import mahalanobis_outliers_lineitem

        # price tracks quantity (plus jitter to keep cov nonsingular);
        # the planted row has an ORDINARY quantity and an ORDINARY
        # price — but the combination (q=30 with a q=1-level price)
        # breaks the joint structure.
        rows = [(float(i % 30 + 1), (i % 30 + 1) * 100.0 + (i % 7),
                 float(i % 6) / 100.0) for i in range(600)]
        rows.append((30.0, 100.0, 0.02))
        out = mahalanobis_outliers_lineitem(
            self._lineitem(tmp_path, rows)).to_pylist()[0]
        assert out["n_outliers"] >= 1
        assert out["max_d2"] > 16.266

    def test_quiet_on_conforming_data(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import mahalanobis_outliers_lineitem

        rows = [(float(i % 30 + 1), (i % 30 + 1) * 100.0 + (i % 7),
                 float(i % 6) / 100.0) for i in range(600)]
        out = mahalanobis_outliers_lineitem(
            self._lineitem(tmp_path, rows)).to_pylist()[0]
        assert out["n_outliers"] == 0


class TestRankSurvivalLinkage:
    def test_kruskal_zero_on_identical_groups(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import kruskal_quantity_returnflag

        vals = [float(v) for v in range(1, 21)]
        pq.write_table(pa.table({
            "l_returnflag": pa.array(["A"] * 20 + ["N"] * 20 + ["R"] * 20),
            "l_quantity": pa.array(vals * 3, type=pa.float64())}),
            str(tmp_path / "lineitem.parquet"))
        out = kruskal_quantity_returnflag(str(tmp_path)).to_pylist()[0]
        assert out["h"] == 0.0 and out["h_tie_corrected"] == 0.0

    def test_km_product_limit_steps(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import km_ship_delay_orders

        base = EPOCH_DAY * DAY_US
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
            "o_orderdate": pa.array([base] * 3, type=pa.timestamp("us"))}),
            str(tmp_path / "orders.parquet"))
        pq.write_table(pa.table({
            "l_orderkey": pa.array([1, 2, 3], type=pa.int64()),
            "l_shipdate": pa.array(
                [base + 1 * DAY_US, base + 2 * DAY_US, base + 70 * DAY_US],
                type=pa.timestamp("us"))}),
            str(tmp_path / "lineitem.parquet"))
        rows = km_ship_delay_orders(str(tmp_path)).to_pylist()
        # delay-70 row is censored at 60 -> contributes risk, no event
        assert [r["delay_days"] for r in rows] == [1, 2]
        assert rows[0]["survival"] == pytest.approx(2 / 3, abs=1e-6)
        assert rows[1]["survival"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows[0]["n_at_risk"] == 3 and rows[1]["n_at_risk"] == 2

    def test_fuzzy_match_finds_planted_near_pair(self, ray_session,
                                                 tmp_path):
        from tanml_ray.pipelines.queries import fuzzy_match_documents

        texts = ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy cat",  # dist 3
                 "completely different text with no overlap here"]
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3)}),
            str(tmp_path / "documents.parquet"))
        rows = fuzzy_match_documents(str(tmp_path)).to_pylist()
        assert {(r["doc_id_a"], r["doc_id_b"]) for r in rows} == {(1, 2)}
        assert rows[0]["dist"] <= 4

    def test_readability_ari_formula(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import readability_ari_documents

        pq.write_table(pa.table({
            "lang": pa.array(["en"]),
            "text": pa.array(["Hello world. Nice day."])}),
            str(tmp_path / "documents.parquet"))
        out = readability_ari_documents(str(tmp_path)).to_pylist()[0]
        assert (out["chars"], out["words"], out["sentences"]) == (19, 4, 2)
        assert out["ari"] == pytest.approx(
            4.71 * 19 / 4 + 0.5 * 4 / 2 - 21.43, abs=1e-6)


class TestTestingFamily:
    def test_runs_test_detects_clustering(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import runs_test_events

        # first half low, second half high -> exactly 2 runs, z << 0
        out = runs_test_events(
            _daily(tmp_path, [10] * 10 + [20] * 10)).to_pylist()[0]
        assert out["runs"] == 2
        assert out["z"] < -3.0
        assert out["n_above"] == out["n_below"] == 10

    def test_runs_test_alternation_maximizes_runs(self, ray_session,
                                                  tmp_path):
        from tanml_ray.pipelines.queries import runs_test_events

        out = runs_test_events(
            _daily(tmp_path, [10, 20] * 10)).to_pylist()[0]
        assert out["runs"] == 20 and out["z"] > 3.0

    def test_ljung_box_fires_on_serial_structure(self, ray_session,
                                                 tmp_path):
        from tanml_ray.pipelines.queries import ljung_box_events

        out = ljung_box_events(_daily(tmp_path, [10, 20] * 15)).to_pylist()[0]
        assert out["q_stat"] > 14.07  # chi2 .95, 7 dof
        assert out["n_days"] == 30

    def _lineitem_groups(self, tmp_path, spec):
        flags, qty = [], []
        for g, values in spec.items():
            flags.extend([g] * len(values))
            qty.extend(float(v) for v in values)
        pq.write_table(pa.table({
            "l_returnflag": pa.array(flags),
            "l_quantity": pa.array(qty, type=pa.float64())}),
            str(tmp_path / "lineitem.parquet"))
        return str(tmp_path)

    def test_brown_forsythe_zero_on_identical_groups(self, ray_session,
                                                     tmp_path):
        from tanml_ray.pipelines.queries import (
            brown_forsythe_quantity_returnflag)

        vals = list(range(1, 21))
        out = brown_forsythe_quantity_returnflag(self._lineitem_groups(
            tmp_path, {"A": vals, "N": vals, "R": vals})).to_pylist()[0]
        assert out["w_stat"] == 0.0 and out["k_groups"] == 3

    def test_brown_forsythe_detects_spread_difference(self, ray_session,
                                                      tmp_path):
        from tanml_ray.pipelines.queries import (
            brown_forsythe_quantity_returnflag)

        tight = [10] * 10 + [11] * 10          # median 10.5, |dev| 0.5
        wide = list(range(1, 21))              # same median, wide spread
        out = brown_forsythe_quantity_returnflag(self._lineitem_groups(
            tmp_path, {"A": tight, "N": wide, "R": tight})).to_pylist()[0]
        assert out["w_stat"] > 10.0

    def test_effect_size_matches_hand_formula(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import (
            effect_size_quantity_returnflag)

        a = [10, 12, 14, 16, 18]               # mean 14, var 10
        b = [20, 22, 24, 26, 28]               # mean 24, var 10
        out = effect_size_quantity_returnflag(self._lineitem_groups(
            tmp_path, {"A": a, "N": b, "R": a})).to_pylist()
        d_an = next(r for r in out
                    if (r["group_a"], r["group_b"]) == ("A", "N"))
        assert d_an["cohens_d"] == pytest.approx(
            (14 - 24) / np.sqrt(10.0), abs=1e-6)
        d_ar = next(r for r in out
                    if (r["group_a"], r["group_b"]) == ("A", "R"))
        assert d_ar["cohens_d"] == 0.0


class TestRobustInference:
    def _lineitem_qty(self, tmp_path, vals):
        n = len(vals)
        pq.write_table(pa.table({
            "l_orderkey": pa.array(range(1, n + 1), type=pa.int64()),
            "l_linenumber": pa.array([1] * n, type=pa.int64()),
            "l_quantity": pa.array([float(v) for v in vals],
                                   type=pa.float64())}),
            str(tmp_path / "lineitem.parquet"))
        return str(tmp_path)

    def test_bootstrap_se_tracks_classical_se(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import bootstrap_mean_quantity

        vals = [(i % 21) + 1 for i in range(2000)]  # sd ~ 6.06
        out = bootstrap_mean_quantity(
            self._lineitem_qty(tmp_path, vals)).to_pylist()[0]
        classical = np.std(vals, ddof=1) / np.sqrt(len(vals))
        assert out["mean"] == pytest.approx(np.mean(vals), abs=1e-6)
        # Poisson bootstrap SE is a consistent estimator; with B=16
        # replicas expect agreement within ~2x
        assert classical / 2 < out["boot_se"] < classical * 2

    def test_trimmed_mean_ignores_tail_corruption(self, ray_session,
                                                  tmp_path):
        from tanml_ray.pipelines.queries import trimmed_mean_quantity

        vals = [10] * 90 + [10_000] * 10  # 10% corrupted tail
        out = trimmed_mean_quantity(
            self._lineitem_qty(tmp_path, vals)).to_pylist()[0]
        assert out["k_per_tail"] == 10
        assert out["trimmed_mean"] == 10.0       # corruption fully cut
        # winsorized clamps the tail to the 90th-percentile value (10)
        # on top, and the bottom tail to 10 as well -> also exactly 10
        assert out["winsorized_mean"] == 10.0

    def test_trimmed_mean_exact_on_uniform_grid(self, ray_session,
                                                tmp_path):
        from tanml_ray.pipelines.queries import trimmed_mean_quantity

        vals = list(range(1, 101))  # 1..100, k=10 -> keep 11..90
        out = trimmed_mean_quantity(
            self._lineitem_qty(tmp_path, vals)).to_pylist()[0]
        assert out["trimmed_mean"] == pytest.approx(
            sum(range(11, 91)) / 80, abs=1e-6)
        assert out["winsorized_mean"] == pytest.approx(
            (sum(range(11, 91)) + 10 * 11 + 10 * 90) / 100, abs=1e-6)


def test_cli_monitor_flags_planted_spike(tmp_path, ray_session, capsys):
    import json

    from tanml_ray.cli import main

    # healthy fortnight then a 5x spike day; bare-file input exercises
    # the symlink shim
    counts = [100, 104] * 8 + [500]
    ts = []
    for d, n in enumerate(counts):
        ts.extend([(EPOCH_DAY + d) * DAY_US + i * HOUR_US % DAY_US
                   for i in range(n)])
    f = tmp_path / "feed.parquet"
    pq.write_table(pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))}),
                   str(f))
    chart_out = str(tmp_path / "chart.parquet")
    rc = main(["monitor", "--input", str(f), "--chart-out", chart_out])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["status"] == "alert"
    assert info["shewhart_alert_days"] == ["2024-01-17"]
    assert info["days"] == 17
    chart = pq.read_table(chart_out)
    assert chart.num_rows == 17
    assert {"cusum_pos", "ewma", "alert"} <= set(chart.column_names)


def test_ridge_path_shrinks_coefficients(ray_session, tmp_path):
    """Ridge monotonicity: higher lambda shrinks ||beta|| toward zero
    and can only lower the training R^2."""
    import pyarrow.parquet as pq2

    from tanml_ray.pipelines.queries import ridge_path_orders

    n = 400
    days = [19723 + (i % 60) for i in range(n)]
    cust = [(i * 7) % 100 + 1 for i in range(n)]
    price = [100.0 + 3.0 * (d - 19723) + 2.0 * c + (i % 5)
             for i, (d, c) in enumerate(zip(days, cust))]
    pq2.write_table(pa.table({
        "o_orderkey": pa.array(range(n), type=pa.int64()),
        "o_orderdate": pa.array([d * DAY_US for d in days],
                                type=pa.timestamp("us")),
        "o_custkey": pa.array(cust, type=pa.int64()),
        "o_totalprice": pa.array(price, type=pa.float64())}),
        str(tmp_path / "orders.parquet"))
    rows = ridge_path_orders(str(tmp_path)).to_pylist()
    assert [r["lam"] for r in rows] == [0.0, 1e9, 1e12]
    norms = [r["coef_days"] ** 2 + r["coef_cust"] ** 2 for r in rows]
    assert norms[0] >= norms[1] >= norms[2]
    assert rows[0]["r2"] >= rows[1]["r2"] >= rows[2]["r2"]
    # OLS leg recovers the planted structure
    assert rows[0]["coef_days"] == pytest.approx(3.0, abs=0.2)
    assert rows[0]["coef_cust"] == pytest.approx(2.0, abs=0.2)


class TestForecastAttribution:
    def test_holt_tracks_linear_trend(self, ray_session, tmp_path):
        from tanml_ray.pipelines.queries import holt_forecast_events

        rows = holt_forecast_events(
            _daily(tmp_path, [100 + 10 * d for d in range(20)])).to_pylist()
        # on a clean linear series the trend estimate converges to the
        # true slope and forecasts become near-exact
        assert rows[-1]["trend"] == pytest.approx(10.0, abs=1.0)
        assert abs(rows[-1]["forecast"] - rows[-1]["n"]) < 3.0
        assert rows[0]["forecast"] is None
        assert rows[-1]["mae_post_warmup"] < 3.0

    def test_attribution_first_vs_last_touch(self, ray_session, tmp_path):
        import pyarrow.parquet as pq2

        from tanml_ray.pipelines.queries import attribution_events

        # user 1: view -> click -> purchase  (first=view, last=click)
        # user 2: purchase with no prior touch (no credit)
        # user 3: signup -> purchase -> click -> purchase
        #         (both purchases: first=signup; last=signup then click)
        et = ["view", "click", "purchase",
              "purchase",
              "signup", "purchase", "click", "purchase"]
        users = [1, 1, 1, 2, 3, 3, 3, 3]
        ts = [EPOCH_DAY * DAY_US + i * HOUR_US for i in range(len(et))]
        pq2.write_table(pa.table({
            "event_id": pa.array(range(len(et)), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(users, type=pa.int64()),
            "event_type": pa.array(et)}),
            str(tmp_path / "events.parquet"))
        rows = {r["touch_type"]: r for r in
                attribution_events(str(tmp_path)).to_pylist()}
        assert rows["view"]["first_credits"] == 1
        assert rows["signup"]["first_credits"] == 2
        assert rows["click"]["last_credits"] == 2
        assert rows["signup"]["last_credits"] == 1
        assert rows["view"]["last_credits"] == 0


class TestPrivacyFamily:
    def test_k_anonymity_detects_singleton_class(self, ray_session,
                                                 tmp_path):
        import pyarrow.parquet as pq2

        from tanml_ray.pipelines.queries import k_anonymity_orders

        n = 40
        pri = ["1-URGENT"] * 20 + ["2-HIGH"] * 19 + ["5-LOW"] * 1
        pq2.write_table(pa.table({
            "o_orderpriority": pa.array(pri),
            "o_orderstatus": pa.array(["O"] * n),
            "o_orderdate": pa.array([EPOCH_DAY * DAY_US] * n,
                                    type=pa.timestamp("us")),
            "o_totalprice": pa.array([100.0 + i for i in range(n)],
                                     type=pa.float64())}),
            str(tmp_path / "orders.parquet"))
        out = k_anonymity_orders(str(tmp_path)).to_pylist()[0]
        assert out["classes"] == 3
        assert out["k_anonymity"] == 1          # the 5-LOW singleton
        assert out["rows_below_k5"] == 1
        assert out["l_diversity"] == 1          # all in one price band

    def test_dp_noise_bounded_and_deterministic(self, ray_session,
                                                tmp_path):
        import pyarrow.parquet as pq2

        from tanml_ray.pipelines.queries import dp_noisy_counts_events

        et = (["view"] * 1000 + ["click"] * 500)
        pq2.write_table(pa.table({
            "ts": pa.array([EPOCH_DAY * DAY_US + i for i in range(1500)],
                           type=pa.timestamp("us")),
            "event_type": pa.array(et)}),
            str(tmp_path / "events.parquet"))
        a = dp_noisy_counts_events(str(tmp_path)).to_pylist()
        b = dp_noisy_counts_events(str(tmp_path)).to_pylist()
        assert a == b                            # deterministic seed
        for r in a:
            # Laplace(b=10): |noise| < 100 with overwhelming odds
            assert abs(r["noisy_n"] - r["true_n"]) < 100
            assert r["noisy_n"] != r["true_n"] or r["true_n"] == 0
