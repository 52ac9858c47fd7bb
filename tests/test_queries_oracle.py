"""Guard the queries()↔oracle_sql() contract: run a fast subset against
DuckDB on sf0.001 exactly the way the driver does (row count + sorted
columns + values)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FAST_QUERIES = [
    "profile_lineitem", "q1_pricing_summary", "lang_distribution_documents",
    "histogram_quantity", "referential_lang_violations",
    "pearson_corr_lineitem", "psi_documents_even_odd",
    "token_counts_documents", "dedup_first_per_group",
    "classification_metrics_orders", "regression_metrics_orders",
    "join_orders_customer_broadcast", "join_lineitem_orders_partitioned",
    "asof_join_events", "bloom_semi_join_lineitem", "anti_join_lineitem",
    "json_extract_events", "grouped_psi_events", "linear_cv_orders",
    "vif_lineitem", "iqr_outliers_extendedprice", "rolling_7day_events",
    # round-2 families
    "kendall_sample_lineitem", "knn_impute_quantity",
    "permutation_importance_orders", "linear_fit_orders",
    "bpe_token_counts_documents",
    # round-3 families
    "linear_cv_repeated_orders", "order_shipweek_counts",
    "tfidf_top_terms_documents", "linear_cv_repeated_summary_orders",
    "daily_active_users_events", "price_quantiles_by_priority",
    "pivot_priority_status_orders",
    # round-3 webtext layer
    "gopher_quality_documents", "repetition_ngram_documents",
    "hot_ngram_documents", "weighted_sample_documents",
    "ngram_contamination_documents", "robust_scale_totalprice",
    # round-3 session-3 relational/diagnostic layer
    "rollup_orders", "dod_change_events", "top3_customers_per_segment",
    "dup_cluster_sizes_documents", "moments_lineitem",
    "anova_totalprice_priority", "mad_extendedprice",
    "vocab_coverage_documents", "zipf_slope_documents",
    "ntile_deciles_orders", "event_transitions_events", "ttr_documents",
    "kappa_quality_documents", "line_dedup_documents",
    "modified_zscore_outliers_lineitem", "cumulative_revenue_events",
    "entropy_profile", "daily_value_quantiles_events",
    "mannwhitney_quantity_returnflag", "basket_lift_events",
    "dsir_weights_documents", "script_profile_documents",
    "pack_windows_documents",
    # round-5 families
    "logistic_cv_orders", "logistic_cv_repeated_orders",
    "spearman_lineitem", "knn_cosine_pq_embeddings",
    "pca_project_embeddings", "poisson_step_lineitem",
    "logistic_wald_step_orders",
    # round-5 session-5 non-equi joins + iterative graph rep
    "interval_window_events", "band_join_pairs_events",
    "pagerank_event_types", "hbos_outliers_lineitem",
    "target_encode_orders", "conformal_interval_orders",
    "key_skew_profile_events",
    "fd_violations_orders",
    # round-5 session-6 monitoring checks
    "hellinger_tv_events", "volume_control_events",
    "out_of_order_events", "freshness_lag_events",
    # round-5 session-6 cross-table consistency checks
    "order_reconciliation_orders", "inactive_customers_by_segment",
    "split_contamination_events",
    # round-5 session-6 column-integrity audits
    "near_zero_variance_orders", "embedding_norm_audit",
    "dup_rate_by_source_documents", "props_conformance_events",
    "ship_before_order_lineitem", "metadata_consistency_documents",
    # round-5 session-7 declared-contract audits
    "range_conformance_lineitem", "whitelist_audit_lineitem",
    "measure_sanity_events",
    # round-5 session-9 sequence analytics + experimentation primitives
    "reorder_intervals_customer",
    "ab_conversion_events",
    "cuped_ab_events",
    "sprt_purchase_events",
    "did_events",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(float), 9)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.usefixtures("ray_session")
def test_hll_dau_within_tolerance(sf_dir, oracle_con):
    """The grouped-HLL sketch path must track the exact grouped
    distinct count within its ±~1.6% standard error (5% test bound)."""
    import __ray_entry__ as entry

    approx = entry.queries()["daily_active_users_hll_events"](sf_dir)
    exact = entry.queries()["daily_active_users_events"](sf_dir)
    a = {r["day"]: r["dau_approx"] for r in approx.to_pylist()}
    e = {r["day"]: r["dau"] for r in exact.to_pylist()}
    assert set(a) == set(e) and len(e) >= 5
    for day, n in e.items():
        assert abs(a[day] - n) <= max(2, 0.05 * n), (day, a[day], n)


@pytest.mark.usefixtures("ray_session")
def test_tdigest_group_quantiles_within_tolerance(sf_dir):
    """The grouped t-digest sketch must track the exact per-group
    quantiles within 2%."""
    import __ray_entry__ as entry

    approx = {r["o_orderpriority"]: r for r in entry.queries()[
        "price_quantiles_by_priority_tdigest"](sf_dir).to_pylist()}
    exact = {r["o_orderpriority"]: r for r in entry.queries()[
        "price_quantiles_by_priority"](sf_dir).to_pylist()}
    assert set(approx) == set(exact) and len(exact) >= 3
    for pri, e in exact.items():
        a = approx[pri]
        assert a["n"] == e["n"]
        for qk in ("p25", "p50", "p75", "p95"):
            assert abs(a[qk] - e[qk]) <= 0.02 * e[qk], (pri, qk, a[qk], e[qk])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(name, sf_dir, oracle_con):
    import __ray_entry__ as entry

    fn = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    mine = fn(sf_dir)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    mine = canon(mine)
    ref = canon(oracle_con.sql(sql).df())
    assert list(mine.columns) == list(ref.columns)
    assert len(mine) == len(ref)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_multimodal_near_dup_planted_pairs(sf_dir):
    """The cross-format planted duplicate sets ((4k, 4k+1) exactly —
    BMP↔PGM images, WAV energy contours, AVI frame fingerprints) are
    recovered exactly and nothing else pairs (rows-only in the driver,
    exact-set here)."""
    from tanml_ray.pipelines import queries as q

    img = q.image_near_dup_multimodal(sf_dir).to_pandas()
    assert set(zip(img.id_a, img.id_b)) == \
        {(k, k + 1) for k in range(0, 120, 4)}
    aud = q.audio_near_dup_multimodal(sf_dir).to_pandas()
    assert set(zip(aud.id_a, aud.id_b)) == \
        {(k, k + 1) for k in range(0, 60, 4)}
    vid = q.video_near_dup_multimodal(sf_dir).to_pandas()
    assert set(zip(vid.id_a, vid.id_b)) == \
        {(k, k + 1) for k in range(0, 40, 4)}


@pytest.mark.usefixtures("ray_session")
def test_crawl_delta_matches_oracle_and_plants(sf_dir):
    """Crawl snapshot delta at sf0.001: engine vs the DuckDB FULL OUTER
    JOIN twin on the SAME cached fixtures, plus the planted structure —
    all four statuses must be present (A drops page_id%31==7 → 'added'
    in B; B drops %29==11 → 'removed'; the drift variant pads es/de
    text and remaps langs → 'changed'; the rest 'unchanged')."""
    import __ray_entry__ as entry
    from tanml_ray.pipelines import queries as q

    os.environ["TANML_ORACLE_SF_DIR"] = sf_dir
    try:
        mine = canon(entry.queries()["crawl_delta_pages"](sf_dir).to_pandas())
        con = duckdb.connect()
        ref = canon(con.sql(q.crawl_delta_sql(sf_dir)).df())
    finally:
        os.environ.pop("TANML_ORACLE_SF_DIR", None)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False)
    statuses = dict(zip(mine["status"], mine["n_urls"]))
    assert set(statuses) == {"added", "removed", "changed", "unchanged"}
    assert all(n > 0 for n in statuses.values())


@pytest.mark.usefixtures("ray_session")
def test_crawl_churn_by_host_matches_oracle(sf_dir):
    """Per-host churn rollup vs its DuckDB twin at sf0.001; the fixture
    hosts are hash-spread over site{0..996}.example.com so the >= 5
    noise floor must filter some hosts but not all."""
    import __ray_entry__ as entry
    from tanml_ray.pipelines import queries as q

    os.environ["TANML_ORACLE_SF_DIR"] = sf_dir
    try:
        mine = canon(entry.queries()["crawl_churn_by_host"](sf_dir)
                     .to_pandas())
        con = duckdb.connect()
        ref = canon(con.sql(q.crawl_churn_sql(sf_dir)).df())
    finally:
        os.environ.pop("TANML_ORACLE_SF_DIR", None)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False)
    assert mine["host"].nunique() >= 1
    assert set(mine["status"]) <= {"added", "removed", "changed",
                                   "unchanged"}


@pytest.mark.usefixtures("ray_session")
def test_reorder_intervals_gap_semantics(sf_dir):
    """Bucket boundaries and totals: every consecutive-order gap is
    counted exactly once, buckets partition [0, inf), and the total gap
    count equals sum over customers of (orders-1)."""
    import __ray_entry__ as entry

    out = entry.queries()["reorder_intervals_customer"](sf_dir).to_pylist()
    con = duckdb.connect()
    expected = con.sql(
        f"SELECT sum(n-1) FROM (SELECT count(*) AS n FROM "
        f"read_parquet('{sf_dir}/orders.parquet') GROUP BY o_custkey) "
        f"WHERE n > 1").fetchone()[0]
    assert sum(r["n_gaps"] for r in out) == int(expected)
    assert [r["bucket"] for r in out] == sorted(r["bucket"] for r in out)
