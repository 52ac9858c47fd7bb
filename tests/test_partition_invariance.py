"""Partition-layout invariance: every deterministic query must produce
IDENTICAL output (values AND dtypes) whether a table arrives as one
parquet file or as many small shards. This is the failure class behind
the dsir n_tokens float64 drift (null-padded union blocks promoting
int columns on some layouts) and the engine's core 100-TB claim —
"exact under any partitioning" — made testable."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["documents", "lineitem", "orders", "customer", "events",
          "embeddings", "nation", "region"]
SHARDS = 7

QUERIES = [
    "dsir_weights_documents",
    "span_dedup_documents",
    "line_dedup_documents",
    "c4_clean_documents",
    "join_lineitem_orders_partitioned",
    "full_outer_join_orders_customer",
    "left_join_customer_orders",
    "asof_join_events",
    "dup_cluster_sizes_documents",
    "ntile_deciles_orders",
    "modified_zscore_outliers_lineitem",
    "minhash_near_dup_documents",
    "url_filter_documents",
    "chunk_documents",
    "bpe_merges_documents",
    "langid_documents",
    "corpus_datacard_documents",
    "script_profile_documents",
    "pack_windows_documents",
    # round-4 coarse-partition rewrites (the per-user map_groups →
    # hash(user)%P migration must not change a single value)
    "funnel_events",
    "retention_cohorts_events",
    "event_transitions_events",
    "basket_lift_events",
    "domain_stats_documents",
    "dedup_keep_best_documents",
    "source_overlap_documents",
    "shuffle_shards_documents",
    "hopping_window_events",
    "spearman_lineitem",
    # round-5 session-5 non-equi joins + iterative graph rep (band join
    # and pagerank ride the coarse hash(user)%P shuffle; the interval
    # join derives its window table from a global aggregate)
    "interval_window_events",
    "band_join_pairs_events",
    "pagerank_event_types",
    "hbos_outliers_lineitem",
    "target_encode_orders",
    "conformal_interval_orders",
    "key_skew_profile_events",
    # round-5 validation-family closer (the FD check shuffles distinct
    # (key, value) pairs only)
    "fd_violations_orders",
    # round-5 session-7 additions: blocked fuzzy linkage (coarse
    # hash(block)%P shuffle), Mahalanobis (two combiner passes whose
    # exact bigint sufficient statistics must merge identically),
    # Brown-Forsythe / Kruskal (grid-bounded value-count shuffles),
    # KM survival (partitioned join + (t, event) grid), and the SPC /
    # trend family (daily-count combiner shuffles)
    "fuzzy_match_documents",
    "mahalanobis_outliers_lineitem",
    "brown_forsythe_quantity_returnflag",
    "kruskal_quantity_returnflag",
    "effect_size_quantity_returnflag",
    "km_ship_delay_orders",
    "cusum_chart_events",
    "ewma_volume_events",
    "theilsen_daily_trend_events",
    "acf_daily_events",
    "ljung_box_events",
    "runs_test_events",
    "benford_totalprice_orders",
    "readability_ari_documents",
    "coverage_gaps_events",
    "dow_seasonality_events",
    # session-7 continued: forecasting, attribution, privacy, robust
    # inference, training-pair generation, entity resolution, and the
    # link-graph family (pages fixture is itself partition-derived, so
    # these exercise the html-parse combiners under resharding)
    "holt_forecast_events",
    "attribution_events",
    "k_anonymity_orders",
    "dp_noisy_counts_events",
    "bootstrap_mean_quantity",
    "trimmed_mean_quantity",
    "span_corruption_documents",
    "fuzzy_resolve_documents",
    "link_graph_pages",
    "out_degree_profile_pages",
    "pagerank_link_graph_pages",
    "noindex_filter_pages",
    # session-9: crawl delta family (keep-first election + digest
    # compare must be exact under resharding — the fixture itself is
    # partition-derived) and the per-customer LAG walk
    "crawl_delta_pages",
    "crawl_churn_by_host",
    "reorder_intervals_customer",
    # session-9 experimentation family: combiner counts, bigint
    # suffstats merge, and the SPRT two-pass prefix must all be exact
    # under resharding
    "ab_conversion_events",
    "cuped_ab_events",
    "sprt_purchase_events",
    "did_events",
]


@pytest.fixture(scope="module")
def sharded_sf(tmp_path_factory):
    """sf0.001 with every table re-written as SHARDS small files inside
    a directory named <table>.parquet (readable by read_parquet)."""
    root = tmp_path_factory.mktemp("sharded_sf0001")
    for t in TABLES:
        src = f"{SF}/{t}.parquet"
        if not os.path.exists(src):
            continue
        tab = pq.read_table(src)
        d = root / f"{t}.parquet"
        d.mkdir()
        step = max(1, (tab.num_rows + SHARDS - 1) // SHARDS)
        for s, lo in enumerate(range(0, max(tab.num_rows, 1), step)):
            pq.write_table(tab.slice(lo, step), str(d / f"part{s:02d}.parquet"))
    return str(root)


def _canon(obj) -> pd.DataFrame:
    df = obj if isinstance(obj, pd.DataFrame) else (
        obj.to_pandas() if isinstance(obj, pa.Table) else obj.to_pandas())
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(float), 9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_query_invariant_under_resharding(name, sharded_sf, ray_session):
    import __ray_entry__ as entry

    fn = entry.queries()[name]
    base = _canon(fn(SF))
    shard = _canon(fn(sharded_sf))
    assert [str(t) for t in base.dtypes] == [str(t) for t in shard.dtypes], \
        f"{name}: dtype drift across layouts"
    pd.testing.assert_frame_equal(base, shard, check_exact=True)
