"""Crawl snapshot delta + incremental re-validation (pipelines/delta.py)."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pages(rows: list[tuple[int, str, str | None]]):
    """(page_id, url, text) → 3-block pages Dataset (delta needs only
    these columns; block split exercises the per-batch combine)."""
    import ray.data as rd

    t = pa.table({
        "page_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "url": pa.array([r[1] for r in rows], type=pa.string()),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
    })
    return rd.from_arrow(t).repartition(3)


BASE = [(1, "u/a", "alpha"), (2, "u/b", "bravo"), (3, "u/c", "charlie"),
        (4, "u/d", None), (9, "u/b", "shadowed-dup")]   # u/b dup: min id wins
CUR = [(1, "u/a", "alpha"),          # unchanged
       (2, "u/b", "bravo-EDITED"),   # changed (canonical page edited)
       (4, "u/d", None),             # unchanged (null text both sides)
       (5, "u/e", "echo")]           # added; u/c removed


@pytest.mark.usefixtures("ray_session")
def test_snapshot_delta_url_statuses():
    from tanml_ray.pipelines.delta import snapshot_delta

    out = {r["url"]: r["status"]
           for r in snapshot_delta(_pages(BASE), _pages(CUR)).take_all()}
    assert out == {"u/a": "unchanged", "u/b": "changed",
                   "u/c": "removed", "u/d": "unchanged", "u/e": "added"}


@pytest.mark.usefixtures("ray_session")
def test_keep_first_election_ignores_shadowed_duplicate():
    """u/b's canonical page is min page_id (2); the id-9 duplicate must
    not flip the comparison — swap CUR's edit onto the duplicate
    instead and u/b becomes unchanged."""
    from tanml_ray.pipelines.delta import snapshot_delta

    cur2 = [(1, "u/a", "alpha"), (2, "u/b", "bravo"),
            (9, "u/b", "dup-EDITED"), (3, "u/c", "charlie"),
            (4, "u/d", None)]
    out = {r["url"]: r["status"]
           for r in snapshot_delta(_pages(BASE), _pages(cur2)).take_all()}
    assert out["u/b"] == "unchanged"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("budget", [256 << 20, 0])
def test_semi_join_paths_agree(budget):
    """Broadcast-set and partitioned-hash semi-joins validate the SAME
    pages: all pages whose url is added or changed."""
    from tanml_ray.pipelines.delta import (_semi_join_pages, snapshot_delta)
    import pyarrow.compute as pc

    delta = snapshot_delta(_pages(BASE), _pages(CUR))
    todo = delta.map_batches(
        lambda t: t.filter(pc.is_in(t.column("status"),
                                    pa.array(["added", "changed"])))
        .select(["url"]), batch_format="pyarrow")
    got = _semi_join_pages(_pages(CUR), todo, 2, budget)
    rows = sorted((r["page_id"], r["url"]) for r in got.take_all())
    assert rows == [(2, "u/b"), (5, "u/e")]


@pytest.mark.usefixtures("ray_session")
def test_revalidate_delta_fixture_end_to_end(sf_dir, tmp_path):
    """Fixture pair at sf0.001: the revalidated row count equals the
    DuckDB-computed page count of added/changed urls, and an identical
    pair short-circuits to report=None."""
    import duckdb

    from tanml_ray.pipelines.delta import revalidate_delta
    from tanml_ray.sources.pages import synthesize_pages_parquet

    base = synthesize_pages_parquet(sf_dir, "/tmp/tanml_pages_sf0.001_baseline")
    cur = synthesize_pages_parquet(sf_dir, "/tmp/tanml_pages_sf0.001_current",
                                   variant="current")
    counts, report = revalidate_delta(base, cur, out_dir=str(tmp_path / "o"))
    by = {r["status"]: r["n_urls"] for r in counts.to_pylist()}
    con = duckdb.connect()
    expected = con.sql(f"""
        WITH a AS (SELECT url, arg_min(md5(coalesce(text,'')), page_id) AS dg
                   FROM read_parquet('{base}/*.parquet') GROUP BY url),
             b AS (SELECT url, arg_min(md5(coalesce(text,'')), page_id) AS dg
                   FROM read_parquet('{cur}/*.parquet') GROUP BY url),
             todo AS (SELECT b.url FROM b LEFT JOIN a ON a.url = b.url
                      WHERE a.url IS NULL OR a.dg <> b.dg)
        SELECT (SELECT count(*) FROM todo) AS n_urls,
               (SELECT count(*) FROM read_parquet('{cur}/*.parquet') p
                WHERE p.url IN (SELECT url FROM todo)) AS n_pages
    """).fetchone()
    assert by.get("added", 0) + by.get("changed", 0) == expected[0]
    assert report.summary["rows"] == expected[1]
    assert (tmp_path / "o" / "summary.json").exists()

    counts2, report2 = revalidate_delta(base, base)
    assert set(r["status"] for r in counts2.to_pylist()) == {"unchanged"}
    assert report2 is None


@pytest.mark.usefixtures("ray_session")
def test_revalidate_delta_resumable_checkpoints(sf_dir, tmp_path):
    """First run stages + validates; a rerun is a full checkpoint hit
    (0 processed partitions, same counts); deleting the wave manifest
    forces revalidation but NOT restaging (the _DONE marker holds)."""
    import json

    from tanml_ray.pipelines.delta import revalidate_delta_resumable
    from tanml_ray.sources.pages import synthesize_pages_parquet

    base = synthesize_pages_parquet(sf_dir, "/tmp/tanml_pages_sf0.001_baseline")
    cur = synthesize_pages_parquet(sf_dir, "/tmp/tanml_pages_sf0.001_current",
                                   variant="current")
    out = str(tmp_path / "ckpt")
    c1, s1 = revalidate_delta_resumable(base, cur, out, wave_size=2)
    assert s1["processed_partitions"] == s1["partitions"] > 0
    assert s1["rows"] > 0

    c2, s2 = revalidate_delta_resumable(base, cur, out, wave_size=2)
    assert s2["processed_partitions"] == 0
    assert s2["skipped_partitions"] == s1["partitions"]
    assert c2.to_pylist() == c1.to_pylist()
    assert s2["rows"] == s1["rows"]
    assert s2["delta_lineage"] == s1["delta_lineage"]

    # kill the wave manifest mid-"crash": staged delta survives (its
    # _DONE marker is intact) and only validation reruns
    os.remove(os.path.join(out, "manifest.json"))
    staged = os.path.join(out, f"delta_pages_{s1['delta_lineage']}")
    mtime_before = os.path.getmtime(os.path.join(staged, "_DONE"))
    c3, s3 = revalidate_delta_resumable(base, cur, out, wave_size=2)
    assert s3["processed_partitions"] == s3["partitions"]
    assert s3["rows"] == s1["rows"]
    assert os.path.getmtime(os.path.join(staged, "_DONE")) == mtime_before
