"""Compaction job: small shards -> size-balanced (optionally globally
sorted) parquet; rows preserved exactly, CLI idempotence guard."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq


def _shards(tmp_path, n_shards=7, rows_per=40):
    d = tmp_path / "in"
    d.mkdir()
    rows = 0
    for s in range(n_shards):
        ids = list(range(rows, rows + rows_per))
        pq.write_table(pa.table({
            "k": pa.array([(i * 37) % 1000 for i in ids], type=pa.int64()),
            "v": pa.array(ids, type=pa.int64())}),
            str(d / f"shard{s}.parquet"))
        rows += rows_per
    return str(d), rows


def test_compact_balances_and_sorts(ray_session, tmp_path):
    from tanml_ray.pipelines.compact import compact_parquet

    src, n = _shards(tmp_path)
    out = str(tmp_path / "out")
    stats = compact_parquet(src, out, sort_key="k",
                            target_rows_per_file=100)
    assert stats["rows"] == n and stats["files_in"] == 7
    assert stats["files_out"] == 3  # ceil(280 / 100)
    t = pads.dataset(out).to_table()
    assert t.num_rows == n
    # globally sorted output: per-file ranges must not interleave
    ks = t.column("k").to_pylist()
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    ranges = []
    for f in files:
        col = pq.read_table(os.path.join(out, f)).column("k").to_pylist()
        assert col == sorted(col)
        ranges.append((min(col), max(col)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # content preserved exactly
    assert sorted(t.column("v").to_pylist()) == list(range(n))


def test_compact_cli_idempotent(ray_session, tmp_path, capsys):
    from tanml_ray.cli import main

    src, n = _shards(tmp_path, n_shards=3, rows_per=20)
    out = str(tmp_path / "out")
    rc = main(["compact", "--input", src, "--out", out,
               "--target-rows", "50"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == n and info["files_out"] == 2
    rc = main(["compact", "--input", src, "--out", out])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info.get("skipped") == "already compacted"
