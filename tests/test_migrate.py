"""Schema migration: rename/cast/fill/drop in one streaming pass, with
fail-fast validation of the spec against the dataset schema."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest


def _src(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(pa.table({
        "old_id": pa.array([1, 2, 3], type=pa.int32()),
        "score": pa.array([1.5, None, 2.5], type=pa.float64()),
        "junk": pa.array(["a", "b", "c"])}),
        str(d / "p0.parquet"))
    pq.write_table(pa.table({
        "old_id": pa.array([4, 5], type=pa.int32()),
        "score": pa.array([None, 9.0], type=pa.float64()),
        "junk": pa.array(["d", "e"])}),
        str(d / "p1.parquet"))
    return str(d)


def test_migrate_applies_all_ops(ray_session, tmp_path):
    from tanml_ray.pipelines.migrate import migrate_schema

    out = str(tmp_path / "out")
    stats = migrate_schema(_src(tmp_path), out, {
        "rename": {"old_id": "id"},
        "cast": {"id": "int64"},
        "fill": {"score": 0.0},
        "drop": ["junk"]})
    assert stats["rows"] == 5
    t = pads.dataset(out).to_table()
    assert set(t.column_names) == {"id", "score"}
    assert t.schema.field("id").type == pa.int64()
    got = sorted(zip(t.column("id").to_pylist(),
                     t.column("score").to_pylist()))
    assert got == [(1, 1.5), (2, 0.0), (3, 2.5), (4, 0.0), (5, 9.0)]


def test_migrate_rejects_unknown_columns(ray_session, tmp_path):
    from tanml_ray.pipelines.migrate import migrate_schema

    src = _src(tmp_path)
    with pytest.raises(ValueError, match="unknown column 'nope'"):
        migrate_schema(src, str(tmp_path / "o1"), {"rename": {"nope": "x"}})
    with pytest.raises(ValueError, match="unknown column 'old_id'"):
        # cast must reference the POST-rename name
        migrate_schema(src, str(tmp_path / "o2"),
                       {"rename": {"old_id": "id"},
                        "cast": {"old_id": "int64"}})
    with pytest.raises(ValueError, match="unsupported cast target"):
        migrate_schema(src, str(tmp_path / "o3"),
                       {"cast": {"score": "decimal"}})


def test_migrate_cli(ray_session, tmp_path, capsys):
    from tanml_ray.cli import main

    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({"rename": {"old_id": "id"},
                                "drop": ["junk"]}))
    out = str(tmp_path / "out")
    rc = main(["migrate", "--input", _src(tmp_path), "--out", out,
               "--spec", str(spec)])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 5 and info["renamed"] == 1
    assert set(pads.dataset(out).schema.names) == {"id", "score"}
