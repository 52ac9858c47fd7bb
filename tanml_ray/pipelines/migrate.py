"""Spec-driven schema migration: rename / cast / default-fill / drop
columns across a parquet dataset in one streaming pass.

The day-2 operation behind every long-lived table: producers change a
column name or type and every downstream shard must converge. The spec
is a plain dict (JSON-friendly for the CLI):

    {"rename": {"old": "new"},
     "cast":   {"col": "int64" | "float64" | "string" | "timestamp[us]"},
     "fill":   {"col": default_for_nulls},
     "drop":   ["col", ...]}

Applied in that order (rename → cast → fill → drop), all as zero-copy-
where-possible Arrow kernels inside ONE map_batches — no shuffle, no
driver materialization. Unknown columns in the spec raise up front
against the dataset schema (fail fast, before any task runs).
"""

from __future__ import annotations

import pyarrow as pa

from tanml_ray.sources.ingest import read_parquet_clean

_TYPES = {
    "int64": pa.int64(), "int32": pa.int32(), "float64": pa.float64(),
    "float32": pa.float32(), "string": pa.string(), "bool": pa.bool_(),
    "timestamp[us]": pa.timestamp("us"), "date32": pa.date32(),
}


def migrate_schema(input_path: str, out_dir: str, spec: dict) -> dict:
    """Apply ``spec`` to every row of ``input_path`` → ``out_dir``."""
    rename = dict(spec.get("rename", {}))
    cast = dict(spec.get("cast", {}))
    fill = dict(spec.get("fill", {}))
    drop = list(spec.get("drop", []))
    for t in cast.values():
        if t not in _TYPES:
            raise ValueError(f"unsupported cast target {t!r}; "
                             f"supported: {sorted(_TYPES)}")

    ds = read_parquet_clean(input_path)
    names = set(ds.schema().names)
    for col in list(rename) + list(drop):
        if col not in names:
            raise ValueError(f"spec references unknown column {col!r}; "
                             f"dataset has {sorted(names)}")
    post_rename = {rename.get(c, c) for c in names}
    for col in list(cast) + list(fill):
        if col not in post_rename:
            raise ValueError(f"spec references unknown column {col!r} "
                             f"(after renames: {sorted(post_rename)})")

    def apply(batch: pa.Table) -> pa.Table:
        cols = {rename.get(c, c): batch.column(c)
                for c in batch.column_names}
        for c, t in cast.items():
            cols[c] = cols[c].cast(_TYPES[t])
        for c, v in fill.items():
            arr = cols[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[c] = arr.fill_null(v)
        for c in drop:
            cols.pop(rename.get(c, c), None)
        return pa.table(cols)

    out = ds.map_batches(apply, batch_format="pyarrow")
    out.write_parquet(out_dir)
    return {"rows": ds.count(), "renamed": len(rename),
            "casted": len(cast), "filled": len(fill),
            "dropped": len(drop), "out": out_dir}
