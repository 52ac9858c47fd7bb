"""Parquet layout maintenance: compact a directory of arbitrarily-sized
shards into size-balanced files, optionally globally sorted by a key.

The housekeeping job every long-lived dataset needs at scale — small
files from incremental appends destroy read parallelism and metadata
caching; a periodic compaction rewrites them into ~target-row files.
Sorting is a real all-to-all shuffle (ds.sort), so it is opt-in; the
unsorted path is a pure repartition (streaming, no key exchange).

Ray-Data-first: read → (sort) → repartition(n_files) → write_parquet.
No driver materialization at any size; the row count comes from
parquet metadata (count() fast-path), not a scan.
"""

from __future__ import annotations

import math
import os

from tanml_ray.sources.ingest import read_parquet_clean


def compact_parquet(input_path: str, out_dir: str,
                    sort_key: str | None = None,
                    target_rows_per_file: int = 1_000_000) -> dict:
    """Rewrite ``input_path`` into ``out_dir`` as size-balanced parquet.

    Returns a stats dict: rows, files_in, files_out, sorted_by.
    ``out_dir`` must not already contain a compaction (idempotence is
    the caller's job — rerunning appends; the CLI guards on _DONE)."""
    import pyarrow.dataset as pads

    ds = read_parquet_clean(input_path)
    n = ds.count()
    files_in = len(pads.dataset(input_path).files)
    files_out = max(1, math.ceil(n / target_rows_per_file))
    if sort_key is not None:
        ds = ds.sort(sort_key)
    ds.repartition(files_out).write_parquet(out_dir)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("ok")
    return {"rows": n, "files_in": files_in, "files_out": files_out,
            "sorted_by": sort_key, "out": out_dir}
