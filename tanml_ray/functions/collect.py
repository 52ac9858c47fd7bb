"""Driver-side collection helpers.

`Dataset.take_all()` iterates per ROW (Python-object conversion,
~0.5 ms/row — 100k rows ≈ 50 s); these helpers stream Arrow batches
instead, which is ~100× faster and the only acceptable way to collect
anything beyond a few thousand rows. Still driver-side: only for
SMALL results (aggregates, candidate sets, top-k), never the input.
"""

from __future__ import annotations

import pyarrow as pa


def collect_table(ds, batch_size: int = 65536) -> pa.Table:
    """Materialize a (small) Dataset as one pyarrow Table via batches."""
    parts = list(ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"))
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="permissive")


def collect_pylist(ds, batch_size: int = 65536) -> list[dict]:
    return collect_table(ds, batch_size).to_pylist()


def from_pandas_clean(df, preserve_index: bool = False) -> pa.Table:
    """`pa.Table.from_pandas` WITHOUT the b'pandas' schema metadata.

    The metadata makes `hash(schema)` raise (pyarrow hashes the
    metadata dict), which defeats Ray Data's block-schema
    deduplication and spams "Failed to hash the schemas" warnings on
    every downstream stage — always use this inside map_batches fns
    that build their output from a DataFrame."""
    return (pa.Table.from_pandas(df, preserve_index=preserve_index)
            .replace_schema_metadata(None))
