"""Schema alignment / dtype coercion (SURVEY §2.2 M3).

Reference semantics (/root/reference/tanml/ui/services/data.py:51-72,
tanml/ui/helpers/__init__.py:113-159): the current table must contain
every baseline column; extras are dropped, order normalized, dtypes
coerced to the baseline's; incompatibilities surface as schema
violations instead of exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass
class SchemaAlignResult:
    missing_columns: list[str] = field(default_factory=list)
    extra_columns: list[str] = field(default_factory=list)
    coerced_columns: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.missing_columns


def compare_schemas(target: pa.Schema, actual: pa.Schema) -> SchemaAlignResult:
    """Driver-side metadata comparison (no shuffle, J2)."""
    res = SchemaAlignResult()
    actual_names = set(actual.names)
    for f in target:
        if f.name not in actual_names:
            res.missing_columns.append(f.name)
        elif actual.field(f.name).type != f.type:
            res.coerced_columns.append(f.name)
    res.extra_columns = [n for n in actual.names if n not in set(target.names)]
    return res


def align_batch(batch: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast one batch to the target schema: drop extras, reorder,
    cast dtypes (safe=False matches pandas coercion; un-castable
    values raise — callers wanting violation rows should pre-filter)."""
    arrays = []
    for f in target:
        col = batch.column(f.name)
        if col.type != f.type:
            col = col.cast(f.type, safe=False)
        arrays.append(col)
    return pa.Table.from_arrays(arrays, schema=target)


def align_dataset(ds, target: pa.Schema):
    """M3 as a Ray stage: metadata check first (fail fast on missing
    columns), then a vectorized cast map."""
    res = compare_schemas(target, pa.schema(
        [(n, t) for n, t in zip(ds.schema().names, ds.schema().types)]))
    if not res.ok:
        raise ValueError(f"missing required columns: {res.missing_columns}")
    return ds.map_batches(lambda b: align_batch(b, target),
                          batch_format="pyarrow"), res
