"""Distributed column profiling: one streaming pass, mergeable partials.

Reference semantics: the profiling page computes count/null%/distinct/
describe()/histogram per column on an in-memory DataFrame
(/root/reference/tanml/ui/views/profiling.py:22-43,85-102,222-244).
Here one `map_batches` pass emits a pickled partial-state row per
(block, column); partials are tiny (KBs) so the final merge streams
through the driver. At 10^12 rows the partial count is
O(blocks × columns) — still driver-mergeable; a tree merge via a
second map_batches round is the documented scale-out path.
"""

from __future__ import annotations

import pickle
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from tanml_ray.kernels.accumulators import ColumnProfileAcc


def make_profile_partials(batch: pa.Table, columns: list[str] | None = None,
                          derived_text_len: str | None = None) -> pa.Table:
    """One partial-state row per column for this batch."""
    cols = columns or batch.column_names
    names: list[str] = []
    states: list[bytes] = []
    for name in cols:
        if name not in batch.column_names:
            continue
        arr = batch.column(name)
        kind = ColumnProfileAcc.kind_of(arr.type)
        acc = ColumnProfileAcc(name, kind)
        acc.update(arr)
        names.append(name)
        states.append(pickle.dumps(acc.to_state()))
    if derived_text_len and derived_text_len in batch.column_names:
        # numeric profile of utf8 text length (reference has no analog;
        # this feeds the drift suite's text-length distribution)
        lens = pc.utf8_length(batch.column(derived_text_len))
        acc = ColumnProfileAcc(f"{derived_text_len}_len", "numeric")
        acc.update(pc.cast(lens, pa.float64()))
        names.append(f"{derived_text_len}_len")
        states.append(pickle.dumps(acc.to_state()))
    return pa.Table.from_arrays(
        [pa.array(names, type=pa.string()), pa.array(states, type=pa.binary())],
        names=["column", "state"])


def merge_profile_partials(partials_iter) -> dict[str, ColumnProfileAcc]:
    """Merge an iterable of partial-state batches (column, state)."""
    merged: dict[str, ColumnProfileAcc] = {}
    for tbl in partials_iter:
        for name, blob in zip(tbl.column("column").to_pylist(),
                              tbl.column("state").to_pylist()):
            acc = ColumnProfileAcc.from_state(pickle.loads(blob))
            if name in merged:
                merged[name].merge(acc)
            else:
                merged[name] = acc
    return merged


def profile_dataset(ds, columns: list[str] | None = None,
                    derived_text_len: str | None = None) -> dict[str, dict[str, Any]]:
    """Profile a Ray Dataset → {column: finalized profile dict}.

    Single streaming pass; no materialization of the input.
    """
    partials = ds.map_batches(
        lambda b: make_profile_partials(b, columns, derived_text_len),
        batch_format="pyarrow")
    merged = merge_profile_partials(
        partials.iter_batches(batch_size=4096, batch_format="pyarrow"))
    if not merged and columns:
        # empty input: still return a stable zero-profile per column
        schema = ds.schema()
        types = (dict(zip(schema.names, schema.types))
                 if schema is not None else {})
        for c in columns:
            kind = (ColumnProfileAcc.kind_of(types[c]) if c in types else "other")
            merged[c] = ColumnProfileAcc(c, kind)
    return {name: acc.finalize() for name, acc in merged.items()}
