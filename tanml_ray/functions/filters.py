"""Row-filter helpers (SURVEY §2.2 M2 / M8).

Reference semantics: dropna(subset=[target]) + drop non-finite target
with X/y alignment preserved (/root/reference/tanml/ui/views/
model_dev.py:185-198); dropna(subset=selected)
(tanml/ui/views/preprocessing.py:134-148). Vectorized masks — a row
survives only if every listed column is non-null (and finite, for the
target variant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def drop_missing(ds, columns: list[str]):
    """M8: drop rows with a null in any of `columns`."""
    def keep(batch: pa.Table) -> pa.Table:
        mask = None
        for c in columns:
            ok = pc.is_valid(batch.column(c))
            if pa.types.is_floating(batch.column(c).type):
                ok = pc.and_(ok, pc.invert(pc.is_nan(
                    pc.fill_null(batch.column(c), 0.0))))
            mask = ok if mask is None else pc.and_(mask, ok)
        return batch.filter(mask) if mask is not None else batch

    return ds.map_batches(keep, batch_format="pyarrow")


def drop_nonfinite_target(ds, target: str):
    """M2: drop rows whose target is null, NaN or ±inf — the whole row
    goes, so feature/target alignment is inherently preserved."""
    def keep(batch: pa.Table) -> pa.Table:
        x = batch.column(target).to_numpy(zero_copy_only=False)
        finite = np.isfinite(x.astype(np.float64, copy=False))
        valid = pc.is_valid(batch.column(target)).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(finite & valid))

    return ds.map_batches(keep, batch_format="pyarrow")
