"""Skew-aware shuffle utilities (SURVEY §4.1 "Skew", north_star).

Two tools for skewed group keys (lang='en' ≫ others, crawl bursts):

1. `combiner_group_sum` — per-block partial aggregation before the
   groupby: the shuffle moves one row per (block, key) instead of one
   per input row. This is salting taken to its limit (every block is
   its own salt) and is EXACT for associative aggregates. Default.

2. `salted_group_sum` — classic explicit two-stage salting for when
   the per-block combine cannot apply (e.g. the aggregate is computed
   by the groupby itself): stage 1 groups by (key, salt=hash(row)%S)
   spreading each hot key over S reducers, stage 2 merges the S
   partials per key. Exact for associative aggregates; documented
   partitioning assumption: none (salt is derived per row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa



def combiner_group_sum(ds, key_cols: list[str], value_col: str):
    """SUM(value) GROUP BY keys with per-block pre-aggregation.
    Returns a Dataset of (keys..., value_col)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({c: batch.column(c).to_pylist() for c in key_cols})
        df[value_col] = batch.column(value_col).to_numpy(zero_copy_only=False)
        return df.groupby(key_cols, as_index=False)[value_col].sum()

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_cols)
            .aggregate(Sum(value_col, alias_name=value_col)))


def salted_group_sum(ds, key_cols: list[str], value_col: str,
                     salt_buckets: int = 16):
    """Two-stage salted SUM(value) GROUP BY keys.

    Stage 1 shuffle key = (keys..., __salt) — a hot key's rows spread
    across `salt_buckets` reducers instead of one. Stage 2 is a tiny
    groupby over S rows per key. Result identical to a direct groupby.
    """
    from ray.data.aggregate import Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # derive salt from a stable per-row hash so retries agree
        basis = np.arange(n, dtype=np.uint64)
        if key_cols:
            basis = basis + pd.util.hash_array(
                np.asarray(batch.column(key_cols[0]).to_pylist(), dtype=object))
        salt = (basis % np.uint64(salt_buckets)).astype(np.int32)
        return batch.append_column("__salt", pa.array(salt, type=pa.int32()))

    stage1 = (ds.map_batches(add_salt, batch_format="pyarrow")
              .groupby([*key_cols, "__salt"])
              .aggregate(Sum(value_col, alias_name=value_col)))
    stage2 = (stage1.groupby(key_cols)
              .aggregate(Sum(value_col, alias_name=value_col)))
    return stage2


def auto_partitions(ds, floor: int = 64, per_file: int = 4) -> int:
    """Coarse-partition count scaled to the input: ~`per_file` coarse
    partitions per input file (file count is the only size signal
    available without executing a lazy Dataset), never below `floor`.
    Keeps per-partition task memory bounded as the corpus grows — a
    FIXED P=64 over 10⁹ users would put ~1.6×10⁷ users' rows into one
    pandas group per task."""
    try:
        n_files = len(ds.input_files())
    except Exception:
        n_files = 0
    return max(floor, per_file * n_files)


def with_coarse_partition(ds, key_col: str, n_partitions: int | None = None,
                          part_col: str = "__upart"):
    """Append ``hash(key) % P`` as an int32 partition column.

    The scale-safe alternative to ``groupby(key)`` when the key is
    high-cardinality (users, documents): every key's rows land in
    exactly ONE coarse partition, so a per-partition vectorized
    resolution is correct, while the shuffle fans into P groups instead
    of one map_groups call per key (at 10⁸+ keys the per-group task
    overhead dominates everything else).

    ``n_partitions=None`` (default) scales P with the input via
    `auto_partitions`; pass an explicit P only when a downstream
    contract needs a fixed fan-out."""
    if n_partitions is None:
        n_partitions = auto_partitions(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if keys.dtype == object:
            h = pd.util.hash_array(keys.astype(object), categorize=False)
        else:
            h = pd.util.hash_array(keys)
        part = (h % np.uint64(n_partitions)).astype(np.int32)
        return batch.append_column(part_col, pa.array(part, type=pa.int32()))

    return ds.map_batches(add_part, batch_format="pyarrow")


def sessionize(ds, user_col: str, ts_col: str, gap_minutes: float = 30.0,
               user_partitions: int | None = None):
    """Stream-shaped sessionization (ray_guide 'Streaming-shaped
    workloads'): partition by user, sort by ts within the user, split
    sessions at gaps > gap_minutes. Returns (user, session_id,
    n_events, start_us, end_us).

    Shuffle key is the COARSE ``hash(user) % P`` partition, not the raw
    user id — at 10⁸ users one map_groups call per user is pure
    scheduling overhead; one call per partition with a vectorized
    within-partition sort + per-user gap split is the scale shape.
    Correctness is unchanged: every user's rows land in exactly one
    partition, and the sort + boundary mask never crosses users."""
    gap_us = int(gap_minutes * 60 * 1e6)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col], kind="mergesort")
        users = g[user_col].to_numpy()
        ts = g[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        same_user = np.concatenate([[False], users[1:] == users[:-1]])
        new_session = ~same_user | (np.concatenate([[0], np.diff(ts)]) > gap_us)
        sid_global = np.cumsum(new_session) - 1
        out = (pd.DataFrame({"user": users, "__g": sid_global, "ts": ts})
               .groupby(["user", "__g"], as_index=False)
               .agg(n_events=("ts", "size"), start_us=("ts", "min"),
                    end_us=("ts", "max")))
        # session_id restarts at 0 per user (global cumsum is monotone
        # within each user's contiguous run, so rank-within-user works)
        out = out.sort_values(["user", "__g"])
        out["session_id"] = out.groupby("user").cumcount()
        return out[["user", "session_id", "n_events", "start_us", "end_us"]]

    return (with_coarse_partition(ds, user_col, user_partitions)
            .groupby("__upart").map_groups(per_partition, batch_format="pandas"))
