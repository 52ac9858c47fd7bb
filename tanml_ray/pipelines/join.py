"""Joins: broadcast hash join (small side) and partitioned hash join
(both sides large).

The reference has no relational joins (SURVEY §2.4 — only hash-set
semi-joins); a standalone engine needs them. Two Ray-Data-first
strategies, chosen by the caller (a future planner can pick by size):

  broadcast_join   — build side ray.put once, probe side streams
                     through map_batches doing a pandas merge per
                     batch. No shuffle. Right whenever one side fits
                     in worker memory (dimension tables).

  partitioned_join — the guide's explicit pattern: add
                     bucket = hash(key) % B to BOTH sides, tag each
                     side, union, groupby(bucket), and merge the two
                     sides within each bucket group. One shuffle of
                     each side, no row ever compared across buckets.
                     B is the skew knob: hot keys spread over at most
                     one bucket, so pick B ≫ reducers and salt
                     upstream if a single key dominates (see
                     stages/shuffle.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE_COL = "__join_side"
_BUCKET_COL = "__join_bucket"


def broadcast_join(large_ds, small_table: pa.Table, key: str,
                   how: str = "inner"):
    """small_table is materialized driver-side (a dimension table),
    shipped once via ray.put; each probe batch joins locally with the
    Arrow hash-join kernel — the probe path stays zero-copy Arrow end
    to end (no pandas conversion). Overlapping non-key columns get
    pandas-style _x/_y suffixes."""
    import ray

    # Only inner/left are well-defined per probe batch: right/full
    # outer would emit one unmatched-small-side copy PER BATCH (and
    # null-padded rows for small rows matched in other batches). Those
    # modes need a global view — use partitioned_join.
    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_join supports how='inner'|'left', got {how!r}; "
            "use partitioned_join for right/full outer semantics")
    join_type = {"inner": "inner", "left": "left outer"}[how]
    ref = ray.put(small_table.combine_chunks())

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        small = _ray.get(ref)
        return batch.join(small, keys=key, join_type=join_type,
                          left_suffix="_x", right_suffix="_y")

    return large_ds.map_batches(probe, batch_format="pyarrow")


def auto_join(left_ds, right_ds, key: str, how: str = "inner",
              broadcast_budget: int = 64 << 20, buckets: int = 32):
    """Size-based join strategy selection (the planner the module
    docstring promises): if either side's materialized size fits
    `broadcast_budget`, that side ships once via ray.put and the other
    streams through broadcast_join (no shuffle); otherwise both sides
    exchange through partitioned_join. Broadcasting the RIGHT side
    preserves left/inner semantics directly; a small LEFT side only
    swaps for `inner` (symmetric) — an outer-preserving small left
    still routes to the partitioned path. Column semantics match the
    underlying joins (_x/_y suffixes on overlapping non-key columns,
    with _x = left side in every path)."""
    from tanml_ray.functions.collect import collect_table

    r_small = right_ds.materialize()
    if r_small.size_bytes() <= broadcast_budget:
        return broadcast_join(left_ds, collect_table(r_small), key, how=how)
    l_small = left_ds.materialize()
    if how == "inner" and l_small.size_bytes() <= broadcast_budget:
        # swap sides, then restore _x/_y orientation (left == _x) — but
        # ONLY on columns the join actually suffixed (overlapping
        # non-key names on both sides); a pre-existing user column that
        # happens to end in _x/_y must pass through untouched
        overlap = ((set(l_small.schema().names)
                    & set(r_small.schema().names)) - {key})
        swapped = {f"{c}_x": f"{c}_y" for c in overlap}
        swapped.update({f"{c}_y": f"{c}_x" for c in overlap})
        out = broadcast_join(r_small, collect_table(l_small), key, how="inner")

        def unswap(t: pa.Table) -> pa.Table:
            return t.rename_columns([swapped.get(n, n)
                                     for n in t.column_names])

        return out.map_batches(unswap, batch_format="pyarrow")
    return partitioned_join(l_small, r_small, key, buckets=buckets, how=how)


def partitioned_join(left_ds, right_ds, key: str, buckets: int = 32,
                     how: str = "inner"):
    """Explicit partitioned hash join of two Datasets on `key`.

    Returns a Dataset of merged rows (pandas-merge column semantics:
    overlapping non-key columns suffixed _x/_y).
    """
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    all_fields: dict[str, pa.DataType] = {}
    for names, types in ((left_schema.names, left_schema.types),
                         (right_schema.names, right_schema.types)):
        for n, t in zip(names, types):
            all_fields.setdefault(n, t)

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            # Hash on a dtype-STABLE view of the key: a null-bearing
            # int64 column round-trips through to_numpy as float64, so
            # the same key would hash to different buckets depending on
            # which SIDE carries nulls (rows silently unmatched). Null
            # keys never match anyway — fill them with a sentinel so
            # integer keys hash as int64 on both sides.
            arr = batch.column(key).combine_chunks()
            if pa.types.is_integer(arr.type):
                kn = (arr.fill_null(0).cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
                h = pd.util.hash_array(kn)
            else:
                kn = arr.to_numpy(zero_copy_only=False)
                if kn.dtype == object:
                    h = pd.util.hash_array(kn.astype(object),
                                           categorize=False)
                else:
                    h = pd.util.hash_array(kn)
            b = (h % np.uint64(buckets)).astype(np.int32)
            # pad to the unified schema so union() sees one schema
            arrays, names = [], []
            for n, t in all_fields.items():
                names.append(n)
                if n in batch.column_names:
                    arrays.append(batch.column(n))
                else:
                    arrays.append(pa.nulls(batch.num_rows, type=t))
            names += [_BUCKET_COL, _SIDE_COL]
            arrays += [pa.array(b, type=pa.int32()),
                       pa.array([side] * batch.num_rows, type=pa.string())]
            return pa.Table.from_arrays(
                [a if isinstance(a, pa.Array) else a.combine_chunks()
                 for a in arrays], names=names)
        return fn

    left_t = left_ds.map_batches(tag("l"), batch_format="pyarrow")
    right_t = right_ds.map_batches(tag("r"), batch_format="pyarrow")
    both = left_t.union(right_t)

    # Per-bucket merge runs in ARROW (pa.Table.join), not pandas: the
    # pandas round-trip promoted null-padded int64 columns to float64
    # (silently corrupting 64-bit hash ids > 2^53) and its empty-bucket
    # path emitted object-dtype frames (block schema drift). Arrow join
    # reproduces pandas-merge column naming/order (_x/_y on collisions,
    # left cols then right non-key cols) with exact dtypes. One
    # intentional difference: null join keys never match (pandas merge
    # matches NaN keys); every engine call site joins on non-null keys.
    _ARROW_HOW = {"inner": "inner", "left": "left outer",
                  "outer": "full outer"}

    def merge_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column(_SIDE_COL)
        l = g.filter(pc.equal(side, "l")).select(left_cols)
        r = g.filter(pc.equal(side, "r")).select(right_cols)
        return l.join(r, keys=key, join_type=_ARROW_HOW[how],
                      left_suffix="_x", right_suffix="_y")

    return both.groupby(_BUCKET_COL).map_groups(merge_bucket,
                                                batch_format="pyarrow")


def asof_join(left_ds, right_ds, key: str, ts_col: str,
              key_partitions: int = 64):
    """As-of (backward) join: for each left row, the greatest right
    ts <= left ts within the same key (ray_guide: sort both sides by
    (key, ts) within buckets + pd.merge_asof per group).

    Tag sides, union, groupby the COARSE ``hash(key) % P`` partition
    (NOT the raw key — at 10⁸ keys one pandas call per key is pure
    scheduling overhead), then ONE vectorized
    ``pd.merge_asof(..., by=key)`` per partition handles every key in
    it. Unmatched left rows are dropped (inner-asof). Right columns
    come back prefixed `r_`, including the matched timestamp as `r_ts`.
    """
    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            kn = batch.column(key).to_numpy(zero_copy_only=False)
            if kn.dtype == object:
                h = pd.util.hash_array(kn.astype(object), categorize=False)
            else:
                h = pd.util.hash_array(kn)
            kpart = (h % np.uint64(key_partitions)).astype(np.int32)
            cols = {key: batch.column(key).combine_chunks(),
                    "__kpart": pa.array(kpart, type=pa.int32()),
                    "__ts": batch.column(ts_col).combine_chunks(),
                    _SIDE_COL: pa.array([side] * batch.num_rows, type=pa.string())}
            if side == "r":
                cols["r_ts"] = batch.column(ts_col).combine_chunks()
            for n in batch.column_names:
                if n not in (key, ts_col):
                    cols[("r_" if side == "r" else "l_") + n] = \
                        batch.column(n).combine_chunks()
            return pa.table(cols)
        return fn

    left_t = left_ds.map_batches(tag("l"), batch_format="pyarrow")
    right_t = right_ds.map_batches(tag("r"), batch_format="pyarrow")

    l_schema, r_schema = left_t.schema(), right_t.schema()
    fields: dict[str, "pa.DataType"] = {}
    for names, types in ((l_schema.names, l_schema.types),
                         (r_schema.names, r_schema.types)):
        for n, t in zip(names, types):
            fields.setdefault(n, t)

    def pad(batch: pa.Table) -> pa.Table:
        arrays, names = [], []
        for n, t in fields.items():
            names.append(n)
            if n in batch.column_names:
                c = batch.column(n)
                arrays.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
            else:
                arrays.append(pa.nulls(batch.num_rows, type=t))
        return pa.Table.from_arrays(arrays, names=names)

    both = (left_t.map_batches(pad, batch_format="pyarrow")
            .union(right_t.map_batches(pad, batch_format="pyarrow")))

    l_cols = [n for n in fields if n.startswith("l_")]
    r_cols = ["r_ts"] + [n for n in fields
                         if n.startswith("r_") and n != "r_ts"]

    # merge_asof is inherently pandas, but the group arrives as ARROW
    # and converts with a nullable-Int types_mapper: the default
    # conversion would promote null-padded int columns to float64
    # (corrupting 64-bit ids > 2^53 — same hazard partitioned_join had)
    _NULLABLE_INT = {pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype(),
                     pa.int16(): pd.Int16Dtype(), pa.int8(): pd.Int8Dtype()}

    def per_partition(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas(types_mapper=_NULLABLE_INT.get)
        l = (df[df[_SIDE_COL] == "l"][[key, "__ts", *l_cols]]
             .sort_values("__ts", kind="mergesort"))
        r = (df[df[_SIDE_COL] == "r"][[key, "__ts", *r_cols]]
             .sort_values("__ts", kind="mergesort"))
        if l.empty or r.empty:
            return pd.DataFrame()
        m = pd.merge_asof(l, r, on="__ts", by=key, direction="backward")
        m = m[m["r_ts"].notna()]
        return m.rename(columns={"__ts": ts_col})

    return both.groupby("__kpart").map_groups(per_partition,
                                              batch_format="pyarrow")


def range_join_count(left_ds, right_ds, left_day_col: str,
                     right_day_col: str, left_key_col: str,
                     window_days: int,
                     out_count_col: str = "n",
                     salt: int = 1):
    """Distributed RANGE (band) join, aggregated: for every left row,
    count right rows whose day ∈ [left_day, left_day + window_days).
    LEFT-join semantics — every left key appears, zero-count included.

    Shape (no all-pairs comparison, no driver state): day axis buckets
    at width = window_days, so each left window overlaps AT MOST TWO
    buckets; left rows replicate to their ≤2 buckets, right rows route
    to exactly one, and within each bucket group the count is two
    vectorized searchsorted calls against the bucket's sorted right
    days (right rows outside the bucket are in other groups, which
    clips each partial count to the bucket automatically — partials
    then Sum per left key). Total shuffle volume: ≤2 rows per left row
    + 1 per right row, never a joined row set.

    Skew: all rows of one time bucket land in one group — a crawl
    hotspot week can dominate. `salt` > 1 splits each bucket into
    `salt` sub-groups (right rows route to hash(day-ordinal) % salt,
    left rows replicate to ALL sub-groups; partial counts still Sum
    exactly), spreading a hot bucket over `salt` tasks at the cost of
    salt× left replication."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    B = int(window_days)
    if B < 1:
        raise ValueError("window_days must be ≥ 1")
    S = int(salt)
    if S < 1:
        raise ValueError("salt must be ≥ 1")

    def _days(col: "pa.ChunkedArray") -> np.ndarray:
        t = col.type
        if pa.types.is_timestamp(t):
            per_day = {"s": 86_400, "ms": 86_400_000,
                       "us": 86_400_000_000, "ns": 86_400_000_000_000}[t.unit]
            return (_pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
                    // per_day)
        return _pc.cast(_pc.cast(col, pa.date32()), pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    def left_rows(batch: pa.Table) -> pa.Table:
        start = _days(batch.column(left_day_col))
        keys = batch.column(left_key_col).to_numpy(zero_copy_only=False)
        b0 = start // B
        b1 = (start + B - 1) // B          # window end-1 bucket
        two = b1 != b0
        bkt = np.concatenate([b0, b1[two]])
        k = np.concatenate([keys, keys[two]])
        s = np.concatenate([start, start[two]])
        # replicate to every salt sub-group of each bucket
        n = len(bkt)
        grp = (np.repeat(bkt * S, S)
               + np.tile(np.arange(S, dtype=np.int64), n))
        return pa.table({"bucket": pa.array(grp, type=pa.int64()),
                         "kind": pa.array(["l"] * (n * S), type=pa.string()),
                         "key": pa.array(np.repeat(k, S), type=pa.int64()),
                         "day": pa.array(np.repeat(s, S), type=pa.int64())})

    def right_rows(batch: pa.Table) -> pa.Table:
        d = _days(batch.column(right_day_col))
        # sub-group assignment is load-balancing only: ANY assignment
        # yields the same summed counts, so a simple round-robin within
        # the batch is deterministic enough (task retries replay the
        # same batch)
        sub = np.arange(len(d), dtype=np.int64) % S
        return pa.table({"bucket": pa.array((d // B) * S + sub, type=pa.int64()),
                         "kind": pa.array(["r"] * len(d), type=pa.string()),
                         "key": pa.array(np.zeros(len(d), dtype=np.int64)),
                         "day": pa.array(d, type=pa.int64())})

    tagged = (left_ds.map_batches(left_rows, batch_format="pyarrow")
              .union(right_ds.map_batches(right_rows, batch_format="pyarrow")))

    def count_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["kind"] == "l"]
        if left.empty:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        rdays = np.sort(g[g["kind"] == "r"]["day"].to_numpy(dtype=np.int64))
        start = left["day"].to_numpy(dtype=np.int64)
        n = (np.searchsorted(rdays, start + B, side="left")
             - np.searchsorted(rdays, start, side="left"))
        return pa.table({"key": pa.array(left["key"].to_numpy(dtype=np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    out = (tagged.groupby("bucket").map_groups(count_group,
                                               batch_format="pandas")
           .groupby("key").aggregate(Sum("n", alias_name=out_count_col)))
    return out.map_batches(
        lambda t: pa.table({left_key_col: t.column("key").combine_chunks(),
                            out_count_col: t.column(out_count_col)
                            .cast(pa.int64()).combine_chunks()}),
        batch_format="pyarrow")


def partitioned_anti_join(ds, keys_ds, key_col: str,
                          partitions: int = 64):
    """Fully-distributed anti-join on an int64 key: keep ds rows whose
    `key_col` does NOT appear in `keys_ds` (a Dataset with an int64
    `key_col` column). Both sides hash-partition by key and the
    membership test happens inside each group — NOTHING key-set-sized
    ever touches the driver, unlike bloom_semi_join (driver key array)
    or a ray.put drop-set broadcast. This is the 10¹²-row shape for
    key sets that scale with the corpus (e.g. near-dup drop lists at
    30%+ dup rates). One shuffle of ds is the price; callers with a
    provably bounded key set should prefer the broadcast path."""
    schema = ds.schema()
    corpus_fields = list(zip(schema.names, schema.types))
    helper = ["__jpart", "__kind"]

    def _part(ids: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(ids.astype(np.int64))
                % np.uint64(partitions)).astype(np.int32)

    def tag_corpus(batch: pa.Table) -> pa.Table:
        ids = batch.column(key_col).to_numpy(zero_copy_only=False)
        cols = {name: batch.column(name).combine_chunks()
                for name, _ in corpus_fields}
        cols["__jpart"] = pa.array(_part(ids), type=pa.int32())
        cols["__kind"] = pa.array(["c"] * batch.num_rows, type=pa.string())
        return pa.table(cols)

    def tag_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column(key_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        cols = {name: (pa.array(ids, type=pa.int64()) if name == key_col
                       else pa.nulls(n, type=typ))
                for name, typ in corpus_fields}
        cols["__jpart"] = pa.array(_part(ids), type=pa.int32())
        cols["__kind"] = pa.array(["k"] * n, type=pa.string())
        return pa.table(cols)

    tagged = (ds.map_batches(tag_corpus, batch_format="pyarrow")
              .union(keys_ds.map_batches(tag_keys, batch_format="pyarrow")))

    def anti_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        is_key = _pc.equal(g.column("__kind"), "k")
        drop = np.unique(g.filter(is_key).column(key_col)
                         .to_numpy(zero_copy_only=False).astype(np.int64))
        corpus = g.filter(_pc.invert(is_key))
        ids = corpus.column(key_col).to_numpy(zero_copy_only=False)
        if drop.size:
            pos = np.searchsorted(drop, ids)
            pos[pos == len(drop)] = 0
            keep = drop[pos] != ids
            corpus = corpus.filter(pa.array(keep))
        return corpus.drop_columns(helper)

    return tagged.groupby("__jpart").map_groups(anti_group,
                                                batch_format="pyarrow")


def bloom_semi_join(large_ds, key_values: "np.ndarray", key: str,
                    fp_rate: float = 0.01, exact: bool = True,
                    anti: bool = False):
    """Semi-join: keep large_ds rows whose key ∈ key_values
    (anti=True inverts: keep rows whose key ∉ key_values — the bloom
    then only ACCELERATES the exact check, since bloom "no" is a
    definite non-member).

    A Bloom filter of the key set broadcasts instead of the set itself
    (the at-scale variant of the ray_guide semi-join pattern); with
    exact=True a sorted-array membership check runs ONLY on the bloom
    survivors, restoring exactness while the bloom has already dropped
    ~(1−fp) of the non-matching rows cheaply.
    """
    import ray

    from tanml_ray.kernels.bloom import BloomFilter

    if anti and not exact:
        # Bloom membership is one-sided: "no" is definite, "yes" is not.
        # Inverting the raw bloom mask would DROP genuine non-members on
        # false positives — the anti-join always runs the exact verify
        # on bloom survivors (ADVICE r1).
        exact = True

    bf = BloomFilter(capacity=len(key_values), fp_rate=fp_rate)
    bf.add(np.asarray(key_values))
    exact_sorted = np.sort(np.asarray(key_values)) if exact else None
    ref = ray.put((bf.to_state(), exact_sorted))

    def keep(batch: pa.Table) -> pa.Table:
        import ray as _ray

        state, exact_arr = _ray.get(ref)
        f = BloomFilter.from_state(state)
        vals = batch.column(key).to_numpy(zero_copy_only=False)
        mask = f.contains(vals)
        if exact_arr is not None and mask.any():
            surv = vals[mask]
            pos = np.searchsorted(exact_arr, surv)
            pos[pos == len(exact_arr)] = 0
            mask[np.nonzero(mask)[0]] = exact_arr[pos] == surv
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return large_ds.map_batches(keep, batch_format="pyarrow")


def skew_join(left_ds, right_ds, key: str, buckets: int = 32,
              hot_k: int = 8, hot_min_count: int | None = None,
              how: str = "inner"):
    """Skew-aware hash join: hot keys bypass the shuffle.

    A partitioned hash join places every row of a key in ONE bucket,
    so one web-scale hot key (a bot user, the empty domain, a default
    id) turns the exchange into a single straggler task. This variant
    splits the work by observed key frequency:

      1. Exact left-key frequencies, combiner-first: per-batch
         ``value_counts`` partials shuffle (key, n) pairs only —
         volume is distinct-keys-per-batch, never rows.
      2. The top ``hot_k`` keys by count (count desc, key asc — a
         deterministic tie-break) form the hot set; with
         ``hot_min_count`` set, only keys at or above it qualify, so
         a uniform corpus degrades gracefully to a pure partitioned
         join with an empty hot path.
      3. Hot-key rows take a BROADCAST path: the right side's hot
         rows (bounded: ≤ hot_k keys' worth) ship once via ray.put
         and every left batch joins locally — no shuffle, perfectly
         parallel regardless of how large the hot key is.
      4. Cold rows from both sides take the ordinary
         ``partitioned_join``, whose per-bucket load is now bounded
         by the hot threshold.

    Inner join only: the hot/cold split sends a key's rows down
    exactly one path, which preserves inner semantics trivially; outer
    semantics would need cross-path bookkeeping for never-matched
    right rows. Null keys go cold and (as everywhere in this module's
    Arrow joins) never match. Column semantics match partitioned_join
    (_x/_y suffixes on overlapping non-key columns).

    The left side is consumed twice (hot filter + cold filter); with a
    parquet-backed Dataset both passes stream from storage with column
    pruning, which at 100 TB beats materializing a split. Reference
    has no joins at all (SURVEY §2.4); the skew treatment follows the
    standard salting/broadcast literature.
    """
    from ray.data.aggregate import Sum

    if how != "inner":
        raise ValueError(
            f"skew_join supports how='inner' only, got {how!r}; "
            "use partitioned_join for outer semantics")

    key_type = dict(zip(left_ds.schema().names,
                        left_ds.schema().types))[key]

    def partial_counts(batch: pa.Table) -> pa.Table:
        # drop_null: null keys never match, so they must not occupy a
        # hot slot (they always route cold, per the docstring)
        vc = (batch.column(key).combine_chunks().drop_null()
              .value_counts())
        return pa.table({key: vc.field("values"),
                         "__n": vc.field("counts")})

    counts = (left_ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby(key).aggregate(Sum("__n", alias_name="__n")))
    top = (counts.sort(["__n", key], descending=[True, False])
           .limit(hot_k).take_all())
    if hot_min_count is not None:
        top = [r for r in top if r["__n"] >= hot_min_count]
    hot_keys = pa.array([r[key] for r in top], type=key_type)

    def side(hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.is_in(batch.column(key), value_set=hot_keys)
            if not hot:
                mask = _pc.and_kleene(
                    _pc.invert(mask),
                    _pc.true_unless_null(batch.column(key)))
                mask = _pc.fill_null(mask, True)  # null keys go cold
            else:
                mask = _pc.fill_null(mask, False)
            return batch.filter(mask)
        return fn

    # Unified output column order so the two paths union cleanly.
    l_cols = list(left_ds.schema().names)
    r_cols = list(right_ds.schema().names)
    overlap = (set(l_cols) & set(r_cols)) - {key}
    out_cols = ([f"{c}_x" if c in overlap else c for c in l_cols]
                + [f"{c}_y" if c in overlap else c
                   for c in r_cols if c != key])

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(out_cols)

    cold = partitioned_join(
        left_ds.map_batches(side(False), batch_format="pyarrow"),
        right_ds.map_batches(side(False), batch_format="pyarrow"),
        key, buckets=buckets, how="inner",
    ).map_batches(reorder, batch_format="pyarrow")

    if len(hot_keys) == 0:
        return cold

    from tanml_ray.functions.collect import collect_table

    hot_right = collect_table(
        right_ds.map_batches(side(True), batch_format="pyarrow"))
    hot = broadcast_join(
        left_ds.map_batches(side(True), batch_format="pyarrow"),
        hot_right, key, how="inner",
    ).map_batches(reorder, batch_format="pyarrow")
    return cold.union(hot)
