"""LLM training-data curation pipeline: the end-to-end chain a
large-scale data team runs over raw documents —

    quality filter (length / punctuation / stopword bands)
      → language-ID + allow-list filter
      → exact dedup (content-hash keep-first)
      → MinHash near-dup dedup (keep-first per cluster)
      → token counting (whitespace + BPE-ish)
      → partitioned parquet out + curation stats

Everything composes the already-oracled operators (stages/text.py,
pipelines/dedup.py); this module only sequences them, so the
correctness story is inherited. Streaming end to end: the only
driver-side materializations are the near-dup PAIR set
(output-bounded) and — ONLY while it fits `dig_driver_budget` — the
exact-dup digest map; past the budget the exact-dedup keep-first
filter runs as a hash-partitioned semi-join (text shuffles once,
nothing dup-rate-sized touches the driver).

The reference has no curation pipeline (it's a validation tool); this
is part of the beyond-reference scope the build brief mandates for the
100-TB engine ("the operations a large-scale training-data pipeline
would need").
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tanml_ray.functions.collect import from_pandas_clean, collect_pylist
from tanml_ray.sources.ingest import read_parquet_clean


def quality_filter_batch(batch: pa.Table, text_col: str, id_col: str,
                         min_tokens: int, max_tokens: int,
                         min_quality: float,
                         allowed_langs: set[str] | None) -> pa.Table:
    """Fused quality + language keep filter over one Arrow batch —
    row-local (no cross-row state), so it is the per-file resumable
    unit of run_resumable_curation as well as stage 1 of
    curate_documents."""
    from tanml_ray.stages.text import langid_of, quality_batch

    q = quality_batch(batch, text_col=text_col, id_col=id_col)
    n_tok = q.column("n_tokens").to_numpy(zero_copy_only=False)
    score = q.column("quality_score").to_numpy(zero_copy_only=False)
    ok = (n_tok >= min_tokens) & (n_tok <= max_tokens) & (score >= min_quality)
    if allowed_langs is not None:
        texts = batch.column(text_col).to_pylist()
        langs = np.array([langid_of(t or "")[0] for t in texts], dtype=object)
        ok &= np.isin(langs, list(allowed_langs))
    return batch.filter(pa.array(ok))


def _content_digest(text: str) -> bytes:
    """16-byte blake2b content digest. 128 bits makes CHANCE collisions
    impossible at 10¹² docs, and blake2b (unlike md5) is collision-
    resistant against ADVERSARIAL input — web documents are untrusted,
    and a crafted md5 collision would silently delete a distinct
    document in the destructive dedup below."""
    import hashlib

    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).digest()


def _digest_part(digs: list[bytes], partitions: int) -> np.ndarray:
    """Partition key from the first 8 bytes of each 16-byte digest."""
    if not digs:
        return np.empty(0, dtype=np.int32)
    h = np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(-1, 2)[:, 0]
    return (h % np.uint64(partitions)).astype(np.int32)


def _keep_first_distributed(filtered, dup_rows, text_col: str, id_col: str,
                            partitions: int = 64):
    """Keep-first exact-dedup filter as a hash-partitioned semi-join:
    corpus rows and (dig, keep_id) dup rows both shuffle to
    hash(digest) % P and the keep decision happens inside each group —
    nothing scales with the corpus (or its dup rate) on the driver.
    One corpus shuffle is the price; the driver-dict path below the
    budget avoids it when the dup set is small."""
    import pyarrow.compute as _pc

    schema = filtered.schema()
    corpus_fields = list(zip(schema.names, schema.types))
    helper = ["__dig", "__keep_id", "__jpart", "__kind"]

    def tag_corpus(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        digs = [_content_digest(t) for t in texts]
        cols = {name: batch.column(name).combine_chunks()
                for name, _ in corpus_fields}
        cols["__dig"] = pa.array(digs, type=pa.binary())
        cols["__keep_id"] = pa.nulls(batch.num_rows, type=pa.int64())
        cols["__jpart"] = pa.array(_digest_part(digs, partitions),
                                   type=pa.int32())
        cols["__kind"] = pa.array(["c"] * batch.num_rows, type=pa.string())
        return pa.table(cols)

    def tag_dups(batch: pa.Table) -> pa.Table:
        digs = batch.column("dig").to_pylist()
        n = batch.num_rows
        cols = {name: pa.nulls(n, type=typ) for name, typ in corpus_fields}
        cols["__dig"] = pa.array(digs, type=pa.binary())
        cols["__keep_id"] = batch.column("keep_id").cast(pa.int64()).combine_chunks()
        cols["__jpart"] = pa.array(_digest_part(digs, partitions),
                                   type=pa.int32())
        cols["__kind"] = pa.array(["d"] * n, type=pa.string())
        return pa.table(cols)

    tagged = (filtered.map_batches(tag_corpus, batch_format="pyarrow")
              .union(dup_rows.map_batches(tag_dups, batch_format="pyarrow")))

    def keep_group(g: pa.Table) -> pa.Table:
        is_dup = _pc.equal(g.column("__kind"), "d")
        dups = g.filter(is_dup)
        corpus = g.filter(_pc.invert(is_dup))
        kmap = dict(zip(dups.column("__dig").to_pylist(),
                        dups.column("__keep_id").to_pylist()))
        ids = corpus.column(id_col).to_numpy(zero_copy_only=False)
        digs = corpus.column("__dig").to_pylist()
        keep = np.fromiter((kmap.get(d, i) == i for d, i in zip(digs, ids)),
                           dtype=bool, count=len(ids))
        return corpus.filter(pa.array(keep)).drop_columns(helper)

    return (tagged.groupby("__jpart")
            .map_groups(keep_group, batch_format="pyarrow"))


def curate_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                     min_tokens: int = 5, max_tokens: int = 100_000,
                     min_quality: float = 0.0,
                     allowed_langs: set[str] | None = None,
                     gopher_rules: bool = False,
                     c4_clean: bool = False,
                     c4_min_kept: int = 1,
                     decontaminate_against=None,
                     contamination_n: int = 5,
                     near_dup_threshold: float = 0.8,
                     out_dir: str | None = None,
                     num_output_files: int = 8,
                     dig_driver_budget: int = 256 << 20,
                     assume_quality_filtered: bool = False) -> tuple[Any, dict[str, Any]]:
    """Returns (curated Dataset, stats dict). Stats account for every
    dropped row by stage — a curation run that can't say where rows
    went is not auditable."""
    import ray.data as rd  # noqa: F401  (documents the dependency)

    from tanml_ray.pipelines.dedup import (
        dedup_keep_list,
        dup_clusters,
        minhash_lsh_pairs,
    )

    stats: dict[str, Any] = {}

    def count_of(d) -> int:
        return d.count()

    n0 = count_of(ds)
    stats["input_rows"] = n0

    # -- 0. optional C4 line-level cleaning (webtext.c4_line_filter,
    # output="rewrite"): line rules rewrite text in place, the document
    # rules ('{' / 'lorem ipsum' / < c4_min_kept surviving lines) drop
    # rows — BEFORE quality so token/quality accounting sees the
    # cleaned text, matching the published C4 ordering.
    if c4_clean:
        from tanml_ray.pipelines.webtext import c4_line_filter

        ds = c4_line_filter(ds, text_col=text_col, id_col=id_col,
                            min_kept=c4_min_kept,
                            output="rewrite").materialize()
        n0c = count_of(ds)
        stats["dropped_c4"] = n0 - n0c
        n0 = n0c

    # -- 1. quality + langid filter (one fused pass; per-row langid is
    # the tokenizer-bound part, vectorized counts come from
    # quality_batch's Arrow kernels)
    if assume_quality_filtered:
        filtered = ds
        n1 = n0
    else:
        def keep_quality(batch: pa.Table) -> pa.Table:
            out = quality_filter_batch(batch, text_col, id_col, min_tokens,
                                       max_tokens, min_quality, allowed_langs)
            if gopher_rules:
                from tanml_ray.pipelines.webtext import gopher_signals_batch

                flags = gopher_signals_batch(out, text_col=text_col,
                                             id_col=id_col)
                out = out.filter(pc.equal(flags.column("gopher_pass"), 1))
            return out

        filtered = ds.map_batches(keep_quality,
                                  batch_format="pyarrow").materialize()
        n1 = count_of(filtered)
    stats["dropped_quality_or_lang"] = n0 - n1

    # -- 1b. optional benchmark decontamination (GPT-3-style n-gram
    # overlap rule, webtext.decontaminate): one streaming keep-filter
    # pass against the broadcast benchmark gram set.
    if decontaminate_against is not None:
        from tanml_ray.pipelines.webtext import decontaminate

        filtered = decontaminate(filtered, decontaminate_against,
                                 n=contamination_n,
                                 text_col=text_col).materialize()
        n1b = count_of(filtered)
        stats["dropped_contaminated"] = n1 - n1b
        n1 = n1b

    # -- 2. exact dedup: keep min-id per content digest. The key is a
    # 128-bit blake2b digest (16 raw bytes — half the shuffle/broadcast
    # footprint of a hexdigest string), NOT a 64-bit hash — at 10¹²
    # docs a 64-bit key suffers thousands of birthday collisions, each
    # of which would DELETE a distinct document (the same hazard the
    # uniqueness(url) check verifies away with string equality; a
    # 128-bit collision-resistant digest makes collisions — chance AND
    # adversarial — impossible instead; see _content_digest).
    # Only the n>1 groups (true duplicates) ever leave the aggregate;
    # the one-row-per-distinct-document bulk is filtered DISTRIBUTED.
    # The keep-first filter itself is SIZE-ADAPTIVE (the same
    # driver/distributed switch uniqueness(url) and the MinHash
    # prefilter use): below `dig_driver_budget` the dup map broadcasts
    # as a driver dict; above it — web corpora commonly run 30-50%
    # exact-dup, so the dup set is NOT output-bounded — the filter runs
    # as a hash-partitioned semi-join with nothing corpus-sized on the
    # driver.
    def dig_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        digs = [_content_digest(t) for t in texts]
        df = pd.DataFrame({"dig": digs, "keep_id": ids})
        g = df.groupby("dig", as_index=False).agg(keep_id=("keep_id", "min"),
                                                  n=("keep_id", "size"))
        return from_pandas_clean(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    agg = (filtered.map_batches(dig_partial, batch_format="pyarrow")
           .groupby("dig")
           .aggregate(Min("keep_id", alias_name="keep_id"),
                      Sum("n", alias_name="n")))
    dup_rows = agg.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), 1)),
        batch_format="pyarrow").materialize()
    n_dup_groups = dup_rows.count()
    if n_dup_groups == 0:
        deduped = filtered
    elif dup_rows.size_bytes() <= dig_driver_budget:
        dup_groups = {r["dig"]: r["keep_id"] for r in collect_pylist(dup_rows)}
        import ray

        ref = ray.put(dup_groups)

        def keep_first(batch: pa.Table) -> pa.Table:
            import ray as _ray

            groups = _ray.get(ref)
            texts = batch.column(text_col).to_pylist()
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (groups.get(_content_digest(t), vid) == vid
                 for t, vid in zip(texts, ids)),
                dtype=bool, count=len(ids))
            return batch.filter(pa.array(keep))

        deduped = filtered.map_batches(keep_first, batch_format="pyarrow").materialize()
    else:
        deduped = _keep_first_distributed(filtered, dup_rows, text_col,
                                          id_col).materialize()
    n2 = count_of(deduped)
    stats["dropped_exact_dup"] = n1 - n2

    # -- 3. near-dup dedup: MinHash pairs → clusters → keep-first.
    # SIZE-ADAPTIVE like stage 2: the pair set is produced as a Dataset
    # and only collected to the driver while it fits `dig_driver_budget`
    # (~24 B/pair); past the budget — heavy-boilerplate crawls produce
    # corpus-scaled pair sets — clustering runs as distributed min-label
    # propagation and the keep-first filter as a partitioned anti-join,
    # with nothing pair- or drop-set-sized on the driver.
    pairs_ds = minhash_lsh_pairs(deduped, text_col=text_col, id_col=id_col,
                                 threshold=near_dup_threshold,
                                 as_dataset=True).materialize()
    n_pairs = pairs_ds.count()
    stats["near_dup_pairs"] = n_pairs
    if n_pairs == 0:
        curated = deduped
        stats["near_dup_clusters"] = 0
    elif n_pairs * 24 <= dig_driver_budget:
        pairs = pa.Table.from_pylist(collect_pylist(pairs_ds))
        curated = dedup_keep_list(deduped, pairs, id_col=id_col).materialize()
        stats["near_dup_clusters"] = len({r for r in dup_clusters(pairs).values()})
    else:
        from tanml_ray.pipelines.dedup import (
            drop_keys_from_labels,
            dup_clusters_distributed,
        )
        from tanml_ray.pipelines.join import partitioned_anti_join

        labels = dup_clusters_distributed(pairs_ds, collect=False).materialize()
        curated = partitioned_anti_join(
            deduped, drop_keys_from_labels(labels, id_col), id_col).materialize()
        stats["near_dup_clusters"] = int(labels.groupby("root").count().count())
    n3 = count_of(curated)
    stats["dropped_near_dup"] = n2 - n3

    # -- 4. token accounting over the surviving corpus
    def token_partial(batch: pa.Table) -> pa.Table:
        ws = pc.sum(pc.count_substring_regex(batch.column(text_col), r"\S+"))
        return pa.table({"rows": pa.array([batch.num_rows], type=pa.int64()),
                         "ws_tokens": pa.array([ws.as_py() or 0], type=pa.int64())})

    rows = tokens = 0
    for r in collect_pylist(curated.map_batches(token_partial,
                                                batch_format="pyarrow")):
        rows += r["rows"]
        tokens += r["ws_tokens"]
    stats["output_rows"] = rows
    stats["output_ws_tokens"] = tokens
    assert rows == n3
    assert (stats["input_rows"] - stats["output_rows"]
            == stats["dropped_quality_or_lang"]
            + stats.get("dropped_c4", 0)
            + stats.get("dropped_contaminated", 0)
            + stats["dropped_exact_dup"]
            + stats["dropped_near_dup"])

    if out_dir:
        curated.repartition(num_output_files).write_parquet(out_dir)
        stats["out_dir"] = out_dir
    return curated, stats


def shuffle_shards(ds, id_col: str = "doc_id", n_shards: int = 8,
                   seed: int = 42, shard_partitions: int | None = None):
    """Deterministic seeded GLOBAL corpus shuffle into training shards —
    the export step before tokenized-data writing (every epoch-0 data
    order in GPT-3/LLaMA-style training comes from exactly this op):

        key   = md5-lower-64(f"{id}:{seed}")   (SQL-reproducible —
                matches DuckDB md5_number_lower(id || ':' || seed))
        shard = key % n_shards
        pos   = rank of (key, id) within the shard

    One shuffle keyed by shard; position assignment is a vectorized
    argsort INSIDE each shard's partition (each shard lands in exactly
    one map_groups call — size n_shards so a shard fits a task; for
    bigger corpora raise n_shards, the standard shard-count knob, or
    sub-bucket by key prefix). No RNG state: any partitioning, any
    retry, any cluster size yields byte-identical (id, shard, pos).

    Returns a Dataset of (id_col, shard:int64, pos:int64).
    """
    import pyarrow as pa

    from tanml_ray.pipelines.dedup import md5_token_hashes

    def key_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keys = md5_token_hashes([f"{int(i)}:{seed}" for i in ids])
        return pa.table({
            id_col: pa.array(ids.astype(np.int64), type=pa.int64()),
            "shard": pa.array((keys % np.uint64(n_shards)).astype(np.int64),
                              type=pa.int64()),
            # bit-exact uint64 key stored reinterpreted as int64
            "__key": pa.array(keys.view(np.int64), type=pa.int64())})

    def rank_shard(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        keys = g["__key"].to_numpy().view(np.uint64)
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, keys))
        out = pd.DataFrame({
            id_col: ids[order],
            "shard": g["shard"].to_numpy()[order],
            "pos": np.arange(len(order), dtype=np.int64)})
        return out

    return (ds.map_batches(key_batch, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(rank_shard, batch_format="pandas"))


def run_resumable_curation(input_dir: str, out_dir: str,
                           text_col: str = "text", id_col: str = "doc_id",
                           min_tokens: int = 5, max_tokens: int = 100_000,
                           min_quality: float = 0.0,
                           allowed_langs: set[str] | None = None,
                           near_dup_threshold: float = 0.8,
                           num_output_files: int = 8,
                           dig_driver_budget: int = 256 << 20,
                           wave_size: int = 16) -> dict[str, Any]:
    """Resumable curation over a directory of parquet shards, mirroring
    run_resumable_validation's checkpoint contract (state/checkpoint.py):

      - stage 1 (quality + langid filter) is ROW-LOCAL, so the input
        file is its natural resume unit: each file's survivors are
        written to ``out_dir/stage1/<pid>.parquet`` and marked done in
        the lineage-guarded manifest — a rerun skips finished files
        (at 100 TB this is the dominant text-processing cost).
      - stage 2 (global exact + near dedup, token accounting, final
        partitioned write) is a SHUFFLE and has no mid-stage checkpoint
        (same documented limitation as validation's global uniqueness);
        it recomputes from the stage-1 outputs, never from raw input.

    Stage-1 files process as one Ray task per file (read → vectorized
    filter → write; no shuffle, driver only coordinates the wave and
    the manifest). Returns the curation stats dict plus
    lineage/resume accounting.
    """
    import os

    import ray
    import ray.data as rd

    from tanml_ray.state.checkpoint import Manifest, lineage_id

    files = sorted(os.path.join(input_dir, f) for f in os.listdir(input_dir)
                   if f.endswith(".parquet"))
    if not files:
        raise ValueError(f"no parquet files under {input_dir!r}")
    config = {"text_col": text_col, "id_col": id_col,
              "min_tokens": min_tokens, "max_tokens": max_tokens,
              "min_quality": min_quality,
              "allowed_langs": sorted(allowed_langs) if allowed_langs else None,
              "stage": "curate_v1"}
    lid = lineage_id(files, config)
    stage1_dir = os.path.join(out_dir, "stage1")
    os.makedirs(stage1_dir, exist_ok=True)
    manifest = Manifest.load_or_create(os.path.join(out_dir, "manifest.json"),
                                       lid)

    @ray.remote
    def filter_file(path: str, dest: str) -> tuple[int, int]:
        import pyarrow.parquet as _pq

        t = _pq.read_table(path)
        kept = quality_filter_batch(t, text_col, id_col, min_tokens,
                                    max_tokens, min_quality, allowed_langs)
        tmp = dest + ".tmp"
        _pq.write_table(kept, tmp)
        os.replace(tmp, dest)
        return t.num_rows, kept.num_rows

    todo = [f for f in files if not manifest.done(os.path.basename(f))]
    processed = 0
    for w in range(0, len(todo), wave_size):
        wave = todo[w:w + wave_size]
        futs = {os.path.basename(f): filter_file.remote(
            f, os.path.join(stage1_dir, os.path.basename(f))) for f in wave}
        for pid, fut in futs.items():
            rows_in, rows_kept = ray.get(fut)
            manifest.mark_done(pid, rows_in=rows_in, rows_kept=rows_kept)
            processed += 1
        manifest.save()

    rows_in = sum(p.get("rows_in", 0) for p in manifest.partitions.values())
    rows_kept = sum(p.get("rows_kept", 0) for p in manifest.partitions.values())

    stage1_files = [os.path.join(stage1_dir, os.path.basename(f))
                    for f in files]
    # idempotent final write: Ray's write_parquet APPENDS into an
    # existing directory, so a rerun would double the output — write to
    # a tmp dir and swap it in atomically once stage 2 completes
    import shutil

    final_dir = os.path.join(out_dir, "curated")
    tmp_dir = final_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    curated, stats = curate_documents(
        read_parquet_clean(stage1_files),
        text_col=text_col, id_col=id_col,
        near_dup_threshold=near_dup_threshold,
        out_dir=tmp_dir,
        num_output_files=num_output_files,
        dig_driver_budget=dig_driver_budget,
        assume_quality_filtered=True)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)
    stats["out_dir"] = final_dir
    stats["input_rows"] = rows_in
    stats["dropped_quality_or_lang"] = rows_in - rows_kept
    stats["lineage_id"] = lid
    stats["partitions"] = len(files)
    stats["processed_partitions"] = processed
    stats["skipped_partitions"] = len(files) - len(todo)
    return stats


def range_partition_boundaries(ds, col: str, n_shards: int) -> list[int]:
    """Discrete range-partition boundaries for an int64 grid column:
    the (ceil(q·n)−1)-th order statistics at q = i/n_shards,
    i = 1..n_shards−1 — exactly DuckDB's ``quantile_disc``, so the
    split is SQL-verifiable. Computed with a combiner-first
    value-counts reduction (per-batch partials, one tiny (value, n)
    shuffle) and a driver-side cumulative walk over the value GRID —
    never the rows. Precondition (shared with the exact-quantile
    family): the column's distinct-value grid is driver-bounded;
    continuous columns should go through the t-digest path instead."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vc = (batch.column(col).combine_chunks().drop_null()
              .value_counts())
        return pa.table({col: vc.field("values"),
                         "__n": vc.field("counts")})

    grid = sorted(
        (r[col], r["__n"]) for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(col).aggregate(Sum("__n", alias_name="__n"))))
    total = sum(n for _, n in grid)
    bounds: list[int] = []
    for i in range(1, n_shards):
        want = -(-(i * total) // n_shards)  # ceil(q*n) as exact ints
        seen = 0
        for v, n in grid:
            seen += n
            if seen >= want:
                bounds.append(int(v))
                break
    return bounds


def range_export(ds, col: str, n_shards: int, out_dir: str):
    """Range-partitioned SORTED export — the write layout that makes
    downstream range predicates prune at the file level (parquet
    row-group min/max stats + hive ``shard=`` directories), the
    complement of the hash layout ``shuffle_shards`` writes.

      shard(v) = #{boundaries strictly below v}   (ties stay left)

    One global sort is the honest price of a sorted layout; the
    boundary computation itself never shuffles rows (see
    range_partition_boundaries). Returns the boundaries used."""
    bounds = range_partition_boundaries(ds, col, n_shards)
    barr = np.asarray(bounds, dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        shard = np.searchsorted(barr, v, side="left").astype(np.int64)
        return batch.append_column("shard", pa.array(shard,
                                                     type=pa.int64()))

    (ds.map_batches(assign, batch_format="pyarrow")
     .sort(col)
     .write_parquet(out_dir, partition_cols=["shard"]))
    return bounds
