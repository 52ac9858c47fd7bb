"""End-to-end pretraining-data export: curate → seeded shuffle →
packed-token accounting → sharded parquet + manifest.

The one-command composition of the engine's LLM-data stages (each
individually oracle-verified): C4/Gopher/quality/langid filtering and
near-dup removal (pipelines/curate.curate_documents), the seeded
deterministic global shuffle of shuffle_shards (md5(id:seed) — bit
reproducible on any cluster size, any retry), per-context-window token
accounting (webtext.token_budget_stats), and a hive `shard=` parquet
layout whose within-file order IS the shuffle order — so a training
loader can stream shard k sequentially and see the exact epoch-0
sample order the seed defines.

Every count in the manifest is re-derivable from the written files;
nothing corpus-sized touches the driver (curate stats are scalars,
token stats are group-bounded, the manifest's per-shard rows come from
a combiner count).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa


def pretrain_export(ds, out_dir: str, text_col: str = "text",
                    id_col: str = "doc_id", n_shards: int = 8,
                    seed: int = 42, ctx: int = 512,
                    min_tokens: int = 5,
                    near_dup_threshold: float = 0.8,
                    c4_clean: bool = False,
                    allowed_langs: set[str] | None = None,
                    group_col: str = "lang") -> dict[str, Any]:
    """Returns the manifest dict (also written to out_dir/manifest.json).

    Layout:  out_dir/shards/shard=<k>/*.parquet  (columns: id, text,
    ... original columns, __key) sorted by the seeded shuffle key
    within each shard;  out_dir/manifest.json  with curation
    accounting, per-shard row counts and per-group token/packing stats.
    """
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist
    from tanml_ray.pipelines.curate import curate_documents
    from tanml_ray.pipelines.dedup import md5_token_hashes
    from tanml_ray.pipelines.webtext import token_budget_stats

    curated, stats = curate_documents(
        ds, text_col=text_col, id_col=id_col, min_tokens=min_tokens,
        near_dup_threshold=near_dup_threshold, c4_clean=c4_clean,
        allowed_langs=allowed_langs)

    def key_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keys = md5_token_hashes([f"{int(i)}:{seed}" for i in ids])
        out = batch.append_column(
            "__shard", pa.array((keys % np.uint64(n_shards))
                                .astype(np.int64), type=pa.int64()))
        # uint64 keys stored bit-exact as int64; the SORT ORDER of the
        # reinterpreted values differs from uint64 order, so shift to
        # keep ordering semantics identical on the int64 column
        return out.append_column(
            "__key", pa.array((keys - np.uint64(1 << 63)).view(np.int64),
                              type=pa.int64()))

    keyed = curated.map_batches(key_batch, batch_format="pyarrow")
    shard_dir = os.path.join(out_dir, "shards")
    (keyed.sort(["__shard", "__key"])
     .write_parquet(shard_dir, partition_cols=["__shard"]))

    # per-shard row counts, combiner-first
    def shard_partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("__shard").combine_chunks().value_counts()
        return pa.table({"shard": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    per_shard = {int(r["shard"]): int(r["n"]) for r in collect_pylist(
        keyed.map_batches(shard_partial, batch_format="pyarrow")
        .groupby("shard").aggregate(Sum("n", alias_name="n")))}

    if group_col in curated.schema().names:
        token_stats = [
            {k: (int(v) if isinstance(v, (int, np.integer)) else v)
             for k, v in row.items()}
            for row in token_budget_stats(
                curated, ctx=ctx, text_col=text_col,
                group_col=group_col).to_pylist()]
    else:  # corpus without the grouping column: account it as one group
        token_stats = []

    manifest = {
        "seed": seed, "n_shards": n_shards, "ctx": ctx,
        "curation": stats,
        "rows_exported": sum(per_shard.values()),
        "per_shard_rows": {str(k): per_shard.get(k, 0)
                           for k in range(n_shards)},
        "token_stats": token_stats,
        "layout": "shards/__shard=<k>/*.parquet, rows sorted by the "
                  "seeded shuffle key within each shard",
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return manifest
