"""pretrain_export composite: curation accounting survives the chain,
shard layout is seeded-deterministic and partition-invariant, manifest
counts re-derive from the written files."""

from __future__ import annotations

import glob
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus(n=60):
    rows = []
    for i in range(n):
        rows.append({"doc_id": i, "lang": "en" if i % 3 else "de",
                     "text": f"document {i} " + " ".join(
                         f"tok{i}_{j} the and of" for j in range(12))})
    rows.append({"doc_id": 900, "lang": "en", "text": "tiny"})   # too short
    rows.append({"doc_id": 901, "lang": "en", "text": None})    # null
    # exact duplicate pair: one must be dropped by near-dup/dedup
    rows.append({"doc_id": 902, "lang": "en", "text": rows[0]["text"]})
    return rows


@pytest.mark.usefixtures("ray_session")
class TestPretrainExport:
    def _run(self, tmp_path, parts=4, tag="a", seed=42):
        import ray.data as rd

        from tanml_ray.pipelines.pretrain import pretrain_export

        ds = rd.from_pandas(__import__("pandas").DataFrame(_corpus()))
        ds = ds.repartition(parts)
        out = str(tmp_path / f"export_{tag}")
        manifest = pretrain_export(ds, out, n_shards=4, seed=seed,
                                   ctx=64)
        return out, manifest

    def _shard_contents(self, out):
        got = {}
        for f in sorted(glob.glob(out + "/shards/__shard=*/*.parquet")):
            shard = int(f.split("__shard=")[1].split("/")[0])
            t = pq.read_table(f, columns=["doc_id", "__key"])
            got.setdefault(shard, []).append(t)
        return {k: pa.concat_tables(v) for k, v in got.items()}

    def test_accounting_and_layout(self, tmp_path):
        out, manifest = self._run(tmp_path)
        # planted junk dropped: tiny, null, and one of the dup pair
        assert manifest["curation"]["input_rows"] == 63
        assert manifest["rows_exported"] < 63
        shards = self._shard_contents(out)
        n_files_rows = sum(t.num_rows for t in shards.values())
        assert n_files_rows == manifest["rows_exported"]
        assert sum(manifest["per_shard_rows"].values()) == n_files_rows
        # within-shard seeded order: __key ascending inside every file
        for t in shards.values():
            k = t.column("__key").to_numpy()
            assert (np.diff(k) >= 0).all()
        # token accounting covers both langs
        langs = {r["lang"] for r in manifest["token_stats"]}
        assert langs == {"en", "de"}
        for r in manifest["token_stats"]:
            assert r["total_tokens"] > 0 and r["packed_sequences"] > 0

    def test_deterministic_and_partition_invariant(self, tmp_path):
        out_a, m_a = self._run(tmp_path, parts=2, tag="p2")
        out_b, m_b = self._run(tmp_path, parts=9, tag="p9")
        a, b = self._shard_contents(out_a), self._shard_contents(out_b)
        assert set(a) == set(b)
        for k in a:
            ida = a[k].column("doc_id").to_pylist()
            idb = b[k].column("doc_id").to_pylist()
            assert ida == idb  # same rows, same seeded ORDER
        assert m_a["per_shard_rows"] == m_b["per_shard_rows"]

    def test_seed_changes_layout(self, tmp_path):
        _, m42 = self._run(tmp_path, tag="s42", seed=42)
        _, m7 = self._run(tmp_path, tag="s7", seed=7)
        assert m42["per_shard_rows"] != m7["per_shard_rows"]
        assert (sum(m42["per_shard_rows"].values())
                == sum(m7["per_shard_rows"].values()))
