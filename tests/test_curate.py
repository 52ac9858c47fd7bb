"""Curation pipeline: every dropped row accounted for by stage;
planted junk/duplicates removed; output written as partitioned
parquet."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
class TestCurate:
    def _corpus(self):
        import ray.data as rd

        base = ("the quick brown fox jumps over the lazy dog and then runs "
                "far away into the deep green forest tonight looking around") * 2
        rows = []
        for i in range(50):
            rows.append({"doc_id": i,
                         "text": f"good document {i} " +
                         " ".join(f"word{i}_{j} the and of" for j in range(20))})
        rows.append({"doc_id": 200, "text": "tiny"})             # too short
        rows.append({"doc_id": 201, "text": None})               # null
        rows.append({"doc_id": 210, "text": base})               # exact dup pair
        rows.append({"doc_id": 211, "text": base})
        rows.append({"doc_id": 220, "text": base + " extra tail words here"})  # near dup
        return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def test_accounting_and_planted_removals(self, tmp_path):
        import pyarrow.parquet as pq

        from tanml_ray.pipelines.curate import curate_documents

        out_dir = str(tmp_path / "curated")
        curated, stats = curate_documents(self._corpus(),
                                          near_dup_threshold=0.6,
                                          out_dir=out_dir)
        ids = {r["doc_id"] for r in curated.select_columns(["doc_id"]).take_all()}
        assert 200 not in ids and 201 not in ids      # quality-dropped
        assert 210 in ids and 211 not in ids          # exact keep-first
        assert 220 not in ids                          # near-dup of 210
        assert stats["input_rows"] == 55
        assert stats["dropped_quality_or_lang"] == 2
        assert stats["dropped_exact_dup"] == 1
        assert stats["dropped_near_dup"] == 1
        assert stats["output_rows"] == 51
        assert stats["output_ws_tokens"] > 0
        # written output readable and row-count consistent
        assert pq.read_table(out_dir).num_rows == 51

    def test_distributed_keep_first_matches_driver(self, tmp_path):
        """dig_driver_budget=0 forces the hash-partitioned semi-join
        keep-first (the 100-TB path — no driver dict of dup digests);
        surviving ids and stats must be identical to the driver path."""
        from tanml_ray.pipelines.curate import curate_documents

        drv, drv_stats = curate_documents(self._corpus(),
                                          near_dup_threshold=0.6)
        dist, dist_stats = curate_documents(self._corpus(),
                                            near_dup_threshold=0.6,
                                            dig_driver_budget=0)
        ids_drv = sorted(r["doc_id"] for r in
                         drv.select_columns(["doc_id"]).take_all())
        ids_dist = sorted(r["doc_id"] for r in
                          dist.select_columns(["doc_id"]).take_all())
        assert ids_drv == ids_dist
        assert drv_stats == dist_stats

    def test_resumable_curation(self, tmp_path):
        """First run processes every input shard; a rerun skips all of
        them (stage-1 checkpoint) and reproduces identical stats; the
        final output matches the non-resumable pipeline on the same
        corpus."""
        import pyarrow.parquet as pq

        from tanml_ray.pipelines.curate import (
            curate_documents,
            run_resumable_curation,
        )

        corpus = self._corpus().materialize()
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        rows = corpus.take_all()
        import pyarrow as pa_

        for i in range(3):
            pq.write_table(pa_.Table.from_pylist(rows[i::3]),
                           str(in_dir / f"shard{i}.parquet"))

        out_dir = str(tmp_path / "out")
        s1 = run_resumable_curation(str(in_dir), out_dir,
                                    near_dup_threshold=0.6, wave_size=2)
        assert s1["processed_partitions"] == 3 and s1["skipped_partitions"] == 0
        assert s1["input_rows"] == 55
        # rerun: everything checkpointed, stage 1 skipped entirely
        s2 = run_resumable_curation(str(in_dir), out_dir,
                                    near_dup_threshold=0.6, wave_size=2)
        assert s2["processed_partitions"] == 0 and s2["skipped_partitions"] == 3
        acct = {"processed_partitions", "skipped_partitions"}
        assert {k: v for k, v in s1.items() if k not in acct} \
            == {k: v for k, v in s2.items() if k not in acct}
        # same numbers as the non-resumable pipeline on the same corpus
        _, want = curate_documents(self._corpus(), near_dup_threshold=0.6)
        for k in ("input_rows", "dropped_quality_or_lang",
                  "dropped_exact_dup", "dropped_near_dup", "output_rows",
                  "output_ws_tokens", "near_dup_clusters"):
            assert s1[k] == want[k], k
        assert pq.read_table(f"{out_dir}/curated").num_rows == want["output_rows"]

    def test_lang_allowlist(self):
        import ray.data as rd

        from tanml_ray.pipelines.curate import curate_documents

        rows = [
            {"doc_id": 1, "text": "the cat sat on the mat and it was happy "
                                  "with the warm sun of the day"},
            {"doc_id": 2, "text": "der hund ist nicht in den garten mit der "
                                  "katze und das ist auch die sache"},
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        curated, stats = curate_documents(ds, allowed_langs={"en"},
                                          min_tokens=3)
        ids = {r["doc_id"] for r in curated.take_all()}
        assert ids == {1}
        assert stats["dropped_quality_or_lang"] == 1


@pytest.mark.usefixtures("ray_session")
class TestCurateWebtext:
    def test_gopher_and_decontamination_stages(self):
        import ray.data as rd

        from tanml_ray.pipelines.curate import curate_documents

        long_good = " ".join(
            "the quick brown fox and the lazy dog of note".split() * 7)  # 63 w
        leaked = ("prefix words here " +
                  "the secret benchmark answer is exactly forty two " +
                  " ".join("and the rest of the document is fine ok".split() * 6))
        rows = [{"doc_id": 1, "text": long_good},
                {"doc_id": 2, "text": leaked},
                {"doc_id": 3, "text": "way too short to pass gopher"}]
        bench = rd.from_arrow(pa.Table.from_pylist(
            [{"doc_id": 99,
              "text": "the secret benchmark answer is exactly forty two"}]))
        curated, stats = curate_documents(
            rd.from_arrow(pa.Table.from_pylist(rows)),
            gopher_rules=True, decontaminate_against=bench,
            contamination_n=5, near_dup_threshold=0.99)
        ids = {r["doc_id"] for r in
               curated.select_columns(["doc_id"]).take_all()}
        assert ids == {1}
        assert stats["dropped_quality_or_lang"] == 1      # doc 3: gopher
        assert stats["dropped_contaminated"] == 1         # doc 2: leaked


def test_curate_with_c4_clean_stage(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.curate import curate_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(6)), type=pa.int64()),
        "text": pa.array([
            "one two three four five six.",        # kept, line survives
            "alpha beta gamma delta five six!",    # kept
            "json blob { inside }",                # c4 doc rule drops
            "contains lorem ipsum filler text.",   # c4 doc rule drops
            "no terminal punctuation here at all", # line dies -> 0 kept
            "uses javascript heavily today.",      # javascript line dies
        ], type=pa.string()),
        "lang": pa.array(["en"] * 6, type=pa.string())}))
    out, stats = curate_documents(
        docs, min_tokens=1, c4_clean=True, near_dup_threshold=0.99)
    assert stats["input_rows"] == 6
    assert stats["dropped_c4"] == 4
    assert stats["output_rows"] == 2
    # full drop accounting still balances with the new stage
    assert (stats["input_rows"] - stats["output_rows"]
            == stats["dropped_c4"] + stats["dropped_quality_or_lang"]
            + stats["dropped_exact_dup"] + stats["dropped_near_dup"])


@pytest.mark.usefixtures("ray_session")
def test_shuffle_shards_complete_deterministic_seeded():
    """Every id appears exactly once; positions within a shard are
    0..len-1; layout doesn't change the result; a different seed gives
    a different global order (the whole point of the op)."""
    import ray.data as rd

    from tanml_ray.pipelines.curate import shuffle_shards

    ids = pa.table({"doc_id": pa.array(list(range(300)), type=pa.int64())})

    def collect(parts, seed=42):
        ds = rd.from_arrow(ids).repartition(parts)
        return sorted(shuffle_shards(ds, "doc_id", n_shards=4,
                                     seed=seed).take_all(),
                      key=lambda r: r["doc_id"])

    a = collect(3)
    b = collect(9)
    assert a == b                                    # layout-invariant
    assert [r["doc_id"] for r in a] == list(range(300))  # complete
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # dense ranks
    c = collect(3, seed=7)
    assert c != a                                    # seed changes order


@pytest.mark.usefixtures("ray_session")
class TestRangeExport:
    def _ds(self, parts=4, n=3000, seed=11):
        import ray.data as rd

        rng = np.random.default_rng(seed)
        v = rng.integers(0, 500, n).astype(np.int64)
        return (rd.from_arrow(pa.table({"id": np.arange(n), "v": v}))
                .repartition(parts)), v

    def test_boundaries_match_quantile_disc(self):
        from tanml_ray.pipelines.curate import range_partition_boundaries

        ds, v = self._ds()
        got = range_partition_boundaries(ds, "v", 4)
        s = np.sort(v)
        # DuckDB quantile_disc: 0-based index ceil(q*n) - 1
        expect = [int(s[-(-(i * len(s)) // 4) - 1]) for i in (1, 2, 3)]
        assert got == expect

    def test_boundaries_partition_invariant(self):
        from tanml_ray.pipelines.curate import range_partition_boundaries

        a, _ = self._ds(parts=2)
        b, _ = self._ds(parts=13)
        assert (range_partition_boundaries(a, "v", 5)
                == range_partition_boundaries(b, "v", 5))

    def test_export_layout_and_routing(self, tmp_path):
        import pyarrow.parquet as pq

        from tanml_ray.pipelines.curate import range_export

        ds, v = self._ds()
        out = str(tmp_path / "ranged")
        bounds = range_export(ds, "v", 4, out)
        barr = np.asarray(bounds)
        total, seen_shards = 0, {}
        import glob
        for f in glob.glob(out + "/shard=*/*.parquet"):
            shard = int(f.split("shard=")[1].split("/")[0])
            col = pq.read_table(f, columns=["v"]).column("v").to_numpy()
            total += len(col)
            # every row routed by the strictly-below rule
            assert (np.searchsorted(barr, col, side="left") == shard).all()
            # sorted WITHIN each file (global sort preserved per block)
            assert (np.diff(col) >= 0).all()
            mn, mx = seen_shards.get(shard, (np.inf, -np.inf))
            seen_shards[shard] = (min(mn, col.min()), max(mx, col.max()))
        assert total == len(v)
        # shard value ranges are ordered and non-overlapping
        ordered = [seen_shards[k] for k in sorted(seen_shards)]
        for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
            assert hi1 <= lo2
