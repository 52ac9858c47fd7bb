"""Dedup / similarity / text-analysis operator tests: planted
near-duplicates must be found, LSH recall vs brute force, heuristics
deterministic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tanml_ray.pipelines.dedup import (
    hamming64,
    jaccard,
    minhash_signature,
    shingle_hashes,
    simhash64,
)
from tanml_ray.stages.text import (
    fingerprint_md5,
    langid_of,
    normalize_text,
    quality_batch,
)


class TestKernelsDedup:
    def test_jaccard_identical(self):
        h = shingle_hashes("the quick brown fox jumps over the lazy dog")
        assert jaccard(h, h) == 1.0

    def test_jaccard_disjoint(self):
        a = shingle_hashes("aaaaa bbbbb ccccc")
        b = shingle_hashes("xxxxx yyyyy zzzzz")
        assert jaccard(a, b) < 0.1

    def test_minhash_estimates_jaccard(self):
        base = "the quick brown fox jumps over the lazy dog " * 8
        edited = base.replace("lazy", "sleepy").replace("quick", "rapid")
        ha, hb = shingle_hashes(base), shingle_hashes(edited)
        true_j = jaccard(ha, hb)
        sa = minhash_signature(ha, 128)
        sb = minhash_signature(hb, 128)
        est = (sa == sb).mean()
        assert est == pytest.approx(true_j, abs=0.15)

    def test_minhash_deterministic(self):
        h = shingle_hashes("deterministic input text")
        assert np.array_equal(minhash_signature(h, 64), minhash_signature(h, 64))

    def test_simhash_near_for_near_texts(self):
        a = "word " * 50 + "alpha beta gamma delta"
        b = "word " * 50 + "alpha beta gamma epsilon"
        fa = simhash64(np.unique(__import__("pandas").util.hash_array(
            np.asarray(a.split(), dtype=object))))
        fb = simhash64(np.unique(__import__("pandas").util.hash_array(
            np.asarray(b.split(), dtype=object))))
        fc = simhash64(np.unique(__import__("pandas").util.hash_array(
            np.asarray(("totally different content nothing shared "*10).split(), dtype=object))))
        assert hamming64(fa, fb) < hamming64(fa, fc)


@pytest.mark.usefixtures("ray_session")
class TestDedupPipelines:
    def _planted_ds(self):
        import ray.data as rd

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep green forest tonight") * 3
        rows = []
        for i in range(60):
            rows.append({"doc_id": i, "text": f"unique document {i} " +
                         " ".join(f"tok{i}_{j}" for j in range(30))})
        # planted: 100=101 exact dup, 102≈103 near dup, 104 unrelated
        rows.append({"doc_id": 100, "text": base})
        rows.append({"doc_id": 101, "text": base})
        rows.append({"doc_id": 102, "text": base + " extra tail words here"})
        rows.append({"doc_id": 103, "text": base + " extra tail phrase here"})
        return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def test_exact_dedup_finds_planted(self):
        from tanml_ray.pipelines.dedup import exact_dedup

        agg = exact_dedup(self._planted_ds())
        dups = [r for r in agg.take_all() if r["n"] > 1]
        assert len(dups) == 1
        assert dups[0]["keep_id"] == 100 and dups[0]["n"] == 2

    def test_minhash_lsh_finds_planted(self):
        from tanml_ray.pipelines.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(self._planted_ds(), threshold=0.5)
        got = {(r["id_a"], r["id_b"]) for r in pairs.take_all() if hasattr(pairs, "take_all")} \
            if False else {(r["id_a"], r["id_b"]) for r in pairs.to_pylist()}
        assert (100, 101) in got          # exact dup pair
        assert any({a, b} <= {100, 101, 102, 103} for a, b in got if (a, b) != (100, 101))
        # all reported pairs really exceed the threshold
        for r in pairs.to_pylist():
            assert r["jaccard"] >= 0.5

    def test_simhash_finds_planted(self):
        from tanml_ray.pipelines.dedup import simhash_near_dups

        pairs = simhash_near_dups(self._planted_ds(), max_hamming=6)
        got = {(r["id_a"], r["id_b"]) for r in pairs.to_pylist()}
        assert (100, 101) in got
        for r in pairs.to_pylist():
            assert r["hamming"] <= 6

    def test_partition_invariance(self):
        from tanml_ray.pipelines.dedup import minhash_lsh_pairs

        import ray.data as rd

        tbl = pa.Table.from_pylist([
            {"doc_id": i,
             "text": ("shared prefix words for everyone " * 4 + f"suffix {i % 3}")}
            for i in range(30)])
        p1 = minhash_lsh_pairs(rd.from_arrow(tbl).repartition(1), threshold=0.5)
        p8 = minhash_lsh_pairs(rd.from_arrow(tbl).repartition(8), threshold=0.5)
        assert p1.to_pylist() == p8.to_pylist()

    def test_oversize_bucket_not_skipped(self):
        """A boilerplate-heavy cluster larger than bucket_cap must
        contribute ALL its pairs (chunked sub-blocks), not silently
        zero — the round-2 recall hole."""
        import ray.data as rd

        from tanml_ray.pipelines.dedup import minhash_lsh_pairs

        boiler = ("identical boilerplate navigation header footer text "
                  "repeated across every page of the site tonight") * 2
        rows = [{"doc_id": i, "text": boiler} for i in range(120)]
        rows += [{"doc_id": 1000 + i,
                  "text": f"unique doc {i} " + " ".join(
                      f"tk{i}_{j}" for j in range(25))} for i in range(10)]
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
        pairs = minhash_lsh_pairs(ds, threshold=0.8, bucket_cap=50)
        got = {(r["id_a"], r["id_b"]) for r in pairs.to_pylist()}
        want = {(a, b) for a in range(120) for b in range(a + 1, 120)}
        assert got == want            # all 7140 pairs of the cluster
        # identical output to the non-chunked path
        big_cap = minhash_lsh_pairs(ds, threshold=0.8, bucket_cap=100_000)
        assert pairs.to_pylist() == big_cap.to_pylist()

    def test_fingerprint_oversize_bucket_not_skipped(self):
        import ray.data as rd

        from tanml_ray.pipelines.dedup import (
            explode_fp_blocks,
            fingerprint_near_dups,
        )

        fps = np.full(30, 0x0123456789ABCDEF, dtype=np.uint64)
        ids = np.arange(1, 31, dtype=np.int64)
        buckets = rd.from_arrow(explode_fp_blocks(ids, fps, 8))
        pairs = fingerprint_near_dups(buckets, max_hamming=3,
                                      bucket_cap=10).to_pylist()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        want = {(int(a), int(b)) for a in ids for b in ids if a < b}
        assert got == want
        assert all(r["hamming"] == 0 for r in pairs)

    def test_distributed_verify_matches_driver_path(self):
        """verify_driver_budget=0 forces the two-round hash-partitioned
        shingle attach (no driver gather of shingle sets); output must
        be identical to the driver verify."""
        from tanml_ray.pipelines.dedup import minhash_lsh_pairs

        ds = self._planted_ds()
        fast = minhash_lsh_pairs(ds, threshold=0.5)
        dist = minhash_lsh_pairs(ds, threshold=0.5, verify_driver_budget=0)
        assert fast.to_pylist() == dist.to_pylist()
        assert len(dist.to_pylist()) >= 1

    def test_as_dataset_pair_outputs_match_driver(self):
        """The Dataset-returning variants (distributed cross-band /
        cross-cell dedup, no driver dict) must contain exactly the
        driver-path pairs."""
        from tanml_ray.pipelines.dedup import simhash_near_dups

        ds = self._planted_ds()
        table = simhash_near_dups(ds, max_hamming=6)
        dset = simhash_near_dups(ds, max_hamming=6, as_dataset=True)
        got = sorted((r["id_a"], r["id_b"], r["hamming"])
                     for r in dset.take_all())
        want = sorted((r["id_a"], r["id_b"], r["hamming"])
                      for r in table.to_pylist())
        assert got == want and len(got) >= 1

    def test_distributed_prefilter_matches_driver_path(self):
        """sig_driver_budget=0 forces the fully-distributed two-round
        sig-attach prefilter (the 100-TB path, zero driver gather of
        signatures); output must be identical to the bounded-budget
        driver prefilter."""
        from tanml_ray.pipelines.dedup import minhash_lsh_pairs

        ds = self._planted_ds()
        fast = minhash_lsh_pairs(ds, threshold=0.5)
        dist = minhash_lsh_pairs(ds, threshold=0.5, sig_driver_budget=0)
        assert fast.to_pylist() == dist.to_pylist()
        assert len(dist.to_pylist()) >= 1


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingNearDup:
    def _planted_vectors(self, n_noise=400, n_planted=30, dim=48):
        """Deterministic corpus: noise vectors + planted near-dup pairs
        (perturbed copies at sim ≥ 0.95)."""
        rng = np.random.default_rng(11)
        noise = rng.standard_normal((n_noise, dim))
        rows_v, rows_id = [], []
        for i, v in enumerate(noise):
            rows_id.append(i)
            rows_v.append(v)
        base = rng.standard_normal((n_planted, dim))
        for j, v in enumerate(base):
            u = v / np.linalg.norm(v)
            eps = rng.standard_normal(dim) * 0.02
            w = u + eps
            rows_id += [1000 + 2 * j, 1001 + 2 * j]
            rows_v += [u * 3.0, w]
        t = pa.table({"vec_id": pa.array(rows_id, type=pa.int64()),
                      "embedding": pa.array([np.asarray(v, dtype=np.float32)
                                             for v in rows_v],
                                            type=pa.list_(pa.float32()))})
        import ray.data as rd

        return rd.from_arrow(t).repartition(6)

    def test_ivf_recall_matches_exact_kernel(self):
        """The centroid-bucketed path (threshold ≥ 0.75 regime) must
        return EXACTLY the pairs of the exact block-pair kernel —
        recall 1.0 is a triangle-inequality guarantee, not a
        probabilistic contract."""
        from tanml_ray.pipelines.dedup import (
            embedding_near_dups,
            embedding_near_dups_exact,
        )

        ds = self._planted_vectors()
        ivf = embedding_near_dups(ds, threshold=0.95).to_pylist()
        exact = embedding_near_dups_exact(ds, threshold=0.95).to_pylist()
        assert len(exact) >= 25  # planted pairs actually exceed 0.95
        assert ivf == exact

    def test_as_dataset_matches_table_path(self):
        from tanml_ray.pipelines.dedup import embedding_near_dups

        ds = self._planted_vectors(n_noise=150, n_planted=10)
        table = embedding_near_dups(ds, threshold=0.95)
        dset = embedding_near_dups(ds, threshold=0.95, as_dataset=True)
        got = sorted((r["id_a"], r["id_b"], r["sim"]) for r in dset.take_all())
        want = sorted((r["id_a"], r["id_b"], r["sim"])
                      for r in table.to_pylist())
        assert got == want and len(got) >= 5

    def test_low_threshold_routes_to_exact(self):
        from tanml_ray.pipelines.dedup import (
            embedding_near_dups,
            embedding_near_dups_exact,
        )

        ds = self._planted_vectors(n_noise=120, n_planted=8)
        got = embedding_near_dups(ds, threshold=0.4).to_pylist()
        exact = embedding_near_dups_exact(ds, threshold=0.4).to_pylist()
        assert got == exact

    def test_exact_kernel_matches_bruteforce(self):
        from tanml_ray.pipelines.dedup import embedding_near_dups_exact

        ds = self._planted_vectors(n_noise=100, n_planted=5)
        got = {(r["id_a"], r["id_b"]): r["sim"]
               for r in embedding_near_dups_exact(ds, threshold=0.9).to_pylist()}
        t = ds.to_pandas()
        ids = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        s = m @ m.T
        iu, ju = np.triu_indices(len(ids), 1)
        want = {}
        for a, b, v in zip(ids[iu], ids[ju], s[iu, ju]):
            if v >= 0.9:
                lo, hi = (int(a), int(b)) if a < b else (int(b), int(a))
                want[(lo, hi)] = round(float(v), 6)
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def test_knn_matches_bruteforce_numpy(self, sf_dir):
        import pyarrow.parquet as pq

        import ray.data as rd

        from tanml_ray.pipelines.similarity import knn_cosine

        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        ids = t.column("vec_id").to_numpy()
        q = {0: m[ids == 0][0]}
        out = knn_cosine(rd.from_arrow(t).repartition(4), q, k=5).to_pylist()

        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = norm[ids == 0][0] @ norm.T
        order = [int(ids[i]) for i in np.argsort(-sims) if ids[i] != 0][:5]
        assert [r["vec_id"] for r in out] == order

    def test_many_queries_vectorized(self):
        """500 queries in one call: the per-batch work must be one
        axis-1 argpartition, not a Python loop per query — and every
        query's top-k must match the numpy brute force exactly."""
        import time

        import ray.data as rd

        from tanml_ray.pipelines.similarity import knn_cosine

        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((800, 24))
        ids = np.arange(800)
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        ds = rd.from_arrow(t).repartition(4)
        qs = {int(i): vecs[i] for i in range(500)}
        t0 = time.monotonic()
        out = knn_cosine(ds, qs, k=5).to_pylist()
        assert time.monotonic() - t0 < 60
        assert len(out) == 500 * 5
        # exact check on a sample of queries against brute force
        fvecs = np.stack([np.asarray(
            r, dtype=np.float64) for r in t.column("embedding").to_pylist()])
        norm = fvecs / np.linalg.norm(fvecs, axis=1, keepdims=True)
        for qid in (0, 123, 499):
            sims = norm[qid] @ norm.T
            want = [int(i) for i in np.argsort(-sims) if i != qid][:5]
            got = [r["vec_id"] for r in out if r["query_id"] == qid]
            assert got == want, qid

    def test_lsh_recall_on_clustered_vectors(self):
        """LSH must recover true neighbors when structure exists: 10
        tight clusters, query = a member → top-k are clustermates."""
        import ray.data as rd

        from tanml_ray.pipelines.similarity import knn_cosine, knn_cosine_lsh

        rng = np.random.default_rng(42)
        centers = rng.standard_normal((10, 32)) * 5
        vecs = np.vstack([c + rng.standard_normal((40, 32)) * 0.3 for c in centers])
        ids = np.arange(len(vecs))
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        ds = rd.from_arrow(t).repartition(4)
        qs = {0: vecs[0], 40: vecs[40], 80: vecs[80]}
        exact = knn_cosine(ds, qs, k=10).to_pylist()
        approx = knn_cosine_lsh(ds, qs, k=10, n_bits=8, multiprobe=2).to_pylist()
        for qid in qs:
            e = {r["vec_id"] for r in exact if r["query_id"] == qid}
            a = {r["vec_id"] for r in approx if r["query_id"] == qid}
            recall = len(e & a) / len(e)
            assert recall >= 0.8, f"q{qid} recall {recall}"


@pytest.mark.usefixtures("ray_session")
class TestLshIndexedKnn:
    def test_bucketed_index_prunes_and_recalls(self, tmp_path):
        """build_lsh_index writes hive-partitioned parquet by bucket;
        the indexed query reads ONLY probe buckets (partition pruning)
        and still recovers the true neighbors of clustered vectors."""
        import os

        import ray.data as rd

        from tanml_ray.pipelines.similarity import (
            build_lsh_index,
            knn_cosine,
            knn_cosine_lsh_indexed,
        )

        rng = np.random.default_rng(5)
        centers = rng.standard_normal((8, 32)) * 5
        vecs = np.vstack([c + rng.standard_normal((50, 32)) * 0.3 for c in centers])
        ids = np.arange(len(vecs))
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        idx_dir = str(tmp_path / "lsh_index")
        build_lsh_index(rd.from_arrow(t).repartition(4), idx_dir, n_bits=6)

        # layout really is partitioned by bucket
        parts = [d for d in os.listdir(idx_dir) if d.startswith("bucket=")]
        assert len(parts) >= 2

        qs = {0: vecs[0], 50: vecs[50]}
        exact = knn_cosine(rd.from_arrow(t), qs, k=10).to_pylist()
        approx = knn_cosine_lsh_indexed(idx_dir, qs, k=10, multiprobe=2).to_pylist()
        for qid in qs:
            e = {r["vec_id"] for r in exact if r["query_id"] == qid}
            a = {r["vec_id"] for r in approx if r["query_id"] == qid}
            assert len(e & a) / len(e) >= 0.8, qid

        # pruning: the probe-bucket read touches fewer rows than the
        # corpus (path-level partition pruning)
        from tanml_ray.pipelines.similarity import (
            _normalize,
            lsh_project_bucket,
            make_planes,
        )

        planes = make_planes(32, 6, 42)
        qb = {int(b) for b in lsh_project_bucket(
            _normalize(np.stack([vecs[0], vecs[50]])), planes)}
        paths = [os.path.join(idx_dir, f"bucket={b}", f) for b in qb
                 if os.path.isdir(os.path.join(idx_dir, f"bucket={b}"))
                 for f in os.listdir(os.path.join(idx_dir, f"bucket={b}"))
                 if f.endswith(".parquet")]
        assert paths
        pruned = rd.read_parquet(paths)
        assert 0 < pruned.count() < len(vecs)


@pytest.mark.usefixtures("ray_session")
class TestIvfIndexedKnn:
    def test_ivf_index_prunes_and_recalls(self, tmp_path):
        """build_ivf_index writes hive-partitioned parquet by nearest
        centroid; the indexed query reads ONLY probe cells and still
        recovers the true neighbors of clustered vectors."""
        import os

        import ray.data as rd

        from tanml_ray.pipelines.similarity import (
            build_ivf_index,
            knn_cosine,
            knn_cosine_ivf_indexed,
        )

        rng = np.random.default_rng(17)
        centers = rng.standard_normal((8, 32)) * 5
        vecs = np.vstack([c + rng.standard_normal((50, 32)) * 0.3
                          for c in centers])
        ids = np.arange(len(vecs))
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        idx_dir = str(tmp_path / "ivf_index")
        build_ivf_index(rd.from_arrow(t).repartition(4), idx_dir,
                        n_centroids=16)
        parts = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
        assert len(parts) >= 2

        qs = {0: vecs[0], 50: vecs[50], 200: vecs[200]}
        exact = knn_cosine(rd.from_arrow(t), qs, k=10).to_pylist()
        approx = knn_cosine_ivf_indexed(idx_dir, qs, k=10,
                                        n_probe=4).to_pylist()
        for qid in qs:
            e = {r["vec_id"] for r in exact if r["query_id"] == qid}
            a = {r["vec_id"] for r in approx if r["query_id"] == qid}
            assert len(e & a) / len(e) >= 0.8, qid

    def test_rebuild_replaces_not_appends(self, tmp_path):
        """Building twice into the same dir must REPLACE the index
        (atomic tmp+rename), not append — Ray's write_parquet appends
        into existing dirs, which would double every vector."""
        import pyarrow.parquet as pq

        import ray.data as rd

        from tanml_ray.pipelines.similarity import build_ivf_index

        rng = np.random.default_rng(8)
        vecs = rng.standard_normal((80, 8))
        t = pa.table({"vec_id": pa.array(np.arange(80), type=pa.int64()),
                      "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        idx = str(tmp_path / "idx")
        build_ivf_index(rd.from_arrow(t), idx, n_centroids=4)
        build_ivf_index(rd.from_arrow(t), idx, n_centroids=4)
        assert pq.read_table(idx).num_rows == 80

    def test_deterministic_layout(self, tmp_path):
        """Same input → identical centroids and cell assignment
        regardless of partitioning (no RNG anywhere)."""
        import ray.data as rd

        from tanml_ray.pipelines.similarity import (
            build_ivf_index,
            knn_cosine_ivf_indexed,
        )

        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((120, 16))
        t = pa.table({"vec_id": pa.array(np.arange(120), type=pa.int64()),
                      "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        d1 = str(tmp_path / "i1")
        d2 = str(tmp_path / "i2")
        build_ivf_index(rd.from_arrow(t).repartition(1), d1, n_centroids=6)
        build_ivf_index(rd.from_arrow(t).repartition(7), d2, n_centroids=6)
        qs = {5: vecs[5], 77: vecs[77]}
        a = knn_cosine_ivf_indexed(d1, qs, k=5).to_pylist()
        b = knn_cosine_ivf_indexed(d2, qs, k=5).to_pylist()
        assert a == b


class TestTextAnalysis:
    def test_normalize_and_fingerprint(self):
        assert normalize_text("  Hello   WORLD \n") == "hello world"
        assert fingerprint_md5("Hello  World") == fingerprint_md5("hello world")
        assert fingerprint_md5("a") != fingerprint_md5("b")

    def test_langid_samples(self):
        assert langid_of("the cat sat on the mat and it was happy")[0] == "en"
        assert langid_of("der hund ist nicht in den garten mit der katze")[0] == "de"
        assert langid_of("el perro y la casa de los niños es una maravilla")[0] == "es"
        assert langid_of("le chat est dans la maison pour les enfants")[0] == "fr"
        assert langid_of("这是一个中文句子")[0] == "zh"
        assert langid_of("")[0] == "und"

    def test_quality_batch(self):
        t = pa.table({"doc_id": [1, 2],
                      "text": ["the quick brown fox, it jumps!", "x"]})
        out = quality_batch(t).to_pylist()
        assert out[0]["n_tokens"] == 6
        assert out[0]["n_punct"] == 2
        assert out[0]["quality_score"] > out[1]["quality_score"]


class TestWinnowing:
    def test_deterministic_and_edit_robust(self):
        from tanml_ray.stages.text import winnow_fingerprints, winnow_similarity

        base = ("the quick brown fox jumps over the lazy dog and runs into "
                "the deep forest tonight looking for food and shelter") * 3
        edited = base.replace("lazy", "idle", 1)
        other = "completely different content about astronomy and stars " * 6
        assert np.array_equal(winnow_fingerprints(base), winnow_fingerprints(base))
        # a one-word edit preserves most fingerprints...
        assert winnow_similarity(base, edited) > 0.8
        # ...while unrelated text shares almost none
        assert winnow_similarity(base, other) < 0.1
        # position shift (prefix insertion) still matches well past the edit
        assert winnow_similarity(base, "xyzzy " + base) > 0.8

    def test_edge_cases(self):
        from tanml_ray.stages.text import winnow_fingerprints, winnow_similarity

        assert winnow_fingerprints("").size == 0
        assert winnow_fingerprints("ab").size == 1  # shorter than k
        assert winnow_similarity("", "") == 1.0
        assert 0.0 <= winnow_similarity("abc", "xyz") <= 1.0

    def test_batch_stage(self, ray_session):
        import ray.data as rd

        from tanml_ray.stages.text import winnow_batch, winnow_fingerprints

        t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": ["some repeated words " * 10, None]})
        out = rd.from_arrow(t).map_batches(winnow_batch,
                                           batch_format="pyarrow").take_all()
        fp1 = np.frombuffer(out[0]["fingerprints"], dtype=np.uint64)
        assert np.array_equal(fp1, winnow_fingerprints("some repeated words " * 10))
        assert out[1]["n_fingerprints"] == 0


@pytest.mark.usefixtures("ray_session")
class TestFingerprintBitExactness:
    def test_low_bits_survive_store_reload(self):
        """Regression: fingerprints must round-trip bit-exactly through
        the block-bucket table (an int64+2**63 arithmetic reload
        promotes to float64 and destroys the low ~11 bits, collapsing
        distinct fingerprints to hamming 0)."""
        import ray.data as rd

        from tanml_ray.pipelines.dedup import (
            explode_fp_blocks,
            fingerprint_near_dups,
        )

        fps = np.array([0x0123456789ABCDEF, 0x0123456789ABCDE0,
                        0xFFFFFFFFFFFFFFFB], dtype=np.uint64)
        ids = np.array([1, 2, 3], dtype=np.int64)
        buckets = rd.from_arrow(explode_fp_blocks(ids, fps, 8))
        pairs = fingerprint_near_dups(buckets, max_hamming=64).to_pylist()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        # true distances
        assert got[(1, 2)] == int(0x0123456789ABCDEF ^ 0x0123456789ABCDE0).bit_count() == 4
        for (a, b), h in got.items():
            want = int(fps[a - 1] ^ fps[b - 1]).bit_count()
            assert h == want, (a, b)


def test_exact_dedup_keep_best_picks_max_quality_then_min_id():
    import ray

    from tanml_ray.pipelines.dedup import exact_dedup_keep_best

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": pa.array(["x", "x", "x", "y", "y", "z"]),
        "n_chars": pa.array([10, 30, 30, 5, 5, 7], type=pa.int64()),
    })
    # force multi-block input so the cross-block groupby path runs
    ds = ray.data.from_arrow(t).repartition(3)
    out = exact_dedup_keep_best(ds).take_all()
    # "x": max quality 30 shared by ids 2,3 → min id 2
    # "y": tie quality 5 → min id 4; "z": singleton id 6
    assert [(r["doc_id"], r["n_chars"]) for r in out] == \
        [(2, 30), (4, 5), (6, 7)]


def test_group_centroids_matches_numpy():
    import ray

    from tanml_ray.pipelines.similarity import group_centroids

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 4)).astype(np.float32)
    labels = np.array([i % 3 for i in range(30)], dtype=np.int32)
    t = pa.table({"label": pa.array(labels),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    out = group_centroids(ray.data.from_arrow(t).repartition(4)).to_pylist()
    assert len(out) == 3 * 4
    for r in out:
        expect = vecs[labels == r["label"], r["dim"] - 1].astype(
            np.float64).mean()
        assert r["centroid"] == round(float(expect), 6)


def test_optimal_bands_tracks_threshold():
    from tanml_ray.pipelines.dedup import optimal_bands

    for t in (0.3, 0.5, 0.7, 0.9):
        b, r, fp, fn = optimal_bands(t, 64)
        assert 1 <= b * r <= 64
        # the S-curve midpoint (1/b)^(1/r) should land near t
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t) < 0.15
        assert fp >= 0 and fn >= 0
    # higher threshold → more rows per band (sharper AND)
    assert optimal_bands(0.9, 64)[1] > optimal_bands(0.4, 64)[1]
    with pytest.raises(ValueError):
        optimal_bands(1.5, 64)


# ---------------------------------------------------------------------------
# incremental dedup against a persisted digest index
# ---------------------------------------------------------------------------

def test_incremental_dedup_against_index(ray_session, tmp_path):
    import ray.data as rd

    from tanml_ray.pipelines.dedup import (
        build_digest_index,
        dedup_against_index,
    )

    yesterday = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta", "epsilon"],
                         type=pa.string())}))
    idx = build_digest_index(yesterday, str(tmp_path / "idx"), buckets=4)

    today = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "text": pa.array(["gamma delta",        # dup of doc 2
                          "fresh content here",  # new
                          "alpha beta",          # dup of doc 1
                          "alpha  beta"],        # whitespace differs -> new
                         type=pa.string())}))
    out = {r["doc_id"]: r["is_dup"]
           for r in dedup_against_index(today, idx).take_all()}
    assert out == {10: 1, 11: 0, 12: 1, 13: 0}


def test_incremental_dedup_appends_accumulate(ray_session, tmp_path):
    import ray.data as rd

    from tanml_ray.pipelines.dedup import (
        build_digest_index,
        dedup_against_index,
    )

    idx_dir = str(tmp_path / "idx")
    day1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["first day doc"], type=pa.string())}))
    build_digest_index(day1, idx_dir, buckets=4)
    day2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([2], type=pa.int64()),
        "text": pa.array(["second day doc"], type=pa.string())}))
    # append-safe layout: indexing day 2 into the same dir only adds
    # files; day-3 checks then see BOTH days
    build_digest_index(day2, idx_dir, buckets=4)
    day3 = rd.from_arrow(pa.table({
        "doc_id": pa.array([30, 31, 32], type=pa.int64()),
        "text": pa.array(["first day doc", "second day doc", "novel"],
                         type=pa.string())}))
    out = {r["doc_id"]: r["is_dup"]
           for r in dedup_against_index(day3, idx_dir).take_all()}
    assert out == {30: 1, 31: 1, 32: 0}


@pytest.mark.usefixtures("ray_session")
class TestPqKnn:
    def _clustered(self):
        import ray.data as rd

        rng = np.random.default_rng(11)
        centers = rng.standard_normal((10, 32)) * 5
        vecs = np.vstack([c + rng.standard_normal((40, 32)) * 0.3
                          for c in centers])
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  type=pa.list_(pa.float32()))})
        return rd.from_arrow(t).repartition(4), vecs

    def test_pq_neighbors_are_clustermates(self):
        """Quantized sims collapse intra-cluster distances (all 40
        clustermates share a code word), so exact-SET recall is the
        wrong metric for PQ — the semantic contract is that every
        approximate neighbor is a true clustermate with a near-1
        approximate similarity."""
        from tanml_ray.pipelines.similarity import (
            build_pq_codebook,
            knn_cosine_pq,
            pq_encode,
        )

        ds, vecs = self._clustered()
        qs = {0: vecs[0], 40: vecs[40], 80: vecs[80]}
        cb = build_pq_codebook(ds, m=8, ksub=16)
        assert cb.shape == (8, 16, 4)
        codes = pq_encode(ds, cb).materialize()
        approx = knn_cosine_pq(codes, cb, qs, k=10).to_pylist()
        for qid in qs:
            hits = [r for r in approx if r["query_id"] == qid]
            assert len(hits) == 10
            cluster = qid // 40
            mates = sum(1 for r in hits if r["vec_id"] // 40 == cluster)
            assert mates >= 9, f"q{qid}: {mates}/10 clustermates"
            assert all(r["sim"] > 0.8 for r in hits
                       if r["vec_id"] // 40 == cluster)

    def test_pq_deterministic_rerun(self):
        """Bit-identical on rerun at fixed partitioning. (Across
        DIFFERENT partitionings the trained centroids can differ in
        final float ulps — block-order summation — so cross-partition
        bit-identity is explicitly NOT part of the PQ contract, unlike
        the exact kernels.)"""
        from tanml_ray.pipelines.similarity import (
            build_pq_codebook,
            knn_cosine_pq,
            pq_encode,
        )

        ds, vecs = self._clustered()
        qs = {0: vecs[0], 200: vecs[200]}
        outs = []
        for _ in range(2):
            cb = build_pq_codebook(ds, m=8, ksub=16)
            codes = pq_encode(ds, cb).materialize()
            outs.append(knn_cosine_pq(codes, cb, qs, k=5).to_pylist())
        assert outs[0] == outs[1]

    def test_pq_codes_compress(self):
        from tanml_ray.pipelines.similarity import (
            build_pq_codebook,
            pq_encode,
        )

        ds, _ = self._clustered()
        cb = build_pq_codebook(ds, m=8, ksub=16)
        rows = pq_encode(ds, cb).take(5)
        for r in rows:
            assert len(r["codes"]) == 8
            assert all(0 <= c < 16 for c in r["codes"])


def test_digest_index_bucket_mismatch_raises(ray_session, tmp_path):
    import ray.data as rd

    from tanml_ray.pipelines.dedup import build_digest_index

    d = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["x"], type=pa.string())}))
    idx = str(tmp_path / "idx")
    build_digest_index(d, idx, buckets=4)
    with pytest.raises(ValueError, match="buckets=4"):
        build_digest_index(d, idx, buckets=8)


@pytest.mark.usefixtures("ray_session")
class TestIvfPqKnn:
    def _clustered(self):
        import ray.data as rd

        rng = np.random.default_rng(11)
        centers = rng.standard_normal((10, 32)) * 5
        vecs = np.vstack([c + rng.standard_normal((40, 32)) * 0.3
                          for c in centers])
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  type=pa.list_(pa.float32()))})
        return rd.from_arrow(t).repartition(4), vecs

    def test_ivfpq_neighbors_are_clustermates(self, tmp_path):
        """Same semantic contract as plain PQ (set recall is the wrong
        metric when clustermates share code words): every approximate
        neighbor is a true clustermate with near-1 sim — and here with
        only n_probe of ~20 cells read."""
        from tanml_ray.pipelines.similarity import (
            build_ivfpq_index,
            knn_cosine_ivfpq,
        )

        ds, vecs = self._clustered()
        qs = {0: vecs[0], 40: vecs[40], 80: vecs[80]}
        idx = build_ivfpq_index(ds, str(tmp_path / "ivfpq"), m=8, ksub=16)
        approx = knn_cosine_ivfpq(idx, qs, k=10, n_probe=4).to_pylist()
        for qid in qs:
            hits = [r for r in approx if r["query_id"] == qid]
            assert len(hits) == 10
            cluster = qid // 40
            mates = sum(1 for r in hits if r["vec_id"] // 40 == cluster)
            assert mates >= 9, f"q{qid}: {mates}/10 clustermates"
            assert all(r["sim"] > 0.8 for r in hits
                       if r["vec_id"] // 40 == cluster)

    def _spread(self):
        """σ=1.5 cluster spread: within-cluster distances are large
        enough for residual codes to resolve (at σ=0.3 quantized sims
        tie among clustermates and exact-set recall is noise — the
        regime the clustermate test covers instead)."""
        import ray.data as rd

        rng = np.random.default_rng(11)
        centers = rng.standard_normal((10, 32)) * 5
        vecs = np.vstack([c + rng.standard_normal((40, 32)) * 1.5
                          for c in centers])
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  type=pa.list_(pa.float32()))})
        return rd.from_arrow(t).repartition(4), vecs

    def test_ivfpq_beats_plain_pq_on_residuals(self, tmp_path):
        """Residual coding must dominate raw-vector PQ at equal code
        budget on resolvable clusters: IVF-PQ's exact-set recall@10 >=
        plain PQ's on the same corpus/queries, and above an absolute
        0.5 floor (everything deterministic: fixed seed fixture,
        deterministic trainers)."""
        from collections import defaultdict

        from tanml_ray.pipelines.similarity import (
            build_ivfpq_index,
            build_pq_codebook,
            knn_cosine,
            knn_cosine_ivfpq,
            knn_cosine_pq,
            pq_encode,
        )

        ds, vecs = self._spread()
        qs = {0: vecs[0], 120: vecs[120], 280: vecs[280]}
        exact = knn_cosine(ds, qs, k=10).to_pylist()

        def rec(rows):
            a, e = defaultdict(set), defaultdict(set)
            for r in rows:
                a[r["query_id"]].add(r["vec_id"])
            for r in exact:
                e[r["query_id"]].add(r["vec_id"])
            return sum(len(a[q] & e[q]) for q in qs) / (10 * len(qs))

        cb = build_pq_codebook(ds, m=8, ksub=16)
        codes = pq_encode(ds, cb).materialize()
        plain = rec(knn_cosine_pq(codes, cb, qs, k=10).to_pylist())
        idx = build_ivfpq_index(ds, str(tmp_path / "ivfpq"), m=8, ksub=16,
                                n_centroids=10)
        ivfpq = rec(knn_cosine_ivfpq(idx, qs, k=10,
                                     n_probe=10).to_pylist())
        assert ivfpq >= plain, (ivfpq, plain)
        assert ivfpq >= 0.5, ivfpq

    def test_ivfpq_deterministic_rebuild(self, tmp_path):
        from tanml_ray.pipelines.similarity import (
            build_ivfpq_index,
            knn_cosine_ivfpq,
        )

        ds, vecs = self._clustered()
        qs = {0: vecs[0], 200: vecs[200]}
        outs = []
        for i in range(2):
            idx = build_ivfpq_index(ds, str(tmp_path / f"ivfpq{i}"),
                                    m=8, ksub=16)
            outs.append(knn_cosine_ivfpq(idx, qs, k=5,
                                         n_probe=4).to_pylist())
        assert outs[0] == outs[1]

    def test_ivfpq_prunes_cells(self, tmp_path):
        """n_probe=1 must read only the query's own cell — verified by
        the layout: every returned neighbor lives in a probed cell
        directory."""
        import os

        from tanml_ray.pipelines.similarity import (
            build_ivfpq_index,
            knn_cosine_ivfpq,
        )

        ds, vecs = self._clustered()
        idx = build_ivfpq_index(ds, str(tmp_path / "ivfpq"), m=8, ksub=16)
        cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
        assert len(cells) >= 2  # genuinely partitioned
        out = knn_cosine_ivfpq(idx, {0: vecs[0]}, k=5,
                               n_probe=1).to_pylist()
        assert len(out) == 5  # single-cell scan still fills top-k
