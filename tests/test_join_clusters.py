"""Joins (broadcast + partitioned hash) and duplicate clustering."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tanml_ray.functions.collect import collect_pylist
from tanml_ray.pipelines.dedup import dedup_keep_list, dup_clusters
from tanml_ray.pipelines.join import broadcast_join, partitioned_join


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestJoins:
    def _sides(self, n=5000):
        rng = np.random.default_rng(42)
        left = pa.table({"k": rng.integers(0, 500, n),
                         "lv": rng.normal(0, 1, n)})
        right = pa.table({"k": np.arange(400),   # keys 400..499 unmatched
                          "rv": np.arange(400) * 10})
        return left, right

    def test_partitioned_matches_pandas(self):
        left, right = self._sides()
        out = pd.DataFrame(collect_pylist(
            partitioned_join(_ds(left), _ds(right, 2), "k", buckets=16)))
        expect = left.to_pandas().merge(right.to_pandas(), on="k")
        assert len(out) == len(expect)
        assert out["lv"].sum() == pytest.approx(expect["lv"].sum())
        assert set(out["k"]) == set(expect["k"])

    def test_broadcast_matches_pandas(self):
        left, right = self._sides()
        out = pd.DataFrame(collect_pylist(broadcast_join(_ds(left), right, "k")))
        expect = left.to_pandas().merge(right.to_pandas(), on="k")
        assert len(out) == len(expect)
        assert out["rv"].sum() == expect["rv"].sum()

    def test_partitioned_skewed_key(self):
        rng = np.random.default_rng(1)
        left = pa.table({"k": np.where(rng.random(10_000) < 0.9, 7,
                                       rng.integers(0, 100, 10_000)),
                         "lv": np.ones(10_000)})
        right = pa.table({"k": np.arange(100), "rv": np.arange(100)})
        out = pd.DataFrame(collect_pylist(
            partitioned_join(_ds(left), _ds(right, 2), "k", buckets=8)))
        expect = left.to_pandas().merge(right.to_pandas(), on="k")
        assert len(out) == len(expect) == 10_000

    def test_partition_invariance(self):
        left, right = self._sides(2000)
        a = sorted(collect_pylist(partitioned_join(_ds(left, 1), _ds(right, 1), "k")),
                   key=lambda r: (r["k"], r["lv"]))
        b = sorted(collect_pylist(partitioned_join(_ds(left, 8), _ds(right, 3), "k")),
                   key=lambda r: (r["k"], r["lv"]))
        assert a == b


class TestDupClusters:
    def test_transitive_components(self):
        pairs = [(1, 2), (2, 3), (10, 11), (3, 4)]
        c = dup_clusters(pairs)
        assert c[1] == c[2] == c[3] == c[4] == 1
        assert c[10] == c[11] == 10

    def test_min_root_deterministic(self):
        assert dup_clusters([(5, 9), (9, 2)])[5] == 2


@pytest.mark.usefixtures("ray_session")
class TestDedupKeepList:
    def test_keeps_first_per_cluster(self):
        tbl = pa.table({"doc_id": list(range(10))})
        pairs = pa.table({"id_a": [1, 2, 7], "id_b": [2, 3, 8],
                          "jaccard": [0.9, 0.9, 0.9]})
        kept = sorted(r["doc_id"] for r in collect_pylist(
            dedup_keep_list(_ds(tbl, 3), pairs)))
        # clusters {1,2,3} keep 1; {7,8} keep 7
        assert kept == [0, 1, 4, 5, 6, 7, 9]

    def test_distributed_matches_broadcast(self):
        """dedup_keep_list_distributed (CC labels + partitioned
        anti-join, nothing drop-set-sized on the driver) must keep
        exactly the rows the broadcast path keeps."""
        import ray.data as rd

        from tanml_ray.pipelines.dedup import dedup_keep_list_distributed

        tbl = pa.table({"doc_id": list(range(40)),
                        "text": [f"doc {i}" for i in range(40)]})
        pairs = pa.table({"id_a": [1, 2, 7, 20, 21, 30],
                          "id_b": [2, 3, 8, 21, 22, 31],
                          "jaccard": [0.9] * 6})
        want = sorted(r["doc_id"] for r in collect_pylist(
            dedup_keep_list(_ds(tbl, 4), pairs)))
        got_rows = collect_pylist(dedup_keep_list_distributed(
            _ds(tbl, 4), rd.from_arrow(pairs)))
        got = sorted(r["doc_id"] for r in got_rows)
        assert got == want
        assert all(r["text"] == f"doc {r['doc_id']}" for r in got_rows)


class TestAutoJoin:
    def _sides(self):
        left = pa.table({"k": pa.array([1, 2, 2, 3, 5], type=pa.int64()),
                         "a": ["p", "q", "r", "s", "t"]})
        right = pa.table({"k": pa.array([2, 3, 3, 4], type=pa.int64()),
                          "b": [10, 20, 30, 40]})
        return left, right

    def _norm(self, rows):
        return sorted(tuple(sorted(r.items())) for r in rows)

    def test_all_strategies_agree(self):
        from tanml_ray.pipelines.join import auto_join, partitioned_join

        left, right = self._sides()
        want = self._norm(collect_pylist(
            partitioned_join(_ds(left, 2), _ds(right, 2), "k")))
        # small right → broadcast path
        bc = self._norm(collect_pylist(
            auto_join(_ds(left, 2), _ds(right, 2), "k")))
        # budget 0 → partitioned path
        pj = self._norm(collect_pylist(
            auto_join(_ds(left, 2), _ds(right, 2), "k", broadcast_budget=0)))
        assert bc == want and pj == want
        # (the swapped small-left path is exercised by
        # test_swapped_small_left_inner, which sizes the budget
        # between the two sides)

    def test_swapped_small_left_inner(self):
        """Force the swap: right over budget, left under it — the _x/_y
        orientation must still be left == _x."""
        from tanml_ray.pipelines.join import auto_join, partitioned_join

        left = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                         "v": ["a", "b"]})
        right = pa.table({"k": pa.array(np.arange(2000) % 3, type=pa.int64()),
                          "v": [f"r{i}" for i in range(2000)]})
        budget = _ds(left, 1).materialize().size_bytes() + 1
        want = self._norm(collect_pylist(
            partitioned_join(_ds(left, 1), _ds(right, 2), "k")))
        got = self._norm(collect_pylist(
            auto_join(_ds(left, 1), _ds(right, 2), "k",
                      broadcast_budget=budget)))
        assert got == want and len(got) > 0

    def test_swap_leaves_non_collision_suffix_columns_alone(self):
        """A user column named 'pos_x' that does NOT collide across
        sides must survive the swapped path unrenamed."""
        from tanml_ray.pipelines.join import auto_join

        left = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                         "pos_x": [7, 8]})
        right = pa.table({"k": pa.array(np.arange(2000) % 3, type=pa.int64()),
                          "w": np.arange(2000)})
        budget = _ds(left, 1).materialize().size_bytes() + 1
        rows = collect_pylist(auto_join(_ds(left, 1), _ds(right, 2), "k",
                                        broadcast_budget=budget))
        assert rows and all("pos_x" in r and "pos_y" not in r for r in rows)


class TestRangeJoinCount:
    def test_matches_bruteforce_with_zero_counts(self):
        """Window counting vs an O(n·m) python oracle; left rows with
        no matches must still appear (LEFT semantics, n=0); windows
        straddling bucket boundaries count across both buckets."""
        import datetime as dt

        import ray.data as rd

        from tanml_ray.pipelines.join import range_join_count

        rng = np.random.default_rng(5)
        base = dt.date(2020, 1, 1)
        left_days = rng.integers(0, 60, 80)
        right_days = rng.integers(0, 40, 300)   # left days 40+ get zero
        left = pa.table({"k": pa.array(np.arange(80), type=pa.int64()),
                         "d": pa.array([base + dt.timedelta(int(x))
                                        for x in left_days], type=pa.date32())})
        right = pa.table({"d": pa.array(
            [dt.datetime(2020, 1, 1, 12) + dt.timedelta(int(x))
             for x in right_days], type=pa.timestamp("us"))})
        out = {r["k"]: r["n"] for r in collect_pylist(range_join_count(
            _ds(left, 4), _ds(right, 3), "d", "d", "k", window_days=7))}
        for i, ld in enumerate(left_days):
            want = int(((right_days >= ld) & (right_days < ld + 7)).sum())
            assert out[i] == want, i
        assert len(out) == 80
        assert any(v == 0 for v in out.values())

    def test_salted_matches_unsalted(self):
        """salt>1 spreads a hot bucket over sub-groups; summed partial
        counts must equal the unsalted output exactly."""
        import datetime as dt

        import ray.data as rd

        from tanml_ray.pipelines.join import range_join_count

        rng = np.random.default_rng(9)
        base = dt.date(2022, 6, 1)
        left = pa.table({"k": pa.array(np.arange(50), type=pa.int64()),
                         "d": pa.array([base + dt.timedelta(int(x))
                                        for x in rng.integers(0, 30, 50)],
                                       type=pa.date32())})
        right = pa.table({"d": pa.array([base + dt.timedelta(int(x))
                                         for x in rng.integers(0, 30, 400)],
                                        type=pa.date32())})
        plain = sorted(collect_pylist(range_join_count(
            _ds(left, 3), _ds(right, 4), "d", "d", "k", 7)),
            key=lambda r: r["k"])
        salted = sorted(collect_pylist(range_join_count(
            _ds(left, 3), _ds(right, 4), "d", "d", "k", 7, salt=4)),
            key=lambda r: r["k"])
        assert plain == salted

    def test_partition_invariance(self):
        import datetime as dt

        import ray.data as rd

        from tanml_ray.pipelines.join import range_join_count

        base = dt.date(2021, 3, 1)
        left = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                         "d": pa.array([base, base + dt.timedelta(10),
                                        base + dt.timedelta(20)],
                                       type=pa.date32())})
        right = pa.table({"d": pa.array(
            [base + dt.timedelta(i) for i in range(25)], type=pa.date32())})
        a = sorted(collect_pylist(range_join_count(
            _ds(left, 1), _ds(right, 1), "d", "d", "k", 7)),
            key=lambda r: r["k"])
        b = sorted(collect_pylist(range_join_count(
            _ds(left, 3), _ds(right, 6), "d", "d", "k", 7)),
            key=lambda r: r["k"])
        assert a == b
        assert [r["n"] for r in a] == [7, 7, 5]


class TestPartitionedAntiJoin:
    def test_matches_python_set_filter(self):
        import ray.data as rd

        from tanml_ray.pipelines.join import partitioned_anti_join

        rng = np.random.default_rng(13)
        ids = np.arange(500)
        tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                        "payload": [f"row {i}" for i in ids]})
        drop = rng.choice(500, 120, replace=False).astype(np.int64)
        # key Dataset with duplicates + keys absent from the corpus
        keys = np.concatenate([drop, drop[:30], np.array([9999, 10101])])
        keys_ds = rd.from_arrow(pa.table({"doc_id": pa.array(keys,
                                                             type=pa.int64())}))
        out = collect_pylist(partitioned_anti_join(_ds(tbl, 5), keys_ds,
                                                   "doc_id", partitions=8))
        got = sorted(r["doc_id"] for r in out)
        want = sorted(set(ids.tolist()) - set(drop.tolist()))
        assert got == want
        # non-key columns survive intact
        assert all(r["payload"] == f"row {r['doc_id']}" for r in out)

    def test_empty_key_set_keeps_all(self):
        import ray.data as rd

        from tanml_ray.pipelines.join import partitioned_anti_join

        tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64())})
        keys_ds = rd.from_arrow(pa.table({"doc_id": pa.array([],
                                                             type=pa.int64())}))
        out = sorted(r["doc_id"] for r in collect_pylist(
            partitioned_anti_join(_ds(tbl, 2), keys_ds, "doc_id")))
        assert out == [1, 2, 3]


class TestBloomFilter:
    def test_no_false_negatives_and_bounded_fp(self):
        from tanml_ray.kernels.bloom import BloomFilter

        rng = np.random.default_rng(42)
        members = rng.choice(10**9, 50_000, replace=False)
        bf = BloomFilter(capacity=50_000, fp_rate=0.01)
        bf.add(members)
        assert bf.contains(members).all()          # zero false negatives
        outsiders = np.arange(10**9 + 1, 10**9 + 100_001)
        fp = bf.contains(outsiders).mean()
        assert fp < 0.03                           # ~1% target, generous bound

    def test_merge_and_state_roundtrip(self):
        from tanml_ray.kernels.bloom import BloomFilter

        a = BloomFilter(1000)
        b = BloomFilter(1000)
        a.add(np.arange(0, 500))
        b.add(np.arange(500, 1000))
        a.merge(b)
        restored = BloomFilter.from_state(a.to_state())
        assert restored.contains(np.arange(0, 1000)).all()

    def test_string_keys(self):
        from tanml_ray.kernels.bloom import BloomFilter

        bf = BloomFilter(100)
        bf.add(np.array(["alpha", "beta"], dtype=object))
        got = bf.contains(np.array(["alpha", "gamma"], dtype=object))
        assert got[0] and not got[1]


@pytest.mark.usefixtures("ray_session")
class TestDistributedClusters:
    def test_matches_driver_union_find(self):
        """Min-label propagation (distributed) == union-find (driver):
        every node's root is the component MIN id."""
        import ray.data as rd

        from tanml_ray.pipelines.dedup import dup_clusters, dup_clusters_distributed

        rng = np.random.default_rng(21)
        # several chains + a star + isolated pairs
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12),
                 (20, 21), (20, 22), (20, 23), (30, 31)]
        pairs += [(int(a), int(a) + 1000) for a in rng.choice(500, 40, replace=False)]
        t = pa.table({"id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
                      "id_b": pa.array([p[1] for p in pairs], type=pa.int64())})
        want = dup_clusters(t)
        got = {r["id"]: r["root"]
               for r in dup_clusters_distributed(
                   rd.from_arrow(t).repartition(4)).to_pylist()}
        assert got == want
        # chain 1-2-3-4 all rooted at 1; star rooted at 20
        assert got[4] == 1 and got[23] == 20


def test_partitioned_join_outer_emits_both_unmatched_sides():
    import ray

    from tanml_ray.pipelines.join import partitioned_join

    l = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "lv": pa.array([10, 20, 30], type=pa.int64())}))
    r = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], type=pa.int64()),
        "rv": pa.array([200, 300, 400], type=pa.int64())}))
    rows = partitioned_join(l, r, "k", buckets=4, how="outer").take_all()
    got = {int(x["k"]): (x["lv"], x["rv"]) for x in rows}
    assert len(rows) == 4
    assert got[1][0] == 10 and (got[1][1] is None or got[1][1] != got[1][1])
    assert got[2] == (20, 200) and got[3] == (30, 300)
    assert got[4][1] == 400 and (got[4][0] is None or got[4][0] != got[4][0])


def test_partitioned_join_preserves_int64_above_2_53(ray_session):
    # the pandas-merge bucket path promoted null-padded int64 columns to
    # float64, corrupting 64-bit hash-derived ids; the arrow-join path
    # must keep them bit-exact (left join forces null padding)
    import ray.data as rd

    from tanml_ray.pipelines.join import partitioned_join

    big = (1 << 62) + 12345                     # not representable in f64
    l = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "hash_id": pa.array([big, big + 1, big + 2], type=pa.int64())}))
    r = rd.from_arrow(pa.table({
        "k": pa.array([2], type=pa.int64()),
        "payload": pa.array([big + 7], type=pa.int64())}))
    out = partitioned_join(l, r, key="k", how="left", buckets=4)
    t = pa.Table.from_pylist(out.take_all())
    got = {r_["k"]: r_ for r_ in t.to_pylist()}
    assert got[1]["hash_id"] == big and got[3]["hash_id"] == big + 2
    assert got[2]["payload"] == big + 7
    assert got[1]["payload"] is None and got[3]["payload"] is None
    # schema stays integral end-to-end
    assert pa.types.is_integer(
        out.schema().base_schema.field("hash_id").type)


@pytest.mark.usefixtures("ray_session")
class TestSkewJoin:
    """skew_join must equal a plain inner join regardless of which
    keys go hot, and the hot/cold routing must be exercised."""

    def _sides(self):
        rng = np.random.default_rng(7)
        # Zipf-ish: key 0 holds ~40% of rows, keys 1-2 ~15% each,
        # a long tail of 100 cold keys, plus some null keys.
        keys = np.concatenate([
            np.zeros(2000, dtype=np.int64),
            np.full(750, 1), np.full(750, 2),
            rng.integers(3, 103, 1500)])
        rng.shuffle(keys)
        left = pa.table({
            "k": pa.array(list(keys[:-10]) + [None] * 10,
                          type=pa.int64()),
            "lv": np.arange(len(keys), dtype=np.int64)})
        right = pa.table({"k": np.arange(0, 90, dtype=np.int64),
                          "rv": np.arange(0, 90, dtype=np.int64) * 7})
        return left, right

    def _expect(self, left, right):
        return (left.to_pandas().dropna(subset=["k"])
                .merge(right.to_pandas(), on="k"))

    def test_matches_plain_inner_join(self):
        from tanml_ray.pipelines.join import skew_join

        left, right = self._sides()
        out = pd.DataFrame(collect_pylist(
            skew_join(_ds(left), _ds(right, 2), "k",
                      buckets=8, hot_k=3)))
        expect = self._expect(left, right)
        assert len(out) == len(expect)
        assert out["lv"].sum() == expect["lv"].sum()
        assert (out.groupby("k")["rv"].sum().sort_index()
                .equals(expect.groupby("k")["rv"].sum().sort_index()))

    def test_hot_path_engaged_and_cold_only_fallback(self):
        from tanml_ray.pipelines.join import skew_join

        left, right = self._sides()
        expect = self._expect(left, right)
        # hot_min_count above every key count -> pure partitioned path
        cold_only = pd.DataFrame(collect_pylist(
            skew_join(_ds(left), _ds(right, 2), "k", buckets=8,
                      hot_k=3, hot_min_count=10_000_000)))
        assert len(cold_only) == len(expect)
        # hot_min_count=1 with hot_k covering EVERY key -> broadcast-
        # dominant path; result identical
        all_hot = pd.DataFrame(collect_pylist(
            skew_join(_ds(left), _ds(right, 2), "k", buckets=8,
                      hot_k=200, hot_min_count=1)))
        assert len(all_hot) == len(expect)
        assert all_hot["lv"].sum() == expect["lv"].sum()

    def test_partition_invariance(self):
        from tanml_ray.pipelines.join import skew_join

        left, right = self._sides()
        a = pd.DataFrame(collect_pylist(
            skew_join(_ds(left, 2), _ds(right, 1), "k",
                      buckets=4, hot_k=2)))
        b = pd.DataFrame(collect_pylist(
            skew_join(_ds(left, 9), _ds(right, 3), "k",
                      buckets=16, hot_k=2)))
        key = ["k", "lv", "rv"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a[key].equals(b[key])

    def test_rejects_outer(self):
        from tanml_ray.pipelines.join import skew_join

        left, right = self._sides()
        with pytest.raises(ValueError, match="inner"):
            skew_join(_ds(left), _ds(right), "k", how="left")


@pytest.mark.usefixtures("ray_session")
class TestNullableKeyBucketing:
    """Regression: a null-bearing int64 key column used to round-trip
    through to_numpy as float64 inside partitioned_join's bucket tag,
    so the same key hashed to DIFFERENT buckets depending on which
    side carried nulls — silently unmatched rows."""

    def test_nullable_left_inner(self):
        left = pa.table({"k": pa.array([1, 2, 3, None, 2, 3],
                                       type=pa.int64()),
                         "lv": list(range(6))})
        right = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                          "rv": [10, 20, 30]})
        out = pd.DataFrame(collect_pylist(
            partitioned_join(_ds(left, 2), _ds(right, 2), "k",
                             buckets=7)))
        expect = (left.to_pandas().dropna(subset=["k"])
                  .merge(right.to_pandas(), on="k"))
        assert len(out) == len(expect) == 5
        assert out["rv"].sum() == expect["rv"].sum()

    def test_nullable_left_outer_keeps_null_rows(self):
        left = pa.table({"k": pa.array([1, None, 2], type=pa.int64()),
                         "lv": [0, 1, 2]})
        right = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                          "rv": [10, 20]})
        out = pd.DataFrame(collect_pylist(
            partitioned_join(_ds(left, 2), _ds(right, 1), "k",
                             buckets=5, how="left")))
        assert len(out) == 3
        assert out.loc[out["lv"] == 1, "rv"].isna().all()
        assert out.loc[out["lv"] == 0, "rv"].iloc[0] == 10


@pytest.mark.usefixtures("ray_session")
class TestTriangleCounts:
    """Distributed degree-ordered node-iterator vs brute force."""

    def _brute(self, edges):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        from collections import Counter

        tri = Counter()
        seen = set()
        for a, b in edges:
            for c in adj[a] & adj[b]:
                t = tuple(sorted((a, b, c)))
                if t not in seen:
                    seen.add(t)
                    tri.update(t)
        return dict(tri)

    def _run(self, edges, parts=3):
        import ray.data as rd

        from tanml_ray.pipelines.queries import triangle_counts

        tbl = pa.table({"a": [e[0] for e in edges],
                        "b": [e[1] for e in edges]})
        out = triangle_counts(rd.from_arrow(tbl).repartition(parts))
        return {r["host"]: int(r["n"]) for r in out.take_all()}

    def test_k4_plus_path(self):
        # K4 on a,b,c,d: 4 triangles, each vertex in 3; path x-y-z: none
        k4 = [("a", "b"), ("a", "c"), ("a", "d"),
              ("b", "c"), ("b", "d"), ("c", "d")]
        path = [("x", "y"), ("y", "z")]
        got = self._run(k4 + path)
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
        assert got == self._brute(k4 + path)

    def test_hub_with_rim_and_partition_invariance(self):
        # wheel: hub h connected to rim r0..r5 (cycle) -> 6 triangles,
        # hub in all 6, each rim vertex in 2
        rim = [f"r{i}" for i in range(6)]
        edges = [("h", r) for r in rim]
        edges += [(min(rim[i], rim[(i + 1) % 6]),
                   max(rim[i], rim[(i + 1) % 6])) for i in range(6)]
        expect = self._brute(edges)
        assert expect["h"] == 6
        assert self._run(edges, parts=1) == expect
        assert self._run(edges, parts=7) == expect
