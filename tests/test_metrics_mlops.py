"""Metrics + mlops operator tests vs sklearn-free numpy oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds_from(tbl: pa.Table, parts: int = 4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestClassificationMetrics:
    def _make(self, n=5000, seed=3):
        rng = np.random.default_rng(seed)
        y = (rng.random(n) < 0.4).astype(np.int64)
        score = np.clip(0.3 * y + 0.4 * rng.random(n) + 0.15, 0.001, 0.999)
        return pa.table({"label": y, "score": score}), y, score

    def test_matches_numpy_oracle(self):
        from tanml_ray.pipelines.metrics import classification_metrics

        tbl, y, s = self._make()
        m = classification_metrics(_ds_from(tbl), "label", "score")
        pred = (s >= 0.5).astype(int)
        tp = int(((pred == 1) & (y == 1)).sum())
        fp = int(((pred == 1) & (y == 0)).sum())
        fn = int(((pred == 0) & (y == 1)).sum())
        assert m["accuracy"] == pytest.approx((pred == y).mean(), rel=1e-12)
        assert m["precision"] == pytest.approx(tp / (tp + fp), rel=1e-12)
        assert m["recall"] == pytest.approx(tp / (tp + fn), rel=1e-12)
        assert m["brier"] == pytest.approx(((s - y) ** 2).mean(), rel=1e-9)
        eps = 1e-15
        sc = np.clip(s, eps, 1 - eps)
        ll = -(y * np.log(sc) + (1 - y) * np.log(1 - sc)).mean()
        assert m["log_loss"] == pytest.approx(ll, rel=1e-9)

    def test_auc_exact_matches_oracle(self):
        from tanml_ray.pipelines.metrics import auc_exact

        tbl, y, s = self._make()
        auc = auc_exact(_ds_from(tbl), "label", "score")
        # numpy midrank AUC oracle
        order = np.argsort(s)
        ranks = np.empty(len(s), dtype=np.float64)
        ranks[order] = np.arange(1, len(s) + 1)
        # average ranks over ties
        import pandas as pd

        r = pd.Series(s).rank(method="average").to_numpy()
        n1, n0 = int(y.sum()), int((1 - y).sum())
        expect = (r[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
        assert auc == pytest.approx(expect, rel=1e-12)

    def test_auc_with_heavy_ties(self):
        from tanml_ray.pipelines.metrics import auc_exact

        rng = np.random.default_rng(1)
        y = (rng.random(2000) < 0.5).astype(np.int64)
        s = np.round(rng.random(2000), 1)  # only 11 distinct scores
        import pandas as pd

        r = pd.Series(s).rank(method="average").to_numpy()
        n1, n0 = int(y.sum()), int((1 - y).sum())
        expect = (r[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
        auc = auc_exact(_ds_from(pa.table({"label": y, "score": s})),
                        "label", "score")
        assert auc == pytest.approx(expect, rel=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestRegressionMetrics:
    def test_matches_numpy(self):
        from tanml_ray.pipelines.metrics import regression_metrics

        rng = np.random.default_rng(5)
        y = rng.normal(100, 20, 3000)
        p = y + rng.normal(0, 5, 3000)
        m = regression_metrics(_ds_from(pa.table({"y": y, "pred": p})), "y", "pred")
        err = p - y
        assert m["rmse"] == pytest.approx(np.sqrt((err ** 2).mean()), rel=1e-9)
        assert m["mae"] == pytest.approx(np.abs(err).mean(), rel=1e-9)
        assert m["median_ae"] == pytest.approx(np.median(np.abs(err)), rel=1e-12)
        ss_res = (err ** 2).sum()
        ss_tot = ((y - y.mean()) ** 2).sum()
        assert m["r2"] == pytest.approx(1 - ss_res / ss_tot, rel=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestTaskInference:
    def test_reference_cases(self):
        """models/registry.py:528-558 semantics."""
        from tanml_ray.pipelines.metrics import infer_task_type

        binary = pa.table({"t": [0.0, 1.0] * 50})
        assert infer_task_type(_ds_from(binary, 2), "t") == "classification"
        cont = pa.table({"t": np.random.default_rng(0).normal(0, 1, 100)})
        assert infer_task_type(_ds_from(cont, 2), "t") == "regression"
        many_int = pa.table({"t": np.arange(100).astype(np.float64)})
        assert infer_task_type(_ds_from(many_int, 2), "t") == "regression"


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_fit_recovers_clusters(self):
        from tanml_ray.pipelines.mlops import cluster_coverage, kmeans_fit

        rng = np.random.default_rng(42)
        centers_true = np.array([[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        X = np.vstack([c + rng.normal(0, 0.5, (200, 2)) for c in centers_true])
        tbl = pa.table({"x": X[:, 0], "y": X[:, 1]})
        centers = kmeans_fit(_ds_from(tbl), ["x", "y"], k=3)
        # each true center has a fitted center within 0.5
        for c in centers_true:
            assert np.min(np.linalg.norm(centers - c, axis=1)) < 0.5

        cov = cluster_coverage(_ds_from(tbl), ["x", "y"], centers, threshold=3.0)
        counts = {r["cluster"]: r["n"] for r in cov.to_pylist()}
        assert sum(counts.values()) == 600
        assert sum(r["n_ood"] for r in cov.to_pylist()) == 0

    def test_fit_partition_invariant(self):
        from tanml_ray.pipelines.mlops import kmeans_fit

        rng = np.random.default_rng(7)
        X = rng.normal(0, 1, (500, 3))
        tbl = pa.table({"a": X[:, 0], "b": X[:, 1], "c": X[:, 2]})
        c1 = kmeans_fit(_ds_from(tbl, 1), ["a", "b", "c"], k=4, max_iter=5)
        c8 = kmeans_fit(_ds_from(tbl, 8), ["a", "b", "c"], k=4, max_iter=5)
        np.testing.assert_allclose(c1, c8, rtol=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestVIF:
    def test_collinear_is_huge(self):
        """Reference test: b = 2a → VIF → inf (tests/test_analysis_metrics.py:46-83)."""
        from tanml_ray.pipelines.mlops import vif

        rng = np.random.default_rng(11)
        a = rng.normal(0, 1, 1000)
        tbl = pa.table({"a": a, "b": 2 * a, "c": rng.normal(0, 1, 1000)})
        out = vif(_ds_from(tbl), ["a", "b", "c"])
        assert out["a"] > 1000 or out["a"] == float("inf")
        assert out["b"] > 1000 or out["b"] == float("inf")
        assert out["c"] < 5

    def test_independent_near_one(self):
        from tanml_ray.pipelines.mlops import vif

        rng = np.random.default_rng(12)
        tbl = pa.table({c: rng.normal(0, 1, 2000) for c in ("a", "b", "c")})
        out = vif(_ds_from(tbl), ["a", "b", "c"])
        for v in out.values():
            assert 1.0 <= v < 1.1


@pytest.mark.usefixtures("ray_session")
class TestKnnImpute:
    def _tbl(self, n=400, seed=13):
        rng = np.random.default_rng(seed)
        return pa.table({
            "id": pa.array(np.arange(1, n + 1), type=pa.int64()),
            "v": rng.uniform(0, 50, n).round(0),
            "f1": rng.normal(0, 10, n),
            "f2": rng.normal(0, 1, n),
        })

    def test_matches_bruteforce_and_partition_invariant(self):
        import ray.data as rd

        from tanml_ray.pipelines.mlops import knn_impute

        tbl = self._tbl()
        out1 = knn_impute(rd.from_arrow(tbl).repartition(1),
                          "id", "v", ["f1", "f2"], mod=50, k=5).to_pylist()
        out8 = knn_impute(rd.from_arrow(tbl).repartition(8),
                          "id", "v", ["f1", "f2"], mod=50, k=5).to_pylist()
        assert out1 == out8 and len(out1) == 8  # ids 50,100,...,400

        # brute force oracle (sklearn-free): nearest 5 donors by
        # (round(d2,6), id), mean of their v
        df = tbl.to_pandas()
        miss = df[df.id % 50 == 0]
        donor = df[df.id % 50 != 0]
        want = {}
        for _, m in miss.iterrows():
            d2 = (m.f1 - donor.f1) ** 2 + (m.f2 - donor.f2) ** 2
            cand = donor.assign(d2r=np.round(d2, 6)).sort_values(
                ["d2r", "id"], kind="mergesort").head(5)
            want[int(m.id)] = round(float(cand.v.mean()), 6)
        assert {r["id"]: r["imputed"] for r in out1} == want

    def test_max_missing_guard(self):
        import ray.data as rd

        from tanml_ray.pipelines.mlops import knn_impute

        with pytest.raises(ValueError, match="shard-by-shard"):
            knn_impute(rd.from_arrow(self._tbl()), "id", "v", ["f1", "f2"],
                       mod=2, k=5, max_missing=10)


# ---------------------------------------------------------------------------
# embedding covariance + PCA
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_embedding_covariance_matches_numpy():
    import ray.data as rd

    from tanml_ray.pipelines.mlops import embedding_covariance

    rng = np.random.default_rng(3)
    v = rng.standard_normal((200, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(200), type=pa.int64()),
                  "embedding": pa.array([r for r in v],
                                        type=pa.list_(pa.float32()))})
    cov, n = embedding_covariance(rd.from_arrow(t).repartition(5))
    assert n == 200 and cov.shape == (8, 8)
    grid = 1 << 16
    q = np.floor(v.astype(np.float64) * grid) / grid
    want = np.cov(q, rowvar=False, ddof=1)
    assert np.allclose(cov, want, atol=1e-9)
    # exact integer stats -> partitioning cannot change the result
    cov2, _ = embedding_covariance(rd.from_arrow(t).repartition(11))
    assert np.array_equal(cov, cov2)


@pytest.mark.usefixtures("ray_session")
def test_embedding_covariance_fan_in_merge_path():
    """Many partials (64 input partitions) through small fan_in groups:
    the distributed big-int pre-merge must be bitwise-identical to the
    wide-fan_in path and to driver numpy on the quantized grid."""
    import ray.data as rd

    from tanml_ray.pipelines.mlops import embedding_covariance

    rng = np.random.default_rng(7)
    v = rng.standard_normal((5000, 6)).astype(np.float32)
    t = pa.table({"embedding": pa.array([r for r in v],
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(64)
    cov4, n = embedding_covariance(ds, fan_in=4)
    cov32, _ = embedding_covariance(ds, fan_in=32)
    assert n == 5000
    assert np.array_equal(cov4, cov32)
    grid = 1 << 16
    q = np.floor(v.astype(np.float64) * grid) / grid
    assert np.allclose(cov4, np.cov(q, rowvar=False, ddof=1), atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_pca_project_orders_variance():
    import ray.data as rd

    from tanml_ray.pipelines.mlops import pca_project

    rng = np.random.default_rng(4)
    # anisotropic cloud: dim 0 has 10x the std of the rest
    v = rng.standard_normal((300, 6))
    v[:, 0] *= 10
    t = pa.table({"vec_id": pa.array(np.arange(300), type=pa.int64()),
                  "embedding": pa.array([r for r in v.astype(np.float32)],
                                        type=pa.list_(pa.float32()))})
    out = pca_project(rd.from_arrow(t).repartition(4),
                      n_components=2).take_all()
    P = np.array([r["pc"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert P.shape == (300, 2)
    var = P.var(axis=0, ddof=1)
    assert var[0] > var[1] > 0
    # pc1 must essentially be dim 0 (the dominant direction)
    corr = np.corrcoef(P[:, 0], v[:, 0])[0, 1]
    assert abs(corr) > 0.99


@pytest.mark.usefixtures("ray_session")
def test_mutual_info_hand_checked(tmp_path):
    import os

    import pyarrow.parquet as pq

    from tanml_ray.pipelines.queries import mutual_info_orders

    # perfectly dependent columns: MI == H(X) == H(Y); V == 1
    sf = str(tmp_path)
    n_each = 50
    t = pa.table({
        "o_orderpriority": pa.array(["A"] * n_each + ["B"] * n_each),
        "o_orderstatus": pa.array(["x"] * n_each + ["y"] * n_each)})
    pq.write_table(t, os.path.join(sf, "orders.parquet"))
    r = mutual_info_orders(sf).to_pylist()[0]
    assert r["n"] == 100 and r["dof"] == 1
    assert r["h_priority"] == r["h_status"] == round(float(np.log(2)), 6)
    assert r["mi"] == round(float(np.log(2)), 6)
    assert r["cramers_v"] == 1.0
    assert r["chi2"] == 100.0

    # independent columns: MI == 0, chi2 == 0
    t2 = pa.table({
        "o_orderpriority": pa.array((["A"] * 2 + ["B"] * 2) * 25),
        "o_orderstatus": pa.array(["x", "y"] * 50)})
    pq.write_table(t2, os.path.join(sf, "orders.parquet"))
    r2 = mutual_info_orders(sf).to_pylist()[0]
    assert r2["mi"] == 0.0 and r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_ridge_path_shrinks_coefficients():
    import ray.data as rd

    from tanml_ray.pipelines.mlops import linear_fit, ridge_path

    rng = np.random.default_rng(9)
    x = rng.standard_normal(500)
    y = 3.0 * x + rng.standard_normal(500) * 0.1
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(4)
    rows = ridge_path(ds, ["x"], "y", lambdas=[0.0, 100.0, 1e6])
    assert [r["lam"] for r in rows] == [0.0, 100.0, 1e6]
    coefs = [abs(r["coef"][0]) for r in rows]
    # monotone shrinkage toward zero as lambda grows
    assert coefs[0] > coefs[1] > coefs[2]
    assert rows[0]["coef"][0] == pytest.approx(3.0, abs=0.05)
    assert rows[2]["coef"][0] == pytest.approx(0.0, abs=0.01)
    # λ=0 row equals the plain fit exactly (same stats, same solve)
    plain = linear_fit(ds, ["x"], "y")
    assert rows[0]["coef"] == plain["coef"]
    assert rows[0]["r2"] == plain["r2"]
