"""Estimator registry + distributed multivariate OLS: coefficient
recovery, partition invariance, registry contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestLinearFit:
    def _data(self, n=20_000, seed=4, noise=0.5):
        rng = np.random.default_rng(seed)
        x1 = rng.normal(0, 2, n)
        x2 = rng.normal(0, 1, n)
        y = 3.0 + 1.5 * x1 - 2.5 * x2 + rng.normal(0, noise, n)
        return pa.table({"x1": x1, "x2": x2, "y": y})

    def test_recovers_coefficients(self):
        from tanml_ray.pipelines.mlops import linear_fit

        out = linear_fit(_ds(self._data()), ["x1", "x2"], "y")
        assert out["intercept"] == pytest.approx(3.0, abs=0.05)
        assert out["coef"][0] == pytest.approx(1.5, abs=0.05)
        assert out["coef"][1] == pytest.approx(-2.5, abs=0.05)
        assert out["r2"] > 0.9
        assert out["n"] == 20_000

    def test_matches_numpy_lstsq_exactly(self):
        from tanml_ray.pipelines.mlops import linear_fit

        tbl = self._data(n=3000)
        out = linear_fit(_ds(tbl, 1), ["x1", "x2"], "y")
        X = np.column_stack([np.ones(3000),
                             tbl.column("x1").to_numpy(),
                             tbl.column("x2").to_numpy()])
        y = tbl.column("y").to_numpy()
        beta = np.linalg.solve(X.T @ X, X.T @ y)
        assert out["intercept"] == pytest.approx(beta[0], rel=1e-9)
        assert out["coef"][0] == pytest.approx(beta[1], rel=1e-9)

    def test_partition_invariant(self):
        from tanml_ray.pipelines.mlops import linear_fit

        tbl = self._data(n=5000)
        a = linear_fit(_ds(tbl, 1), ["x1", "x2"], "y")
        b = linear_fit(_ds(tbl, 8), ["x1", "x2"], "y")
        assert a["intercept"] == pytest.approx(b["intercept"], rel=1e-12)
        assert a["coef"] == pytest.approx(b["coef"], rel=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestEstimatorRegistry:
    def test_fit_and_predict_each_family(self):
        from tanml_ray.models import ESTIMATORS

        assert ESTIMATORS.list_names() == ["boosted_stumps", "cart_stump",
                                           "gaussian_nb",
                                           "kmeans_lloyd", "knn_classifier",
                                           "lda_closed_form",
                                           "linear_closed_form",
                                           "logistic_irls",
                                           "multinomial_nb",
                                           "poisson_newton",
                                           "qda_closed_form"]
        rng = np.random.default_rng(8)
        n = 4000
        x1 = rng.normal(0, 1, n)
        x2 = rng.normal(0, 1, n)
        y_reg = 1.0 + 2.0 * x1 - x2 + rng.normal(0, 0.3, n)
        eta = 0.5 + 2.0 * x1
        y_cls = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(np.int64)
        t = pa.table({"x1": x1, "x2": x2, "y_reg": y_reg, "y_cls": y_cls})
        ds = _ds(t)

        lin = ESTIMATORS.fit("linear_closed_form", ds, ["x1", "x2"], "y_reg")
        pred = lin.predict(np.array([[1.0, 0.0]]))
        assert pred[0] == pytest.approx(3.0, abs=0.2)
        assert lin.fit_info["r2"] > 0.9

        log = ESTIMATORS.fit("logistic_irls", ds, ["x1", "x2"], "y_cls")
        p_hi = log.predict(np.array([[2.0, 0.0]]))[0]
        p_lo = log.predict(np.array([[-2.0, 0.0]]))[0]
        assert p_hi > 0.8 > 0.2 > p_lo

        km = ESTIMATORS.fit("kmeans_lloyd", ds, ["x1", "x2"], k=4)
        labels = km.predict(np.column_stack([x1, x2])[:100])
        assert set(np.unique(labels)) <= {0.0, 1.0, 2.0, 3.0}

        nb = ESTIMATORS.fit("gaussian_nb", ds, ["x1", "x2"], "y_cls")
        s_hi = nb.predict(np.array([[2.0, 0.0]]))[0]
        s_lo = nb.predict(np.array([[-2.0, 0.0]]))[0]
        assert s_hi > 0.0 > s_lo   # log posterior odds separate classes

    def test_gaussian_nb_matches_numpy_and_partitioning(self):
        """Distributed sufficient-statistics NB == driver-side numpy NB
        exactly (up to fp sum order), invariant to partition count."""
        from tanml_ray.models import ESTIMATORS

        rng = np.random.default_rng(17)
        n = 3000
        x1 = rng.normal(0, 1, n)
        x2 = rng.normal(0, 2, n)
        y = (x1 + 0.5 * x2 + rng.normal(0, 1, n) > 0).astype(np.int64)
        t = pa.table({"x1": x1, "x2": x2, "y": y})

        m3 = ESTIMATORS.fit("gaussian_nb", _ds(t, parts=3), ["x1", "x2"], "y")
        m11 = ESTIMATORS.fit("gaussian_nb", _ds(t, parts=11), ["x1", "x2"], "y")

        X = np.column_stack([x1, x2])
        mu = np.stack([X[y == c].mean(axis=0) for c in (0, 1)])
        var = np.stack([X[y == c].var(axis=0) for c in (0, 1)])
        var += 1e-9 * var.max()
        assert m3.means == pytest.approx(mu, rel=1e-9)
        assert m3.vars == pytest.approx(var, rel=1e-6)
        assert m3.priors[1] == pytest.approx((y == 1).mean(), rel=1e-12)
        # partition invariance of predictions
        q = np.array([[0.3, -1.2], [-0.7, 0.4], [2.0, 2.0]])
        assert m3.predict(q) == pytest.approx(m11.predict(q), rel=1e-9)

        # matches the exact closed-form NB log-odds on a probe point
        def ll(xrow, c):
            return (-0.5 * (np.log(2 * np.pi * var[c])
                            + (xrow - mu[c]) ** 2 / var[c])).sum()
        pri = [(y == 0).mean(), (y == 1).mean()]
        want = np.log(pri[1]) - np.log(pri[0]) + ll(q[0], 1) - ll(q[0], 0)
        assert m3.predict(q[:1])[0] == pytest.approx(want, rel=1e-9)

    def test_unknown_and_duplicate_rejected(self):
        from tanml_ray.models import ESTIMATORS

        with pytest.raises(KeyError, match="unknown estimator"):
            ESTIMATORS.get("gradient_boosting")
        with pytest.raises(ValueError, match="duplicate"):
            ESTIMATORS.register("logistic_irls", task="classification")(lambda *a: None)


@pytest.mark.usefixtures("ray_session")
class TestBoostedStumps:
    def _ds(self, X, y, parts=4):
        import ray.data as rd

        cols = {f"x{j}": X[:, j] for j in range(X.shape[1])}
        cols["y"] = y
        return rd.from_arrow(pa.table(cols)).repartition(parts)

    def test_recovers_step_function(self):
        """A single-threshold step target is representable by stumps —
        after a few rounds the fit must be near-exact on train."""
        from tanml_ray.pipelines.mlops import boosted_stumps_fit

        rng = np.random.default_rng(5)
        X = rng.uniform(0, 10, (2000, 2))
        y = np.where(X[:, 0] < 4.0, -3.0, 7.0)
        # residual error is bounded by histogram quantization (rows in
        # the one bin straddling the true threshold): ~bin_width/range
        # of the rows × the step gap — so more bins must mean less error
        m32 = boosted_stumps_fit(self._ds(X, y), ["x0", "x1"], "y",
                                 n_rounds=24, lr=0.5, n_bins=32)
        m128 = boosted_stumps_fit(self._ds(X, y), ["x0", "x1"], "y",
                                  n_rounds=24, lr=0.5, n_bins=128)
        e32 = np.abs(m32.predict(X) - y).mean()
        e128 = np.abs(m128.predict(X) - y).mean()
        assert e32 < 0.35   # 32 bins: width 0.31 straddle floor
        assert e128 < 0.12  # 4× bins → ~4× smaller floor
        assert e128 < e32
        # first split must be on x0
        assert m32.stumps[0][0] == 0

    def test_nonlinearity_beats_linear(self):
        """On the additive-but-nonlinear y = |x0| (symmetric → zero
        linear signal), the stump ensemble must fit far better than
        the best linear model (which collapses to ~constant)."""
        from tanml_ray.pipelines.mlops import boosted_stumps_fit, linear_fit

        rng = np.random.default_rng(6)
        X = rng.uniform(-3, 3, (3000, 2))
        y = np.abs(X[:, 0])
        ds = self._ds(X, y)
        m = boosted_stumps_fit(ds, ["x0", "x1"], "y", n_rounds=40, lr=0.6)
        lf = linear_fit(ds, ["x0", "x1"], "y")
        lin_pred = (lf["intercept"] + X @ np.asarray(lf["coef"]))
        sse_tree = float(((m.predict(X) - y) ** 2).sum())
        sse_lin = float(((lin_pred - y) ** 2).sum())
        assert sse_tree < 0.1 * sse_lin

    def test_partition_invariant_and_deterministic(self):
        from tanml_ray.pipelines.mlops import boosted_stumps_fit

        rng = np.random.default_rng(7)
        X = rng.normal(0, 2, (1500, 3))
        y = X[:, 0] - 2 * np.abs(X[:, 1]) + rng.normal(0, 0.1, 1500)
        m1 = boosted_stumps_fit(self._ds(X, y, parts=2),
                                ["x0", "x1", "x2"], "y", n_rounds=8)
        m2 = boosted_stumps_fit(self._ds(X, y, parts=11),
                                ["x0", "x1", "x2"], "y", n_rounds=8)
        # split STRUCTURE (feature, threshold) is layout-exact — edges
        # come from exact min/max; leaf values are float partial sums,
        # layout-stable to ~1 ulp
        assert m1.base == pytest.approx(m2.base, rel=1e-12)
        assert [(j, t) for j, t, _, _ in m1.stumps] == \
            [(j, t) for j, t, _, _ in m2.stumps]
        np.testing.assert_allclose(
            [(lv, rv) for _, _, lv, rv in m1.stumps],
            [(lv, rv) for _, _, lv, rv in m2.stumps], rtol=1e-9)

    def test_registry_integration(self):
        from tanml_ray.models import ESTIMATORS, BoostedStumpsModel

        rng = np.random.default_rng(8)
        X = rng.uniform(0, 1, (500, 2))
        y = np.where(X[:, 1] < 0.5, 0.0, 1.0)
        m = ESTIMATORS.fit("boosted_stumps", self._ds(X, y),
                           ["x0", "x1"], "y", n_rounds=6)
        assert isinstance(m, BoostedStumpsModel)
        assert m.fit_info["n_stumps"] <= 6
        assert ((m.predict(X) > 0.5) == (y == 1.0)).mean() > 0.97


@pytest.mark.usefixtures("ray_session")
class TestPoissonFit:
    def test_recovers_rates_and_partition_invariance(self):
        """Converged Newton Poisson recovers the generating log-rates;
        the fit is partition-count invariant (same Newton trajectory up
        to fp sum order)."""
        from tanml_ray.models import ESTIMATORS
        from tanml_ray.pipelines.mlops import poisson_fit

        rng = np.random.default_rng(11)
        n = 6000
        x1 = rng.uniform(0, 1, n)
        x2 = rng.uniform(0, 1, n)
        lam = np.exp(0.5 + 1.2 * x1 - 0.8 * x2)
        y = rng.poisson(lam).astype(np.float64)
        t = pa.table({"x1": x1, "x2": x2, "y": y})

        out = poisson_fit(_ds(t, parts=4), ["x1", "x2"], "y")
        assert out["intercept"] == pytest.approx(0.5, abs=0.1)
        assert out["coef"][0] == pytest.approx(1.2, abs=0.15)
        assert out["coef"][1] == pytest.approx(-0.8, abs=0.15)
        assert out["n_iter"] < 8    # converged before the cap

        out9 = poisson_fit(_ds(t, parts=9), ["x1", "x2"], "y")
        assert out9["intercept"] == pytest.approx(out["intercept"], rel=1e-8)
        assert out9["coef"] == pytest.approx(out["coef"], rel=1e-8)

        # registry contract: predict returns expected counts exp(eta)
        m = ESTIMATORS.fit("poisson_newton", _ds(t, parts=4),
                           ["x1", "x2"], "y")
        pred = m.predict(np.array([[0.5, 0.5]]))[0]
        assert pred == pytest.approx(np.exp(0.5 + 1.2 * 0.5 - 0.8 * 0.5),
                                     rel=0.1)
        assert (m.predict(np.array([[1.0, 0.0]]))[0]
                > m.predict(np.array([[0.0, 1.0]]))[0])


@pytest.mark.usefixtures("ray_session")
class TestLDAAndKnn:
    def _cls_data(self, n=4000, seed=23):
        """Integer-valued features (the LDA/kNN exactness convention)
        with a linearly separable-ish class structure."""
        rng = np.random.default_rng(seed)
        y = (rng.random(n) < 0.4).astype(np.int64)
        x1 = np.rint(rng.normal(0, 40, n) + 120 * y).astype(np.int64)
        x2 = np.rint(rng.normal(0, 60, n) - 80 * y).astype(np.int64)
        ids = np.arange(1, n + 1, dtype=np.int64)
        return pa.table({"id": ids, "x1": x1, "x2": x2, "y": y})

    def test_lda_matches_numpy_and_partitioning(self):
        from tanml_ray.models import ESTIMATORS

        t = self._cls_data()
        m3 = ESTIMATORS.fit("lda_closed_form", _ds(t, parts=3),
                            ["x1", "x2"], "y")
        m11 = ESTIMATORS.fit("lda_closed_form", _ds(t, parts=11),
                             ["x1", "x2"], "y")
        # integer sufficient statistics → bit-identical across partitionings
        assert m3.w.tolist() == m11.w.tolist()
        assert m3.b == m11.b

        X = np.column_stack([t.column("x1").to_numpy(),
                             t.column("x2").to_numpy()]).astype(np.float64)
        y = t.column("y").to_numpy()
        mu0, mu1 = X[y == 0].mean(axis=0), X[y == 1].mean(axis=0)
        X0, X1 = X[y == 0] - mu0, X[y == 1] - mu1
        cov = (X0.T @ X0 + X1.T @ X1) / (len(y) - 2)
        w = np.linalg.solve(cov, mu1 - mu0)
        b = -0.5 * w @ (mu0 + mu1) + np.log((y == 1).sum() / (y == 0).sum())
        assert m3.w == pytest.approx(w, rel=1e-9)
        assert m3.b == pytest.approx(b, rel=1e-9)
        # the discriminant separates the classes on the training means
        assert m3.predict(mu1[None, :])[0] > 0 > m3.predict(mu0[None, :])[0]

    def test_qda_matches_numpy_and_partitioning(self):
        from tanml_ray.models import ESTIMATORS

        t = self._cls_data(n=3500, seed=41)
        m3 = ESTIMATORS.fit("qda_closed_form", _ds(t, parts=3),
                            ["x1", "x2"], "y")
        m11 = ESTIMATORS.fit("qda_closed_form", _ds(t, parts=11),
                             ["x1", "x2"], "y")
        q = np.array([[50.0, -30.0], [0.0, 0.0], [120.0, -80.0]])
        # integer suffstats → bit-identical fit across partitionings
        assert m3.predict(q).tolist() == m11.predict(q).tolist()

        X = np.column_stack([t.column("x1").to_numpy(),
                             t.column("x2").to_numpy()]).astype(np.float64)
        y = t.column("y").to_numpy()
        mus = [X[y == c].mean(axis=0) for c in (0, 1)]
        covs = [np.cov(X[y == c].T, ddof=1) for c in (0, 1)]
        pri = [(y == c).sum() for c in (0, 1)]

        def want(xrow):
            out = np.log(pri[1] / pri[0])
            for c, sgn in ((1, -0.5), (0, 0.5)):
                d = xrow - mus[c]
                out += sgn * (np.linalg.slogdet(covs[c])[1]
                              + d @ np.linalg.solve(covs[c], d))
            return out

        for i in range(len(q)):
            assert m3.predict(q[i:i + 1])[0] == pytest.approx(want(q[i]),
                                                              rel=1e-9)
        # quadratic model separates the class means like LDA does
        assert m3.predict(mus[1][None, :])[0] > 0 > m3.predict(mus[0][None, :])[0]

    def test_multinomial_nb_matches_closed_form_and_partitioning(self):
        from tanml_ray.models import ESTIMATORS

        rng = np.random.default_rng(13)
        n = 3000
        y = (rng.random(n) < 0.3).astype(np.int64)
        # class 1 draws higher x1 counts, class 0 higher x2
        x1 = rng.poisson(3 + 5 * y)
        x2 = rng.poisson(8 - 4 * y)
        t = pa.table({"x1": x1.astype(np.int64), "x2": x2.astype(np.int64),
                      "y": y})
        m3 = ESTIMATORS.fit("multinomial_nb", _ds(t, 3), ["x1", "x2"], "y")
        m11 = ESTIMATORS.fit("multinomial_nb", _ds(t, 11), ["x1", "x2"], "y")
        assert m3.dlt.tolist() == m11.dlt.tolist()   # bit-identical fit
        assert m3.const == m11.const

        T = np.array([[x1[y == c].sum(), x2[y == c].sum()] for c in (0, 1)],
                     dtype=np.float64)
        lt = np.log(T + 1.0) - np.log(T.sum(axis=1, keepdims=True) + 2.0)
        assert m3.dlt == pytest.approx(lt[1] - lt[0], rel=1e-12)
        # a high-x1 count vector votes class 1, high-x2 votes class 0
        assert m3.predict(np.array([[20.0, 1.0]]))[0] > 0
        assert m3.predict(np.array([[1.0, 20.0]]))[0] < 0

    def test_multinomial_nb_rejects_negative_counts(self):
        from tanml_ray.models import ESTIMATORS

        t = pa.table({"x1": np.array([-1, 2, 3], dtype=np.int64),
                      "x2": np.ones(3, dtype=np.int64),
                      "y": np.array([0, 1, 0], dtype=np.int64)})
        with pytest.raises(Exception, match="nonnegative"):
            ESTIMATORS.fit("multinomial_nb", _ds(t, 1), ["x1", "x2"], "y")

    def test_lda_degenerate_labels_raise(self):
        from tanml_ray.models import ESTIMATORS

        t = pa.table({"x1": np.arange(10, dtype=np.int64),
                      "x2": np.arange(10, dtype=np.int64) * 2,
                      "y": np.zeros(10, dtype=np.int64)})
        with pytest.raises(ValueError, match="degenerate LDA"):
            ESTIMATORS.fit("lda_closed_form", _ds(t, 2), ["x1", "x2"], "y")

    def test_knn_classify_matches_bruteforce_and_partitioning(self):
        from tanml_ray.pipelines.mlops import knn_classify

        t = self._cls_data(n=2500, seed=31)
        out3 = knn_classify(_ds(t, 3), "id", "y", ["x1", "x2"],
                            test_mod=97, k=5).to_pylist()
        out9 = knn_classify(_ds(t, 9), "id", "y", ["x1", "x2"],
                            test_mod=97, k=5).to_pylist()
        assert out3 == out9          # partition-invariant neighbor set

        ids = t.column("id").to_numpy()
        X = np.column_stack([t.column("x1").to_numpy(),
                             t.column("x2").to_numpy()]).astype(np.int64)
        y = t.column("y").to_numpy()
        tst = ids % 97 == 0
        want = []
        for tid in ids[tst]:
            q = X[ids == tid][0]
            d2 = ((X[~tst] - q) ** 2).sum(axis=1)
            order = np.lexsort((ids[~tst], d2))[:5]
            n_pos = int(y[~tst][order].sum())
            want.append({"id": int(tid), "n_pos": n_pos,
                         "pred": int(n_pos * 2 > 5)})
        assert out3 == want

    def test_knn_classify_tie_break_is_deterministic(self):
        """Duplicate feature rows at the k boundary: the global
        (d², train id) order must pick the SMALLEST train ids."""
        from tanml_ray.pipelines.mlops import knn_classify

        # test row id=10 at (0,0); 8 train rows all at distance 1,
        # labels chosen so the vote depends on which 5 survive
        ids = np.array([10, 1, 2, 3, 4, 5, 6, 7, 8], dtype=np.int64)
        x1 = np.array([0, 1, 1, 1, 1, -1, -1, -1, -1], dtype=np.int64)
        x2 = np.zeros(9, dtype=np.int64)
        y = np.array([0, 1, 1, 1, 0, 0, 0, 0, 0], dtype=np.int64)
        t = pa.table({"id": ids, "x1": x1, "x2": x2, "y": y})
        for parts in (1, 4):
            out = knn_classify(_ds(t, parts), "id", "y", ["x1", "x2"],
                               test_mod=10, k=5).to_pylist()
            # nearest 5 by (d2=1, id): ids 1..5 → labels 1,1,1,0,0 → pred 1
            assert out == [{"id": 10, "n_pos": 3, "pred": 1}]

    def test_knn_registry_entry_predicts(self):
        from tanml_ray.models import ESTIMATORS

        t = self._cls_data(n=1200, seed=7)
        m = ESTIMATORS.fit("knn_classifier", _ds(t, 4), ["x1", "x2"], "y",
                           id_col="id", k=5)
        X = np.column_stack([t.column("x1").to_numpy(),
                             t.column("x2").to_numpy()]).astype(np.float64)
        y = t.column("y").to_numpy()
        mu0, mu1 = X[y == 0].mean(axis=0), X[y == 1].mean(axis=0)
        # class-mean probes vote overwhelmingly for their own class
        assert m.predict(mu1[None, :])[0] > 0.5
        assert m.predict(mu0[None, :])[0] < 0.5


class TestCartStump:
    def test_finds_planted_split_exactly(self, ray_session):
        from tanml_ray.models import ESTIMATORS

        n = 2000
        f1 = np.arange(n) % 10                 # signal: y = f1 >= 6
        f2 = (np.arange(n) * 7) % 13           # noise
        y = (f1 >= 6).astype(np.int64)
        t = pa.table({"f1": pa.array(f1, type=pa.int64()),
                      "f2": pa.array(f2, type=pa.int64()),
                      "y": pa.array(y, type=pa.int64())})
        m = ESTIMATORS.fit("cart_stump", _ds(t), ["f1", "f2"], "y")
        assert m.fit_info["feature"] == "f1"
        assert m.fit_info["threshold"] == 5
        assert m.fit_info["errors"] == 0
        assert m.fit_info["train_acc"] == 1.0
        pred = m.predict(np.array([[3, 0], [8, 0]]))
        assert pred.tolist() == [0.0, 1.0]

    def test_tiebreak_is_deterministic(self, ray_session):
        from tanml_ray.models import ESTIMATORS

        # two identical features -> identical error curves; the
        # (errors, feature, threshold) tiebreak must pick the
        # lexicographically first feature and smallest threshold
        v = np.arange(100) % 4
        y = (v >= 2).astype(np.int64)
        t = pa.table({"b_feat": pa.array(v, type=pa.int64()),
                      "a_feat": pa.array(v, type=pa.int64()),
                      "y": pa.array(y, type=pa.int64())})
        m = ESTIMATORS.fit("cart_stump", _ds(t), ["b_feat", "a_feat"], "y")
        assert m.fit_info["feature"] == "a_feat"
        assert m.fit_info["threshold"] == 1
