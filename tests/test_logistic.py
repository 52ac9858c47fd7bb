"""Distributed IRLS logistic regression: recovers known coefficients,
partition-invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestLogisticFit:
    def _data(self, n=20_000, seed=42):
        rng = np.random.default_rng(seed)
        x1 = rng.normal(0, 1, n)
        x2 = rng.normal(0, 1, n)
        eta = 0.5 + 1.5 * x1 - 2.0 * x2
        y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(np.int64)
        return pa.table({"x1": x1, "x2": x2, "y": y})

    def test_recovers_coefficients(self):
        from tanml_ray.pipelines.mlops import logistic_fit

        out = logistic_fit(_ds(self._data()), ["x1", "x2"], "y")
        assert out["intercept"] == pytest.approx(0.5, abs=0.1)
        assert out["coef"][0] == pytest.approx(1.5, abs=0.1)
        assert out["coef"][1] == pytest.approx(-2.0, abs=0.1)
        assert out["odds_ratios"][0] == pytest.approx(np.exp(out["coef"][0]), rel=1e-12)

    def test_partition_invariant(self):
        from tanml_ray.pipelines.mlops import logistic_fit

        tbl = self._data(n=5000)
        a = logistic_fit(_ds(tbl, 1), ["x1", "x2"], "y")
        b = logistic_fit(_ds(tbl, 8), ["x1", "x2"], "y")
        np.testing.assert_allclose(a["coef"], b["coef"], rtol=1e-8)

    def test_inference_matches_local_irls(self):
        """The distributed Wald table must equal the same algebra run
        driver-side in pure numpy (coefficients, standard errors from
        the inverse Fisher information, z, two-sided p, odds ratios)."""
        import math

        from tanml_ray.pipelines.mlops import logistic_inference

        tbl = self._data(n=4000, seed=7)
        out = {r["feature"]: r
               for r in logistic_inference(_ds(tbl), ["x1", "x2"], "y",
                                           max_iter=8).to_pylist()}

        X = np.column_stack([np.ones(tbl.num_rows),
                             tbl.column("x1").to_numpy(),
                             tbl.column("x2").to_numpy()])
        y = tbl.column("y").to_numpy().astype(np.float64)
        beta = np.zeros(3)
        for _ in range(8):
            mu = 1 / (1 + np.exp(-(X @ beta)))
            W = mu * (1 - mu)
            H = X.T @ (X * W[:, None])
            delta = np.linalg.solve(H + 1e-10 * np.eye(3), X.T @ (y - mu))
            beta += delta
            if np.abs(delta).max() < 1e-8:
                break
        mu = 1 / (1 + np.exp(-(X @ beta)))
        H = X.T @ (X * (mu * (1 - mu))[:, None])
        se = np.sqrt(np.diag(np.linalg.inv(H)))
        names = ["(intercept)", "x1", "x2"]
        for i, nm in enumerate(names):
            assert out[nm]["coef"] == pytest.approx(beta[i], abs=1e-5)
            assert out[nm]["std_err"] == pytest.approx(se[i], abs=1e-5)
            z = beta[i] / se[i]
            assert out[nm]["z"] == pytest.approx(z, abs=1e-3)
            assert out[nm]["p_value"] == pytest.approx(
                math.erfc(abs(z) / math.sqrt(2)), abs=1e-6)
            assert out[nm]["odds_ratio"] == pytest.approx(np.exp(beta[i]),
                                                          rel=1e-4)
        # the planted signal is strongly significant
        assert out["x1"]["p_value"] < 1e-6 and out["x2"]["p_value"] < 1e-6
