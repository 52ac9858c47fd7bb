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
