"""Exact distributed quantiles vs numpy; IQR summary; empty-input edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestExactQuantiles:
    def test_matches_numpy_linear(self):
        from tanml_ray.stages.quantiles import exact_quantiles

        rng = np.random.default_rng(42)
        x = rng.normal(100, 25, 7001)
        got = exact_quantiles(_ds(pa.table({"v": x})), "v", [0.25, 0.5, 0.75, 0.99])
        for q, v in got.items():
            assert v == pytest.approx(np.quantile(x, q), rel=1e-12), q

    def test_small_n(self):
        from tanml_ray.stages.quantiles import exact_quantiles

        got = exact_quantiles(_ds(pa.table({"v": [3.0, 1.0, 2.0]}), 2), "v", [0.5])
        assert got[0.5] == 2.0

    def test_iqr_summary(self):
        from tanml_ray.stages.quantiles import iqr_outlier_summary

        rng = np.random.default_rng(1)
        x = np.concatenate([rng.normal(0, 1, 5000), [50.0, -50.0]])
        s = iqr_outlier_summary(_ds(pa.table({"v": x})), "v")
        assert s["n"] == 5002
        assert s["n_outliers"] >= 2
        q1, q3 = np.quantile(x, 0.25), np.quantile(x, 0.75)
        assert s["q1"] == pytest.approx(q1, rel=1e-12)
        assert s["iqr_hi"] == pytest.approx(q3 + 1.5 * (q3 - q1), rel=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestEmptyInputs:
    def test_profile_empty_table(self):
        from tanml_ray.stages.profile import profile_dataset

        empty = pa.table({"a": pa.array([], type=pa.float64())})
        prof = profile_dataset(_ds(empty, 1), columns=["a"])
        assert prof["a"]["count"] == 0
        assert prof["a"]["null_count"] == 0
        assert prof["a"]["approx_distinct"] == 0

    def test_constraints_empty_batch(self):
        from tanml_ray.sources.pages import PAGES_SCHEMA
        from tanml_ray.stages.constraints import (
            default_pages_constraints,
            evaluate_constraints,
        )

        empty = PAGES_SCHEMA.empty_table()
        table, counts = evaluate_constraints(empty, default_pages_constraints())
        assert table.num_rows == 0
        assert all(v == 0 for v in counts.values())

    def test_dedup_empty(self):
        from tanml_ray.pipelines.dedup import minhash_lsh_pairs

        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "text": pa.array([], type=pa.string())})
        out = minhash_lsh_pairs(_ds(empty, 1))
        assert out.num_rows == 0
