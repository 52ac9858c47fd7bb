"""Registry / executive roll-up / scorer actor-pool tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tanml_ray.pipelines.report import executive_rollup
from tanml_ray.registry import CheckResult, registry


class TestRegistry:
    def test_build_suite_from_config(self):
        suite = registry.build_suite([
            {"kind": "not_null", "column": "html"},
            {"kind": "timestamp_range", "column": "ts",
             "lo": "2025-01-01", "hi": "2025-04-01"},
            {"kind": "referential", "column": "lang",
             "valid_values": ["en", "de"], "name": "langs"},
            {"kind": "regex", "column": "url", "pattern": "^https?://"},
            {"kind": "extraction_match"},
        ])
        assert [c.constraint_id for c in suite] == [
            "not_null_html", "range_ts", "langs", "format_url",
            "text_extraction_match"]

    def test_unknown_kind_raises(self):
        with pytest.raises(KeyError, match="unknown constraint kind"):
            registry.build_suite([{"kind": "nope"}])

    def test_custom_registration_and_duplicate(self):
        from tanml_ray.stages.constraints import NotNull

        @registry.register("custom_test_kind")
        def _custom(column):
            return NotNull(column)

        assert "custom_test_kind" in registry.list_kinds()
        with pytest.raises(ValueError, match="duplicate"):
            registry.register("custom_test_kind")(lambda: None)

    def test_checkresult_status_validation(self):
        CheckResult("x", "pass")
        with pytest.raises(ValueError):
            CheckResult("x", "maybe")


class TestExecutiveRollup:
    def test_healthy(self):
        r = executive_rollup(
            validation_summary={"overall": "pass", "total_violations": 0,
                                "duplicate_urls": 0},
            drift_summary={"severe": 0},
            coverage_rows=[{"cluster": 0, "n": 100, "n_ood": 2}],
            train_metric=0.9, test_metric=0.88)
        assert r.status == "pass" and r.summary == "healthy"

    def test_violations_fail(self):
        r = executive_rollup(validation_summary={"overall": "fail",
                                                 "total_violations": 5,
                                                 "duplicate_urls": 1})
        assert r.status == "fail"

    def test_warning_conditions(self):
        r = executive_rollup(
            drift_summary={"severe": 3},
            coverage_rows=[{"cluster": 0, "n": 100, "n_ood": 30}],
            train_metric=0.95, test_metric=0.7)
        assert r.status == "warning"
        issues = r.report_data["issues"]
        assert any("critical drift" in i for i in issues)
        assert any("OOD" in i for i in issues)
        assert any("coverage" in i for i in issues)
        assert any("overfitting" in i for i in issues)


@pytest.mark.usefixtures("ray_session")
class TestScorerStage:
    def test_actor_pool_scoring(self):
        import ray.data as rd

        from tanml_ray.stages.scoring import ClosedFormModel, score_dataset

        rng = np.random.default_rng(0)
        X = rng.normal(0, 1, (2000, 3))
        tbl = pa.table({"a": X[:, 0], "b": X[:, 1], "c": X[:, 2]})
        model = ClosedFormModel([1.0, -2.0, 0.5], bias=0.25)
        out = score_dataset(rd.from_arrow(tbl).repartition(4), model,
                            ["a", "b", "c"], concurrency=2, batch_size=512)
        got = np.array([r["score"] for r in out.take_all()])
        # order not guaranteed → compare sorted
        expect = X @ np.array([1.0, -2.0, 0.5]) + 0.25
        np.testing.assert_allclose(np.sort(got), np.sort(expect), rtol=1e-12)

    def test_model_path_load(self, tmp_path):
        import pickle

        import ray.data as rd

        from tanml_ray.stages.scoring import ClosedFormModel, ScorerStage

        p = tmp_path / "m.pkl"
        with open(p, "wb") as f:
            pickle.dump(ClosedFormModel([2.0], bias=1.0), f)
        ds = rd.from_arrow(pa.table({"x": [1.0, 2.0, 3.0]}))
        out = ds.map_batches(
            ScorerStage,
            fn_constructor_kwargs={"model_path": str(p), "feature_cols": ["x"]},
            batch_format="pyarrow", concurrency=1).take_all()
        assert sorted(r["score"] for r in out) == [3.0, 5.0, 7.0]


@pytest.mark.usefixtures("ray_session")
class TestFullReport:
    def test_end_to_end_report(self, sf_dir, tmp_path):
        import json

        from tanml_ray.pipelines.drift import build_drift_baseline
        from tanml_ray.pipelines.report import run_full_report
        from tanml_ray.sources.pages import pages_dataset, synthesize_pages_parquet

        pages_dir = synthesize_pages_parquet(sf_dir, str(tmp_path / "pages"))
        art = str(tmp_path / "baseline.pkl")
        build_drift_baseline(pages_dataset(sf_dir), "text_len", "week").save(art)

        out = run_full_report(pages_dir, str(tmp_path / "out"),
                              baseline_artifact=art)
        # fixture has injected defects → overall fail; same-data drift → pass
        assert out["rollup"]["status"] == "fail"
        assert out["drift"]["status"] == "pass"
        assert "validation" in out["narratives"]
        assert "drift" in out["narratives"]
        on_disk = json.load(open(tmp_path / "out" / "report.json"))
        assert on_disk["rollup"]["status"] == "fail"
        assert (tmp_path / "out" / "drift.parquet").exists()
        assert (tmp_path / "out" / "violations").exists()
