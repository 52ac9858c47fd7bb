"""Narrative layer: reference band thresholds verbatim
(ui/narratives.py), rendered over engine artifact shapes."""

from __future__ import annotations

from tanml_ray.pipelines.narratives import (
    render_report_narratives,
    story_drift,
    story_features,
    story_overfitting,
    story_performance,
    story_stress,
    story_validation,
)


class TestPerformanceBands:
    def test_auc_bands(self):
        assert "excellent" in story_performance({"roc_auc": 0.95}, "classification")
        assert "good" in story_performance({"roc_auc": 0.8}, "classification")
        assert "moderate" in story_performance({"roc_auc": 0.65}, "classification")
        assert "weak" in story_performance({"roc_auc": 0.55}, "classification")

    def test_imbalance_note(self):
        txt = story_performance({"roc_auc": 0.8, "accuracy": 0.9, "f1": 0.6},
                                "classification")
        assert "imbalance" in txt

    def test_regression_bands(self):
        assert "high-precision" in story_performance({"r2": 0.9, "rmse": 1.0},
                                                     "regression")
        assert "very little" in story_performance({"r2": 0.1, "rmse": 5.0},
                                                  "regression")


class TestOtherStories:
    def test_features(self):
        rows = [{"feature": "a"}, {"feature": "b"}, {"feature": "c"}]
        assert "a" in story_features(rows) and "c" in story_features(rows)
        assert "dominant feature is a" in story_features(rows[:1])

    def test_overfitting_bands(self):
        assert "Significant overfitting" in story_overfitting(
            {"roc_auc": 0.95}, {"roc_auc": 0.7})
        assert "mild divergence" in story_overfitting(
            {"roc_auc": 0.88}, {"roc_auc": 0.81})
        assert "generalizes well" in story_overfitting(
            {"roc_auc": 0.85}, {"roc_auc": 0.84})
        # error metrics flip the sign convention
        assert "Significant overfitting" in story_overfitting(
            {"rmse": 1.0}, {"rmse": 1.2})

    def test_drift_bands(self):
        high = [{"lang": "en", "bucket": "2024-01-01", "psi": 0.3}]
        med = [{"lang": "de", "bucket": "2024-01-01", "psi": 0.15}]
        none = [{"lang": "fr", "bucket": "2024-01-01", "psi": 0.01}]
        assert "Critical drift alert" in story_drift(high)
        assert "Monitor" in story_drift(med)
        assert "Stable" in story_drift(none)
        assert "No drift analysis" in story_drift([])

    def test_stress_bands(self):
        assert "highly robust" in story_stress(
            [{"metric": "auc", "baseline": 0.9, "stressed": 0.895}])
        assert "moderate resilience" in story_stress(
            [{"metric": "auc", "baseline": 0.9, "stressed": 0.87}])
        assert "sensitivity detected" in story_stress(
            [{"metric": "auc", "baseline": 0.9, "stressed": 0.8}])

    def test_validation_and_assembly(self):
        summary = {"rows": 500, "partitions": 8, "total_violations": 6,
                   "failed_partitions": 5, "duplicate_urls": 3,
                   "overall": "fail"}
        txt = story_validation(summary)
        assert "500" in txt and "FAIL" in txt and "duplicate" in txt
        out = render_report_narratives({
            "validation_summary": summary,
            "drift_table": [{"lang": "en", "bucket": "w1", "psi": 0.25}],
            "metrics": {"roc_auc": 0.8},
            "ranking": [{"feature": "x"}, {"feature": "y"}],
        })
        assert set(out) == {"validation", "drift", "performance", "features"}
