"""T1: model-scoring actor pool (SURVEY §2.3).

Reference: fitted estimator .predict/.predict_proba on the whole frame
(/root/reference/tanml/ui/views/evaluation/main.py:228-243). Engine:
a callable class for `ds.map_batches(ScorerStage(...), concurrency=N,
batch_size=B, num_cpus=c)` — the model is deserialized ONCE per actor
in __init__ (never per batch), features are pulled as one numpy matrix
per batch.

Model contract: any object with .predict(X: np.ndarray) -> np.ndarray
(sklearn-compatible); supplied either directly, as a pickle path, or
as a ray.ObjectRef (ray.put once, shared by all actors).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa


class ClosedFormModel:
    """Deterministic stand-in estimator (no sklearn in this env):
    linear model w·x + b, optionally squashed to a probability."""

    def __init__(self, weights, bias: float = 0.0, sigmoid: bool = False):
        self.w = np.asarray(weights, dtype=np.float64)
        self.b = float(bias)
        self.sigmoid = sigmoid

    def predict(self, X: np.ndarray) -> np.ndarray:
        z = X @ self.w + self.b
        return 1.0 / (1.0 + np.exp(-z)) if self.sigmoid else z


class ScorerStage:
    def __init__(self, model: Any = None, model_path: str | None = None,
                 model_ref: Any = None, feature_cols: list[str] | None = None,
                 output_col: str = "score"):
        # once per ACTOR: deserialize / fetch the model
        if model_path is not None:
            import pickle

            with open(model_path, "rb") as f:
                self.model = pickle.load(f)
        elif model_ref is not None:
            import ray

            self.model = ray.get(model_ref)
        elif model is not None:
            self.model = model
        else:
            raise ValueError("one of model / model_path / model_ref required")
        self.feature_cols = feature_cols
        self.output_col = output_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.feature_cols or batch.column_names
        X = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        scores = np.asarray(self.model.predict(X), dtype=np.float64)
        return batch.append_column(self.output_col,
                                   pa.array(scores, type=pa.float64()))


def score_dataset(ds, model, feature_cols: list[str],
                  concurrency: int | tuple = 4, batch_size: int = 8192,
                  num_cpus: float = 1, output_col: str = "score"):
    """Convenience wrapper: broadcast the model once (ray.put) and run
    the actor pool."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        ScorerStage,
        fn_constructor_kwargs={"model_ref": ref, "feature_cols": feature_cols,
                               "output_col": output_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
