"""Estimator registry — the engine's analog of the reference's
ModelSpec registry (/root/reference/tanml/models/registry.py:10-30,
34-411: (library, algo) → ModelSpec(task, import_path, defaults),
build_estimator lazy-instantiates).

The sandbox has no sklearn/xgboost, so the registry carries the
library-free families the engine implements from scratch — every entry
FITS DISTRIBUTED (streaming sufficient-statistics / IRLS passes over a
Dataset) and predicts through the ScorerStage actor-pool contract
(`.predict(X: np.ndarray)`):

    linear_closed_form   one-pass Gram OLS (optional ridge), regression
    logistic_irls        distributed IRLS logistic, classification
    poisson_newton       distributed Newton-scoring Poisson GLM
                         (log link, count regression)
    boosted_stumps       histogram gradient-boosted stumps, regression
    gaussian_nb          one-pass Gaussian Naive Bayes, classification
    lda_closed_form      one-pass pooled-covariance linear discriminant
                         (exact integer sufficient statistics)
    qda_closed_form      one-pass per-class-covariance quadratic
                         discriminant (same exact suffstats pass)
    multinomial_nb       one-pass Laplace-smoothed multinomial NB over
                         integer count features
    knn_classifier       k-NN majority vote (bounded-train registry
                         entry; streaming scan = mlops.knn_classify)
    kmeans_lloyd         distributed Lloyd (unsupervised; .predict →
                         nearest-center label)

Adding a model = one @register call with a fit(ds, x_cols, y_col,
**params) builder returning a predict-capable object; the CV /
benchmark / stress machinery (pipelines/explain.py, mlops.py) then
works with it unchanged — the same extension contract the reference's
registry provides for its 22 estimators.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

from tanml_ray.stages.scoring import ClosedFormModel


@dataclass
class ModelSpec:
    name: str
    task: str                      # regression | classification | clustering
    fit: Callable[..., Any]        # fit(ds, x_cols, y_col, **params) -> model
    defaults: dict[str, Any] = field(default_factory=dict)


class EstimatorRegistry:
    def __init__(self) -> None:
        self._specs: dict[str, ModelSpec] = {}

    def register(self, name: str, task: str, **defaults):
        def deco(fn: Callable[..., Any]):
            if name in self._specs:
                raise ValueError(f"duplicate estimator {name!r}")
            self._specs[name] = ModelSpec(name=name, task=task, fit=fn,
                                          defaults=dict(defaults))
            return fn
        return deco

    def get(self, name: str) -> ModelSpec:
        if name not in self._specs:
            raise KeyError(f"unknown estimator {name!r}; "
                           f"available: {self.list_names()}")
        return self._specs[name]

    def list_names(self) -> list[str]:
        return sorted(self._specs)

    def fit(self, name: str, ds, x_cols: list[str],
            y_col: str | None = None, **params) -> Any:
        spec = self.get(name)
        merged = {**spec.defaults, **params}
        return spec.fit(ds, x_cols, y_col, **merged)


ESTIMATORS = EstimatorRegistry()


@ESTIMATORS.register("linear_closed_form", task="regression", ridge=0.0)
def _fit_linear(ds, x_cols, y_col, ridge: float = 0.0):
    from tanml_ray.pipelines.mlops import linear_fit

    out = linear_fit(ds, x_cols, y_col, ridge=ridge)
    model = ClosedFormModel(out["coef"], out["intercept"])
    model.fit_info = out
    return model


@ESTIMATORS.register("logistic_irls", task="classification", max_iter=8)
def _fit_logistic(ds, x_cols, y_col, max_iter: int = 8):
    from tanml_ray.pipelines.mlops import logistic_fit

    out = logistic_fit(ds, x_cols, y_col, max_iter=max_iter)
    model = ClosedFormModel(out["coef"], out["intercept"], sigmoid=True)
    model.fit_info = out
    return model


class PoissonModel(ClosedFormModel):
    """Log-link GLM scorer: predict(X) returns the expected count
    exp(w·x + b)."""

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.exp(np.asarray(X, dtype=np.float64) @ self.w + self.b)


@ESTIMATORS.register("poisson_newton", task="regression", max_iter=8)
def _fit_poisson(ds, x_cols, y_col, max_iter: int = 8):
    from tanml_ray.pipelines.mlops import poisson_fit

    out = poisson_fit(ds, x_cols, y_col, max_iter=max_iter)
    model = PoissonModel(out["coef"], out["intercept"])
    model.fit_info = out
    return model


class BoostedStumpsModel:
    """Additive model of depth-1 histogram trees: F(x) = base +
    Σ stump(x), stump = (feature_idx, threshold, left_val, right_val)
    routing `x < threshold` — the exact training bin boundary
    (mlops.boosted_stumps_fit)."""

    def __init__(self, base: float, stumps: list):
        self.base = float(base)
        self.stumps = [(int(j), float(t), float(lv), float(rv))
                       for j, t, lv, rv in stumps]

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        F = np.full(X.shape[0], self.base)
        for j, thr, lv, rv in self.stumps:
            F += np.where(X[:, j] < thr, lv, rv)
        return F


@ESTIMATORS.register("boosted_stumps", task="regression",
                     n_rounds=10, n_bins=32, lr=0.5)
def _fit_boosted_stumps(ds, x_cols, y_col, n_rounds: int = 10,
                        n_bins: int = 32, lr: float = 0.5):
    from tanml_ray.pipelines.mlops import boosted_stumps_fit

    model = boosted_stumps_fit(ds, x_cols, y_col, n_rounds=n_rounds,
                               n_bins=n_bins, lr=lr)
    model.fit_info = {"n_rounds": n_rounds, "n_bins": n_bins, "lr": lr,
                      "n_stumps": len(model.stumps), "base": model.base}
    return model


class GaussianNBModel:
    """Gaussian Naive Bayes scorer: predict(X) returns the log
    posterior odds ln P(y=1|x) − ln P(y=0|x) (monotone in the class-1
    probability, so AUC/threshold-at-0 semantics match the logistic
    scorer's log-odds scale)."""

    def __init__(self, priors: dict, means: np.ndarray, varis: np.ndarray):
        self.priors = {int(k): float(v) for k, v in priors.items()}
        self.means = np.asarray(means, dtype=np.float64)
        self.vars = np.asarray(varis, dtype=np.float64)

    def _log_lik(self, X: np.ndarray, cls: int) -> np.ndarray:
        mu, var = self.means[cls], self.vars[cls]
        return (-0.5 * (np.log(2.0 * np.pi * var)
                        + (X - mu) ** 2 / var)).sum(axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return (np.log(self.priors[1]) + self._log_lik(X, 1)
                - np.log(self.priors[0]) - self._log_lik(X, 0))


@ESTIMATORS.register("gaussian_nb", task="classification",
                     var_smoothing=1e-9)
def _fit_gaussian_nb(ds, x_cols, y_col, var_smoothing: float = 1e-9):
    from tanml_ray.pipelines.mlops import gaussian_nb_fit

    out = gaussian_nb_fit(ds, x_cols, y_col, var_smoothing=var_smoothing)
    model = GaussianNBModel(out["priors"], out["means"], out["vars"])
    model.fit_info = {"n": out["n"], "priors": out["priors"],
                      "means": out["means"].tolist(),
                      "vars": out["vars"].tolist()}
    return model


class LDAModel:
    """Equal-covariance Gaussian discriminant scorer: predict(X)
    returns wᵀx + b — the exact log posterior odds ln P(y=1|x) −
    ln P(y=0|x) under the pooled-covariance model (same log-odds scale
    as the logistic scorer, so AUC/threshold-at-0 semantics match)."""

    def __init__(self, coef, intercept: float):
        self.w = np.asarray(coef, dtype=np.float64)
        self.b = float(intercept)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.w + self.b


@ESTIMATORS.register("lda_closed_form", task="classification")
def _fit_lda(ds, x_cols, y_col):
    from tanml_ray.pipelines.mlops import lda_fit

    out = lda_fit(ds, x_cols, y_col)
    model = LDAModel(out["coef"], out["intercept"])
    model.fit_info = out
    return model


class QDAModel:
    """Per-class-covariance Gaussian discriminant scorer: predict(X)
    returns the exact log posterior odds ln P(y=1|x) − ln P(y=0|x)
    under the quadratic (per-class Σ) model — same log-odds scale as
    the LDA/logistic scorers."""

    def __init__(self, n0: int, n1: int, means, invs, logdets):
        self.const = (np.log(n1 / n0)
                      - 0.5 * (logdets[1] - logdets[0]))
        self.means = [np.asarray(m, dtype=np.float64) for m in means]
        self.invs = [np.asarray(iv, dtype=np.float64) for iv in invs]

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        q = []
        for c in (0, 1):
            d = X - self.means[c]
            q.append(((d @ self.invs[c]) * d).sum(axis=1))
        return self.const - 0.5 * (q[1] - q[0])


@ESTIMATORS.register("qda_closed_form", task="classification")
def _fit_qda(ds, x_cols, y_col):
    from tanml_ray.pipelines.mlops import qda_fit

    out = qda_fit(ds, x_cols, y_col)
    model = QDAModel(out["n0"], out["n1"], out["means"], out["invs"],
                     out["logdets"])
    model.fit_info = out
    return model


class MultinomialNBModel:
    """Multinomial NB scorer: predict(X) returns the log posterior
    odds ln(n1/n0) + Σ_j x_j·(ln θ₁ⱼ − ln θ₀ⱼ) — same log-odds scale
    as the other classification scorers."""

    def __init__(self, n0: int, n1: int, log_theta):
        self.const = np.log(n1 / n0)
        self.dlt = (np.asarray(log_theta[1], dtype=np.float64)
                    - np.asarray(log_theta[0], dtype=np.float64))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.const + np.asarray(X, dtype=np.float64) @ self.dlt


@ESTIMATORS.register("multinomial_nb", task="classification", alpha=1.0)
def _fit_multinomial_nb(ds, x_cols, y_col, alpha: float = 1.0):
    from tanml_ray.pipelines.mlops import multinomial_nb_fit

    out = multinomial_nb_fit(ds, x_cols, y_col, alpha=alpha)
    model = MultinomialNBModel(out["n0"], out["n1"], out["log_theta"])
    model.fit_info = out
    return model


class KnnModel:
    """k-NN majority-vote scorer over a held training matrix:
    predict(X) returns the positive-neighbor fraction among the k
    nearest train rows (ties broken by (d², train id), matching
    mlops.knn_classify's global order). The registry entry holds a
    BOUNDED train set (max_train-guarded gather); the streaming
    corpus-scan path for unbounded train sides is
    mlops.knn_classify (broadcast the small test side, scan train)."""

    def __init__(self, train_X: np.ndarray, train_y: np.ndarray,
                 train_ids: np.ndarray, k: int):
        self.X = np.asarray(train_X, dtype=np.float64)
        self.y = np.asarray(train_y, dtype=np.int64)
        self.ids = np.asarray(train_ids, dtype=np.int64)
        self.k = int(k)

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        out = np.empty(X.shape[0])
        top = min(self.k, self.X.shape[0])
        for i in range(X.shape[0]):
            d2 = ((self.X - X[i]) ** 2).sum(axis=1)
            order = np.lexsort((self.ids, d2))[:top]
            out[i] = self.y[order].mean()
        return out


@ESTIMATORS.register("knn_classifier", task="classification",
                     k=5, max_train=1_000_000)
def _fit_knn(ds, x_cols, y_col, k: int = 5, max_train: int = 1_000_000,
             id_col: str | None = None):
    from tanml_ray.functions.collect import collect_pylist

    rows = collect_pylist(ds)
    if len(rows) > max_train:
        raise ValueError(f"{len(rows)} train rows exceed max_train="
                         f"{max_train}; use mlops.knn_classify (streaming "
                         f"corpus scan) at this scale")
    X = np.array([[r[c] for c in x_cols] for r in rows], dtype=np.float64)
    y = np.array([r[y_col] for r in rows], dtype=np.int64)
    ids = (np.array([r[id_col] for r in rows], dtype=np.int64)
           if id_col else np.arange(len(rows), dtype=np.int64))
    model = KnnModel(X, y, ids, k)
    model.fit_info = {"k": k, "n_train": len(rows)}
    return model


class _KMeansModel:
    def __init__(self, centers: np.ndarray):
        self.centers = np.asarray(centers, dtype=np.float64)

    def predict(self, X: np.ndarray) -> np.ndarray:
        d = ((X[:, None, :] - self.centers[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1).astype(np.float64)


@ESTIMATORS.register("kmeans_lloyd", task="clustering", k=8, max_iter=20)
def _fit_kmeans(ds, x_cols, y_col=None, k: int = 8, max_iter: int = 20):
    from tanml_ray.pipelines.mlops import kmeans_fit

    centers = kmeans_fit(ds, x_cols, k=k, max_iter=max_iter)
    model = _KMeansModel(centers)
    model.fit_info = {"k": k, "centers": centers.tolist()}
    return model


class StumpModel:
    """Depth-1 decision tree (CART stump): predict by one integer
    threshold rule; labels are the training majority of each side."""

    def __init__(self, feature_idx: int, threshold: int,
                 left_label: int, right_label: int):
        self.feature_idx = int(feature_idx)
        self.threshold = int(threshold)
        self.left_label = int(left_label)
        self.right_label = int(right_label)

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X)
        return np.where(X[:, self.feature_idx] <= self.threshold,
                        self.left_label, self.right_label).astype(np.float64)


def cart_stump_fit(ds, x_cols: list[str], y_col: str) -> dict:
    """Exact-integer depth-1 CART: ONE combiner pass reduces the corpus
    to per-(feature, value, class) counts (features must live on
    BOUNDED integer grids — bucket continuous columns in the derive);
    the best split minimizes the exact INTEGER misclassification count
    with a (errors, feature, threshold) tiebreak, so selection can
    never flip on a float ulp between engine and SQL oracle."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def partial(batch: pa.Table) -> pd.DataFrame:
        y = np.asarray(batch.column(y_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        frames = []
        for f in x_cols:
            v = np.asarray(batch.column(f).to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            df = pd.DataFrame({"f": f, "v": v, "y": y})
            frames.append(df.groupby(["f", "v", "y"], as_index=False)
                          .agg(n=("y", "size")))
        return pd.concat(frames, ignore_index=True)

    grid: dict[str, dict[int, list[int]]] = {f: {} for f in x_cols}
    for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["f", "v", "y"]).aggregate(Sum("n", alias_name="n"))):
        cell = grid[r["f"]].setdefault(int(r["v"]), [0, 0])
        cell[int(r["y"])] += int(r["n"])

    best = None   # (errors, feature, threshold, left_label, right_label)
    # class totals are feature-independent: read them off one grid
    a_total = sum(c[1] for c in grid[x_cols[0]].values())
    n_total = sum(c[0] + c[1] for c in grid[x_cols[0]].values())
    for f in x_cols:
        vals = sorted(grid[f])
        al = bl = 0
        for v in vals:
            bl += grid[f][v][0]
            al += grid[f][v][1]
            ar = a_total - al
            br = (n_total - a_total) - bl
            errors = (al + bl - max(al, bl)) + (ar + br - max(ar, br))
            key = (errors, f, v)
            if best is None or key < best[:3]:
                best = (errors, f, v,
                        1 if al >= bl else 0, 1 if ar >= br else 0)
    errors, f, v, ll, rl = best
    return {"feature": f, "feature_idx": x_cols.index(f), "threshold": v,
            "errors": errors, "n": n_total,
            "train_acc": float(n_total - errors) / n_total,
            "left_label": ll, "right_label": rl}


@ESTIMATORS.register("cart_stump", task="classification")
def _fit_cart_stump(ds, x_cols, y_col):
    out = cart_stump_fit(ds, x_cols, y_col)
    model = StumpModel(out["feature_idx"], out["threshold"],
                       out["left_label"], out["right_label"])
    model.fit_info = out
    return model
