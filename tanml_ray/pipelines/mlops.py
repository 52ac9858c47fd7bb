"""ML-ops operators: KMeans coverage, perturbation stress testing,
VIF multicollinearity, deterministic splits, imputation.

Reference semantics (citations into /root/reference):
  - KMeans input-space coverage: fit k centers, flag rows whose
    distance to the nearest center exceeds p95(train)·1.5
    tanml/analysis/clustering.py:87-142
  - stress test: perturb one numeric feature by (1±ε) on a fraction of
    rows, re-score, report metric delta   tanml/checks/stress_test.py:107-206
  - VIF from the feature Gram matrix, flag ≥ 5
    tanml/analysis/correlation.py:80-160
  - train/test split (seeded, deterministic)
    tanml/ui/views/preprocessing.py:269-293
  - mean / most-frequent imputation  tanml/ui/views/preprocessing.py:152-175

Scale design: KMeans is distributed Lloyd — assignment + per-cluster
partial sums in map_batches, center update on the driver (k×dim floats);
everything else is broadcast-parameter stateless maps + exact partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tanml_ray.functions.collect import collect_pylist


def _matrix(batch: pa.Table, cols: list[str]) -> np.ndarray:
    return np.column_stack([
        batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        for c in cols])


# ---------------------------------------------------------------------------
# KMeans: distributed Lloyd iterations, deterministic init
# ---------------------------------------------------------------------------

def kmeans_fit(ds, cols: list[str], k: int, max_iter: int = 20,
               tol: float = 1e-6) -> np.ndarray:
    """Distributed Lloyd. Init = k points spaced evenly along the
    per-dim [min, max] diagonal — computed from EXACT mergeable min/max
    partials, so any partitioning starts from identical centers and
    converges identically (no RNG, retry-safe)."""
    def mm_partial(batch: pa.Table) -> pa.Table:
        rows = []
        for i, c in enumerate(cols):
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[np.isfinite(x)]
            if x.size:
                rows.append({"dim": i, "vmin": float(x.min()), "vmax": float(x.max())})
        return pa.Table.from_pylist(rows)

    vmin = np.full(len(cols), np.inf)
    vmax = np.full(len(cols), -np.inf)
    for r in collect_pylist(ds.map_batches(mm_partial, batch_format="pyarrow")):
        vmin[r["dim"]] = min(vmin[r["dim"]], r["vmin"])
        vmax[r["dim"]] = max(vmax[r["dim"]], r["vmax"])
    fracs = (np.arange(k) + 0.5) / k
    centers = vmin[None, :] + fracs[:, None] * (vmax - vmin)[None, :]

    for _ in range(max_iter):
        import ray

        cref = ray.put(centers)

        def assign_partial(batch: pa.Table) -> pa.Table:
            import ray as _ray

            C = _ray.get(cref)
            X = _matrix(batch, cols)
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)
            rows = []
            for j in range(len(C)):
                m = lab == j
                if m.any():
                    rows.append({"cluster": j, "n": int(m.sum()),
                                 "sums": X[m].sum(axis=0).tolist()})
            return pa.Table.from_pylist(rows) if rows else pa.table(
                {"cluster": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "sums": pa.array([], type=pa.list_(pa.float64()))})

        agg: dict[int, tuple[int, np.ndarray]] = {}
        for r in collect_pylist(ds.map_batches(assign_partial, batch_format="pyarrow")):
            n0, s0 = agg.get(r["cluster"], (0, np.zeros(len(cols))))
            agg[r["cluster"]] = (n0 + r["n"], s0 + np.asarray(r["sums"]))
        new_centers = centers.copy()
        for j, (n, s) in agg.items():
            if n:
                new_centers[j] = s / n
        shift = float(np.abs(new_centers - centers).max())
        centers = new_centers
        if shift < tol:
            break
    return centers


def cluster_coverage(ds, cols: list[str], centers: np.ndarray,
                     threshold: float) -> pa.Table:
    """Broadcast-predict coverage (reference clustering.py:95-142):
    per-cluster counts + out-of-distribution flags (dist > threshold)."""
    import ray

    cref = ray.put((np.asarray(centers, dtype=np.float64), float(threshold)))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C, thr = _ray.get(cref)
        X = _matrix(batch, cols)
        d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
        lab = d.argmin(axis=1)
        mind = d.min(axis=1)
        rows = []
        for j in range(len(C)):
            m = lab == j
            if m.any():
                rows.append({"cluster": int(j), "n": int(m.sum()),
                             "n_ood": int((mind[m] > thr).sum())})
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"cluster": pa.array([], type=pa.int64()),
             "n": pa.array([], type=pa.int64()),
             "n_ood": pa.array([], type=pa.int64())})

    agg: dict[int, list[int]] = {}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        a = agg.setdefault(r["cluster"], [0, 0])
        a[0] += r["n"]
        a[1] += r["n_ood"]
    rows = [{"cluster": j, "n": a[0], "n_ood": a[1]} for j, a in sorted(agg.items())]
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# VIF from the Gram matrix (exact partials, driver-side linear algebra)
# ---------------------------------------------------------------------------

def vif(ds, cols: list[str]) -> dict[str, float]:
    """VIF_j = 1/(1−R²_j) where R²_j regresses col j on the others —
    all solvable from X'X partials (reference correlation.py:80-160;
    flag ≥ 5 is the caller's threshold)."""
    def partial(batch: pa.Table) -> pa.Table:
        X = _matrix(batch, cols)
        X = np.column_stack([np.ones(len(X)), X])   # intercept
        g = X.T @ X
        return pa.Table.from_pylist([{"gram": g.ravel().tolist(), "n": len(X)}])

    p = len(cols) + 1
    G = np.zeros((p, p))
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        G += np.asarray(r["gram"]).reshape(p, p)

    out = {}
    for j, c in enumerate(cols, start=1):
        idx = [i for i in range(p) if i != j]
        Gxx = G[np.ix_(idx, idx)]
        Gxy = G[np.ix_(idx, [j])]
        yy = G[j, j]
        n = G[0, 0]
        ybar = G[0, j] / n
        try:
            beta = np.linalg.solve(Gxx, Gxy)
            ss_res = float(yy - (beta.T @ Gxy))
            ss_tot = float(yy - n * ybar * ybar)
            r2 = 1 - ss_res / ss_tot if ss_tot > 0 else 0.0
            out[c] = float("inf") if r2 >= 1.0 else 1.0 / (1.0 - r2)
        except np.linalg.LinAlgError:
            out[c] = float("inf")
    return out


# ---------------------------------------------------------------------------
# Perturbation stress test (deterministic row selection by key modulo)
# ---------------------------------------------------------------------------

def stress_test_regression(ds, key_col: str, y_col: str, pred_fn,
                           epsilons: tuple[float, ...] = (0.1, -0.1),
                           mod: int = 5) -> pa.Table:
    """Reference stress_test.py:107-206 semantics with a deterministic
    perturbed-row set (key % mod == 0, ≈1/mod of rows) instead of a
    seeded RNG — retry-safe and SQL-verifiable. pred_fn(y_perturbed,
    keys) → predictions; metric = RMSE vs the unperturbed y."""
    from tanml_ray.pipelines.metrics import regression_metrics

    rows = []
    base = None
    for eps in (0.0,) + tuple(epsilons):
        def perturb(batch: pa.Table, e=eps) -> pa.Table:
            y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
            k = batch.column(key_col).to_numpy(zero_copy_only=False)
            feat = np.where(k % mod == 0, y * (1.0 + e), y)
            return pa.table({"y": pa.array(y, type=pa.float64()),
                             "pred": pa.array(pred_fn(feat, k), type=pa.float64())})

        m = regression_metrics(ds.map_batches(perturb, batch_format="pyarrow"),
                               "y", "pred", exact_median=False)
        if eps == 0.0:
            base = m["rmse"]
        rows.append({"feature": y_col, "perturbation": eps,
                     "rmse": m["rmse"], "delta": m["rmse"] - base})
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# Deterministic split + per-group sampling + imputation
# ---------------------------------------------------------------------------

def hash_split_counts(ds, key_col: str, value_col: str,
                      train_buckets: int = 8, total_buckets: int = 10) -> pa.Table:
    """K4 train/test split, deterministic by key modulo (retry-safe:
    the same row always lands in the same split under any partitioning)."""
    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        is_train = (k % total_buckets) < train_buckets
        v_u = np.rint(v * 100).astype(np.int64)
        return pa.Table.from_pylist([
            {"split": "train", "n": int(is_train.sum()),
             "sum_c": int(v_u[is_train].sum())},
            {"split": "test", "n": int((~is_train).sum()),
             "sum_c": int(v_u[~is_train].sum())},
        ])

    tot: dict[str, list[int]] = {"train": [0, 0], "test": [0, 0]}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        tot[r["split"]][0] += r["n"]
        tot[r["split"]][1] += r["sum_c"]
    return pa.Table.from_pylist([
        {"split": s, "n": v[0], "sum_value": v[1] / 100.0}
        for s, v in sorted(tot.items())])


def first_n_per_group(ds, group_col: str, id_col: str, n: int) -> pa.Table:
    """Per-group head-n by id order (stratified-sample building block,
    K4). Shuffles by COARSE hash(group)%P — one vectorized pandas task
    per partition, never one map_groups call per distinct group — so
    it is safe for high-cardinality group keys, not just per-lang
    heads. The collected result must still be small (n × #groups)."""
    import pandas as pd

    from tanml_ray.stages.shuffle import with_coarse_partition

    def head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__upart"])
        return (g.sort_values([group_col, id_col], kind="mergesort")
                 .groupby(group_col, sort=False).head(n))

    out = (with_coarse_partition(ds, group_col)
           .groupby("__upart").map_groups(head, batch_format="pandas"))
    rows = sorted(collect_pylist(out), key=lambda r: (r[group_col], r[id_col]))
    return pa.Table.from_pylist(rows)


def mean_impute_stats(ds, key_col: str, value_col: str, mod: int = 97,
                      scale: int = 1) -> pa.Table:
    """M5 two-phase mean imputation with a deterministic synthetic null
    mask (key % mod == 0): phase 1 exact global mean of kept values
    (integer units), phase 2 fill and report. Returns one row:
    (n_imputed, fill_value, sum_after)."""
    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        nullmask = (k % mod) == 0
        u = np.rint(v * scale).astype(np.int64)
        return pa.Table.from_pylist([{
            "n_null": int(nullmask.sum()), "n_kept": int((~nullmask).sum()),
            "sum_kept": int(u[~nullmask].sum())}])

    n_null = n_kept = sum_kept = 0
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        n_null += r["n_null"]
        n_kept += r["n_kept"]
        sum_kept += r["sum_kept"]
    fill = float(sum_kept) / scale / n_kept
    sum_after = float(sum_kept) / scale + fill * n_null
    return pa.Table.from_pylist([{
        "n_imputed": n_null,
        "fill_value": float(np.round(fill, 6)),
        "sum_after": float(np.round(sum_after, 4)),
    }])


def knn_impute(ds, id_col: str, target_col: str, feature_cols: list[str],
               mod: int = 997, k: int = 5,
               max_missing: int = 100_000) -> pa.Table:
    """M6 KNN imputation (reference: sklearn KNNImputer(n_neighbors=5),
    ui/views/preprocessing.py:163-164), rebuilt distributed and
    library-free. Deterministic synthetic null mask (id % mod == 0 —
    same convention as mean/mode impute, which keeps the check
    SQL-oracle-able).

    Shape: pass 1 collects the missing rows' feature vectors (bounded;
    guarded by max_missing — at 10^12 rows imputation runs
    shard-by-shard so the missing set per run stays bounded). The
    missing matrix broadcasts once via ray.put; pass 2 streams the
    corpus, each block computing squared euclidean distances from every
    missing row to its donor rows — accumulated per-feature as
    (mᵢ−xᵢ)², the same term order as the SQL oracle, so the rounded
    tie-break key is bit-identical — and keeping a local top-k. The
    classic distributed-top-k merge (similarity.knn_cosine shape)
    then orders candidates by (round(d², 6), donor id) — a
    float-robust deterministic neighbor set — and imputes the k-donor
    mean. Returns (id, imputed) sorted by id."""
    import ray

    def collect_missing(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = (ids % mod) == 0
        cols = {"id": pa.array(ids[m], type=pa.int64())}
        for c in feature_cols:
            cols[c] = pa.array(
                batch.column(c).to_numpy(zero_copy_only=False)[m].astype(np.float64),
                type=pa.float64())
        return pa.table(cols)

    miss_rows = collect_pylist(ds.map_batches(collect_missing,
                                              batch_format="pyarrow"))
    if not miss_rows:
        return pa.table({"id": pa.array([], type=pa.int64()),
                         "imputed": pa.array([], type=pa.float64())})
    if len(miss_rows) > max_missing:
        raise ValueError(
            f"{len(miss_rows)} missing rows exceed max_missing="
            f"{max_missing}; impute shard-by-shard at this scale")
    miss_ids = np.array([r["id"] for r in miss_rows], dtype=np.int64)
    miss_mat = np.array([[r[c] for c in feature_cols] for r in miss_rows],
                        dtype=np.float64)
    mref = ray.put((miss_ids, miss_mat))

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        mi, mm = _ray.get(mref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        donors = (ids % mod) != 0
        if not donors.any():
            return pa.table({"mid": pa.array([], type=pa.int64()),
                             "did": pa.array([], type=pa.int64()),
                             "d2": pa.array([], type=pa.float64()),
                             "v": pa.array([], type=pa.float64())})
        did = ids[donors]
        v = batch.column(target_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)[donors]
        d2 = np.zeros((len(mi), len(did)))
        for j, c in enumerate(feature_cols):
            x = batch.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.float64)[donors]
            d2 += (mm[:, j][:, None] - x[None, :]) ** 2
        # local top-k under the GLOBAL total order (round(d2,6), did) —
        # bounded at k rows per missing row (raw argpartition could
        # drop a boundary-tied smaller-id donor; an unbounded
        # keep-all-ties emit could explode on duplicated feature rows).
        # Strictly-better candidates are all kept; among boundary ties
        # only the need-smallest donor ids survive, selected vectorized.
        top = min(k, d2.shape[1])
        kth = np.partition(d2, top - 1, axis=1)[:, top - 1]
        d2r = np.round(d2, 6)
        boundary = np.round(kth, 6)
        strict = d2r < boundary[:, None]
        n_strict = strict.sum(axis=1)           # provably < top
        need = top - n_strict
        at_b = d2r == boundary[:, None]
        BIG = np.int64(2**62)
        didm = np.where(at_b, did[None, :], BIG)
        kmax = int(need.max())
        part = np.sort(np.partition(didm, kmax - 1, axis=1)[:, :kmax], axis=1)
        thresh = part[np.arange(len(need)), need - 1]
        keep = strict | (at_b & (didm <= thresh[:, None]))
        ri, ci = np.nonzero(keep)
        return pa.table({
            "mid": pa.array(mi[ri], type=pa.int64()),
            "did": pa.array(did[ci], type=pa.int64()),
            "d2": pa.array(d2[ri, ci], type=pa.float64()),
            "v": pa.array(v[ci], type=pa.float64())})

    import pandas as pd

    parts = pd.DataFrame(collect_pylist(
        ds.map_batches(local_topk, batch_format="pyarrow")))
    parts["d2r"] = np.round(parts["d2"].to_numpy(), 6)
    parts = parts.sort_values(["mid", "d2r", "did"], kind="mergesort")
    out = (parts.groupby("mid", sort=True).head(k)
           .groupby("mid", sort=True)["v"].mean())
    return pa.table({"id": pa.array(out.index.to_numpy(), type=pa.int64()),
                     "imputed": pa.array(np.round(out.to_numpy(), 6),
                                         type=pa.float64())})


def mode_impute_value(ds, key_col: str, value_col: str, mod: int = 89) -> pa.Table:
    """M7 most-frequent imputation: mode of kept values (deterministic
    tie-break by value), count of imputed rows."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        keep = ~((k % mod) == 0)
        vals = np.asarray(batch.column(value_col).to_pylist(), dtype=object)[keep]
        s = pd.Series(vals).value_counts()
        return pa.Table.from_pylist(
            [{"value": str(v), "n": int(c)} for v, c in s.items()]
            + [{"value": None, "n": int((~keep).sum())}])

    counts: dict[str, int] = {}
    n_null = 0
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        if r["value"] is None:
            n_null += r["n"]
        else:
            counts[r["value"]] = counts.get(r["value"], 0) + r["n"]
    mode = max(sorted(counts), key=lambda v: counts[v])
    return pa.Table.from_pylist([{"fill_value": mode, "n_imputed": n_null}])


# ---------------------------------------------------------------------------
# Distributed univariate logistic regression via IRLS (the statsmodels
# inference analog, reference ui/views/evaluation/tabs/inference.py:
# 111-115 — odds ratios exp(coef)). Each Newton step is ONE map_batches
# pass computing the weighted Gram/score sums; 6-8 passes converge.
# ---------------------------------------------------------------------------

def _irls_pass(ds, x_cols: list[str], y_col: str,
               beta: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One streaming IRLS pass at `beta`: returns (XᵀWX, Xᵀ(y−μ))
    summed over all blocks (W = μ(1−μ), the Fisher information
    weights)."""
    import ray

    p = len(x_cols) + 1
    bref = ray.put(beta.copy())

    def step_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        b = _ray.get(bref)
        X = np.column_stack([np.ones(batch.num_rows),
                             _matrix(batch, x_cols)])
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        eta = X @ b
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1 - mu)
        XtWX = X.T @ (X * w[:, None])
        Xtz = X.T @ (y - mu)
        return pa.Table.from_pylist([{
            "xtwx": XtWX.ravel().tolist(), "xtz": Xtz.tolist()}])

    H = np.zeros((p, p))
    g = np.zeros(p)
    for r in collect_pylist(ds.map_batches(step_partial, batch_format="pyarrow")):
        H += np.asarray(r["xtwx"]).reshape(p, p)
        g += np.asarray(r["xtz"])
    return H, g


def logistic_fit(ds, x_cols: list[str], y_col: str,
                 max_iter: int = 8, tol: float = 1e-8,
                 with_information: bool = False) -> dict:
    """Returns {coef: [...], intercept, odds_ratios, n_iter};
    with_information=True adds "information" — the Fisher information
    matrix XᵀWX evaluated at the FINAL beta (one extra streaming pass),
    the input to Wald standard errors (logistic_inference)."""
    p = len(x_cols) + 1
    beta = np.zeros(p)

    for it in range(max_iter):
        H, g = _irls_pass(ds, x_cols, y_col, beta)
        delta = np.linalg.solve(H + 1e-10 * np.eye(p), g)
        beta = beta + delta
        if float(np.abs(delta).max()) < tol:
            break
    out = {"intercept": float(beta[0]),
           "coef": beta[1:].tolist(),
           "odds_ratios": np.exp(beta[1:]).tolist(),
           "n_iter": it + 1}
    if with_information:
        H, _ = _irls_pass(ds, x_cols, y_col, beta)
        out["information"] = H
    return out


def _poisson_pass(ds, x_cols: list[str], y_col: str,
                  beta: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One streaming Poisson-Newton pass at `beta` (log link): returns
    (XᵀWX, Xᵀ(y−μ)) summed over all blocks with μ = exp(Xβ) and
    W = diag(μ) — the canonical-link Fisher scoring weights. Same
    combiner-first shape as the logistic `_irls_pass`: each block ships
    one (p², p) partial, the driver merges O(blocks) of them."""
    import ray

    p = len(x_cols) + 1
    bref = ray.put(beta.copy())

    def step_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        b = _ray.get(bref)
        X = np.column_stack([np.ones(batch.num_rows),
                             _matrix(batch, x_cols)])
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mu = np.exp(X @ b)
        XtWX = X.T @ (X * mu[:, None])
        Xtz = X.T @ (y - mu)
        return pa.Table.from_pylist([{
            "xtwx": XtWX.ravel().tolist(), "xtz": Xtz.tolist()}])

    H = np.zeros((p, p))
    g = np.zeros(p)
    for r in collect_pylist(ds.map_batches(step_partial, batch_format="pyarrow")):
        H += np.asarray(r["xtwx"]).reshape(p, p)
        g += np.asarray(r["xtz"])
    return H, g


def poisson_fit(ds, x_cols: list[str], y_col: str,
                max_iter: int = 8, tol: float = 1e-8) -> dict:
    """Poisson regression (log link) via distributed Newton scoring —
    the count-response GLM sibling of `logistic_fit` (reference
    models/registry.py lists Poisson among its sklearn regressors).
    Each iteration is ONE streaming pass; at β=0 every μ is 1 and
    W = I, so the first update has the closed form (XᵀX)⁻¹Xᵀ(y−1) —
    the SQL-anchorable slice the `poisson_step_lineitem` oracle unrolls
    (two steps; the converged fit has no closed form). Returns
    {intercept, coef, rate_ratios, n_iter}."""
    p = len(x_cols) + 1
    beta = np.zeros(p)

    for it in range(max_iter):
        H, g = _poisson_pass(ds, x_cols, y_col, beta)
        delta = np.linalg.solve(H + 1e-10 * np.eye(p), g)
        beta = beta + delta
        if float(np.abs(delta).max()) < tol:
            break
    return {"intercept": float(beta[0]),
            "coef": beta[1:].tolist(),
            "rate_ratios": np.exp(beta[1:]).tolist(),
            "n_iter": it + 1}


def gaussian_nb_fit(ds, x_cols: list[str], y_col: str,
                    var_smoothing: float = 1e-9) -> dict:
    """Gaussian Naive Bayes over numeric features — the numeric-feature
    sibling of the multinomial NB text classifier
    (webtext.nb_quality_scores), registered as the fifth estimator
    family (reference models/registry.py:34-411 lists GaussianNB among
    its sklearn classifiers). ONE combiner-first distributed pass: each
    batch emits per-(class, feature) (n, Σx, Σx²) rows, a
    2·p-key groupby Sum merges them, and the driver closes the
    class priors + per-feature Gaussians (sklearn-style variance
    smoothing: + var_smoothing · max feature variance). Returns
    {priors: {0: p0, 1: p1}, means: (2, p), vars: (2, p), n: int}."""
    from ray.data.aggregate import Sum

    p = len(x_cols)

    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in x_cols])
        rows = {"cls": [], "feat": [], "n": [], "sx": [], "sxx": []}
        for cls in (0, 1):
            sel = X[y == cls]
            if not sel.shape[0]:
                continue
            for j in range(p):
                rows["cls"].append(cls)
                rows["feat"].append(j)
                rows["n"].append(sel.shape[0])
                rows["sx"].append(float(sel[:, j].sum()))
                rows["sxx"].append(float((sel[:, j] ** 2).sum()))
        return pa.table({"cls": pa.array(rows["cls"], type=pa.int64()),
                         "feat": pa.array(rows["feat"], type=pa.int64()),
                         "n": pa.array(rows["n"], type=pa.int64()),
                         "sx": pa.array(rows["sx"], type=pa.float64()),
                         "sxx": pa.array(rows["sxx"], type=pa.float64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["cls", "feat"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sxx", alias_name="sxx")))
    n_c = np.zeros(2, dtype=np.int64)
    means = np.zeros((2, p))
    varis = np.zeros((2, p))
    for r in collect_pylist(merged):
        c, j, n = int(r["cls"]), int(r["feat"]), int(r["n"])
        n_c[c] = n
        mu = r["sx"] / n
        means[c, j] = mu
        varis[c, j] = max(r["sxx"] / n - mu * mu, 0.0)
    if n_c[0] == 0 or n_c[1] == 0:
        raise ValueError(f"degenerate NB training labels (n0={n_c[0]}, "
                         f"n1={n_c[1]}); both classes must be non-empty")
    varis += var_smoothing * varis.max()
    n = int(n_c.sum())
    return {"priors": {0: n_c[0] / n, 1: n_c[1] / n},
            "means": means, "vars": varis, "n": n}


def lda_fit(ds, x_cols: list[str], y_col: str) -> dict:
    """Fisher / Gaussian linear discriminant analysis — the
    equal-covariance sibling of gaussian_nb_fit (reference
    models/registry.py:34-411 lists LinearDiscriminantAnalysis among
    its sklearn classifiers). ONE streaming pass accumulates EXACT
    per-class integer sufficient statistics (n_c, Σx, Σxxᵀ — features
    must be integer-valued, the repo-wide integer-units convention, so
    the partials merge as Python bigints bit-identically under any
    partitioning), then the driver closes the pooled within-class
    covariance Σ̂ = S_w/(n−2) and the Bayes discriminant

        w = Σ̂⁻¹(μ₁ − μ₀),  b = −½·wᵀ(μ₀+μ₁) + ln(n₁/n₀)

    (score(x) = wᵀx + b is the exact log posterior odds under the
    equal-covariance Gaussian model). For p=2 the inverse is the
    explicit cofactor formula, term-ordered to mirror the SQL oracle
    (queries.LDA_FIT_SQL); larger p uses np.linalg.solve. Returns
    {n0, n1, coef, intercept, means}."""
    import math

    p = len(x_cols)

    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
             for c in x_cols])
        rows = []
        for cls in (0, 1):
            sel = X[y == cls]
            if not sel.shape[0]:
                continue
            rows.append({"cls": cls, "n": int(sel.shape[0]),
                         "s": sel.sum(axis=0).tolist(),
                         "m": (sel.T @ sel).ravel().tolist()})
        return pa.Table.from_pylist(rows)

    n_c = [0, 0]
    s_c = [[0] * p, [0] * p]                      # Python ints: exact
    m_c = [[0] * (p * p), [0] * (p * p)]
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        c = int(r["cls"])
        n_c[c] += r["n"]
        for j in range(p):
            s_c[c][j] += int(r["s"][j])
        for j in range(p * p):
            m_c[c][j] += int(r["m"][j])
    if n_c[0] == 0 or n_c[1] == 0:
        raise ValueError(f"degenerate LDA training labels (n0={n_c[0]}, "
                         f"n1={n_c[1]}); both classes must be non-empty")
    n0, n1 = n_c
    dof = n0 + n1 - 2
    # pooled within-class scatter / covariance, same float-op order as
    # the SQL oracle: (M0 − s0·s0ᵀ/n0 + (M1 − s1·s1ᵀ/n1)) / dof
    cov = np.empty((p, p))
    for i in range(p):
        for j in range(p):
            cov[i, j] = (float(m_c[0][i * p + j])
                         - float(s_c[0][i]) * float(s_c[0][j]) / n0
                         + (float(m_c[1][i * p + j])
                            - float(s_c[1][i]) * float(s_c[1][j]) / n1)) / dof
    mu0 = np.array([float(s) / n0 for s in s_c[0]])
    mu1 = np.array([float(s) / n1 for s in s_c[1]])
    dm = mu1 - mu0
    if p == 2:   # explicit cofactor solve, mirrored in LDA_FIT_SQL
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[0, 1]
        w = np.array([(cov[1, 1] * dm[0] - cov[0, 1] * dm[1]) / det,
                      (cov[0, 0] * dm[1] - cov[0, 1] * dm[0]) / det])
    else:
        w = np.linalg.solve(cov, dm)
    b = -0.5 * float(w @ (mu0 + mu1)) + math.log(n1 / n0)
    return {"n0": n0, "n1": n1, "coef": w.tolist(), "intercept": float(b),
            "means": (mu0.tolist(), mu1.tolist())}


def qda_fit(ds, x_cols: list[str], y_col: str) -> dict:
    """Quadratic discriminant analysis — LDA's per-class-covariance
    sibling (reference models/registry.py:34-411 lists
    QuadraticDiscriminantAnalysis). Same ONE-pass exact integer
    sufficient statistics as lda_fit (per-class n, Σx, Σxxᵀ merged as
    Python bigints → bit-identical under any partitioning); the driver
    closes per-class means μ_c and ddof=1 covariances Σ_c, and the
    quadratic Bayes discriminant

        score(x) = ln(n₁/n₀) − ½(ln det Σ₁ − ln det Σ₀)
                   − ½[(x−μ₁)ᵀΣ₁⁻¹(x−μ₁) − (x−μ₀)ᵀΣ₀⁻¹(x−μ₀)]

    (the exact log posterior odds under the per-class Gaussian model).
    For p=2 the inverses/determinants are explicit cofactor formulas
    term-ordered to mirror QDA_FIT_SQL. Returns {n0, n1, means, covs,
    logdets} plus a `score(X)` closure used by QDAModel."""
    p = len(x_cols)

    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
             for c in x_cols])
        rows = []
        for cls in (0, 1):
            sel = X[y == cls]
            if not sel.shape[0]:
                continue
            rows.append({"cls": cls, "n": int(sel.shape[0]),
                         "s": sel.sum(axis=0).tolist(),
                         "m": (sel.T @ sel).ravel().tolist()})
        return pa.Table.from_pylist(rows)

    n_c = [0, 0]
    s_c = [[0] * p, [0] * p]
    m_c = [[0] * (p * p), [0] * (p * p)]
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        c = int(r["cls"])
        n_c[c] += r["n"]
        for j in range(p):
            s_c[c][j] += int(r["s"][j])
        for j in range(p * p):
            m_c[c][j] += int(r["m"][j])
    if n_c[0] < 2 or n_c[1] < 2:
        raise ValueError(f"degenerate QDA training labels (n0={n_c[0]}, "
                         f"n1={n_c[1]}); both classes need >= 2 rows")
    means, covs = [], []
    for c in (0, 1):
        n = n_c[c]
        mu = np.array([float(s) / n for s in s_c[c]])
        cov = np.empty((p, p))
        for i in range(p):
            for j in range(p):
                # ddof=1, same float-op order as QDA_FIT_SQL:
                # (M − s_i·s_j/n) / (n − 1)
                cov[i, j] = (float(m_c[c][i * p + j])
                             - float(s_c[c][i]) * float(s_c[c][j]) / n) \
                    / (n - 1)
        means.append(mu)
        covs.append(cov)
    if p == 2:
        dets = [cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[0, 1]
                for cov in covs]
        invs = [np.array([[cov[1, 1] / det, -cov[0, 1] / det],
                          [-cov[0, 1] / det, cov[0, 0] / det]])
                for cov, det in zip(covs, dets)]
        logdets = [float(np.log(d)) for d in dets]
    else:
        invs = [np.linalg.inv(cov) for cov in covs]
        logdets = [float(np.linalg.slogdet(cov)[1]) for cov in covs]
    return {"n0": n_c[0], "n1": n_c[1],
            "means": [m.tolist() for m in means],
            "covs": [c_.tolist() for c_ in covs],
            "invs": [iv.tolist() for iv in invs],
            "logdets": logdets}


def multinomial_nb_fit(ds, x_cols: list[str], y_col: str,
                       alpha: float = 1.0) -> dict:
    """Multinomial Naive Bayes over nonnegative integer count features
    — the numeric-feature registry sibling of the text classifier
    (webtext.nb_quality_scores; reference models/registry.py:34-411
    lists MultinomialNB). ONE streaming pass of exact integer
    sufficient statistics (per-class n and per-feature count totals,
    merged as Python bigints → bit-identical under any partitioning);
    the driver closes Laplace-smoothed log feature probabilities

        ln θ_cj = ln (T_cj + α) − ln (Σ_j T_cj + α·p)

    Returns {n0, n1, log_theta: (2, p), totals: (2, p)}."""
    import math

    p = len(x_cols)

    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
             for c in x_cols])
        if (X < 0).any():
            raise ValueError("multinomial NB requires nonnegative counts")
        rows = []
        for cls in (0, 1):
            sel = X[y == cls]
            if not sel.shape[0]:
                continue
            rows.append({"cls": cls, "n": int(sel.shape[0]),
                         "t": sel.sum(axis=0).tolist()})
        return pa.Table.from_pylist(rows)

    n_c = [0, 0]
    t_c = [[0] * p, [0] * p]
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        c = int(r["cls"])
        n_c[c] += r["n"]
        for j in range(p):
            t_c[c][j] += int(r["t"][j])
    if n_c[0] == 0 or n_c[1] == 0:
        raise ValueError(f"degenerate NB training labels (n0={n_c[0]}, "
                         f"n1={n_c[1]}); both classes must be non-empty")
    log_theta = [[math.log(float(t_c[c][j]) + alpha)
                  - math.log(float(sum(t_c[c])) + alpha * p)
                  for j in range(p)] for c in (0, 1)]
    return {"n0": n_c[0], "n1": n_c[1], "log_theta": log_theta,
            "totals": [list(t) for t in t_c]}


def knn_classify(ds, id_col: str, label_col: str, feature_cols: list[str],
                 test_mod: int = 997, k: int = 5,
                 max_test: int = 100_000) -> pa.Table:
    """Distributed k-nearest-neighbor classification (reference
    models/registry.py:34-411 lists KNeighborsClassifier) — the
    labeled-vote sibling of knn_impute's broadcast-and-scan shape.

    Deterministic split: rows with ``id % test_mod == 0`` are the test
    set; everything else trains. Pass 1 gathers the (bounded,
    max_test-guarded — at 10¹² rows classification runs shard-by-shard
    so the broadcast query side stays small) test feature matrix and
    broadcasts it once via ray.put. Pass 2 streams the train corpus;
    each block computes EXACT int64 squared euclidean distances
    (features must be integer-valued) from every test row to its train
    rows and keeps a local top-k under the GLOBAL total order
    (d², train id) — integer distances make the tie-break exact, no
    rounding epsilon needed. The driver merges the ≤ k·n_blocks
    candidates per test row and majority-votes the k nearest labels.
    Returns (id, n_pos, pred) sorted by id — bit-identical under any
    partitioning and exactly reproducible in SQL
    (queries.KNN_CLASSIFY_SQL: cross join + row_number ≤ k)."""
    import ray

    def collect_test(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = (ids % test_mod) == 0
        cols = {"id": pa.array(ids[m], type=pa.int64())}
        for c in feature_cols:
            cols[c] = pa.array(
                batch.column(c).to_numpy(zero_copy_only=False)[m]
                .astype(np.int64), type=pa.int64())
        return pa.table(cols)

    test_rows = collect_pylist(ds.map_batches(collect_test,
                                              batch_format="pyarrow"))
    if not test_rows:
        return pa.table({"id": pa.array([], type=pa.int64()),
                         "n_pos": pa.array([], type=pa.int64()),
                         "pred": pa.array([], type=pa.int64())})
    if len(test_rows) > max_test:
        raise ValueError(f"{len(test_rows)} test rows exceed max_test="
                         f"{max_test}; classify shard-by-shard at this scale")
    t_ids = np.array([r["id"] for r in test_rows], dtype=np.int64)
    t_mat = np.array([[r[c] for c in feature_cols] for r in test_rows],
                     dtype=np.int64)
    tref = ray.put((t_ids, t_mat))

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ti, tm = _ray.get(tref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        train = (ids % test_mod) != 0
        if not train.any():
            return pa.table({"tid": pa.array([], type=pa.int64()),
                             "did": pa.array([], type=pa.int64()),
                             "d2": pa.array([], type=pa.int64()),
                             "y": pa.array([], type=pa.int64())})
        did = ids[train].astype(np.int64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[train]
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False)[train]
             .astype(np.int64) for c in feature_cols])
        out = {"tid": [], "did": [], "d2": [], "y": []}
        top = min(k, len(did))
        for i in range(len(ti)):
            diff = X - tm[i]
            d2 = (diff * diff).sum(axis=1)        # exact int64
            # candidates = everything ≤ the kth smallest distance, then
            # the global (d², id) order decides among boundary ties
            kth = np.partition(d2, top - 1)[top - 1]
            cand = np.nonzero(d2 <= kth)[0]
            order = np.lexsort((did[cand], d2[cand]))[:top]
            sel = cand[order]
            out["tid"].extend([int(ti[i])] * len(sel))
            out["did"].extend(did[sel].tolist())
            out["d2"].extend(d2[sel].tolist())
            out["y"].extend(y[sel].tolist())
        return pa.table({kk: pa.array(v, type=pa.int64())
                         for kk, v in out.items()})

    import pandas as pd

    cand = pd.DataFrame(collect_pylist(
        ds.map_batches(local_topk, batch_format="pyarrow")))
    rows = []
    for tid, g in cand.groupby("tid"):
        g = g.sort_values(["d2", "did"], kind="mergesort").head(k)
        n_pos = int(g["y"].sum())
        rows.append({"id": int(tid), "n_pos": n_pos,
                     "pred": int(n_pos * 2 > k)})
    rows.sort(key=lambda r: r["id"])
    return pa.Table.from_pylist(rows)


def logistic_inference(ds, x_cols: list[str], y_col: str,
                       max_iter: int = 8) -> pa.Table:
    """Per-coefficient inference table — the reference's logistic
    summary semantics (ui/views/evaluation/tabs/inference.py:111-115:
    odds ratios + coefficient p-values): Wald std errors from the
    inverse Fisher information at the IRLS optimum, z = β/se,
    two-sided normal p-value, odds ratio exp(β). Returns
    (feature, coef, std_err, z, p_value, odds_ratio) — intercept row
    first, then x_cols in call order."""
    import math

    fit = logistic_fit(ds, x_cols, y_col, max_iter=max_iter,
                       with_information=True)
    beta = np.concatenate([[fit["intercept"]], np.asarray(fit["coef"])])
    cov = np.linalg.inv(fit["information"])
    se = np.sqrt(np.maximum(np.diag(cov), 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(se > 0, beta / se, np.inf * np.sign(beta))
    pvals = np.array([math.erfc(abs(zz) / math.sqrt(2.0)) for zz in z])
    names = ["(intercept)"] + list(x_cols)
    return pa.table({
        "feature": pa.array(names, type=pa.string()),
        "coef": pa.array(np.round(beta, 6), type=pa.float64()),
        "std_err": pa.array(np.round(se, 6), type=pa.float64()),
        "z": pa.array(np.round(z, 6), type=pa.float64()),
        "p_value": pa.array(np.round(pvals, 6), type=pa.float64()),
        "odds_ratio": pa.array(np.round(np.exp(beta), 6), type=pa.float64()),
    })


def boosted_stumps_fit(ds, x_cols: list[str], y_col: str,
                       n_rounds: int = 10, n_bins: int = 32,
                       lr: float = 0.5, min_leaf: int = 1):
    """Histogram gradient-boosted decision stumps — the library-free
    tree family (reference models/registry.py:34-411 lists RF/GBM/XGB;
    sklearn/xgboost are absent here, so the tree family is rebuilt on
    the LightGBM histogram principle: shuffle-free per-(feature, bin)
    gradient partials, driver split selection over O(p·n_bins) stats).

    Passes over the data: 1 (per-feature min/max + base mean) +
    n_rounds. Each round, the residual r = y − F_{t−1}(x) is
    recomputed IN-TASK from the broadcast stump list (never
    materialized as a column — at 10¹² rows a residual column per
    round would dwarf the input); one map_batches pass emits ONE
    O(p·n_bins) partial row per block; the driver prefix-scans for the
    variance-reduction-optimal split and appends the lr-scaled stump.
    Deterministic: equal-width bins from global min/max, argmax
    tie-break by (feature, bin) order, no RNG.

    Returns a BoostedStumpsModel (models.py) with .predict(X); its
    `x < threshold` routing is exactly the training bin boundary, so
    predict matches the histogram fit on every input."""
    from tanml_ray.models import BoostedStumpsModel

    import ray

    p = len(x_cols)

    def mm_partial(batch: pa.Table) -> pa.Table:
        X = _matrix(batch, x_cols)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if not len(y):
            return pa.Table.from_pylist([])
        return pa.Table.from_pylist([{
            "mn": X.min(axis=0).tolist(), "mx": X.max(axis=0).tolist(),
            "n": int(len(y)), "sy": float(y.sum())}])

    mn = np.full(p, np.inf)
    mx = np.full(p, -np.inf)
    n_tot = 0
    sy = 0.0
    for r in collect_pylist(ds.map_batches(mm_partial, batch_format="pyarrow")):
        mn = np.minimum(mn, np.asarray(r["mn"]))
        mx = np.maximum(mx, np.asarray(r["mx"]))
        n_tot += int(r["n"])
        sy += float(r["sy"])
    if n_tot == 0:
        return BoostedStumpsModel(0.0, [])
    base = sy / n_tot
    edges = [np.linspace(mn[j], mx[j] if mx[j] > mn[j] else mn[j] + 1.0,
                         n_bins + 1) for j in range(p)]
    interior = [e[1:-1] for e in edges]
    stumps: list[tuple[int, float, float, float]] = []

    for _ in range(n_rounds):
        model_ref = ray.put((base, list(stumps)))

        def hist_partial(batch: pa.Table) -> pa.Table:
            import ray as _ray

            b0, st = _ray.get(model_ref)
            X = _matrix(batch, x_cols)
            y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
            if not len(y):
                return pa.Table.from_pylist([])
            F = np.full(len(y), b0)
            for j, thr, lv, rv in st:
                F += np.where(X[:, j] < thr, lv, rv)
            r = y - F
            S = np.empty((p, n_bins))
            C = np.empty((p, n_bins))
            for j in range(p):
                b = np.searchsorted(interior[j], X[:, j], side="right")
                S[j] = np.bincount(b, weights=r, minlength=n_bins)
                C[j] = np.bincount(b, minlength=n_bins)
            return pa.Table.from_pylist([{
                "s": S.ravel().tolist(), "c": C.ravel().tolist()}])

        S = np.zeros((p, n_bins))
        C = np.zeros((p, n_bins))
        for r in collect_pylist(ds.map_batches(hist_partial,
                                               batch_format="pyarrow")):
            S += np.asarray(r["s"]).reshape(p, n_bins)
            C += np.asarray(r["c"]).reshape(p, n_bins)
        SL = S.cumsum(axis=1)[:, :-1]
        CL = C.cumsum(axis=1)[:, :-1]
        SR = S.sum(axis=1, keepdims=True) - SL
        CR = C.sum(axis=1, keepdims=True) - CL
        valid = (CL >= min_leaf) & (CR >= min_leaf)
        with np.errstate(divide="ignore", invalid="ignore"):
            gain = np.where(valid, SL * SL / np.maximum(CL, 1)
                            + SR * SR / np.maximum(CR, 1), -np.inf)
        if not np.isfinite(gain).any():
            break
        j, s = np.unravel_index(int(np.argmax(gain)), gain.shape)
        stumps.append((int(j), float(edges[j][s + 1]),
                       lr * float(SL[j, s] / CL[j, s]),
                       lr * float(SR[j, s] / CR[j, s])))
    return BoostedStumpsModel(base, stumps)


def linear_fit(ds, x_cols: list[str], y_col: str,
               ridge: float = 0.0) -> dict:
    """Distributed multivariate OLS (optionally ridge): ONE streaming
    pass accumulates the Gram matrix XᵀX and XᵀY partials per block
    (with intercept column), then a driver-side (p+1)² solve — the
    closed-form analog of the reference's linear estimators
    (models/registry.py linear family). Returns
    {intercept, coef, n, r2}."""
    G, b, n, sy, syy = _linear_suffstats(ds, x_cols, y_col)
    return _solve_linear(G, b, n, sy, syy, ridge)


def _linear_suffstats(ds, x_cols: list[str], y_col: str):
    """ONE streaming pass → (G=XᵀX, b=Xᵀy, n, Σy, Σy²) with intercept
    column. Shared by the plain/ridge fits and the ridge path."""
    p = len(x_cols) + 1

    def partial(batch: pa.Table) -> pa.Table:
        X = np.column_stack([np.ones(batch.num_rows), _matrix(batch, x_cols)])
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pylist([{
            "xtx": (X.T @ X).ravel().tolist(),
            "xty": (X.T @ y).tolist(),
            "n": int(len(y)),
            "sy": float(y.sum()),
            "syy": float((y * y).sum())}])

    G = np.zeros((p, p))
    b = np.zeros(p)
    n = 0
    sy = syy = 0.0
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        G += np.asarray(r["xtx"]).reshape(p, p)
        b += np.asarray(r["xty"])
        n += r["n"]
        sy += r["sy"]
        syy += r["syy"]
    return G, b, n, sy, syy


def _solve_linear(G, b, n, sy, syy, ridge: float = 0.0) -> dict:
    p = G.shape[0]
    beta = np.linalg.solve(G + ridge * np.eye(p), b)
    # R² from the same sufficient statistics: SSE = yᵀy − 2βᵀXᵀy + βᵀXᵀXβ
    # (G UNpenalized — the residuals are measured against the data)
    sse = syy - 2.0 * beta @ b + beta @ G @ beta
    sst = syy - sy * sy / n if n else float("nan")
    return {"intercept": float(beta[0]), "coef": beta[1:].tolist(),
            "n": n, "r2": float(1.0 - sse / sst) if sst else float("nan")}


def ridge_path(ds, x_cols: list[str], y_col: str,
               lambdas: list[float]) -> list[dict]:
    """Regularization path: sufficient statistics accumulate ONCE, then
    each λ is a driver-side (p+1)² solve — the scale-correct shape for
    hyperparameter sweeps over closed-form models (one input pass total,
    however many λs)."""
    G, b, n, sy, syy = _linear_suffstats(ds, x_cols, y_col)
    out = []
    for lam in lambdas:
        row = _solve_linear(G, b, n, sy, syy, ridge=lam)
        row["lam"] = float(lam)
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# Distributed covariance of an embedding column + driver-side PCA.
# One streaming pass accumulates EXACT integer sufficient statistics
# (components quantized to a 2^16 grid — the embedding-space analog of
# the repo-wide integer-cents convention: the operator's contract is
# the exact covariance OF the quantized values, so engine and SQL
# agree bit-for-bit under any partitioning): per batch n, Σx (d), and
# the full Gram matrix ΣxxT (d×d int64 matmul), merged as Python
# bigints on the driver. d=64 → 4 KB + 32 KB per block partial.
# The PCA step (eigh of the 64×64 covariance + a projection
# map_batches) is driver-side numpy on the tiny matrix — the right
# split at any corpus size, since cov is dimension- not row-sized.
# ---------------------------------------------------------------------------

def embedding_covariance(ds, vec_col: str = "embedding",
                         grid: int = 1 << 16,
                         fan_in: int = 32) -> tuple[np.ndarray, int]:
    """Returns (cov, n): the exact sample covariance (ddof=1) of the
    grid-quantized embedding components, in ORIGINAL units.

    Scale path: the per-batch partials (one (1 + d + d²)-int64 row per
    ~10³ vectors) would number ~10⁶ at 10⁹ vectors — too much to
    stream raw to the driver — so they are pre-merged in ≤ `fan_in`
    distributed groups with EXACT Python-int sums (int64 would
    overflow once ~10⁶ block Grams accumulate) shipped as decimal
    strings; the driver then merges O(fan_in) rows regardless of
    corpus size. Integer addition is associative, so the result is
    bit-identical at any fan_in / partitioning."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.list_(pa.int64())),
                             "g": pa.array([], type=pa.list_(pa.int64()))})
        v = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        # floor, not rint: float32 components are dyadic rationals, so
        # v*grid can land EXACTLY on .5 — np.rint (half-to-even) and
        # SQL round (half-away) would then disagree; floor is
        # unambiguous on both sides.
        x = np.floor(v * grid).astype(np.int64)
        return pa.table({
            "n": pa.array([x.shape[0]], type=pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()],
                          type=pa.list_(pa.int64())),
            "g": pa.array([(x.T @ x).ravel().tolist()],
                          type=pa.list_(pa.int64()))})

    def merge_exact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.string()),
                             "g": pa.array([], type=pa.string())})
        mn = 0
        ms = None
        mg = None
        for r in batch.to_pylist():
            mn += int(r["n"])
            rs = [int(v) for v in r["s"]]
            rg = [int(v) for v in r["g"]]
            ms = rs if ms is None else [a + b for a, b in zip(ms, rs)]
            mg = rg if mg is None else [a + b for a, b in zip(mg, rg)]
        return pa.table({
            "n": pa.array([mn], type=pa.int64()),
            "s": pa.array([" ".join(map(str, ms))], type=pa.string()),
            "g": pa.array([" ".join(map(str, mg))], type=pa.string())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .repartition(fan_in)
                .map_batches(merge_exact, batch_format="pyarrow",
                             batch_size=None))
    n = 0
    s = None
    g = None
    for r in collect_pylist(merged):
        n += int(r["n"])
        rs = [int(t) for t in r["s"].split()]
        rg = [int(t) for t in r["g"].split()]
        s = rs if s is None else [a + b for a, b in zip(s, rs)]
        g = rg if g is None else [a + b for a, b in zip(g, rg)]
    if n < 2:
        raise ValueError(f"need >= 2 vectors for covariance, got {n}")
    d = len(s)
    cov = np.empty((d, d))
    scale = float(grid) * float(grid)
    for i in range(d):
        for j in range(d):
            sij = g[i * d + j]
            cov[i, j] = ((float(sij) - float(s[i]) * float(s[j]) / n)
                         / (n - 1) / scale)
    return cov, n


def pca_project(ds, n_components: int = 2, vec_col: str = "embedding",
                id_col: str = "vec_id", grid: int = 1 << 16):
    """PCA projection: distributed covariance → driver eigh → one
    shuffle-free projection pass. Component sign is fixed
    deterministically (largest-|loading| coordinate made positive).
    Returns a Dataset of (vec_id, pc: list<double>[n_components])."""
    import ray

    cov, _ = embedding_covariance(ds, vec_col=vec_col, grid=grid)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = V[:, order].T                      # (k, d)
    for c in comps:
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c *= -1.0
    cref = ray.put(comps)

    def project(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(cref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "pc": pa.array([], type=pa.list_(pa.float64()))})
        v = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        p = v @ C.T
        return pa.table({id_col: batch.column(id_col),
                         "pc": pa.array([row.tolist() for row in p],
                                        type=pa.list_(pa.float64()))})

    return ds.map_batches(project, batch_format="pyarrow")
