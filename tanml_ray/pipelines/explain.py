"""Explainability + model-benchmark suite (SURVEY §2.3 T2 stand-in).

The reference's SHAP check (tanml/checks/explainability/shap_check.py:
138-177 explainer selection, 244-259 background/test sampling, 313-324
mean-|shap| top-k ranking) needs the `shap` library, which this
environment doesn't have. The library-free stand-in that honors the
check's intent is PERMUTATION importance: re-score a bounded evaluation
sample with one feature's column permuted and rank features by the mean
absolute prediction delta — the same "how much does this feature move
the output" quantity mean-|shap| summarizes, with the same
argsort-descending top-`max_display` ranking semantics
(shap_check.py:313-314, defaults bg_n=100/test_n=200/max_display=20 at
:195-201).

Determinism contract (what makes this ORACLE-able in SQL): the
evaluation sample is the `test_n` smallest ids (reference: Xte.head)
and the permutation is the cyclic shift by one position in ascending-id
order — a fixed derangement, expressible as LEAD(...) OVER (ORDER BY
id) with wraparound. No RNG anywhere.

Scale shape: the sample extraction is a distributed min-k (per-block
local top-k, merge of block×k rows); scoring runs through the
ScorerStage actor pool (model deserialized once per actor). Only the
bounded sample (test_n × features) ever sits on the driver, matching
the reference's own bounded-sample contract.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from tanml_ray.functions.collect import from_pandas_clean, collect_pylist


def sample_min_k(ds, id_col: str, cols: list[str], n: int) -> pa.Table:
    """Distributed deterministic bounded sample: the n smallest-id rows.
    Per-block local top-k first, so at most blocks×n rows merge on the
    driver — never the dataset."""
    want = [id_col] + [c for c in cols if c != id_col]

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.select(want)
        order = np.argsort(t.column(id_col).to_numpy(zero_copy_only=False),
                           kind="stable")[:n]
        return t.take(order)

    parts = collect_pylist(ds.map_batches(local_topk, batch_format="pyarrow"))
    df = pd.DataFrame(parts).sort_values(id_col, kind="mergesort").head(n)
    return from_pandas_clean(df.reset_index(drop=True), preserve_index=False)


def permutation_importance(ds, model: Any, feature_cols: list[str],
                           id_col: str, test_n: int = 200,
                           max_display: int = 20,
                           concurrency: int = 2) -> pa.Table:
    """Feature ranking by mean |Δprediction| under single-feature
    permutation (cyclic shift in id order) on the n-smallest-id sample.

    Returns (rank, feature, mean_abs_delta) sorted descending by
    mean_abs_delta (ties broken by feature name), top `max_display` —
    the reference's mean-|shap| ranking semantics
    (shap_check.py:313-324)."""
    import ray
    import ray.data as rd

    sample = sample_min_k(ds, id_col, feature_cols, test_n)
    n = sample.num_rows
    base = {c: sample.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols}

    # one variant table per feature + the baseline, tagged; the scorer
    # actor pool sees it as a single stream of batches
    tables = []
    variants = ["__base__"] + list(feature_cols)
    for v in variants:
        cols = {"variant": pa.array([v] * n, type=pa.string()),
                "row": pa.array(np.arange(n), type=pa.int64())}
        for c in feature_cols:
            x = base[c]
            if c == v:
                x = np.roll(x, -1)  # cyclic shift: LEAD(...) with wrap
            cols[c] = pa.array(x, type=pa.float64())
        tables.append(pa.table(cols))
    vds = rd.from_arrow(pa.concat_tables(tables)).repartition(len(variants))

    ref = ray.put(model)
    from tanml_ray.stages.scoring import ScorerStage

    scored = vds.map_batches(
        ScorerStage,
        fn_constructor_kwargs={"model_ref": ref, "feature_cols": feature_cols,
                               "output_col": "score"},
        batch_format="pyarrow", concurrency=concurrency)

    preds: dict[str, np.ndarray] = {}
    for r in collect_pylist(scored.select_columns(["variant", "row", "score"])):
        preds.setdefault(r["variant"], np.zeros(n))[r["row"]] = r["score"]
    b = preds["__base__"]
    rows = [{"feature": c,
             "mean_abs_delta": float(np.abs(preds[c] - b).mean())}
            for c in feature_cols]
    rows.sort(key=lambda r: (-r["mean_abs_delta"], r["feature"]))
    rows = rows[:max_display]
    for i, r in enumerate(rows):
        r["rank"] = i + 1
    return pa.table({
        "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
        "feature": pa.array([r["feature"] for r in rows], type=pa.string()),
        "mean_abs_delta": pa.array([round(r["mean_abs_delta"], 6) for r in rows],
                                   type=pa.float64()),
    })


class KernelShapStage:
    """Actor-pool stage for kernel_shap_summary: holds (model,
    background matrix, coalition table) — built once per ACTOR — and
    turns each batch of explain rows into per-feature |shap| partial
    sums. 2^M·bg_n predict rows per explain row, fully vectorized."""

    def __init__(self, model_ref, bg_ref, x_cols: list[str]):
        from math import factorial

        import ray

        self.model = ray.get(model_ref)
        self.B = np.asarray(ray.get(bg_ref), dtype=np.float64)
        self.x_cols = list(x_cols)
        M = len(self.x_cols)
        self.M = M
        n_coal = 1 << M
        self.masks = (((np.arange(n_coal)[:, None] >> np.arange(M)[None, :])
                       & 1) == 1)
        sizes = self.masks.sum(axis=1)
        fact = [float(factorial(k)) for k in range(M + 1)]
        # Shapley weight of the pair (S, S∪{i}) indexed by S's mask:
        # |S|!·(M−1−|S|)!/M! (rows with |S|=M never appear as an S)
        self.w = np.array([fact[s] * fact[M - 1 - s] / fact[M]
                           if s < M else 0.0 for s in sizes])
        self.pairs = []
        for i in range(M):
            no_i = np.flatnonzero(~self.masks[:, i])
            self.pairs.append((no_i, no_i | (1 << i)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in self.x_cols])
        bg_n = self.B.shape[0]
        n_coal = 1 << self.M
        sad = np.zeros(self.M)
        base = float("nan")
        for x in X:
            # (coalitions, background, features): masked features take
            # the explain row's value, the rest keep the background's
            rep = np.where(self.masks[:, None, :], x[None, None, :],
                           self.B[None, :, :])
            v = (self.model.predict(rep.reshape(-1, self.M))
                 .astype(np.float64).reshape(n_coal, bg_n).mean(axis=1))
            base = float(v[0])  # v(∅) = E_bg[f], identical for every row
            for i in range(self.M):
                s0, s1 = self.pairs[i]
                sad[i] += abs(float((self.w[s0] * (v[s1] - v[s0])).sum()))
        return pa.Table.from_pylist([{
            "sad": sad.tolist(), "n": int(len(X)), "base": base}])


def kernel_shap_summary(ds, model: Any, x_cols: list[str], id_col: str,
                        bg_n: int = 100, test_n: int = 50,
                        concurrency: int = 2,
                        max_features: int = 12) -> pa.Table:
    """Model-agnostic KernelSHAP (Lundberg & Lee 2017 §4; reference
    shap_check.py:138-177 KernelExplainer selection, :244-259 bounded
    background/test sampling) with FULL coalition enumeration: for
    M ≤ max_features features, φ_i = Σ_{S⊆F∖{i}} |S|!(M−1−|S|)!/M! ·
    [v(S∪{i}) − v(S)] with v(S) = mean over the background sample of
    f(x_S, b_∖S) — the EXACT Shapley value of ANY .predict model under
    the interventional value function, not a sampled approximation
    (sampling is pointless at enumerable M; above max_features this
    raises rather than silently degrading). For a linear model the
    formula provably collapses to β_i·(x_i − mean_bg(x_i)), which is
    the validation contract: kernel_shap_orders matches the
    linear-SHAP closed form and its SQL oracle.

    Background and explain sets are deterministic n-smallest-id
    prefixes (distributed min-k — the reference's head() sampling,
    made partition-stable). Explain rows stream through a
    KernelShapStage actor pool: model + background + coalition table
    built once per actor, never per batch.

    Returns one row per feature: (feature, mean_abs_shap, base_value),
    ranked by mean_abs_shap descending (reference summary ordering).
    """
    import ray
    import ray.data as rd

    M = len(x_cols)
    if M > max_features:
        raise ValueError(
            f"{M} features > max_features={max_features}: 2^M coalition "
            "enumeration is intractable — reduce the feature set or raise "
            "max_features consciously")
    bg = sample_min_k(ds, id_col, x_cols, bg_n)
    ex = sample_min_k(ds, id_col, x_cols, test_n)
    B = np.column_stack(
        [bg.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
         for c in x_cols])
    model_ref = ray.put(model)
    bg_ref = ray.put(B)
    parts = rd.from_arrow(ex).repartition(concurrency).map_batches(
        KernelShapStage,
        fn_constructor_kwargs={"model_ref": model_ref, "bg_ref": bg_ref,
                               "x_cols": x_cols},
        batch_format="pyarrow", concurrency=concurrency)
    sad = np.zeros(M)
    n = 0
    base = float("nan")
    for r in collect_pylist(parts):
        sad += np.asarray(r["sad"])
        n += int(r["n"])
        if int(r["n"]):
            base = float(r["base"])
    if n == 0:
        raise ValueError(
            "kernel_shap_summary: empty explain set (dataset has no rows)")
    rows = [{"feature": c, "mean_abs_shap": round(float(sad[i] / n), 6),
             "base_value": round(base, 6)}
            for i, c in enumerate(x_cols)]
    rows.sort(key=lambda r: (-r["mean_abs_shap"], r["feature"]))
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# Model benchmarking: K-fold CV of the IRLS logistic vs the closed-form
# linear score on the same label (reference flagship: ui/services/cv.py
# 37-222 repeated CV over the estimator registry — this is the
# two-model slice the sandbox's no-sklearn constraint allows).
# ---------------------------------------------------------------------------

def logistic_cv(ds, x_cols: list[str], y_col: str, key_col: str,
                k: int = 5, max_iter: int = 8,
                n_repeats: int = 1) -> pa.Table:
    """(Repeated) K-fold CV of the distributed IRLS logistic: fit on
    k−1 folds (each fit is max_iter streaming passes over the train
    folds), score the held-out fold through the scorer pool, report
    exact AUC + accuracy@0.5 per (repeat, fold). Fold =
    repeated_fold(key, rep, k) (deterministic, partition/retry-safe —
    repeat 0 is the engine-wide key % k contract; reference
    ui/services/cv.py:37-48 Repeated*KFold). The x/y/key projection is
    materialized ONCE up front, so the ~k·n_repeats·(max_iter+2)
    passes the fits and scores need re-scan in-memory blocks instead
    of re-reading the input each time."""
    from tanml_ray.pipelines.metrics import auc_exact
    from tanml_ray.pipelines.mlops import logistic_fit
    from tanml_ray.pipelines.ranking import repeated_fold

    proj_cols = list(dict.fromkeys(list(x_cols) + [y_col, key_col]))
    base = ds.map_batches(lambda t: t.select(proj_cols),
                          batch_format="pyarrow").materialize()

    rows = []
    for rep, f in [(r, f) for r in range(n_repeats) for f in range(k)]:
        def in_fold(batch: pa.Table, rep=rep, fold=f, invert=False) -> pa.Table:
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            m = repeated_fold(keys, rep, k) == fold
            if invert:
                m = ~m
            return batch.filter(pa.array(m))

        train = base.map_batches(lambda b, rep=rep, fold=f:
                                 in_fold(b, rep, fold, invert=True),
                                 batch_format="pyarrow")
        test = base.map_batches(lambda b, rep=rep, fold=f: in_fold(b, rep, fold),
                                batch_format="pyarrow")
        fit = logistic_fit(train, x_cols, y_col, max_iter=max_iter)
        # stateless task scoring: the per-fold model is a tiny coef
        # vector, so a fresh actor pool per fold would cost more in
        # actor startup than it saves — the ScorerStage actor pool is
        # for big/expensive models on long streams (stages/scoring.py)
        w = np.asarray(fit["coef"], dtype=np.float64)
        b0 = float(fit["intercept"])

        def score_batch(batch: pa.Table, w=w, b0=b0) -> pa.Table:
            X = np.column_stack([
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in x_cols])
            s = 1.0 / (1.0 + np.exp(-(X @ w + b0)))
            return batch.append_column("score", pa.array(s, type=pa.float64()))

        scored = test.map_batches(score_batch,
                                  batch_format="pyarrow").materialize()
        auc = auc_exact(scored, y_col, "score")

        def acc_partial(batch: pa.Table) -> pa.Table:
            y = batch.column(y_col).to_numpy(zero_copy_only=False)
            s = batch.column("score").to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([batch.num_rows], type=pa.int64()),
                             "hit": pa.array([int(((s >= 0.5) == (y == 1)).sum())],
                                             type=pa.int64())})

        n = hit = 0
        for r in collect_pylist(scored.map_batches(acc_partial,
                                                   batch_format="pyarrow")):
            n += r["n"]
            hit += r["hit"]
        rows.append({"rep": rep, "fold": f, "n_test": n,
                     "auc": round(float(auc), 6),
                     "accuracy": round(hit / n, 6) if n else float("nan")})
    return pa.Table.from_pylist(rows)


def model_benchmark(ds, x_cols: list[str], y_col: str, key_col: str,
                    k: int = 5, with_trees: bool = True,
                    tree_rounds: int = 10, with_nb: bool = True,
                    with_stump: bool = True) -> pa.Table:
    """Per-(model, fold) benchmark table on identical folds and label —
    (model, fold, n_test, auc, accuracy). Five estimator families:
    IRLS logistic, closed-form univariate linear, (with_trees)
    histogram boosted stumps (mlops.boosted_stumps_fit), (with_nb)
    one-pass Gaussian Naive Bayes (mlops.gaussian_nb_fit), and
    (with_stump) the exact-integer depth-1 CART (models.cart_stump
    over a quantized feature grid) — the reference benchmarking tab's
    linear/GLM/tree/NB spread (models/registry.py:34-411, ui
    evaluation benchmarking tab) rebuilt on the library-free families
    of models.ESTIMATORS."""
    from tanml_ray.pipelines.metrics import auc_exact
    from tanml_ray.pipelines.ranking import _suff_stats

    out_rows = []
    log_rows = logistic_cv(ds, x_cols, y_col, key_col, k=k).to_pylist()
    for r in log_rows:
        out_rows.append({"model": "logistic_irls",
                         **{k_: v for k_, v in r.items() if k_ != "rep"}})

    # one-pass closed-form univariate linear on the first feature
    # (k-fold fit = total-sums − fold-sums; same algebra as linear_cv)
    def fold_of(batch: pa.Table) -> np.ndarray:
        return (batch.column(key_col).to_numpy(zero_copy_only=False) % k)

    st = _suff_stats(ds, [x_cols[0]], y_col, fold_of=fold_of)
    tot = {s: sum(st[(x_cols[0], f)][s] for f in range(k))
           for s in ("n", "sx", "sy", "sxy", "sxx", "syy")}
    for f in range(k):
        te = st[(x_cols[0], f)]
        tr = {s: tot[s] - te[s] for s in tot}
        denom = tr["n"] * tr["sxx"] - tr["sx"] ** 2
        b = (tr["n"] * tr["sxy"] - tr["sx"] * tr["sy"]) / denom if denom else 0.0
        a = (tr["sy"] - b * tr["sx"]) / tr["n"] if tr["n"] else 0.0

        def in_fold(batch: pa.Table, fold=f) -> pa.Table:
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((keys % k) == fold))

        def score_batch(batch: pa.Table, b=b, a=a) -> pa.Table:
            x = batch.column(x_cols[0]).to_numpy(zero_copy_only=False).astype(np.float64)
            return batch.append_column("score",
                                       pa.array(a + b * x, type=pa.float64()))

        scored = (ds.map_batches(in_fold, batch_format="pyarrow")
                  .map_batches(score_batch, batch_format="pyarrow").materialize())
        auc = auc_exact(scored, y_col, "score")
        # accuracy via the train-side label base rate as the threshold
        thr = tr["sy"] / tr["n"] if tr["n"] else 0.5

        def acc_partial(batch: pa.Table, t=thr) -> pa.Table:
            y = batch.column(y_col).to_numpy(zero_copy_only=False)
            s = batch.column("score").to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([batch.num_rows], type=pa.int64()),
                             "hit": pa.array([int(((s >= t) == (y == 1)).sum())],
                                             type=pa.int64())})

        n = hit = 0
        for r in collect_pylist(scored.map_batches(acc_partial,
                                                   batch_format="pyarrow")):
            n += r["n"]
            hit += r["hit"]
        out_rows.append({"model": "linear_closed_form", "fold": f, "n_test": n,
                         "auc": round(float(auc), 6),
                         "accuracy": round(hit / n, 6) if n else float("nan")})

    if with_trees:
        from tanml_ray.pipelines.mlops import boosted_stumps_fit

        for f in range(k):
            def not_fold(batch: pa.Table, fold=f) -> pa.Table:
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((keys % k) != fold))

            def in_fold(batch: pa.Table, fold=f) -> pa.Table:
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((keys % k) == fold))

            model = boosted_stumps_fit(
                ds.map_batches(not_fold, batch_format="pyarrow"),
                x_cols, y_col, n_rounds=tree_rounds)

            def score_batch(batch: pa.Table, m=model) -> pa.Table:
                X = np.column_stack(
                    [batch.column(c).to_numpy(zero_copy_only=False)
                     .astype(np.float64) for c in x_cols])
                return batch.append_column(
                    "score", pa.array(m.predict(X), type=pa.float64()))

            scored = (ds.map_batches(in_fold, batch_format="pyarrow")
                      .map_batches(score_batch,
                                   batch_format="pyarrow").materialize())
            auc = auc_exact(scored, y_col, "score")

            def acc_partial(batch: pa.Table, t=model.base) -> pa.Table:
                y = batch.column(y_col).to_numpy(zero_copy_only=False)
                s = batch.column("score").to_numpy(zero_copy_only=False)
                return pa.table({
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                    "hit": pa.array([int(((s >= t) == (y == 1)).sum())],
                                    type=pa.int64())})

            n = hit = 0
            for r in collect_pylist(scored.map_batches(
                    acc_partial, batch_format="pyarrow")):
                n += r["n"]
                hit += r["hit"]
            out_rows.append({"model": "boosted_stumps", "fold": f,
                             "n_test": n, "auc": round(float(auc), 6),
                             "accuracy": round(hit / n, 6)
                             if n else float("nan")})

    if with_nb:
        from tanml_ray.models import ESTIMATORS

        for f in range(k):
            def not_fold(batch: pa.Table, fold=f) -> pa.Table:
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((keys % k) != fold))

            def in_fold(batch: pa.Table, fold=f) -> pa.Table:
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((keys % k) == fold))

            model = ESTIMATORS.fit(
                "gaussian_nb",
                ds.map_batches(not_fold, batch_format="pyarrow"),
                x_cols, y_col)

            def score_batch(batch: pa.Table, m=model) -> pa.Table:
                X = np.column_stack(
                    [batch.column(c).to_numpy(zero_copy_only=False)
                     .astype(np.float64) for c in x_cols])
                return batch.append_column(
                    "score", pa.array(m.predict(X), type=pa.float64()))

            scored = (ds.map_batches(in_fold, batch_format="pyarrow")
                      .map_batches(score_batch,
                                   batch_format="pyarrow").materialize())
            auc = auc_exact(scored, y_col, "score")

            # score is log posterior odds → decision threshold 0
            def acc_partial(batch: pa.Table) -> pa.Table:
                y = batch.column(y_col).to_numpy(zero_copy_only=False)
                s = batch.column("score").to_numpy(zero_copy_only=False)
                return pa.table({
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                    "hit": pa.array([int(((s >= 0.0) == (y == 1)).sum())],
                                    type=pa.int64())})

            n = hit = 0
            for r in collect_pylist(scored.map_batches(
                    acc_partial, batch_format="pyarrow")):
                n += r["n"]
                hit += r["hit"]
            out_rows.append({"model": "gaussian_nb", "fold": f,
                             "n_test": n, "auc": round(float(auc), 6),
                             "accuracy": round(hit / n, 6)
                             if n else float("nan")})

    if with_stump:
        from tanml_ray.models import ESTIMATORS

        grid_scale = 50  # quantize floats to a bounded integer grid

        def to_grid(batch: pa.Table) -> pa.Table:
            cols = {c: pa.array(
                np.floor(batch.column(c).to_numpy(zero_copy_only=False)
                         .astype(np.float64) * grid_scale).astype(np.int64),
                type=pa.int64()) for c in x_cols}
            cols[y_col] = batch.column(y_col)
            cols[key_col] = batch.column(key_col)
            return pa.table(cols)

        gds = ds.map_batches(to_grid, batch_format="pyarrow")
        for f in range(k):
            def not_fold(batch: pa.Table, fold=f) -> pa.Table:
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((keys % k) != fold))

            def in_fold(batch: pa.Table, fold=f) -> pa.Table:
                keys = batch.column(key_col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((keys % k) == fold))

            model = ESTIMATORS.fit(
                "cart_stump",
                gds.map_batches(not_fold, batch_format="pyarrow"),
                x_cols, y_col)

            def score_batch(batch: pa.Table, m=model) -> pa.Table:
                X = np.column_stack(
                    [batch.column(c).to_numpy(zero_copy_only=False)
                     for c in x_cols])
                return batch.append_column(
                    "score", pa.array(m.predict(X), type=pa.float64()))

            scored = (gds.map_batches(in_fold, batch_format="pyarrow")
                      .map_batches(score_batch,
                                   batch_format="pyarrow").materialize())
            auc = auc_exact(scored, y_col, "score")

            def acc_partial(batch: pa.Table) -> pa.Table:
                y = batch.column(y_col).to_numpy(zero_copy_only=False)
                s = batch.column("score").to_numpy(zero_copy_only=False)
                return pa.table({
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                    "hit": pa.array([int(((s >= 0.5) == (y == 1)).sum())],
                                    type=pa.int64())})

            n = hit = 0
            for r in collect_pylist(scored.map_batches(
                    acc_partial, batch_format="pyarrow")):
                n += r["n"]
                hit += r["hit"]
            out_rows.append({"model": "cart_stump", "fold": f,
                             "n_test": n, "auc": round(float(auc), 6),
                             "accuracy": round(hit / n, 6)
                             if n else float("nan")})
    out_rows.sort(key=lambda r: (r["model"], r["fold"]))
    return pa.Table.from_pylist(out_rows)


def linear_shap_summary(ds, x_cols: list[str], y_col: str) -> pa.Table:
    """EXACT Shapley values for a linear model (Lundberg & Lee 2017,
    "linear SHAP": under the feature-independence interpretation the
    Shapley value of feature i at row x is CLOSED-FORM,
    phi_i(x) = beta_i * (x_i - mean(x_i)), and the SHAP base value is
    E[y_hat] = mean(y) for an OLS fit with intercept). This upgrades
    the permutation stand-in to the reference's true mean-|shap|
    ranking semantics (shap_check.py:313-324) for the linear family —
    no `shap` library needed because the linear case is exact.

    Two streaming passes, both O(p) driver state:
      1. `_linear_suffstats` — Gram/moment accumulation → beta, means
         (means are G[0,1:]/n: the intercept row of X'X is the column
         sums).
    2. mean absolute deviation of each feature around its mean
       (needs the mean first, hence the second pass).

    Returns one row per feature: (feature, coef, mean_x,
    mean_abs_shap=|coef|*mad_x, base_value=mean(y)), ranked by
    mean_abs_shap descending — the reference's summary-plot ordering.
    """
    from tanml_ray.pipelines.mlops import _linear_suffstats, _solve_linear

    G, b, n, sy, syy = _linear_suffstats(ds, x_cols, y_col)
    fit = _solve_linear(G, b, n, sy, syy)
    means = G[0, 1:] / n
    base = sy / n

    def mad_partial(batch: pa.Table, mu=means) -> pa.Table:
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in x_cols])
        return pa.Table.from_pylist([
            {"sad": np.abs(X - mu).sum(axis=0).tolist(),
             "n": int(batch.num_rows)}])

    sad = np.zeros(len(x_cols))
    for r in collect_pylist(ds.map_batches(mad_partial,
                                           batch_format="pyarrow")):
        sad += np.asarray(r["sad"])
    mad = sad / n

    rows = [{"feature": c,
             "coef": round(float(fit["coef"][i]), 6),
             "mean_x": round(float(means[i]), 6),
             "mean_abs_shap": round(float(abs(fit["coef"][i]) * mad[i]), 6),
             "base_value": round(float(base), 6)}
            for i, c in enumerate(x_cols)]
    rows.sort(key=lambda r: (-r["mean_abs_shap"], r["feature"]))
    return pa.Table.from_pylist(rows)
