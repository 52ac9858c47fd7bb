"""Distributed global midranks over CONTINUOUS columns — the
sort-free range-partitioned ranking kernel behind exact full-corpus
Spearman on arbitrary float columns (reference analysis/correlation.py:
23-42 method="spearman" supports any column; the integer-grid fast
path in pipelines/queries.py covers grid-valued pairs, this module
removes that precondition).

Shape (100-TB-safe — no driver LUT, no O(distinct) driver state):

  pass 1  per-batch deterministic quantile SAMPLES of both columns
          (bounded: 17 values × batches); the driver picks P−1 cut
          values per column from the pooled sample. Cuts only steer
          the range partitioning — the midranks are exact for ANY
          cut choice, so sampling skew costs balance, never
          correctness.
  pass 2  per-batch bin counts (searchsorted right) → one bounded
          groupby; prefix sums give each bin's global rank offset.
          side='right' binning keeps every tie group in ONE bin, so
          within-bin midranks are globally exact.
  pass 3  groupby(x_bin) → per-bin vectorized sort: emit per row the
          DOUBLED global midrank of x (2·midrank is integer) plus the
          raw y value — the x-rank rides along to the y pass, so no
          row-id join is ever needed.
  pass 4  groupby(y_bin) → per-bin doubled midranks of y; each bin
          reduces straight to the six Spearman sufficient statistics.
          The second-moment sums are computed on OBJECT-dtype numpy
          (Python-int arithmetic, exact at any corpus size — doubled
          ranks reach 2n, so Σr² ~ 4n³ overflows int64 past ~10⁶ rows
          per bin) and shipped as decimal strings.

rho = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²)(n·Σy² − Σy²)) on the doubled
ranks (the doubling cancels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tanml_ray.functions.collect import collect_pylist

_SAMPLE_QS = np.linspace(0.0, 1.0, 17)


def _pick_boundaries(samples: np.ndarray, n_partitions: int) -> np.ndarray:
    """P−1 unique cut values from the pooled per-batch samples."""
    if samples.size == 0:
        return np.array([], dtype=np.float64)
    cuts = np.quantile(samples, np.linspace(0.0, 1.0, n_partitions + 1)[1:-1])
    return np.unique(cuts)


def _doubled_midranks(v: np.ndarray, offset: int) -> np.ndarray:
    """DOUBLED 1-based global midranks of v given the bin's global
    offset (rows in strictly lower bins). Vectorized: one argsort +
    one unique per bin."""
    order = np.argsort(v, kind="mergesort")
    sv = v[order]
    # tie-group start index for each sorted position
    _, first, counts = np.unique(sv, return_index=True, return_counts=True)
    starts = np.repeat(first, counts)                 # 0-based group start
    sizes = np.repeat(counts, counts)
    # doubled midrank of group [i, i+t): 2·offset + (i+1) + (i+t)
    dr_sorted = 2 * offset + 2 * starts + sizes + 1
    dr = np.empty_like(dr_sorted)
    dr[order] = dr_sorted
    return dr.astype(np.int64)


def spearman_continuous(ds, x_col: str, y_col: str,
                        n_partitions: int | None = None) -> dict:
    """Exact full-corpus Spearman rho over two numeric columns with NO
    grid precondition. Returns {"n": int, "rho": float}."""
    from ray.data.aggregate import Sum

    from tanml_ray.stages.shuffle import auto_partitions

    if n_partitions is None:
        n_partitions = auto_partitions(ds)
    P = int(n_partitions)

    def arrs(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return x, y

    # pass 1: pooled deterministic quantile samples
    def sample(batch: pa.Table) -> pa.Table:
        x, y = arrs(batch)
        if not len(x):
            return pa.table({"col": pa.array([], type=pa.string()),
                             "v": pa.array([], type=pa.float64())})
        return pa.table({
            "col": pa.array(["x"] * len(_SAMPLE_QS) + ["y"] * len(_SAMPLE_QS),
                            type=pa.string()),
            "v": pa.array(np.concatenate([np.quantile(x, _SAMPLE_QS),
                                          np.quantile(y, _SAMPLE_QS)]),
                          type=pa.float64())})

    pooled = collect_pylist(ds.map_batches(sample, batch_format="pyarrow"))
    bx = _pick_boundaries(
        np.array([r["v"] for r in pooled if r["col"] == "x"]), P)
    by = _pick_boundaries(
        np.array([r["v"] for r in pooled if r["col"] == "y"]), P)

    # pass 2: exact per-bin counts → global rank offsets
    def bin_counts(batch: pa.Table) -> pa.Table:
        x, y = arrs(batch)
        cx = np.bincount(np.searchsorted(bx, x, side="right"),
                         minlength=len(bx) + 1)
        cy = np.bincount(np.searchsorted(by, y, side="right"),
                         minlength=len(by) + 1)
        return pa.table({
            "col": pa.array(["x"] * len(cx) + ["y"] * len(cy),
                            type=pa.string()),
            "bin": pa.array(np.concatenate([np.arange(len(cx)),
                                            np.arange(len(cy))]),
                            type=pa.int64()),
            "n": pa.array(np.concatenate([cx, cy]), type=pa.int64())})

    merged = collect_pylist(
        ds.map_batches(bin_counts, batch_format="pyarrow")
        .groupby(["col", "bin"]).aggregate(Sum("n", alias_name="n")))
    offs = {"x": np.zeros(len(bx) + 1, dtype=np.int64),
            "y": np.zeros(len(by) + 1, dtype=np.int64)}
    for r in merged:
        offs[r["col"]][int(r["bin"])] = int(r["n"])
    off_x = np.concatenate(([0], np.cumsum(offs["x"])[:-1]))
    off_y = np.concatenate(([0], np.cumsum(offs["y"])[:-1]))
    n_total = int(offs["x"].sum())
    if n_total == 0:
        return {"n": 0, "rho": float("nan")}

    # pass 3: x-bins → per-row doubled x-midrank, y rides along
    def tag_x(batch: pa.Table) -> pa.Table:
        x, y = arrs(batch)
        return pa.table({
            "xbin": pa.array(np.searchsorted(bx, x, side="right"),
                             type=pa.int64()),
            "x": pa.array(x, type=pa.float64()),
            "y": pa.array(y, type=pa.float64())})

    def rank_x(g: pd.DataFrame) -> pa.Table:
        xb = int(g["xbin"].iloc[0])
        rx = _doubled_midranks(g["x"].to_numpy(), int(off_x[xb]))
        y = g["y"].to_numpy()
        return pa.table({
            "ybin": pa.array(np.searchsorted(by, y, side="right"),
                             type=pa.int64()),
            "rx": pa.array(rx, type=pa.int64()),
            "y": pa.array(y, type=pa.float64())})

    # pass 4: y-bins → doubled y-midranks + exact object-int moments
    def reduce_y(g: pd.DataFrame) -> pa.Table:
        yb = int(g["ybin"].iloc[0])
        ry = _doubled_midranks(g["y"].to_numpy(), int(off_y[yb]))
        rx = g["rx"].to_numpy()
        rxo = rx.astype(object)
        ryo = ry.astype(object)
        return pa.table({
            "n": pa.array([len(rx)], type=pa.int64()),
            "sx": pa.array([str(rxo.sum())], type=pa.string()),
            "sy": pa.array([str(ryo.sum())], type=pa.string()),
            "sxx": pa.array([str((rxo * rxo).sum())], type=pa.string()),
            "syy": pa.array([str((ryo * ryo).sum())], type=pa.string()),
            "sxy": pa.array([str((rxo * ryo).sum())], type=pa.string())})

    partials = (ds.map_batches(tag_x, batch_format="pyarrow")
                .groupby("xbin").map_groups(rank_x, batch_format="pandas")
                .groupby("ybin").map_groups(reduce_y, batch_format="pandas"))

    n = 0
    sx = sy = sxx = syy = sxy = 0
    for r in collect_pylist(partials):
        n += int(r["n"])
        sx += int(r["sx"])
        sy += int(r["sy"])
        sxx += int(r["sxx"])
        syy += int(r["syy"])
        sxy += int(r["sxy"])
    num = n * sxy - sx * sy
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den2 <= 0:
        return {"n": n, "rho": float("nan")}
    # exact-integer → float at the last step. den2 ~ n⁶ exceeds
    # float64 range only past ~10^51 rows; the isqrt branch stays
    # exact-rational to 18 decimals beyond that.
    import math

    if den2 < 10**300:
        rho = float(num) / math.sqrt(float(den2))
    else:
        rho = float((num * 10**18) // math.isqrt(den2)) / 1e18
    return {"n": n, "rho": rho}
