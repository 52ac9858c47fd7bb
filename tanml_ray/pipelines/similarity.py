"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the (small) query
matrix is normalized once, ray.put-broadcast, and every batch does one
numpy matmul then keeps its local top-k — only (query, id, sim) partial
rows leave the map stage, merged into a global top-k on the driver
(classic distributed top-k: per-partition heads then re-head).

The scale path is LSH bucketing (random signed projections, seeded):
vectors are bucketed once; queries probe only their bucket ± multiprobe
neighbors. Recall is measured against the brute-force baseline in
pytest — the approximation contract is explicit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tanml_ray.functions.collect import collect_pylist
from tanml_ray.sources.ingest import read_parquet_clean


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    return np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)


def knn_cosine(ds, queries: dict[int, np.ndarray], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k for each query vector.

    queries: {query_id: vector}. Returns (query_id, vec_id, sim)
    with sim rounded to 6, sorted by (query_id, -sim, vec_id).
    """
    import ray

    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qids_l, qmat_l = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        vecs = _normalize(_batch_matrix(batch, vec_col))
        sims = qmat_l @ vecs.T                      # (n_q, batch)
        # fully vectorized across queries: axis-1 argpartition + one
        # take_along_axis emit (the self row, if present, rides along
        # as the +1 extra and is dropped at the driver merge)
        top = min(k + (1 if exclude_self else 0), sims.shape[1])
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        qcol = np.repeat(np.asarray(qids_l, dtype=np.int64), top)
        return pa.table({"query_id": pa.array(qcol, type=pa.int64()),
                         "vec_id": pa.array(ids[idx].ravel(), type=pa.int64()),
                         "sim": pa.array(np.take_along_axis(sims, idx, axis=1)
                                         .ravel(), type=pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(collect_pylist(partials), k, exclude_self=exclude_self)


def _merge_topk(rows_all: list[dict], k: int, exclude_self: bool) -> pa.Table:
    """Driver merge of per-block top-k partials: one vectorized sort +
    per-query head(k), no Python row loop."""
    if not rows_all:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    df = pd.DataFrame(rows_all)
    if exclude_self:
        df = df[df["vec_id"] != df["query_id"]]
    # select by RAW sim (ties by vec_id), then emit rounded values and
    # order by the rounded sim — the same two-step the oracle's
    # round(…, 6) ordering implies
    df = (df.sort_values(["query_id", "sim", "vec_id"],
                         ascending=[True, False, True], kind="mergesort")
          .groupby("query_id", sort=True).head(k).copy())
    df["sim"] = np.round(df["sim"].to_numpy(dtype=np.float64), 6)
    df = df.sort_values(["query_id", "sim", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    return pa.table({"query_id": pa.array(df["query_id"].to_numpy(dtype=np.int64)),
                     "vec_id": pa.array(df["vec_id"].to_numpy(dtype=np.int64)),
                     "sim": pa.array(df["sim"].to_numpy(), type=pa.float64())})


def lsh_project_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Signed-projection LSH bucket ids (one int per vector)."""
    bits = (vecs @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)).sum(axis=1)


def make_planes(dim: int, n_bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def knn_cosine_lsh(ds, queries: dict[int, np.ndarray], k: int = 10,
                   n_bits: int = 8, multiprobe: int = 1,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Approximate top-k: probe only LSH buckets within `multiprobe`
    bit-flips of the query's bucket. At scale the bucket id becomes a
    partition key (bucketed parquet layout) so a query touches a few
    partitions instead of the full corpus; here buckets filter inside
    map_batches. Recall vs knn_cosine is the pytest contract."""
    import itertools

    import ray

    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    planes = make_planes(qmat.shape[1], n_bits)
    qbuckets = lsh_project_bucket(qmat, planes)

    probe_sets = []
    for qb in qbuckets:
        probes = {int(qb)}
        for r in range(1, multiprobe + 1):
            for flips in itertools.combinations(range(n_bits), r):
                b = int(qb)
                for f in flips:
                    b ^= 1 << f
                probes.add(b)
        probe_sets.append(probes)
    ref = ray.put((qids, qmat, planes, probe_sets))

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qids_l, qmat_l, planes_l, probes_l = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        vecs = _normalize(_batch_matrix(batch, vec_col))
        buckets = lsh_project_bucket(vecs, planes_l)
        # one matmul for ALL queries; non-probed candidates masked to
        # -inf so the axis-1 argpartition is uniform across queries
        # (the per-query work is one vectorized isin, not a Python
        # loop over hits)
        sims = qmat_l @ vecs.T                      # (n_q, batch)
        for qi in range(len(qids_l)):
            sims[qi, ~np.isin(buckets, list(probes_l[qi]))] = -np.inf
        top = min(k + 1, sims.shape[1])
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        got = np.take_along_axis(sims, idx, axis=1)
        valid = np.isfinite(got)
        qcol = np.repeat(np.asarray(qids_l, dtype=np.int64), top)[valid.ravel()]
        return pa.table({"query_id": pa.array(qcol, type=pa.int64()),
                         "vec_id": pa.array(ids[idx].ravel()[valid.ravel()],
                                            type=pa.int64()),
                         "sim": pa.array(got.ravel()[valid.ravel()],
                                         type=pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(collect_pylist(partials), k, exclude_self=True)


# ---------------------------------------------------------------------------
# Bucketed-parquet LSH index: the at-scale layout the docstring above
# promises. Vectors are written ONCE to hive-partitioned parquet keyed
# by their LSH bucket; a query then reads ONLY its probe buckets via
# partition pruning (pyarrow filter on the partition column) — the scan
# touches a handful of partitions instead of the full corpus.
# ---------------------------------------------------------------------------

def build_lsh_index(ds, out_dir: str, n_bits: int = 8, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """One streaming pass: bucket every vector (signed projections) and
    write hive-partitioned parquet `out_dir/bucket=<b>/…`. The plane
    matrix (the only state a query needs) is persisted next to the data
    so the index is self-describing and resumable."""
    import json
    import os

    # dim is data-dependent: plane construction is deferred into the
    # map fn (deterministic: same seed/n_bits → same planes everywhere)
    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(batch, vec_col))
        pl = make_planes(vecs.shape[1], n_bits, seed)
        b = lsh_project_bucket(vecs, pl).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, type=pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, "_lsh_meta.json"), "w") as f:
        json.dump({"n_bits": n_bits, "seed": seed,
                   "id_col": id_col, "vec_col": vec_col}, f)
    return out_dir


def build_ivf_index(ds, out_dir: str, n_centroids: int | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """IVF index: deterministic Lloyd centroids (shared with the
    embedding near-dup pipeline, dedup._kmeans_unit_vectors — no RNG,
    partition-order independent) + one streaming pass writing
    hive-partitioned parquet `out_dir/cell=<c>/…` keyed by each
    vector's nearest centroid. The centroid matrix persists next to the
    data, so the index is self-describing and resumable. This is the
    second scale path next to the LSH-bucketed index: IVF adapts its
    partitioning to the data's cluster structure (LSH planes are
    data-oblivious), which probes fewer candidates on clustered
    corpora."""
    import json
    import os

    import ray

    from tanml_ray.pipelines.dedup import _kmeans_unit_vectors

    import shutil

    src = ds.select_columns([id_col, vec_col]).materialize()
    n = src.count()
    k = n_centroids or max(2, int(np.sqrt(max(n, 4))))
    centers = _kmeans_unit_vectors(src, id_col, vec_col, k)
    cref = ray.put(centers)

    def add_cell(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(cref)
        if batch.num_rows == 0:
            return batch.append_column("cell", pa.array([], type=pa.int64()))
        vecs = _normalize(_batch_matrix(batch, vec_col))
        d = ((vecs ** 2).sum(axis=1, keepdims=True)
             + (C ** 2).sum(axis=1)[None, :] - 2.0 * (vecs @ C.T))
        return batch.append_column(
            "cell", pa.array(d.argmin(axis=1).astype(np.int64), type=pa.int64()))

    # ATOMIC build: write into a tmp dir and os.replace it in. Ray's
    # write_parquet APPENDS into existing directories, so building in
    # place would let an interrupted run silently double every vector
    # on the rebuild (the same hazard curate's resumable final write
    # guards against).
    tmp_dir = out_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    src.map_batches(add_cell, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["cell"])
    np.save(os.path.join(tmp_dir, "_ivf_centroids.npy"), centers)
    with open(os.path.join(tmp_dir, "_ivf_meta.json"), "w") as f:
        json.dump({"n_centroids": int(k), "id_col": id_col,
                   "vec_col": vec_col}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)
    return out_dir


def knn_cosine_ivf_indexed(index_dir: str, queries: dict[int, np.ndarray],
                           k: int = 10, n_probe: int = 4) -> pa.Table:
    """Approximate top-k over a build_ivf_index layout: each query
    probes only its `n_probe` nearest centroid cells; the union of
    probe cells is read via PATH-level partition pruning (same
    mechanism as the LSH index — Ray's fragment filter can't see hive
    partition fields), so scan cost is O(probed cells), not O(corpus).
    Recall vs knn_cosine is the pytest contract; raise n_probe to trade
    scan for recall."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "_ivf_meta.json")) as f:
        meta = json.load(f)
    centers = np.load(os.path.join(index_dir, "_ivf_centroids.npy"))
    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64)
                                for q in qids]))
    d = ((qmat ** 2).sum(axis=1, keepdims=True)
         + (centers ** 2).sum(axis=1)[None, :] - 2.0 * (qmat @ centers.T))
    probe = min(n_probe, centers.shape[0])
    cells = {int(c) for row in np.argpartition(d, probe - 1, axis=1)[:, :probe]
             for c in row}
    paths = [os.path.join(p, f)
             for c in sorted(cells)
             if os.path.isdir(p := os.path.join(index_dir, f"cell={c}"))
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not paths:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    return knn_cosine(read_parquet_clean(paths), queries, k=k,
                      id_col=meta["id_col"], vec_col=meta["vec_col"])


def knn_cosine_lsh_indexed(index_dir: str, queries: dict[int, np.ndarray],
                           k: int = 10, multiprobe: int = 1) -> pa.Table:
    """Approximate top-k over a build_lsh_index layout: ONLY the probe
    buckets (query bucket ± `multiprobe` bit flips) are read — partition
    pruning does the candidate filtering at the storage layer, so scan
    cost is O(probed buckets), not O(corpus)."""
    import itertools
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "_lsh_meta.json")) as f:
        meta = json.load(f)
    n_bits, seed = meta["n_bits"], meta["seed"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]

    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64)
                                for q in qids]))
    planes = make_planes(qmat.shape[1], n_bits, seed)
    qbuckets = lsh_project_bucket(qmat, planes)
    probe_all: set[int] = set()
    for qb in qbuckets:
        probes = {int(qb)}
        for r in range(1, multiprobe + 1):
            for flips in itertools.combinations(range(n_bits), r):
                b = int(qb)
                for fl in flips:
                    b ^= 1 << fl
                probes.add(b)
        probe_all |= probes

    # PATH-level partition pruning: only the probe buckets' directories
    # are handed to the reader, so non-probed partitions never leave
    # storage. (Ray's fragment-level `filter=` can't see hive partition
    # fields, so the pruning is done where it's cheapest anyway — on
    # the directory listing.) The pruned read is the UNION of every
    # query's probe buckets; extra candidates a query sees from another
    # query's bucket are genuine vectors and can only improve recall.
    paths = [os.path.join(p, f)
             for b in sorted(probe_all)
             if os.path.isdir(p := os.path.join(index_dir, f"bucket={b}"))
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not paths:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})
    ds = read_parquet_clean(paths)
    return knn_cosine(ds, queries, k=k, id_col=id_col, vec_col=vec_col)


def group_centroids(ds, label_col: str = "label",
                    vec_col: str = "embedding") -> pa.Table:
    """Per-group embedding centroid (the vector AGGREGATE a clustering /
    labeling pipeline needs): mean per dimension over each label's
    vectors.

    Scale shape: each batch matmul-free reduces its (n x d) block to
    one (labels_in_batch x d) partial-sum matrix plus counts, emitted
    as LONG (label, dim, s, n) rows — so the ONE groupby shuffle moves
    |labels| x d numbers per block, never vectors. float32 inputs sum
    in float64 (each float32 is exact in float64; round(6) swallows
    order noise vs the SQL oracle).

    Returns (label, dim, centroid) with 1-based dim, sorted. Reference
    anchor: cluster-profile semantics of the KMeans coverage check
    (tanml/checks/robustness/cluster_coverage.py) generalized to vector
    payloads.
    """
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        mat = np.stack(
            batch.column(vec_col).to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        d = mat.shape[1]
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((uniq.size, d), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=uniq.size)
        lab = np.repeat(uniq.astype(np.int64), d)
        dim = np.tile(np.arange(1, d + 1, dtype=np.int64), uniq.size)
        return pa.table({
            "label": pa.array(lab),
            "dim": pa.array(dim),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, d).astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    rows = sorted(collect_pylist(agg), key=lambda r: (r["label"], r["dim"]))
    return pa.table({
        "label": pa.array([r["label"] for r in rows], type=pa.int64()),
        "dim": pa.array([r["dim"] for r in rows], type=pa.int64()),
        "centroid": pa.array([round(r["s"] / r["n"], 6) for r in rows],
                             type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory-bound scale
# path of the ANN stack (exact / LSH-bucketed / IVF / PQ): vectors
# compress m/d-fold into m sub-space centroid codes (here 64-dim
# float32 → 8 uint8 codes = 32×), and queries scan CODES with an
# asymmetric-distance lookup table (one (m, ksub) table per query,
# one np.take + sum per batch — no float vector ever re-read). All
# centroids come from the same deterministic diagonal-init Lloyd used
# everywhere else (no RNG, partition-order independent), run over all
# m sub-spaces in ONE distributed pass per iteration.
# ---------------------------------------------------------------------------


def build_pq_codebook(ds, m: int = 8, ksub: int = 16, iters: int = 5,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      normalize: bool = True) -> np.ndarray:
    """Returns centroids of shape (m, ksub, d/m) trained on the
    NORMALIZED vectors (cosine = dot on the unit sphere, so PQ
    approximates cosine directly). Init is the ksub data points with
    the globally smallest md5(vec_id) — a deterministic,
    partition-order-independent pseudo-random sample, so every
    centroid starts on real data (the diagonal-line init that serves
    the IVF pruning well collapses for PQ sub-spaces: most centroids
    die and the codebook degenerates — measured recall 0.3 vs 1.0)."""
    import hashlib

    import ray

    def sample_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"hkey": pa.array([], type=pa.string()),
                             "vec": pa.array([], type=pa.list_(pa.float64()))})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = _batch_matrix(batch, vec_col)
        if normalize:
            v = _normalize(v)
        keys = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        order = np.argsort(np.asarray(keys))[:ksub]
        return pa.table({"hkey": pa.array([keys[j] for j in order]),
                         "vec": pa.array([v[j].tolist() for j in order],
                                         type=pa.list_(pa.float64()))})

    seeds = sorted(collect_pylist(ds.map_batches(sample_partial,
                                                 batch_format="pyarrow")),
                   key=lambda r: r["hkey"])[:ksub]
    if len(seeds) < ksub:
        raise ValueError(f"need >= {ksub} vectors to train PQ, "
                         f"got {len(seeds)}")
    S = np.asarray([r["vec"] for r in seeds])
    d = S.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    # (m, ksub, dsub): centroid j of sub-space s = seed j's sub-vector
    C = np.stack([S[:, s * dsub:(s + 1) * dsub] for s in range(m)])

    for _ in range(iters):
        cref = ray.put(C)

        def accum(batch: pa.Table) -> pa.Table:
            import ray as _ray

            Cl = _ray.get(cref)
            if batch.num_rows == 0:
                return pa.table({"sub": pa.array([], type=pa.int64()),
                                 "cluster": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "sums": pa.array([], type=pa.list_(pa.float64()))})
            v = _batch_matrix(batch, vec_col)
            if normalize:
                v = _normalize(v)
            rows_sub, rows_cl, rows_n, rows_s = [], [], [], []
            for s in range(Cl.shape[0]):
                vs = v[:, s * dsub:(s + 1) * dsub]
                Cs = Cl[s]
                dist = ((vs ** 2).sum(axis=1, keepdims=True)
                        + (Cs ** 2).sum(axis=1)[None, :] - 2.0 * (vs @ Cs.T))
                lab = dist.argmin(axis=1)
                for j in np.unique(lab):
                    sel = vs[lab == j]
                    rows_sub.append(s)
                    rows_cl.append(int(j))
                    rows_n.append(sel.shape[0])
                    rows_s.append(sel.sum(axis=0).tolist())
            return pa.table({"sub": pa.array(rows_sub, type=pa.int64()),
                             "cluster": pa.array(rows_cl, type=pa.int64()),
                             "n": pa.array(rows_n, type=pa.int64()),
                             "sums": pa.array(rows_s,
                                              type=pa.list_(pa.float64()))})

        sums = np.zeros((m, ksub, dsub))
        cnts = np.zeros((m, ksub), dtype=np.int64)
        for r in collect_pylist(ds.map_batches(accum, batch_format="pyarrow")):
            sums[r["sub"], r["cluster"]] += np.asarray(r["sums"])
            cnts[r["sub"], r["cluster"]] += r["n"]
        nz = cnts > 0
        C = C.copy()
        C[nz] = sums[nz] / cnts[nz][:, None]
    return C


def pq_encode(ds, codebook: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding", normalize: bool = True):
    """One streaming pass → Dataset of (vec_id, codes list<uint8>)."""
    import ray

    m, ksub, dsub = codebook.shape
    cref = ray.put(codebook)

    def enc(batch: pa.Table) -> pa.Table:
        import ray as _ray

        Cl = _ray.get(cref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "codes": pa.array([], type=pa.list_(pa.uint8()))})
        v = _batch_matrix(batch, vec_col)
        if normalize:
            v = _normalize(v)
        codes = np.empty((v.shape[0], m), dtype=np.uint8)
        for s in range(m):
            vs = v[:, s * dsub:(s + 1) * dsub]
            Cs = Cl[s]
            dist = ((vs ** 2).sum(axis=1, keepdims=True)
                    + (Cs ** 2).sum(axis=1)[None, :] - 2.0 * (vs @ Cs.T))
            codes[:, s] = dist.argmin(axis=1)
        return pa.table({id_col: batch.column(id_col),
                         "codes": pa.array(list(codes),
                                           type=pa.list_(pa.uint8()))})

    return ds.map_batches(enc, batch_format="pyarrow")


def knn_cosine_pq(codes_ds, codebook: np.ndarray,
                  queries: dict[int, np.ndarray], k: int = 10,
                  id_col: str = "vec_id",
                  exclude_self: bool = True) -> pa.Table:
    """Approximate cosine top-k over PQ codes via asymmetric distance:
    per query one (m, ksub) dot-product LUT; each batch scans uint8
    codes with np.take + sum — the float vectors are never touched."""
    import ray

    m, ksub, dsub = codebook.shape
    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64)
                                for q in qids]))
    # LUT[q, s, j] = q_sub(s) · centroid(s, j)
    lut = np.einsum("qsd,sjd->qsj",
                    qmat.reshape(len(qids), m, dsub), codebook)
    ref = ray.put((qids, lut))

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qids_l, lut_l = _ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = np.stack(batch.column("codes").to_pylist()).astype(np.int64)
        n = codes.shape[0]
        # sims[q, i] = Σ_s LUT[q, s, codes[i, s]]
        sims = np.zeros((len(qids_l), n))
        for s in range(m):
            sims += lut_l[:, s, :][:, codes[:, s]]
        top = min(k + (1 if exclude_self else 0), n)
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        qcol = np.repeat(np.asarray(qids_l, dtype=np.int64), top)
        return pa.table({"query_id": pa.array(qcol, type=pa.int64()),
                         "vec_id": pa.array(ids[idx].ravel(),
                                            type=pa.int64()),
                         "sim": pa.array(np.take_along_axis(sims, idx, axis=1)
                                         .ravel(), type=pa.float64())})

    partials = codes_ds.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(collect_pylist(partials), k,
                       exclude_self=exclude_self)


def build_ivfpq_index(ds, out_dir: str, n_centroids: int | None = None,
                      m: int = 8, ksub: int = 16, iters: int = 5,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """IVF-PQ index (Jégou et al. 2011 §IV): IVF centroid partitioning
    + product-quantized RESIDUALS (r = v_norm − centroid[cell], the
    classic coarse+fine decomposition; one shared residual codebook
    across cells — FAISS IVFPQ's default). Layout is the IVF hive
    partitioning (`cell=<c>/…`) holding (vec_id, cell_id, codes):
    queries prune to n_probe cells by path and ADC-scan m uint8 codes
    per row — float vectors are never read at query time. cell_id is
    duplicated as a data column because path-pruned reads don't
    surface hive fields.

    Deterministic throughout (Lloyd centroids + md5-sampled PQ seeds
    are partition-order independent); atomic build via tmp dir +
    os.replace (same rationale as build_ivf_index).
    """
    import json
    import os
    import shutil

    import ray

    from tanml_ray.pipelines.dedup import _kmeans_unit_vectors

    src = ds.select_columns([id_col, vec_col]).materialize()
    n = src.count()
    k = n_centroids or max(2, int(np.sqrt(max(n, 4))))
    centers = _kmeans_unit_vectors(src, id_col, vec_col, k)
    cref = ray.put(centers)

    def residual(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(cref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cell_id": pa.array([], type=pa.int64()),
                             vec_col: pa.array([], type=pa.list_(pa.float64()))})
        v = _normalize(_batch_matrix(batch, vec_col))
        d = ((v ** 2).sum(axis=1, keepdims=True)
             + (C ** 2).sum(axis=1)[None, :] - 2.0 * (v @ C.T))
        cell = d.argmin(axis=1)
        r = v - C[cell]
        return pa.table({id_col: batch.column(id_col),
                         "cell_id": pa.array(cell.astype(np.int64)),
                         vec_col: pa.array([row.tolist() for row in r],
                                           type=pa.list_(pa.float64()))})

    residuals = src.map_batches(residual, batch_format="pyarrow") \
        .materialize()
    codebook = build_pq_codebook(residuals, m=m, ksub=ksub, iters=iters,
                                 id_col=id_col, vec_col=vec_col,
                                 normalize=False)

    # encode inline so cell_id rides along with the codes (pq_encode
    # would drop it and force a join)
    cbref = ray.put(codebook)
    dsub = codebook.shape[2]

    def enc(batch: pa.Table) -> pa.Table:
        import ray as _ray

        Cl = _ray.get(cbref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cell_id": pa.array([], type=pa.int64()),
                             "codes": pa.array([], type=pa.list_(pa.uint8()))})
        v = _batch_matrix(batch, vec_col)  # residuals: NOT re-normalized
        codes = np.empty((v.shape[0], m), dtype=np.uint8)
        for s in range(m):
            vs = v[:, s * dsub:(s + 1) * dsub]
            Cs = Cl[s]
            dist = ((vs ** 2).sum(axis=1, keepdims=True)
                    + (Cs ** 2).sum(axis=1)[None, :] - 2.0 * (vs @ Cs.T))
            codes[:, s] = dist.argmin(axis=1)
        return pa.table({id_col: batch.column(id_col),
                         "cell_id": batch.column("cell_id"),
                         "codes": pa.array(list(codes),
                                           type=pa.list_(pa.uint8()))})

    assembled = residuals.map_batches(enc, batch_format="pyarrow")

    tmp_dir = out_dir + ".ivfpq_tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    assembled.map_batches(
        lambda b: b.append_column("cell", b.column("cell_id")),
        batch_format="pyarrow").write_parquet(tmp_dir,
                                              partition_cols=["cell"])
    np.save(os.path.join(tmp_dir, "_ivfpq_centroids.npy"), centers)
    np.save(os.path.join(tmp_dir, "_ivfpq_codebook.npy"), codebook)
    with open(os.path.join(tmp_dir, "_ivfpq_meta.json"), "w") as f:
        json.dump({"n_centroids": int(k), "m": int(m), "ksub": int(ksub),
                   "id_col": id_col, "vec_col": vec_col}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)
    return out_dir


def knn_cosine_ivfpq(index_dir: str, queries: dict[int, np.ndarray],
                     k: int = 10, n_probe: int = 4,
                     exclude_self: bool = True) -> pa.Table:
    """Approximate cosine top-k over a build_ivfpq_index layout:
    sim(q, v) = q·centroid[cell] + q·residual ≈ q·centroid[cell] +
    ADC(q, codes) — the coarse term gathers from the bounded centroid
    matrix; the fine term is one (m, ksub) LUT gather per subspace.
    Only the n_probe nearest cells per query are read (path-level
    pruning). Raise n_probe / m for recall, lower for scan cost."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    centers = np.load(os.path.join(index_dir, "_ivfpq_centroids.npy"))
    codebook = np.load(os.path.join(index_dir, "_ivfpq_codebook.npy"))
    m, ksub, dsub = codebook.shape
    id_col = meta["id_col"]

    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64)
                                for q in qids]))
    d = ((qmat ** 2).sum(axis=1, keepdims=True)
         + (centers ** 2).sum(axis=1)[None, :] - 2.0 * (qmat @ centers.T))
    probe = min(n_probe, centers.shape[0])
    cells = {int(c) for row in np.argpartition(d, probe - 1, axis=1)[:, :probe]
             for c in row}
    paths = [os.path.join(p, f)
             for c in sorted(cells)
             if os.path.isdir(p := os.path.join(index_dir, f"cell={c}"))
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not paths:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "sim": pa.array([], type=pa.float64())})

    coarse = qmat @ centers.T                      # (n_q, k_cells)
    lut = np.einsum("qsd,sjd->qsj", qmat.reshape(len(qids), m, dsub),
                    codebook)                      # (n_q, m, ksub)
    ref = ray.put((qids, coarse, lut))

    def local_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qids_l, coarse_l, lut_l = _ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes = np.stack(batch.column("codes").to_pylist()).astype(np.int64)
        n = codes.shape[0]
        sims = coarse_l[:, cell].astype(np.float64)     # (n_q, n)
        for s in range(lut_l.shape[1]):
            sims += lut_l[:, s, :][:, codes[:, s]]
        top = min(k + (1 if exclude_self else 0), n)
        idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
        qcol = np.repeat(np.asarray(qids_l, dtype=np.int64), top)
        return pa.table({"query_id": pa.array(qcol, type=pa.int64()),
                         "vec_id": pa.array(ids[idx].ravel(),
                                            type=pa.int64()),
                         "sim": pa.array(np.take_along_axis(sims, idx, axis=1)
                                         .ravel(), type=pa.float64())})

    partials = read_parquet_clean(paths).map_batches(local_topk,
                                                  batch_format="pyarrow")
    return _merge_topk(collect_pylist(partials), k,
                       exclude_self=exclude_self)
