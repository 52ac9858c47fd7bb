"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only has exact duplicate detection
(/root/reference/tanml/ui/views/profiling.py:104-151, keep=False mask)
and md5 row-hash overlap (/root/reference/tanml/ui/services/data.py:75-96).
The near-dup family is the standard public web-scale recipe
(Broder 1997 MinHash/shingling; Charikar 2002 SimHash; Leskovec et al.
MMDS ch.3 LSH banding), expressed Ray-Data-first:

    shingle+minhash per batch (vectorized, stateless map)
      → explode to (band_id, band_hash, doc_id) rows
      → groupby band bucket (the only shuffle; bucket rows ≪ input)
      → candidate pairs per bucket
      → exact-Jaccard verify on the pair set

All hashing uses pandas' stable 64-bit hash / fixed multipliers — no
RNG state, so any partitioning yields identical results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tanml_ray.functions.collect import collect_pylist

# fixed odd multipliers for the universal-hash family h_i(x) = a_i*x + b_i
_MINHASH_SEED_A = 0x9E3779B97F4A7C15
_MINHASH_SEED_B = 0xC2B2AE3D27D4EB4F
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_coeffs(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # fixed: part of the sketch definition
    a = rng.randint(1, 2**62, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**62, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Stable 64-bit hashes of the k-char shingles of normalized text."""
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        shingles = [norm] if norm else []
    else:
        shingles = [norm[i:i + k] for i in range(len(norm) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(shingles, dtype=object),
                                        categorize=False))


def minhash_signature(hashes: np.ndarray, num_perm: int = 64,
                      coeffs: tuple[np.ndarray, np.ndarray] | None = None) -> np.ndarray:
    if coeffs is None:
        coeffs = _perm_coeffs(num_perm)
    a, b = coeffs
    if hashes.size == 0:
        return np.full(num_perm, _U64, dtype=np.uint64)
    # (n_shingles, num_perm) universal hash, min over shingles
    vals = (hashes[:, None] * a[None, :] + b[None, :])  # mod 2^64 wraps
    return vals.min(axis=0)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """Charikar 64-bit SimHash over token hashes."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    w = weights[:, None] if weights is not None else 1
    score = (bits * 2 - 1) * w
    return int(((score.sum(axis=0) > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Pipelines
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: content-hash groupby keeping min id. Returns a
    Dataset of (hash, keep_id, n). Per-batch local pre-dedup shrinks
    the shuffle (SURVEY.md §7.5 item 7)."""
    from ray.data.aggregate import Min, Sum

    def local(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).to_numpy(zero_copy_only=False).astype(object)
        h = pd.util.hash_array(txt, categorize=False).astype(np.uint64)
        df = pd.DataFrame({"h": h.astype(np.int64),
                           "keep_id": batch.column(id_col).to_numpy(zero_copy_only=False)})
        g = df.groupby("h", as_index=False).agg(keep_id=("keep_id", "min"),
                                                n=("keep_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("h")
            .aggregate(Min("keep_id", alias_name="keep_id"),
                       Sum("n", alias_name="n")))


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, threshold: float = 0.6,
                      bucket_partitions: int = 64) -> pa.Table:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard ≥ threshold.

    Pipeline (only signatures/buckets shuffle — never text):
      1. one pass: per-doc minhash signature rows (id, sig 8·num_perm B)
      2. bucketize: (bpart=bhash%P, band, bhash, id) rows
      3. groupby COARSE bpart (P groups, not one per bucket — per-group
         scheduling overhead would dominate with millions of tiny
         buckets) → vectorized within-partition pair generation
      4. signature prefilter: est-Jaccard from the signatures (exactly
         the statistic LSH banding thresholds), keep est ≥ t − 0.15
         (≈2.5σ of the 64-perm estimator — same probabilistic contract
         as the banding itself)
      5. exact Jaccard on the survivors only (targeted shingle fetch)

    Returns (id_a, id_b, jaccard) with id_a < id_b, sorted.
    """
    rows_per_band = num_perm // bands
    coeffs = _perm_coeffs(num_perm)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        keep, blobs = [], []
        for i, t in enumerate(texts):
            if t is None:
                continue
            sig = minhash_signature(shingle_hashes(t, k=shingle_k), num_perm, coeffs)
            keep.append(int(ids[i]))
            blobs.append(sig.tobytes())
        return pa.table({"id": pa.array(keep, type=pa.int64()),
                         "sig": pa.array(blobs, type=pa.binary())})

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow").materialize()

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        sig_mat = np.frombuffer(b"".join(batch.column("sig").to_pylist()),
                                dtype=np.uint64).reshape(len(ids), num_perm)
        out = {"bpart": [], "band": [], "bhash": [], "id": []}
        for b in range(bands):
            band = sig_mat[:, b * rows_per_band:(b + 1) * rows_per_band]
            # row-wise band hash: combine columns with fixed multipliers
            bh = np.zeros(len(ids), dtype=np.uint64)
            for c in range(rows_per_band):
                bh = bh * np.uint64(0x100000001B3) + band[:, c]
            bh = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            out["bpart"].extend((bh % bucket_partitions).tolist())
            out["band"].extend([b] * len(ids))
            out["bhash"].extend(bh.tolist())
            out["id"].extend(ids.tolist())
        return pa.table({"bpart": pa.array(out["bpart"], type=pa.int32()),
                         "band": pa.array(out["band"], type=pa.int32()),
                         "bhash": pa.array(out["bhash"], type=pa.int64()),
                         "id": pa.array(out["id"], type=pa.int64())})

    buckets = sigs.map_batches(bucketize, batch_format="pyarrow")

    def pairs_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "bhash", "id"])
        key = g.groupby(["band", "bhash"], sort=False).ngroup().to_numpy()
        ids = g["id"].to_numpy()
        out_a, out_b = [], []
        start = 0
        for end in np.flatnonzero(np.diff(key)).tolist() + [len(key) - 1]:
            size = end - start + 1
            if 2 <= size <= 1000:
                u = np.unique(ids[start:end + 1])
                if u.size >= 2:
                    ia, ib = np.triu_indices(u.size, k=1)
                    out_a.append(u[ia])
                    out_b.append(u[ib])
            start = end + 1
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)}).drop_duplicates()

    cand = (buckets.groupby("bpart")
            .map_groups(pairs_of_partition, batch_format="pandas"))
    cand_df = pd.DataFrame(collect_pylist(cand))
    if cand_df.empty:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    cand_df = cand_df.drop_duplicates()

    # signature prefilter (fully vectorized): est-J = mean matching
    # minhashes; signatures gathered as ONE matrix, pair lookups via
    # searchsorted (no per-pair python)
    all_ids: list[np.ndarray] = []
    all_sigs: list[np.ndarray] = []
    for t in sigs.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids_arr = t.column("id").to_numpy(zero_copy_only=False)
        blob = b"".join(t.column("sig").to_pylist())
        all_ids.append(ids_arr)
        all_sigs.append(np.frombuffer(blob, dtype=np.uint64)
                        .reshape(len(ids_arr), num_perm))
    id_vec = np.concatenate(all_ids)
    sig_mat = np.vstack(all_sigs)
    order = np.argsort(id_vec)
    id_vec, sig_mat = id_vec[order], sig_mat[order]
    ids_a = cand_df["id_a"].to_numpy()
    ids_b = cand_df["id_b"].to_numpy()
    sa = sig_mat[np.searchsorted(id_vec, ids_a)]
    sb = sig_mat[np.searchsorted(id_vec, ids_b)]
    est = (sa == sb).mean(axis=1)
    keep = est >= max(threshold - 0.15, 0.0)
    survivors = sorted(zip(ids_a[keep].tolist(), ids_b[keep].tolist()))
    if not survivors:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})

    # exact verify on survivors only
    need_set = {i for p in survivors for i in p}

    def shingles_of(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        keep_ids, blobs = [], []
        for i, t in enumerate(texts):
            if int(ids[i]) in need_set and t is not None:
                keep_ids.append(int(ids[i]))
                blobs.append(shingle_hashes(t, k=shingle_k).tobytes())
        return pa.table({"id": pa.array(keep_ids, type=pa.int64()),
                         "sh": pa.array(blobs, type=pa.binary())})

    sh: dict[int, np.ndarray] = {}
    for t in ds.map_batches(shingles_of, batch_format="pyarrow").iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        for i, blob in zip(t.column("id").to_pylist(), t.column("sh").to_pylist()):
            sh[i] = np.frombuffer(blob, dtype=np.uint64)

    rows = []
    for a, b in survivors:
        if a in sh and b in sh:
            j = jaccard(sh[a], sh[b])
            if j >= threshold:
                rows.append({"id_a": a, "id_b": b, "jaccard": round(j, 6)})
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "jaccard": pa.array([], type=pa.float64())})


def simhash_near_dups(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 64-bit fingerprints, candidates share at
    least one of 4 16-bit blocks (guarantees recall for distance ≤ 3),
    verified by exact Hamming distance."""
    def fp_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_id, out_fp, out_blk, out_bv = [], [], [], []
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = np.asarray(t.lower().split(), dtype=object)
            if toks.size == 0:
                continue
            th = pd.util.hash_array(toks, categorize=False)
            fp = simhash64(th)
            for blk in range(4):
                out_id.append(int(ids[i]))
                out_fp.append(fp - 2**63)  # store as int64
                out_blk.append(blk)
                out_bv.append((fp >> (16 * blk)) & 0xFFFF)
        return pa.table({"id": pa.array(out_id, type=pa.int64()),
                         "fp": pa.array(out_fp, type=pa.int64()),
                         "blk": pa.array(out_blk, type=pa.int32()),
                         "bv": pa.array(out_bv, type=pa.int32())})

    buckets = ds.map_batches(fp_batch, batch_format="pyarrow")

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id")
        if len(g) < 2 or len(g) > 1000:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ids = g["id"].to_numpy()
        fps = (g["fp"].to_numpy().astype(np.int64) + 2**63).astype(np.uint64)
        ia, ib = np.triu_indices(len(g), k=1)
        rows = {"id_a": [], "id_b": [], "hamming": []}
        for x, y in zip(ia, ib):
            d = bin(int(fps[x]) ^ int(fps[y])).count("1")
            a, b = int(ids[x]), int(ids[y])
            if a > b:
                a, b = b, a
            rows["id_a"].append(a)
            rows["id_b"].append(b)
            rows["hamming"].append(d)
        return pd.DataFrame(rows)

    cand = buckets.groupby(["blk", "bv"]).map_groups(pairs_of, batch_format="pandas")
    seen = {}
    for r in collect_pylist(cand):
        if r["hamming"] <= max_hamming:
            seen[(int(r["id_a"]), int(r["id_b"]))] = int(r["hamming"])
    rows = [{"id_a": a, "id_b": b, "hamming": h} for (a, b), h in sorted(seen.items())]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "hamming": pa.array([], type=pa.int32())})


def embedding_near_dups(ds, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Embedding-cosine near-dup pairs (sim ≥ threshold, id_a < id_b).

    Small-side broadcast design: the normalized matrix is ray.put once
    and every batch does one numpy matmul against it. The 10^12-scale
    path replaces the broadcast matrix with LSH/IVF buckets; this is
    the exact baseline those approximations are verified against.
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).materialize()
    ids_all, mat = _gather_matrix(full, id_col, vec_col)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids_all, norm))

    def sims(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids_b = batch.column(id_col).to_numpy(zero_copy_only=False)
        vecs = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        all_ids, all_norm = _ray.get(ref)
        s = vecs @ all_norm.T
        rows = {"id_a": [], "id_b": [], "sim": []}
        for r in range(s.shape[0]):
            mask = (s[r] >= threshold) & (all_ids > ids_b[r])
            for j in np.nonzero(mask)[0]:
                rows["id_a"].append(int(ids_b[r]))
                rows["id_b"].append(int(all_ids[j]))
                rows["sim"].append(round(float(s[r, j]), 6))
        return pa.table({"id_a": pa.array(rows["id_a"], type=pa.int64()),
                         "id_b": pa.array(rows["id_b"], type=pa.int64()),
                         "sim": pa.array(rows["sim"], type=pa.float64())})

    out = full.map_batches(sims, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: (r["id_a"], r["id_b"]))
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "sim": pa.array([], type=pa.float64())})


def _gather_matrix(ds, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids, vecs = [], []
    for t in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.append(t.column(id_col).to_numpy(zero_copy_only=False))
        vecs.append(np.stack(t.column(vec_col).to_pylist()).astype(np.float64))
    return np.concatenate(ids), np.vstack(vecs)


# ---------------------------------------------------------------------------
# Duplicate clusters: near-dup pairs → connected components → keep list.
# Union-find on the driver for the (bounded) post-LSH pair set; the
# at-scale alternative is iterative min-label propagation via groupby
# (documented in ray_guide) — same result, O(diameter) rounds.
# ---------------------------------------------------------------------------

def dup_clusters(pairs: "pa.Table | list[tuple[int, int]]") -> dict[int, int]:
    """{doc_id: cluster_root} for every id appearing in a pair; the
    root is the MIN id of the component (deterministic keep-first)."""
    if isinstance(pairs, pa.Table):
        it = zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist())
    else:
        it = iter(pairs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in it:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in parent}


def dedup_keep_list(ds, pairs: pa.Table, id_col: str = "doc_id"):
    """Near-dup-aware keep filter: drop every id whose cluster root is
    not itself (keep-first-per-cluster). Returns the filtered Dataset —
    the drop set broadcasts; the data never shuffles."""
    import ray

    clusters = dup_clusters(pairs)
    drop = {v for v, root in clusters.items() if v != root}
    ref = ray.put(np.sort(np.fromiter(drop, dtype=np.int64))
                  if drop else np.empty(0, dtype=np.int64))

    def keep(batch: pa.Table) -> pa.Table:
        import ray as _ray

        drop_sorted = _ray.get(ref)
        if not len(drop_sorted):
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(drop_sorted, ids)
        pos[pos == len(drop_sorted)] = 0
        mask = drop_sorted[pos] != ids
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
