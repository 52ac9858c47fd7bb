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
import pyarrow.compute as pc

from tanml_ray.functions.collect import from_pandas_clean, collect_pylist
from tanml_ray.sources.ingest import read_parquet_clean

# fixed odd multipliers for the universal-hash family h_i(x) = a_i*x + b_i
_MINHASH_SEED_A = 0x9E3779B97F4A7C15
_MINHASH_SEED_B = 0xC2B2AE3D27D4EB4F
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_OVERSIZE_WARNED = False  # once-per-process oversize-bucket notice


def _perm_coeffs(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # fixed: part of the sketch definition
    a = rng.randint(1, 2**62, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**62, size=num_perm, dtype=np.uint64)
    return a, b


_SHINGLE_P = np.uint64(1099511628211)  # FNV-1a prime, odd → bijective ·P


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Stable 64-bit hashes of the k-CHAR shingles of normalized text.

    Fully vectorized: the normalized string decodes once to a UTF-32
    codepoint array (char-exact — byte shingles would disagree with
    the char-substr SQL oracle on any non-ASCII text) and each shingle
    hashes by k fused multiply-adds over the whole window array —
    h = ((c₀·P + c₁)·P + …)·P + c_{k−1} mod 2⁶⁴ — instead of
    materializing k-char Python substrings and object-hashing them
    (~100× less per-doc CPU; at 10⁹ docs the substring path was the
    dominant signature cost). The hash VALUES changed in round 4
    (polynomial vs pd.util.hash_array) — legal because every consumer
    treats them as an opaque set: exact Jaccard is hash-set Jaccard
    (identical for any injective-on-the-corpus hash), and LSH banding
    recall at the 0.6 threshold re-verified exact vs the brute-force
    SQL oracle at sf0.01 and sf0.1 after the switch."""
    norm = " ".join(text.lower().split())
    if not norm:
        return np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(norm.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
    if len(codes) < k:
        h = 0  # same scheme over the shorter window, python-int mod 2^64
        for c in codes.tolist():
            h = (h * 1099511628211 + c) & 0xFFFFFFFFFFFFFFFF
        return np.array([h], dtype=np.uint64)
    n = len(codes) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wrap IS the hash
        for j in range(k):
            h = h * _SHINGLE_P + codes[j:j + n]
    return np.unique(h)


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


def md5_token_hashes(tokens) -> np.ndarray:
    """Lower-64-bit MD5 of each token: the LAST 8 digest bytes,
    little-endian — bit-identical to DuckDB's ``md5_number_lower()``,
    which is what makes the SimHash fingerprint SQL-reproducible
    (queries.SIMHASH_NEAR_DUP_SQL recomputes the fingerprints in pure
    SQL). A per-call memo collapses repeated tokens (Zipf: most of a
    batch's tokens are a few thousand distinct strings), so the md5
    cost is per-distinct-token, not per-token."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    memo: dict[str, int] = {}
    for i, t in enumerate(tokens):
        h = memo.get(t)
        if h is None:
            h = memo[t] = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[8:], "little")
        out[i] = h
    return out


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
    the shuffle (SURVEY.md §7.5 item 7).

    Scale caveat: the 64-bit key is collision-exposed at 10¹²-row
    scale (birthday ≈ n²/2⁶⁵) — anything that DELETES rows based on
    these groups must verify with a wider digest or string equality
    first (pipelines/curate.py keys its destructive dedup on a 128-bit
    md5 for exactly this reason; the uniqueness(url) check verifies by
    string equality)."""
    from ray.data.aggregate import Min, Sum

    def local(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).to_numpy(zero_copy_only=False).astype(object)
        h = pd.util.hash_array(txt, categorize=False).astype(np.uint64)
        df = pd.DataFrame({"h": h.astype(np.int64),
                           "keep_id": batch.column(id_col).to_numpy(zero_copy_only=False)})
        g = df.groupby("h", as_index=False).agg(keep_id=("keep_id", "min"),
                                                n=("keep_id", "size"))
        return from_pandas_clean(g, preserve_index=False)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("h")
            .aggregate(Min("keep_id", alias_name="keep_id"),
                       Sum("n", alias_name="n")))


def _bucket_pairs(u: np.ndarray, cap: int):
    """All unordered pairs of a (unique, sorted) id bucket, yielded in
    memory-bounded chunks: buckets ≤ cap emit one triu block; larger
    buckets emit cap×cap cross-join sub-blocks so peak memory stays
    ~cap² regardless of bucket size. NO bucket is ever skipped — a
    boilerplate-heavy cluster of B near-identical docs genuinely has
    O(B²) candidate pairs and gets all of them (the output is
    inherently quadratic in cluster size; pre-collapsing exact
    duplicates upstream, as pipelines/curate.py does, is the lever
    that keeps B bounded)."""
    n = u.size
    if n < 2:
        return
    if n <= cap:
        ia, ib = np.triu_indices(n, k=1)
        yield u[ia], u[ib]
        return
    global _OVERSIZE_WARNED
    if not _OVERSIZE_WARNED:
        _OVERSIZE_WARNED = True
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket of %d ids exceeds bucket_cap=%d — processing in "
            "chunked sub-blocks (exact, but O(bucket²) work in one "
            "task); pre-collapse exact duplicates upstream to bound "
            "bucket sizes (pipelines/curate.py does)", n, cap)
    for ci in range(0, n, cap):
        a = u[ci:ci + cap]
        ia, ib = np.triu_indices(a.size, k=1)
        yield a[ia], a[ib]
        for cj in range(ci + cap, n, cap):
            b = u[cj:cj + cap]
            yield np.repeat(a, b.size), np.tile(b, a.size)


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, threshold: float = 0.6,
                      bucket_partitions: int = 64,
                      sig_driver_budget: int = 256 << 20,
                      verify_driver_budget: int = 256 << 20,
                      bucket_cap: int = 1000,
                      as_dataset: bool = False) -> pa.Table:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard ≥ threshold.

    Pipeline (only signatures/buckets shuffle — never text, and the
    signature table never exceeds a bounded driver budget):
      1. one pass: per-doc minhash signature rows (id, sig 8·num_perm B)
      2. bucketize: (bpart=bhash%P, band, bhash, id) rows
      3. groupby COARSE bpart (P groups, not one per bucket — per-group
         scheduling overhead would dominate with millions of tiny
         buckets) → vectorized within-partition pair generation
      4. signature prefilter, est-Jaccard = mean matching minhashes
         (exactly the statistic LSH banding thresholds), keep est ≥
         t − 0.15 (≈2.5σ of the 64-perm estimator — same probabilistic
         contract as the banding itself). SIZE-ADAPTIVE, same contract
         as the uniqueness(url) merge: while the sig table fits
         `sig_driver_budget` (8·num_perm B/doc → 256 MB ≈ 5×10⁵ docs…
         at 512 B/doc ≈ 5×10⁵; cluster drivers usually raise this) one
         driver pass with vectorized searchsorted lookups is faster
         than any shuffle; above it, TWO partitioned sig-attach rounds
         run fully distributed — candidates shuffle to hash(id_a)%P
         alongside the hash-partitioned sig table (attach sig_a +
         global pair dedup — every copy of a pair shares id_a so the
         dedup is exact), then to hash(id_b)%P (attach sig_b, est
         filter). Each round moves O(sigs + candidate pairs) rows;
         nothing scales with the corpus on the driver. Both paths are
         exact and produce identical survivors.
      5. exact Jaccard on the survivors only (targeted shingle fetch;
         the survivor id set is output-bounded and broadcast via
         ray.put, never captured in a task closure)

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
            # singleton buckets (the vast majority) skip before any
            # np.unique/generator work; every size≥2 bucket contributes
            # ALL its pairs — oversize buckets stream through chunked
            # sub-blocks instead of being (silently) dropped
            if end > start:
                u = np.unique(ids[start:end + 1])
                for a, b in _bucket_pairs(u, bucket_cap):
                    out_a.append(a)
                    out_b.append(b)
            start = end + 1
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)}).drop_duplicates()

    cand = (buckets.groupby("bpart")
            .map_groups(pairs_of_partition, batch_format="pandas"))

    P = bucket_partitions
    min_est = max(threshold - 0.15, 0.0)
    empty_result = pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})

    if sigs.size_bytes() <= sig_driver_budget:
        # --- bounded driver path. The est-Jaccard prefilter gathers
        # the (budget-bounded) sig matrix anyway, so the banded
        # bucketization runs vectorized over the SAME matrix — no
        # bucket-row dataset, no groupby shuffle, no candidate
        # collect round-trip. Band hashes, bucket membership,
        # bucket_cap chunking and the resulting pair set are
        # IDENTICAL to the distributed path (the sig_driver_budget=0
        # equality pytest pins this).
        all_ids: list[np.ndarray] = []
        all_sigs: list[np.ndarray] = []
        for t in sigs.iter_batches(batch_size=8192, batch_format="pyarrow"):
            ids_arr = t.column("id").to_numpy(zero_copy_only=False)
            blob = b"".join(t.column("sig").to_pylist())
            all_ids.append(ids_arr)
            all_sigs.append(np.frombuffer(blob, dtype=np.uint64)
                            .reshape(len(ids_arr), num_perm))
        if not all_ids or sum(len(a) for a in all_ids) == 0:
            if as_dataset:
                import ray.data as _rd

                return _rd.from_arrow(empty_result)
            return empty_result
        id_vec = np.concatenate(all_ids)
        sig_mat = np.vstack(all_sigs)
        order = np.argsort(id_vec)
        id_vec, sig_mat = id_vec[order], sig_mat[order]
        out_a, out_b = [], []
        for bi in range(bands):
            band = sig_mat[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            bh = np.zeros(len(id_vec), dtype=np.uint64)
            for c in range(rows_per_band):
                bh = bh * np.uint64(0x100000001B3) + band[:, c]
            bh = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            o = np.argsort(bh, kind="stable")
            bh_s, ids_s = bh[o], id_vec[o]
            start = 0
            for end in np.flatnonzero(np.diff(bh_s)).tolist() + [len(bh_s) - 1]:
                if end > start:
                    u = np.unique(ids_s[start:end + 1])
                    for pa_, pb_ in _bucket_pairs(u, bucket_cap):
                        out_a.append(pa_)
                        out_b.append(pb_)
                start = end + 1
        if not out_a:
            if as_dataset:
                import ray.data as _rd

                return _rd.from_arrow(empty_result)
            return empty_result
        cand_df = pd.DataFrame({"id_a": np.concatenate(out_a),
                                "id_b": np.concatenate(out_b)}).drop_duplicates()
        ids_a = cand_df["id_a"].to_numpy()
        ids_b = cand_df["id_b"].to_numpy()
        sa = sig_mat[np.searchsorted(id_vec, ids_a)]
        sb = sig_mat[np.searchsorted(id_vec, ids_b)]
        est = (sa == sb).mean(axis=1)
        keep = est >= min_est
        survivors = sorted(zip(ids_a[keep].tolist(), ids_b[keep].tolist()))
        return _minhash_exact_verify(ds, survivors, text_col, id_col,
                                     shingle_k, threshold, empty_result,
                                     driver_budget=verify_driver_budget,
                                     partitions=bucket_partitions,
                                     as_dataset=as_dataset)

    # --- distributed est-Jaccard prefilter: two sig-attach rounds.
    # The sig table hash-partitions by id ONCE (same key both rounds);
    # candidate pairs ride along. No driver gather of signatures.

    def _part_of(ids: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(ids.astype(np.int64))
                % np.uint64(P)).astype(np.int32)

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        return pa.table({"jpart": pa.array(_part_of(ids), type=pa.int32()),
                         "kind": pa.array(["s"] * len(ids), type=pa.string()),
                         "id_a": pa.array(ids, type=pa.int64()),
                         "id_b": pa.array(np.zeros(len(ids), dtype=np.int64)),
                         "sig": batch.column("sig").combine_chunks()})

    sig_keyed = sigs.map_batches(sig_rows, batch_format="pyarrow").materialize()

    def cand_rows(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        n = len(ia)
        return pa.table({"jpart": pa.array(_part_of(ia), type=pa.int32()),
                         "kind": pa.array(["p"] * n, type=pa.string()),
                         "id_a": batch.column("id_a").combine_chunks(),
                         "id_b": batch.column("id_b").combine_chunks(),
                         "sig": pa.nulls(n, type=pa.binary())})

    _empty_tagged = pa.table({"jpart": pa.array([], type=pa.int32()),
                              "kind": pa.array([], type=pa.string()),
                              "id_a": pa.array([], type=pa.int64()),
                              "id_b": pa.array([], type=pa.int64()),
                              "sig": pa.array([], type=pa.binary())})
    _empty_pairs = pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})

    def attach_a(g: pd.DataFrame) -> pa.Table:
        s = g[g["kind"] == "s"]
        sig_map = dict(zip(s["id_a"].to_numpy(), s["sig"]))
        p = g[g["kind"] == "p"][["id_a", "id_b"]].drop_duplicates()
        if p.empty:
            return _empty_tagged
        sa = p["id_a"].map(sig_map)
        m = sa.notna()
        p, sa = p[m], sa[m]
        n = len(p)
        return pa.table({"jpart": pa.array(_part_of(p["id_b"].to_numpy()), type=pa.int32()),
                         "kind": pa.array(["p"] * n, type=pa.string()),
                         "id_a": pa.array(p["id_a"].to_numpy(), type=pa.int64()),
                         "id_b": pa.array(p["id_b"].to_numpy(), type=pa.int64()),
                         "sig": pa.array(sa.tolist(), type=pa.binary())})

    def attach_b_and_filter(g: pd.DataFrame) -> pa.Table:
        s = g[g["kind"] == "s"]
        sig_map = dict(zip(s["id_a"].to_numpy(), s["sig"]))
        p = g[g["kind"] == "p"]
        if p.empty:
            return _empty_pairs
        sb = p["id_b"].map(sig_map)
        m = sb.notna()
        p, sb = p[m], sb[m]
        if p.empty:
            return _empty_pairs
        sa_mat = np.frombuffer(b"".join(p["sig"]), dtype=np.uint64) \
            .reshape(len(p), num_perm)
        sb_mat = np.frombuffer(b"".join(sb), dtype=np.uint64) \
            .reshape(len(p), num_perm)
        est = (sa_mat == sb_mat).mean(axis=1)
        keep = est >= min_est
        return pa.table({"id_a": pa.array(p["id_a"].to_numpy()[keep], type=pa.int64()),
                         "id_b": pa.array(p["id_b"].to_numpy()[keep], type=pa.int64())})

    round1 = (sig_keyed.union(cand.map_batches(cand_rows, batch_format="pyarrow"))
              .groupby("jpart").map_groups(attach_a, batch_format="pandas"))
    surv_ds = (sig_keyed.union(round1)
               .groupby("jpart").map_groups(attach_b_and_filter,
                                            batch_format="pandas"))
    # survivors are OUTPUT-bounded (post-prefilter near-dup pairs) —
    # safe to collect
    survivors = sorted({(int(r["id_a"]), int(r["id_b"]))
                        for r in collect_pylist(surv_ds)})
    return _minhash_exact_verify(ds, survivors, text_col, id_col,
                                 shingle_k, threshold, empty_result,
                                 driver_budget=verify_driver_budget,
                                 partitions=bucket_partitions,
                                 as_dataset=as_dataset)


def _minhash_exact_verify(ds, survivors, text_col: str, id_col: str,
                          shingle_k: int, threshold: float,
                          empty_result: pa.Table,
                          driver_budget: int = 256 << 20,
                          partitions: int = 64,
                          as_dataset: bool = False) -> pa.Table:
    """Exact-Jaccard verify of prefilter survivors: targeted shingle
    fetch of only the surviving ids (the pair set is output-bounded,
    but each shingle set is O(doc length)). SIZE-ADAPTIVE like the
    signature prefilter: while the fetched shingle table fits
    `driver_budget`, one driver pass over it is fastest; above the
    budget the verify runs as TWO hash-partitioned attach rounds
    (shingle blobs ride to hash(id_a)%P then hash(id_b)%P alongside
    the pairs; jaccard is computed inside the second round's groups)
    so no shingle blob ever sits on the driver. Both paths are exact
    and produce identical rows. The needed-id set broadcasts via
    ray.put (a closure capture would re-ship it with every task)."""
    import ray.data as _rd_mod

    if not survivors:
        return _rd_mod.from_arrow(empty_result) if as_dataset else empty_result
    import ray as _ray_mod

    need_ref = _ray_mod.put(np.unique(np.array(survivors, dtype=np.int64)))

    def shingles_of(batch: pa.Table) -> pa.Table:
        import ray as _ray

        need = _ray.get(need_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(need, ids)
        pos[pos == len(need)] = 0
        hit = np.nonzero(need[pos] == ids)[0]
        texts = batch.column(text_col).take(hit).to_pylist() if hit.size else []
        keep_ids, blobs = [], []
        for i, t in zip(hit, texts):
            if t is not None:
                keep_ids.append(int(ids[i]))
                blobs.append(shingle_hashes(t, k=shingle_k).tobytes())
        return pa.table({"id": pa.array(keep_ids, type=pa.int64()),
                         "sh": pa.array(blobs, type=pa.binary())})

    sh_ds = ds.map_batches(shingles_of, batch_format="pyarrow").materialize()

    if sh_ds.size_bytes() <= driver_budget:
        sh: dict[int, np.ndarray] = {}
        for t in sh_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for i, blob in zip(t.column("id").to_pylist(),
                               t.column("sh").to_pylist()):
                sh[i] = np.frombuffer(blob, dtype=np.uint64)
        rows = []
        for a, b in survivors:
            if a in sh and b in sh:
                j = jaccard(sh[a], sh[b])
                if j >= threshold:
                    rows.append({"id_a": a, "id_b": b, "jaccard": round(j, 6)})
        out = pa.Table.from_pylist(rows) if rows else empty_result
        return _rd_mod.from_arrow(out) if as_dataset else out

    # --- distributed verify: two partitioned shingle-attach rounds
    import ray.data as rd

    P = partitions

    def _part_of(ids: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(ids.astype(np.int64))
                % np.uint64(P)).astype(np.int32)

    # shingle rows key by their OWN id — the same key serves both
    # rounds (round 1 groups by hash(id_a), round 2 by hash(id_b))
    def sh_rows(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        return pa.table({"jpart": pa.array(_part_of(ids), type=pa.int32()),
                         "kind": pa.array(["s"] * len(ids), type=pa.string()),
                         "id_a": pa.array(ids, type=pa.int64()),
                         "id_b": pa.array(np.zeros(len(ids), dtype=np.int64)),
                         "blob": t.column("sh").combine_chunks()})

    sh_tag = sh_ds.map_batches(sh_rows, batch_format="pyarrow").materialize()

    pair_arr = np.asarray(survivors, dtype=np.int64)
    pair_ds = rd.from_arrow(pa.table({
        "jpart": pa.array(_part_of(pair_arr[:, 0]), type=pa.int32()),
        "kind": pa.array(["p"] * len(pair_arr), type=pa.string()),
        "id_a": pa.array(pair_arr[:, 0], type=pa.int64()),
        "id_b": pa.array(pair_arr[:, 1], type=pa.int64()),
        "blob": pa.nulls(len(pair_arr), type=pa.binary())}))

    _empty_tagged = pa.table({"jpart": pa.array([], type=pa.int32()),
                              "kind": pa.array([], type=pa.string()),
                              "id_a": pa.array([], type=pa.int64()),
                              "id_b": pa.array([], type=pa.int64()),
                              "blob": pa.array([], type=pa.binary())})

    def attach_a(g: pd.DataFrame) -> pa.Table:
        s = g[g["kind"] == "s"]
        blob_map = dict(zip(s["id_a"].to_numpy(), s["blob"]))
        p = g[g["kind"] == "p"]
        if p.empty:
            return _empty_tagged
        ba = p["id_a"].map(blob_map)
        m = ba.notna()
        p, ba = p[m], ba[m]
        n = len(p)
        return pa.table({"jpart": pa.array(_part_of(p["id_b"].to_numpy()),
                                           type=pa.int32()),
                         "kind": pa.array(["p"] * n, type=pa.string()),
                         "id_a": pa.array(p["id_a"].to_numpy(), type=pa.int64()),
                         "id_b": pa.array(p["id_b"].to_numpy(), type=pa.int64()),
                         "blob": pa.array(ba.tolist(), type=pa.binary())})

    def attach_b_and_jaccard(g: pd.DataFrame) -> pa.Table:
        s = g[g["kind"] == "s"]
        blob_map = dict(zip(s["id_a"].to_numpy(), s["blob"]))
        p = g[g["kind"] == "p"]
        out = {"id_a": [], "id_b": [], "jaccard": []}
        for a, b, blob_a in zip(p["id_a"].to_numpy(), p["id_b"].to_numpy(),
                                p["blob"]):
            blob_b = blob_map.get(b)
            if blob_b is None:
                continue
            j = jaccard(np.frombuffer(blob_a, dtype=np.uint64),
                        np.frombuffer(blob_b, dtype=np.uint64))
            if j >= threshold:
                out["id_a"].append(int(a))
                out["id_b"].append(int(b))
                out["jaccard"].append(round(j, 6))
        return pa.table({"id_a": pa.array(out["id_a"], type=pa.int64()),
                         "id_b": pa.array(out["id_b"], type=pa.int64()),
                         "jaccard": pa.array(out["jaccard"], type=pa.float64())})

    round1 = (sh_tag.union(pair_ds)
              .groupby("jpart").map_groups(attach_a, batch_format="pandas"))
    verified = (sh_tag.union(round1)
                .groupby("jpart").map_groups(attach_b_and_jaccard,
                                             batch_format="pandas"))
    if as_dataset:
        # each pair occurs exactly once (the survivor set is deduped
        # before the attach rounds) — no driver collect needed
        return verified
    rows = sorted(collect_pylist(verified),
                  key=lambda r: (r["id_a"], r["id_b"]))
    return pa.Table.from_pylist(rows) if rows else empty_result


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (unpackbits, no per-element
    Python)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if x.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.unpackbits(x.view(np.uint8)).reshape(x.size, 64) \
        .sum(axis=1).astype(np.int64)


def explode_fp_blocks(ids: np.ndarray, fps: np.ndarray,
                      bucket_partitions: int) -> pa.Table:
    """(id, 64-bit fp) → 4 block-bucket rows per id with the coarse
    (blk·2¹⁶+bv) % P partition key. fps uint64; stored bit-reinterpreted
    as int64 (Arrow has no uint64-friendly pandas round-trip here)."""
    n = len(ids)
    out_id = np.repeat(ids.astype(np.int64), 4)
    out_fp = np.repeat(fps.astype(np.uint64), 4)
    blk = np.tile(np.arange(4, dtype=np.int64), n)
    bv = ((out_fp >> (blk.astype(np.uint64) * np.uint64(16)))
          & np.uint64(0xFFFF)).astype(np.int64)
    bpart = ((blk << 16) + bv) % bucket_partitions
    return pa.table({"id": pa.array(out_id, type=pa.int64()),
                     # bit-exact store: reinterpret the uint64 bits as
                     # int64 (NEVER arithmetic with a Python 2**63 int —
                     # numpy promotes that to float64 and destroys the
                     # low ~11 bits of every fingerprint)
                     "fp": pa.array(out_fp.view(np.int64), type=pa.int64()),
                     "blk": pa.array(blk.astype(np.int32), type=pa.int32()),
                     "bv": pa.array(bv.astype(np.int32), type=pa.int32()),
                     "bpart": pa.array(bpart.astype(np.int32), type=pa.int32())})


def fingerprint_near_dups(buckets, max_hamming: int = 3,
                          bucket_cap: int = 1000,
                          as_dataset: bool = False) -> pa.Table:
    """Near-dup pairs over ANY 64-bit-fingerprint block-bucket stream
    (explode_fp_blocks output): candidates share at least one of 4
    16-bit blocks (guarantees recall for Hamming distance ≤ 3 by
    pigeonhole — and the guarantee holds for buckets of EVERY size:
    oversize buckets are verified in chunked cap×cap sub-blocks, never
    skipped), verified by exact vectorized Hamming. Only pairs that
    PASS the Hamming verify leave the group, so even a giant
    identical-content bucket emits only its true near-dup pairs.

    Scale shape mirrors the MinHash path: the shuffle groups by the
    COARSE ``(blk·2¹⁶+bv) % P`` partition key (P groups, not one
    map_groups call per 16-bit bucket — up to 262k tiny groups would be
    pure scheduling overhead), with the per-bucket pair generation and
    XOR+popcount Hamming verify fully vectorized inside each partition.
    Only the post-verify matching pairs (output-bounded) reach the
    driver, where cross-band duplicates collapse."""
    def pairs_of_partition(group: pd.DataFrame) -> pa.Table:
        g = (group.drop_duplicates(["blk", "bv", "id"])
             .sort_values(["blk", "bv", "id"]))
        key = g.groupby(["blk", "bv"], sort=False).ngroup().to_numpy()
        ids = g["id"].to_numpy()
        fps = np.ascontiguousarray(
            g["fp"].to_numpy(dtype=np.int64)).view(np.uint64)
        out_a, out_b, out_d = [], [], []
        start = 0
        for end in np.flatnonzero(np.diff(key)).tolist() + [len(key) - 1]:
            size = end - start + 1
            if size < 2:          # singleton fast-skip
                start = end + 1
                continue
            seg_ids = ids[start:end + 1]
            seg_fps = fps[start:end + 1]
            for ia, ib in _bucket_pairs(np.arange(size, dtype=np.int64),
                                        bucket_cap):
                d = popcount64(seg_fps[ia] ^ seg_fps[ib])
                keep = d <= max_hamming
                if keep.any():
                    a, b = seg_ids[ia[keep]], seg_ids[ib[keep]]
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_d.append(d[keep])
            start = end + 1
        if not out_a:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int32())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                         "hamming": pa.array(np.concatenate(out_d), type=pa.int32())})

    cand = buckets.groupby("bpart").map_groups(pairs_of_partition,
                                               batch_format="pandas")
    if as_dataset:
        # cross-band duplicate collapse as a distributed groupby — the
        # matching-pair set scales with the corpus dup rate on
        # image/audio crawls, so it must never be forced through a
        # driver dict (the hamming value is identical for every copy
        # of a pair, so Min is a pure dedup)
        from ray.data.aggregate import Min

        return (cand.groupby(["id_a", "id_b"])
                .aggregate(Min("hamming", alias_name="hamming")))
    seen: dict[tuple[int, int], int] = {}
    for r in collect_pylist(cand):
        seen[(int(r["id_a"]), int(r["id_b"]))] = int(r["hamming"])
    rows = [{"id_a": a, "id_b": b, "hamming": h} for (a, b), h in sorted(seen.items())]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "hamming": pa.array([], type=pa.int32())})


def simhash_near_dups(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3,
                      bucket_partitions: int = 64,
                      bucket_cap: int = 1000,
                      as_dataset: bool = False) -> pa.Table:
    """SimHash near-dup pairs over a text column: Charikar 64-bit
    fingerprints per doc, then the generic fingerprint_near_dups
    block-bucket machinery (shared with image pHash dedup).

    Token hashes are md5-lower-64 (md5_token_hashes), matching DuckDB's
    md5_number_lower() so the whole operator — fingerprints AND the
    hamming≤r pair set (the 4-block pigeonhole bucketing is exact for
    r≤3 per block count, so output = ALL qualifying pairs) — has a full
    SQL oracle (queries.SIMHASH_NEAR_DUP_SQL)."""
    def fp_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        keep_ids, fps = [], []
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = t.lower().split()
            if not toks:
                continue
            keep_ids.append(int(ids[i]))
            fps.append(simhash64(md5_token_hashes(toks)))
        return explode_fp_blocks(np.asarray(keep_ids, dtype=np.int64),
                                 np.asarray(fps, dtype=np.uint64),
                                 bucket_partitions)

    buckets = ds.map_batches(fp_batch, batch_format="pyarrow")
    return fingerprint_near_dups(buckets, max_hamming=max_hamming,
                                 bucket_cap=bucket_cap,
                                 as_dataset=as_dataset)


def _normalize_batch(batch: pa.Table, id_col: str, vec_col: str):
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if batch.num_rows == 0:  # np.stack([]) raises; empty blocks are legal
        return ids, np.empty((0, 0), dtype=np.float64)
    vecs = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
    vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    return ids, vecs


def _kmeans_unit_vectors(ds, id_col: str, vec_col: str, k: int,
                         iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd over the NORMALIZED vector column: diagonal
    min/max init (partition-order independent, no RNG), a few mergeable
    sum/count rounds. Centroid quality only affects near-dup PRUNING,
    never correctness, so few iterations suffice."""
    import ray

    def mm(batch: pa.Table) -> pa.Table:
        _, v = _normalize_batch(batch, id_col, vec_col)
        if v.size == 0:
            return pa.table({"vmin": pa.array([], type=pa.list_(pa.float64())),
                             "vmax": pa.array([], type=pa.list_(pa.float64()))})
        return pa.table({"vmin": [v.min(axis=0).tolist()],
                         "vmax": [v.max(axis=0).tolist()]})

    vmin = vmax = None
    for r in collect_pylist(ds.map_batches(mm, batch_format="pyarrow")):
        lo, hi = np.asarray(r["vmin"]), np.asarray(r["vmax"])
        vmin = lo if vmin is None else np.minimum(vmin, lo)
        vmax = hi if vmax is None else np.maximum(vmax, hi)
    fracs = (np.arange(k) + 0.5) / k
    centers = vmin[None, :] + fracs[:, None] * (vmax - vmin)[None, :]

    for _ in range(iters):
        cref = ray.put(centers)

        def assign(batch: pa.Table) -> pa.Table:
            import ray as _ray

            C = _ray.get(cref)
            _, v = _normalize_batch(batch, id_col, vec_col)
            if v.size == 0:
                return pa.table({"cluster": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "sums": pa.array([], type=pa.list_(pa.float64()))})
            d = ((v ** 2).sum(axis=1, keepdims=True) + (C ** 2).sum(axis=1)[None, :]
                 - 2.0 * (v @ C.T))
            lab = d.argmin(axis=1)
            rows = []
            for j in np.unique(lab):
                m = lab == j
                rows.append({"cluster": int(j), "n": int(m.sum()),
                             "sums": v[m].sum(axis=0).tolist()})
            return pa.Table.from_pylist(rows)

        agg: dict[int, tuple[int, np.ndarray]] = {}
        for r in collect_pylist(ds.map_batches(assign, batch_format="pyarrow")):
            n0, s0 = agg.get(r["cluster"], (0, 0.0))
            agg[r["cluster"]] = (n0 + r["n"], s0 + np.asarray(r["sums"]))
        for j, (n, s) in agg.items():
            if n:
                centers[j] = s / n
    return centers


def embedding_near_dups(ds, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_centroids: int | None = None,
                        as_dataset: bool = False) -> pa.Table:
    """Embedding-cosine near-dup pairs (sim ≥ threshold, id_a < id_b) —
    IVF/centroid-bucketed with GUARANTEED recall 1.0, so it backs the
    threshold-exact SQL oracle directly.

    Recall guarantee (triangle inequality, unit vectors): sim ≥ t ⟹
    ‖u−v‖ ≤ r = √(2−2t). Each vector is native to its nearest centroid
    and replicated to every centroid within d_min(u) + 2r; for any
    qualifying pair, d(u, c_v) ≤ r + d_min(v) ≤ 2r + d_min(u), so u
    always lands in v's native cell (and/or vice versa). Cells compare
    native×copy pairs with one vectorized matmul; only post-threshold
    pairs (output-bounded) reach the driver, where the ≤2-cell
    duplicates collapse. Nothing is broadcast except the k×d centroid
    matrix; no stage scales super-linearly on the driver. Total compare
    cost ≈ Σ m_c² ≈ N^1.5 at k=√N for spread data (vs the exact
    kernel's N², `embedding_near_dups_exact`, which this path is
    recall-tested against).

    Below threshold ≈ 0.75 the replication radius 2r approaches the
    diameter of the unit sphere and EVERY radius-based index degenerates
    to all-pairs-times-k; the call transparently routes to the exact
    block-pair kernel there (same output contract — both are exact)."""
    import ray

    r = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))
    if threshold < 0.75:
        t = embedding_near_dups_exact(ds, threshold=threshold,
                                      id_col=id_col, vec_col=vec_col)
        if as_dataset:
            import ray.data as _rd

            return _rd.from_arrow(t)
        return t
    N = ds.count()
    if N == 0:
        t = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "sim": pa.array([], type=pa.float64())})
        if as_dataset:
            import ray.data as _rd

            return _rd.from_arrow(t)
        return t
    k = n_centroids or max(2, int(np.sqrt(N)))
    src = ds.select_columns([id_col, vec_col]).materialize()
    centers = _kmeans_unit_vectors(src, id_col, vec_col, k)
    cref = ray.put((centers, r))

    def emit(batch: pa.Table) -> pa.Table:
        import ray as _ray

        C, rr = _ray.get(cref)
        ids, v = _normalize_batch(batch, id_col, vec_col)
        if v.size == 0:
            return pa.table({"cell": pa.array([], type=pa.int32()),
                             "id": pa.array([], type=pa.int64()),
                             "native": pa.array([], type=pa.bool_()),
                             "vec": pa.array([], type=pa.binary())})
        d2 = ((v ** 2).sum(axis=1, keepdims=True) + (C ** 2).sum(axis=1)[None, :]
              - 2.0 * (v @ C.T))
        d = np.sqrt(np.maximum(d2, 0.0))
        native = d.argmin(axis=1)
        lim = d[np.arange(len(ids)), native] + 2.0 * rr
        ri, rc = np.nonzero(d <= lim[:, None])
        return pa.table({
            "cell": pa.array(rc.astype(np.int32), type=pa.int32()),
            "id": pa.array(ids[ri], type=pa.int64()),
            "native": pa.array(native[ri] == rc),
            "vec": pa.array([v[i].tobytes() for i in ri], type=pa.binary()),
        })

    rows_ds = src.map_batches(emit, batch_format="pyarrow")

    def pairs_in_cell(g: pd.DataFrame) -> pa.Table:
        ids = g["id"].to_numpy()
        nat = g["native"].to_numpy(dtype=bool)
        V = np.frombuffer(b"".join(g["vec"]), dtype=np.float64).reshape(len(g), -1)
        s = V @ V.T
        iu, ju = np.triu_indices(len(g), k=1)
        ok = (s[iu, ju] >= threshold) & (nat[iu] | nat[ju])
        a, b = ids[iu[ok]], ids[ju[ok]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo, type=pa.int64()),
                         "id_b": pa.array(hi, type=pa.int64()),
                         "sim": pa.array(np.round(s[iu, ju][ok], 6),
                                         type=pa.float64())})

    out = rows_ds.groupby("cell").map_groups(pairs_in_cell, batch_format="pandas")
    if as_dataset:
        # the ≤2-cell duplicates collapse as a distributed groupby (the
        # rounded sim is identical in both cells, so Min is a pure
        # dedup) — matching pairs scale with the corpus dup rate, so
        # the Dataset form must never route through a driver dict
        from ray.data.aggregate import Min

        return (out.groupby(["id_a", "id_b"])
                .aggregate(Min("sim", alias_name="sim")))
    best: dict[tuple[int, int], float] = {}
    for rr_ in collect_pylist(out):
        best.setdefault((int(rr_["id_a"]), int(rr_["id_b"])), float(rr_["sim"]))
    rows = [{"id_a": a, "id_b": b, "sim": s} for (a, b), s in sorted(best.items())]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "sim": pa.array([], type=pa.float64())})


def embedding_near_dups_exact(ds, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> pa.Table:
    """Exact all-pairs verify kernel, distributed as a block-pair join:
    normalized blocks live in the object store; one Ray task per block
    pair (B(B+1)/2 tasks) does a single matmul and emits only
    post-threshold pairs. O(N²) compute by definition — the price of
    exactness — but no full-matrix broadcast and no driver gather of
    vectors (raw Ray tasks: a block-pair grid is one of the few shapes
    the Dataset API can't express)."""
    import ray

    mat = ds.select_columns([id_col, vec_col]).map_batches(
        lambda b: (lambda ids, v: pa.table(
            {"id": pa.array(ids, type=pa.int64()),
             "vec": pa.array([v[i].tobytes() for i in range(len(ids))],
                             type=pa.binary())}))(*_normalize_batch(b, id_col, vec_col)),
        batch_format="pyarrow").materialize()
    try:
        block_refs = [ref for bundle in mat.iter_internal_ref_bundles()
                      for ref in bundle.block_refs]
    except AttributeError:  # older Ray
        block_refs = list(mat.get_internal_block_refs())

    @ray.remote
    def cmp(block_a, block_b, same: bool):
        ba = pa.table(block_a) if not isinstance(block_a, pa.Table) else block_a
        bb = pa.table(block_b) if not isinstance(block_b, pa.Table) else block_b
        ia = ba.column("id").to_numpy(zero_copy_only=False)
        ib = bb.column("id").to_numpy(zero_copy_only=False)
        if len(ia) == 0 or len(ib) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, np.empty(0, dtype=np.float64)
        A = np.frombuffer(b"".join(ba.column("vec").to_pylist()),
                          dtype=np.float64).reshape(len(ia), -1)
        B = np.frombuffer(b"".join(bb.column("vec").to_pylist()),
                          dtype=np.float64).reshape(len(ib), -1)
        s = A @ B.T
        if same:
            iu, ju = np.triu_indices(len(ia), k=1)
            ok = s[iu, ju] >= threshold
            a, b = ia[iu[ok]], ib[ju[ok]]
            sim = s[iu, ju][ok]
        else:
            iu, ju = np.nonzero(s >= threshold)
            a, b = ia[iu], ib[ju]
            sim = s[iu, ju]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return lo, hi, np.round(sim, 6)

    futs = []
    for i in range(len(block_refs)):
        for j in range(i, len(block_refs)):
            futs.append(cmp.remote(block_refs[i], block_refs[j], i == j))
    rows = []
    for lo, hi, sim in ray.get(futs):
        rows.extend({"id_a": int(a), "id_b": int(b), "sim": float(s)}
                    for a, b, s in zip(lo, hi, sim))
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "sim": pa.array([], type=pa.float64())})


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


def dup_clusters_distributed(pairs_ds, partitions: int = 64,
                             max_rounds: int = 50,
                             collect: bool = True) -> "pa.Table":
    """Distributed connected components over a near-dup pair Dataset:
    iterative MIN-label propagation (the at-scale alternative to the
    driver union-find — O(component diameter) rounds, each round one
    coarse-partitioned groupby; labels converge to the component's MIN
    id, the same deterministic keep-first root dup_clusters produces).

    Every round ships (node, candidate_label) rows keyed by
    hash(node) % P — label state never sits on the driver; only the
    per-round changed-count (one aggregate row) does. Returns
    (id, root) for every id appearing in a pair, sorted by id.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        # both directions so each node sees every neighbor's label
        return pa.table({"v": pa.array(np.concatenate([a, b]), type=pa.int64()),
                         "u": pa.array(np.concatenate([b, a]), type=pa.int64())})

    edges = (pairs_ds if hasattr(pairs_ds, "map_batches")
             else rd.from_arrow(pairs_ds)).map_batches(
        to_edges, batch_format="pyarrow").materialize()

    # initial label(v) = v, over the distinct nodes
    labels = edges.groupby("v").aggregate(Min("u", alias_name="nbr_min"))
    labels = labels.map_batches(
        lambda t: pa.table({
            "v": t.column("v").combine_chunks(),
            "label": pc.min_element_wise(t.column("v"), t.column("nbr_min"))}),
        batch_format="pyarrow").materialize()

    if max_rounds < 1:
        raise ValueError("max_rounds must be ≥ 1")
    # +1: certifying convergence needs one QUIET round after the last
    # change, so the certified diameter budget is exactly max_rounds
    for _ in range(max_rounds + 1):
        # propagate: edge (v,u) picks up label(u) → candidate for v.
        # Tagged rows use a `kind` column + ALL-NON-NULL int64 columns
        # (0 where unused): null-padded shared columns would round-trip
        # through pandas as float64 and silently corrupt ids above 2^53
        # (e.g. 64-bit hash-derived doc ids).
        def kpart(t: pa.Table) -> pa.Table:
            h = pd.util.hash_array(t.column("u").to_numpy(zero_copy_only=False))
            return t.append_column(
                "kp", pa.array((h % np.uint64(partitions)).astype(np.int32)))

        def _tag(kind: str, u: pa.Array, v: pa.Array | None,
                 label: pa.Array | None, n: int) -> pa.Table:
            zero = pa.array(np.zeros(n, dtype=np.int64))
            return kpart(pa.table({
                "kind": pa.array([kind] * n, type=pa.string()),
                "u": u, "v": v if v is not None else zero,
                "label": label if label is not None else zero}))

        tagged_edges = edges.map_batches(
            lambda t: _tag("e", t.column("u").combine_chunks(),
                           t.column("v").combine_chunks(), None, t.num_rows),
            batch_format="pyarrow")
        tagged_labels = labels.map_batches(
            lambda t: _tag("l", t.column("v").combine_chunks(), None,
                           t.column("label").combine_chunks(), t.num_rows),
            batch_format="pyarrow")

        def join_labels(g: pd.DataFrame) -> pa.Table:
            lab = g[g["kind"] == "l"]
            lmap = dict(zip(lab["u"].to_numpy(), lab["label"].to_numpy()))
            e = g[g["kind"] == "e"]
            if e.empty:
                return pa.table({"v": pa.array([], type=pa.int64()),
                                 "cand": pa.array([], type=pa.int64())})
            cand = e["u"].map(lmap)
            return pa.table({"v": pa.array(e["v"].to_numpy(dtype=np.int64)),
                             "cand": pa.array(cand.to_numpy(dtype=np.int64))})

        cands = (tagged_edges.union(tagged_labels)
                 .groupby("kp").map_groups(join_labels, batch_format="pandas"))

        # new label(v) = min(label(v), min over neighbor labels)
        self_rows = labels.map_batches(
            lambda t: pa.table({"v": t.column("v").combine_chunks(),
                                "cand": t.column("label").combine_chunks()}),
            batch_format="pyarrow")
        new_labels = (cands.union(self_rows).groupby("v")
                      .aggregate(Min("cand", alias_name="label"))).materialize()

        # changed-count via a tiny keyed join (old vs new), same pattern
        old_tag = labels.map_batches(
            lambda t: _tag("o", t.column("v").combine_chunks(), None,
                           t.column("label").combine_chunks(), t.num_rows),
            batch_format="pyarrow")
        new_tag = new_labels.map_batches(
            lambda t: _tag("n", t.column("v").combine_chunks(), None,
                           t.column("label").combine_chunks(), t.num_rows),
            batch_format="pyarrow")

        def count_changed(g: pd.DataFrame) -> pa.Table:
            old = g[g["kind"] == "o"]
            new = g[g["kind"] == "n"]
            omap = dict(zip(old["u"].to_numpy(), old["label"].to_numpy()))
            changed = int(sum(1 for u, l in zip(new["u"].to_numpy(),
                                                new["label"].to_numpy())
                              if omap.get(u) != l))
            return pa.table({"n": pa.array([changed], type=pa.int64())})

        changed = sum(r["n"] for r in collect_pylist(
            old_tag.union(new_tag).groupby("kp")
            .map_groups(count_changed, batch_format="pandas")))
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            f"({changed} labels still changing) — a component's diameter "
            "exceeds max_rounds; raise max_rounds (rounds are O(diameter))")

    if not collect:
        # the labels stay a Dataset — at 10¹²-row scale the (id, root)
        # table is corpus-dup-rate-sized and must never sit on the
        # driver (feeds partitioned_anti_join / keep-first filtering)
        return labels.map_batches(
            lambda t: pa.table({"id": t.column("v").combine_chunks(),
                                "root": t.column("label").combine_chunks()}),
            batch_format="pyarrow")
    out = sorted(collect_pylist(labels), key=lambda r: r["v"])
    return pa.table({"id": pa.array([r["v"] for r in out], type=pa.int64()),
                     "root": pa.array([r["label"] for r in out], type=pa.int64())})


def drop_keys_from_labels(labels_ds, id_col: str = "doc_id"):
    """(id, root) labels Dataset → Dataset of the ids to DROP
    (root ≠ id), renamed to `id_col` for partitioned_anti_join."""
    def drops(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        roots = t.column("root").to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[ids != roots], type=pa.int64())})

    return labels_ds.map_batches(drops, batch_format="pyarrow")


def dedup_keep_list_distributed(ds, pairs_ds, id_col: str = "doc_id",
                                partitions: int = 64):
    """Near-dup keep-first filter with NOTHING dup-rate-sized on the
    driver: distributed connected components label every paired id
    with its cluster's min id, the drop set (root ≠ id) stays a
    Dataset, and the corpus filters through a hash-partitioned
    anti-join. This is the 10¹²-row shape — web crawls commonly run
    30%+ near-dup, so the drop set scales with the corpus and the
    broadcast path (dedup_keep_list) stops fitting the driver."""
    from tanml_ray.pipelines.join import partitioned_anti_join

    labels = dup_clusters_distributed(pairs_ds, partitions=partitions,
                                      collect=False)
    return partitioned_anti_join(ds, drop_keys_from_labels(labels, id_col),
                                 id_col, partitions=partitions)


def dedup_keep_list(ds, pairs: pa.Table, id_col: str = "doc_id"):
    """Near-dup-aware keep filter: drop every id whose cluster root is
    not itself (keep-first-per-cluster). Returns the filtered Dataset —
    the drop set broadcasts; the data never shuffles. For drop sets
    past driver memory use dedup_keep_list_distributed."""
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


def exact_dedup_keep_best(ds, text_col: str = "text", id_col: str = "doc_id",
                          quality_col: str = "n_chars"):
    """Quality-aware exact dedup (RefinedWeb-style): within each exact
    content group keep the HIGHEST-quality document (max `quality_col`,
    ties broken by min id) instead of keep-first. Returns the kept
    (id, quality) rows sorted by id.

    Scale shape: keyed on a 16-byte blake2b content digest (chance
    collisions impossible at 10^12 docs; collision-resistant against
    adversarial input, unlike md5 — see curate._content_digest). Each
    batch pre-reduces to one candidate row per digest before the ONE
    shuffle, so the exchange moves (16 B digest, id, quality) per
    distinct-content-per-block — never text. The shuffle key is the
    COARSE hash(digest)%P partition (every digest's candidates land in
    one partition; in-partition resolution is one vectorized
    sort + drop_duplicates), never one map_groups call per distinct
    digest — at 10¹² mostly-unique docs that would be 10¹² tasks.
    Output is the kept set (streamed), nothing corpus-sized on the
    driver.

    Reference anchor: duplicate detection semantics of
    tanml/checks/data_quality/duplicates.py re-expressed as a
    destructive quality-keeping selector.
    """
    import hashlib

    from tanml_ray.stages.shuffle import with_coarse_partition

    def local_best(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        digs = [hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
                if t is not None else b"\x00" * 16 for t in texts]
        df = pd.DataFrame({
            "dig": digs,
            "id": batch.column(id_col).to_numpy(zero_copy_only=False),
            "q": batch.column(quality_col).to_numpy(zero_copy_only=False),
        })
        # best = max quality, tie min id: sort then take first per digest
        df = df.sort_values(["dig", "q", "id"],
                            ascending=[True, False, True])
        df = df.drop_duplicates("dig", keep="first")
        return from_pandas_clean(df, preserve_index=False)

    def best_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dig", "q", "id"],
                          ascending=[True, False, True])
        g = g.drop_duplicates("dig", keep="first")
        return pd.DataFrame({id_col: g["id"].to_numpy(dtype=np.int64),
                             quality_col: g["q"].to_numpy(dtype=np.int64)})

    return (with_coarse_partition(
        ds.map_batches(local_best, batch_format="pyarrow"), "dig")
        .groupby("__upart").map_groups(best_of_partition,
                                       batch_format="pandas")
        .sort(id_col))


def optimal_bands(threshold: float, num_perm: int = 64
                  ) -> tuple[int, int, float, float]:
    """Choose the LSH banding (bands b, rows-per-band r with b*r <=
    num_perm) that minimizes the summed false-positive + false-negative
    probability integrals around `threshold` (the standard datasketch /
    MMDS ch.3 tuning rule, re-derived here):

        fp = integral_0^t  1 - (1 - s^r)^b ds
        fn = integral_t^1  (1 - s^r)^b     ds

    Returns (bands, rows_per_band, fp, fn). Deterministic, driver-side
    only — call it once before minhash_lsh_pairs to pick `bands` for a
    target Jaccard threshold instead of hand-tuning.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    xs = np.linspace(0.0, 1.0, 1001)
    dx = xs[1] - xs[0]
    below = xs <= threshold
    best = None
    for r in range(1, num_perm + 1):
        b = num_perm // r
        if b < 1:
            break
        miss = (1.0 - xs ** r) ** b          # P(no band collides | s)
        fp = float(np.sum(1.0 - miss[below]) * dx)
        fn = float(np.sum(miss[~below]) * dx)
        if best is None or fp + fn < best[2] + best[3]:
            best = (b, r, fp, fn)
    return best


# ---------------------------------------------------------------------------
# Incremental exact dedup against a persisted digest index — the
# daily-crawl-increment pattern: yesterday's corpus is indexed ONCE as
# hash-bucket-partitioned parquet of 128-bit content digests; each new
# shard is then checked against it by reading ONLY the bucket
# partitions its own digests touch (path-level pruning, same storage
# trick as the LSH / IVF vector indexes in similarity.py). Membership
# resolution is a bucket-co-partitioned group join of int-only rows —
# no digest set ever sits on the driver, and the index scan cost is
# O(touched buckets), not O(index).
# ---------------------------------------------------------------------------

def _digest_cols(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Shared 128-bit digest contract — see functions/hashing.py."""
    from tanml_ray.functions.hashing import digest128_cols

    return digest128_cols(texts)


def build_digest_index(ds, out_dir: str, text_col: str = "text",
                       id_col: str = "doc_id", buckets: int = 256) -> str:
    """One streaming pass: digest every document and write
    `out_dir/bucket=<b>/…` hive-partitioned parquet of
    (h1, h2, doc_id) rows, bucket = h1 mod `buckets`. Self-describing
    (meta json beside the data) and append-safe: indexing tomorrow's
    shard into the same layout only adds files inside each bucket."""
    import json
    import os

    def digest_batch(batch: pa.Table) -> pa.Table:
        h1, h2 = _digest_cols(batch.column(text_col).to_pylist())
        return pa.table({
            "h1": pa.array(h1, type=pa.int64()),
            "h2": pa.array(h2, type=pa.int64()),
            id_col: batch.column(id_col),
            "bucket": pa.array(h1.view(np.uint64) % np.uint64(buckets))
            .cast(pa.int64())})

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_digest_meta.json")
    if os.path.exists(meta_path):
        # append into an existing index: the bucket function MUST match
        # or every previously indexed digest silently lands in the
        # wrong partition and dup checks miss it
        with open(meta_path) as f:
            prev = json.load(f)
        if int(prev["buckets"]) != buckets:
            raise ValueError(
                f"digest index at {out_dir} was built with "
                f"buckets={prev['buckets']}; appending with "
                f"buckets={buckets} would corrupt it")
    ds.map_batches(digest_batch, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    with open(meta_path, "w") as f:
        json.dump({"buckets": buckets, "text_col": text_col,
                   "id_col": id_col}, f)
    return out_dir


def dedup_against_index(new_ds, index_dir: str, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Mark each incoming document as duplicate-of-index or fresh.

    Returns a Dataset of (doc_id, is_dup). Only the index bucket
    partitions touched by the incoming shard's own digests are read;
    membership is resolved per bucket group with a sorted int128
    membership test (no driver-side digest set).
    """
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "_digest_meta.json")) as f:
        meta = json.load(f)
    buckets = int(meta["buckets"])
    idx_id = meta["id_col"]

    def digest_new(batch: pa.Table) -> pa.Table:
        h1, h2 = _digest_cols(batch.column(text_col).to_pylist())
        return pa.table({
            "h1": pa.array(h1, type=pa.int64()),
            "h2": pa.array(h2, type=pa.int64()),
            id_col: batch.column(id_col),
            "bucket": pa.array(h1.view(np.uint64) % np.uint64(buckets))
            .cast(pa.int64()),
            "__side": pa.array(["n"] * batch.num_rows, type=pa.string())})

    new_digs = new_ds.map_batches(digest_new,
                                  batch_format="pyarrow").materialize()

    # path-level pruning: list the touched buckets (a ≤`buckets`-sized
    # driver set by construction). Per-batch np.unique partials keep
    # the driver transfer O(buckets × blocks) tiny rows, never
    # O(shard) — matching this function's no-corpus-on-driver claim.
    def bucket_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("bucket").to_numpy(zero_copy_only=False))
        return pa.table({"bucket": pa.array(u, type=pa.int64())})

    touched = sorted({int(r["bucket"]) for r in collect_pylist(
        new_digs.map_batches(bucket_partial, batch_format="pyarrow"))})
    import glob as _glob

    paths = [p for b in touched
             for p in sorted(_glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    if not paths:
        return new_digs.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                "is_dup": pa.array(
                                    np.zeros(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow")

    def tag_index(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "h1": batch.column("h1"), "h2": batch.column("h2"),
            id_col: (batch.column(idx_id) if idx_id in batch.column_names
                     else pa.array(np.full(n, -1, dtype=np.int64))),
            "bucket": pa.array(
                batch.column("h1").to_numpy(zero_copy_only=False)
                .view(np.uint64) % np.uint64(buckets)).cast(pa.int64()),
            "__side": pa.array(["i"] * n, type=pa.string())})

    idx = read_parquet_clean(paths).map_batches(tag_index,
                                             batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        is_new = pc.equal(side, "n")
        new_part = g.filter(is_new)
        idx_part = g.filter(pc.invert(is_new))
        nh1 = new_part.column("h1").to_numpy(zero_copy_only=False)
        nh2 = new_part.column("h2").to_numpy(zero_copy_only=False)
        i1 = idx_part.column("h1").to_numpy(zero_copy_only=False)
        i2 = idx_part.column("h2").to_numpy(zero_copy_only=False)
        # vectorized h1 prefilter, then an exact (h1,h2) verify over the
        # candidate rows only — the Python set is bounded by the index
        # rows sharing an h1 with the incoming shard (≈ true-dup count
        # + 2^-64 chance noise), never by the bucket size.
        cand = np.isin(nh1, i1)
        dup = np.zeros(len(nh1), dtype=np.int64)
        if cand.any():
            sel = np.isin(i1, nh1[cand])
            pair_set = set(zip(i1[sel].tolist(), i2[sel].tolist()))
            idxs = np.nonzero(cand)[0]
            for j in idxs:
                if (int(nh1[j]), int(nh2[j])) in pair_set:
                    dup[j] = 1
        return pa.table({id_col: new_part.column(id_col),
                         "is_dup": pa.array(dup)})

    return new_digs.union(idx).groupby("bucket").map_groups(
        resolve, batch_format="pyarrow")
