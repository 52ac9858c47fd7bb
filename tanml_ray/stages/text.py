"""Text-analysis stages: quality scoring, language-ID heuristic,
token counting, document fingerprinting.

Reference analogs: md5 row-hash (/root/reference/tanml/ui/services/
data.py:80-87 — the fingerprint keeps its md5-of-normalized-string
semantics), profiling KPIs (profiling.py:22-43). The scoring features
(length / punctuation / stopword ratios) are the standard public
web-text quality heuristics (e.g. C4/Gopher-style rules).

All stages are stateless vectorized map_batches bodies; the lang-ID
profile table is tiny constant state compiled once per worker at
import (actor pools would be overkill here — no per-actor setup cost
beyond module import).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "mit"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "dans", "pour"},
}
_CJK_RE = re.compile(r"[一-鿿]")


def normalize_text(s: str) -> str:
    """lower + collapse whitespace + trim — the frozen normalization
    used by fingerprinting and leakage hashing."""
    return _WS_RE.sub(" ", s.lower()).strip()


def fingerprint_md5(s: str) -> str:
    """md5 hex of normalized text (reference data.py:80-87 semantics)."""
    return hashlib.md5(normalize_text(s).encode("utf-8")).hexdigest()


def quality_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Vectorized quality features per document."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())

    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    np_ = n_punct.to_numpy(zero_copy_only=False).astype(np.float64)
    na = n_alpha.to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        punct_ratio = np.where(nc > 0, np_ / nc, 0.0)
        alpha_ratio = np.where(nc > 0, na / nc, 0.0)
        mean_token_len = np.where(nt > 0, (nc - (nt - 1).clip(min=0)) / np.maximum(nt, 1), 0.0)

    # stopword ratio needs tokenization (python loop over the batch — the
    # per-row cost is the tokenizer, not arrow round-trips)
    texts = text.to_pylist()
    all_stop = set().union(*STOPWORDS.values())
    stop_ratio = np.zeros(len(texts))
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.lower().split()
        if toks:
            stop_ratio[i] = sum(1 for w in toks if w in all_stop) / len(toks)

    # composite score in [0,1]: long enough, not punctuation soup, has
    # some stopwords (Gopher-style heuristics, simplified + frozen)
    score = (np.clip(nt / 50.0, 0, 1) * 0.4
             + np.clip(1.0 - punct_ratio * 5, 0, 1) * 0.3
             + np.clip(stop_ratio * 4, 0, 1) * 0.3)

    return pa.table({
        id_col: batch.column(id_col),
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "punct_ratio": pa.array(np.round(punct_ratio, 6)),
        "alpha_ratio": pa.array(np.round(alpha_ratio, 6)),
        "stopword_ratio": pa.array(np.round(stop_ratio, 6)),
        "quality_score": pa.array(np.round(score, 6)),
    })


def langid_of(text: str) -> tuple[str, float]:
    """Deterministic n-gram/stopword language heuristic over
    {en, de, es, fr, zh}. Returns (lang, confidence)."""
    if not text:
        return "und", 0.0
    if _CJK_RE.search(text):
        cjk = len(_CJK_RE.findall(text))
        return "zh", min(1.0, cjk / max(len(text), 1) * 2)
    toks = [w.strip(".,;:!?\"'()") for w in text.lower().split()]
    toks = [w for w in toks if w]
    if not toks:
        return "und", 0.0
    scores = {lang: sum(1 for w in toks if w in sw) / len(toks)
              for lang, sw in STOPWORDS.items()}
    best = max(scores, key=lambda k: (scores[k], k))
    if scores[best] == 0.0:
        return "und", 0.0
    return best, round(min(1.0, scores[best] * 3), 6)


def langid_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    langs, confs = [], []
    for t in texts:
        l, c = langid_of(t)
        langs.append(l)
        confs.append(c)
    return pa.table({id_col: batch.column(id_col),
                     "pred_lang": pa.array(langs, type=pa.string()),
                     "confidence": pa.array(confs, type=pa.float64())})


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    fps = [fingerprint_md5(t) if t is not None else None for t in texts]
    return pa.table({id_col: batch.column(id_col),
                     "fingerprint": pa.array(fps, type=pa.string())})


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
# public algorithm): k-gram rolling hashes over normalized text, keep
# each sliding window's minimum hash. The fingerprint set is robust to
# local edits and position shifts — the rolling-hash document
# fingerprint the large-scale pipeline brief calls for, complementing
# the exact md5 fingerprint above.
# ---------------------------------------------------------------------------

_WINNOW_B = np.uint64(0x100000001B3)  # FNV prime as the rolling base


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Sorted unique winnowing fingerprints of `text`. Vectorized:
    the k-gram polynomial rolling hash is k shifted slice-multiplies
    over the code-point array; window minima via a strided view."""
    norm = normalize_text(text or "")
    if not norm:
        return np.empty(0, dtype=np.uint64)
    c = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if c.size < k:
        h = np.zeros(1, dtype=np.uint64)
        for x in c:
            h = h * _WINNOW_B + x
        return h
    n_grams = c.size - k + 1
    h = np.zeros(n_grams, dtype=np.uint64)
    for j in range(k):  # k tiny vector ops, no per-gram Python
        h = h * _WINNOW_B + c[j:j + n_grams]
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(h, window).min(axis=1))


def winnow_similarity(a: str, b: str, k: int = 8, window: int = 4) -> float:
    """Jaccard of two documents' winnowing fingerprint sets."""
    fa = winnow_fingerprints(a, k, window)
    fb = winnow_fingerprints(b, k, window)
    if fa.size == 0 and fb.size == 0:
        return 1.0
    inter = np.intersect1d(fa, fb, assume_unique=True).size
    union = fa.size + fb.size - inter
    return inter / union if union else 0.0


def winnow_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8,
                 window: int = 4) -> pa.Table:
    """Per-doc fingerprint blobs (uint64 LE bytes) + counts — the
    map_batches stage for fingerprint-based near-dup candidates."""
    texts = batch.column(text_col).to_pylist()
    blobs, counts = [], []
    for t in texts:
        fp = winnow_fingerprints(t, k, window) if t is not None \
            else np.empty(0, dtype=np.uint64)
        blobs.append(fp.tobytes())
        counts.append(fp.size)
    return pa.table({id_col: batch.column(id_col),
                     "fingerprints": pa.array(blobs, type=pa.binary()),
                     "n_fingerprints": pa.array(counts, type=pa.int64())})


_TFIDF_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    top_k: int = 3,
                    df_driver_budget: int = 256 << 20) -> "pa.Table":
    """Distributed TF-IDF with per-doc top-k terms — the classic text
    featurization a quality-classifier pipeline needs. Two streaming
    passes:

      1. document frequencies: per-batch partial df (distinct docs per
         term within the batch) pre-aggregates before ONE groupby(term)
         — the only shuffle, moving (term, partial_df) rows, never
         tokens per occurrence.
      2. per-doc tf·idf: the df table broadcasts via ray.put (VOCAB-
         bounded — a web-scale vocabulary at ~10⁷ distinct terms × 16 B
         is well under the budget; the guard raises past
         `df_driver_budget` rather than silently degrading) and each
         batch scores its docs locally, keeping only top_k terms per
         doc (score desc, term asc — deterministic).

    idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn's formula); tf is the
    raw in-doc count, so every number is integer-derived and the SQL
    oracle (queries.TFIDF_SQL) reproduces it bit-for-bit. Returns
    (doc_id, rank, term, tfidf) sorted by (doc_id, rank)."""
    import ray
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    N = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(text_col).to_pylist()
        c: Counter = Counter()
        for t in texts:
            if t:
                c.update(set(_TFIDF_TOKEN_RE.findall(t.lower())))
        return pa.table({"term": pa.array(list(c.keys()), type=pa.string()),
                         "df": pa.array(list(c.values()), type=pa.int64())})

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("df", alias_name="df"))
             .materialize())
    if df_ds.size_bytes() > df_driver_budget:
        raise ValueError(
            f"vocabulary table {df_ds.size_bytes()} B exceeds "
            f"df_driver_budget={df_driver_budget}; raise the budget or "
            "pre-filter the vocabulary (min_df)")
    df_map: dict[str, int] = {}
    for r in collect_pylist(df_ds):
        df_map[r["term"]] = r["df"]
    ref = ray.put(df_map)

    def topk(batch: pa.Table) -> pa.Table:
        from collections import Counter

        import ray as _ray

        dfm = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out = {"doc_id": [], "rank": [], "term": [], "tfidf": []}
        for i, t in enumerate(texts):
            if not t:
                continue
            tf = Counter(_TFIDF_TOKEN_RE.findall(t.lower()))
            scored = sorted(
                ((-cnt * (np.log((N + 1.0) / (dfm[w] + 1.0)) + 1.0), w)
                 for w, cnt in tf.items()))
            for rank, (neg_s, w) in enumerate(scored[:top_k], 1):
                out["doc_id"].append(int(ids[i]))
                out["rank"].append(rank)
                out["term"].append(w)
                out["tfidf"].append(round(-neg_s, 6))
        return pa.table({"doc_id": pa.array(out["doc_id"], type=pa.int64()),
                         "rank": pa.array(out["rank"], type=pa.int64()),
                         "term": pa.array(out["term"], type=pa.string()),
                         "tfidf": pa.array(out["tfidf"], type=pa.float64())})

    rows = sorted(collect_pylist(ds.map_batches(topk, batch_format="pyarrow")),
                  key=lambda r: (r["doc_id"], r["rank"]))
    return pa.Table.from_pylist(rows)
