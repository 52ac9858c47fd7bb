"""Web-text curation operators beyond the reference's surface: Gopher
rule-based quality signals, within-document duplicate-n-gram repetition
stats, corpus-level hot-n-gram (boilerplate) coverage, and deterministic
weighted sampling.

These are the standard published LLM-corpus filters (Gopher, Rae et al.
2021 §A1.1; CCNet/RefinedWeb boilerplate removal re-expressed over word
n-grams because the synthetic corpus has no line structure; Efraimidis &
Spirakis 2006 weighted sampling). The reference has no web-text layer at
all — this module extends its quality/profiling semantics
(reference tanml/ui/services/profiling.py:22-43) to corpus curation.

Scale notes:
- Gopher signals are pure vectorized Arrow regex kernels (RE2) — zero
  Python in the hot loop, identical regex engine to the DuckDB oracle.
- n-gram stages tokenize per doc in Python (same measured trade-off as
  the MinHash shingler: vectorizing the tokenizer was a 0.9x negative
  result) but shuffle only (hash, partial_count) int rows, never text.
- The hot-gram set is OUTPUT-BOUNDED by construction: a gram in >=
  `min_df_frac` of N docs implies |hot| <= total_grams / (min_df_frac*N)
  ~ grams_per_doc / min_df_frac, independent of corpus size — safe to
  broadcast via ray.put at any N.
- Weighted sampling keys every row with an Efraimidis-Spirakis
  exponential arrival time from a 53-bit md5-derived uniform
  (bit-reproducible in SQL via md5_number_lower), then keeps k per
  group with a per-batch local top-k combiner before the single small
  groupby — the shuffle moves at most k rows per (block, group).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Frozen Gopher-style thresholds (Rae et al. 2021, Table A1 — public).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_MIN_STOP_HITS = 2

_STOP_RE = r"\b(the|and|of|to|in|is|that|for|was|on)\b"


def gopher_signals_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Vectorized Gopher rule signals per document. All four counters
    are RE2 kernels over the Arrow string column (same engine DuckDB
    uses, so the oracle reproduces them bit-for-bit); the derived
    ratios and the pass flag use one IEEE double op sequence shared
    with the SQL. Null text counts as empty (0 words → fails the
    min-words rule) so mixed-null batches don't poison the int casts."""
    text = pc.fill_null(batch.column(text_col), "")
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_wordchars = pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_alpha_words = pc.cast(
        pc.count_substring_regex(text, r"\S*[A-Za-z]\S*"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    stop_hits = pc.cast(pc.count_substring_regex(text, _STOP_RE), pa.int64()) \
        .to_numpy(zero_copy_only=False)

    nw = np.maximum(n_words, 1).astype(np.float64)
    mean_word_len = n_wordchars / nw
    alpha_frac = n_alpha_words / nw
    gopher_pass = ((n_words >= GOPHER_MIN_WORDS)
                   & (n_words <= GOPHER_MAX_WORDS)
                   & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
                   & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
                   & (alpha_frac > GOPHER_MIN_ALPHA_WORD_FRAC)
                   & (stop_hits >= GOPHER_MIN_STOP_HITS))
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(n_words, type=pa.int64()),
        "mean_word_len": pa.array(np.round(mean_word_len, 6)),
        "alpha_word_frac": pa.array(np.round(alpha_frac, 6)),
        "stop_hits": pa.array(stop_hits, type=pa.int64()),
        "gopher_pass": pa.array(gopher_pass.astype(np.int64)),
    })


def _word_ngrams(text: str, n: int) -> list[str]:
    """Space-joined word n-grams — textual identity matches the SQL
    oracle's ws[i] || ' ' || ws[i+1] ... construction exactly."""
    if not text:
        return []
    ws = text.split()
    if len(ws) < n:
        return []
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def dup_ngram_stats_batch(batch: pa.Table, n: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Within-document duplicate n-gram fraction (the Gopher repetition
    signal): of a doc's n-gram positions, the fraction occupied by a
    gram that occurs more than once in that same doc. Docs with fewer
    than n words emit no row (the SQL oracle's GROUP BY over generated
    trigrams has no row for them either)."""
    from collections import Counter

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    out_id, out_n, out_dup, out_frac = [], [], [], []
    for i, t in enumerate(texts):
        grams = _word_ngrams(t, n)
        if not grams:
            continue
        c = Counter(grams)
        total = len(grams)
        dup = sum(v for v in c.values() if v > 1)
        out_id.append(int(ids[i]))
        out_n.append(total)
        out_dup.append(dup)
        out_frac.append(round(dup / total, 6))
    return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                     "n_grams": pa.array(out_n, type=pa.int64()),
                     "dup_grams": pa.array(out_dup, type=pa.int64()),
                     "dup_frac": pa.array(out_frac, type=pa.float64())})


def _gram_hash64(grams: list[str]) -> np.ndarray:
    """Signed-int64 blake2b(8B) hashes of gram strings. 64-bit chance
    collisions are negligible (< 1e-9 below ~10^5 distinct grams per
    partition pair) and only perturb boilerplate COUNTS, never document
    identity; blake2b (not md5) so adversarial web text can't forge a
    hot gram."""
    h = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h[i] = int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
            "little")
    return h.view(np.int64)


def hot_ngram_coverage(ds, n: int = 3, min_df_frac: float = 0.05,
                       text_col: str = "text", id_col: str = "doc_id",
                       as_dataset: bool = False):
    """Corpus-level boilerplate detector over word n-grams (the CCNet /
    RefinedWeb repeated-content filter, line-free variant): a gram is
    HOT when it appears in >= min_df_frac of all documents; each doc
    reports how much of it is covered by hot grams.

    Two streaming passes:
      1. document frequency: per-batch distinct (doc, gram-hash) ->
         batch-local partial df, ONE groupby(hash) Sum — the only
         shuffle, moving (int64, int64) rows.
      2. hot set (output-bounded, see module docstring) broadcasts via
         ray.put; each batch recomputes its grams and counts hot
         positions with a vectorized np.isin.
    """
    import ray
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    n_docs = ds.count()
    min_df = max(2, int(np.ceil(min_df_frac * n_docs)))

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(text_col).to_pylist()
        c: Counter = Counter()
        for t in texts:
            grams = _word_ngrams(t, n)
            if grams:
                c.update(np.unique(_gram_hash64(grams)).tolist())
        return pa.table({"gh": pa.array(list(c.keys()), type=pa.int64()),
                         "df": pa.array(list(c.values()), type=pa.int64())})

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("gh").aggregate(Sum("df", alias_name="df")))
    hot_rows = collect_pylist(
        df_ds.filter(expr=f"df >= {min_df}").select_columns(["gh"]))
    hot = np.sort(np.array([r["gh"] for r in hot_rows], dtype=np.int64))
    hot_ref = ray.put(hot)

    def coverage(batch: pa.Table) -> pa.Table:
        import ray as _ray

        hot_arr = _ray.get(hot_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_id, out_n, out_hot, out_cov = [], [], [], []
        for i, t in enumerate(texts):
            grams = _word_ngrams(t, n)
            if not grams:
                continue
            gh = _gram_hash64(grams)
            hits = int(np.isin(gh, hot_arr, assume_unique=False).sum())
            out_id.append(int(ids[i]))
            out_n.append(len(grams))
            out_hot.append(hits)
            out_cov.append(round(hits / len(grams), 6))
        return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                         "n_grams": pa.array(out_n, type=pa.int64()),
                         "hot_grams": pa.array(out_hot, type=pa.int64()),
                         "hot_frac": pa.array(out_cov, type=pa.float64())})

    out = ds.map_batches(coverage, batch_format="pyarrow")
    if as_dataset:
        return out
    rows = sorted(collect_pylist(out), key=lambda r: r[id_col])
    return pa.Table.from_pylist(rows)


def ngram_contamination(corpus_ds, benchmark_ds, n: int = 5,
                        text_col: str = "text", id_col: str = "doc_id",
                        as_dataset: bool = False):
    """Benchmark decontamination check (the GPT-3/PaLM n-gram overlap
    rule): for every corpus document, count its n-gram positions that
    also occur anywhere in the benchmark set; `contaminated` = at least
    one overlapping n-gram (the published single-collision criterion).

    Scale shape: the benchmark side is small BY DEFINITION (eval sets
    are ~10^3-10^6 docs), so its distinct gram-hash set is built with
    one streaming distinct pass and broadcast via ray.put; the corpus —
    the 100-TB side — streams through one map_batches with a vectorized
    np.isin per doc and never shuffles at all."""
    import ray

    from tanml_ray.functions.collect import collect_pylist

    def bench_grams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs: set[int] = set()
        for t in texts:
            grams = _word_ngrams(t, n)
            if grams:
                hs.update(_gram_hash64(grams).tolist())
        return pa.table({"gh": pa.array(sorted(hs), type=pa.int64())})

    gh_rows = collect_pylist(
        benchmark_ds.map_batches(bench_grams, batch_format="pyarrow")
        .groupby("gh").count().select_columns(["gh"]))
    bench = np.sort(np.array([r["gh"] for r in gh_rows], dtype=np.int64))
    bench_ref = ray.put(bench)

    def check(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bset = _ray.get(bench_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_id, out_n, out_hit, out_flag = [], [], [], []
        for i, t in enumerate(texts):
            grams = _word_ngrams(t, n)
            if not grams:
                continue
            gh = _gram_hash64(grams)
            hits = int(np.isin(gh, bset).sum())
            out_id.append(int(ids[i]))
            out_n.append(len(grams))
            out_hit.append(hits)
            out_flag.append(1 if hits > 0 else 0)
        return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                         "n_grams": pa.array(out_n, type=pa.int64()),
                         "hit_grams": pa.array(out_hit, type=pa.int64()),
                         "contaminated": pa.array(out_flag, type=pa.int64())})

    out = corpus_ds.map_batches(check, batch_format="pyarrow")
    if as_dataset:
        return out
    rows = sorted(collect_pylist(out), key=lambda r: r[id_col])
    return pa.Table.from_pylist(rows)


def decontaminate(corpus_ds, benchmark_ds, n: int = 5,
                  text_col: str = "text"):
    """Streaming decontamination FILTER: drop every corpus doc sharing
    at least one word n-gram with the benchmark set (same rule as
    ngram_contamination, fused into a single keep-filter pass so the
    curation chain never materializes the flag table). Docs too short
    to have an n-gram are kept — they cannot leak an n-gram."""
    import ray

    from tanml_ray.functions.collect import collect_pylist

    def bench_grams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs: set[int] = set()
        for t in texts:
            grams = _word_ngrams(t, n)
            if grams:
                hs.update(_gram_hash64(grams).tolist())
        return pa.table({"gh": pa.array(sorted(hs), type=pa.int64())})

    gh_rows = collect_pylist(
        benchmark_ds.map_batches(bench_grams, batch_format="pyarrow")
        .groupby("gh").count().select_columns(["gh"]))
    bench = np.sort(np.array([r["gh"] for r in gh_rows], dtype=np.int64))
    bench_ref = ray.put(bench)

    def keep_clean(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bset = _ray.get(bench_ref)
        texts = batch.column(text_col).to_pylist()
        keep = np.ones(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            grams = _word_ngrams(t, n)
            if grams and bool(np.isin(_gram_hash64(grams), bset).any()):
                keep[i] = False
        return batch.filter(pa.array(keep))

    return corpus_ds.map_batches(keep_clean, batch_format="pyarrow")


# 2^53 — the uniform's mantissa grid; +0.5 keeps u strictly inside (0,1).
_U53 = 9007199254740992.0


def _md5_uniform(ids: np.ndarray) -> np.ndarray:
    """53-bit uniform in (0,1) from md5 of the decimal id string —
    bit-identical to DuckDB's
    ((md5_number_lower(CAST(id AS VARCHAR)) >> 11) + 0.5) / 2^53
    (md5_number_lower = little-endian bytes 8..16 of the digest)."""
    u = np.empty(len(ids), dtype=np.float64)
    for i, x in enumerate(ids):
        lo = int.from_bytes(
            hashlib.md5(str(int(x)).encode("ascii")).digest()[8:16], "little")
        u[i] = ((lo >> 11) + 0.5) / _U53
    return u


def weighted_sample_per_group(ds, k: int = 3, weight_col: str = "n_chars",
                              group_col: str = "lang",
                              id_col: str = "doc_id") -> pa.Table:
    """Deterministic weighted sample WITHOUT replacement, k per group:
    Efraimidis-Spirakis exponential arrival times key = -ln(u)/w with a
    seed-free md5 uniform, keep the k SMALLEST keys per group. The
    per-batch combiner keeps only k rows per (block, group), so the
    final groupby shuffles at most k rows per block per group — the
    corpus itself never moves."""
    import pandas as pd

    from tanml_ray.functions.collect import collect_pylist

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        g = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        key = -np.log(_md5_uniform(ids)) / w
        keep = np.zeros(len(ids), dtype=bool)
        for grp in np.unique(g):
            m = np.flatnonzero(g == grp)
            if len(m) > k:
                m = m[np.lexsort((ids[m], key[m]))[:k]]
            keep[m] = True
        return pa.table({group_col: pa.array(g[keep].tolist(), type=pa.string()),
                         id_col: pa.array(ids[keep], type=pa.int64()),
                         weight_col: pa.array(
                             batch.column(weight_col).to_numpy(
                                 zero_copy_only=False)[keep], type=pa.int64()),
                         "skey": pa.array(key[keep], type=pa.float64())})

    def merge_group(gdf: pd.DataFrame) -> pd.DataFrame:
        gdf = gdf.sort_values(["skey", id_col]).head(k).reset_index(drop=True)
        return pd.DataFrame({
            group_col: gdf[group_col],
            "rank": np.arange(1, len(gdf) + 1, dtype=np.int64),
            id_col: gdf[id_col].to_numpy(dtype=np.int64),
            weight_col: gdf[weight_col].to_numpy(dtype=np.int64),
            "priority": np.round(gdf["skey"].to_numpy(dtype=np.float64), 6),
        })

    out = (ds.map_batches(local_topk, batch_format="pyarrow")
           .groupby(group_col).map_groups(merge_group, batch_format="pandas"))
    rows = sorted(collect_pylist(out), key=lambda r: (r[group_col], r["rank"]))
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# Per-domain corpus composition (C4/RefinedWeb-style domain accounting):
# extract the registered host from each url, aggregate page counts per
# domain with a per-batch partial-count combiner, and flag domains whose
# corpus share exceeds a cap (over-represented boilerplate farms).
# ---------------------------------------------------------------------------

_HOST_RE = r"^https?://(?P<host>[^/]+)"


def extract_domain_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized host extraction (RE2) with a leading-``www.`` strip;
    appends a ``domain`` string column."""
    host = pc.struct_field(
        pc.extract_regex(batch.column(url_col), _HOST_RE), "host")
    host = pc.replace_substring_regex(host, r"^www\.", "")
    return batch.append_column("domain", host)


def domain_stats(ds, url_col: str = "url", share_cap: float = 0.01):
    """Dataset → one row per domain: (domain, n_pages, share, over_cap),
    sorted by domain. Returned as a DATASET — real crawls have 10⁷–10⁸
    distinct domains, so the result never lands on the driver.

    Scale shape: the shuffle moves only (domain, partial_count) rows —
    one per distinct domain per block, never urls. ``share`` needs the
    corpus total: one Sum over the (already materialized,
    domain-bounded) aggregate — a scalar, the only thing the driver
    sees — then a map_batches with the broadcast total and a
    distributed sort.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = extract_domain_batch(batch, url_col)
        t = pa.table({"domain": d.column("domain"),
                      "n": np.ones(d.num_rows, dtype=np.int64)})
        g = pa.TableGroupBy(t, "domain").aggregate([("n", "sum")])
        return pa.table({"domain": g.column("domain"),
                         "n_pages": g.column("n_sum")})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("domain").aggregate(Sum("n_pages", alias_name="n_pages"))
           .materialize())
    total = agg.sum("n_pages") or 0

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_pages").to_numpy(zero_copy_only=False)
        share = n / total if total else np.zeros(len(n), dtype=np.float64)
        return pa.table({"domain": batch.column("domain"),
                         "n_pages": batch.column("n_pages"),
                         "share": pa.array(np.round(share, 6),
                                           type=pa.float64()),
                         "over_cap": pa.array(share > share_cap)})

    return agg.map_batches(finish, batch_format="pyarrow").sort("domain")


# ---------------------------------------------------------------------------
# CCNet-style unigram language-model quality scoring: train token
# frequencies on the corpus itself (one combiner-first shuffle), then
# score every document's add-one-smoothed negative log-likelihood and
# perplexity. CCNet (Wenzek et al. 2020) buckets documents by LM
# perplexity into head/middle/tail; the KenLM model is replaced by a
# corpus-trained unigram LM so the whole operator is library-free and
# SQL-oracle-exact.
# ---------------------------------------------------------------------------

_WS_TOKEN_RE = re.compile(r"\S+", re.ASCII)


def unigram_lm_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                      counts_ds=None, min_count: int = 1,
                      lm_driver_budget: int = 256 << 20):
    """Two streaming passes over the corpus:

      1. **train** — per-batch token Counters pre-aggregate before ONE
         ``groupby(word)`` shuffle moving (word, partial_count) rows;
         the resulting count table is VOCAB-bounded and broadcasts via
         ``ray.put`` (the guard raises past ``lm_driver_budget`` rather
         than silently degrading — a web-scale vocabulary at ~10^7
         types x ~24 B is well inside the budget).
      2. **score** — each batch tokenizes its docs and sums precomputed
         per-word log-probs; shuffle-free.

    p(w) = (c(w)+1) / (T+V) with T = corpus token count (INCLUDING
    occurrences of pruned words), V = kept vocabulary size (add-one
    smoothing); words outside the kept vocabulary — pruned by
    ``min_count``, or unseen when scoring with an external
    ``counts_ds`` — get 1/(T+V). ``min_count`` is the scale knob that
    keeps the broadcast bounded on an unbounded web vocabulary: rare
    types collapse into the OOV mass instead of inflating the LM table
    (CCNet's fixed-model equivalent). nll is the per-token
    mean of -ln p(w); ppl = exp(nll). Tokenization is ASCII ``\\S+`` —
    the same RE2 semantics DuckDB's ``regexp_split_to_array(text,
    '\\s+')`` uses, so the oracle reproduces every number (round(6)
    swallows float sum-order noise).

    Returns (doc_id, n_tokens, nll, ppl) for docs with >= 1 token,
    sorted by doc_id. Reference anchor: extends the quality-signal
    surface of tanml/ui/services/profiling.py:22-43 to corpus-level LM
    scoring (no reference analog — published CCNet semantics).
    """
    import ray
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if t:
                c.update(_WS_TOKEN_RE.findall(t))
        return pa.table({"word": pa.array(list(c.keys()), type=pa.string()),
                         "c": pa.array(list(c.values()), type=pa.int64())})

    src = counts_ds if counts_ds is not None else ds
    counts = (src.map_batches(count_partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("c", alias_name="c"))
              .materialize())
    # T sums over the FULL count table (pruned occurrences included)
    # without collecting it; only the kept vocabulary reaches the driver.
    T = float(counts.sum("c"))
    if min_count > 1:
        mc = int(min_count)
        counts = counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("c"), mc)),
            batch_format="pyarrow").materialize()
    if counts.size_bytes() > lm_driver_budget:
        raise ValueError(
            f"unigram LM table {counts.size_bytes()} B exceeds "
            f"lm_driver_budget={lm_driver_budget}; raise the budget or "
            "prune the vocabulary harder (min_count)")
    rows = collect_pylist(counts)
    V = len(rows)
    denom = T + V
    logp = {r["word"]: float(np.log((r["c"] + 1.0) / denom)) for r in rows}
    oov = float(np.log(1.0 / denom))
    ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        lp = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "n_tokens": [], "nll": [], "ppl": []}
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = _WS_TOKEN_RE.findall(t) if t else []
            if not toks:
                continue
            s = 0.0
            for w in toks:
                s += lp.get(w, oov)
            nll = -s / len(toks)
            out["doc_id"].append(int(ids[i]))
            out["n_tokens"].append(len(toks))
            out["nll"].append(round(nll, 6))
            out["ppl"].append(round(float(np.exp(nll)), 6))
        return pa.table({"doc_id": pa.array(out["doc_id"], type=pa.int64()),
                         "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
                         "nll": pa.array(out["nll"], type=pa.float64()),
                         "ppl": pa.array(out["ppl"], type=pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# URL canonicalization — the first step of every web-corpus exact-dedup
# chain (C4/CCNet dedupe on canonical URL before content hashing). One
# fully vectorized RE2 rewrite chain per batch; the DuckDB oracle runs
# the identical regex sequence, so every output byte is reproducible.
# Rules (applied in order):
#   1. scheme and host:port lowercase (path/query stay case-sensitive)
#   2. default port stripped (:80 for http, :443 for https)
#   3. fragment (#...) stripped
#   4. utm_* tracking params removed; a dangling leading '&' is
#      promoted to '?', a dangling trailing '?' dropped
#   5. one trailing slash stripped when there is no query string
#      (root '/' collapses to the bare authority)
# ---------------------------------------------------------------------------

_SCHEME_RE = r"^(?P<s>[A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?#]+)"


def canonicalize_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Appends a ``canon_url`` column. Zero Python per row — every
    step is an Arrow RE2 kernel (the same engine as the SQL oracle)."""
    url = batch.column(url_col)
    scheme = pc.utf8_lower(pc.struct_field(
        pc.extract_regex(url, _SCHEME_RE), "s"))
    hostport = pc.utf8_lower(pc.struct_field(
        pc.extract_regex(url, _HOSTPORT_RE), "h"))
    rest = pc.replace_substring_regex(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(hostport, r":80$", ""),
        pc.if_else(pc.equal(scheme, "https"),
                   pc.replace_substring_regex(hostport, r":443$", ""),
                   hostport))
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    rest = pc.replace_substring_regex(rest, r"[?&]utm_[^&]*", "")
    rest = pc.replace_substring_regex(rest, r"^([^?]*)&", r"\1?",
                                      max_replacements=1)
    rest = pc.replace_substring_regex(rest, r"\?$", "")
    rest = pc.replace_substring_regex(rest, r"^([^?]*[^/?])/$", r"\1")
    rest = pc.replace_substring_regex(rest, r"^/$", "")
    canon = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    return batch.append_column("canon_url", canon)


# ---------------------------------------------------------------------------
# Token-budget accounting: how many context-length training sequences a
# corpus yields per language, and how much padding a naive
# one-doc-per-sequence layout would waste. All-integer arithmetic
# (exact SQL oracle); the per-batch pass is a pure vectorized Arrow
# kernel — zero Python per row — and the one shuffle moves a handful of
# (lang, partial_sums) rows per block.
# ---------------------------------------------------------------------------

def token_budget_stats(ds, ctx: int = 512, text_col: str = "text",
                       group_col: str = "lang") -> pa.Table:
    """Per group: (n_docs, total_tokens, packed_sequences = ceil of the
    concatenated-token count / ctx, naive_pad_waste = Σ per-doc
    ceil-padding minus total). Tokens are ASCII ``\\S+`` runs, the same
    RE2 count DuckDB's regexp_extract_all reproduces."""
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(
            pc.count_substring_regex(batch.column(text_col), r"\S+"),
            pa.int64()), 0)
        ceil_slots = pc.divide(pc.add(n, ctx - 1), ctx)  # int64 floor-div
        t = pa.table({group_col: batch.column(group_col),
                      "n_docs": np.ones(batch.num_rows, dtype=np.int64),
                      "total_tokens": n,
                      "sum_ceil": ceil_slots})
        g = pa.TableGroupBy(t, group_col).aggregate(
            [("n_docs", "sum"), ("total_tokens", "sum"), ("sum_ceil", "sum")])
        return g.rename_columns([group_col, "n_docs", "total_tokens",
                                 "sum_ceil"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("total_tokens", alias_name="total_tokens"),
                      Sum("sum_ceil", alias_name="sum_ceil")))
    out = []
    for r in sorted(collect_pylist(agg), key=lambda r: r[group_col]):
        total = int(r["total_tokens"])
        out.append({group_col: r[group_col],
                    "n_docs": int(r["n_docs"]),
                    "total_tokens": total,
                    "packed_sequences": (total + ctx - 1) // ctx,
                    "naive_pad_waste": int(r["sum_ceil"]) * ctx - total})
    return pa.Table.from_pylist(out)


# ---------------------------------------------------------------------------
# Leakage-safe grouped split: the whole group (domain/source) lands in
# ONE split — the standard guard against near-duplicate train/test
# leakage within a site. Split choice is an md5 hash of the group KEY
# (deterministic, partition-independent, retry-safe), bit-reproducible
# in SQL via md5_number_lower.
# ---------------------------------------------------------------------------

def grouped_split_stats(ds, group_col: str = "source",
                        train_buckets: int = 8,
                        total_buckets: int = 10) -> pa.Table:
    """Per split: (n_groups, n_docs). The input reduces per batch to
    (group, partial_count) rows before the ONE groupby(group) shuffle;
    the md5 split decision runs once per distinct group."""
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      "n": np.ones(batch.num_rows, dtype=np.int64)})
        g = pa.TableGroupBy(t, group_col).aggregate([("n", "sum")])
        return g.rename_columns([group_col, "n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).aggregate(Sum("n", alias_name="n")))
    tot: dict[str, list[int]] = {}
    for r in collect_pylist(agg):
        key = str(r[group_col])
        lo = int.from_bytes(hashlib.md5(key.encode()).digest()[8:16],
                            "little")
        split = "train" if lo % total_buckets < train_buckets else "test"
        acc = tot.setdefault(split, [0, 0])
        acc[0] += 1
        acc[1] += int(r["n"])
    return pa.Table.from_pylist(
        [{"split": s, "n_groups": v[0], "n_docs": v[1]}
         for s, v in sorted(tot.items())])

# ---------------------------------------------------------------------------
# C4/RefinedWeb-style global span-level dedup: split every document into
# fixed-width word spans (pseudo-sentences — the synthetic corpus has no
# line/sentence structure), keep only the FIRST occurrence of each span
# corpus-wide (ordered by (doc_id, span_idx)), and reconstruct each
# document from its surviving spans. This is the "discard repeated
# three-sentence spans" rule of C4 (Raffel et al. 2020 §2.2) re-expressed
# over word windows. The reference has no corpus-level text layer at all.
#
# Scale shape (the 10^12-doc story):
# - Winner election ships ONLY (h1,h2,packed) int64 triples — never span
#   text — through one groupby shuffle, with a per-batch local combiner
#   (min packed + count per digest) so the shuffle moves one row per
#   distinct span per block, not one per occurrence.
# - Only digests with count > 1 (true duplicates) leave the aggregate.
# - The dup-winner map broadcasts via ray.put ONLY under
#   `driver_budget`; past it, drop marking runs as a hash-partitioned
#   join of int-only rows (nothing corpus-sized on the driver).
# - The dropped (doc_id, span_idx) set is bounded by the duplicated-span
#   count; reconstruction likewise switches between a broadcast drop map
#   and a hash-partitioned doc⋈drops group join (text moves once).
# - Span identity is a 128-bit blake2b digest (split into two int64
#   grouping keys): chance AND adversarial collisions are impossible,
#   so no span is ever wrongly deleted (same rationale as curate.py's
#   exact-dedup digest).
# ---------------------------------------------------------------------------

_SPAN_PACK = 1 << 20  # span_idx capacity per doc (2^20 spans ≈ 10M words)


def _span_digests(spans: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Shared 128-bit digest contract — see functions/hashing.py."""
    from tanml_ray.functions.hashing import digest128_cols

    return digest128_cols(spans)


def _doc_spans(text: str, span_words: int) -> list[str]:
    """Non-overlapping `span_words`-word windows (last may be shorter).
    Tokens are ASCII ``\\S+`` runs (NOT str.split(): Python's Unicode
    whitespace — e.g. \\u00a0 — would split where RE2 does not),
    textually identical to the SQL oracle's string_agg over
    regexp_extract_all(text, '\\S+')."""
    ws = _WS_TOKEN_RE.findall(text) if text else []
    return [" ".join(ws[i:i + span_words])
            for i in range(0, len(ws), span_words)]


def span_dedup(ds, span_words: int = 10, text_col: str = "text",
               id_col: str = "doc_id", driver_budget: int = 256 << 20,
               partitions: int = 64, unit_fn=None,
               join_str: str = " ", dedupable_fn=None) -> pa.Table:
    """Global keep-first span dedup + document reconstruction.

    Returns one row per non-empty document, sorted by id:
    (doc_id, n_spans, n_kept, dedup_text) where dedup_text is the
    `join_str`-joined concatenation of the surviving spans in order.
    `driver_budget=0` forces both distributed paths (pytest hook).

    `unit_fn` generalizes the dedup unit: a doc→list[str] splitter
    replacing the default `span_words`-word windows. line_dedup()
    passes a newline splitter to get CCNet-style corpus-wide
    duplicate-LINE removal from the identical winner-election /
    drop-marking / rebuild machinery.

    `dedupable_fn` (unit→bool, default all-dedupable) excludes units
    from winner election entirely: a non-dedupable unit is never
    digested, never dropped, always rebuilt in place, and counts as
    trivially kept. line_dedup() uses it to keep blank lines —
    paragraph separators — out of the dedup key space (CCNet line
    dedup operates on non-empty lines; without this, every blank line
    after the corpus-wide first would be removed, silently collapsing
    paragraph structure).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from tanml_ray.functions.collect import collect_pylist

    units_of = (unit_fn if unit_fn is not None
                else (lambda t: _doc_spans(t, span_words)))

    def _elect_units(spans: list[str]):
        """(sub-list of dedupable units, their original indices)."""
        if dedupable_fn is None:
            return spans, np.arange(len(spans), dtype=np.int64)
        idx = [j for j, s in enumerate(spans) if dedupable_fn(s)]
        return [spans[j] for j in idx], np.asarray(idx, dtype=np.int64)

    # keep docs with >= 1 ASCII token — the same RE2 criterion the SQL
    # oracle's len(regexp_extract_all(text, '\S+')) >= 1 filter applies
    # (an Arrow trim-based filter would disagree on tab-only and
    # non-breaking-space documents)
    docs = ds.map_batches(
        lambda t: t.filter(pc.greater(
            pc.count_substring_regex(
                pc.fill_null(t.column(text_col), ""), r"\S+"), 0)),
        batch_format="pyarrow")

    def explode_ints(batch: pa.Table) -> pa.Table:
        """(h1, h2, packed=doc_id*2^20+span_idx, n=1) per span occurrence,
        locally combined to one min-packed row per distinct digest."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        a1, a2, ap = [], [], []
        for did, t in zip(ids, texts):
            spans = units_of(t)
            if len(spans) >= _SPAN_PACK:
                raise ValueError(
                    f"doc {did}: {len(spans)} spans >= 2^20 packing capacity")
            sub, idx = _elect_units(spans)
            h1, h2 = _span_digests(sub)
            a1.append(h1)
            a2.append(h2)
            ap.append(int(did) * _SPAN_PACK + idx)
        if not a1:
            return pa.table({"h1": pa.array([], type=pa.int64()),
                             "h2": pa.array([], type=pa.int64()),
                             "packed": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        t = pa.table({"h1": np.concatenate(a1), "h2": np.concatenate(a2),
                      "packed": np.concatenate(ap),
                      "n": np.ones(sum(map(len, a1)), dtype=np.int64)})
        g = pa.TableGroupBy(t, ["h1", "h2"]).aggregate(
            [("packed", "min"), ("n", "sum")])
        return g.rename_columns(["h1", "h2", "packed", "n"])

    dup_winners = (docs.map_batches(explode_ints, batch_format="pyarrow")
                   .groupby(["h1", "h2"])
                   .aggregate(Min("packed", alias_name="winner"),
                              Sum("n", alias_name="n"))
                   .map_batches(lambda t: t.filter(pc.greater(t.column("n"), 1))
                                .select(["h1", "h2", "winner"]),
                                batch_format="pyarrow")
                   .materialize())

    # -- mark dropped (doc_id, span_idx): span is a dup loser iff its
    # digest is in dup_winners and its packed != winner.
    if dup_winners.count() == 0:
        dropped = None
    elif dup_winners.size_bytes() <= driver_budget:
        wmap = {(r["h1"], r["h2"]): r["winner"]
                for r in collect_pylist(dup_winners)}
        ref = ray.put(wmap)

        def mark_dropped(batch: pa.Table) -> pa.Table:
            import ray as _ray

            wm = _ray.get(ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            texts = batch.column(text_col).to_pylist()
            out_id, out_idx = [], []
            for did, t in zip(ids, texts):
                sub, idx = _elect_units(units_of(t))
                h1, h2 = _span_digests(sub)
                base = int(did) * _SPAN_PACK
                for k, j in enumerate(idx):
                    w = wm.get((h1[k], h2[k]))
                    if w is not None and w != base + int(j):
                        out_id.append(int(did))
                        out_idx.append(int(j))
            return pa.table({id_col: pa.array(out_id, type=pa.int64()),
                             "span_idx": pa.array(out_idx, type=pa.int64())})

        dropped = docs.map_batches(mark_dropped,
                                   batch_format="pyarrow").materialize()
    else:
        # distributed: hash-partition span rows and winners on h1 and
        # resolve losers inside each group — int-only rows throughout.
        def part_of(h: np.ndarray) -> np.ndarray:
            return (h.view(np.uint64) % np.uint64(partitions)).astype(np.int32)

        def tag_spans(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            texts = batch.column(text_col).to_pylist()
            a1, a2, ap = [], [], []
            for did, t in zip(ids, texts):
                sub, idx = _elect_units(units_of(t))
                h1, h2 = _span_digests(sub)
                a1.append(h1)
                a2.append(h2)
                ap.append(int(did) * _SPAN_PACK + idx)
            h1 = (np.concatenate(a1) if a1
                  else np.array([], dtype=np.int64))
            h2 = (np.concatenate(a2) if a2
                  else np.array([], dtype=np.int64))
            pk = (np.concatenate(ap) if ap
                  else np.array([], dtype=np.int64))
            return pa.table({"h1": h1, "h2": h2, "packed": pk,
                             "winner": np.full(len(h1), -1, dtype=np.int64),
                             "__spart": part_of(h1)})

        def tag_winners(batch: pa.Table) -> pa.Table:
            h1 = batch.column("h1").to_numpy(zero_copy_only=False)
            return pa.table({"h1": batch.column("h1"),
                             "h2": batch.column("h2"),
                             "packed": pa.array(
                                 np.full(len(h1), -1, dtype=np.int64)),
                             "winner": batch.column("winner"),
                             "__spart": part_of(h1.astype(np.int64))})

        tagged = (docs.map_batches(tag_spans, batch_format="pyarrow")
                  .union(dup_winners.map_batches(tag_winners,
                                                 batch_format="pyarrow")))

        def losers(g: pa.Table) -> pa.Table:
            import pandas as pd

            df = g.to_pandas()
            wins = df[df["winner"] >= 0]
            spans = df[df["packed"] >= 0]
            m = spans.merge(wins[["h1", "h2", "winner"]], on=["h1", "h2"],
                            how="inner", suffixes=("", "_w"))
            lose = m[m["packed"] != m["winner_w"]]["packed"].to_numpy()
            return pa.table({id_col: pa.array(lose // _SPAN_PACK,
                                              type=pa.int64()),
                             "span_idx": pa.array(lose % _SPAN_PACK,
                                                  type=pa.int64())})

        dropped = (tagged.groupby("__spart")
                   .map_groups(losers, batch_format="pyarrow").materialize())

    # -- rebuild documents from surviving spans
    def rebuild_rows(ids, texts, drop_map) -> pa.Table:
        out = []
        for did, t in zip(ids, texts):
            did = int(did)
            spans = units_of(t)
            dset = drop_map.get(did, ())
            kept = [s for j, s in enumerate(spans) if j not in dset]
            out.append({id_col: did, "n_spans": len(spans),
                        "n_kept": len(kept), "dedup_text": join_str.join(kept)})
        return pa.Table.from_pylist(out) if out else pa.table(
            {id_col: pa.array([], type=pa.int64()),
             "n_spans": pa.array([], type=pa.int64()),
             "n_kept": pa.array([], type=pa.int64()),
             "dedup_text": pa.array([], type=pa.string())})

    if dropped is None or dropped.count() == 0:
        def rebuild_none(batch: pa.Table) -> pa.Table:
            return rebuild_rows(
                batch.column(id_col).to_numpy(zero_copy_only=False),
                batch.column(text_col).to_pylist(), {})

        out = docs.map_batches(rebuild_none, batch_format="pyarrow")
    elif dropped.size_bytes() <= driver_budget:
        dmap: dict[int, set] = {}
        for r in collect_pylist(dropped):
            dmap.setdefault(int(r[id_col]), set()).add(int(r["span_idx"]))
        dref = ray.put(dmap)

        def rebuild_bcast(batch: pa.Table) -> pa.Table:
            import ray as _ray

            return rebuild_rows(
                batch.column(id_col).to_numpy(zero_copy_only=False),
                batch.column(text_col).to_pylist(), _ray.get(dref))

        out = docs.map_batches(rebuild_bcast, batch_format="pyarrow")
    else:
        # distributed rebuild: co-partition docs and drop rows by doc id
        def dpart(ids: np.ndarray) -> np.ndarray:
            import pandas as pd

            return (pd.util.hash_array(ids.astype(np.int64))
                    % np.uint64(partitions)).astype(np.int32)

        def tag_docs(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table({id_col: batch.column(id_col),
                             text_col: batch.column(text_col),
                             "span_idx": pa.array(
                                 np.full(len(ids), -1, dtype=np.int64)),
                             "__dpart": dpart(ids)})

        def tag_drops(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table({id_col: batch.column(id_col),
                             text_col: pa.nulls(len(ids), type=pa.string()),
                             "span_idx": batch.column("span_idx"),
                             "__dpart": dpart(ids)})

        tagged = (docs.select_columns([id_col, text_col])
                  .map_batches(tag_docs, batch_format="pyarrow")
                  .union(dropped.map_batches(tag_drops,
                                             batch_format="pyarrow")))

        def rebuild_group(g: pa.Table) -> pa.Table:
            is_doc = pc.equal(g.column("span_idx"), -1)
            docs_t = g.filter(is_doc)
            drops_t = g.filter(pc.invert(is_doc))
            dm: dict[int, set] = {}
            for did, j in zip(drops_t.column(id_col).to_pylist(),
                              drops_t.column("span_idx").to_pylist()):
                dm.setdefault(int(did), set()).add(int(j))
            return rebuild_rows(
                docs_t.column(id_col).to_numpy(zero_copy_only=False),
                docs_t.column(text_col).to_pylist(), dm)

        out = tagged.groupby("__dpart").map_groups(rebuild_group,
                                                   batch_format="pyarrow")

    rows = sorted(collect_pylist(out), key=lambda r: r[id_col])
    return pa.Table.from_pylist(rows)


def line_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
               driver_budget: int = 256 << 20,
               partitions: int = 64) -> pa.Table:
    """CCNet-style corpus-wide duplicate-LINE removal (Wenzek et al.
    2020 §3: hash every line, drop all but the first occurrence
    corpus-wide, rebuild documents from surviving lines). Rides the
    span_dedup winner-election / drop-marking / rebuild machinery with
    the dedup unit switched to newline-split lines; the same
    size-adaptive driver/distributed paths and 128-bit digests apply.

    Returns (doc_id, n_lines, n_kept, dedup_text) per non-empty doc,
    dedup_text joining surviving lines with '\\n'.
    """
    out = span_dedup(ds, text_col=text_col, id_col=id_col,
                     driver_budget=driver_budget, partitions=partitions,
                     unit_fn=lambda t: (t or "").split("\n"),
                     join_str="\n",
                     # blank lines are paragraph separators, not dedup
                     # units: never elected, always kept in place
                     dedupable_fn=lambda s: s.strip() != "")
    return out.rename_columns([id_col, "n_lines", "n_kept", "dedup_text"])


# ---------------------------------------------------------------------------
# fastText-style quality classifier, library-free: a multinomial Naive
# Bayes log-odds scorer over whitespace tokens, trained on the Gopher
# rule pass flag as the pseudo-label. This is the standard bootstrapped
# corpus-quality classifier of the GPT-3 / LLaMA curation pipelines
# (train a cheap linear text classifier on rule-derived labels, score
# every page with its log-odds) with NB counts instead of SGD so the
# fit is ONE deterministic distributed pass:
#
#   pass 1 (train): per-batch token Counters split by label
#     pre-aggregate before a single groupby(word) shuffle of
#     (word, cpos, cneg) int rows; per-class doc priors ride the same
#     shuffle on one reserved row per batch. The resulting weight table
#     is VOCAB-bounded and broadcasts via ray.put behind the same
#     raising budget guard as unigram_lm_scores.
#   pass 2 (score): shuffle-free map_batches summing per-word log-odds.
#
# score(d) = ln(Npos/Nneg) + Σ_w [ ln((cpos_w+1)/(Tpos+V))
#                                 - ln((cneg_w+1)/(Tneg+V)) ]
# (add-one smoothing; V = vocabulary size). pred = score > 0.
# ---------------------------------------------------------------------------

# Reserved word row carrying doc priors through the count shuffle.
# The EMPTY STRING cannot collide with a real token: tokens are \S+
# runs, which are non-empty by construction — no adversarial web
# document can forge this key (a \x00-style sentinel could).
_NB_DOCS_KEY = ""


def nb_quality_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                      nb_driver_budget: int = 256 << 20) -> pa.Table:
    """Train-and-score NB quality classifier over `ds`. Returns
    (doc_id, label, n_tokens, score, pred) for docs with >= 1 token,
    sorted by id; `label` is the Gopher pass flag the model was trained
    on, `score` the round(6) log-odds, `pred` = raw score > 0."""
    import ray
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def labels_of(batch: pa.Table) -> np.ndarray:
        sig = gopher_signals_batch(batch, text_col=text_col, id_col=id_col)
        return sig.column("gopher_pass").to_numpy(zero_copy_only=False)

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        y = labels_of(batch)
        cpos: Counter = Counter()
        cneg: Counter = Counter()
        npos = nneg = 0
        for t, lab in zip(batch.column(text_col).to_pylist(), y):
            toks = _WS_TOKEN_RE.findall(t) if t else []
            if not toks:
                continue
            if lab:
                cpos.update(toks)
                npos += 1
            else:
                cneg.update(toks)
                nneg += 1
        words = sorted(set(cpos) | set(cneg))
        return pa.table({
            "word": pa.array([_NB_DOCS_KEY] + words, type=pa.string()),
            "cpos": pa.array([npos] + [cpos[w] for w in words],
                             type=pa.int64()),
            "cneg": pa.array([nneg] + [cneg[w] for w in words],
                             type=pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("word")
              .aggregate(Sum("cpos", alias_name="cpos"),
                         Sum("cneg", alias_name="cneg"))
              .materialize())
    if counts.size_bytes() > nb_driver_budget:
        raise ValueError(
            f"NB weight table {counts.size_bytes()} B exceeds "
            f"nb_driver_budget={nb_driver_budget}; raise the budget or "
            "prune the vocabulary before training")
    rows = collect_pylist(counts)
    npos = nneg = tpos = tneg = 0
    vocab: list[tuple[str, int, int]] = []
    for r in rows:
        if r["word"] == _NB_DOCS_KEY:
            npos, nneg = int(r["cpos"]), int(r["cneg"])
        else:
            vocab.append((r["word"], int(r["cpos"]), int(r["cneg"])))
            tpos += int(r["cpos"])
            tneg += int(r["cneg"])
    if npos == 0 or nneg == 0:
        raise ValueError(
            f"degenerate NB training labels (npos={npos}, nneg={nneg}); "
            "both classes must be non-empty")
    V = len(vocab)
    dpos, dneg = float(tpos + V), float(tneg + V)
    weights = {w: float(np.log((cp + 1.0) / dpos) - np.log((cn + 1.0) / dneg))
               for w, cp, cn in vocab}
    oov = float(np.log(1.0 / dpos) - np.log(1.0 / dneg))
    bias = float(np.log(npos / float(nneg)))
    ref = ray.put(weights)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        wm = _ray.get(ref)
        y = labels_of(batch)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "label": [], "n_tokens": [], "score": [],
               "pred": []}
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = _WS_TOKEN_RE.findall(t) if t else []
            if not toks:
                continue
            s = bias
            for w in toks:
                s += wm.get(w, oov)
            out["doc_id"].append(int(ids[i]))
            out["label"].append(int(y[i]))
            out["n_tokens"].append(len(toks))
            out["score"].append(round(s, 6))
            out["pred"].append(int(s > 0))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "label": pa.array(out["label"], type=pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
            "pred": pa.array(out["pred"], type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# CCNet-style head/middle/tail perplexity bucketing (Wenzek et al. 2020
# §4.3): score every document with the unigram LM, then split the
# corpus into tertiles by LM score — "head" is the lowest-perplexity
# (most fluent) third, "tail" the highest. The tertile boundaries are
# exact quantile_cont percentiles computed from value counts on an
# integer MILLI-NAT grid (floor(nll*1000)): the grid is bounded by the
# achievable nll range (~20k cells for nll <= 20 nats), NOT by corpus
# size, so the driver-side boundary computation is scale-safe — the
# same integer-grid argument as the price-quantile and robust-scaler
# queries. Two shuffles total: the LM's groupby(word) and the
# groupby(mnat) value-count merge; bucket assignment is shuffle-free.
# ---------------------------------------------------------------------------

def ppl_tertile_buckets(ds, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, mnat, bucket) per scored doc, sorted by id;
    bucket ∈ {'head','middle','tail'} by nll tertile (mnat <= b33 →
    head, <= b66 → middle, else tail; boundaries are quantile_cont
    over the milli-nat grid)."""
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    scored = unigram_lm_scores(ds, text_col=text_col, id_col=id_col)

    def to_mnat(batch: pa.Table) -> pa.Table:
        nll = batch.column("nll").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("n_tokens"),
            "mnat": pa.array(np.floor(nll * 1000.0).astype(np.int64))})

    m = scored.map_batches(to_mnat, batch_format="pyarrow").materialize()

    def vc_partial(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch.column("mnat").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"mnat": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    vc = sorted(collect_pylist(
        m.map_batches(vc_partial, batch_format="pyarrow")
        .groupby("mnat").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["mnat"])
    from tanml_ray.stages.quantiles import quantile_cont_from_counts

    vals = np.array([r["mnat"] for r in vc], dtype=np.float64)
    cum = np.cumsum([r["n"] for r in vc])
    b33 = quantile_cont_from_counts(vals, cum, 1.0 / 3)
    b66 = quantile_cont_from_counts(vals, cum, 2.0 / 3)

    def assign(batch: pa.Table) -> pa.Table:
        mn = batch.column("mnat").to_numpy(zero_copy_only=False)
        bucket = np.where(mn <= b33, "head",
                          np.where(mn <= b66, "middle", "tail"))
        return batch.append_column("bucket",
                                   pa.array(bucket, type=pa.string()))

    rows = sorted(collect_pylist(
        m.map_batches(assign, batch_format="pyarrow")),
        key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# CCNet-style text normalization — the canonical form every web-corpus
# dedup/hash stage runs first (Wenzek et al. 2020 §3: lowercase +
# accent removal + whitespace collapse over NFC text). Pure per-batch
# kernel, shuffle-free; Python's NFD-drop-Mn accent stripping is
# bit-verified against DuckDB's utf8proc strip_accents in the oracle,
# and the whitespace regex is ASCII (RE2 \s parity).
# ---------------------------------------------------------------------------

_ASCII_WS_RE = re.compile(r"\s+", re.ASCII)


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """(doc_id, norm_text, n_chars_norm): NFC → strip accents (NFD,
    drop Mn marks) → lower → collapse ASCII whitespace runs → trim."""
    import unicodedata

    ids = batch.column(id_col)
    out = []
    for t in batch.column(text_col).to_pylist():
        if t is None:
            out.append("")
            continue
        s = unicodedata.normalize("NFC", t)
        s = "".join(c for c in unicodedata.normalize("NFD", s)
                    if unicodedata.category(c) != "Mn")
        s = s.lower()
        s = _ASCII_WS_RE.sub(" ", s).strip()
        out.append(s)
    return pa.table({
        id_col: ids,
        "norm_text": pa.array(out, type=pa.string()),
        "n_chars_norm": pa.array([len(s) for s in out], type=pa.int64())})


# ---------------------------------------------------------------------------
# Source-overlap matrix: pairwise Jaccard of the DISTINCT word-n-gram
# sets of each source — the dataset-level contamination/overlap
# analytic (which corpora duplicate which). Shape: per-batch local
# (gram, source) dedupe → ONE coarse hash(gram)%P shuffle (every
# gram's rows land in one partition; a groupby(gram) would be one
# map_groups task per distinct trigram — corpus-vocabulary-sized) →
# vectorized in-partition per-gram source self-merge, pre-aggregated
# to (sa, sb, n) before leaving the task → one tiny groupby(pair) Sum.
# Gram keys here are the strings themselves for bit-parity with the
# SQL oracle; the 10^12-doc variant would ship 64-bit gram hashes
# instead (counts-only contract — the hot-ngram rationale).
# ---------------------------------------------------------------------------

def source_overlap(ds, n: int = 3, text_col: str = "text",
                   group_col: str = "source") -> pa.Table:
    """(sa, sb, n_a, n_b, inter, jaccard) for every source pair with at
    least one shared distinct n-gram, sorted by (sa, sb)."""
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def explode(batch: pa.Table) -> pa.Table:
        srcs = batch.column(group_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        seen: set = set()
        for s, t in zip(srcs, texts):
            ws = _WS_TOKEN_RE.findall(t) if t else []
            for i in range(len(ws) - n + 1):
                seen.add((" ".join(ws[i:i + n]), s))
        if not seen:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "src": pa.array([], type=pa.string())})
        gs, ss = zip(*sorted(seen))
        return pa.table({"g": pa.array(gs, type=pa.string()),
                         "src": pa.array(ss, type=pa.string())})

    def pairs_of_partition(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        df = g.drop_duplicates(["g", "src"])
        m = df.merge(df, on="g")
        m = m[m["src_x"] <= m["src_y"]]  # diag carries per-source sizes
        out = (m.groupby(["src_x", "src_y"], as_index=False).size()
               .rename(columns={"src_x": "sa", "src_y": "sb",
                                "size": "n"}))
        if out.empty:
            return pd.DataFrame({"sa": pd.Series(dtype=object),
                                 "sb": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        out["n"] = out["n"].astype("int64")
        return out

    from tanml_ray.stages.shuffle import with_coarse_partition

    agg = (with_coarse_partition(
        ds.map_batches(explode, batch_format="pyarrow"), "g")
        .groupby("__upart").map_groups(pairs_of_partition,
                                       batch_format="pandas")
        .groupby(["sa", "sb"]).aggregate(Sum("n", alias_name="n")))
    counts = {(r["sa"], r["sb"]): int(r["n"]) for r in collect_pylist(agg)}
    per = {a: c for (a, b), c in counts.items() if a == b}
    out = []
    for (a, b), inter in sorted(counts.items()):
        if a == b:
            continue
        na, nb = per[a], per[b]
        out.append({"sa": a, "sb": b, "n_a": na, "n_b": nb,
                    "inter": inter,
                    "jaccard": round(inter / (na + nb - inter), 6)})
    return pa.Table.from_pylist(out) if out else pa.table(
        {"sa": pa.array([], type=pa.string()),
         "sb": pa.array([], type=pa.string()),
         "n_a": pa.array([], type=pa.int64()),
         "n_b": pa.array([], type=pa.int64()),
         "inter": pa.array([], type=pa.int64()),
         "jaccard": pa.array([], type=pa.float64())})


def dsir_weights(ds, text_col: str = "text", id_col: str = "doc_id",
                 min_count: int = 1,
                 lm_driver_budget: int = 256 << 20):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public method):
    log w(d) = log p_target(d) − log p_raw(d) under two unigram LMs,
    here with the Gopher rule-pass subset as the target distribution
    (the standard bootstrap when no curated target corpus exists).
    Feeding these weights into weighted_sample_per_group completes the
    published select-by-importance-resampling loop.

    Three streaming passes, all vocab-bounded: train the raw LM on the
    corpus, the target LM on the rule-passing subset (one extra count
    shuffle), score each doc under both (shuffle-free), then one
    hash-partitioned join on doc_id aligns the two score tables —
    nothing corpus-sized touches the driver.

    Returns (doc_id, n_tokens, nll_raw, nll_target, log_weight) for
    docs with >= 1 token, sorted by doc_id;
    log_weight = n_tokens · (nll_raw − nll_target) (positive ⇒ the doc
    looks more like the target than the raw corpus). The per-doc nll
    values are the round(6) outputs of unigram_lm_scores — the SQL
    oracle mirrors that intermediate rounding.
    """
    from tanml_ray.pipelines.join import partitioned_join

    def keep_pass(batch: pa.Table) -> pa.Table:
        sig = gopher_signals_batch(batch, text_col=text_col, id_col=id_col)
        return batch.filter(pc.equal(sig.column("gopher_pass"), 1))

    target = ds.map_batches(keep_pass, batch_format="pyarrow")
    raw_scores = unigram_lm_scores(
        ds, text_col=text_col, id_col=id_col, min_count=min_count,
        lm_driver_budget=lm_driver_budget)
    t_scores = unigram_lm_scores(
        ds, text_col=text_col, id_col=id_col, counts_ds=target,
        min_count=min_count, lm_driver_budget=lm_driver_budget)

    joined = partitioned_join(
        raw_scores.select_columns([id_col, "n_tokens", "nll"]),
        t_scores.select_columns([id_col, "nll"]),
        key=id_col)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        r = batch.column("nll_x").to_numpy(zero_copy_only=False)
        t = batch.column("nll_y").to_numpy(zero_copy_only=False)
        # the join's null-padded union can promote n_tokens to double on
        # some block layouts — pin the contract dtype (int64) explicitly
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pc.cast(batch.column("n_tokens"), pa.int64()),
            "nll_raw": pc.cast(batch.column("nll_x"), pa.float64()),
            "nll_target": pc.cast(batch.column("nll_y"), pa.float64()),
            "log_weight": pa.array(np.round(n * (r - t), 6),
                                   type=pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# C4 line-level cleaning heuristics (Raffel et al. 2020 §2.2, public
# paper — the rules that produced the C4 corpus): keep only lines that
# end in terminal punctuation and have at least `min_words` words; drop
# lines containing the word "javascript"; drop WHOLE documents that
# contain "{" or the placeholder phrase "lorem ipsum", or that retain
# fewer than `min_kept` lines (C4's >=5-sentence rule, parametrized).
# Shuffle-free batch kernel: the per-doc Python loop is the tokenizer
# cost itself (same class as quality_batch, stages/text.py:47); text
# never leaves the stage except as the rebuilt survivor column. The
# reference has no corpus-cleaning stage (closest analog: row-level
# regex constraints, checks/); the rules here are the published C4
# ones, shared bit-for-bit with the SQL oracle.
# ---------------------------------------------------------------------------

_TERMINAL_PUNCT = (".", "!", "?", '"')


def c4_line_filter(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 3, min_kept: int = 3,
                   output: str = "stats"):
    """output="stats" → Dataset[(doc_id, n_lines, n_kept, clean_text)]
    of surviving docs; output="rewrite" → the ORIGINAL schema with
    text_col replaced by the cleaned text and non-surviving rows
    dropped (the shape curate composes).

    Line keep-rule (applied to each rtrim'd "\\n"-line): ends in one of
    . ! ? "  AND has >= min_words whitespace words AND does not contain
    "javascript" (case-insensitive). Document drop-rule: raw text
    contains "{" or "lorem ipsum" (case-insensitive), or fewer than
    min_kept lines survive."""
    if output not in ("stats", "rewrite"):
        raise ValueError(f"unknown output mode {output!r}")

    def clean(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        o_id, o_nl, o_nk, o_tx, keep_idx = [], [], [], [], []
        for row, (i, t) in enumerate(
                zip(ids, batch.column(text_col).to_pylist())):
            if t is None:
                continue
            low = t.lower()
            if "{" in t or "lorem ipsum" in low:
                continue
            lines = [ln.rstrip() for ln in t.split("\n")]
            kept = [ln for ln in lines
                    if ln.endswith(_TERMINAL_PUNCT)
                    and len(ln.split()) >= min_words
                    and "javascript" not in ln.lower()]
            if len(kept) < min_kept:
                continue
            o_id.append(i)
            o_nl.append(len(lines))
            o_nk.append(len(kept))
            o_tx.append("\n".join(kept))
            keep_idx.append(row)
        if output == "rewrite":
            sub = batch.take(pa.array(keep_idx, type=pa.int64()))
            return sub.set_column(
                sub.column_names.index(text_col), text_col,
                pa.array(o_tx, type=pa.string()))
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "n_lines": pa.array(o_nl, type=pa.int64()),
            "n_kept": pa.array(o_nk, type=pa.int64()),
            "clean_text": pa.array(o_tx, type=pa.string())})

    return ds.map_batches(clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich, Haddow & Birch 2016, public paper
# "Neural Machine Translation of Rare Words with Subword Units") — the
# trainable-tokenizer stage of an LLM data pipeline. Scale shape: the
# ONLY distributed pass is the combiner-first word-frequency count
# (identical contract to unigram_lm_scores: per-batch Counters, one
# groupby(word) shuffle of (word, partial) rows); the merge loop runs
# on the driver over the VOCAB-bounded type table (min_count is the
# web-scale knob — rare types prune into nothing, exactly the paper's
# practice) behind a raising budget guard. Encoding is a stateful
# ACTOR-POOL stage: merge ranks build once per actor in __init__, each
# batch encodes through a per-actor word→tokens memo (web text repeats
# word types heavily, so the memo converts per-token work into a dict
# hit). No reference analog (the reference has no tokenizer); the
# BPE-ish regex token counts in queries.py count a FIXED pattern —
# this learns the vocabulary.
# ---------------------------------------------------------------------------

_BPE_END = "</w>"


def _bpe_merge_loop(types: list[tuple[str, int]],
                    num_merges: int) -> list[tuple[str, str, int]]:
    """Classic driver-side merge loop over (word, count) types.
    Deterministic: ties on pair count break lexicographically.
    Returns [(left, right, pair_count)] in merge order."""
    words = [(tuple(w) + (_BPE_END,), c) for w, c in types if w]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < 2:          # nothing repeats — further merges are noise
            break
        merges.append((l, r, cnt))
        merged = l + r
        out = []
        for syms, c in words:
            if l not in syms:
                out.append((syms, c))
                continue
            ns, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == l
                        and syms[i + 1] == r):
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out.append((tuple(ns), c))
        words = out
    return merges


def bpe_train(ds, num_merges: int = 200, text_col: str = "text",
              min_count: int = 1,
              vocab_driver_budget: int = 256 << 20) -> pa.Table:
    """(rank, left, right, pair_count) merge table learned from the
    corpus. One combiner-first word-count shuffle; driver merge loop
    over the bounded type table (guard raises past the budget)."""
    from ray.data.aggregate import Sum

    from tanml_ray.functions.collect import collect_pylist

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if t:
                c.update(_WS_TOKEN_RE.findall(t))
        return pa.table({"word": pa.array(list(c.keys()), type=pa.string()),
                         "c": pa.array(list(c.values()), type=pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("c", alias_name="n")))
    if counts.size_bytes() > vocab_driver_budget:
        raise RuntimeError(
            f"BPE type table {counts.size_bytes()} B exceeds "
            f"vocab_driver_budget={vocab_driver_budget}; raise the budget "
            "or prune with min_count")
    types = [(r["word"], int(r["n"])) for r in collect_pylist(counts)
             if int(r["n"]) >= min_count]
    types.sort()                         # partition-order independence
    merges = _bpe_merge_loop(types, num_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), type=pa.int64()),
        "left": pa.array([m[0] for m in merges], type=pa.string()),
        "right": pa.array([m[1] for m in merges], type=pa.string()),
        "pair_count": pa.array([m[2] for m in merges], type=pa.int64())})


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the paper's encoder)."""
    syms = list(word) + [_BPE_END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool encoder: ranks dict built once per actor; per-actor
    word→encoding memo (web text repeats types, so steady-state cost
    is one dict hit per token). Emits (id, n_words, n_bpe_tokens)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, pa.Table) \
            else merges_ref
        self.ranks = {(l, r): k for k, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(),
                merges.column("right").to_pylist()))}
        self.text_col, self.id_col = text_col, id_col
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words, n_bpe = [], []
        for t in batch.column(self.text_col).to_pylist():
            ws = _WS_TOKEN_RE.findall(t) if t else []
            tot = 0
            for w in ws:
                k = self.memo.get(w)
                if k is None:
                    k = len(bpe_encode_word(w, self.ranks))
                    self.memo[w] = k
                tot += k
            n_words.append(len(ws))
            n_bpe.append(tot)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64())})


def bpe_token_stats(ds, num_merges: int = 200, text_col: str = "text",
                    id_col: str = "doc_id", min_count: int = 1,
                    concurrency: int = 4):
    """Train on the corpus, then encode it: Dataset[(doc_id, n_words,
    n_bpe_tokens)]. Merge table broadcasts once via ray.put."""
    import ray

    merges = bpe_train(ds, num_merges=num_merges, text_col=text_col,
                       min_count=min_count)
    ref = ray.put(merges)
    # (1, N) autoscaling pool: small inputs (tests, tail shards) may
    # arrive as a single block, and a fixed-size pool would idle N−1
    # actors (and warn); the pool still scales out to `concurrency`
    # when the block count supports it.
    return ds.map_batches(
        BpeEncoder, fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow", concurrency=(1, concurrency))


# ---------------------------------------------------------------------------
# URL filtering (the RefinedWeb / UT1-blocklist curation stage, public
# methodology: Penedo et al. 2023 §3.1): drop documents whose url is on
# a blocked-DOMAIN list, contains a banned keyword, or is implausibly
# long. Vectorized arrow kernels end-to-end (is_in against a broadcast
# domain set, match_substring per keyword, utf8_length); the blocklist
# ships once via ray.put — at UT1 scale (~10^6 domains ≈ 30 MB) that is
# a broadcast object, never a shuffle side. Shuffle-free.
# ---------------------------------------------------------------------------

def url_filter(ds, url_col: str = "url", id_col: str = "doc_id",
               blocked_domains: frozenset[str] = frozenset(),
               banned_substrings: tuple[str, ...] = (),
               max_len: int = 2048):
    """Dataset[(id, domain, reason)] for EVERY row; reason is null for
    kept rows, else the FIRST matching rule in fixed precedence
    'domain' > 'keyword' > 'length' (deterministic under any
    partitioning). Domain = host with a leading www. stripped — the
    extract_domain_batch contract (canonicalize_url_batch upstream
    handles case/port/utm normalization)."""
    import ray

    dom_ref = ray.put(pa.array(sorted(blocked_domains), type=pa.string()))

    def flag(batch: pa.Table) -> pa.Table:
        dom_set = ray.get(dom_ref)
        d = extract_domain_batch(batch, url_col=url_col).column("domain")
        url = batch.column(url_col)
        n = batch.num_rows
        reason = np.full(n, None, dtype=object)
        hit_dom = pc.is_in(d, value_set=dom_set).to_numpy(
            zero_copy_only=False)
        reason[hit_dom] = "domain"
        open_mask = ~hit_dom
        for s in banned_substrings:
            hit = pc.match_substring(url, s).to_numpy(zero_copy_only=False)
            take = open_mask & hit
            reason[take] = "keyword"
            open_mask &= ~hit
        too_long = (pc.utf8_length(url).to_numpy(zero_copy_only=False)
                    > max_len)
        reason[open_mask & too_long] = "length"
        return pa.table({
            id_col: batch.column(id_col),
            "domain": d,
            "reason": pa.array(reason.tolist(), type=pa.string())})

    return ds.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Overlapping-window document chunking — the RAG / context-window
# preparation stage: each doc explodes into word windows of `window`
# words every `stride` words (overlap = window - stride). Shuffle-free
# row-expanding map_batches (the Dataset-native flat_map shape, batched);
# chunk ids are derived from word offsets, so output is partition- and
# retry-deterministic. Token semantics are the engine-wide ASCII \S+
# contract (_doc_spans rationale).
# ---------------------------------------------------------------------------

def chunk_documents(ds, window: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Dataset[(doc_id, chunk_id, n_words, chunk_text)]: chunk c covers
    words [c·stride, c·stride + window); a chunk is emitted iff its
    start offset is inside the doc (the final one may be short). Docs
    with no tokens emit nothing."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def explode(batch: pa.Table) -> pa.Table:
        o_id, o_cid, o_nw, o_tx = [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            ws = _WS_TOKEN_RE.findall(t) if t else []
            if not ws:
                continue
            for c in range((len(ws) - 1) // stride + 1):
                w = ws[c * stride:c * stride + window]
                o_id.append(i)
                o_cid.append(c)
                o_nw.append(len(w))
                o_tx.append(" ".join(w))
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "chunk_id": pa.array(o_cid, type=pa.int64()),
            "n_words": pa.array(o_nw, type=pa.int64()),
            "chunk_text": pa.array(o_tx, type=pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")
