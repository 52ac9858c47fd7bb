"""Unit/property tests for the web-text curation layer
(pipelines/webtext.py): Gopher signals, duplicate-n-gram repetition,
hot-n-gram boilerplate coverage, weighted sampling. The SQL-oracle
equivalence of all four queries is covered by test_queries_oracle.py;
these tests pin the operator semantics on hand-built corpora."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tanml_ray.pipelines.webtext import (
    dup_ngram_stats_batch,
    gopher_signals_batch,
    hot_ngram_coverage,
    weighted_sample_per_group,
    _md5_uniform,
    _word_ngrams,
)


def _tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(1, len(texts) + 1))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def test_gopher_signals_flags():
    good = " ".join(["the quick brown fox jumps over and of to in"] * 6)  # 60 words
    short = "the cat sat on the mat"                      # < 50 words
    symbols = " ".join(["@#$% ^&*( )!~= ++-- ::;; <<>>"] * 12)  # no alpha words
    out = gopher_signals_batch(_tbl([good, short, symbols]))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["gopher_pass"] == 1
    assert rows[1]["n_words"] == 60
    assert rows[2]["gopher_pass"] == 0          # too short
    assert rows[3]["gopher_pass"] == 0          # alpha_word_frac == 0
    assert rows[3]["alpha_word_frac"] == 0.0
    assert rows[1]["stop_hits"] >= 2


def test_dup_ngram_fraction_exact():
    # "a b c a b c a b" -> trigrams: abc bca cab abc bca cab -> every
    # position duplicated -> dup_frac 1.0
    rep = "a b c a b c a b"
    uniq = "one two three four five"
    out = dup_ngram_stats_batch(_tbl([rep, uniq]))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["n_grams"] == 6 and rows[1]["dup_grams"] == 6
    assert rows[1]["dup_frac"] == 1.0
    assert rows[2]["n_grams"] == 3 and rows[2]["dup_grams"] == 0
    # a doc with < 3 words emits no row (oracle GROUP BY parity)
    assert 3 not in {r["doc_id"] for r in
                     dup_ngram_stats_batch(_tbl(["a b"], ids=[3])).to_pylist()}


def test_word_ngrams_textual_identity():
    assert _word_ngrams("x  y\tz w", 3) == ["x y z", "y z w"]
    assert _word_ngrams("x y", 3) == []
    assert _word_ngrams("", 3) == []


@pytest.mark.usefixtures("ray_session")
def test_hot_ngram_coverage_boilerplate():
    import ray.data as rd

    # 30 docs share one boilerplate trigram run; 5 docs are unique.
    boiler = "all rights reserved " + "filler%d unique%d tail%d"
    texts = [boiler % (i, i, i) for i in range(30)]
    texts += [f"totally distinct words {i} here now {i}" for i in range(5)]
    ds = rd.from_arrow(_tbl(texts))
    out = hot_ngram_coverage(ds, n=3, min_df_frac=0.5).to_pylist()
    rows = {r["doc_id"]: r for r in out}
    # "all rights reserved" appears in 30/35 docs >= 50% -> hot; each
    # boilerplate doc has 4 grams, exactly 1 of them hot.
    assert rows[1]["hot_grams"] == 1 and rows[1]["n_grams"] == 4
    assert rows[1]["hot_frac"] == 0.25
    assert all(rows[i]["hot_grams"] == 0 for i in range(31, 36))


@pytest.mark.usefixtures("ray_session")
def test_ngram_contamination_planted():
    import ray.data as rd

    from tanml_ray.pipelines.webtext import ngram_contamination

    bench = _tbl(["the secret eval answer is forty two exactly"], ids=[100])
    corpus = _tbl([
        "clean document with no overlap at all here",
        "leaked copy the secret eval answer is forty two exactly wow",
        "tiny",  # < 5 words -> no row
    ])
    out = ngram_contamination(rd.from_arrow(corpus), rd.from_arrow(bench),
                              n=5).to_pylist()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["contaminated"] == 0 and rows[1]["hit_grams"] == 0
    # the leaked doc contains all 4 of the benchmark's 5-grams
    assert rows[2]["contaminated"] == 1 and rows[2]["hit_grams"] == 4
    assert 3 not in rows


def test_md5_uniform_range_and_determinism():
    ids = np.arange(1, 2001, dtype=np.int64)
    u = _md5_uniform(ids)
    assert np.all((u > 0) & (u < 1))
    assert np.array_equal(u, _md5_uniform(ids))
    # roughly uniform: mean within 3 sigma of 0.5
    assert abs(u.mean() - 0.5) < 3 * (1 / np.sqrt(12 * len(u)))


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_per_group_properties():
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
        "n_chars": pa.array(rng.integers(1, 10_000, n), type=pa.int64()),
    })
    ds = rd.from_arrow(tbl)
    out = weighted_sample_per_group(ds, k=5, weight_col="n_chars",
                                    group_col="lang").to_pylist()
    assert len(out) == 10
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # determinism: identical second run, regardless of partitioning
    out2 = weighted_sample_per_group(ds.repartition(7), k=5,
                                     weight_col="n_chars",
                                     group_col="lang").to_pylist()
    assert out == out2
    # weight sensitivity: the sampled docs' mean weight should exceed
    # the population mean (priority = -ln(u)/w favors heavy docs)
    samp_w = np.mean([r["n_chars"] for r in out])
    assert samp_w > tbl.column("n_chars").to_numpy().mean()


def test_extract_domain_batch():
    from tanml_ray.pipelines.webtext import extract_domain_batch

    t = pa.table({"url": [
        "https://www.example.com/a/b", "http://sub.host.org/x",
        "https://host.org", "https://www.www2.net/p?q=1",
    ]})
    d = extract_domain_batch(t).column("domain").to_pylist()
    assert d == ["example.com", "sub.host.org", "host.org", "www2.net"]


@pytest.mark.usefixtures("ray_session")
def test_domain_stats_counts_and_cap():
    import ray.data as rd
    from tanml_ray.pipelines.webtext import domain_stats

    urls = (["https://big.com/%d" % i for i in range(90)]
            + ["https://www.small.org/%d" % i for i in range(10)])
    out = domain_stats(rd.from_arrow(pa.table({"url": urls})).repartition(5),
                       share_cap=0.5).take_all()
    assert out == [
        {"domain": "big.com", "n_pages": 90, "share": 0.9, "over_cap": True},
        {"domain": "small.org", "n_pages": 10, "share": 0.1,
         "over_cap": False},
    ]


@pytest.mark.usefixtures("ray_session")
def test_domain_stats_many_domains_streams():
    """Real crawls have 10⁷–10⁸ distinct domains; the operator must
    stay a Dataset end-to-end (driver sees only the scalar total).
    Exercised at 250k all-distinct domains here (10⁶ verified once,
    ~60 s — too slow for every run); the result is consumed via
    count() and a vectorized filtered probe, never collected whole."""
    import pyarrow.compute as pc
    import ray.data as rd

    n = 250_000

    def to_urls(batch):
        ids = batch["id"]
        return pa.table({"url": pa.array(
            [f"https://d{int(i)}.example.com/p" for i in ids])})

    from tanml_ray.pipelines.webtext import domain_stats

    out = domain_stats(rd.range(n, override_num_blocks=16)
                       .map_batches(to_urls, batch_format="numpy"),
                       share_cap=1e-7)
    assert out.count() == n
    probe = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("domain"),
                                    "d123456.example.com")),
        batch_format="pyarrow").take_all()
    assert probe == [{"domain": "d123456.example.com", "n_pages": 1,
                      "share": round(1.0 / n, 6), "over_cap": True}]


def test_unigram_lm_scores_hand_computed():
    import ray

    from tanml_ray.pipelines.webtext import unigram_lm_scores

    # corpus: "a a b" and "a c"  → counts a=3, b=1, c=1; T=5, V=3, denom=8
    ds = ray.data.from_arrow(_tbl(["a a b", "a c"]))
    out = unigram_lm_scores(ds).take_all()
    denom = 8.0
    lp = {"a": np.log(4 / denom), "b": np.log(2 / denom),
          "c": np.log(2 / denom)}
    nll1 = -(2 * lp["a"] + lp["b"]) / 3
    nll2 = -(lp["a"] + lp["c"]) / 2
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 2
    assert out[0]["nll"] == round(nll1, 6)
    assert out[1]["nll"] == round(nll2, 6)
    assert out[0]["ppl"] == round(float(np.exp(nll1)), 6)


def test_unigram_lm_external_counts_and_oov():
    import ray

    from tanml_ray.pipelines.webtext import unigram_lm_scores

    train = ray.data.from_arrow(_tbl(["a a b"]))          # T=3, V=2, denom=5
    score = ray.data.from_arrow(_tbl(["a zzz"]))          # zzz is OOV
    out = unigram_lm_scores(score, counts_ds=train).take_all()
    nll = -(np.log(3 / 5) + np.log(1 / 5)) / 2
    assert len(out) == 1
    assert out[0]["nll"] == round(nll, 6)


def test_unigram_lm_budget_guard_raises():
    import ray

    from tanml_ray.pipelines.webtext import unigram_lm_scores

    ds = ray.data.from_arrow(_tbl(["a b c d e f g h"]))
    with pytest.raises(ValueError, match="lm_driver_budget"):
        unigram_lm_scores(ds, lm_driver_budget=0).take_all()


def test_unigram_lm_skips_empty_docs():
    import ray

    from tanml_ray.pipelines.webtext import unigram_lm_scores

    ds = ray.data.from_arrow(_tbl(["a b", "", None]))
    out = unigram_lm_scores(ds).take_all()
    assert [r["doc_id"] for r in out] == [1]


def test_canonicalize_url_rules():
    from tanml_ray.pipelines.webtext import canonicalize_url_batch

    cases = {
        # scheme+host lowercase, default port strip, path case kept
        "HTTP://WWW.Ex.COM:80/Doc/1": "http://www.ex.com/Doc/1",
        "https://Ex.com:443/a": "https://ex.com/a",
        # non-default port survives
        "http://ex.com:8080/a": "http://ex.com:8080/a",
        # :443 on http is NOT a default port
        "http://ex.com:443/a": "http://ex.com:443/a",
        # fragment stripped, root slash collapses
        "https://ex.com/#frag": "https://ex.com",
        # consecutive utm params, remnant '&' promoted to '?'
        "https://ex.com/p?utm_a=1&utm_b=2&c=3": "https://ex.com/p?c=3",
        # all params were utm → dangling '?' dropped
        "https://ex.com/p?utm_a=1": "https://ex.com/p",
        # trailing slash stripped only without a query
        "https://ex.com/a/b/": "https://ex.com/a/b",
        "https://ex.com/a/?x=1": "https://ex.com/a/?x=1",
        # other scheme: port untouched, rules still apply
        "FTP://Ex.com:80/F/": "ftp://ex.com:80/F",
    }
    t = pa.table({"url": pa.array(list(cases.keys()), type=pa.string())})
    out = canonicalize_url_batch(t).column("canon_url").to_pylist()
    assert out == list(cases.values())


def test_unigram_lm_min_count_prunes_to_oov():
    import ray

    from tanml_ray.pipelines.webtext import unigram_lm_scores

    # corpus "a a b": T=3 (b's occurrence still counts), min_count=2
    # keeps only "a" → V=1, denom=T+V=4; b scores as OOV 1/denom
    ds = ray.data.from_arrow(_tbl(["a a b"]))
    out = unigram_lm_scores(ds, min_count=2).take_all()
    denom = 4.0
    nll = -(2 * np.log(3 / denom) + np.log(1 / denom)) / 3
    assert out[0]["nll"] == round(nll, 6)


def test_token_budget_stats_hand_computed():
    import ray

    from tanml_ray.pipelines.webtext import token_budget_stats

    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "lang": pa.array(["en", "en", "de"]),
                  "text": pa.array(["a b c", "d", None])})
    out = {r["lang"]: r for r in
           token_budget_stats(ray.data.from_arrow(t), ctx=2).to_pylist()}
    # en: tokens 3+1=4 → packed ceil(4/2)=2; per-doc ceil: 2+1=3 slots
    # → waste 3*2-4=2. de: null text → 0 tokens, 0 slots, 0 waste.
    assert out["en"]["total_tokens"] == 4
    assert out["en"]["packed_sequences"] == 2
    assert out["en"]["naive_pad_waste"] == 2
    assert out["de"]["total_tokens"] == 0
    assert out["de"]["packed_sequences"] == 0
    assert out["de"]["naive_pad_waste"] == 0


def test_grouped_split_is_leakage_safe_and_deterministic():
    import hashlib as hl

    import ray

    from tanml_ray.pipelines.webtext import grouped_split_stats

    groups = [f"g{i}" for i in range(40)]
    t = pa.table({"source": pa.array(groups * 3)})  # 3 docs per group
    ds = ray.data.from_arrow(t).repartition(4)
    out = {r["split"]: r for r in grouped_split_stats(ds).to_pylist()}
    # every group contributes all 3 docs to exactly one split
    assert out["train"]["n_docs"] == out["train"]["n_groups"] * 3
    assert out["test"]["n_docs"] == out["test"]["n_groups"] * 3
    assert out["train"]["n_groups"] + out["test"]["n_groups"] == 40
    # split decision matches the documented md5 rule
    n_train = sum(
        1 for g in groups
        if int.from_bytes(hl.md5(g.encode()).digest()[8:16], "little")
        % 10 < 8)
    assert out["train"]["n_groups"] == n_train


# ---------------------------------------------------------------------------
# span_dedup (C4-style global span dedup + reconstruction)
# ---------------------------------------------------------------------------

def _span_corpus():
    import ray.data as rd

    # doc 1 owns spans A,B; doc 2 repeats A then unique C; doc 3 is
    # entirely doc 1's spans (fully dropped); doc 4 repeats its own
    # span B... within itself (intra-doc dup) plus unique D.
    A = "a1 a2 a3"
    B = "b1 b2 b3"
    C = "c1 c2 c3"
    D = "d1 d2 d3"
    texts = {1: f"{A} {B}", 2: f"{A} {C}", 3: f"{B} {A}",
             4: f"{D} {B} {B}", 5: "   ", 6: None}
    tbl = pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)],
                         type=pa.string())})
    return rd.from_arrow(tbl)


def test_span_dedup_keep_first_and_reconstruct(ray_session):
    from tanml_ray.pipelines.webtext import span_dedup

    out = {r["doc_id"]: r
           for r in span_dedup(_span_corpus(), span_words=3).to_pylist()}
    # empty / null docs emit no row
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == {"doc_id": 1, "n_spans": 2, "n_kept": 2,
                      "dedup_text": "a1 a2 a3 b1 b2 b3"}
    # doc 2: span A already seen in doc 1 -> dropped, C kept
    assert out[2]["n_kept"] == 1 and out[2]["dedup_text"] == "c1 c2 c3"
    # doc 3: both spans seen -> empty reconstruction
    assert out[3]["n_kept"] == 0 and out[3]["dedup_text"] == ""
    # doc 4: B seen in doc 1; second B intra-doc dup; D kept
    assert out[4]["n_kept"] == 1 and out[4]["dedup_text"] == "d1 d2 d3"


def test_span_dedup_distributed_paths_match_broadcast(ray_session):
    from tanml_ray.pipelines.webtext import span_dedup

    bcast = span_dedup(_span_corpus(), span_words=3).to_pylist()
    dist = span_dedup(_span_corpus(), span_words=3,
                      driver_budget=0, partitions=4).to_pylist()
    assert bcast == dist


def test_span_dedup_ragged_tail_span(ray_session):
    import ray.data as rd
    from tanml_ray.pipelines.webtext import span_dedup

    # 5 words at span_words=3 -> spans "w1 w2 w3" and "w4 w5"; the
    # short tail is a first-class span and dedups across docs.
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["w1 w2 w3 w4 w5", "x1 x2 x3 w4 w5"],
                         type=pa.string())}))
    out = {r["doc_id"]: r for r in span_dedup(ds, span_words=3).to_pylist()}
    assert out[1]["n_kept"] == 2
    assert out[2]["dedup_text"] == "x1 x2 x3"


# ---------------------------------------------------------------------------
# line_dedup (CCNet-style corpus-wide duplicate-line removal)
# ---------------------------------------------------------------------------

def _line_corpus():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "alpha line\nshared boilerplate\nbeta line",
            "shared boilerplate\nunique two",
            "shared boilerplate",          # fully consumed -> empty rebuild
            "gamma\ngamma\ndelta",         # intra-doc duplicate line
        ], type=pa.string())}))


def test_line_dedup_keep_first_and_reconstruct(ray_session):
    from tanml_ray.pipelines.webtext import line_dedup

    out = {r["doc_id"]: r for r in line_dedup(_line_corpus()).to_pylist()}
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["dedup_text"] == "alpha line\nshared boilerplate\nbeta line"
    assert out[2]["n_kept"] == 1 and out[2]["dedup_text"] == "unique two"
    assert out[3]["n_kept"] == 0 and out[3]["dedup_text"] == ""
    # intra-doc dup: second "gamma" drops, first survives
    assert out[4]["n_kept"] == 2 and out[4]["dedup_text"] == "gamma\ndelta"


def test_line_dedup_distributed_paths_match_broadcast(ray_session):
    from tanml_ray.pipelines.webtext import line_dedup

    bcast = line_dedup(_line_corpus()).to_pylist()
    dist = line_dedup(_line_corpus(), driver_budget=0,
                      partitions=4).to_pylist()
    assert bcast == dist


def test_line_dedup_preserves_blank_lines(ray_session):
    """Blank lines are paragraph separators, not dedup units (CCNet
    operates on non-empty lines): every blank line survives in place,
    in every document, and counts as kept — only real duplicate lines
    drop."""
    import ray.data as rd

    from tanml_ray.pipelines.webtext import line_dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([
            "para one\n\npara two\n\npara three",
            "intro\n\npara two\n\noutro",     # 'para two' is the dup
        ], type=pa.string())}))
    out = {r["doc_id"]: r for r in line_dedup(ds).to_pylist()}
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 5
    assert out[1]["dedup_text"] == "para one\n\npara two\n\npara three"
    assert out[2]["n_lines"] == 5 and out[2]["n_kept"] == 4
    assert out[2]["dedup_text"] == "intro\n\n\noutro"


# ---------------------------------------------------------------------------
# nb_quality_scores (fastText-style NB quality classifier)
# ---------------------------------------------------------------------------

def _nb_corpus():
    import ray.data as rd

    # two clearly separable classes: "good" docs are 60 stopword-rich
    # alpha words (gopher pass); "bad" docs are short symbol strings.
    good = " ".join(["the quick brown fox jumps over and of to in"] * 6)
    bad = "zz@@ ## qq!!"
    texts = [good, good + " extra", bad, bad + " more", "", None]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


def test_nb_quality_separates_classes(ray_session):
    from tanml_ray.pipelines.webtext import nb_quality_scores

    out = {r["doc_id"]: r for r in nb_quality_scores(_nb_corpus()).take_all()}
    assert set(out) == {1, 2, 3, 4}  # token-less docs emit no row
    # labels are the gopher flags; NB trained on them must reproduce
    # the separation on this trivially separable corpus
    assert out[1]["label"] == 1 and out[3]["label"] == 0
    for d in (1, 2):
        assert out[d]["pred"] == 1 and out[d]["score"] > 0
    for d in (3, 4):
        assert out[d]["pred"] == 0 and out[d]["score"] < 0


def test_nb_quality_degenerate_labels_raise(ray_session):
    import ray.data as rd
    from tanml_ray.pipelines.webtext import nb_quality_scores

    one_class = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["zz qq", "ww ee"], type=pa.string())}))
    with pytest.raises(ValueError, match="degenerate"):
        nb_quality_scores(one_class)


def test_nb_quality_budget_guard_raises(ray_session):
    from tanml_ray.pipelines.webtext import nb_quality_scores

    with pytest.raises(ValueError, match="nb_driver_budget"):
        nb_quality_scores(_nb_corpus(), nb_driver_budget=0)


def test_ppl_tertile_buckets_ordering(ray_session):
    import ray.data as rd
    from tanml_ray.pipelines.webtext import ppl_tertile_buckets

    # common words score fluent (head); rare-word docs score tail.
    common = "aa bb " * 20
    rare_docs = [f"zz{i} qq{i} ww{i}" for i in range(4)]
    texts = [common.strip(), common.strip() + " aa"] + rare_docs
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    out = {r["doc_id"]: r for r in ppl_tertile_buckets(ds).to_pylist()}
    assert len(out) == 6
    # the common-word docs must land in a strictly better bucket than
    # every all-rare doc, and mnat must order accordingly
    order = {"head": 0, "middle": 1, "tail": 2}
    for d in (1, 2):
        for r in (3, 4, 5, 6):
            assert order[out[d]["bucket"]] < order[out[r]["bucket"]]
            assert out[d]["mnat"] < out[r]["mnat"]
    # every bucket label is valid and boundaries are honored monotonically
    ranked = sorted(out.values(), key=lambda r: r["mnat"])
    labels = [r["bucket"] for r in ranked]
    assert labels == sorted(labels, key=order.get)


def test_normalize_text_batch_rules():
    from tanml_ray.pipelines.webtext import normalize_text_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["  Café\t ÑOÑO\n über  ALL ", "ascii only", None],
                         type=pa.string())})
    out = normalize_text_batch(t).to_pylist()
    assert out[0]["norm_text"] == "cafe nono uber all"
    assert out[0]["n_chars_norm"] == len("cafe nono uber all")
    assert out[1]["norm_text"] == "ascii only"
    assert out[2]["norm_text"] == "" and out[2]["n_chars_norm"] == 0


def test_span_dedup_ascii_tokenizer_semantics(ray_session):
    import ray.data as rd
    from tanml_ray.pipelines.webtext import span_dedup

    # tab-only doc emits no row;   is NOT a separator (RE2 \S
    # matches it), so docs 2 and 3 are DIFFERENT spans and both survive
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["\t\n ", "aa bb cc", "aa bb cc"],
                         type=pa.string())}))
    out = {r["doc_id"]: r for r in span_dedup(ds, span_words=3).to_pylist()}
    assert set(out) == {2, 3}
    assert out[2]["n_kept"] == 1 and out[3]["n_kept"] == 1
    assert out[2]["dedup_text"] == "aa bb cc"


def test_nb_reserved_key_cannot_collide():
    from tanml_ray.pipelines.webtext import _NB_DOCS_KEY, _WS_TOKEN_RE

    # tokens are \S+ runs — non-empty by construction, so the empty-
    # string priors key is out-of-band for ANY document content
    assert _NB_DOCS_KEY == ""
    assert _WS_TOKEN_RE.findall("\x00__docs__ weird \x00 bytes")
    assert "" not in _WS_TOKEN_RE.findall("any text at all")


def test_source_overlap_hand_case(ray_session):
    import ray.data as rd
    from tanml_ray.pipelines.webtext import source_overlap

    # A and B share exactly one trigram; C shares nothing
    ds = rd.from_arrow(pa.table({
        "source": pa.array(["A", "A", "B", "C"]),
        "text": pa.array(["x y z p q", "x y z", "x y z r s",
                          "totally different words here"])}))
    out = {(r["sa"], r["sb"]): r for r in source_overlap(ds, n=3).to_pylist()}
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    # A's distinct trigrams: xyz, yzp, zpq -> 3; B's: xyz, yzr, zrs -> 3
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["inter"] == 1
    assert r["jaccard"] == round(1 / 5, 6)


def test_c4_line_filter_rules(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.webtext import c4_line_filter

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": pa.array([
            # 1: all rules pass — 3 punct-terminated lines survive
            "one two three.\nfour five six!\nseven eight nine?",
            # 2: javascript line + short line dropped -> only 2 kept < 3
            "one two three.\nuses JavaScript here.\nno punct line here\n"
            "ok then.",
            # 3: doc-level '{' poison — dropped whole
            "one two three.\nfour five six.\nseven eight { nine.",
            # 4: doc-level lorem ipsum poison (case-insensitive)
            "one two three.\nLorem Ipsum dolor sit.\nfour five six.",
            # 5: exactly min_kept survivors incl. quote terminator
            'he said "stop".\nshe said "go."\nthey said "wait"',
            # 6: trailing whitespace rtrim'd before the punct check
            "one two three.   \nfour five six.\nseven eight nine.",
        ], type=pa.string())}))
    out = {r["doc_id"]: r for r in c4_line_filter(docs).take_all()}
    assert set(out) == {1, 5, 6}
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["clean_text"].count("\n") == 2
    assert out[5]["n_kept"] == 3          # '"' is terminal punctuation
    assert out[6]["n_kept"] == 3
    assert out[6]["clean_text"].startswith("one two three.\n")  # rstripped
    # min_kept raised -> doc 1 (3 kept) drops too
    strict = c4_line_filter(docs, min_kept=4).take_all()
    assert strict == []


def _naive_bpe(word_counts, num_merges):
    """Independent reference: textbook BPE with Counter, no code shared
    with the engine's merge loop."""
    from collections import Counter

    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b), cnt = best
        merges.append((a, b, cnt))
        nv = {}
        for syms, c in vocab.items():
            s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    s.append(a + b); i += 2
                else:
                    s.append(syms[i]); i += 1
            nv[tuple(s)] = nv.get(tuple(s), 0) + c
        vocab = nv
    return merges


def test_bpe_train_matches_naive_reference(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.webtext import bpe_train

    # Sennrich et al. 2016's example vocabulary, expressed as a corpus
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, c in sorted(wc.items()) for _ in range(c))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([text], type=pa.string())}))
    got = bpe_train(ds, num_merges=10).to_pylist()
    want = _naive_bpe(wc, 10)
    assert [(r["left"], r["right"], r["pair_count"]) for r in got] == want
    # the paper's first merge for this vocab is ('e','s') with count 9
    assert (got[0]["left"], got[0]["right"], got[0]["pair_count"]) \
        == ("e", "s", 9)


def test_bpe_encode_roundtrip_and_stats(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.webtext import (bpe_encode_word,
                                             bpe_token_stats, bpe_train)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["the cat sat on the mat",
                          "the cat ate the rat",
                          ""], type=pa.string())})
    ds = rd.from_arrow(docs)
    merges = bpe_train(ds, num_merges=20)
    ranks = {(l, r): k for k, (l, r) in enumerate(
        zip(merges.column("left").to_pylist(),
            merges.column("right").to_pylist()))}
    # lossless: concatenated symbols reproduce word + terminal marker
    for w in ["the", "cat", "unseen"]:
        assert "".join(bpe_encode_word(w, ranks)) == w + "</w>"
    out = {r["doc_id"]: r for r in bpe_token_stats(
        ds, num_merges=20, concurrency=2).take_all()}
    assert out[1]["n_words"] == 6 and out[3]["n_words"] == 0
    assert out[3]["n_bpe_tokens"] == 0
    # merged vocab compresses: fewer bpe tokens than raw chars+markers
    raw_units = sum(len(w) + 1 for w in "the cat sat on the mat".split())
    assert out[1]["n_bpe_tokens"] < raw_units
    # frequent word "the" collapses to a single symbol
    assert bpe_encode_word("the", ranks) == ["the</w>"]


def test_bpe_budget_guard_raises(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.webtext import bpe_train

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["a b c d e"], type=pa.string())}))
    with pytest.raises(RuntimeError, match="budget"):
        bpe_train(ds, vocab_driver_budget=0)


def test_url_filter_precedence_and_rules(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.webtext import url_filter

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "url": pa.array([
            "https://www.bad.example.com/casino",   # domain wins over keyword
            "https://ok.example.com/casino/page",   # keyword
            "https://ok.example.com/" + "p" * 99,   # length
            "https://ok.example.com/fine",          # kept
            "https://bad.example.com/x",            # blocked, www-less form
        ], type=pa.string())}))
    out = {r["doc_id"]: r for r in url_filter(
        docs, blocked_domains=frozenset({"bad.example.com"}),
        banned_substrings=("casino",), max_len=60).take_all()}
    assert out[1]["reason"] == "domain"       # precedence: domain first
    assert out[1]["domain"] == "bad.example.com"   # www stripped
    assert out[2]["reason"] == "keyword"
    assert out[3]["reason"] == "length"
    assert out[4]["reason"] is None
    assert out[5]["reason"] == "domain"


def test_chunk_documents_overlap_and_edges(ray_session):
    import ray.data as rd

    from tanml_ray.pipelines.webtext import chunk_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b c d e f g", "x", ""], type=pa.string())}))
    out = chunk_documents(docs, window=4, stride=3).take_all()
    by = {(r["doc_id"], r["chunk_id"]): r for r in out}
    # doc 1: 7 words -> chunks at 0,3,6
    assert by[(1, 0)]["chunk_text"] == "a b c d"
    assert by[(1, 1)]["chunk_text"] == "d e f g"   # 1-word overlap
    assert by[(1, 2)]["chunk_text"] == "g" and by[(1, 2)]["n_words"] == 1
    # single word doc -> one short chunk; empty doc -> nothing
    assert by[(2, 0)]["chunk_text"] == "x"
    assert {k[0] for k in by} == {1, 2}
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)


def test_pack_windows_edges_and_buckets(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tanml_ray.pipelines.queries import pack_windows_documents

    texts = ["a b c d",        # exactly fills window 0 (C=4)
             "",               # empty -> 0 tokens, 0 windows
             "x",              # single token
             "t1 t2 t3 t4 t5 t6 t7",  # crosses a boundary
             "   ",            # whitespace-only -> 0 tokens
             "u1 u2 u3 u4 u5"]  # starts mid-window, spans two
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}),
        str(tmp_path / "documents.parquet"))

    C = 4
    out = {r["doc_id"]: r for r in
           pack_windows_documents(str(tmp_path), context=C,
                                  parts=3).to_pylist()}
    # brute-force expectation from a plain running sum
    run = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        r = out[i]
        assert r["n_tokens"] == n and r["start_tok"] == run
        assert r["first_window"] == run // C
        if n == 0:
            assert r["n_windows"] == 0
        else:
            assert r["n_windows"] == (run + n - 1) // C - run // C + 1
        run += n
    assert run == 17
