"""Deterministic Common-Crawl-style `pages` fixture (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Derived as a pure per-row function of the driver-provided `documents`
table (doc_id, text, lang) — no external data, no RNG state: every
field is a function of a stable 64-bit hash of the page id, so any
partitioning / task placement yields byte-identical rows. Injected
defects (all deterministic by id):

    id % 200 == 7    → duplicate url (url of id-1)        ~0.5%
    id % 1000 == 13  → warc_ts out of range (year 1995)   ~0.1%
    id % 500 == 3    → html null                          ~0.2%
    id % 500 == 11   → text null                          ~0.2%
    id % 700 == 17   → text tampered (extraction mismatch)~0.14%
    id % 300 == 5    → lang invalid ("xx")                ~0.33%

`variant="current"` applies a drift shift for the PSI/KS suite:
text-length +padding for lang es/de and an en→es language-mix shift
(FIXTURES.md drift pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tanml_ray.functions.html_text import render_html
from tanml_ray.sources.ingest import read_parquet_clean

TS_BASE_US = np.int64(pd.Timestamp("2025-01-01").value // 1000)   # timestamp[us]
TS_END_US = np.int64(pd.Timestamp("2025-04-01").value // 1000)    # valid range end
_DAY_US = np.int64(86_400_000_000)
_HOTSPOT_DAYS = np.array([12, 45, 67], dtype=np.int64)  # crawl-burst days

PAGES_SCHEMA = pa.schema([
    ("page_id", pa.int64()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _stable_hash_ids(ids: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(ids.astype(np.int64))


def _urls_for(ids: np.ndarray) -> np.ndarray:
    h = _stable_hash_ids(ids)
    hosts = h % np.uint64(997)
    return np.array([f"https://site{host}.example.com/p/{i}"
                     for host, i in zip(hosts, ids)], dtype=object)


def _timestamps_for(ids: np.ndarray) -> np.ndarray:
    """timestamp[us] int64 values; hotspot bursts + 0.1% out-of-range."""
    h = _stable_hash_ids(ids)
    day = (h >> np.uint64(13)) % np.uint64(90)
    burst = (h >> np.uint64(10)) % np.uint64(10) < 3   # 30% of pages ...
    hot = _HOTSPOT_DAYS[((h >> np.uint64(20)) % np.uint64(3)).astype(np.int64)]
    day = np.where(burst, hot.astype(np.uint64), day)  # ... land on 3 hot days
    within = h % np.uint64(86_400_000_000)
    ts = TS_BASE_US + day.astype(np.int64) * _DAY_US + within.astype(np.int64)
    oor = (ids % 1000) == 13
    ts = np.where(oor, np.int64(pd.Timestamp("1995-01-01").value // 1000)
                  + (ids % 86_400) * np.int64(1_000_000), ts)
    return ts


def make_pages_batch(batch: pa.Table, variant: str = "baseline",
                     repeat: int = 1) -> pa.Table:
    """documents(doc_id, text, lang) → pages; pure, vectorized where
    the work is columnar (ids, hashes, timestamps), per-row only for
    the HTML templating that defines the extraction invariant."""
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()

    if repeat > 1:
        doc_ids = np.repeat(doc_ids * repeat, repeat) + np.tile(np.arange(repeat), len(texts))
        texts = [t for t in texts for _ in range(repeat)]
        langs = [l for l in langs for _ in range(repeat)]

    ids = doc_ids.astype(np.int64)
    n = len(ids)

    langs = np.array(langs, dtype=object)
    if variant == "current":
        # lang-mix shift: 1 in 6 en pages become es (en 60%→50%-ish)
        remap = (ids % 6 == 0) & (langs == "en")
        langs = np.where(remap, "es", langs)
    langs = np.where(ids % 300 == 5, "xx", langs)

    urls = _urls_for(ids)
    dup = ids % 200 == 7
    if dup.any():
        urls[dup] = _urls_for(ids[dup] - 1)

    ts = _timestamps_for(ids)

    html_null = ids % 500 == 3
    text_null = ids % 500 == 11
    tampered = ids % 700 == 17

    # deterministic outlink targets for the link-graph operators: every
    # page links one site host, 1 in 3 add a second, 1 in 11 link the
    # hub — all pure functions of the stable id hash, invisible to text
    # extraction (they live in <nav>, outside <title>/<p>)
    h = _stable_hash_ids(ids)
    link_a = (h >> np.uint64(5)) % np.uint64(997)
    link_b = (h >> np.uint64(27)) % np.uint64(997)
    second = (h % np.uint64(3)) == 0
    to_hub = (h % np.uint64(11)) == 0

    htmls: list[bytes | None] = []
    out_texts: list[str | None] = []
    for i in range(n):
        pid = ids[i]
        title = f"Doc {pid}"
        body = texts[i] if texts[i] is not None else ""
        if variant == "current" and langs[i] in ("es", "de"):
            # text-length distribution shift (+0.5σ-ish): deterministic padding
            body = body + " drift-pad" * (3 + int(pid % 5))
        extracted = f"{title}\n{body}"
        if html_null[i]:
            htmls.append(None)
        else:
            nav = (f'<nav><a href="//site{link_a[i]}.example.com/'
                   f'{pid % 9999}"></a>')
            if second[i]:
                nav += (f'<a href="//site{link_b[i]}.example.com/'
                        f'{(pid * 13) % 9999}"></a>')
            if to_hub[i]:
                nav += '<a href="//hub.example.com/"></a>'
            nav += "</nav>"
            head = ('<meta name="robots" content="noindex,nofollow">'
                    if pid % 97 == 19 else "")
            htmls.append(render_html(title, body, nav, head))
        if text_null[i]:
            out_texts.append(None)
        elif tampered[i]:
            out_texts.append(extracted + " ")
        else:
            out_texts.append(extracted)

    return pa.Table.from_arrays([
        pa.array(ids, type=pa.int64()),
        pa.array(urls, type=pa.string()),
        pa.array(ts, type=pa.timestamp("us")),
        pa.array(htmls, type=pa.binary()),
        pa.array(out_texts, type=pa.string()),
        pa.array(langs.tolist(), type=pa.string()),
    ], schema=PAGES_SCHEMA)


def pages_dataset(sf_dir: str, variant: str = "baseline", repeat: int = 1,
                  override_num_blocks: int | None = None):
    """Lazy Ray Dataset of synthetic pages derived from sf_dir/documents."""
    import ray.data as rd

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"],
                         override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: make_pages_batch(b, variant=variant, repeat=repeat),
        batch_format="pyarrow",
    )


# bump when make_pages_batch output changes so cached /tmp fixtures
# from older code can never be read by newer consumers (v2: <nav>
# outlink anchors for the link-graph operators; v3: outlinks target
# the source host namespace so the graph is closed — multi-hop
# PageRank structure instead of an all-dangling bipartite graph;
# v4: robots-noindex meta on id % 97 == 19 pages for the crawl
# index-policy filter)
PAGES_FIXTURE_VERSION = 4


def synthesize_pages_parquet(sf_dir: str, out_dir: str, variant: str = "baseline",
                             repeat: int = 1, num_files: int = 8) -> str:
    """Materialize the fixture to parquet (cached) for DuckDB oracles
    and repeated bench runs. Idempotent per (sf_dir, variant, repeat,
    PAGES_FIXTURE_VERSION)."""
    import os

    out_dir = f"{out_dir.rstrip('/')}_v{PAGES_FIXTURE_VERSION}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds = pages_dataset(sf_dir, variant=variant, repeat=repeat)
    ds = ds.repartition(num_files)
    ds.write_parquet(out_dir)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
