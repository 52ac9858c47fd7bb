"""Deterministic html→text extraction — the flagship per-row invariant.

BASELINE.json `input_hint` mandates byte-identical extracted text per
url. This is a FROZEN, versioned kernel (SURVEY.md §7.5 item 4): pure
function of the html bytes — no locale, no dict ordering, no float
formatting. Nearest reference analog is the deterministic cast helper
`_safe_numeric_cast_df` (/root/reference/tanml/checks/explainability/
shap_check.py:15-24); the reference itself has no HTML parser.

Extraction semantics v1 (EXTRACTOR_VERSION):
  1. decode utf-8 (errors="replace")
  2. take the first <title>…</title> block (dotall) if present
  3. take every <p>…</p> block in document order (dotall)
  4. strip any remaining tags inside each block
  5. html-unescape the five XML entities (&lt; &gt; &quot; &#39; &amp;
     — &amp; last, the exact inverse of escape)
  6. join [title] + paragraphs with "\n"
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

EXTRACTOR_VERSION = 1

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_TAG_RE = re.compile(r"<[^>]*>")


def escape_text(s: str) -> str:
    """The inverse used by the fixture generator (amp first)."""
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&#39;"))


def _unescape(s: str) -> str:
    return (s.replace("&lt;", "<").replace("&gt;", ">")
            .replace("&quot;", '"').replace("&#39;", "'").replace("&amp;", "&"))


def extract_text(html: bytes | None) -> str | None:
    """Pure deterministic extraction; None in → None out."""
    if html is None:
        return None
    parts: list[str] = []
    m = _TITLE_RE.search(html)
    if m:
        parts.append(m.group(1).decode("utf-8", errors="replace"))
    for p in _P_RE.finditer(html):
        parts.append(p.group(1).decode("utf-8", errors="replace"))
    # guarded no-op passes: tag-strip / unescape only when the trigger
    # character is present (most blocks have neither) — byte-identical
    # output, ~2× fewer passes on typical pages
    cleaned = []
    for p in parts:
        if "<" in p:
            p = _TAG_RE.sub("", p)
        if "&" in p:
            p = _unescape(p)
        cleaned.append(p)
    return "\n".join(cleaned)


def extract_text_array(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Batch extraction over an Arrow binary column → string array.

    Per-row regex is inherent to HTML parsing; the patterns are
    compiled once per worker process at module import, and the loop
    runs over a single materialized buffer view (no per-row Arrow
    round-trips).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    raw = html_col.to_pylist()
    return pa.array([extract_text(h) for h in raw], type=pa.string())


def render_html(title: str, body: str, nav: str = "",
                head: str = "") -> bytes:
    """Fixture-side template; extract_text(render_html(t, b, nav, head))
    == t+"\n"+b for ANY nav/head block — extraction reads only <title>
    and <p> elements, so outlink anchors in <nav> and meta tags in
    <head> are invisible to the text invariant (they exist for the
    link-graph / index-policy operators)."""
    return (f"<html><head><title>{escape_text(title)}</title>{head}</head>"
            f"<body><p>{escape_text(body)}</p>{nav}</body></html>"
            ).encode("utf-8")
