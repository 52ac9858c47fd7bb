"""Extractor determinism + byte-identical invariant (BASELINE input_hint)."""

from __future__ import annotations

import pyarrow as pa

from tanml_ray.functions.html_text import (
    escape_text,
    extract_text,
    extract_text_array,
    render_html,
)


class TestExtractText:
    def test_roundtrip_byte_identical(self):
        cases = [
            ("Doc 1", "hello world"),
            ("T & T", 'with <angle> & "quotes" and \'apostrophes\''),
            ("Üñíçødé", "日本語テキスト ≤≥ émojis 🎉"),
            ("", ""),
            ("multi", "line one\nline two\ttabbed"),
        ]
        for title, body in cases:
            html = render_html(title, body)
            assert extract_text(html) == f"{title}\n{body}"

    def test_none_in_none_out(self):
        assert extract_text(None) is None

    def test_deterministic(self):
        html = render_html("t", "b" * 1000)
        assert extract_text(html) == extract_text(html)

    def test_multiple_paragraphs(self):
        html = b"<html><head><title>T</title></head><body><p>a</p><p>b</p></body></html>"
        assert extract_text(html) == "T\na\nb"

    def test_no_title(self):
        assert extract_text(b"<html><body><p>only</p></body></html>") == "only"

    def test_nested_tags_stripped(self):
        html = b"<html><head><title>T</title></head><body><p>a <b>bold</b> c</p></body></html>"
        assert extract_text(html) == "T\na bold c"

    def test_escape_unescape_inverse(self):
        s = "a&b<c>d\"e'f&amp;g"
        html = render_html("t", s)
        assert extract_text(html) == f"t\n{s}"

    def test_array_matches_scalar(self):
        htmls = [render_html(f"t{i}", f"body {i}") for i in range(10)] + [None]
        arr = pa.array(htmls, type=pa.binary())
        out = extract_text_array(arr).to_pylist()
        assert out == [extract_text(h) for h in htmls]


class TestExtractorProperty:
    """Fuzz the frozen extraction kernel: render→extract must be the
    identity for ANY title/body text (the BASELINE byte-identity
    invariant, hypothesis-fuzzed over unicode incl. HTML specials)."""

    def test_roundtrip_fuzz(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        text_strategy = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=300)

        @settings(max_examples=200, deadline=None)
        @given(title=text_strategy, body=text_strategy)
        def check(title, body):
            html = render_html(title, body)
            assert extract_text(html) == f"{title}\n{body}"

        check()

    def test_adversarial_html_like_bodies(self):
        cases = [
            "<p>nested paragraph markers</p>",
            "</title><script>alert(1)</script>",
            "&amp;&lt;&gt;&quot;&#39;",
            "<html><body>full doc inside body</body></html>",
            "a\x00b",            # NUL byte
            "line\r\nwindows newline",
        ]
        for body in cases:
            html = render_html("T", body)
            assert extract_text(html) == f"T\n{body}", repr(body)


class TestPagesFixtureV4:
    """The v4 fixture's <nav> outlinks and <head> meta tags must be
    invisible to the extraction invariant, deterministic per id, and
    parse back with the link-graph regexes."""

    def _pages(self, ids):
        import pyarrow as pa

        from tanml_ray.sources.pages import make_pages_batch

        docs = pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([f"body {i}" for i in ids]),
            "lang": pa.array(["en"] * len(ids))})
        return make_pages_batch(docs)

    def test_extraction_invariant_survives_nav_and_head(self):
        from tanml_ray.functions.html_text import extract_text

        pages = self._pages([1, 2, 19, 116, 213])  # 19+97k = noindex ids
        for r in pages.to_pylist():
            if r["html"] is not None and r["text"] is not None \
                    and r["page_id"] % 700 != 17:
                assert extract_text(r["html"]) == r["text"]

    def test_links_deterministic_and_parseable(self):
        import re

        pages_a = self._pages(list(range(40)))
        pages_b = self._pages(list(range(40)))
        assert pages_a.equals(pages_b)
        href = re.compile(rb'href="//([^/"]+)/')
        hosts = set()
        for r in pages_a.to_pylist():
            if r["html"] is None:
                continue
            found = href.findall(r["html"])
            assert 1 <= len(found) <= 3
            hosts.update(found)
        assert all(h == b"hub.example.com" or
                   (h.startswith(b"site") and h.endswith(b".example.com"))
                   for h in hosts)

    def test_noindex_meta_on_exact_id_subset(self):
        pages = self._pages(list(range(300)))
        needle = b'<meta name="robots" content="noindex'
        for r in pages.to_pylist():
            if r["html"] is None:
                continue
            assert (needle in r["html"]) == (r["page_id"] % 97 == 19)
