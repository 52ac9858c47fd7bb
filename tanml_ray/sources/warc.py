"""Dependency-free WARC reader → the flagship pages table.

Common-Crawl-style corpora ship as WARC (ISO 28500 / the public
WARC/1.0 spec): concatenated records, each `WARC/1.0\\r\\n` + header
lines + `\\r\\n\\r\\n` + Content-Length payload bytes + `\\r\\n\\r\\n`.
Crawl archives gzip each record as its own member, so a `.warc.gz` is
a concatenation of gzip members — stdlib `gzip.decompress` handles
multi-member streams.

This module parses `response` records into the engine's declared pages
schema (BASELINE.json input_hint): url = WARC-Target-URI, warc_ts =
WARC-Date (timestamp[us]), html = the HTTP response body (binary,
HTTP headers stripped). The reference has no WARC path (its loaders
are file-per-table tabular, utils/data_loader.py:59-159); this source
exists because the 10^12-row flagship input is crawl data, and landing
it as Parquet requires reading WARC once.

Scale shape: `read_warc(paths)` is `ray.data.read_binary_files` (one
task per file — WARC members are not splittable mid-file without an
index, the same contract Common Crawl's own tooling uses) followed by
a `map_batches` parser, so N files parse with N-way parallelism and
stream straight into `write_parquet` / the validation suite without
driver materialization. Typical crawl segments are ~1 GB compressed —
one file per block is the right granularity.
"""

from __future__ import annotations

import gzip
import io

import pyarrow as pa

_PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
])


def _parse_warc_stream(buf: bytes) -> list[dict]:
    """Parse concatenated WARC/1.0 records; return response records as
    {url, warc_ts, html} dicts. Tolerates leading whitespace between
    records and skips non-response record types (warcinfo, request,
    metadata)."""
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(
                f"malformed WARC stream at offset {pos}: expected a "
                "WARC/ version line")
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC record header")
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        body = buf[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        # response payload is an HTTP message: strip the status line +
        # headers; records written without an HTTP envelope (identity
        # content-type) keep the whole body
        html = body
        if body.startswith(b"HTTP/"):
            sep = body.find(b"\r\n\r\n")
            if sep >= 0:
                html = body[sep + 4:]
        out.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "html": html,
        })
    return out


def parse_warc_bytes(data: bytes) -> pa.Table:
    """bytes of a .warc or .warc.gz stream → pages-schema Table."""
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: decompress members until the buffer ends
        parts = []
        with io.BytesIO(data) as raw:
            while True:
                start = raw.tell()
                if start >= len(data):
                    break
                with gzip.GzipFile(fileobj=raw) as g:
                    parts.append(g.read())
                # GzipFile stops at member end; loop for the next one
        data = b"".join(parts)
    rows = _parse_warc_stream(data)
    import pyarrow.compute as pc

    # WARC 1.0 dates are second-granular; WARC 1.1 allows fractional
    # seconds (2024-01-01T00:00:00.123Z — legal and present in real
    # crawls). Arrow strptime has no fractional-seconds directive, so
    # split any ".ddd" off the second field and re-add it as a
    # microsecond duration instead of silently nulling those records.
    base: list[str | None] = []
    frac_us: list[int] = []
    for r in rows:
        s = r["warc_ts"] or None
        if s and s.endswith("Z") and "." in s:
            head, _, tail = s.partition(".")
            digits = tail[:-1]
            if digits.isdigit():
                base.append(head + "Z")
                frac_us.append(int((digits + "000000")[:6]))
                continue
        base.append(s)
        frac_us.append(0)
    parsed = pc.strptime(pa.array(base, type=pa.string()),
                         format="%Y-%m-%dT%H:%M:%SZ", unit="us",
                         error_is_null=True)
    parsed = pc.add(parsed, pa.array(frac_us, type=pa.duration("us")))

    return pa.table({
        "url": pa.array([r["url"] for r in rows], type=pa.string()),
        "warc_ts": pc.cast(parsed, pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], type=pa.binary()),
    })


def read_warc(paths: str | list[str]):
    """Distributed WARC → Dataset[url, warc_ts, html] (one parse task
    per file; html stays binary — text extraction is the downstream
    `extract_text_array` stage, as for parquet-landed pages)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, file_extensions=None)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_bytes(b.as_py() if hasattr(b, "as_py") else b)
                  for b in batch.column("bytes")]
        if not tables:
            return _PAGES_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_warc(path: str, pages: pa.Table, gzip_members: bool = False) -> None:
    """Test-fixture WARC writer: one response record per pages row
    (HTTP envelope included, like real crawl data). With
    `gzip_members`, each record is its own gzip member — the crawl
    archive layout."""
    chunks: list[bytes] = []
    for i in range(pages.num_rows):
        url = pages.column("url")[i].as_py()
        ts = pages.column("warc_ts")[i].as_py()
        html = pages.column("html")[i].as_py() or b""
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(html)).encode() +
                b"\r\n\r\n" + html)
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
               f"Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        rec = hdr + http + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
