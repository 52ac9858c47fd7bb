"""WARC source: round-trip vs the in-repo writer (plain + gzip-member),
HTTP-envelope stripping, non-response skipping, and the distributed
read_warc → pages-schema path feeding the real validation suite."""

from __future__ import annotations

import datetime as dt
import gzip

import pyarrow as pa
import pytest

from tanml_ray.sources.warc import (parse_warc_bytes, read_warc, write_warc)


def _pages(n: int = 5) -> pa.Table:
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    return pa.table({
        "url": pa.array([f"https://ex.org/p/{i}" for i in range(n)]),
        "warc_ts": pa.array([base + dt.timedelta(hours=i) for i in range(n)],
                            type=pa.timestamp("us")),
        "html": pa.array([f"<html><body><p>page {i} é</p></body></html>"
                          .encode("utf-8") for i in range(n)],
                         type=pa.binary()),
    })


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(tmp_path, gz):
    t = _pages(5)
    p = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc(p, t, gzip_members=gz)
    out = parse_warc_bytes(open(p, "rb").read())
    assert out.column("url").to_pylist() == t.column("url").to_pylist()
    assert out.column("warc_ts").to_pylist() == t.column("warc_ts").to_pylist()
    assert out.column("html").to_pylist() == t.column("html").to_pylist()


def test_skips_warcinfo_and_request_records(tmp_path):
    t = _pages(2)
    p = str(tmp_path / "m.warc")
    write_warc(p, t)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://ex.org/p/0\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
    data = info + req + open(p, "rb").read()
    out = parse_warc_bytes(data)
    assert out.num_rows == 2
    assert out.column("url").to_pylist() == t.column("url").to_pylist()


def test_http_envelope_stripped_payload_binary_exact():
    html = bytes(range(256))  # arbitrary binary payload survives
    http = (b"HTTP/1.1 200 OK\r\nX-H: 1\r\n\r\n" + html)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: u\r\nWARC-Date: 2024-01-02T03:04:05Z\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           + http + b"\r\n\r\n")
    out = parse_warc_bytes(rec)
    assert out.column("html").to_pylist() == [html]
    assert out.column("warc_ts").to_pylist() == [
        dt.datetime(2024, 1, 2, 3, 4, 5)]


def test_warc11_fractional_second_dates_parse():
    """WARC 1.1 allows fractional seconds (legal in real crawls) —
    these must parse to microsecond precision, not silently null."""
    body = b"x"
    rec = (b"WARC/1.1\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: u\r\n"
           b"WARC-Date: 2024-01-02T03:04:05.123456789Z\r\n"
           b"Content-Length: 1\r\n\r\n" + body + b"\r\n\r\n")
    out = parse_warc_bytes(rec)
    assert out.column("warc_ts").to_pylist() == [
        dt.datetime(2024, 1, 2, 3, 4, 5, 123456)]  # truncated to us


def test_malformed_raises():
    with pytest.raises(ValueError, match="WARC"):
        parse_warc_bytes(b"GARBAGE NOT A WARC")


def test_read_warc_distributed_to_validation(tmp_path, ray_session):
    # two files → two parse tasks → schema matches the pages contract
    for j in range(2):
        write_warc(str(tmp_path / f"seg{j}.warc.gz"), _pages(4),
                   gzip_members=True)
    ds = read_warc([str(tmp_path / "seg0.warc.gz"),
                    str(tmp_path / "seg1.warc.gz")])
    got = ds.take_all()
    assert len(got) == 8
    assert set(got[0]) == {"url", "warc_ts", "html"}
    # html binary flows into the extraction kernel unchanged
    from tanml_ray.functions.html_text import extract_text

    texts = [extract_text(r["html"]) for r in got]
    assert all("page" in t for t in texts)


def test_cli_ingest_warc_to_validation(tmp_path, ray_session, capsys):
    import json

    import pyarrow.dataset as pads

    from tanml_ray.cli import main

    wdir = tmp_path / "crawl"
    wdir.mkdir()
    for j in range(2):
        write_warc(str(wdir / f"seg{j}.warc.gz"), _pages(5),
                   gzip_members=True)
    out = str(tmp_path / "pages_pq")
    rc = main(["ingest-warc", "--input", str(wdir), "--out", out,
               "--langid"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["files_in"] == 2 and info["rows"] == 10
    t = pads.dataset(out).to_table()
    assert set(t.column_names) == {"url", "warc_ts", "html", "text",
                                   "lang"}
    assert all("page" in x for x in t.column("text").to_pylist())
    # landed parquet feeds the flagship validation suite directly
    from tanml_ray.pipelines.validate import run_pages_validation

    report = run_pages_validation(out)
    assert report.status.num_rows > 0
