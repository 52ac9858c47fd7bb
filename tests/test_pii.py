"""PII detection/redaction kernels (functions/pii.py)."""

from __future__ import annotations

import re

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tanml_ray.functions.pii import (PII_PATTERNS, REDACTION_ORDER,
                                     pii_counts_batch, redact_batch,
                                     redact_pii, scan_pii)


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts)})


SAMPLES = [
    "contact user5@mail3.example.com ip 10.42.0.7 phone 555-123-4567",
    "no pii here at all",
    "two mails a@b.co c.d@e.org and ssn 123-45-6789 ip 255.255.255.255",
    "edge a@b.c ip 1.2.3.4.5 phone 555.123.4567 and 12-34-5678",
    "",
]


def test_counts_match_python_re():
    out = pii_counts_batch(_tbl(SAMPLES)).to_pylist()
    for row, text in zip(out, SAMPLES):
        for kind, pat in PII_PATTERNS.items():
            assert row[f"n_{kind}"] == len(re.findall(pat, text)), (kind, text)
        assert row["pii_total"] == sum(row[f"n_{k}"] for k in PII_PATTERNS)


def test_redaction_masks_all_patterns():
    red = redact_batch(_tbl(SAMPLES)).to_pylist()
    full = red[0]["text"]
    assert full == "contact <EMAIL> ip <IP> phone <PHONE>"
    assert red[1]["text"] == SAMPLES[1]
    assert "<SSN>" in red[2]["text"] and "<EMAIL>" in red[2]["text"]
    for row in red:
        assert row["redacted_len"] == len(row["text"])
    # a redacted batch has zero remaining matches
    clean = pii_counts_batch(redact_batch(_tbl(SAMPLES)))
    assert sum(clean.column("pii_total").to_pylist()) == 0


def test_redaction_order_is_deterministic():
    # an SSN-shaped string inside phone-dense text must become <SSN>
    # (ssn is applied before phone in REDACTION_ORDER)
    assert [k for k, _ in REDACTION_ORDER] == ["email", "ssn", "phone", "ipv4"]
    t = redact_batch(_tbl(["id 123-45-6789 tel 555-123-4567"])).to_pylist()
    assert t[0]["text"] == "id <SSN> tel <PHONE>"


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii",
                                      categories=("L", "N", "P", "Z")),
               max_size=80))
def test_counts_match_python_re_property(s):
    row = pii_counts_batch(_tbl([s])).to_pylist()[0]
    for kind, pat in PII_PATTERNS.items():
        assert row[f"n_{kind}"] == len(re.findall(pat, s))


@pytest.mark.usefixtures("ray_session")
def test_dataset_scan_and_redact(sf_dir):
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    counts = scan_pii(ds).take_all()
    assert all(r["pii_total"] == 0 for r in counts)  # synthetic corpus
    red = redact_pii(ds.limit(20)).take_all()
    assert len(red) == 20 and all("redacted_len" in r for r in red)
