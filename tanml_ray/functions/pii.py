"""PII detection and redaction over web-text corpora.

A standard LLM training-data curation stage (C4, Rae et al. 2021 §A1.2,
BigScience ROOTS redaction): count and mask emails, North-American
phone numbers, IPv4 addresses and SSN-shaped ids in a text column.
The reference has no PII surface — this extends its per-record
normalizer family (reference tanml/tanml/utils/data_loader.py:55-60's
column normalization role) to content-level hygiene.

Scale notes:
- Detection and redaction are single-pass RE2 kernels
  (`pc.count_substring_regex` / `pc.replace_substring_regex`) over the
  Arrow string column — zero Python per row, and DuckDB's regexp
  functions use the same RE2 engine so the SQL oracle reproduces both
  the counts and the post-redaction byte lengths exactly.
- Patterns are RE2-safe (no backrefs/lookaround) by construction.
- Redaction order is fixed (email, ssn, phone, ipv4) so nested matches
  (an SSN inside a longer digit run, dots shared with IPs) resolve
  deterministically; the oracle applies the identical sequence.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible patterns; keep in sync with the SQL oracle literals.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# (pattern key, replacement token) in the order redaction is applied.
REDACTION_ORDER: list[tuple[str, str]] = [
    ("email", "<EMAIL>"),
    ("ssn", "<SSN>"),
    ("phone", "<PHONE>"),
    ("ipv4", "<IP>"),
]


def pii_counts_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id",
                     kinds: tuple[str, ...] = ("email", "phone", "ipv4",
                                               "ssn")) -> pa.Table:
    """Per-document match counts for each PII kind plus a total.

    One RE2 scan per kind per batch; output columns are named
    ``n_<kind>`` plus ``pii_total``.
    """
    text = batch.column(text_col)
    cols: dict[str, pa.Array] = {id_col: batch.column(id_col)}
    total = None
    for kind in kinds:
        n = pc.cast(pc.count_substring_regex(text, PII_PATTERNS[kind]),
                    pa.int64())
        cols[f"n_{kind}"] = n
        total = n if total is None else pc.add(total, n)
    cols["pii_total"] = total
    return pa.table(cols)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace every PII match with its token, in REDACTION_ORDER.

    Returns the batch with ``text_col`` replaced by the redacted text
    and an extra ``redacted_len`` column (post-redaction char length).
    """
    red = batch.column(text_col)
    for kind, token in REDACTION_ORDER:
        red = pc.replace_substring_regex(red, PII_PATTERNS[kind], token)
    idx = batch.schema.get_field_index(text_col)
    out = batch.set_column(idx, text_col, red)
    return out.append_column(
        "redacted_len", pc.cast(pc.utf8_length(red), pa.int64()))


def scan_pii(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset → per-doc PII counts (streaming, stateless map)."""
    return ds.map_batches(
        lambda b: pii_counts_batch(b, text_col, id_col),
        batch_format="pyarrow")


def redact_pii(ds, text_col: str = "text"):
    """Dataset → same rows with ``text_col`` redacted in place."""
    return ds.map_batches(lambda b: redact_batch(b, text_col),
                          batch_format="pyarrow")
