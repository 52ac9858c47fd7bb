"""Row-level constraint predicates — vectorized over Arrow batches.

The reference's data-quality checks are whole-DataFrame pandas ops
(missingness /root/reference/tanml/ui/views/profiling.py:85-102,
schema consistency ui/services/data.py:51-72). Here each constraint is
a vectorized predicate over one `pa.Table` batch returning a violation
mask; violations become rows `(constraint_id, url, offending_value)`
per BASELINE.json north_rule. Evaluation is embarrassingly parallel —
no shuffle; the only constraint needing one (uniqueness) lives in
pipelines/validate.py as a groupby.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

from tanml_ray.functions.html_text import extract_text_array
from tanml_ray.functions.langcodes import ISO_639_1


class RowConstraint(ABC):
    constraint_id: str

    @abstractmethod
    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        """True where the row VIOLATES the constraint."""

    def offending_values(self, batch: pa.Table, mask: pa.BooleanArray) -> pa.Array:
        """String rendering of the offending value for the report."""
        col = getattr(self, "column", None)
        if col is None or col not in batch.column_names:
            return pa.nulls(pc.sum(mask).as_py() or 0, type=pa.string())
        vals = batch.column(col).filter(mask)
        return pc.cast(vals, pa.string(), safe=False)


class NotNull(RowConstraint):
    """html/text non-null rules (north_star)."""

    def __init__(self, column: str):
        self.column = column
        self.constraint_id = f"not_null_{column}"

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        return pc.is_null(batch.column(self.column)).combine_chunks()

    def offending_values(self, batch, mask):
        n = pc.sum(mask).as_py() or 0
        return pa.array(["<null>"] * n, type=pa.string())


class TimestampRange(RowConstraint):
    """warc_ts ∈ [lo, hi) (north_star). Null passes (NotNull owns nulls)."""

    def __init__(self, column: str, lo, hi):
        self.column = column
        self.lo, self.hi = lo, hi
        self.constraint_id = f"range_{column}"

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        col = batch.column(self.column)
        lo = pa.scalar(self.lo, type=col.type)
        hi = pa.scalar(self.hi, type=col.type)
        bad = pc.or_(pc.less(col, lo), pc.greater_equal(col, hi))
        return pc.fill_null(bad, False).combine_chunks()


class ReferentialSet(RowConstraint):
    """col value ∈ small dimension set, broadcast — the J3 anti-join.

    The valid set ships once per worker inside the stage closure /
    actor state (ray.put'd by the pipeline), never shuffled.
    """

    def __init__(self, column: str, valid_values: Iterable[str], name: str | None = None):
        self.column = column
        self.valid = pa.array(sorted(set(valid_values)), type=pa.string())
        self.constraint_id = name or f"referential_{column}"

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        col = batch.column(self.column)
        found = pc.is_in(col, value_set=self.valid)
        # null col value → not a referential violation (NotNull's job)
        bad = pc.and_(pc.invert(found), pc.is_valid(col))
        return pc.fill_null(bad, False).combine_chunks()


class RegexMatch(RowConstraint):
    """Column must fully match a pattern (e.g. url format)."""

    def __init__(self, column: str, pattern: str, name: str | None = None):
        self.column = column
        self.pattern = pattern
        self.constraint_id = name or f"format_{column}"

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        col = batch.column(self.column)
        ok = pc.match_substring_regex(col, self.pattern)
        bad = pc.and_(pc.invert(ok), pc.is_valid(col))
        return pc.fill_null(bad, False).combine_chunks()


class ExtractionMatch(RowConstraint):
    """The BASELINE per-row invariant: extract_text(html) must equal
    `text` byte-for-byte wherever both are non-null."""

    constraint_id = "text_extraction_match"
    column = "url"

    def __init__(self, html_col: str = "html", text_col: str = "text"):
        self.html_col = html_col
        self.text_col = text_col

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        html = batch.column(self.html_col)
        text = batch.column(self.text_col)
        both = pc.and_(pc.is_valid(html), pc.is_valid(text))
        extracted = extract_text_array(html)
        neq = pc.not_equal(extracted, pc.cast(text, pa.string()))
        bad = pc.and_(pc.fill_null(neq, True), both)
        return pc.fill_null(bad, False).combine_chunks()

    def offending_values(self, batch, mask):
        vals = batch.column(self.text_col).filter(mask)
        return pc.cast(vals, pa.string(), safe=False)


class LengthRange(RowConstraint):
    """String byte/char length bounds (e.g. text length sanity caps —
    the DQ guard against empty-extraction and runaway-document rows).
    Null passes (NotNull owns nulls)."""

    def __init__(self, column: str, lo: int = 0, hi: int | None = None,
                 name: str | None = None):
        self.column = column
        self.lo, self.hi = lo, hi
        self.constraint_id = name or f"length_{column}"

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        col = batch.column(self.column)
        n = pc.utf8_length(col)
        bad = pc.less(n, self.lo)
        if self.hi is not None:
            bad = pc.or_(bad, pc.greater(n, self.hi))
        bad = pc.and_(bad, pc.is_valid(col))
        return pc.fill_null(bad, False).combine_chunks()


class CrossField(RowConstraint):
    """Ordering between two columns (left OP right), the standard
    cross-field DQ check (e.g. fetch_ts <= publish_ts). Rows where
    either side is null pass (NotNull owns nulls). op is one of
    le / lt / ge / gt / eq / ne."""

    _OPS = {"le": pc.less_equal, "lt": pc.less, "ge": pc.greater_equal,
            "gt": pc.greater, "eq": pc.equal, "ne": pc.not_equal}

    def __init__(self, left: str, op: str, right: str,
                 name: str | None = None):
        if op not in self._OPS:
            raise ValueError(f"unknown op {op!r}; one of {sorted(self._OPS)}")
        self.column = left
        self.left, self.op, self.right = left, op, right
        self.constraint_id = name or f"cross_{left}_{op}_{right}"

    def violation_mask(self, batch: pa.Table) -> pa.BooleanArray:
        a = batch.column(self.left)
        b = batch.column(self.right)
        ok = self._OPS[self.op](a, b)
        both = pc.and_(pc.is_valid(a), pc.is_valid(b))
        bad = pc.and_(pc.fill_null(pc.invert(ok), False), both)
        return pc.fill_null(bad, False).combine_chunks()


def default_pages_constraints() -> list[RowConstraint]:
    """The north_star constraint suite for the pages table."""
    import pandas as pd

    return [
        NotNull("html"),
        NotNull("text"),
        TimestampRange("warc_ts", pd.Timestamp("2025-01-01"), pd.Timestamp("2025-04-01")),
        ReferentialSet("lang", ISO_639_1, name="referential_lang"),
        RegexMatch("url", r"^https?://", name="format_url"),
        ExtractionMatch(),
    ]


def evaluate_constraints(batch: pa.Table, constraints: list[RowConstraint],
                         key_col: str = "url") -> tuple[pa.Table, dict[str, int]]:
    """Evaluate all constraints on one batch → (violations table, counts).

    violations schema: constraint_id:string, url:string, offending_value:string
    """
    v_cid: list[str] = []
    v_url: list = []
    v_val: list = []
    counts: dict[str, int] = {}
    keys = batch.column(key_col)
    for c in constraints:
        mask = c.violation_mask(batch)
        n = pc.sum(mask).as_py() or 0
        counts[c.constraint_id] = n
        if n:
            v_cid.extend([c.constraint_id] * n)
            v_url.append(keys.filter(mask))
            v_val.append(c.offending_values(batch, mask))
    if v_cid:
        urls = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                                 else a for a in v_url])
        vals = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                                 else a for a in v_val])
        table = pa.Table.from_arrays(
            [pa.array(v_cid, type=pa.string()),
             pc.cast(urls, pa.string()),
             pc.cast(vals, pa.string())],
            names=["constraint_id", "url", "offending_value"])
    else:
        table = pa.Table.from_arrays(
            [pa.array([], type=pa.string()), pa.array([], type=pa.string()),
             pa.array([], type=pa.string())],
            names=["constraint_id", "url", "offending_value"])
    return table, counts
