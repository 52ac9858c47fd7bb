"""User-extension surface: the Check / Constraint registry.

Replaces the reference's BaseCheck ABC + CheckRegistry
(/root/reference/tanml/checks/base.py:70-180) and the @register_tab
auto-discovery (tanml/ui/views/evaluation/tabs/__init__.py:79-127)
with the engine's streaming protocol (SURVEY.md §7.0):

    Accumulator check:  init() → S; update(S, pa.Table) → S;
                        merge(S, S) → S; finalize(S) → CheckResult
    Row constraint:     any stages.constraints.RowConstraint subclass

A ValidationSuite is assembled from a config dict (the reference's
nested rule_config pattern, shap_check.py:27-42) and compiles to the
single-pass pipelines in pipelines/validate.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from tanml_ray.stages.constraints import (
    ExtractionMatch,
    NotNull,
    ReferentialSet,
    RegexMatch,
    RowConstraint,
    TimestampRange,
)


@dataclass
class CheckResult:
    """Reference record shape (checks/base.py:38-67), kept verbatim:
    status ∈ {pass, warning, fail}."""

    name: str
    status: str
    metrics: dict[str, Any] = field(default_factory=dict)
    summary: str = ""
    report_data: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.status not in ("pass", "warning", "fail", "error"):
            raise ValueError(f"invalid status {self.status!r}")


class ConstraintRegistry:
    """Keyed factory: constraint id → builder(config) → RowConstraint."""

    def __init__(self) -> None:
        self._builders: dict[str, Callable[..., RowConstraint]] = {}

    def register(self, kind: str) -> Callable:
        def deco(fn: Callable[..., RowConstraint]):
            if kind in self._builders:
                raise ValueError(f"duplicate constraint kind {kind!r}")
            self._builders[kind] = fn
            return fn
        return deco

    def get(self, kind: str) -> Callable[..., RowConstraint]:
        if kind not in self._builders:
            raise KeyError(f"unknown constraint kind {kind!r}; "
                           f"known: {sorted(self._builders)}")
        return self._builders[kind]

    def list_kinds(self) -> list[str]:
        return sorted(self._builders)

    def build_suite(self, config: list[dict[str, Any]]) -> list[RowConstraint]:
        """config: [{kind: ..., **params}, ...] → constraint list."""
        out = []
        for item in config:
            params = dict(item)
            kind = params.pop("kind")
            out.append(self.get(kind)(**params))
        return out


registry = ConstraintRegistry()


@registry.register("not_null")
def _not_null(column: str) -> RowConstraint:
    return NotNull(column)


@registry.register("timestamp_range")
def _ts_range(column: str, lo, hi) -> RowConstraint:
    import pandas as pd

    return TimestampRange(column, pd.Timestamp(lo), pd.Timestamp(hi))


@registry.register("referential")
def _referential(column: str, valid_values, name: str | None = None) -> RowConstraint:
    return ReferentialSet(column, valid_values, name=name)


@registry.register("regex")
def _regex(column: str, pattern: str, name: str | None = None) -> RowConstraint:
    return RegexMatch(column, pattern, name=name)


@registry.register("extraction_match")
def _extraction(html_col: str = "html", text_col: str = "text") -> RowConstraint:
    return ExtractionMatch(html_col=html_col, text_col=text_col)


@registry.register("length_range")
def _length_range(column: str, lo: int = 0, hi: int | None = None,
                  name: str | None = None) -> RowConstraint:
    from tanml_ray.stages.constraints import LengthRange

    return LengthRange(column, lo=lo, hi=hi, name=name)


@registry.register("cross_field")
def _cross_field(left: str, op: str, right: str,
                 name: str | None = None) -> RowConstraint:
    from tanml_ray.stages.constraints import CrossField

    return CrossField(left, op, right, name=name)
