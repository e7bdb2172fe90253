"""Constraint suggestion: profile a table once and propose a RuleSet.

The inverse of the rule compiler — instead of validating declared
constraints, derive candidate constraints FROM the data (the idea
popularized by Deequ's ConstraintSuggestion): observed min/max become
range facets, complete columns become required checks, low-cardinality
strings become enumerations. Suggestions are a starting declaration for a
human to tighten, and by construction the source table passes them.

Cost shape: ONE aggregate pass computes every signal (min, max, null
count, approx distinct) for all columns; the per-column enumeration
values are collected only for columns whose approx distinct count is
under the threshold (a second, heavily pruned pass).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.compiler import FieldRule, RuleSet
from xmlschemavalidator_spark.rules.attributes import RequiredAttr
from xmlschemavalidator_spark.rules.facets import Enumeration, MaxInclusive, MinInclusive
from xmlschemavalidator_spark.rules.types import NullOr, Restriction

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


@dataclass(frozen=True)
class Suggestion:
    column: str
    kind: str  # range | required | enumeration
    detail: str
    rule: Any

    def to_field_rule(self) -> FieldRule:
        return FieldRule(f"suggested__{self.column}_{self.kind}", self.rule, column=self.column)


def suggest_rules(
    df: DataFrame, enum_max_distinct: int = 20, sample_rows: int | None = None
) -> list[Suggestion]:
    """Profile ``df`` and return deterministic constraint suggestions,
    ordered by (column, kind)."""
    if sample_rows is not None:
        df = df.limit(sample_rows)
    aggs = []
    numeric_cols, string_cols = [], []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        aggs.append(F.count(F.when(F.col(f.name).isNull(), 1)).alias(f"nulls_{f.name}"))
        if t in _NUMERIC or t.startswith("decimal"):
            numeric_cols.append(f.name)
            aggs.append(F.min(f.name).alias(f"min_{f.name}"))
            aggs.append(F.max(f.name).alias(f"max_{f.name}"))
        elif t == "string":
            string_cols.append(f.name)
            aggs.append(F.approx_count_distinct(f.name).alias(f"adist_{f.name}"))
    row = df.agg(*aggs).collect()[0]

    out: list[Suggestion] = []
    complete = {c for c in df.columns if row[f"nulls_{c}"] == 0}
    for c in sorted(complete):
        out.append(Suggestion(c, "required", "no nulls observed", RequiredAttr()))

    def _maybe_nullable(c: str, rule):
        # facets are null-safe-FALSE; on a nullable column the value rule
        # must let NULL pass or the profiled table fails its own suggestion
        # (completeness is the separate 'required' suggestion's concern)
        return rule if c in complete else NullOr(rule)

    for c in numeric_cols:
        lo, hi = row[f"min_{c}"], row[f"max_{c}"]
        if lo is not None and hi is not None:
            out.append(
                Suggestion(
                    c,
                    "range",
                    f"[{lo}, {hi}]",
                    _maybe_nullable(
                        c, Restriction(facets=(MinInclusive(lo), MaxInclusive(hi)))
                    ),
                )
            )
    # enumerations: only for plausibly-categorical columns (approx distinct
    # is an estimate, so the exact distinct pass below re-checks the cap)
    for c in string_cols:
        if row[f"adist_{c}"] <= enum_max_distinct * 2:
            vals = [
                r[0]
                for r in df.select(c).where(F.col(c).isNotNull()).distinct().collect()
            ]
            if 0 < len(vals) <= enum_max_distinct:
                out.append(
                    Suggestion(
                        c,
                        "enumeration",
                        f"{len(vals)} values",
                        _maybe_nullable(
                            c,
                            Restriction(
                                facets=tuple(Enumeration(v) for v in sorted(vals))
                            ),
                        ),
                    )
                )
    return sorted(out, key=lambda s: (s.column, s.kind))


def suggested_ruleset(df: DataFrame, **kwargs) -> RuleSet:
    """The suggestions as a compiled-ready RuleSet — by construction the
    profiled table validates cleanly against it."""
    return RuleSet(rules=[s.to_field_rule() for s in suggest_rules(df, **kwargs)])
