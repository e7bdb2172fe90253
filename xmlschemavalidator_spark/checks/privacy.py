"""Privacy-risk audits: k-anonymity and distinct l-diversity.

A validation engine that gates a corpus for release needs the standard
re-identification checks (Sweeney 2002, "k-Anonymity: a model for
protecting privacy"; Machanavajjhala et al. ICDE'06, "l-Diversity"):

* **k-anonymity** — every combination of quasi-identifier values (the
  columns an attacker can link against an external table: lang, domain,
  capture date, ...) must be shared by at least ``k`` rows. Equivalence
  classes smaller than ``k`` pinpoint individuals.
* **distinct l-diversity** — k-anonymity is not enough when everyone in
  a class shares the same *sensitive* value (the homogeneity attack):
  each class must also contain at least ``l`` distinct sensitive values.

Scale shape: k-anonymity is ONE partial-aggregatable groupBy on the
quasi-identifier columns — the shuffle carries (qi..., partial count),
never rows. l-diversity deliberately avoids ``countDistinct`` (which
Spark plans as an Expand over the corpus when mixed with other aggs):
it is TWO stacked partial-aggregatable groupBys — (qi, sensitive) →
per-value counts, then qi → (class size, value count) — the same
fan-out device as checks/fd.py. Both audits survive 100 TB because the
result is bounded by the number of equivalence classes, not rows.

NULL semantics: a NULL quasi-identifier value forms its own equivalence
class and a NULL sensitive value counts as one distinct value — both
Spark's groupBy and DuckDB's GROUP BY already agree on this, so the
oracles need no special-casing.

Reference scope note: eliassona/xmlschemavalidator validates one record
at a time (core.clj:263-285) and has no dataset-level notion; these are
north-rule dataset checks in the style of checks/uniqueness.py (a class
size is a duplicate-key count read through a privacy lens).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Equivalence classes violating k-anonymity: one row per class of
    size < ``k`` — ``(*quasi_cols, class_size)``. Empty result ⇔ the
    table IS k-anonymous w.r.t. these quasi-identifiers."""
    if not quasi_cols:
        raise ValueError("k_anonymity_violations: need ≥1 quasi-identifier column")
    if k < 2:
        raise ValueError(f"k_anonymity_violations: k={k} is vacuous (every class has ≥1 row)")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
        .where(F.col("class_size") < k)
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row release-gate verdict: ``(n_rows, n_classes,
    min_class_size, n_violating_classes, n_rows_at_risk, k_anonymous)``.
    ``min_class_size`` is the k the table actually achieves (the largest
    k for which it is k-anonymous); ``n_rows_at_risk`` counts the rows
    inside violating classes — the suppression cost of enforcing ``k``
    by dropping them."""
    if not quasi_cols:
        raise ValueError("k_anonymity_summary: need ≥1 quasi-identifier column")
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    viol = F.col("class_size") < k
    return classes.agg(
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").alias("min_class_size"),
        F.sum(viol.cast("long")).cast("bigint").alias("n_violating_classes"),
        F.sum(F.when(viol, F.col("class_size")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        (F.min("class_size") >= k).alias("k_anonymous"),
    )


def l_diversity_violations(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str, l: int
) -> DataFrame:
    """Equivalence classes violating distinct l-diversity: one row per
    class with < ``l`` distinct sensitive values —
    ``(*quasi_cols, class_size, n_distinct_sensitive)``. Two stacked
    map-side-combinable groupBys; no countDistinct, no Expand."""
    if not quasi_cols:
        raise ValueError("l_diversity_violations: need ≥1 quasi-identifier column")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"l_diversity_violations: sensitive column {sensitive_col!r} cannot also be "
            "a quasi-identifier (every class would trivially have 1 distinct value)"
        )
    if l < 2:
        raise ValueError(f"l_diversity_violations: l={l} is vacuous (every class has ≥1 value)")
    per_value = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    per_class = per_value.groupBy(*quasi_cols).agg(
        F.sum("_n").cast("bigint").alias("class_size"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_sensitive"),
    )
    return per_class.where(F.col("n_distinct_sensitive") < l)
