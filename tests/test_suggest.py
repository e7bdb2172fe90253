"""Constraint suggestion (checks/suggest.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.suggest import suggest_rules, suggested_ruleset
from xmlschemavalidator_spark.engine import validate


def test_suggestions_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sugg = suggest_rules(docs)
    by = {(s.column, s.kind) for s in sugg}
    assert ("doc_id", "required") in by
    assert ("doc_id", "range") in by
    assert ("n_chars", "range") in by
    assert ("lang", "enumeration") in by
    # text is complete but high-cardinality: required yes, enumeration no
    assert ("text", "required") in by
    assert ("text", "enumeration") not in by
    # nullable column -> no required suggestion
    docs2 = docs.withColumn(
        "maybe", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.lit("x"))
    )
    by2 = {(s.column, s.kind) for s in suggest_rules(docs2)}
    assert ("maybe", "required") not in by2
    assert ("maybe", "enumeration") in by2  # 1 distinct non-null value


def test_profiled_table_passes_its_own_suggestions(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rs = suggested_ruleset(docs)
    assert validate(docs, rs, key="doc_id").valid()


def test_out_of_profile_row_fails(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rs = suggested_ruleset(docs)
    bad = docs.limit(1).withColumn("n_chars", F.lit(10_000_000))
    res = validate(bad, rs, key="doc_id")
    viols = {r["rule_id"] for r in res.violations.collect()}
    assert "suggested__n_chars_range" in viols


def test_nullable_table_passes_its_own_suggestions(spark):
    """Value suggestions on a nullable column must let NULL pass (the
    facets are null-safe-FALSE): the invariant holds for nullable inputs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    nullable = docs.withColumn(
        "maybe", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.lit("x"))
    ).withColumn(
        "maybe_num",
        F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("n_chars")),
    )
    rs = suggested_ruleset(nullable)
    assert validate(nullable, rs, key="doc_id").valid()
