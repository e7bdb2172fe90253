"""Snapshot row-diff (checks/diff.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.diff import diff_summary, snapshot_diff
from tests.conftest import rows


def _df(spark, data):
    return spark.createDataFrame(data, "k long, a string, b long")


def test_added_removed_changed(spark):
    old = _df(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _df(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40)])
    got = rows(snapshot_diff(old, new, "k"))
    assert got == [(2, "changed"), (3, "removed"), (4, "added")]


def test_null_vs_sentinel_value_differ(spark):
    old = _df(spark, [(1, None, 10)])
    new = _df(spark, [(1, "\x00", 10)])  # the null-tag itself, as a value
    # the null-flag prefix keeps NULL distinct from every string value,
    # including one equal to the tag — no false "unchanged"
    got = rows(snapshot_diff(old, new, "k"))
    assert got == [(1, "changed")]


def test_unchanged_rows_dropped(spark):
    old = _df(spark, [(1, "x", 1), (2, "y", 2)])
    assert snapshot_diff(old, old, "k").count() == 0


def test_schema_evolution_ignores_one_sided_columns(spark):
    old = _df(spark, [(1, "x", 10)])
    new = old.withColumn("extra", F.lit("new-col")).select("k", "a", "b", "extra")
    # default compare set = shared non-key columns -> no change reported
    assert snapshot_diff(old, new, "k").count() == 0
    # explicitly requesting the new column makes it count
    got = rows(snapshot_diff(old, new, "k", compare_cols=["a", "b", "extra"]))
    assert got == [(1, "changed")]


def test_diff_summary_counts(spark):
    old = _df(spark, [(i, "x", i) for i in range(100)])
    new = _df(
        spark,
        [(i, "x", i + (1 if i % 10 == 0 else 0)) for i in range(5, 100)]
        + [(1000 + i, "n", i) for i in range(3)],
    )
    got = dict(rows(diff_summary(old, new, "k"), "change", "n"))
    # changed keys are the multiples of 10 in [5, 100): 10..90 -> 9 keys
    assert got == {"added": 3, "removed": 5, "changed": 9}


def test_schema_diff(spark):
    from xmlschemavalidator_spark.checks.diff import schema_diff

    old = _df(spark, [(1, "x", 10)])
    new = old.withColumn("b", F.col("b").cast("string")).withColumn(
        "extra", F.lit(1)
    ).drop("a")
    got = schema_diff(old, new)
    assert got == [
        {"column": "a", "change": "removed", "type": "string"},
        {"column": "b", "change": "type_changed", "type": "bigint -> string"},
        {"column": "extra", "change": "added", "type": "int"},
    ]
    assert schema_diff(old, old) == []


def test_fingerprint_separator_injection(spark):
    """Values containing the internal separator must not make distinct rows
    collide: ('x', 'y\\x1fvz') vs ('x\\x1fvy', 'z') hashed identically
    under plain concat_ws tagging."""
    old = spark.createDataFrame([(1, "x", "y\x1fvz")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x\x1fvy", "z")], "k long, a string, b string")
    got = rows(snapshot_diff(old, new, "k", compare_cols=["a", "b"]))
    assert got == [(1, "changed")]


def test_null_key_rows_diff_null_safely(spark):
    old = spark.createDataFrame([(None, "v1"), (1, "x")], "k string, a string")
    same = spark.createDataFrame([(None, "v1"), (1, "x")], "k string, a string")
    changed = spark.createDataFrame([(None, "v2"), (1, "x")], "k string, a string")
    assert snapshot_diff(old, same, "k").count() == 0
    got = rows(snapshot_diff(old, changed, "k"))
    assert got == [(None, "changed")]
