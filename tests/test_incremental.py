"""Incremental revalidation invariant: incremental == full revalidation."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.compiler import FieldRule, RuleSet
from xmlschemavalidator_spark.engine import validate
from xmlschemavalidator_spark.incremental import incremental_revalidate
from xmlschemavalidator_spark.rules.facets import MaxInclusive, MinInclusive
from xmlschemavalidator_spark.rules.types import Restriction
from tests.conftest import rows


def _rs():
    return RuleSet(rules=[
        FieldRule(
            "v_range",
            Restriction(base="integer", facets=(MinInclusive(10), MaxInclusive(90))),
            column="v",
        )
    ])


def test_incremental_equals_full(spark):
    old = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 120).alias("v")
    )
    # new snapshot: drop k%97==0, shift v for k%10==0 (some cross the rule
    # boundary both ways), add 20 fresh keys (half violating)
    new = (
        old.where(F.col("k") % 97 != 0)
        .withColumn(
            "v",
            F.when(F.col("k") % 10 == 0, (F.col("v") + 55) % 120).otherwise(F.col("v")),
        )
        .unionByName(
            spark.range(0, 20).select(
                (F.col("id") + 10_000).alias("k"), (F.col("id") * 9).alias("v")
            )
        )
    )
    rs = _rs()
    prev = validate(old, rs, key="k").violations
    inc = incremental_revalidate(prev, old, new, rs, key="k")
    full = validate(new, rs, key="k").violations
    assert rows(inc) == rows(full)
    assert inc.count() > 0  # non-trivial scenario


def test_incremental_no_changes_is_carry_only(spark):
    df = spark.range(0, 200).select(F.col("k") if False else F.col("id").alias("k"),
                                    (F.col("id") % 120).alias("v"))
    rs = _rs()
    prev = validate(df, rs, key="k").violations
    inc = incremental_revalidate(prev, df, df, rs, key="k")
    assert rows(inc) == rows(prev)


def test_incremental_with_null_keys(spark):
    """A changed NULL-key row must leave the carry and re-validate."""
    old = spark.createDataFrame([(None, 200), (1, 50)], "k string, v long")
    new = spark.createDataFrame([(None, 55), (1, 50)], "k string, v long")
    rs = _rs()
    prev = validate(old, rs, key="k").violations
    assert prev.count() == 1  # the null-key row violates (200 > 90)
    inc = incremental_revalidate(prev, old, new, rs, key="k")
    full = validate(new, rs, key="k").violations
    assert rows(inc) == rows(full) == []
