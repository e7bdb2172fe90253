"""Bloom filter tests: no false negatives, calibrated FP rate, merge,
and the dedup-prefilter split."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.bloom import (
    BloomFilter,
    bloom_parameters,
    split_by_membership,
)


def test_bloom_parameters_textbook():
    m, k = bloom_parameters(100_000, 0.01)
    assert 900_000 < m < 1_000_000  # ~9.59 bits/item at 1%
    assert k in (6, 7)


def test_no_false_negatives_and_fp_rate(spark):
    inserted = spark.range(5000).select(F.concat(F.lit("doc-"), F.col("id")).alias("v"))
    bf = BloomFilter.build(inserted, "v", m=1 << 16, k=5)
    # every inserted value must test positive
    hits = inserted.where(bf.might_contain(F.col("v"))).count()
    assert hits == 5000
    # non-members: measured FP rate within 3x of the textbook estimate
    others = spark.range(20000).select(F.concat(F.lit("other-"), F.col("id")).alias("v"))
    fp = others.where(bf.might_contain(F.col("v"))).count()
    est = bf.estimated_fpp(5000)
    assert fp / 20000 < max(3 * est, 0.02), (fp, est)


def test_merge_is_union(spark):
    a = spark.range(100).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(100).select(F.concat(F.lit("b"), F.col("id")).alias("v"))
    bfa = BloomFilter.build(a, "v", m=1 << 14, k=4)
    bfb = BloomFilter.build(b, "v", m=1 << 14, k=4)
    merged = bfa.merge(bfb)
    both = a.unionByName(b)
    assert both.where(merged.might_contain(F.col("v"))).count() == 200
    import pytest

    with pytest.raises(ValueError):
        bfa.merge(BloomFilter.build(b, "v", m=1 << 14, k=3))


def test_split_by_membership_prefilter(spark):
    seen = spark.range(1000).select(F.concat(F.lit("seen-"), F.col("id")).alias("fp"))
    bf = BloomFilter.build(seen, "fp", m=1 << 16, k=5)
    batch = spark.range(2000).select(
        F.when(F.col("id") < 500, F.concat(F.lit("seen-"), F.col("id")))
        .otherwise(F.concat(F.lit("new-"), F.col("id")))
        .alias("fp")
    )
    definitely_new, maybe_seen = split_by_membership(batch, "fp", bf)
    n_new, n_maybe = definitely_new.count(), maybe_seen.count()
    assert n_new + n_maybe == 2000
    # all 500 true members land in maybe_seen (no false negatives)…
    assert maybe_seen.where(F.col("fp").startswith("seen-")).count() == 500
    # …and the definite-new side skipped the join for ~all actual-new rows
    assert n_new > 1400
