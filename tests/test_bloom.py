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


def test_bloom_words_match_pure_python_replica(spark):
    """The built word array is reproduced bit-for-bit by a driver-side
    replica using hashing.py's Spark-exact xxhash64 — the sketch is a pure
    function of (values, m, k, seed), with no Spark-run dependence."""
    from xmlschemavalidator_spark.hashing import xxh64_int, xxh64_str

    values = [f"v{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    m, k, seed = 1 << 12, 4, 42
    bf = BloomFilter.build(df, "v", m=m, k=k, seed=seed)

    words = [0] * ((m + 63) // 64)
    for v in values:
        for i in range(k):
            # xxhash64(col, lit(s)) chains: str hashed at default seed 42,
            # then the int literal hashed with that as the running seed
            h = xxh64_int(seed + i, seed=xxh64_str(v, seed=42))
            pos = h % m if h >= 0 else (h % m + m) % m  # pmod semantics
            words[pos // 64] |= 1 << (pos % 64)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    assert list(bf.words) == signed


def test_bloom_membership_plan_is_narrow(spark):
    """might_contain is a pure filter: one scan, zero Exchange — the
    property that makes the dedup prefilter free of shuffles."""
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    bf = BloomFilter.build(df, "v", m=1 << 12, k=3)
    probe = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = probe.where(bf.might_contain(F.col("text")))
    qe = out._jdf.queryExecution()
    jvm = out.sparkSession._jvm
    plan = qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "Exchange" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_might_contain_null_is_false(spark):
    """Spark hash functions SKIP null inputs, so without an explicit gate
    a NULL probe hashes to fixed positions (fourth-review finding, was
    returning True on loaded filters)."""
    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    bf = BloomFilter.build(df, "v", m=1 << 14, k=5)
    probe = spark.createDataFrame([("5",), (None,)], "v string")
    got = {r["v"]: r["hit"] for r in
           probe.select("v", bf.might_contain(F.col("v")).alias("hit")).collect()}
    assert got["5"] is True and got[None] is False


def test_bloom_pruned_join_equals_plain_join(spark):
    from xmlschemavalidator_spark.checks.bloom import bloom_pruned_join

    fact = spark.createDataFrame(
        [(i, i % 100) for i in range(1000)] + [(9999, None)],
        "row_id long, key long",
    )
    dim = spark.createDataFrame(
        [(j, f"d{j}") for j in range(0, 100, 7)], "key long, payload string"
    )
    got = bloom_pruned_join(fact, dim, "key", m=1 << 12, k=4)
    plain = fact.where("key IS NOT NULL").join(dim, "key", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # semi variant
    semi = bloom_pruned_join(fact, dim, "key", m=1 << 12, k=4, how="left_semi")
    plain_semi = fact.where("key IS NOT NULL").join(dim, "key", "left_semi")
    assert sorted(map(tuple, semi.collect())) == sorted(map(tuple, plain_semi.collect()))


def test_bloom_pruned_join_actually_prunes(spark):
    from xmlschemavalidator_spark.checks.bloom import BloomFilter

    fact = spark.createDataFrame([(i,) for i in range(2000)], "key long")
    dim = spark.createDataFrame([(i,) for i in range(0, 2000, 100)], "key long")
    bf = BloomFilter.build(dim, "key", m=1 << 14, k=5)
    survivors = fact.where(bf.might_contain(F.col("key"))).count()
    # 20 true members; FP rate at m=16384/n=20 is ~0 -> prune >=97%
    assert 20 <= survivors <= 60
