"""t-digest-style sketch and skew-salting tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.skew import explode_hot_dim, salt_hot_keys, salted_agg
from xmlschemavalidator_spark.checks.tdigest import (
    Digest,
    digest_of,
    merge_digests,
    partition_digests,
    quantile_gap_drift,
)


def test_digest_quantiles_close_to_exact(spark):
    vals = [(float(i),) for i in range(10000)]
    df = spark.createDataFrame(vals, "v double").repartition(8)
    d = digest_of(df, "v", delta=100)
    assert d.total == 10000
    for q in (0.1, 0.5, 0.9):
        assert d.quantile(q) == pytest.approx(q * 9999, rel=0.02)


def test_partition_digests_bounded(spark):
    df = spark.createDataFrame([(float(i),) for i in range(5000)], "v double").repartition(4)
    cent = partition_digests(df, "v", delta=50).toPandas()
    per_part = cent.groupby("partition_id").size()
    assert (per_part <= 50).all() and len(per_part) == 4


def test_merge_is_order_insensitive(spark):
    df = spark.createDataFrame([(float(i % 100),) for i in range(2000)], "v double").repartition(6)
    cent = partition_digests(df, "v", delta=80).toPandas()
    d1 = merge_digests(cent, delta=80)
    d2 = merge_digests(cent.sample(frac=1.0, random_state=1), delta=80)
    assert d1.quantiles([0.25, 0.5, 0.75]) == pytest.approx(
        d2.quantiles([0.25, 0.5, 0.75]), rel=0.05
    )


def test_quantile_gap_drift(spark):
    base = spark.createDataFrame([(float(i),) for i in range(4000)], "v double")
    same = quantile_gap_drift(digest_of(base, "v"), digest_of(base, "v"))
    assert same < 0.02
    shifted = spark.createDataFrame([(float(i) + 2000.0,) for i in range(4000)], "v double")
    moved = quantile_gap_drift(digest_of(shifted, "v"), digest_of(base, "v"))
    assert moved > 0.3


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("en", i % 7, float(i)) for i in range(1000)] + [("de", 1, 2.0)] * 10,
        "lang string, k int, v double",
    ).repartition(8)
    salted = salted_agg(
        df, ["lang"], {"n": ("1", "count"), "total": ("v", "sum"), "mx": ("v", "max")}
    )
    plain = df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    s = {r["lang"]: (r["n"], round(r["total"], 4), r["mx"]) for r in salted.collect()}
    p = {r["lang"]: (r["n"], round(r["total"], 4), r["mx"]) for r in plain.collect()}
    assert s == p


def test_salted_join_preserves_semantics(spark):
    fact = spark.createDataFrame(
        [("en", i) for i in range(500)] + [("sv", 0), ("xx", 1)],
        "lang string, n int",
    )
    dim = spark.createDataFrame([("en", "english"), ("sv", "swedish")], "lang string, name string")
    hot = ["en"]
    f = salt_hot_keys(fact, "lang", hot, salt_buckets=4)
    d = explode_hot_dim(dim, "lang", hot, salt_buckets=4)
    joined = f.join(d.select("_salted_key", "name"), on="_salted_key", how="left")
    got = joined.groupBy("name").count().collect()
    counts = {r["name"]: r["count"] for r in got}
    assert counts["english"] == 500 and counts["swedish"] == 1 and counts[None] == 1
    # salt spreads the hot key across multiple join keys
    n_keys = f.where(F.col("lang") == "en").select("_salted_key").distinct().count()
    assert n_keys > 1


def test_salted_join_key_with_hash_char(spark):
    """A cold key whose value contains '#' must NOT collide with a salted
    hot key (the old '<key>#<salt>' string encoding did)."""
    fact = spark.createDataFrame(
        [("en", 1), ("en#3", 2), ("en", 3)], "lang string, x long"
    )
    dim = spark.createDataFrame([("en", "hotname"), ("en#3", "coldname")], "lang string, name string")
    f = salt_hot_keys(fact, "lang", ["en"], salt_buckets=4)
    d = explode_hot_dim(dim, "lang", ["en"], salt_buckets=4)
    joined = f.join(d.select("_salted_key", "name"), on="_salted_key", how="left")
    got = {(r["lang"], r["x"]): r["name"] for r in joined.collect()}
    assert got[("en#3", 2)] == "coldname"
    assert got[("en", 1)] == "hotname" and got[("en", 3)] == "hotname"
