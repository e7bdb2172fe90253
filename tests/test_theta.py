"""checks/theta.py — fixed-threshold theta sketch distinct estimate."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.theta import (
    theta_distinct,
    theta_distinct_by_group,
    theta_estimate,
    theta_sketch_rows,
)


def _vals(spark, n, dup_every=3):
    # n values, each duplicated `dup_every` times -> distinct = n
    return spark.range(n * dup_every).select(
        (F.col("id") % n).cast("string").alias("v"),
        (F.col("id") % 4).cast("string").alias("g"),
    )


def test_theta_p0_is_exact(spark):
    # p=0 keeps every hash: the sketch degenerates to exact distinct
    df = _vals(spark, 100)
    [r] = theta_distinct(df, "v", p=0).collect()
    assert (r["n_survivors"], r["estimate"]) == (100, 100)


def test_theta_estimate_within_sampling_error(spark):
    df = _vals(spark, 2000)
    [r] = theta_distinct(df, "v", p=3).collect()
    # E[survivors] = 250; 4 sigma ~ 63
    assert abs(r["estimate"] - 2000) <= 8 * 63
    assert r["estimate"] == r["n_survivors"] * 8


def test_theta_merge_equals_one_shot(spark):
    """The load-bearing property: per-batch sketches union to EXACTLY
    the whole-corpus sketch (same hashes survive the same threshold)."""
    df = _vals(spark, 500).cache()
    whole = theta_distinct(df, "v", p=2).collect()[0]
    parts = [
        theta_sketch_rows(df.where(F.col("g") == str(i)), "v", p=2)
        for i in range(4)
    ]
    u = parts[0]
    for s in parts[1:]:
        u = u.unionByName(s)
    merged = theta_estimate(u, p=2).collect()[0]
    assert merged == whole
    df.unpersist()


def test_theta_duplicates_and_nulls_dont_count(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "v string"
    )
    [r] = theta_distinct(df, "v", p=0).collect()
    assert r["n_survivors"] == 2


def test_theta_by_group(spark):
    df = _vals(spark, 400)
    got = {r["group"]: r for r in theta_distinct_by_group(df, "v", "g", p=1).collect()}
    assert set(got) == {"0", "1", "2", "3"}
    # every value appears in every group (dup_every=3 cycles mod 4 over
    # 1200 ids -> each (v, g) pair occurs for most v); estimates must be
    # in a plausible band around each group's true distinct count
    for r in got.values():
        assert r["estimate"] == r["n_survivors"] * 2


def test_theta_filter_precedes_shuffle(spark):
    """The narrow threshold filter must sit below the distinct's
    Exchange — the sketch's entire scale claim."""
    df = _vals(spark, 100)
    plan = (
        theta_distinct(df, "v", p=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pre_exchange = plan.split("Exchange")[-1]  # deepest segment = pre-shuffle
    assert "Filter" in pre_exchange and "md5" in pre_exchange
    # two exchanges total: the distinct + the 1-row final count
    assert plan.count("Exchange") == 2


def test_theta_set_ops_p0_exact(spark):
    from xmlschemavalidator_spark.checks.theta import theta_set_ops

    # p=0: sketches ARE the distinct sets, so every set op is exact.
    # A = {0..59}, B = {40..99} -> |A|=60 |B|=60 |A∩B|=20 |A∪B|=100
    a = spark.range(60).select(F.col("id").cast("string").alias("v"))
    b = spark.range(40, 100).select(F.col("id").cast("string").alias("v"))
    sa = theta_sketch_rows(a, "v", p=0, salt="s")
    sb = theta_sketch_rows(b, "v", p=0, salt="s")
    [r] = theta_set_ops(sa, sb, p=0).collect()
    assert (r["n_a"], r["n_b"], r["n_union"], r["n_intersect"]) == (60, 60, 100, 20)
    assert (r["est_a"], r["est_union"], r["est_intersect"]) == (60, 100, 20)
    assert (r["est_only_a"], r["est_only_b"]) == (40, 40)
    assert r["jaccard_micro"] == 20 * 1_000_000 // 100

    # disjoint sets: jaccard 0; identical sets: jaccard 1
    [rd] = theta_set_ops(
        theta_sketch_rows(a, "v", p=0, salt="s"),
        theta_sketch_rows(
            spark.range(200, 260).select(F.col("id").cast("string").alias("v")),
            "v", p=0, salt="s",
        ),
        p=0,
    ).collect()
    assert rd["n_intersect"] == 0 and rd["jaccard_micro"] == 0
    [ri] = theta_set_ops(sa, theta_sketch_rows(a, "v", p=0, salt="s"), p=0).collect()
    assert ri["jaccard_micro"] == 1_000_000 and ri["est_only_a"] == 0

    # empty union -> zero counts, NULL jaccard
    empty = a.where(F.lit(False))
    [re] = theta_set_ops(
        theta_sketch_rows(empty, "v", p=0, salt="s"),
        theta_sketch_rows(empty, "v", p=0, salt="s"),
        p=0,
    ).collect()
    assert re["n_union"] == 0 and re["jaccard_micro"] is None


def test_theta_set_ops_sampled_consistency(spark):
    from xmlschemavalidator_spark.checks.theta import theta_set_ops

    # at p>0 the invariants still hold exactly on the SKETCH level:
    # n_union = n_a + n_b - n_intersect, and scaling by 2^p throughout
    a = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2500, 7500).select(F.col("id").cast("string").alias("v"))
    sa = theta_sketch_rows(a, "v", p=3, salt="s")
    sb = theta_sketch_rows(b, "v", p=3, salt="s")
    [r] = theta_set_ops(sa, sb, p=3).collect()
    assert r["n_union"] == r["n_a"] + r["n_b"] - r["n_intersect"]
    assert r["est_union"] == r["n_union"] * 8
    # sampled estimates land within ~5 sigma of truth (deterministic
    # hashes: this is a fixed assertion, not a flaky one)
    import math

    sigma = math.sqrt(5000 * 8)
    assert abs(r["est_a"] - 5000) < 5 * sigma
    assert abs(r["est_intersect"] - 2500) < 5 * sigma
    assert abs(r["est_union"] - 7500) < 5 * sigma
