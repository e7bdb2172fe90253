"""Bucketed (co-located) joins: pre-bucketing both sides on the join key
removes the shuffle from every subsequent join — the storage-layout lever
for repeated fact-dim validation joins at 100 TB (SCALE.md)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _n(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}", plan))


def fmt(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf — use external bucketed tables with an
    # explicit tmp location instead
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "b_orders"))
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        customer.write.mode("overwrite")
        .option("path", str(tmp_path / "b_customer"))
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    # disable broadcast so the join must pick a key-distribution strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = fmt(j)
        # both sides are bucketed on the join key: the join itself needs NO
        # Exchange (only the small post-join groupBy may shuffle)
        assert "SortMergeJoin" in p
        join_section = p.split("SortMergeJoin")[0]
        assert _n(join_section, "Exchange") == 0
        # and the result is right
        total = sum(r["n"] for r in j.collect())
        assert total == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
