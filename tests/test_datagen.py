"""Pages generator tests: determinism across parallelism, planted-defect
rates, and the byte-identical extract invariant (input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.datagen import (
    domains_dim,
    extract_text,
    extract_text_pandas,
    pages,
    render_html,
    url_domain,
)

N = 4000


def test_schema_matches_input_hint(spark):
    df = pages(spark, 10)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


def test_deterministic_across_parallelism(spark):
    """Same (n, seed) must produce identical rows at 1 and 8 partitions —
    the property that makes the two-parallelism scaling bench comparable."""
    a = sorted(tuple(r) for r in pages(spark, 500, seed=7, partitions=1).collect())
    b = sorted(tuple(r) for r in pages(spark, 500, seed=7, partitions=8).collect())
    assert a == b


def test_extract_invariant_holds_except_corrupted(spark):
    df = pages(spark, N).withColumn("extracted", extract_text(F.col("html")))
    mismatch = df.where(
        ~(F.col("extracted") == F.coalesce(F.col("text"), F.lit("")))
    ).count()
    # planted corruption rate ~0.2%
    assert 0 < mismatch < N * 0.01


def test_pandas_udf_extraction_equals_expression(spark):
    df = pages(spark, 300).select(
        extract_text(F.col("html")).alias("e1"),
        extract_text_pandas(F.col("html")).alias("e2"),
    )
    assert df.where(~(F.col("e1") == F.col("e2"))).count() == 0


def test_render_extract_roundtrip(spark):
    df = spark.createDataFrame([("héllo wörld",), ("",), ("a<b>c",)], "t string")
    out = df.select(extract_text(render_html(F.col("t"))).alias("r"), "t")
    assert out.where(F.col("r") != F.col("t")).count() == 0


def test_planted_defect_rates(spark):
    df = pages(spark, N).cache()
    n = df.count()
    langs = dict(df.groupBy("lang").count().collect())
    bad_langs = sum(v for k, v in langs.items() if k in ("xx", "yy"))
    assert 0.005 * n < bad_langs < 0.05 * n  # ~2%
    assert langs.get("en", 0) > 0.5 * n  # hot key
    nulls = df.where(F.col("text").isNull()).count()
    assert 0 < nulls < 0.03 * n  # ~1%
    dups = df.groupBy("url").count().where(F.col("count") > 1).count()
    assert dups > 0  # planted duplicate urls
    missing = (
        df.select(url_domain(F.col("url")).alias("domain"))
        .join(domains_dim(spark), on="domain", how="left_anti")
        .where(~F.col("domain").startswith("dup.example"))
        .count()
    )
    assert 0 < missing < 0.03 * n  # ~1% not in dim
    df.unpersist()


def test_hot_domain_skew(spark):
    df = pages(spark, N).select(url_domain(F.col("url")).alias("d"))
    counts = dict(df.groupBy("d").count().collect())
    assert counts.get("hot-a.example.org", 0) > 0.12 * N
    assert counts.get("hot-b.example.org", 0) > 0.12 * N
