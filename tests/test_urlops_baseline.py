"""URL analysis ops (textops) and the persisted drift-baseline store
(checks/baseline.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.baseline import (
    compute_digests,
    drift_report,
    load_baseline,
    save_baseline,
    snapshot_baseline,
)
from xmlschemavalidator_spark.textops import (
    url_host,
    url_normalize,
    url_path_depth,
    url_registrable_domain,
)

_URLS = [
    "https://WWW.Example.COM:443/a/b/?x=1#frag",
    "http://sub.shop.example.org:8080/catalog//",
    "https://example.net",
    "http://example.net:80/path",
    None,
]


def _eval(spark, col_fn, urls=_URLS):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r[0] for r in df.select(col_fn(F.col("u"))).collect()]


def test_url_host(spark):
    assert _eval(spark, url_host) == [
        "www.example.com",
        "sub.shop.example.org",
        "example.net",
        "example.net",
        None,
    ]


def test_url_registrable_domain(spark):
    assert _eval(spark, url_registrable_domain)[:4] == [
        "example.com",
        "example.org",
        "example.net",
        "example.net",
    ]


def test_url_path_depth(spark):
    assert _eval(spark, url_path_depth)[:4] == [2, 1, 0, 1]


def test_url_normalize(spark):
    got = _eval(spark, url_normalize)
    assert got == [
        "https://www.example.com/a/b?x=1",   # 443 stripped, fragment dropped,
                                             # trailing slash collapsed
        "http://sub.shop.example.org:8080/catalog",  # nonstandard port kept
        "https://example.net/",              # empty path -> /
        "http://example.net/path",           # default port 80 stripped
        None,
    ]


def test_url_normalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in _URLS if u], "u string")
    once = df.select(url_normalize(F.col("u")).alias("n"))
    twice = once.select(url_normalize(F.col("n")).alias("n2"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()]


# ---------------------------------------------------------------------------
# baseline snapshot store
# ---------------------------------------------------------------------------


def test_baseline_roundtrip(spark, tmp_path):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        (F.col("id") % 7).cast("double").alias("w"),
    ).repartition(4)
    path = str(tmp_path / "baselines")
    saved = snapshot_baseline(df, ["v", "w"], path, "snap1")
    loaded = load_baseline(spark, path, "snap1")
    assert set(loaded) == {"v", "w"}
    for c in ("v", "w"):
        assert loaded[c].total == 10_000
        for q in (0.25, 0.5, 0.9):
            assert loaded[c].quantile(q) == pytest.approx(saved[c].quantile(q), abs=1.0)


def test_drift_report_zero_and_shifted(spark, tmp_path):
    base = spark.range(0, 20_000).select((F.col("id") % 1000).cast("double").alias("v"))
    path = str(tmp_path / "baselines")
    snapshot_baseline(base.repartition(4), ["v"], path, "snapA")

    same = drift_report(base.repartition(2), ["v"], path, "snapA")
    assert same.loc[0, "column"] == "v"
    assert same.loc[0, "drift"] < 0.02  # sketch error only

    shifted = spark.range(0, 20_000).select(
        ((F.col("id") % 1000) + 500).cast("double").alias("v")
    )
    drifted = drift_report(shifted.repartition(2), ["v"], path, "snapA")
    assert drifted.loc[0, "drift"] > 0.3  # half the mass moved


def test_drift_report_missing_column_is_nan(spark, tmp_path):
    base = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    path = str(tmp_path / "baselines")
    snapshot_baseline(base, ["v"], path, "s")
    cur = spark.range(0, 1000).select(
        F.col("id").cast("double").alias("v"),
        F.col("id").cast("double").alias("other"),
    )
    rep = drift_report(cur, ["v", "other"], path, "s").set_index("column")
    assert not math.isnan(rep.loc["v", "drift"])
    assert math.isnan(rep.loc["other", "drift"])
    assert rep.loc["other", "baseline_total"] == 0


def test_resnapshot_overwrites_only_itself(spark, tmp_path):
    path = str(tmp_path / "baselines")
    a = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    b = spark.range(0, 2000).select(F.col("id").cast("double").alias("v"))
    snapshot_baseline(a, ["v"], path, "s1")
    snapshot_baseline(a, ["v"], path, "s2")
    snapshot_baseline(b, ["v"], path, "s2")  # overwrite s2 only
    assert load_baseline(spark, path, "s1")["v"].total == 1000
    assert load_baseline(spark, path, "s2")["v"].total == 2000


def test_constant_column_zero_self_drift(spark, tmp_path):
    """A constant (single-centroid) column must NOT self-drift — the old
    quantile-grid formulation reported 0.45 here."""
    path = str(tmp_path / "b")
    const = spark.range(0, 5000).select(F.lit(5.0).alias("v"))
    snapshot_baseline(const, ["v"], path, "s")
    rep = drift_report(const, ["v"], path, "s")
    assert rep.loc[0, "drift"] == 0.0
    # and a fully moved constant is maximal drift
    moved = spark.range(0, 5000).select(F.lit(9.0).alias("v"))
    rep2 = drift_report(moved, ["v"], path, "s")
    # disjoint point masses = maximal KS drift. The mid-mass CDF convention
    # used to report 0.5 here (halved gap at atoms — round-1 advisor
    # finding); the one-sided-limits fix makes this the textbook 1.0
    assert rep2.loc[0, "drift"] == pytest.approx(1.0)


def test_compute_digests_one_scan_many_columns(spark):
    from xmlschemavalidator_spark.checks.baseline import compute_digests

    df = spark.range(0, 4000).select(
        (F.col("id") % 10).cast("double").alias("a"),
        (F.col("id") % 100).cast("double").alias("b"),
        F.lit(None).cast("double").alias("c"),  # all-null column -> empty digest
    ).repartition(4)
    d = compute_digests(df, ["a", "b", "c"])
    assert d["a"].total == 4000 and d["b"].total == 4000
    assert d["c"].total == 0
    assert d["b"].quantile(0.5) == pytest.approx(49.5, abs=2.0)
