"""Count-Min sketch (checks/cms.py): overestimate-only invariant,
mergeability, and the exact DuckDB replay."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.cms import (
    cms_build,
    cms_estimate,
    cms_estimate_sql,
    cms_merge,
    cms_sql,
)

ROWS = (
    [("apple",)] * 7
    + [("banana",)] * 3
    + [("cherry",)] * 12
    + [("durian",)] * 1
    + [(None,)] * 2
    + [(f"noise{i}",) for i in range(25)]
)


def _df(spark, rows=None):
    return spark.createDataFrame(rows or ROWS, "v string")


def _true_counts(rows):
    out = {}
    for (v,) in rows:
        if v is not None:
            out[v] = out.get(v, 0) + 1
    return out


def test_cms_overestimates_only_and_exact_when_wide(spark):
    df = _df(spark)
    truth = _true_counts(ROWS)
    probes = ["apple", "banana", "cherry", "durian", "nothere"]
    # wide sketch: collisions vanish, estimates are exact
    wide = cms_build(df, "v", depth=4, width=4096)
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(wide, probes, depth=4, width=4096).collect()
    }
    assert est == {**{p: truth.get(p, 0) for p in probes}}
    # narrow sketch: estimates never drop below truth
    narrow = cms_build(df, "v", depth=2, width=4)
    est_n = {
        r["value"]: r["est"]
        for r in cms_estimate(narrow, probes, depth=2, width=4).collect()
    }
    assert all(est_n[p] >= truth.get(p, 0) for p in probes)
    # pigeonhole: 29 distinct values into 4 buckets must inflate something
    assert any(est_n[p] > truth.get(p, 0) for p in probes)


def test_cms_merge_equals_full_build(spark):
    half1, half2 = ROWS[:20], ROWS[20:]
    full = cms_build(_df(spark), "v", depth=3, width=64)
    merged = cms_merge(
        cms_build(_df(spark, half1), "v", depth=3, width=64),
        cms_build(_df(spark, half2), "v", depth=3, width=64),
    )
    as_set = lambda d: {(r["i"], r["bucket"], r["c"]) for r in d.collect()}
    assert as_set(merged) == as_set(full)


def test_cms_duckdb_replay_is_bit_identical(spark):
    con = duckdb.connect()
    con.register("src_tbl", pd.DataFrame([v for (v,) in ROWS], columns=["v"]))
    src = "SELECT v FROM src_tbl"
    sk = cms_build(_df(spark), "v", depth=4, width=32)
    duck_cells = set(
        map(tuple, con.execute(cms_sql(src, depth=4, width=32)).fetchall())
    )
    spark_cells = {(r["i"], r["bucket"], r["c"]) for r in sk.collect()}
    assert spark_cells == duck_cells
    probes = ["apple", "cherry", "nothere"]
    duck_est = dict(
        con.execute(cms_estimate_sql(src, probes, depth=4, width=32)).fetchall()
    )
    spark_est = {
        r["value"]: r["est"]
        for r in cms_estimate(sk, probes, depth=4, width=32).collect()
    }
    assert spark_est == duck_est


def test_cms_bad_params_rejected(spark):
    with pytest.raises(ValueError):
        cms_build(_df(spark), "v", depth=0, width=16)
    with pytest.raises(ValueError):
        cms_build(_df(spark), "v", depth=2, width=1)


def test_cms_plan_is_one_bounded_agg(spark):
    """The sketch build shuffles (i, bucket) cells with map-side partial
    aggregation — never values; one Exchange total."""
    sk = cms_build(_df(spark), "v", depth=4, width=64)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan.lower() or "HashAggregate" in plan
