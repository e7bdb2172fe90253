"""Temporal operators: as-of join, range join, time rollup (one-shot,
merge, persisted incremental), gap sessionization.

The driver oracle gate (tools/check_oracles.py) pins cross-engine
equality on the real events table; these tests pin the SEMANTIC edge
cases on hand-built frames where the expected answer is computed by
hand: boundary inclusivity, equal-timestamp determinism, left-null
behavior, refusal paths, and merge-exactness.
"""
from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.temporal import (
    append_time_rollup,
    asof_join,
    merge_time_rollups,
    range_join,
    read_time_rollup,
    session_stats,
    sessionize,
    time_rollup,
)

from conftest import rows


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, recs):
    return spark.createDataFrame(
        recs, "event_id bigint, user_id bigint, ts timestamp, value double"
    )


# ---------------------------------------------------------------- as-of join

def test_asof_backward_inclusive_and_left_null(spark):
    state = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01T01:00:00"), 5.0),
            (11, 1, _ts("2024-01-01T03:00:00"), 7.0),
            (12, 2, _ts("2024-01-01T02:00:00"), 9.0),
        ],
    ).select("user_id", "ts", "value", "event_id")
    probe = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T00:30:00"), 0.0),   # before any state -> NULL
            (2, 1, _ts("2024-01-01T01:00:00"), 0.0),   # equal ts -> inclusive match
            (3, 1, _ts("2024-01-01T02:59:59"), 0.0),   # between -> first state
            (4, 1, _ts("2024-01-01T09:00:00"), 0.0),   # after all -> latest
            (5, 2, _ts("2024-01-01T02:30:00"), 0.0),   # other key isolated
            (6, 3, _ts("2024-01-01T05:00:00"), 0.0),   # key with no state
        ],
    )
    out = asof_join(probe, state, on="user_id", ts="ts",
                    state_cols=("value", "event_id"))
    got = {r["event_id"]: (r["asof_value"], r["asof_event_id"]) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (5.0, 10),
        3: (5.0, 10),
        4: (7.0, 11),
        5: (9.0, 12),
        6: (None, None),
    }
    assert out.count() == probe.count()  # left join: every probe row kept


def test_asof_equal_ts_state_dedup_is_deterministic(spark):
    # two state rows at the SAME (key, ts): struct-max over
    # (value, event_id) must win, not partition order
    state = _events(
        spark,
        [
            (20, 1, _ts("2024-01-01T01:00:00"), 3.0),
            (21, 1, _ts("2024-01-01T01:00:00"), 8.0),  # winner (higher value)
        ],
    ).select("user_id", "ts", "value", "event_id")
    probe = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)])
    out = asof_join(probe, state, on="user_id", ts="ts",
                    state_cols=("value", "event_id")).collect()
    assert (out[0]["asof_value"], out[0]["asof_event_id"]) == (8.0, 21)


def test_asof_plan_single_exchange_no_join(spark):
    from test_plans import fmt

    state = _events(spark, [(10, 1, _ts("2024-01-01T01:00:00"), 5.0)]).select(
        "user_id", "ts", "value", "event_id"
    )
    probe = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)])
    plan = fmt(asof_join(probe, state, on="user_id", ts="ts",
                         state_cols=("value", "event_id")))
    # the whole point: a window carry-forward, never a non-equi join
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_asof_rejects_reserved_column_names(spark):
    state = _events(spark, [(10, 1, _ts("2024-01-01T01:00:00"), 5.0)]).select(
        "user_id", "ts", "value", "event_id"
    )
    probe = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)]).withColumn(
        "_side", F.lit(1)
    )
    with pytest.raises(ValueError, match="_side"):
        asof_join(probe, state, on="user_id", ts="ts", state_cols=("value",))


# ---------------------------------------------------------------- range join

def _intervals(spark, recs):
    return spark.createDataFrame(
        recs, "interval_id bigint, user_id bigint, start_ts timestamp, end_ts timestamp"
    )


def test_range_join_boundaries_and_multi_bucket(spark):
    iv = _intervals(
        spark,
        [
            # spans 3 one-hour buckets
            (100, 1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:30:00")),
            # overlapping second interval on the same key
            (101, 1, _ts("2024-01-01T02:00:00"), _ts("2024-01-01T04:00:00")),
        ],
    )
    ev = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T01:00:00"), 0.0),   # == start: IN
            (2, 1, _ts("2024-01-01T03:30:00"), 0.0),   # == end of 100: OUT of 100, IN 101
            (3, 1, _ts("2024-01-01T02:30:00"), 0.0),   # inside BOTH -> exactly 2 rows
            (4, 1, _ts("2024-01-01T05:00:00"), 0.0),   # outside all
            (5, 2, _ts("2024-01-01T02:30:00"), 0.0),   # other key
        ],
    )
    out = range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                     end="end_ts", bucket_seconds=3600)
    got = sorted((r["event_id"], r["interval_id"]) for r in out.collect())
    assert got == [(1, 100), (2, 101), (3, 100), (3, 101)]


def test_range_join_refuses_oversized_interval(spark):
    iv = _intervals(
        spark, [(100, 1, _ts("2024-01-01T00:00:00"), _ts("2024-03-01T00:00:00"))]
    )
    ev = _events(spark, [(1, 1, _ts("2024-01-01T01:00:00"), 0.0)])
    with pytest.raises(ValueError, match="spanning"):
        range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                   end="end_ts", bucket_seconds=60, max_span_buckets=1024)


def test_range_join_refuses_inverted_interval(spark):
    iv = _intervals(
        spark, [(100, 1, _ts("2024-01-02T00:00:00"), _ts("2024-01-01T00:00:00"))]
    )
    ev = _events(spark, [(1, 1, _ts("2024-01-01T01:00:00"), 0.0)])
    with pytest.raises(ValueError, match="empty"):
        range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                   end="end_ts", bucket_seconds=3600)


def test_range_join_rejects_ambiguous_columns(spark):
    iv = _intervals(
        spark, [(100, 1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:00:00"))]
    ).withColumn("value", F.lit(1.0))  # collides with the event side
    ev = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)])
    with pytest.raises(ValueError, match="both"):
        range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                   end="end_ts", bucket_seconds=3600)


def test_range_join_plan_is_equi_join(spark):
    from test_plans import fmt

    iv = _intervals(
        spark, [(100, 1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:00:00"))]
    )
    ev = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)])
    plan = fmt(range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                          end="end_ts", bucket_seconds=3600))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


# --------------------------------------------------------------- time rollup

def test_rollup_merge_equals_oneshot(spark):
    ev = _events(
        spark,
        [(i, i % 3, _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=17 * i),
          round(0.01 * i, 2)) for i in range(200)],
    )
    one = time_rollup(ev, "ts", 3600, dims=("user_id",))
    parts = [
        time_rollup(ev.where(F.col("event_id") % 2 == i), "ts", 3600,
                    dims=("user_id",))
        for i in range(2)
    ]
    merged = merge_time_rollups(parts[0].unionByName(parts[1]), dims=("user_id",))
    cols = ["bucket_start", "user_id", "n_events", "sum_value", "min_value", "max_value"]
    assert rows(merged, *cols) == rows(one, *cols)


def test_rollup_bucket_start_is_integer_epoch_floor(spark):
    ev = _events(spark, [(1, 1, _ts("2024-01-01T00:59:59.999999"), 1.5)])
    r = time_rollup(ev, "ts", 3600).collect()[0]
    assert r["bucket_start"] == int(
        _ts("2024-01-01T00:00:00").replace(tzinfo=dt.timezone.utc).timestamp()
    )
    assert r["sum_value"] == Decimal("1.500000")


def test_rollup_append_read_and_retry_idempotent(spark, tmp_path):
    ev = _events(
        spark,
        [(i, 1, _ts("2024-01-01T00:00:00") + dt.timedelta(hours=i), float(i))
         for i in range(6)],
    )
    path = str(tmp_path / "agg")
    append_time_rollup(ev.where(F.col("event_id") < 3), "ts", 86400, path, "00000")
    append_time_rollup(ev.where(F.col("event_id") >= 3), "ts", 86400, path, "00001")
    # retry of a committed batch overwrites exactly its own dir
    append_time_rollup(ev.where(F.col("event_id") >= 3), "ts", 86400, path, "00001")
    got = read_time_rollup(spark, path).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 6
    assert got[0]["sum_value"] == Decimal("15.000000")
    assert (got[0]["min_value"], got[0]["max_value"]) == (0.0, 5.0)


# --------------------------------------------------------------------- scd2

def test_scd2_collapses_runs_and_chains_intervals(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:00:00"), "a"),
            (2, 1, _ts("2024-01-01T01:00:00"), "a"),  # same attrs: collapsed
            (3, 1, _ts("2024-01-01T02:00:00"), "b"),  # change -> new run
            (4, 1, _ts("2024-01-01T03:00:00"), "a"),  # back to a: NEW run
            (5, 2, _ts("2024-01-01T00:30:00"), "a"),  # other key isolated
        ],
        "event_id bigint, user_id bigint, ts timestamp, status string",
    )
    from xmlschemavalidator_spark.temporal import scd2_build

    dim = scd2_build(ev, key="user_id", ts="ts", attrs=("status",),
                     order_col="event_id")
    got = sorted(
        (r["user_id"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    )
    assert got == [
        (1, "a", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T02:00:00"), False),
        (1, "a", _ts("2024-01-01T03:00:00"), None, True),
        (1, "b", _ts("2024-01-01T02:00:00"), _ts("2024-01-01T03:00:00"), False),
        (2, "a", _ts("2024-01-01T00:30:00"), None, True),
    ]


def test_scd2_single_exchange(spark):
    import re

    from test_plans import fmt
    from xmlschemavalidator_spark.temporal import scd2_build

    ev = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T00:00:00"), "a")],
        "event_id bigint, user_id bigint, ts timestamp, status string",
    )
    plan = fmt(scd2_build(ev, key="user_id", ts="ts", attrs=("status",),
                          order_col="event_id"))
    # lag (change detect) + lead (interval chain) share one shuffle
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_scd2_point_in_time_lookup_via_asof(spark):
    # the classic use: as-of join a fact row against the dimension's
    # valid_from recovers exactly the attrs valid at that instant
    ev = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:00:00"), "bronze"),
            (2, 1, _ts("2024-01-05T00:00:00"), "gold"),
        ],
        "event_id bigint, user_id bigint, ts timestamp, status string",
    )
    from xmlschemavalidator_spark.temporal import scd2_build

    dim = scd2_build(ev, key="user_id", ts="ts", attrs=("status",),
                     order_col="event_id").select(
        "user_id", F.col("valid_from").alias("ts"), "status"
    )
    facts = spark.createDataFrame(
        [(10, 1, _ts("2024-01-03T12:00:00")), (11, 1, _ts("2024-01-06T00:00:00"))],
        "fact_id bigint, user_id bigint, ts timestamp",
    )
    got = {
        r["fact_id"]: r["asof_status"]
        for r in asof_join(facts, dim, on="user_id", ts="ts",
                           state_cols=("status",)).collect()
    }
    assert got == {10: "bronze", 11: "gold"}


# ---------------------------------------------------------- streaming rollup

def test_stream_rollup_matches_batch(spark, tmp_path):
    from xmlschemavalidator_spark.temporal import (
        read_time_rollup,
        stream_time_rollup,
    )

    ev = _events(
        spark,
        [(i, i % 2, _ts("2024-01-01T00:00:00") + dt.timedelta(hours=5 * i),
          float(i)) for i in range(40)],
    ).select("ts", "user_id", "value")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    sdf = (
        spark.readStream.schema("ts timestamp, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_time_rollup(
        sdf, "ts", 86400, str(tmp_path / "agg"), str(tmp_path / "ckpt"),
        dims=("user_id",),
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    # >1 micro-batch actually ran (one per file) — the merge is exercised
    import glob

    assert len(glob.glob(str(tmp_path / "agg" / "_batch=*"))) > 1
    got = read_time_rollup(spark, str(tmp_path / "agg"), dims=("user_id",))
    want = time_rollup(ev, "ts", 86400, dims=("user_id",))
    cols = ["bucket_start", "user_id", "n_events", "sum_value", "min_value", "max_value"]
    assert rows(got, *cols) == rows(want, *cols)


# --------------------------------------------------------------- sessionize

def test_sessionize_gap_strictly_greater_breaks(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T00:00:00"), 0.0),
            (2, 1, _ts("2024-01-01T01:00:00"), 0.0),  # gap == 3600s: SAME session
            (3, 1, _ts("2024-01-01T02:00:01"), 0.0),  # gap > 3600s: new session
            (4, 2, _ts("2024-01-01T00:00:00"), 0.0),  # other key restarts at 1
        ],
    )
    out = sessionize(ev, on="user_id", ts="ts", gap_seconds=3600,
                     order_col="event_id")
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_equal_ts_ties_deterministic(spark):
    t0 = _ts("2024-01-01T00:00:00")
    ev = _events(spark, [(2, 1, t0, 0.0), (1, 1, t0, 0.0),
                         (3, 1, t0 + dt.timedelta(hours=9), 0.0)])
    st = session_stats(
        sessionize(ev, on="user_id", ts="ts", gap_seconds=3600,
                   order_col="event_id"),
        on="user_id", ts="ts",
    )
    got = rows(st, "session_seq", "n_events")
    assert got == [(1, 2), (2, 1)]


def test_sessionize_single_exchange(spark):
    import re

    from test_plans import fmt

    ev = _events(spark, [(1, 1, _ts("2024-01-01T00:00:00"), 0.0)])
    plan = fmt(sessionize(ev, on="user_id", ts="ts", gap_seconds=60,
                          order_col="event_id"))
    # lag + running sum share ONE shuffle (and one Sort)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1


# ------------------------------------------------------- review regressions

def test_asof_null_ts_state_never_matches(spark):
    # ASOF semantics: state.ts <= probe.ts is never true for NULL state
    # ts (DuckDB agrees) — the NULLS FIRST window order must not carry a
    # NULL-ts state row forward as the "most recent" state
    state = _events(
        spark,
        [(10, 1, None, 9.0), (11, 1, _ts("2024-01-01T02:00:00"), 7.0)],
    ).select("user_id", "ts", "value", "event_id")
    probe = _events(spark, [(1, 1, _ts("2024-01-01T00:30:00"), 0.0),
                            (2, 1, _ts("2024-01-01T03:00:00"), 0.0)])
    got = {
        r["event_id"]: (r["asof_value"], r["asof_event_id"])
        for r in asof_join(probe, state, on="user_id", ts="ts",
                           state_cols=("value", "event_id")).collect()
    }
    assert got == {1: (None, None), 2: (7.0, 11)}


def test_asof_rejects_output_name_collision(spark):
    # chained asof_join with the default prefix: the second call would
    # emit duplicate asof_* columns -> refuse, demand a distinct prefix
    state = _events(spark, [(10, 1, _ts("2024-01-01T01:00:00"), 5.0)]).select(
        "user_id", "ts", "value", "event_id"
    )
    probe = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)])
    once = asof_join(probe, state, on="user_id", ts="ts", state_cols=("value",))
    with pytest.raises(ValueError, match="prefix"):
        asof_join(once, state, on="user_id", ts="ts", state_cols=("value",))
    # distinct prefix works
    twice = asof_join(once, state, on="user_id", ts="ts",
                      state_cols=("value",), prefix="asof2_")
    assert twice.collect()[0]["asof2_value"] == 5.0


def test_range_join_refuses_same_bucket_inversion(spark):
    # inverted by 20 min INSIDE one hour bucket: _b0 == _b1, so the
    # bucket-level check can't see it — the raw-bound check must
    iv = _intervals(
        spark, [(100, 1, _ts("2024-01-01T10:30:00"), _ts("2024-01-01T10:10:00"))]
    )
    ev = _events(spark, [(1, 1, _ts("2024-01-01T10:20:00"), 0.0)])
    with pytest.raises(ValueError, match="empty"):
        range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                   end="end_ts", bucket_seconds=3600)


def test_range_join_rejects_reserved_names(spark):
    iv = _intervals(
        spark, [(100, 1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:00:00"))]
    )
    ev = _events(spark, [(1, 1, _ts("2024-01-01T02:00:00"), 0.0)]).withColumn(
        "_bucket", F.lit(1)
    )
    with pytest.raises(ValueError, match="_bucket"):
        range_join(ev, iv, on="user_id", ts="ts", start="start_ts",
                   end="end_ts", bucket_seconds=3600)


def test_sessionize_and_scd2_reject_reserved_names(spark):
    from xmlschemavalidator_spark.temporal import scd2_build

    ev = _events(spark, [(1, 1, _ts("2024-01-01T00:00:00"), 0.0)])
    with pytest.raises(ValueError, match="_new"):
        sessionize(ev.withColumn("_new", F.lit(1)), on="user_id", ts="ts",
                   gap_seconds=60, order_col="event_id")
    with pytest.raises(ValueError, match="session_seq"):
        sessionize(ev.withColumn("session_seq", F.lit(1)), on="user_id",
                   ts="ts", gap_seconds=60, order_col="event_id")
    sev = ev.withColumn("status", F.lit("a"))
    with pytest.raises(ValueError, match="_chg"):
        scd2_build(sev.withColumn("_chg", F.lit(True)), key="user_id",
                   ts="ts", attrs=("status",), order_col="event_id")
    with pytest.raises(ValueError, match="valid_from"):
        scd2_build(sev.withColumn("valid_from", F.lit("x")), key="user_id",
                   ts="ts", attrs=("status", "valid_from"),
                   order_col="event_id")


def test_rollup_append_skips_empty_batch(spark, tmp_path):
    ev = _events(spark, [(1, 1, _ts("2024-01-01T00:00:00"), 2.0)])
    path = str(tmp_path / "agg")
    # an empty first batch must not write a part-less _batch dir that
    # poisons read-back schema inference
    append_time_rollup(ev.where(F.lit(False)), "ts", 86400, path, "00000")
    import glob

    assert glob.glob(str(tmp_path / "agg" / "_batch=*")) == []
    append_time_rollup(ev, "ts", 86400, path, "00001")
    got = read_time_rollup(spark, path).collect()
    assert len(got) == 1 and got[0]["n_events"] == 1


# ------------------------------------------------------------ interval union

def test_interval_union_merges_overlaps_and_touches(spark):
    from xmlschemavalidator_spark.temporal import interval_union

    iv = spark.createDataFrame(
        [
            # key 1: [0,2) + [1,3) overlap; [3,5) TOUCHES -> one run [0,5)
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T02:00:00")),
            (1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T03:00:00")),
            (1, _ts("2024-01-01T03:00:00"), _ts("2024-01-01T05:00:00")),
            # key 1: gap -> second run [07,08)
            (1, _ts("2024-01-01T07:00:00"), _ts("2024-01-01T08:00:00")),
            # contained interval extends nothing
            (1, _ts("2024-01-01T00:30:00"), _ts("2024-01-01T01:00:00")),
            # key 2 isolated; inverted + NULL rows dropped
            (2, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00")),
            (2, _ts("2024-01-01T09:00:00"), _ts("2024-01-01T08:00:00")),
            (2, None, _ts("2024-01-01T10:00:00")),
        ],
        "user_id bigint, start_ts timestamp, end_ts timestamp",
    )
    out = interval_union(iv, on="user_id", start="start_ts", end="end_ts")
    got = sorted(
        (r["user_id"], r["run_seq"], r["start_us"], r["end_us"], r["n_intervals"])
        for r in out.collect()
    )
    h = 3_600_000_000  # one hour in us
    t0 = int(_ts("2024-01-01T00:00:00").replace(
        tzinfo=__import__("datetime").timezone.utc).timestamp()) * 1_000_000
    assert got == [
        (1, 1, t0, t0 + 5 * h, 4),
        (1, 2, t0 + 7 * h, t0 + 8 * h, 1),
        (2, 1, t0, t0 + 1 * h, 1),
    ]
    # coverage = one tiny agg over the runs
    cov = {
        r["user_id"]: r["cov"]
        for r in out.groupBy("user_id")
        .agg(F.sum(F.col("end_us") - F.col("start_us")).alias("cov"))
        .collect()
    }
    assert cov == {1: 6 * h, 2: 1 * h}


def test_interval_union_single_exchange(spark):
    import re

    from test_plans import fmt
    from xmlschemavalidator_spark.temporal import interval_union

    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T02:00:00"))],
        "user_id bigint, start_ts timestamp, end_ts timestamp",
    )
    plan = fmt(interval_union(iv, on="user_id", start="start_ts", end="end_ts"))
    # run detection + numbering + envelope agg all ride ONE shuffle
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_cdc_apply_upsert_delete_insert(spark):
    from xmlschemavalidator_spark.temporal import cdc_apply

    target = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "id bigint, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            # key 1: two updates, latest (ts=5) wins
            (1, 3, 100, "U", "alice2", 11.0),
            (1, 5, 101, "U", "alice3", 12.0),
            # key 2: update then tombstone -> deleted
            (2, 3, 102, "U", "bob2", 21.0),
            (2, 6, 103, "D", None, None),
            # key 4: insert of an unseen key
            (4, 1, 104, "I", "dave", 40.0),
            # key 5: insert then delete -> never appears
            (5, 1, 105, "I", "eve", 50.0),
            (5, 2, 106, "D", None, None),
        ],
        "id bigint, ts bigint, ord bigint, op string, name string, bal double",
    )
    got = sorted(
        tuple(r)
        for r in cdc_apply(target, changes, key="id", ts="ts", order_col="ord").collect()
    )
    assert got == [
        (1, "alice3", 12.0),   # latest update applied
        (3, "carol", 30.0),    # untouched passthrough
        (4, "dave", 40.0),     # inserted
    ]


def test_cdc_apply_equal_ts_tie_breaks_on_order(spark):
    from xmlschemavalidator_spark.temporal import cdc_apply

    target = spark.createDataFrame([(1, "x")], "id bigint, v string")
    changes = spark.createDataFrame(
        [(1, 7, 1, "U", "first"), (1, 7, 2, "U", "second")],
        "id bigint, ts bigint, ord bigint, op string, v string",
    )
    got = cdc_apply(target, changes, key="id", ts="ts", order_col="ord").collect()
    assert [tuple(r) for r in got] == [(1, "second")]


def test_cdc_apply_missing_attr_column_raises(spark):
    import pytest as _pytest

    from xmlschemavalidator_spark.temporal import cdc_apply

    target = spark.createDataFrame([(1, "x")], "id bigint, v string")
    changes = spark.createDataFrame(
        [(1, 7, 1, "U")], "id bigint, ts bigint, ord bigint, op string"
    )
    with _pytest.raises(ValueError, match="missing column"):
        cdc_apply(target, changes, key="id", ts="ts", order_col="ord")


def test_rolling_anomalies_spike_and_warmup(spark):
    from xmlschemavalidator_spark.temporal import rolling_anomalies

    # flat series of 10s, then one 100 spike, then back to 10
    rows = [("k", i, 10) for i in range(12)] + [("k", 12, 100)] + [
        ("k", i, 10) for i in range(13, 16)
    ]
    df = spark.createDataFrame(rows, "k string, b bigint, v bigint")
    got = rolling_anomalies(df, key="k", bucket="b", value="v", window=4, k_tenths=30).collect()
    flagged = {(r["k"], r["b"]): r for r in got}
    # zero-variance lookback of 10s: spike at b=12 must flag high
    assert ("k", 12) in flagged and flagged[("k", 12)]["flag_hi"] is True
    assert flagged[("k", 12)]["mean_q"] == 10
    # the drop back to 10 right after the spike window also flags (low)
    lows = [k for k, r in flagged.items() if not r["flag_hi"]]
    assert all(b > 12 for _, b in lows)
    # warm-up rows (b < 4: lookback shorter than window) never flag
    assert all(b >= 4 for _, b in flagged)


def test_rolling_anomalies_flat_series_silent(spark):
    from xmlschemavalidator_spark.temporal import rolling_anomalies

    df = spark.createDataFrame(
        [("k", i, 7) for i in range(20)], "k string, b bigint, v bigint"
    )
    assert rolling_anomalies(df, key="k", bucket="b", value="v", window=5).count() == 0


def test_last_touch_attribution(spark):
    from xmlschemavalidator_spark.temporal import last_touch_attribution

    rows = [
        # user A: click @0, purchase @1h (attributed), purchase @10d (window out)
        (1, "A", "2024-01-01 00:00:00", "click"),
        (2, "A", "2024-01-01 01:00:00", "purchase"),
        (3, "A", "2024-01-11 00:00:00", "purchase"),
        # user B: purchase with no preceding touch
        (4, "B", "2024-01-01 00:00:00", "purchase"),
        # user B: later click then purchase at the SAME ts (log order wins)
        (5, "B", "2024-01-02 00:00:00", "click"),
        (6, "B", "2024-01-02 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, u string, ts_s string, et string"
    ).select("id", "u", F.col("ts_s").cast("timestamp").alias("ts"), "et")
    got = {r["conv_id"]: r for r in last_touch_attribution(
        df, on="u", ts="ts", order_col="id", type_col="et",
        touch_types=("click",), conv_types=("purchase",),
        window_seconds=7 * 86400,
    ).collect()}
    assert got[2]["attributed"] is True and got[2]["touch_id"] == 1
    assert got[3]["attributed"] is False and got[3]["touch_id"] is None
    assert got[4]["attributed"] is False
    # equal-ts click precedes the purchase in (ts, id) order -> attributed
    assert got[6]["attributed"] is True and got[6]["touch_id"] == 5


def test_cdc_partial_store_merges_to_one_shot(spark, tmp_path):
    from xmlschemavalidator_spark.temporal import (
        append_cdc_partial,
        cdc_apply,
        read_cdc_state,
    )

    store = str(tmp_path / "store")
    target = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id bigint, name string, bal double"
    )
    schema = "id bigint, ts bigint, ord bigint, op string, name string, bal double"
    b1 = spark.createDataFrame(
        [(1, 3, 100, "U", "alice2", 11.0), (3, 1, 101, "I", "carol", 30.0)],
        schema,
    )
    b2 = spark.createDataFrame(
        [(1, 5, 102, "U", "alice3", 12.0), (2, 6, 103, "D", None, None)],
        schema,
    )
    append_cdc_partial(b1, store, "b1", key="id", ts="ts", order_col="ord")
    append_cdc_partial(b2, store, "b2", key="id", ts="ts", order_col="ord")
    got = sorted(tuple(r) for r in read_cdc_state(
        spark, store, target, key="id", ts="ts", order_col="ord"
    ).collect())
    one_shot = sorted(tuple(r) for r in cdc_apply(
        target, b1.unionByName(b2), key="id", ts="ts", order_col="ord"
    ).collect())
    assert got == one_shot == [(1, "alice3", 12.0), (3, "carol", 30.0)]

    # retry idempotence: replaying a batch overwrites exactly its own dir
    append_cdc_partial(b2, store, "b2", key="id", ts="ts", order_col="ord")
    again = sorted(tuple(r) for r in read_cdc_state(
        spark, store, target, key="id", ts="ts", order_col="ord"
    ).collect())
    assert again == got

    # empty batches leave no dir behind
    empty = spark.createDataFrame([], schema)
    append_cdc_partial(empty, store, "b3", key="id", ts="ts", order_col="ord")
    import os
    assert not os.path.exists(f"{store}/_batch=b3")


def test_interarrival_stats_telescoping_mean(spark):
    from xmlschemavalidator_spark.temporal import interarrival_stats

    df = spark.createDataFrame(
        [
            (1, "A", "2024-01-01 00:00:00"),
            (2, "A", "2024-01-01 00:00:10"),
            (3, "A", "2024-01-01 00:01:10"),  # gaps: 10s, 60s
            (4, "B", "2024-01-01 00:00:00"),  # singleton: NULL gaps
        ],
        "id bigint, u string, ts_s string",
    ).select("id", "u", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r["u"]: r for r in interarrival_stats(
        df, on="u", ts="ts", order_col="id"
    ).collect()}
    a = got["A"]
    assert (a["n_events"], a["n_gaps"]) == (3, 2)
    assert a["min_gap_us"] == 10_000_000 and a["max_gap_us"] == 60_000_000
    # telescoping: mean = (70s span) / 2 gaps = 35s exactly
    assert a["mean_gap_us"] == 35_000_000
    b = got["B"]
    assert b["n_gaps"] == 0 and b["mean_gap_us"] is None


def test_cdc_apply_metadata_name_clash_raises(spark):
    import pytest as _pytest

    from xmlschemavalidator_spark.temporal import cdc_apply

    # target carries its own 'ts' attribute: the flat latest-per-key
    # projection would be ambiguous — refuse loudly
    target = spark.createDataFrame([(1, "a", 9)], "id bigint, v string, ts bigint")
    changes = spark.createDataFrame(
        [(1, 2, 3, "U", "b", 9)],
        "id bigint, ts bigint, ord bigint, op string, v string, ts2 bigint",
    ).withColumnRenamed("ts2", "x")
    with _pytest.raises(ValueError, match="change-metadata"):
        cdc_apply(target, changes, key="id", ts="ts", order_col="ord")


def test_last_touch_attribution_null_ts_dropped(spark):
    from xmlschemavalidator_spark.temporal import last_touch_attribution

    rows = [
        (1, "A", "2024-01-01 00:00:00", "click"),
        (2, "A", None, "click"),  # NULL ts must not mask the real touch
        (3, "A", "2024-01-01 01:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, u string, ts_s string, et string"
    ).select("id", "u", F.col("ts_s").cast("timestamp").alias("ts"), "et")
    got = last_touch_attribution(
        df, on="u", ts="ts", order_col="id", type_col="et",
        touch_types=("click",), conv_types=("purchase",),
        window_seconds=86400,
    ).collect()
    assert len(got) == 1
    assert got[0]["attributed"] is True and got[0]["touch_id"] == 1


def _cusum_reference(values, target, slack, threshold):
    """Textbook Page-1954 recursion — the implementation's prefix-sum
    unrolling must reproduce it exactly."""
    cp = cn = 0
    out = []
    for i, x in enumerate(values):
        cp = max(0, cp + x - target - slack)
        cn = max(0, cn + target - slack - x)
        if cp > threshold or cn > threshold:
            out.append((i, x, cp, cn, cp > threshold))
    return out


def test_cusum_matches_textbook_recursion(spark):
    from xmlschemavalidator_spark.temporal import cusum_changepoints

    # flat around 10, step up to 14 at i=20, step down to 6 at i=40
    vals = [10, 11, 9, 10] * 5 + [14, 13, 15, 14] * 5 + [6, 7, 5, 6] * 5
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key string, b int, v int"
    )
    got = sorted(
        (r["b"], r["value_q"], r["cusum_pos"], r["cusum_neg"], r["flag_hi"])
        for r in cusum_changepoints(
            df, "key", "b", "v", target=10, slack=1, threshold=8
        ).collect()
    )
    want = _cusum_reference(vals, target=10, slack=1, threshold=8)
    assert got == want
    # the upward shift alarms with flag_hi, the downward one without
    assert any(f for (_, _, _, _, f) in got) and any(
        not f for (_, _, _, _, f) in got
    )
    # no alarm before the first shift's evidence can accumulate
    assert min(b for (b, _, _, _, _) in got) >= 20


def test_cusum_flat_series_silent_and_null_dropped(spark):
    from xmlschemavalidator_spark.temporal import cusum_changepoints

    rows = [("k", i, 10 if i != 7 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "key string, b int, v int")
    assert (
        cusum_changepoints(
            df, "key", "b", "v", target=10, slack=0, threshold=5
        ).count()
        == 0
    )


def test_cusum_rejects_bad_params(spark):
    import pytest

    from xmlschemavalidator_spark.temporal import cusum_changepoints

    df = spark.createDataFrame([("k", 1, 1)], "key string, b int, v int")
    with pytest.raises(ValueError):
        cusum_changepoints(df, "key", "b", "v", target=1, slack=-1, threshold=5)
    with pytest.raises(ValueError):
        cusum_changepoints(df, "key", "b", "v", target=1, slack=0, threshold=0)


def test_event_transitions_hand_computed(spark):
    from xmlschemavalidator_spark.temporal import event_transitions

    rows = [
        # user 1: a -> b -> a ; user 2: a -> a ; NULL event dropped
        (1, 1, "2024-01-01 00:00:00", "a"),
        (1, 2, "2024-01-01 00:01:00", "b"),
        (1, 3, "2024-01-01 00:02:00", "a"),
        (2, 4, "2024-01-01 00:00:00", "a"),
        (2, 5, "2024-01-01 00:01:00", "a"),
        (2, 6, "2024-01-01 00:02:00", None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, etype string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["from_event"], r["to_event"]): (r["n"], r["p_micro"])
        for r in event_transitions(df, "user_id", "ts", "etype", "event_id").collect()
    }
    # from a: ->b once, ->a once; from b: ->a once
    assert got[("a", "b")] == (1, 500_000)
    assert got[("a", "a")] == (1, 500_000)
    assert got[("b", "a")] == (1, 1_000_000)
    assert len(got) == 3


def test_event_transitions_end_marker_and_ties(spark):
    from xmlschemavalidator_spark.temporal import event_transitions

    rows = [  # tied timestamps: id order decides a -> b, not b -> a
        (1, 10, "2024-01-01 00:00:00", "a"),
        (1, 11, "2024-01-01 00:00:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, etype string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["from_event"], r["to_event"]): r["n"]
        for r in event_transitions(
            df, "user_id", "ts", "etype", "event_id", include_end=True
        ).collect()
    }
    assert got == {("a", "b"): 1, ("b", "<end>"): 1}


def test_ewma_control_hand_computed(spark):
    import math as _m

    from xmlschemavalidator_spark.temporal import ewma_control

    # alpha=0.5, horizon=3 -> quantized weights floor([.5, .25, .125]*1e6)
    rows = [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 2.0)]
    df = spark.createDataFrame(rows, "key string, bucket int, v double")
    got = {
        r["bucket"]: (r["value_q"], r["ewma"], r["flag_hi"], r["flag_lo"])
        for r in ewma_control(
            df, "key", "bucket", "v", target=10.0, threshold=5.0,
            alpha_micro=500_000, horizon=3,
        ).collect()
    }
    w = [500_000, 250_000, 125_000]
    # bucket 1: only w0 present -> ewma = 10 exactly, inside the band
    assert got[1] == (10, 10.0, False, False)
    # bucket 2: (w0*20 + w1*10)/(w0+w1)
    e2 = round((w[0] * 20 + w[1] * 10) / (w[0] + w[1]), 6)
    assert got[2] == (20, e2, e2 > 15, False)
    # bucket 3: (w0*2 + w1*20 + w2*10)/sum(w)
    e3 = round((w[0] * 2 + w[1] * 20 + w[2] * 10) / sum(w), 6)
    assert got[3][1] == e3
    assert _m.isclose(e3, 7.25 / 0.875, abs_tol=0.01)


def test_ewma_flags_medium_drift(spark):
    from xmlschemavalidator_spark.temporal import ewma_control

    # level 100 for 20 buckets then a persistent +8 drift: a 3-sigma
    # z-gate on sigma=4 never fires on single points, EWMA does
    rows = [("k", i, 100.0 + (8.0 if i >= 20 else 0.0)) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, bucket int, v double")
    out = ewma_control(
        df, "key", "bucket", "v", target=100.0, threshold=6.0,
        alpha_micro=300_000, horizon=32,
    )
    flagged = sorted(r["bucket"] for r in out.where("flag_hi").collect())
    assert flagged and min(flagged) in range(20, 26)  # fires shortly after onset
    assert not out.where("flag_lo").count()


def test_ewma_matches_duckdb_oracle(spark):
    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.temporal import (
        ewma_control,
        ewma_control_oracle_sql,
    )

    rows = [("a" if i % 2 else "b", i, ((i * 37) % 100) / 3.0) for i in range(60)]
    df = spark.createDataFrame(rows, "key string, bucket int, v double")
    got = sorted(
        map(tuple, ewma_control(
            df, "key", "bucket", "v", target=16.0, threshold=4.0, quantum=100
        ).collect())
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["key", "bucket", "v"]))
    sql = ewma_control_oracle_sql(
        "SELECT * FROM t", "key", "bucket", "v",
        target=16.0, threshold=4.0, quantum=100,
    )
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == oracle


def test_acf_hand_computed_and_seasonal(spark):
    from xmlschemavalidator_spark.temporal import acf

    # ramp 1,2,3,4: mean 2.5, den 5.0; lag1 num 1.25, lag2 -1.5, lag3 -2.25
    ramp = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)], "t long, y double"
    )
    out = {r["lag"]: r for r in acf(ramp, "t", "y", lags=(1, 2, 3, 9)).collect()}
    assert out[1]["acf"] == 0.25 and out[1]["n_pairs"] == 3
    assert out[2]["acf"] == -0.3 and out[3]["acf"] == -0.45
    # lag beyond the span: disclosed as 0 pairs, NULL acf
    assert out[9]["n_pairs"] == 0 and out[9]["acf"] is None

    # period-2 series: strong positive at the period, negative off-period
    per = spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else 5.0) for i in range(6)], "t long, y double"
    )
    o2 = {r["lag"]: r for r in acf(per, "t", "y", lags=(1, 2)).collect()}
    assert o2[2]["acf"] == round(16 / 24, 6) and o2[1]["acf"] == round(-20 / 24, 6)

    # gapped series: pairs only where both buckets exist (t=0,1,3 -> lag1
    # has just the (0,1) pair)
    gap = spark.createDataFrame([(0, 1.0), (1, 2.0), (3, 4.0)], "t long, y double")
    o3 = {r["lag"]: r for r in acf(gap, "t", "y", lags=(1,)).collect()}
    assert o3[1]["n_pairs"] == 1

    # step: bucket_start in seconds with 3600-wide buckets
    hrs = spark.createDataFrame(
        [(i * 3600, float(i + 1)) for i in range(4)], "t long, y double"
    )
    o4 = {r["lag"]: r for r in acf(hrs, "t", "y", lags=(1,), step=3600).collect()}
    assert o4[1]["acf"] == 0.25

    import pytest as _pt
    with _pt.raises(ValueError):
        acf(ramp, "t", "y", lags=(0,))


def test_seasonal_profile_hour_and_dow(spark):
    import pytest as _pt

    from xmlschemavalidator_spark.temporal import seasonal_profile

    # 3 events at hour 0, 1 at hour 12 -> indexes 18e6 and 6e6
    df = spark.createDataFrame(
        [("2026-01-05 00:10:00",), ("2026-01-05 00:20:00",),
         ("2026-01-06 00:30:00",), ("2026-01-05 12:00:00",)],
        "ts string",
    )
    out = {r["bucket"]: r for r in seasonal_profile(df, "ts").collect()}
    assert out[0]["n_events"] == 3
    assert out[0]["seasonal_index_micro"] == 3 * 24 * 1_000_000 // 4
    assert out[12]["seasonal_index_micro"] == 1 * 24 * 1_000_000 // 4

    # day_of_week: 2026-01-05 is a Monday -> bucket 0; 2026-01-06 -> 1
    dow = {r["bucket"]: r["n_events"]
           for r in seasonal_profile(df, "ts", "day_of_week").collect()}
    assert dow == {0: 3, 1: 1}

    with _pt.raises(ValueError):
        seasonal_profile(df, "ts", "fortnight")


def test_dispersion_index_poisson_vs_bursty(spark):
    from xmlschemavalidator_spark.temporal import dispersion_index

    rows = []
    # 'steady': one event per hour for 12 hours -> D = 0 (metronome)
    for h in range(12):
        rows.append(("steady", f"2024-01-01 {h:02d}:30:00"))
    # 'bursty': 12 events all in hour 0 of a 12-hour span + 1 at hour 11
    for i in range(12):
        rows.append(("bursty", f"2024-01-01 00:{i:02d}:00"))
    rows.append(("bursty", "2024-01-01 11:00:00"))
    df = spark.createDataFrame(rows, "host string, ts_s string").select(
        "host", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {r["key"]: r for r in
           dispersion_index(df, "ts", "host", 3600).collect()}
    st = out["steady"]
    assert (st["n_events"], st["n_buckets"]) == (12, 12)
    assert st["dispersion"] == 0.0 and st["overdispersed"] is False
    bu = out["bursty"]
    # S=13, Q=145, B=12: D = (12*145 - 169) / (11*13) = 1571/143
    assert bu["dispersion"] == round(1571 / 143, 6)
    assert bu["overdispersed"] is True

    # single-bucket key: no variance exists -> NULL, never a div/0
    one = spark.createDataFrame(
        [("x", "2024-01-01 05:00:00"), ("x", "2024-01-01 05:30:00")],
        "host string, ts_s string",
    ).select("host", F.col("ts_s").cast("timestamp").alias("ts"))
    [o] = dispersion_index(one, "ts", "host").collect()
    assert o["dispersion"] is None and o["overdispersed"] is False


def test_event_ngrams_contiguous_and_key_bounded(spark):
    """Trigrams never cross keys, honor (ts, id) ordering, and n_keys
    counts distinct keys not occurrences."""
    from xmlschemavalidator_spark.temporal import event_ngrams

    rows = [
        # user 1: a b c a b c  -> (a,b,c) x2, (b,c,a) x1, (c,a,b) x1
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
        (1, 4, "a"), (1, 5, "b"), (1, 6, "c"),
        # user 2: a b c        -> (a,b,c) x1
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        # user 3: too short
        (3, 1, "a"), (3, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, e string")
    out = {
        (r["e_1"], r["e_2"], r["e_3"]): r
        for r in event_ngrams(df, "k", "ts", "e", n=3, min_count=1).collect()
    }
    assert out[("a", "b", "c")]["n_occurrences"] == 3
    assert out[("a", "b", "c")]["n_keys"] == 2
    assert out[("b", "c", "a")]["n_occurrences"] == 1
    assert out[("b", "c", "a")]["n_keys"] == 1
    # nothing crossing user boundaries: (c, a, b) exists only within u1
    assert out[("c", "a", "b")]["n_keys"] == 1
    assert len(out) == 3


def test_seasonal_residual_anomalies_deseasonalizes(spark):
    """A weekly-patterned stream (Mondays always 3x) never flags its
    Mondays; a genuine one-off spike on a quiet day flags."""
    from xmlschemavalidator_spark.temporal import seasonal_residual_anomalies

    rows = []
    day0 = 19724  # a Thursday-anchored arbitrary epoch day
    for d in range(28):
        day = day0 + d
        n = 30 if (day + 3) % 7 == 0 else 10   # every Monday 3x
        if d == 24:
            n = 80                              # the real anomaly
        for i in range(n):
            rows.append((day * 86400 + i, "click"))
    df = spark.createDataFrame(rows, "sec long, k string").select(
        F.timestamp_seconds("sec").alias("ts"), "k"
    )
    out = seasonal_residual_anomalies(df, "ts", "k", window=7).collect()
    flagged_days = {r["day"] for r in out}
    assert day0 + 24 in flagged_days
    # no Monday flags: the 3x pattern is seasonality, not anomaly
    assert all((d + 3) % 7 != 0 or d == day0 + 24 for d in flagged_days)
    assert all(r["flag_hi"] for r in out if r["day"] == day0 + 24)


def test_transition_drift(spark):
    from xmlschemavalidator_spark.temporal import transition_drift

    # user 1 (period A): v->c, c->p ; user 2 (period B): v->v, v->p
    rows = [
        (1, 1, "v", True), (1, 2, "c", True), (1, 3, "p", True),
        (2, 1, "v", False), (2, 2, "v", False), (2, 3, "p", False),
    ]
    df = spark.createDataFrame(rows, "u long, t long, e string, pa boolean")
    got = {(r["from_event"], r["to_event"]): r for r in
           transition_drift(df, "u", "t", "e", "pa", id_col="t").collect()}
    # A: v->c (1 of 1 from v), c->p (1 of 1). B: v->v (1 of 2), v->p (1 of 2)
    assert got[("v", "c")]["n_a"] == 1 and got[("v", "c")]["n_b"] == 0
    assert got[("v", "c")]["p_a_micro"] == 1_000_000
    assert got[("v", "c")]["p_b_micro"] == 0         # edge absent in B: 0, not NULL
    assert got[("v", "v")]["p_b_micro"] == 500_000
    assert got[("v", "v")]["p_a_micro"] == 0
    # c never appears as a from-state in B: NULL p_b for c->p
    assert got[("c", "p")]["p_b_micro"] is None
    assert got[("c", "p")]["delta_micro"] == 1_000_000
    # deltas are signed
    assert got[("v", "c")]["delta_micro"] == 1_000_000
    assert got[("v", "v")]["delta_micro"] == -500_000


# ---------------------------------------------------------------------------
# cohort_retention / funnel_conversion
# ---------------------------------------------------------------------------


def test_cohort_retention_hand_computed(spark):
    import datetime as dt

    from xmlschemavalidator_spark.temporal import cohort_retention

    d = lambda day: dt.datetime(1970, 1, 1) + dt.timedelta(days=day)
    # users 1,2 first in period 0 (days 0-6); user 1 returns period 1;
    # user 3 first in period 1
    rows = [
        (1, d(0)), (1, d(3)), (1, d(8)),
        (2, d(1)),
        (3, d(7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort"], r["offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in cohort_retention(df, "user_id", "ts", period_days=7).collect()
    }
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(1, 0)] == (1, 1, 1.0)
    assert (1, 1) not in got


def test_funnel_strict_order(spark):
    import datetime as dt

    from xmlschemavalidator_spark.temporal import funnel_conversion

    t = lambda h: dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
    rows = [
        # user 1: full ordered funnel
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: purchase BEFORE click -> stops at click
        (2, t(0), "view"), (2, t(2), "click"), (2, t(1), "purchase"),
        # user 3: view only
        (3, t(0), "view"),
        # user 4: click without view -> never enters
        (4, t(0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["step"]: r
        for r in funnel_conversion(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 2
    assert out["purchase"]["n_users"] == 1
    assert out["click"]["conversion_from_first"] == round(2 / 3, 6)
    assert out["purchase"]["conversion_from_prev"] == 0.5
    assert out["view"]["conversion_from_prev"] is None


def test_funnel_empty_step_tail(spark):
    import datetime as dt

    import pytest

    from xmlschemavalidator_spark.temporal import funnel_conversion

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, "view")], "user_id long, ts timestamp, event_type string"
    )
    out = funnel_conversion(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()
    assert [r["n_users"] for r in out] == [1, 0, 0]
    assert out[2]["conversion_from_prev"] is None  # 0/0 tail
    with pytest.raises(ValueError):
        funnel_conversion(df, "user_id", "ts", "event_type", ["view"])


def test_rolling_active_users_islands(spark):
    import datetime as dt

    import pytest

    from xmlschemavalidator_spark.temporal import rolling_active_users

    d = lambda day: dt.datetime(1970, 1, 1) + dt.timedelta(days=day)
    # user 1 active days 0 and 10 (two islands at w=3); user 2 day 1
    rows = [(1, d(0)), (1, d(10)), (2, d(1))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    out = {r["day"]: r for r in rolling_active_users(df, "u", "ts", window_days=3).collect()}
    # day 0: dau 1 (u1), mau 1; day 1: dau 1 (u2), mau 2
    assert (out[0]["dau"], out[0]["mau"]) == (1, 1)
    assert (out[1]["dau"], out[1]["mau"]) == (1, 2)
    assert out[1]["stickiness"] == 0.5
    # day 3: u1's day-0 coverage expired (w=3 covers 0..2), u2 covers 1..3
    assert (out[3]["dau"], out[3]["mau"]) == (0, 1)
    # gap days 4..9: nobody
    assert out[5]["mau"] == 0 and out[5]["stickiness"] is None
    assert (out[10]["dau"], out[10]["mau"]) == (1, 1)
    with pytest.raises(ValueError):
        rolling_active_users(df, "u", "ts", window_days=0)
