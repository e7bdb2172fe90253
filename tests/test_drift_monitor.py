"""Streaming drift monitor: foreachBatch sketches vs persisted baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.baseline import snapshot_baseline
from xmlschemavalidator_spark.streaming.drift_monitor import StreamingDriftMonitor


def _write_batch(spark, path, lo, hi, n=5000):
    (
        spark.range(0, n)
        .select(((F.col("id") % (hi - lo)) + lo).cast("double").alias("v"))
        .coalesce(1)  # one file -> one micro-batch under maxFilesPerTrigger=1
        .write.mode("append")
        .parquet(path)
    )


def test_streaming_drift_monitor(spark, tmp_path):
    baseline_path = str(tmp_path / "baseline")
    stream_src = str(tmp_path / "src")
    out_dir = str(tmp_path / "drift_out")

    # baseline: uniform over [0, 1000)
    base = spark.range(0, 20_000).select((F.col("id") % 1000).cast("double").alias("v"))
    snapshot_baseline(base.repartition(4), ["v"], baseline_path, "snapB")

    # stream input: one in-distribution file, one shifted file
    _write_batch(spark, stream_src, 0, 1000)
    _write_batch(spark, stream_src, 5000, 6000)

    monitor = StreamingDriftMonitor(
        ["v"], baseline_path, "snapB", out_dir, alert_threshold=0.2
    )
    sdf = spark.readStream.schema("v double").option("maxFilesPerTrigger", 1).parquet(
        stream_src
    )
    q = (
        sdf.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rep = monitor.reports(spark).orderBy("epoch").collect()
    assert len(rep) == 2
    by_epoch = {r["epoch"]: r for r in rep}
    drifts = sorted(r["drift"] for r in rep)
    assert drifts[0] < 0.05          # in-distribution batch
    assert drifts[1] > 0.5           # fully shifted batch
    assert sorted(r["alert"] for r in rep) == [False, True]
    assert all(r["baseline_total"] == 20_000 for r in rep)
    assert monitor.committed_epochs() == set(by_epoch)

    # replay of a committed epoch must no-op (exactly-once sink contract)
    before = monitor.reports(spark).count()
    monitor(spark.read.parquet(stream_src), min(by_epoch))
    assert monitor.reports(spark).count() == before


def test_empty_batch_nan_never_alerts(spark, tmp_path):
    """NaN drift (empty micro-batch) must not alert: Spark sorts NaN above
    every number, so a bare >= threshold fired on every idle interval."""
    baseline_path = str(tmp_path / "b")
    base = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    snapshot_baseline(base, ["v"], baseline_path, "s")
    monitor = StreamingDriftMonitor(["v"], baseline_path, "s", str(tmp_path / "out"))
    empty = spark.createDataFrame([], "v double")
    monitor(empty, 0)
    rep = monitor.reports(spark).collect()
    assert len(rep) == 1
    import math
    assert math.isnan(rep[0]["drift"]) and rep[0]["alert"] is False


def test_psi_drift_identical_zero_and_shift_positive(spark):
    import math

    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.drift import categorical_histogram, psi_drift

    a = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "c string")
    same = psi_drift(
        categorical_histogram(a, "c"), categorical_histogram(a, "c")
    ).collect()[0]
    assert same["psi"] == 0.0 and same["n_new_categories"] == 0
    # shifted: x goes 50% -> 90%
    b = spark.createDataFrame([("x",)] * 90 + [("y",)] * 10, "c string")
    drift = psi_drift(
        categorical_histogram(b, "c"), categorical_histogram(a, "c")
    ).collect()[0]
    # reference add-one PSI
    p = [(90 + 1) / 102, (10 + 1) / 102]
    q = [(50 + 1) / 102, (50 + 1) / 102]
    want = sum(round((pi - qi) * math.log(pi / qi), 12) for pi, qi in zip(p, q))
    assert abs(drift["psi"] - round(want, 6)) < 1e-9
    assert drift["psi"] > 0.25  # the "act" threshold fires on a 40-point shift


def test_psi_drift_new_gone_categories_and_empty_side(spark):
    from xmlschemavalidator_spark.checks.drift import categorical_histogram, psi_drift

    cur = spark.createDataFrame([("x",)] * 5 + [("z",)] * 5, "c string")
    base = spark.createDataFrame([("x",)] * 5 + [("y",)] * 5, "c string")
    r = psi_drift(
        categorical_histogram(cur, "c"), categorical_histogram(base, "c")
    ).collect()[0]
    assert r["n_new_categories"] == 1 and r["n_gone_categories"] == 1
    assert r["psi"] is not None and r["psi"] > 0
    empty = spark.createDataFrame([], "c string")
    r2 = psi_drift(
        categorical_histogram(cur, "c"), categorical_histogram(empty, "c")
    ).collect()[0]
    assert r2["psi"] is None


def test_ranking_overlap_rbo(spark):
    import math

    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.drift import ranking_overlap_rbo

    def lst(items):
        return spark.createDataFrame(
            [(it, i + 1) for i, it in enumerate(items)], "item string, rank long"
        )

    # identical rankings -> RBO = sum of weights + p^k (the self-RBO cap)
    a = lst(["x", "y", "z", "w"])
    [ri] = ranking_overlap_rbo(a, lst(["x", "y", "z", "w"]), k=4, p_milli=900).collect()
    w = [math.floor(100 * 0.9 ** d * 1e3) for d in range(4)]
    cap = sum(w) + math.floor(0.9 ** 4 * 1e6)
    assert ri["rbo_micro"] == cap and ri["n_common"] == 4

    # disjoint rankings -> 0
    [rd] = ranking_overlap_rbo(a, lst(["p", "q", "r", "s"]), k=4).collect()
    assert rd["rbo_micro"] == 0 and rd["n_common"] == 0

    # top-heavy vs tail swap: swapping ranks 1-2 hurts more than 3-4
    top_swap = lst(["y", "x", "z", "w"])
    tail_swap = lst(["x", "y", "w", "z"])
    [rt] = ranking_overlap_rbo(a, top_swap, k=4, p_milli=900).collect()
    [rb] = ranking_overlap_rbo(a, tail_swap, k=4, p_milli=900).collect()
    assert rt["rbo_micro"] < rb["rbo_micro"] < cap

    # python replay of the top-swap case
    # common item max-depths: x->2, y->2, z->3, w->4
    inter = [0, 2, 3, 4]  # at depths 1..4
    want = sum(w[d] * inter[d] // (d + 1) for d in range(4))
    want += math.floor(0.9 ** 4 * 1e6) * inter[3] // 4
    assert rt["rbo_micro"] == want

    import pytest as _pt

    with _pt.raises(ValueError):
        ranking_overlap_rbo(a, a, p_milli=1000)
