"""Structured Streaming tests: the compiled ruleset over a file-source
stream, availableNow trigger, memory sink; windowed violation counts with
watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.compiler import FieldRule, RuleSet
from xmlschemavalidator_spark.engine import DOC_OK
from xmlschemavalidator_spark.rules.facets import Enumeration
from xmlschemavalidator_spark.rules.types import Restriction
from xmlschemavalidator_spark.streaming import stream_validate, windowed_violation_counts
from xmlschemavalidator_spark.streaming.validate_stream import stream_violations


@pytest.fixture()
def stream_src(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            ("u1", "en", "2024-01-01 00:00:10"),
            ("u2", "xx", "2024-01-01 00:00:20"),
            ("u3", "de", "2024-01-01 00:01:30"),
            ("u4", "yy", "2024-01-01 00:01:40"),
            ("u5", "yy", "2024-01-01 00:03:40"),
        ],
        "url string, lang string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").write.parquet(src)
    return src


def _ruleset():
    return RuleSet(rules=[FieldRule(
        "lang_enum",
        Restriction(facets=(Enumeration("en"), Enumeration("de"))),
        column="lang",
    )])


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return q


def test_stream_validate_verdicts(spark, stream_src):
    sdf = spark.readStream.schema("url string, lang string, ts timestamp").parquet(stream_src)
    out = stream_validate(sdf, _ruleset())
    assert out.isStreaming
    _run(out, "t_verdicts")
    got = {r["url"]: r[DOC_OK] for r in spark.sql("SELECT * FROM t_verdicts").collect()}
    assert got == {"u1": True, "u2": False, "u3": True, "u4": False, "u5": False}


def test_stream_violations_rows(spark, stream_src):
    sdf = spark.readStream.schema("url string, lang string, ts timestamp").parquet(stream_src)
    _run(stream_violations(sdf, _ruleset(), key="url"), "t_viols")
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM t_viols").collect())
    assert got == [("u2", "lang_enum", "xx"), ("u4", "lang_enum", "yy"), ("u5", "lang_enum", "yy")]


def test_windowed_violation_counts(spark, stream_src):
    sdf = spark.readStream.schema("url string, lang string, ts timestamp").parquet(stream_src)
    w = windowed_violation_counts(sdf, _ruleset(), ts_col="ts", window="1 minute")
    q = (
        w.writeStream.format("memory").queryName("t_win")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {
        (str(r["window_start"]), r["rule_id"]): r["n_violations"]
        for r in spark.sql("SELECT * FROM t_win").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "lang_enum"): 1,
        ("2024-01-01 00:01:00", "lang_enum"): 1,
        ("2024-01-01 00:03:00", "lang_enum"): 1,
    }


def test_streaming_violations_sink_idempotent(spark, tmp_path):
    from xmlschemavalidator_spark.streaming.sink import (
        StreamingViolationsSink,
        write_violations_stream,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("u1", "en"), ("u2", "xx"), ("u3", "yy")], "url string, lang string"
    ).write.parquet(src)
    sdf = spark.readStream.schema("url string, lang string").parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = write_violations_stream(sdf, _ruleset(), "url", out, ckpt)
    q.awaitTermination(120)

    written = spark.read.parquet(f"{out}/violations")
    got = sorted((r["url"], r["rule_id"]) for r in written.collect())
    assert got == [("u2", "lang_enum"), ("u3", "lang_enum")]

    sink = StreamingViolationsSink(_ruleset(), "url", out)
    epochs = sink.committed_epochs()
    assert len(epochs) >= 1
    # replay of a committed epoch must no-op (at-least-once -> exactly-once)
    batch = spark.createDataFrame([("u9", "zz")], "url string, lang string")
    sink(batch, batch_id=min(epochs))
    still = spark.read.parquet(f"{out}/violations").count()
    assert still == 2  # unchanged
    import json, os
    commit = json.load(open(os.path.join(out, "_commits", f"epoch={min(epochs)}.json")))
    assert commit["n_violations"] == 2 and commit["n_failed_docs"] == 2


def test_stream_referential(spark, stream_src):
    """Stream-static referential: langs missing from the dim (and NULL FKs)
    surface as violation rows; the static side broadcasts per batch."""
    from xmlschemavalidator_spark.streaming.validate_stream import stream_referential

    dim = spark.createDataFrame([("en",), ("de",), ("sv",)], "lang_code string")
    sdf = spark.readStream.schema("url string, lang string, ts timestamp").parquet(stream_src)
    out = stream_referential(sdf, "lang", dim, "lang_code", key="url", rule_id="lang_fk")
    _run(out, "t_ref")
    rows = sorted(
        (r["url"], r["rule_id"], r["observed_value"])
        for r in spark.sql("SELECT * FROM t_ref").collect()
    )
    assert rows == [
        ("u2", "lang_fk", "xx"),
        ("u4", "lang_fk", "yy"),
        ("u5", "lang_fk", "yy"),
    ]


def test_session_violation_bursts(spark, stream_src):
    """u2@00:20 is an isolated violation; u4@01:40 and u5@03:40 are >30s
    apart too -> three singleton sessions. With a 3-minute gap the last
    two merge."""
    from xmlschemavalidator_spark.streaming.validate_stream import session_violation_bursts

    sdf = spark.readStream.schema("url string, lang string, ts timestamp").parquet(stream_src)
    out = session_violation_bursts(sdf, _ruleset(), "ts", gap="30 seconds")
    q = (
        out.writeStream.format("memory").queryName("t_sess")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM t_sess ORDER BY session_start").collect()
    assert [r["n_violations"] for r in rows] == [1, 1, 1]

    # violation gaps are 80s (00:20->01:40) and 120s (01:40->03:40):
    # a 90s session gap merges the first pair only
    out2 = session_violation_bursts(sdf, _ruleset(), "ts", gap="90 seconds")
    q2 = (
        out2.writeStream.format("memory").queryName("t_sess2")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q2.awaitTermination(60)
    rows2 = spark.sql("SELECT * FROM t_sess2 ORDER BY session_start").collect()
    assert [r["n_violations"] for r in rows2] == [2, 1]


def test_streaming_corpus_filters_compose(spark, tmp_path):
    """The corpus-prep narrow ops (deterministic sampling, quality pass,
    within-doc line dedup, char entropy) are pure Column transforms, so
    they compose onto a stream unchanged — the batch/stream parity that
    content-addressed (rand-free) operators buy."""
    from xmlschemavalidator_spark.dedup import dedup_lines_within_doc
    from xmlschemavalidator_spark.sampling import md5_threshold
    from xmlschemavalidator_spark.textops import char_entropy, gopher_pass

    src = str(tmp_path / "docs_src")
    good = ("the quick brown fox jumps over the lazy dog and then "
            "the dog is of all dogs the most patient one indeed")
    spark.createDataFrame(
        [(i, good + "\nnav\nnav") for i in range(40)],
        "doc_id bigint, text string",
    ).write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    # content-addressed sample is a deterministic Column predicate —
    # legal in a stream (rand()/sampleBy are not reproducible there)
    from pyspark.sql import functions as SF

    key = SF.md5(SF.concat(SF.lit("s"), SF.lit(":"), SF.col("doc_id").cast("string")))
    out = (
        stream.where(key < SF.lit(md5_threshold(0.5)))
        .where(gopher_pass(SF.col("text")))
        .select(
            "doc_id",
            dedup_lines_within_doc(SF.col("text")).alias("text"),
            SF.round(char_entropy(SF.col("text")), 3).alias("h"),
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_filters")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM corpus_filters").collect()
    assert 10 < len(rows) < 30  # ~50% sample of the 40 quality-passing docs
    for r in rows:
        assert r["text"].count("nav") == 1  # within-doc dedup applied
        assert r["h"] is not None and r["h"] > 0


def test_per_doc_signals_compose_with_streaming(spark, tmp_path):
    """The report's per-doc signal projection is stateless, so it rides a
    stream unchanged — tag documents (quality, PII, license, scripts) at
    ingest time with the SAME code the batch report uses."""
    from xmlschemavalidator_spark.report import per_doc_signals

    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog ran away again today", "en"),
            (2, "contact a@b.com for Creative Commons licensing", "en"),
            (3, "Привет мир", "ru"),
        ],
        "doc_id bigint, text string, lang string",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id bigint, text string, lang string"
    ).parquet(src)
    tagged = per_doc_signals(stream, "doc_id")
    assert tagged.isStreaming
    q = (
        tagged.writeStream.format("memory")
        .queryName("sig_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc"]: r for r in spark.sql("SELECT * FROM sig_stream").collect()}
    assert len(got) == 3
    assert got[2]["n_email"] == 1 and got[2]["has_creative_commons"]
    assert got[3]["frac_cyrillic"] == 1.0
    assert got[1]["n_tokens"] == 12


def test_url_layer_composes_with_streaming(spark, tmp_path):
    """The URL layer's canonicalization/domain/badword columns are
    stateless projections, so they tag an ingest stream unchanged — the
    same Columns the batch URL stages use."""
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.weburl import (
        canonical_host,
        canonical_url,
        registered_domain,
        url_badword_pattern,
    )

    src = str(tmp_path / "url_src")
    spark.createDataFrame(
        [
            (1, "HTTP://WWW.Shop.Example.co.uk:80/a/?utm_source=x&b=1"),
            (2, "https://casino-hub.com/promo"),
        ],
        "doc_id bigint, url string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, url string").parquet(src)
    canon = canonical_url(F.col("url"))
    tagged = stream.select(
        "doc_id",
        canon.alias("canonical_url"),
        registered_domain(canonical_host(canon)).alias("domain"),
        F.lower(F.col("url"))
        .rlike(url_badword_pattern(["casino"]))
        .alias("url_flagged"),
    )
    assert tagged.isStreaming
    q = (
        tagged.writeStream.format("memory")
        .queryName("url_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM url_stream").collect()}
    assert got[1]["canonical_url"] == "http://shop.example.co.uk/a?b=1"
    assert got[1]["domain"] == "example.co.uk" and not got[1]["url_flagged"]
    assert got[2]["url_flagged"]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Views paired to same-user clicks within 10 minutes, replayed as
    two micro-batches — a click in batch 2 must still pair with a view
    buffered from batch 1; result must equal the batch join."""
    import glob
    import os
    import shutil

    from xmlschemavalidator_spark.streaming.joins import stream_interval_join

    rows = [
        # (event_id, user_id, type, ts)  — u1: view 10:00, clicks 10:05 (in) / 10:20 (out)
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 1, "click", "2024-01-01 10:20:00"),
        # u2: click BEFORE the view never matches
        (4, 2, "click", "2024-01-01 09:59:00"),
        (5, 2, "view", "2024-01-01 10:00:00"),
        # u3 in batch 1, click arrives in batch 2 within bound
        (6, 3, "view", "2024-01-01 10:08:00"),
        (7, 3, "click", "2024-01-01 10:12:00"),
        # NULL ts must be dropped, not stall anything
        (8, 1, "click", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, et string, ts_s string"
    ).select("event_id", "user_id", "et", F.col("ts_s").cast("timestamp").alias("ts"))
    src = str(tmp_path / "src")
    os.makedirs(src)
    cut = "2024-01-01 10:10:00"
    for j, ch in enumerate(
        [df.where(F.col("ts") <= cut), df.where((F.col("ts") > cut) | F.col("ts").isNull())]
    ):
        d = str(tmp_path / f"chunk{j}")
        ch.coalesce(1).write.parquet(d)
        dst = f"{src}/{j:04d}.parquet"
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0], dst)
        os.utime(dst, (1_600_000_000 + 600 * j,) * 2)

    sdf = (
        spark.readStream.schema("event_id bigint, user_id bigint, et string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    views = sdf.where(F.col("et") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = sdf.where(F.col("et") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    out = stream_interval_join(
        views, clicks, on="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay_seconds=600, watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory").queryName("t_ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(
        (r["user_id"], r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM t_ssj").collect()
    )
    assert got == [(1, 1, 2), (3, 6, 7)]


def test_stream_interval_join_rejects_clashes(spark, tmp_path):
    import pytest

    from xmlschemavalidator_spark.streaming.joins import stream_interval_join

    df = spark.createDataFrame([(1, 1, "2024-01-01 00:00:00")],
                               "user_id bigint, x bigint, ts string")
    l = df.select("user_id", "x", F.col("ts").cast("timestamp").alias("lts"))
    r = df.select("user_id", "x", F.col("ts").cast("timestamp").alias("rts"))
    with pytest.raises(ValueError, match="disjoint"):
        stream_interval_join(l, r, "user_id", "lts", "rts", 60)
    with pytest.raises(ValueError, match="max_delay"):
        stream_interval_join(
            l, r.withColumnRenamed("x", "y"), "user_id", "lts", "rts", 0
        )


def test_stream_abandonment_join_emits_null_matches(spark, tmp_path):
    """Left-outer stream-stream join: u1's view converts, u2's view
    expires unmatched and must emit ONCE with is_abandoned=true after
    the watermark passes its window (advanced by a sentinel batch)."""
    import glob
    import os
    import shutil

    from xmlschemavalidator_spark.streaming.joins import stream_abandonment_join

    rows = [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 2, "view", "2024-01-01 10:01:00"),   # never clicks
        # sentinel far-future traffic advances the watermark so the
        # abandonment verdict for u2 can emit in a following batch
        (4, 9, "view", "2024-01-01 12:00:00"),
        (5, 9, "click", "2024-01-01 12:00:30"),
        (6, 8, "view", "2024-01-01 13:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, et string, ts_s string"
    ).select("event_id", "user_id", "et",
             F.col("ts_s").cast("timestamp").alias("ts"))
    src = str(tmp_path / "src")
    os.makedirs(src)
    cuts = [
        df.where(F.col("ts") < "2024-01-01 11:00:00"),
        df.where((F.col("ts") >= "2024-01-01 11:00:00")
                 & (F.col("ts") < "2024-01-01 12:30:00")),
        df.where(F.col("ts") >= "2024-01-01 12:30:00"),
    ]
    for j, ch in enumerate(cuts):
        d = str(tmp_path / f"chunk{j}")
        ch.coalesce(1).write.parquet(d)
        dst = f"{src}/{j:04d}.parquet"
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0], dst)
        os.utime(dst, (1_600_000_000 + 600 * j,) * 2)

    sdf = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, et string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    views = sdf.where(F.col("et") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"))
    clicks = sdf.where(F.col("et") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    out = stream_abandonment_join(
        views, clicks, on="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay_seconds=600, watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory").queryName("t_aban")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {
        (r["user_id"], r["view_id"]): (r["click_id"], r["is_abandoned"])
        for r in spark.sql("SELECT * FROM t_aban").collect()
    }
    # converted views pair; the u2 view emits exactly once, abandoned
    assert got[(1, 1)] == (2, False)
    assert got[(2, 3)] == (None, True)
    assert got[(9, 4)] == (5, False)
    import pytest as _pt
    with _pt.raises(ValueError):
        stream_abandonment_join(views, views, "user_id", "view_ts",
                                "view_ts", 60)
