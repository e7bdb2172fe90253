"""Temporal operators over event streams: as-of join, range (interval)
join, hypertable-style time rollup with incremental maintenance, and
gap-based sessionization.

These are the classic operators Spark's relational core lacks but a
web-scale event/metrics table needs (the reference engine has no
temporal layer at all — this is dataset-level widening in the spirit of
SURVEY.md §2.7). Each is expressed as a composition of built-in
DataFrame ops chosen for its shuffle shape at 10^12 rows:

* `asof_join` — the union + ordered-window trick (one shuffle on the
  key, a per-partition sort, NO range explosion and NO inequality
  join): state rows and probe rows interleave in (ts, side) order and
  `last(state, ignorenulls)` carries the most recent state forward.
  This is the scalable plan; a naive `probe.join(state, ts >=)` is a
  BroadcastNestedLoopJoin that dies at scale.
* `range_join` — interval containment via fixed-width time buckets:
  intervals explode over the buckets they cover, events carry their
  single bucket, and the join is a pure EQUI-join on (key, bucket)
  followed by an exact containment filter. Each (event, interval) pair
  meets in exactly one bucket — the event's own — so no dedup pass is
  needed. Interval span is validated up front (no silent caps).
* `time_rollup` — time_bucket + groupBy with mergeable aggregates
  (count / DECIMAL sum / min / max), so per-batch partial rollups can
  be unioned and re-aggregated to the exact one-shot answer
  (`append_time_rollup` / `read_time_rollup`, the continuous-aggregate
  shape: per-`_batch=` dirs like textindex.py, committed batches never
  rewritten).
* `sessionize` — lag + cumulative-sum session boundaries over ONE
  window partitioning; ties broken by an explicit order column so the
  session ids are deterministic and engine-portable.

All bucket arithmetic is integer (`unix_micros div width`) — double
division of ~1.7e15 microsecond values can misfloor at bucket edges,
and integer div is exactly portable to DuckDB's `//`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def _micros(col) -> F.Column:
    """Exact epoch microseconds of a timestamp column. The testdata
    parquet carries TIMESTAMP_NTZ, which `unix_micros` rejects — cast
    to TIMESTAMP first. NTZ->LTZ reads the wall time in the session
    timezone; session.get_spark pins spark.sql.session.timeZone=UTC so
    the value equals DuckDB's epoch_us (which treats naive as UTC)."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    on: str,
    ts: str,
    state_cols: tuple[str, ...],
    prefix: str = "asof_",
) -> DataFrame:
    """For each probe row, attach the most recent state row with
    state.ts <= probe.ts on the same key (DuckDB/pandas ASOF-backward
    semantics, inclusive at equality). Probe rows with no prior state
    keep NULLs (left as-of).

    State is first deduped to one row per (key, ts) by struct-max over
    `state_cols` — without this, equal-timestamp state rows would make
    the window's `last()` pick a partition-order-dependent winner.

    Output: every probe column, plus `{prefix}ts` (the matched state
    timestamp) and `{prefix}{c}` for each state column. One shuffle on
    `on`; the plan is Window over Union, never a non-equi join.

    Scale note: the shuffle is keyed on `on` alone, so one pathological
    key (a single user with 10^9 events) serializes in one task. The
    carry-forward is order-dependent, so the generic fix is upstream:
    split such keys by time range and replay the boundary state row
    into each split — not silently done here because testdata keys are
    bounded and the split policy is domain-specific.
    """
    reserved = {"_side", "_st", "_last"}
    clash = reserved & (set(probe.columns) | set(state.columns))
    if clash:
        raise ValueError(
            f"asof_join: column(s) {sorted(clash)} collide with internal "
            "names; rename them first"
        )
    out_clash = {f"{prefix}ts", *(f"{prefix}{c}" for c in state_cols)} & set(
        probe.columns
    )
    if out_clash:
        raise ValueError(
            f"asof_join: output column(s) {sorted(out_clash)} already "
            "exist on the probe side (chained asof_join? pass a distinct "
            "prefix)"
        )
    # A NULL-ts state row can never satisfy state.ts <= probe.ts (ASOF /
    # DuckDB semantics: the comparison is never true), but the window's
    # NULLS FIRST ordering would carry it forward as the "most recent"
    # state for every probe row before the first real state — drop them.
    stt = (
        state.where(F.col(ts).isNotNull())
        .groupBy(on, ts)
        .agg(F.max(F.struct(*[F.col(c) for c in state_cols])).alias("_v"))
        .select(
            F.col(on),
            F.col(ts),
            F.struct(F.col(ts).alias("_ts"), F.col("_v").alias("_v")).alias("_st"),
        )
    )
    st_type = dict(stt.dtypes)["_st"]
    probe_types = dict(probe.dtypes)
    rest = [c for c in probe.columns if c not in (on, ts)]
    s_side = stt.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col("_st"),
        *[F.lit(None).cast(probe_types[c]).alias(c) for c in rest],
    )
    p_side = probe.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(st_type).alias("_st"),
        *rest,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = s_side.unionByName(p_side).withColumn(
        "_last", F.last("_st", ignorenulls=True).over(w)
    )
    return filled.where(F.col("_side") == 1).select(
        *probe.columns,
        F.col("_last._ts").alias(f"{prefix}ts"),
        *[F.col(f"_last._v.{c}").alias(f"{prefix}{c}") for c in state_cols],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """Join events to the intervals containing them: same key, and
    `start <= ts < end` (half-open). Returns the joined frame (all
    event columns + all interval columns except the key).

    Shape: intervals explode over covered fixed-width buckets, events
    compute their single bucket, equi-join on (key, bucket), exact
    filter. An event's bucket is covered by every interval containing
    the event, and only once — so the join emits each qualifying pair
    exactly once with no distinct pass.

    Intervals longer than `max_span_buckets * bucket_seconds`, and
    empty/inverted intervals (`end <= start`, checked on the raw bounds
    so a same-bucket inversion is caught too), are REFUSED up front
    rather than silently truncated: a single year-long interval at
    1-minute buckets would explode 525k rows, and an inverted interval
    means the caller swapped the bound columns. Raise the bucket width /
    fix the bounds instead. The validation pass and the join share one
    materialization of the interval side (persisted across both — the
    small side by construction); the cached frame is exposed as
    `result._range_join_iv` so callers can `.unpersist()` it after the
    result materializes.
    """
    overlap = (set(events.columns) & set(intervals.columns)) - {on}
    if overlap:
        raise ValueError(
            f"range_join: column(s) {sorted(overlap)} exist on both "
            "sides; rename one side first (the joined frame would be "
            "ambiguous)"
        )
    reserved = {"_bucket", "_b0", "_b1", "_s_us", "_e_us"}
    clash = reserved & (set(events.columns) | set(intervals.columns))
    if clash:
        raise ValueError(
            f"range_join: column(s) {sorted(clash)} collide with internal "
            "names; rename them first"
        )
    width_us = bucket_seconds * _US
    iv = (
        intervals.withColumn(
            "_s_us", F.expr(f"unix_micros(CAST({start} AS TIMESTAMP))")
        )
        .withColumn("_e_us", F.expr(f"unix_micros(CAST({end} AS TIMESTAMP))"))
        .withColumn("_b0", F.expr(f"_s_us div {width_us}"))
        .withColumn("_b1", F.expr(f"(_e_us - 1) div {width_us}"))
        .persist()
    )
    bad = iv.where(
        (F.col("_e_us") <= F.col("_s_us"))
        | (F.col("_b1") - F.col("_b0") >= max_span_buckets)
    ).count()
    if bad:
        iv.unpersist()
        raise ValueError(
            f"range_join: {bad} interval(s) empty or spanning >= "
            f"{max_span_buckets} buckets of {bucket_seconds}s; widen "
            "bucket_seconds or fix the interval bounds"
        )
    expl = iv.withColumn("_bucket", F.explode(F.sequence("_b0", "_b1"))).drop(
        "_b0", "_b1", "_s_us", "_e_us"
    )
    ev = events.withColumn(
        "_bucket", F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP)) div {width_us}")
    )
    out = (
        ev.join(expl, [on, "_bucket"])
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_bucket")
    )
    out._range_join_iv = iv  # anchor for caller-side unpersist
    return out


def time_rollup(
    events: DataFrame,
    ts: str,
    bucket_seconds: int,
    dims: tuple[str, ...] = (),
    value: str = "value",
) -> DataFrame:
    """Hypertable-style continuous aggregate: fixed-width time buckets
    (epoch-second bucket starts, integer arithmetic) x `dims`, with the
    MERGEABLE aggregate set — count, DECIMAL sum, min, max — so that
    partial rollups union + re-aggregate to the exact one-shot answer
    (see `merge_time_rollups`). One partially-aggregated shuffle.

    Columns: bucket_start (BIGINT epoch seconds), *dims, n_events,
    sum_value DECIMAL(38,6), min_value, max_value.
    """
    b = (
        F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP)) div {bucket_seconds * _US}")
        * F.lit(bucket_seconds)
    ).cast("bigint")
    return events.groupBy(b.alias("bucket_start"), *dims).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col(value).cast("decimal(38,6)")).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def merge_time_rollups(partials: DataFrame, dims: tuple[str, ...] = ()) -> DataFrame:
    """Re-aggregate a union of partial rollups to the one-shot rollup.
    Exact because every aggregate is mergeable (count->sum, sum->sum,
    min->min, max->max; the sum stayed DECIMAL in the partials)."""
    return partials.groupBy("bucket_start", *dims).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def append_time_rollup(
    events: DataFrame,
    ts: str,
    bucket_seconds: int,
    path: str,
    batch_id: str,
    dims: tuple[str, ...] = (),
    value: str = "value",
) -> None:
    """Fold one batch into a persisted continuous aggregate at `path`:
    writes this batch's partial rollup under `_batch=<id>/` (committed
    batches never rewritten; a failed retry overwrites exactly its own
    dir). Readers merge at O(buckets) cost via `read_time_rollup`.
    Empty batches are skipped — an empty-DF parquet write leaves a
    part-less dir that poisons read-back schema inference."""
    if events.isEmpty():
        return
    part = time_rollup(events, ts, bucket_seconds, dims=dims, value=value)
    part.write.mode("overwrite").parquet(f"{path}/_batch={batch_id}")


def read_time_rollup(spark, path: str, dims: tuple[str, ...] = ()) -> DataFrame:
    """Merge all committed batch partials into the exact rollup."""
    return merge_time_rollups(spark.read.parquet(f"{path}/_batch=*"), dims=dims)


def stream_time_rollup(
    stream: DataFrame,
    ts: str,
    bucket_seconds: int,
    path: str,
    checkpoint: str,
    dims: tuple[str, ...] = (),
    value: str = "value",
    trigger_available_now: bool = True,
):
    """Maintain the persisted continuous aggregate from a streaming
    source: each micro-batch folds in via `append_time_rollup` under its
    own `_batch=<epoch id>/` dir. foreachBatch + the epoch id makes the
    sink exactly-once under retries (a replayed batch overwrites exactly
    its own dir — the same idempotence contract the batch appender has),
    so `read_time_rollup` equals the one-shot rollup of everything the
    stream has consumed. Returns the started StreamingQuery."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # append_time_rollup itself skips empty batches
        append_time_rollup(
            batch_df, ts, bucket_seconds, path, f"{batch_id:010d}",
            dims=dims, value=value,
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scd2_build(
    events: DataFrame,
    key: str,
    ts: str,
    attrs: tuple[str, ...],
    order_col: str,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 table from a change
    stream: per key, consecutive rows with identical `attrs` collapse
    into one validity run, and each run gets a half-open validity
    interval [valid_from, valid_to) with valid_to = the next run's start
    (NULL while current). `order_col` breaks equal-timestamp ties.

    Output: key, *attrs, valid_from (ts type), valid_to (NULL on the
    current run), is_current. ONE shuffle on the key: the change-point
    filter sits between two window passes that share the partitioning
    (lag to detect change, lead over the surviving change rows).

    The classic dimension-table shape: a point-in-time lookup is then
    `asof_join` on valid_from, or `range_join` on the interval."""
    if "_chg" in events.columns:
        raise ValueError(
            "scd2_build: column '_chg' collides with an internal name; "
            "rename it first"
        )
    out_clash = {"valid_from", "valid_to", "is_current"} & ({key} | set(attrs))
    if out_clash:
        raise ValueError(
            f"scd2_build: output column(s) {sorted(out_clash)} collide "
            "with key/attrs; rename them first"
        )
    order = [F.col(ts).asc(), F.col(order_col).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attrs])
    # null-safe: first row per key (lag NULL) is a change, and NULL attr
    # values compare by value rather than poisoning the predicate
    changed = ~F.lag(cur).over(w).eqNullSafe(cur)
    runs = events.withColumn("_chg", changed).where(F.col("_chg")).drop("_chg")
    return runs.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def sessionize(
    events: DataFrame,
    on: str,
    ts: str,
    gap_seconds: int,
    order_col: str,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event on the same key exceeds `gap_seconds`. Adds
    `session_seq` (1-based per key, BIGINT). `order_col` breaks
    equal-timestamp ties so session numbering is deterministic and
    engine-portable. One shuffle on `on`; both window passes share the
    partitioning (single Exchange, single Sort)."""
    clash = {"_new", "session_seq"} & set(events.columns)
    if clash:
        raise ValueError(
            f"sessionize: column(s) {sorted(clash)} collide with internal "
            "or output names; rename them first"
        )
    order = [F.col(ts).asc(), F.col(order_col).asc()]
    w = Window.partitionBy(on).orderBy(*order)
    gap_us = _micros(ts) - _micros(F.lag(ts).over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > gap_seconds * _US), 1).otherwise(0)
    return events.withColumn("_new", new_s).withColumn(
        "session_seq",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    ).drop("_new")


def session_stats(sessions: DataFrame, on: str, ts: str) -> DataFrame:
    """Per-session aggregates over a `sessionize` output: event count,
    start/end in exact epoch microseconds, duration in seconds."""
    return sessions.groupBy(on, "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min(_micros(ts)).alias("start_us"),
        F.max(_micros(ts)).alias("end_us"),
    ).withColumn(
        "duration_s",
        ((F.col("end_us") - F.col("start_us")) / F.lit(_US)).cast("double"),
    )


def interval_union(
    events: DataFrame,
    on: str,
    start: str,
    end: str,
) -> DataFrame:
    """Merge overlapping/touching half-open intervals per key into
    disjoint runs — the classic sweep, as two window passes sharing ONE
    shuffle on the key: a running max of previous interval ends detects
    run starts (start > max(prior ends)), a running sum numbers the
    runs, then one groupBy collapses each run to its envelope.

    Output: ``(on, run_seq, start_us, end_us, n_intervals)`` with exact
    epoch-microsecond bounds (BIGINT — engine-portable). Touching
    intervals ([1,3) + [3,5)) merge: half-open semantics make the union
    contiguous. Rows with NULL bounds and empty/inverted intervals
    (end <= start) are dropped up front — they contribute no coverage;
    the count is auditable as input rows minus sum(n_intervals).

    Coverage time per key is then one tiny agg over the runs
    (sum(end_us - start_us)) — the "total active time" metric session
    analytics and crawl-window accounting need.
    """
    clash = {"_s_us", "_e_us", "_prev_max", "_new", "run_seq"} & set(
        events.columns
    )
    if clash:
        raise ValueError(
            f"interval_union: column(s) {sorted(clash)} collide with "
            "internal or output names; rename them first"
        )
    iv = events.select(
        F.col(on),
        _micros(start).alias("_s_us"),
        _micros(end).alias("_e_us"),
    ).where(
        F.col("_s_us").isNotNull()
        & F.col("_e_us").isNotNull()
        & (F.col("_e_us") > F.col("_s_us"))
    )
    order = [F.col("_s_us").asc(), F.col("_e_us").asc()]
    w_prev = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max("_e_us").over(w_prev)
    new_run = F.when(
        prev_max.isNull() | (F.col("_s_us") > prev_max), 1
    ).otherwise(0)
    runs = iv.withColumn("run_seq", F.sum(new_run).over(w_run).cast("bigint"))
    return runs.groupBy(on, "run_seq").agg(
        F.min("_s_us").alias("start_us"),
        F.max("_e_us").alias("end_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change stream (Debezium-style upserts + tombstones)
    onto a current-state table — the MERGE INTO / SCD type-1 operation:
    the LATEST change per key wins; op 'U' (or 'I') replaces/inserts the
    row, op 'D' deletes it, keys without changes pass through untouched.
    Returns the merged table in the target's column set.

    `changes` must carry `key`, `ts`, `order_col` (equal-timestamp
    tie-break, e.g. a log sequence number), `op_col` in {'I','U','D'},
    and every non-key target column. Late-arriving duplicates of the
    same key collapse BEFORE the join via one partial-aggregatable
    ``max(struct(ts, order, op, attrs))`` — a hot key reaches the
    shuffle as one row per map task, never one per change (the
    snapshot_dedup shape), so a million-update key cannot pin a task.
    Then ONE full-outer join on the key (changes are typically tiny vs
    the table — AQE broadcasts; a skewed key splits).

    Deterministic by construction: the struct-max total order is
    (ts, order_col, op, attrs...), so equal (ts, order) collisions
    resolve identically in any engine — but a real log should make
    (ts, order_col) unique. SCD2 (`scd2_build`) keeps history; this is
    the current-state compaction of the same stream.
    """
    attrs = [c for c in target.columns if c != key]
    missing = [c for c in (key, ts, order_col, op_col) if c not in changes.columns]
    missing += [c for c in attrs if c not in changes.columns]
    if missing:
        raise ValueError(f"cdc_apply: changes is missing column(s) {missing}")
    clash = {"_k", "_op", "_w", "_has"} & set(target.columns)
    if clash:
        raise ValueError(
            f"cdc_apply: column(s) {sorted(clash)} collide with internal "
            "names; rename them first"
        )
    meta_clash = {ts, order_col, op_col} & set(attrs)
    if meta_clash:
        raise ValueError(
            f"cdc_apply: change-metadata column(s) {sorted(meta_clash)} "
            "also exist as target attributes — the flat latest-per-key "
            "projection would be ambiguous; rename the metadata columns "
            "(e.g. ts='_cdc_ts') first"
        )
    pfx_clash = {f"_c_{c}" for c in attrs} & set(attrs)
    if pfx_clash:
        raise ValueError(
            f"cdc_apply: attribute(s) {sorted(pfx_clash)} collide with "
            "the internal '_c_' prefix; rename them first"
        )
    latest = _cdc_latest(changes, key, ts, order_col, op_col, attrs).select(
        F.col(key).alias("_k"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in attrs],
    )
    joined = target.join(latest, on=F.col(key) == F.col("_k"), how="full_outer")
    has_change = F.col("_k").isNotNull()
    merged = joined.select(
        F.coalesce(F.col(key), F.col("_k")).alias(key),
        has_change.alias("_has"),
        F.col("_op"),
        *[
            F.when(has_change & (F.col("_op") != "D"), F.col(f"_c_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in attrs
        ],
    )
    return merged.where(~F.col("_has") | (F.col("_op") != "D")).select(
        key, *attrs
    )


def rolling_anomalies(
    series: DataFrame,
    key: str,
    bucket: str,
    value: str,
    window: int = 12,
    k_tenths: int = 30,
    quantum: int = 1,
) -> DataFrame:
    """Rolling z-score anomalies over a per-key time series (typically a
    :func:`time_rollup` output): flag buckets whose value deviates from
    the mean of the PREVIOUS `window` buckets by more than
    ``k_tenths/10`` of their standard deviation — the spike/drop monitor
    for continuous aggregates (an hour of doubled error counts, a
    crawl-source going dark). Returns only the anomalous rows
    ``(key, bucket, value_q, mean_q, flag_hi)`` with mean_q the integer
    floor mean of the lookback window and flag_hi true for spikes.

    Exactness contract: values are quantized to integers
    (``floor(v·quantum)`` — counts pass quantum=1 untouched) and the
    whole predicate is cross-multiplied integer arithmetic in
    DECIMAL(38,0): ``100·(w·x − Σ)² > k²·(w·Σx² − Σ²)`` with
    half-open ROWS frames — no float mean/stddev whose accumulation
    order could differ, no sqrt. The first `window` buckets per key are
    warm-up (no full lookback) and never flag. HUGEINT replays the same
    arithmetic in DuckDB bit-for-bit.

    One shuffle on the key; both window reads share the partitioning.
    The frame is ROWS-based over the bucket order, so missing buckets
    simply shorten real time spanned — densify upstream if calendar
    gaps matter.
    """
    q = F.floor(F.col(value) * F.lit(quantum)).cast("decimal(38,0)")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(bucket).asc())
        .rowsBetween(-window, -1)
    )
    base = series.select(
        F.col(key), F.col(bucket), q.alias("_x")
    ).withColumn("_w", F.count("_x").over(w)).withColumn(
        "_s", F.sum("_x").over(w)
    ).withColumn(
        "_ss", F.sum(F.expr("_x * _x")).over(w)
    )
    wd = F.col("_w").cast("decimal(38,0)")
    dev = wd * F.col("_x") - F.col("_s")
    var_n = wd * F.col("_ss") - F.col("_s") * F.col("_s")
    flagged = base.where(
        (F.col("_w") == window)
        & (F.lit(100) * dev * dev > F.lit(k_tenths * k_tenths) * var_n)
    )
    return flagged.select(
        key,
        bucket,
        F.col("_x").cast("bigint").alias("value_q"),
        F.expr(f"CAST(_s div CAST({window} AS DECIMAL(38,0)) AS BIGINT)").alias(
            "mean_q"
        ),
        (dev > 0).alias("flag_hi"),
    )


def last_touch_attribution(
    events: DataFrame,
    on: str,
    ts: str,
    order_col: str,
    type_col: str,
    touch_types: tuple[str, ...],
    conv_types: tuple[str, ...],
    window_seconds: int,
) -> DataFrame:
    """Last-touch conversion attribution: for every conversion event,
    find the key's most recent PRECEDING touch event and attribute the
    conversion to it if it falls inside the lookback window (one row
    per NON-NULL-ts conversion — NULL-ts rows, conversions included,
    are dropped at the input: no time, no ordering claim) — the
    standard marketing/funnel question ("which click gets credit for
    this purchase") and, in crawl terms, "which referrer page led to
    this capture". Returns one row per conversion:
    ``(on, conv_id, conv_us, touch_id, touch_us, attributed)`` with
    NULL touch columns when no touch precedes (attributed = false).

    One shuffle on the key: a single ordered window carries the last
    touch forward as a struct via ``last(…, ignorenulls=True)`` over
    the STRICTLY-PRECEDING frame (a row that is both touch and
    conversion cannot attribute to itself), then a narrow filter keeps
    conversions and applies the integer-microsecond window test. The
    same asof-join family shape as SCD2's lookup, without materializing
    an interval table.

    Deterministic: (ts, order_col) total order; equal-timestamp
    touch-then-conversion resolves by log order.
    """
    if "_lt" in events.columns:
        raise ValueError(
            "last_touch_attribution: column '_lt' collides with an "
            "internal name; rename it first"
        )
    # NULL-ts rows carry no ordering claim and would mask earlier valid
    # touches in the carry-forward (and make the window test NULL
    # instead of the promised true/false) — drop them, like
    # order_violations/interarrival_stats do
    events = events.where(F.col(ts).isNotNull())
    order = [F.col(ts).asc(), F.col(order_col).asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    is_conv = F.col(type_col).isin(list(conv_types))
    touch_struct = F.when(
        is_touch,
        F.struct(
            _micros(ts).alias("us"), F.col(order_col).alias("id")
        ),
    )
    carried = events.withColumn(
        "_lt", F.last(touch_struct, ignorenulls=True).over(w)
    )
    conv = carried.where(is_conv)
    in_window = (
        F.col("_lt").isNotNull()
        & ((_micros(ts) - F.col("_lt.us")) <= window_seconds * _US)
    )
    return conv.select(
        F.col(on),
        F.col(order_col).alias("conv_id"),
        _micros(ts).alias("conv_us"),
        F.when(in_window, F.col("_lt.id")).alias("touch_id"),
        F.when(in_window, F.col("_lt.us")).alias("touch_us"),
        in_window.alias("attributed"),
    )


def _cdc_latest(
    changes: DataFrame, key: str, ts: str, order_col: str, op_col: str,
    attrs: list[str],
) -> DataFrame:
    """Latest change per key as flat columns ``(key, ts, order, op,
    *attrs)`` via the partial-aggregatable max(struct) — the mergeable
    half of :func:`cdc_apply`, shared by the batch and streaming forms
    (merging per-batch latests IS another max(struct), exactly like the
    rollup's count/sum/min/max)."""
    w = F.max(
        F.struct(
            F.col(ts).alias("_ts"),
            F.col(order_col).alias("_ord"),
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(c) for c in attrs],
        )
    ).alias("_w")
    return changes.groupBy(F.col(key)).agg(w).select(
        key,
        F.col("_w._ts").alias(ts),
        F.col("_w._ord").alias(order_col),
        F.col("_w._op").alias(op_col),
        *[F.col(f"_w.{c}").alias(c) for c in attrs],
    )


def append_cdc_partial(
    changes: DataFrame,
    path: str,
    batch_id: str,
    key: str,
    ts: str,
    order_col: str,
    op_col: str = "op",
) -> None:
    """Fold one batch of CDC changes into a persisted partial store at
    `path`: this batch's latest-change-per-key lands under
    ``_batch=<id>/`` (a replayed batch overwrites exactly its own dir —
    the rollup store's idempotence contract). The partial is MERGEABLE:
    the latest of per-batch latests is the global latest, because
    max(struct) is associative — so readers never re-read raw change
    logs, only #keys-sized partials. Empty batches are skipped."""
    if changes.isEmpty():
        return
    attrs = [
        c for c in changes.columns if c not in (key, ts, order_col, op_col)
    ]
    part = _cdc_latest(changes, key, ts, order_col, op_col, attrs)
    part.write.mode("overwrite").parquet(f"{path}/_batch={batch_id}")


def stream_cdc_partials(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    ts: str,
    order_col: str,
    op_col: str = "op",
    trigger_available_now: bool = True,
):
    """Maintain the persisted CDC partial store from a streaming change
    log (the streaming half of MERGE INTO): each micro-batch folds in
    via :func:`append_cdc_partial` under its own ``_batch=`` dir —
    exactly-once under retries, same as ``stream_time_rollup``. The
    current state of any target is then :func:`read_cdc_state` — no
    stream ever rewrites the big table; compaction cost is deferred to
    the (partial-sized) read or an offline apply. Returns the started
    StreamingQuery."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        append_cdc_partial(
            batch_df, path, f"{batch_id:010d}", key, ts, order_col, op_col
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cdc_state(
    spark,
    path: str,
    target: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Current state = target with ALL persisted CDC partials applied:
    union the per-batch latests (basePath-tagged read), collapse once
    more (max of maxes — associativity makes this exact, hash-identical
    to a one-shot :func:`cdc_apply` over the raw log), then the one
    full-outer merge. Cost is O(Σ partial sizes), never O(change log)."""
    partials = (
        spark.read.option("basePath", path)
        .parquet(f"{path}/_batch=*")
        .drop("_batch")
    )
    return cdc_apply(
        target, partials, key=key, ts=ts, order_col=order_col, op_col=op_col
    )


def interarrival_stats(
    events: DataFrame,
    on: str,
    ts: str,
    order_col: str,
) -> DataFrame:
    """Per-key inter-arrival gap statistics in exact epoch microseconds:
    ``(on, n_events, n_gaps, min_gap_us, max_gap_us, mean_gap_us)`` —
    the burstiness profile behind sessionization-gap and crawl-rate
    tuning (pick gap_seconds from the observed gap distribution, not
    folklore), and a bot signal (metronomic min==max gaps).

    mean_gap_us is the integer floor mean — and because inter-arrival
    gaps telescope, it needs NO window at all: Σ gaps = max(ts)−min(ts),
    so the mean comes from a plain partial-aggregatable min/max/count
    aggregate. Only min/max of the INDIVIDUAL gaps need the one ordered
    window (lag over (ts, order)). Keys with a single event report NULL
    gaps. One shuffle; window and aggregate share the key partitioning.
    """
    w = Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col(order_col).asc())
    gap = _micros(ts) - _micros(F.lag(ts).over(w))
    base = events.where(F.col(ts).isNotNull()).withColumn("_gap", gap)
    return base.groupBy(on).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("_gap").cast("bigint").alias("n_gaps"),
        F.min("_gap").cast("bigint").alias("min_gap_us"),
        F.max("_gap").cast("bigint").alias("max_gap_us"),
        F.expr(
            "CASE WHEN count(_gap) > 0 THEN "
            "(max(unix_micros(CAST({t} AS TIMESTAMP))) "
            " - min(unix_micros(CAST({t} AS TIMESTAMP)))) div count(_gap) "
            "END".format(t=ts)
        ).cast("bigint").alias("mean_gap_us"),
    )


def cusum_changepoints(
    series: DataFrame,
    key: str,
    bucket: str,
    value: str,
    target: float,
    slack: float,
    threshold: float,
    quantum: int = 1,
) -> DataFrame:
    """Two-sided CUSUM change-point alarms over a per-key time series
    (Page 1954 — the classic small-persistent-shift detector that
    :func:`rolling_anomalies` is blind to: a 0.5σ drift never trips a
    3σ z-score gate, but its cumulative sum grows without bound).
    Flags buckets where the one-sided CUSUM statistic exceeds
    ``threshold``: ``C+`` accumulates excess over ``target + slack``
    (upward shift), ``C-`` accumulates shortfall under
    ``target - slack`` (downward shift). Returns only alarm rows
    ``(key, bucket, value_q, cusum_pos, cusum_neg, flag_hi)``.

    The textbook recursion ``C+_i = max(0, C+_{i-1} + x_i - t - s)``
    looks unwindowable, but unrolls exactly: with
    ``P_i = Σ_{j<=i} (x_j - t - s)``,
    ``C+_i = P_i - min(0, min_{j<=i} P_j)`` — a prefix sum and a
    running minimum, two expanding-frame windows SHARING one
    (key, bucket-order) partitioning. Symmetrically
    ``C-_i = max(0, max_{j<=i} P'_j) - P'_i`` over
    ``P'_i = Σ (x_j - t + s)``. One shuffle on the key, no recursion,
    no UDF.

    Exactness: values, target, slack and threshold are quantized to
    integer ``quantum``-ths (counts pass quantum=1 untouched) and every
    sum/min/max runs in DECIMAL(38,0) — order-independent, HUGEINT
    replays it bit-for-bit. NULL values are dropped up front (a missing
    bucket carries no shift evidence; the ROWS order just tightens).
    Buckets must be unique per key (a rollup output IS) — equal-bucket
    ties would make the expanding ROWS frames order-dependent.
    """
    tq = int(math.floor(target * quantum))
    sq = int(math.floor(slack * quantum))
    hq = int(math.floor(threshold * quantum))
    if sq < 0 or hq <= 0:
        raise ValueError(
            f"cusum_changepoints: need slack >= 0 and threshold > 0 "
            f"after quantization, got slack_q={sq} threshold_q={hq}"
        )
    xq = F.floor(F.col(value).cast("double") * F.lit(quantum)).cast(
        "decimal(38,0)"
    )
    w = Window.partitionBy(key).orderBy(F.col(bucket).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    base = (
        series.where(F.col(value).isNotNull())
        .select(F.col(key), F.col(bucket), xq.alias("_x"))
        .withColumn("_p", F.sum(F.expr(f"_x - CAST({tq + sq} AS {dec})")).over(w))
        .withColumn("_q", F.sum(F.expr(f"_x - CAST({tq - sq} AS {dec})")).over(w))
    )
    run_min = F.min("_p").over(w)
    run_max = F.max("_q").over(w)
    zero = F.lit(0).cast(dec)
    stats = base.select(
        key,
        bucket,
        F.col("_x").cast("bigint").alias("value_q"),
        (F.col("_p") - F.least(zero, run_min)).alias("_cp"),
        (F.greatest(zero, run_max) - F.col("_q")).alias("_cn"),
    )
    h = F.lit(hq).cast(dec)
    return stats.where((F.col("_cp") > h) | (F.col("_cn") > h)).select(
        key,
        bucket,
        "value_q",
        F.col("_cp").cast("bigint").alias("cusum_pos"),
        F.col("_cn").cast("bigint").alias("cusum_neg"),
        (F.col("_cp") > h).alias("flag_hi"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    id_col: str | None = None,
    include_end: bool = False,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event streams:
    ``(from_event, to_event, n, p_micro)`` where ``n`` counts
    consecutive (this, next) pairs within a key and ``p_micro =
    n·10⁶ div Σ_to n`` is the row-normalized transition probability in
    integer millionths — the user-journey / clickstream staple (where
    do sessions go after 'view'?) and the input to next-event
    prediction baselines.

    Ordering within a key is (ts, id_col) — pass ``id_col`` whenever
    timestamps can tie, or the lag order (and thus the matrix) is
    nondeterministic. With ``include_end`` each key's final event also
    emits a transition to the absorbing ``'<end>'`` state, making every
    row of the matrix sum to exactly 10⁶±rounding (otherwise terminal
    events simply contribute no pair, the common convention).

    Scale shape: ONE window shuffle on the key (shared shape with
    sessionize/funnel — at 10^12 events the partition key is the user,
    never global), then one partial-aggregatable groupBy on the pair;
    the matrix is bounded by |event vocabulary|², not the corpus. NULL
    events/timestamps are dropped up front.
    """
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    base = df.where(F.col(event_col).isNotNull() & F.col(ts_col).isNotNull())
    nxt = F.lead(event_col).over(w)
    pairs = base.select(
        F.col(event_col).alias("from_event"),
        (F.coalesce(nxt, F.lit("<end>")) if include_end else nxt).alias("to_event"),
    ).where(F.col("to_event").isNotNull())
    g = pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # row totals as a window over the GROUPED rows (the heavy_hitters
    # device) — a groupBy+join formulation re-scans the corpus for the
    # denominator (caught by the plan pin: 2 scans instead of 1)
    tot = F.sum("n").over(Window.partitionBy("from_event")).cast("bigint")
    return g.select(
        "from_event",
        "to_event",
        "n",
        F.expr(f"n * 1000000").alias("_num"),
        tot.alias("_tot"),
    ).select(
        "from_event",
        "to_event",
        "n",
        F.expr("_num div _tot").alias("p_micro"),
    )


def _ewma_weights_micro(alpha_micro: int, horizon: int) -> list[int]:
    """w_d = α(1−α)^d floor-quantized to micro units, d = 0..horizon−1
    — computed ONCE in Python and consumed by both engines."""
    a = alpha_micro / 1_000_000.0
    return [
        int(math.floor(a * (1.0 - a) ** d * 1_000_000)) for d in range(horizon)
    ]


def ewma_control(
    series: DataFrame,
    key: str,
    bucket: str,
    value: str,
    target: float,
    threshold: float,
    alpha_micro: int = 300_000,
    horizon: int = 32,
    quantum: int = 1,
) -> DataFrame:
    """EWMA control chart over a per-key time series (Roberts 1959 —
    the third leg of the monitoring triad: rolling z-scores catch
    spikes, CUSUM catches tiny persistent shifts, EWMA catches the
    medium drift in between with a tunable memory α). Returns every
    bucket with ``(key, bucket, value_q, ewma, flag_hi, flag_lo)``
    where ``ewma`` is the smoothed level and the flags fire when it
    leaves ``target ± threshold``.

    The textbook recursion ``z_i = αx_i + (1−α)z_{i−1}`` is an
    exponential kernel; this computes its ``horizon``-term truncation
    as FIXED LAG TERMS: z_i = Σ_d w_d·x_{i−d} / Σ_d w_d over the
    available lags, with ``w_d = α(1−α)^d`` floor-quantized to integer
    micros in Python and injected into both engines. Truncation error
    is bounded by (1−α)^horizon (≈2e-5 at the defaults) and the
    operator is DEFINED as the truncated kernel, so it is exact by
    definition; normalizing by the present-lag weight sum makes warmup
    rows an unbiased average of what exists instead of decaying toward
    zero. All sums are DECIMAL(38,0) integers; the flags compare
    ``num − t·den`` against ``h·den`` in integers (no double in the
    decision path); ``ewma`` itself is ONE rounded double division.

    Scale shape: ONE window shuffle on the key; ``horizon`` lag
    expressions share that single window (no self-join, no UDF, no
    per-row recursion). Buckets must be unique per key (rollup output
    is); NULL values are dropped up front.
    """
    if not 0 < alpha_micro < 1_000_000:
        raise ValueError(f"ewma_control: alpha_micro must be in (0, 1e6), got {alpha_micro}")
    if horizon < 1:
        raise ValueError(f"ewma_control: horizon must be >= 1, got {horizon}")
    weights = _ewma_weights_micro(alpha_micro, horizon)
    tq = int(math.floor(target * quantum))
    hq = int(math.floor(threshold * quantum))
    if hq <= 0:
        raise ValueError("ewma_control: threshold must be > 0 after quantization")
    dec = "decimal(38,0)"
    xq = F.floor(F.col(value).cast("double") * F.lit(quantum)).cast(dec)
    w = Window.partitionBy(key).orderBy(F.col(bucket).asc())
    base = series.where(F.col(value).isNotNull()).select(
        F.col(key), F.col(bucket), xq.alias("_x0")
    )
    lags = [F.col("_x0")] + [
        F.lag("_x0", d).over(w) for d in range(1, len(weights))
    ]
    num = None
    den = None
    for wd, lg in zip(weights, lags):
        t = F.when(lg.isNotNull(), F.lit(wd).cast(dec) * lg).otherwise(
            F.lit(0).cast(dec)
        )
        dterm = F.when(lg.isNotNull(), F.lit(wd).cast(dec)).otherwise(
            F.lit(0).cast(dec)
        )
        num = t if num is None else num + t
        den = dterm if den is None else den + dterm
    out = base.select(
        key,
        bucket,
        F.col("_x0").cast("bigint").alias("value_q"),
        num.alias("_num"),
        den.alias("_den"),
    )
    diff = F.col("_num") - F.lit(tq).cast(dec) * F.col("_den")
    lim = F.lit(hq).cast(dec) * F.col("_den")
    return out.select(
        key,
        bucket,
        "value_q",
        F.round(F.col("_num").cast("double") / F.col("_den").cast("double"), 6).alias(
            "ewma"
        ),
        (diff > lim).alias("flag_hi"),
        (-diff > lim).alias("flag_lo"),
    )


def ewma_control_oracle_sql(
    series_sql: str,
    key: str,
    bucket: str,
    value: str,
    target: float,
    threshold: float,
    alpha_micro: int = 300_000,
    horizon: int = 32,
    quantum: int = 1,
) -> str:
    """DuckDB replay of :func:`ewma_control` — same Python-computed
    weight literals, same integer sums, same single division."""
    weights = _ewma_weights_micro(alpha_micro, horizon)
    tq = int(math.floor(target * quantum))
    hq = int(math.floor(threshold * quantum))
    over = f"OVER (PARTITION BY {key} ORDER BY {bucket} ASC)"
    num_terms, den_terms = [], []
    for d, wd in enumerate(weights):
        lg = "_x0" if d == 0 else f"lag(_x0, {d}) {over}"
        num_terms.append(
            f"(CASE WHEN ({lg}) IS NOT NULL THEN CAST({wd} AS HUGEINT) * ({lg})"
            f" ELSE 0 END)"
        )
        den_terms.append(
            f"(CASE WHEN ({lg}) IS NOT NULL THEN CAST({wd} AS HUGEINT) ELSE 0 END)"
        )
    return f"""\
WITH b AS (SELECT {key}, {bucket},
                  CAST(floor(CAST({value} AS DOUBLE) * {quantum}) AS HUGEINT) AS _x0
           FROM ({series_sql}) WHERE {value} IS NOT NULL),
s AS (SELECT {key}, {bucket}, _x0,
             {' + '.join(num_terms)} AS _num,
             {' + '.join(den_terms)} AS _den
      FROM b)
SELECT {key}, {bucket}, CAST(_x0 AS BIGINT) AS value_q,
       round(CAST(_num AS DOUBLE) / CAST(_den AS DOUBLE), 6) AS ewma,
       (_num - {tq} * _den) > {hq} * _den AS flag_hi,
       (-(_num - {tq} * _den)) > {hq} * _den AS flag_lo
FROM s"""


def acf(
    series: DataFrame,
    t_col: str,
    y_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
    step: int = 1,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Sample autocorrelation function over a bucketed series — the
    seasonality/memory profile the point detectors (z-score spikes,
    EWMA, CUSUM) can't give: a crawl-rate series with a daily cycle
    shows r(24h) ≈ 1 long before any single bucket alarms, and an
    ACF that never decays flags a metronomic bot the inter-arrival
    stats see only per-host. Composable: feed it any ``(t, y)`` frame
    (:func:`time_rollup` output, a continuous aggregate, a metric
    manifest) — ``lag`` is in buckets and ``step`` is the bucket width
    in ``t`` units, so pairs join on ``t + lag·step``.

    Estimator: the standard series form with the GLOBAL mean,
    r(k) = Σ_pairs (y_t−ȳ)(y_{t+k}−ȳ) / Σ_all (y−ȳ)², generalized to
    gapped series by summing the numerator over OBSERVED pairs (equal
    to the textbook estimator on contiguous series; pair counts are
    disclosed per lag as ``n_pairs``).

    Exactness: y is micro-quantized then every sum (S, Σy², per-lag
    Σy_t·y_{t+k}, head/tail sums) is DECIMAL(38,0); the mean is never
    materialized — the estimator is cross-multiplied to
    (n²Σyy − nS(H+T) + P·S²) / (n²Σy² − nS²), all integer DECIMAL,
    ONE double division per lag, rounded. Order-independent, hash-safe.

    Scale shape: runs on the BUCKET table, never rows: the lag join
    shuffles (#buckets × #lags) slim tuples on t; the global moments
    are one partial agg broadcast back. NULL acf (with n_pairs=0) for
    lags beyond the span; NULL t/y rows are excluded.

    Reference scope note: eliassona/xmlschemavalidator has no temporal
    layer (core.clj:263-285 is per-record); north-rule addition beside
    the EWMA/CUSUM/rolling-z family.
    """
    if not lags or any(int(k) <= 0 for k in lags):
        raise ValueError(f"acf: lags must be positive bucket offsets, got {lags!r}")
    b = (
        series.where(F.col(t_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.col(t_col).cast("bigint").alias("_t"),
            F.floor(F.col(y_col).cast("double") * F.lit(quantum))
            .cast("decimal(38,0)")
            .alias("_y"),
        )
    )
    g = b.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_y").alias("_s"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    left = b.select(
        "_t",
        F.col("_y").alias("_ly"),
        F.explode(F.array(*[F.lit(int(k)).cast("bigint") for k in lags])).alias("lag"),
    )
    right = b.select(F.col("_t").alias("_rt"), F.col("_y").alias("_ry"))
    pairs = left.join(
        right, left["_t"] + left["lag"] * F.lit(int(step)) == right["_rt"], "inner"
    )
    per_lag = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_p"),
        F.sum(F.col("_ly") * F.col("_ry")).alias("_sxy"),
        F.sum("_ly").alias("_h"),
        F.sum("_ry").alias("_tl"),
    )
    spark = series.sparkSession
    lag_table = spark.createDataFrame([(int(k),) for k in lags], "lag bigint")
    j = lag_table.join(per_lag, "lag", "left").crossJoin(F.broadcast(g))
    num = (
        F.col("_n") * F.col("_n") * F.col("_sxy")
        - F.col("_n") * F.col("_s") * (F.col("_h") + F.col("_tl"))
        + F.col("_p") * F.col("_s") * F.col("_s")
    )
    den = F.col("_n") * F.col("_n") * F.col("_syy") - F.col("_n") * F.col("_s") * F.col("_s")
    r = F.when(
        F.col("_p").isNotNull() & (den > 0),
        F.round(num.cast("double") / den.cast("double"), round_to),
    )
    return j.select(
        "lag",
        F.coalesce(F.col("_p").cast("bigint"), F.lit(0)).alias("n_pairs"),
        r.alias("acf"),
    )


def seasonal_profile(
    events: DataFrame,
    ts: str,
    period: str = "hour_of_day",
) -> DataFrame:
    """Seasonality index per calendar bucket — the complement of
    :func:`acf` (ACF says *whether* a cycle exists; this says its
    SHAPE): one row per bucket with ``(bucket, n_events,
    seasonal_index_micro)`` where the index is the bucket's share
    relative to a uniform spread, 10⁶ = exactly average, 2·10⁶ = twice
    the average rate. The crawl-scheduling / bot-fingerprint view: a
    human site breathes diurnally, a metronomic bot profile is flat at
    10⁶ everywhere, a cron-driven mirror spikes one hour.

    ``period``: 'hour_of_day' (24 buckets) or 'day_of_week' (7,
    0=Monday). Both derive from PURE integer epoch arithmetic —
    ``dayofweek()`` builtins disagree across engines on the week start
    (Spark 1=Sunday, DuckDB 0=Sunday), so the day index is
    (epoch_days + 3) mod 7 in both: 1970-01-01 was a Thursday.

    Exactness: index = n_b · P · 10⁶ div N — integer floor division,
    bit-identical cross-engine. ONE partial-aggregatable groupBy into
    ≤ P cells; NULL ts rows excluded."""
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    if period == "hour_of_day":
        bucket = F.expr(
            f"(unix_micros(CAST({ts} AS TIMESTAMP)) % 86400000000) div 3600000000"
        )
        n_buckets = 24
    elif period == "day_of_week":
        bucket = F.expr(
            f"((unix_micros(CAST({ts} AS TIMESTAMP)) div 86400000000) + 3) % 7"
        )
        n_buckets = 7
    else:
        raise ValueError(
            f"seasonal_profile: period must be 'hour_of_day' or 'day_of_week', got {period!r}"
        )
    per = (
        events.where(us.isNotNull())
        .groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    w = Window.partitionBy()
    return per.select(
        "bucket",
        "n_events",
        F.expr(f"n_events * {n_buckets} * 1000000").alias("_num"),
        F.sum("n_events").over(w).alias("_tot"),
    ).select(
        "bucket",
        "n_events",
        F.expr("_num div _tot").alias("seasonal_index_micro"),
    )


def dispersion_index(
    events: DataFrame,
    ts: str,
    key_col: str,
    bucket_seconds: int = 3600,
    threshold_milli: int = 2000,
    round_to: int = 6,
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio of per-bucket event
    counts) per key — the burstiness verdict between the inter-arrival
    gap stats (micro view) and the seasonal profile (shape view): a
    Poisson-ish organic stream sits near D≈1, batch/bot traffic that
    slams then sleeps reads D≫1, a metronome reads D≈0. One row per
    key: ``(key, n_events, n_buckets, mean_per_bucket, dispersion,
    overdispersed)``.

    The span's EMPTY buckets count as zeros (burstiness is exactly
    "events crowd into few buckets of the active span") — B spans
    min→max bucket per key, so gaps matter without ever materializing
    zero rows. Exactness: with S=Σc and Q=Σc² (DECIMAL over the bucket
    table), D = (B·Q − S²)/((B−1)·S) — integers until ONE double
    division; ``overdispersed`` compares D·1000 > threshold_milli on
    the same chain. NULL D for single-bucket keys (no variance exists).

    Scale shape: one partial-aggregatable (key, bucket) groupBy, then a
    per-key aggregate over the bucket table — never row-sized."""
    w = int(bucket_seconds)
    b = F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP)) div {w * 1_000_000}")
    per_bucket = (
        events.where(F.col(ts).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), b.alias("_b"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("_c"))
    )
    per_key = per_bucket.groupBy("key").agg(
        F.sum("_c").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).alias("_q"),
        (F.max("_b") - F.min("_b") + 1).cast("decimal(38,0)").alias("_nb"),
    )
    d_num = F.col("_nb") * F.col("_q") - F.col("_s") * F.col("_s")
    d_den = (F.col("_nb") - 1) * F.col("_s")
    disp = F.when(
        F.col("_nb") > 1, d_num.cast("double") / d_den.cast("double")
    )
    return per_key.select(
        "key",
        F.col("_s").cast("bigint").alias("n_events"),
        F.col("_nb").cast("bigint").alias("n_buckets"),
        F.round(
            F.col("_s").cast("double") / F.col("_nb").cast("double"), round_to
        ).alias("mean_per_bucket"),
        F.round(disp, round_to).alias("dispersion"),
        F.coalesce(
            disp * F.lit(1000.0) > F.lit(float(threshold_milli)), F.lit(False)
        ).alias("overdispersed"),
    )


def event_ngrams(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    n: int = 3,
    id_col: str | None = None,
    min_count: int = 2,
) -> DataFrame:
    """Frequent order-sensitive event n-grams over per-key streams
    (sequential-pattern mining, the contiguous-window PrefixSpan-lite:
    Agrawal & Srikant ICDE'95 framed the problem; contiguous n-grams
    are its scalable degenerate case and the de-facto clickstream
    practice) → ``(e_1..e_n, n_occurrences, n_keys)``.

    The n>2 sibling of :func:`event_transitions`: the Markov matrix
    says what follows 'view'; this says which whole 3-step journeys
    recur, and ``n_keys`` (distinct keys exhibiting the pattern)
    separates one bot looping a path from a thousand users sharing it.

    Ordering within a key is (ts, id_col) — same determinism contract
    as event_transitions: pass ``id_col`` when timestamps can tie.
    Windows never cross keys; a key with < n events emits nothing.

    Scale shape: ONE window shuffle on the key computes all n−1 leads
    in the same frame (one Exchange, one sort — the sessionize shape),
    then one partial-aggregatable groupBy on the n-gram; the result is
    bounded by |event vocabulary|^n ∩ observed, not by the corpus.
    ``n_keys`` rides a two-level aggregate (distinct (ngram, key)
    first), deliberately no countDistinct/Expand over the raw stream.
    """
    if n < 2:
        raise ValueError(f"event_ngrams: need n >= 2, got {n}")
    if min_count < 1:
        raise ValueError(f"event_ngrams: bad min_count={min_count}")
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    base = df.where(F.col(event_col).isNotNull() & F.col(ts_col).isNotNull())
    cols = [F.col(event_col).alias("e_1")] + [
        F.lead(event_col, i).over(w).alias(f"e_{i + 1}") for i in range(1, n)
    ]
    grams = base.select(F.col(key_col).alias("_k"), *cols).where(
        F.col(f"e_{n}").isNotNull()
    )
    names = [f"e_{i + 1}" for i in range(n)]
    per_key = grams.groupBy("_k", *names).agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        per_key.groupBy(*names)
        .agg(
            F.sum("_c").cast("bigint").alias("n_occurrences"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def event_ngrams_oracle_sql(
    from_sql: str,
    key_col: str,
    ts_col: str,
    event_col: str,
    n: int = 3,
    id_col: str | None = None,
    min_count: int = 2,
) -> str:
    """DuckDB replay of :func:`event_ngrams` — identical (ts, id)
    window ordering, identical two-level key aggregation."""
    order = f"{ts_col}" + (f", {id_col}" if id_col else "")
    leads = ", ".join(
        f"lead({event_col}, {i}) OVER (PARTITION BY {key_col} "
        f"ORDER BY {order}) AS e_{i + 1}"
        for i in range(1, n)
    )
    names = ", ".join(f"e_{i + 1}" for i in range(n))
    return f"""WITH base AS (
  SELECT {key_col} AS k, {event_col} AS e_1, {leads}
  FROM ({from_sql})
  WHERE {event_col} IS NOT NULL AND {ts_col} IS NOT NULL),
grams AS (SELECT * FROM base WHERE e_{n} IS NOT NULL),
per_key AS (SELECT k, {names}, CAST(count(*) AS BIGINT) AS c
            FROM grams GROUP BY ALL)
SELECT {names}, CAST(sum(c) AS BIGINT) AS n_occurrences,
       CAST(count(*) AS BIGINT) AS n_keys
FROM per_key GROUP BY ALL
HAVING CAST(sum(c) AS BIGINT) >= {min_count}"""


def seasonal_residual_anomalies(
    df: DataFrame,
    ts: str,
    key: str,
    window: int = 7,
    k_tenths: int = 30,
) -> DataFrame:
    """Seasonally-adjusted daily anomalies (the STL-lite composition of
    :func:`seasonal_profile` and :func:`rolling_anomalies`): a Monday
    spike on a Monday-heavy stream is weather, not news — deseasonalize
    per-key daily counts by the key's own day-of-week index, THEN
    rolling-z the residuals. Flags ``(key, day, value_q, mean_q,
    flag_hi)`` where value_q is the residual ``c·10⁶ div idx`` (10⁶ ≈
    exactly the seasonal expectation).

    All integer: the dow index is the seasonal_profile arithmetic
    (``n_dow·7·10⁶ div N_key``, epoch-day (d+3)%7 week anchoring — the
    cross-engine dayofweek trap), the residual one more floor division,
    and the anomaly predicate rolling_anomalies' cross-multiplied
    DECIMAL form. Days whose dow index floors to 0 (< 1/7,000,000 of
    the key's mass) drop — disclosed, measure-zero on real streams.

    Scale shape: one groupBy to daily counts (bounded by keys×days),
    one keys×7 profile agg joined back broadcast-small, then the one
    window pass — the corpus never shuffles twice.
    """
    us = F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP))")
    daily = (
        df.where(us.isNotNull())
        .groupBy(
            F.col(key).alias("_k"),
            F.expr(
                f"unix_micros(CAST({ts} AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .withColumn("_dow", (F.col("day") + 3) % 7)
    )
    prof = (
        daily.groupBy("_k", "_dow")
        .agg(F.sum("_c").cast("long").alias("_nb"))
        .withColumn(
            "_nk", F.sum("_nb").over(Window.partitionBy("_k")).cast("long")
        )
        .select(
            "_k", "_dow",
            F.expr("_nb * 7 * 1000000 div _nk").alias("_idx"),
        )
        .where(F.col("_idx") > 0)
    )
    resid = daily.join(prof, ["_k", "_dow"]).select(
        F.col("_k").alias(key),
        "day",
        F.expr("_c * 1000000 div _idx").alias("residual_q"),
    )
    return rolling_anomalies(
        resid, key=key, bucket="day", value="residual_q",
        window=window, k_tenths=k_tenths,
    )


def seasonal_residual_oracle_sql(
    from_sql: str,
    ts: str,
    key: str,
    window: int = 7,
    k_tenths: int = 30,
) -> str:
    """DuckDB replay of :func:`seasonal_residual_anomalies` — profile,
    residual and the cross-multiplied anomaly predicate in one
    statement."""
    k2 = k_tenths * k_tenths
    return f"""WITH daily AS (
  SELECT {key} AS k, epoch_us(CAST({ts} AS TIMESTAMP)) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM ({from_sql})
  WHERE epoch_us(CAST({ts} AS TIMESTAMP)) IS NOT NULL GROUP BY 1, 2),
d2 AS (SELECT *, (day + 3) % 7 AS dow FROM daily),
prof AS (SELECT k, dow,
    CAST(sum(c) AS BIGINT) * 7 * 1000000
      // CAST(sum(sum(c)) OVER (PARTITION BY k) AS BIGINT) AS idx
  FROM d2 GROUP BY 1, 2),
resid AS (SELECT d2.k, d2.day,
    CAST(d2.c AS HUGEINT) * 1000000 // CAST(prof.idx AS HUGEINT) AS x
  FROM d2 JOIN prof ON d2.k = prof.k AND d2.dow = prof.dow
  WHERE prof.idx > 0),
z AS (SELECT k, day, x,
    count(*) OVER fr AS w,
    sum(x) OVER fr AS s,
    sum(x * x) OVER fr AS ss
  FROM resid
  WINDOW fr AS (PARTITION BY k ORDER BY day
                ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING))
SELECT k AS {key}, day, CAST(x AS BIGINT) AS value_q,
       CAST(s // {window} AS BIGINT) AS mean_q,
       (w * x - s) > 0 AS flag_hi
FROM z
WHERE w = {window}
  AND 100 * (w*x - s) * (w*x - s) > {k2} * (w*ss - s*s)"""


def transition_drift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    period_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Transition-matrix drift between two periods — the user-journey
    question the scalar drift analyzers can't localize: chi²/JSD on the
    EVENT distribution misses a flow that reroutes (same event counts,
    different wiring), and a single KS on anything misses WHICH edge
    moved. Pairs are built exactly like :func:`event_transitions`
    (per-key (ts, id) order, lag-1), each labeled by its FROM event's
    boolean ``period_col`` (A = true); one row per observed (from, to)
    edge: ``(from_event, to_event, n_a, n_b, p_a_micro, p_b_micro,
    delta_micro)`` with row-normalized integer-micro probabilities per
    period and the signed per-edge probability shift. An edge absent
    from one period reads p = 0 there (n = 0), NOT a dropped row —
    appearing/vanishing edges are the headline finding. A period with
    an empty row (from-state never seen) reads NULL p for that side.

    Scale shape: ONE key-window shuffle (the event_transitions shape)
    → pair groupBy with two conditional lanes → two from-partitioned
    window sums over the bounded vocab² matrix. Nothing scans twice.
    """
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    base = df.where(
        F.col(event_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(period_col).isNotNull()
    )
    nxt = F.lead(event_col).over(w)
    pairs = base.select(
        F.col(event_col).alias("from_event"),
        nxt.alias("to_event"),
        F.col(period_col).cast("boolean").alias("_pa"),
    ).where(F.col("to_event").isNotNull())
    g = pairs.groupBy("from_event", "to_event").agg(
        F.sum(F.col("_pa").cast("long")).cast("bigint").alias("n_a"),
        F.sum((~F.col("_pa")).cast("long")).cast("bigint").alias("n_b"),
    )
    wf = Window.partitionBy("from_event")
    ta = F.sum("n_a").over(wf).cast("bigint")
    tb = F.sum("n_b").over(wf).cast("bigint")
    staged = g.select("from_event", "to_event", "n_a", "n_b",
                      ta.alias("_ta"), tb.alias("_tb"))
    pa = F.expr("CASE WHEN _ta > 0 THEN n_a * 1000000 div _ta END")
    pb = F.expr("CASE WHEN _tb > 0 THEN n_b * 1000000 div _tb END")
    return staged.select(
        "from_event",
        "to_event",
        "n_a",
        "n_b",
        pa.alias("p_a_micro"),
        pb.alias("p_b_micro"),
        (F.coalesce(pa, F.lit(0)) - F.coalesce(pb, F.lit(0)))
        .cast("bigint")
        .alias("delta_micro"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Cohort retention matrix — THE product-analytics table (cohort =
    the period a user was first seen; cell (cohort, offset) = share of
    that cohort active ``offset`` periods later): ``(cohort, offset,
    n_active, n_cohort, retention)``, offset 0 reading exactly 1.0 by
    construction. The engine-side view of what Kaplan–Meier summarizes
    as a curve — KM gives the censoring-correct single series, this
    gives the per-cohort grid that shows WHICH acquisition wave decays.

    Machinery: period = floor(epoch_day / period_days) — pure integer
    arithmetic on ``unix_micros``; first period per user is ONE
    partial-aggregatable min; activity collapses to DISTINCT
    (user, period) before any join (the count-distinct-free discipline:
    a user's million events in a week are one row past the first
    groupBy); one user-keyed join, one (cohort, offset) groupBy. All
    counts exact integers; retention is one IEEE division. NULL
    users/timestamps excluded.

    Scale shape: everything partial-aggregatable on user or
    (cohort, offset); nothing driver-sized. The matrix is bounded by
    periods², not users.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule addition to the temporal
    family (sessionize / KM / last-touch).
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    per = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        / F.lit(86_400_000_000 * period_days)
    ).cast("bigint")
    base = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("_u"), per.alias("_p"))
    activity = base.distinct()
    first = base.groupBy("_u").agg(F.min("_p").alias("_first"))
    cells = (
        activity.join(first, "_u")
        .groupBy(
            F.col("_first").alias("cohort"),
            (F.col("_p") - F.col("_first")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sizes = first.groupBy(F.col("_first").alias("cohort")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    return (
        cells.join(sizes, "cohort")
        .select(
            "cohort",
            "offset",
            "n_active",
            "n_cohort",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double"),
                round_to,
            ).alias("retention"),
        )
        .orderBy("cohort", "offset")
    )


def cohort_retention_oracle_sql(
    from_sql: str, period_days: int = 7, round_to: int = 6
) -> str:
    """DuckDB replay of :func:`cohort_retention`; ``from_sql`` must
    yield ``u`` and ``ts``."""
    per = (
        f"CAST(floor(epoch_us(CAST(ts AS TIMESTAMP))"
        f" / {86_400_000_000 * period_days}) AS BIGINT)"
    )
    return f"""WITH src AS ({from_sql}),
b AS (SELECT u, {per} AS p FROM src
      WHERE u IS NOT NULL AND ts IS NOT NULL),
act AS (SELECT DISTINCT u, p FROM b),
fst AS (SELECT u, min(p) AS f FROM b GROUP BY u),
cells AS (SELECT fst.f AS cohort, act.p - fst.f AS "offset",
    CAST(count(*) AS BIGINT) AS n_active
  FROM act JOIN fst USING (u) GROUP BY 1, 2),
sizes AS (SELECT f AS cohort, CAST(count(*) AS BIGINT) AS n_cohort
          FROM fst GROUP BY f)
SELECT c.cohort, c."offset", c.n_active, s.n_cohort,
  round(CAST(c.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE),
      {round_to}) AS retention
FROM cells c JOIN sizes s USING (cohort)
ORDER BY c.cohort, c."offset" """


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Ordered funnel conversion (the classic product query: of the
    users who did step 1, how many went ON to do step 2 AFTER it, then
    step 3 after that…): one row per step, ``(step_index, step,
    n_users, conversion_from_first, conversion_from_prev)``. Order is
    STRICT — a purchase logged before the click does not count (the
    distinction a naive per-type distinct-count funnel gets wrong), and
    each step anchors at the EARLIEST qualifying time (first step-1
    event, then first step-2 event strictly after it, …) — the standard
    unordered-window funnel semantics.

    Machinery: per step k, one user-keyed min-aggregate of that step's
    events filtered ``ts > t_{k−1}`` via an inner join on user —
    ``len(steps)−1`` bounded joins, each partial-aggregatable, nothing
    driver-sized. Timestamps compared as exact ``unix_micros``
    integers. Counts exact; rates one IEEE division each. NULL
    users/timestamps excluded; an empty step empties the tail (rates
    NULL past it, n_users 0).

    Reference scope note: north-rule temporal addition; pairs with
    :func:`last_touch_attribution` (which click gets credit) and
    :func:`cohort_retention` (who comes back).
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {len(steps)}")
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        mic.alias("_t"),
    )
    spark = events.sparkSession
    reached = (
        base.where(F.col("_e") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_at"))
    )
    counts = [reached.count()]
    for step in steps[1:]:
        nxt = (
            base.where(F.col("_e") == step)
            .join(reached.select("_u", F.col("_at").alias("_prev")), "_u")
            .where(F.col("_t") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_t").alias("_at"))
        )
        reached = nxt
        counts.append(reached.count())
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        first = counts[0]
        prev = counts[i - 1] if i > 0 else None
        rows.append(
            (
                i + 1,
                step,
                n,
                round(n / first, round_to) if i > 0 and first > 0 else (1.0 if i == 0 and first > 0 else None),
                round(n / prev, round_to) if prev else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "step_index int, step string, n_users bigint,"
        " conversion_from_first double, conversion_from_prev double",
    )


def funnel_oracle_sql(
    from_sql: str, steps: list[str], round_to: int = 6
) -> str:
    """DuckDB replay of :func:`funnel_conversion`; ``from_sql`` must
    yield ``u``, ``e``, ``ts``. Same strict-order earliest-anchor
    semantics via chained min-filter CTEs."""
    ctes = [
        f"""s1 AS (SELECT u, min(t) AS at FROM b WHERE e = '{steps[0]}'
      GROUP BY u)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (SELECT b.u, min(b.t) AS at
      FROM b JOIN s{i - 1} p ON b.u = p.u
      WHERE b.e = '{step}' AND b.t > p.at GROUP BY b.u)"""
        )
    selects = []
    for i, step in enumerate(steps, start=1):
        cff = (
            "CAST(1.0 AS DOUBLE)"
            if i == 1
            else f"round((SELECT count(*) FROM s{i}) * 1.0 /"
            " nullif((SELECT count(*) FROM s1), 0),"
            f" {round_to})"
        )
        cfp = (
            "CAST(NULL AS DOUBLE)"
            if i == 1
            else f"round((SELECT count(*) FROM s{i}) * 1.0 /"
            f" nullif((SELECT count(*) FROM s{i - 1}), 0), {round_to})"
        )
        first_guard = (
            "CASE WHEN (SELECT count(*) FROM s1) > 0 THEN " + cff + " END"
        )
        selects.append(
            f"SELECT {i} AS step_index, '{step}' AS step,"
            f" CAST((SELECT count(*) FROM s{i}) AS BIGINT) AS n_users,"
            f" {first_guard} AS conversion_from_first,"
            f" {cfp} AS conversion_from_prev"
        )
    cte_block = ",\n".join(ctes)
    select_block = "\nUNION ALL\n".join(selects)
    return f"""WITH src AS ({from_sql}),
b AS (SELECT u, e, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM src
      WHERE u IS NOT NULL AND e IS NOT NULL AND ts IS NOT NULL),
{cte_block}
{select_block}
ORDER BY step_index"""


def rolling_active_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 28,
    round_to: int = 6,
) -> DataFrame:
    """Rolling active users + stickiness (the DAU/MAU product metric):
    per calendar day, ``(day, dau, mau, stickiness)`` where dau =
    distinct users active that day, mau = distinct users active in the
    TRAILING ``window_days`` window, stickiness = dau/mau (the
    how-often-do-actives-return number a plain retention matrix
    doesn't give).

    The scale trick: a sliding distinct-count can't be summed from
    daily partials (users repeat), and per-day count-distinct over a
    28-day self-join is a 28× blowup. Instead each user's activity
    collapses to COVERAGE INTERVALS — an active day d covers MAU
    membership for days [d, d+w−1]; per user the intervals merge into
    islands (gaps-and-islands over one user-keyed window pass), each
    island emits ±1 boundary deltas, and mau(day) is ONE prefix sum of
    deltas over the bounded day spine. Exact — not a sketch — with
    work O(distinct (user, day)) + a day-grid window; nothing is ever
    28×'d and no distinct runs inside a sliding frame.

    All counts exact integers; stickiness one IEEE division. Days with
    zero actives inside the observed range still emit (dau 0, mau from
    the trailing window). NULL users/timestamps excluded.

    Reference scope note: north-rule temporal addition — completes the
    engagement family (sessionize / cohort_retention / THIS).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("bigint")
    ud = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), day.alias("_d"))
        .distinct()
    )
    dau = ud.groupBy(F.col("_d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    w_ord = Window.partitionBy("_u").orderBy("_d")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    isl = ud.select(
        "_u",
        "_d",
        F.when(
            F.col("_d")
            > F.max(F.col("_d") + window_days - 1).over(w_prev),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    ).select(
        "_u",
        "_d",
        F.sum("_new").over(w_ord).alias("_isl"),
    )
    islands = isl.groupBy("_u", "_isl").agg(
        F.min("_d").alias("_start"),
        (F.max("_d") + window_days - 1).alias("_end"),
    )
    deltas = (
        islands.select(F.col("_start").alias("day"), F.lit(1).alias("_delta"))
        .unionByName(
            islands.select(
                (F.col("_end") + 1).alias("day"), F.lit(-1).alias("_delta")
            )
        )
        .groupBy("day")
        .agg(F.sum("_delta").cast("bigint").alias("_dsum"))
    )
    bounds = ud.agg(
        F.min("_d").alias("_lo"), F.max("_d").alias("_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
    )
    w_day = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    joined = (
        spine.join(deltas, "day", "left")
        .select(
            "day", F.coalesce(F.col("_dsum"), F.lit(0)).alias("_dsum")
        )
        .select("day", F.sum("_dsum").over(w_day).cast("bigint").alias("mau"))
        .join(dau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
            "mau",
        )
    )
    return joined.select(
        "day",
        "dau",
        "mau",
        F.round(
            F.when(
                F.col("mau") > 0,
                F.col("dau").cast("double") / F.col("mau").cast("double"),
            ),
            round_to,
        ).alias("stickiness"),
    ).orderBy("day")


def rolling_active_oracle_sql(
    from_sql: str, window_days: int = 28, round_to: int = 6
) -> str:
    """DuckDB replay of :func:`rolling_active_users`; ``from_sql`` must
    yield ``u`` and ``ts``. Same islands, same delta prefix sum."""
    day = (
        "CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)"
        " AS BIGINT)"
    )
    w = window_days
    return f"""WITH src AS ({from_sql}),
ud AS (SELECT DISTINCT u, {day} AS d FROM src
       WHERE u IS NOT NULL AND ts IS NOT NULL),
dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        FROM ud GROUP BY d),
isl AS (SELECT u, d, CAST(sum(newf) OVER (PARTITION BY u ORDER BY d)
          AS BIGINT) AS isl
  FROM (SELECT u, d, CASE WHEN d > max(d + {w} - 1) OVER
          (PARTITION BY u ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        THEN 1 ELSE 0 END AS newf FROM ud)),
islands AS (SELECT u, isl, min(d) AS s, max(d) + {w} - 1 AS e
            FROM isl GROUP BY u, isl),
deltas AS (SELECT day, CAST(sum(delta) AS BIGINT) AS dsum FROM (
    SELECT s AS day, 1 AS delta FROM islands
    UNION ALL SELECT e + 1, -1 FROM islands) GROUP BY day),
bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds),
mau AS (SELECT spine.day,
    CAST(sum(coalesce(deltas.dsum, 0)) OVER (ORDER BY spine.day)
         AS BIGINT) AS mau
  FROM spine LEFT JOIN deltas USING (day))
SELECT mau.day, CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau, mau.mau,
  round(CASE WHEN mau.mau > 0 THEN CAST(coalesce(dau.dau, 0) AS DOUBLE)
        / CAST(mau.mau AS DOUBLE) END, {round_to}) AS stickiness
FROM mau LEFT JOIN dau USING (day) ORDER BY mau.day"""
