"""Sequence/order data-quality checks: per-key monotonicity of a
timestamp along an ingestion order, and contiguity of a sequence-number
column.

The two classic event-log invariants: (1) "within a user, event time
never runs backwards along the log order" — violated by clock skew,
replayed batches, or a mis-merged backfill; (2) "line numbers per order
are 1..n with no gaps or duplicates" — violated by dropped or
double-delivered rows. Both emit results in the engine's standard
shapes (violation rows / per-key summaries) so they flow into the same
sinks as facet and uniqueness checks.

Scale shape: monotonicity is ONE window pass per key (running max over
the preceding frame — partial ordering state, no self-join);
gap checking is ONE two-level aggregate (distinct-collapse first, so a
duplicate-heavy key reaches the shuffle collapsed). Both shuffle once
on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_violations(
    df: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    id_col: str,
    rule_id: str | None = None,
) -> DataFrame:
    """Rows whose `ts` is EARLIER than the maximum `ts` seen before them
    in `order_col` order within the same `key` — time ran backwards.
    Returns violation rows ``(id, rule_id, observed_value, key,
    prev_max_ts)`` where observed_value is the offending timestamp as an
    ISO string (the engine's violation-row convention).

    The running max (not lag alone) is what makes this the real
    invariant: after one late row, every subsequent in-order row would
    "recover" under a lag check while still being earlier than the
    watermark the stream had already advanced to.
    """
    if "_prev_max" in df.columns:
        raise ValueError(
            "order_violations: column '_prev_max' collides with an "
            "internal name; rename it first"
        )
    rid = rule_id or f"order_{ts}_by_{order_col}"
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(ts).over(w)
    return (
        df.withColumn("_prev_max", prev_max)
        .where(F.col("_prev_max").isNotNull() & (F.col(ts) < F.col("_prev_max")))
        .select(
            F.col(id_col),
            F.lit(rid).alias("rule_id"),
            F.date_format(F.col(ts), "yyyy-MM-dd HH:mm:ss").alias("observed_value"),
            F.col(key),
            F.date_format(F.col("_prev_max"), "yyyy-MM-dd HH:mm:ss").alias(
                "prev_max_ts"
            ),
        )
    )


def sequence_gap_summary(df: DataFrame, key: str, seq_col: str) -> DataFrame:
    """Per-key contiguity summary of an integer sequence column:
    ``(key, n_rows, n_distinct, min_seq, max_seq, n_missing,
    n_duplicates)`` where ``n_missing = (max-min+1) - n_distinct`` and
    ``n_duplicates = n_rows - n_distinct``. A clean 1..n key shows
    zeros in both. NULL sequence values are excluded from the range
    math but counted in ``n_rows`` (a NULL line number is its own
    finding for the null-rate check).

    Two-level aggregate: ``groupBy(key, seq)`` collapses duplicates
    map-side before the per-key rollup — a key with a million duplicate
    rows reaches the shuffle as one row per distinct value.
    """
    pair = df.groupBy(
        F.col(key), F.col(seq_col).alias("_seq")
    ).agg(F.count(F.lit(1)).alias("_n"))
    # duplicates are counted over NON-NULL sequence values only: a NULL
    # line number is a null-rate finding, not a double delivery
    n_nonnull = F.sum(F.when(F.col("_seq").isNotNull(), F.col("_n")))
    return pair.groupBy(key).agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count("_seq").cast("bigint").alias("n_distinct"),
        F.min("_seq").cast("bigint").alias("min_seq"),
        F.max("_seq").cast("bigint").alias("max_seq"),
        (
            (F.max("_seq") - F.min("_seq") + 1) - F.count("_seq")
        ).cast("bigint").alias("n_missing"),
        F.coalesce(n_nonnull - F.count("_seq"), F.lit(0))
        .cast("bigint")
        .alias("n_duplicates"),
    )


def sprt_monitor(
    df,
    order_col: str,
    outcome_col: str,
    p0_milli: int,
    p1_milli: int,
    alpha_milli: int = 50,
    beta_milli: int = 50,
    round_to: int = 6,
):
    """Wald's sequential probability ratio test (Wald 1945) over an
    ORDERED stream of boolean outcomes — the always-peeking monitor the
    fixed-n tests forbid: watch a pass/fail stream and stop the moment
    the evidence crosses a boundary, with guaranteed error rates α/β
    at ANY stopping time. H0: rate = p0, H1: rate = p1. ONE row
    ``(n, n_pass, decision, decided_at, llr, boundary_a, boundary_b)``
    with decision ∈ accept_h0 / accept_h1 / continue and ``decided_at``
    the EARLIEST crossing position (the monitor's alarm time — later
    wobbles don't un-ring it).

    Exactness: the per-outcome log-likelihood increments are TWO
    Python-computed integer micro literals (ln(p1/p0), ln((1−p1)/
    (1−p0)) — one code path computes them, both engines consume them),
    the LLR path is an integer cumulative sum over the order column,
    and Wald's boundaries ln((1−β)/α), ln(β/(1−α)) are integer micro
    literals too — every compare is exact BIGINT. The first crossing
    is a conditional min over the walk. One ordered window over the
    stream (the monitor's stream is a per-rule sequence, bounded by
    the monitoring horizon — the disclosed single-partition window of
    the order-check family; partition upstream per rule/segment).

    Duplicate order values would make the walk ambiguous — refused.
    NULL outcomes excluded before ordering (the stream the monitor
    actually saw).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    import math

    if not 0 < p0_milli < 1000 or not 0 < p1_milli < 1000:
        raise ValueError("sprt_monitor: p0_milli/p1_milli must be in (0,1000)")
    if p0_milli == p1_milli:
        raise ValueError("sprt_monitor: p0 and p1 must differ")
    p0, p1 = p0_milli / 1000.0, p1_milli / 1000.0
    a, b = alpha_milli / 1000.0, beta_milli / 1000.0
    inc_pass = round(math.log(p1 / p0) * 1_000_000)
    inc_fail = round(math.log((1 - p1) / (1 - p0)) * 1_000_000)
    upper = round(math.log((1 - b) / a) * 1_000_000)  # accept H1 at/above
    lower = round(math.log(b / (1 - a)) * 1_000_000)  # accept H0 at/below
    base = df.where(
        F.col(order_col).isNotNull() & F.col(outcome_col).isNotNull()
    ).select(
        F.col(order_col).alias("_t"),
        F.col(outcome_col).cast("boolean").cast("long").alias("_y"),
    )
    dup = (
        base.groupBy("_t").count().where(F.col("count") > 1).count()
    )
    if dup:
        raise ValueError(
            f"sprt_monitor: {dup} duplicate order value(s) — the walk "
            "order must be total; disambiguate the order column"
        )
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    walk = base.select(
        "_t",
        "_y",
        F.sum(
            F.when(F.col("_y") == 1, F.lit(inc_pass)).otherwise(
                F.lit(inc_fail)
            )
        )
        .over(w)
        .cast("bigint")
        .alias("_llr"),
    )
    agg = walk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("_y"), F.lit(0)).cast("bigint").alias("n_pass"),
        F.min(F.when(F.col("_llr") >= upper, F.col("_t"))).alias("_hit_up"),
        F.min(F.when(F.col("_llr") <= lower, F.col("_t"))).alias("_hit_lo"),
    )
    # the final LLR is a pure function of the counts — no order-
    # dependent last() anywhere
    n_pass = F.col("n_pass")
    n_fail = F.col("n") - n_pass
    final_llr = n_pass * inc_pass + n_fail * inc_fail
    up_first = F.col("_hit_up").isNotNull() & (
        F.col("_hit_lo").isNull() | (F.col("_hit_up") <= F.col("_hit_lo"))
    )
    lo_first = F.col("_hit_lo").isNotNull() & (
        F.col("_hit_up").isNull() | (F.col("_hit_lo") < F.col("_hit_up"))
    )
    return agg.select(
        "n",
        "n_pass",
        F.when(up_first, F.lit("accept_h1"))
        .when(lo_first, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        F.when(up_first, F.col("_hit_up"))
        .when(lo_first, F.col("_hit_lo"))
        .alias("decided_at"),
        F.round(final_llr.cast("double") / F.lit(1e6), round_to).alias("llr"),
        F.round(F.lit(upper / 1e6), round_to).alias("boundary_a"),
        F.round(F.lit(lower / 1e6), round_to).alias("boundary_b"),
    )


def sprt_oracle_sql(
    from_sql: str,
    p0_milli: int,
    p1_milli: int,
    alpha_milli: int = 50,
    beta_milli: int = 50,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`sprt_monitor`; ``from_sql`` must yield
    ``t`` and boolean ``y``. Same Python-computed integer micro
    literals, same cumulative walk."""
    import math

    p0, p1 = p0_milli / 1000.0, p1_milli / 1000.0
    a, b = alpha_milli / 1000.0, beta_milli / 1000.0
    inc_pass = round(math.log(p1 / p0) * 1_000_000)
    inc_fail = round(math.log((1 - p1) / (1 - p0)) * 1_000_000)
    upper = round(math.log((1 - b) / a) * 1_000_000)
    lower = round(math.log(b / (1 - a)) * 1_000_000)
    return f"""WITH src AS ({from_sql}),
base AS (SELECT t, CAST(CAST(y AS BOOLEAN) AS BIGINT) AS y FROM src
         WHERE t IS NOT NULL AND y IS NOT NULL),
walk AS (SELECT t, y,
    CAST(sum(CASE WHEN y = 1 THEN {inc_pass} ELSE {inc_fail} END)
         OVER (ORDER BY t) AS BIGINT) AS llr
  FROM base),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(y), 0) AS BIGINT) AS n_pass,
    min(CASE WHEN llr >= {upper} THEN t END) AS hit_up,
    min(CASE WHEN llr <= {lower} THEN t END) AS hit_lo
  FROM walk)
SELECT n, n_pass,
  CASE WHEN hit_up IS NOT NULL AND (hit_lo IS NULL OR hit_up <= hit_lo)
       THEN 'accept_h1'
       WHEN hit_lo IS NOT NULL AND (hit_up IS NULL OR hit_lo < hit_up)
       THEN 'accept_h0'
       ELSE 'continue' END AS decision,
  CASE WHEN hit_up IS NOT NULL AND (hit_lo IS NULL OR hit_up <= hit_lo)
       THEN hit_up
       WHEN hit_lo IS NOT NULL AND (hit_up IS NULL OR hit_lo < hit_up)
       THEN hit_lo END AS decided_at,
  round(CAST(n_pass * {inc_pass} + (n - n_pass) * {inc_fail} AS DOUBLE)
      / 1e6, {round_to}) AS llr,
  round({upper} / 1e6, {round_to}) AS boundary_a,
  round({lower} / 1e6, {round_to}) AS boundary_b
FROM agg"""
