"""Z-order (Morton curve) data layout for multi-column data skipping —
the lakehouse `OPTIMIZE ZORDER BY` operation (Delta Lake / Iceberg
rewrite strategies; Morton 1966 for the curve itself).

Why this matters at 100 TB and not at bench scale: parquet readers skip
row groups and files whose min/max column statistics exclude a filter's
range. A table laid out by ONE sort column skips perfectly on that
column and not at all on any other; interleaving the bits of k bounded
column ranks gives every participating column locality ~2^(bits/k), so
range filters on ANY of them prune most files. The rewrite itself is a
single repartitionByRange + write — the cost of one shuffle, paid once,
amortized over every subsequent scan.

Two layers, matching the engine's exact/approx split elsewhere:

* `zorder_value(*cols, bits=...)` — the EXACT bit interleave of already
  bounded non-negative integer columns (pure integer Column arithmetic,
  engine-portable; the driver oracle replays it in DuckDB bit-for-bit).
* `zorder_layout(df, cols, ...)` — the end-to-end rewrite for arbitrary
  numeric columns: per-column bucket ranks from ONE percentile_approx
  pass (broadcast literal cuts — never a per-column global sort), bit
  interleave, repartitionByRange on the z-value, write. Bucketing is
  approximate by design (rank fidelity only steers locality, never
  correctness), which is why the exact layer exists separately for the
  oracle.

The locality win is pinned by test_layout.py: after zorder_layout the
average per-file min/max span of EACH participating column is a
fraction of its span under the natural (single-column-ish) layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(*cols, bits: int = 8):
    """Morton interleave of k bounded non-negative integer columns into
    one BIGINT: output bit (b*k + i) is bit b of column i, so column 0
    holds the LEAST significant of each bit group (the conventional
    z-curve). Inputs must already lie in [0, 2^bits); values outside are
    the caller's bug and are clamped via bitwise AND with the mask (a
    silent wrap would scramble locality, a mask only saturates the top).

    k * bits must fit a BIGINT (<= 62). Pure integer arithmetic —
    shiftleft/shiftright/AND — identical in Spark and DuckDB.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_value: need at least one column")
    if k * bits > 62:
        raise ValueError(
            f"zorder_value: {k} cols x {bits} bits = {k * bits} bits "
            "exceeds a BIGINT; lower bits"
        )
    mask = (1 << bits) - 1
    cexprs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint").bitwiseAND(mask)
        for c in cols
    ]
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, ce in enumerate(cexprs):
            # ((x >> b) & 1) << (b*k + i) — literal shift counts, so
            # F.shiftleft/shiftright apply directly (column shift counts
            # would need F.expr; CLAUDE.md trap)
            z = z + F.shiftleft(
                F.shiftright(ce, b).bitwiseAND(1), b * k + i
            )
    return z


def zorder_value_sql(col_sqls: list[str], bits: int = 8) -> str:
    """The DuckDB spelling of `zorder_value` over the given column SQL
    expressions — one shared recipe renders both engines so the oracle
    cannot drift from the implementation."""
    mask = (1 << bits) - 1
    k = len(col_sqls)
    terms = []
    for b in range(bits):
        for i, cs in enumerate(col_sqls):
            terms.append(
                f"(((CAST({cs} AS BIGINT) & {mask}) >> {b}) & 1) "
                f"<< {b * k + i}"
            )
    return "(" + " + ".join(f"({t})" for t in terms) + ")"


def _bucket_rank(col, cuts: list[float]):
    """Bucket id in [0, len(cuts)] of `col` against sorted cut points:
    the count of cuts strictly below the value, as ONE aggregate over a
    broadcast literal array (no join, no sort; NULLs rank 0 — they
    cluster together at the curve origin, which is what stats-based
    skipping wants)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.array(*[F.lit(float(x)) for x in cuts]),
        F.lit(0).cast("bigint"),
        lambda acc, cut: acc + F.when(c.cast("double") > cut, 1).otherwise(0),
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    n_files: int | None = None,
    rel_err: float = 0.01,
) -> None:
    """Rewrite `df` to `path` clustered on the Morton curve of `cols`:

    1. ONE percentile_approx pass computes 2^bits - 1 quantile cuts per
       column (a single small agg job; cuts broadcast as literals).
    2. Each row's per-column bucket ranks interleave via `zorder_value`.
    3. repartitionByRange on the z-value + in-partition sort orders the
       write so every output file covers a contiguous curve segment —
       tight min/max stats on EVERY participating column.

    `n_files` defaults to the session shuffle partitioning. The z column
    is internal and not written."""
    reserved = {"_z"} | {f"_zr{i}" for i in range(len(cols))}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"zorder_layout: column(s) {sorted(clash)} collide with "
            "internal names; rename them first"
        )
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    cuts_row = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(p) for p in probs]),
                F.lit(max(100, int(1.0 / rel_err))),
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]
    ranks = [
        _bucket_rank(c, [x for x in (cuts_row[c] or []) if x is not None])
        for c in cols
    ]
    # let-bind the rank aggregates as real columns BEFORE interleaving:
    # zorder_value references each input `bits` times, and HOF subtrees
    # are not CSE'd — inlining would run each O(2^bits) aggregate
    # bits x per row (CLAUDE.md HOF rule)
    bound = df.select(
        "*", *[r.alias(f"_zr{i}") for i, r in enumerate(ranks)]
    )
    zed = bound.withColumn(
        "_z",
        zorder_value(*[f"_zr{i}" for i in range(len(cols))], bits=bits),
    ).drop(*[f"_zr{i}" for i in range(len(cols))])
    n = n_files or zed.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (
        zed.repartitionByRange(int(n), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    partition_cols: tuple[str, ...] = (),
    file_col: str = "file",
) -> DataFrame:
    """Small-file compaction planner — the OPTIMIZE/rewrite-data-files
    half of table maintenance that Z-order is the clustering half of: a
    10^12-row table ingested in small batches accretes millions of
    KB-scale parquet files, and open-file overhead starts dominating
    scans. The planner assigns every file to a compaction bin of
    ~`target_bytes`: ``(*partition_cols, file, size, bin, bin_bytes,
    bin_files)`` — the executor then rewrites each bin as one file.

    Bin assignment is size-striped: files sort by (size DESC, file) in
    their partition and bin = floor(preceding-cumsum / target), so bins
    are filled consecutively and every bin except the last lands within
    one file of the target. Deterministic integer arithmetic end to
    end — the plan (not just the stats) is oracle-exact, which matters
    because a nondeterministic planner re-runs into a DIFFERENT rewrite
    after a partial failure, breaking retry idempotence.

    Scale shape: this runs on FILE METADATA (one row per file — the
    listing, not the data), so the window sort per table-partition is
    metadata-sized. Files at or above `target_bytes` get a bin of their
    own by construction (their cumsum step >= target) and can be
    filtered out by the caller via ``bin_files = 1 AND size >=
    target``.
    """
    if target_bytes <= 0:
        raise ValueError("compaction_plan: target_bytes must be positive")
    from pyspark.sql import Window

    pc = [F.col(c) for c in partition_cols]
    w = (
        Window.partitionBy(*pc)
        .orderBy(F.col("size").desc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        *pc,
        F.col(file_col),
        F.col(size_col).cast("bigint").alias("size"),
    ).withColumn(
        "_cum", F.coalesce(F.sum("size").over(w), F.lit(0).cast("bigint"))
    ).withColumn(
        "bin", F.expr(f"_cum div CAST({int(target_bytes)} AS BIGINT)")
    ).drop("_cum")
    wb = Window.partitionBy(*pc, "bin")
    return planned.withColumn(
        "bin_bytes", F.sum("size").over(wb).cast("bigint")
    ).withColumn("bin_files", F.count(F.lit(1)).over(wb).cast("bigint"))


def rendezvous_shard(
    key: Column, n_shards: int, salt: str = "hrw", portable: bool = False
) -> Column:
    """Rendezvous / highest-random-weight shard assignment (Thaler &
    Ravishankar 1998 — the consistent-routing scheme behind cache/shard
    placement): ``shard(key) = argmax_s h(key, s)``. The property mod-N
    hashing lacks and an incremental store needs: growing from S to S+1
    shards moves ONLY the keys whose new weight wins — ≈ 1/(S+1) of
    them, each moving TO the new shard — instead of reshuffling ~all
    keys the way ``pmod(hash, S) → pmod(hash, S+1)`` does. Ties break
    to the higher shard id (struct max compares (weight, shard) — the
    deterministic order both engines share).

    Narrow: one bounded HOF over ``sequence(0, S−1)`` per row, no
    shuffle. ``portable=True`` swaps xxhash64 for the shared md5 recipe
    so a DuckDB oracle replays assignments exactly
    (:func:`rendezvous_shard_sql`); keep the JVM default in production.
    """
    if n_shards < 1:
        raise ValueError(f"rendezvous_shard: n_shards={n_shards}")
    if portable:
        from xmlschemavalidator_spark.textops import portable_hash64

        def w(i):
            return portable_hash64(
                F.concat(key.cast("string"), F.lit(f":{salt}:"), i.cast("string"))
            )

    else:

        def w(i):
            return F.xxhash64(key.cast("string"), F.lit(salt), i)

    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda i: F.struct(w(i).alias("h"), i.alias("s")),
        )
    )
    return best["s"].alias("shard")


def rendezvous_shard_sql(x: str, n_shards: int, salt: str = "hrw") -> str:
    """DuckDB twin of ``rendezvous_shard(..., portable=True)``."""
    from xmlschemavalidator_spark.textops import PORTABLE_HASH64_SQL

    h = PORTABLE_HASH64_SQL.format(
        x=f"CAST({x} AS VARCHAR) || ':{salt}:' || CAST(s AS VARCHAR)"
    )
    return (
        f"list_max(list_transform(range(0, {int(n_shards)}), "
        f"s -> struct_pack(h := {h}, s := s))).s"
    )


def parquet_rowgroup_stats(
    spark, path: str, column: str
) -> DataFrame:
    """Row-group min/max statistics for one numeric column, read from
    parquet FOOTERS only (pyarrow over the file list — no data pages
    touched): ``(file, row_group, n_rows, min_value, max_value)``. The
    raw material of every data-skipping question: what fraction of row
    groups can a predicate prune? Pairs with :func:`zorder_layout` /
    :func:`compaction_plan` as the measurement half — run it before and
    after a re-layout to prove the clustering paid for itself.

    Shape: the file list is driver-side metadata (same source as a scan
    plan's file index); footer reads distribute as one task per file
    batch via mapInPandas. ``file`` is the basename — stable across
    filesystems and the DuckDB ``parquet_metadata()`` replay."""
    import os

    from pyspark.sql import functions as F  # noqa: F401 (parity with module style)

    files = sorted(spark.read.parquet(path).inputFiles())
    if not files:
        raise ValueError(f"parquet_rowgroup_stats: no files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "path string")

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for p in b["path"]:
                local = p[len("file:") :] if p.startswith("file:") else p
                pf = pq.ParquetFile(local)
                idx = pf.schema_arrow.get_field_index(column)
                md = pf.metadata
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(idx)
                    st = col.statistics
                    rows.append(
                        {
                            "file": os.path.basename(local),
                            "row_group": rg,
                            "n_rows": md.row_group(rg).num_rows,
                            "min_value": float(st.min) if st and st.has_min_max else None,
                            "max_value": float(st.max) if st and st.has_min_max else None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group", "n_rows", "min_value", "max_value"],
            )

    return fdf.mapInPandas(
        read_footers,
        "file string, row_group int, n_rows bigint, "
        "min_value double, max_value double",
    )


def skip_audit(
    stats: DataFrame, lo: float, hi: float
) -> DataFrame:
    """Data-skipping verdict for the closed predicate ``lo <= col <= hi``
    over :func:`parquet_rowgroup_stats` output: ONE row ``(n_row_groups,
    n_skippable, n_rows_total, n_rows_skippable, skip_ratio_micro)``. A
    row group is skippable when its [min, max] envelope cannot intersect
    the predicate (max < lo or min > hi) — exactly the parquet reader's
    row-group pruning rule; stat-less groups (NULL min/max) are never
    skippable. The one-number answer to "did the Z-order/sort layout
    actually buy pruning?"."""
    from pyspark.sql import functions as F

    skippable = (
        F.col("min_value").isNotNull()
        & F.col("max_value").isNotNull()
        & ((F.col("max_value") < lo) | (F.col("min_value") > hi))
    )
    return stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_row_groups"),
        F.sum(skippable.cast("long")).cast("bigint").alias("n_skippable"),
        F.sum("n_rows").cast("bigint").alias("n_rows_total"),
        F.sum(F.when(skippable, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_skippable"),
        F.expr(
            "CASE WHEN count(1) > 0 THEN"
            " sum(CASE WHEN min_value IS NOT NULL AND max_value IS NOT NULL"
            f" AND (max_value < {float(lo)!r} OR min_value > {float(hi)!r})"
            " THEN 1 ELSE 0 END) * 1000000 div count(1) END"
        )
        .cast("bigint")
        .alias("skip_ratio_micro"),
    )


def hilbert_index(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hilbert_d",
) -> DataFrame:
    """Hilbert-curve index of two bounded non-negative integer columns
    — the locality upgrade over :func:`zorder_value`: the Z curve
    teleports at bit boundaries (cell 3→4 jumps the whole quadrant),
    the Hilbert curve moves ONE cell per step, so contiguous file
    ranges cover more-compact rectangles and per-file min/max spans on
    both clustered columns shrink further (the property Databricks'
    liquid clustering moved to Hilbert for).

    The classic xy2d bit walk (MSB→LSB: quadrant digit
    q = (3·rx) XOR ry accumulates into d·4ᵇ; ry=0 levels flip-and-swap
    the frame) — every step is literal-constant integer arithmetic,
    identical in both engines, and each step's (x, y, d) are
    LET-BOUND as real columns via a chained select (the CLAUDE.md HOF
    rule: inlining would grow the expression tree ~3× per level).
    Inputs are clamped with the bit mask like zorder_value. Narrow —
    ``bits`` chained projections, zero shuffles, whole-stage codegen.
    """
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"hilbert_index: bits must be in [1, 31], got {bits}")
    reserved = {"_hx", "_hy", "_hd", out_col} & set(df.columns)
    if reserved:
        raise ValueError(
            f"hilbert_index: column(s) {sorted(reserved)} collide; rename first"
        )
    mask = (1 << bits) - 1
    passthrough = list(df.columns)
    cur = df.select(
        *passthrough,
        F.col(x_col).cast("bigint").bitwiseAND(mask).alias("_hx"),
        F.col(y_col).cast("bigint").bitwiseAND(mask).alias("_hy"),
        F.lit(0).cast("bigint").alias("_hd"),
    )
    for b in range(bits - 1, -1, -1):
        rx = F.shiftright(F.col("_hx"), b).bitwiseAND(1)
        ry = F.shiftright(F.col("_hy"), b).bitwiseAND(1)
        q = (F.lit(3).cast("bigint") * rx).bitwiseXOR(ry)
        d_new = F.col("_hd") + F.shiftleft(q, 2 * b)
        x_new = (
            F.when(ry == 1, F.col("_hx"))
            .when(rx == 1, F.lit(mask) - F.col("_hy"))
            .otherwise(F.col("_hy"))
        )
        y_new = (
            F.when(ry == 1, F.col("_hy"))
            .when(rx == 1, F.lit(mask) - F.col("_hx"))
            .otherwise(F.col("_hx"))
        )
        cur = cur.select(
            *passthrough,
            x_new.cast("bigint").alias("_hx"),
            y_new.cast("bigint").alias("_hy"),
            d_new.alias("_hd"),
        )
    return cur.select(*passthrough, F.col("_hd").alias(out_col))


def hilbert_index_sql(
    base_cte: str,
    keep_cols: list[str],
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    out_col: str = "hilbert_d",
) -> str:
    """DuckDB rendering of :func:`hilbert_index` as a chain of CTE
    steps over ``base_cte`` — one shared recipe, same literal constants
    per level, so the oracle cannot drift from the implementation.
    Returns the CTE-body text 'h0 AS (...), h1 AS (...), ...' plus the
    final select; embed as ``WITH {body}`` via :func:`str.format` —
    the last CTE is named ``h_out``."""
    mask = (1 << bits) - 1
    keep = ", ".join(keep_cols)
    parts = [
        f"h0 AS (SELECT {keep}, (CAST({x_sql} AS BIGINT) & {mask}) AS hx, "
        f"(CAST({y_sql} AS BIGINT) & {mask}) AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM {base_cte})"
    ]
    step = 0
    for b in range(bits - 1, -1, -1):
        prev = f"h{step}"
        step += 1
        rx = f"((hx >> {b}) & 1)"
        ry = f"((hy >> {b}) & 1)"
        q = f"xor(3 * {rx}, {ry})"
        parts.append(
            f"h{step} AS (SELECT {keep}, "
            f"CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 THEN {mask} - hy "
            f"ELSE hy END AS hx, "
            f"CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 THEN {mask} - hx "
            f"ELSE hx END AS hy, "
            f"hd + ({q} << {2 * b}) AS hd FROM {prev})"
        )
    parts.append(
        f"h_out AS (SELECT {keep}, hd AS {out_col} FROM h{step})"
    )
    return ",\n".join(parts)


def hilbert_layout(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    n_files: int | None = None,
    rel_err: float = 0.01,
) -> None:
    """:func:`zorder_layout`'s Hilbert sibling for exactly TWO columns:
    same percentile-cut bucket ranks (one approx-quantile pass), then
    the Hilbert index orders the repartitionByRange write — contiguous
    curve segments per file, tighter per-file min/max rectangles than
    Morton at the same bits (the teleport-free property)."""
    if len(cols) != 2:
        raise ValueError(
            f"hilbert_layout: the Hilbert walk here is 2-D; got {len(cols)} cols"
        )
    reserved = {"_hz0", "_hz1", "hilbert_d"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"hilbert_layout: column(s) {sorted(reserved)} collide; rename first"
        )
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    cuts_row = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(p) for p in probs]),
                F.lit(max(100, int(1.0 / rel_err))),
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]
    ranks = [
        _bucket_rank(c, [x for x in (cuts_row[c] or []) if x is not None])
        for c in cols
    ]
    bound = df.select(
        "*", ranks[0].alias("_hz0"), ranks[1].alias("_hz1")
    )
    hz = hilbert_index(bound, "_hz0", "_hz1", bits=bits).drop("_hz0", "_hz1")
    n = n_files or hz.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (
        hz.repartitionByRange(int(n), "hilbert_d")
        .sortWithinPartitions("hilbert_d")
        .drop("hilbert_d")
        .write.mode("overwrite")
        .parquet(path)
    )
