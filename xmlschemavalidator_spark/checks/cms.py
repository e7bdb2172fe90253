"""Count-Min sketch — mergeable fixed-memory frequency estimation
(Cormode & Muthukrishnan, J. Algorithms 2005).

The sketch IS a DataFrame: ``(i, bucket, c)`` cells, at most
``depth × width`` rows regardless of corpus size. That makes it

* **mergeable** — union + groupBy-sum (:func:`cms_merge`), so
  per-batch / per-partition sketches combine associatively (the same
  property the HLL registers and t-digest centroids here rely on);
* **persistable** — write the cell table next to a batch's manifest and
  fold the next crawl day in without re-reading history;
* **queryable in-plan** — :func:`cms_estimate` answers a probe list
  with one broadcast join against the cells, never a corpus scan.

Estimates overestimate only (min over ``depth`` counters, each inflated
by collisions): ``true ≤ est ≤ true + εN`` w.h.p. with ``ε = e/width``.
A validation engine uses it where exact ``groupBy(value)`` is the wrong
plan: frequency probes over unbounded-cardinality columns (tokens,
URLs, user agents) at 10^12 rows, where the exact agg would shuffle the
full column but the sketch is one map-side-combined agg into d×w cells.

Hashes are the repo's ONE portable recipe (textops.portable_hash64 /
PORTABLE_HASH64_SQL) with the row index spliced into the input, so a
DuckDB replay builds the bit-identical sketch and the driver oracle is
exact — not a statistical bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.textops import PORTABLE_HASH64_SQL, portable_hash64

__all__ = ["cms_build", "cms_merge", "cms_estimate", "cms_sql", "cms_estimate_sql"]


def _cell(value_col, i: int, width: int):
    """Bucket of ``value_col`` in hash row ``i`` — row index spliced into
    the hash input (one hash family, d independent rows)."""
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"{i}:"), value_col)), F.lit(width)
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Sketch the frequencies of ``df[col]`` (one count per ROW — explode
    upstream for token-level counting). Returns the ``(i, bucket, c)``
    cell table, ≤ depth×width rows.

    Scale shape: one narrow projection builds the d cells per row inside
    an array (values NULL-dropped like every hash family here), one
    explode, one groupBy with map-side combine into at most d×w groups —
    the shuffle carries (i, bucket) pairs, never values."""
    if depth < 1 or width < 2:
        raise ValueError(f"cms_build: bad depth={depth} width={width}")
    v = F.col(col).cast("string")
    cells = df.where(v.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _cell(v, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_c")
    )
    return cells.groupBy(
        F.col("_c.i").alias("i"), F.col("_c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Point-wise sum of two sketches (same depth/width — cell coords
    outside the partner's range simply never collide, so mismatched
    sketches are the caller's bug, not detectable here)."""
    return (
        a.unionByName(b)
        .groupBy("i", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, values: list[str], depth: int = 4, width: int = 1024
) -> DataFrame:
    """``(value, est)`` for each probe — min over the d counters, 0 when
    every cell is missing (a value the sketch never saw can still
    collide upward, never downward). One broadcast join of the tiny
    probe×depth frame against the cell table; no corpus anywhere."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame([(x,) for x in values], "value string")
    cells = probes.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cell(F.col("value"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_c"),
    ).select("value", F.col("_c.i").alias("i"), F.col("_c.bucket").alias("bucket"))
    joined = F.broadcast(cells).join(sketch, ["i", "bucket"], "left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est")
    )


def _cell_sql(x: str, i_expr: str, width: int) -> str:
    """DuckDB twin of :func:`_cell` — ``i_expr`` is the SQL expression for
    the hash-row index (a literal or a joined column)."""
    h = PORTABLE_HASH64_SQL.format(x=f"{i_expr} || ':' || {x}")
    return f"(({h} % {width}) + {width}) % {width}"


_I_EXPR = "CAST(d.i AS VARCHAR)"


def cms_sql(source_sql: str, depth: int = 4, width: int = 1024) -> str:
    """DuckDB replay of :func:`cms_build` over ``source_sql`` (a query
    yielding one column ``v``) — bit-identical cell table."""
    rows = ", ".join(f"({i})" for i in range(depth))
    return f"""WITH src AS ({source_sql}),
cells AS (
  SELECT d.i AS i, {_cell_sql("CAST(src.v AS VARCHAR)", _I_EXPR, width)} AS bucket
  FROM src CROSS JOIN (VALUES {rows}) AS d(i)
  WHERE src.v IS NOT NULL
)
SELECT i, bucket, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY i, bucket"""


def cms_estimate_sql(
    source_sql: str, values: list[str], depth: int = 4, width: int = 1024
) -> str:
    """DuckDB replay of build+estimate for a probe list — exact."""
    sketch = cms_sql(source_sql, depth, width)
    vals = ", ".join("('" + x.replace("'", "''") + "')" for x in values)
    rows = ", ".join(f"({i})" for i in range(depth))
    return f"""WITH sk AS ({sketch}),
probes AS (SELECT v FROM (VALUES {vals}) AS p(v)),
pcells AS (
  SELECT probes.v AS value, d.i AS i,
         {_cell_sql("CAST(probes.v AS VARCHAR)", _I_EXPR, width)} AS bucket
  FROM probes CROSS JOIN (VALUES {rows}) AS d(i)
)
SELECT value, CAST(min(coalesce(sk.c, 0)) AS BIGINT) AS est
FROM pcells LEFT JOIN sk USING (i, bucket)
GROUP BY value"""
