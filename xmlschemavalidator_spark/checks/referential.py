"""Referential-integrity checks: fact keys must exist in a dimension.

Join strategy is explicit (north rule: "referential checks via broadcast or
shuffle hash join against dimension tables"):

* ``strategy="broadcast"`` — small dims ship to every executor; the anti
  join is a narrow map-side probe, NO shuffle of the 100 TB fact side;
* ``strategy="shuffle_hash"`` — dims too big to broadcast; hint shuffle-hash
  so Spark hashes the (smaller) dim side instead of sort-merging the fact;
* ``strategy="auto"`` — let AQE decide (it converts to broadcast at runtime
  when the dim's actual size is under the threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    strategy: str = "broadcast",
    rule_id: str | None = None,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` has no match in ``dim.dim_key``.

    ONE scan of the (huge) fact side: a LEFT OUTER join against the distinct
    dim keys decorated with a hit marker, keeping rows where the marker is
    null. This covers NULL fact keys too (null join keys never match → the
    marker stays null → violation) — a plain LEFT ANTI would silently pass
    them, and anti+union-of-nulls would scan the fact table twice.
    """
    keys = (
        dim.select(F.col(dim_key).alias(fact_key))
        .where(F.col(dim_key).isNotNull())
        .distinct()
        .withColumn("_ref_hit", F.lit(1))
    )
    if strategy == "broadcast":
        keys = F.broadcast(keys)
    elif strategy == "shuffle_hash":
        keys = keys.hint("shuffle_hash")
    elif strategy != "auto":
        raise ValueError(f"unknown strategy {strategy!r}")
    out = (
        fact.join(keys, on=fact_key, how="left")
        .where(F.col("_ref_hit").isNull())
        .drop("_ref_hit")
    )
    if rule_id is not None:
        out = out.select(
            F.col(fact_key).cast("string").alias("key"),
            F.lit(rule_id).alias("rule_id"),
            F.col(fact_key).cast("string").alias("observed_value"),
        )
    return out


def referential_violation_counts(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str,
    strategy: str = "broadcast",
) -> DataFrame:
    """Aggregated form: ``(fact_key, n)`` per missing key — the shape used
    for reporting/alerting where per-row output would be huge."""
    v = referential_violations(fact, fact_key, dim, dim_key, strategy=strategy)
    return v.groupBy(fact_key).agg(F.count(F.lit(1)).alias("n"))
