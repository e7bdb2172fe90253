"""Row-level diff between two snapshots of a keyed table.

The validation-engine counterpart of table time travel: given the previous
and current version of a table, emit ``(key, change)`` with change in
``added | removed | changed``. Used to gate incremental revalidation (only
added/changed keys need the rule pass) and to audit unexpected churn
between Iceberg snapshots.

Scale shape: content is collapsed to ONE md5 fingerprint per row inside
the scan projection, so the full-outer join shuffles ``(key, 32-byte
fingerprint)`` — never the row payload. Unchanged rows are dropped
post-join; with sorted/bucketed tables on ``key`` the shuffle disappears
entirely (storage-partitioned join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL_TAG = "N"


def row_fingerprint(df: DataFrame, cols: list[str]) -> "F.Column":
    """Each column contributes either the fixed 32-hex md5 of its string
    value or the 1-char null tag; the concatenation is therefore
    unambiguous for ANY value content — separator-escaping schemes break
    when a value itself contains the separator (('x', 'y\\x1fz') vs
    ('x\\x1fy', 'z') collided under plain concat_ws). A requested column
    the side doesn't have reads as NULL there (schema evolution: adding a
    column makes old rows 'changed' only when explicitly compared)."""
    have = set(df.columns)
    vals = [F.col(c) if c in have else F.lit(None).cast("string") for c in cols]
    parts = [
        F.when(v.isNull(), F.lit(_NULL_TAG)).otherwise(F.md5(v.cast("string")))
        for v in vals
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """``(key, change)`` for every key that was added, removed, or whose
    compared columns changed. ``compare_cols`` defaults to every shared
    non-key column (schema evolution: columns only one side has are
    ignored unless explicitly requested)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c != key]
    o = old.select(F.col(key).alias("_ko"), row_fingerprint(old, compare_cols).alias("_fp_old"))
    n = new.select(F.col(key).alias("_kn"), row_fingerprint(new, compare_cols).alias("_fp_new"))
    # null-safe key equality: a NULL key row would otherwise always appear
    # as removed+added even when its content is unchanged
    joined = o.join(n, o["_ko"].eqNullSafe(n["_kn"]), "full_outer")
    present_old = F.col("_ko").isNotNull() | F.col("_fp_old").isNotNull()
    present_new = F.col("_kn").isNotNull() | F.col("_fp_new").isNotNull()
    change = (
        F.when(~present_old, F.lit("added"))
        .when(~present_new, F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(F.coalesce("_ko", "_kn").alias(key), "change")
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Column-level drift between two snapshots: added / removed /
    type-changed columns, driver-side (schemas only — no job runs). The
    companion gate to the row-level diff: a type change means the rule
    compiler's try_cast probes may silently change meaning, so surface it
    BEFORE validating."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out: list[dict] = []
    for c in sorted(set(o) | set(n)):
        if c not in o:
            out.append({"column": c, "change": "added", "type": n[c]})
        elif c not in n:
            out.append({"column": c, "change": "removed", "type": o[c]})
        elif o[c] != n[c]:
            out.append(
                {"column": c, "change": "type_changed", "type": f"{o[c]} -> {n[c]}"}
            )
    return out


def diff_summary(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Counts per change type — the one-line churn gate."""
    return (
        snapshot_diff(old, new, key)
        .groupBy("change")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("change")
    )
