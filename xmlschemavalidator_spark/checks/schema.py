"""Schema-evolution compatibility check: what changed between two
snapshots' schemas, and is the change read-compatible?

The upstream-broke-the-contract detector: a crawler release renames a
column, widens a type, or starts emitting NULLs into a previously
required field — the earliest possible catch is a metadata-only compare
of the new snapshot's schema against the served baseline, BEFORE any
data job runs. Pure driver-side StructType comparison: zero jobs, zero
scans — it must stay runnable as a pre-flight gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# changes a reader of the OLD schema survives when handed NEW data
_COMPATIBLE = {"column_added", "nullable_relaxed"}


def schema_changes(old: DataFrame, new: DataFrame) -> list[dict]:
    """List of change records between two DataFrames' schemas:
    ``{column, change, old, new, compatible}`` where change is one of
    column_added / column_removed / type_changed / nullable_relaxed /
    nullable_tightened. Empty list = identical schemas. Order: by
    column name, then change kind — deterministic for manifests."""
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for name in sorted(set(o) | set(n)):
        if name not in n:
            out.append(
                {"column": name, "change": "column_removed",
                 "old": o[name].dataType.simpleString(), "new": None}
            )
            continue
        if name not in o:
            out.append(
                {"column": name, "change": "column_added",
                 "old": None, "new": n[name].dataType.simpleString()}
            )
            continue
        fo, fn = o[name], n[name]
        if fo.dataType != fn.dataType:
            out.append(
                {"column": name, "change": "type_changed",
                 "old": fo.dataType.simpleString(),
                 "new": fn.dataType.simpleString()}
            )
        if fo.nullable != fn.nullable:
            out.append(
                {"column": name,
                 "change": "nullable_relaxed" if fn.nullable else "nullable_tightened",
                 "old": str(fo.nullable), "new": str(fn.nullable)}
            )
    for rec in out:
        rec["compatible"] = rec["change"] in _COMPATIBLE
    return out


def schema_compat(old: DataFrame, new: DataFrame) -> DataFrame:
    """:func:`schema_changes` as a DataFrame ``(column, change, old,
    new, compatible)`` — so the check lands in the same report/manifest
    sinks as every other check. Built from a driver-side list (the
    whole point is that no job runs)."""
    spark = old.sparkSession
    rows = [
        (r["column"], r["change"], r["old"], r["new"], r["compatible"])
        for r in schema_changes(old, new)
    ]
    return spark.createDataFrame(
        rows,
        "column string, change string, old string, new string, compatible boolean",
    )
