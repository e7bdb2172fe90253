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


# ---------------------------------------------------------------------------
# Semi-structured (JSON) path profiling — schema-on-read validation for
# the payload columns a fixed StructType can't see (event props, API
# blobs, crawler metadata). Deequ's containsJsonPath asks "is the path
# there"; this asks "there, and of what type, how often" — the drift
# input for JSON contracts. Spark 4 VARIANT (parse_json /
# schema_of_variant) supplies real per-value types; the DuckDB twin
# normalizes json_type() into the same class vocabulary, so profiles
# hash match cross-engine.
# ---------------------------------------------------------------------------

#: normalized JSON type classes shared by both engines
JSON_CLASSES = (
    "no_value", "invalid", "missing", "null",
    "string", "boolean", "number", "object", "array",
)


def _json_class_col(json_col: str, path: str):
    from pyspark.sql import functions as F

    s = F.schema_of_variant(
        F.try_variant_get(F.try_parse_json(F.col(json_col)), path, "variant")
    )
    return (
        F.when(F.col(json_col).isNull(), F.lit("no_value"))
        .when(F.try_parse_json(F.col(json_col)).isNull(), F.lit("invalid"))
        .when(s.isNull(), F.lit("missing"))
        .when(s == "VOID", F.lit("null"))
        .when(s == "STRING", F.lit("string"))
        .when(s == "BOOLEAN", F.lit("boolean"))
        .when(s.startswith("OBJECT"), F.lit("object"))
        .when(s.startswith("ARRAY"), F.lit("array"))
        .otherwise(F.lit("number"))
    )


def _json_class_sql(json_expr: str, path: str) -> str:
    return f"""CASE WHEN {json_expr} IS NULL THEN 'no_value'
      WHEN NOT json_valid({json_expr}) THEN 'invalid'
      WHEN json_type({json_expr}, '{path}') IS NULL THEN 'missing'
      WHEN json_type({json_expr}, '{path}') = 'NULL' THEN 'null'
      WHEN json_type({json_expr}, '{path}') = 'VARCHAR' THEN 'string'
      WHEN json_type({json_expr}, '{path}') = 'BOOLEAN' THEN 'boolean'
      WHEN json_type({json_expr}, '{path}') = 'OBJECT' THEN 'object'
      WHEN json_type({json_expr}, '{path}') = 'ARRAY' THEN 'array'
      ELSE 'number' END"""


def json_path_profile(
    df: DataFrame, json_col: str, paths: list[str]
) -> DataFrame:
    """Type histogram per declared JSON path → ``(path, type_class,
    n)``; classes are :data:`JSON_CLASSES` (``no_value`` = SQL NULL
    column, ``invalid`` = unparseable text, ``missing`` = path absent,
    ``null`` = JSON null — four distinct failure modes a contract
    check must not conflate).

    Scale shape: ONE scan — every path's class is computed in the same
    projection and exploded as |paths| struct rows per input row, then
    one partial-aggregatable groupBy bounded by |paths|×9 cells. The
    VARIANT parse appears once per path in the plan but Catalyst CSEs
    scalar (non-HOF) subtrees; |paths| is a declared handful by
    contract."""
    from pyspark.sql import functions as F

    if not paths:
        raise ValueError("json_path_profile: need at least one path")
    entries = F.array(
        *[
            F.struct(
                F.lit(p).alias("path"),
                _json_class_col(json_col, p).alias("type_class"),
            )
            for p in paths
        ]
    )
    return (
        df.select(F.explode(entries).alias("e"))
        .select("e.path", "e.type_class")
        .groupBy("path", "type_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def json_path_profile_sql(
    from_sql: str, json_expr: str, paths: list[str]
) -> str:
    """DuckDB replay of :func:`json_path_profile`."""
    branches = " UNION ALL ".join(
        f"SELECT '{p}' AS path, {_json_class_sql(json_expr, p)} AS type_class "
        f"FROM ({from_sql})"
        for p in paths
    )
    return (
        f"SELECT path, type_class, CAST(count(*) AS BIGINT) AS n FROM "
        f"({branches}) GROUP BY 1, 2"
    )


def json_type_check(
    df: DataFrame,
    json_col: str,
    path: str,
    allowed: tuple[str, ...],
    id_col: str,
    rule_id: str | None = None,
) -> DataFrame:
    """Enforcement half: violation rows ``(id, rule_id,
    observed_value)`` for every row whose path class is not in
    ``allowed`` — the JSON contract in the engine's standard violation
    shape (observed_value carries the offending class). Narrow
    filter+projection, no shuffle."""
    from pyspark.sql import functions as F

    bad = set(allowed) - set(JSON_CLASSES)
    if bad:
        raise ValueError(f"json_type_check: unknown classes {sorted(bad)}")
    rid = rule_id or f"json_{path}_type"
    cls = _json_class_col(json_col, path)
    return (
        df.select(
            F.col(id_col),
            F.lit(rid).alias("rule_id"),
            cls.alias("observed_value"),
        )
        .where(~F.col("observed_value").isin(*allowed))
    )
