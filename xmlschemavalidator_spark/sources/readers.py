"""Format-agnostic table readers with schema assertion + validate-on-read.

The engine's inputs are columnar tables; these helpers pin the two things a
100 TB pipeline must get right at the source:

* **pushdown-friendly reads** — plain ``spark.read.<format>`` so Catalyst
  keeps predicate pushdown / column pruning (never an RDD detour);
* **schema contracts** — ``expect_schema`` fails fast (driver-side, before
  any job) when the table drifts from the declared contract, mirroring the
  reference's compile-time shape checks (core.clj:142-146).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xmlschemavalidator_spark.compiler import RuleSet
from xmlschemavalidator_spark.engine import ValidationResult, validate

_FORMATS = {"parquet", "json", "csv", "orc"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt``. For text formats (json/csv) an explicit
    ``schema`` avoids the full-scan inference pass — at crawl scale,
    schema inference IS a second job; always pass one."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (one of {sorted(_FORMATS)})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def expect_schema(df: DataFrame, expected: dict[str, str]) -> DataFrame:
    """Assert that ``df`` contains at least the expected (name → simple
    type) columns. Raises driver-side with a full diff — no job runs."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for name, typ in expected.items():
        if name not in actual:
            problems.append(f"missing column {name!r} ({typ})")
        elif actual[name] != typ:
            problems.append(f"column {name!r}: expected {typ}, got {actual[name]}")
    if problems:
        raise ValueError("schema contract violated: " + "; ".join(problems))
    return df


def validated_read(
    spark: SparkSession,
    path: str,
    ruleset: RuleSet,
    key: str,
    fmt: str = "parquet",
    schema: str | None = None,
    expected: dict[str, str] | None = None,
    **options,
) -> tuple[DataFrame, ValidationResult]:
    """Read + (optionally) assert the schema contract + compile-and-apply
    the ruleset: the one-call form of the engine's read path."""
    df = read_table(spark, path, fmt=fmt, schema=schema, **options)
    if expected:
        expect_schema(df, expected)
    return df, validate(df, ruleset, key=key)


def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """Iceberg table read with optional time travel — the deployment-shape
    source for the 10^12-doc table (partition values drive the manifest's
    commit key; ``snapshot_id`` is the lineage key resumable_validate
    records).

    Needs the iceberg-spark-runtime jar + a catalog config on the cluster
    (not bundled in this environment — parquet paths exercise the same
    engine paths since Iceberg IS parquet under a transactional metadata
    layer, with the same pushdown/pruning surface). Raises an actionable
    error when the runtime is absent instead of Spark's generic
    DATA_SOURCE_NOT_FOUND.
    """
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
    try:
        return reader.load(table)
    except Exception as e:  # AnalysisException or ClassNotFound wrapped
        msg = str(e)
        if "iceberg" in msg.lower() or "DATA_SOURCE_NOT_FOUND" in msg:
            raise RuntimeError(
                "Iceberg runtime not available: submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver> "
                "and configure a catalog (spark.sql.catalog.<name>=...); "
                "plain parquet paths work without it"
            ) from e
        raise
