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
