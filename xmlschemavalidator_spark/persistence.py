"""Shared model persistence: parquet part tables + a single-row
``meta_json`` parquet, all through the Spark writer so a model saves to
whatever storage the session reaches (HDFS/S3/local alike — no
driver-local filesystem assumption).

One implementation for every trained-model dataclass (NB quality model,
bigram LM, DSIR importance weights, BPE) — review finding: four hand
copies of the same boilerplate could not be fixed in one place.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def save_model(
    path: str,
    meta: dict,
    parts: dict[str, DataFrame],
    coalesce_parts: bool = True,
) -> None:
    """Write each part table to ``{path}/{name}`` and ``meta`` as a
    one-row json parquet to ``{path}/meta``. ``coalesce_parts`` packs each
    part into one file — right for the bounded tables models carry
    (weights ≤ n_buckets rows, segmentations ≤ max_words); pass False for
    parts that are genuinely large."""
    spark = next(iter(parts.values())).sparkSession
    for name, df in parts.items():
        out = df.repartition(1) if coalesce_parts else df
        out.write.mode("overwrite").parquet(f"{path}/{name}")
    spark.createDataFrame(
        [(json.dumps(meta),)], "meta_json string"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_meta(spark: SparkSession, path: str) -> dict:
    return json.loads(
        spark.read.parquet(f"{path}/meta").collect()[0]["meta_json"]
    )


def load_part(spark: SparkSession, path: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{name}")
