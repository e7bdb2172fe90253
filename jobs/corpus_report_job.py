"""spark-submit entry for the corpus analysis report.

    spark-submit --py-files dist/xmlschemavalidator_spark.zip \\
        jobs/corpus_report_job.py --input <docs.parquet> --output <dir>

Writes the per_doc / summary / per_lang / repetition panels under
--output and prints the panel row counts as one JSON line.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName("corpus-report")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from xmlschemavalidator_spark.report import write_report

    counts = write_report(spark.read.parquet(args.input), args.id_col, args.output)
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
