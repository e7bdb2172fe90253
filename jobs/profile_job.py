"""spark-submit entry point for table profiling: stats, constraint
suggestions, drift vs a baseline snapshot, and metric anomalies — the
observability companion of jobs/validate_job.py.

Usage:

    spark-submit --py-files dist/xmlschemavalidator_spark.zip \\
        jobs/profile_job.py \\
        --input /data/pages --output /data/profile_out \\
        --snapshot snap-2026-08-17 \\
        [--drift-columns n_chars,value]   # numeric columns to sketch
        [--baseline-snapshot snap-prev]   # compare against; else save only

Emits ONE JSON line: column stats summary, suggested constraints, and
(when a baseline snapshot is named) per-column drift. The sketch store
lives under <output>/baselines and is reusable by the streaming drift
monitor.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--baseline-snapshot", default=None)
    p.add_argument("--drift-columns", default="")
    p.add_argument("--synthetic-rows", type=int, default=100_000)
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName(f"profile-{args.snapshot}")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from xmlschemavalidator_spark.checks.baseline import drift_report, snapshot_baseline
    from xmlschemavalidator_spark.checks.stats import column_stats
    from xmlschemavalidator_spark.checks.suggest import suggest_rules

    if args.input:
        df = spark.read.parquet(args.input)
    else:
        from xmlschemavalidator_spark.datagen import pages

        df = pages(spark, args.synthetic_rows)

    stats = {r["column"]: r.asDict() for r in column_stats(df).collect()}
    suggestions = [
        {"column": s.column, "kind": s.kind, "detail": s.detail}
        for s in suggest_rules(df)
    ]

    drift_cols = [c for c in args.drift_columns.split(",") if c]
    baselines_path = f"{args.output}/baselines"
    drift = None
    if drift_cols:
        if args.baseline_snapshot:
            import math

            rep = drift_report(df, drift_cols, baselines_path, args.baseline_snapshot)
            # NaN -> null: json.dumps would emit a bare NaN token (invalid
            # JSON for strict consumers) for no-baseline/empty columns
            drift = [
                {
                    k: (None if isinstance(v, float) and math.isnan(v) else v)
                    for k, v in rec.items()
                }
                for rec in rep.to_dict("records")
            ]
        snapshot_baseline(df, drift_cols, baselines_path, args.snapshot)

    print(
        json.dumps(
            {
                "snapshot": args.snapshot,
                "n_columns": len(stats),
                "stats": stats,
                "suggestions": suggestions,
                "drift_vs": args.baseline_snapshot,
                "drift": drift,
            },
            default=str,
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
