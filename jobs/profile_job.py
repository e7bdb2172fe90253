"""spark-submit entry point for table profiling: stats, constraint
suggestions, drift vs a baseline snapshot, and the analyzer family
(moments, Benford, entropy, correlation, functional dependencies,
categorical chi-squared) — the observability companion of
jobs/validate_job.py.

Usage:

    spark-submit --py-files dist/xmlschemavalidator_spark.zip \\
        jobs/profile_job.py \\
        --input /data/pages --output /data/profile_out \\
        --snapshot snap-2026-08-17 \\
        [--drift-columns n_chars,value]   # numeric columns to sketch
        [--baseline-snapshot snap-prev]   # compare against; else save only
        [--moments-columns value]         # 4-moment shape profile
        [--benford-columns value]         # first-digit audit
        [--entropy-columns lang]          # Shannon entropy
        [--corr-pairs qty:price]          # exact Pearson r
        [--fd 'order_id->customer']       # FD violating-key counts
        [--chi2-columns lang]             # categorical drift store+compare

Emits ONE JSON line. The numeric sketch store lives under
<output>/baselines (reused by the streaming drift monitor); categorical
histograms go under <output>/baselines/categorical/<snapshot>/<col>.

Testable core: :func:`run_profile` (the CLI is a thin wrapper — the
corpus_pipeline_job convention, so tests never spark.stop() the shared
session).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession


def run_profile(
    spark: SparkSession,
    df: DataFrame,
    output: str,
    snapshot: str,
    baseline_snapshot: str | None = None,
    drift_columns: tuple[str, ...] = (),
    moments_columns: tuple[str, ...] = (),
    benford_columns: tuple[str, ...] = (),
    entropy_columns: tuple[str, ...] = (),
    corr_pairs: tuple[str, ...] = (),
    fd_specs: tuple[str, ...] = (),
    chi2_columns: tuple[str, ...] = (),
    privacy_quasi: tuple[str, ...] = (),
    privacy_k: int = 5,
    gini_specs: tuple[str, ...] = (),
    jackknife_specs: tuple[str, ...] = (),
    wq_specs: tuple[str, ...] = (),
    cfd_specs: tuple[str, ...] = (),
    json_specs: tuple[str, ...] = (),
    cramers_pairs: tuple[str, ...] = (),
    richness_specs: tuple[str, ...] = (),
    mh_specs: tuple[str, ...] = (),
) -> dict:
    """Profile ``df`` and return the report dict (what main() prints as
    JSON). Each analyzer is opt-in by listing columns; every one is a
    bounded collect (1-row or #categories/#digits-sized results — never
    corpus-sized)."""
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.baseline import (
        drift_report,
        snapshot_baseline,
    )
    from xmlschemavalidator_spark.checks.stats import column_stats
    from xmlschemavalidator_spark.checks.suggest import suggest_rules

    stats = {r["column"]: r.asDict() for r in column_stats(df).collect()}
    suggestions = [
        {"column": s.column, "kind": s.kind, "detail": s.detail}
        for s in suggest_rules(df)
    ]

    baselines_path = f"{output}/baselines"
    drift = None
    if drift_columns:
        if baseline_snapshot:
            import math

            rep = drift_report(
                df, list(drift_columns), baselines_path, baseline_snapshot
            )
            # NaN -> null: json.dumps would emit a bare NaN token (invalid
            # JSON for strict consumers) for no-baseline/empty columns
            drift = [
                {
                    k: (None if isinstance(v, float) and math.isnan(v) else v)
                    for k, v in rec.items()
                }
                for rec in rep.to_dict("records")
            ]
        snapshot_baseline(df, list(drift_columns), baselines_path, snapshot)

    extras: dict = {}
    if moments_columns:
        from xmlschemavalidator_spark.checks.stats import moments_profile

        extras["moments"] = {
            c: moments_profile(df, c).collect()[0].asDict()
            for c in moments_columns
        }
    if benford_columns:
        from xmlschemavalidator_spark.checks.drift import benford_first_digit

        extras["benford"] = {
            c: [r.asDict() for r in benford_first_digit(df, c).collect()]
            for c in benford_columns
        }
    if entropy_columns:
        from xmlschemavalidator_spark.checks.stats import categorical_entropy

        extras["entropy"] = {
            c: categorical_entropy(df, c).collect()[0].asDict()
            for c in entropy_columns
        }
    if corr_pairs:
        from xmlschemavalidator_spark.checks.stats import pearson_correlation

        extras["correlation"] = {}
        for pair in corr_pairs:
            x, y = pair.split(":", 1)
            extras["correlation"][pair] = (
                pearson_correlation(df, x, y).collect()[0].asDict()
            )
    if fd_specs:
        from xmlschemavalidator_spark.checks.fd import fd_violating_keys

        extras["fd"] = {}
        for spec in fd_specs:
            lhs_s, rhs = spec.split("->", 1)
            bad = fd_violating_keys(df, lhs_s.split("+"), rhs)
            agg = bad.agg(
                F.count(F.lit(1)).alias("nk"),
                F.coalesce(F.sum("n_rows"), F.lit(0)).alias("nr"),
            ).collect()[0]
            extras["fd"][spec] = {
                "n_violating_keys": agg["nk"],
                "n_rows_affected": agg["nr"],
            }
    if chi2_columns:
        from xmlschemavalidator_spark.checks.drift import (
            categorical_histogram,
            chi_squared_drift,
        )

        cat_root = f"{baselines_path}/categorical"
        extras["chi2"] = {}
        for c in chi2_columns:
            hist = categorical_histogram(df, c)
            if baseline_snapshot:
                # a column with no stored categorical baseline (first
                # adoption / newly-added chi2 column) degrades to a
                # no-baseline record — the numeric drift path's NaN
                # convention — instead of killing the whole job before
                # the report and the new snapshot are written
                from pyspark.errors import AnalysisException

                try:
                    base = spark.read.parquet(
                        f"{cat_root}/{baseline_snapshot}/{c}"
                    )
                except AnalysisException:
                    extras["chi2"][c] = {"chi2": None, "error": "no_baseline"}
                else:
                    # ONLY the read is guarded: a drift-computation
                    # failure (e.g. an incompatible stored baseline
                    # schema) must surface, not masquerade as
                    # no_baseline
                    extras["chi2"][c] = (
                        chi_squared_drift(hist, base).collect()[0].asDict()
                    )
            # snapshot AFTER the compare (the new baseline for next run)
            hist.write.mode("overwrite").parquet(f"{cat_root}/{snapshot}/{c}")

    if privacy_quasi:
        from xmlschemavalidator_spark.checks.privacy import k_anonymity_summary

        extras["privacy"] = (
            k_anonymity_summary(df, list(privacy_quasi), k=privacy_k)
            .collect()[0]
            .asDict()
        )
    if gini_specs:
        from xmlschemavalidator_spark.checks.stats import gini_coefficient

        extras["gini"] = {}
        for spec in gini_specs:
            value_col, gid = spec.split(":", 1)
            extras["gini"][spec] = (
                gini_coefficient(df, value_col, gid).collect()[0].asDict()
            )
    if jackknife_specs:
        from xmlschemavalidator_spark.checks.stats import jackknife_ratio

        extras["jackknife"] = {}
        for spec in jackknife_specs:
            num, den, jid = spec.split(":", 2)
            extras["jackknife"][spec] = (
                jackknife_ratio(df, num, den, id_col=jid).collect()[0].asDict()
            )
    if wq_specs:
        from xmlschemavalidator_spark.checks.stats import weighted_quantile

        extras["weighted_quantiles"] = {}
        for spec in wq_specs:
            value_col, weight_col, wid = spec.split(":", 2)
            extras["weighted_quantiles"][spec] = [
                r.asDict()
                for r in weighted_quantile(
                    df, value_col, weight_col, wid, qs_pct=(25, 50, 75)
                ).collect()
            ]
    if cfd_specs:
        from xmlschemavalidator_spark.checks.fd import fd_condition_scan

        extras["cfd"] = {}
        for spec in cfd_specs:
            cond, lhs, rhs = spec.split(":", 2)
            extras["cfd"][spec] = [
                r.asDict()
                for r in fd_condition_scan(
                    df, cond, lhs.split("+"), rhs
                ).collect()
            ]
    if json_specs:
        from xmlschemavalidator_spark.checks.schema import json_path_profile

        extras["json_paths"] = {}
        for spec in json_specs:
            col, paths = spec.split(":", 1)
            extras["json_paths"][spec] = [
                r.asDict()
                for r in json_path_profile(df, col, paths.split("|")).collect()
            ]

    if cramers_pairs:
        from xmlschemavalidator_spark.checks.stats import cramers_v

        extras["cramers_v"] = {}
        for pair in cramers_pairs:
            x, y = pair.split(":", 1)
            extras["cramers_v"][pair] = (
                cramers_v(df, x, y).collect()[0].asDict()
            )
    if richness_specs:
        from xmlschemavalidator_spark.checks.stats import species_richness

        extras["richness"] = {}
        for spec in richness_specs:
            key, _, grp = spec.partition(":")
            out = species_richness(df, key, (grp,) if grp else ())
            extras["richness"][spec] = [r.asDict() for r in out.collect()]
    if mh_specs:
        from xmlschemavalidator_spark.checks.stats import mantel_haenszel

        extras["mantel_haenszel"] = {}
        for spec in mh_specs:
            e, o, st = spec.split(":", 2)
            extras["mantel_haenszel"][spec] = (
                mantel_haenszel(df, e, o, st).collect()[0].asDict()
            )

    return {
        "snapshot": snapshot,
        "n_columns": len(stats),
        "stats": stats,
        "suggestions": suggestions,
        "drift_vs": baseline_snapshot,
        "drift": drift,
        **extras,
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--baseline-snapshot", default=None)
    p.add_argument("--drift-columns", default="")
    p.add_argument(
        "--moments-columns", default="",
        help="numeric columns for the four-moment profile "
        "(mean/variance/skewness/kurtosis — shape drift at constant mean)",
    )
    p.add_argument(
        "--benford-columns", default="",
        help="positive numeric columns for the first-digit Benford audit",
    )
    p.add_argument(
        "--entropy-columns", default="",
        help="categorical columns for the Shannon-entropy analyzer",
    )
    p.add_argument(
        "--corr-pairs", default="",
        help="x:y pairs (comma-separated) for exact Pearson correlation",
    )
    p.add_argument(
        "--fd", default="",
        help="functional dependencies lhs->rhs (comma-separated; "
        "lhs may be +-joined) — reports violating-key counts",
    )
    p.add_argument(
        "--chi2-columns", default="",
        help="categorical columns snapshotted for chi-squared drift; "
        "compared when --baseline-snapshot is set",
    )
    p.add_argument(
        "--privacy-quasi", default="",
        help="quasi-identifier columns for the k-anonymity release gate",
    )
    p.add_argument("--privacy-k", type=int, default=5)
    p.add_argument(
        "--gini", default="",
        help="value:id specs (comma-separated) for the Gini concentration "
        "coefficient",
    )
    p.add_argument(
        "--jackknife", default="",
        help="num:den:id specs (comma-separated) for delete-one-bucket "
        "jackknife ratio CIs",
    )
    p.add_argument(
        "--weighted-quantiles", default="",
        help="value:weight:id specs (comma-separated) for exact weighted "
        "25/50/75 quantiles (the 'middle weight unit' view)",
    )
    p.add_argument(
        "--cfd", default="",
        help="cond:lhs:rhs specs (comma-separated; lhs may be +-joined) "
        "for conditional-FD scope scans — which condition values make "
        "the FD hold",
    )
    p.add_argument(
        "--json-paths", default="",
        help="col:$.a|$.b specs (comma-separated) for semi-structured "
        "path/type profiling",
    )
    p.add_argument(
        "--cramers-pairs", default="",
        help="x:y categorical pairs (comma-separated) for Cramér's V "
        "association — bounded [0,1], comparable across pairs",
    )
    p.add_argument(
        "--richness", default="",
        help="key[:group] specs (comma-separated) for Good–Turing "
        "coverage + Chao1 richness (crawl/vocabulary saturation)",
    )
    p.add_argument(
        "--mantel-haenszel", default="",
        help="exposure:outcome:stratum specs (comma-separated, boolean "
        "e/o) for the confounder-adjusted pooled odds ratio + CMH test",
    )
    p.add_argument("--synthetic-rows", type=int, default=100_000)
    args = p.parse_args(argv)

    spark = (
        SparkSession.builder.appName(f"profile-{args.snapshot}")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    if args.input:
        df = spark.read.parquet(args.input)
    else:
        from xmlschemavalidator_spark.datagen import pages

        df = pages(spark, args.synthetic_rows)

    def _cols(arg: str) -> tuple[str, ...]:
        return tuple(c for c in arg.split(",") if c)

    report = run_profile(
        spark,
        df,
        output=args.output,
        snapshot=args.snapshot,
        baseline_snapshot=args.baseline_snapshot,
        drift_columns=_cols(args.drift_columns),
        moments_columns=_cols(args.moments_columns),
        benford_columns=_cols(args.benford_columns),
        entropy_columns=_cols(args.entropy_columns),
        corr_pairs=_cols(args.corr_pairs),
        fd_specs=_cols(args.fd),
        chi2_columns=_cols(args.chi2_columns),
        privacy_quasi=_cols(args.privacy_quasi),
        privacy_k=args.privacy_k,
        gini_specs=_cols(args.gini),
        jackknife_specs=_cols(args.jackknife),
        wq_specs=_cols(args.weighted_quantiles),
        cfd_specs=_cols(args.cfd),
        json_specs=_cols(args.json_paths),
        cramers_pairs=_cols(args.cramers_pairs),
        richness_specs=_cols(args.richness),
        mh_specs=_cols(args.mantel_haenszel),
    )
    print(json.dumps(report, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
