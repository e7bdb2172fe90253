"""Corpus analysis report — the Dolma-style "know your data" artifact a
pipeline publishes alongside the corpus itself: one per-doc signal pass,
then cheap aggregations into per-language and whole-corpus panels.

Scale shape: ALL per-doc signals (tokens, quality, lang-id, repetition
inputs, PII, license tags, script fractions) ride ONE projection over one
corpus scan (everything is a narrow Column op); the repetition fractions
are the exception (their own explode+groupBy pass, bounded shuffles). The
panels are tiny aggregates of that frame — a full report is ~2 corpus
scans regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.textops import (
    gopher_pass,
    gopher_repetition_signals,
    license_signals,
    pii_counts,
    quality_score,
    script_signals,
    token_count,
)


def per_doc_signals(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Every per-doc signal in ONE projection: ``(doc, n_chars, n_tokens,
    quality, gopher_keep, n_email/n_phone/n_ipv4, has_* license tags,
    frac_* script fractions)`` plus passthrough ``lang`` when present."""
    t = F.col(text_col)
    cols = {
        "n_chars": F.length(F.coalesce(t, F.lit(""))),
        "n_tokens": token_count(t),
        "quality": F.round(quality_score(t), 6),
        "gopher_keep": gopher_pass(t),
        **pii_counts(t),
        **license_signals(t),
        **script_signals(t),
    }
    keep = [F.col(id_col).alias("doc")]
    if "lang" in df.columns:
        keep.append(F.col("lang"))
    return df.select(*keep, *[v.alias(k) for k, v in cols.items()])


def corpus_report(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> dict[str, DataFrame]:
    """The report panels: ``per_doc`` (the signal frame), ``summary``
    (one row of corpus-level aggregates), ``per_lang`` (the same panel
    grouped by language, when a ``lang`` column exists), ``repetition``
    (per-doc Gopher duplicate-line/paragraph fractions)."""
    per_doc = per_doc_signals(df, id_col, text_col)

    def panel(grouped):
        return grouped.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
            F.round(F.avg(F.col("gopher_keep").cast("double")), 6).alias(
                "gopher_keep_rate"
            ),
            F.sum("n_email").alias("n_email"),
            F.sum("n_phone").alias("n_phone"),
            F.sum("n_ipv4").alias("n_ipv4"),
            F.sum(F.col("has_creative_commons").cast("bigint")).alias("n_cc_tagged"),
            F.sum(F.col("has_noai_optout").cast("bigint")).alias("n_noai_tagged"),
            F.round(F.avg("frac_latin"), 6).alias("mean_frac_latin"),
        )

    out = {
        "per_doc": per_doc,
        "summary": panel(per_doc.groupBy()),
        "repetition": gopher_repetition_signals(df, id_col, text_col),
    }
    if "lang" in df.columns:
        out["per_lang"] = panel(per_doc.groupBy("lang")).orderBy("lang")
    return out


def write_report(
    df: DataFrame, id_col: str, output: str, text_col: str = "text"
) -> dict[str, int]:
    """Materialize every panel under ``<output>/<panel>/``; returns
    panel → row count (the job's audit dict)."""
    panels = corpus_report(df, id_col, text_col)
    counts: dict[str, int] = {}
    for name, frame in panels.items():
        frame.write.mode("overwrite").parquet(f"{output}/{name}")
        counts[name] = frame.sparkSession.read.parquet(f"{output}/{name}").count()
    return counts
