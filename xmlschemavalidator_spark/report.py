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
    mojibake_count,
    pii_counts,
    quality_score,
    script_signals,
    token_count,
)


def per_doc_signals(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Every per-doc signal in ONE projection: ``(doc, n_chars, n_tokens,
    quality, gopher_keep, n_email/n_phone/n_ipv4, has_* license tags,
    frac_* script fractions, n_mojibake)`` plus passthrough ``lang`` when
    present."""
    t = F.col(text_col)
    cols = {
        "n_chars": F.length(F.coalesce(t, F.lit(""))),
        "n_tokens": token_count(t),
        "quality": F.round(quality_score(t), 6),
        "gopher_keep": gopher_pass(t),
        # coalesce: pii_counts alone is not null-safe, and NULL counts
        # next to 0-valued siblings would make `n_email = 0` silently
        # drop NULL-text docs (review finding)
        **pii_counts(F.coalesce(t, F.lit(""))),
        **license_signals(t),
        **script_signals(t),
        "n_mojibake": mojibake_count(t),
    }
    keep = [F.col(id_col).alias("doc")]
    if "lang" in df.columns:
        keep.append(F.col("lang"))
    return df.select(*keep, *[v.alias(k) for k, v in cols.items()])


def _panel(grouped):
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


def vocab_coverage_panel(
    encoded: DataFrame, lang_of: DataFrame | None = None
) -> DataFrame:
    """Tokenizer vocab-coverage panel (r3 VERDICT item 5: the n_unk rate
    existed per-doc but was never surfaced): ``(lang, n_docs,
    total_tokens, total_unk, unk_rate)``. ``encoded`` is any frame with
    ``(doc, n_tokens, n_unk)`` — :func:`textops.encode_token_ids` output,
    or a BPE-side count; ``lang_of`` is ``(doc, lang)`` (omitted → one
    'all' row). One bounded groupBy; composes with a written per-doc
    parquet like every other panel."""
    if lang_of is not None:
        base = encoded.join(lang_of, "doc", "left").withColumn(
            "lang", F.coalesce("lang", F.lit("und"))
        )
    else:
        base = encoded.withColumn("lang", F.lit("all"))
    return (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_unk").cast("bigint").alias("total_unk"),
            F.round(
                F.sum("n_unk") / F.greatest(F.sum("n_tokens"), F.lit(1)), 6
            ).alias("unk_rate"),
        )
        .orderBy("lang")
    )


def corpus_report(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> dict[str, DataFrame]:
    """The report panels: ``per_doc`` (the signal frame), ``summary``
    (one row of corpus-level aggregates), ``per_lang`` (the same panel
    grouped by language, when a ``lang`` column exists), ``repetition``
    (per-doc Gopher duplicate-line/paragraph fractions). The panels
    share the per_doc LINEAGE — materializing several of them re-runs the
    signal projection per panel; use :func:`write_report`, which
    aggregates from the written per_doc parquet instead."""
    per_doc = per_doc_signals(df, id_col, text_col)
    out = {
        "per_doc": per_doc,
        "summary": _panel(per_doc.groupBy()),
        "repetition": gopher_repetition_signals(df, id_col, text_col),
    }
    if "lang" in df.columns:
        out["per_lang"] = _panel(per_doc.groupBy("lang")).orderBy("lang")
    return out


# every panel name write_report can produce — stale ones from a prior run
# with a different shape (e.g. a lang column that has since disappeared)
# are deleted so the output dir is always internally consistent
_ALL_PANELS = ("per_doc", "summary", "per_lang", "repetition")


def write_report(
    df: DataFrame, id_col: str, output: str, text_col: str = "text"
) -> dict[str, int]:
    """Materialize every panel under ``<output>/<panel>/``; returns
    panel → row count (the job's audit dict). The signal projection runs
    ONCE: per_doc is written first and summary/per_lang aggregate from
    the written parquet (the lazy panels would otherwise re-run the full
    regex suite per panel — review finding), keeping the whole report at
    ~2 corpus scans. Panels the current input can't produce are DELETED
    from the output dir rather than left stale."""
    spark = df.sparkSession
    per_doc = per_doc_signals(df, id_col, text_col)
    per_doc.write.mode("overwrite").parquet(f"{output}/per_doc")
    written = spark.read.parquet(f"{output}/per_doc")

    panels = {"summary": _panel(written.groupBy())}
    if "lang" in written.columns:
        panels["per_lang"] = _panel(written.groupBy("lang")).orderBy("lang")
    panels["repetition"] = gopher_repetition_signals(df, id_col, text_col)

    counts: dict[str, int] = {"per_doc": written.count()}
    for name, frame in panels.items():
        frame.write.mode("overwrite").parquet(f"{output}/{name}")
        counts[name] = spark.read.parquet(f"{output}/{name}").count()

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for name in _ALL_PANELS:
        if name in counts:
            continue
        try:
            path = jvm.org.apache.hadoop.fs.Path(f"{output}/{name}")
            fs = path.getFileSystem(hconf)
            if fs.exists(path):
                fs.delete(path, True)
        except Exception:
            pass  # cleanup of a stale panel must not fail the report
    return counts
