"""Corpus analysis report (report.py): one-projection per-doc signal
frame, aggregate panels, job wrapper."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.report import (
    corpus_report,
    per_doc_signals,
    write_report,
)

SF = "/root/testdata/sf0.001"


def test_per_doc_signals_one_projection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = per_doc_signals(docs, "doc_id")
    assert out.count() == docs.count()
    cols = set(out.columns)
    assert {"doc", "lang", "n_chars", "n_tokens", "quality", "gopher_keep",
            "n_email", "has_creative_commons", "frac_latin"} <= cols
    # all signals ride one scan, no shuffle, no Python
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Exchange" not in plan and "Python" not in plan


def test_corpus_report_panels_consistent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    panels = corpus_report(docs, "doc_id")
    assert set(panels) == {"per_doc", "summary", "per_lang", "repetition"}
    summary = panels["summary"].collect()
    assert len(summary) == 1
    s = summary[0]
    assert s["n_docs"] == docs.count()
    per_lang = panels["per_lang"].collect()
    assert sum(r["n_docs"] for r in per_lang) == s["n_docs"]
    assert sum(r["total_tokens"] for r in per_lang) == s["total_tokens"]
    assert 0.0 <= s["gopher_keep_rate"] <= 1.0
    assert panels["repetition"].count() == docs.count()
    # ASCII corpus: latin-dominated
    assert s["mean_frac_latin"] > 0.5


def test_write_report_artifacts(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "report")
    counts = write_report(docs, "doc_id", out)
    assert counts["summary"] == 1 and counts["per_doc"] == docs.count()
    back = spark.read.parquet(f"{out}/per_lang")
    assert back.count() == counts["per_lang"]


def test_report_without_lang_column(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").drop("lang")
    panels = corpus_report(docs, "doc_id")
    assert "per_lang" not in panels
    assert panels["summary"].collect()[0]["n_docs"] == docs.count()


def test_write_report_removes_stale_panels(spark, tmp_path):
    """Re-running into the same output with a shrunken panel set (lang
    column gone) must delete the stale per_lang rather than leave it
    inconsistent with the fresh siblings."""
    import os

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "r")
    write_report(docs, "doc_id", out)
    assert os.path.exists(f"{out}/per_lang")
    counts = write_report(docs.drop("lang"), "doc_id", out)
    assert "per_lang" not in counts
    assert not os.path.exists(f"{out}/per_lang")


def test_per_doc_signals_null_text_pii_zero(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "mail a@b.com")], "doc_id bigint, text string"
    )
    got = {r["doc"]: r for r in per_doc_signals(docs, "doc_id").collect()}
    assert got[1]["n_email"] == 0 and got[1]["n_phone"] == 0
    assert got[2]["n_email"] == 1


def test_vocab_coverage_panel_per_lang_and_all(spark):
    """r3 VERDICT item 5: the per-lang UNK rate is a first-class panel.
    Tiny vocab guarantees a non-vacuous UNK path (planted-oracle rule)."""
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.report import vocab_coverage_panel
    from xmlschemavalidator_spark.textops import build_vocab, encode_token_ids

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = build_vocab(docs, vocab_size=16)
    enc = encode_token_ids(docs, vocab, "doc_id")
    lang_of = docs.select(F.col("doc_id").alias("doc"), "lang")
    panel = vocab_coverage_panel(enc, lang_of).collect()
    assert len(panel) == 5  # en de sv fr zh
    total_docs = sum(r["n_docs"] for r in panel)
    assert total_docs == docs.count()
    assert all(0.0 <= r["unk_rate"] <= 1.0 for r in panel)
    assert sum(r["total_unk"] for r in panel) > 0  # UNK path exercised
    allp = vocab_coverage_panel(enc).collect()
    assert len(allp) == 1 and allp[0]["lang"] == "all"
    assert allp[0]["total_tokens"] == sum(r["total_tokens"] for r in panel)
