"""End-to-end composed corpus pipeline (jobs/corpus_pipeline_job.py):
every stage is a library operator already covered by its own tests and
oracles — here the composition contract is pinned: stage counts are
monotone non-increasing, audit surfaces exist, and the fingerprint store
only commits after the kept output is durable."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F


def test_pipeline_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from corpus_pipeline_job import run_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 100 == 0).select("doc_id", "text")
    out = str(tmp_path / "corpus")
    audit = run_pipeline(
        spark,
        docs,
        out,
        benchmark=bench,
        mix={"en": 1.0, "de": 1.0, "sv": 1.0, "zh": 1.0, "es": 1.0},
        budget_per_lang=100_000,
        batch_id="t1",
    )
    order = list(audit)
    assert order[0] == "input" and order[-1] == "kept"
    counts = [audit[k] for k in order[:-1]]
    assert all(a >= b for a, b in zip(counts, counts[1:])), audit  # monotone
    assert audit["kept"] > 0
    # artifacts exist — per-batch dirs (round-3 ADVICE fix)
    kept = spark.read.parquet(f"{out}/kept/batch_id=t1")
    assert kept.count() == audit["kept"]
    assert set(docs.columns) == set(kept.columns)
    assert os.path.exists(f"{out}/audit/t1/stages.json")
    assert json.load(open(f"{out}/audit/t1/stages.json")) == audit
    viol = spark.read.parquet(f"{out}/audit/t1/violations")
    assert viol.columns == ["doc_id", "rule_id", "observed_value"]
    # store committed: re-running drops everything already kept
    from xmlschemavalidator_spark.dedup import incremental_exact_dedup

    again = incremental_exact_dedup(kept, "doc_id", f"{out}/fingerprints")
    assert again.count() == 0


def test_pipeline_emits_packed_sequences(spark, tmp_path):
    """--pack-seq-len: the pipeline's final training artifact — per-lang
    packed sequences covering every kept doc's tokens exactly once."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from corpus_pipeline_job import run_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "c")
    audit = run_pipeline(spark, docs, out, batch_id="p1", pack_seq_len=128)
    assert audit["sequences"] > 0
    seqs = spark.read.parquet(f"{out}/sequences/batch_id=p1")
    assert set(seqs.columns) == {"lang", "seq_id", "seq_text", "n_tokens", "pad_tokens"}
    rows = seqs.collect()
    # every sequence is exactly 128 tokens except at most one per lang
    short = {}
    for r in rows:
        assert 0 < r["n_tokens"] <= 128 and r["pad_tokens"] == 128 - r["n_tokens"]
        if r["n_tokens"] < 128:
            short[r["lang"]] = short.get(r["lang"], 0) + 1
    assert all(v == 1 for v in short.values())
    # token conservation: the training artifact carries each kept-corpus
    # token EXACTLY once (overlap=0 — review finding: the default overlap
    # would duplicate ~12.5% of every doc into the sequences)
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import token_count

    kept = spark.read.parquet(f"{out}/kept/batch_id=p1")
    n_doc_toks = kept.agg(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == n_doc_toks


def test_pipeline_quality_model_stage(spark, tmp_path):
    """--quality-model: the in-run-trained NB scorer is a monotone extra
    gate between the heuristic pass and dedup."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from corpus_pipeline_job import run_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "c")
    audit = run_pipeline(spark, docs, out, batch_id="q1", use_quality_model=True)
    order = list(audit)
    assert order.index("quality_model") == order.index("quality") + 1
    assert 0 < audit["quality_model"] <= audit["quality"]
    assert audit["kept"] > 0


def test_pipeline_cross_batch_near_dedup(spark, tmp_path):
    """--near-store: batch 2's near-variants of batch-1 KEPT docs drop in
    the near_dedup stage even though their fingerprints differ (the exact
    store alone would admit them); genuinely fresh docs survive."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from corpus_pipeline_job import run_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "c")
    near_store = str(tmp_path / "near_buckets")
    audit1 = run_pipeline(
        spark, docs, out, batch_id="n1", near_store=near_store
    )
    assert audit1["kept"] > 0
    kept1 = spark.read.parquet(f"{out}/kept/batch_id=n1")

    # batch 2: near-variants (one appended token — different md5, shared
    # band buckets) of every batch-1 kept doc, plus fresh hash-garbage
    near = (
        kept1.withColumn("doc_id", F.col("doc_id") * 10 + 1)
        .withColumn("text", F.concat(F.col("text"), F.lit(" appended")))
        .withColumn("n_chars", F.length("text"))  # keep metadata consistent
    )
    fresh = (
        kept1.limit(20)
        .withColumn("doc_id", F.col("doc_id") * 10 + 2)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.md5(F.col("text")),
                F.md5(F.concat(F.col("text"), F.lit("x"))),
                F.md5(F.concat(F.col("text"), F.lit("y"))),
            ),
        )
        .withColumn("n_chars", F.length("text"))
    )
    b2 = near.unionByName(fresh)
    audit2 = run_pipeline(
        spark, b2, out, batch_id="n2", near_store=near_store
    )
    kept2 = spark.read.parquet(f"{out}/kept/batch_id=n2")
    kept2_ids = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    # no near-variant survived; batch-1's kept output is untouched
    assert not any(i % 10 == 1 for i in kept2_ids)
    assert spark.read.parquet(f"{out}/kept/batch_id=n1").count() == audit1["kept"]
    # the near_dedup stage (not validation/quality) did the dropping:
    # every variant that reached exact_dedup was gone by near_dedup
    n_variants_at_exact = audit2["exact_dedup"]
    assert audit2["near_dedup"] < n_variants_at_exact
