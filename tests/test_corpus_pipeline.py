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
