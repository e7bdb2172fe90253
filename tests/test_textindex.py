"""Persisted inverted index + BM25 query (textindex.py).

The contract: an index-served top-k is bit-identical to the
from-scratch ``textops.bm25_topk`` scan on the same corpus, and the
query-time postings scan prunes at the PARTITION level (only the probed
``_bucket=`` directories are listed) with the term filter pushed to
parquet row groups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.textindex import (
    append_text_index,
    bm25_index_topk,
    build_text_index,
    phrase_index_topk,
    phrase_topk_sql,
)
from xmlschemavalidator_spark.textops import bm25_topk

DOCS = [
    (1, "spark table spark join"),
    (2, "spark"),
    (3, "table scan row filter batch merge sort window key value"),
    (4, "hash hash hash join"),
    (5, "nothing relevant here"),
    (6, "join hash spark table " + "pad " * 30),
    (7, "Spark SPARK spark"),  # case folding
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _formatted(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_index_topk_matches_corpus_scan_exactly(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "idx")
    build_text_index(df, "doc_id", path, n_buckets=8)
    for terms in (["spark", "hash"], ["join"], ["SPARK", "table", "pad"]):
        want = [
            (r["doc"], r["n_hits"], r["score_micro"])
            for r in bm25_topk(df, "doc_id", terms, k=10).collect()
        ]
        got = [
            (r["doc"], r["n_hits"], r["score_micro"])
            for r in bm25_index_topk(spark, path, terms, k=10).collect()
        ]
        assert got == want, terms


def test_index_query_reads_self_described_bucket_count(spark, tmp_path):
    # the modulus is read from the corpus row — a build with an unusual
    # n_buckets serves correctly without the caller re-stating it
    df = _docs(spark)
    path = str(tmp_path / "idx3")
    build_text_index(df, "doc_id", path, n_buckets=3)
    want = [
        (r["doc"], r["score_micro"])
        for r in bm25_topk(df, "doc_id", ["spark"], k=10).collect()
    ]
    got = [
        (r["doc"], r["score_micro"])
        for r in bm25_index_topk(spark, path, ["spark"], k=10).collect()
    ]
    assert got == want


def test_index_absent_terms(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "idx2")
    build_text_index(df, "doc_id", path, n_buckets=8)
    # all-absent → empty frame with the stable output schema
    out = bm25_index_topk(spark, path, ["zzzmissing"], k=10)
    assert out.columns == ["doc", "n_hits", "score_micro"]
    assert out.count() == 0
    # mixed present/absent → identical to the corpus scan on the same query
    terms = ["spark", "zzzmissing"]
    want = [
        (r["doc"], r["n_hits"], r["score_micro"])
        for r in bm25_topk(df, "doc_id", terms, k=10).collect()
    ]
    got = [
        (r["doc"], r["n_hits"], r["score_micro"])
        for r in bm25_index_topk(spark, path, terms, k=10).collect()
    ]
    assert got == want
    with pytest.raises(ValueError):
        bm25_index_topk(spark, path, [], k=10)


def test_index_scan_prunes_buckets_and_pushes_terms(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "idx4")
    build_text_index(df, "doc_id", path, n_buckets=64)
    top = bm25_index_topk(spark, path, ["spark", "hash"], k=5)
    plan = _formatted(top)
    # bucket pruning happens at file listing: _bucket isin sits in
    # PartitionFilters, not in a post-scan Filter
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "_bucket" in seg and ("IN (" in seg or "in(" in seg.lower()), seg
    # the term IN filter reaches the parquet reader (row-group pruning
    # against the sortWithinPartitions("term") clustering)
    pushed = [
        line
        for line in plan.splitlines()
        if "PushedFilters" in line and "term" in line
    ]
    assert pushed, plan
    # top-k is TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in plan


def _phrase_py(docs, phrase):
    """Independent pure-Python replay: exact consecutive-sequence count
    per doc — the index-served query must match exactly."""
    phrase = [t.lower() for t in phrase]
    out = {}
    for i, text in docs:
        ts = text.lower().split()
        c = sum(
            1
            for a in range(len(ts) - len(phrase) + 1)
            if ts[a : a + len(phrase)] == phrase
        )
        if c:
            out[i] = c
    return out


def test_phrase_query_matches_python_replay(spark, tmp_path):
    docs = DOCS + [
        (8, "table hash table hash table"),  # overlapping bigram x2
        (9, "hash hash hash"),  # repeated-term phrase fodder
        (10, "spark table hash join spark table hash"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    path = str(tmp_path / "pidx")
    build_text_index(df, "doc_id", path, n_buckets=8, positions=True)
    for phrase in (
        ["table", "hash"],
        ["hash", "hash"],
        ["spark", "table", "hash"],
        ["table"],
        ["zzz", "table"],
    ):
        got = {
            r["doc"]: r["n_occurrences"]
            for r in phrase_index_topk(spark, path, phrase, k=20).collect()
        }
        assert got == _phrase_py(docs, phrase), phrase
    with pytest.raises(ValueError):
        phrase_index_topk(spark, path, [], k=5)


def test_phrase_query_requires_positional_build(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "npidx")
    build_text_index(df, "doc_id", path, n_buckets=8)  # no positions
    with pytest.raises(ValueError, match="positions"):
        phrase_index_topk(spark, path, ["table", "hash"], k=5)


def test_positional_index_still_serves_bm25(spark, tmp_path):
    # one index, both query kinds: BM25 from a positional build is
    # bit-identical to the corpus scan (column pruning skips positions)
    df = _docs(spark)
    path = str(tmp_path / "bidx")
    build_text_index(df, "doc_id", path, n_buckets=8, positions=True)
    want = [
        (r["doc"], r["score_micro"])
        for r in bm25_topk(df, "doc_id", ["spark", "hash"], k=10).collect()
    ]
    got = [
        (r["doc"], r["score_micro"])
        for r in bm25_index_topk(spark, path, ["spark", "hash"], k=10).collect()
    ]
    assert got == want


def test_phrase_oracle_sql_parity(spark, tmp_path):
    import duckdb

    docs = DOCS + [(8, "table hash table hash table")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    path = str(tmp_path / "oidx")
    build_text_index(df, "doc_id", path, n_buckets=8, positions=True)
    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(docs, columns=["doc_id", "text"]),
    )
    for phrase in (["table", "hash"], ["hash", "hash", "hash"]):
        want = con.execute(phrase_topk_sql(phrase, k=20)).fetchall()
        got = [
            (r["doc"], r["n_occurrences"])
            for r in phrase_index_topk(spark, path, phrase, k=20).collect()
        ]
        assert got == [(int(d), int(c)) for d, c in want], phrase


def test_append_batches_equal_full_rebuild(spark, tmp_path):
    """Incremental maintenance: build on batch 1, append batch 2 → BM25
    and phrase results are bit-identical to a from-scratch scan of the
    full corpus (df/N/S sum correctly across batch dirs)."""
    half1, half2 = DOCS[:4], DOCS[4:]
    d1 = spark.createDataFrame(half1, "doc_id bigint, text string")
    d2 = spark.createDataFrame(half2, "doc_id bigint, text string")
    full = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    path = str(tmp_path / "incidx")
    build_text_index(d1, "doc_id", path, n_buckets=8, positions=True)
    append_text_index(d2, "doc_id", path, batch_id="00001")
    want = [
        (r["doc"], r["n_hits"], r["score_micro"])
        for r in bm25_topk(full, "doc_id", ["spark", "hash"], k=10).collect()
    ]
    got = [
        (r["doc"], r["n_hits"], r["score_micro"])
        for r in bm25_index_topk(spark, path, ["spark", "hash"], k=10).collect()
    ]
    assert got == want
    ph = {
        r["doc"]: r["n_occurrences"]
        for r in phrase_index_topk(spark, path, ["hash", "hash"], k=20).collect()
    }
    assert ph == _phrase_py(DOCS, ["hash", "hash"])


def test_append_guards(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "gidx")
    build_text_index(d, "doc_id", path, n_buckets=8)
    # re-appending the committed initial batch is refused (identity is
    # the _batch dir name, read back as STRING — 00000 stays 00000)
    with pytest.raises(ValueError, match="already committed"):
        append_text_index(d, "doc_id", path, batch_id="00000")
    with pytest.raises(ValueError, match="bad batch_id"):
        append_text_index(d, "doc_id", path, batch_id="a/b")
    # an appended batch inherits the build's layout: no positions here
    d2 = spark.createDataFrame([(100, "hash spark")], "doc_id bigint, text string")
    append_text_index(d2, "doc_id", path, batch_id="00001")
    post = spark.read.parquet(f"{path}/postings")
    assert "positions" not in post.columns
    assert {r["_batch"] for r in post.select("_batch").distinct().collect()} == {
        "00000",
        "00001",
    } or {str(r["_batch"]) for r in post.select("_batch").distinct().collect()} == {
        "0",
        "1",
    }


def test_append_empty_batch_is_harmless(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "eidx")
    build_text_index(d, "doc_id", path, n_buckets=8)
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    append_text_index(empty, "doc_id", path, batch_id="00001")
    want = [
        (r["doc"], r["score_micro"])
        for r in bm25_topk(d, "doc_id", ["spark"], k=10).collect()
    ]
    got = [
        (r["doc"], r["score_micro"])
        for r in bm25_index_topk(spark, path, ["spark"], k=10).collect()
    ]
    assert got == want


def test_index_corpus_stats_row(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "idx5")
    build_text_index(df, "doc_id", path, n_buckets=8)
    row = spark.read.parquet(f"{path}/corpus").first()
    n_tokens = sum(len(t.split()) for _, t in DOCS)
    assert row["n_docs"] == len(DOCS)
    assert row["total_tokens"] == n_tokens
    assert row["n_buckets"] == 8
    # postings carry the denormalized dl: no doc-length join at query time
    post = spark.read.parquet(f"{path}/postings")
    assert set(post.columns) == {"term", "doc", "dl", "tf", "_bucket", "_batch"}
    dl7 = post.where(F.col("doc") == 7).select("dl").distinct().collect()
    assert [r["dl"] for r in dl7] == [3]


def test_trigram_substring_search_lossless(spark):
    from xmlschemavalidator_spark.textindex import substring_search, trigram_postings

    rows = [
        (1, "hello merge batch world"),
        (2, "batch merge hello"),  # has all trigrams scattered? verify weeds it
        (3, "merge batch"),
        (4, "MERGE BATCH"),  # case-sensitive: no match
        (5, "xx"),
        (6, None),
        (7, "mergbatch merge atch"),  # all trigrams present, scattered: weeded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        r["doc_id"] for r in substring_search(df, "doc_id", "text", "merge batch").collect()
    )
    want = sorted(i for i, t in rows if t is not None and "merge batch" in t)
    assert got == want == [1, 3]
    # prebuilt postings path agrees
    p = trigram_postings(df, "doc_id", "text")
    got2 = sorted(
        r["doc_id"]
        for r in substring_search(df, "doc_id", "text", "merge batch", postings=p).collect()
    )
    assert got2 == got


def test_trigram_candidates_superset_and_short_query(spark):
    import pytest as _pt

    from xmlschemavalidator_spark.textindex import (
        substring_candidates,
        substring_search,
        trigram_postings,
    )

    df = spark.createDataFrame(
        [(1, "abcabc"), (2, "abc"), (3, "cab abc")], "doc_id long, text string"
    )
    p = trigram_postings(df, "doc_id", "text")
    cand = sorted(r["doc"] for r in substring_candidates(p, "abcabc").collect())
    true = sorted(
        r["doc_id"] for r in substring_search(df, "doc_id", "text", "abcabc").collect()
    )
    assert set(true) <= set(cand)  # lossless: candidates cover every match
    assert true == [1]
    # < 3 chars: exact scan fallback
    short = sorted(r["doc_id"] for r in substring_search(df, "doc_id", "text", "ab").collect())
    assert short == [1, 2, 3]
    with _pt.raises(ValueError):
        substring_candidates(p, "ab")


def test_persisted_trigram_index_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.textindex import (
        append_trigram_index,
        build_trigram_index,
        indexed_substring_search,
        substring_search,
    )

    p = str(tmp_path / "tgidx")
    rows1 = [(1, "hello merge batch world"), (2, "nothing here"), (3, "merge batch")]
    rows2 = [(10, "late batch merge batch arrival"), (11, "xx")]
    d1 = spark.createDataFrame(rows1, "doc_id long, text string")
    d2 = spark.createDataFrame(rows2, "doc_id long, text string")
    build_trigram_index(d1, "doc_id", p, n_buckets=8)
    append_trigram_index(d2, "doc_id", p, batch_id="00001")
    full = d1.unionByName(d2)
    got = sorted(
        r["doc_id"]
        for r in indexed_substring_search(full, "doc_id", "text", "merge batch", p).collect()
    )
    want = sorted(
        r["doc_id"] for r in substring_search(full, "doc_id", "text", "merge batch").collect()
    )
    assert got == want == [1, 3, 10]
    # committed batch refused; failed-batch retry would overwrite its own dirs
    import pytest as _pt

    with _pt.raises(ValueError):
        append_trigram_index(d2, "doc_id", p, batch_id="00001")
    # short query: scan fallback
    assert indexed_substring_search(full, "doc_id", "text", "xx", p).count() == 1
