"""Text-analysis op tests: token counts, quality, lang-id, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.textops import (
    bpe_token_estimate,
    doc_fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
    with_text_analysis,
)


def one(spark, col, value):
    df = spark.createDataFrame([(value,)], "t string")
    return df.select(col(F.col("t")).alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert one(spark, token_count, "a b  c") == 3
    assert one(spark, token_count, "  ") == 0
    assert one(spark, token_count, None) == 0


def test_bpe_estimate_monotone(spark):
    short = one(spark, bpe_token_estimate, "hi there")
    long = one(spark, bpe_token_estimate, "internationalization of documentation")
    assert 0 < short < long


def test_stopword_ratio(spark):
    assert one(spark, lambda c: stopword_ratio(c, "en"), "the cat and the dog") == 0.6


def test_quality_score_ranges(spark):
    good = one(spark, quality_score, "the quick brown fox jumps over the lazy dog again")
    bad = one(spark, quality_score, "!!! ??? ,,, ;;; :::")
    assert 0.0 <= bad < good <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it was good",),
            ("der hund ist nicht auf der straße und das ist gut",),
            ("le chat est dans la maison pour le moment",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    got = [r[0] for r in df.select(lang_id(F.col("t"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_normalizes(spark):
    a = one(spark, doc_fingerprint, "Hello   World")
    b = one(spark, doc_fingerprint, "hello world ")
    c = one(spark, doc_fingerprint, "hello worlds")
    assert a == b != c
    assert len(a) == 32  # md5 hex


def test_with_text_analysis_single_projection(spark):
    df = spark.createDataFrame([("the data is here",)], "text string")
    out = with_text_analysis(df)
    row = out.collect()[0]
    assert row["n_tokens"] == 4 and row["lang_pred"] == "en"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1 and "Union" not in plan


def test_fingerprint_matches_duckdb(spark):
    import duckdb

    vals = ["Hello   World", "x", ""]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r[0] for r in df.select(doc_fingerprint(F.col("t"))).collect()]
    want = [
        duckdb.sql(
            "SELECT md5(lower(regexp_replace(trim(?::VARCHAR), '\\s+', ' ', 'g')))", params=[v]
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_gopher_signals_and_pass(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import gopher_pass, gopher_signals

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog ran over the hill"),   # clean -> keep
            (2, "### ## # ### ## # ### ## # ###"),          # symbols -> drop
            (3, "pneumonoultramicroscopic words exceedingly longwinded terminology"),  # long words, no stopwords
            (4, "a b"),                                     # too short
        ],
        "id long, text string",
    )
    s = gopher_signals(F.col("text"))
    out = df.select("id", s["mean_word_len"].alias("mwl"),
                    s["stopword_hits"].alias("stops"),
                    gopher_pass(F.col("text")).alias("keep")).collect()
    by = {r["id"]: r for r in out}
    assert by[1]["keep"] is True and by[1]["stops"] >= 3
    assert by[2]["keep"] is False
    assert by[3]["keep"] is False and by[3]["mwl"] > 10
    assert by[4]["keep"] is False


def test_duplicate_ngram_fraction(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import duplicate_ngram_fraction

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z"), (3, "solo"), (4, None)],
        "id long, text string",
    )
    got = {
        r["id"]: r["f"]
        for r in df.select(
            "id", F.round(duplicate_ngram_fraction(F.col("text"), 2), 3).alias("f")
        ).collect()
    }
    assert got[1] == 0.6   # 5 grams, 2 distinct -> 1 - 2/5
    assert got[2] == 0.0
    assert got[3] is None  # too short for a 2-gram
    assert got[4] is None


def test_pii_counts(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import pii_counts

    df = spark.createDataFrame(
        [(1, "mail a@b.com and c.d@e.org, call 555-123-4567, host 10.0.0.1"),
         (2, "nothing here")],
        "id long, text string",
    )
    c = pii_counts(F.col("text"))
    r = {x["id"]: x for x in df.select("id", *[v.alias(k) for k, v in c.items()]).collect()}
    assert (r[1]["n_email"], r[1]["n_phone"], r[1]["n_ipv4"]) == (2, 1, 1)
    assert (r[2]["n_email"], r[2]["n_phone"], r[2]["n_ipv4"]) == (0, 0, 0)


def test_gopher_oracle_empty_text_parity(spark):
    """Round-1 advisor finding: Spark tokens() gives [] for empty or
    whitespace-only text while the DuckDB oracle's bare regexp_split gave
    [''] (n_words=1) — the gap was masked because the synthetic corpus has
    no empty docs. Pin the parity on exactly those corner rows."""
    import duckdb
    import pandas as pd

    import xmlschemavalidator_spark.driver_queries as dq

    docs_pd = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the quick brown fox and the lazy dog ran away",
                "",
                "   ",
                None,
                "x",
            ],
        }
    )
    sdf = spark.createDataFrame(docs_pd.astype(object).where(docs_pd.notna(), None),
                                "doc_id bigint, text string")
    orig_t = dq._t
    try:
        dq._t = lambda s, sf, name: sdf
        got_gopher = dq.text_gopher_filters(spark, "ignored").toPandas()
        got_rep = dq.text_repetition(spark, "ignored").toPandas()
    finally:
        dq._t = orig_t

    con = duckdb.connect()
    con.register("documents", docs_pd)
    oracles = dq.all_oracles()
    want_gopher = con.execute(oracles["text_gopher_filters"]).df()
    want_rep = con.execute(oracles["text_repetition"]).df()

    for got, want in ((got_gopher, want_gopher), (got_rep, want_rep)):
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        for c in got.columns:
            for i in range(len(got)):
                g, w = got[c][i], want[c][i]
                both_na = pd.isna(g) and pd.isna(w)
                assert both_na or g == w, (c, i, g, w)


def test_char_entropy_known_values(spark):
    from xmlschemavalidator_spark.textops import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, None)],
        "i bigint, text string",
    )
    got = {r["i"]: r["h"] for r in
           df.select("i", F.round(char_entropy(F.col("text")), 6).alias("h")).collect()}
    assert got[1] == 0.0       # single symbol: zero entropy
    assert got[2] == 1.0       # two equiprobable symbols: 1 bit
    assert got[3] == 2.0       # four equiprobable symbols: 2 bits
    assert got[4] is None and got[5] is None


def test_chunk_documents_semantics(spark):
    from xmlschemavalidator_spark.textops import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, None)],
        "doc_id bigint, text string",
    )
    got = {}
    for r in chunk_documents(df, "doc_id", chunk_tokens=4, overlap=1).collect():
        got.setdefault(r["doc"], []).append((r["chunk_idx"], r["chunk_text"], r["n_tokens"]))
    # stride 3: windows at tokens 1,4,7 (w0.., w3.., w6..); start 10 > 10-1 excluded
    assert got[1] == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]
    assert got[2] == [(0, "a b c", 3)]  # short doc: one partial chunk
    assert 3 not in got and 4 not in got  # empty docs produce no chunks
    # coverage invariant: every token appears in some chunk
    all_tokens = set(words.split())
    covered = set(t for _, text, _ in got[1] for t in text.split())
    assert covered == all_tokens


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from xmlschemavalidator_spark.textops import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", chunk_tokens=4, overlap=4)


def test_drop_blocklisted_domains(spark):
    from xmlschemavalidator_spark.textops import drop_blocklisted_domains

    df = spark.createDataFrame(
        [
            (1, "https://spam.example/a"),
            (2, "https://ok.example/b"),
            (3, "http://spam.example/c?q=1"),
        ],
        "doc_id bigint, url string",
    )
    block = spark.createDataFrame([("spam.example",)], "host string")
    kept = sorted(r["doc_id"] for r in drop_blocklisted_domains(df, "url", block).collect())
    assert kept == [2]


def test_pack_chunks_concat_and_chop(spark):
    from xmlschemavalidator_spark.textops import pack_chunks

    chunks = spark.createDataFrame(
        [
            (1, 0, 60),
            (1, 1, 60),
            (2, 0, 30),   # crosses the 128 boundary at offset 120
            (3, 0, 100),
        ],
        "doc bigint, chunk_idx int, n_tokens int",
    )
    got = {
        (r["doc"], r["chunk_idx"]): (r["seq_id"], r["seq_offset"])
        for r in pack_chunks(chunks, 128).collect()
    }
    assert got[(1, 0)] == (0, 0)
    assert got[(1, 1)] == (0, 60)
    assert got[(2, 0)] == (0, 120)    # starts in seq 0, straddles into 1
    assert got[(3, 0)] == (1, 22)     # offset 150 -> seq 1, local 22
    # grouped packing: sequences never cross groups
    grouped = spark.createDataFrame(
        [("a", 1, 0, 100), ("a", 2, 0, 100), ("b", 3, 0, 100)],
        "shard string, doc bigint, chunk_idx int, n_tokens int",
    )
    g = {
        (r["shard"], r["doc"]): r["seq_id"]
        for r in pack_chunks(grouped, 128, group_col="shard").collect()
    }
    assert g[("a", 1)] == 0 and g[("a", 2)] == 0  # offset 100 < 128
    assert g[("b", 3)] == 0  # fresh counter per group


def test_entropy_and_line_oracles_empty_text_parity(spark):
    """Round-2 review finding: text_char_entropy and the line-dedup
    oracles silently dropped rows for empty/NULL text while Spark emitted
    them — masked because the corpus has no such docs. Pin the corner
    rows exactly like the gopher parity test."""
    import duckdb
    import pandas as pd

    import xmlschemavalidator_spark.driver_queries as dq

    docs_pd = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a regular document with words", "", None, "  \n  "],
        }
    )
    sdf = spark.createDataFrame(
        docs_pd.astype(object).where(docs_pd.notna(), None),
        "doc_id bigint, text string",
    )
    orig_t = dq._t
    try:
        dq._t = lambda s, sf, name: sdf
        outs = {
            name: dq.all_queries()[name](spark, "ignored").toPandas()
            for name in ("text_char_entropy", "corpus_line_dedup_stats",
                         "corpus_duplicate_lines")
        }
    finally:
        dq._t = orig_t
    con = duckdb.connect()
    con.register("documents", docs_pd)
    for name, got in outs.items():
        want = con.execute(dq.all_oracles()[name]).df()
        sort_cols = [c for c in got.columns][:1] or list(got.columns)
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        assert len(got) == len(want), (name, len(got), len(want))
        for c in got.columns:
            for i in range(len(got)):
                g, w = got[c][i], want[c][i]
                assert (pd.isna(g) and pd.isna(w)) or g == w, (name, c, i, g, w)


def test_pack_chunks_warns_without_group_col(spark):
    """VERDICT r2 item 8: the single-partition global window default is
    loud — a RuntimeWarning names the hazard and the group_col escape."""
    import warnings

    import pytest

    from xmlschemavalidator_spark.textops import pack_chunks

    chunks = spark.createDataFrame(
        [(1, 0, 10)], "doc bigint, chunk_idx int, n_tokens int"
    )
    with pytest.warns(RuntimeWarning, match="ONE global sort partition"):
        pack_chunks(chunks, 128)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # grouped path must NOT warn
        pack_chunks(
            spark.createDataFrame(
                [("a", 1, 0, 10)], "shard string, doc bigint, chunk_idx int, n_tokens int"
            ),
            128,
            group_col="shard",
        )


def _seq_corpus(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(25))),
            (2, " ".join(f"b{i}" for i in range(7))),
            (3, ""),
            (4, " ".join(f"c{i}" for i in range(10))),
        ],
        "doc_id bigint, text string",
    )


def test_pack_sequences_materializes_fixed_length(spark):
    """VERDICT r2 item 3 invariants: every chunk token lands in exactly one
    sequence (stream equality), every sequence is exactly seq_len tokens
    except the last, pad_tokens complements the tail."""
    from xmlschemavalidator_spark.textops import chunk_documents, pack_sequences

    chunks = chunk_documents(_seq_corpus(spark), "doc_id", chunk_tokens=8, overlap=2)
    seqs = pack_sequences(chunks, 10).orderBy("seq_id").collect()
    chunk_stream = " ".join(
        r["chunk_text"] for r in chunks.orderBy("doc", "chunk_idx").collect()
    )
    assert " ".join(r["seq_text"] for r in seqs) == chunk_stream
    assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
    for r in seqs[:-1]:
        assert r["n_tokens"] == 10 and r["pad_tokens"] == 0
    last = seqs[-1]
    assert 0 < last["n_tokens"] <= 10
    assert last["pad_tokens"] == 10 - last["n_tokens"]
    # every seq_text really has n_tokens whitespace tokens
    assert all(len(r["seq_text"].split()) == r["n_tokens"] for r in seqs)


def test_pack_sequences_chunk_longer_than_seq(spark):
    """A chunk spanning several sequences splits into first/middle/last
    pieces at every boundary."""
    from xmlschemavalidator_spark.textops import pack_sequences

    chunks = spark.createDataFrame(
        [(1, 0, " ".join(f"t{i}" for i in range(23)), 23)],
        "doc bigint, chunk_idx int, chunk_text string, n_tokens int",
    )
    seqs = {r["seq_id"]: r for r in pack_sequences(chunks, 5).collect()}
    assert sorted(seqs) == [0, 1, 2, 3, 4]
    assert [seqs[i]["n_tokens"] for i in range(5)] == [5, 5, 5, 5, 3]
    assert seqs[0]["seq_text"] == "t0 t1 t2 t3 t4"
    assert seqs[4]["seq_text"] == "t20 t21 t22"
    assert seqs[4]["pad_tokens"] == 2


def test_pack_sequences_grouped_never_cross(spark):
    from xmlschemavalidator_spark.textops import pack_sequences

    chunks = spark.createDataFrame(
        [
            ("a", 1, 0, "x1 x2 x3", 3),
            ("a", 2, 0, "x4 x5", 2),
            ("b", 3, 0, "y1 y2 y3 y4", 4),
        ],
        "shard string, doc bigint, chunk_idx int, chunk_text string, n_tokens int",
    )
    got = {
        (r["shard"], r["seq_id"]): r["seq_text"]
        for r in pack_sequences(chunks, 4, group_col="shard").collect()
    }
    assert got[("a", 0)] == "x1 x2 x3 x4"
    assert got[("a", 1)] == "x5"
    assert got[("b", 0)] == "y1 y2 y3 y4"


def test_redact_pii_fixpoint_and_custom_placeholders(spark):
    """pii_counts(redact_pii(text)) == 0 on adversarial inputs; custom
    placeholder mapping honored; non-PII text untouched."""
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import pii_counts, redact_pii

    rows = [
        (1, "mail a.b-c_d%x+1@sub.example.co.uk now"),
        (2, "call +1 555-123-4567 or 555.123.4567 or 555 123 4567"),
        (3, "hosts 10.0.0.1 and 192.168.255.254 up"),
        (4, "all three: u@e.org, 555-000-1111, 8.8.8.8"),
        (5, "clean text with no personal data at all"),
        (6, "edge u@e.org@e.org 1.2.3.4.5"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    clean = df.select("doc_id", redact_pii(F.col("text")).alias("t"))
    counts = clean.select(
        "doc_id", *[c.alias(k) for k, c in pii_counts(F.col("t")).items()]
    ).collect()
    assert all(
        r["n_email"] == 0 and r["n_phone"] == 0 and r["n_ipv4"] == 0 for r in counts
    )
    got = {r["doc_id"]: r["t"] for r in clean.collect()}
    assert got[5] == "clean text with no personal data at all"
    assert got[4] == "all three: <EMAIL>, <PHONE>, <IPV4>"
    custom = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", redact_pii(F.col("text"), {"email": "[E]"}).alias("t")
        ).collect()
    }
    assert custom[4] == "all three: [E], <PHONE>, <IPV4>"


def test_line_signals_and_fineweb_pass(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import fineweb_line_pass, line_signals

    rows = [
        (1, "Good first sentence.\nAnother proper line!\nAnd a third one?"),
        (2, "- nav\n- menu\n- login\n- cart"),            # all bullets
        (3, "teaser one...\nteaser two...\nteaser three..."),  # all ellipsis
        (4, "ok line here.\nx y\na b"),                    # 2/3 short lines
        (5, ""),                                           # no lines
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    s = line_signals(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c.alias(k) for k, c in s.items()],
            fineweb_line_pass(F.col("text")).alias("keep"),
        ).collect()
    }
    assert got[1]["n_lines"] == 3 and got[1]["frac_lines_end_punct"] == 1.0
    assert got[1]["keep"] is True
    assert got[2]["frac_lines_bullet"] == 1.0 and got[2]["keep"] is False
    assert got[3]["frac_lines_ellipsis"] == 1.0 and got[3]["keep"] is False
    assert got[3]["frac_lines_end_punct"] == 1.0  # '...' still ends with '.'
    assert abs(got[4]["frac_short_lines"] - 2 / 3) < 1e-9 and got[4]["keep"] is False
    assert got[5]["n_lines"] == 0 and got[5]["frac_lines_end_punct"] is None
    assert got[5]["keep"] is False and got[6]["keep"] is False
    # tab-edged line: the leading empty split token must not inflate the
    # word count (review finding — oracle filters empties, so must Spark)
    tabby = spark.createDataFrame([(7, "\tfoo bar\nreal line here today.")],
                                  "doc_id bigint, text string")
    r7 = tabby.select(
        *[c.alias(k) for k, c in line_signals(F.col("text")).items()]
    ).collect()[0]
    assert r7["n_lines"] == 2 and abs(r7["frac_short_lines"] - 0.5) < 1e-9


def test_build_vocab_and_encode_token_ids(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.textops import (
        PAD_ID,
        UNK_ID,
        build_vocab,
        encode_token_ids,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog RAN"), (3, ""), (4, None)],
        "doc_id bigint, text string",
    )
    vocab = {r["token"]: r["token_id"] for r in build_vocab(df, vocab_size=6).collect()}
    # 6 - 2 reserved = 4 entries; 'the' (count 3) gets the first id (2),
    # then count-1 tokens in lexicographic order: cat, dog, mat
    assert vocab == {"the": 2, "cat": 3, "dog": 4, "mat": 5}
    assert PAD_ID == 0 and UNK_ID == 1 and set(vocab.values()) & {0, 1} == set()

    vdf = build_vocab(df, vocab_size=6)
    got = {r["doc"]: r for r in encode_token_ids(df, vdf, "doc_id").collect()}
    assert got[1]["token_ids"] == [2, 3, 1, 1, 2, 5]  # sat/on are OOV -> UNK
    assert got[1]["n_unk"] == 2 and got[1]["n_tokens"] == 6
    assert got[2]["token_ids"] == [2, 4, 1]  # 'RAN' lower-cased, OOV
    assert got[3]["token_ids"] == [] and got[3]["n_tokens"] == 0 and got[3]["n_unk"] == 0
    assert got[4]["token_ids"] == []
    # min_count filter drops singletons entirely
    v2 = {r["token"] for r in build_vocab(df, vocab_size=10, min_count=2).collect()}
    assert v2 == {"the"}


def test_pack_sequences_zero_token_chunk_no_phantom(spark):
    """Review finding (reproduced): a zero-token chunk at a boundary used
    to underflow the piece count (Spark sequence(0,-1) counts DOWN) and
    emit a phantom seq_id=-1 all-padding sequence."""
    from xmlschemavalidator_spark.textops import pack_sequences

    chunks = spark.createDataFrame(
        [(1, 0, "", 0), (1, 1, "a b c", 3), (2, 0, "", 0)],
        "doc bigint, chunk_idx int, chunk_text string, n_tokens int",
    )
    rows = pack_sequences(chunks, 4).collect()
    assert [(r["seq_id"], r["seq_text"], r["n_tokens"]) for r in rows] == [
        (0, "a b c", 3)
    ]


def test_html_to_text_known_page(spark):
    from xmlschemavalidator_spark.textops import html_to_text

    html = (
        '<html><head><script type="x">var a = "<p>hi</p>";</script>'
        "<style>p{}</style></head><body><h1>Title</h1>"
        "<p>one &amp; two &lt;tag&gt;</p><!-- gone -->"
        '<ul><li>a</li><li>b</li></ul>after<DIV class="z">in div</div>'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None), (3, "")], "i int, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    assert got[1] == "Title\n\none & two <tag>\n\na\n\nb\n\nafter\nin div"
    assert got[2] is None and got[3] == ""


def test_html_to_text_roundtrips_escaped_testdata(spark):
    """Wrapping ws-normalized, entity-escaped real text in <p> and
    extracting recovers it exactly — the invariant the oracle's render/
    extract pair rests on."""
    import re

    from xmlschemavalidator_spark.textops import html_to_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    esc = F.replace(
        F.replace(
            F.replace(F.coalesce(F.col("text"), F.lit("")), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    out = docs.select(
        "doc_id",
        "text",
        html_to_text(F.concat(F.lit("<p>"), esc, F.lit("</p>"))).alias("t"),
    ).collect()

    def norm(s):
        s = re.sub(r"[ \t\r\f]+", " ", s or "")
        s = re.sub(r" ?\n ?", "\n", s)
        s = re.sub(r"\n{3,}", "\n\n", s)
        return re.sub(r"^\s+|\s+$", "", s)

    for r in out:
        assert r["t"] == norm(r["text"]), r["doc_id"]


def test_html_to_text_over_warc_pages(spark, tmp_path):
    """Composes with the WARC source: extract from the raw html bytes of a
    round-tripped archive."""
    from xmlschemavalidator_spark.sources.warc import read_warc, write_fake_warc
    from xmlschemavalidator_spark.textops import html_to_text

    pages = [
        {
            "url": "http://ex.com/a",
            "warc_ts": "2026-01-01T00:00:00Z",
            "html": b"<html><body><h1>A</h1><p>alpha &amp; beta</p></body></html>",
        }
    ]
    write_fake_warc(str(tmp_path / "f.warc"), pages)
    got = (
        read_warc(spark, str(tmp_path))
        .select(html_to_text(F.decode("html", "UTF-8")).alias("t"))
        .collect()
    )
    assert [r["t"] for r in got] == ["A\n\nalpha & beta"]


def test_gopher_repetition_signals_known_values(spark):
    from xmlschemavalidator_spark.textops import gopher_repetition_signals

    docs = spark.createDataFrame(
        [
            # 4 lines, 'dup' twice: line frac 2/4; chars 3+3 of 3+6+3+4=16
            (1, "dup\nunique\ndup\nmore"),
            # re-wrapped duplicate paragraphs normalize equal: para frac 1.0
            (2, "alpha  beta\n\nalpha\tbeta"),
            (3, "no repeats here"),
            (4, ""),  # no units -> NULLs
            (5, None),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc"]: r for r in gopher_repetition_signals(docs, "doc_id").collect()}
    assert got[1]["dup_line_frac"] == 0.5
    assert got[1]["dup_line_char_frac"] == round(6 / 16, 6)
    assert got[1]["dup_para_frac"] == 0.0  # one paragraph, no dup
    assert got[2]["dup_para_frac"] == 1.0
    assert got[2]["dup_line_frac"] == 1.0  # both lines normalize equal too
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["dup_para_frac"] == 0.0
    for d in (4, 5):
        assert got[d]["dup_line_frac"] is None
        assert got[d]["dup_para_char_frac"] is None


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from xmlschemavalidator_spark.textops import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc"], []).append((r["term"], r["tf"], r["score_micro"]))

    def idf_micro(dfreq, n=4):
        return math.floor((math.log((n + 1) / (dfreq + 1)) + 1.0) * 1_000_000)

    # doc 1: apple tf=2 df=1, banana tf=1 df=2 -> apple ranks first
    assert by_doc[1] == [
        ("apple", 2, 2 * idf_micro(1)),
        ("banana", 1, 1 * idf_micro(2)),
    ]
    # doc 3: cherry tf=3 df=2 beats durian tf=1 df=1
    assert by_doc[3][0] == ("cherry", 3, 3 * idf_micro(2))
    assert by_doc[3][1] == ("durian", 1, 1 * idf_micro(1))
    # token-less docs simply produce no rows
    assert 4 not in by_doc
    # k caps per-doc output
    assert all(len(v) <= 2 for v in by_doc.values())


def test_tfidf_n_docs_override_matches_count(spark):
    from xmlschemavalidator_spark.textops import tfidf_top_terms

    # orderBy before limit: an unordered limit can pick a different
    # 40-row subset on each of the several jobs this test triggers
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(40)
    )
    a = sorted(map(tuple, tfidf_top_terms(docs, "doc_id", k=3).collect()))
    b = sorted(map(tuple, tfidf_top_terms(docs, "doc_id", k=3, n_docs=40).collect()))
    assert a == b


def test_license_signals_patterns(spark):
    from xmlschemavalidator_spark.textops import license_signals

    docs = spark.createDataFrame(
        [
            (1, "Shared under Creative Commons terms."),
            (2, "cc-by-nc content here"),
            (3, "Copyright (c) 2023 Acme. All rights reserved."),
            (4, "© 2020 Somebody"),
            (5, "robots: noai, noimageai"),
            (6, "please do not train any AI model on this"),
            (7, "an ordinary document about ccby with no hits"),
            (8, None),
        ],
        "doc_id bigint, text string",
    )
    sig = license_signals(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in docs.select("doc_id", *[v.alias(k) for k, v in sig.items()]).collect()
    }
    assert got[1]["has_creative_commons"] and got[2]["has_creative_commons"]
    assert got[3]["has_all_rights_reserved"] and got[3]["has_copyright_line"]
    assert got[4]["has_copyright_line"]
    assert got[5]["has_noai_optout"] and got[6]["has_noai_optout"]
    assert not any(
        got[7][c] for c in got[7].asDict() if c.startswith("has_")
    )
    assert not any(
        got[8][c] for c in got[8].asDict() if c.startswith("has_")
    )


def test_license_noai_not_fooled_by_substrings(spark):
    from xmlschemavalidator_spark.textops import license_signals

    docs = spark.createDataFrame(
        [
            (1, "do not use email to contact us"),
            (2, "do not use the main entrance today"),
            (3, "do not train your ai on this"),
        ],
        "doc_id bigint, text string",
    )
    sig = license_signals(F.col("text"))
    got = {
        r["doc_id"]: r["has_noai_optout"]
        for r in docs.select(
            "doc_id", sig["has_noai_optout"].alias("has_noai_optout")
        ).collect()
    }
    assert got == {1: False, 2: False, 3: True}


def test_tfidf_ignores_empty_tokens_from_edged_whitespace(spark):
    from xmlschemavalidator_spark.textops import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "\nfoo bar\n"), (2, "\tfoo\t")], "doc_id bigint, text string"
    )
    rows = tfidf_top_terms(docs, "doc_id", k=5).collect()
    assert all(r["term"] != "" for r in rows)
    assert {r["term"] for r in rows if r["doc"] == 1} == {"foo", "bar"}


def test_script_signals_fractions(spark):
    from xmlschemavalidator_spark.textops import script_signals

    docs = spark.createDataFrame(
        [
            (1, "abcd 1234"),          # 8 non-ws: 4 latin, 4 digit
            (2, "Привет"),             # all cyrillic
            (3, "你好世界"),            # all cjk
            (4, "héllo"),              # accented latin counts as latin
            (5, ""),                   # no chars -> NULLs
            (6, None),
        ],
        "doc_id bigint, text string",
    )
    sig = script_signals(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in docs.select("doc_id", *[v.alias(k) for k, v in sig.items()]).collect()
    }
    assert got[1]["frac_latin"] == 0.5 and got[1]["frac_digit"] == 0.5
    assert got[2]["frac_cyrillic"] == 1.0 and got[2]["frac_latin"] == 0.0
    assert got[3]["frac_cjk"] == 1.0
    assert got[4]["frac_latin"] == 1.0
    for d in (5, 6):
        assert got[d]["frac_latin"] is None and got[d]["frac_cjk"] is None


def test_fix_mojibake_repairs_and_counts(spark):
    from xmlschemavalidator_spark.textops import (
        _MOJIBAKE_TABLE,
        fix_mojibake,
        mojibake_count,
    )

    bad_cafe = "caf" + "é".encode("utf-8").decode("cp1252")
    bad_quote = "it" + "’".encode("utf-8").decode("cp1252") + "s"
    docs = spark.createDataFrame(
        [
            (1, f"{bad_cafe} and {bad_quote} here"),
            (2, "already clean café and it’s fine"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    out = docs.select(
        "doc_id",
        fix_mojibake(F.col("text")).alias("t"),
        mojibake_count(F.col("text")).alias("n"),
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["t"] == "café and it’s here" and got[1]["n"] == 2
    # idempotent: clean text untouched, zero detections
    assert got[2]["t"] == "already clean café and it’s fine" and got[2]["n"] == 0
    assert got[3]["t"] is None and got[3]["n"] == 0
    # table hygiene: bads unique, and no bad is a substring of an
    # EARLIER (longer) bad — prefix-eating order is what matters
    bads = [b for b, _ in _MOJIBAKE_TABLE]
    assert len(bads) == len(set(bads))
    for i, b in enumerate(bads):
        assert all(b not in other for other in bads[:i]), b
    # empirical stability: fixing twice changes nothing further (true
    # idempotency is impossible — cp1252 0x94 IS the good quote char, so
    # the em-dash artifact contains a good character by construction)
    once = docs.select("doc_id", fix_mojibake(F.col("text")).alias("t"))
    twice = once.select("doc_id", fix_mojibake(F.col("t")).alias("t"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_fix_mojibake_no_cascade_on_adjacent_artifacts(spark):
    """Single-pass semantics: a replacement output must never complete a
    LATER table entry. A stray truncated artifact before a left-quote
    artifact previously collapsed both into an en-dash ('â€'+'“' is the
    en-dash artifact byte-for-byte)."""
    from xmlschemavalidator_spark.textops import fix_mojibake, mojibake_count

    stray = "’".encode("utf-8").decode("cp1252")[:2]  # 'â€' truncated
    left_q = "“".encode("utf-8").decode("cp1252")     # 'â€œ'
    txt = stray + left_q
    df = spark.createDataFrame([(1, txt)], "i bigint, t string")
    got = df.select(
        fix_mojibake(F.col("t")).alias("f"), mojibake_count(F.col("t")).alias("n")
    ).collect()[0]
    # exactly ONE artifact repaired; the stray prefix survives verbatim
    assert got["f"] == stray + "“", repr(got["f"])
    assert got["n"] == 1


def test_main_content_drops_boilerplate_keeps_body_byte_exact(spark):
    """jusText-style block classification: nav/sidebar (link-dense) and
    short footers die; body paragraphs pass through byte-exactly."""
    from xmlschemavalidator_spark.textops import main_content

    body = "The quick brown fox jumps over the lazy dog near the river bank."
    body2 = "A second paragraph long enough to clear the block length floor."
    html = (
        '<html><body>'
        '<div><a href="/">Home</a> | <a href="/about">About</a> | '
        '<a href="/contact">Contact</a></div>'
        f"<p>{body}</p>"
        '<p>read <a href="/x">this very fine longer related article</a> ok</p>'
        f"<div>{body2}</div>"
        '<div><a href="/t1">related article number one</a>'
        '<a href="/t2">related article number two</a></div>'
        "<div>(c) 2026 corp</div>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None), (3, "")], "i int, h string")
    got = {
        r["i"]: r["m"]
        for r in df.select("i", main_content(F.col("h")).alias("m")).collect()
    }
    assert got[1] == body + "\n" + body2, repr(got[1])
    assert got[2] is None and got[3] == ""


def test_main_content_matches_duckdb_replica(spark):
    """Engine parity of the FULL block pipeline (marking, extraction,
    per-block density/length, rebuild) — including unbalanced anchors."""
    import duckdb

    from xmlschemavalidator_spark.textops import main_content, main_content_sql

    pages = [
        (1, '<div><a href="/a">x</a> hub</div><p>' + "long body sentence here " * 3 + "</p>"),
        (2, "<p>unclosed <a href='/y'>anchor swallows the rest of this block"),
        (3, "<p>" + "plain prose with no links at all padded out " * 2 + "</p>"),
        (4, '<ul><li><a href="/1">one link</a></li><li><a href="/2">two link</a></li></ul>'),
        (5, None),
        (6, "<p>short</p>"),
    ]
    df = spark.createDataFrame(pages, "i int, h string")
    got = {
        r["i"]: r["m"]
        for r in df.select("i", main_content(F.col("h")).alias("m")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {main_content_sql('h')} FROM t"
        ).fetchall()
    }
    assert got == want


def test_compression_signals_exact_and_ordering(spark):
    """compression_signals matches direct zlib.compress byte counts
    exactly, and a heavily repetitive doc compresses far below prose."""
    import zlib

    from xmlschemavalidator_spark.textops import compression_signals

    prose = "the quick brown fox jumps over the lazy dog near the river bank"
    spammy = "buy now " * 40
    data = [(0, prose), (1, spammy), (2, None), (3, "")]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r["doc"]: r for r in compression_signals(df).collect()}
    for i, t in data:
        if t is None:
            assert got[i]["n_bytes"] is None
            assert got[i]["compression_ratio"] is None
        else:
            raw = t.encode("utf-8")
            assert got[i]["n_bytes"] == len(raw)
            assert got[i]["n_deflate_bytes"] == len(zlib.compress(raw, 6))
    assert got[3]["compression_ratio"] is None  # empty text: no ratio
    assert got[1]["compression_ratio"] < 0.2 < got[0]["compression_ratio"]


def test_normalize_for_dedup_cases_and_duckdb_parity(spark):
    """Aggressive dedup normalization: case/accents/punct/ws variants
    collapse to one key; the DuckDB renderer agrees byte-for-byte."""
    import duckdb

    from xmlschemavalidator_spark.textops import (
        normalize_for_dedup,
        normalize_for_dedup_sql,
    )

    cases = [
        "Café, the BEST — menu!",
        "cafe the best menu",
        "CAFE   the\tbest...menu",
        "naïve æsthetic",     # æ is NOT folded (1:1 table only)
        "  edge\x0bspace  ",  # \x0B is in the explicit ws class
        "",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r[0] for r in df.select(normalize_for_dedup(F.col("t"))).collect()]
    assert got[0] == got[1] == got[2] == "cafe the best menu"
    assert got[3] == "naive æsthetic"
    assert got[4] == "edge space"
    assert got[5] == "" and got[6] is None
    for c, g in zip(cases, got):
        if c is None:
            continue
        lit = c.replace("'", "''")
        duck = duckdb.sql(
            "select " + normalize_for_dedup_sql(f"'{lit}'")
        ).fetchone()[0]
        assert duck == g, (c, duck, g)


def test_extract_title_cases_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.textops import extract_title, extract_title_sql

    cases = [
        '<html><head><TITLE id="t">  My\n  Page </TITLE></head></html>',
        "<html><body>no title</body></html>",
        "<title><b>nested skipped</b></title>",
        '<titlebar class="x">Widget menu</title>',  # tag-name anchored
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "h string")
    got = [r[0] for r in df.select(extract_title(F.col("h"))).collect()]
    assert got == ["My Page", "", "", "", None]
    for c, g in zip(cases, got):
        if c is None:
            continue
        lit = c.replace("'", "''")
        duck = duckdb.sql(
            "select " + extract_title_sql(f"'{lit}'")
        ).fetchone()[0]
        assert duck == g, (c, duck, g)


# --- BM25 ranking -----------------------------------------------------------


def _bm25_py(docs, terms, k1_20=24, b_20=15):
    """Independent pure-Python replay of the integer BM25 (same floor'd
    idf, same rational num/den) — the engine must match EXACTLY."""
    import math

    toks = {i: t.lower().split() for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n, s = len(toks), sum(dl.values())
    scores = {}
    for term in {t.lower() for t in terms}:
        df_t = sum(1 for ts in toks.values() if term in ts)
        if df_t == 0:
            continue
        idf = math.floor(math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0) * 1e6)
        for i, ts in toks.items():
            tf = ts.count(term)
            if tf == 0:
                continue
            num = 20 * (k1_20 + 20) * s * tf
            den = 400 * s * tf + k1_20 * (20 - b_20) * s + k1_20 * b_20 * n * dl[i]
            hits, sc = scores.get(i, (0, 0))
            scores[i] = (hits + 1, sc + idf * num // den)
    return scores


def test_bm25_matches_pure_python_replay(spark):
    docs = [
        (1, "spark table spark join"),
        (2, "spark"),
        (3, "table scan row filter batch merge sort window key value"),
        (4, "hash hash hash join"),
        (5, "nothing relevant here"),
    ]
    from xmlschemavalidator_spark.textops import bm25_topk

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc"]: (r["n_hits"], r["score_micro"])
        for r in bm25_topk(df, "doc_id", ["spark", "hash"], k=10).collect()
    }
    assert got == _bm25_py(docs, ["spark", "hash"])


def test_bm25_length_normalization_and_order(spark):
    # same tf: the SHORTER doc must outrank the longer one (b > 0)
    docs = [
        (1, "spark " + "pad " * 40),
        (2, "spark pad"),
        (3, "unrelated text entirely"),
    ]
    from xmlschemavalidator_spark.textops import bm25_topk

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = bm25_topk(df, "doc_id", ["spark"], k=10).collect()
    assert [r["doc"] for r in out] == [2, 1]
    assert out[0]["score_micro"] > out[1]["score_micro"]


def test_bm25_empty_query_rejected(spark):
    from xmlschemavalidator_spark.textops import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    try:
        bm25_topk(df, "doc_id", [])
    except ValueError:
        pass
    else:
        raise AssertionError("empty query must raise")


# --- token PMI --------------------------------------------------------------


def test_pmi_collocation_wins(spark):
    # "new york" is the only recurring pair; per-doc-unique fillers keep
    # every other pair under min_pair_count
    rows_in = [
        (i, f"new york f{i}a f{i}b new york f{i}c f{i}d") for i in range(5)
    ]
    from xmlschemavalidator_spark.textops import token_pmi_topk

    df = spark.createDataFrame(rows_in, "doc_id bigint, text string")
    out = token_pmi_topk(df, "doc_id", k=5, window=2, min_pair_count=5).collect()
    assert len(out) == 1
    assert (out[0]["x"], out[0]["y"]) == ("new", "york")
    assert out[0]["c_xy"] == 10  # 2 adjacent occurrences × 5 docs


def test_pmi_window_reaches_distance_two(spark):
    rows_in = [(i, "alpha mid beta") for i in range(5)]
    from xmlschemavalidator_spark.textops import token_pmi_topk

    df = spark.createDataFrame(rows_in, "doc_id bigint, text string")
    got = {
        (r["x"], r["y"]): r["c_xy"]
        for r in token_pmi_topk(df, "doc_id", k=10, window=2, min_pair_count=5).collect()
    }
    assert got[("alpha", "beta")] == 5  # distance-2 skip-gram
    assert got[("alpha", "mid")] == 5 and got[("beta", "mid")] == 5
    w1 = {
        (r["x"], r["y"])
        for r in token_pmi_topk(df, "doc_id", k=10, window=1, min_pair_count=5).collect()
    }
    assert ("alpha", "beta") not in w1


def test_pmi_ratio_exact_integer(spark):
    rows_in = [(i, "a b") for i in range(6)]
    from xmlschemavalidator_spark.textops import token_pmi_topk

    df = spark.createDataFrame(rows_in, "doc_id bigint, text string")
    out = token_pmi_topk(df, "doc_id", k=5, window=2, min_pair_count=5).collect()
    # T=6 pairs, c_xy=6, c_a=c_b=6 → 1e6·6·6 // 36 = 1_000_000
    assert len(out) == 1 and out[0]["ratio_micro"] == 1_000_000


def test_pmi_empty_corpus(spark):
    from xmlschemavalidator_spark.textops import token_pmi_topk

    df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    assert token_pmi_topk(df, "doc_id", k=5).count() == 0


def test_flesch_reading_ease_known_values(spark):
    from xmlschemavalidator_spark.textops import flesch_reading_ease

    df = spark.createDataFrame(
        [
            (1, "The cat sat. It was happy!"),
            (2, ""),             # wordless -> NULL
            (3, None),           # NULL -> NULL
            (4, "word"),         # no sentence punct -> sentences=1
        ],
        "id bigint, text string",
    )
    got = {r["id"]: r["fre"] for r in df.select(
        "id", flesch_reading_ease(F.col("text")).alias("fre")
    ).collect()}
    # 6 words, 2 sentences, 8 vowel groups (e,a,a,I,a,a -> count them):
    # "The"(1) "cat"(1) "sat"(1) "It"(1) "was"(1) "happy"(2) = 7 syllables
    # 206.835 - 1.015*(6/2) - 84.6*(7/6) = 105.09
    assert got[1] == 105.09
    assert got[2] is None and got[3] is None
    # "word": 1 word, 1 sentence, 1 vowel group
    assert got[4] == round(206.835 - 1.015 - 84.6, 4)


def test_split_sentences_rules(spark):
    from xmlschemavalidator_spark.textops import split_sentences

    df = spark.createDataFrame(
        [
            (1, "Hi there. How are you?! Fine... ok"),
            (2, "no terminator at all"),
            (3, "trailing dot."),
            (4, None),
            (5, "Dr. Smith arrived."),  # abbreviation-blind by design
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", split_sentences(F.col("text")).alias("s")).collect()
    }
    assert got[1] == ["Hi there.", "How are you?!", "Fine...", "ok"]
    assert got[2] == ["no terminator at all"]
    assert got[3] == ["trailing dot."]
    assert got[4] == []
    assert got[5] == ["Dr.", "Smith arrived."]


def test_sentence_rows_order_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.textops import SPLIT_SENTENCES_SQL, sentence_rows

    df = spark.createDataFrame(
        [(1, "One. Two! Three? Four"), (2, "Only one"), (3, "")],
        "doc_id bigint, text string",
    )
    got = sorted(tuple(r) for r in sentence_rows(df, "doc_id").collect())
    assert got == [
        (1, 1, "One."), (1, 2, "Two!"), (1, 3, "Three?"), (1, 4, "Four"),
        (2, 1, "Only one"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(1, "One. Two! Three? Four"), (2, "Only one"), (3, "")],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""WITH s AS (SELECT doc_id AS doc,
                   {SPLIT_SENTENCES_SQL.format(x='text')} AS sents FROM t)
                SELECT doc, CAST(u.i AS INT), u.v FROM
                  (SELECT doc, unnest(list_transform(sents,
                     (x, i) -> struct_pack(i := i, v := x))) AS u FROM s)"""
        ).fetchall()
    )
    assert got == want


def test_soundex_classic_vectors_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.textops import soundex_key, soundex_key_sql

    vectors = [
        ("Robert", "R163"), ("Rupert", "R163"),
        ("Ashcraft", "A261"), ("Ashcroft", "A261"),  # h-transparency
        ("Tymczak", "T522"), ("Pfister", "P236"),    # first-letter skip
        ("Honeyman", "H555"), ("Jackson", "J250"),
        ("Washington", "W252"), ("Gutierrez", "G362"),
        ("Hmong", "H552"),  # leading-H must not eat the next consonant
        ("White", "W300"),
        ("o'Brien", "O165"),  # punctuation stripped
        ("", None), ("123", None), (None, None),
    ]
    df = spark.createDataFrame(
        [(i, n) for i, (n, _) in enumerate(vectors)], "i bigint, name string"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select("i", soundex_key(F.col("name")).alias("s")).collect()
    }
    for i, (name, want) in enumerate(vectors):
        assert got[i] == want, (name, got[i], want)
    con = duckdb.connect()
    con.execute("CREATE TABLE n (i BIGINT, name VARCHAR)")
    con.executemany(
        "INSERT INTO n VALUES (?, ?)", [(i, n) for i, (n, _) in enumerate(vectors)]
    )
    duck = dict(
        con.execute(f"SELECT i, {soundex_key_sql('name')} FROM n").fetchall()
    )
    assert duck == got


def test_tfidf_cosine_pairs_near_dup_and_hot_term_cap(spark):
    from xmlschemavalidator_spark.textops import tfidf_cosine_pairs

    docs = [
        (1, "spark shuffle partition join agg window"),
        (2, "spark shuffle partition join agg window extra"),  # near-dup of 1
        (3, "completely other topic entirely here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, "doc_id", threshold=0.8).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] > 0.85
    # cap below the shared-term df: docs 1/2 share ONLY hot terms -> no pair
    boiler = [(i, f"unique{i} BOILER PLATE SHARED") for i in range(20)]
    bdf = spark.createDataFrame(boiler, "doc_id bigint, text string")
    assert (
        tfidf_cosine_pairs(bdf, "doc_id", threshold=0.1, max_posting=5).count() == 0
    )


def test_tfidf_cosine_identical_docs_cosine_one(spark):
    from xmlschemavalidator_spark.textops import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    r = tfidf_cosine_pairs(df, "doc_id", threshold=0.5).collect()
    assert len(r) == 1 and r[0]["cosine"] == 1.0


def test_degree_assortativity_star_is_disassortative(spark):
    from xmlschemavalidator_spark.weburl import degree_assortativity

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    [r] = degree_assortativity(edges).collect()
    # star: every edge joins deg-3 center to a deg-1 leaf -> perfect
    # disassortativity
    assert r["n_edge_ends"] == 6
    assert r["assortativity"] == -1.0


def test_degree_assortativity_regular_graph_undefined(spark):
    from xmlschemavalidator_spark.weburl import degree_assortativity

    # 4-cycle: every node deg 2 -> zero variance -> NULL r
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    [r] = degree_assortativity(edges).collect()
    assert r["assortativity"] is None


def test_degree_assortativity_dedups_and_drops_self_loops(spark):
    from xmlschemavalidator_spark.weburl import degree_assortativity

    noisy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2), (0, 2), (0, 3)],
        "src long, dst long",
    )
    clean = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    assert (
        degree_assortativity(noisy).collect()
        == degree_assortativity(clean).collect()
    )


# --------------------------------------------------------------------------
# structured-data harvest: JSON-LD + <table> grids
# --------------------------------------------------------------------------


def test_extract_jsonld_blocks(spark):
    from xmlschemavalidator_spark.textops import extract_jsonld

    html = (
        "<html><head>"
        '<script type="application/ld+json">\n {"@type": "Article", "n": 1} \n</script>'
        "<script>var x = 1;</script>"
        "<SCRIPT TYPE='application/ld+json'>{\"@type\":\"Person\"}</SCRIPT>"
        "</head><body>text</body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    [r] = df.select(extract_jsonld(F.col("html")).alias("j")).collect()
    assert r["j"] == ['{"@type": "Article", "n": 1}', '{"@type":"Person"}']


def test_html_table_rows_hand_computed(spark):
    from xmlschemavalidator_spark.textops import html_table_rows

    html = (
        "<p>before</p><table class=x><tr><th>Name</th><th>Qty &amp; unit</th></tr>"
        "<tr><td><b>apples</b></td><td> 3 \n kg </td></tr>"
        "<tr><!-- empty --></tr></table>"
        "<table><tr><td>second table</td></tr></table>"
    )
    df = spark.createDataFrame([(7, html), (8, None)], "doc_id long, html string")
    got = sorted(
        (r["doc_id"], r["table_idx"], r["row_idx"], tuple(r["cells"]))
        for r in html_table_rows(df, "doc_id", "html").collect()
    )
    assert got == [
        (7, 0, 0, ("Name", "Qty & unit")),
        (7, 0, 1, ("apples", "3 kg")),
        (7, 1, 0, ("second table",)),
    ]


def test_structured_harvest_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.textops import (
        extract_jsonld,
        extract_jsonld_sql,
        html_table_rows,
        html_table_rows_sql,
    )

    htmls = [
        f'<table><tr><td>v{i}</td><td>{i} &lt; {i + 1}</td></tr>'
        f'<tr><td>u{i}</td></tr></table>'
        f'<script type="application/ld+json">{{"i": {i}}}</script>'
        for i in range(6)
    ]
    df = spark.createDataFrame(list(enumerate(htmls)), "doc long, html string")
    got_t = sorted(
        (r["doc"], r["table_idx"], r["row_idx"], tuple(r["cells"]))
        for r in html_table_rows(df, "doc", "html").collect()
    )
    got_j = sorted(
        (r["doc"], tuple(r["j"]))
        for r in df.select("doc", extract_jsonld(F.col("html")).alias("j")).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc": range(6), "html": htmls}))
    ot = sorted(
        (d, ti, ri, tuple(c))
        for d, ti, ri, c in con.execute(
            f"SELECT doc, e.table_idx, e.row_idx, e.cells FROM "
            f"(SELECT doc, unnest({html_table_rows_sql('html')}) AS e FROM t) "
            f"WHERE len(e.cells) > 0"
        ).fetchall()
    )
    oj = sorted(
        (d, tuple(j))
        for d, j in con.execute(
            f"SELECT doc, {extract_jsonld_sql('html')} FROM t"
        ).fetchall()
    )
    assert got_t == ot and got_j == oj


def test_declared_charset_forms(spark):
    from xmlschemavalidator_spark.textops import declared_charset

    cases = [
        ('<meta charset="UTF-8">', "utf-8"),
        ("<META CHARSET=utf-8>", "utf-8"),
        ("<meta charset = 'ISO-8859-1' >", "iso-8859-1"),
        ('<meta http-equiv="Content-Type" content="text/html; charset=Windows-1252">',
         "windows-1252"),
        ("<meta name=viewport content=width>", None),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "html string")
    got = [r[0] for r in df.select(declared_charset(F.col("html"))).collect()]
    assert got == [c[1] for c in cases]


def test_nfc_flags_decomposed_detected(spark):
    from xmlschemavalidator_spark.textops import nfc_flags

    rows = [
        (1, "café"),          # composed: NFC
        (2, "café"),         # decomposed: not NFC
        (3, "plain ascii"),
        (4, None),
        (5, "Ḍ̇"),       # D-dot-above + dot-below: NFC reorders
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r["is_nfc"] for r in nfc_flags(df, "doc_id").collect()}
    assert got == {1: True, 2: False, 3: True, 4: None, 5: False}


def test_badword_stats_whole_token_case_insensitive(spark):
    import pytest as _pt

    from xmlschemavalidator_spark.textops import badword_stats

    rows = [
        (1, "the CLASS discusses art"),     # 'ass' must not trip inside words
        (2, "plain bad token here"),
        (3, "BAD bad bAd"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: (r["n_tokens"], r["n_bad"], r["bad_micro"], r["keep"])
           for r in badword_stats(df, "doc_id", ["bad", "ass"]).collect()}
    assert got[1] == (4, 0, 0, True)
    assert got[2] == (4, 1, 250_000, False)
    assert got[3] == (3, 3, 1_000_000, False)
    assert got[4][1] == 0 and got[4][3] is True  # NULL text: zero tokens
    assert got[5] == (0, 0, None, True)
    with _pt.raises(ValueError):
        badword_stats(df, "doc_id", [])


def test_lexical_diversity_ttr_and_msttr(spark):
    from xmlschemavalidator_spark.textops import lexical_diversity

    rows = [
        (1, "a b c d e f"),               # 6 tokens, 6 types
        (2, "spam " * 10),                # 10 tokens, 1 type
        (3, " ".join(f"w{i % 4}" for i in range(12))),  # windows of 4
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: (r["n_tokens"], r["n_types"], r["ttr_micro"], r["msttr_micro"])
           for r in lexical_diversity(df, "doc_id", window=4).collect()}
    assert got[1] == (6, 6, 1_000_000, 1_000_000)  # one full window of 4: 4/4
    assert got[2][2] == 100_000  # 1/10
    # doc 3: tokens w0 w1 w2 w3 repeating; every 4-window has 4 types
    assert got[3] == (12, 4, 333_333, 1_000_000)
    assert got[4] == (0, 0, None, None)
    # doc 2 windows: two full windows of 'spam' -> msttr 1/4
    assert got[2][3] == 250_000


def test_rake_keywords_hand_computed(spark):
    from xmlschemavalidator_spark.textops import rake_keywords

    df = spark.createDataFrame(
        [
            # phrases: "deep learning" / "deep networks"; deep deg4 freq2,
            # learning deg2 freq1, networks deg2 freq1 -> both phrases 4e6
            (1, "Deep learning of deep networks."),
            # "learning rocks" 3.5e6 beats "learning" 1.5e6
            (2, "learning rocks and learning"),
            # a 5-token run exceeds the phrase cap and drops entirely
            (3, "alpha beta gamma delta epsilon. short one"),
        ],
        "doc_id long, text string",
    )
    out = rake_keywords(df, stopwords=["of", "and", "one"], k=3,
                        max_phrase_tokens=4).collect()
    d1 = {r["phrase"]: r for r in out if r["doc"] == 1}
    assert d1["deep learning"]["score_micro"] == 4_000_000
    assert d1["deep learning"]["rank"] == 1  # tie broken by phrase text
    assert d1["deep networks"]["rank"] == 2
    d2 = {r["phrase"]: r for r in out if r["doc"] == 2}
    assert d2["learning rocks"]["score_micro"] == 3_500_000
    assert d2["learning"]["score_micro"] == 1_500_000
    d3 = [r["phrase"] for r in out if r["doc"] == 3]
    assert d3 == ["short"]  # the capped run vanished, 'one' was a stopword


def test_extract_dates_three_forms_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.textops import extract_dates, extract_dates_sql

    txt = (
        "Published 2024-03-07, updated 3/9/2024 and again on "
        "December 5, 2025. Bogus: 2024-13-40, 13/45/2024, Smarch 3, 2024."
    )
    df = spark.createDataFrame([(txt,)], "t string")
    [got] = df.select(extract_dates(F.col("t")).alias("d")).collect()
    assert got["d"] == ["2024-03-07", "2024-03-09", "2025-12-05"]
    tt = txt.replace("'", "''")
    d = duckdb.sql(
        f"select {extract_dates_sql('t')} from (select '{tt}' as t)"
    ).fetchone()[0]
    assert d == got["d"]


def test_extract_money_cents_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.textops import (
        extract_money_cents,
        extract_money_cents_sql,
    )

    txt = ("priced at $1,234.56 or $ 99 - was $0.99, never $12.345 "
           "nor $12,3456 but $5 yes")
    df = spark.createDataFrame([(txt,)], "t string")
    [got] = df.select(extract_money_cents(F.col("t")).alias("m")).collect()
    # the malformed 3-decimal / 4-group amounts are FILTERED (the RE2-safe
    # junk-detector group), never half-parsed as $12
    assert got["m"] == [123456, 9900, 99, 500]
    tt = txt.replace("'", "''")
    d = duckdb.sql(
        f"select {extract_money_cents_sql('t')} from (select '{tt}' as t)"
    ).fetchone()[0]
    assert d == got["m"]


def test_mixed_script_words_homoglyph_detection(spark):
    import duckdb

    from xmlschemavalidator_spark.textops import (
        mixed_script_words,
        mixed_script_words_sql,
    )

    # 'pаypal' carries a Cyrillic а; 'Μicrosoft' a Greek Μ; pure-Latin
    # and pure-Cyrillic words are NOT mixed
    rows = [
        (1, "login at pаypal now"),
        (2, "Μicrosoft support desk"),
        (3, "привет мир plain russian then english words"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = mixed_script_words(F.col("text"))
    got = {r["doc_id"]: r for r in
           df.select("doc_id", *(c.alias(k) for k, c in sig.items())).collect()}
    assert got[1]["n_mixed_script"] == 1 and got[1]["first_mixed"] == "pаypal"
    assert got[1]["mixed_per_million"] == 1_000_000 // 4
    assert got[2]["n_mixed_script"] == 1
    assert got[3]["n_mixed_script"] == 0 and got[3]["first_mixed"] is None
    assert got[4]["n_words"] == 0 and got[4]["mixed_per_million"] is None

    sqls = mixed_script_words_sql("t")
    con = duckdb.connect()
    for doc_id, txt in rows:
        lit = "NULL" if txt is None else "'" + txt.replace("'", "''") + "'"
        d = con.execute(
            f"select {sqls['n_words']}, {sqls['n_mixed_script']}, "
            f"{sqls['first_mixed']}, {sqls['mixed_per_million']} "
            f"from (select {lit} as t)"
        ).fetchone()
        r = got[doc_id]
        assert tuple(d) == (r["n_words"], r["n_mixed_script"],
                            r["first_mixed"], r["mixed_per_million"]), doc_id


def test_textrank_edges_window_and_filter(spark):
    """Positions survive masking: stopwords keep separating distant
    words (no edge across a >window gap even after the stopword is
    filtered out of the graph)."""
    from xmlschemavalidator_spark.textops import textrank_edges

    df = spark.createDataFrame(
        [("Graph rank; the quality signal!",)], "text string"
    )
    # tokens: graph rank the quality signal; candidates mask 'the' to ''
    # window=2 pairs: (graph,rank) (rank,quality via gap over 'the')
    # (quality,signal)... rank-the (masked), the-quality (masked)
    edges = {
        (r.src, r.dst)
        for r in textrank_edges(df, window=2).collect()
    }
    und = {t for t in edges if t[0] < t[1]}
    assert und == {
        ("graph", "rank"),
        ("quality", "rank"),
        ("quality", "signal"),
    }
    # bidirectional and self-loop-free
    assert all((b, a) in edges for a, b in edges)
    # window=1 cannot jump the masked stopword
    edges1 = {
        (r.src, r.dst)
        for r in textrank_edges(df, window=1).collect()
        if r.src < r.dst
    }
    assert edges1 == {("graph", "rank"), ("quality", "signal")}


def test_textrank_hub_word_wins(spark):
    """A word co-occurring with every other candidate out-ranks
    peripheral words; stopwords never appear."""
    from xmlschemavalidator_spark.textops import textrank_keywords

    rows = [
        ("spark hub engine",),
        ("quality hub metric",),
        ("graph hub vertex",),
        ("the and of with",),
    ]
    df = spark.createDataFrame(rows, "text string")
    top = textrank_keywords(df, k=10, window=2, iterations=6).collect()
    assert top[0]["word"] == "hub"
    words = {r["word"] for r in top}
    assert "the" not in words and "and" not in words
    assert all(r["rank_micro"] > 0 for r in top)


def test_burrows_delta_attributes_planted_styles(spark):
    """Two planted styles: group A over-uses 'whilst', group B 'very'.
    Held-in docs attribute to their own style; a B-styled doc declared
    as A is pulled toward B (the template-attribution use case)."""
    from xmlschemavalidator_spark.textops import burrows_delta_attribution

    a_text = "whilst data whilst table whilst row scan"
    b_text = "very data very table very row scan"
    rows = [
        (0, "A", a_text), (1, "A", a_text + " whilst key"),
        (2, "A", a_text + " whilst agg"),
        (3, "B", b_text), (4, "B", b_text + " very key"),
        (5, "B", b_text + " very agg"),
        # declared A, written in B's style
        (6, "A", b_text + " very very"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc"]: r
        for r in burrows_delta_attribution(df, top_words=10).collect()
    }
    assert len(out) == 7
    for d in (3, 4, 5):
        assert out[d]["attributed_source"] == "B"
    assert out[6]["declared_source"] == "A"
    assert out[6]["attributed_source"] == "B"
    assert all(r["delta_micro"] >= 0 for r in out.values())


def test_emerging_terms_flags_planted_burst(spark):
    """'rocket' appears only in late buckets → flagged there with a
    high ratio; the stable background word never flags; bucket 0 has
    no baseline and cannot flag."""
    from xmlschemavalidator_spark.textops import emerging_terms

    rows = []
    for b in range(4):
        for i in range(6):
            txt = "data table row scan key value"
            if b >= 2:
                txt += " rocket rocket"
            rows.append((b, txt))
    df = spark.createDataFrame(rows, "bucket long, text string")
    out = emerging_terms(
        df, "bucket", min_count=5, ratio_micro_min=3_000_000
    ).collect()
    flagged = {(r["bucket"], r["word"]) for r in out}
    assert (2, "rocket") in flagged
    assert all(w == "rocket" for _, w in flagged)
    assert all(b > 0 for b, _ in flagged)
    r2 = next(r for r in out if r["bucket"] == 2 and r["word"] == "rocket")
    # bucket 2: c=12, c_prev=0, t=48, t_prev=72 → 1e6·12·73 div 48·1
    assert r2["c"] == 12 and r2["c_prev"] == 0
    assert r2["ratio_micro"] == 18_250_000


def test_heaps_exponent_hand_computed(spark):
    from xmlschemavalidator_spark.textops import heaps_exponent

    # subset: tokens a,b (2 tokens, 2 vocab); full: a,b,a,c,d,d
    # (6 tokens, 4 vocab) -> beta = ln(4/2)/ln(6/2)
    import math

    rows = [("a", True), ("b", True), ("a", False), ("c", False),
            ("d", False), ("d", False)]
    df = spark.createDataFrame(rows, "w string, sub boolean")
    [r] = heaps_exponent(df, "w", "sub").collect()
    assert (r["n_tokens_sub"], r["n_tokens_full"]) == (2, 6)
    assert (r["vocab_sub"], r["vocab_full"]) == (2, 4)
    assert r["beta"] == round(math.log(2) / math.log(3), 6)

    # saturated vocabulary: subset already saw every type -> beta 0,
    # NOT null (the template-collapse signal)
    rows2 = [("x", True), ("y", True), ("x", False), ("y", False)]
    [r2] = heaps_exponent(
        spark.createDataFrame(rows2, "w string, sub boolean"), "w", "sub"
    ).collect()
    assert r2["beta"] == 0.0

    # degenerate: empty subset -> NULL beta
    rows3 = [("x", False), ("y", False)]
    [r3] = heaps_exponent(
        spark.createDataFrame(rows3, "w string, sub boolean"), "w", "sub"
    ).collect()
    assert r3["beta"] is None

    # subset == full corpus -> NULL (no second point to fit)
    rows4 = [("x", True), ("y", True)]
    [r4] = heaps_exponent(
        spark.createDataFrame(rows4, "w string, sub boolean"), "w", "sub"
    ).collect()
    assert r4["beta"] is None


def test_prf_expansion_and_retrieval(spark):
    import math

    from xmlschemavalidator_spark.textops import (
        bm25_topk,
        prf_bm25_topk,
        prf_expansion_terms,
    )

    # corpus: docs about "spark" co-mention "shuffle"; one relevant doc
    # uses ONLY the co-term (the vocabulary-mismatch case PRF exists for)
    rows = [
        (1, "spark shuffle partition spark"),
        (2, "spark shuffle executor"),
        (3, "shuffle partition executor"),     # relevant, no query term
        (4, "cat dog bird"),
        (5, "dog bird fish"),
        (6, "spark shuffle spark memory"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp = prf_expansion_terms(df, "doc_id", ["spark"], r=3, n_expand=2).collect()
    terms = [r["term"] for r in exp]
    assert terms[0] == "shuffle"  # in every pseudo-relevant doc
    assert exp[0]["rank"] == 1 and exp[0]["rel_tf"] == 3
    # hand replay of the weight: idf = ln((N+1)/(df+1)) + 1, micro-floored
    idf = math.floor((math.log(7 / 5) + 1.0) * 1_000_000)  # shuffle df=4
    assert exp[0]["weight_micro"] == 3 * idf
    # original query terms never expand
    assert "spark" not in terms

    # end-to-end: doc 3 is unreachable by the original query but ranks
    # after expansion
    base = {r["doc"] for r in bm25_topk(df, "doc_id", ["spark"], k=6).collect()}
    prf = {r["doc"] for r in prf_bm25_topk(
        df, "doc_id", ["spark"], r=3, n_expand=2, k=6
    ).collect()}
    assert 3 not in base and 3 in prf


def test_code_switch_report(spark):
    from xmlschemavalidator_spark.textops import code_switch_report

    en = "the cat and the dog was in that house for it is the thing"
    de = "der hund und die katze ist nicht mit der maus auf der wiese zu"
    fr = "le chat est dans les maisons et pas une pour que dans le parc"
    rows = [
        (1, en + "\n\n" + en + "\n\n" + de),     # mixed: 2 en, 1 de
        (2, en + "\n\n" + en),                    # pure en
        (3, "x\n\n" + fr),                        # tiny para skipped, pure fr
        (4, "zz qq ww ee rr tt yy uu ii oo pp"),  # no stopwords -> und only
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r for r in code_switch_report(df, "doc_id").collect()}
    # docs 4 (all-und) and 5 (null) produce no row
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert (r1["n_paras_scored"], r1["n_langs"]) == (3, 2)
    assert r1["dominant_lang"] == "en" and r1["mixed"] is True
    assert r1["dominant_share_micro"] == 2 * 1_000_000 // 3
    assert got[2]["mixed"] is False and got[2]["dominant_share_micro"] == 1_000_000
    assert got[3]["n_paras_scored"] == 1 and got[3]["dominant_lang"] == "fr"

    # deterministic tie-break: 1 en + 1 de paragraphs -> earliest code wins
    tie = spark.createDataFrame([(9, en + "\n\n" + de)], "doc_id long, text string")
    [rt] = code_switch_report(tie, "doc_id").collect()
    assert rt["dominant_lang"] == "de" and rt["dominant_share_micro"] == 500_000


def test_tokenizer_fertility_hand_computed(spark):
    from xmlschemavalidator_spark.textops import tokenizer_fertility

    rows = [
        ("en", "cat dog"),                 # 7 chars, 2 ws, 2 bpe pieces
        ("en", "extraordinary"),           # 13 chars, 1 ws, 1+1 (7+ run) bpe
        ("zz", ""),                        # empty: 0 everything
        ("de", "a-b"),                     # 3 chars, 1 ws, 3 bpe (a, -, b)
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r for r in tokenizer_fertility(df, "lang").collect()}
    en = got["en"]
    assert (en["n_docs"], en["n_chars"], en["n_ws_tokens"]) == (2, 20, 3)
    assert en["n_bpe_tokens"] == 2 + 2
    assert en["chars_per_ws_token"] == round(20 / 3, 6)
    assert en["bpe_per_ws_ratio"] == round(4 / 3, 6)
    de = got["de"]
    assert de["n_bpe_tokens"] == 3 and de["n_ws_tokens"] == 1
    # empty lang: NULL ratios, never div/0
    zz = got["zz"]
    assert zz["n_ws_tokens"] == 0 and zz["chars_per_ws_token"] is None


def test_ngram_novelty(spark):
    from xmlschemavalidator_spark.textops import ngram_novelty

    rows = [
        (1, "a b c d"),        # grams: "a b c", "b c d"
        (2, "a b c x"),        # shares "a b c" with doc 1
        (3, "p q r s t"),      # all unique
        (4, "x y"),            # too short: no grams, no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r for r in ngram_novelty(df, "doc_id").collect()}
    assert set(got) == {1, 2, 3}
    # doc 1: "a b c" df=2 (shared), "b c d" df=1 -> novelty 1/2
    assert (got[1]["n_grams"], got[1]["n_novel"]) == (2, 1)
    assert got[1]["novelty_micro"] == 500_000
    assert got[2]["n_novel"] == 1
    # doc 3: all three grams unique -> novelty 1
    assert got[3]["n_grams"] == 3 and got[3]["novelty_micro"] == 1_000_000

    # within-doc repetition does NOT help novelty: shingles are distinct
    rep = spark.createDataFrame([(9, "z z z z z z")], "doc_id long, text string")
    [rr] = ngram_novelty(rep, "doc_id").collect()
    assert rr["n_grams"] == 1 and rr["novelty_micro"] == 1_000_000

    # a doc duplicated exactly zeroes both copies' novelty
    dup = spark.createDataFrame(
        [(1, "m n o p"), (2, "m n o p")], "doc_id long, text string"
    )
    for r in ngram_novelty(dup, "doc_id").collect():
        assert r["novelty_micro"] == 0


def test_keyness_terms(spark):
    import math

    from xmlschemavalidator_spark.textops import keyness_terms

    # corpus A is about cats, B about dogs; 'the' is common noise
    a = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "cat cat cat")],
        "id long, text string",
    )
    b = spark.createDataFrame(
        [(1, "the dog sat"), (2, "the dog ran"), (3, "dog dog dog")],
        "id long, text string",
    )
    got = keyness_terms(a, b, k=3, min_count=2).collect()
    by_dir = {}
    for r in got:
        by_dir.setdefault(r["enriched_in"], []).append(r)
    assert by_dir["a"][0]["term"] == "cat" and by_dir["a"][0]["rank"] == 1
    assert by_dir["b"][0]["term"] == "dog"
    # 'the' appears equally: G2 ~ 0, ranks below the key terms
    the = [r for r in got if r["term"] == "the"]
    assert all(r["g2_micro"] <= 1 for r in the)

    # replay the G2 of 'cat': a=5,b=0, na=9,nb=9
    na = nb = 9
    aa, bb = 5, 0
    r1 = aa + bb
    n = na + nb

    def t(o, e):
        return o * math.log(o / e) if o > 0 else 0.0

    g2 = 2 * (
        t(aa, na * r1 / n) + t(bb, nb * r1 / n)
        + t(na - aa, na * (n - r1) / n) + t(nb - bb, nb * (n - r1) / n)
    )
    cat = [r for r in got if r["term"] == "cat"][0]
    assert cat["g2_micro"] == math.floor(g2 * 1e6)
    assert (cat["n_ta"], cat["n_tb"]) == (5, 0)

    # min_count drops rare noise: singleton terms never scored
    assert all(r["n_ta"] + r["n_tb"] >= 2 for r in got)


def test_term_dispersion_gries_dp(spark):
    import math

    from xmlschemavalidator_spark.textops import term_dispersion

    # two equal-size parts; 'bursty' lives only in part A, 'even' in both
    rows = [
        ("A", "even bursty even bursty bursty"),
        ("A", "even bursty bursty even bursty"),
        ("B", "even even even even even"),
        ("B", "even even even even even"),
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    got = {r["term"]: r for r in
           term_dispersion(df, "src", k=5, min_count=3).collect()}
    assert set(got) == {"even", "bursty"}
    # part shares: A 10/20, B 10/20. bursty: all 6 in A -> DP = .5*(|1-.5|+.5)=.5
    b = got["bursty"]
    assert b["n_parts_present"] == 1 and b["dp_micro"] == 500_000
    assert b["rank"] == 1  # burstier ranks first
    # even: 4/14 in A, 10/14 in B vs .5/.5
    ev = got["even"]
    dev = round(abs(4 / 14 - 0.5), 12) + round(abs(10 / 14 - 0.5), 12)
    want = math.floor((dev + (1.0 - 1.0)) / 2.0 * 1e6)
    assert ev["dp_micro"] == want and ev["n_parts_present"] == 2

    # a perfectly proportional term -> DP 0
    prop = [("A", "x x y"), ("B", "x x z")]
    gp = {r["term"]: r for r in term_dispersion(
        spark.createDataFrame(prop, "src string, text string"),
        "src", k=5, min_count=2,
    ).collect()}
    assert gp["x"]["dp_micro"] == 0


def test_token_logdice_topk(spark):
    import math

    from xmlschemavalidator_spark.textops import token_logdice_topk

    # 'hong kong' always together; 'the cat' together but 'the' everywhere
    rows = [
        (1, "hong kong is big"),
        (2, "hong kong at night"),
        (3, "the cat the dog the bird"),
        (4, "the cat the mat the hat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = token_logdice_topk(df, "doc_id", k=5, min_pair_count=2).collect()
    by_pair = {(r["x"], r["y"]): r for r in got}
    hk = by_pair[("hong", "kong")]
    # exclusive pair: dice = 2*2/(2+2) = 1 -> logdice = 14
    assert hk["dice_micro"] == 1_000_000 and hk["logdice"] == 14.0
    # every exclusive pair ties at dice 1.0; ties break x asc, so the
    # top block is all dice_micro == 1e6 and 'hong kong' is in it
    assert got[0]["dice_micro"] == 1_000_000
    # 'the dog': c_xy=2 (positions 3-4, 4-5 of doc 3), c_the=6, c_dog=1
    td = by_pair[("dog", "the")]
    assert td["c_xy"] == 2
    assert td["dice_micro"] == 2 * 2 * 1_000_000 // (1 + 6)
    assert td["logdice"] == round(
        14 + math.log(2 * 2 / (1 + 6)) / math.log(2), 6
    )
    # ranking follows the integer key monotonically
    keys = [r["dice_micro"] for r in got]
    assert keys == sorted(keys, reverse=True)


def test_ql_dirichlet_topk(spark):
    import math

    from xmlschemavalidator_spark.textops import ql_dirichlet_topk

    rows = [
        (1, "spark spark shuffle"),
        (2, "spark memory"),
        (3, "cat dog bird"),
        (4, ""),                       # zero tokens still scores
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ql_dirichlet_topk(df, "doc_id", ["spark"], k=4, mu=100).collect()
    assert [r["doc"] for r in got[:2]] == [1, 2]  # tf monotone
    assert {r["doc"] for r in got} == {1, 2, 3, 4}  # every doc scored
    # replay doc 1: S=8 tokens, cf=3, dl=3, tf=2
    S, cf, mu = 8, 3, 100
    want = math.floor(
        math.log((2 * float(S) + float(mu * cf)) / (float(S) * (3 + float(mu))))
        * 1_000_000
    )
    d1 = [r for r in got if r["doc"] == 1][0]
    assert d1["score_micro"] == want and d1["n_hits"] == 1
    # the empty doc outranks nothing with hits but still has a score
    d4 = [r for r in got if r["doc"] == 4][0]
    assert d4["n_hits"] == 0 and d4["score_micro"] is not None
    # doc 3 (dl=3, tf=0) vs doc 4 (dl=0): shorter doc scores HIGHER at
    # tf=0 (the length prior)
    d3 = [r for r in got if r["doc"] == 3][0]
    assert d4["score_micro"] > d3["score_micro"]

    import pytest as _pt

    with _pt.raises(ValueError):
        ql_dirichlet_topk(df, "doc_id", [])
