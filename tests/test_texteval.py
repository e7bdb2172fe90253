"""texteval.py — corpus BLEU and micro ROUGE-N.

Hand-computed fixtures: the ACL'02 clipping example (p1 = 2/7), a
two-pair corpus whose precisions/BP are derivable on paper, and the
degenerate orders/empty edges.
"""

from __future__ import annotations

import math

from xmlschemavalidator_spark.texteval import corpus_bleu, ngram_match_counts, rouge_n


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id long, cand string, ref string")


def test_bleu_clipping_example(spark):
    # Papineni et al. §2.1: candidate "the"*7 vs "the cat is on the mat"
    df = _pairs(spark, [(0, "the the the the the the the", "the cat is on the mat")])
    [r] = corpus_bleu(df, "cand", "ref", "id", max_order=1).collect()
    assert r["p1"] == round(2 / 7, 6)
    assert r["bleu"] == round(2 / 7, 6)  # cand longer than ref -> BP = 1
    assert r["brevity_penalty"] == 1.0


def test_bleu_identity_and_brevity(spark):
    # identical texts: every p_n = 1, BLEU = BP = 1
    df = _pairs(spark, [(0, "a b c d e", "a b c d e")])
    [r] = corpus_bleu(df, "cand", "ref", "id").collect()
    assert (r["p1"], r["p2"], r["p3"], r["p4"]) == (1.0, 1.0, 1.0, 1.0)
    assert r["bleu"] == 1.0
    # drop one token: BP = exp(1 - 5/4), p_n still 1
    df = _pairs(spark, [(0, "a b c d", "a b c d e")])
    [r] = corpus_bleu(df, "cand", "ref", "id").collect()
    assert r["brevity_penalty"] == round(math.exp(1 - 5 / 4), 6)
    assert r["bleu"] == round(math.exp(1 - 5 / 4), 6)


def test_bleu_zero_clip_and_undefined_order(spark):
    # no 2-gram overlap: p2 = 0 -> bleu = 0 (canonical, no smoothing)
    df = _pairs(spark, [(0, "a x b y c", "a b c")])
    [r] = corpus_bleu(df, "cand", "ref", "id", max_order=2).collect()
    assert r["p2"] == 0.0 and r["bleu"] == 0.0
    # every doc shorter than 4 tokens: order-4 total = 0 -> NULL bleu
    df = _pairs(spark, [(0, "a b", "a b")])
    [r] = corpus_bleu(df, "cand", "ref", "id", max_order=4).collect()
    assert r["p4"] is None and r["bleu"] is None


def test_match_counts_and_null_rows(spark):
    df = _pairs(
        spark,
        [(0, "a b a", "a a c"), (1, None, "x"), (2, "y", None)],
    )
    rows = {r["n"]: r for r in ngram_match_counts(df, "cand", "ref", "id", 2).collect()}
    # unigrams: cand {a:2, b:1}, ref {a:2, c:1} -> clipped min(2,2)=2
    assert (rows[1]["clipped"], rows[1]["cand_total"], rows[1]["ref_total"]) == (2, 3, 3)
    # bigrams: cand {ab, ba}, ref {aa, ac} -> 0 overlap
    assert (rows[2]["clipped"], rows[2]["cand_total"], rows[2]["ref_total"]) == (0, 2, 2)


def test_rouge_lead_shape(spark):
    # lead-2 "summary" of a 4-token doc: precision 1, recall 1/2
    df = _pairs(spark, [(0, "a b", "a b c d")])
    rows = {r["n"]: r for r in rouge_n(df, "cand", "ref", "id", max_order=2).collect()}
    assert rows[1]["precision"] == 1.0 and rows[1]["recall"] == 0.5
    assert rows[1]["f1"] == round(2 * 2 / (2 + 4), 6)
    assert rows[2]["precision"] == 1.0 and rows[2]["recall"] == round(1 / 3, 6)
    # disjoint: f1 = 0.0 (defined), not NULL
    df = _pairs(spark, [(0, "x y", "a b")])
    rows = {r["n"]: r for r in rouge_n(df, "cand", "ref", "id", max_order=1).collect()}
    assert rows[1]["f1"] == 0.0


def test_rouge_empty_side_null_ratios(spark):
    df = _pairs(spark, [(0, "", "a b")])
    rows = {r["n"]: r for r in rouge_n(df, "cand", "ref", "id", max_order=1).collect()}
    assert rows[1]["precision"] is None  # no candidate grams
    assert rows[1]["recall"] == 0.0


# ---------------------------------------------------------------------------
# corpus_wer / wer_per_doc
# ---------------------------------------------------------------------------


def test_wer_hand_computed(spark):
    import pytest

    from xmlschemavalidator_spark.texteval import corpus_wer, wer_per_doc

    rows = [
        (0, "a b c d", "a b c d"),      # 0 edits / 4
        (1, "a x c", "a b c"),          # 1 substitution / 3
        (2, "a b", "a b c d"),          # 2 deletions / 4
        (3, "z a b", "a b"),            # 1 insertion / 2
        (4, "", ""),                    # empty/empty: 0 edits, 0 ref
    ]
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    [r] = corpus_wer(df, "cand", "ref", "id").collect()
    assert (r["n_pairs"], r["total_edits"], r["total_ref_tokens"]) == (5, 4, 13)
    assert r["wer"] == round(4 / 13, 6)
    per = {x["id"]: x for x in wer_per_doc(df, "cand", "ref", "id").collect()}
    assert per[1]["edits"] == 1 and per[1]["wer"] == round(1 / 3, 6)
    assert per[3]["edits"] == 1 and per[3]["wer"] == 0.5
    assert per[4]["wer"] is None  # empty reference window
    with pytest.raises(ValueError):
        corpus_wer(df, "cand", "ref", "id", max_tokens=200)


def test_wer_transposition_costs_two_words(spark):
    # word swap = 1 sub + 1 sub (or del+ins) = 2 edits — the
    # alignment-strict behavior BLEU doesn't have
    from xmlschemavalidator_spark.texteval import wer_per_doc

    df = spark.createDataFrame(
        [(0, "b a c", "a b c")], "id long, cand string, ref string"
    )
    [r] = wer_per_doc(df, "cand", "ref", "id").collect()
    assert r["edits"] == 2


def test_wer_window_contract(spark):
    # tokens beyond max_tokens are invisible to the metric
    from xmlschemavalidator_spark.texteval import wer_per_doc

    long_ref = " ".join(f"t{i}" for i in range(30))
    cand = " ".join(f"t{i}" for i in range(9)) + " XX"  # 10th token differs
    df = spark.createDataFrame(
        [(0, cand, long_ref)], "id long, cand string, ref string"
    )
    [r] = wer_per_doc(df, "cand", "ref", "id", max_tokens=10).collect()
    # ref truncates to t0..t9; cand's XX substitutes t9; t10.. invisible
    assert r["ref_tokens"] == 10 and r["edits"] == 1


# ---------------------------------------------------------------------------
# corpus_chrf
# ---------------------------------------------------------------------------


def test_chrf_identity_and_empty(spark):
    from xmlschemavalidator_spark.texteval import corpus_chrf

    df = _pairs(spark, [(0, "hello world", "hello world")])
    [r] = corpus_chrf(df, "cand", "ref", "id").collect()
    # whitespace stripped: 'helloworld' vs itself -> P = R = chrF = 1
    assert (r["chr_p"], r["chr_r"], r["chrf"]) == (1.0, 1.0, 1.0)
    df = _pairs(spark, [(0, "", "")])
    [r] = corpus_chrf(df, "cand", "ref", "id").collect()
    assert r["chrf"] is None  # no effective orders anywhere


def test_chrf_hand_computed_unigram(spark):
    from xmlschemavalidator_spark.texteval import corpus_chrf

    # cand 'aab' vs ref 'abb' at max_order=1: clip = min(2,1)+min(1,2)=2
    # P = R = 2/3; chrF = (1+4)*P*R/(4P+R) = 5*(4/9)/(10/3) = 2/3
    df = _pairs(spark, [(0, "aab", "abb")])
    [r] = corpus_chrf(df, "cand", "ref", "id", max_order=1).collect()
    assert r["chr_p"] == round(2 / 3, 6) and r["chr_r"] == round(2 / 3, 6)
    assert r["chrf"] == round(2 / 3, 6)


def test_chrf_recall_weighting(spark):
    from xmlschemavalidator_spark.texteval import corpus_chrf

    # candidate is a strict prefix: P = 1 on every effective order,
    # R < 1 -> beta=2 pulls chrF toward R (chrF < (P+R)/2)
    df = _pairs(spark, [(0, "abcde", "abcdefghij")])
    [r] = corpus_chrf(df, "cand", "ref", "id").collect()
    assert r["chr_p"] == 1.0 and r["chr_r"] < 1.0
    assert r["chrf"] < (r["chr_p"] + r["chr_r"]) / 2 + 1e-9
