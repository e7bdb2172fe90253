"""Reference-based text-generation metrics: corpus BLEU and ROUGE-N.

The pipeline produces text transforms end-to-end (mojibake repair,
main-content extraction, dedup span removal, chunking) and evaluation
analyzers for CLASSIFIERS (roc_auc, calibration, conformal) — but had
no way to grade a TEXT against a reference text, which is how
extraction/repair/summarization quality is actually reported. These two
close that loop at corpus level with the repo's exactness contract.

Both metrics ride ONE shared n-gram match-count pass
(:func:`ngram_match_counts`): per (doc, order, gram) candidate/reference
counts meet in a single partial-aggregatable groupBy, clipped counts are
exact integer ``min``s, and the per-order sums are DECIMAL — so BLEU's
modified precisions (Papineni et al. ACL'02 §2.1) and ROUGE-N's
micro-averaged overlap (Lin 2004, corpus-level variant) are exact
rationals; only BLEU's final geometric mean touches floats, as
floor-quantized micro-ln terms summed in BIGINT (the shared libm/floor
contract) plus one exactly-rounded IEEE division for the brevity ratio.

Tokenization spells the explicit whitespace class (textops._WS) on BOTH
engines — the Java-\\s-vs-RE2-\\s \\x0B divergence documented in
CLAUDE.md never enters.

Scale shape: the only shuffle is the (doc, order, gram) groupBy —
token-scale × max_order, partial-aggregatable (map-side combine collapses
within-doc duplicates), then everything is ≤max_order rows. No per-row
Python anywhere.

Reference scope note: eliassona/xmlschemavalidator has no dataset layer
(core.clj:263-285); north-rule additions in the checks/evaluation.py
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.textops import _WS

_MICRO = 1_000_000


def _toks(text) -> F.Column:
    """Whitespace tokens with the EXPLICIT class shared by both engines
    (not Java \\s — see CLAUDE.md's \\x0B note); empty/NULL → []."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, _WS + "+"))


def _toks_sql(x: str) -> str:
    return (
        f"(CASE WHEN trim(coalesce({x}, '')) = '' THEN CAST([] AS VARCHAR[])"
        f" ELSE string_split_regex(trim({x}), '{_WS}+') END)"
    )


def _grams(tok, n: int) -> F.Column:
    """Array of space-joined n-grams of a token array (n fixed)."""
    if n == 1:
        return tok
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - n + 1),
            lambda i: F.array_join(F.slice(tok, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _grams_sql(arr: str, n: int) -> str:
    if n == 1:
        return arr
    return (
        f"list_transform(generate_series(1, greatest(len({arr}) - {n - 1}, 0)),"
        f" i -> array_to_string(list_slice({arr}, i, i + {n - 1}), ' '))"
    )


def ngram_match_counts(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_order: int = 4,
) -> DataFrame:
    """Per-order clipped-match counts between candidate and reference
    texts: ``(n, clipped, cand_total, ref_total)`` for n = 1..max_order,
    where ``clipped = Σ_docs Σ_grams min(count_cand, count_ref)`` — the
    shared numerator of BLEU's modified precision and ROUGE-N's overlap.
    Orders with no grams anywhere still emit a row (zeros). One
    token-scale shuffle on (doc, n, gram); results are max_order rows.
    """
    if max_order < 1:
        raise ValueError(f"max_order must be >= 1, got {max_order}")
    base = df.where(
        F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        _toks(F.col(cand_col)).alias("_ct"),
        _toks(F.col(ref_col)).alias("_rt"),
    )
    # ONE corpus scan: every (order, side) gram array becomes an array of
    # (n, g, c, r) structs in a single projection, concatenated and
    # exploded ONCE — a per-order union would rescan the corpus
    # 2·max_order times (the 100-TB IO bill, not the shuffle, dominates)
    def tagged(tok_col, n, c, r):
        return F.transform(
            _grams(tok_col, n),
            lambda g: F.struct(
                F.lit(n).alias("n"),
                g.alias("g"),
                F.lit(c).alias("c"),
                F.lit(r).alias("r"),
            ),
        )

    pieces = []
    for n in range(1, max_order + 1):
        pieces.append(tagged(F.col("_ct"), n, 1, 0))
        pieces.append(tagged(F.col("_rt"), n, 0, 1))
    rows = base.select(
        "_id", F.explode(F.concat(*pieces)).alias("_s")
    ).select(
        "_id",
        F.col("_s.n").alias("_n"),
        F.col("_s.g").alias("_g"),
        F.col("_s.c").alias("_c"),
        F.col("_s.r").alias("_r"),
    )
    per_gram = rows.groupBy("_id", "_n", "_g").agg(
        F.sum("_c").cast("bigint").alias("_cc"),
        F.sum("_r").cast("bigint").alias("_rc"),
    )
    per_n = per_gram.groupBy("_n").agg(
        F.sum(F.least(F.col("_cc"), F.col("_rc")))
        .cast("decimal(38,0)")
        .alias("_clip"),
        F.sum("_cc").cast("decimal(38,0)").alias("_ct"),
        F.sum("_rc").cast("decimal(38,0)").alias("_rt"),
    )
    # guarantee a row per order even when no doc reaches length n
    orders = df.sparkSession.range(1, max_order + 1).select(
        F.col("id").cast("int").alias("n")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        orders.join(per_n, orders["n"] == per_n["_n"], "left")
        .select(
            "n",
            F.coalesce(F.col("_clip"), zero).cast("bigint").alias("clipped"),
            F.coalesce(F.col("_ct"), zero).cast("bigint").alias("cand_total"),
            F.coalesce(F.col("_rt"), zero).cast("bigint").alias("ref_total"),
        )
        .orderBy("n")
    )


def _match_counts_sql(
    from_sql: str, cand_sql: str, ref_sql: str, id_sql: str, max_order: int
) -> str:
    """DuckDB CTE text yielding the :func:`ngram_match_counts` table as
    ``counts(n, clipped, cand_total, ref_total)``; embed inside WITH."""
    parts = []
    for n in range(1, max_order + 1):
        parts.append(
            f"SELECT _id, {n} AS _n, unnest({_grams_sql('_ct', n)}) AS _g,"
            " 1 AS _c, 0 AS _r FROM toks"
        )
        parts.append(
            f"SELECT _id, {n} AS _n, unnest({_grams_sql('_rt', n)}) AS _g,"
            " 0 AS _c, 1 AS _r FROM toks"
        )
    unions = "\nUNION ALL\n".join(parts)
    return f"""src AS ({from_sql}),
toks AS (SELECT {id_sql} AS _id, {_toks_sql(cand_sql)} AS _ct,
           {_toks_sql(ref_sql)} AS _rt
         FROM src WHERE {cand_sql} IS NOT NULL AND {ref_sql} IS NOT NULL
           AND {id_sql} IS NOT NULL),
grams AS ({unions}),
per_gram AS (SELECT _id, _n, _g, CAST(sum(_c) AS BIGINT) AS cc,
    CAST(sum(_r) AS BIGINT) AS rc FROM grams GROUP BY _id, _n, _g),
per_n AS (SELECT _n, CAST(sum(least(cc, rc)) AS BIGINT) AS clipped,
    CAST(sum(cc) AS BIGINT) AS cand_total, CAST(sum(rc) AS BIGINT) AS ref_total
  FROM per_gram GROUP BY _n),
counts AS (SELECT o.n, coalesce(p.clipped, 0) AS clipped,
    coalesce(p.cand_total, 0) AS cand_total,
    coalesce(p.ref_total, 0) AS ref_total
  FROM (SELECT unnest(generate_series(1, {max_order})) AS n) o
  LEFT JOIN per_n p ON o.n = p._n)"""


def corpus_bleu(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_order: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Corpus BLEU (Papineni et al. ACL'02) of a candidate text column
    against a single reference column: ONE row ``(n_pairs, cand_len,
    ref_len, p1..p{max_order}, brevity_penalty, bleu)`` where p_n are the
    corpus-level modified (clipped) n-gram precisions, BP =
    min(1, e^(1−r/c)) on corpus token lengths, and

        BLEU = BP · exp( (1/N) Σ_n ln p_n ).

    The canonical no-smoothing form: any order with zero clipped matches
    reads bleu = 0 (reported with the p_n that caused it); an order no
    doc reaches (cand_total = 0) makes the geometric mean undefined →
    NULL bleu. Exactness: p_n are exact integer rationals from the
    shared match-count pass; ln p_n floor-quantizes to micro units and
    sums in BIGINT; the brevity exponent 1 − r/c is one exactly-rounded
    IEEE division; ONE exp at the end, rounded. Engine-grade use: grade
    mojibake repair / main-content extraction / dedup span surgery
    against gold references at corpus scale, one number per run.
    """
    counts = ngram_match_counts(df, cand_col, ref_col, id_col, max_order)
    one_row = counts.agg(
        F.sum(F.when(F.col("n") == 1, F.col("cand_total"))).alias("cand_len"),
        F.sum(F.when(F.col("n") == 1, F.col("ref_total"))).alias("ref_len"),
        F.min(F.col("clipped")).alias("_min_clip"),
        F.min(F.col("cand_total")).alias("_min_total"),
        # Σ_n ln(clipped/total) in floor-quantized micro-ln; NULL-safe:
        # orders with zero clipped are handled by the _min_clip gate
        F.sum(
            F.when(
                (F.col("clipped") > 0) & (F.col("cand_total") > 0),
                F.floor(
                    F.log(
                        F.col("clipped").cast("double")
                        / F.col("cand_total").cast("double")
                    )
                    * F.lit(_MICRO)
                ).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("_s_micro"),
    )
    pairs = df.where(
        F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    precisions = counts.groupBy().pivot("n", list(range(1, max_order + 1))).agg(
        F.round(
            F.max(
                F.when(
                    F.col("cand_total") > 0,
                    F.col("clipped").cast("double")
                    / F.col("cand_total").cast("double"),
                )
            ),
            round_to,
        )
    )
    prec = precisions.select(
        *[F.col(str(n)).alias(f"p{n}") for n in range(1, max_order + 1)]
    )
    cl, rl = F.col("cand_len").cast("double"), F.col("ref_len").cast("double")
    bp_ln = F.when((cl > 0) & (rl > cl), F.lit(1.0) - rl / cl).otherwise(
        F.lit(0.0)
    )
    bleu = F.when(
        F.col("_min_total") > 0,
        F.when(
            F.col("_min_clip") > 0,
            F.exp(
                bp_ln
                + F.col("_s_micro").cast("double")
                / F.lit(float(_MICRO * max_order))
            ),
        ).otherwise(F.lit(0.0)),
    )
    return (
        pairs.crossJoin(F.broadcast(one_row))
        .crossJoin(F.broadcast(prec))
        .select(
            "n_pairs",
            F.col("cand_len").cast("bigint").alias("cand_len"),
            F.col("ref_len").cast("bigint").alias("ref_len"),
            *[f"p{n}" for n in range(1, max_order + 1)],
            F.round(
                F.when(F.col("cand_len") > 0, F.exp(bp_ln)), round_to
            ).alias("brevity_penalty"),
            F.round(bleu, round_to).alias("bleu"),
        )
    )


def corpus_bleu_oracle_sql(
    from_sql: str,
    cand_sql: str,
    ref_sql: str,
    id_sql: str,
    max_order: int = 4,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`corpus_bleu` — same match-count pass,
    same micro-ln sum, same IEEE brevity ratio."""
    p_cols = ",\n  ".join(
        f"round(max(CASE WHEN n = {n} AND cand_total > 0 THEN"
        f" CAST(clipped AS DOUBLE) / CAST(cand_total AS DOUBLE) END),"
        f" {round_to}) AS p{n}"
        for n in range(1, max_order + 1)
    )
    return f"""WITH {_match_counts_sql(from_sql, cand_sql, ref_sql, id_sql, max_order)},
agg AS (SELECT
    CAST(sum(CASE WHEN n = 1 THEN cand_total END) AS BIGINT) AS cand_len,
    CAST(sum(CASE WHEN n = 1 THEN ref_total END) AS BIGINT) AS ref_len,
    min(clipped) AS min_clip, min(cand_total) AS min_total,
    CAST(coalesce(sum(CASE WHEN clipped > 0 AND cand_total > 0 THEN
        CAST(floor(ln(CAST(clipped AS DOUBLE) / CAST(cand_total AS DOUBLE))
             * 1000000) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS s_micro,
    {p_cols}
  FROM counts),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM src
       WHERE {cand_sql} IS NOT NULL AND {ref_sql} IS NOT NULL
         AND {id_sql} IS NOT NULL)
SELECT np.n_pairs, agg.cand_len, agg.ref_len,
  {", ".join(f"agg.p{n}" for n in range(1, max_order + 1))},
  round(CASE WHEN agg.cand_len > 0 THEN
      exp(CASE WHEN agg.ref_len > agg.cand_len THEN
          1.0 - CAST(agg.ref_len AS DOUBLE) / CAST(agg.cand_len AS DOUBLE)
          ELSE 0.0 END) END, {round_to}) AS brevity_penalty,
  round(CASE WHEN agg.min_total > 0 THEN
      CASE WHEN agg.min_clip > 0 THEN
        exp((CASE WHEN agg.cand_len > 0 AND agg.ref_len > agg.cand_len THEN
             1.0 - CAST(agg.ref_len AS DOUBLE) / CAST(agg.cand_len AS DOUBLE)
             ELSE 0.0 END)
            + CAST(agg.s_micro AS DOUBLE) / {float(_MICRO * max_order)})
      ELSE 0.0 END END, {round_to}) AS bleu
FROM np, agg"""


def rouge_n(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_order: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Micro-averaged (corpus-level) ROUGE-N (Lin 2004): per order
    n = 1..max_order, ``(n, overlap, cand_total, ref_total, precision,
    recall, f1)`` where overlap is the clipped n-gram match count,
    recall = overlap/ref_total (the headline ROUGE number), precision =
    overlap/cand_total and f1 their harmonic mean. Micro form: totals
    sum over the corpus BEFORE the division — exact integer rationals,
    no per-doc float averaging (the macro variant is a different,
    disclosed statistic). Empty sides read NULL ratios, never div/0.
    Same single match-count pass as :func:`corpus_bleu`.
    """
    counts = ngram_match_counts(df, cand_col, ref_col, id_col, max_order)
    prec = F.when(
        F.col("cand_total") > 0,
        F.col("clipped").cast("double") / F.col("cand_total").cast("double"),
    )
    rec = F.when(
        F.col("ref_total") > 0,
        F.col("clipped").cast("double") / F.col("ref_total").cast("double"),
    )
    f1 = F.when(
        (F.col("cand_total") > 0)
        & (F.col("ref_total") > 0)
        & (F.col("clipped") > 0),
        F.lit(2.0)
        * F.col("clipped").cast("double")
        / (F.col("cand_total") + F.col("ref_total")).cast("double"),
    ).otherwise(
        F.when(
            (F.col("cand_total") > 0) & (F.col("ref_total") > 0), F.lit(0.0)
        )
    )
    return counts.select(
        "n",
        F.col("clipped").alias("overlap"),
        "cand_total",
        "ref_total",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    ).orderBy("n")


def rouge_n_oracle_sql(
    from_sql: str,
    cand_sql: str,
    ref_sql: str,
    id_sql: str,
    max_order: int = 2,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`rouge_n` — same pass, same rationals.
    f1 = 2·overlap/(cand+ref): the harmonic-mean identity keeps it ONE
    division (no p·r/(p+r) float chain to diverge on)."""
    return f"""WITH {_match_counts_sql(from_sql, cand_sql, ref_sql, id_sql, max_order)}
SELECT n, clipped AS overlap, cand_total, ref_total,
  round(CASE WHEN cand_total > 0 THEN CAST(clipped AS DOUBLE)
        / CAST(cand_total AS DOUBLE) END, {round_to}) AS precision,
  round(CASE WHEN ref_total > 0 THEN CAST(clipped AS DOUBLE)
        / CAST(ref_total AS DOUBLE) END, {round_to}) AS recall,
  round(CASE WHEN cand_total > 0 AND ref_total > 0 THEN
        CASE WHEN clipped > 0 THEN 2.0 * CAST(clipped AS DOUBLE)
             / CAST(cand_total + ref_total AS DOUBLE) ELSE 0.0 END END,
        {round_to}) AS f1
FROM counts ORDER BY n"""


def _tok_window(text, max_tokens: int) -> F.Column:
    return F.slice(_toks(text), 1, max_tokens)


def _encode_tokens(toks, vocab) -> F.Column:
    """One CODEPOINT per token from the pair-local vocabulary: chr(32 +
    position−1). Single-codepoint codes are what keeps Levenshtein
    unit-cost at the TOKEN level; codes stay ≤ 255 where Spark's chr
    (mod-256 ASCII) and DuckDB's chr agree."""
    return F.array_join(
        F.transform(
            toks, lambda t: F.char(F.lit(31) + F.array_position(vocab, t))
        ),
        "",
    )


def _wer_cols(cand_col: str, ref_col: str, max_tokens: int):
    ct = _tok_window(F.col(cand_col), max_tokens)
    rt = _tok_window(F.col(ref_col), max_tokens)
    vocab = F.array_distinct(F.concat(rt, ct))
    lev = F.levenshtein(_encode_tokens(ct, vocab), _encode_tokens(rt, vocab))
    return ct, rt, lev


def _wer_sql(cand_sql: str, ref_sql: str, max_tokens: int) -> tuple[str, str, str]:
    ct = f"list_slice({_toks_sql(cand_sql)}, 1, {max_tokens})"
    rt = f"list_slice({_toks_sql(ref_sql)}, 1, {max_tokens})"
    vocab = f"list_distinct(list_concat({rt}, {ct}))"

    def enc(arr: str) -> str:
        # coalesce: DuckDB's transform of an empty CAST([] AS VARCHAR[])
        # feeds array_to_string a NULL, not '' (empirically)
        return (
            f"coalesce(array_to_string(list_transform({arr},"
            f" t -> chr(31 + list_position({vocab}, t))), ''), '')"
        )

    return ct, rt, f"levenshtein({enc(ct)}, {enc(rt)})"


def corpus_wer(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_tokens: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Corpus word error rate (the ASR/NIST standard: token-level
    Levenshtein edits over reference length — substitutions, deletions
    and insertions all cost 1 WORD): ONE row ``(n_pairs, total_edits,
    total_ref_tokens, wer)`` with the micro form Σedits / Σref_len.
    BLEU/ROUGE grade n-gram OVERLAP and shrug at word order; WER is the
    alignment-strict member of the family — the right verdict for
    near-verbatim surgery (mojibake repair, span removal) where a
    reordering IS an error.

    Machinery: token-level Levenshtein without any per-row Python — each
    pair builds a pair-local vocabulary (array_distinct over both token
    windows) and encodes every token as ONE codepoint (chr 32..255,
    where Spark's mod-256 chr and DuckDB's chr agree); the engines'
    built-in string Levenshtein then IS the word-level distance, unit
    cost per token. That cap is structural: ``max_tokens`` ≤ 110 keeps
    the pair vocabulary ≤ 220 codes — WER is computed over the first
    ``max_tokens`` tokens of each side (disclosed window; the classic
    per-utterance WER shape, not a whole-book alignment, which is also
    what keeps the O(L²) DP bounded per row). Exact integer edits and
    lengths sum in DECIMAL; ONE final division. NULL sides excluded;
    empty reference window with empty candidate contributes 0 edits.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule addition beside corpus_bleu.
    """
    if not 1 <= max_tokens <= 110:
        raise ValueError(
            f"max_tokens must be in [1, 110] (pair vocab ≤ 220 single-"
            f"codepoint codes), got {max_tokens}"
        )
    ct, rt, lev = _wer_cols(cand_col, ref_col, max_tokens)
    base = df.where(
        F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        lev.cast("decimal(38,0)").alias("_e"),
        F.size(rt).cast("decimal(38,0)").alias("_r"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum("_e"), zero).cast("bigint").alias("total_edits"),
        F.coalesce(F.sum("_r"), zero).cast("bigint").alias("total_ref_tokens"),
    )
    return agg.select(
        "n_pairs",
        "total_edits",
        "total_ref_tokens",
        F.round(
            F.when(
                F.col("total_ref_tokens") > 0,
                F.col("total_edits").cast("double")
                / F.col("total_ref_tokens").cast("double"),
            ),
            round_to,
        ).alias("wer"),
    )


def wer_per_doc(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_tokens: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Per-document WER rows ``(id, edits, ref_tokens, wer)`` — the
    triage view of :func:`corpus_wer` (which docs did the transform
    mangle). Same encoding, same window contract; wer is NULL for an
    empty reference window."""
    if not 1 <= max_tokens <= 110:
        raise ValueError(
            f"max_tokens must be in [1, 110], got {max_tokens}"
        )
    ct, rt, lev = _wer_cols(cand_col, ref_col, max_tokens)
    return df.where(
        F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        lev.cast("bigint").alias("edits"),
        F.size(rt).cast("bigint").alias("ref_tokens"),
        F.round(
            F.when(
                F.size(rt) > 0,
                lev.cast("double") / F.size(rt).cast("double"),
            ),
            round_to,
        ).alias("wer"),
    )


def wer_oracle_sql(
    from_sql: str,
    cand_sql: str,
    ref_sql: str,
    id_sql: str,
    max_tokens: int = 100,
    per_doc: bool = False,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`corpus_wer` / :func:`wer_per_doc` — the
    same pair-local single-codepoint encoding feeding DuckDB's built-in
    levenshtein (an INDEPENDENT DP implementation — the hash compare
    crosschecks the whole encoding trick)."""
    ct, rt, lev = _wer_sql(cand_sql, ref_sql, max_tokens)
    where = (
        f"WHERE {cand_sql} IS NOT NULL AND {ref_sql} IS NOT NULL"
        f" AND {id_sql} IS NOT NULL"
    )
    if per_doc:
        return f"""WITH src AS ({from_sql})
SELECT {id_sql} AS id, CAST({lev} AS BIGINT) AS edits,
  CAST(len({rt}) AS BIGINT) AS ref_tokens,
  round(CASE WHEN len({rt}) > 0 THEN CAST({lev} AS DOUBLE)
        / CAST(len({rt}) AS DOUBLE) END, {round_to}) AS wer
FROM src {where}"""
    return f"""WITH src AS ({from_sql}),
b AS (SELECT CAST({lev} AS DECIMAL(38,0)) AS e,
        CAST(len({rt}) AS DECIMAL(38,0)) AS r
      FROM src {where})
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(coalesce(sum(e), 0) AS BIGINT) AS total_edits,
  CAST(coalesce(sum(r), 0) AS BIGINT) AS total_ref_tokens,
  round(CASE WHEN coalesce(sum(r), 0) > 0 THEN
      CAST(coalesce(sum(e), 0) AS DOUBLE) / CAST(sum(r) AS DOUBLE) END,
      {round_to}) AS wer
FROM b"""


def _chargrams(s, n: int) -> F.Column:
    """Array of character n-grams of a string column (n fixed)."""
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - n + 1),
            lambda i: F.substring(s, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _chargrams_sql(s: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(length({s}) - {n - 1}, 0)),"
        f" i -> {s}[i:i+{n - 1}])"
    )


def _strip_ws(text) -> F.Column:
    return F.regexp_replace(F.coalesce(text, F.lit("")), _WS + "+", "")


def _strip_ws_sql(x: str) -> str:
    return f"regexp_replace(coalesce({x}, ''), '{_WS}+', '', 'g')"


def corpus_chrf(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_order: int = 6,
    beta: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Corpus chrF (Popović WMT'15) — the character-n-gram F-score that
    completes the reference-metric trio: BLEU grades word precision,
    WER grades alignment, chrF grades CHARACTER overlap (β=2 favoring
    recall), which is what survives tokenizer/morphology differences
    and is the robust default for non-English references. ONE row
    ``(n_pairs, chr_p, chr_r, chrf)`` where P/R are macro-averaged over
    n = 1..max_order char-n-gram precisions/recalls (each micro over
    the corpus), whitespace stripped first (the paper's convention),
    and chrF = (1+β²)·P·R/(β²·P+R).

    Orders are averaged over the EFFECTIVE set — n with grams on both
    sides (the sacrebleu effective-order convention, stated); no grams
    anywhere → NULL chrf. Exactness: per-order P/R are exact integer
    rationals rounded 12dp BEFORE the fixed-order average; the final
    harmonic combination is one IEEE chain. Same (doc, order, gram)
    single-shuffle shape as :func:`ngram_match_counts`, on char grams
    (≈max_order× the character volume — the disclosed cost of a
    char-level metric).
    """
    if max_order < 1:
        raise ValueError(f"max_order must be >= 1, got {max_order}")
    base = df.where(
        F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        _strip_ws(F.col(cand_col)).alias("_cs"),
        _strip_ws(F.col(ref_col)).alias("_rs"),
    )
    # single-scan concat-of-tagged-arrays, as in ngram_match_counts —
    # 12 union branches would read the corpus 12 times
    def tagged(src, n, c, r):
        return F.transform(
            _chargrams(F.col(src), n),
            lambda g: F.struct(
                F.lit(n).alias("n"),
                g.alias("g"),
                F.lit(c).alias("c"),
                F.lit(r).alias("r"),
            ),
        )

    pieces = []
    for n in range(1, max_order + 1):
        for src, c, r in (("_cs", 1, 0), ("_rs", 0, 1)):
            pieces.append(tagged(src, n, c, r))
    rows = base.select(
        "_id", F.explode(F.concat(*pieces)).alias("_s")
    ).select(
        "_id",
        F.col("_s.n").alias("_n"),
        F.col("_s.g").alias("_g"),
        F.col("_s.c").alias("_c"),
        F.col("_s.r").alias("_r"),
    )
    per_gram = rows.groupBy("_id", "_n", "_g").agg(
        F.sum("_c").cast("bigint").alias("_cc"),
        F.sum("_r").cast("bigint").alias("_rc"),
    )
    per_n = per_gram.groupBy("_n").agg(
        F.sum(F.least(F.col("_cc"), F.col("_rc")))
        .cast("decimal(38,0)")
        .alias("_clip"),
        F.sum("_cc").cast("decimal(38,0)").alias("_ct"),
        F.sum("_rc").cast("decimal(38,0)").alias("_rt"),
    )
    eff = (F.col("_ct") > 0) & (F.col("_rt") > 0)
    # 12dp-round-then-DECIMAL-sum: a float sum over the ≤6 order rows
    # could still reorder across partitions — DECIMAL can't
    agg = per_n.agg(
        F.sum(F.when(eff, 1).otherwise(0)).cast("bigint").alias("_n_eff"),
        F.sum(
            F.when(
                eff,
                F.round(
                    F.col("_clip").cast("double") / F.col("_ct").cast("double"),
                    12,
                ).cast("decimal(38,12)"),
            ).otherwise(F.lit(0).cast("decimal(38,12)"))
        ).cast("double").alias("_sp"),
        F.sum(
            F.when(
                eff,
                F.round(
                    F.col("_clip").cast("double") / F.col("_rt").cast("double"),
                    12,
                ).cast("decimal(38,12)"),
            ).otherwise(F.lit(0).cast("decimal(38,12)"))
        ).cast("double").alias("_sr"),
    )
    pairs = df.where(
        F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    p = F.col("_sp") / F.col("_n_eff").cast("double")
    r = F.col("_sr") / F.col("_n_eff").cast("double")
    b2 = float(beta * beta)
    chrf = F.when(
        p + r > 0, (1.0 + b2) * p * r / (b2 * p + r)
    ).otherwise(F.lit(0.0))
    return pairs.crossJoin(F.broadcast(agg)).select(
        "n_pairs",
        F.round(F.when(F.col("_n_eff") > 0, p), round_to).alias("chr_p"),
        F.round(F.when(F.col("_n_eff") > 0, r), round_to).alias("chr_r"),
        F.round(F.when(F.col("_n_eff") > 0, chrf), round_to).alias("chrf"),
    )


def corpus_chrf_oracle_sql(
    from_sql: str,
    cand_sql: str,
    ref_sql: str,
    id_sql: str,
    max_order: int = 6,
    beta: int = 2,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`corpus_chrf` — same stripped char grams,
    same 12dp-pre-rounded rational averages, same harmonic chain."""
    parts = []
    for n in range(1, max_order + 1):
        for src, c, r in (("cs", 1, 0), ("rs", 0, 1)):
            parts.append(
                f"SELECT _id, {n} AS _n, unnest({_chargrams_sql(src, n)}) AS _g,"
                f" {c} AS _c, {r} AS _r FROM toks"
            )
    unions = "\nUNION ALL\n".join(parts)
    b2 = float(beta * beta)
    p = "(sp / CAST(n_eff AS DOUBLE))"
    r = "(sr / CAST(n_eff AS DOUBLE))"
    chrf = (
        f"(CASE WHEN {p} + {r} > 0 THEN"
        f" (1.0 + {b2}) * {p} * {r} / ({b2} * {p} + {r}) ELSE 0.0 END)"
    )
    return f"""WITH src AS ({from_sql}),
toks AS (SELECT {id_sql} AS _id, {_strip_ws_sql(cand_sql)} AS cs,
           {_strip_ws_sql(ref_sql)} AS rs
         FROM src WHERE {cand_sql} IS NOT NULL AND {ref_sql} IS NOT NULL
           AND {id_sql} IS NOT NULL),
grams AS ({unions}),
per_gram AS (SELECT _id, _n, _g, CAST(sum(_c) AS BIGINT) AS cc,
    CAST(sum(_r) AS BIGINT) AS rc FROM grams GROUP BY _id, _n, _g),
per_n AS (SELECT _n, CAST(sum(least(cc, rc)) AS DECIMAL(38,0)) AS clip,
    CAST(sum(cc) AS DECIMAL(38,0)) AS ct, CAST(sum(rc) AS DECIMAL(38,0)) AS rt
  FROM per_gram GROUP BY _n),
agg AS (SELECT CAST(coalesce(sum(CASE WHEN ct > 0 AND rt > 0 THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_eff,
    CAST(coalesce(sum(CASE WHEN ct > 0 AND rt > 0 THEN
        CAST(round(CAST(clip AS DOUBLE) / CAST(ct AS DOUBLE), 12)
             AS DECIMAL(38,12)) END), 0) AS DOUBLE) AS sp,
    CAST(coalesce(sum(CASE WHEN ct > 0 AND rt > 0 THEN
        CAST(round(CAST(clip AS DOUBLE) / CAST(rt AS DOUBLE), 12)
             AS DECIMAL(38,12)) END), 0) AS DOUBLE) AS sr
  FROM per_n),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM src
       WHERE {cand_sql} IS NOT NULL AND {ref_sql} IS NOT NULL
         AND {id_sql} IS NOT NULL)
SELECT np.n_pairs,
  round(CASE WHEN n_eff > 0 THEN {p} END, {round_to}) AS chr_p,
  round(CASE WHEN n_eff > 0 THEN {r} END, {round_to}) AS chr_r,
  round(CASE WHEN n_eff > 0 THEN {chrf} END, {round_to}) AS chrf
FROM np, agg"""
