"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates" — the SentencePiece ``--model_type=unigram`` algorithm),
trained in-engine. Complements bpe.py: the two dominant production
subword tokenizers, one merge-driven, one likelihood-driven.

Scale shape — identical two-level contract to bpe.py:

* TRAINING never iterates over the corpus. One distributed pass builds
  the capped word-frequency table (explode → groupBy → top max_words);
  seeding, hard-EM re-estimation, and pruning then run driver-side on
  that bounded table. The EM lattice work is O(words × len² ) on ≤2²¹
  rows — driver CPU, zero extra cluster passes.
* ENCODING reuses bpe.encode_with_segmentation verbatim (ONE
  implementation of explode → broadcast seg join → OOV-only Arrow UDF →
  ordered stitch, so the two tokenizers cannot drift). Python touches
  only the OOV miss rate; the Viterbi UDF shares `_viterbi` with the
  trainer, so head and tail segmentations cannot disagree.

Determinism (what makes the planted oracle exact): the trainer is pure
Python over a deterministically ordered word list — seeding weights,
EM expected counts, and normalization all accumulate in sorted order,
pruning sorts by (count, piece), and `_viterbi` breaks score ties by
preferring the LONGEST candidate last piece (scan order + strictly-
greater). Training replayed on the same word counts is bit-identical,
which is what lets driver_queries interpolate an import-time-trained
segmentation table into a DuckDB oracle and hash-match the in-engine
run, training included.

Word boundary follows SentencePiece: the marker U+2581 ``▁`` is
PREFIXED to each word (bpe.py suffixes it — each matches its paper).
Characters never seen in training segment as single-char pieces at a
floor log-prob, so segmentation is total (no UNK failure mode); such
pieces simply take the unk id in `unigram_encode_ids`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd  # module scope: pandas_udf type hints must resolve
# against module globals under `from __future__ import annotations`

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WB = "▁"  # SentencePiece word-boundary marker (prefixed)
_UNK_LOGP = -100.0  # per-char fallback for never-seen characters; far
# below any trained piece (ln p > -40 for any count >= 1 of <= 2^53)


def _viterbi(
    word: str,
    logp: dict[str, float],
    max_piece_len: int,
) -> list[str]:
    """Best unigram segmentation of `word` (already WB-prefixed):
    maximize the sum of piece log-probs. DP over prefix lengths; at each
    position candidate last-pieces are scanned LONGEST FIRST and only a
    strictly greater score replaces the incumbent, so exact float ties
    deterministically prefer the longest last piece. Unknown single
    chars fall back to _UNK_LOGP (segmentation is total)."""
    n = len(word)
    neg_inf = float("-inf")
    best = [neg_inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):  # longest piece first
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = _UNK_LOGP
            if best[j] == neg_inf:
                continue
            sc = best[j] + lp
            if sc > best[i]:
                best[i] = sc
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _normalized_logp(counts: dict[str, float]) -> dict[str, float]:
    """log(count/total) with the sum accumulated over SORTED pieces —
    float addition isn't associative, so the order is part of the
    determinism contract."""
    total = 0.0
    for p in sorted(counts):
        total += counts[p]
    return {p: math.log(counts[p] / total) for p in sorted(counts)}


def train_unigram_from_counts(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 256,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_frac: float = 0.2,
    seed_mult: int = 4,
) -> dict[str, float]:
    """Driver-side unigram-LM training on a bounded word-count table.
    Returns piece -> log-prob. The SentencePiece loop, hard-EM variant:

    1. seed vocabulary = every substring (length <= max_piece_len) of
       every word, weighted by occurrence x word count; all single
       characters always kept (totality), multi-char seeds capped at
       seed_mult x vocab_size by (weight desc, piece asc);
    2. repeat: em_iters hard-EM rounds (Viterbi-segment each word with
       current probs, re-count pieces, renormalize), then prune the
       lowest-count prune_frac of multi-char pieces — never below
       vocab_size, never single chars;
    3. stop at vocab_size (or all-chars), one final EM round.

    Pure Python + deterministic ordering throughout: retraining on the
    same counts is bit-identical (the oracle-replay contract)."""
    words = sorted((WB + w, int(c)) for w, c in word_counts)
    weight: dict[str, float] = {}
    for w, c in words:
        lw = len(w)
        for i in range(lw):
            for piece_len in range(1, min(max_piece_len, lw - i) + 1):
                p = w[i : i + piece_len]
                weight[p] = weight.get(p, 0.0) + c
    chars = {p for p in weight if len(p) == 1}
    multi = sorted(
        (p for p in weight if len(p) > 1), key=lambda p: (-weight[p], p)
    )
    seed_cap = max(vocab_size * seed_mult, vocab_size)
    vocab = chars | set(multi[: max(0, seed_cap - len(chars))])
    logp = _normalized_logp({p: weight[p] for p in vocab})

    def em_round() -> dict[str, float]:
        counts: dict[str, float] = {}
        for w, c in words:
            for p in _viterbi(w, logp, max_piece_len):
                counts[p] = counts.get(p, 0.0) + c
        # single chars survive at a floor count (totality); multi-char
        # pieces the Viterbi stopped using die here naturally
        for p in chars:
            if counts.get(p, 0.0) < 1.0:
                counts[p] = 1.0
        return counts

    while True:
        for _ in range(em_iters):
            logp = _normalized_logp(em_round())
        in_vocab_multi = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (logp[p], p),
        )
        excess = len(logp) - vocab_size
        if excess <= 0 or not in_vocab_multi:
            break
        n_drop = min(excess, max(1, int(len(in_vocab_multi) * prune_frac)))
        dropped = set(in_vocab_multi[:n_drop])
        logp = _normalized_logp(
            {p: math.exp(lp) for p, lp in logp.items() if p not in dropped}
        )
        # exp/renorm keeps relative masses; next EM round re-counts anyway
    logp = _normalized_logp(em_round())
    return logp


@dataclass
class UnigramModel:
    logp: dict[str, float]  # piece -> log prob (trained)
    seg: DataFrame  # word -> pieces for the trained word table
    max_piece_len: int
    vocab_size: int


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    max_words: int = 50_000,
    max_piece_len: int = 8,
    em_iters: int = 2,
) -> UnigramModel:
    """One corpus pass for the capped word-count table (identical
    contract to bpe.train_bpe: top max_words by count desc, word asc),
    then driver-side unigram-LM training and a precomputed segmentation
    table for the frequency head."""
    from xmlschemavalidator_spark.textops import tokens

    if max_words > 1 << 21:
        raise ValueError(
            f"max_words={max_words}: the word-count table is driver-"
            "collected; keep max_words <= 2**21"
        )
    spark = df.sparkSession
    counts = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    word_counts = [(r["word"], int(r["c"])) for r in counts]
    logp = train_unigram_from_counts(
        word_counts,
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        em_iters=em_iters,
    )
    seg_rows = [
        (w, _viterbi(WB + w, logp, max_piece_len)) for w, _ in word_counts
    ]
    seg = spark.createDataFrame(seg_rows, "word string, pieces array<string>")
    return UnigramModel(
        logp=logp, seg=seg, max_piece_len=max_piece_len, vocab_size=vocab_size
    )


def unigram_encode(
    df: DataFrame,
    model: UnigramModel,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document: ``(doc, pieces array<string>, n_pieces)``.
    Same plan as bpe_encode (shared encode_with_segmentation): broadcast
    seg join for trained words, Arrow-batched Viterbi for the OOV tail —
    `_viterbi` is the single segmentation implementation both paths and
    the trainer share."""
    from pyspark.sql.functions import pandas_udf

    from xmlschemavalidator_spark.bpe import encode_with_segmentation

    logp = model.logp
    max_piece_len = model.max_piece_len

    @pandas_udf("array<string>")
    def _oov_pieces(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def seg_word(w):
            if w is None:  # nulls reach the UDF (see the union note)
                return []
            if w not in memo:
                memo[w] = _viterbi(WB + w, logp, max_piece_len)
            return memo[w]

        return words.map(seg_word)

    return encode_with_segmentation(df, model.seg, _oov_pieces, id_col, text_col)


def unigram_vocab(model: UnigramModel) -> DataFrame:
    """The trained vocabulary as a DataFrame: (piece, id, logprob_micro).
    Ids rank by (log-prob desc, piece asc) — deterministic; log-probs are
    floor-quantized to integer micro units (the engine's learned-score
    parity convention)."""
    spark = model.seg.sparkSession
    ordered = sorted(model.logp.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = [
        (p, i, math.floor(lp * 1_000_000))
        for i, (p, lp) in enumerate(ordered)
    ]
    return spark.createDataFrame(
        rows, "piece string, id bigint, logprob_micro bigint"
    )


def unigram_encode_ids(
    encoded: DataFrame,
    vocab: DataFrame,
    unk_id: int = -1,
) -> DataFrame:
    """Map encoded pieces to vocabulary ids: ``(doc, ids array<bigint>,
    n_unk)``. Pieces outside the vocabulary (never-seen chars segmented
    at the UNK floor) take `unk_id`. Broadcast map lookup — vocab is
    bounded by construction, no shuffle beyond the input's."""
    pieces_map = F.map_from_entries(
        F.collect_list(F.struct("piece", "id"))
    )
    vmap = vocab.agg(pieces_map.alias("m"))
    out = encoded.crossJoin(F.broadcast(vmap))
    ids = F.transform(
        F.col("pieces"),
        lambda p: F.coalesce(
            F.element_at(F.col("m"), p), F.lit(unk_id).cast("bigint")
        ),
    )
    # Two selects: the map-lookup transform is a HOF subtree, which
    # projection-level CSE skips — referencing `ids` twice in one select
    # would run the O(vocab) lookup per piece TWICE (CLAUDE.md HOF rule).
    # Two refs to the non-cheap alias below are not collapse-inlined.
    return out.select("doc", ids.alias("ids")).select(
        "doc",
        "ids",
        F.aggregate(
            F.col("ids"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.when(x == unk_id, 1).otherwise(0),
        ).alias("n_unk"),
    )
