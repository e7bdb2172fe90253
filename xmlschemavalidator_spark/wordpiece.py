"""WordPiece subword tokenizer, trained in-engine (Schuster & Nakajima
2012, "Japanese and Korean Voice Search"; the BERT tokenizer of Devlin
et al. 2019, with the pair-likelihood training objective popularized by
the HuggingFace `tokenizers` WordPiece trainer).

Completes the production subword family next to bpe.py (merge-driven,
raw pair counts) and unigram.py (likelihood-driven pruning): WordPiece
is merge-driven like BPE but scores candidate merges by NORMALIZED
likelihood gain — count(ab) / (count(a) * count(b)) — so a rarer pair
whose parts occur nowhere else beats a frequent pair of frequent parts.
That selection difference is pinned by a test (test_wordpiece.py) on a
corpus where BPE and WordPiece provably choose different first merges.

Scale shape — the identical two-level contract to bpe.py/unigram.py:

* TRAINING never iterates over the corpus. One distributed pass builds
  the capped word-frequency table (explode -> groupBy -> top max_words);
  merge learning runs driver-side on that bounded table with the same
  incremental pair-count maintenance as bpe._learn_merges.
* ENCODING reuses bpe.encode_with_segmentation verbatim (ONE
  implementation of explode -> broadcast seg join -> OOV-only Arrow UDF
  -> ordered stitch). The greedy longest-match segmenter is the single
  implementation shared by the seg-table build and the OOV UDF.

Determinism (the oracle-replay contract): the merge score comparison is
EXACT — n_p/(c_a*c_b) vs n_q/(c_c*c_d) is decided by integer
cross-multiplication (Python bigints), never floats — and ties break to
the lexicographically smallest pair, so retraining on the same word
counts is bit-identical and driver_queries can interpolate an
import-time training replay into a DuckDB oracle.

Conventions follow BERT: continuation pieces carry the `##` prefix
(word-INITIAL pieces are unprefixed — no WB sentinel); a word containing
a character never seen in training segments to the single piece
`[UNK]` (canonical WordPiece is word-atomic on failure, unlike
unigram.py's per-char floor). Two disclosed aliasing edges inherent to
the BERT convention (not introduced here): a literal word starting with
`##` can collide with a continuation piece, and a literal word `[unk]`
collides with the UNK token.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # module scope: pandas_udf type hints must resolve
# against module globals under `from __future__ import annotations`

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmlschemavalidator_spark.persistence import load_meta, load_part, save_model
from xmlschemavalidator_spark.textops import tokens

CONT = "##"  # BERT continuation prefix
UNK = "[UNK]"


def _units(word: str) -> list[str]:
    """Initial symbol sequence of a word: first char raw, the rest
    CONT-prefixed."""
    return [word[0]] + [CONT + ch for ch in word[1:]]


def _merge_token(a: str, b: str) -> str:
    """Surface form of merging adjacent symbols a+b: b is a continuation
    symbol by construction (every non-initial symbol is), so its CONT
    prefix drops; a keeps its own prefix status."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def greedy_segment(word: str, vocab: frozenset | set) -> list[str]:
    """Canonical WordPiece longest-match-first segmentation: at each
    position take the LONGEST vocab piece (continuation positions try
    the CONT-prefixed form); if no piece matches at some position the
    whole word is atomic-UNK. The single segmentation implementation —
    shared by the trainer's seg-table build and the OOV UDF."""
    n = len(word)
    pieces: list[str] = []
    start = 0
    while start < n:
        end = n
        hit = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = CONT + sub
            if sub in vocab:
                hit = sub
                break
            end -= 1
        if hit is None:
            return [UNK]
        pieces.append(hit)
        start = end
    return pieces


def train_wordpiece_from_counts(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 256,
    min_frequency: int = 2,
) -> list[str]:
    """Driver-side WordPiece training on a bounded word-count table.
    Returns the vocabulary SORTED lexicographically (the vocab is a SET
    for greedy encoding — merge order only steers which pieces exist).

    Loop: start from the alphabet units (all word-initial chars + all
    CONT-prefixed chars, weighted by occurrence); repeatedly merge the
    adjacent pair maximizing count(ab)/(count(a)*count(b)) — compared by
    exact integer cross-multiplication, ties to the lexicographically
    smallest pair — until the vocab reaches vocab_size or no live pair
    has count >= min_frequency. Pair AND symbol counts are maintained
    incrementally (the bpe._learn_merges shape): each merge re-accounts
    only the words that contained the pair."""
    segs: list[list[str]] = [_units(w) for w, _ in word_counts]
    counts: list[int] = [c for _, c in word_counts]
    pair_counts: dict[tuple[str, str], int] = {}
    sym_counts: dict[str, int] = {}
    where: dict[tuple[str, str], set[int]] = {}

    def account(j: int, sign: int) -> None:
        syms, c = segs[j], counts[j]
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + sign * c
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + sign * c
            if sign > 0:
                where.setdefault(p, set()).add(j)

    for j in range(len(segs)):
        account(j, +1)

    vocab: set[str] = {s for s, c in sym_counts.items() if c > 0}
    while len(vocab) < vocab_size:
        bp = None  # best (pair, numerator, denominator)
        bn = bd = 0
        for p, n in pair_counts.items():
            if n < min_frequency or n <= 0:
                continue
            d = sym_counts[p[0]] * sym_counts[p[1]]
            # exact: n/d > bn/bd  <=>  n*bd > bn*d  (integers)
            if bp is None or n * bd > bn * d or (n * bd == bn * d and p < bp):
                bp, bn, bd = p, n, d
        if bp is None:
            break
        a, b = bp
        vocab.add(_merge_token(a, b))
        for j in sorted(where.pop(bp, ())):
            # stale entries are harmless: account(-1)/+1 keeps counts
            # exact and the merge is a no-op on non-containing words
            account(j, -1)
            segs[j] = _merge_seq(segs[j], a, b)
            account(j, +1)
        pair_counts.pop(bp, None)
    return sorted(vocab)


def _merge_seq(syms: list[str], a: str, b: str) -> list[str]:
    """Apply one merge to a symbol sequence, left-to-right greedy (the
    bpe._merge_pair contract, with WordPiece's CONT-stripping join)."""
    if len(syms) < 2:
        return syms
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(_merge_token(a, b))
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@dataclass
class WordPieceModel:
    """vocab: the trained piece set (sorted list); seg: (word, pieces
    array<string>) for every trained word — the broadcast fast path."""

    vocab: list[str]
    seg: DataFrame
    max_words: int
    min_frequency: int

    def save(self, path: str) -> None:
        save_model(
            path,
            {
                "vocab": self.vocab,
                "max_words": self.max_words,
                "min_frequency": self.min_frequency,
            },
            {"seg": self.seg},
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "WordPieceModel":
        meta = load_meta(spark, path)
        return cls(
            vocab=list(meta["vocab"]),
            seg=load_part(spark, path, "seg"),
            max_words=meta["max_words"],
            min_frequency=meta["min_frequency"],
        )


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    max_words: int = 50_000,
    min_frequency: int = 2,
) -> WordPieceModel:
    """One corpus pass for the capped word-count table (the identical
    contract to train_bpe/train_unigram: top max_words by count desc,
    word asc), then driver-side merge learning and a precomputed greedy
    segmentation table for the frequency head."""
    if max_words > 1 << 21:
        raise ValueError(
            f"max_words={max_words}: the word-count table is driver-"
            "collected; keep max_words <= 2**21"
        )
    spark = df.sparkSession
    rows = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    word_counts = [(r["word"], int(r["c"])) for r in rows]
    vocab = train_wordpiece_from_counts(
        word_counts, vocab_size=vocab_size, min_frequency=min_frequency
    )
    vset = frozenset(vocab)
    seg_rows = [(w, greedy_segment(w, vset)) for w, _ in word_counts]
    seg = spark.createDataFrame(seg_rows, "word string, pieces array<string>")
    return WordPieceModel(
        vocab=vocab, seg=seg, max_words=max_words, min_frequency=min_frequency
    )


def wordpiece_encode(
    df: DataFrame,
    model: WordPieceModel,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document: ``(doc, pieces array<string>, n_pieces)``.
    Same plan as bpe_encode/unigram_encode (shared
    encode_with_segmentation): broadcast seg join for trained words,
    Arrow-batched greedy_segment for the OOV tail — Python touches only
    the miss rate."""
    from pyspark.sql.functions import pandas_udf

    from xmlschemavalidator_spark.bpe import encode_with_segmentation

    vset = frozenset(model.vocab)

    @pandas_udf("array<string>")
    def _oov_pieces(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def seg(w):
            if w is None:  # nulls reach the UDF (see the union note)
                return []
            if w not in memo:
                memo[w] = greedy_segment(w, vset)
            return memo[w]

        return words.map(seg)

    return encode_with_segmentation(df, model.seg, _oov_pieces, id_col, text_col)


def wordpiece_vocab(model: WordPieceModel) -> DataFrame:
    """The trained vocabulary as a DataFrame: (piece, id). Id 0 is the
    UNK token; trained pieces take 1..N in lexicographic order —
    deterministic and SQL-replayable."""
    spark = model.seg.sparkSession
    rows = [(UNK, 0)] + [
        (p, i + 1) for i, p in enumerate(model.vocab) if p != UNK
    ]
    return spark.createDataFrame(rows, "piece string, id bigint")
