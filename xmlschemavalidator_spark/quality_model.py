"""Learned quality classifier over hashed token features (VERDICT r2
item 4): the model-based half of a published-pipeline quality stage
(CCNet / FineWeb pair heuristic filters with a learned scorer).

Multinomial Naive Bayes over hashed unigrams, trained and scored with
pure DataFrame aggregations — no MLlib, no Python in the row path, and
every artifact engine-portable:

* features — lower-cased whitespace tokens hashed into ``n_buckets``
  buckets via an md5-derived PORTABLE hash (same integer in DuckDB:
  ``CAST('0x' || substr(md5(tok),1,8) AS BIGINT) % B``), so the oracle
  gate can replay training AND scoring exactly;
* training — ONE full-corpus pass (explode + groupBy(bucket) with
  map-side combine); driver-side data is the per-bucket count table
  (<= n_buckets rows, collected to cut every downstream lineage at the
  weight table) plus the doc-count totals;
* weights — Laplace-smoothed log-likelihood ratios QUANTIZED to integer
  micro-log-odds (``floor(w * 1e6)``): per-doc scores are integer sums,
  exactly reproducible regardless of float summation order — this is
  what makes a 5dp score oracle safe (CLAUDE.md: never compare raw
  float sums across engines);
* scoring — explode + broadcast join against the B-row weight table +
  groupBy(doc) integer sum; docs with no tokens score the prior. The
  shuffle carries (doc, bigint) — scale-safe at 10^12 docs;
* weak labels — any boolean column works; the intended teacher is
  :func:`xmlschemavalidator_spark.textops.gopher_pass` (heuristics
  label, model generalizes), matching the published bootstrap recipe.

Scale note: the weight table is ``n_buckets`` rows (4096 default, ~64 KB)
— always broadcast; training's groupBy(bucket) has at most B groups after
partial aggregation, so the shuffle is tiny no matter the corpus size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xmlschemavalidator_spark.persistence import load_meta, load_part, save_model
from xmlschemavalidator_spark.textops import tokens

MICRO = 1_000_000


def hashed_bucket(tok: Column, n_buckets: int) -> Column:
    """Portable feature hash: :func:`textops.portable_hash64` mod
    ``n_buckets`` (DuckDB replica: ``PORTABLE_HASH64_SQL % B``)."""
    from xmlschemavalidator_spark.textops import portable_hash64

    return (portable_hash64(tok) % F.lit(n_buckets)).cast("int")


def _doc_buckets(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(doc, bucket) — one row per token occurrence (multinomial NB)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).select("doc", hashed_bucket(F.col("tok"), n_buckets).alias("bucket"))


@dataclass
class QualityModel:
    """weights: (bucket int, w_micro bigint) — ALL n_buckets rows present
    (unseen buckets carry the pure-smoothing weight), so scoring joins
    always hit. prior_micro is the quantized class-prior log-odds."""

    weights: DataFrame
    prior_micro: int
    n_buckets: int
    alpha: float
    n_docs_pos: int
    n_docs_neg: int

    def save(self, path: str) -> None:
        save_model(
            path,
            {
                "prior_micro": self.prior_micro,
                "n_buckets": self.n_buckets,
                "alpha": self.alpha,
                "n_docs_pos": self.n_docs_pos,
                "n_docs_neg": self.n_docs_neg,
            },
            {"weights": self.weights},
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "QualityModel":
        return cls(
            weights=load_part(spark, path, "weights"), **load_meta(spark, path)
        )


def train_quality_model(
    df: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> QualityModel:
    """Fit the NB weights from a boolean ``label_col`` (weak labels fine).

    w_b = ln((c_pos_b + α)/(T_pos + αB)) − ln((c_neg_b + α)/(T_neg + αB)),
    quantized to micro-log-odds with floor (floor, not round: identical in
    every engine — round-half ties differ between Spark and DuckDB).
    Docs whose label is NULL are excluded from training."""
    if n_buckets > 1 << 21:
        raise ValueError(
            f"n_buckets={n_buckets}: the count/weight tables are collected "
            "to the driver; keep n_buckets <= 2**21 (hash collisions, not "
            "bucket count, bound model quality well before that)"
        )
    spark = df.sparkSession
    lab = df.where(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("doc"), F.col(label_col).cast("boolean").alias("y"), text_col
    )
    # one full-corpus pass total (review finding: the lazy lineage used to
    # re-run the token explode AND the teacher labels twice): the slim
    # (doc, y) side is cached, the bucket counts — at most n_buckets rows —
    # are COLLECTED, and the weight table is rebuilt from those literals,
    # cutting every downstream consumer's lineage at the weight table.
    # The count table lives on the driver — n_buckets is capped above.
    slim = lab.select("doc", "y").persist()
    tok = _doc_buckets(lab, "doc", text_col, n_buckets).join(slim, "doc")
    pos = F.when(F.col("y"), F.lit(1)).otherwise(F.lit(0))
    crows = (
        tok.groupBy("bucket")
        .agg(F.sum(pos).alias("c_pos"), F.sum(1 - pos).alias("c_neg"))
        .collect()
    )
    d_row = slim.agg(
        F.coalesce(F.sum(pos), F.lit(0)).alias("dp"),
        F.coalesce(F.sum(1 - pos), F.lit(0)).alias("dn"),
    ).collect()[0]
    slim.unpersist()
    t_pos = float(sum(r["c_pos"] for r in crows))
    t_neg = float(sum(r["c_neg"] for r in crows))
    d_pos, d_neg = int(d_row["dp"]), int(d_row["dn"])

    denom_pos = F.lit(t_pos + alpha * n_buckets)
    denom_neg = F.lit(t_neg + alpha * n_buckets)
    cnt_df = spark.createDataFrame(
        [(int(r["bucket"]), int(r["c_pos"]), int(r["c_neg"])) for r in crows],
        "bucket int, c_pos bigint, c_neg bigint",
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(cnt_df, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
            F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
        )
    )
    w = F.log((F.col("c_pos") + F.lit(alpha)) / denom_pos) - F.log(
        (F.col("c_neg") + F.lit(alpha)) / denom_neg
    )
    weights = full.select(
        "bucket", F.floor(w * F.lit(MICRO)).cast("bigint").alias("w_micro")
    )
    prior_micro = math.floor(math.log((d_pos + 1.0) / (d_neg + 1.0)) * MICRO)
    return QualityModel(
        weights=weights,
        prior_micro=prior_micro,
        n_buckets=n_buckets,
        alpha=alpha,
        n_docs_pos=d_pos,
        n_docs_neg=d_neg,
    )


def quality_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "quality_micros",
    id_col: str = "doc",
    group_col: str | None = None,
) -> DataFrame:
    """CCNet-style head/middle/tail partitioning: rank docs by model score
    (best first, id tiebreak for a total deterministic order) and cut into
    ``n_buckets`` equal tiles — bucket 1 is the 'head' a pipeline keeps or
    upsamples. Without ``group_col`` the ntile runs on ONE global sort
    partition (exact, fine for a shard — same warning contract as
    pack_chunks); at scale pass ``group_col`` (shard/lang/domain) or cut
    by approximate score quantiles instead."""
    import warnings

    from pyspark.sql import Window

    if group_col is None:
        warnings.warn(
            "quality_buckets: group_col is None — the ntile window uses ONE "
            "global sort partition. Pass group_col (shard/lang/domain) at "
            "scale, or cut by approximate score quantiles.",
            RuntimeWarning,
            stacklevel=2,
        )
    w = (
        (Window.partitionBy(group_col) if group_col else Window.partitionBy())
        .orderBy(F.col(score_col).desc(), F.col(id_col))
    )
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w))


def quality_buckets_approx(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "quality_micros",
    rel_error: float = 0.001,
) -> DataFrame:
    """The at-scale sibling of :func:`quality_buckets` (closing its
    documented "cut by approximate score quantiles" path): cut points
    come from ONE ``percentile_approx`` aggregate (a driver-bounded
    n_buckets−1 doubles collect), bucketing is then a NARROW when-chain —
    no window, no global sort, no shuffle beyond the aggregate. Bucket 1
    is the best (highest-score) tile, same orientation as the exact form.
    Tile sizes are approximate within ``rel_error``; the exact ntile
    remains the oracle-checkable form for shard-sized data."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if not 0.0 < rel_error <= 0.5:
        # 0 div-crashed, negatives silently clamped to 1% (review finding)
        raise ValueError(f"rel_error must be in (0, 0.5], got {rel_error}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    accuracy = max(100, int(1.0 / rel_error))
    cuts_row = scored.agg(
        F.percentile_approx(
            score_col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("c")
    ).collect()[0]["c"]
    # cuts ascending = tile boundaries from worst to best; bucket 1 takes
    # scores above the LAST cut
    expr = F.lit(n_buckets)
    for rank, cut in enumerate(cuts_row or [], start=1):
        bucket_no = n_buckets - rank  # scores above the rank-th cut
        expr = F.when(F.col(score_col) > F.lit(cut), F.lit(bucket_no)).otherwise(
            expr
        )
    return scored.withColumn("bucket", expr.cast("int"))


def score_quality(
    df: DataFrame,
    model: QualityModel,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc log-odds under the model:
    ``(doc, quality_micros bigint, quality_logodds double, quality_pass
    boolean)``. The sum is an exact integer in micro units;
    ``quality_logodds`` = micros / 1e6. Plan: explode → broadcast join
    (B rows) → groupBy(doc) integer sum → left join back so token-less
    docs score the prior."""
    tokb = _doc_buckets(df, id_col, text_col, model.n_buckets)
    sums = (
        tokb.join(F.broadcast(model.weights), "bucket")
        .groupBy("doc")
        .agg(F.sum("w_micro").alias("_s"))
    )
    total = F.coalesce(F.col("_s"), F.lit(0)) + F.lit(model.prior_micro)
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(sums, "doc", "left")
        .select(
            "doc",
            total.cast("bigint").alias("quality_micros"),
            (total / F.lit(float(MICRO))).alias("quality_logodds"),
            (total > 0).alias("quality_pass"),
        )
    )


# --------------------------------------------------------------------------
# bigram language model — the CCNet-style perplexity scorer (CCNet buckets
# web text by LM perplexity; the NB classifier above is the FineWeb-style
# discriminative sibling). Trained with pure groupBy aggregations; scoring
# is two shuffle joins of the (doc, prev, cur) bigram stream against the
# count tables — standard corpus-scale joins, the doc text never moves.
# Per-bigram log-probs are floor-quantized to micro units at scoring time,
# so per-doc sums are exact integers (same oracle-parity device as the NB
# weights).
# --------------------------------------------------------------------------

BOS = "<s>"


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, prev, cur): one row per bigram of the lower-cased token
    stream with a BOS sentinel, so every real token is predicted once."""
    toks = tokens(F.lower(F.col(text_col)))
    barr = F.concat(F.array(F.lit(BOS)), toks)
    zipped = F.arrays_zip(
        F.slice(barr, 1, F.size(barr) - 1), F.slice(barr, 2, F.size(barr) - 1)
    )
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(zipped).alias("bg"))
        .select("doc", F.col("bg.0").alias("prev"), F.col("bg.1").alias("cur"))
    )


@dataclass
class BigramLM:
    """bigram_counts: (prev, cur, n_pc); context_counts: (prev, n_p);
    v = predicted-vocabulary size (distinct cur in training); alpha =
    add-α smoothing. logp(cur|prev) = ln((n_pc+α)/(n_p+αv)); unseen
    contexts fall back to ln(1/v)."""

    bigram_counts: DataFrame
    context_counts: DataFrame
    v: int
    alpha: float

    def save(self, path: str) -> None:
        # count tables scale with corpus vocabulary — keep their natural
        # partitioning (coalesce_parts=False)
        save_model(
            path,
            {"v": self.v, "alpha": self.alpha},
            {"bigrams": self.bigram_counts, "contexts": self.context_counts},
            coalesce_parts=False,
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BigramLM":
        meta = load_meta(spark, path)
        return cls(
            bigram_counts=load_part(spark, path, "bigrams"),
            context_counts=load_part(spark, path, "contexts"),
            **meta,
        )


def train_bigram_lm(
    df: DataFrame, id_col: str, text_col: str = "text", alpha: float = 1.0
) -> BigramLM:
    """Fit add-α bigram counts: one explode + two groupBys (both with
    map-side combine) + one distinct count. All tables stay distributed —
    nothing corpus-sized touches the driver."""
    # persist the count tables (vocab-bounded, tiny next to the corpus):
    # without it every downstream action — each join side of a scoring
    # run, each save() write, the v count — re-runs the full training
    # tokenize+explode+groupBy lineage (review finding, same class the NB
    # trainer above fixed by collecting its counts)
    pairs = _bigram_pairs(df, id_col, text_col)
    bc = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n_pc")).persist()
    cc = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("n_p")).persist()
    # v from the materialized bigram table, not a third corpus pass
    v = bc.select("cur").distinct().count()  # also materializes bc
    cc.count()  # materialize cc while the shuffle files are hot
    return BigramLM(bigram_counts=bc, context_counts=cc, v=max(v, 1), alpha=alpha)


def perplexity_score(
    df: DataFrame, lm: BigramLM, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-doc LM fit: ``(doc, n_bigrams, logprob_micro, avg_logprob)``
    where logprob_micro is the EXACT integer sum of floor-quantized
    per-bigram micro-log-probs and avg_logprob = logprob_micro /
    (n_bigrams · 1e6). Perplexity = exp(-avg_logprob) — derived by the
    caller; kept out of the contract so the oracle never compares exp()
    across engines. Token-less docs return n_bigrams = 0, avg NULL
    (CCNet leaves empty docs unbucketed)."""
    pairs = _bigram_pairs(df, id_col, text_col)
    j = pairs.join(lm.bigram_counts, ["prev", "cur"], "left").join(
        lm.context_counts, ["prev"], "left"
    )
    lp = F.log(
        (F.coalesce("n_pc", F.lit(0)) + F.lit(lm.alpha))
        / (F.coalesce("n_p", F.lit(0)) + F.lit(lm.alpha * lm.v))
    )
    scored = j.select(
        "doc", F.floor(lp * F.lit(MICRO)).cast("bigint").alias("_lp")
    )
    agg = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("_lp").alias("logprob_micro")
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("logprob_micro", F.lit(0)).cast("bigint").alias("logprob_micro"),
            (
                F.col("logprob_micro")
                / (F.col("n_bigrams") * F.lit(float(MICRO)))
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
# NeurIPS). Select raw-corpus documents that look like a small TARGET
# corpus: fit bag-of-hashed-ngram unigram+bigram distributions on both,
# weight each raw doc by its log importance ratio λ(x) = log p_target(x)
# − log p_raw(x), then sample WITHOUT replacement ∝ exp(λ/T) via the
# Gumbel-top-k trick. Same engine-portable devices as the NB classifier
# above: the portable md5 feature hash, floor-quantized integer micro-log
# weights (exact integer per-doc sums), and md5-derived uniforms instead
# of rand() so the "random" sample is a pure function of (salt, id) —
# reproducible across runs, retries, engines, and cluster sizes.
# --------------------------------------------------------------------------


def _doc_ngram_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(doc, bucket) — one row per hashed unigram AND bigram occurrence
    (DSIR's bag-of-hashed-ngrams feature space). Bigrams are the space-
    joined token pairs of the lower-cased stream; docs with < 2 tokens
    contribute unigrams only."""
    toks = tokens(F.lower(F.col(text_col)))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return df.select(
        F.col(id_col).alias("doc"), F.explode(feats).alias("tok")
    ).select("doc", hashed_bucket(F.col("tok"), n_buckets).alias("bucket"))


@dataclass
class ImportanceModel:
    """weights: (bucket int, w_micro bigint), ALL n_buckets rows present —
    w = ln((c_target+α)/(T_target+αB)) − ln((c_raw+α)/(T_raw+αB)),
    floor-quantized to micro units."""

    weights: DataFrame
    n_buckets: int
    alpha: float

    def save(self, path: str) -> None:
        save_model(
            path,
            {"n_buckets": self.n_buckets, "alpha": self.alpha},
            {"weights": self.weights},
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "ImportanceModel":
        return cls(
            weights=load_part(spark, path, "weights"), **load_meta(spark, path)
        )


def train_dsir_model(
    target_df: DataFrame,
    raw_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> ImportanceModel:
    """Fit the importance weights from a (small) target corpus and the raw
    corpus — the target may be a subset of raw; a doc in both contributes
    to both counts, exactly as in the paper (p_target and p_raw are
    independent hashed-ngram models). One pass over each corpus; the
    per-bucket count tables (≤ n_buckets rows each) are collected, so
    every downstream consumer's lineage cuts at the weight table."""
    if n_buckets > 1 << 21:
        raise ValueError(
            f"n_buckets={n_buckets}: count tables are driver-collected; "
            "keep n_buckets <= 2**21"
        )
    spark = target_df.sparkSession

    def _counts(df: DataFrame) -> dict[int, int]:
        rows = (
            _doc_ngram_buckets(df, id_col, text_col, n_buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {int(r["bucket"]): int(r["c"]) for r in rows}

    ct, cr = _counts(target_df), _counts(raw_df)
    t_t, t_r = float(sum(ct.values())), float(sum(cr.values()))
    cnt_df = spark.createDataFrame(
        [(b, ct.get(b, 0), cr.get(b, 0)) for b in sorted(set(ct) | set(cr))],
        "bucket int, c_t bigint, c_r bigint",
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(cnt_df, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
    )
    w = F.log((F.col("c_t") + F.lit(alpha)) / F.lit(t_t + alpha * n_buckets)) - F.log(
        (F.col("c_r") + F.lit(alpha)) / F.lit(t_r + alpha * n_buckets)
    )
    weights = full.select(
        "bucket", F.floor(w * F.lit(MICRO)).cast("bigint").alias("w_micro")
    )
    return ImportanceModel(weights=weights, n_buckets=n_buckets, alpha=alpha)


def dsir_score(
    df: DataFrame, model: ImportanceModel, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-doc log importance ratio: ``(doc, lambda_micro bigint)`` — the
    exact integer sum of per-feature micro-weights (feature-less docs
    score 0). Explode → broadcast join (B rows) → groupBy(doc) integer
    sum; the shuffle carries (doc, bigint)."""
    tokb = _doc_ngram_buckets(df, id_col, text_col, model.n_buckets)
    sums = (
        tokb.join(F.broadcast(model.weights), "bucket")
        .groupBy("doc")
        .agg(F.sum("w_micro").alias("_s"))
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(sums, "doc", "left")
        .select(
            "doc", F.coalesce("_s", F.lit(0)).cast("bigint").alias("lambda_micro")
        )
    )


_U_SPACE = 16 ** 15  # 60 bits — fits a BIGINT exactly; both engines then
# do the same IEEE-double (v + 0.5) / 16^15, so u is bit-identical across
# engines (only the subsequent ln() may differ in the last ulp)


def gumbel_key(id_col: Column, salt: str, temperature: float = 1.0) -> Column:
    """Deterministic Gumbel noise scaled by ``temperature``: u from the
    first 15 hex digits of md5(salt:id) (60 bits, exact in a BIGINT;
    +0.5 keeps u strictly inside (0,1)), g = −ln(−ln(u)). A pure function
    of (salt, id) — the Gumbel-top-k sample is reproducible anywhere md5
    is (DuckDB replica: ``CAST('0x' || substr(md5(..),1,15) AS BIGINT)``
    over :func:`sampling.sample_key_sql` — the ONE salted-key recipe;
    review finding: a hand-inlined copy here risked drifting from it)."""
    from xmlschemavalidator_spark.sampling import _sample_key

    hexpart = F.substring(_sample_key(id_col, salt), 1, 15)
    u = (F.conv(hexpart, 16, 10).cast("bigint") + F.lit(0.5)) / F.lit(float(_U_SPACE))
    return F.lit(float(temperature)) * -F.log(-F.log(u))


def _dsir_threshold_select(scored: DataFrame, k: int, boundary_cap: int) -> DataFrame:
    """Corpus-fraction-k selection without a global top-k: find the exact
    k-th element ``(t*, doc*)`` of the (gumbel_score DESC, doc ASC) order
    by iterative quantile bracketing, then return ONE narrow filter
    ``score > t* OR (score == t* AND doc <= doc*)`` over the scored frame.

    Why not ``orderBy().limit(k)``: TakeOrderedAndProject keeps a size-k
    heap per partition and merges all partials in a single task — exactly
    right for small k, an OOM at DSIR's published corpus-fraction k
    (k ≈ 1e8–1e10 of 1e12 docs). Here every distributed pass is an
    ``approxQuantile`` or a ``count`` over a shrinking score bracket; only
    the final boundary bucket (≤ ``boundary_cap`` rows) is collected and
    ordered, driver-side, to break the tie class at the cut exactly as
    the top-k path would. The selected SET is identical to the top-k
    path's for any k — pinned by tests and the dsir_selection_frac oracle.

    ``scored`` must be materialized (localCheckpoint) before calling: the
    bracketing re-reads it 2·iters times and the final equality filter
    compares rounded doubles against driver-collected values, which is
    only safe against a frozen materialization."""
    n = scored.count()
    if k >= n:
        return scored
    col = F.col("gumbel_score")
    lo: float | None = None  # bracket: lo < score <= hi (None = unbounded)
    hi: float | None = None
    n_cand, need = n, k

    def _cand() -> DataFrame:
        out = scored
        if lo is not None:
            out = out.where(col > F.lit(lo))
        if hi is not None:
            out = out.where(col <= F.lit(hi))
        return out

    for _ in range(8):
        if n_cand <= boundary_cap:
            break
        # rank error ≈ rel_err * n_cand; aim the bracket at ~cap/2 rows but
        # keep the sketch bounded (GK memory ~ 1/rel_err)
        rel_err = min(0.1, max(1e-4, boundary_cap / (4.0 * n_cand)))
        t = _cand().stat.approxQuantile(
            "gumbel_score", [1.0 - need / n_cand], rel_err
        )[0]
        if (lo is not None and t <= lo) or (hi is not None and t >= hi):
            break  # sketch returned a bracket edge — no progress possible
        c_hi = _cand().where(col > F.lit(t)).count()
        if c_hi > need:
            lo, n_cand = t, c_hi  # k-th element is above t
        else:
            # everything above t is selected; keep hunting below for the rest
            hi, n_cand, need = t, n_cand - c_hi, need - c_hi
            if need == 0:
                # kth element sits exactly at the cut: selection = score > t
                return scored.where(col > F.lit(t))
    if n_cand > boundary_cap:
        import warnings

        warnings.warn(
            f"dsir threshold bracketing stalled at {n_cand} candidates "
            f"(> boundary_cap={boundary_cap}); falling back to a bounded "
            "top-k over the bracket (heap is bracket-bounded; the driver "
            "still receives only the k-th element)",
            stacklevel=2,
        )
        picked = (
            _cand()
            .orderBy(col.desc(), F.col("doc").asc())
            .limit(need)
            .orderBy(col.asc(), F.col("doc").desc())
            .limit(1)
            .collect()
        )
        t_star, doc_star = float(picked[0]["gumbel_score"]), picked[0]["doc"]
    else:
        picked = sorted(
            _cand().select("gumbel_score", "doc").collect(),
            key=lambda r: (-r["gumbel_score"], r["doc"]),
        )[:need]
        t_star, doc_star = float(picked[-1]["gumbel_score"]), picked[-1]["doc"]
    return scored.where(
        (col > F.lit(t_star))
        | ((col == F.lit(t_star)) & (F.col("doc") <= F.lit(doc_star)))
    )


def dsir_sample(
    df: DataFrame,
    model: ImportanceModel,
    id_col: str,
    k: int,
    text_col: str = "text",
    salt: str = "dsir",
    temperature: float = 1.0,
    method: str = "auto",
    n_docs: int | None = None,
    topk_max_fraction: float = 0.001,
    boundary_cap: int = 1 << 18,
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the ``k`` docs with the
    largest λ/T + Gumbel(salt:id) — a without-replacement sample with
    P[select] ∝ exp(λ/T), the paper's selection rule, made deterministic
    by hash-derived uniforms. Returns ``(doc, lambda_micro, gumbel_score)``
    (score rounded 6dp).

    Two physical strategies selecting the SAME set (r3 VERDICT item 1):

    * ``"topk"`` — ``orderBy().limit(k)`` → TakeOrderedAndProject. Right
      for small k (per-partition heaps are k-sized); a scale-killer at
      DSIR's published corpus-fraction k, where the single merge task
      holds k rows.
    * ``"threshold"`` — quantile-bracketed exact k-th-element hunt
      (:func:`_dsir_threshold_select`): a handful of approxQuantile/count
      passes, one ≤ ``boundary_cap``-row driver sort for the boundary tie
      class, and a final NARROW filter — nothing corpus-sized ever sits
      in one task. The scored frame is localCheckpoint'ed first (the hunt
      re-reads it, and double-equality in the final filter needs a frozen
      materialization); after consuming the result, free the executor
      storage via ``session.free_local_checkpoint(result._dsir_scored)``
      — the attribute carries the checkpointed frame itself (freeing the
      returned Filter frame would be a silent no-op).
    * ``"auto"`` — ``threshold`` when ``n_docs`` is provided and
      ``k > topk_max_fraction * n_docs``, else ``topk``. Pass ``n_docs``
      (from table stats or an upstream count) to opt into the scale path
      without an extra counting scan here.
    """
    if method not in ("auto", "topk", "threshold"):
        raise ValueError(f"method={method!r}: expected auto|topk|threshold")
    scored = dsir_score(df, model, id_col, text_col)
    key = (
        F.col("lambda_micro") / F.lit(float(MICRO) * temperature)
        + gumbel_key(F.col("doc"), salt, 1.0)
    )
    scored = scored.withColumn("gumbel_score", F.round(key, 6))
    if method == "auto":
        method = (
            "threshold"
            if n_docs is not None and k > topk_max_fraction * n_docs
            else "topk"
        )
    if method == "threshold":
        ckpt = scored.localCheckpoint(eager=True)
        out = _dsir_threshold_select(ckpt, k, boundary_cap)
        # the returned frame is a Filter OVER the checkpoint — freeing the
        # filter frame would be a silent no-op (free_local_checkpoint
        # resolves a NEW rdd for non-scan plans; review finding). Expose
        # the actual checkpointed frame so callers can release executor
        # storage: session.free_local_checkpoint(result._dsir_scored)
        out._dsir_scored = ckpt
        return out
    return (
        scored.orderBy(F.col("gumbel_score").desc(), F.col("doc").asc())
        .limit(k)
    )


def ecdf_normalize(
    df: DataFrame,
    score_col: str,
    id_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group empirical-CDF (percentile-rank) normalization of a
    score column: adds ``pct_micro`` in [0, 1e6] — the rank of the row
    within its group, scaled. The cross-group calibration step every
    per-language quality pipeline needs: raw scores (perplexity,
    classifier logits) are not comparable across languages, but "top
    30% within its language" is — CCNet's terciles are the 3-bucket
    special case; this is the continuous form a tunable threshold
    wants.

    Exactness: ``pct_micro = (rank−1)·10⁶ div (n−1)`` with rank from
    row_number over (score, id) — ties split deterministically by id,
    so the transform is a pure function of the group's (score, id)
    multiset and hash-exact in any engine. Singleton groups get 0 (a
    one-row group has no spread; NULL would poison downstream
    thresholds). NULL scores are excluded.

    One shuffle on the group columns (or one global window partition if
    none — fine for report-grade use; pass groups at corpus scale,
    which is the real use case anyway).
    """
    from pyspark.sql import Window

    clash = {"_rn", "_n", "pct_micro"} & set(df.columns)
    if clash:
        raise ValueError(
            f"ecdf_normalize: column(s) {sorted(clash)} collide with "
            "internal/output names; rename them first"
        )
    g = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*g).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(*g)
    return (
        df.where(F.col(score_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "pct_micro",
            F.expr(
                "CASE WHEN _n > 1 THEN (CAST(_rn AS BIGINT) - 1) * 1000000 "
                "div (CAST(_n AS BIGINT) - 1) ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .drop("_rn", "_n")
    )


# --------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram LM (Kneser & Ney ICASSP'95; Chen &
# Goodman 1999's interpolated form) — the smoothing that actually wins
# perplexity evaluations, as the upgrade path from the add-α model
# above. The difference that matters for filtering: add-α scores a rare
# continuation of a common context the same as a common continuation of
# a rare context; KN's continuation probability (how many DISTINCT
# contexts a word follows) separates "Francisco" (frequent but only
# after "San") from genuinely productive words — exactly the
# boilerplate-vs-fluent distinction a perplexity filter wants.
# --------------------------------------------------------------------------


@dataclass
class KneserNeyLM:
    """bigram_counts: (prev, cur, n_pc); context_stats: (prev, n_p,
    n1p_fwd) with c(v·) and the distinct-continuation count N1+(v·);
    word_stats: (cur, n1p_bwd) with the distinct-context count N1+(·w);
    n_bigram_types = N1+(··); v = predicted-vocab size; discount_micro =
    the absolute discount D in millionths (0 < D < 1).

    P(w|v) = max(c(vw) − D, 0)/c(v·) + D·N1+(v·)/c(v·) · Pc(w) when
    c(v·) > 0, else Pc(w); the continuation distribution is add-one
    smoothed, Pc(w) = (N1+(·w) + 1)/(N1+(··) + v + 1), so unseen words
    carry mass 1/(N1+(··)+v+1) — a documented deterministic convention,
    like the add-α model's unseen-context ln(1/v) fallback."""

    bigram_counts: DataFrame
    context_stats: DataFrame
    word_stats: DataFrame
    n_bigram_types: int
    v: int
    discount_micro: int

    def save(self, path: str) -> None:
        save_model(
            path,
            {
                "n_bigram_types": self.n_bigram_types,
                "v": self.v,
                "discount_micro": self.discount_micro,
            },
            {
                "bigrams": self.bigram_counts,
                "contexts": self.context_stats,
                "words": self.word_stats,
            },
            coalesce_parts=False,
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "KneserNeyLM":
        meta = load_meta(spark, path)
        return cls(
            bigram_counts=load_part(spark, path, "bigrams"),
            context_stats=load_part(spark, path, "contexts"),
            word_stats=load_part(spark, path, "words"),
            **meta,
        )


def train_kneser_ney(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    discount_micro: int = 750_000,
) -> KneserNeyLM:
    """Fit interpolated-KN statistics: ONE bigram count table feeds
    everything — c(v·)/N1+(v·) are a groupBy of it over prev,
    N1+(·w) over cur, N1+(··)/v two counts of it. The corpus is
    tokenized exactly once; every derived table is vocab-bounded.
    ``discount_micro`` is the absolute discount in millionths
    (750000 = the textbook D ≈ 0.75)."""
    if not 0 < discount_micro < MICRO:
        raise ValueError(
            f"train_kneser_ney: discount_micro must be in (0, 1e6), "
            f"got {discount_micro}"
        )
    pairs = _bigram_pairs(df, id_col, text_col)
    bc = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n_pc")).persist()
    ctx = (
        bc.groupBy("prev")
        .agg(
            F.sum("n_pc").cast("bigint").alias("n_p"),
            F.count(F.lit(1)).cast("bigint").alias("n1p_fwd"),
        )
        .persist()
    )
    wrd = (
        bc.groupBy("cur")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n1p_bwd"))
        .persist()
    )
    n_types = bc.count()  # materializes bc
    v = wrd.count()  # materializes wrd (distinct cur == its row count)
    ctx.count()
    return KneserNeyLM(
        bigram_counts=bc,
        context_stats=ctx,
        word_stats=wrd,
        n_bigram_types=int(n_types),
        v=max(int(v), 1),
        discount_micro=int(discount_micro),
    )


def kn_perplexity_score(
    df: DataFrame, lm: KneserNeyLM, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-doc interpolated-KN fit, same contract as
    :func:`perplexity_score`: ``(doc, n_bigrams, logprob_micro,
    avg_logprob)`` with the exact integer sum of floor-quantized
    micro-log-probs. P(w|v) is a fixed double chain over integer counts
    and the integer discount — division/multiplication are correctly
    rounded, ln's last ulp lands on identical doubles in both engines
    (the established libm contract) and the 1e-6 floor keeps it out of
    the hash in practice. Three vocab-bounded joins; the corpus
    tokenizes once."""
    pairs = _bigram_pairs(df, id_col, text_col)
    j = (
        pairs.join(lm.bigram_counts, ["prev", "cur"], "left")
        .join(lm.context_stats, ["prev"], "left")
        .join(lm.word_stats, ["cur"], "left")
    )
    d = F.lit(float(lm.discount_micro))
    pc = (F.coalesce("n1p_bwd", F.lit(0)) + F.lit(1.0)) / F.lit(
        float(lm.n_bigram_types + lm.v + 1)
    )
    seen_ctx = F.col("n_p").isNotNull() & (F.col("n_p") > 0)
    # all in micro-units: (max(c_vw·1e6 − D_micro, 0) + D_micro·N1+(v·)·Pc) / (c_v·1e6)
    num_main = F.greatest(
        F.coalesce("n_pc", F.lit(0)).cast("double") * F.lit(float(MICRO)) - d,
        F.lit(0.0),
    )
    p = F.when(
        seen_ctx,
        (num_main + d * F.col("n1p_fwd").cast("double") * pc)
        / (F.col("n_p").cast("double") * F.lit(float(MICRO))),
    ).otherwise(pc)
    scored = j.select(
        "doc", F.floor(F.log(p) * F.lit(MICRO)).cast("bigint").alias("_lp")
    )
    agg = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("_lp").alias("logprob_micro")
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("logprob_micro", F.lit(0)).cast("bigint").alias("logprob_micro"),
            (
                F.col("logprob_micro")
                / (F.col("n_bigrams") * F.lit(float(MICRO)))
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# Stupid Backoff trigram LM (Brants et al. EMNLP'07, "Large Language
# Models in Machine Translation" — Google's web-scale n-gram scorer).
# The insight that makes it THE distributed-counting LM: relative
# frequencies with a fixed multiplicative backoff α (no discounting, no
# normalization) need only count tables — every table here derives from
# ONE trigram groupBy by further partial-aggregatable groupBys, so
# training is embarrassingly mergeable across 100 TB of shards, which is
# exactly why Brants et al. chose it over KN at 2e12 tokens. Scores are
# not probabilities (they don't sum to 1 — "stupid" by design); they
# rank docs/sentences, which is all a quality filter needs.
# --------------------------------------------------------------------------


def _trigram_triples(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, w1, w2, w3): one row per real token of the lower-cased
    stream with TWO BOS sentinels, so every token is predicted once
    (the first from (BOS, BOS), the second from (BOS, t1))."""
    toks = tokens(F.lower(F.col(text_col)))
    arr = F.concat(F.array(F.lit(BOS), F.lit(BOS)), toks)
    zipped = F.arrays_zip(
        F.slice(arr, 1, F.size(arr) - 2),
        F.slice(arr, 2, F.size(arr) - 2),
        F.slice(arr, 3, F.size(arr) - 2),
    )
    return df.select(F.col(id_col).alias("doc"), F.explode(zipped).alias("tg")).select(
        "doc",
        F.col("tg.0").alias("w1"),
        F.col("tg.1").alias("w2"),
        F.col("tg.2").alias("w3"),
    )


@dataclass
class StupidBackoffLM:
    """All five tables derive from `trigram_counts` by partial-agg
    groupBys (training re-runs none of the corpus): context2 = Σ over
    w3, bigram_counts = Σ over w1, context1/unigram_counts = Σ of the
    bigram table. v = distinct real tokens, n_tokens = their total;
    alpha_micro = backoff multiplier in millionths (400000 = the
    paper's α = 0.4)."""

    trigram_counts: DataFrame  # (w1, w2, w3, n3)
    context2: DataFrame  # (w1, w2, n12)
    bigram_counts: DataFrame  # (w2, w3, n23)
    context1: DataFrame  # (w2, n2)
    unigram_counts: DataFrame  # (w3, n1)
    n_tokens: int
    v: int
    alpha_micro: int = 400_000


def train_stupid_backoff(
    df: DataFrame, id_col: str, text_col: str = "text", alpha_micro: int = 400_000
) -> StupidBackoffLM:
    """Fit the count hierarchy: the corpus tokenizes ONCE into the
    trigram table; every other table is a groupBy of it (the w2/w3
    margins of the padded trigram stream are exactly the single-BOS
    bigram stream, so the backoff levels are mutually consistent)."""
    if not 0 < alpha_micro < MICRO:
        raise ValueError(
            f"train_stupid_backoff: alpha_micro must be in (0, 1e6), got {alpha_micro}"
        )
    triples = _trigram_triples(df, id_col, text_col)
    tc = (
        triples.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n3"))
        .persist()
    )
    ctx2 = tc.groupBy("w1", "w2").agg(F.sum("n3").cast("bigint").alias("n12")).persist()
    bc = tc.groupBy("w2", "w3").agg(F.sum("n3").cast("bigint").alias("n23")).persist()
    ctx1 = bc.groupBy("w2").agg(F.sum("n23").cast("bigint").alias("n2")).persist()
    uni = (
        bc.groupBy("w3").agg(F.sum("n23").cast("bigint").alias("n1")).persist()
    )
    # v and N from the unigram table (vocab-bounded agg; also
    # materializes the persisted lineage root exactly once)
    tc.count()
    row = uni.agg(
        F.count(F.lit(1)).alias("v"), F.coalesce(F.sum("n1"), F.lit(0)).alias("n")
    ).collect()[0]
    return StupidBackoffLM(
        trigram_counts=tc,
        context2=ctx2,
        bigram_counts=bc,
        context1=ctx1,
        unigram_counts=uni,
        n_tokens=int(row["n"]),
        v=max(int(row["v"]), 1),
        alpha_micro=int(alpha_micro),
    )


def sb_logprob_score(
    df: DataFrame, lm: StupidBackoffLM, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-doc Stupid Backoff fit, same contract as
    :func:`perplexity_score`: ``(doc, n_trigrams, logscore_micro,
    avg_logscore)`` — the exact integer sum of floor-quantized
    micro-log-scores, with S(w3|w1w2) the paper's recursion:

    * trigram seen: ``n3/n12``
    * else bigram seen: ``α · (n23/n2)``
    * else: ``α² · (n1+1)/(N+V)`` — the unigram base is add-1
      smoothed so unseen words score finite (Brants et al. leave OOV
      open; this keeps the score total without changing seen-path
      ratios).

    Each branch is a fixed double chain on integer counts (the KN
    libm contract); α and α² are Python-computed literals injected
    identically into the oracle. Five vocab-bounded joins; the corpus
    tokenizes once."""
    a = lm.alpha_micro / float(MICRO)
    a2 = a * a
    triples = _trigram_triples(df, id_col, text_col)
    j = (
        triples.join(lm.trigram_counts, ["w1", "w2", "w3"], "left")
        .join(lm.context2, ["w1", "w2"], "left")
        .join(lm.bigram_counts, ["w2", "w3"], "left")
        .join(lm.context1, ["w2"], "left")
        .join(lm.unigram_counts, ["w3"], "left")
    )
    p = (
        F.when(
            F.col("n3").isNotNull(),
            F.col("n3").cast("double") / F.col("n12").cast("double"),
        )
        .when(
            F.col("n23").isNotNull(),
            F.lit(a) * (F.col("n23").cast("double") / F.col("n2").cast("double")),
        )
        .otherwise(
            F.lit(a2)
            * (
                (F.coalesce("n1", F.lit(0)) + F.lit(1.0))
                / F.lit(float(lm.n_tokens + lm.v))
            )
        )
    )
    scored = j.select(
        "doc", F.floor(F.log(p) * F.lit(MICRO)).cast("bigint").alias("_lp")
    )
    agg = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_trigrams"), F.sum("_lp").alias("logscore_micro")
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias("n_trigrams"),
            F.coalesce("logscore_micro", F.lit(0))
            .cast("bigint")
            .alias("logscore_micro"),
            (
                F.col("logscore_micro") / (F.col("n_trigrams") * F.lit(float(MICRO)))
            ).alias("avg_logscore"),
        )
    )
