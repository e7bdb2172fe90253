"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Scale design notes (the part that matters at 10^12 docs):

* exact dedup — hash-groupBy on a 16-byte digest, partial+final agg; the
  shuffle carries (digest, id), never the text;
* MinHash+LSH — signatures are computed in ONE narrow projection
  (k × array_min over the shingle array, all JVM); banding turns the
  quadratic candidate problem into a groupBy on (band_id, band_hash);
  candidate pairs are verified with exact Jaccard ONLY within buckets;
* hot buckets (boilerplate shingles) are capped — a bucket with more than
  ``max_bucket`` docs is dropped, not exploded into O(n²) pairs; the "no
  silent caps" rule is served by the audit surfaces
  :func:`minhash_hot_buckets` / :func:`jaccard_hot_shingles`, which return
  exactly what was dropped (empty = full coverage);
* SimHash — 64-bit signatures via an Arrow-batched pandas UDF (numpy bit
  ops); near-dup = signatures within ``hamming_max`` — pigeonhole blocking
  into hamming_max+1 chunks (at least one chunk identical for any
  qualifying pair), again groupBy not cross-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.textops import doc_fingerprint, tokens


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the CPU-heavy narrow stages (shingling, hashing, signatures)
    run at cluster parallelism. A small parquet input arrives as 1-2
    partitions and would otherwise serialize the whole pipeline onto one
    core (measured: the entire minhash_lsh wall time was one task). At real
    scale input partitions >> defaultParallelism and this is a no-op — the
    round-robin shuffle only ever moves data when the input is tiny."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents:
    ``(fingerprint, n_docs, doc_ids)``, only groups with n_docs > 1."""
    fp = doc_fingerprint(F.col(text_col))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the lowest-id doc per fingerprint. Window-free: min-id per group
    then semi join (two hash aggs beat a global sort at scale)."""
    keyed = df.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    keep = keyed.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, on=["fingerprint", id_col], how="left_semi").drop("fingerprint")


# --------------------------------------------------------------------------
# shingles + MinHash + LSH
# --------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles (distinct), all-JVM: slice over the token array."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


# Universal-hash permutation family over the Mersenne prime 2^61-1:
# perm_i(h) = (a_i * h + b_i) mod p with h < 2^31 keeps every product far
# under 2^63 — no overflow even under Spark 4's default ANSI mode.
_MINHASH_P = (1 << 31) - 1  # Mersenne prime


def _perm_consts(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i odd and nonzero."""
    out = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_MINHASH_P - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MINHASH_P
        out.append((a, b))
    return out


def minhash_signature(text: Column, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """MinHash signature as ONE array expression: the shingle array is hashed
    once (pmod(xxhash64) base hash), then the k permutations are cheap
    affine transforms of the precomputed base hashes — the expensive
    shingle-string construction is NOT repeated per permutation (HOF
    subtrees are not common-subexpression-eliminated by codegen, so naive
    per-permutation expressions re-shingle k times; measured 30x slower).

    For corpus-scale signature computation prefer
    :func:`minhash_signatures_df` (explode + 32 partial-aggregated mins)."""
    base = F.transform(
        shingles(text, shingle_n), lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_P))
    )
    consts = _perm_consts(num_hashes)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                base,
                lambda h: F.pmod(
                    h
                    * F.element_at(F.array(*[F.lit(a) for a, _ in consts]), i + 1)
                    + F.element_at(F.array(*[F.lit(b) for _, b in consts]), i + 1),
                    F.lit(_MINHASH_P),
                ),
            )
        ),
    )


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Corpus-scale MinHash: explode distinct shingles (strings built ONCE),
    base-hash each once, then num_hashes partial-aggregable ``min`` columns.
    The shuffle carries (doc, 32 longs) after map-side combine — independent
    of document length. Returns (doc, mh_0..mh_{k-1}); docs too short to
    shingle are absent."""
    ex = (
        _spread(df)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
        .withColumn("h", F.pmod(F.xxhash64("sh"), F.lit(_MINHASH_P)))
    )
    aggs = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MINHASH_P))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_perm_consts(num_hashes))
    ]
    return ex.groupBy("doc").agg(*aggs)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH band buckets with their member doc lists:
    ``(band, bucket, docs)`` — the shared core of candidate generation and
    the hot-bucket audit."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    with_sig = minhash_signatures_df(df, id_col, text_col, num_hashes, shingle_n)
    banded = with_sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * r + j}") for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    return banded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("doc")).alias("docs")
    )


def minhash_hot_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """The buckets :func:`minhash_lsh_candidates` DROPS under its
    ``max_bucket`` cap: ``(band, bucket, n_docs)`` — the 'no silent caps'
    audit surface. Empty result = full candidate coverage."""
    grouped = minhash_band_buckets(df, id_col, text_col, num_hashes, bands, shingle_n)
    return grouped.where(F.size("docs") > max_bucket).select(
        "band", "bucket", F.size("docs").alias("n_docs")
    )


def jaccard_hot_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    max_posting: int = 1000,
) -> DataFrame:
    """The shingles :func:`jaccard_pairs` excludes under ``max_posting``:
    ``(shingle, posting_len)``. Empty result = the capped Jaccard equals
    exact Jaccard."""
    ex = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    return (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("posting_len"))
        .where(F.col("posting_len") > max_posting)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banding: ``(id_a, id_b, n_shared_bands)``.

    rows-per-band r = num_hashes/bands; two docs collide if any band of r
    minhashes is identical. Pairs are generated inside buckets only; hot
    buckets above ``max_bucket`` are excluded (boilerplate guard) — audit
    what was dropped with :func:`minhash_hot_buckets`.
    """
    grouped = minhash_band_buckets(df, id_col, text_col, num_hashes, bands, shingle_n)
    ok = grouped.filter((F.size("docs") > 1) & (F.size("docs") <= max_bucket))
    pairs = (
        ok.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) -> "
                    "transform(slice(docs, i + 2, size(docs) - i - 1), y -> struct(x as a, y as b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_posting: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs from a shingle inverted
    index: ``(id_a, id_b, jaccard)`` with jaccard >= threshold.

    Inverted-index self-join on shingle (ids ordered to halve the pairs),
    count of common shingles per pair, then |A∪B| = |A|+|B|-common. Hot
    shingles with posting lists above ``max_posting`` are excluded from the
    ENTIRE computation — intersection AND sizes — so the result is exact
    Jaccard over the capped shingle universe (audit the exclusions with
    :func:`jaccard_hot_shingles`).
    """
    base = _spread(df).select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    exploded = base.select("doc", F.explode("sh").alias("shingle"))
    # posting-list cap
    hot = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("pl")).where(
        F.col("pl") > max_posting
    )
    cold = exploded.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = cold.select(F.col("shingle"), F.col("doc").alias("id_a"))
    b = cold.select(F.col("shingle"), F.col("doc").alias("id_b"))
    common = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # |A| and |B| over the SAME capped shingle universe as the intersection:
    # counting hot shingles in the sizes but not in `common` would
    # systematically underestimate Jaccard (two near-identical docs that
    # are 50% boilerplate would score ~0.5, not ~1.0)
    cold_sizes = cold.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = cold_sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("na"))
    sb = cold_sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return jac


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash over a whole Arrow batch.

    The per-byte FNV-1a loop runs ONCE PER UNIQUE TOKEN in the batch
    (pd.factorize), not once per occurrence — natural-language token
    frequency is Zipfian, so unique tokens are a small fraction of total.
    Per-document bit votes are segment sums over the flattened ±1 bit rows
    (np.add.reduceat), no per-document Python loop."""
    n = len(texts)
    token_lists = [t.lower().split() if isinstance(t, str) else [] for t in texts]
    lengths = np.array([len(tl) for tl in token_lists], dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return pd.Series(np.zeros(n, dtype=np.int64))
    flat = np.empty(total, dtype=object)
    pos = 0
    for tl in token_lists:
        flat[pos : pos + len(tl)] = tl
        pos += len(tl)
    codes, uniques = pd.factorize(flat)
    # stable FNV-1a token hashes — reproducible across processes/executors
    # (Python's builtin hash() is salted per process; never use it here)
    uh = np.array([_fnv1a64(tok) for tok in uniques], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    contrib = (
        ((uh[:, None] >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1
    )  # (U, 64) rows of +-1
    rows = np.vstack([contrib[codes], np.zeros((1, 64), dtype=np.int64)])  # + sentinel
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    votes = np.add.reduceat(rows, starts, axis=0)
    # reduceat returns rows[start] for empty segments; zero them explicitly
    votes[lengths == 0] = 0
    sig = ((votes > 0).astype(np.uint64) << shifts).sum(axis=1).astype(np.uint64)
    return pd.Series(sig.astype(np.int64))


def _fnv1a64(s: str) -> np.uint64:
    h = np.uint64(0xCBF29CE484222325)
    for byte in s.encode("utf-8"):
        h = np.uint64(h ^ np.uint64(byte))
        h = np.uint64(h * np.uint64(0x100000001B3))
    return h


def simhash(text: Column) -> Column:
    """64-bit SimHash signature (Arrow-batched pandas UDF; stable FNV-1a
    token hashes so signatures are reproducible across runs/executors)."""
    return F.pandas_udf(_simhash_batch, "long")(text)


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str = "text", hamming_max: int = 3
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= hamming_max.

    Pigeonhole blocking: the 64-bit signature is split into
    ``hamming_max + 1`` chunks — at most hamming_max bits differ, so at
    least one chunk is IDENTICAL between any qualifying pair (sound for
    every hamming_max, not just <= 3; a fixed 4-chunk split silently loses
    recall above 3). More chunks = coarser buckets = more candidates to
    verify: keep hamming_max small at corpus scale.
    """
    n_chunks = min(hamming_max + 1, 16)
    width = -(-64 // n_chunks)  # ceil
    mask = (1 << width) - 1
    sigd = _spread(df).select(F.col(id_col).alias("doc"), simhash(F.col(text_col)).alias("sig"))
    chunks = sigd.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        # AND after the shift strips arithmetic sign-extension
                        F.shiftright(F.col("sig"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc", "sig", "c.ci", "c.cv")
    a = chunks.select("ci", "cv", F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"))
    b = chunks.select("ci", "cv", F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, on=["ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", dist).where(F.col("hamming") <= hamming_max).select(
        "id_a", "id_b", "hamming"
    )


# --------------------------------------------------------------------------
# clustering: pairs -> connected components -> canonical survivor
# --------------------------------------------------------------------------

def near_duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs via min-label propagation:
    ``(doc, cluster)`` where cluster = the smallest doc id reachable.

    Each iteration is one join + one min-aggregate; labels converge in
    O(diameter) rounds (near-dup graphs are overwhelmingly tiny cliques, so
    2-3 rounds in practice). ``localCheckpoint`` cuts lineage every round —
    without it the plan doubles per iteration and the driver OOMs long
    before the data does. Stops early at fixpoint (zero changed labels).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("cluster", F.col("doc"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        msgs = (
            edges.join(labels, edges.src == labels.doc)
            .select(F.col("dst").alias("doc"), F.col("cluster"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="doc")
            .where(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def drop_near_duplicates(
    df: DataFrame, id_col: str, pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Keep one canonical doc per near-dup cluster (the smallest id); docs
    not in any pair pass through. A left join against the (small relative to
    the corpus) cluster table — no shuffle of untouched rows when AQE
    broadcasts it."""
    clusters = near_duplicate_clusters(pairs, id_a, id_b)
    losers = clusters.where(F.col("doc") != F.col("cluster")).select(
        F.col("doc").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two float-array columns — JVM-side zip_with/aggregate."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_duplicates(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    nbits: int = 12, seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold.

    Scale path: random-hyperplane LSH — ``nbits`` sign bits from
    deterministic pseudo-random planes bucket the vectors; exact cosine is
    verified only within buckets. High-cosine pairs agree on most
    hyperplane signs, so collision probability ≈ (1 - θ/π)^nbits.
    """
    from xmlschemavalidator_spark.similarity import hyperplane_bucket

    keyed = df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"))
    bucketed = keyed.withColumn("bucket", hyperplane_bucket(F.col("vec"), nbits, seed))
    a = bucketed.select("bucket", F.col("doc").alias("id_a"), F.col("vec").alias("va"))
    b = bucketed.select("bucket", F.col("doc").alias("id_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        # threshold the UNROUNDED cosine (rounding first would admit pairs
        # up to 5e-7 below threshold and diverge from the exact oracle);
        # round only in the output projection
        .withColumn("_cos", cosine_similarity(F.col("va"), F.col("vb")))
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
    )
