"""Bloom-filter membership sketch — the mergeable "definitely not seen"
structure for 10^12-row pipelines.

Spark's internal ``BloomFilterAggregate`` is not exposed as a SQL function
in this build, so this is a from-scratch implementation on public
primitives: k positions per value via ``xxhash64(value, seed+i)``, bits
set with one explode + ``bit_or`` aggregate (partial+final, the shuffle
carries (word, mask) pairs), membership tested with a pure Column
expression over the bit array shipped as a literal.

Why a validation/dedup engine wants one: an anti-join against a billions-
row seen-store shuffles the whole batch. A Bloom filter has NO false
negatives, so ``might_contain(x) = false`` proves x unseen — those rows
skip the join entirely; only the (1-ish FP-rate inflated) member-looking
remainder needs exact verification. For incremental crawl dedup, where
most docs are NEW, that converts the common case from a shuffle into a
narrow filter (:func:`split_by_membership`).

Size guidance: the literal bit array lands in the query plan — fine to a
few MB (default 1 Mbit = 128 KB ≈ 87k items at 1% FP). For GB-scale
filters, shard the store and build one filter per shard instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.hashing import SIGNED_POW2 as _POW2


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: (m bits, k hashes) for ``n_items`` at ``fpp``."""
    m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / max(n_items, 1) * math.log(2)))
    return m, k


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter: dense word array + the hash recipe. The
    word array is plain Python longs so the filter pickles/broadcasts and
    merges (bitwise OR) without Spark."""

    m: int
    k: int
    seed: int
    words: tuple[int, ...]  # len = ceil(m / 64), signed 64-bit

    # -- construction ------------------------------------------------------
    @staticmethod
    def build(
        df: DataFrame, col: str, m: int = 1 << 20, k: int = 5, seed: int = 42
    ) -> "BloomFilter":
        """One pass: k positions per value (xxhash64 with per-hash seeds)
        → explode → bit_or per 64-bit word (map-side combined). The
        collect is ≤ m/64 longs — driver-bounded by the filter size, never
        by the data."""
        positions = F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(seed + i)), F.lit(m))
                for i in range(k)
            ]
        )
        ex = df.where(F.col(col).isNotNull()).select(
            F.explode(positions).alias("pos")
        )
        rows = (
            ex.select(
                (F.col("pos") / 64).cast("int").alias("word"),
                F.element_at(
                    F.array(*[F.lit(p).cast("long") for p in _POW2]),
                    (F.pmod(F.col("pos"), F.lit(64)) + 1).cast("int"),
                ).alias("mask"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(mask)").alias("mask"))
            .collect()
        )
        words = [0] * ((m + 63) // 64)
        for r in rows:
            words[r["word"]] = r["mask"]
        return BloomFilter(m=m, k=k, seed=seed, words=tuple(words))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Bitwise-OR union — filters built with identical (m, k, seed)
        recipes over different data merge exactly (the treeAggregate
        property every sketch in checks/ provides)."""
        if (self.m, self.k, self.seed) != (other.m, other.k, other.seed):
            raise ValueError("can only merge Bloom filters with identical recipes")
        return BloomFilter(
            self.m, self.k, self.seed,
            tuple(a | b for a, b in zip(self.words, other.words)),
        )

    # -- membership --------------------------------------------------------
    def might_contain(self, col: Column) -> Column:
        """Pure Column membership test: false = DEFINITELY unseen (no
        false negatives by construction); true = seen or a false positive
        at ≈ fpp. Narrow — no join, no shuffle.

        NULL gating is explicit (``when(isNull, False)``): Spark's hash
        functions SKIP null inputs rather than returning NULL, so without
        the gate a NULL probe hashes to fixed positions and can
        spuriously report membership (fourth-review finding, confirmed
        live) — build() drops NULLs, and the test must mirror that.

        Plan size: the word array and mask table are bound ONCE as lambda
        variables (1-element struct transform let-binding) and the k
        membership checks run as a ``forall`` over the position array —
        one copy of each literal in the plan instead of k (the direct
        form carried k×ceil(m/64) literal nodes)."""
        positions = F.array(
            *[
                F.pmod(F.xxhash64(col, F.lit(self.seed + i)), F.lit(self.m))
                for i in range(self.k)
            ]
        )
        ctx = F.array(
            F.struct(
                F.array(*[F.lit(w).cast("long") for w in self.words]).alias("w"),
                F.array(*[F.lit(p).cast("long") for p in _POW2]).alias("p"),
            )
        )
        hit = F.get(
            F.transform(
                ctx,
                lambda c: F.forall(
                    positions,
                    lambda pos: F.element_at(c["w"], (pos / 64).cast("int") + 1)
                    .bitwiseAND(
                        F.element_at(c["p"], (F.pmod(pos, F.lit(64)) + 1).cast("int"))
                    )
                    != 0,
                ),
            ),
            0,
        )
        return F.when(col.isNull(), F.lit(False)).otherwise(
            F.coalesce(hit, F.lit(False))
        )

    def estimated_fpp(self, n_items: int) -> float:
        """Textbook (1 - e^{-kn/m})^k for the given insert count."""
        return (1.0 - math.exp(-self.k * n_items / self.m)) ** self.k


def split_by_membership(
    df: DataFrame, col: str, bloom: BloomFilter
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen): the incremental-dedup prefilter. The
    first frame provably contains no store members and skips the exact
    anti-join entirely; only the second (small when most rows are new)
    pays the join to weed out false positives."""
    hit = bloom.might_contain(F.col(col))
    return df.where(~hit), df.where(hit)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    m: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Bloom-pruned equi-join: build a filter on the dim side's join
    keys, drop fact rows whose key DEFINITELY isn't in dim with a
    narrow Column filter, then run the real join on the survivors —
    the runtime-filter / sideways-information-passing pattern (Spark's
    own `spark.sql.optimizer.runtime.bloomFilter` applies it only when
    its cost model fires; this makes it an explicit operator).

    Semantically TRANSPARENT: Bloom filters have no false negatives, so
    the result equals the plain join row-for-row (the driver oracle IS
    the plain join) — false positives just ride through to the join,
    which drops them exactly. The win at 100 TB: when the dim is
    selective (a filtered customer segment against a 10^12-row fact),
    the pruned fact side shrinks BEFORE the shuffle/broadcast, so the
    exchange carries only ~selectivity·(1+fpp) of the fact. NULL fact
    keys are dropped up front (inner/semi join semantics — a NULL key
    matches nothing).

    ``how``: 'inner' (full dim payload) or 'left_semi' (existence
    only). Both sides must name the key identically — rename upstream
    for role joins.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_pruned_join: how={how!r} (inner or left_semi)")
    bf = BloomFilter.build(dim, key, m=m, k=k, seed=seed)
    pre = fact.where(F.col(key).isNotNull() & bf.might_contain(F.col(key)))
    return pre.join(dim, key, how)
