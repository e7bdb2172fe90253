"""Frequent-itemset pair mining (association analysis) over baskets.

The classic market-basket question — which items co-occur more often
than chance — applied to the engine's data shapes: parts co-purchased
per order, domains co-visited per user, tokens co-occurring per
document. This is the Apriori candidate-pruning pass (Agrawal & Srikant
VLDB'94) specialized to pairs, which is where distributed mining spends
its time (SON/"Park-Chen-Yu" style systems mine pairs exactly and only
recurse for the tiny frequent tail).

Scale shape: pass 1 is one partial-aggregatable item count (the
a-priori prune: a frequent pair needs BOTH items frequent); pass 2
filters baskets to frequent items, CAPS the per-basket item count (a
10k-item basket would emit 5·10⁷ pairs — the hot-basket audit surfaces
what the cap drops, the no-silent-caps rule), and generates ordered
pairs with one narrow indexed HOF per basket — never a positional
self-join of the exploded table. One shuffle on the pair key.

Reference points: Spark MLlib's FPGrowth mines the same supports but is
RDD-based and returns driver-side models; this stays DataFrame-native
and oracle-checkable row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frequent_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """Distinct (basket, item) pairs restricted to frequent items, plus
    the per-item support carried along for the lift computation."""
    b = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    f1 = b.groupBy("item").agg(F.count(F.lit(1)).alias("item_cnt")).where(
        F.col("item_cnt") >= min_support
    )
    return b.join(f1, "item")


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    max_basket: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Frequent co-occurring item pairs: ``(item_a, item_b, pair_count,
    count_a, count_b, lift)`` for unordered pairs appearing together in
    at least ``min_support`` baskets, with
    ``lift = pair_count·N / (count_a·count_b)`` (N = total baskets —
    lift > 1 means the pair co-occurs above independence).

    Input is LONG form — one row per (basket, item) occurrence;
    duplicates collapse map-side. Baskets with more than ``max_basket``
    frequent items are EXCLUDED from pair generation (audit with
    :func:`itemset_hot_baskets`); their items still count toward
    count_a/count_b and N, so supports stay exact over all baskets
    while the pair set is exact over the capped ones — both halves of
    the contract are disclosed, neither silently wrong.

    Exactness: pair/item counts are integers; lift is one double
    division chain rounded to ``round_to`` — identical cross-engine.
    """
    fb = _frequent_baskets(df, basket_col, item_col, min_support)
    n_baskets = (
        df.select(F.col(basket_col).alias("basket"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    )
    grouped = fb.groupBy("basket").agg(
        F.sort_array(F.collect_list("item")).alias("items")
    )
    ok = grouped.where(
        (F.size("items") > 1) & (F.size("items") <= max_basket)
    )
    pairs = (
        ok.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items) - i - 1), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .where(F.col("pair_count") >= min_support)
    )
    sup = fb.select("item", "item_cnt").distinct()
    sa = sup.select(
        F.col("item").alias("item_a"), F.col("item_cnt").alias("count_a")
    )
    sb = sup.select(
        F.col("item").alias("item_b"), F.col("item_cnt").alias("count_b")
    )
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.col("count_a").cast("bigint").alias("count_a"),
            F.col("count_b").cast("bigint").alias("count_b"),
            F.round(
                F.col("pair_count").cast("double")
                * F.col("n_baskets").cast("double")
                / (
                    F.col("count_a").cast("double")
                    * F.col("count_b").cast("double")
                ),
                round_to,
            ).alias("lift"),
        )
    )


def itemset_hot_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    max_basket: int = 1000,
) -> DataFrame:
    """Audit surface for :func:`frequent_item_pairs`' basket cap:
    ``(basket, n_frequent_items)`` for every basket excluded from pair
    generation — the no-silent-caps rule."""
    fb = _frequent_baskets(df, basket_col, item_col, min_support)
    return (
        fb.groupBy("basket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_frequent_items"))
        .where(F.col("n_frequent_items") > max_basket)
    )
