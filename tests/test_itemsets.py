from __future__ import annotations

from xmlschemavalidator_spark.itemsets import frequent_item_pairs, itemset_hot_baskets


def _baskets(spark):
    # (basket, item): {a,b} together 3x, {a,c} 1x, rare item r once,
    # duplicate rows must collapse
    rows = [
        (1, "a"), (1, "b"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
        (5, "c"), (5, "r"),
        (6, "c"),
    ]
    return spark.createDataFrame(rows, "basket bigint, item string")


def test_frequent_pairs_supports_and_lift(spark):
    got = {
        (r["item_a"], r["item_b"]): r
        for r in frequent_item_pairs(
            _baskets(spark), "basket", "item", min_support=3
        ).collect()
    }
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    # a in 4 baskets, b in 3, together in 3, N=6 -> lift = 3*6/(4*3) = 1.5
    assert (r["pair_count"], r["count_a"], r["count_b"], r["lift"]) == (3, 4, 3, 1.5)


def test_frequent_pairs_apriori_prune_drops_rare_items(spark):
    # min_support=2: item r (1 basket) is pruned before pair generation
    got = frequent_item_pairs(_baskets(spark), "basket", "item", min_support=2)
    items = {r["item_a"] for r in got.collect()} | {r["item_b"] for r in got.collect()}
    assert "r" not in items
    assert ("a", "c") not in {
        (r["item_a"], r["item_b"]) for r in got.collect()
    }  # support 1 < 2


def test_hot_basket_cap_excludes_pairs_but_not_supports(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    # every i2..i9 needs a second basket to survive the a-priori prune,
    # so basket 1 really holds 10 FREQUENT items
    rows += [(10 + k, f"i{k}") for k in range(2, 10)]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    capped = frequent_item_pairs(df, "basket", "item", min_support=2, max_basket=5)
    got = {(r["item_a"], r["item_b"]): r for r in capped.collect()}
    # basket 1 (10 frequent items) is excluded from PAIR generation:
    # (i0, i1) pair_count counts baskets 2 and 3 only...
    assert got[("i0", "i1")]["pair_count"] == 2
    # ...but item supports still count basket 1
    assert got[("i0", "i1")]["count_a"] == 3
    audit = itemset_hot_baskets(df, "basket", "item", min_support=2, max_basket=5)
    assert [(r["basket"], r["n_frequent_items"]) for r in audit.collect()] == [(1, 10)]
