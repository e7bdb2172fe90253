"""Sampling/mixing tests: determinism, engine parity, budget semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.sampling import (
    deterministic_sample,
    md5_threshold,
    sample_key_sql,
    stratified_sample,
    token_budget_select,
)


def test_md5_threshold_bounds():
    assert md5_threshold(0.0) == "0" * 32
    assert md5_threshold(1.0) == "f" * 32
    assert md5_threshold(0.5).startswith("8")
    with pytest.raises(ValueError):
        md5_threshold(1.5)


def test_deterministic_sample_stable_and_calibrated(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    assert s1 == s2  # pure function of the id
    assert 0.17 < len(s1) / 20000 < 0.23  # calibrated
    # independent salts give (near-)independent samples
    s3 = {r["doc_id"] for r in
          deterministic_sample(df, "doc_id", 0.2, salt="other").collect()}
    overlap = len(s1 & s3) / 20000
    assert 0.02 < overlap < 0.07  # ~= 0.04 expected under independence
    # nested property: a smaller fraction with the same salt is a subset
    s_small = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    assert s_small <= s1


def test_deterministic_sample_matches_duckdb(spark):
    """The engine-portability claim, checked directly: the same predicate
    in DuckDB selects exactly the same ids."""
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    got = sorted(r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.15).collect())
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"SELECT i FROM range(5000) t(i) "
            f"WHERE {sample_key_sql('i', 'sample')} < '{md5_threshold(0.15)}' ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_stratified_sample_fractions(spark):
    df = spark.range(30000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("sv")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.3}, default_fraction=0.05
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["en"] == 10000                # keep all
    assert 2500 < counts["de"] < 3500           # ~30%
    assert 300 < counts.get("sv", 0) < 700      # ~5% default


def test_token_budget_select_semantics(spark):
    df = spark.createDataFrame(
        [
            # group a: costs 50, 40, 30 (ordered desc) — budget 80 keeps
            # 50 (spent_before 0) and 40 (spent_before 50 < 80); the 40
            # crosses the line and IS included; 30 (spent_before 90) is out
            (1, "a", 50),
            (2, "a", 40),
            (3, "a", 30),
            # group b: single row over budget still kept (first-to-exceed)
            (4, "b", 500),
        ],
        "doc_id bigint, grp string, cost long",
    )
    got = sorted(
        r["doc_id"]
        for r in token_budget_select(df, "doc_id", "grp", "cost", budget=80).collect()
    )
    assert got == [1, 2, 4]
    # ascending=True flips the order: cheapest first
    got_asc = sorted(
        r["doc_id"]
        for r in token_budget_select(
            df, "doc_id", "grp", "cost", budget=80, ascending=True
        ).collect()
    )
    # ascending: 30 (spent_before 0), 40 (30 < 80), 50 (70 < 80) — all kept
    assert got_asc == [1, 2, 3, 4]


def test_deterministic_shuffle_partitioning_invariant(spark):
    from xmlschemavalidator_spark.sampling import deterministic_shuffle

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = deterministic_shuffle(df, "doc_id", n_shards=4, salt="s1")
    b = deterministic_shuffle(df.repartition(7), "doc_id", n_shards=4, salt="s1")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every shard's positions are contiguous 1..n (a training reader can
    # consume shard files in pos order with no gaps)
    per = a.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    ).collect()
    assert len(per) == 4
    for r in per:
        assert r["mn"] == 1 and r["mx"] == r["n"]
    # a different salt produces a different order
    c = deterministic_shuffle(df, "doc_id", n_shards=4, salt="s2")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_deterministic_shuffle_rejects_bad_shards(spark):
    import pytest as _pytest

    from xmlschemavalidator_spark.sampling import deterministic_shuffle

    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError):
        deterministic_shuffle(df, "doc_id", n_shards=0)


# --------------------------------------------------------------------------
# UniMax budget allocation (Chung et al., ICLR 2023)
# --------------------------------------------------------------------------

def test_unimax_py_waterfilling_basics():
    from xmlschemavalidator_spark.sampling import unimax_allocation_py

    # small langs capped at max_epochs, the big one takes the remainder
    sizes = {"en": 1000, "de": 100, "zh": 50}
    alloc = unimax_allocation_py(sizes, total_budget=700, max_epochs=3)
    # zh capped at 3 epochs (150); de's cap (300) exceeds the uniform
    # share of the remainder (550/2), so de and en split it equally
    assert alloc == {"zh": 150, "de": 275, "en": 275}
    assert sum(alloc.values()) == 700  # budget exactly spent
    # with a roomier budget de gets capped too
    alloc = unimax_allocation_py(sizes, total_budget=1000, max_epochs=3)
    assert alloc == {"zh": 150, "de": 300, "en": 550}

    # over-subscribed budget: everything capped, leftover unassigned
    alloc = unimax_allocation_py(sizes, total_budget=100_000, max_epochs=2)
    assert alloc == {"en": 2000, "de": 200, "zh": 100}

    # zero budget
    assert unimax_allocation_py(sizes, 0, 3) == {"en": 0, "de": 0, "zh": 0}

    # remainder units go to alphabetically-first uncapped groups
    alloc = unimax_allocation_py({"a": 100, "b": 100, "c": 100}, 101, 1)
    assert alloc == {"a": 34, "b": 34, "c": 33}


def test_unimax_py_budget_conservation_property():
    from xmlschemavalidator_spark.sampling import unimax_allocation_py

    import itertools

    for sizes, budget, epochs in itertools.product(
        [{"a": 7, "b": 31, "c": 500}, {"x": 1, "y": 1}, {"solo": 9}],
        [0, 5, 40, 10_000],
        [1, 2, 5],
    ):
        alloc = unimax_allocation_py(sizes, budget, epochs)
        caps = {g: n * epochs for g, n in sizes.items()}
        assert all(0 <= alloc[g] <= caps[g] for g in sizes)
        assert sum(alloc.values()) == min(budget, sum(caps.values()))


def test_unimax_allocation_df_matches_py(spark):
    from xmlschemavalidator_spark.sampling import (
        unimax_allocation,
        unimax_allocation_py,
    )

    df = spark.createDataFrame(
        [(i, ["en", "en", "en", "de", "zh"][i % 5], 10 + i) for i in range(50)],
        "doc_id long, lang string, cost long",
    )
    sizes = {
        r[0]: r[1]
        for r in df.groupBy("lang").agg(F.sum("cost")).collect()
    }
    table = unimax_allocation(df, "lang", "cost", 800, 2)
    got = {r["lang"]: (r["corpus_cost"], r["alloc_cost"], r["capped"]) for r in table.collect()}
    alloc = unimax_allocation_py(sizes, 800, 2)
    for g in sizes:
        assert got[g] == (sizes[g], alloc[g], alloc[g] == sizes[g] * 2)


def test_unimax_apply_epochs_and_partial(spark):
    from xmlschemavalidator_spark.sampling import unimax_apply

    # de tiny (capped at 3 epochs), en big (gets remainder: 1 full epoch
    # + a partial one)
    data = [(i, "en" if i < 20 else "de", 10) for i in range(24)]
    df = spark.createDataFrame(data, "doc_id long, lang string, cost long")
    # caps: en 600, de 120; budget 400 -> de capped (120), en gets 280
    # = 1 full epoch (200) + partial 80 -> 8 docs of epoch 2
    out = unimax_apply(df, "doc_id", "lang", "cost", 400, 3)
    per = {(r["lang"], r["epoch"]): 1 for r in out.select("lang", "epoch").distinct().collect()}
    counts = {
        (r["lang"], r["epoch"]): r["n"]
        for r in out.groupBy("lang", "epoch").agg(F.count("*").alias("n")).collect()
    }
    assert counts[("de", 1)] == 4 and counts[("de", 2)] == 4 and counts[("de", 3)] == 4
    assert ("de", 4) not in counts
    assert counts[("en", 1)] == 20
    assert counts[("en", 2)] == 8  # 80 budget / 10 cost each
    assert ("en", 3) not in counts
    # deterministic: same call, same rows
    again = unimax_apply(df, "doc_id", "lang", "cost", 400, 3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_unimax_apply_zero_cost_group_dropped(spark):
    from xmlschemavalidator_spark.sampling import unimax_apply

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "empty", 0)], "doc_id long, lang string, cost long"
    )
    out = unimax_apply(df, "doc_id", "lang", "cost", 100, 2)
    assert [r["lang"] for r in out.select("lang").distinct().collect()] == ["en"]


def test_assign_split_exhaustive_disjoint_and_stable(spark):
    """Every row gets exactly one label; proportions track weights; a
    doc's label is independent of corpus size (stability under growth);
    bad weights error."""
    import pytest as _pytest

    from xmlschemavalidator_spark.sampling import assign_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = assign_split(df, "doc_id", w)
    counts = {r["split"]: r["n"] for r in
              got.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    assert 1500 < counts["train"] < 1900  # ~1600
    # stability: labels of the first 100 docs are identical in a
    # 100-doc corpus and a 2000-doc corpus
    small = assign_split(
        spark.range(100).withColumnRenamed("id", "doc_id"), "doc_id", w
    )
    big_first = {r["doc_id"]: r["split"]
                 for r in got.where(F.col("doc_id") < 100).collect()}
    assert {r["doc_id"]: r["split"] for r in small.collect()} == big_first
    with _pytest.raises(ValueError, match="sum to 1"):
        assign_split(df, "doc_id", {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError, match="at least one"):
        assign_split(df, "doc_id", {})


def test_assign_split_sql_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.sampling import assign_split, assign_split_sql

    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    got = sorted(
        (r["doc_id"], r["split"])
        for r in assign_split(df, "doc_id", w).collect()
    )
    duck = sorted(duckdb.sql(
        "select i, " + assign_split_sql("i", w)
        + " from (select unnest(range(500)) as i)"
    ).fetchall())
    assert got == duck


# --- temperature sampling ---------------------------------------------------


def _skewed(spark):
    rows = (
        [(i, "en") for i in range(1000)]
        + [(1000 + i, "de") for i in range(100)]
        + [(1100 + i, "sv") for i in range(10)]
        + [(1110, None)]
    )
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_temperature_mix_alpha1_is_proportional(spark):
    from xmlschemavalidator_spark.sampling import temperature_mix

    df = _skewed(spark)
    out = temperature_mix(df, "doc_id", "lang", budget_rows=555, alpha=1.0)
    rows = out.collect()
    # alpha=1: rate = budget/N = 0.5 for every group -> pure downsample
    assert all(r["n_copies"] == 1 for r in rows)
    assert all(r["lang"] is not None for r in rows)  # NULL group excluded
    by_lang = {
        lang: sum(1 for r in rows if r["lang"] == lang)
        for lang in ("en", "de", "sv")
    }
    # proportional within binomial noise (n=1000/100/10 at p=0.5)
    assert 430 <= by_lang["en"] <= 570
    assert 33 <= by_lang["de"] <= 67
    # determinism: same salt -> identical membership
    again = {
        (r["doc_id"], r["n_copies"])
        for r in temperature_mix(
            df, "doc_id", "lang", budget_rows=555, alpha=1.0
        ).collect()
    }
    assert again == {(r["doc_id"], r["n_copies"]) for r in rows}


def test_temperature_mix_boosts_low_resource_and_upsamples(spark):
    from xmlschemavalidator_spark.sampling import temperature_mix

    df = _skewed(spark)
    out = temperature_mix(df, "doc_id", "lang", budget_rows=1110, alpha=0.0)
    sums = {
        r["lang"]: r["s"]
        for r in out.groupBy("lang").agg(F.sum("n_copies").alias("s")).collect()
    }
    # alpha=0: equal expected copies per group (370 each); sv (n=10) must
    # upsample hard -> every doc gets 37 guaranteed copies
    assert sums["sv"] in (370, 380) and sums["sv"] >= 37 * 10
    assert abs(sums["de"] - 370) < 60
    assert abs(sums["en"] - 370) < 60
    svc = {r["n_copies"] for r in out.where(F.col("lang") == "sv").collect()}
    assert svc <= {37, 38} and 37 in svc
    with pytest.raises(ValueError):
        temperature_mix(df, "doc_id", "lang", budget_rows=-1)


def test_temperature_mix_duckdb_parity(spark):
    from xmlschemavalidator_spark.sampling import (
        temperature_mix,
        temperature_mix_sql,
    )

    df = _skewed(spark)
    got = {
        (r["doc_id"], r["lang"], r["n_copies"])
        for r in temperature_mix(
            df, "doc_id", "lang", budget_rows=600, alpha=0.3
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = {
        (int(d), g, int(c))
        for d, g, c in con.execute(
            temperature_mix_sql("doc_id", "lang", 600, alpha=0.3)
        ).fetchall()
    }
    assert got == want


def test_weighted_sample_bias_and_determinism(spark):
    from xmlschemavalidator_spark.sampling import weighted_sample

    # 100 light rows (w=1) + 10 heavy rows (w=1000): heavies dominate
    rows = [(i, 1.0) for i in range(100)] + [(100 + i, 1000.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = weighted_sample(df, "id", "w", k=10)
    ids = [r["id"] for r in got.collect()]
    assert len(ids) == 10 and len(set(ids)) == 10  # without replacement
    assert sum(1 for i in ids if i >= 100) >= 8  # weight-proportional

    again = [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()]
    assert ids == again  # content-addressed: identical rerun
    other = [r["id"] for r in weighted_sample(df, "id", "w", k=10, salt="x").collect()]
    assert ids != other  # salt changes the draw


def test_weighted_sample_excludes_nonpositive(spark):
    from xmlschemavalidator_spark.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "id bigint, w double"
    )
    got = [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()]
    assert got == [1]


def test_stratified_fixed_k_exact_sizes_and_stability(spark):
    from xmlschemavalidator_spark.sampling import stratified_fixed_k

    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_fixed_k(df, "doc_id", "lang", k=7)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"a": 7, "b": 7}
    # small stratum: min(k, size)
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id bigint, lang string")
    assert stratified_fixed_k(tiny, "doc_id", "lang", k=7).count() == 2
    # selection is a pure function of (salt, id): adding rows that don't
    # enter the top-k by key leaves the original picks in place
    picked = {r["doc_id"] for r in out.where(F.col("lang") == "a").collect()}
    again = {
        r["doc_id"]
        for r in stratified_fixed_k(df, "doc_id", "lang", k=7)
        .where(F.col("lang") == "a")
        .collect()
    }
    assert picked == again


def test_stratified_fixed_k_matches_unsalted_window(spark):
    """The salted two-phase plan must equal the single-window spec."""
    from pyspark.sql import Window

    from xmlschemavalidator_spark.sampling import _sample_key, stratified_fixed_k

    rows = [(i, f"l{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = sorted(
        (r["lang"], r["doc_id"])
        for r in stratified_fixed_k(df, "doc_id", "lang", k=11).collect()
    )
    w = Window.partitionBy("lang").orderBy(
        _sample_key(F.col("doc_id"), "fixedk").asc(), F.col("doc_id").asc()
    )
    want = sorted(
        (r["lang"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 11)
        .collect()
    )
    assert got == want


def test_assign_split_group_aware_no_leakage(spark):
    from xmlschemavalidator_spark.sampling import assign_split, split_leakage_audit

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).alias("domain")
    )
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    grouped = assign_split(df, "doc_id", w, group_col="domain")
    # every member of a domain shares its split
    [r] = split_leakage_audit(grouped, "domain").collect()
    assert (r["n_groups"], r["n_leaky_groups"], r["max_splits_per_group"]) == (17, 0, 1)
    # the same split keyed per-doc DOES leak on grouped data (the audit
    # must carry signal in both directions)
    per_doc = assign_split(df, "doc_id", w)
    [r2] = split_leakage_audit(per_doc, "domain").collect()
    assert r2["n_leaky_groups"] > 0
    # group label = the label its group key would get standalone
    from xmlschemavalidator_spark.sampling import assign_split as asg

    direct = {
        r["doc_id"]: r["split"]
        for r in asg(
            df.select(F.col("domain").alias("doc_id")).distinct(), "doc_id", w
        ).collect()
    }
    for row in grouped.collect():
        assert row["split"] == direct[row["domain"]]


def test_assign_split_null_group_lands_in_last_label(spark):
    from xmlschemavalidator_spark.sampling import assign_split

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "doc_id long, domain string"
    )
    w = {"train": 0.5, "test": 0.5}
    got = {
        r["doc_id"]: r["split"]
        for r in assign_split(df, "doc_id", w, group_col="domain").collect()
    }
    assert got[2] == "test" and got[3] == "test"


def test_interleave_by_group_rotates_languages(spark):
    from xmlschemavalidator_spark.sampling import interleave_by_group

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = interleave_by_group(df, "doc_id", "lang").orderBy("interleave_pos")
    langs = [r["lang"] for r in out.collect()]
    # positions rotate de, en, fr, de, en, fr... while all groups last
    assert langs[:9] == ["de", "en", "fr"] * 3
    # positions are unique and deterministic across runs
    pos = [r["interleave_pos"] for r in out.collect()]
    assert len(set(pos)) == 30
    again = [
        r["interleave_pos"]
        for r in interleave_by_group(df, "doc_id", "lang")
        .orderBy("interleave_pos")
        .collect()
    ]
    assert pos == again


def test_interleave_by_group_uneven_groups(spark):
    from xmlschemavalidator_spark.sampling import interleave_by_group

    rows = [(i, "big") for i in range(10)] + [(100, "small")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = interleave_by_group(df, "doc_id", "lang").orderBy("interleave_pos")
    langs = [r["lang"] for r in out.collect()]
    # small appears once, early; big fills the rest in order
    assert langs[1] == "small" and langs.count("small") == 1


def test_neyman_allocation_hand_computed(spark):
    from xmlschemavalidator_spark.sampling import neyman_allocation

    # stratum a: constant values (sd 0); b: high variance; c: mild
    rows = (
        [("a", 10.0)] * 40
        + [("b", v) for v in (0.0, 100.0) * 15]
        + [("c", v) for v in (10.0, 12.0) * 10]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["stratum"]: r for r in
           neyman_allocation(df, "v", "g", total_n=100).collect()}
    assert got["a"]["n_rows"] == 40 and got["a"]["sd"] == 0.0
    # both allocations sum exactly to the budget
    assert sum(r["n_proportional"] for r in got.values()) == 100
    assert sum(r["n_neyman"] for r in got.values()) == 100
    # proportional follows N_h: 100·(40,30,20)/90 = 44.4/33.3/22.2 ->
    # bases 44/33/22 (sum 99), the leftover seat goes to the largest
    # remainder (a at .44) -> 45/33/22
    assert got["a"]["n_proportional"] == 45
    assert got["b"]["n_proportional"] == 33
    assert got["c"]["n_proportional"] == 22
    # Neyman starves the zero-variance stratum and feeds the volatile one
    assert got["a"]["n_neyman"] == 0
    assert got["b"]["n_neyman"] > got["b"]["n_proportional"]
    # python replay of the Hamilton apportionment on integer weights
    import math

    def sd(vals):
        n = len(vals)
        qs = [math.floor(v * 1_000_000) for v in vals]
        var = max(
            (sum(x * x for x in qs) - sum(qs) ** 2 / n) / (n - 1) / 1e12, 0.0
        )
        return math.sqrt(var)

    vals = {"a": [10.0] * 40, "b": [0.0, 100.0] * 15, "c": [10.0, 12.0] * 10}
    w = {g: len(v) * math.floor(sd(v) * 1e6) for g, v in vals.items()}
    W = sum(w.values())
    bases = {g: 100 * wh // W for g, wh in w.items()}
    rems = {g: 100 * wh - bases[g] * W for g, wh in w.items()}
    left = 100 - sum(bases.values())
    for g in sorted(rems, key=lambda g: (-rems[g], g))[:left]:
        bases[g] += 1
    for g in vals:
        assert got[g]["n_neyman"] == bases[g]

    # all-zero-variance corpus: neyman falls back to proportional
    flat = [("a", 1.0)] * 30 + [("b", 2.0)] * 10
    gf = {r["stratum"]: r for r in neyman_allocation(
        spark.createDataFrame(flat, "g string, v double"), "v", "g", total_n=10
    ).collect()}
    assert gf["a"]["n_neyman"] == gf["a"]["n_proportional"] == 8  # 30/40*10=7.5->8? Hamilton: base 7 rem .5; b base 2 rem .5; leftover 1 -> tie rem, stratum asc -> a
    assert gf["b"]["n_neyman"] == gf["b"]["n_proportional"] == 2


def test_stratified_estimate_census_and_partial(spark):
    import math

    from xmlschemavalidator_spark.sampling import stratified_estimate

    full = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)] + [("b", float(v)) for v in (10, 20)],
        "g string, v double",
    )
    # census sample: FPC kills the variance entirely, total is exact
    [r] = stratified_estimate(full, full, "v", "g").collect()
    assert (r["n_population"], r["n_sampled"], r["n_strata"]) == (6, 6, 2)
    assert r["est_total"] == 40.0 and r["se_total"] == 0.0
    assert r["ci_lo_total"] == r["ci_hi_total"] == 40.0
    assert r["est_mean"] == round(40 / 6, 6)

    # partial sample: replay T = sum N_h * mean_h and the FPC variance
    smp = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)], "g string, v double"
    )
    [rp] = stratified_estimate(full, smp, "v", "g").collect()
    t = round(4 * 2.0, 12) + round(2 * 15.0, 12)
    va = 4 * 4 * (1 - 2 / 4) * 2.0 / 2          # s_a^2 of (1,3) = 2
    vb = 2 * 2 * (1 - 2 / 2) * 50.0 / 2         # FPC zero: census stratum
    assert rp["est_total"] == round(t, 6)
    assert rp["se_total"] == round(math.sqrt(va + vb), 6)
    assert rp["n_sampled"] == 4

    # unsampled stratum: coverage explicit, never imputed
    smp_a = spark.createDataFrame([("a", 2.0), ("a", 4.0)], "g string, v double")
    [ru] = stratified_estimate(full, smp_a, "v", "g").collect()
    assert ru["n_strata_unsampled"] == 1
    assert ru["n_pop_covered"] == 4 and ru["n_population"] == 6
    assert ru["est_total"] == 4 * 3.0  # only stratum a projects
    assert ru["est_mean"] == 3.0       # mean OF THE COVERED population

    # single-row stratum: zero variance contribution, still covered
    smp_one = spark.createDataFrame(
        [("a", 2.0), ("b", 10.0)], "g string, v double"
    )
    [r1] = stratified_estimate(full, smp_one, "v", "g").collect()
    assert r1["se_total"] == 0.0 and r1["n_strata_unsampled"] == 0


# ---------------------------------------------------------------------------
# poisson_ht_estimate
# ---------------------------------------------------------------------------


def test_poisson_ht_all_certain_is_exact(spark):
    # expected_n >= n with equal sizes -> every pi = 1, y_hat == true total
    import pytest

    from xmlschemavalidator_spark.sampling import poisson_ht_estimate

    rows = [(i, float(i + 1), 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, y double, size double")
    [r] = poisson_ht_estimate(df, "id", "y", "size", expected_n=20).collect()
    assert r["n_sampled"] == 20
    assert r["y_hat"] == float(sum(i + 1 for i in range(20)))
    assert r["se"] == 0.0  # certainty sampling has zero design variance
    with pytest.raises(ValueError):
        poisson_ht_estimate(df, "id", "y", "size", expected_n=0)


def test_poisson_ht_deterministic_and_unbiased_shape(spark):
    import random

    from xmlschemavalidator_spark.sampling import poisson_ht_estimate

    random.seed(4)
    rows = [
        (i, round(random.expovariate(0.02), 3), round(random.random() * 9 + 1, 3))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, y double, size double")
    [r1] = poisson_ht_estimate(df, "id", "y", "size", expected_n=200).collect()
    [r2] = poisson_ht_estimate(df, "id", "y", "size", expected_n=200).collect()
    assert tuple(r1) == tuple(r2)  # content-addressed: identical replays
    true_total = sum(y for _, y, _ in rows)
    # the 95% CI from one fixed draw should bracket the truth here
    assert r1["ci_low"] <= true_total <= r1["ci_high"]
    # a different salt gives a different (still valid) draw
    [r3] = poisson_ht_estimate(
        df, "id", "y", "size", expected_n=200, salt="other"
    ).collect()
    assert r3["n_sampled"] != r1["n_sampled"] or r3["y_hat"] != r1["y_hat"]


def test_poisson_ht_nonpositive_sizes_excluded(spark):
    from xmlschemavalidator_spark.sampling import poisson_ht_estimate

    rows = [(1, 5.0, 2.0), (2, 7.0, 0.0), (3, 9.0, None), (4, 1.0, 3.0)]
    df = spark.createDataFrame(rows, "id long, y double, size double")
    [r] = poisson_ht_estimate(df, "id", "y", "size", expected_n=2).collect()
    assert r["n_pop"] == 2  # only the two positive-size rows frame-eligible
