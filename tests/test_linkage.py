"""linkage.py — Fellegi–Sunter scoring with hand-computed weights."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.linkage import (
    FsField,
    fellegi_sunter_score,
    fs_weight_sql_terms,
)


def test_fs_field_weights_micro():
    f = FsField("name", m=0.9, u=0.1)
    wa, wd = f.weights_micro()
    assert wa == round(math.log2(9.0) * 1e6) == 3_169_925
    assert wd == -3_169_925  # symmetric by construction here


def test_fs_field_validation():
    with pytest.raises(ValueError):
        FsField("x", m=0.2, u=0.5)  # m <= u
    with pytest.raises(ValueError):
        FsField("x", m=1.0, u=0.5)  # boundary


def test_fellegi_sunter_score_hand_computed(spark):
    fields = [FsField("name", 0.9, 0.1), FsField("bal", 0.8, 0.2)]
    # weights: name ±3169925, bal ±2000000
    pairs = spark.createDataFrame(
        [
            (1, 2, True, True),  # 5169925 -> match
            (3, 4, True, False),  # 1169925 -> possible
            (5, 6, None, True),  # 2000000 -> possible (NULL contributes 0)
            (7, 8, False, False),  # -5169925 -> non_match
        ],
        "id_a long, id_b long, name_eq boolean, bal_eq boolean",
    )
    out = fellegi_sunter_score(
        pairs,
        {"name": F.col("name_eq"), "bal": F.col("bal_eq")},
        fields,
        upper_micro=4_000_000,
        lower_micro=0,
    )
    got = {
        (r["id_a"], r["id_b"]): (r["weight_micro"], r["decision"], r["agree_name"])
        for r in out.collect()
    }
    assert got[(1, 2)] == (5_169_925, "match", True)
    assert got[(3, 4)] == (1_169_925, "possible", True)
    assert got[(5, 6)] == (2_000_000, "possible", None)
    assert got[(7, 8)] == (-5_169_925, "non_match", False)


def test_fellegi_sunter_validation(spark):
    pairs = spark.createDataFrame([(1, 2, True)], "id_a long, id_b long, x boolean")
    with pytest.raises(ValueError):
        fellegi_sunter_score(
            pairs, {"x": F.col("x")}, [FsField("y", 0.9, 0.1)], 1, 0
        )
    with pytest.raises(ValueError):
        fellegi_sunter_score(
            pairs, {"x": F.col("x")}, [FsField("x", 0.9, 0.1)], 0, 1
        )


def test_fs_weight_sql_terms_mirrors_weights():
    fields = [FsField("name", 0.9, 0.1)]
    sql = fs_weight_sql_terms(fields, {"name": "a = b"})
    assert "3169925" in sql and "-3169925" in sql and "(a = b) IS NULL" in sql


# --------------------------------------------------------------------------
# EM estimation
# --------------------------------------------------------------------------

from xmlschemavalidator_spark.linkage import (  # noqa: E402
    fs_em_estimate,
    fs_em_oracle_cte,
    fs_em_python,
    fs_pattern_counts,
)


def _planted_patterns(lam, m, u, n_total):
    """Expected pattern counts under the FS generative model."""
    import itertools

    nf = len(m)
    out = []
    for gamma in itertools.product([True, False], repeat=nf):
        pm, pu = lam, 1.0 - lam
        for i in range(nf):
            pm *= m[i] if gamma[i] else 1.0 - m[i]
            pu *= u[i] if gamma[i] else 1.0 - u[i]
        out.append((gamma, max(1, round((pm + pu) * n_total))))
    return out


def test_fs_em_recovers_planted_parameters():
    # 3 conditionally-independent fields — the Fellegi-Sunter
    # identifiability minimum (2 fields admit equivalent-likelihood
    # solutions and EM picks one of them)
    lam, m, u = 0.2, [0.95, 0.85, 0.9], [0.05, 0.25, 0.1]
    pats = _planted_patterns(lam, m, u, 1_000_000)
    el, em, eu = fs_em_python(pats, 3, iterations=60)
    assert abs(el - lam) < 0.01
    for got, want in zip(em, m):
        assert abs(got - want) < 0.02
    for got, want in zip(eu, u):
        assert abs(got - want) < 0.02


def test_fs_pattern_counts_excludes_null_vectors(spark):
    pairs = spark.createDataFrame(
        [(True, True), (True, True), (False, True), (None, True)],
        "a boolean, b boolean",
    )
    got = sorted(
        (r["agree_x"], r["agree_y"], r["n"])
        for r in fs_pattern_counts(
            pairs, {"x": F.col("a"), "y": F.col("b")}
        ).collect()
    )
    assert got == [(False, True, 1), (True, True, 2)]


def test_fs_em_estimate_matches_duckdb_oracle(spark):
    import duckdb

    # deterministic dirty pairs: 2 fields, mixed patterns
    rows = [(i, (i % 7) < 5, (i * 3 % 11) < 4) for i in range(500)]
    pairs = spark.createDataFrame(rows, "id long, fa boolean, fb boolean")
    est = fs_em_estimate(
        pairs, {"alpha": F.col("fa"), "beta": F.col("fb")}, iterations=10
    )
    got = sorted(map(tuple, est.collect()))

    pattern_sql = """SELECT fa AS agree_alpha, fb AS agree_beta,
                            CAST(count(*) AS BIGINT) AS n
                     FROM pairs WHERE fa IS NOT NULL AND fb IS NOT NULL
                     GROUP BY 1, 2"""
    con = duckdb.connect()
    import pandas as pd

    con.register("pairs", pd.DataFrame(rows, columns=["id", "fa", "fb"]))
    oracle = con.execute(
        fs_em_oracle_cte(pattern_sql, ["alpha", "beta"], iterations=10)
    ).fetchall()
    assert got == sorted(map(tuple, oracle))


def test_fs_train_then_score_composition(spark):
    """EM-learned weights flow into scoring without a lossy round-trip."""
    rows = [(i, (i % 7) < 5, (i * 3 % 11) < 4, (i % 13) < 6) for i in range(400)]
    pairs = spark.createDataFrame(rows, "id long, fa boolean, fb boolean, fc boolean")
    ag = {"a": F.col("fa"), "b": F.col("fb"), "c": F.col("fc")}
    est = {r["field"]: (r["w_agree_micro"], r["w_disagree_micro"])
           for r in fs_em_estimate(pairs, ag, iterations=8).collect()}
    from xmlschemavalidator_spark.linkage import fs_score_with_weights

    if any(w[0] is None for w in est.values()):
        import pytest as _pt

        with _pt.raises(ValueError):
            fs_score_with_weights(pairs, ag, est, 1_000_000, 0)
        return
    scored = fs_score_with_weights(pairs, ag, est, 1_000_000, 0)
    got = scored.collect()
    assert len(got) == 400
    # weight is the exact integer sum of the learned micro weights
    r0 = got[0]
    expect = sum(
        est[n][0] if r0[f"agree_{n}"] else est[n][1] for n in ("a", "b", "c")
    )
    assert r0["weight_micro"] == expect
    assert set(r["decision"] for r in got) <= {"match", "possible", "non_match"}


def test_blocking_evaluation_hand_computed(spark):
    from xmlschemavalidator_spark.linkage import blocking_evaluation

    # 5 records -> 10 total pairs; truth = {(1,2),(3,4)};
    # candidates = {(1,2),(2,3),(4,5)} (one hit, reversed orientation + dup)
    cand = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (5, 4)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    (r,) = blocking_evaluation(cand, truth, n_records=5).collect()
    assert r["n_total_pairs"] == 10
    assert r["n_candidates"] == 3          # dedup + canonicalization
    assert r["n_truth"] == 2
    assert r["n_found"] == 1
    assert r["reduction_ratio_micro"] == 700_000
    assert r["pairs_completeness_micro"] == 500_000
    assert r["pair_quality_micro"] == 333_333


def test_bcubed_hand_computed(spark):
    from xmlschemavalidator_spark.linkage import bcubed_evaluation

    # clusters {1,2,3},{4,5} vs truth {1,2},{3,4,5}
    assign = spark.createDataFrame(
        [(1, "c1"), (2, "c1"), (3, "c1"), (4, "c2"), (5, "c2")],
        "id long, cluster string",
    )
    truth = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B")],
        "id long, truth string",
    )
    [r] = bcubed_evaluation(assign, truth).collect()
    assert (r["n_records"], r["n_clusters"], r["n_truth_classes"]) == (5, 2, 2)
    # P = R = (4/3 + 1/3 + 2)/5 with per-cell micro floors:
    # (1333333 + 333333 + 2000000) // 5 = 733333
    assert r["precision_micro"] == 733333
    assert r["recall_micro"] == 733333
    assert r["f1_micro"] == 733333

    # perfect clustering -> all 1.0
    [rp] = bcubed_evaluation(
        truth.select("id", F.col("truth").alias("cluster")), truth
    ).collect()
    assert (rp["precision_micro"], rp["recall_micro"], rp["f1_micro"]) == (
        1_000_000, 1_000_000, 1_000_000,
    )

    # everything in ONE cluster: precision = sum(n_t^2)/N^2, recall = 1
    one = assign.select("id", F.lit("all").alias("cluster"))
    [r1] = bcubed_evaluation(one, truth).collect()
    assert r1["recall_micro"] == 1_000_000
    assert r1["precision_micro"] == (4 * 1_000_000 // 5 + 9 * 1_000_000 // 5) // 5

    # singletons everywhere: precision = 1, recall = sum(1/n_t)/N
    sing = assign.select("id", F.col("id").cast("string").alias("cluster"))
    [rs] = bcubed_evaluation(sing, truth).collect()
    assert rs["precision_micro"] == 1_000_000
    assert rs["recall_micro"] == (2 * 500_000 + 3 * 333_333) // 5

    # records without a gold label are dropped (inner join), not scored
    extra = assign.unionByName(
        spark.createDataFrame([(9, "c9")], "id long, cluster string")
    )
    [re] = bcubed_evaluation(extra, truth).collect()
    assert re["n_records"] == 5 and re["precision_micro"] == 733333


# ---------------------------------------------------------------------------
# jaro_winkler
# ---------------------------------------------------------------------------


def test_jaro_winkler_py_classics():
    from xmlschemavalidator_spark.linkage import jaro_winkler_py

    # Winkler's canonical examples
    assert round(jaro_winkler_py("MARTHA", "MARHTA"), 6) == 0.961111
    assert round(jaro_winkler_py("DIXON", "DICKSONX"), 6) == 0.813333
    assert round(jaro_winkler_py("DWAYNE", "DUANE"), 6) == 0.84
    # window-0 transposed bigram: zero matches by the window rule
    assert jaro_winkler_py("ab", "ba") == 0.0
    # boost only above 0.7: jaro("ax","abcdefgh") = 0.541... stays unboosted
    assert round(jaro_winkler_py("ax", "abcdefgh"), 6) == 0.541667
    assert jaro_winkler_py("", "") == 0.0
    assert jaro_winkler_py("abc", "abc") == 1.0


def test_jaro_winkler_column_matches_duckdb(spark):
    import duckdb

    from xmlschemavalidator_spark.linkage import with_jaro_winkler

    rows = [
        ("martha stewart", "marhta stewrat"),
        ("the quick brown fox", "the quick brown fax"),
        ("aaaa", "aaab"),
        ("", "nonempty"),
        (None, "x"),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in with_jaro_winkler(df, "a", "b").collect()
    }
    con = duckdb.connect()
    for a, b in rows:
        if a is None or b is None:
            assert got[(a, b)] is None
        else:
            d = con.execute(
                "SELECT round(jaro_winkler_similarity(?, ?), 6)", [a, b]
            ).fetchone()[0]
            assert got[(a, b)] == d, (a, b)


# ---------------------------------------------------------------------------
# krippendorff_alpha
# ---------------------------------------------------------------------------


def test_krippendorff_textbook_example(spark):
    # Krippendorff 2004's 4-coder nominal dataset with missing ratings
    from xmlschemavalidator_spark.linkage import krippendorff_alpha

    data = {
        1: [1, 1, 1, 1], 2: [2, 2, 3, 2], 3: [3, 3, 3, 3], 4: [3, 3, 3, 3],
        5: [2, 2, 2, 2], 6: [1, 2, 3, 4], 7: [4, 4, 4, 4], 8: [1, 1, 2, 1],
        9: [2, 2, 2, 2], 10: [5, 5, 5, 5], 11: [1, 1, 1], 12: [3, 3, 3],
    }
    rows = [(u, v) for u, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "unit long, val long")
    [r] = krippendorff_alpha(df, "unit", "val").collect()
    assert (r["n_units"], r["n_pairable"], r["n_categories"]) == (12, 46, 5)
    assert r["alpha"] == 0.777228  # closed-form value of this dataset


def test_krippendorff_perfect_and_degenerate(spark):
    from xmlschemavalidator_spark.linkage import krippendorff_alpha

    # perfect agreement across 2 categories: alpha = 1
    rows = [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "a"), (3, "a")]
    df = spark.createDataFrame(rows, "unit long, val string")
    [r] = krippendorff_alpha(df, "unit", "val").collect()
    assert r["alpha"] == 1.0
    # single category everywhere: expected disagreement 0 -> NULL
    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "a")]
    df = spark.createDataFrame(rows, "unit long, val string")
    [r] = krippendorff_alpha(df, "unit", "val").collect()
    assert r["alpha"] is None
    # singleton units carry nothing: excluded from n_units and totals
    rows = [(1, "a"), (1, "b"), (2, "a")]
    df = spark.createDataFrame(rows, "unit long, val string")
    [r] = krippendorff_alpha(df, "unit", "val").collect()
    assert r["n_units"] == 1 and r["n_pairable"] == 2


def test_fleiss_kappa_canonical_example(spark):
    # the canonical 10-subject × 14-rater × 5-category table: κ ≈ 0.2099
    from xmlschemavalidator_spark.linkage import fleiss_kappa

    table = [
        [0, 0, 0, 0, 14], [0, 2, 6, 4, 2], [0, 0, 3, 5, 6], [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1], [7, 7, 0, 0, 0], [3, 2, 6, 3, 0], [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0], [0, 2, 2, 3, 7],
    ]
    rows = []
    for u, counts in enumerate(table):
        for c, k in enumerate(counts):
            rows += [(u, c)] * k
    df = spark.createDataFrame(rows, "unit long, val long")
    [r] = fleiss_kappa(df, "unit", "val").collect()
    assert (r["n_units"], r["m"], r["n_categories"]) == (10, 14, 5)
    assert r["kappa"] == 0.209931
    # an incomplete extra unit is excluded by the modal-m gate
    df2 = spark.createDataFrame(rows + [(99, 1)], "unit long, val long")
    [r2] = fleiss_kappa(df2, "unit", "val").collect()
    assert r2["n_units"] == 10 and r2["kappa"] == r["kappa"]


def test_fleiss_kappa_degenerate(spark):
    from xmlschemavalidator_spark.linkage import fleiss_kappa

    # all ratings one category: P_e = 1 -> NULL kappa
    rows = [(u, "x") for u in range(4) for _ in range(3)]
    df = spark.createDataFrame(rows, "unit long, val string")
    [r] = fleiss_kappa(df, "unit", "val").collect()
    assert r["kappa"] is None and r["p_bar"] == 1.0
    # perfect agreement, two categories: kappa = 1
    rows = [(u, "a" if u % 2 == 0 else "b") for u in range(6) for _ in range(3)]
    df = spark.createDataFrame(rows, "unit long, val string")
    [r] = fleiss_kappa(df, "unit", "val").collect()
    assert r["kappa"] == 1.0
