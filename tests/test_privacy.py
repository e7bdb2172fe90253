"""checks/privacy.py — k-anonymity and distinct l-diversity audits.

Hand-computed fixtures: class sizes and distinct-value counts below are
countable by eye.
"""

from __future__ import annotations

import pytest

from xmlschemavalidator_spark.checks.privacy import (
    k_anonymity_summary,
    k_anonymity_violations,
    l_diversity_violations,
)

# (id, zip, age_band, disease): zip+age_band are the quasi-identifiers.
# classes: (130**, 30s) x3 | (130**, 40s) x2 | (148**, 30s) x1 | (NULL, 30s) x2
_ROWS = [
    (1, "130**", "30s", "flu"),
    (2, "130**", "30s", "flu"),
    (3, "130**", "30s", "cancer"),
    (4, "130**", "40s", "flu"),
    (5, "130**", "40s", "flu"),
    (6, "148**", "30s", "hepatitis"),
    (7, None, "30s", "flu"),
    (8, None, "30s", "cancer"),
]


def _df(spark):
    return spark.createDataFrame(
        _ROWS, "id long, zip string, age_band string, disease string"
    )


def test_k_anonymity_violations_exact_classes(spark):
    got = sorted(
        (
            (r["zip"], r["age_band"], r["class_size"])
            for r in k_anonymity_violations(
                _df(spark), ["zip", "age_band"], k=3
            ).collect()
        ),
        key=lambda t: (t[0] or "", t[1]),
    )
    # NULL zip forms its own class of 2
    assert got == [(None, "30s", 2), ("130**", "40s", 2), ("148**", "30s", 1)]


def test_k_anonymity_holds_at_k2_except_singleton(spark):
    got = k_anonymity_violations(_df(spark), ["zip", "age_band"], k=2).collect()
    assert [(r["zip"], r["class_size"]) for r in got] == [("148**", 1)]


def test_k_anonymity_summary(spark):
    [r] = k_anonymity_summary(_df(spark), ["zip", "age_band"], k=3).collect()
    assert (r["n_rows"], r["n_classes"], r["min_class_size"]) == (8, 4, 1)
    assert (r["n_violating_classes"], r["n_rows_at_risk"]) == (3, 5)
    assert r["k_anonymous"] is False
    [ok] = k_anonymity_summary(_df(spark), ["age_band"], k=2).collect()
    # age_band alone: 30s x6, 40s x2 -> 2-anonymous
    assert (ok["min_class_size"], ok["k_anonymous"]) == (2, True)


def test_l_diversity_homogeneous_class_flagged(spark):
    got = sorted(
        (r["zip"], r["age_band"], r["class_size"], r["n_distinct_sensitive"])
        for r in l_diversity_violations(
            _df(spark), ["zip", "age_band"], "disease", l=2
        ).collect()
    )
    # (130**, 40s) is 2-anonymous but homogeneous (all flu) -> the
    # homogeneity attack k-anonymity misses; the singleton also violates
    assert got == [("130**", "40s", 2, 1), ("148**", "30s", 1, 1)]


def test_l_diversity_null_sensitive_is_a_value(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", "flu"), (3, "b", None), (4, "b", None)],
        "id long, qi string, disease string",
    )
    got = sorted(
        (r["qi"], r["n_distinct_sensitive"])
        for r in l_diversity_violations(df, ["qi"], "disease", l=2).collect()
    )
    # class a: {NULL, flu} = 2 distinct (passes); class b: {NULL} = 1
    assert got == [("b", 1)]


def test_privacy_arg_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        k_anonymity_violations(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_violations(df, ["zip"], k=1)
    with pytest.raises(ValueError):
        l_diversity_violations(df, ["zip"], "zip", l=2)
    with pytest.raises(ValueError):
        l_diversity_violations(df, ["zip"], "disease", l=1)


def test_t_closeness_ordered_hand_computed(spark):
    from xmlschemavalidator_spark.checks.privacy import t_closeness_report

    # grid {1,2,3}: global counts (2,1,1), N=4, m=3
    # class A = [1,1]: p=(1,0,0) vs q=(.5,.25,.25) -> cums .5,.25,0 -> EMD .375
    # class B = [2,3]: p=(0,.5,.5) -> cums -.5,-.25,0 -> EMD .375
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 3.0)], "grp string, v double"
    )
    out = {r["grp"]: r for r in t_closeness_report(df, ["grp"], "v", t_micro=300_000).collect()}
    assert out["A"]["emd"] == 0.375 and out["B"]["emd"] == 0.375
    assert out["A"]["class_size"] == 2 and out["A"]["n_values"] == 3
    assert out["A"]["breaches_t"] is True
    # at t=0.4 nothing breaches
    out2 = t_closeness_report(df, ["grp"], "v", t_micro=400_000).collect()
    assert all(not r["breaches_t"] for r in out2)


def test_t_closeness_categorical_tv(spark):
    from xmlschemavalidator_spark.checks.privacy import t_closeness_report

    # class A all-x vs global 50/50: TV = 0.5 (the homogeneous class
    # l-diversity flags only via distinctness; t-closeness measures it)
    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"), ("C", "y"), ("C", "y")],
        "grp string, sv string",
    )
    out = {r["grp"]: r for r in
           t_closeness_report(df, ["grp"], "sv", t_micro=200_000, ordered=False).collect()}
    assert out["A"]["emd"] == 0.5 and out["A"]["breaches_t"] is True
    assert out["B"]["emd"] == 0.0 and out["B"]["breaches_t"] is False
    assert out["C"]["emd"] == 0.5


def test_t_closeness_nulls_and_args(spark):
    import pytest as _pt

    from xmlschemavalidator_spark.checks.privacy import t_closeness_report

    # NULL sensitive rows are excluded from every distribution
    df = spark.createDataFrame(
        [("A", 1.0), ("A", None), ("B", 2.0)], "grp string, v double"
    )
    out = {r["grp"]: r for r in t_closeness_report(df, ["grp"], "v").collect()}
    assert out["A"]["class_size"] == 1  # the NULL row didn't count
    with _pt.raises(ValueError):
        t_closeness_report(df, [], "v")
    with _pt.raises(ValueError):
        t_closeness_report(df, ["v"], "v")


def test_laplace_noisy_counts_replay(spark):
    import hashlib
    import math

    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.privacy import laplace_noisy_counts

    df = spark.createDataFrame(
        [("en",)] * 40 + [("de",)] * 10 + [(None,)] * 3, "g string"
    )
    got = {r["group"]: r for r in laplace_noisy_counts(df, "g", 1000).collect()}
    assert set(got) == {"en", "de", None}

    def replay(group, n, eps=1.0, salt="laplace"):
        h = hashlib.md5(f"{salt}:{group if group is not None else ' null'}".encode()).hexdigest()
        u = (int(h[:15], 16) + 0.5) / float(16 ** 15)
        c = u - 0.5
        sign = (c > 0) - (c < 0)
        noise = -(1.0 / eps) * sign * math.log(1.0 - 2 * abs(c))
        return round(max(n + noise, 0.0), 6)

    assert got["en"]["released_count"] == replay("en", 40)
    assert got["de"]["released_count"] == replay("de", 10)
    assert got[None]["released_count"] == replay(None, 3)
    # determinism: same salt -> identical release; new salt -> fresh noise
    again = {r["group"]: r["released_count"]
             for r in laplace_noisy_counts(df, "g", 1000).collect()}
    assert again == {g: r["released_count"] for g, r in got.items()}
    other = {r["group"]: r["released_count"]
             for r in laplace_noisy_counts(df, "g", 1000, salt="v2").collect()}
    assert other != again
    # tighter epsilon -> bigger expected noise scale (check magnitudes)
    loose = {r["group"]: r["released_count"]
             for r in laplace_noisy_counts(df, "g", 10_000).collect()}
    assert abs(loose["en"] - 40) <= abs(again["en"] - 40)

    import pytest as _pt

    with _pt.raises(ValueError):
        laplace_noisy_counts(df, "g", 0)


def test_laplace_noisy_counts_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.privacy import (
        laplace_noisy_counts,
        laplace_noisy_counts_oracle_sql,
    )

    rows = [(f"g{i % 7}",) for i in range(200)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "g string")
    got = sorted(
        ((r["group"] or ""), r["released_count"], r["epsilon_milli"])
        for r in laplace_noisy_counts(df, "g", 500).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = sorted(
        ((g or ""), rc, em)
        for g, rc, em in con.execute(
            laplace_noisy_counts_oracle_sql("SELECT g FROM t", "g", 500)
        ).fetchall()
    )
    assert got == want
