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
