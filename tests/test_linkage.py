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
