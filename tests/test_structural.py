"""Structural particles + attribute occurrence tests.

Sequence/all/choice semantics per core.clj:138-171 / parser_test.clj:305-355;
attribute default/fixed/required per parser.clj:273-293 /
parser_test.clj:546-557; occurs per parser.clj:35-42 (spec-enforced here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.rules.attributes import DefaultAttr, FixedAttr, RequiredAttr
from xmlschemavalidator_spark.rules.structural import (
    AllRule,
    ChoiceRule,
    Occurs,
    SequenceRule,
    all_tags_ok,
    choice_tags_ok,
    sequence_tags_ok,
    undefined_children,
)
from xmlschemavalidator_spark.rules.types import PREDEF_TYPES


def test_sequence_flat(spark):
    df = spark.createDataFrame(
        [("a", "b", "c"), ("a", None, "c")], "f1 string, f2 string, f3 string"
    )
    rule = SequenceRule(("f1", "f2", "f3"))
    rule.check_schema(df)  # declared order == schema order: ok
    got = [r[0] for r in df.select(rule.to_column()).collect()]
    assert got == [True, False]


def test_sequence_order_is_compile_time_error(spark):
    df = spark.createDataFrame([("a", "b")], "f2 string, f1 string")
    with pytest.raises(ValueError, match="sequence order violated"):
        SequenceRule(("f1", "f2")).check_schema(df)


def test_all_any_order(spark):
    # all: same fields, any order (core.clj:161-171) — schema order irrelevant
    df = spark.createDataFrame([("b", "a"), (None, "a")], "f2 string, f1 string")
    got = [r[0] for r in df.select(AllRule(("f1", "f2")).to_column()).collect()]
    assert got == [True, False]


def test_choice_exactly_one(spark):
    # choice: exactly one non-null (core.clj:150-159): one ok, both/none fail
    df = spark.createDataFrame(
        [("x", None), (None, "y"), ("x", "y"), (None, None)], "a string, b string"
    )
    got = [r[0] for r in df.select(ChoiceRule(("a", "b")).to_column()).collect()]
    assert got == [True, True, False, False]


def test_occurs_bounds(spark):
    df = spark.createDataFrame([([1],), ([1, 2],), ([],), (None,)], "arr array<int>")
    got = [r[0] for r in df.select(Occurs(1, 2).to_column(F.col("arr"))).collect()]
    assert got == [True, True, False, False]
    unbounded = [r[0] for r in df.select(Occurs(0, None).to_column(F.col("arr"))).collect()]
    assert unbounded == [True, True, True, True]


# --- nested array<struct<tag,value>> variants (rose-tree encoding) ---------


def _children_df(spark, tag_lists):
    data = [([{"tag": t, "value": "v"} for t in tags],) for tags in tag_lists]
    return spark.createDataFrame(data, "children array<struct<tag:string, value:string>>")


def test_sequence_nested_order_sensitive(spark):
    df = _children_df(spark, [["a", "b"], ["b", "a"], ["a"], ["a", "b", "x"]])
    got = [r[0] for r in df.select(sequence_tags_ok(F.col("children"), ["a", "b"])).collect()]
    assert got == [True, False, False, False]


def test_all_nested_order_insensitive(spark):
    df = _children_df(spark, [["a", "b"], ["b", "a"], ["a", "a"]])
    got = [r[0] for r in df.select(all_tags_ok(F.col("children"), ["a", "b"])).collect()]
    assert got == [True, True, False]


def test_choice_nested_declared_tag(spark):
    # v1 choice: the single child's tag must be declared (core.clj:150-159);
    # an undeclared tag is the :undefined pseudo-verdict (parser.clj:216)
    df = _children_df(spark, [["a"], ["zz"], ["a", "b"]])
    got = [r[0] for r in df.select(choice_tags_ok(F.col("children"), ["a", "b"])).collect()]
    assert got == [True, False, False]


def test_undefined_children_reported(spark):
    df = _children_df(spark, [["a", "zz", "b"], ["a"]])
    got = [list(r[0]) for r in df.select(undefined_children(F.col("children"), ["a", "b"])).collect()]
    assert got == [["zz"], []]


# --- attributes -------------------------------------------------------------


def test_attribute_default(spark):
    # parser_test.clj:546-549 — null coalesces to default then validates
    df = spark.createDataFrame([("SV",), (None,)], "v string")
    rule = DefaultAttr(default="EN", type="string")
    assert [r[0] for r in df.select(rule.to_column(F.col("v"), PREDEF_TYPES)).collect()] == [
        True, True,
    ]
    decoded = [r[0] for r in df.select(rule.decoded(F.col("v"))).collect()]
    assert decoded == ["SV", "EN"]


def test_attribute_fixed(spark):
    # parser_test.clj:550-553 — must equal constant; null fails
    df = spark.createDataFrame([("EN",), ("SV",), (None,)], "v string")
    got = [r[0] for r in df.select(FixedAttr("EN").to_column(F.col("v"))).collect()]
    assert got == [True, False, False]


def test_attribute_required(spark):
    # parser_test.clj:554-557 — null -> undefined failure
    df = spark.createDataFrame([("EN",), (None,)], "v string")
    got = [r[0] for r in df.select(RequiredAttr("string").to_column(F.col("v"), PREDEF_TYPES)).collect()]
    assert got == [True, False]


def test_structural_sql_parity_duckdb(spark):
    import duckdb

    data = [("x", None), (None, "y"), ("x", "y"), (None, None)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    df = spark.createDataFrame(data, "a string, b string")
    for rule in [ChoiceRule(("a", "b")), AllRule(("a", "b")), SequenceRule(("a", "b"))]:
        spark_ok = [r[0] for r in df.select(rule.to_column()).collect()]
        duck_ok = [bool(r[0]) for r in con.execute(f"SELECT {rule.sql_expr()} FROM t").fetchall()]
        assert spark_ok == duck_ok


def test_choice_tags_empty_and_null_children(spark):
    """choice over an empty or NULL children array is False, never an ANSI
    INVALID_ARRAY_INDEX error and never a NULL verdict."""
    from xmlschemavalidator_spark.rules.structural import (
        all_tags_ok,
        choice_tags_ok,
        sequence_tags_ok,
    )

    df = spark.createDataFrame(
        [(1, []), (2, None), (3, [("a",)])],
        "id long, children array<struct<tag:string>>",
    )
    out = df.select(
        "id",
        choice_tags_ok(F.col("children"), ("a", "b")).alias("c"),
        sequence_tags_ok(F.col("children"), ("a",)).alias("s"),
        all_tags_ok(F.col("children"), ("a",)).alias("al"),
    ).collect()
    got = {r["id"]: (r["c"], r["s"], r["al"]) for r in out}
    assert got[1] == (False, False, False)
    assert got[2] == (False, False, False)
    assert got[3] == (True, True, True)
