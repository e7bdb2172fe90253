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


# --- per-child verdicts (parser.clj:208-226; parser_test.clj:305-355) ------


def _tagged_children_df(spark, *children):
    """One row whose `children` column is array<struct<tag,value>>."""
    data = [([{"tag": t, "value": v} for t, v in children],)]
    return spark.createDataFrame(
        data, "children array<struct<tag:string, value:string>>"
    )


def _seq_decl():
    from xmlschemavalidator_spark.rules.types import PREDEF_TYPES

    return [
        ("seq1", PREDEF_TYPES.resolve("integer")),
        ("seq2", PREDEF_TYPES.resolve("string")),
    ]


def _verdict(spark, kind, *children):
    from xmlschemavalidator_spark.rules.structural import container_verdict

    df = _tagged_children_df(spark, *children)
    row = df.select(
        container_verdict(F.col("children"), _seq_decl(), kind).alias("v")
    ).collect()[0]["v"]
    return row["ok"], [(c["tag"], c["ok"], c["value"]) for c in row["children"]]


def test_sequence_child_verdicts_reference_cases(spark):
    # parser_test.clj:306-321 (test-sequence), verdict triples [ok value tag]
    ok, ch = _verdict(spark, "sequence", ("seq1", "1"), ("seq2", "adsf"))
    assert ok and ch == [("seq1", True, "1"), ("seq2", True, "adsf")]

    # wrong order: container false, each child judged against ITS tag's type
    ok, ch = _verdict(spark, "sequence", ("seq2", "2"), ("seq1", "asdf"))
    assert not ok and ch == [("seq2", False, "2"), ("seq1", False, "asdf")]

    # missing child: container false, present child still true
    ok, ch = _verdict(spark, "sequence", ("seq1", "1"))
    assert not ok and ch == [("seq1", True, "1")]

    # undeclared child -> [false :undefined tag] (parser.clj:216)
    ok, ch = _verdict(
        spark, "sequence", ("seq1", "1"), ("seq2", "2"), ("seq3", "3")
    )
    assert not ok
    assert ch == [
        ("seq1", True, "1"),
        ("seq2", False, "2"),
        ("seq3", False, ":undefined"),
    ]

    # duplicate declared tag: both children validated (parser_test.clj:316)
    ok, ch = _verdict(spark, "sequence", ("seq1", "1"), ("seq1", "2"))
    assert not ok and ch == [("seq1", True, "1"), ("seq1", True, "2")]


def test_all_child_verdicts_reference_cases(spark):
    # parser_test.clj:335-343 (test-all): any order passes the condition
    ok, ch = _verdict(spark, "all", ("seq2", "asdf"), ("seq1", "10"))
    assert ok and ch == [("seq2", True, "asdf"), ("seq1", True, "10")]

    ok, ch = _verdict(spark, "all", ("seq1", "1"), ("seq3", "1"))
    assert not ok and ch == [("seq1", True, "1"), ("seq3", False, ":undefined")]


def test_choice_child_verdicts_reference_cases(spark):
    # parser_test.clj:345-355 (test-choice): two children -> condition false,
    # both still judged per-tag
    ok, ch = _verdict(spark, "choice", ("seq1", "1"), ("seq2", "2"))
    assert not ok and ch == [("seq1", True, "1"), ("seq2", False, "2")]

    ok, ch = _verdict(spark, "choice", ("seq2", "asdf"))
    assert ok and ch == [("seq2", True, "asdf")]


def test_nested_valid_fold(spark):
    from xmlschemavalidator_spark.rules.structural import (
        container_verdict,
        nested_valid,
    )

    cases = {
        # (children) -> expected valid? (container ok AND all children ok)
        (("seq1", "1"), ("seq2", "a")): True,
        (("seq1", "x"), ("seq2", "a")): False,  # child fails, order fine
        (("seq2", "a"), ("seq1", "1")): False,  # order fails, children fine
    }
    for children, want in cases.items():
        df = _tagged_children_df(spark, *children)
        got = df.select(
            nested_valid(
                container_verdict(F.col("children"), _seq_decl(), "sequence")
            ).alias("ok")
        ).collect()[0]["ok"]
        assert got is want, children


def test_container_verdict_with_any_wildcard(spark):
    """xs:any (processContents='skip'): undeclared children pass with their
    observed value, sequence order applies to DECLARED tags as a
    subsequence, and `all` requires presence only."""
    from xmlschemavalidator_spark.rules.structural import (
        container_verdict,
        nested_valid,
    )

    cases = [
        # (kind, children, want_cond, want_valid)
        ("sequence", (("seq1", "1"), ("extra", "zz"), ("seq2", "a")), True, True),
        ("sequence", (("extra", "zz"), ("seq1", "1"), ("seq2", "a")), True, True),
        ("sequence", (("seq2", "a"), ("seq1", "1")), False, False),  # declared out of order
        ("sequence", (("seq1", "1"), ("extra", "zz")), False, False),  # seq2 missing
        ("all", (("seq2", "a"), ("junk", "x"), ("seq1", "1")), True, True),
        ("all", (("seq2", "a"), ("junk", "x")), False, False),
    ]
    for kind, children, want_cond, want_valid in cases:
        df = _tagged_children_df(spark, *children)
        v = container_verdict(
            F.col("children"), _seq_decl(), kind, allow_undeclared=True
        )
        row = df.select(v.alias("v"), nested_valid(v).alias("ok")).collect()[0]
        assert row["v"]["ok"] is want_cond, (kind, children)
        assert row["ok"] is want_valid, (kind, children)
        # undeclared children carry their value, not :undefined
        for c in row["v"]["children"]:
            if c["tag"] not in ("seq1", "seq2"):
                assert c["ok"] is True and c["value"] != ":undefined"


def test_xsd_any_wildcard_parsed(spark):
    from xmlschemavalidator_spark.xsd import parse_xsd

    xsd = """<schema>
      <complexType name="c">
        <sequence>
          <element name="a" type="integer"/>
          <any processContents="skip"/>
        </sequence>
      </complexType>
      <element name="r" type="c"/>
    </schema>"""
    schema = parse_xsd(xsd)
    assert schema._element_complex("r").has_any is True
    xsd2 = xsd.replace('<any processContents="skip"/>', "")
    assert parse_xsd(xsd2)._element_complex("r").has_any is False
