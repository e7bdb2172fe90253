"""Type-lattice, restriction, union, and registry tests.

Boundary values ported verbatim: byte 127/128/-128/-129 (core.clj:236,
core_test.clj:68-75), int 2147483647/2147483648 (core.clj:234,
parser_test.clj:385-395), union first-success (core_test.clj:112-137)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.rules.facets import Enumeration, MaxInclusive, MinInclusive
from xmlschemavalidator_spark.rules.types import (
    PREDEF_TYPES,
    Restriction,
    TypeRegistry,
    Union,
)


def check(spark, type_or_name, values, registry=PREDEF_TYPES, schema="v string"):
    t = registry.resolve(type_or_name) if isinstance(type_or_name, str) else type_or_name
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r[0] for r in df.select(t.to_column(F.col("v"), registry)).collect()]


def test_byte_boundaries(spark):
    # core_test.clj:68-75 — byte in [-128, 127]
    assert check(spark, "byte", [0, 127, 128, -128, -129], schema="v bigint") == [
        True, True, False, True, False,
    ]


def test_int_boundaries(spark):
    # parser_test.clj:385-395 — 2147483647 ok, 2147483648 fail
    assert check(spark, "int", [2147483647, 2147483648], schema="v bigint") == [True, False]


def test_sign_classes(spark):
    assert check(spark, "positiveInteger", [1, 0, -1], schema="v bigint") == [True, False, False]
    assert check(spark, "negativeInteger", [-1, 0, 1], schema="v bigint") == [True, False, False]
    assert check(spark, "nonNegativeInteger", [0, -1], schema="v bigint") == [True, False]
    assert check(spark, "nonPositiveInteger", [0, 1], schema="v bigint") == [True, False]


def test_unsigned_chain(spark):
    assert check(spark, "unsignedByte", [0, 255, 256, -1], schema="v bigint") == [
        True, True, False, False,
    ]
    assert check(spark, "unsignedShort", [65535, 65536], schema="v bigint") == [True, False]


def test_dynamic_string_semantics(spark):
    # special-read-string (parser.clj:14-22): "123" reads as a number, so
    # string?("123") is FALSE; "hello" stays a string.
    assert check(spark, "string", ["hello", "123", "1.5", None]) == [True, False, False, False]


def test_numeric_on_strings(spark):
    # number-or-string fallback: numeric check via try_cast on string input
    assert check(spark, "double", ["1.5", "abc", "42"]) == [True, False, True]
    assert check(spark, "integer", ["42", "1.5", "abc"]) == [True, False, False]


def test_restriction_base_and_facets(spark):
    # def-base semantics (core.clj:17-20): derived = base AND facets
    r = Restriction(base="integer", facets=(MinInclusive(36), MaxInclusive(42)))
    assert check(spark, r, ["36", "42", "35", "43", "37.5", "abc"]) == [
        True, True, False, False, False, False,
    ]


def test_union_first_success(spark):
    # core_test.clj:112-137 — union of an int range and a string enum:
    # 36 passes member 0; "small" passes member 1; 35 and "asdf" fail both.
    u = Union(
        members=(
            Restriction(base="integer", facets=(MinInclusive(36), MaxInclusive(42))),
            Restriction(base="string", facets=(Enumeration("small"), Enumeration("medium"))),
        )
    )
    assert check(spark, u, ["36", "small", "35", "asdf"]) == [True, True, False, False]


def test_union_matched_member_detail(spark):
    # verdict detail: WHICH member matched (ordered first-success, core.clj:75-78)
    u = Union(
        members=(
            Restriction(base="integer", facets=(MinInclusive(36), MaxInclusive(42))),
            Restriction(base="string", facets=(Enumeration("small"),)),
        )
    )
    df = spark.createDataFrame([("36",), ("small",), ("nope",)], "v string")
    got = [r[0] for r in df.select(u.matched_member_column(F.col("v"), PREDEF_TYPES)).collect()]
    assert got == [0, 1, -1]


def test_union_verdict_struct_detail(spark):
    # core.clj:75-78: the try-chain's failure detail — the reference tests
    # (parser_test.clj:295-301) pin [false 35 :theunion] for a below-range
    # number and [false "asdf" :theunion] for a non-member string: on total
    # failure every member was tried and the observed value is reported.
    u = Union(
        members=(
            Restriction(base="integer", facets=(MinInclusive(36), MaxInclusive(42))),
            Restriction(base="string", facets=(Enumeration("small"), Enumeration("medium"))),
        )
    )
    df = spark.createDataFrame(
        [("35",), ("36",), ("small",), ("medium",), ("asdf",), (None,)], "v string"
    )
    got = [
        (r["d"]["ok"], r["d"]["matched_member"], r["d"]["n_tried"], r["d"]["last_value"])
        for r in df.select(u.verdict_struct(F.col("v"), PREDEF_TYPES).alias("d")).collect()
    ]
    assert got == [
        (False, -1, 2, "35"),     # [false 35 :theunion]
        (True, 0, 1, None),       # [true 36 :theunion]
        (True, 1, 2, None),       # [true "small" :theunion]
        (True, 1, 2, None),
        (False, -1, 2, "asdf"),   # [false "asdf" :theunion]
        (False, -1, 2, None),     # no value at all
    ]


def test_registry_merge_shadowing(spark):
    # schema-local types shadow predefined (core.clj:131-134)
    local = TypeRegistry({"string": PREDEF_TYPES.resolve("byte")})
    merged = PREDEF_TYPES.merge({"string": PREDEF_TYPES.resolve("byte")})
    assert check(spark, "string", ["127", "128"], registry=merged) == [True, False]
    # original registry unchanged
    assert check(spark, "string", ["hello"]) == [True]
    assert "string" in local


def test_registry_unknown_type():
    with pytest.raises(KeyError):
        PREDEF_TYPES.resolve("nope")


def test_type_sql_parity_duckdb(spark):
    import duckdb

    values = ["hello", "123", "1.5", "127", "128", "-129", None, "36", "43"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    df = spark.createDataFrame([(v,) for v in values], "v string")
    cases = [
        PREDEF_TYPES.resolve("string"),
        PREDEF_TYPES.resolve("byte"),
        PREDEF_TYPES.resolve("integer"),
        Restriction(base="integer", facets=(MinInclusive(36), MaxInclusive(42))),
        Union(members=(PREDEF_TYPES.resolve("byte"), PREDEF_TYPES.resolve("string"))),
    ]
    for t in cases:
        spark_ok = [r[0] for r in df.select(t.to_column(F.col("v"), PREDEF_TYPES)).collect()]
        sql = t.sql_expr("v", PREDEF_TYPES)
        duck_ok = [bool(r[0]) for r in con.execute(
            f"SELECT coalesce({sql}, FALSE) FROM t").fetchall()]
        assert spark_ok == duck_ok, f"divergence for {t}"
