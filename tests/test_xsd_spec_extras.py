"""Spec-enforced XSD features the reference PARSES but cannot EXECUTE:
``list`` (grammar parser.clj:97), ``attributeGroup`` (parser.clj:73-76),
``group`` (parser.clj:81-82), ``simpleContent`` (parser.clj:69) — none have
transform entries in the v2 dispatch map (parser.clj:297-326), and README.md
lists them as unimplemented in v1. We implement the XSD spec semantics the
grammar declares, going beyond the reference on its own declared surface.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.rules.types import PREDEF_TYPES, ListType
from xmlschemavalidator_spark.xsd import compile_fragment, parse_xsd


def eval_type(spark, t, values, registry=PREDEF_TYPES):
    df = spark.createDataFrame(
        [(str(v) if v is not None else None,) for v in values], "v string"
    )
    return [r[0] for r in df.select(t.to_column(F.col("v"), registry)).collect()]


# ---------------------------------------------------------------------------
# xs:list
# ---------------------------------------------------------------------------


def test_list_of_integers(spark):
    t = compile_fragment('<list itemType="integer"/>')
    assert isinstance(t, ListType)
    assert eval_type(spark, t, ["1 2 3", "  7\t8  ", "1 x 3", "x", "", None]) == [
        True,   # all tokens integral
        True,   # whitespace-insensitive
        False,  # one bad token fails the list
        False,
        True,   # empty string = empty list (valid per spec)
        False,  # NULL is no value at all
    ]


def test_list_of_restricted_type(spark):
    t = compile_fragment(
        """<simpleType>
             <list>
               <simpleType>
                 <restriction base="integer">
                   <minInclusive value="0"/>
                   <maxInclusive value="9"/>
                 </restriction>
               </simpleType>
             </list>
           </simpleType>"""
    )
    assert eval_type(spark, t, ["0 9 5", "0 10", "9"]) == [True, False, True]


def test_list_named_item_type_via_schema(spark):
    schema = parse_xsd(
        """<schema>
             <simpleType name="digit">
               <restriction base="integer">
                 <minInclusive value="0"/><maxInclusive value="9"/>
               </restriction>
             </simpleType>
             <simpleType name="digits"><list itemType="digit"/></simpleType>
           </schema>"""
    )
    t = schema.types.resolve("digits")
    assert eval_type(spark, t, ["1 2 3", "1 22"], registry=schema.types) == [True, False]


def test_list_sql_oracle_parity(spark):
    """ListType.sql_expr must agree with to_column on the same data (the
    driver's oracle property, checked here in-process via DuckDB)."""
    t = compile_fragment('<list itemType="integer"/>')
    values = ["1 2 3", "1 x", "", "  4  ", "3.5 1", None]
    spark_ok = eval_type(spark, t, values)
    pdf = pd.DataFrame({"v": values})
    sql = t.sql_expr("v", PREDEF_TYPES)
    con = duckdb.connect()
    con.register("tbl", pdf)
    duck_ok = [r[0] for r in con.execute(f"SELECT {sql} FROM tbl").fetchall()]
    assert spark_ok == duck_ok


# ---------------------------------------------------------------------------
# attributeGroup
# ---------------------------------------------------------------------------

_ATTR_GROUP_XSD = """<schema>
  <attributeGroup name="provenance">
    <attribute name="source" type="string" use="required"/>
    <attribute name="rank" type="byte"/>
  </attributeGroup>
  <attributeGroup name="full">
    <attribute name="note" type="string"/>
    <attributeGroup ref="provenance"/>
  </attributeGroup>
  <complexType name="docType">
    <sequence><element name="body" type="string"/></sequence>
    <attributeGroup ref="full"/>
  </complexType>
  <element name="doc" type="docType"/>
</schema>"""


def test_attribute_group_ref_expands(spark):
    schema = parse_xsd(_ATTR_GROUP_XSD)
    ct = schema._element_complex("doc")
    assert [a.name for a in ct.attributes] == ["note", "source", "rank"]
    assert ct.attributes[1].required

    df = spark.createDataFrame(
        [("good", "crawl", "3", "x"), ("noattr", None, "999", None)],
        "body string, source string, rank string, note string",
    )
    rs = schema.ruleset_for("doc")
    compiled = rs.compile()
    out = df.select(
        "body",
        compiled["doc__attr_source"].alias("src_ok"),
        compiled["doc__attr_rank"].alias("rank_ok"),
    ).collect()
    by_body = {r["body"]: (r["src_ok"], r["rank_ok"]) for r in out}
    assert by_body["good"] == (True, True)
    assert by_body["noattr"] == (False, False)  # required missing; 999 > byte


def test_attribute_group_cycle_raises():
    with pytest.raises(ValueError, match="circular attributeGroup"):
        parse_xsd(
            """<schema>
                 <attributeGroup name="a"><attributeGroup ref="b"/></attributeGroup>
                 <attributeGroup name="b"><attributeGroup ref="a"/></attributeGroup>
                 <complexType name="t"><attributeGroup ref="a"/></complexType>
               </schema>"""
        )


# ---------------------------------------------------------------------------
# group (named model group)
# ---------------------------------------------------------------------------


def test_group_ref_particle(spark):
    schema = parse_xsd(
        """<schema>
             <group name="pair">
               <sequence>
                 <element name="a" type="integer"/>
                 <element name="b" type="string"/>
               </sequence>
             </group>
             <complexType name="t"><group ref="pair"/></complexType>
             <element name="root" type="t"/>
           </schema>"""
    )
    ct = schema._element_complex("root")
    assert ct.particle == "sequence"
    assert [c.name for c in ct.children] == ["a", "b"]

    df = spark.createDataFrame([("1", "x"), ("y", "x")], "a string, b string")
    rs = schema.ruleset_for("root")
    compiled = rs.compile()
    got = [r[0] for r in df.select(compiled["root__a"]).collect()]
    assert got == [True, False]


def test_group_ref_inside_extension(spark):
    schema = parse_xsd(
        """<schema>
             <group name="extra"><choice>
               <element name="x" type="integer"/>
               <element name="y" type="string"/>
             </choice></group>
             <complexType name="base">
               <sequence><element name="a" type="string"/></sequence>
             </complexType>
             <complexType name="ext">
               <complexContent><extension base="base">
                 <group ref="extra"/>
               </extension></complexContent>
             </complexType>
             <element name="root" type="ext"/>
           </schema>"""
    )
    ct = schema._element_complex("root")
    assert ct.particle == "choice"
    assert [c.name for c in ct.children] == ["a", "x", "y"]


# ---------------------------------------------------------------------------
# simpleContent
# ---------------------------------------------------------------------------

_SIMPLE_CONTENT_XSD = """<schema>
  <complexType name="price">
    <simpleContent>
      <restriction base="integer">
        <minInclusive value="0"/>
        <maxInclusive value="100"/>
      </restriction>
    </simpleContent>
    <attribute name="currency" type="string" use="required"/>
  </complexType>
  <element name="price" type="price"/>
</schema>"""


def test_simple_content_columnar(spark):
    schema = parse_xsd(_SIMPLE_CONTENT_XSD)
    rs = schema.ruleset_for("price")
    assert "price__value" in rs.rule_ids()
    df = spark.createDataFrame(
        [("50", "SEK"), ("101", "SEK"), ("50", None)],
        "_VALUE string, currency string",
    )
    compiled = rs.compile()
    out = df.select(
        "_VALUE", "currency",
        compiled["price__value"].alias("v_ok"),
        compiled["price__attr_currency"].alias("c_ok"),
    ).collect()
    got = {(r["_VALUE"], r["currency"]): (r["v_ok"], r["c_ok"]) for r in out}
    assert got[("50", "SEK")] == (True, True)
    assert got[("101", "SEK")] == (False, True)
    assert got[("50", None)] == (True, False)


def test_simple_content_extension_with_attribute_group(spark):
    schema = parse_xsd(
        """<schema>
             <attributeGroup name="meta">
               <attribute name="unit" type="string" use="required"/>
             </attributeGroup>
             <complexType name="qty">
               <simpleContent>
                 <extension base="nonNegativeInteger">
                   <attributeGroup ref="meta"/>
                 </extension>
               </simpleContent>
             </complexType>
             <element name="qty" type="qty"/>
           </schema>"""
    )
    ct = schema._element_complex("qty")
    assert ct.simple_content is not None
    assert [a.name for a in ct.attributes] == ["unit"]
    df = spark.createDataFrame([("3", "kg"), ("-1", "kg")], "_VALUE string, unit string")
    compiled = schema.ruleset_for("qty").compile()
    got = [r[0] for r in df.select(compiled["qty__value"]).collect()]
    assert got == [True, False]


def test_simple_content_xml_document_path(spark):
    """Document path: <price currency="SEK">50</price> round-trips through
    from_xml (valueTag _VALUE) and validates content + attribute."""
    schema = parse_xsd(_SIMPLE_CONTENT_XSD)
    docs = spark.createDataFrame(
        [
            (1, '<price currency="SEK">50</price>'),
            (2, '<price currency="SEK">500</price>'),
            (3, "<price>50</price>"),
        ],
        "id long, xml string",
    )
    res = schema.validate_xml_column(docs, "xml", root="price", key="id")
    got = {r["id"]: r["_doc_ok"] for r in res.verdicts.collect()}
    assert got == {1: True, 2: False, 3: False}


def test_validate_xml_key_collision_raises(spark):
    """A key column named like a declared child element would be silently
    overwritten by the from_xml flatten — must raise instead."""
    schema = parse_xsd(
        """<schema><element name="r"><complexType><sequence>
             <element name="id" type="integer"/>
           </sequence></complexType></element></schema>"""
    )
    df = spark.createDataFrame([(1, "<r><id>5</id></r>")], "id long, xml string")
    with pytest.raises(ValueError, match="collides"):
        schema.validate_xml_column(df, "xml", root="r", key="id")


def test_validate_xml_input_column_not_clobbered(spark):
    """An input column sharing a child-element name must not leak into or
    replace the parsed value (the flatten selects, never overwrites)."""
    schema = parse_xsd(
        """<schema><element name="r"><complexType><sequence>
             <element name="v" type="integer"/>
           </sequence></complexType></element></schema>"""
    )
    df = spark.createDataFrame(
        [(1, "not-a-number", "<r><v>5</v></r>"), (2, "x", "<r><v>bad</v></r>")],
        "k long, v string, xml string",
    )
    res = schema.validate_xml_column(df, "xml", root="r", key="k")
    got = {r["k"]: r["_doc_ok"] for r in res.verdicts.collect()}
    assert got == {1: True, 2: False}  # parsed <v>, not the input column


# --- identity constraints: xs:unique / xs:key / xs:keyref (round 2) --------


_IDENTITY_XSD = """<schema>
  <complexType name="rec">
    <sequence>
      <element name="code" type="string"/>
      <element name="parent_code" type="string"/>
      <element name="tag" type="string"/>
    </sequence>
  </complexType>
  <element name="rec" type="rec">
    <key name="k_code"><selector xpath="."/><field xpath="code"/></key>
    <unique name="u_tag"><selector xpath="."/><field xpath="tag"/></unique>
    <keyref name="r_parent" refer="k_code">
      <selector xpath="."/><field xpath="parent_code"/>
    </keyref>
  </element>
</schema>"""


def test_identity_constraints_parse():
    schema = parse_xsd(_IDENTITY_XSD)
    cs = {c.name: c for c in schema.elements["rec"].constraints}
    assert cs["k_code"].kind == "key" and cs["k_code"].fields == ("code",)
    assert cs["u_tag"].kind == "unique"
    assert cs["r_parent"].kind == "keyref" and cs["r_parent"].refer == "k_code"


def test_identity_violations_semantics(spark):
    schema = parse_xsd(_IDENTITY_XSD)
    df = spark.createDataFrame(
        [
            ("a", None, "t1"),    # key a; no parent; tag t1
            ("b", "a", "t2"),     # ok
            ("b", "a", "t2"),     # duplicate key b AND duplicate tag t2
            (None, "zz", "t3"),   # missing key field; parent zz dangling
        ],
        "code string, parent_code string, tag string",
    )
    got = {
        (r["constraint"], r["reason"], r["field_value"]): r["n_rows"]
        for r in schema.identity_violations(df, "rec").collect()
    }
    assert got[("k_code", "duplicate", "b")] == 2
    assert got[("k_code", "missing_field", None)] == 1
    assert got[("u_tag", "duplicate", "t2")] == 2
    assert got[("r_parent", "dangling", "zz")] == 1
    # bound refs to existing keys are not violations
    assert ("r_parent", "dangling", "a") not in got


def test_keyref_across_tables(spark):
    xsd = """<schema>
      <complexType name="ct"><sequence>
        <element name="id" type="string"/></sequence></complexType>
      <element name="dim" type="ct">
        <key name="k_dim"><selector xpath="."/><field xpath="id"/></key>
      </element>
      <complexType name="ft"><sequence>
        <element name="dim_id" type="string"/></sequence></complexType>
      <element name="fact" type="ft">
        <keyref name="r_dim" refer="k_dim">
          <selector xpath="."/><field xpath="dim_id"/>
        </keyref>
      </element>
    </schema>"""
    schema = parse_xsd(xsd)
    dim = spark.createDataFrame([("d1",), ("d2",)], "id string")
    fact = spark.createDataFrame([("d1",), ("d3",), ("d3",)], "dim_id string")
    got = {
        (r["field_value"]): r["n_rows"]
        for r in schema.identity_violations(fact, "fact", ref_frames={"dim": dim}).collect()
    }
    assert got == {"d3": 2}


# --- xs:assert (XSD 1.1, round 2) ------------------------------------------


def test_xpath_assert_translator_both_dialects():
    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.xpath_assert import parse_assert, to_sql

    cases = [
        ("a > b", {"a": 3, "b": 2}, True),
        ("a > b", {"a": "3", "b": "12"}, None),       # string compare: '3' > '12' lexic.
        ("number(a) > number(b)", {"a": "3", "b": "12"}, False),
        ("a + 1 = b", {"a": 1, "b": 2}, True),
        ("string-length(a) >= 3 and contains(a, 'x')", {"a": "axc", "b": ""}, True),
        ("starts-with(a, 'ab') or not(b = 'q')", {"a": "zz", "b": "q"}, False),
        ("a mod 2 = 0", {"a": 4, "b": 0}, True),
    ]
    con = duckdb.connect()
    for test, row, want in cases:
        ast = parse_assert(test)
        sql = to_sql(ast, "duckdb")
        con.register("t", pd.DataFrame({k: [v] for k, v in row.items()}))
        got = con.execute(f"SELECT {sql} FROM t").fetchall()[0][0]
        if want is not None:
            assert bool(got) == want, (test, sql, got)
        con.unregister("t")


def test_assert_rule_end_to_end(spark):
    xsd = """<schema>
      <complexType name="doc">
        <sequence>
          <element name="n_words" type="integer"/>
          <element name="n_chars" type="integer"/>
          <element name="lang" type="string"/>
        </sequence>
        <assert test="number(n_chars) >= number(n_words)"/>
        <assert test="string-length(lang) = 2 or lang = 'und'"/>
      </complexType>
      <element name="doc" type="doc"/>
    </schema>"""
    schema = parse_xsd(xsd)
    rs = schema.ruleset_for("doc")
    assert {r.rule_id for r in rs.rules} >= {"doc__assert_0", "doc__assert_1"}
    df = spark.createDataFrame(
        [
            ("d1", 10, 50, "en"),      # ok
            ("d2", 50, 10, "en"),      # assert_0 fails
            ("d3", 10, 50, "xxx"),     # assert_1 fails
            ("d4", 10, 50, "und"),     # ok via the or-branch
        ],
        "doc_id string, n_words int, n_chars int, lang string",
    )
    from xmlschemavalidator_spark.engine import validate

    res = validate(df, rs, key="doc_id")
    v = {(r["doc_id"], r["rule_id"]) for r in res.violations.collect()}
    assert ("d2", "doc__assert_0") in v
    assert ("d3", "doc__assert_1") in v
    assert not any(d == "d1" or d == "d4" for d, _ in v)


def test_assert_document_path_attr_prefix(spark):
    xsd = """<schema>
      <complexType name="p">
        <sequence><element name="v" type="integer"/></sequence>
        <attribute name="cap" type="integer"/>
        <assert test="number(v) &lt;= number(@cap)"/>
      </complexType>
      <element name="p" type="p"/>
    </schema>"""
    schema = parse_xsd(xsd)
    df = spark.createDataFrame(
        [("x1", '<p cap="10"><v>5</v></p>'), ("x2", '<p cap="10"><v>50</v></p>')],
        "doc_id string, xml string",
    )
    from xmlschemavalidator_spark.engine import DOC_OK

    res = schema.validate_xml_column(df, "xml", "p", "doc_id")
    got = {r["doc_id"]: r[DOC_OK] for r in res.verdicts.collect()}
    assert got == {"x1": True, "x2": False}


# --- element nillable= / default= / fixed= (XSD 1.0 §3.3.1, round 2) -------


def test_element_nillable_default_fixed(spark):
    xsd = """<schema>
      <complexType name="c">
        <sequence>
          <element name="req" type="integer"/>
          <element name="opt" type="integer" nillable="true"/>
          <element name="lvl" type="string" default="info"/>
          <element name="ver" type="string" fixed="v2"/>
        </sequence>
      </complexType>
      <element name="rec" type="c"/>
    </schema>"""
    schema = parse_xsd(xsd)
    rs = schema.ruleset_for("rec")
    df = spark.createDataFrame(
        [
            ("d1", "1", "2", "warn", "v2"),   # all present/valid
            ("d2", "1", None, None, "v2"),    # nil opt + defaulted lvl: ok
            ("d3", "1", "x", None, "v2"),     # opt present but non-integer
            ("d4", "1", None, None, "v9"),    # fixed mismatch
            ("d5", None, None, None, "v2"),   # required child missing
        ],
        "doc_id string, req string, opt string, lvl string, ver string",
    )
    from xmlschemavalidator_spark.engine import DOC_OK, validate

    res = validate(df, rs, key="doc_id")
    got = {r["doc_id"]: r[DOC_OK] for r in res.verdicts.collect()}
    assert got == {"d1": True, "d2": True, "d3": False, "d4": False, "d5": False}
    # the defaulted value decodes and validates: planted bad default fails
    xsd_bad = xsd.replace('default="info"', 'default="42"').replace(
        '<element name="lvl" type="string"', '<element name="lvl" type="string"'
    )
    rs_bad = parse_xsd(xsd_bad).ruleset_for("rec")
    res_bad = validate(df, rs_bad, key="doc_id")
    got_bad = {r["doc_id"]: r[DOC_OK] for r in res_bad.verdicts.collect()}
    assert got_bad["d2"] is False  # default '42' is not a string per dynamic typing


def test_xpath_assert_random_ast_cross_engine_equivalence(spark):
    """Property pin for the dual-dialect emitter: 60 randomly generated
    ASTs (seeded) evaluate identically in Spark and DuckDB over the same
    rows — the 'one AST, two engines, no drift' guarantee."""
    import random

    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.xpath_assert import (
        BinOp,
        Call,
        Lit,
        Path,
        to_sql,
    )

    rng = random.Random(99)
    cols = ["num_a", "num_b", "str_a", "str_b"]

    def gen_num(depth):
        if depth <= 0:
            if rng.randrange(2):
                return Lit(rng.choice([0, 1, 2, 7, 2.5]))
            return Call("number", (Path(rng.choice(["num_a", "num_b"])),))
        k = rng.randrange(3)
        if k == 0:
            return Call("string-length", (gen_str(depth - 1),))
        if k == 1:
            return BinOp(rng.choice(["+", "*", "%"]), gen_num(depth - 1),
                         Lit(rng.choice([1, 2, 3])))
        return gen_num(0)

    def gen_str(depth):
        if rng.randrange(2):
            return Lit(rng.choice(["x", "abc", "src1", ""]))
        return Path(rng.choice(["str_a", "str_b"]))

    def gen_bool(depth):
        k = rng.randrange(5)
        if k == 0:
            return BinOp(rng.choice(["=", "!=", "<", ">"]), gen_num(depth), gen_num(depth))
        if k == 1:
            return BinOp(rng.choice(["=", "!="]), gen_str(depth), gen_str(depth))
        if k == 2:
            return Call("contains", (Path(rng.choice(["str_a", "str_b"])),
                                     Lit(rng.choice(["a", "b", "1"]))))
        if k == 3:
            return Call("not", (gen_bool(max(depth - 1, 0)),))
        return BinOp(rng.choice(["and", "or"]),
                     BinOp(">", Call("number", (Path("num_a"),)), Lit(0)),
                     gen_bool(max(depth - 1, 0)))

    data = pd.DataFrame(
        {
            "num_a": [1, 0, 7, 3],
            "num_b": [2, 2, 7, 0],
            "str_a": ["abc", "", "src1", "b"],
            "str_b": ["x", "abc", "1", "b"],
        }
    )
    sdf = spark.createDataFrame(data)
    con = duckdb.connect()
    con.register("t", data)
    from pyspark.sql import functions as F

    checked = 0
    for _ in range(60):
        ast = gen_bool(2)
        spark_sql = to_sql(ast, "spark")
        duck_sql = to_sql(ast, "duckdb")
        got = [r[0] for r in sdf.select(F.expr(spark_sql)).collect()]
        want = [r[0] for r in con.execute(f"SELECT {duck_sql} FROM t").fetchall()]
        norm = lambda xs: [None if x is None else bool(x) for x in xs]
        assert norm(got) == norm(want), (spark_sql, duck_sql, got, want)
        checked += 1
    assert checked == 60


def test_schema_driven_nested_verdict_consumes_has_any(spark):
    """nested_container_verdict is the consumer of ComplexDecl.has_any:
    the same children pass under a wildcard schema and fail without it."""
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.rules.structural import nested_valid

    base = """<schema>
      <complexType name="c">
        <sequence>
          <element name="a" type="integer"/>{ANY}
        </sequence>
      </complexType>
      <element name="r" type="c"/>
    </schema>"""
    df = spark.createDataFrame(
        [([{"tag": "a", "value": "1"}, {"tag": "extra", "value": "zz"}],)],
        "children array<struct<tag:string, value:string>>",
    )
    for any_decl, want in (('<any processContents="skip"/>', True), ("", False)):
        schema = parse_xsd(base.replace("{ANY}", any_decl))
        v = schema.nested_container_verdict(F.col("children"), "r")
        got = df.select(nested_valid(v).alias("ok")).collect()[0]["ok"]
        assert got is want, any_decl


def test_assert_without_test_attr_compiles_as_vacuous_true(spark):
    """round-3 ADVICE: an <assert> with no test= defaults to "true()",
    which the translator now emits as TRUE in both dialects instead of
    failing later with a confusing tokenizer error. The rule compiles and
    passes every row; false() is the always-fail dual."""
    from xmlschemavalidator_spark.engine import validate
    from xmlschemavalidator_spark.xpath_assert import parse_assert, to_sql

    assert to_sql(parse_assert("true()"), "spark") == "TRUE"
    assert to_sql(parse_assert("false()"), "duckdb") == "FALSE"
    import pytest

    with pytest.raises(ValueError, match="takes no arguments"):
        to_sql(parse_assert("true(1)"), "spark")

    xsd = """<schema>
      <complexType name="doc">
        <sequence><element name="v" type="integer"/></sequence>
        <assert/>
        <assert test="false()"/>
      </complexType>
      <element name="doc" type="doc"/>
    </schema>"""
    rs = parse_xsd(xsd).ruleset_for("doc")
    df = spark.createDataFrame([("d1", 1), ("d2", 2)], "doc_id string, v int")
    v = {
        (r["doc_id"], r["rule_id"])
        for r in validate(df, rs, key="doc_id").violations.collect()
    }
    # assert_0 (vacuous true) never fires; assert_1 (false()) always does
    assert v == {("d1", "doc__assert_1"), ("d2", "doc__assert_1")}
