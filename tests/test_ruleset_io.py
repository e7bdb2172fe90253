"""JSON ruleset loader: parse → compile → validate, and round-trip."""

from __future__ import annotations

from xmlschemavalidator_spark.engine import validate
from xmlschemavalidator_spark.ruleset_io import (
    ruleset_from_json,
    ruleset_to_dict,
    ruleset_from_dict,
    ruleset_to_json,
)

SPEC = """{
  "rules": [
    {"id": "lang_enum", "column": "lang",
     "type": {"restriction": {"base": "string",
              "facets": [{"enumeration": "en"}, {"enumeration": "de"}]}}},
    {"id": "chars", "column": "n_chars",
     "type": {"restriction": {"base": "integer",
              "facets": [{"minInclusive": 36}, {"maxInclusive": 42}]}}},
    {"id": "u", "column": "lang", "type": {"union": ["byte", {"restriction":
              {"facets": [{"enumeration": "en"}]}}]}},
    {"id": "pat", "column": "source", "type": {"restriction":
              {"facets": [{"pattern": "src[0-9]"}]}}},
    {"id": "src_fixed", "column": "source", "fixed": "src1"},
    {"id": "lang_def", "column": "lang", "default": "en", "type": "string"},
    {"id": "url_req", "column": "url", "required": true},
    {"id": "shape", "sequence": ["url", "lang"]},
    {"id": "one_of", "choice": ["lang", "missing_alt"]},
    {"id": "inv", "expr": "n_chars >= 0"}
  ]
}"""


def test_json_ruleset_compiles_and_validates(spark):
    rs = ruleset_from_json(SPEC)
    df = spark.createDataFrame(
        [("u1", "en", "src1", 40, None), ("u2", "xx", "src10", 50, None)],
        "url string, lang string, source string, n_chars bigint, missing_alt string",
    )
    res = validate(df, rs, key="url")
    viol = {(r["url"], r["rule_id"]) for r in res.violations.collect()}
    assert ("u2", "lang_enum") in viol
    assert ("u2", "chars") in viol
    assert ("u2", "pat") in viol  # src10 fails the anchored pattern
    assert ("u2", "src_fixed") in viol
    assert ("u1", "lang_enum") not in viol
    assert ("u1", "one_of") not in viol  # exactly one of (lang, missing_alt)


def test_round_trip(spark):
    rs = ruleset_from_json(SPEC)
    d1 = ruleset_to_dict(rs)
    rs2 = ruleset_from_dict(d1)
    assert ruleset_to_dict(rs2) == d1
    # the re-parsed ruleset produces identical SQL renderings
    assert rs.compile_sql() == rs2.compile_sql()
    assert ruleset_to_json(rs)  # serializes without error
