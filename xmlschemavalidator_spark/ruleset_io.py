"""Declarative ruleset serialization: JSON ⇄ RuleSet.

The reference's input is a declarative schema document (XSD); besides the
XSD front-end (xsd.py) the engine accepts the same constraint vocabulary
as plain JSON — the config-file shape a data-platform team actually ships:

```json
{"rules": [
  {"id": "lang_enum", "column": "lang",
   "type": {"restriction": {"base": "string",
            "facets": [{"enumeration": "en"}, {"enumeration": "de"}]}}},
  {"id": "chars", "column": "n_chars",
   "type": {"restriction": {"base": "integer",
            "facets": [{"minInclusive": 36}, {"maxInclusive": 4200}]}}},
  {"id": "u", "column": "v",
   "type": {"union": [{"restriction": {...}}, "byte"]}},
  {"id": "src_fixed", "column": "source", "fixed": "src1"},
  {"id": "lang_def", "column": "lang", "default": "en", "type": "string"},
  {"id": "url_req", "column": "url", "required": true},
  {"id": "shape", "sequence": ["doc_id", "text"]},
  {"id": "one_of", "choice": ["html", "text"]},
  {"id": "inv", "expr": "n_chars = length(text)"}
]}
```
"""

from __future__ import annotations

import json
from typing import Any

from xmlschemavalidator_spark.compiler import ExprRule, FieldRule, RuleSet
from xmlschemavalidator_spark.rules.attributes import DefaultAttr, FixedAttr, RequiredAttr
from xmlschemavalidator_spark.rules.facets import (
    Enumeration,
    Facet,
    Length,
    MaxExclusive,
    MaxInclusive,
    MaxLength,
    MinExclusive,
    MinInclusive,
    MinLength,
    Pattern,
)
from xmlschemavalidator_spark.rules.structural import AllRule, ChoiceRule, SequenceRule
from xmlschemavalidator_spark.rules.types import Restriction, Union

_FACET_NAMES = {
    "enumeration": Enumeration,
    "minInclusive": MinInclusive,
    "maxInclusive": MaxInclusive,
    "minExclusive": MinExclusive,
    "maxExclusive": MaxExclusive,
    "pattern": Pattern,
    "length": Length,
    "minLength": MinLength,
    "maxLength": MaxLength,
}
_FACET_CLASSES = {v: k for k, v in _FACET_NAMES.items()}


def _facet_from(d: dict) -> Facet:
    (name, value), = d.items()
    cls = _FACET_NAMES[name]
    if cls is Pattern:
        return Pattern(str(value))
    if cls in (Length, MinLength, MaxLength):
        return cls(int(value))
    return cls(value)


def _type_from(spec: Any):
    """Type spec: a name string, {"restriction": {...}}, or {"union": [...]}."""
    if isinstance(spec, str):
        return spec  # named type, resolved through the registry at compile
    if "restriction" in spec:
        r = spec["restriction"]
        return Restriction(
            base=r.get("base"),
            facets=tuple(_facet_from(f) for f in r.get("facets", [])),
        )
    if "union" in spec:
        return Union(members=tuple(_type_from(m) for m in spec["union"]))
    raise ValueError(f"unknown type spec {spec!r}")


def _type_to(t: Any) -> Any:
    if isinstance(t, str):
        return t
    if isinstance(t, Restriction):
        return {
            "restriction": {
                **({"base": t.base} if isinstance(t.base, str) else {}),
                "facets": [
                    {_FACET_CLASSES[type(f)]: f.pattern}
                    if isinstance(f, Pattern)
                    else {_FACET_CLASSES[type(f)]: f.value}
                    for f in t.facets
                ],
            }
        }
    if isinstance(t, Union):
        return {"union": [_type_to(m) for m in t.members]}
    raise ValueError(f"cannot serialize type {t!r}")


def ruleset_from_dict(spec: dict) -> RuleSet:
    rules: list[FieldRule] = []
    for r in spec.get("rules", []):
        rid = r["id"]
        if "sequence" in r:
            rules.append(FieldRule(rid, SequenceRule(tuple(r["sequence"]))))
        elif "all" in r:
            rules.append(FieldRule(rid, AllRule(tuple(r["all"]))))
        elif "choice" in r:
            rules.append(FieldRule(rid, ChoiceRule(tuple(r["choice"]))))
        elif "expr" in r:
            rules.append(FieldRule(rid, ExprRule(r["expr"]), observed=r.get("observed")))
        elif "fixed" in r:
            rules.append(FieldRule(rid, FixedAttr(r["fixed"]), column=r["column"]))
        elif "default" in r:
            t = _type_from(r["type"]) if "type" in r else None
            rules.append(FieldRule(rid, DefaultAttr(r["default"], t), column=r["column"]))
        elif r.get("required"):
            t = _type_from(r["type"]) if "type" in r else None
            rules.append(FieldRule(rid, RequiredAttr(t), column=r["column"]))
        else:
            rules.append(
                FieldRule(
                    rid, _type_from(r["type"]), column=r["column"], observed=r.get("observed")
                )
            )
    return RuleSet(rules=rules)


def ruleset_to_dict(rs: RuleSet) -> dict:
    out = []
    for r in rs.rules:
        d: dict[str, Any] = {"id": r.rule_id}
        rule = r.rule
        if isinstance(rule, SequenceRule):
            d["sequence"] = list(rule.fields)
        elif isinstance(rule, AllRule):
            d["all"] = list(rule.fields)
        elif isinstance(rule, ChoiceRule):
            d["choice"] = list(rule.fields)
        elif isinstance(rule, ExprRule):
            d["expr"] = rule.expr
            if r.observed:
                d["observed"] = r.observed
        elif isinstance(rule, FixedAttr):
            d.update(column=r.column, fixed=rule.fixed)
        elif isinstance(rule, DefaultAttr):
            d.update(column=r.column, default=rule.default)
            if rule.type is not None:
                d["type"] = _type_to(rule.type)
        elif isinstance(rule, RequiredAttr):
            d.update(column=r.column, required=True)
            if rule.type is not None:
                d["type"] = _type_to(rule.type)
        else:
            d.update(column=r.column, type=_type_to(rule))
            if r.observed:
                d["observed"] = r.observed
        out.append(d)
    return {"rules": out}


def ruleset_from_json(text: str) -> RuleSet:
    return ruleset_from_dict(json.loads(text))


def ruleset_to_json(rs: RuleSet, indent: int | None = 2) -> str:
    return json.dumps(ruleset_to_dict(rs), indent=indent)
