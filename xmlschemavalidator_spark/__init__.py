"""xmlschemavalidator_spark — a PySpark-native declarative constraint-validation engine.

Re-imagines the reference library (eliassona/xmlschemavalidator, Clojure: an XSD
subset compiled via tree transform + eval into per-document validator closures;
see /root/reference/src/xmlschemavalidator/{core,parser}.clj) as a **rule
compiler targeting Catalyst Column expressions**:

* each declared constraint (range / enumeration / pattern / length facet,
  builtin type check, union, structural particle, attribute occurrence rule)
  compiles once on the driver into a boolean ``pyspark.sql.Column``;
* a ruleset is evaluated over a DataFrame in a **single projection pass**
  (all rule booleans fuse into one whole-stage-codegen stage);
* outputs mirror the reference's verdict trees as: wide per-row boolean
  columns, a long violations DataFrame ``(key, rule_id, observed_value)``,
  and per-partition pass/fail summaries.

Dataset-level checks (column stats, HLL distinct sketches, uniqueness,
referential integrity, distribution drift) extend the reference's per-value
semantics to whole-table semantics per the engine's north rule.
"""

from xmlschemavalidator_spark.compiler import FieldRule, RuleSet, compile_rule
from xmlschemavalidator_spark.engine import ValidationResult, validate
from xmlschemavalidator_spark.rules.facets import (
    Enumeration,
    Length,
    MaxExclusive,
    MaxInclusive,
    MaxLength,
    MinExclusive,
    MinInclusive,
    MinLength,
    Pattern,
)
from xmlschemavalidator_spark.rules.types import (
    PREDEF_TYPES,
    BuiltinType,
    ListType,
    Restriction,
    TypeRegistry,
    Union,
)

__all__ = [
    "FieldRule",
    "RuleSet",
    "compile_rule",
    "ValidationResult",
    "validate",
    "Enumeration",
    "Length",
    "MaxExclusive",
    "MaxInclusive",
    "MaxLength",
    "MinExclusive",
    "MinInclusive",
    "MinLength",
    "Pattern",
    "PREDEF_TYPES",
    "BuiltinType",
    "ListType",
    "Restriction",
    "TypeRegistry",
    "Union",
]

__version__ = "0.1.0"
