"""Structural particles — shape-of-record operators (SURVEY.md §2.4).

The reference validates a *collection of child elements* against a declared
particle. On a fixed-schema DataFrame, a "record" is either

* the **row itself** (flat columns) — presence = non-null, order = the
  DataFrame's column order, checked once at compile time; or
* a **nested array of child structs** ``array<struct<tag:string, ...>>`` —
  the faithful rose-tree encoding; order/arity checked with ``arrays_zip`` /
  ``size`` expressions.

Reference semantics:
* ``sequence`` — child tags equal declared tags **in order** (`=` on key
  lists, core.clj:138-146; per-child verdicts parser.clj:208-226); an
  undeclared child yields the pseudo-verdict ``[false :undefined tag]``
  (parser.clj:216);
* ``all`` — same children, **any order** (set equality, core.clj:161-171;
  parser.clj:228-230);
* ``choice`` — exactly one child (count = 1; v1 also requires the tag to be
  declared, core.clj:150-159; parser.clj:232-234);
* ``minOccurs``/``maxOccurs`` — parsed and defaulted in the reference
  (parser.clj:35-42) but never enforced (the occurs test is half-commented
  out, parser_test.clj:319-328). We implement the declared semantics:
  ``lo <= size(children) <= hi``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SequenceRule:
    """Declared fields present, in declared order (core.clj:138-146).

    Flat-row form: order is a compile-time property of the DataFrame schema —
    :meth:`check_schema` raises if the declared fields don't appear in order;
    the per-row residue is the non-null conjunction.
    """

    fields: tuple[str, ...]

    def check_schema(self, df: DataFrame) -> None:
        cols = [c for c in df.columns if c in self.fields]
        if cols != list(self.fields):
            raise ValueError(
                f"sequence order violated: declared {list(self.fields)}, "
                f"schema has {cols}"
            )

    def to_column(self) -> Column:
        out = F.col(self.fields[0]).isNotNull()
        for f in self.fields[1:]:
            out = out & F.col(f).isNotNull()
        return out

    def sql_expr(self) -> str:
        return "(" + " AND ".join(f"{f} IS NOT NULL" for f in self.fields) + ")"


@dataclass(frozen=True)
class AllRule:
    """Same declared fields, any order (set semantics, core.clj:161-171)."""

    fields: tuple[str, ...]

    def to_column(self) -> Column:
        out = F.col(self.fields[0]).isNotNull()
        for f in self.fields[1:]:
            out = out & F.col(f).isNotNull()
        return out

    def sql_expr(self) -> str:
        return "(" + " AND ".join(f"{f} IS NOT NULL" for f in self.fields) + ")"


@dataclass(frozen=True)
class ChoiceRule:
    """Exactly one of the candidate fields non-null (core.clj:150-159:
    count must be 1 and the present tag must be declared)."""

    fields: tuple[str, ...]

    def to_column(self) -> Column:
        total = F.lit(0)
        for f in self.fields:
            total = total + F.col(f).isNotNull().cast("int")
        return total == F.lit(1)

    def sql_expr(self) -> str:
        s = " + ".join(f"CAST({f} IS NOT NULL AS INT)" for f in self.fields)
        return f"(({s}) = 1)"


@dataclass(frozen=True)
class Occurs:
    """minOccurs/maxOccurs over an array column: lo <= size <= hi
    (declared but unenforced in the reference, parser.clj:35-42,323-324 —
    we enforce the spec)."""

    lo: int = 1
    hi: Optional[int] = 1  # None = "unbounded"

    def to_column(self, arr: Column) -> Column:
        size = F.size(F.coalesce(arr, F.array()))
        out = size >= F.lit(self.lo)
        if self.hi is not None:
            out = out & (size <= F.lit(self.hi))
        return out

    def sql_expr(self, arr_sql: str) -> str:
        size = f"coalesce(len({arr_sql}), 0)"
        parts = [f"{size} >= {self.lo}"]
        if self.hi is not None:
            parts.append(f"{size} <= {self.hi}")
        return "(" + " AND ".join(parts) + ")"


# --- nested (rose-tree faithful) variants over array<struct<tag,...>> ------


def sequence_tags_ok(children: Column, declared: Sequence[str]) -> Column:
    """Nested-array sequence check: the array's ``tag`` fields equal the
    declared tag list in order (the `=` on key lists at core.clj:143).
    NULL children array -> False (never NULL: a NULL verdict would poison
    the _doc_ok conjunction and vanish from ~ok filters)."""
    tags = F.transform(children, lambda c: c["tag"])
    return F.coalesce(tags == F.array(*[F.lit(t) for t in declared]), F.lit(False))


def all_tags_ok(children: Column, declared: Sequence[str]) -> Column:
    """Nested-array `all` check: tag multiset equality, order-insensitive
    (set + count equality as in v1, core.clj:161-171)."""
    tags = F.array_sort(F.transform(children, lambda c: c["tag"]))
    return F.coalesce(
        tags == F.array(*[F.lit(t) for t in sorted(declared)]), F.lit(False)
    )


def choice_tags_ok(children: Column, declared: Sequence[str]) -> Column:
    """Nested-array choice: exactly one child AND its tag declared
    (core.clj:150-159)."""
    one = F.size(children) == F.lit(1)
    # F.get (0-based) returns NULL out of bounds; element_at THROWS on an
    # empty array under Spark 4 ANSI mode if the conjunct is ever evaluated
    # independently of `one`
    tag0 = F.get(children, 0)["tag"]
    return F.coalesce(one & tag0.isin(list(declared)), F.lit(False))


def undefined_children(children: Column, declared: Sequence[str]) -> Column:
    """Tags present but not declared — the reference's ``[false :undefined
    tag]`` pseudo-verdict (parser.clj:216). Returns the array of offending
    tags (empty array = none)."""
    tags = F.transform(children, lambda c: c["tag"])
    return F.filter(tags, lambda t: ~t.isin(list(declared)))


def child_verdicts(
    children: Column,
    declared,
    registry=None,
    value_field: str = "value",
    allow_undeclared: bool = False,
) -> Column:
    """Per-child verdicts in document order — the reference evaluates EVERY
    child against the element declared *for its tag* and reports each
    child's verdict even when the container condition fails
    (``(map #(if-let [e# (elements (:tag %))] ...) value)``,
    parser.clj:208-226; asserted through parser_test.clj:305-355).

    ``declared`` is an ordered list of ``(tag, type)`` where each type is a
    rules.types.Type (``to_column(col, registry)``). Returns
    ``array<struct<tag:string, ok:boolean, value:string>>``:

    * declared tag  → ok = that tag's type verdict on the child's value
      (never NULL; NULL value → False), value = the observed value string;
    * undeclared tag → ``(tag, false, ':undefined')`` — the literal
      pseudo-verdict the reference emits (parser.clj:216) — unless
      ``allow_undeclared`` (the ``xs:any processContents="skip"`` wildcard,
      XSD 1.0 §3.10; absent from the reference's grammar): then an
      undeclared child passes with its observed value.

    Dispatch is a lazily-evaluated when-chain on the tag, applied inside
    ONE ``transform`` — per child, only the matching tag's rule subtree is
    evaluated (CaseWhen branches are lazy), so cost is O(children), not
    O(children × declared)."""
    decl = list(declared)
    declared_tags = [tag for tag, _ in decl]

    def verdict(c: Column) -> Column:
        v = c[value_field]
        expr = None
        for tag, t in decl:
            this_ok = F.coalesce(t.to_column(v, registry), F.lit(False))
            cond = c["tag"] == F.lit(tag)
            expr = F.when(cond, this_ok) if expr is None else expr.when(cond, this_ok)
        fallback = F.lit(True) if allow_undeclared else F.lit(False)
        ok = expr.otherwise(fallback) if expr is not None else fallback
        undeclared_value = (
            v.cast("string") if allow_undeclared else F.lit(":undefined")
        )
        value_out = (
            F.when(c["tag"].isin(declared_tags), v.cast("string"))
            .otherwise(undeclared_value)
        )
        return F.struct(
            c["tag"].alias("tag"), ok.alias("ok"), value_out.alias("value")
        )

    return F.transform(children, verdict)


def sequence_tags_with_any_ok(children: Column, declared: Sequence[str]) -> Column:
    """Sequence containing an ``xs:any`` wildcard (XSD 1.0 §3.10): the
    declared tags must appear IN ORDER as a subsequence of the child tags;
    wildcard-matched extras may interleave anywhere. One ``aggregate`` HOF:
    the accumulator is the count of declared tags matched so far."""
    tags = F.transform(children, lambda c: c["tag"])
    decl_arr = F.array(*[F.lit(t) for t in declared])
    n = len(list(declared))
    matched = F.aggregate(
        tags,
        F.lit(0),
        lambda acc, t: F.when(
            (acc < F.lit(n)) & (t == F.element_at(decl_arr, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return F.coalesce(matched == F.lit(n), F.lit(False))


def all_tags_with_any_ok(children: Column, declared: Sequence[str]) -> Column:
    """``all`` + ``xs:any``: every declared tag present (any order),
    wildcard extras allowed."""
    tags = F.transform(children, lambda c: c["tag"])
    out = F.lit(True)
    for t in declared:
        out = out & F.array_contains(tags, t)
    return F.coalesce(out, F.lit(False))


def container_verdict(
    children: Column,
    declared,
    kind: str,
    registry=None,
    value_field: str = "value",
    allow_undeclared: bool = False,
) -> Column:
    """The reference's full container verdict ``(conj child-verdicts
    container-ok)`` (parser.clj:210-219) as
    ``struct<ok:boolean, children:array<struct<tag, ok, value>>>``:
    ``ok`` is the container *condition only* (sequence order / all set /
    choice arity — core.clj:138-171), per-child verdicts ride alongside.
    Overall validity is the ``valid?`` fold — :func:`nested_valid`."""
    tags = [t for t, _ in declared]
    if kind == "sequence":
        cond = (
            sequence_tags_with_any_ok(children, tags)
            if allow_undeclared
            else sequence_tags_ok(children, tags)
        )
    elif kind == "all":
        cond = (
            all_tags_with_any_ok(children, tags)
            if allow_undeclared
            else all_tags_ok(children, tags)
        )
    elif kind == "choice":
        cond = choice_tags_ok(children, tags)
    else:
        raise ValueError(f"unknown container kind: {kind!r}")
    return F.struct(
        cond.alias("ok"),
        child_verdicts(
            children, declared, registry, value_field, allow_undeclared
        ).alias("children"),
    )


def nested_valid(verdict: Column) -> Column:
    """``valid?`` over a :func:`container_verdict`: fold-AND of the
    container condition and every child verdict (core.clj's valid? walks
    the whole verdict tree). Never NULL."""
    all_children_ok = F.forall(verdict["children"], lambda cv: cv["ok"])
    return verdict["ok"] & F.coalesce(all_children_ok, F.lit(True))
