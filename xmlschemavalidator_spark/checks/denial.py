"""Denial constraints — the pairwise generalization of FDs and CFDs
(Chu/Ilyas/Papotti, "Discovering Denial Constraints", VLDB 2013): a DC
states that NO pair of rows (t, u) may jointly satisfy a conjunction of
comparison predicates ``t.A op u.B`` (op ∈ = ≠ < ≤ > ≥). FDs
("same key, different value"), order rules ("more quantity never costs
less for the same part") and interval sanity rules are all DCs.

Scale shape — the rule this engine enforces everywhere pairs appear: a
DC is only evaluated BLOCKED. At least one ``t.A = u.A`` predicate is
required (ValueError otherwise — an unblocked DC is an all-pairs
self-join, the one plan that can never survive 100 TB); those equality
predicates become the self-join keys (Catalyst extracts them into a
hash/sort-merge join, the remaining comparisons ride as join filters),
and blocks larger than ``max_block`` rows are EXCLUDED with a
first-class audit surface (:func:`denial_hot_blocks`) — the engine's
no-silent-caps convention (same shape as the simhash hot-chunk and
LSH hot-bucket audits).

Null semantics: any predicate touching NULL is three-valued NULL, so
the pair does not fire — the standard DC convention; declare
separate not-null rules when absence itself is the defect.

Output is ORDERED pairs ``(id_a, id_b, rule_id)``: a DC with asymmetric
predicates (<, >) genuinely distinguishes (t, u) from (u, t); a purely
symmetric DC yields both orientations and the caller may keep
``id_a < id_b``.
"""

from __future__ import annotations

import operator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = {
    "=": operator.eq,
    "!=": operator.ne,
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
}
_SQL_OPS = {"=": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


@dataclass(frozen=True)
class Pred:
    """One predicate ``t.left op u.right`` of a denial constraint."""

    left: str
    op: str
    right: str

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unknown DC operator: {self.op!r}")


def _split(predicates: list[Pred]) -> tuple[list[str], list[Pred]]:
    keys = [p.left for p in predicates if p.op == "=" and p.left == p.right]
    rest = [p for p in predicates if not (p.op == "=" and p.left == p.right)]
    if not keys:
        raise ValueError(
            "denial constraint needs at least one t.A = u.A predicate to "
            "block on — an unblocked DC is an all-pairs self-join"
        )
    return keys, rest


def denial_violations(
    df: DataFrame,
    predicates: list[Pred],
    id_col: str,
    rule_id: str | None = None,
    max_block: int = 100_000,
) -> DataFrame:
    """Ordered violating pairs ``(id_a, id_b, rule_id)`` of the DC
    ¬(p₁ ∧ … ∧ pₘ), evaluated block-locally: one groupBy for block
    sizes, one semi join to drop hot blocks (audited separately), one
    equi self-join on the blocking keys with the comparison predicates
    as join filters. Shuffle carries only the projected pred columns."""
    keys, rest = _split(predicates)
    rid = rule_id or "dc_" + "_".join(keys)
    cols = sorted({id_col, *keys, *(p.left for p in rest), *(p.right for p in rest)})
    base = df.select(*cols)
    ok = (
        base.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") <= max_block)
        .select(*keys)
    )
    capped = base.join(ok, keys, "left_semi")
    t, u = capped.alias("t"), capped.alias("u")
    cond = F.col(f"t.{id_col}") != F.col(f"u.{id_col}")
    for k in keys:
        cond = cond & (F.col(f"t.{k}") == F.col(f"u.{k}"))
    for p in rest:
        cond = cond & _OPS[p.op](F.col(f"t.{p.left}"), F.col(f"u.{p.right}"))
    return t.join(u, cond).select(
        F.col(f"t.{id_col}").alias("id_a"),
        F.col(f"u.{id_col}").alias("id_b"),
        F.lit(rid).alias("rule_id"),
    )


def denial_block_counts(
    df: DataFrame,
    predicates: list[Pred],
    id_col: str,
    rule_id: str | None = None,
    max_block: int = 100_000,
) -> DataFrame:
    """Per-block violation tallies ``(keys…, n_pairs, rule_id)`` — the
    compact triage shape (which parts / hosts / days carry the
    violations) when the pair list itself is too wide to sink.
    ``id_col`` must be UNIQUE (the tally re-joins pairs on id_a; a
    duplicated id multiplies tallies — give rows a row_number id first)."""
    keys, _ = _split(predicates)
    rid = rule_id or "dc_" + "_".join(keys)
    pairs = denial_violations(df, predicates, id_col, rid, max_block)
    # re-derive the block key of each pair from id_a's row
    sides = df.select(F.col(id_col).alias("id_a"), *keys)
    return (
        pairs.join(sides, "id_a")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(*keys, "n_pairs", F.lit(rid).alias("rule_id"))
    )


def denial_hot_blocks(
    df: DataFrame,
    predicates: list[Pred],
    max_block: int = 100_000,
) -> DataFrame:
    """Audit surface for what the cap dropped: blocks whose size
    exceeds ``max_block`` as ``(keys…, n_rows)`` — run it beside every
    capped DC, the engine's no-silent-caps rule."""
    keys, _ = _split(predicates)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .where(F.col("n_rows") > max_block)
    )


def denial_block_counts_oracle_sql(
    from_sql: str,
    predicates: list[Pred],
    id_col: str,
    rule_id: str | None = None,
    max_block: int = 100_000,
) -> str:
    """DuckDB replay of :func:`denial_block_counts` — groups the pair
    join by t's blocking keys directly."""
    keys, rest = _split(predicates)
    rid = rule_id or "dc_" + "_".join(keys)
    klist = ", ".join(keys)
    tkeys = ", ".join(f"t.{k}" for k in keys)
    on = [f"t.{k} = u.{k}" for k in keys]
    on.append(f"t.{id_col} <> u.{id_col}")
    on += [f"t.{p.left} {_SQL_OPS[p.op]} u.{p.right}" for p in rest]
    return f"""WITH src AS ({from_sql}),
ok AS (SELECT {klist} FROM src GROUP BY {klist}
       HAVING count(*) <= {max_block}),
capped AS (SELECT s.* FROM src s JOIN ok USING ({klist}))
SELECT {tkeys}, CAST(count(*) AS BIGINT) AS n_pairs, '{rid}' AS rule_id
FROM capped t JOIN capped u ON {" AND ".join(on)}
GROUP BY {tkeys}"""


def denial_oracle_sql(
    from_sql: str,
    predicates: list[Pred],
    id_col: str,
    rule_id: str | None = None,
    max_block: int = 100_000,
) -> str:
    """DuckDB replay of :func:`denial_violations` — same blocking, same
    cap, same three-valued null semantics."""
    keys, rest = _split(predicates)
    rid = rule_id or "dc_" + "_".join(keys)
    klist = ", ".join(keys)
    on = [f"t.{k} = u.{k}" for k in keys]
    on.append(f"t.{id_col} <> u.{id_col}")
    on += [f"t.{p.left} {_SQL_OPS[p.op]} u.{p.right}" for p in rest]
    return f"""WITH src AS ({from_sql}),
ok AS (SELECT {klist} FROM src GROUP BY {klist}
       HAVING count(*) <= {max_block}),
capped AS (SELECT s.* FROM src s JOIN ok USING ({klist}))
SELECT t.{id_col} AS id_a, u.{id_col} AS id_b, '{rid}' AS rule_id
FROM capped t JOIN capped u ON {" AND ".join(on)}"""
