"""Semantic type inference over string columns — "the CSV landed with
every column as VARCHAR; what are these columns REALLY?"

The profiler classic (Deequ/Sherlock territory, and the dynamic
number-or-string dispatch of the reference's `string` type
— core.clj:21–29 — generalized from two classes to a full lattice):
an ordered, first-match-wins rule table of (sem_type, anchored regex)
classifies every value into one of
``null empty bool integer decimal uuid ipv4 email url iso_timestamp
iso_date hex_hash text``; a census aggregates the class histogram per
column, a dominance pass turns it into per-column verdicts ("this
column is 94% integer"), and a conformance check emits the engine's
standard violation rows for values that do NOT match a declared type.

Dual-engine by construction: the SAME rule table renders both the
Catalyst ``when``-chain (``rlike``) and the DuckDB ``CASE`` chain
(``regexp_matches``) — the shared-rule-table pattern proven by the HTML
extractor (textops.py:649), so the oracle replays the exact classifier.

Regex portability (Java on the Spark side, RE2 in DuckDB): no
backreferences, no lookaround, explicit character classes (``[0-9]``,
never ``\\d``; never ``\\s`` — the engine's documented ``\\x0B``
divergence), and explicit ``^…$`` anchors (both engines' matchers
search substrings).

Scale shape: the census is ONE corpus scan — each row emits an array of
(column, class) structs, exploded map-side and partially aggregated
before the single shuffle of at most n_columns × n_classes rows;
dominance is a window over that tiny aggregate. Conformance violations
are a narrow filter: no shuffle at all. Nothing here grows with corpus
size except the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Ordered, first-match-wins. Order is semantic: integer wins over
# decimal's no-dot-with-exponent branch; an all-digit md5 would read as
# integer (deterministic, documented) — declare hex_hash explicitly and
# use the conformance check when that matters.
SEMANTIC_RULES: tuple[tuple[str, str], ...] = (
    ("empty", r"^[ \t\r\n]*$"),
    ("bool", r"^(true|false|True|False|TRUE|FALSE)$"),
    ("integer", r"^[+-]?[0-9]+$"),
    ("decimal", r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$"),
    (
        "uuid",
        r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    ),
    (
        "ipv4",
        r"^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$",
    ),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z][A-Za-z]+$"),
    ("url", r"^https?://[!-~]+$"),
    (
        "iso_timestamp",
        r"^[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
        r"[T ][0-2][0-9]:[0-5][0-9]:[0-5][0-9](\.[0-9]+)?"
        r"(Z|[+-][0-9]{2}:?[0-9]{2})?$",
    ),
    ("iso_date", r"^[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])$"),
    ("hex_hash", r"^([0-9a-f]{32}|[0-9a-f]{40}|[0-9a-f]{64})$"),
)

FALLBACK_TYPE = "text"
NULL_TYPE = "null"

_PATTERN_OF = dict(SEMANTIC_RULES)


def classify_col(col: Column) -> Column:
    """The first-match-wins classifier as one Catalyst CASE chain."""
    chain = F.when(col.isNull(), F.lit(NULL_TYPE))
    for name, pat in SEMANTIC_RULES:
        chain = chain.when(col.rlike(pat), F.lit(name))
    return chain.otherwise(F.lit(FALLBACK_TYPE))


def classify_sql(expr: str) -> str:
    """The SAME chain rendered for DuckDB (regexp_matches; RE2)."""
    parts = [f"CASE WHEN {expr} IS NULL THEN '{NULL_TYPE}'"]
    for name, pat in SEMANTIC_RULES:
        parts.append(f"WHEN regexp_matches({expr}, '{pat}') THEN '{name}'")
    parts.append(f"ELSE '{FALLBACK_TYPE}' END")
    return " ".join(parts)


def semantic_type_census(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column class histogram ``(column, sem_type, n, share_micro)``
    in ONE scan: each row emits an array of (column, class) structs,
    exploded and partially aggregated before the single small shuffle.
    share_micro = n·10⁶ div column_total — engine-identical floor
    division, same denominator (all rows) for every class."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                classify_col(F.col(c).cast("string")).alias("sem_type"),
            )
            for c in columns
        ]
    )
    long = df.select(F.explode(pairs).alias("p")).select(
        "p.column", "p.sem_type"
    )
    counts = long.groupBy("column", "sem_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy("column"))
    return counts.withColumn("_tot", tot).select(
        "column",
        "sem_type",
        "n",
        F.expr("CAST(n * 1000000 div _tot AS BIGINT)").alias("share_micro"),
    )


def semantic_census_oracle_sql(from_sql: str, columns: list[str]) -> str:
    """DuckDB replay of :func:`semantic_type_census` — same rule table,
    same floor division."""
    arms = "\n  UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", {classify_sql(c)} AS sem_type FROM src"
        for c in columns
    )
    return f"""WITH src AS ({from_sql}),
long AS ({arms}),
counts AS (SELECT "column", sem_type, CAST(count(*) AS BIGINT) AS n
           FROM long GROUP BY 1, 2)
SELECT "column", sem_type, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY "column") AS BIGINT)
           AS share_micro
FROM counts"""


def dominant_semantic_types(
    df: DataFrame,
    columns: list[str],
    min_share_micro: int = 800_000,
) -> DataFrame:
    """Per-column dominance verdict ``(column, dominant_type, n_typed,
    n_dominant, share_micro, conforming)``: the most frequent class
    among TYPED values (null/empty excluded — a sparse column can still
    be "an integer column"), tie broken by class name, with
    conforming = share_micro ≥ min_share_micro. Built on the census
    aggregate — still one corpus scan total."""
    census = semantic_type_census(df, columns).where(
        ~F.col("sem_type").isin([NULL_TYPE, "empty"])
    )
    tot = F.sum("n").over(Window.partitionBy("column"))
    w = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("sem_type").asc()
    )
    return (
        census.withColumn("n_typed", tot)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "column",
            F.col("sem_type").alias("dominant_type"),
            F.col("n_typed").cast("bigint").alias("n_typed"),
            F.col("n").alias("n_dominant"),
            F.expr("CAST(n * 1000000 div n_typed AS BIGINT)").alias(
                "share_micro"
            ),
            (
                F.expr("n * 1000000 div n_typed") >= F.lit(min_share_micro)
            ).alias("conforming"),
        )
    )


def dominant_oracle_sql(
    from_sql: str, columns: list[str], min_share_micro: int = 800_000
) -> str:
    """DuckDB replay of :func:`dominant_semantic_types`."""
    arms = "\n  UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", {classify_sql(c)} AS sem_type FROM src"
        for c in columns
    )
    return f"""WITH src AS ({from_sql}),
long AS ({arms}),
counts AS (SELECT "column", sem_type, CAST(count(*) AS BIGINT) AS n
           FROM long
           WHERE sem_type NOT IN ('{NULL_TYPE}', 'empty')
           GROUP BY 1, 2),
ranked AS (SELECT *,
       CAST(sum(n) OVER (PARTITION BY "column") AS BIGINT) AS n_typed,
       row_number() OVER (PARTITION BY "column"
                          ORDER BY n DESC, sem_type ASC) AS rn
  FROM counts)
SELECT "column", sem_type AS dominant_type, n_typed, n AS n_dominant,
       CAST(n * 1000000 // n_typed AS BIGINT) AS share_micro,
       n * 1000000 // n_typed >= {min_share_micro} AS conforming
FROM ranked WHERE rn = 1"""


def semantic_type_violations(
    df: DataFrame,
    column: str,
    sem_type: str,
    id_col: str,
    rule_id: str | None = None,
) -> DataFrame:
    """Violation rows ``(id, rule_id, observed_value)`` for values that
    do NOT match the DECLARED type's own regex (not the first-match
    classifier — an all-digit hash conforms to a declared hex_hash even
    though the census reads it as integer). NULL values violate (they
    cannot conform; observed_value NULL). Narrow filter, no shuffle."""
    if sem_type not in _PATTERN_OF:
        raise ValueError(f"unknown semantic type: {sem_type}")
    rid = rule_id or f"semantic_{column}_{sem_type}"
    c = F.col(column).cast("string")
    return df.where(c.isNull() | ~c.rlike(_PATTERN_OF[sem_type])).select(
        F.col(id_col),
        F.lit(rid).alias("rule_id"),
        c.alias("observed_value"),
    )


def semantic_violations_oracle_sql(
    from_sql: str, column: str, sem_type: str, id_col: str,
    rule_id: str | None = None,
) -> str:
    """DuckDB replay of :func:`semantic_type_violations`."""
    rid = rule_id or f"semantic_{column}_{sem_type}"
    pat = _PATTERN_OF[sem_type]
    return f"""SELECT {id_col}, '{rid}' AS rule_id,
       {column} AS observed_value
FROM ({from_sql})
WHERE {column} IS NULL OR NOT regexp_matches({column}, '{pat}')"""
