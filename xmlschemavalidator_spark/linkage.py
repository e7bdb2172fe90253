"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, JASA
1969 — the model behind splink/dedupe/US-Census record matching).

Where the dedup family answers "are these the same *text*?", record
linkage answers "are these the same *entity*?" from a comparison vector
γ over candidate pairs: each field comparison (name within edit
distance 1, same segment, balance within $5, ...) contributes a match
weight

    agree:    w⁺ = log2( m / u )
    disagree: w⁻ = log2( (1−m) / (1−u) )

where m = P(agree | same entity) and u = P(agree | different entities).
The pair's total weight Σw classifies against two thresholds into
match / possible (clerical review) / non_match — the three-way decision
rule the paper proves optimal for fixed error rates.

Engine-exactness: the log2 weights are computed ONCE in Python,
rounded to integer micro-units, and injected as literals into both the
Spark plan and the DuckDB oracle — scoring is pure integer sums and
comparisons, so pair scores hash identically. A NULL agreement (either
side missing the field) contributes 0 — the standard missing-data
convention: absence of evidence is not evidence.

Scale shape: scoring is a NARROW projection over the candidate-pair
frame — no shuffle of its own. Candidate generation is the expensive
part and stays in the existing blocking operators
(dedup.sorted_neighborhood_pairs, soundex keys, q-gram joins, MinHash);
this composes downstream of any of them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


@dataclass(frozen=True)
class FsField:
    """One field comparison: ``name`` keys the agreement column and the
    output flag ``agree_<name>``; ``m``/``u`` are the conditional
    agreement probabilities. Informative fields have m > u (agreement
    is evidence FOR a match); both must be in (0, 1) so both log
    weights are finite."""

    name: str
    m: float
    u: float

    def __post_init__(self) -> None:
        if not (0.0 < self.m < 1.0 and 0.0 < self.u < 1.0):
            raise ValueError(f"FsField {self.name!r}: m, u must be in (0, 1)")
        if self.m <= self.u:
            raise ValueError(
                f"FsField {self.name!r}: m={self.m} <= u={self.u} — agreement "
                "would be evidence AGAINST a match; negate the comparison instead"
            )

    def weights_micro(self) -> tuple[int, int]:
        """(agree, disagree) log2 weights in integer micro-bits."""
        wa = round(math.log2(self.m / self.u) * MICRO)
        wd = round(math.log2((1.0 - self.m) / (1.0 - self.u)) * MICRO)
        return wa, wd


def fellegi_sunter_score(
    pairs: DataFrame,
    agreements: dict[str, Column],
    fields: list[FsField],
    upper_micro: int,
    lower_micro: int,
) -> DataFrame:
    """Score candidate pairs: appends one ``agree_<name>`` boolean per
    field (NULL when the comparison is NULL), the integer
    ``weight_micro`` = Σ per-field weights, and the three-way
    ``decision`` ∈ {'match', 'possible', 'non_match'} (weight ≥
    ``upper_micro`` / ≥ ``lower_micro`` / below). Thresholds are by
    convention in micro-bits of evidence — pick them from the measured
    weight distribution, not a priori."""
    if lower_micro > upper_micro:
        raise ValueError(
            f"fellegi_sunter_score: lower_micro={lower_micro} > upper_micro={upper_micro}"
        )
    by_name = {f.name: f for f in fields}
    if set(by_name) != set(agreements):
        raise ValueError(
            "fellegi_sunter_score: fields and agreements must cover the same "
            f"names (fields={sorted(by_name)}, agreements={sorted(agreements)})"
        )
    out = pairs
    terms = []
    for name in sorted(by_name):
        wa, wd = by_name[name].weights_micro()
        flag = agreements[name].cast("boolean")
        out = out.withColumn(f"agree_{name}", flag)
        terms.append(
            F.when(F.col(f"agree_{name}").isNull(), F.lit(0).cast("bigint"))
            .when(F.col(f"agree_{name}"), F.lit(wa).cast("bigint"))
            .otherwise(F.lit(wd).cast("bigint"))
        )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    out = out.withColumn("weight_micro", total)
    return out.withColumn(
        "decision",
        F.when(F.col("weight_micro") >= upper_micro, F.lit("match"))
        .when(F.col("weight_micro") >= lower_micro, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def fs_weight_sql_terms(
    fields: list[FsField], agreement_sql: dict[str, str]
) -> str:
    """Render the oracle-side weight sum: for each field, a CASE over
    the given SQL agreement expression with the SAME integer literals
    as :func:`fellegi_sunter_score` (one code path computes the
    weights; both engines consume them)."""
    by_name = {f.name: f for f in fields}
    if set(by_name) != set(agreement_sql):
        raise ValueError("fs_weight_sql_terms: fields/agreement_sql name mismatch")
    parts = []
    for name in sorted(by_name):
        wa, wd = by_name[name].weights_micro()
        a = agreement_sql[name]
        parts.append(
            f"(CASE WHEN ({a}) IS NULL THEN 0 WHEN ({a}) THEN {wa} ELSE {wd} END)"
        )
    return " + ".join(parts)
