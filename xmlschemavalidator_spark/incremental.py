"""Incremental revalidation across table snapshots.

At 10^12 documents, a new Iceberg snapshot typically changes a sliver of
rows; re-running the rule pass over the whole table wastes 99%+ of the
scan. This module composes :func:`checks.diff.snapshot_diff` with the rule
engine so that only ADDED or CHANGED keys are revalidated, prior violation
rows are carried forward for unchanged keys, and violations of REMOVED
keys are retired:

    new_violations =  prev_violations ⋉̸ (changed ∪ removed keys)   [carry]
                   ∪  validate(new ⋉ (added ∪ changed keys))        [fresh]

The invariant (asserted by the tests and the driver oracle): the result is
ROW-IDENTICAL to fully validating the new snapshot. Cost shape: one
fingerprint diff (shuffles (key, 16B) per side) + one rule pass over only
the touched rows; the carry-forward is a broadcast-able anti join when
churn is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.diff import snapshot_diff
from xmlschemavalidator_spark.compiler import RuleSet
from xmlschemavalidator_spark.engine import validate


def incremental_revalidate(
    prev_violations: DataFrame,
    old_df: DataFrame,
    new_df: DataFrame,
    ruleset: RuleSet,
    key: str,
    diff: DataFrame | None = None,
) -> DataFrame:
    """Violations of ``new_df`` computed incrementally from the previous
    run. ``prev_violations`` must be the (key, rule_id, observed_value)
    output of validating ``old_df`` with the same ruleset.

    Cost economics (measured, 1M rows / 1% churn, cheap rules): computing
    the diff by fingerprinting costs TWO extra scans, which cheap
    Column-expression rules don't amortize — full revalidation was 4x
    faster there. The incremental path wins when (a) rules are expensive
    (regex-heavy packs, pandas-UDF predicates, the extract invariant), or
    (b) ``diff`` is supplied from the table format's changelog (Iceberg
    CDC / Delta CDF), which is the intended 10^12-row deployment: then the
    cost is one pruned rule pass over the churn plus a broadcast-able
    anti join, independent of table size."""
    if diff is None:
        diff = snapshot_diff(old_df, new_df, key)
    touched = diff.select(F.col(key).alias("_tk"))  # added + changed + removed
    fresh_keys = diff.where(F.col("change") != "removed").select(F.col(key).alias("_fk"))
    # null-safe joins: a NULL-key row that changed must drop out of the
    # carry AND re-enter the fresh pass, or the invariant breaks on it
    carried = prev_violations.join(
        touched, prev_violations[key].eqNullSafe(touched["_tk"]), "left_anti"
    )
    fresh = validate(
        new_df.join(fresh_keys, new_df[key].eqNullSafe(fresh_keys["_fk"]), "left_semi"),
        ruleset,
        key=key,
    ).violations
    return carried.unionByName(fresh)
