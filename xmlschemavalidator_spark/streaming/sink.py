"""Streaming violations sink: foreachBatch + epoch-keyed commit log.

The streaming counterpart of manifest.resumable_validate: each micro-batch
writes its violation rows under ``epoch=<batchId>`` (dynamic partition
overwrite → a replayed batch after failure overwrites exactly its own
files) and then commits a metrics marker keyed by (query, batchId) —
write-once, so Structured Streaming's at-least-once foreachBatch contract
becomes effectively-exactly-once for the sink.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmlschemavalidator_spark.compiler import RuleSet
from xmlschemavalidator_spark.engine import validate


class StreamingViolationsSink:
    def __init__(self, ruleset: RuleSet, key: str, out_dir: str):
        self.ruleset = ruleset
        self.key = key
        self.out_dir = out_dir
        self.commits_dir = os.path.join(out_dir, "_commits")
        os.makedirs(self.commits_dir, exist_ok=True)

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"epoch={batch_id}.json")

    def committed_epochs(self) -> set[int]:
        return {
            int(f[len("epoch="):-len(".json")])
            for f in os.listdir(self.commits_dir)
            if f.startswith("epoch=") and f.endswith(".json")
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Replays of an already-committed epoch no-op."""
        if batch_id in self.committed_epochs():
            return
        spark = batch_df.sparkSession
        res = validate(batch_df, self.ruleset, key=self.key)
        viol_path = os.path.join(self.out_dir, "violations")
        (
            res.violations.withColumn("epoch", F.lit(batch_id))
            .write.mode("overwrite")
            # scoped to this writer, not the shared session conf
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(viol_path)
        )
        # metrics from the WRITTEN epoch files (tiny) — the violations plan
        # is the one that ran, so don't re-scan the batch for counts
        written = spark.read.parquet(viol_path).where(F.col("epoch") == batch_id)
        per_rule = {
            f"viol_{r['rule_id']}": r["n"]
            for r in written.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        counts = {
            "n_violations": sum(per_rule.values()),
            "n_failed_docs": written.select(self.key).distinct().count(),
            **per_rule,
        }
        tmp = self._commit_path(batch_id) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id, "committed_at": time.time(), **counts}, fh)
        try:
            os.link(tmp, self._commit_path(batch_id))  # write-once: EEXIST loses
        except OSError:
            pass
        os.unlink(tmp)


def write_violations_stream(
    stream_df: DataFrame,
    ruleset: RuleSet,
    key: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start the streaming validation sink; returns the StreamingQuery."""
    sink = StreamingViolationsSink(ruleset, key, out_dir)
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
