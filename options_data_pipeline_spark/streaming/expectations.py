"""Streaming table contracts: the expectations evaluator per micro-batch.

The batch form (``operators/expectations.py``) gates a publish step; the
streaming form is what a continuously-ingesting pipeline deploys: every
micro-batch is scored against the SAME declarative rule set inside
``foreachBatch``, and the per-rule report — stamped with the batch id —
appends to a quality-log parquet table. A monitor tails that log; a
breached rule in batch N points at exactly the slice to quarantine
(re-ingesting the batch is the T2 lookback recompute).

Design notes:
- the rules are evaluated on the BATCH ONLY (violations are per-slice,
  so alerts localize); cross-batch invariants (e.g. global key
  uniqueness) belong to the batch contract over the standing table, not
  the stream;
- the report append is idempotent per batch id: the log is PARTITIONED
  by batch_id and each batch dynamic-partition-overwrites only its own
  partition. No read, count, or rewrite of the rest of the log ever
  happens, so per-batch overhead stays O(|rules|) for the stream's whole
  lifetime (ADVICE r4: the previous delete-then-append rewrote the
  monotonically-growing log on every reprocess and ran two full counts
  per batch). A Delta sink would MERGE on batch_id instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import Rule, check


def expectations_stream(
    stream: DataFrame,
    rules: list[Rule],
    log_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Attach the contract evaluator to ``stream``; returns the started
    StreamingQuery. The quality log at ``log_path`` gains one row per
    (batch_id, rule)."""

    def score_batch(bdf: DataFrame, batch_id: int) -> None:
        report = check(bdf, rules).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        # idempotent re-process without touching the rest of the log:
        # dynamic partition overwrite replaces ONLY the batch_id=N
        # partition this report belongs to (first processing creates it,
        # reprocessing after restart overwrites it in place)
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(log_path)
        )

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
