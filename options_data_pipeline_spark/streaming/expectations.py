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
- the report append is idempotent per batch id: re-processing a batch
  after restart overwrites its own rows (delete-matching-batch-then-
  append under a local FS; a Delta sink would MERGE on batch_id).
"""

from __future__ import annotations

import os
import shutil
import uuid

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
        # idempotent re-process: drop any previous rows for this batch.
        # Swap discipline mirrors sinks/upsert._atomic_replace — staging
        # renamed IN, old renamed ASIDE then deleted; a crash never
        # leaves a window with no log directory (review r4)
        spark = bdf.sparkSession
        if os.path.exists(log_path):
            existing = spark.read.parquet(log_path)
            kept = existing.where(F.col("batch_id") != int(batch_id))
            if kept.count() != existing.count():
                staging = f"{log_path}.staging-{uuid.uuid4().hex[:8]}"
                kept.write.mode("overwrite").parquet(staging)
                old = f"{log_path}.old-{uuid.uuid4().hex[:8]}"
                os.rename(log_path, old)
                os.rename(staging, log_path)
                shutil.rmtree(old)
        report.write.mode("append").parquet(log_path)

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
