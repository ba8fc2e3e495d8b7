"""Structured Streaming maintenance of mergeable sketch stores.

Batch pipelines rebuild sketches per run; a streaming ingest should
keep them CURRENT: every micro-batch folds its slice into the stored
per-day registers, so "distinct users today / this week" is always one
cheap merge away — no rescan of the raw stream, ever.  The merge laws
(max for HLL registers, add for CMS counters — pinned in
tests/test_hll_unit.py and tests/test_sketch_store.py) make the result
ORDER-INVARIANT: however the stream is chopped into micro-batches,
and whenever late rows arrive, the store converges to exactly the
sketch of everything seen.  That is a stronger replay story than the
candle MERGE (:mod:`candles`), which must re-read the source for
touched buckets; sketches fold forward from the batch alone plus the
<= M stored rows per touched day.

foreachBatch + partitioned upsert (not a watermarked stateful agg): the
register max is an order statistic over the whole history of a bucket,
which update-mode state would have to hold per (day, bucket) anyway —
the store IS that state, checkpointed as a queryable table, and the
write cost per trigger is the touched days' <= M rows
(``upsert_partitioned`` leaves untouched day partitions byte-identical
— the same T2 write-cost contract as the gold candle table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.hll import hll_registers, merge_registers
from ..sinks.upsert import upsert_partitioned
from .candles import read_event_stream


def _merge_batch_into_store(
    spark: SparkSession,
    store_path: str,
    batch_regs: DataFrame,
) -> None:
    """Max-merge a batch's (day, bucket, reg) rows with the stored
    registers of the SAME days, then partition-pruned upsert.  Reading
    the store filtered to the batch's days is partition pruning on the
    day-partitioned store — per-trigger read cost follows the slice."""
    # _read_target distinguishes a genuine cold start (None) from a real
    # read error (propagates) — swallowing the latter would fold the
    # batch into an EMPTY store and upsert, silently resetting the
    # touched days' registers (the ADVICE-r3 lesson the sinks encode)
    from ..sinks.upsert import _read_target

    target = _read_target(spark, store_path)
    if target is None:
        merged = batch_regs
    else:
        stored = target.select("day", "bucket", "reg").join(
            batch_regs.select("day").distinct(), "day"
        )
        merged = merge_registers(batch_regs.unionByName(stored), ["day"])
    upsert_partitioned(
        spark,
        store_path,
        merged,
        keys=["day", "bucket"],
        partition_col="day",
    )


def hll_register_stream(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Maintain a per-day HLL register store from an event stream.

    Exactly-once story: the register merge is IDEMPOTENT (max of a max
    is the max), so a replayed micro-batch converges instead of
    double-counting — the property that lets this sink survive the
    at-least-once delivery foreachBatch gives over non-transactional
    stores."""
    stream = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(key_col),
        )
        regs = hll_registers(ev, key_col, ["day"])
        _merge_batch_into_store(spark, store_path, regs)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _add_merge_batch_into_store(
    spark: SparkSession,
    store_path: str,
    batch_grid: DataFrame,
) -> None:
    """ADD-merge a batch's (day, r, c, cnt) CMS cells with the stored
    grid rows of the SAME days, then partition-pruned upsert.  Unlike
    the HLL max (idempotent), counter addition is NOT replay-idempotent
    by itself — exactly-once here rides on foreachBatch's batch-id
    semantics over the checkpointed source offsets: a retried batch
    re-reads the same slice and the upsert's atomic swap makes the
    previous partial write invisible (the staged partition either
    committed or it didn't)."""
    from ..sinks.upsert import _read_target

    target = _read_target(spark, store_path)
    if target is None:
        merged = batch_grid
    else:
        stored = target.select("day", "r", "c", "cnt").join(
            batch_grid.select("day").distinct(), "day"
        )
        merged = (
            batch_grid.unionByName(stored)
            .groupBy("day", "r", "c")
            .agg(F.sum("cnt").alias("cnt"))
        )
    upsert_partitioned(
        spark,
        store_path,
        merged,
        keys=["day", "r", "c"],
        partition_col="day",
    )


def cms_register_stream(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Maintain a per-day Count-Min grid store from an event stream.

    The counter-addition merge law makes the converged store equal the
    batch grid of everything seen, however the stream was chopped into
    micro-batches and whenever late rows arrived (stream ≡ batch pinned
    in tests/test_streaming_sketches.py).  Per-trigger write cost is the
    touched days' <= D*W grid rows; the consumer side
    (:func:`..plans.stores.cms_week_topk_consumer`) answers top-k
    questions from the store alone."""
    from ..operators.cms import cms_build

    stream = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(key_col),
        )
        grid = cms_build(ev, key_col, ["day"])
        _add_merge_batch_into_store(spark, store_path, grid)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
