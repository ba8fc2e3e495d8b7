"""Stream-equals-batch for the clamped balance: the streaming
applyInPandasWithState fold across micro-batches must land on exactly
the balances the batch clamped_running_sum computes over the union of
all slices (in-order source contract)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.statefold import clamped_running_sum
from options_data_pipeline_spark.streaming.balance import running_balance


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


SCHEMA = "event_id long, ts string, user_id long, event_type string, value double"

SLICE1 = [
    (0, "2024-01-01 10:00:00", 1, "view", 100.0),
    (1, "2024-01-01 10:05:00", 1, "purchase", 450.01),   # clamps at 500
    (2, "2024-01-01 10:10:00", 2, "error", 30.0),        # clamps at 0
    (3, "2024-01-01 10:15:00", 2, "click", 12.34),
]
SLICE2 = [
    (4, "2024-01-01 11:00:00", 1, "error", 650.0),       # 500 -> 0
    (5, "2024-01-01 11:05:00", 1, "view", 20.555),       # half-away cents
    (6, "2024-01-01 11:10:00", 3, "view", 7.0),          # new key mid-stream
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _run_wave(spark, src, tmp):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    updates = f"{tmp}/updates"

    def sink(bdf, bid):
        bdf.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(updates)

    q = (
        running_balance(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
    rows = spark.read.parquet(updates).collect()
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.batch_id > latest[r.user_id].batch_id:
            latest[r.user_id] = r
    return {u: (r.balance, r.n_events) for u, r in latest.items()}


def _batch_final(spark, rows):
    ev = _df(spark, rows)
    cents = F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)).cast("long")
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    src = ev.select("user_id", "ts", "event_id", (cents * sign).alias("delta"))
    out = clamped_running_sum(
        src, keys=["user_id"], order=["ts", "event_id"],
        delta_col="delta", lo=0, hi=50_000, divisor=100.0, out_col="balance",
    )
    # final balance per user = balance of the last (ts, event_id) row
    last = out.groupBy("user_id").agg(
        F.max_by("balance", F.struct("ts", "event_id")).alias("balance"),
        F.count(F.lit(1)).alias("n"),
    )
    return {r.user_id: (r.balance, r.n) for r in last.collect()}


def test_stream_equals_batch_across_waves(spark, tmp):
    src = f"{tmp}/src"
    _df(spark, SLICE1).coalesce(1).write.mode("append").parquet(src)
    g1 = _run_wave(spark, src, tmp)
    assert g1 == _batch_final(spark, SLICE1)
    # saturation checks: u1 clamped at hi, u2 bounced off lo
    assert g1[1] == (500.0, 2)
    assert g1[2] == (12.34, 2)

    _df(spark, SLICE2).coalesce(1).write.mode("append").parquet(src)
    g2 = _run_wave(spark, src, tmp)
    assert g2 == _batch_final(spark, SLICE1 + SLICE2)
    # u1: clamp at 0 then +20.56 (half-away on .555)
    assert g2[1] == (20.56, 4)
    assert g2[3] == (7.0, 1)


def test_multi_chunk_batch_folds_in_global_ts_order(spark, tmp):
    """ADVICE r3 (medium): a key's rows spanning multiple Arrow chunks
    must fold in global (ts, event_id) order, not per-chunk. Rows arrive
    REVERSED with maxRecordsPerBatch=5, so a per-chunk sort would fold
    the newest chunk first and land on $400.00 instead of $410.00."""
    rows = [
        (1, "2024-01-01 10:00:00", 9, "purchase", 600.0),  # clamp at 500
        (2, "2024-01-01 10:01:00", 9, "error", 100.0),     # -> 400
    ] + [
        (i, f"2024-01-01 10:{i:02d}:00", 9, "view", 1.0)   # +1 x10 -> 410
        for i in range(3, 13)
    ]
    src = f"{tmp}/src"
    _df(spark, list(reversed(rows))).coalesce(1).write.parquet(src)
    original = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
        got = _run_wave(spark, src, tmp)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", original
        )
    assert got == _batch_final(spark, rows)
    assert got[9] == (410.0, 12)
