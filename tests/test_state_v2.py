"""transformWithState (Spark 4 StatefulProcessor): running totals
persist across micro-batches and equal the batch aggregate. Skipped
where protobuf (the state-server protocol dependency) is absent; the
no-protobuf guard itself is asserted unconditionally."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_running_totals_match_batch_aggregate(spark, tmp):
    from options_data_pipeline_spark.streaming import state_v2
    from options_data_pipeline_spark.streaming.state_v2 import running_totals

    if not state_v2.HAS_PROTOBUF:
        pytest.skip("google.protobuf not installed")

    src = f"{tmp}/src"
    rows1 = [(1, "click", 1.5), (2, "view", 2.0), (3, "click", 0.5)]
    rows2 = [(4, "click", 1.0), (5, "purchase", 9.0)]
    schema = "event_id long, event_type string, value double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("rt")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode emits one row per (key, batch); the LAST emission per
    # key is the running total — compare against the batch aggregate
    emitted = spark.sql("SELECT * FROM rt").collect()
    last = {}
    for r in emitted:  # memory sink appends in batch order
        last[r.event_type] = (r.n_events, r.value_total)
    batch = {
        r.event_type: (r.n, r.tot)
        for r in spark.createDataFrame(rows1 + rows2, schema)
        .groupBy("event_type")
        .agg(F.count("value").alias("n"), F.sum("value").alias("tot"))
        .collect()
    }
    assert last == batch
    assert last["click"] == (3, 3.0)


def test_missing_protobuf_raises_clearly(spark):
    from options_data_pipeline_spark.streaming import state_v2

    if state_v2.HAS_PROTOBUF:
        pytest.skip("protobuf installed")
    stream = spark.readStream.format("rate").load()
    with pytest.raises(NotImplementedError, match="protobuf"):
        state_v2.running_totals(
            stream.selectExpr("'x' AS event_type", "CAST(value AS DOUBLE)")
        )
