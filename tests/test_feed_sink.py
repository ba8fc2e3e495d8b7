"""Streaming feed sink (DataSourceStreamWriter): two-phase commit over
a non-transactional destination — staged files invisible until the
driver commit manifests them; counts exact; restart appends the next
batch under its own manifest."""

from __future__ import annotations

import json
import os

from options_data_pipeline_spark.sinks.feed_sink import (
    FeedSinkDataSource,
    read_committed,
)


def test_stream_write_commits_manifested_batches(spark, tmp_path):
    spark.dataSource.register(FeedSinkDataSource)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batch(rows):
        spark.createDataFrame(
            rows, "k long, v string"
        ).coalesce(2).write.mode("append").parquet(src)
        stream = spark.readStream.schema("k long, v string").parquet(src)
        q = (
            stream.writeStream.format("feedsink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([(1, "a"), (2, "b"), (3, "c")])
    got = sorted((r["k"], r["v"]) for r in read_committed(out))
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # no stray staging files survive a committed batch
    assert not [f for f in os.listdir(out) if f.startswith(".staging-")]
    manifests = [f for f in os.listdir(out) if f.endswith(".manifest")]
    assert len(manifests) == 1
    assert sum(m["rows"] for m in json.load(open(os.path.join(out, manifests[0])))) == 3

    # restart on the same checkpoint: only NEW source rows are delivered
    run_batch([(4, "d")])
    got = sorted((r["k"], r["v"]) for r in read_committed(out))
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert len([f for f in os.listdir(out) if f.endswith(".manifest")]) == 2


def test_failed_batch_leaves_nothing_visible(spark, tmp_path):
    """A micro-batch that fails mid-write must leave NO manifest and no
    committed files — the abort path of the two-phase commit."""
    import pyspark.sql.functions as F

    spark.dataSource.register(FeedSinkDataSource)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a"), (0, "boom")], "k long, v string"
    ).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("k long, v string")
        .parquet(src)
        # assert_true blows up on the poisoned row inside the batch
        # (1/0 would be NULL here: the engine pins ANSI off)
        .withColumn("__guard", F.expr("assert_true(k <> 0, 'poison')"))
    )
    q = (
        stream.writeStream.format("feedsink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    failed = False
    try:
        q.awaitTermination(120)
    except Exception:
        failed = True
    assert failed or q.exception() is not None
    assert read_committed(out) == []
    assert not [
        f for f in os.listdir(out) if f.endswith(".manifest")
    ] if os.path.exists(out) else True
