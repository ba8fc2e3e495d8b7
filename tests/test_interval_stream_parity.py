"""Stream-equals-batch for interval coverage: the batch gaps-and-islands
query (`q_interval_coverage`, 5-minute presence intervals with overlap
merge) must agree exactly with Spark's native streaming
``session_window`` aggregation at the same 5-minute gap — an island IS
a session window (end = last event + gap), so the two independently
derived implementations pin each other.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.plans.quality import q_interval_coverage
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_streaming_session_windows_match_batch_islands(spark, tmp):
    src = f"{tmp}/events_src"
    load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    ).coalesce(2).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sessions = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("st"),
            F.unix_micros(F.col("session_window.end")).alias("en"),
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("cover_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r.user_id, r.n_islands, r.covered_us)
        for r in spark.sql(
            "SELECT user_id, count(*) AS n_islands,"
            " CAST(sum(en - st) AS BIGINT) AS covered_us"
            " FROM cover_sessions GROUP BY user_id"
        ).collect()
    }
    batch = {
        (r.user_id, r.n_islands, r.covered_us)
        for r in q_interval_coverage(spark, SF_DIR).collect()
    }
    assert streamed == batch
    assert len(batch) > 0
