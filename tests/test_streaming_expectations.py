"""Streaming contract evaluation: per-batch reports match the batch
evaluator on the same slice, and re-processing a batch is idempotent."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.expectations import (
    check,
    in_range,
    not_null,
    unique,
)
from options_data_pipeline_spark.streaming.expectations import (
    expectations_stream,
)


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


RULES_FACTORY = lambda: [  # noqa: E731
    not_null("v"),
    in_range("v", 0.0, 100.0),
    unique("k"),
]

SCHEMA = "k int, v double"
WAVE1 = [(1, 5.0), (2, None), (2, 250.0)]
WAVE2 = [(7, 50.0), (8, 50.0)]


def _run(spark, src, tmp):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = expectations_stream(
        stream, RULES_FACTORY(), f"{tmp}/log", f"{tmp}/ckpt"
    )
    if not q.awaitTermination(120):
        q.stop()


def test_stream_report_matches_batch_on_each_slice(spark, tmp):
    src = f"{tmp}/src"
    spark.createDataFrame(WAVE1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tmp)
    log = spark.read.parquet(f"{tmp}/log")
    got = {
        r.rule: (r.total_rows, r.violations, r.passed)
        for r in log.where(F.col("batch_id") == 0).collect()
    }
    expect = {
        r.rule: (r.total_rows, r.violations, r.passed)
        for r in check(
            spark.createDataFrame(WAVE1, SCHEMA), RULES_FACTORY()
        ).collect()
    }
    assert got == expect
    assert got["not_null(v)"] == (3, 1, False)
    assert got["unique(k)"] == (3, 2, False)

    # second wave appends its own batch rows; batch-0 rows untouched
    spark.createDataFrame(WAVE2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tmp)
    log = spark.read.parquet(f"{tmp}/log")
    assert log.select("batch_id").distinct().count() == 2
    b1 = {
        r.rule: (r.total_rows, r.violations, r.passed)
        for r in log.where(F.col("batch_id") == 1).collect()
    }
    assert all(v[2] for v in b1.values())  # wave 2 is clean


def test_reprocessing_a_batch_is_idempotent(spark, tmp):
    src = f"{tmp}/src"
    spark.createDataFrame(WAVE1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tmp)
    # same checkpoint replays nothing; a FRESH checkpoint re-scores the
    # same files as batch 0 — the log must not grow duplicate rows
    shutil.rmtree(f"{tmp}/ckpt")
    _run(spark, src, tmp)
    log = spark.read.parquet(f"{tmp}/log")
    assert log.count() == 3  # one row per rule, once


def test_legacy_flat_log_fails_fast(spark, tmp):
    """ADVICE r6: a pre-r4 flat-layout log (data files at the root, no
    batch_id= partition dirs) must be rejected at stream attach, not
    silently mixed with partitioned writes."""
    src = f"{tmp}/src"
    spark.createDataFrame(WAVE1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    # forge a legacy log: flat parquet with batch_id as a data column
    spark.createDataFrame(
        [("not_null(v)", 3, 1, False, 0)],
        "rule string, total_rows long, violations long, passed boolean, batch_id long",
    ).coalesce(1).write.parquet(f"{tmp}/log")
    with pytest.raises(ValueError, match="legacy flat layout"):
        _run(spark, src, tmp)


def test_read_quality_log_restores_long_batch_id(spark, tmp):
    """Partition-column inference narrows batch_id to int on read-back;
    the reader helper restores the write-side long."""
    from options_data_pipeline_spark.streaming.expectations import (
        read_quality_log,
    )

    src = f"{tmp}/src"
    spark.createDataFrame(WAVE1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tmp)
    log = read_quality_log(spark, f"{tmp}/log")
    assert dict(log.dtypes)["batch_id"] == "bigint"
    assert log.count() == 3
