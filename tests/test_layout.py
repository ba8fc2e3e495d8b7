"""Layout sinks: range-sorted rewrite and partition compaction are pure
physical rewrites — identical content, asserted layout properties."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.sinks.layout import (
    compact_partitions,
    write_range_sorted,
)
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture
def tmp(tmp_path):
    return str(tmp_path)


def test_write_range_sorted_files_are_disjoint_and_sorted(spark, tmp):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "value")
    out = f"{tmp}/events_sorted"
    write_range_sorted(ev, out, ["ts", "event_id"], num_files=4)

    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) == 4

    # same content as the source (pure physical rewrite)
    assert spark.read.parquet(out).count() == ev.count()
    assert (
        spark.read.parquet(out)
        .union(ev)
        .groupBy("event_id", "ts", "value")
        .count()
        .where(F.col("count") != 2)
        .count()
        == 0
    )

    # per-file (min, max) ts ranges are pairwise disjoint, rows sorted
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).select("ts", "event_id").toPandas()
        assert list(pdf.itertuples(index=False)) == sorted(
            pdf.itertuples(index=False)
        ), f"rows not sorted within {f}"
        ranges.append((pdf["ts"].min(), pdf["ts"].max()))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, "file key ranges overlap"


def test_compact_partitions_reduces_files_keeps_content(spark, tmp):
    t = f"{tmp}/t"
    df = spark.createDataFrame(
        [(i, f"d{i % 2}", float(i)) for i in range(100)], "k long, d string, v double"
    )
    # fragment: 8 files per partition
    df.repartition(8).write.partitionBy("d").mode("overwrite").parquet(t)
    # materialize eagerly: the compaction below replaces the files this
    # DataFrame's listing points at
    rows_before = {(r.k, r.d, r.v) for r in spark.read.parquet(t).collect()}

    metrics = compact_partitions(spark, t, "d", partitions=["d0"], files_per_partition=1)
    assert metrics["partitions_compacted"] == 1
    assert metrics["files_after"] < metrics["files_before"]
    d0 = os.path.join(t, "d=d0")
    assert len([f for f in os.listdir(d0) if f.endswith(".parquet")]) == 1
    # untouched partition keeps its fragmentation
    d1 = os.path.join(t, "d=d1")
    assert len([f for f in os.listdir(d1) if f.endswith(".parquet")]) > 1

    rows_after = {(r.k, r.d, r.v) for r in spark.read.parquet(t).collect()}
    assert rows_after == rows_before
