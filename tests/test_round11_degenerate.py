"""Round-11 degenerate-input pins: the new operators must behave, not
crash, at the edges — k larger than the group, empty deltas, a probe
set with no present keys, single-row groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.reservoir import (
    reservoir_bottom_k,
    rsv_priority,
)


def test_reservoir_k_exceeds_group_size(spark):
    """k > |group|: the reservoir IS the group, ranks dense from 1."""
    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("h", 3)], "k string, id long"
    ).withColumn("p", rsv_priority(F.col("id")))
    out = reservoir_bottom_k(df, ["k"], "p", "id", k=10).collect()
    by_g = sorted(r["rank"] for r in out if r["k"] == "g")
    assert by_g == [1, 2]
    assert sorted(r["rank"] for r in out if r["k"] == "h") == [1]


def test_reservoir_single_row_groups(spark):
    df = spark.createDataFrame(
        [(str(i), i) for i in range(5)], "k string, id long"
    ).withColumn("p", rsv_priority(F.col("id")))
    out = reservoir_bottom_k(df, ["k"], "p", "id", k=3).collect()
    assert len(out) == 5 and all(r["rank"] == 1 for r in out)


def test_ivm_empty_batch_is_noop(spark, tmp_path):
    """An empty CDC micro-batch must leave the view untouched (and
    still stamp nothing destructive)."""
    from options_data_pipeline_spark.sinks.upsert import _atomic_replace
    from options_data_pipeline_spark.streaming.ivm import ivm_apply_batch

    fact_path = str(tmp_path / "fact")
    view_path = str(tmp_path / "view")
    fact0 = spark.createDataFrame(
        [(1, "2024-01-01", "a", 10.0)],
        "event_id long, day string, event_type string, value double",
    ).withColumn("day", F.col("day").cast("date"))
    fact0.write.parquet(fact_path)
    view0 = fact0.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("sval"),
    ).withColumn("_bid", F.lit(-1))
    _atomic_replace(view0, view_path)
    empty = spark.createDataFrame(
        [],
        "event_id long, day date, event_type string, value double,"
        " op string, seq long",
    )
    ivm_apply_batch(spark, fact_path, view_path, empty, 0)
    row = spark.read.parquet(view_path).first()
    assert row["cnt"] == 1 and float(row["sval"]) == 10.0


def test_compact_partitions_empty_table_dir(spark, tmp_path):
    """A store directory with no matching partitions compacts to a
    zero-stat no-op, not a crash."""
    from options_data_pipeline_spark.sinks.layout import compact_partitions

    store = str(tmp_path / "t")
    spark.createDataFrame([("x", 1)], "p string, v long").write.partitionBy(
        "p"
    ).parquet(store)
    stats = compact_partitions(
        spark, store, "p", partitions=["nonexistent"], rows_per_file=10
    )
    assert stats["partitions_compacted"] == 0


def test_weighted_priority_rejects_nothing_but_orders_heavy_first(spark):
    """Two rows with identical hash inputs but different weights: the
    heavier row must carry the smaller (winning) priority."""
    from options_data_pipeline_spark.operators.reservoir import (
        rsv_weighted_priority,
    )

    df = spark.createDataFrame(
        [(7, 1), (7, 100)], "id long, w long"
    ).select(
        "w",
        rsv_weighted_priority(F.col("id"), F.col("w")).alias("wp"),
    )
    rows = {r["w"]: r["wp"] for r in df.collect()}
    assert rows[100] < rows[1]
