"""streaming/ivm.py: the _bid stamp is load-bearing — replayed
additive maintenance must no-op, and WITHOUT the stamp it provably
double-applies (red control)."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.sinks.upsert import _atomic_replace
from options_data_pipeline_spark.streaming.ivm import ivm_apply_batch


def _setup(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    view_path = str(tmp_path / "view")
    fact0 = spark.createDataFrame(
        [(1, "2024-01-01", "a", 10.0), (2, "2024-01-01", "a", 20.0)],
        "event_id long, day string, event_type string, value double",
    ).withColumn("day", F.col("day").cast("date"))
    fact0.write.parquet(fact_path)
    view0 = fact0.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("sval"),
    ).withColumn("_bid", F.lit(-1))
    _atomic_replace(view0, view_path)
    batch = spark.createDataFrame(
        [(3, "2024-01-01", "a", 5.0, "I", 3)],
        "event_id long, day string, event_type string, value double,"
        " op string, seq long",
    ).withColumn("day", F.col("day").cast("date"))
    return fact_path, view_path, batch


def test_same_id_replay_is_noop(spark, tmp_path):
    fact_path, view_path, batch = _setup(spark, tmp_path)
    ivm_apply_batch(spark, fact_path, view_path, batch, 0)
    once = spark.read.parquet(view_path).collect()
    assert once[0]["cnt"] == 3 and float(once[0]["sval"]) == 35.0
    # at-least-once retry with the same id: must not double-apply
    ivm_apply_batch(spark, fact_path, view_path, batch, 0)
    twice = spark.read.parquet(view_path).collect()
    assert twice[0]["cnt"] == 3 and float(twice[0]["sval"]) == 35.0
    # stale smaller id: also a no-op
    ivm_apply_batch(spark, fact_path, view_path, batch, -1)
    assert spark.read.parquet(view_path).first()["cnt"] == 3


def test_crash_window_replay_advances_fact(spark, tmp_path):
    """ADVICE r11 (high): crash BETWEEN the view swap and the fact
    advance — on replay the view is stamped (skips) but the fact is
    stale; apply_cdc must still run or the batch's CDC rows are lost
    forever and every later retraction computes against a stale fact."""
    fact_path, view_path, batch = _setup(spark, tmp_path)
    # simulate the crash window: commit the view WITH the stamp, but
    # never advance the fact (exactly what a kill between the two
    # writes inside ivm_apply_batch leaves behind)
    view0 = spark.read.parquet(view_path)
    adj = batch.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("d_cnt"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("d_sval"),
    )
    merged = (
        view0.drop("_bid")
        .join(adj, ["event_type", "day"], "full")
        .select(
            "event_type",
            "day",
            (F.coalesce(F.col("cnt"), F.lit(0))
             + F.coalesce(F.col("d_cnt"), F.lit(0))).cast("long").alias("cnt"),
            (F.coalesce(F.col("sval"), F.lit(0).cast("decimal(25,6)"))
             + F.coalesce(F.col("d_sval"), F.lit(0).cast("decimal(25,6)"))
             ).cast("decimal(25,6)").alias("sval"),
        )
        .withColumn("_bid", F.lit(0))
        .localCheckpoint()
    )
    _atomic_replace(merged, view_path)
    assert spark.read.parquet(fact_path).count() == 2  # fact is stale

    # at-least-once replay of the same batch id
    ivm_apply_batch(spark, fact_path, view_path, batch, 0)

    # view untouched (stamped skip) ...
    row = spark.read.parquet(view_path).first()
    assert row["cnt"] == 3 and float(row["sval"]) == 35.0
    # ... but the fact ADVANCED: event 3 is now present
    fact = spark.read.parquet(fact_path)
    assert fact.count() == 3
    assert fact.where(F.col("event_id") == 3).count() == 1
    # and a second replay stays converged (idempotent fact re-apply)
    ivm_apply_batch(spark, fact_path, view_path, batch, 0)
    assert spark.read.parquet(fact_path).count() == 3
    assert spark.read.parquet(view_path).first()["cnt"] == 3


def test_without_stamp_replay_double_applies(spark, tmp_path):
    """Red control: strip the stamp from the committed view and replay
    — the adjustment applies AGAIN, proving the guard (not luck) is
    what makes delivery exactly-once."""
    fact_path, view_path, batch = _setup(spark, tmp_path)
    ivm_apply_batch(spark, fact_path, view_path, batch, 0)
    stripped = (
        spark.read.parquet(view_path)
        .drop("_bid")
        .withColumn("_bid", F.lit(-1))
        .localCheckpoint()
    )
    _atomic_replace(stripped, view_path)
    ivm_apply_batch(spark, fact_path, view_path, batch, 0)
    row = spark.read.parquet(view_path).first()
    # event 3 already in fact -> the replayed I re-adds its contribution
    assert row["cnt"] == 4 and float(row["sval"]) == 40.0


def test_join_ivm_partial_crash_replay_converges(spark, tmp_path):
    """Multi-store commit: simulate a crash BETWEEN the agg swap and
    the view swap (agg stamped, view not), then replay the batch — the
    replay must skip the agg, apply the view, and converge to the
    no-crash outcome."""
    from options_data_pipeline_spark.streaming.ivm import (
        join_ivm_apply_batch,
    )

    fact_path = str(tmp_path / "fact")
    agg_path = str(tmp_path / "agg")
    view_path = str(tmp_path / "view")
    dim_path = str(tmp_path / "dim")
    fact0 = spark.createDataFrame(
        [(1, "2024-01-01", "aa", 10.0), (2, "2024-01-01", "bbb", 20.0)],
        "event_id long, day string, event_type string, value double",
    ).withColumn("day", F.col("day").cast("date"))
    fact0.write.parquet(fact_path)
    dim0 = spark.createDataFrame(
        [("aa", "G2"), ("bbb", "G0")], "event_type string, grp string"
    )
    _atomic_replace(dim0, dim_path)
    agg0 = fact0.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("sval"),
    ).withColumn("_bid", F.lit(-1))
    _atomic_replace(agg0, agg_path)
    view0 = (
        agg0.join(dim0, "event_type")
        .groupBy("grp", "day")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sval").cast("decimal(25,6)").alias("sval"),
        )
        .withColumn("_bid", F.lit(-1))
    )
    _atomic_replace(view0, view_path)
    batch = spark.createDataFrame(
        [(3, "2024-01-01", "aa", 5.0, "I", 3)],
        "event_id long, day string, event_type string, value double,"
        " op string, seq long",
    ).withColumn("day", F.col("day").cast("date"))

    # full apply on a COPY to get the no-crash expectation
    import shutil as _sh

    for p_src, p_dst in ((agg_path, agg_path + "_ref"),
                         (view_path, view_path + "_ref"),
                         (fact_path, fact_path + "_ref")):
        _sh.copytree(p_src, p_dst)
    join_ivm_apply_batch(
        spark, fact_path + "_ref", agg_path + "_ref",
        view_path + "_ref", dim_path, batch, 0,
    )
    expect = {
        (r["grp"], str(r["day"])): (r["cnt"], float(r["sval"]))
        for r in spark.read.parquet(view_path + "_ref").collect()
    }

    # simulate the crash: advance ONLY the agg store (stamped), leave
    # the view unstamped, fact unadvanced — then replay the same batch
    from options_data_pipeline_spark.streaming.ivm import (
        _merge_adj_stamped,
    )

    d_agg = spark.createDataFrame(
        [("aa", "2024-01-01", 1, 5.0)],
        "event_type string, day string, d_cnt long, d_sval double",
    ).select(
        "event_type",
        F.col("day").cast("date").alias("day"),
        F.col("d_cnt"),
        F.col("d_sval").cast("decimal(25,6)").alias("d_sval"),
    )
    _merge_adj_stamped(spark, agg_path, d_agg, ["event_type", "day"], 0)
    join_ivm_apply_batch(
        spark, fact_path, agg_path, view_path, dim_path, batch, 0
    )
    got = {
        (r["grp"], str(r["day"])): (r["cnt"], float(r["sval"]))
        for r in spark.read.parquet(view_path).collect()
    }
    assert got == expect
    # agg wasn't double-applied either
    agg_rows = {
        r["event_type"]: r["cnt"]
        for r in spark.read.parquet(agg_path).collect()
    }
    assert agg_rows["aa"] == 2 and agg_rows["bbb"] == 1
