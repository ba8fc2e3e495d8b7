"""Sketch-store lifecycle: per-day HLL/CMS sketches maintained
incrementally through the real partitioned sink, then rolled up.

This is the piece that turns the sketch operators into a pipeline
component: days arrive one at a time, each day's registers land in the
store via ``upsert_partitioned`` (write cost = one day's <= M rows,
untouched day partitions stay byte-identical), and any later question
(global distinct, rolling windows) is answered from the store WITHOUT
rescanning raw events — the answers must equal a from-scratch sketch of
everything seen so far, by the merge laws pinned in test_hll_unit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators import cms, hll
from options_data_pipeline_spark.sinks.upsert import upsert_partitioned


def _day_events(spark, day: int, users):
    return spark.createDataFrame(
        [(day, f"u{u}") for u in users], "day int, user_id string"
    )


def test_incremental_hll_store_equals_full_recompute(spark, tmp_path):
    store = str(tmp_path / "hll_store")
    all_frames = []
    for day, users in enumerate(
        [range(0, 120), range(60, 200), range(150, 400)]
    ):
        ev = _day_events(spark, day, users)
        all_frames.append(ev)
        regs = hll.hll_registers(ev, "user_id", ["day"])
        metrics = upsert_partitioned(
            spark, store, regs, keys=["day", "bucket"], partition_col="day"
        )
        # day arrives once: everything inserts, nothing rewrites
        assert metrics["updated"] == 0

    stored = spark.read.parquet(store).select("day", "bucket", "reg")
    full = all_frames[0]
    for f in all_frames[1:]:
        full = full.unionByName(f)

    # global estimate from the store == estimate from a fresh sketch
    merged = hll.merge_registers(
        stored.select(F.lit(1).alias("g"), "bucket", "reg"), ["g"]
    )
    [from_store] = hll.hll_estimate(merged, ["g"]).collect()
    fresh_regs = hll.hll_registers(
        full.select(F.lit(1).alias("g"), "user_id"), "user_id", ["g"]
    )
    [from_fresh] = hll.hll_estimate(fresh_regs, ["g"]).collect()
    assert from_store.hll_estimate == from_fresh.hll_estimate
    assert from_store.buckets_seen == from_fresh.buckets_seen


def test_late_data_upsert_merges_registers_monotonically(spark, tmp_path):
    """A late slice for an already-stored day must be max-merged with
    the stored registers BEFORE the upsert (registers are maxes, not
    last-write-wins rows) — the test pins the read-merge-write recipe."""
    store = str(tmp_path / "hll_store")
    first = _day_events(spark, 5, range(100))
    upsert_partitioned(
        spark, store,
        hll.hll_registers(first, "user_id", ["day"]),
        keys=["day", "bucket"], partition_col="day",
    )

    late = _day_events(spark, 5, range(80, 250))
    stored = spark.read.parquet(store).select("day", "bucket", "reg")
    merged_day = hll.merge_registers(
        hll.hll_registers(late, "user_id", ["day"]).unionByName(
            stored.where(F.col("day") == 5)
        ),
        ["day"],
    )
    upsert_partitioned(
        spark, store, merged_day, keys=["day", "bucket"],
        partition_col="day",
    )

    got = {
        (r.bucket, r.reg)
        for r in spark.read.parquet(store)
        .where(F.col("day") == 5)
        .select("bucket", "reg")
        .collect()
    }
    want = {
        (r.bucket, r.reg)
        for r in hll.hll_registers(
            first.unionByName(late), "user_id", ["day"]
        ).select("bucket", "reg").collect()
    }
    assert got == want


def test_incremental_cms_store_sums_to_direct_grid(spark, tmp_path):
    """CMS counters ADD, so late slices must be summed with the stored
    grid; after two waves the store equals a from-scratch build."""
    store = str(tmp_path / "cms_store")
    w1 = spark.createDataFrame(
        [(f"t{i % 19}",) for i in range(500)], "token string"
    ).withColumn("day", F.lit(1))
    upsert_partitioned(
        spark, store, cms.cms_build(w1, "token", ["day"]),
        keys=["day", "r", "c"], partition_col="day",
    )

    w2 = spark.createDataFrame(
        [(f"t{i % 31}",) for i in range(700)], "token string"
    ).withColumn("day", F.lit(1))
    stored = spark.read.parquet(store).select("day", "r", "c", "cnt")
    resummed = cms.cms_merge(
        cms.cms_build(w2, "token", ["day"]).unionByName(stored), ["day"]
    )
    upsert_partitioned(
        spark, store, resummed, keys=["day", "r", "c"], partition_col="day",
    )

    got = {
        (r.r, r.c): r.cnt
        for r in spark.read.parquet(store).select("r", "c", "cnt").collect()
    }
    direct = {
        (r.r, r.c): r.cnt
        for r in cms.cms_build(
            w1.unionByName(w2).select("token"), "token", []
        ).collect()
    }
    assert got == direct
