"""Streaming HLL register-store maintenance: order-invariance and
replay convergence (options_data_pipeline_spark/streaming/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.hll import (
    hll_estimate,
    hll_registers,
    merge_registers,
)
from options_data_pipeline_spark.streaming.sketches import (
    hll_register_stream,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u) for i, (ts, u) in enumerate(rows)],
        "event_id long, ts string, user_id string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")


def _store(spark, path):
    return {
        (str(r.day), r.bucket, r.reg)
        for r in spark.read.parquet(path)
        .select("day", "bucket", "reg")
        .collect()
    }


def _expected(spark, src):
    full = spark.read.parquet(src).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return {
        (str(r.day), r.bucket, r.reg)
        for r in hll_registers(full, "user_id", ["day"]).collect()
    }


def test_stream_store_converges_with_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    wave1 = [("2024-01-01 10:00:00", f"u{i}") for i in range(120)] + [
        ("2024-01-02 09:00:00", f"u{i}") for i in range(60, 220)
    ]
    _events(spark, wave1).coalesce(1).write.mode("append").parquet(src)
    hll_register_stream(spark, src, store, ckpt).awaitTermination(120)
    assert _store(spark, store) == _expected(spark, src)

    # T2 write-cost contract: wave 2 touches day 1 (late) and day 3
    # (new) — day 2's partition must survive byte-for-byte
    import os

    def _snapshot(root):
        out = {}
        for dirpath, _, names in os.walk(root):
            for n in names:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, root)] = (
                    os.path.getmtime(p),
                    os.path.getsize(p),
                )
        return out

    before = _snapshot(store)
    day2 = {k: v for k, v in before.items() if "day=2024-01-02" in k}
    assert day2, "register store is not day-partitioned"

    # late rows for day 1 + a brand-new day 3
    wave2 = [("2024-01-01 23:00:00", f"u{i}") for i in range(100, 400)] + [
        ("2024-01-03 08:00:00", f"w{i}") for i in range(50)
    ]
    _events(spark, wave2).coalesce(1).write.mode("append").parquet(src)
    hll_register_stream(spark, src, store, ckpt).awaitTermination(120)
    assert _store(spark, store) == _expected(spark, src)
    day2_after = {
        k: v
        for k, v in _snapshot(store).items()
        if "day=2024-01-02" in k
    }
    assert day2_after == day2, "untouched day partition was rewritten"

    # restart with nothing new: unchanged (T1/T5 replay story)
    before = _store(spark, store)
    hll_register_stream(spark, src, store, ckpt).awaitTermination(120)
    assert _store(spark, store) == before

    # the question the store exists for: global distinct without rescan
    regs = spark.read.parquet(store).select(
        F.lit(1).alias("g"), "bucket", "reg"
    )
    [got] = hll_estimate(merge_registers(regs, ["g"]), ["g"]).collect()
    full = spark.read.parquet(src).select(F.lit(1).alias("g"), "user_id")
    [want] = hll_estimate(
        hll_registers(full, "user_id", ["g"]), ["g"]
    ).collect()
    assert got.hll_estimate == want.hll_estimate


def test_stream_store_is_chop_invariant(spark, tmp_path):
    """maxFilesPerTrigger=1 chops the same data into several
    micro-batches — the store must equal the single-batch build."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    for wave in range(3):
        rows = [
            ("2024-01-01 10:00:00", f"u{i}")
            for i in range(wave * 80, wave * 80 + 140)
        ]
        _events(spark, rows).coalesce(1).write.mode("append").parquet(src)
    hll_register_stream(
        spark, src, store, ckpt, max_files_per_trigger=1
    ).awaitTermination(180)
    assert _store(spark, store) == _expected(spark, src)


def test_cms_stream_store_equals_batch_grid(spark, tmp_path):
    """CMS counter store: ADD-merge across micro-batch waves converges
    to the batch grid of everything seen (stream ≡ batch), late data
    included, with untouched day partitions byte-identical (T2)."""
    import os

    from options_data_pipeline_spark.operators.cms import cms_build
    from options_data_pipeline_spark.streaming.sketches import (
        cms_register_stream,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def grid_of(path):
        full = spark.read.parquet(path).select(
            F.to_date("ts").alias("day"), "user_id"
        )
        return {
            (str(r.day), r.r, r.c, r.cnt)
            for r in cms_build(full, "user_id", ["day"]).collect()
        }

    def stored():
        return {
            (str(r.day), r.r, r.c, r.cnt)
            for r in spark.read.parquet(store)
            .select("day", "r", "c", "cnt")
            .collect()
        }

    wave1 = [("2024-01-01 10:00:00", f"u{i % 40}") for i in range(200)] + [
        ("2024-01-02 09:00:00", f"u{i % 25}") for i in range(150)
    ]
    _events(spark, wave1).coalesce(1).write.mode("append").parquet(src)
    assert cms_register_stream(spark, src, store, ckpt).awaitTermination(120)
    assert stored() == grid_of(src)

    def _snapshot(root):
        out = {}
        for dirpath, _, names in os.walk(root):
            for n in names:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, root)] = (
                    os.path.getmtime(p), os.path.getsize(p),
                )
        return out

    day2 = {
        k: v for k, v in _snapshot(store).items() if "day=2024-01-02" in k
    }
    assert day2, "CMS store is not day-partitioned"

    # late adds for day 1 + a new day 3: counters ADD, day 2 untouched
    wave2 = [("2024-01-01 23:00:00", f"u{i % 40}") for i in range(80)] + [
        ("2024-01-03 08:00:00", f"w{i}") for i in range(30)
    ]
    _events(spark, wave2).coalesce(1).write.mode("append").parquet(src)
    assert cms_register_stream(spark, src, store, ckpt).awaitTermination(120)
    assert stored() == grid_of(src)
    day2_after = {
        k: v for k, v in _snapshot(store).items() if "day=2024-01-02" in k
    }
    assert day2_after == day2, "untouched day partition was rewritten"

    # restart with nothing new: counters must NOT double (the add-merge
    # is driven by new offsets only)
    before = stored()
    assert cms_register_stream(spark, src, store, ckpt).awaitTermination(120)
    assert stored() == before


def test_cms_apply_batch_replay_is_exactly_once(spark, tmp_path):
    """ADVICE r8 medium: foreachBatch is at-least-once — a committed-
    then-replayed batch must NOT double its counters. The per-day _bid
    marker (stamped in the same partition swap as the counters) makes a
    same-id retry and a stale smaller-id replay both no-ops."""
    from options_data_pipeline_spark.operators.cms import cms_build
    from options_data_pipeline_spark.streaming.sketches import cms_apply_batch

    store = str(tmp_path / "store")
    slices = [
        _events(
            spark,
            [("2024-01-0%d 10:00:00" % (1 + i % 2), f"u{i + 37 * b}")
             for i in range(60)],
        )
        for b in range(3)
    ]
    for bid, sl in enumerate(slices):
        cms_apply_batch(spark, store, sl, bid)

    def stored():
        return {
            (str(r.day), r.r, r.c, r.cnt)
            for r in spark.read.parquet(store)
            .select("day", "r", "c", "cnt")
            .collect()
        }

    once = stored()
    # exactly-once reference: one grid over the union of all slices
    full = slices[0].unionByName(slices[1]).unionByName(slices[2]).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    expected = {
        (str(r.day), r.r, r.c, r.cnt)
        for r in cms_build(full, "user_id", ["day"]).collect()
    }
    assert once == expected
    # at-least-once retry of the LAST batch (same id, same slice)
    cms_apply_batch(spark, store, slices[2], 2)
    assert stored() == expected
    # stale out-of-order replay of an EARLIER batch
    cms_apply_batch(spark, store, slices[1], 1)
    assert stored() == expected
    # a genuinely NEW batch still folds in
    cms_apply_batch(spark, store, slices[0].withColumn(
        "user_id", F.concat(F.lit("x"), "user_id")
    ), 3)
    assert stored() != expected


def test_hist_apply_batch_shares_replay_protection(spark, tmp_path):
    """The histogram store rides the SAME additive machinery as CMS:
    per-day _bid stamps make a same-id retry a no-op."""
    from options_data_pipeline_spark.streaming.sketches import hist_apply_batch

    store = str(tmp_path / "store")
    rows = [
        ("2024-01-01 10:00:00", "a", float(v)) for v in range(40)
    ] + [("2024-01-02 10:00:00", "b", float(v)) for v in range(30)]
    ev = spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist_apply_batch(spark, store, ev, 0)

    def stored():
        return {
            (str(r.day), r.event_type, r.bin, r.cnt)
            for r in spark.read.parquet(store)
            .select("day", "event_type", "bin", "cnt")
            .collect()
        }

    once = stored()
    hist_apply_batch(spark, store, ev, 0)  # same-id retry
    assert stored() == once
    hist_apply_batch(spark, store, ev, 1)  # genuinely new batch adds
    assert stored() != once


def test_dds_apply_batch_shares_replay_protection(spark, tmp_path):
    """The DDS bucket store is the FOURTH rider on the additive
    machinery: per-day _bid stamps make a same-id retry a no-op."""
    from options_data_pipeline_spark.streaming.sketches import dds_apply_batch

    store = str(tmp_path / "store")
    rows = [
        ("2024-01-01 10:00:00", "a", float(v) + 0.25) for v in range(40)
    ] + [("2024-01-02 10:00:00", "b", float(v) * 13.7) for v in range(30)]
    ev = spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dds_apply_batch(spark, store, ev, 0)

    def stored():
        return {
            (str(r.day), r.event_type, r.bucket, r.cnt)
            for r in spark.read.parquet(store)
            .select("day", "event_type", "bucket", "cnt")
            .collect()
        }

    once = stored()
    dds_apply_batch(spark, store, ev, 0)  # same-id retry
    assert stored() == once
    dds_apply_batch(spark, store, ev, 1)  # genuinely new batch adds
    assert stored() != once
