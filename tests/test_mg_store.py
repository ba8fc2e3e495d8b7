"""MG/SpaceSaving truncated-counts store: the error-bound law against
an exact recompute, and the RED control proving the streaming `_bid`
stamp (not luck) is what makes replay exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.heavyhitters import (
    MG_STORE_M,
    mg_truncate,
)
from options_data_pipeline_spark.plans.stores import (
    build_mg_day_store,
    mg_week_topk_consumer,
)
from options_data_pipeline_spark.sources.tables import load_table
from options_data_pipeline_spark.streaming.sketches import mg_apply_batch

from .conftest import SF_DIR


def test_bound_law_against_exact_recompute(spark, tmp_path):
    """Every reported key's true weekly count lies in
    [mg_cnt, mg_cnt + err_bound]; any unreported key's true count is
    <= err_bound + the k-th reported count (it lost every day's top-m
    to keys at least that heavy, up to the accumulated slack)."""
    store = str(tmp_path / "mg_days")
    build_mg_day_store(spark, SF_DIR, store)
    rep = mg_week_topk_consumer(spark, store).collect()

    ev = load_table(spark, SF_DIR, "events").select(
        F.date_trunc("week", F.to_date("ts")).alias("week"), "user_id"
    )
    exact = {
        (r["week"], r["user_id"]): r["n"]
        for r in ev.groupBy("week", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rep, "consumer returned nothing"
    kth = {}
    for r in rep:
        true = exact[(r["week"], r["user_id"])]
        assert r["mg_cnt"] <= true <= r["mg_cnt"] + r["err_bound"], (
            r, true
        )
        kth.setdefault(r["week"], []).append((r["rank"], r["mg_cnt"]))
    # unreported keys: bounded by err + the smallest reported count
    reported = {(r["week"], r["user_id"]) for r in rep}
    err_by_week = {r["week"]: r["err_bound"] for r in rep}
    floor_by_week = {
        wk: min(c for _, c in rks) for wk, rks in kth.items()
    }
    for (wk, uid), true in exact.items():
        if (wk, uid) in reported or wk not in err_by_week:
            continue
        assert true <= err_by_week[wk] + floor_by_week[wk], (
            wk, uid, true
        )


def test_truncation_fires_at_test_scale(spark, tmp_path):
    """M is sized so the err path is genuinely exercised: at least one
    day must truncate (err > 0) — otherwise the bound law test proves
    nothing about dropped keys."""
    store = str(tmp_path / "mg_days")
    build_mg_day_store(spark, SF_DIR, store)
    s = spark.read.parquet(store)
    assert s.where(F.col("err") > 0).count() > 0
    per_day = s.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    assert per_day.agg(F.max("n")).first()[0] <= MG_STORE_M


def test_stream_replay_skips_via_stamp_red_control(spark, tmp_path):
    """A same-id replay must no-op (stamped skip); with the stamp
    STRIPPED the same replay double-counts — proving the `_bid` guard
    is load-bearing for the non-idempotent MG fold."""
    from options_data_pipeline_spark.sinks.upsert import _atomic_replace

    store = str(tmp_path / "mg_stream")
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "event_id"
    )
    batch = ev.where(F.col("event_id") % 2 == 0).drop("event_id")
    mg_apply_batch(spark, store, batch, batch_id=0)
    once = {
        (str(r["day"]), r["user_id"]): r["cnt"]
        for r in spark.read.parquet(store).collect()
    }
    # stamped replay: identical store
    mg_apply_batch(spark, store, batch, batch_id=0)
    again = {
        (str(r["day"]), r["user_id"]): r["cnt"]
        for r in spark.read.parquet(store).collect()
    }
    assert again == once
    # red control: strip the stamp and replay — counts double
    stripped = (
        spark.read.parquet(store)
        .drop("_bid")
        .withColumn("_bid", F.lit(-1))
        .localCheckpoint()
    )
    _atomic_replace(stripped, store)
    mg_apply_batch(spark, store, batch, batch_id=0)
    doubled = {
        (str(r["day"]), r["user_id"]): r["cnt"]
        for r in spark.read.parquet(store).collect()
    }
    assert doubled != once
    k, v = next(iter(once.items()))
    assert doubled.get(k, 0) == 2 * v


def test_mg_truncate_merge_bound_composes(spark):
    """Two-stage fold on a hand corpus: truncate(slice1) + slice2
    counts -> truncate again; the interval law must hold against the
    exact two-slice totals (the Mergeable Summaries bound)."""
    m = 2
    s1 = spark.createDataFrame(
        [("g", "a", 10), ("g", "b", 7), ("g", "c", 5), ("g", "d", 1)],
        "grp string, k string, cnt long",
    ).withColumn("err", F.lit(0).cast("long"))
    t1 = mg_truncate(s1, ["grp"], "k", m=m)
    kept1 = {r["k"]: (r["cnt"], r["err"]) for r in t1.collect()}
    assert set(kept1) == {"a", "b"} and kept1["a"] == (10, 5)
    s2 = spark.createDataFrame(
        [("g", "c", 6), ("g", "b", 2), ("g", "e", 4)],
        "grp string, k string, cnt long",
    )
    comb = (
        t1.select("grp", "k", "cnt")
        .unionByName(s2)
        .groupBy("grp", "k")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .withColumn("err", F.lit(5).cast("long"))  # carried from t1
    )
    t2 = mg_truncate(comb, ["grp"], "k", m=m)
    kept2 = {r["k"]: (r["cnt"], r["err"]) for r in t2.collect()}
    exact = {"a": 10, "b": 9, "c": 11, "d": 1, "e": 4}
    # err after stage 2 = 5 (carried) + c_{m+1} of comb
    # comb = a:10, b:9, c:6, e:4 -> c_{3} = 6 -> err = 11
    for k, (cnt, err) in kept2.items():
        assert err == 11
        assert cnt <= exact[k] <= cnt + err
    for k in set(exact) - set(kept2):
        assert exact[k] <= 11
