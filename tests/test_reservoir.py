"""Reservoir sample stores (operators/reservoir.py, plans/stores.py):
the merge law, the weighted bias, determinism, and the store-consumer
plan contract (round-11 wave 2, VERDICT r10 ask #5b)."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.reservoir import (
    RSV_K,
    reservoir_bottom_k,
    rsv_priority,
    rsv_weighted_priority,
)
from options_data_pipeline_spark.plans import stores
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_merge_law_union_rebottomk_equals_global(spark):
    """The store property: bottom-k of (union of per-day bottom-k) ==
    bottom-k of the raw week.  Exactly the KMV subset argument, on
    whole rows."""
    ev = load_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"),
        F.date_trunc("week", F.to_date("ts")).alias("week"),
        "event_type",
        "event_id",
        rsv_priority(F.col("event_id")).alias("p"),
    )
    via_days = reservoir_bottom_k(
        reservoir_bottom_k(
            ev, ["day", "event_type"], "p", "event_id"
        ).drop("rank"),
        ["week", "event_type"],
        "p",
        "event_id",
    ).select("week", "event_type", "rank", "event_id")
    direct = reservoir_bottom_k(
        ev, ["week", "event_type"], "p", "event_id"
    ).select("week", "event_type", "rank", "event_id")
    assert via_days.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_days).count() == 0


def test_weighted_bias_toward_heavy_rows(spark):
    """h/w priorities must over-select heavy rows: the mean n_chars of
    the kept sample exceeds the corpus mean (token-mass-proportional
    sampling would be pointless otherwise)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "lang", "doc_id", "n_chars",
        rsv_weighted_priority(F.col("doc_id"), F.col("n_chars")).alias(
            "wp"
        ),
    )
    kept = reservoir_bottom_k(docs, ["lang"], "wp", "doc_id")
    mean_kept = kept.agg(F.avg("n_chars")).first()[0]
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    assert mean_kept > mean_all


def test_determinism_under_repartitioning(spark):
    """The kept set must not depend on physical layout (the property
    rand()-reservoirs lose): 1-partition and 32-partition runs agree."""
    ev = load_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        "event_id",
        rsv_priority(F.col("event_id")).alias("p"),
    )
    a = reservoir_bottom_k(
        ev.repartition(1), ["day", "event_type"], "p", "event_id"
    )
    b = reservoir_bottom_k(
        ev.repartition(32), ["day", "event_type"], "p", "event_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_consumers_never_scan_raw_tables(spark, tmp_path_factory):
    """Same payoff contract as every store in the family: the weekly /
    per-lang consumers read the stored reservoirs ONLY."""
    tmp = str(tmp_path_factory.mktemp("rsv_stores"))
    rsv_path = f"{tmp}/rsv_days"
    wrsv_path = f"{tmp}/wrsv_shards"
    stores.build_reservoir_day_store(spark, SF_DIR, rsv_path)
    stores.build_weighted_sample_store(spark, SF_DIR, wrsv_path)

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    rsv_plan = fmt(stores.reservoir_week_consumer(spark, rsv_path))
    wrsv_plan = fmt(stores.weighted_lang_consumer(spark, wrsv_path))
    assert "events.parquet" not in rsv_plan
    assert "documents.parquet" not in wrsv_plan
    assert "rsv_days" in rsv_plan
    assert "wrsv_shards" in wrsv_plan
    # group sizes honor K
    rows = stores.reservoir_week_consumer(spark, rsv_path).groupBy(
        "week", "event_type"
    ).count().collect()
    assert rows and all(r["count"] <= RSV_K for r in rows)
