"""Relative-error quantile store (operators/dds.py + plans/stores.py):
the guarantee the equi-width store cannot give — bounded RELATIVE error
at every magnitude — plus the bucket algebra the driver hash relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.dds import (
    DDS_MAX_ABS,
    DDS_OVERFLOW_BUCKET,
    DDS_QS,
    sql_dds_bucket,
    sql_dds_mid,
)
from options_data_pipeline_spark.plans.stores import (
    build_dds_day_store,
    dds_week_quantile_consumer,
)
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dds") / "dds_days")
    build_dds_day_store(spark, SF_DIR, path)
    return path


def test_bucket_ordering_is_value_ordering(spark):
    """The signed lower-bound bucket id must sort exactly like the
    values it buckets — the CDF inversion orders by it."""
    vals = [
        -1050.0, -950.0, -12.5, -1e-9, 0.0, 1e-9, 1e-7, 0.03, 1.0,
        99.4, 99.9, 100.1, 330.7105, 560.21, 1049.0, 1051.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = (
        df.selectExpr("v", f"{sql_dds_bucket('v')} AS b")
        .orderBy("v")
        .collect()
    )
    buckets = [r["b"] for r in rows]
    assert buckets == sorted(buckets)
    # and the bucket bounds the value: |v| in [|b|, |b|+10^k) at 1e-9
    # scale, so the midpoint is within half a bucket of v
    for r in rows:
        if r["v"] == 0.0:
            assert r["b"] == 0
        else:
            assert (r["b"] < 0) == (r["v"] < 0)
            assert abs(r["b"]) <= abs(r["v"]) * 1e9 + 0.5


def test_overflow_guard_matches_duckdb(spark):
    """|v| >= DDS_MAX_ABS routes to the signed overflow bucket in BOTH
    engines — without the guard Spark's non-ANSI cast clamps to
    Long.MAX while DuckDB raises on the out-of-range cast (ADVICE r10).
    The sentinel must stay above every in-range bucket id so ordering
    survives."""
    import duckdb

    vals = [8.9e9, DDS_MAX_ABS, 1.0e12, -1.0e12, 1.7e308, -1.7e308]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["v"]: r["b"]
        for r in df.selectExpr("v", f"{sql_dds_bucket('v')} AS b").collect()
    }
    con = duckdb.connect()
    for v in vals:
        (db,) = con.execute(
            f"SELECT {sql_dds_bucket('v')} FROM (SELECT CAST({v!r} AS DOUBLE) AS v)"
        ).fetchone()
        assert got[v] == db, f"v={v}: spark {got[v]} vs duckdb {db}"
    # in-range stays in range; overflow is the sentinel, correctly signed
    assert abs(got[8.9e9]) < DDS_OVERFLOW_BUCKET
    for v in (DDS_MAX_ABS, 1.0e12, 1.7e308):
        assert got[v] == DDS_OVERFLOW_BUCKET
    assert got[-1.0e12] == -DDS_OVERFLOW_BUCKET
    assert got[-1.7e308] == -DDS_OVERFLOW_BUCKET
    # ordering: every in-range bucket sits strictly below the sentinel
    assert got[8.9e9] < DDS_OVERFLOW_BUCKET


def test_mid_within_half_percent(spark):
    """Bucket midpoint carries <= 0.5% relative error for any value
    with >= 3 significant digits at 1e-9 scale."""
    vals = [3.14159, 271.828, 0.001234, 559.999, 100.0, 1.0e-6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.selectExpr(
        "v", f"{sql_dds_mid(sql_dds_bucket('v'))} AS mid"
    ).collect()
    for r in rows:
        assert abs(r["mid"] - r["v"]) / abs(r["v"]) <= 0.005 + 1e-12


def test_store_estimates_within_relative_bound(spark, store):
    """The store's weekly quantiles must sit within 0.5% of the EXACT
    order statistic computed at the same ceil-rank convention from raw
    events — the relative-error contract end-to-end."""
    est = {
        (r["week"], r["event_type"], r["q"]): (r["dds_est"], r["n"])
        for r in dds_week_quantile_consumer(spark, store).collect()
    }
    assert est
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.date_trunc("week", F.to_date("ts")).alias("week"),
            "event_type",
            "value",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("week", "event_type").orderBy("value")
    ranked = ev.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(
            Window.partitionBy("week", "event_type")
        )
    )
    for q in DDS_QS:
        exact = {
            (r["week"], r["event_type"]): r["value"]
            for r in ranked.where(
                F.col("rk") == F.ceil(F.lit(q) * F.col("n"))
            ).collect()
        }
        for key, val in exact.items():
            got, _n = est[(key[0], key[1], q)]
            if val == 0.0:
                assert abs(got) <= 1e-9
            else:
                assert abs(got - val) / abs(val) <= 0.005 + 1e-12, (
                    f"{key} q={q}: est {got} vs exact {val}"
                )


def test_day_counts_add_to_week(spark, store):
    """The merge law: weekly bucket counts are exactly the SUM of the
    stored day counts (no resketching, no approximation in the merge)."""
    days = spark.read.parquet(store)
    week = days.groupBy(
        F.date_trunc("week", F.col("day").cast("date")).alias("week"),
        "event_type",
    ).agg(F.sum("cnt").alias("total"))
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("value").isNotNull())
        .groupBy(
            F.date_trunc("week", F.to_date("ts")).alias("week"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = week.join(ev, ["week", "event_type"], "full")
    bad = joined.where(
        F.coalesce("total", F.lit(-1)) != F.coalesce("n", F.lit(-2))
    )
    assert bad.count() == 0
