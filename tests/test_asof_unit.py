"""As-of join edge semantics (ties, tolerance, no-prior-match)."""

from __future__ import annotations

import pyspark.sql.functions as F

from options_data_pipeline_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_ties_and_missing(spark):
    left = _df(spark, [
        ("u1", "2024-01-01 10:00:00", 1),
        ("u1", "2024-01-01 12:00:00", 2),
        ("u2", "2024-01-01 09:00:00", 3),   # no prior right row
    ], "k string, ts string, lid int").selectExpr("k", "cast(ts as timestamp) ts", "lid")
    right = _df(spark, [
        ("u1", "2024-01-01 09:30:00", 100.0),
        ("u1", "2024-01-01 12:00:00", 200.0),  # tie: simultaneous quote visible
        ("u2", "2024-01-01 09:30:00", 300.0),  # AFTER the left row -> no match
    ], "k string, ts string, v double").selectExpr("k", "cast(ts as timestamp) ts", "v")
    out = {r.lid: r for r in asof_join(left, right, on=["k"]).collect()}
    assert out[1].v_asof == 100.0
    assert out[2].v_asof == 200.0  # <= semantics: equal ts matches
    assert out[3].v_asof is None and out[3].ts_asof is None


def test_asof_tolerance(spark):
    left = _df(spark, [("u1", "2024-01-01 10:00:00", 1)],
               "k string, ts string, lid int").selectExpr(
        "k", "cast(ts as timestamp) ts", "lid")
    right = _df(spark, [("u1", "2024-01-01 08:00:00", 100.0)],
                "k string, ts string, v double").selectExpr(
        "k", "cast(ts as timestamp) ts", "v")
    with_tol = asof_join(left, right, on=["k"], tolerance_seconds=3600).collect()[0]
    assert with_tol.v_asof is None  # 2h-old quote outside 1h tolerance
    without = asof_join(left, right, on=["k"]).collect()[0]
    assert without.v_asof == 100.0


def test_asof_forward_direction(spark):
    from options_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:00:00"), (2, "k", "2024-01-01 12:00:00")],
        "id long, k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 5.0), ("k", "2024-01-01 11:00:00", 7.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.id: (r.v_asof, str(r.ts_asof))
        for r in asof_join(
            left, right, on=["k"], right_cols=["v"], direction="forward"
        ).collect()
    }
    # id 1: simultaneous right row matches (>= tie rule); id 2: nothing after
    assert out[1] == (5.0, "2024-01-01 10:00:00")
    assert out[2] == (None, "None")


def test_asof_forward_tolerance(spark):
    from options_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:00:00")], "id long, k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:45:00", 9.0)], "k string, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hit = asof_join(left, right, on=["k"], right_cols=["v"],
                    direction="forward", tolerance_seconds=3600).collect()
    miss = asof_join(left, right, on=["k"], right_cols=["v"],
                     direction="forward", tolerance_seconds=60).collect()
    assert hit[0].v_asof == 9.0 and miss[0].v_asof is None


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    left = spark.createDataFrame(
        [
            (1, "k", "2024-01-01 10:10:00"),  # 10 min after A, 50 before B
            (2, "k", "2024-01-01 10:50:00"),  # 50 after A, 10 before B
            (3, "k", "2024-01-01 10:30:00"),  # exactly between: backward wins
        ],
        "id long, k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1.0), ("k", "2024-01-01 11:00:00", 2.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.id: r.v_asof
        for r in asof_join(
            left, right, on=["k"], right_cols=["v"], direction="nearest"
        ).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: 1.0}


def test_asof_nearest_tolerance_each_side(spark):
    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:50:00")], "id long, k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1.0), ("k", "2024-01-01 11:00:00", 2.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # 50 min back / 10 min forward; tolerance 15 min excludes backward
    out = asof_join(left, right, on=["k"], right_cols=["v"],
                    direction="nearest", tolerance_seconds=900).collect()
    assert out[0].v_asof == 2.0
    none = asof_join(left, right, on=["k"], right_cols=["v"],
                     direction="nearest", tolerance_seconds=60).collect()
    assert none[0].v_asof is None
