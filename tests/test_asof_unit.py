"""As-of join edge semantics (ties, tolerance, no-prior-match)."""

from __future__ import annotations

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
