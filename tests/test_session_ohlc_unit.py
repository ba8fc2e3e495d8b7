"""Unit tests for the A1 session rollup on crafted fixtures — pinning the
reference's tie-break and guard semantics
(/root/reference/src/pipeline/aggregators/base.py:87-153)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from options_data_pipeline_spark.functions import timeutil as T
from options_data_pipeline_spark.operators.session_ohlc import session_ohlc


def _ts(h):
    return datetime.datetime(2024, 1, 10, h, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "instrument string, datetime timestamp, open double, high double, low double, close double"
    )


def _run(spark, rows, min_rows=1):
    df = _mk(spark, rows)
    out = session_ohlc(
        df,
        session_start=T.daily_session_start(F.col("datetime")),
        keys=("instrument",),
        time_col="datetime",
        min_rows=min_rows,
    )
    return {r["instrument"]: r.asDict() for r in out.collect()}


def test_basic_ohlc_and_positional_indices(spark):
    rows = [
        ("X", _ts(9), 100.0, 110.0, 95.0, 105.0),   # idx 0
        ("X", _ts(10), 105.0, 120.0, 100.0, 115.0),  # idx 1 -> max high
        ("X", _ts(11), 115.0, 118.0, 90.0, 92.0),    # idx 2 -> min low
    ]
    r = _run(spark, rows)["X"]
    assert r["open"] == 100.0 and r["close"] == 92.0
    assert r["high"] == 120.0 and r["low"] == 90.0
    assert r["chhightime"] == 1 and r["chlowtime"] == 2
    assert r["move"] == 30.0
    assert r["chhigh"] == 20.0 and r["chlow"] == -10.0 and r["chclose"] == -8.0
    assert r["chmax"] == 20.0  # |20| > |-10|
    assert r["firstextremumtype"] == "HIGH"  # high idx 1 < low idx 2


def test_first_wins_on_tied_extremes(spark):
    # the same max high appears at idx 1 and idx 3: strict '>' keeps idx 1
    rows = [
        ("X", _ts(9), 100.0, 105.0, 99.0, 101.0),
        ("X", _ts(10), 101.0, 120.0, 98.0, 102.0),
        ("X", _ts(11), 102.0, 110.0, 90.0, 103.0),
        ("X", _ts(12), 103.0, 120.0, 90.0, 104.0),
    ]
    r = _run(spark, rows)["X"]
    assert r["chhightime"] == 1
    assert r["chlowtime"] == 2  # low 90 first at idx 2


def test_chmax_tie_prefers_chlow(spark):
    # chhigh = +10%, chlow = -10% -> |equal| -> chmax = chlow (base.py:128-131)
    rows = [
        ("X", _ts(9), 100.0, 110.0, 90.0, 100.0),
    ]
    r = _run(spark, rows)["X"]
    assert r["chhigh"] == 10.0 and r["chlow"] == -10.0
    assert r["chmax"] == -10.0


def test_firstextremumtype_same_index_tie(spark):
    # both extremes in the same (single) row: index tie -> larger |pct|
    rows = [("X", _ts(9), 100.0, 105.0, 85.0, 100.0)]
    r = _run(spark, rows)["X"]
    assert r["chhightime"] == 0 and r["chlowtime"] == 0
    assert r["firstextremumtype"] == "LOW"  # |-15| > |5|
    rows2 = [("Y", _ts(9), 100.0, 115.0, 95.0, 100.0)]
    r2 = _run(spark, rows2)["Y"]
    assert r2["firstextremumtype"] == "HIGH"  # |15| >= |-5|


def test_zero_open_guard(spark):
    rows = [("X", _ts(9), 0.0, 10.0, 0.0, 5.0)]
    r = _run(spark, rows)["X"]
    assert r["chhigh"] == 0.0 and r["chlow"] == 0.0 and r["chclose"] == 0.0


def test_min_rows_guard(spark):
    rows = [
        ("X", _ts(9), 1.0, 1.0, 1.0, 1.0),
        ("X", _ts(10), 1.0, 1.0, 1.0, 1.0),
    ]
    assert _run(spark, rows, min_rows=3) == {}
    assert "X" in _run(spark, rows, min_rows=2)


def test_session_assignment_before_8am(spark):
    # 07:00 belongs to the PREVIOUS day's 08:00 session (F7)
    rows = [("X", datetime.datetime(2024, 1, 10, 7, 0), 1.0, 2.0, 0.5, 1.5)]
    df = _mk(spark, rows)
    out = session_ohlc(
        df, T.daily_session_start(F.col("datetime")), keys=("instrument",),
        time_col="datetime",
    ).collect()
    assert out[0]["session_start"] == datetime.datetime(2024, 1, 9, 8, 0)


def test_weekly_and_monthly_anchors(spark):
    # 2024-01-10 is a Wednesday; prior Friday is 2024-01-05.
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 10, 8, 0),)], "d timestamp"
    )
    row = df.select(
        T.weekly_session_start(F.col("d")).alias("w"),
        T.monthly_session_start(F.col("d")).alias("m"),
        T.monthly_session_end(T.monthly_session_start(F.col("d"))).alias("me"),
    ).collect()[0]
    assert row["w"] == datetime.datetime(2024, 1, 5, 8, 0)
    # last Friday of Dec 2023 = Dec 29; of Jan 2024 = Jan 26
    assert row["m"] == datetime.datetime(2023, 12, 29, 8, 0)
    assert row["me"] == datetime.datetime(2024, 1, 26, 8, 0)
    # a date ON/after the last Friday rolls into the new session
    df2 = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 26, 8, 0),), (datetime.datetime(2024, 1, 26, 7, 0),)],
        "d timestamp",
    )
    got = [
        r["m"]
        for r in df2.select(T.monthly_session_start(F.col("d")).alias("m"))
        .orderBy(F.col("d"))
        .collect()
    ]
    # 07:00 on Jan 26 still belongs to the Dec-29 session; 08:00 starts Jan-26
    assert got == [
        datetime.datetime(2023, 12, 29, 8, 0),
        datetime.datetime(2024, 1, 26, 8, 0),
    ]
