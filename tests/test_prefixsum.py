"""operators/prefixsum.py: the two-level distributed prefix sum over
distinct values must be bit-identical to the naive single-window
cumulative sum, across segment widths (including widths that force
many tiny segments and one segment holding everything)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.prefixsum import (
    grouped_rank_select,
    grouped_value_prefix,
)


def _frame(spark):
    # negative values, exact ties across groups, a heavy single-value
    # run (tie skew), and varied weights
    rows = []
    vals = [-7.5, -7.5, -1.0, 0.0, 0.25, 0.25, 0.25, 3.0, 18.5, 47.0]
    for g in ("a", "b"):
        for i, v in enumerate(rows_v := vals):
            rows.append((g, v if g == "a" else v * 2 + 0.5, i % 4 + 1))
    # heavy tie: 30 rows of the same value in group a
    rows += [("a", 9.0, 2)] * 30
    return spark.createDataFrame(
        rows, "grp string, value double, w long"
    )


def _naive(df):
    w = (
        Window.partitionBy("grp")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("grp")
    return (
        df.withColumn("cum", F.sum("w").over(w))
        .withColumn("tw", F.sum("w").over(tot))
        .select("grp", "value", "cum", "tw")
        .distinct()
    )


def test_prefix_equals_naive_window_across_widths(spark):
    df = _frame(spark)
    expect = {
        (r["grp"], r["value"]): (r["cum"], r["tw"])
        for r in _naive(df).collect()
    }
    for width in (0.5, 16.0, 1e6):  # many segments ... one segment
        got = {
            (r["grp"], r["value"]): (r["cum"], r["tw"])
            for r in grouped_value_prefix(
                df, ["grp"], weight_col=F.col("w"), seg_width=width
            ).collect()
        }
        assert got == expect, f"width={width}"


def test_default_weight_is_row_count(spark):
    df = _frame(spark)
    pfx = grouped_value_prefix(df, ["grp"])
    row = {
        (r["grp"], r["value"]): r["vw"] for r in pfx.collect()
    }
    assert row[("a", 9.0)] == 30  # the heavy tie counts its rows
    top = {
        r["grp"]: r["tw"]
        for r in pfx.select("grp", "tw").distinct().collect()
    }
    assert top["a"] == 40 and top["b"] == 10


def test_rank_select_matches_row_level_order_statistic(spark):
    """The distinct-value rank selection must pick the same VALUE as
    the row-level k-th order statistic for every k."""
    df = _frame(spark).where(F.col("grp") == "a")
    ordered = [
        r["value"]
        for r in df.select("value").orderBy("value").collect()
    ]
    pfx = grouped_value_prefix(df, ["grp"]).localCheckpoint()
    for k in (1, 2, 10, 25, 39, 40):
        got = grouped_rank_select(pfx, ["grp"], F.lit(k)).collect()
        assert got[0]["value"] == ordered[k - 1], f"k={k}"
    # rank beyond the group: empty, mirroring a row_number miss
    assert grouped_rank_select(pfx, ["grp"], F.lit(41)).count() == 0
