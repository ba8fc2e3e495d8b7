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
    # derived bounded-count segmentation (the default) across segment
    # counts, including n_segments=1 (everything in one segment) and a
    # count larger than the distinct-value count
    for n in (1, 3, 256, 10_000):
        got = {
            (r["grp"], r["value"]): (r["cum"], r["tw"])
            for r in grouped_value_prefix(
                df, ["grp"], weight_col=F.col("w"), n_segments=n
            ).collect()
        }
        assert got == expect, f"n_segments={n}"


def test_derived_segments_bounded_on_wide_domain(spark):
    """ADVICE r12: a fixed absolute segment width made the level-2
    offsets frame scale with the VALUE DOMAIN (wide-domain doubles ->
    one segment per distinct value).  The derived segmentation must
    keep the per-group segment count <= n_segments regardless of the
    domain, stay monotone in value, and still produce exact sums."""
    from options_data_pipeline_spark.operators.prefixsum import (
        segment_expr,
    )

    # values spanning 15 orders of magnitude in one group
    vals = [(-1e15, 3), (-7.0, 1), (0.0, 2), (1e-9, 5), (42.0, 1),
            (1e12, 2), (9e14, 4)]
    df = spark.createDataFrame(
        [("g", v, w) for v, w in vals], "grp string, value double, w long"
    )
    n = 8
    segs = (
        df.groupBy("grp", "value").agg(F.sum("w").alias("vw"))
        .crossJoin(
            df.agg(
                F.min("value").alias("__vmin"),
                F.max("value").alias("__vmax"),
            )
        )
        .select(
            "value",
            segment_expr(
                F.col("value"), F.col("__vmin"), F.col("__vmax"), n
            ).alias("seg"),
        )
        .orderBy("value")
        .collect()
    )
    ids = [r["seg"] for r in segs]
    assert all(0 <= s < n for s in ids), ids  # bounded by the constant
    assert ids == sorted(ids), ids  # monotone in value
    assert ids[0] == 0 and ids[-1] == n - 1  # span actually used
    # and the prefix itself is exact on this frame
    expect = {
        (r["grp"], r["value"]): (r["cum"], r["tw"])
        for r in _naive(df).collect()
    }
    got = {
        (r["grp"], r["value"]): (r["cum"], r["tw"])
        for r in grouped_value_prefix(
            df, ["grp"], weight_col=F.col("w"), n_segments=n
        ).collect()
    }
    assert got == expect


def test_ungrouped_prefix(spark):
    """groups=[] — one global distribution (the text.py cumulative
    length tables use this form)."""
    df = _frame(spark)
    w = Window.orderBy("value").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expect = {
        r["value"]: (r["cum"], r["tw"])
        for r in df.withColumn("cum", F.sum("w").over(w))
        .crossJoin(df.agg(F.sum("w").alias("tw")))
        .select("value", "cum", "tw")
        .distinct()
        .collect()
    }
    got = {
        r["value"]: (r["cum"], r["tw"])
        for r in grouped_value_prefix(
            df, [], weight_col=F.col("w")
        ).collect()
    }
    assert got == expect


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


def test_null_values_ignored_like_spark_percentile(spark):
    """ADVICE r13 (medium): nulls in value_col must be IGNORED — the
    null row used to be dropped by the null-unsafe segment join while
    its weight still inflated tw and every later segment's offset, so
    percentiles silently treated nulls as smallest values."""
    from options_data_pipeline_spark.operators.prefixsum import (
        grouped_interp_percentiles,
    )

    rows = [("a", float(v)) for v in range(1, 11)]
    rows += [("a", None)] * 7  # nulls must not shift any rank
    rows += [("b", 5.0), ("b", None), ("b", 9.0)]
    df = spark.createDataFrame(rows, "grp string, value double")

    got = {
        r["grp"]: (r["p50"], r["p90"], r["n"])
        for r in grouped_interp_percentiles(
            df, ["grp"], "value", [0.5, 0.9], ["p50", "p90"]
        ).collect()
    }
    expect = {
        r["grp"]: (r["p50"], r["p90"], r["n"])
        for r in df.groupBy("grp")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.count("value").alias("n"),
        )
        .collect()
    }
    assert got == expect
    # the prefix frame itself: no null value row, totals = non-null count
    pfx = grouped_value_prefix(df, ["grp"])
    assert pfx.where(F.col("value").isNull()).count() == 0
    tw = {r["grp"]: r["tw"] for r in pfx.select("grp", "tw").distinct().collect()}
    assert tw == {"a": 10, "b": 2}


def test_nan_does_not_collapse_segmentation(spark):
    """ADVICE r13 (low): a single NaN made the observed span NaN, so
    every row's segment id collapsed to 0 — correct results but the
    whole group funneled through one level-1 task.  NaN must route to
    the TOP segment (it sorts last) while the finite rows keep their
    derived spread, and the cumulative sums must stay exact."""
    from options_data_pipeline_spark.operators.prefixsum import (
        grouped_value_prefix_multi,
        segment_expr,
    )

    vals = [float(v) for v in range(0, 64)] + [float("nan")]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    n = 8
    seg_rows = (
        df.crossJoin(
            df.where(~F.isnan("value")).agg(
                F.min("value").alias("__vmin"),
                F.max("value").alias("__vmax"),
            )
        )
        .select(
            "value",
            segment_expr(
                F.col("value"), F.col("__vmin"), F.col("__vmax"), n
            ).alias("seg"),
        )
        .collect()
    )
    finite = sorted(
        (r["value"], r["seg"]) for r in seg_rows if r["value"] == r["value"]
    )
    nan_segs = [r["seg"] for r in seg_rows if r["value"] != r["value"]]
    assert nan_segs == [n - 1]
    assert len({s for _, s in finite}) == n  # spread, not collapsed
    segs = [s for _, s in finite]
    assert segs == sorted(segs)  # monotone; NaN (top segment) sorts last
    # exact cumulative weights: NaN is a real largest value
    out = grouped_value_prefix_multi(
        df, ["grp"], "value", {"w": F.lit(1)}, n_segments=n
    ).collect()
    by_val = {r["value"]: (r["cum_w"], r["tw_w"]) for r in out}
    assert by_val[0.0] == (1, 65)
    assert by_val[63.0] == (64, 65)
    nan_cums = [
        (r["cum_w"], r["tw_w"]) for r in out if r["value"] != r["value"]
    ]
    assert nan_cums == [(65, 65)]
