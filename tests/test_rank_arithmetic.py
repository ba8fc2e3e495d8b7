"""Round-14 rank-arithmetic laws: the window-free formulations must
equal Spark's own window functions on adversarial inputs (group sizes
not divisible by the tile count, heavy ties, singleton groups)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_ntile_law_matches_spark_ntile(spark):
    """order_ntile's integer tile law (first n%k tiles get n div k + 1
    rows) vs F.ntile over the same tie-free order, across group sizes
    around the k boundary (n<k, n=k, n%k!=0)."""
    rows = []
    for g, n in (("a", 7), ("b", 100), ("c", 137), ("d", 1), ("e", 999)):
        rows += [(g, i * 17 % 1000, i) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, v long, tie long")
    k = 100
    w = Window.partitionBy("grp").orderBy("v", "tie")
    expect = df.select(
        "grp", "tie", F.ntile(k).over(w).cast("long").alias("tile")
    )
    rn = F.row_number().over(w).cast("long")
    n = F.count(F.lit(1)).over(Window.partitionBy("grp"))
    t = df.select(
        "grp",
        "tie",
        rn.alias("__rn"),
        n.alias("__n"),
    ).withColumn("__q", F.expr(f"__n div {k}")).withColumn(
        "__r", F.expr(f"__n % {k}")
    )
    got = t.select(
        "grp",
        "tie",
        F.when(
            F.col("__rn") <= F.col("__r") * (F.col("__q") + 1),
            F.expr("(__rn - 1) div (__q + 1) + 1"),
        )
        .otherwise(
            F.expr(
                "__r + (__rn - __r * (__q + 1) - 1)"
                " div greatest(__q, 1) + 1"
            )
        )
        .cast("long")
        .alias("tile"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_rank_dense_rank_from_prefix(spark):
    """part_size_rank's law: rank = cum - vw + 1 and dense_rank =
    distinct-value index, vs Spark's rank()/dense_rank(), with heavy
    ties and a singleton group."""
    from options_data_pipeline_spark.operators.prefixsum import (
        grouped_value_prefix,
    )

    rows = [("g1", v) for v in [3, 3, 3, 1, 1, 7, 7, 7, 7, 2]] + [
        ("g2", 5)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    pfx = grouped_value_prefix(df, ["grp"], value_col="v")
    dns = grouped_value_prefix(pfx, ["grp"], value_col="value").select(
        "grp", "value", F.col("cum").alias("drnk")
    )
    got = {
        (r["grp"], r["value"]): (
            r["cum"] - r["vw"] + 1,
            r["drnk"],
        )
        for r in pfx.join(dns, ["grp", "value"]).collect()
    }
    w = Window.partitionBy("grp").orderBy("v")
    expect = {
        (r["grp"], r["v"]): (r["rnk"], r["drnk"])
        for r in df.select(
            "grp",
            "v",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .distinct()
        .collect()
    }
    assert got == expect


def test_doubled_average_rank_is_integer_and_correct(spark):
    """spearman's tie-averaged rank law: 2*avg_rank(v) = 2*cum - vw + 1
    vs the explicit mean of row_number over each tie run."""
    from options_data_pipeline_spark.operators.prefixsum import (
        grouped_value_prefix,
    )

    rows = [(v,) for v in [4, 4, 4, 4, 1, 9, 9, 2, 2, 2]]
    df = spark.createDataFrame(rows, "v long")
    pfx = grouped_value_prefix(df, [], value_col="v")
    got = {
        r["value"]: 2 * r["cum"] - r["vw"] + 1 for r in pfx.collect()
    }
    w = Window.orderBy("v", F.monotonically_increasing_id())
    rn = df.select("v", F.row_number().over(w).alias("rn"))
    expect = {
        r["v"]: int(2 * r["ar"])
        for r in rn.groupBy("v").agg(F.avg("rn").alias("ar")).collect()
    }
    assert got == expect


def test_trimmed_kept_weight_overlap_law(spark):
    """trimmed_mean_revenue's law: per distinct value, kept weight =
    clip(cum) - clip(cum - vw) with clip into (k, n-k], vs explicitly
    filtering row ranks — including k=0 (nothing trimmed) and a group
    small enough that everything survives."""
    from options_data_pipeline_spark.operators.prefixsum import (
        grouped_value_prefix,
    )

    rows = [("g", v) for v in [5, 5, 5, 1, 2, 2, 9, 9, 9, 9, 3, 7]] + [
        ("tiny", 4),
        ("tiny", 8),
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    pfx = grouped_value_prefix(df, ["grp"], value_col="v")
    k = F.expr("tw div 10")
    hi = F.col("tw") - k

    def clip(x):
        return F.least(F.greatest(x, k), hi)

    got = {
        (r["grp"], r["value"]): r["kept"]
        for r in pfx.select(
            "grp",
            "value",
            (clip(F.col("cum")) - clip(F.col("cum") - F.col("vw"))).alias(
                "kept"
            ),
        ).collect()
        if r["kept"] > 0
    }
    w = Window.partitionBy("grp").orderBy("v", F.monotonically_increasing_id())
    ranked = df.select(
        "grp",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    expect = {}
    for r in ranked.collect():
        kk = r["n"] // 10
        if kk < r["rn"] <= r["n"] - kk:
            expect[(r["grp"], r["v"])] = expect.get((r["grp"], r["v"]), 0) + 1
    assert got == expect
