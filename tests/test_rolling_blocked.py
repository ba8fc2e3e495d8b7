"""operators/rolling.py: the block-carry trailing window must be
bit-identical to the naive whole-group window — including the sparse
case where a block's carry reaches across SEVERAL near-empty blocks,
which dense driver data never exercises."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.rolling import (
    blocked_trailing_list,
)


def _naive(df, k):
    w = (
        Window.partitionBy("g")
        .orderBy("o", "i")
        .rowsBetween(-(k - 1), 0)
    )
    return df.withColumn(
        "__w", F.array_sort(F.collect_list("v").over(w))
    )


def _check(spark, rows, k, blk_width):
    df = spark.createDataFrame(rows, "g string, o long, i long, v double")
    expect = {
        (r["g"], r["o"], r["i"]): r["__w"]
        for r in _naive(df, k).collect()
    }
    got = {
        (r["g"], r["o"], r["i"]): r["__w"]
        for r in blocked_trailing_list(
            df,
            ["g"],
            ["o", "i"],
            "v",
            k=k,
            blk=F.floor(F.col("o") / F.lit(blk_width)),
        ).collect()
    }
    assert got == expect


def test_sparse_blocks_carry_across_many(spark):
    # one row per block for a stretch: a k=5 frame must pull context
    # from FOUR distinct earlier blocks
    rows = [("a", o * 10, o, float(o)) for o in range(12)]
    _check(spark, rows, k=5, blk_width=10)


def test_empty_gap_blocks(spark):
    # blocks 3..9 empty: block 10's head frame reaches block 2's tail
    rows = [("a", o, o, float(o) * 1.5) for o in range(30)]
    rows += [("a", 100 + o, 100 + o, float(o)) for o in range(7)]
    _check(spark, rows, k=6, blk_width=10)


def test_dense_and_multi_group_with_nulls(spark):
    rows = []
    for g in ("a", "b"):
        for o in range(50):
            rows.append((g, o // 3, o, None if o % 7 == 0 else float(o)))
    _check(spark, rows, k=4, blk_width=5)


def test_many_blocks_prune_exactness(spark):
    """ADVICE r12 prune: with MANY blocks (here 40 per group) and a
    mix of dense and near-empty stretches, the nearest-predecessor
    prune must still hand every head frame its exact context — the
    adversarial case is a target whose carry spans several sparse
    blocks while nearer blocks are dense enough to satisfy it alone."""
    rows = []
    for g in ("a", "b"):
        for o in range(200):
            # blocks of width 5; blocks 10..19 and 25..34 nearly empty
            b = o // 5
            if (10 <= b < 20 or 25 <= b < 35) and o % 5 != 0:
                continue
            rows.append((g, o, o, float(o) + (0.5 if g == "b" else 0.0)))
    _check(spark, rows, k=7, blk_width=5)


def test_ties_on_order_column(spark):
    # identical o values straddling a block boundary: the i tiebreak
    # decides frame membership identically in both plans
    rows = [("a", 9, i, float(i)) for i in range(6)]
    rows += [("a", 10, 10 + i, 50.0 + i) for i in range(6)]
    _check(spark, rows, k=5, blk_width=10)
