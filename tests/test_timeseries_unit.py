"""Edge semantics of the time-series family: clamped-fold saturation,
drawdown tie-breaks, TWAP interval weighting."""

from __future__ import annotations

from options_data_pipeline_spark.operators.statefold import clamped_running_sum


def _fold(spark, rows, lo=0, hi=100):
    df = spark.createDataFrame(rows, "k string, seq int, delta long")
    out = clamped_running_sum(
        df, keys=["k"], order=["seq"], delta_col="delta",
        lo=lo, hi=hi, divisor=1.0, out_col="bal",
    )
    return {(r.k, r.seq): r.bal for r in out.collect()}


def test_clamp_saturates_at_both_bounds(spark):
    # k1: 60 +60 -> clamp 100; then -250 -> clamp 0; then +30 -> 30
    # (an unclamped sum would give 120 -> -130 -> -100: saturation is
    # path-dependent, which is exactly what windows can't express)
    got = _fold(spark, [
        ("k1", 1, 60), ("k1", 2, 60), ("k1", 3, -250), ("k1", 4, 30),
    ])
    assert got[("k1", 1)] == 60.0
    assert got[("k1", 2)] == 100.0
    assert got[("k1", 3)] == 0.0
    assert got[("k1", 4)] == 30.0


def test_clamp_applies_to_first_row(spark):
    got = _fold(spark, [("k1", 1, 999), ("k2", 1, -5)])
    assert got[("k1", 1)] == 100.0
    assert got[("k2", 1)] == 0.0


def test_fold_is_per_key_and_order_driven(spark):
    # rows arrive out of order; the fold must order by seq within key
    got = _fold(spark, [
        ("a", 2, -10), ("a", 1, 50), ("b", 1, 70), ("b", 2, 70),
    ])
    assert got[("a", 1)] == 50.0
    assert got[("a", 2)] == 40.0
    assert got[("b", 2)] == 100.0


def test_drawdown_and_twap_shapes(spark):
    """max_drawdown: peak is running (never decreases); drawdown uses the
    prior peak, not the global max. twap: each close weighted by its gap
    to the next candle, last candle held to midnight."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [
        ("X", "2024-01-01 00:00:00", 100.0),
        ("X", "2024-01-01 01:00:00", 80.0),   # dd 0.20 vs peak 100
        ("X", "2024-01-01 05:00:00", 120.0),  # new peak
        ("X", "2024-01-01 06:00:00", 102.0),  # dd 0.15 vs peak 120
    ]
    df = spark.createDataFrame(rows, "instrument string, ts string, close double") \
        .selectExpr("instrument", "cast(ts as timestamp) bucket_ts", "close")
    w = (
        Window.partitionBy("instrument").orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("close").over(w)
    dd = (peak - F.col("close")) / peak
    got = df.select("bucket_ts", dd.alias("dd")).collect()
    dds = [round(r.dd, 4) for r in got]
    assert dds == [0.0, 0.2, 0.0, 0.15]

    # TWAP weights: candle at 00:00 holds 1h, 01:00 holds 4h (gap),
    # 05:00 holds 1h, 06:00 holds 18h to midnight
    nxt = F.lead("bucket_ts").over(Window.partitionBy("instrument").orderBy("bucket_ts"))
    day_end = F.date_trunc("day", F.col("bucket_ts")) + F.expr("INTERVAL 1 DAY")
    wsec = F.unix_timestamp(F.coalesce(nxt, day_end)) - F.unix_timestamp("bucket_ts")
    weights = [r.w for r in df.select(wsec.alias("w")).collect()]
    assert weights == [3600, 4 * 3600, 3600, 18 * 3600]


def test_distributed_scan_equals_grouped_fold(spark):
    """clamped_running_sum_scan (capped-affine composition two-phase
    scan) is bit-equal to the grouped-map fold — including ONE key whose
    history spans every partition, the case grouped-map can't shard."""
    import random

    from options_data_pipeline_spark.operators.statefold import (
        clamped_running_sum_scan,
    )

    rng = random.Random(7)
    rows = [
        ("hot", i, rng.randint(-40, 45)) for i in range(2000)
    ] + [
        (f"k{j}", i, rng.randint(-40, 45))
        for j in range(5) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "k string, seq int, delta long")

    kw = dict(keys=["k"], order=["seq"], delta_col="delta",
              lo=0, hi=100, divisor=1.0, out_col="bal")
    expect = {
        (r.k, r.seq): r.bal
        for r in clamped_running_sum(df, **kw).collect()
    }
    got = {
        (r.k, r.seq): r.bal
        for r in clamped_running_sum_scan(df, num_partitions=8, **kw).collect()
    }
    assert got == expect and len(got) == 2250
    spark.catalog.clearCache()


def test_scan_releases_its_cache(spark):
    """ADVICE r3: the scan must not leak persisted partitions — the
    result is materialized and the intermediate cache released before
    returning."""
    from options_data_pipeline_spark.operators.statefold import (
        clamped_running_sum_scan,
    )

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [("a", i, (-1) ** i * 3) for i in range(100)],
        "k string, seq int, delta long",
    )
    out = clamped_running_sum_scan(
        df, keys=["k"], order=["seq"], delta_col="delta",
        lo=0, hi=10, divisor=1.0, out_col="bal", num_partitions=4,
    )
    assert out.count() == 100
    # the only persistent RDDs allowed to remain are localCheckpoint
    # results (bounded, output-sized, released with their DataFrame);
    # the intermediate range-parted frame was a plain .persist() — if it
    # leaked, it would show up here as a non-checkpointed cached RDD
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        rdd = it.next()
        assert rdd.isLocallyCheckpointed(), rdd.toString()


def test_scan_exact_beyond_double_precision(spark):
    """ADVICE r3: state carried as exact integers — deltas and bounds
    past 2^53 (where float64 loses unit precision) still fold exactly
    and bit-match the single-pass fold."""
    from options_data_pipeline_spark.operators.statefold import (
        clamped_running_sum_scan,
    )

    big = 2**53
    rows = [
        ("x", 0, big + 1),
        ("x", 1, 1),
        ("x", 2, -(big + 3)),   # would clamp at lo with exact math
        ("x", 3, big - 1),
        ("y", 0, -5),
        ("y", 1, big + 7),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, delta long")
    kw = dict(keys=["k"], order=["seq"], delta_col="delta",
              lo=0, hi=2 * big, divisor=1.0, out_col="bal")
    expect = {
        (r.k, r.seq): r.bal for r in clamped_running_sum(df, **kw).collect()
    }
    got = {
        (r.k, r.seq): r.bal
        for r in clamped_running_sum_scan(df, num_partitions=3, **kw).collect()
    }
    assert got == expect


def test_compose_algebra():
    """g2∘g1 closed form: check against direct application on a grid."""
    from options_data_pipeline_spark.operators.statefold import _compose

    def apply(g, x):
        low, u, d = g
        return min(u, max(low, x + d))

    gs = [(0.0, 100.0, 30), (0.0, 100.0, -70), (10.0, 60.0, 5), (0.0, 100.0, 200)]
    for g1 in gs:
        for g2 in gs:
            comp = _compose(g1, g2)
            for x in range(-50, 160, 7):
                assert apply(comp, float(x)) == apply(g2, apply(g1, float(x)))


def test_yoy_join_is_gap_safe(spark):
    """A missing month must yield NULL prev_revenue, not a silently
    misaligned lag-12 value (the reason yoy_revenue joins on the shifted
    calendar key instead of using lag)."""
    import pyspark.sql.functions as F

    rows = [
        ("1995-01-01", "A", 100.0),
        # 1995-02 missing entirely
        ("1995-03-01", "A", 300.0),
        ("1996-01-01", "A", 110.0),
        ("1996-02-01", "A", 220.0),   # no 1995-02 -> prev NULL
        ("1996-03-01", "A", 330.0),
    ]
    monthly = spark.createDataFrame(rows, "month string, priority string, rev double") \
        .select(F.col("month").cast("timestamp").alias("month"), "priority",
                F.col("rev").cast("decimal(18,2)").alias("rev"))
    prev = monthly.select(
        F.add_months(F.col("month"), 12).cast("timestamp").alias("month"),
        "priority", F.col("rev").alias("prev_rev"),
    )
    got = {
        r.month.strftime("%Y-%m"): (
            None if r.prev_rev is None else float(r.prev_rev)
        )
        for r in monthly.join(prev, ["month", "priority"], "left").collect()
    }
    assert got["1996-01"] == 100.0
    assert got["1996-02"] is None       # lag(12) would have returned 1995-03
    assert got["1996-03"] == 300.0
