"""Two-pass Misra-Gries heavy hitters: exactness vs a Python model under
skew (where the per-partition summaries genuinely drop tail keys), the
share-threshold guarantee guard, and empty/degenerate inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.heavyhitters import heavy_hitters


def _skewed(spark, n=30_000, partitions=8):
    # key 0 ~ 25%, key 1 ~ 12%, long pseudo-random tail (~6k cold keys)
    df = spark.range(0, n).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .when(F.col("id") % 8 == 1, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(6000)) + 2)
        .cast("long")
        .alias("k")
    )
    return df.repartition(partitions)


def test_heavy_hitters_exact_under_skew(spark):
    df = _skewed(spark)
    rows = [r.k for r in df.collect()]
    from collections import Counter

    counts = Counter(rows)
    n = len(rows)
    expect = {
        k: c for k, c in counts.items() if c > 0.05 * n
    }
    got = {r.k: r.n_rows for r in heavy_hitters(df, "k", 0.05).collect()}
    assert got == expect
    assert 0 in got and 1 in got  # the two planted hot keys
    # tail keys must NOT be reported
    assert all(c > 0.05 * n for c in got.values())


def test_heavy_hitters_guarantee_guard(spark):
    df = _skewed(spark, n=100)
    with pytest.raises(ValueError, match="MG guarantee"):
        heavy_hitters(df, "k", min_share=0.001, n_counters=16)


def test_heavy_hitters_small_counter_budget_still_exact(spark):
    # n_counters=16 with min_share=0.1: summaries are heavily pruned per
    # partition, but the guarantee threshold (1/16) still covers 0.1
    df = _skewed(spark)
    rows = [r.k for r in df.collect()]
    from collections import Counter

    counts = Counter(rows)
    n = len(rows)
    expect = {k: c for k, c in counts.items() if c > 0.1 * n}
    got = {
        r.k: r.n_rows
        for r in heavy_hitters(df, "k", 0.1, n_counters=16).collect()
    }
    assert got == expect


def test_heavy_hitters_empty_and_nulls(spark):
    empty = spark.createDataFrame([], "k long")
    assert heavy_hitters(empty, "k", 0.5).count() == 0
    nulls = spark.createDataFrame([(None,), (None,), (7,)], "k long")
    got = heavy_hitters(nulls, "k", 0.5).collect()
    # null keys ignored: key 7 holds 100% of the non-null mass
    assert [(r.k, r.n_rows) for r in got] == [(7, 1)]


def test_heavy_hitters_string_keys(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)], "k string"
    ).repartition(3)
    got = {r.k: (r.n_rows, r.share) for r in heavy_hitters(df, "k", 0.2).collect()}
    assert got == {"a": (6, 0.6), "b": (3, 0.3)}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=120),
    st.sampled_from([0.1, 0.2, 0.34]),
)
def test_heavy_hitters_matches_counter_model(spark, keys, share):
    from collections import Counter

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(3)
    counts = Counter(keys)
    expect = {k: c for k, c in counts.items() if c > share * len(keys)}
    got = {
        r.k: r.n_rows
        for r in heavy_hitters(df, "k", share, n_counters=16).collect()
    }
    assert got == expect


def test_keys_beyond_double_precision_survive(spark):
    big = 2**53
    rows = [(big + 1,)] * 8 + [(big + 3,)] * 2
    df = spark.createDataFrame(rows, "k long").repartition(2)
    got = {r.k: r.n_rows for r in heavy_hitters(df, "k", 0.5).collect()}
    # float64 coercion would collapse big+1 to big and lose the match
    assert got == {big + 1: 8}
