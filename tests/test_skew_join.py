"""Differentiated fact-fact skew join (operators.skew.skewed_fact_join):
result-equality vs the plain join under genuinely skewed keys, plus the
hot/salted path actually engaging (VERDICT r3 ask #7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.skew import salted_join, skewed_fact_join


def _skewed_frames(spark):
    # key 0 is pathologically hot (~50% of rows), a long uniform tail
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(97)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") * 3).alias("lv"),
    )
    right = spark.range(0, 500).select(
        F.when(F.col("id") % 3 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(97)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") + 100).alias("rv"),
    )
    return left, right


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_skewed_fact_join_equals_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k", "inner")
    salted = skewed_fact_join(left, right, on="k", n_salts=4, n_hot=3)
    assert _canon(salted) == _canon(plain)


def test_skewed_fact_join_salt_expansion_in_plan(spark):
    left, right = _skewed_frames(spark)
    out = skewed_fact_join(left, right, on="k", n_salts=4, n_hot=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the hot path replicates right-hot rows via explode(sequence(...))
    assert "Generate" in plan, plan
    # and both the hot and cold branches union back together
    assert "Union" in plan, plan


def test_skewed_fact_join_no_hot_keys_degenerates_to_plain(spark):
    left = spark.range(0, 50).select(F.col("id").alias("k"), F.col("id").alias("lv"))
    right = spark.range(0, 50).select(F.col("id").alias("k"), F.col("id").alias("rv"))
    out = skewed_fact_join(left, right, on="k", n_salts=4, n_hot=5)
    plain = left.join(right, "k", "inner")
    assert _canon(out) == _canon(plain)


def test_skewed_fact_join_null_keys_dropped_like_inner(spark):
    left = spark.createDataFrame(
        [(None, 1), (1, 2), (1, 3), (2, 4)], "k int, lv int"
    )
    right = spark.createDataFrame(
        [(None, 10), (1, 20), (2, 30)], "k int, rv int"
    )
    out = skewed_fact_join(left, right, on="k", n_salts=2, n_hot=2)
    plain = left.join(right, "k", "inner")
    assert _canon(out) == _canon(plain)


def test_salted_join_still_equals_plain(spark):
    left, right = _skewed_frames(spark)
    dim = right.dropDuplicates(["k"])
    plain = left.join(dim, "k", "inner")
    salted = salted_join(left, dim, on=["k"], n_salts=4)
    assert _canon(salted) == _canon(plain)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 99)), min_size=1, max_size=60
    ),
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 99)), min_size=1, max_size=30
    ),
)
def test_skewed_fact_join_matches_plain_join_model(spark, lrows, rrows):
    # empty-side cases are covered by the degenerate-input tests
    left = spark.createDataFrame(lrows, "k int, lv int")
    right = spark.createDataFrame(rrows, "k int, rv int")
    out = skewed_fact_join(left, right, on="k", n_salts=3, n_hot=2)
    plain = left.join(right, "k", "inner")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_skew_gate_waves_through_unskewed_input(spark):
    """ADVICE r4: with no key above skew_factor x mean, the plain join
    comes back untouched — no isin filters, no salt expansion."""
    left = spark.range(0, 300).select(
        F.pmod(F.col("id"), F.lit(50)).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 100).select(
        F.pmod(F.col("id"), F.lit(50)).alias("k"), F.col("id").alias("rv")
    )
    out = skewed_fact_join(left, right, on="k", n_salts=4, n_hot=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode(sequence(...)) hot branch
    assert _canon(out) == _canon(left.join(right, "k", "inner"))


def test_skew_gate_still_engages_on_real_skew(spark):
    left, right = _skewed_frames(spark)  # key 0 holds ~50% of rows
    out = skewed_fact_join(left, right, on="k", n_salts=4, n_hot=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    assert _canon(out) == _canon(left.join(right, "k", "inner"))


def test_spread_duplicates_scatters_identical_rows(spark, tmp_path):
    """VERDICT r4 ask #6: value-identical duplicate rows of a hot key
    must spread across salts (via (key, file, row-ordinal) hashing)
    while results stay exactly the plain join."""
    from options_data_pipeline_spark.operators.skew import duplicate_spread_salt

    n_salts = 4
    # duplicate-heavy: 800 value-IDENTICAL rows of hot key 0 + a tail
    rows = [(0, 7)] * 800 + [(k, k) for k in range(1, 40)]
    lpath = str(tmp_path / "left")
    spark.createDataFrame(rows, "k int, lv int").write.parquet(lpath)
    left = spark.read.parquet(lpath)
    right = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 20), (2, 30)], "k int, rv int"
    )
    out = skewed_fact_join(
        left, right, on="k", n_salts=n_salts, n_hot=2,
        spread_duplicates=True,
    )
    plain = left.join(right, "k", "inner")
    assert _canon(out) == _canon(plain)

    # the spread itself: the hot key's 800 identical rows must not pile
    # on one salt — max per-salt share < 2/n_salts
    shares = (
        left.where(F.col("k") == 0)
        .select(duplicate_spread_salt("k", n_salts).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(shares) == n_salts
    assert max(r["count"] for r in shares) / 800 < 2 / n_salts

    # the old full-row-value salt puts all 800 on ONE salt — the
    # straggler this flag exists to break up
    value_salt = F.pmod(
        F.xxhash64(F.col("k"), F.col("lv")), F.lit(n_salts)
    )
    assert (
        left.where(F.col("k") == 0).select(value_salt.alias("s")).distinct().count()
        == 1
    )
