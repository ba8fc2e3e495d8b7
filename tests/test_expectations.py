"""Declarative expectations operator: rule semantics on synthetic frames
(null handling, duplicates weighted by count, null FK = violation), and
the single-aggregate plan shape for narrow rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.expectations import (
    check,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)


def _result(df):
    return {r.rule: (r.total_rows, r.violations, r.passed) for r in df.collect()}


def test_narrow_rules_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a@x.io"), (2, None, "bad"), (3, 99.0, None), (4, -1.0, "c@y.z")],
        "id int, v double, email string",
    )
    got = _result(
        check(
            df,
            [
                not_null("v"),
                in_range("v", 0.0, 50.0),
                matches("email", r"^[^@]+@[^@]+$"),
                in_set("id", (1, 2, 3)),
            ],
        )
    )
    # nulls count as violations for every narrow rule
    assert got["not_null(v)"] == (4, 1, False)
    assert got["in_range(v,0.0,50.0)"] == (4, 3, False)  # None, 99.0, -1.0
    assert got["matches(email,^[^@]+@[^@]+$)"] == (4, 2, False)  # 'bad', None
    assert got["in_set(id,1|2|3)"] == (4, 1, False)


def test_unique_counts_all_rows_of_duplicated_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k int"
    )
    got = _result(check(df, [unique("k")]))
    assert got["unique(k)"] == (5, 3, False)  # the three k=1 rows


def test_foreign_key_null_and_missing(spark):
    df = spark.createDataFrame([(1,), (2,), (None,), (9,)], "k int")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "rk int")
    got = _result(check(df, [foreign_key("k", ref, "rk")]))
    # 9 (absent) and NULL (no referent) are both violations
    assert got["foreign_key(k)"] == (4, 2, False)


def test_all_green_contract(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    got = _result(check(df, [not_null("k"), unique("k"), in_set("s", ("a", "b"))]))
    assert all(v[2] for v in got.values())


def test_narrow_rules_share_one_aggregate(spark):
    df = spark.createDataFrame([(1, 2.0)], "k int, v double")
    out = check(
        df, [not_null("k"), in_range("v", 0.0, 9.0), in_set("k", (1, 2))]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # three narrow rules, ONE scan of the input (no per-rule passes)
    assert plan.count("Scan ExistingRDD") <= 1, plan


def test_freshness_rule(spark):
    from options_data_pipeline_spark.operators.expectations import fresh

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 11:30:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    # newest row 11:30; as_of 12:00 with 1h budget -> fresh
    ok = _result(check(df, [fresh("ts", "2024-01-01 12:00:00", "1 hour")]))
    assert ok["fresh(ts,2024-01-01 12:00:00,1 hour)"] == (2, 0, True)
    # as_of 13:00 with 1h budget -> stale (single table-level violation)
    stale = _result(check(df, [fresh("ts", "2024-01-01 13:00:00", "1 hour")]))
    assert stale["fresh(ts,2024-01-01 13:00:00,1 hour)"] == (2, 1, False)


def test_empty_frame_reports_zero_violations(spark):
    df = spark.createDataFrame([], "k int, v double")
    got = _result(check(df, [not_null("v"), unique("k")]))
    assert got["not_null(v)"] == (0, 0, True)
    assert got["unique(k)"] == (0, 0, True)


def test_rule_params_with_quotes_do_not_break_sql(spark):
    df = spark.createDataFrame([("O'Brien",), ("bad`name",)], "s string")
    got = _result(
        check(df, [matches("s", r"^O'"), in_set("s", ("O'Brien", "x`y"))])
    )
    assert got[r"matches(s,^O')"] == (2, 1, False)
    assert got["in_set(s,O'Brien|x`y)"] == (2, 1, False)


def test_fresh_validates_params():
    """ADVICE r4: fresh() params are validated up front and the bound is
    built with Column APIs — malformed/injection-shaped input fails at
    the constructor, not deep inside evaluation."""
    import pytest as _pt

    from options_data_pipeline_spark.operators.expectations import fresh

    fresh("ts", "2024-01-02 03:04:05", "2 hours")  # ok
    fresh("ts", "2024-01-02T03:04:05.123", "1 day")  # ok
    with _pt.raises(ValueError, match="as_of"):
        fresh("ts", "2024-01-02 03:04:05' --", "2 hours")
    with _pt.raises(ValueError, match="max_age"):
        fresh("ts", "2024-01-02 03:04:05", "2 hours' OR '1'='1")
    with _pt.raises(ValueError, match="max_age"):
        fresh("ts", "2024-01-02 03:04:05", "eleventy hours")


def test_fresh_accepts_pre_r5_grammar(spark):
    """ADVICE r6: the strict regexes introduced in r5 silently dropped
    date-only as_of strings and month/year max-age units the pre-r5 API
    accepted. Both are back in the grammar (date-only = midnight)."""
    from options_data_pipeline_spark.operators.expectations import fresh

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    # date-only as_of: 2024-01-02 == midnight; 1 day budget -> fresh
    ok = _result(check(df, [fresh("ts", "2024-01-02", "1 day")]))
    assert ok["fresh(ts,2024-01-02,1 day)"] == (1, 0, True)
    # month/year units parse and evaluate
    ok2 = _result(check(df, [fresh("ts", "2024-02-20", "2 months")]))
    assert ok2["fresh(ts,2024-02-20,2 months)"] == (1, 0, True)
    stale = _result(check(df, [fresh("ts", "2025-06-01", "1 year")]))
    assert stale["fresh(ts,2025-06-01,1 year)"] == (1, 1, False)
