"""litconst's core claim, property-tested: a repr-rendered SQL double
literal parses to the bit-identical value F.lit would have produced —
including negative zero, subnormals, and round-trip-hostile decimals."""

from __future__ import annotations

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from options_data_pipeline_spark.functions.litconst import (
    double_array_sql,
    lit_double_array,
)


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=8,
    )
)
def test_parsed_literals_are_bit_identical(spark, vals):
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        lit_double_array(vals).alias("a"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("b"),
    )
    row = df.collect()[0]
    assert [_bits(x) for x in row.a] == [_bits(x) for x in row.b]
    assert [_bits(x) for x in row.a] == [_bits(float(v)) for v in vals]


def test_awkward_values_render_and_parse(spark):
    vals = [-0.0, 5e-324, 1.7976931348623157e308, 0.1, -2.5e-10, 123456789.123456789]
    row = spark.range(1).select(lit_double_array(vals).alias("a")).collect()[0]
    assert [_bits(x) for x in row.a] == [_bits(v) for v in vals]
    # and the SQL text itself is pure array(...D) literals
    assert double_array_sql([0.1]).startswith("array(0.1")


def test_negative_zero_sign_preserved(spark):
    import pyspark.sql.functions as F

    row = (
        spark.range(1)
        .select(F.element_at(lit_double_array([-0.0]), 1).alias("z"))
        .collect()[0]
    )
    assert math.copysign(1.0, row.z) == -1.0


def test_hof_lambda_lateral_alias_shadowing(spark):
    """Spark 4 resolution hazard, pinned (found by crr_binomial_price in
    round 8): inside a HIGHER-ORDER-FUNCTION lambda, F.col("x") resolves
    laterally against an alias defined earlier in the SAME select list,
    while a plain expression resolves against the input frame. A select
    that emits round(x).alias("x") and also evaluates an F.aggregate
    fold referencing F.col("x") therefore folds over the ROUNDED value —
    queries must never shadow an input name an HOF lambda still needs
    (split the select; see q_crr_binomial_price)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(1).alias("g"), F.lit(1.23456789).alias("v"))
    g = df.groupBy("g").agg(F.sum("v").alias("x"))
    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(1)), F.lit(0.0), lambda acc, k: acc + F.col("x")
    )
    row = g.select(
        F.round(F.col("x"), 2).alias("x"),
        (F.col("x") * 1e8).alias("plain"),
        fold.alias("in_lambda"),
    ).collect()[0]
    # plain expression: the INPUT column (unrounded; the float product
    # of 1.23456789 * 1e8 lands one ulp under the integer)
    assert row.plain == 1.23456789 * 1e8 and row.plain != 1.23 * 1e8
    # lambda body: the LATERAL alias (rounded) — the hazard this test pins
    assert row.in_lambda == 1.23
