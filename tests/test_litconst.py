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
