"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
built-in ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
expressions).

The 100 TB pattern this enables: per-partition / per-day / per-segment
sketches are small binary columns that persist in a stats table and
UNION losslessly — a global distinct count is an aggregate over sketches
(bytes), not a re-scan of raw data. ``approx_count_distinct`` alone
cannot do this: it returns a number, not a reusable state.

Everything here is JVM-side expression work — no UDFs, partial
aggregation applies, and the sketch columns shuffle like any binary
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2 of the number of HLL registers; 12 -> ~1.6% relative standard error
DEFAULT_LGK = 12


def segment_sketches(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch per segment: (segment, sketch BINARY, estimate).

    The sketch column is the durable artifact — store it and later
    :func:`merge_estimate` any subset of segments without rescanning.
    """
    return df.groupBy(segment_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
    ).select(
        segment_col,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("estimate"),
    )


def merge_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union a set of sketches into one global distinct estimate —
    an aggregate over sketch BYTES (no raw-data rescan)."""
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).alias("estimate")
    )
