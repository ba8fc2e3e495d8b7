"""Distributed exact prefix sums over grouped, value-ordered data.

The quantile family's scale problem (VERDICT r11 #1): an ordered
cumulative window ``Window.partitionBy(group).orderBy(value)`` funnels
EVERY row of a group through one task's sort.  When the group key is a
low-cardinality enum (event types, languages, markets), that task sees
~1/|groups| of the table — the classic 100 TB scale-killer.

Two observations turn every exact-quantile computation in this repo
into a fully parallel plan, exactly (not approximately):

1. **Order statistics only need VALUE-level cumulative weights.**  The
   q-quantile is the smallest value v with CW(v) >= threshold, where
   CW(v) = Σ weight over rows with value <= v — the row-level tiebreak
   order (event_id etc.) never changes which VALUE first crosses any
   threshold.  So the row-level window collapses onto a map-side-
   combined ``groupBy(group, value)`` pre-aggregate whose output is
   |distinct values| rows, and which is immune to heavy single-value
   tie skew by construction.

2. **Over distinct values, the cumulative sum decomposes into the
   two-level segment prefix sum** (the ``pack_token_shards`` algebra,
   :mod:`.packing`): segments are contiguous value intervals (any
   monotone bucketing — ``floor(value / width)`` — qualifies), so

       global_cum = Σ (whole earlier segments)  +  local running sum

   Level 1 windows run per (group, segment) in parallel, each bounded
   by its segment's distinct-value count; level 2 runs over the
   per-segment totals — ONE row per segment, data-size-independent —
   and broadcasts back.  No task ever sees more than one segment of
   one group's distinct values.

Used by ``plans/quality.py``: `weighted_median` (weighted quantiles),
`conformal_interval` (single order-statistic selection), and
`value_percentiles` (interpolated percentiles from the two bracketing
order statistics).  Reference parity: the reference computes order
statistics inside PostgreSQL (``percentile_cont``), which hides the
same distribution problem this module solves engine-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default value-segment width — a tunable, not a correctness knob:
#: any width yields identical results, it only sets level-1 task size.
DEFAULT_SEG_WIDTH = 16.0


def grouped_value_prefix(
    df: DataFrame,
    groups: list[str],
    value_col: str = "value",
    weight_col: Column | None = None,
    seg_width: float = DEFAULT_SEG_WIDTH,
) -> DataFrame:
    """Per (``groups``, distinct ``value_col``): the exact inclusive
    cumulative weight ``cum`` in value order, plus the group total
    ``tw`` — computed with zero unbounded-group windows.

    ``weight_col`` defaults to 1 per row (plain cumulative counts).
    Output columns: ``*groups, value, vw (this value's weight), cum
    (inclusive cumulative weight), tw (group total)``.  All weight
    arithmetic is exact (long); the caller picks thresholds.
    """
    w = (weight_col if weight_col is not None else F.lit(1)).cast("long")
    vw = (
        df.select(*groups, F.col(value_col).alias("value"), w.alias("w"))
        .groupBy(*groups, "value")
        .agg(F.sum("w").alias("vw"))
    )
    with_seg = vw.withColumn(
        "__seg", F.floor(F.col("value") / F.lit(seg_width)).cast("long")
    )
    # level 1: local inclusive cumsum inside each (group, segment)
    w_local = (
        Window.partitionBy(*groups, "__seg")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_seg.withColumn("__local_cum", F.sum("vw").over(w_local))
    # level 2: per-segment totals -> exclusive running offset per group
    # (one row per segment regardless of data size), broadcast back
    w_seg = (
        Window.partitionBy(*groups)
        .orderBy("__seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_seg.groupBy(*groups, "__seg")
        .agg(F.sum("vw").alias("__seg_total"))
        .withColumn(
            "__offset",
            F.coalesce(F.sum("__seg_total").over(w_seg), F.lit(0)),
        )
        .select(*groups, "__seg", "__offset")
    )
    tot = vw.groupBy(*groups).agg(F.sum("vw").alias("tw"))
    return (
        local.join(F.broadcast(offsets), [*groups, "__seg"])
        .join(F.broadcast(tot), list(groups))
        .select(
            *groups,
            "value",
            "vw",
            (F.col("__local_cum") + F.col("__offset")).alias("cum"),
            "tw",
        )
    )


def grouped_rank_select(
    prefix: DataFrame,
    groups: list[str],
    rank: Column,
) -> DataFrame:
    """From a :func:`grouped_value_prefix` frame: per group, the
    smallest value whose inclusive cumulative weight reaches ``rank``
    (a Column over the prefix frame's columns, e.g. a function of
    ``tw``).  Output: ``*groups, value, tw``."""
    return (
        prefix.where(F.col("cum") >= rank)
        .groupBy(*groups)
        .agg(F.min("value").alias("value"), F.max("tw").alias("tw"))
    )
