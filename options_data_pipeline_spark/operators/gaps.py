"""W1/T6 — lag-window gap detection over a time series.

Reference: a LAG CTE pairing each 1-minute candle with its predecessor and
filtering gaps > N minutes
(/root/reference/src/pipeline/collectors/binance_1m.py:372-387). The
reference's SQL implies a single global sort; we partition by the series
key so each series sorts independently — the version that survives 1000
executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_gaps(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str = "ts",
    min_gap_minutes: float = 5.0,
) -> DataFrame:
    """Rows (keys..., prev_ts, ts, gap_minutes) where the gap to the
    previous observation exceeds ``min_gap_minutes``."""
    w = Window.partitionBy(*keys).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    gap_min = (F.unix_micros(F.col(time_col)) - F.unix_micros(prev)) / 60_000_000.0
    return (
        df.withColumn("prev_ts", prev)
        .withColumn("gap_minutes", gap_min)
        .where(F.col("gap_minutes") > min_gap_minutes)
        .select(*keys, "prev_ts", F.col(time_col).alias("ts"), "gap_minutes")
    )


def gap_summary(gaps: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A7 — per-series gap counts and total missing minutes.

    The total is accumulated as exact integer microseconds and divided
    once at the end — summing the per-row double quotients (or casting
    them to DECIMAL) is not engine-portable.
    """
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    return (
        gaps.withColumn("__gap_us", gap_us)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("gap_count"),
            (F.sum("__gap_us").cast("double") / 60_000_000.0).alias(
                "total_gap_minutes"
            ),
            F.max("gap_minutes").alias("max_gap_minutes"),
        )
    )
