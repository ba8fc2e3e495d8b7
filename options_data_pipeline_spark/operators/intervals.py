"""Interval (range) join: points against [start, end) intervals.

Spark has no native range-join optimization (Databricks' range-join hint
is proprietary); the naive formulation — a join whose only condition is
``start < ts AND ts < end`` — becomes BroadcastNestedLoopJoin or a
cartesian product, O(points x intervals), which is the canonical
scale-killer. This operator rewrites it as an *equi*-join by
discretizing time into fixed buckets:

- each interval explodes into the buckets it overlaps (``sequence``
  between the truncated endpoints — a narrow fan-out bounded by
  interval_length / bucket);
- each point maps to exactly ONE bucket (its truncation);
- the join is then a hash equi-join on (key..., bucket) with the exact
  range predicate as a residual filter.

Because a point owns a single bucket, a (point, interval) pair can meet
at most once — no post-join dedup is needed. Bucket keys are time-
uniform, so the shuffle has no skew cliff; pick ``bucket`` so that the
typical interval expands to a handful of rows (cost is
intervals x avg_buckets_per_interval extra rows, traded against the
quadratic nested-loop).

Reference parity: the reference's repair loop re-scans gap windows one
by one from the driver (binance_1m.py:354-507); this is the set-based
equivalent a 1000-executor cluster needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET = "hour"


def explode_interval_buckets(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket: str = DEFAULT_BUCKET,
) -> DataFrame:
    """One row per (interval, covered bucket): narrow sequence+explode."""
    seq = F.sequence(
        F.date_trunc(bucket, F.col(start_col)),
        F.date_trunc(bucket, F.col(end_col)),
        F.expr(f"interval 1 {bucket}"),
    )
    return intervals.withColumn("__bucket", F.explode(seq))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket: str = DEFAULT_BUCKET,
    how: str = "inner",
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join each point to every interval with ``start < ts < end``
    (half-open on both sides — gap semantics: the endpoints are real
    observations, the inside is missing).

    ``keys`` are equality columns that must also match (they ride in the
    shuffle key with the bucket). The returned frame carries all columns
    of both inputs except the helper bucket.
    """
    exploded = explode_interval_buckets(intervals, start_col, end_col, bucket)
    pts = points.withColumn(
        "__bucket", F.date_trunc(bucket, F.col(point_ts))
    )
    cond = pts["__bucket"] == exploded["__bucket"]
    for k in keys:
        cond = cond & (pts[k] == exploded[k])
    cond = (
        cond
        & (pts[point_ts] > exploded[start_col])
        & (pts[point_ts] < exploded[end_col])
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    joined = pts.join(exploded, cond, how)
    return joined.drop("__bucket")
