"""Stream-stream joins: event-time interval join with bounded state.

The reference never joins two live feeds (its collectors land each feed
in its own table and PostgreSQL joins at rest), but a multi-feed engine
needs the streaming form: e.g. attribute each option trade to the quote
snapshot that preceded it, or each purchase to the views that led to it,
while both feeds are still flowing.

Spark semantics: both sides carry a watermark and the join condition
carries an *event-time interval constraint*; together they bound the
join state — each side buffers only rows younger than (watermark +
interval width), so state is O(rate x window), independent of stream
lifetime. That is the property that keeps a 1000-executor streaming job
alive for months; an unconstrained stream-stream join would buffer the
full history.

Scale notes:
- the join keys hash-partition both streams once; state lives in the
  per-partition state store (RocksDB in production, versioned by the
  checkpoint), so recovery replays the checkpoint, not the streams.
- the interval predicate is part of the join condition, not a
  post-filter — Spark uses it to derive the state-eviction policy
  (``StreamingSymmetricHashJoin`` shows ``watermark pruning`` in the
  plan). A post-filter form would keep state forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right row's event time falls
    in ``(left_ts - lookback, left_ts]`` — "right events that immediately
    preceded the left event" (attribution shape).

    Columns are disambiguated with ``l_``/``r_`` prefixes so the caller
    gets a flat, collision-free schema.
    """
    lpre = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    rpre = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    lw = lpre.withWatermark(f"l_{left_ts}", watermark)
    rw = rpre.withWatermark(f"r_{right_ts}", watermark)
    cond: Column = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            > F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return lw.join(rw, cond, join_type)
