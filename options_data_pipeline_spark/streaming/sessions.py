"""Streaming session windows: native gap-based sessionization.

The batch engine computes user sessions with the gaps-and-islands
pattern (``plans/quality.py:q_user_sessions``). On a live stream that
shape is a native ``session_window`` aggregate: Spark keeps one open
window per key in the state store, extends it while events arrive
within the gap, and EMITS the session once the event-time watermark
passes its close — the streaming twin of the batch query, with state
bounded by (open sessions x keys), not stream history.

Reference parity: the reference's session logic is batch SQL over
landed tables (aggregators/sessions.py); this is the form a multi-feed
engine needs when sessions must close in near-real-time. Output mode is
append (sessions are immutable once the watermark seals them), so the
sink can be an idempotent parquet/Delta append.

Scale notes: the aggregate hash-partitions on the session key once;
session state lives in the per-partition state store (RocksDB in
production). The watermark must be >= the session gap, or late events
re-open sealed sessions' keyspace for nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_user_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key gap sessions over a streaming DataFrame.

    Returns (key, session_start, session_end, n_events, first_ts,
    last_ts): one row per sealed session in append mode.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )
