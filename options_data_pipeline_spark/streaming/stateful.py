"""Custom stateful streaming: running candles via applyInPandasWithState.

The foreachBatch MERGE job (:mod:`.candles`) recomputes touched buckets
from storage — the right default. This module is the OTHER stateful
shape the engine supports: keeping the aggregate itself as managed
streaming state with ``applyInPandasWithState``, for operators whose
state cannot be recomputed from a table scan (true custom accumulators,
e.g. order-book reconstruction). Here the state is the running OHLC of
each (instrument, hour): each micro-batch folds its rows into the state
and emits the refreshed candle — update-mode output from arbitrary
Python state, with GroupStateTimeout handling eviction.

The kernel is deliberately self-contained (no module-global references):
cloudpickle must serialize it by value because the Python workers of a
caller-provided session cannot import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "instrument string, bucket_ts timestamp, open double, high double,"
    " low double, close double, n_ticks long"
)
STATE_SCHEMA = (
    "open double, high double, low double, close double,"
    " n_ticks long, last_ts long, last_id long, first_ts long, first_id long"
)


def running_candles(
    events: DataFrame,
    instrument_col: str = "event_type",
    ts_col: str = "ts",
    price_col: str = "value",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming DataFrame -> per-(instrument, hour) running candles.

    ``timeout_minutes`` enables processing-time state eviction for
    long-running continuous queries. Leave it None for availableNow /
    drain-style runs: with a processing-time timeout armed, Spark keeps
    scheduling batches to fire future timeouts and an availableNow query
    never terminates.
    """
    keyed = events.select(
        F.col(instrument_col).alias("instrument"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
        F.col(ts_col).alias("ts"),
        F.col(price_col).alias("price"),
        F.col(id_col).alias("event_id"),
    )

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            o, h, lo, c, n, last_ts, last_id, first_ts, first_id = state.get
        else:
            o = h = lo = c = None
            n, last_ts, last_id = 0, -1, -1
            first_ts, first_id = None, None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, price, eid in zip(
                pdf["ts"].astype("int64"), pdf["price"], pdf["event_id"]
            ):
                if o is None:
                    o = h = lo = c = float(price)
                    first_ts, first_id = int(ts), int(eid)
                else:
                    h = max(h, float(price))
                    lo = min(lo, float(price))
                # first-by-(ts, id): a late row that precedes the recorded
                # first must become the open (symmetric with the close guard)
                if (ts, eid) <= (first_ts, first_id):
                    o = float(price)
                    first_ts, first_id = int(ts), int(eid)
                # last-by-(ts, id): late rows must not overwrite close
                if (ts, eid) >= (last_ts, last_id):
                    c = float(price)
                    last_ts, last_id = int(ts), int(eid)
                n += 1
        state.update((o, h, lo, c, n, last_ts, last_id, first_ts, first_id))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60_000)
        yield pd.DataFrame(
            {
                "instrument": [key[0]],
                "bucket_ts": [key[1]],
                "open": [o], "high": [h], "low": [lo], "close": [c],
                "n_ticks": [n],
            }
        )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("instrument", "bucket_ts").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
