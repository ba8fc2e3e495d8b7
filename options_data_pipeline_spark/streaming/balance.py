"""Streaming clamped balance: the saturating fold as managed state.

Batch twin: :mod:`..operators.statefold` (``clamped_running_sum``).
The stream keeps each key's balance as ``applyInPandasWithState``
state and folds every micro-batch's rows into it — the accumulator
itself is the state, exactly the shape the batch operator's recursive
semantics demand (no window frame can express the per-step clamp, and
unlike the candle state the balance can NOT be recomputed from a
touched-bucket table scan: it depends on the entire history, so
managed state is the only streaming form).

Ordering contract: rows are folded in (ts, id) order *within* each
micro-batch, and batches fold in arrival order. A clamped fold is
path-dependent, so a late row cannot be retro-inserted into history —
the operator assumes a per-key in-order source (the T1 watermark-resume
ingest produces exactly that). The stream-equals-batch test pins the
in-order case bit-for-bit against the batch operator.

The kernel is self-contained (no module-global references): cloudpickle
must serialize it by value because the Python workers of a
caller-provided session cannot import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, balance double, n_events long"
STATE_SCHEMA = "bal long, n long"


def running_balance(
    events: DataFrame,
    *,
    lo: int = 0,
    hi: int = 50_000,
    divisor: float = 100.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming DataFrame -> per-user running clamped balance.

    Deltas are portable half-away cents (value positive, errors
    negative), identical to the batch ``capped_running_sum`` query.
    Emits the refreshed (user_id, balance, n_events) row per touched
    key per micro-batch (update mode).
    """
    cents = F.floor(F.abs(F.col(value_col)) * 100 + F.lit(0.5)).cast("long")
    sign = F.when(F.col(type_col) == "error", F.lit(-1)).otherwise(F.lit(1))
    keyed = events.where(F.col(value_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        (cents * sign).alias("delta"),
    )

    lo_i, hi_i = int(lo), int(hi)
    div = float(divisor)

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - NoTimeout below
            state.remove()
            return
        if state.exists:
            bal, n = state.get
        else:
            bal, n = 0, 0
        # a key's micro-batch rows can span multiple Arrow chunks
        # (default batch size 10k): concat ALL chunks, THEN sort — a
        # per-chunk sort folds chunks in arrival order, which is wrong
        # for a path-dependent clamped fold (ADVICE r3, medium)
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            pdf = pdf.sort_values(["ts", "event_id"])
            for d in pdf["delta"].astype("int64"):
                bal = bal + int(d)
                if bal > hi_i:
                    bal = hi_i
                elif bal < lo_i:
                    bal = lo_i
                n += 1
        state.update((int(bal), int(n)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "balance": [bal / div], "n_events": [n]}
        )

    return keyed.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
