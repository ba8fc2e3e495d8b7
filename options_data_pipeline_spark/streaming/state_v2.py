"""Arbitrary stateful streaming on the Spark 4 ``transformWithState``
API (StatefulProcessor) — the successor to ``applyInPandasWithState``
used in :mod:`.stateful`.

Why both exist in this engine: ``applyInPandasWithState`` is the
GA-everywhere API; ``transformWithState`` adds typed state primitives
(ValueState/ListState/MapState), per-state TTL, and timers, and is
where new stateful operators should land. The operator here — running
per-key totals that survive micro-batches — is deliberately the
simplest shape that proves the machinery: state schema declaration,
read-modify-write per key, emission in update mode.

The processor class must be importable on executors (standard package
deployment), like any package-defined UDF.

Environment gate: the transformWithState protocol speaks protobuf
between the JVM and the Python state server; this container ships no
``google.protobuf``, so :func:`running_totals` raises
``NotImplementedError`` here (capability-probed, like the PIL-gated
media decode) and the test is skipif-gated. Where protobuf exists the
operator runs as-is — the gate is the environment, not the code.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

OUTPUT_SCHEMA = "event_type string, n_events long, value_total double"


class RunningTotals(StatefulProcessor):
    """Per-key running (count, sum) across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        if self._state.exists():
            prev = self._state.get()
            n, total = int(prev[0]), float(prev[1])
        for pdf in rows:
            vals = pdf["value"].dropna()
            n += int(len(vals))
            total += float(vals.sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "value_total": [total]}
        )

    def close(self) -> None:
        pass


try:  # the state-server protocol needs protobuf, absent here
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-type running totals; emit the updated totals row
    for every key seen in each micro-batch (update output mode)."""
    if not HAS_PROTOBUF:
        raise NotImplementedError(
            "transformWithState requires google.protobuf, which is not "
            "installed; use streaming.stateful (applyInPandasWithState) "
            "for the GA stateful API in this environment"
        )
    return events.groupBy("event_type").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
