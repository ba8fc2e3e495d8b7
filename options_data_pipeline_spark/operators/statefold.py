"""Clamped running fold — a sequential per-key accumulator that plain
window frames cannot express.

The recurrence

    S_0 = clamp(delta_0),   S_t = clamp(S_{t-1} + delta_t),
    clamp(x) = min(hi, max(lo, x))

models token buckets, bounded inventory, engagement meters: the clamp
*after every step* destroys the prefix-sum decomposition (``sum() OVER``
cannot represent the saturation), so this is a genuinely stateful
operator. The reference's closest relative is its incremental-watermark
resume loop (per-key sequential state carried across rows,
`/root/reference/src/pipeline/collectors/binance.py:147-156`); here it
is a first-class engine operator.

Execution: ``applyInPandas`` grouped by key — one shuffle on the key,
then an Arrow-batched in-memory fold per key. Per-key history must fit
in one task, the same contract as every grouped-map operator here.

100 TB posture: the fold IS parallelizable beyond that contract because
each step is a *capped affine map* ``f(x) = min(u, max(l, x + d))`` and
that 3-parameter family is closed under composition — so an
unbounded-key variant can two-phase it (compose per partition, prefix
the compositions across partitions, re-apply), exactly like a Blelloch
scan over function composition. We ship the grouped-map form because
per-user event history is bounded in this domain; the composition
decomposition is documented so the scale-out path is a refactor, not a
redesign.

Arithmetic contract: the caller pre-scales deltas to exact BIGINT
(e.g. cents via the repo's portable half-away rounding), the fold runs
on Python ints (arbitrary precision, no float accumulation), and the
final balance is one IEEE-exact division by the scale factor — so the
result is bit-deterministic under any partitioning and matches a
DuckDB recursive-CTE oracle exactly.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def clamped_running_sum(
    df: DataFrame,
    *,
    keys: Iterable[str],
    order: Iterable[str],
    delta_col: str,
    lo: int,
    hi: int,
    divisor: float = 100.0,
    out_col: str = "balance",
) -> DataFrame:
    """Per-key clamped running sum of the integer column ``delta_col``.

    ``lo``/``hi`` are integer bounds in the scaled domain. Output keeps
    ``keys + order`` plus ``out_col`` = clamped integer sum / ``divisor``
    as DOUBLE (one correctly-rounded division of an exact integer).
    """
    keys = list(keys)
    order = list(order)

    out_fields = [df.schema[c] for c in keys + order]
    schema = T.StructType(out_fields + [T.StructField(out_col, T.DoubleType())])

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort")
        out = []
        bal = 0
        first = True
        for d in pdf[delta_col]:
            step = int(d)
            bal = step if first else bal + step
            first = False
            bal = min(hi, max(lo, bal))
            out.append(bal / divisor)
        res = pdf[keys + order].copy()
        res[out_col] = pd.Series(out, index=pdf.index)
        return res

    return df.select(*keys, *order, delta_col).groupBy(*keys).applyInPandas(
        fold, schema=schema
    )


def clamped_running_sum_oracle_sql(
    *,
    source_cte: str,
    keys: str,
    order_cols: str,
    lo: int,
    hi: int,
    divisor: float = 100.0,
    out_col: str = "balance",
    select_cols: str,
) -> str:
    """DuckDB recursive-CTE twin of :func:`clamped_running_sum`.

    ``source_cte`` must define a relation ``src`` with the key columns,
    ordering columns, and a BIGINT ``delta`` column (pre-scaled the
    same way as the Spark side). The walk advances one row per key per
    iteration; recursion depth = max per-key row count.
    """
    clamp = f"least(CAST({hi} AS BIGINT), greatest(CAST({lo} AS BIGINT), {{x}}))"
    return f"""
WITH RECURSIVE {source_cte},
ordered AS (
    SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order_cols}) AS rn
    FROM src
),
walk AS (
    SELECT {select_cols}, rn,
           {clamp.format(x="delta")} AS bal
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT {", ".join("o." + c.strip() for c in select_cols.split(","))}, o.rn,
           {clamp.format(x="w.bal + o.delta")}
    FROM walk w
    JOIN ordered o ON {" AND ".join(f"o.{k.strip()} = w.{k.strip()}" for k in keys.split(","))}
                   AND o.rn = w.rn + 1
)
SELECT {select_cols}, CAST(bal AS DOUBLE) / {divisor} AS {out_col} FROM walk
"""
