"""As-of join — the canonical time-series join Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` (optionally within a tolerance), per key. The
classic use: stamp every trade with the candle/index value prevailing at
trade time.

Spark-first implementation (no UDF, no per-key loop): UNION the two
sides with a source tag, then one window pass per key ordered by
(ts, side) taking ``last(right_value, ignorenulls=True)`` over the
preceding frame — the standard distributed formulation. Cost: ONE
shuffle on the key (the window partitioning); both inputs stream through
a single sort. This is the shape that survives billions of rows per key
group; a broadcast or bucketed variant falls out of the same plan when
either side allows it.

Ties (right.ts == left.ts): the right row sorts BEFORE the left row at
equal timestamps (side tag 0 < 1), so an exactly-simultaneous quote is
visible to the trade — matching DuckDB's ``ASOF JOIN`` (<=) semantics,
which the oracle uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Attach the latest ``right`` row at-or-before each ``left`` row.

    Right rows never match forward in time. Left rows with no prior
    right row (or none within ``tolerance_seconds``) keep NULLs.

    ``direction="forward"`` flips the semantics to the EARLIEST right
    row at-or-after each left row (pandas ``merge_asof`` directions):
    same single union+window pass, traversed in descending time order —
    the tie rule is unchanged (an exactly-simultaneous right row
    matches in both directions). ``direction="nearest"`` picks
    whichever of the two candidates is closer in absolute time (equal
    distance resolves backward, pandas-style); it runs BOTH window
    passes over the one unioned frame — two sorts but a single
    hash-partition exchange, since both windows share the key
    partitioning.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    on = list(on)
    right_cols = list(right_cols if right_cols is not None else
                      [c for c in right.columns if c not in (*on, right_ts)])

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType.simpleString()
        ).alias("__lrow"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    def fill(order_desc: bool, tag: str):
        t_order = F.col("__t").desc() if order_desc else F.col("__t").asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(t_order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return [
            F.last(F.col("__rts"), ignorenulls=True).over(w).alias(f"__rts_{tag}"),
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True)
                .over(w)
                .alias(f"__rf_{tag}_{c}")
                for c in right_cols
            ],
        ]

    if direction in ("backward", "forward"):
        tag = "b" if direction == "backward" else "f"
        filled = unioned.select(
            "*", *fill(direction == "forward", tag)
        ).where(F.col("__side") == 1)
        filled = filled.select(
            "*",
            F.col(f"__rts_{tag}").alias("__rts_filled"),
            *[F.col(f"__rf_{tag}_{c}").alias(f"__rf_{c}") for c in right_cols],
        )
        if tolerance_seconds is not None:
            gap = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__rts_filled"))
            if direction == "forward":
                gap = -gap
            in_tol = gap <= int(tolerance_seconds * 1_000_000)
        else:
            in_tol = F.lit(True)
    else:
        filled = unioned.select(
            "*", *fill(False, "b"), *fill(True, "f")
        ).where(F.col("__side") == 1)
        gap_b = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__rts_b"))
        gap_f = F.unix_micros(F.col("__rts_f")) - F.unix_micros(F.col("__t"))
        tol_us = (
            int(tolerance_seconds * 1_000_000)
            if tolerance_seconds is not None
            else None
        )
        ok_b = F.col("__rts_b").isNotNull() & (
            F.lit(True) if tol_us is None else (gap_b <= tol_us)
        )
        ok_f = F.col("__rts_f").isNotNull() & (
            F.lit(True) if tol_us is None else (gap_f <= tol_us)
        )
        # backward wins ties (pandas nearest semantics)
        use_b = ok_b & (~ok_f | (gap_b <= gap_f))
        pick = lambda b, f: F.when(use_b, b).otherwise(F.when(ok_f, f))
        filled = filled.select(
            "*",
            pick(F.col("__rts_b"), F.col("__rts_f")).alias("__rts_filled"),
            *[
                pick(F.col(f"__rf_b_{c}"), F.col(f"__rf_f_{c}")).alias(f"__rf_{c}")
                for c in right_cols
            ],
        )
        in_tol = F.lit(True)  # already folded into the pick
    keep = F.col("__rts_filled").isNotNull() & in_tol
    out_right = [
        F.when(keep, F.col(f"__rf_{c}")).alias(f"{c}{suffix}") for c in right_cols
    ]
    left_names = [f for f in left.columns]
    return filled.select(
        *[F.col("__lrow")[c].alias(c) for c in left_names],
        F.when(keep, F.col("__rts_filled")).alias(f"{right_ts}{suffix}"),
        *out_right,
    )
