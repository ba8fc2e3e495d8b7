"""A5 — trade -> hourly option OHLC, the reference's richest aggregate.

Reference: one PostgreSQL statement computing 24 output columns per
(hour, instrument, expiry, strike, option_type) group
(/root/reference/src/pipeline/aggregators/option_ohlc.py:49-93):
first/last price by time, max/min, null-skipping first/last IV and mark
price, VWAP with zero-volume guard, volume, trade count, time-ordered CSV
of trade ids, hours-to-expiry (floored at 1), first non-null index price,
and signed moneyness distance.

Spark-first shape: a single ``groupBy().agg()`` — every ordered-first
pattern is ``min_by``/``max_by`` over a struct ordering key whose leading
field pushes NULL metric rows last, so PG's
``ARRAY_AGG(... ORDER BY ts) FILTER (WHERE x IS NOT NULL)[1]`` becomes a
one-pass, map-side-combinable aggregate with no window and no sort. The
only non-scalar state is ``collect_list`` for the trade-id CSV (bounded by
trades-per-hour-per-instrument, which is small by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ord(time_col: str, tiebreaks: Sequence[str]) -> Column:
    return F.struct(
        F.col(time_col).alias("t"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreaks)],
    )


def _first_nonnull(col: str, time_col: str, tiebreaks: Sequence[str]) -> Column:
    """First value of ``col`` by time, skipping NULLs (NULL rows sort last)."""
    null_last = F.struct(
        F.when(F.col(col).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("nl"),
        F.col(time_col).alias("t"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreaks)],
    )
    return F.min_by(col, null_last)


def _last_nonnull(col: str, time_col: str, tiebreaks: Sequence[str]) -> Column:
    null_first = F.struct(
        F.when(F.col(col).isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("nn"),
        F.col(time_col).alias("t"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreaks)],
    )
    return F.max_by(col, null_first)


def option_ohlc_hourly(
    trades: DataFrame,
    time_col: str = "timestamp",
    tiebreaks: Sequence[str] = ("trade_seq",),
    price_dec: str = "decimal(18,2)",
    amount_dec: str = "decimal(14,2)",
) -> DataFrame:
    """Aggregate option trades into hourly OHLC rows.

    Expects columns: trade_id (string), ``time_col``, instrument_name,
    expiry_date, strike, option_type, price, amount, iv, mark_price,
    index_price (nullable metrics nullable). Sums go through exact DECIMAL
    accumulation so results are independent of partitioning.
    """
    hour = F.date_trunc("hour", F.col(time_col))
    order = _ord(time_col, tiebreaks)
    pxd = F.col("price").cast(price_dec)
    amd = F.col("amount").cast(amount_dec)

    df = trades.withColumn("hour_timestamp", hour)
    agg = df.groupBy(
        "hour_timestamp", "instrument_name", "expiry_date", "strike", "option_type"
    ).agg(
        F.min_by("price", order).alias("open_price"),
        F.max("price").alias("high_price"),
        F.min("price").alias("low_price"),
        F.max_by("price", order).alias("close_price"),
        _first_nonnull("iv", time_col, tiebreaks).alias("open_iv"),
        F.max("iv").alias("high_iv"),
        F.min("iv").alias("low_iv"),
        _last_nonnull("iv", time_col, tiebreaks).alias("close_iv"),
        F.sum(pxd * amd).cast("double").alias("__pv"),
        F.sum(amd).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("trade_count"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(time_col).alias("t"),
                            *[
                                F.col(c).alias(f"tb{i}")
                                for i, c in enumerate(tiebreaks)
                            ],
                            F.col("trade_id").alias("id"),
                        )
                    )
                ),
                lambda x: x["id"],
            ),
            ",",
        ).alias("trade_ids"),
        _first_nonnull("mark_price", time_col, tiebreaks).alias("mark_price_open"),
        F.max("mark_price").alias("mark_price_high"),
        F.min("mark_price").alias("mark_price_low"),
        _last_nonnull("mark_price", time_col, tiebreaks).alias("mark_price_close"),
        _first_nonnull("index_price", time_col, tiebreaks).alias("index_price"),
    )

    # hours_to_expiry: expiry date + 08:00 minus the hour bucket, floored at 1
    # (option_ohlc.py:80). Whole-hour boundaries => exact integer division.
    expiry_ts = F.col("expiry_date").cast("timestamp") + F.expr("INTERVAL 8 HOURS")
    hte = (
        (F.unix_timestamp(expiry_ts) - F.unix_timestamp(F.col("hour_timestamp")))
        / 3600
    ).cast("long")
    idx0 = F.col("index_price")
    idx0_guard = F.when(idx0 == 0, F.lit(None)).otherwise(idx0)
    distance = (
        F.when(
            F.col("option_type") == "C", (idx0 - F.col("strike")) / idx0_guard * 100.0
        )
        .when(
            F.col("option_type") == "P", (F.col("strike") - idx0) / idx0_guard * 100.0
        )
        .otherwise(F.lit(None).cast("double"))
    )
    vwap = F.when(F.col("volume") == 0, F.lit(None).cast("double")).otherwise(
        F.col("__pv") / F.col("volume")
    )

    return (
        agg.withColumn("vwap", vwap)
        .withColumn("hours_to_expiry", F.greatest(F.lit(1).cast("long"), hte))
        .withColumn("distance", distance)
        .drop("__pv")
    )
