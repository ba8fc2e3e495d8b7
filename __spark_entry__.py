"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-session OHLC rollup on the
sf0.001 smoke data; ``queries()``/``oracle_sql()`` expose the full
registry from :mod:`options_data_pipeline_spark.plans.registry` — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB
oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from options_data_pipeline_spark.plans import registry as _registry

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    min_rows=1 relaxes the P7 sufficiency guard because the sf0.001 events
    stream is too sparse to fill 20 hourly candles per day; the guarded
    variant is what `queries()['daily_sessions']` runs at sf0.01.
    """
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.plans.sessions import daily_sessions

    out = daily_sessions(spark, SMOKE_DIR, min_rows=1)
    return out.select(
        "instrument", "datetime", "open", "high", "low", "close", "move",
        "chhigh", "chlow", "chclose", "chmax",
        F.col("chhightime").cast("long").alias("chhightime"),
        F.col("chlowtime").cast("long").alias("chlowtime"),
        "firstextremumtype",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()


def golden_hashes() -> dict[str, dict[str, str]]:
    """Pinned canonical hashes for queries with no SQL oracle (see
    options_data_pipeline_spark/plans/goldens.py).  Not part of the
    external driver's contract — consumed by tools/driver_sim.py so the
    self-adjudication can value-pin entries the DuckDB oracle cannot."""
    from options_data_pipeline_spark.plans.goldens import GOLDEN_HASHES

    return GOLDEN_HASHES
