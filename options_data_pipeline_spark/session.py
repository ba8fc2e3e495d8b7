"""SparkSession factory.

Every session is pinned to UTC (the reference stores TIMESTAMPTZ in UTC
throughout; see /root/reference/src/pipeline/collectors/binance_1m.py:112-123)
and enables AQE so that skewed shuffles and small partitions are re-planned
at runtime — essential posture for the 100 TB target even though tests run
on ``local[*]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "options-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    Notes on individual knobs:

    - ``spark.sql.session.timeZone=UTC``: all reference semantics are UTC.
    - ``spark.sql.adaptive.enabled`` + skewJoin: runtime re-planning.
    - ``spark.sql.legacy.parquet.nanosAsLong``: the benchmark ``events``
      table carries nanosecond parquet timestamps, which Spark 4 rejects
      by default; we read them as longs and normalize to TimestampType
      in :mod:`options_data_pipeline_spark.sources.tables`.
    - Arrow enabled for the (rare) Pandas-UDF paths — everything on the
      hot path is native Catalyst expressions.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # permissive classic semantics: invalid make_date/casts yield NULL
        # (mirrors the reference's skip-unparseable behavior, deribit.py:90-92)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
