"""Apache Iceberg MERGE backend for the keyed upsert sinks (VERDICT r4
ask #8): the second lakehouse table format behind the same gate
discipline as :mod:`.delta_backend`.

Iceberg ships as a JVM-only runtime jar (no Python package), so the
gate scans the session classpath directories instead of
``importlib.util.find_spec``. Where the jar and a configured Iceberg
catalog exist, these functions run a REAL transactional ``MERGE INTO``
against a catalog TABLE (Iceberg's unit of identity — not a bare path
like the parquet emulation / Delta twin) with the same interface and
metrics:

- :func:`merge_upsert_iceberg` ⇄ :func:`..sinks.upsert.merge_upsert`
  (``{"inserted": n, "updated": m}``) — reference K1-K5 map to
  ``MERGE INTO`` exactly as in ``delta_backend`` (reference
  src/pipeline/collectors/binance.py:76-125 does the same via PG
  ``ON CONFLICT``).
- :func:`insert_if_absent_iceberg` ⇄
  :func:`..sinks.upsert.insert_if_absent`
  (``{"inserted": n, "skipped": m}``).

Metrics are PRE-COUNTED against the current table state (one
left-semi join per call) rather than read from the snapshot summary:
under copy-on-write a MERGE's ``deleted-records``/``added-records``
count every row of each REWRITTEN file — carried-over neighbors
included — and under merge-on-read the deletes move to
``added-position-deletes``, so no single summary mapping is correct
across write modes. The pre-count is exact in both and matches the
emulation's Observation counters.

Parity with the emulation is pinned by tests/test_iceberg_backend.py
(skipif-no-iceberg: runs green on any cluster with
``iceberg-spark-runtime`` on the classpath and a catalog configured;
the gate behavior itself is tested everywhere).
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import dedupe_last_wins


def _classpath_dirs() -> list[str]:
    dirs = []
    try:
        import pyspark

        dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    if os.environ.get("SPARK_HOME"):
        dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    if os.environ.get("ICEBERG_JAR_DIR"):
        dirs.append(os.environ["ICEBERG_JAR_DIR"])
    return dirs


def iceberg_available() -> bool:
    return any(
        glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        for d in _classpath_dirs()
    )


def require_iceberg_session(spark: SparkSession) -> None:
    if not iceberg_available():
        raise ModuleNotFoundError(
            "iceberg-spark-runtime jar not found on the classpath; use "
            "the parquet emulation (options_data_pipeline_spark.sinks."
            "upsert) instead"
        )
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    if "IcebergSparkSessionExtensions" not in ext:
        raise RuntimeError(
            "SparkSession lacks the Iceberg SQL extensions; set "
            "spark.sql.extensions=org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions and configure an Iceberg "
            "catalog (e.g. spark.sql.catalog.local=org.apache.iceberg."
            "spark.SparkCatalog with type=hadoop and a warehouse path)"
        )


def _bq(name: str) -> str:
    """Backtick-quote one identifier segment (escape embedded ticks)."""
    return "`" + name.replace("`", "``") + "`"


def _qualify(table: str) -> str:
    """Quote each dot-separated segment of a catalog table identifier."""
    return ".".join(_bq(seg) for seg in table.split("."))


def _ensure_table(spark: SparkSession, table: str, like: DataFrame) -> bool:
    """Create the Iceberg table from the batch schema if absent.
    Returns True when the table already existed."""
    if spark.catalog.tableExists(table):
        return True
    empty = spark.createDataFrame([], like.schema)
    empty.writeTo(_qualify(table)).using("iceberg").create()
    return False


def merge_upsert_iceberg(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    audit_col: str | None = None,
    order_by: list[str] | None = None,
) -> dict[str, int]:
    """``MERGE INTO`` the Iceberg ``table``: whenMatched → update all,
    whenNotMatched → insert. Same interface/metrics as
    :func:`..sinks.upsert.merge_upsert` (no ``partition_by`` — Iceberg
    keeps layout in table metadata, not the directory tree)."""
    require_iceberg_session(spark)
    if audit_col:
        updates = updates.withColumn(audit_col, F.current_timestamp())
    updates = dedupe_last_wins(updates, keys, order_by)

    existed = _ensure_table(spark, table, updates)
    if existed and audit_col:
        cols = [f.name for f in spark.table(table).schema.fields]
        if audit_col not in cols:
            spark.sql(
                f"ALTER TABLE {_qualify(table)} "
                f"ADD COLUMN {_bq(audit_col)} TIMESTAMP"
            )

    n_updates = updates.count()
    n_matched = (
        updates.join(spark.table(table).select(*keys), keys, "left_semi").count()
        if existed
        else 0
    )
    # per-call unique view name: two concurrent merges in one session
    # must not clobber each other's source between the
    # createOrReplaceTempView and the MERGE (ADVICE r6)
    view = f"_iceberg_merge_updates_{uuid.uuid4().hex}"
    updates.createOrReplaceTempView(view)
    try:
        # null-UNSAFE equality, deliberately — matches the emulation's
        # full-outer join / standard SQL MERGE (see delta_backend note)
        cond = " AND ".join(f"t.{_bq(k)} = u.{_bq(k)}" for k in keys)
        spark.sql(
            f"MERGE INTO {_qualify(table)} t "
            f"USING {view} u ON {cond} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    finally:
        spark.catalog.dropTempView(view)
    return {"inserted": n_updates - n_matched, "updated": n_matched}


def insert_if_absent_iceberg(
    spark: SparkSession,
    table: str,
    batch: DataFrame,
    keys: list[str],
) -> dict[str, int]:
    """``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` — the
    transactional ``ON CONFLICT DO NOTHING``. Same interface/metrics as
    :func:`..sinks.upsert.insert_if_absent`."""
    require_iceberg_session(spark)
    from pyspark.sql import Window

    total = batch.count()
    # in-batch dedup: first occurrence wins, matching the emulation
    w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id().asc())
    batch = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    existed = _ensure_table(spark, table, batch)
    n_batch = batch.count()
    n_matched = (
        batch.join(spark.table(table).select(*keys), keys, "left_semi").count()
        if existed
        else 0
    )
    view = f"_iceberg_insert_batch_{uuid.uuid4().hex}"
    batch.createOrReplaceTempView(view)
    try:
        cond = " AND ".join(f"t.{_bq(k)} = b.{_bq(k)}" for k in keys)
        spark.sql(
            f"MERGE INTO {_qualify(table)} t "
            f"USING {view} b ON {cond} "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    finally:
        spark.catalog.dropTempView(view)
    inserted = n_batch - n_matched
    return {"inserted": inserted, "skipped": total - inserted}
