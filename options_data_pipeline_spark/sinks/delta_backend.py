"""Delta Lake MERGE backend for the keyed upsert sinks.

The parquet emulation in :mod:`.upsert` implements MERGE semantics with
a full-outer join + atomic directory swap — the only option on vanilla
Spark. Where the ``delta-spark`` package is installed (reference K1-K5
map to ``MERGE INTO``; reference src/pipeline/collectors/binance.py:76-125
does the same via PG ``ON CONFLICT``), these functions run a REAL
transactional ``MERGE INTO`` with the SAME interface and metrics:

- :func:`merge_upsert_delta` ⇄ :func:`..sinks.upsert.merge_upsert`
  (``{"inserted": n, "updated": m}``)
- :func:`insert_if_absent_delta` ⇄ :func:`..sinks.upsert.insert_if_absent`
  (``{"inserted": n, "skipped": m}``)

Import-gated: ``delta_available()`` consults ``importlib.util.find_spec``
so the vanilla container never imports delta. The session must carry the
Delta SQL extensions (``io.delta.sql.DeltaSparkSessionExtension`` +
``DeltaCatalog``) — build it with ``delta.configure_spark_with_delta_pip``
or the equivalent confs; ``require_delta_session`` checks and raises a
clear error otherwise.

Metrics come from the Delta commit's ``operationMetrics``
(numTargetRowsInserted / numTargetRowsUpdated) — the transactional
equivalent of the Observation counters the emulation rides on its write.
Parity with the emulation is pinned by tests/test_delta_backend.py
(skipif-no-delta: runs wherever delta-spark is installed).
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import dedupe_last_wins


def delta_available() -> bool:
    return importlib.util.find_spec("delta") is not None


def require_delta_session(spark: SparkSession) -> None:
    if not delta_available():
        raise ModuleNotFoundError(
            "delta-spark is not installed; use the parquet emulation "
            "(options_data_pipeline_spark.sinks.upsert) instead"
        )
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    if "DeltaSparkSessionExtension" not in ext:
        raise RuntimeError(
            "SparkSession lacks the Delta SQL extensions; build it with "
            "delta.configure_spark_with_delta_pip(builder) or set "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
            "and spark.sql.catalog.spark_catalog="
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )


def _merge_metrics(table, wanted: dict[str, str]) -> dict[str, int]:
    m = table.history(1).select("operationMetrics").first()[0] or {}
    return {out: int(m.get(src, 0) or 0) for out, src in wanted.items()}


def _bq(name: str) -> str:
    """Backtick-quote an identifier (escaping embedded backticks) so key
    columns / audit columns with spaces, dots, or hyphens bind the same
    way they do in the parquet emulation's Column-API joins (ADVICE r4)."""
    return "`" + name.replace("`", "``") + "`"


def _guard_cold_start(spark: SparkSession, target_path: str) -> None:
    """Refuse to bootstrap a Delta table over an existing NON-Delta,
    non-empty directory. ``DeltaTable.isDeltaTable`` is false both for an
    absent path and for a parquet-emulation table sitting at the same
    path; blindly writing mode('overwrite') in the second case silently
    replaces the whole table with the current batch (ADVICE r4, medium).
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(target_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path) and len(fs.listStatus(path)) > 0:
        raise ValueError(
            f"refusing Delta cold-start at {target_path!r}: the directory "
            "exists and is non-empty but is not a Delta table (possibly a "
            "parquet-emulation table). Migrate it explicitly (CONVERT TO "
            "DELTA / rewrite) or point the Delta sink at an empty path."
        )


def merge_upsert_delta(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    audit_col: str | None = None,
    order_by: list[str] | None = None,
) -> dict[str, int]:
    """``MERGE INTO`` at ``target_path``: whenMatched → update all,
    whenNotMatched → insert. Same interface/metrics as
    :func:`..sinks.upsert.merge_upsert` (no ``partition_by`` — Delta
    keeps layout in the transaction log, not the directory tree)."""
    require_delta_session(spark)
    from delta.tables import DeltaTable

    if audit_col:
        updates = updates.withColumn(audit_col, F.current_timestamp())
    updates = dedupe_last_wins(updates, keys, order_by)

    if not DeltaTable.isDeltaTable(spark, target_path):
        _guard_cold_start(spark, target_path)
        n = updates.count()
        updates.write.format("delta").mode("errorifexists").save(target_path)
        return {"inserted": n, "updated": 0}

    target = DeltaTable.forPath(spark, target_path)
    if audit_col and audit_col not in target.toDF().columns:
        # align schemas like the emulation does for a new audit column
        spark.sql(
            f"ALTER TABLE delta.`{target_path.replace('`', '``')}` "
            f"ADD COLUMN {_bq(audit_col)} TIMESTAMP"
        )
        target = DeltaTable.forPath(spark, target_path)
    # null-UNSAFE equality, deliberately: the parquet emulation's
    # full-outer join never matches null keys (standard SQL MERGE
    # semantics) — <=> here would merge null-key rows the emulation
    # inserts, diverging contents AND metrics (review r4)
    cond = " AND ".join(f"t.{_bq(k)} = u.{_bq(k)}" for k in keys)
    (
        target.alias("t")
        .merge(updates.alias("u"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return _merge_metrics(
        target,
        {"inserted": "numTargetRowsInserted", "updated": "numTargetRowsUpdated"},
    )


def insert_if_absent_delta(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
) -> dict[str, int]:
    """``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` — the transactional
    ``ON CONFLICT DO NOTHING``. Same interface/metrics as
    :func:`..sinks.upsert.insert_if_absent`."""
    require_delta_session(spark)
    from delta.tables import DeltaTable
    from pyspark.sql import Window

    total = batch.count()
    # in-batch dedup: first occurrence wins, matching the emulation
    w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id().asc())
    batch = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    if not DeltaTable.isDeltaTable(spark, target_path):
        _guard_cold_start(spark, target_path)
        n = batch.count()
        batch.write.format("delta").mode("errorifexists").save(target_path)
        return {"inserted": n, "skipped": total - n}

    target = DeltaTable.forPath(spark, target_path)
    # null-unsafe, like the emulation's left_anti
    cond = " AND ".join(f"t.{_bq(k)} = b.{_bq(k)}" for k in keys)
    (
        target.alias("t")
        .merge(batch.alias("b"), cond)
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = _merge_metrics(target, {"inserted": "numTargetRowsInserted"})
    return {"inserted": got["inserted"], "skipped": total - got["inserted"]}
