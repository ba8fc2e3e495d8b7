"""Minimal versioned table: an append-only commit log over immutable
parquet snapshots — Delta/Iceberg's essential contract (atomic commits,
time travel, vacuum) built from primitives, for environments without a
table format.

Layout::

    table/
      _log/00000000.json   one entry per committed version
      data/v0-<uuid>/      immutable parquet written once, never edited

A version's entry lists the data directories that make it up (an
``append`` adds one directory to the previous list; ``write`` and
``upsert`` start a fresh list). Readers resolve the log FIRST and read
only listed directories, so:

- a crash between data write and log rename leaves an orphan directory
  that no reader ever sees (the commit is the log rename, which is
  atomic on a local FS and a metastore CAS on object stores);
- time travel is "read the directories of entry N";
- vacuum deletes directories unreachable from retained versions.

Single-writer by design (the reference pipeline's cadence); multi-writer
needs the real table format this emulates. The upsert path reuses the
same single-pass full-outer MERGE shape as ``sinks.upsert`` and rewrites
a full snapshot — file-level incrementality lives in
``upsert_file_pruned``; here the unit of reuse is the APPEND directory.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _log_dir(table: str) -> str:
    return os.path.join(table, "_log")


def _entries(table: str) -> list[dict]:
    d = _log_dir(table)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as fh:
                out.append(json.load(fh))
    return out


def _commit(
    table: str,
    op: str,
    dirs: list[str],
    count: int,
    batch_id: int | None = None,
) -> dict:
    os.makedirs(_log_dir(table), exist_ok=True)
    version = len(_entries(table))
    entry = {"version": version, "op": op, "dirs": dirs, "count": count}
    if batch_id is not None:
        entry["batch_id"] = batch_id
    tmp = os.path.join(_log_dir(table), f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.rename(tmp, os.path.join(_log_dir(table), f"{version:08d}.json"))
    return entry


def _write_snapshot(df: DataFrame, table: str, version_hint: int) -> tuple[str, int]:
    rel = f"data/v{version_hint}-{uuid.uuid4().hex[:8]}"
    path = os.path.join(table, rel)
    df.write.mode("error").parquet(path)
    n = df.sparkSession.read.parquet(path).count()
    return rel, n


class ExpectationError(ValueError):
    """A commit-time data contract failed; nothing was committed."""


def check_expectations(df: DataFrame, expectations: dict[str, str]) -> None:
    """dbt-style contracts at the sink: each expectation is a boolean
    SQL predicate every row must satisfy. One aggregate pass counts all
    violations together; any failure raises BEFORE data is written, so
    a bad batch can never become a committed version."""
    if not expectations:
        return
    counts = df.agg(
        *[
            F.sum(F.when(~F.expr(pred), 1).otherwise(0)).alias(name)
            for name, pred in expectations.items()
        ]
    ).first()
    failed = {
        name: int(counts[name] or 0)
        for name in expectations
        if (counts[name] or 0) > 0
    }
    if failed:
        raise ExpectationError(f"expectations violated: {failed}")


def commit_write(
    df: DataFrame, table: str, expectations: dict[str, str] | None = None
) -> dict:
    """Full snapshot write as a new version."""
    check_expectations(df, expectations or {})
    rel, n = _write_snapshot(df, table, len(_entries(table)))
    return _commit(table, "write", [rel], n)


def commit_append(
    df: DataFrame,
    table: str,
    batch_id: int | None = None,
    expectations: dict[str, str] | None = None,
) -> dict:
    """Append-only commit: previous directories + one new directory.

    ``batch_id`` makes the append IDEMPOTENT for streaming replay: if
    any committed entry already carries this id, the call is a no-op
    returning that entry — a micro-batch re-delivered after a sink
    commit (post-commit crash before the WAL advanced) appends nothing.
    """
    check_expectations(df, expectations or {})
    entries = _entries(table)
    if batch_id is not None:
        for e in entries:
            if e.get("batch_id") == batch_id:
                return e
    prev = entries[-1]["dirs"] if entries else []
    rel, n_new = _write_snapshot(df, table, len(entries))
    total = (entries[-1]["count"] if entries else 0) + n_new
    return _commit(table, "append", [*prev, rel], total, batch_id=batch_id)


def append_stream(
    stream_df: DataFrame,
    table: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Structured-Streaming writer into the versioned table: each
    micro-batch is one idempotent `commit_append(batch_id=...)`, so the
    commit log and the streaming WAL agree — exactly-once into a table
    format, via foreachBatch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        commit_append(batch_df, table, batch_id=batch_id)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def commit_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    order_by: list[str] | None = None,
) -> dict:
    """Keyed MERGE as a new full-snapshot version (last-wins within the
    batch via the same ordering contract as ``sinks.upsert``)."""
    if order_by:
        ordering = [F.col(c).desc() for c in order_by]
        ordering.append(F.monotonically_increasing_id().desc())
    else:
        ordering = [F.monotonically_increasing_id().desc()]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    updates = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=False)
    )
    entries = _entries(table)
    if not entries:
        rel, n = _write_snapshot(updates, table, 0)
        return _commit(table, "upsert", [rel], n)
    current = read_version(spark, table)
    survivors = current.join(updates.select(*keys), keys, "left_anti")
    merged = survivors.select(updates.columns).unionByName(updates)
    rel, n = _write_snapshot(merged, table, len(entries))
    return _commit(table, "upsert", [rel], n)


def read_version(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table as of ``version`` (default latest)."""
    entries = _entries(table)
    if not entries:
        raise FileNotFoundError(f"no committed versions at {table}")
    entry = entries[-1] if version is None else entries[version]
    paths = [os.path.join(table, d) for d in entry["dirs"]]
    # mergeSchema: append commits may evolve the schema (new columns);
    # older snapshot dirs surface NULLs for columns they predate
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def history(table: str) -> list[dict]:
    return _entries(table)


def vacuum(table: str, keep_latest: int = 1) -> dict:
    """Delete data directories unreachable from the ``keep_latest`` most
    recent versions. Returns counts. Old log entries stay (audit), but
    their data may be gone — time travel is bounded by vacuum, exactly
    as in the real table formats."""
    import shutil

    entries = _entries(table)
    live: set[str] = set()
    for e in entries[-keep_latest:]:
        live.update(e["dirs"])
    data_root = os.path.join(table, "data")
    removed = kept = 0
    for name in sorted(os.listdir(data_root)):
        rel = f"data/{name}"
        if rel in live:
            kept += 1
        else:
            shutil.rmtree(os.path.join(data_root, name))
            removed += 1
    return {"removed_dirs": removed, "kept_dirs": kept}


def compact(spark: SparkSession, table: str, target_files: int = 1) -> dict:
    """OPTIMIZE-equivalent: rewrite the latest version's directory list
    (append chains accumulate one directory per micro-batch) into a
    single coalesced snapshot committed as a new version. Pure physical
    rewrite — row content is identical, and readers switch atomically at
    the log entry; old directories remain for time travel until vacuum.
    """
    entries = _entries(table)
    if not entries:
        raise FileNotFoundError(f"no committed versions at {table}")
    current = read_version(spark, table)
    rel = f"data/v{len(entries)}-compact-{uuid.uuid4().hex[:8]}"
    current.coalesce(target_files).write.mode("error").parquet(
        os.path.join(table, rel)
    )
    n = spark.read.parquet(os.path.join(table, rel)).count()
    entry = _commit(table, "compact", [rel], n)
    return {**entry, "dirs_before": len(entries[-1]["dirs"])}
