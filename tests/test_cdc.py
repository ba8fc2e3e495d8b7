"""apply_cdc: insert/update/delete change-log application with
last-change-wins per key, retraction, metrics, and idempotence."""

from __future__ import annotations

import shutil

import pytest

from options_data_pipeline_spark.sinks.upsert import apply_cdc


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


SCHEMA = "k long, seq long, op string, v string"


def _log(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, path):
    return {r.k: r.v for r in spark.read.parquet(path).collect()}


def test_cdc_full_lifecycle(spark, tmp):
    path = f"{tmp}/t"

    # cold start: I/U materialize, a D for an unseen key is a no-op,
    # and an insert-then-delete within one log never lands
    m = apply_cdc(spark, path, _log(spark, [
        (1, 10, "I", "a"),
        (2, 11, "I", "b"),
        (3, 12, "D", "zzz"),          # delete of never-inserted key
        (4, 13, "I", "c"), (4, 14, "D", "c"),   # born and retracted
    ]), keys=["k"], seq_col="seq")
    assert _state(spark, path) == {1: "a", 2: "b"}
    assert m == {"inserted": 2, "updated": 0, "deleted": 0}

    # second batch: update 1, delete 2, insert 5; out-of-order arrivals
    # within the batch resolve by seq, not input order
    batch2 = [
        (1, 21, "U", "a2"),
        (2, 22, "D", None),
        (5, 23, "I", "e"),
        (5, 20, "U", "stale"),        # lower seq than the insert above
    ]
    m2 = apply_cdc(spark, path, _log(spark, batch2), keys=["k"], seq_col="seq")
    assert _state(spark, path) == {1: "a2", 5: "e"}
    assert m2 == {"inserted": 1, "updated": 1, "deleted": 1}

    # idempotence: replaying the same log converges to the same state
    m3 = apply_cdc(spark, path, _log(spark, batch2), keys=["k"], seq_col="seq")
    assert _state(spark, path) == {1: "a2", 5: "e"}
    assert m3["deleted"] == 0  # key 2 already gone


def test_cdc_delete_everything(spark, tmp):
    path = f"{tmp}/t"
    apply_cdc(spark, path, _log(spark, [(1, 1, "I", "x")]),
              keys=["k"], seq_col="seq")
    m = apply_cdc(spark, path, _log(spark, [(1, 2, "D", None)]),
                  keys=["k"], seq_col="seq")
    assert m == {"inserted": 0, "updated": 0, "deleted": 1}
    assert _state(spark, path) == {}


def test_cdc_streaming_foreachbatch(spark, tmp):
    """Change-log stream -> foreachBatch apply_cdc: the streaming CDC
    pipeline (replication tailer) converges to the same state as batch
    application, across query restarts."""
    src = f"{tmp}/log"
    path = f"{tmp}/t"

    def wave():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: apply_cdc(
                    bdf.sparkSession, path, bdf, keys=["k"], seq_col="seq"
                )
            )
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()

    _log(spark, [(1, 1, "I", "a"), (2, 2, "I", "b")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    wave()
    assert _state(spark, path) == {1: "a", 2: "b"}

    _log(spark, [(1, 3, "U", "a2"), (2, 4, "D", None), (3, 5, "I", "c")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    wave()
    assert _state(spark, path) == {1: "a2", 3: "c"}


def test_corrupt_target_read_propagates_not_cold_start(spark, tmp):
    """ADVICE r3: a target that EXISTS but fails to read must raise, not
    silently become a cold start that replaces the table with only the
    current change batch."""
    import os

    import pytest

    target = f"{tmp}/tbl"
    os.makedirs(target)
    with open(f"{target}/part-00000.parquet", "wb") as fh:
        fh.write(b"this is not a parquet file")
    changes = spark.createDataFrame(
        [(1, 1, "I", "a")], "k int, seq int, op string, v string"
    )
    with pytest.raises(Exception):
        apply_cdc(spark, target, changes, keys=["k"], seq_col="seq")
    # the corrupt target was not replaced
    assert os.path.exists(f"{target}/part-00000.parquet")


def test_empty_target_dir_is_cold_start(spark, tmp):
    """An existing-but-empty directory (no parquet footers) is a
    legitimate cold start — the one case _read_target may absorb."""
    import os

    target = f"{tmp}/tbl"
    os.makedirs(target)
    changes = spark.createDataFrame(
        [(1, 1, "I", "a"), (2, 2, "D", None)],
        "k int, seq int, op string, v string",
    )
    got = apply_cdc(spark, target, changes, keys=["k"], seq_col="seq")
    assert got["inserted"] == 1
    rows = spark.read.parquet(target).collect()
    assert [(r.k, r.v) for r in rows] == [(1, "a")]
