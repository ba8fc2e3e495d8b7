"""Versioned table (commit log + immutable snapshots): time travel,
append reuse, upsert semantics, orphan invisibility, vacuum bounds."""

from __future__ import annotations

import os
import shutil

import pytest

from options_data_pipeline_spark.sinks.versioned import (
    commit_append,
    commit_upsert,
    commit_write,
    history,
    read_version,
    vacuum,
)


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_time_travel_across_write_append_upsert(spark, tmp):
    t = f"{tmp}/table"
    commit_write(_df(spark, [(1, "a"), (2, "b")]), t)
    commit_append(_df(spark, [(3, "c")]), t)
    commit_upsert(spark, t, _df(spark, [(2, "B2"), (4, "d")]), keys=["k"])

    v0 = {(r.k, r.v) for r in read_version(spark, t, 0).collect()}
    v1 = {(r.k, r.v) for r in read_version(spark, t, 1).collect()}
    v2 = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert v0 == {(1, "a"), (2, "b")}
    assert v1 == {(1, "a"), (2, "b"), (3, "c")}
    assert v2 == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}

    h = history(t)
    assert [e["op"] for e in h] == ["write", "append", "upsert"]
    assert [e["count"] for e in h] == [2, 3, 4]
    # append reuses v0's data directory instead of rewriting it
    assert h[1]["dirs"][0] == h[0]["dirs"][0]


def test_orphan_directories_are_invisible(spark, tmp):
    t = f"{tmp}/table"
    commit_write(_df(spark, [(1, "a")]), t)
    # simulate a crash: data landed, log rename never happened
    _df(spark, [(9, "ghost")]).write.parquet(f"{t}/data/v9-deadbeef")
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(1, "a")}


def test_vacuum_bounds_time_travel_but_keeps_latest(spark, tmp):
    t = f"{tmp}/table"
    commit_write(_df(spark, [(1, "a")]), t)
    commit_upsert(spark, t, _df(spark, [(1, "a2")]), keys=["k"])
    out = vacuum(t, keep_latest=1)
    assert out["removed_dirs"] == 1 and out["kept_dirs"] == 1
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(1, "a2")}
    assert not os.path.exists(
        os.path.join(t, history(t)[0]["dirs"][0])
    )


def test_upsert_last_wins_within_batch(spark, tmp):
    t = f"{tmp}/table"
    commit_upsert(
        spark,
        t,
        _df(spark, [(1, "first"), (1, "second")]),
        keys=["k"],
        order_by=["v"],
    )
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (1, "second")
    }


def test_append_is_idempotent_per_batch_id(spark, tmp):
    t = f"{tmp}/table"
    commit_append(_df(spark, [(1, "a")]), t, batch_id=0)
    # replay of batch 0 (post-commit crash re-delivery): no-op
    commit_append(_df(spark, [(1, "a")]), t, batch_id=0)
    commit_append(_df(spark, [(2, "b")]), t, batch_id=1)
    assert [e["count"] for e in history(t)] == [1, 2]
    assert read_version(spark, t).count() == 2


def test_streaming_appends_into_versioned_table(spark, tmp):
    from options_data_pipeline_spark.sinks.versioned import append_stream

    src = f"{tmp}/src"
    t = f"{tmp}/table"
    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _df(spark, [(3, "c")]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = append_stream(stream, t, f"{tmp}/ckpt")
    q.awaitTermination(120)

    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # one commit per micro-batch, every entry stamped with its batch id
    assert [e.get("batch_id") for e in history(t)] == [0, 1]

    # restart on the same checkpoint: no new source data -> no commits
    q = append_stream(stream, t, f"{tmp}/ckpt")
    q.awaitTermination(120)
    assert len(history(t)) == 2


def test_compact_rewrites_append_chain_without_changing_rows(spark, tmp):
    from options_data_pipeline_spark.sinks.versioned import compact

    t = f"{tmp}/table"
    for i in range(4):
        commit_append(_df(spark, [(i, f"v{i}")]), t, batch_id=i)
    before = sorted(map(tuple, read_version(spark, t).collect()))
    out = compact(spark, t)
    assert out["dirs_before"] == 4
    assert len(history(t)[-1]["dirs"]) == 1
    after = sorted(map(tuple, read_version(spark, t).collect()))
    assert before == after
    # pre-compaction versions still time-travel until vacuumed
    assert read_version(spark, t, 3).count() == 4
    vacuum(t, keep_latest=1)
    assert read_version(spark, t).count() == 4


def test_schema_evolution_on_append(spark, tmp):
    t = f"{tmp}/table"
    commit_append(_df(spark, [(1, "a")]), t, batch_id=0)
    evolved = spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, score double"
    )
    commit_append(evolved, t, batch_id=1)
    rows = {r.k: (r.v, r.score) for r in read_version(spark, t).collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_expectations_block_bad_commits(spark, tmp):
    from options_data_pipeline_spark.sinks.versioned import ExpectationError

    t = f"{tmp}/table"
    good = {"k_not_null": "k IS NOT NULL", "v_nonempty": "length(v) > 0"}
    commit_write(_df(spark, [(1, "a")]), t, expectations=good)
    bad = spark.createDataFrame([(None, "x"), (2, "")], "k long, v string")
    with pytest.raises(ExpectationError, match="k_not_null.*1"):
        commit_append(bad, t, batch_id=1, expectations=good)
    # nothing committed, no orphan visible
    assert len(history(t)) == 1
    assert read_version(spark, t).count() == 1
