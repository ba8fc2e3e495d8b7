"""End-to-end curation job: dedup -> quality gate -> PII scrub ->
token-budgeted shard export, metrics consistent with the parts."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.jobs.curation import (
    curate_corpus,
    curation_report,
)

from .conftest import SF_DIR


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_curate_corpus_end_to_end(spark, tmp):
    out = f"{tmp}/shards"
    m = curate_corpus(spark, SF_DIR, out, quality_min=0.3, shard_budget=5000)

    # conservation: every input doc is out, dedup-dropped, or quality-dropped
    assert m["docs_in"] == m["docs_out"] + m["dedup_dropped"] + m["quality_dropped"]
    assert m["docs_out"] > 0 and m["dedup_dropped"] > 0
    assert m["tokens_out"] > 0 and m["shards_out"] > 0

    shards = spark.read.parquet(out)
    # packing invariant (assignment by starting offset): a shard minus
    # its final doc is always under budget — overshoot is bounded by the
    # one straddling document
    per_shard = shards.groupBy("lang", "shard_id").agg(
        F.sum("n_tokens").alias("tok"),
        F.max_by("n_tokens", "doc_id").alias("last_tok"),
    )
    over = per_shard.where(F.col("tok") - F.col("last_tok") >= 5000).count()
    assert over == 0

    # PII is gone from the exported text
    leaked = shards.where(
        F.col("text").rlike(r"[\w.+-]+@[\w-]+\.[A-Za-z]{2,}")
    ).count()
    assert leaked == 0

    rep = curation_report(spark, out)
    assert rep.count() == m["shards_out"]
    assert (
        rep.agg(F.sum("n_docs")).first()[0] == m["docs_out"]
    )


def test_curation_is_deterministic(spark, tmp):
    m1 = curate_corpus(spark, SF_DIR, f"{tmp}/a", shard_budget=5000)
    m2 = curate_corpus(spark, SF_DIR, f"{tmp}/b", shard_budget=5000)
    assert m1 == m2
    a = sorted(map(tuple, spark.read.parquet(f"{tmp}/a").collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{tmp}/b").collect()))
    assert a == b
