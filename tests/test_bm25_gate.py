"""BM25 scale gate (VERDICT r3 ask #3): below PRUNE_MIN_DOCS the plain
single-pass plan runs; the WAND-pruned path stays available and must be
bit-identical to the plain path when forced on."""

from __future__ import annotations

from options_data_pipeline_spark.plans import retrieval

from ._compare import canonical_rows
from .conftest import SF_DIR


def test_small_corpus_takes_plain_path(spark):
    # sf0.001 is far below the floor: the executed plan must not contain
    # the candidate-scoring artifacts (no cached/materialized postings)
    assert retrieval.PRUNE_MIN_DOCS > 10_000
    df = retrieval.q_bm25_search(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, plan


def test_pruned_path_equals_plain_path(spark, monkeypatch):
    plain = canonical_rows(retrieval.q_bm25_search(spark, SF_DIR).toPandas())
    monkeypatch.setattr(retrieval, "PRUNE_MIN_DOCS", 1)
    pruned_df = retrieval.q_bm25_search(spark, SF_DIR)
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    pruned = canonical_rows(pruned_df.toPandas())
    assert pruned == plain
    # and the pruning machinery really engaged (localCheckpointed postings)
    assert "ExistingRDD" in plan, plan
