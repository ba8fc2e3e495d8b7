"""IVF re-cluster compaction (plans/vectors.py): properties the driver
hash implies but is worth failing loudly in CI — the drift is real
(vectors actually move) and the mutated store stays key-unique."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.plans.vectors import q_ivf_index_recluster

from .conftest import SF_DIR


def test_recluster_moves_vectors_and_keeps_keys_unique(spark):
    out = q_ivf_index_recluster(spark, SF_DIR)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cid").alias("n_keys"),
        F.sum("moved").alias("n_moved"),
    ).first()
    # every indexed vector appears exactly once in the re-clustered store
    assert agg["n"] == agg["n_keys"]
    # the Lloyd round is not a no-op: the upsert drift genuinely shifts
    # centroids and reassigns a nontrivial slice
    assert agg["n_moved"] > 0
    # and unmoved rows dominate (a full reshuffle would mean the frozen
    # assignment was garbage — the compaction premise is incremental)
    assert agg["n_moved"] < agg["n"] / 2
