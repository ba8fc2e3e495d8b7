"""HLL sketch operator: merge-losslessness and error bound.

The property that makes sketches the at-scale answer: the union of
per-segment sketches gives EXACTLY the same estimate as sketching the
whole column directly (HLL register merge is a pointwise max — no
information loss at equal lgK), and the estimate is within the
published error envelope of the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.sketches import (
    merge_estimate,
    segment_sketches,
)
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_merged_segment_sketches_equal_direct_sketch(spark):
    ev = load_table(spark, SF_DIR, "events")
    per_seg = segment_sketches(ev, "event_type", "user_id")
    merged = merge_estimate(per_seg).first().estimate
    direct = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("estimate")
        )
        .first()
        .estimate
    )
    assert merged == direct  # lossless register merge — exact equality


def test_estimate_within_error_envelope_of_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select("user_id").distinct().count()
    est = merge_estimate(
        segment_sketches(ev, "event_type", "user_id")
    ).first().estimate
    # lgK=12 -> rse ~1.04/sqrt(2^12) ~ 1.6%; allow 5 sigma
    assert abs(est - exact) <= max(5, 0.08 * exact)


def test_sketches_are_partitioning_invariant(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id")
    a = merge_estimate(
        segment_sketches(ev.repartition(1), "event_type", "user_id")
    ).first().estimate
    b = merge_estimate(
        segment_sketches(ev.repartition(16), "event_type", "user_id")
    ).first().estimate
    assert a == b
