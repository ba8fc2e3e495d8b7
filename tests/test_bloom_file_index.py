"""bloom_file_index (plans/quality.py): the point-lookup pruning
contract — no false negatives ever, and absent keys actually prune."""

from __future__ import annotations

from options_data_pipeline_spark.plans.quality import q_bloom_file_index

from .conftest import SF_DIR


def test_no_false_negatives_and_absent_keys_prune(spark):
    rows = q_bloom_file_index(spark, SF_DIR).collect()
    assert rows
    days = {r["day"] for r in rows}
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
        # the bloom law: present => maybe (false negatives impossible)
        if r["present"] == 1:
            assert r["maybe"] == 1, f"false negative at {r}"
    # keys past max(user_id) are absent everywhere; their lookups must
    # prune (bloom-negative on the overwhelming majority of files —
    # fpp at this geometry is << 1%)
    absent = [
        k for k, rs in by_key.items() if all(r["present"] == 0 for r in rs)
    ]
    assert len(absent) >= 4
    for k in absent:
        touched = sum(r["maybe"] for r in by_key[k])
        assert touched <= len(days) // 4, (
            f"absent key {k} would touch {touched}/{len(days)} files"
        )


def test_maintained_index_equals_rebuild(spark):
    """bloom_index_maintain: OR-mergeable maintenance must converge to
    the from-scratch rebuild (the oracle recomputes over the full
    corpus); here pin the probe-visible consequences — no false
    negatives against the FULL corpus including delta-only arrivals,
    and per-day bitmap weights are positive."""
    from options_data_pipeline_spark.plans.quality import (
        q_bloom_index_maintain,
    )

    rows = q_bloom_index_maintain(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["present"] == 1:
            assert r["maybe"] == 1, f"false negative at {r}"
        assert r["day_words"] > 0
        assert r["day_set_bits"] >= r["day_words"]
