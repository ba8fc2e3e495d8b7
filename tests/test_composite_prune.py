"""composite_prune: the composed no-false-negative law — a file that
physically holds the probed key inside the range window must be ruled
IN by both indexes — and genuine composition (each index prunes files
the other cannot)."""

from __future__ import annotations

from options_data_pipeline_spark.plans.tpch2 import q_composite_prune

from .conftest import SF_DIR


def test_no_false_negatives_and_real_composition(spark):
    rows = q_composite_prune(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["present"]:
            assert r["range_hit"] == 1 and r["bloom_maybe"] == 1, r
            assert r["touched"] == 1, r
        assert r["touched"] == r["range_hit"] * r["bloom_maybe"]
    # composition is load-bearing: some files pass the range check but
    # fail the bloom (equality pruning beyond footers), and some pass
    # the bloom but fall outside the range (range pruning beyond the
    # bloom) — otherwise one index subsumes the other on this data
    assert any(r["range_hit"] and not r["bloom_maybe"] for r in rows)
    assert any(r["bloom_maybe"] and not r["range_hit"] for r in rows)
    # and the pair prunes strictly harder than either alone
    touched = sum(r["touched"] for r in rows)
    assert touched < sum(r["range_hit"] for r in rows)
    assert touched < sum(r["bloom_maybe"] for r in rows)
