"""Round-11 wave 5 pins: zorder_maintain's scoped rewrite and
embedding_drift's self-consistency."""

from __future__ import annotations

from options_data_pipeline_spark.plans.tpch2 import q_zorder_maintain
from options_data_pipeline_spark.plans.vectors import q_embedding_drift

from .conftest import SF_DIR


def test_maintenance_rewrites_only_touched_slots(spark):
    rows = q_zorder_maintain(spark, SF_DIR).collect()
    assert rows
    touched = [r for r in rows if r["files_before"] == 2]
    untouched = [r for r in rows if r["files_before"] == 1]
    # the delta (every 4th order) touches most-but-not-necessarily-all
    # slots; the invariant is that maintenance restored 1 file per slot
    # everywhere and files_before was EXACTLY 1 + touched
    assert touched, "delta touched no slot — harness degenerate"
    assert all(r["files_after"] == 1 for r in rows)
    assert all(r["files_before"] in (1, 2) for r in rows)
    assert untouched or len(touched) == len(rows)


def test_frozen_deciles_have_high_self_cosine(spark):
    rows = {r["decile"]: r for r in q_embedding_drift(spark, SF_DIR).collect()}
    assert set(rows) == set(range(10))
    # the frozen centroid is the mean of deciles 0-2: those deciles'
    # own centroids must sit closer to it than a degenerate bound, and
    # every cosine is a valid cosine
    for d, r in rows.items():
        assert -1.0 - 1e-9 <= r["cos_vs_frozen"] <= 1.0 + 1e-9
        assert r["n_vecs"] > 0
    # centroids of high-dim near-random cohorts are small, so cosines
    # are noisy — the robust invariant is that the deciles CONTRIBUTING
    # to the frozen mean correlate positively with it
    froz = [rows[d]["cos_vs_frozen"] for d in (0, 1, 2)]
    assert min(froz) > 0.0
