"""zorder_prune (plans/tpch2.py): the END-TO-END Z-order contract —
the oracle hash pins WHAT the layout is; these tests pin WHY it's
worth having: range predicates on EITHER dimension must touch a strict
subset of the files, which a single-column sort cannot give both
dimensions at once (VERDICT r10 ask #3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.plans.tpch2 import ZP_PROBES, q_zorder_prune

from .conftest import SF_DIR


def test_probes_prune_on_both_dimensions(spark):
    rows = q_zorder_prune(spark, SF_DIR).collect()
    n_files = len(rows)
    assert n_files > 4  # enough files for pruning to mean anything
    flag_cols = [
        f"hit_{dim}_{lo}{hi}" for dim in ("ck", "day") for lo, hi in ZP_PROBES
    ]
    for c in flag_cols:
        touched = sum(r[c] for r in rows)
        # every probe must touch SOMETHING (windows sit inside the data
        # range) and must NOT touch everything (the pruning claim)
        assert 0 < touched < n_files, f"{c}: {touched}/{n_files}"
    # a ~10%-of-span window on either dimension should prune away at
    # least a third of the files under a 2-dim z-clustering — the
    # quantitative version of "tight boxes in BOTH dims at once"
    for c in flag_cols:
        touched = sum(r[c] for r in rows)
        assert touched <= (2 * n_files) // 3, f"{c}: {touched}/{n_files}"


def test_content_round_trips(spark):
    """The physical rewrite must lose/duplicate nothing: per-file row
    counts sum to the source row count."""
    from options_data_pipeline_spark.sources.tables import load_table

    rows = q_zorder_prune(spark, SF_DIR).collect()
    total = sum(r["n_rows"] for r in rows)
    src = load_table(spark, SF_DIR, "orders").count()
    assert total == src
    # file stats are genuine bounding boxes: min <= max, disjoint union
    # covers the source key range
    assert min(r["min_ck"] for r in rows) == (
        load_table(spark, SF_DIR, "orders").agg(F.min("o_custkey")).first()[0]
    )
    for r in rows:
        assert r["min_ck"] <= r["max_ck"]
        assert r["min_day"] <= r["max_day"]
