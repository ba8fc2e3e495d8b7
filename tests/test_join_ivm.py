"""join_ivm_twin (plans/quality.py): IVM over fact ⋈ dim under CDC on
both inputs (VERDICT r10 ask #4).  The driver hash proves maintained ==
recomputed; these tests pin the properties the hash alone doesn't
surface: the dim remap genuinely MOVES contributions between groups,
and the maintenance path never rescans the fact table."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.plans.quality import q_join_ivm_twin

from .conftest import SF_DIR


def test_remap_moves_contributions(spark):
    rows = q_join_ivm_twin(spark, SF_DIR).collect()
    assert rows
    grps = {r["grp"] for r in rows}
    # the remapped group exists and holds real mass
    assert "GX" in grps
    gx_cnt = sum(r["cnt"] for r in rows if r["grp"] == "GX")
    assert gx_cnt > 0
    # every surviving row is positive (drained groups evicted)
    assert all(r["cnt"] > 0 for r in rows)
    # the total equals the survivor fact count restricted to the dim
    # keys that survive the wave-3 dim delete (length % 5 != 0): the
    # deleted dim keys' entire contributions were retracted
    total = sum(r["cnt"] for r in rows)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").where(
        F.length("event_type") % 5 != 0
    )
    # survivor arithmetic mirrors the oracle: base minus deletes plus
    # inserts (updates replace in place)
    eid = F.col("event_id")
    base = ev.where(eid % 3 != 0)
    deleted = base.where(
        (eid % 5 != 1) & ((eid % 7 == 2) | (eid % 7 == 3))
    ).count()
    inserted = ev.where(eid % 3 == 0).count()
    assert total == base.count() - deleted + inserted
    # the drained group (all its types deleted) must be evicted: at the
    # test domain 'click'/'error' (both G2 pre-remap, ascii-odd so
    # never remapped) are wave-3-deleted, draining G2 entirely
    assert "G2" not in grps
