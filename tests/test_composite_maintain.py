"""composite_maintain: the maintained bloom index must equal a
from-scratch rebuild BIT-FOR-BIT (OR is associative — the algebra the
delta-only merge rests on), and a red control proves the probe matrix
is load-bearing: skipping the index merge breaks the no-false-negative
law on delta keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.bloom import bloom_positions
from options_data_pipeline_spark.plans.tpch2 import (
    CP_BLOOM_K,
    CP_BLOOM_M,
    ZM_DELTA_MOD,
    q_composite_maintain,
    z_coded_orders,
)

from .conftest import SF_DIR


def _slot_words(rows):
    pos = rows.select(
        "file_id",
        F.explode(
            bloom_positions(F.col("ok"), CP_BLOOM_M, CP_BLOOM_K)
        ).alias("pos"),
    )
    return pos.groupBy(
        "file_id",
        F.floor(F.col("pos") / F.lit(63)).cast("long").alias("word"),
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pos % 63 AS INT))")).alias(
            "bits"
        )
    )


def test_maintained_index_equals_rebuild(spark):
    """init words OR delta words == full-corpus words, per (slot, word),
    bit-for-bit — the associativity the delta-only maintenance rests
    on, asserted directly (the driver row asserts it via probes)."""
    coded, _b = z_coded_orders(spark, SF_DIR, include_ok=True)
    coded = coded.select(
        F.col("file_id").cast("long").alias("file_id"), "ok"
    ).localCheckpoint()
    init = coded.where(F.col("ok") % ZM_DELTA_MOD != 0)
    delta = coded.where(F.col("ok") % ZM_DELTA_MOD == 0)
    maintained = (
        _slot_words(init)
        .unionByName(_slot_words(delta))
        .groupBy("file_id", "word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    rebuilt = _slot_words(coded)
    m = {(r["file_id"], r["word"]): r["bits"] for r in maintained.collect()}
    rb = {(r["file_id"], r["word"]): r["bits"] for r in rebuilt.collect()}
    assert m == rb


def test_probe_matrix_catches_skipped_merge_red_control(spark):
    """RED: every present (key, window, file) cell in the real query is
    touched; recomputing the same verdicts against an index that
    SKIPPED the delta merge must violate present => bloom_maybe for at
    least one delta-key cell — the adjudication detects a lost merge,
    it doesn't just assume it."""
    rows = q_composite_maintain(spark, SF_DIR).collect()
    assert rows and all(
        r["bloom_maybe"] == 1 for r in rows if r["present"]
    )
    # delta keys: ok % ZM_DELTA_MOD == 0 — present somewhere by
    # construction of the probe set at this scale
    delta_present = [
        r for r in rows if r["present"] and r["ok"] % ZM_DELTA_MOD == 0
    ]
    assert delta_present, "probe set holds no delta key — weak fixture"

    # rebuild the verdicts against the UNMAINTAINED (init-only) index
    coded, _b = z_coded_orders(spark, SF_DIR, include_ok=True)
    coded = coded.select(
        F.col("file_id").cast("long").alias("file_id"), "ok"
    ).localCheckpoint()
    init_idx = _slot_words(
        coded.where(F.col("ok") % ZM_DELTA_MOD != 0)
    ).localCheckpoint()
    probes = spark.createDataFrame(
        [(r["ok"], r["file_id"]) for r in delta_present],
        "ok long, file_id long",
    )
    gpos = probes.select(
        "ok",
        "file_id",
        F.explode(
            bloom_positions(F.col("ok"), CP_BLOOM_M, CP_BLOOM_K)
        ).alias("pos"),
    )
    hit = gpos.join(
        F.broadcast(init_idx),
        (gpos["file_id"] == init_idx["file_id"])
        & (
            F.floor(F.col("pos") / F.lit(63)).cast("long")
            == F.col("word")
        ),
        "left",
    ).select(
        "ok",
        gpos["file_id"].alias("file_id"),
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                F.expr("shiftleft(1L, CAST(pos % 63 AS INT))")
            )
            != 0
        ).cast("int").alias("h"),
    )
    stale = hit.groupBy("ok", "file_id").agg(F.min("h").alias("maybe"))
    # at least one present delta cell must now read maybe=0: the lost
    # merge is VISIBLE to the adjudication (fpp can mask some cells,
    # never all — k independent bits per key)
    assert stale.where(F.col("maybe") == 0).count() > 0


def test_layout_contract_check_survives_optimized_mode():
    """ADVICE r12: the one-file-per-slot write contract must be
    enforced unconditionally (a bare `assert` is stripped under
    `python -O`, letting a broken layout flow into the adjudicated
    footer stats).  Grep-grade pin: no bare assert guards the pfiles
    contract in tpch2.py; the explicit RuntimeError does."""
    import os
    import re

    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "options_data_pipeline_spark",
            "plans",
            "tpch2.py",
        )
    ).read()
    assert not re.search(r"assert len\(pfiles\)", src)
    assert src.count("per-slot write contract broke") >= 2  # both sites
    assert "raise RuntimeError(" in src


def test_maintain_oracle_shares_prune_text_by_parameter():
    """ADVICE r12: oracle_composite_maintain must be the parameterized
    oracle_composite_prune (extra_cols), not post-hoc string surgery —
    byte-identity modulo the appended files_after column."""
    from options_data_pipeline_spark.plans.tpch2 import (
        oracle_composite_maintain,
        oracle_composite_prune,
    )

    prune = oracle_composite_prune()
    maint = oracle_composite_maintain()
    extra = ",\n       CAST(1 AS BIGINT) AS files_after"
    assert maint == prune.replace(
        "END AS present\nFROM maybe m", f"END AS present{extra}\nFROM maybe m"
    )
    assert maint.count("files_after") == 1
