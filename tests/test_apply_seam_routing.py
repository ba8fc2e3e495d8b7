"""The r13 `#apply` audit rows (PLANS.md) are only trustworthy if the
audited seam IS the code the apply executes — a structural guarantee
today (the applies call the frame builders), but nothing stopped a
future edit from inlining a divergent plan into an apply while the
audit kept pinning the stale seam.  These tests make the routing
mechanical: monkeypatch each seam and assert its apply goes through it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _events(spark, cols):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(*cols)
        .limit(200)
    )


def _route_check(monkeypatch, module, seam_name, run):
    """Replace ``module.seam_name`` with a recorder that delegates to
    the real seam; ``run()`` must trip it."""
    real = getattr(module, seam_name)
    calls = []

    def recorder(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(module, seam_name, recorder)
    run()
    assert calls, f"{seam_name} was NOT routed through by its apply"


def test_additive_applies_route_through_merge_frame(
    spark, tmp_path, monkeypatch
):
    from options_data_pipeline_spark.streaming import sketches

    ev = _events(spark, ["ts", "user_id"])
    _route_check(
        monkeypatch,
        sketches,
        "additive_merge_frame",
        lambda: sketches.cms_apply_batch(
            spark, str(tmp_path / "cms"), ev, 0
        ),
    )


def test_mg_apply_routes_through_merge_frame(spark, tmp_path, monkeypatch):
    from options_data_pipeline_spark.streaming import sketches

    ev = _events(spark, ["ts", "user_id"])
    _route_check(
        monkeypatch,
        sketches,
        "mg_merge_frame",
        lambda: sketches.mg_apply_batch(spark, str(tmp_path / "mg"), ev, 0),
    )


def test_candles_apply_routes_through_rebuild_frame(
    spark, tmp_path, monkeypatch
):
    from options_data_pipeline_spark.streaming import candles

    src = str(tmp_path / "src")
    ev = _events(spark, ["event_id", "ts", "event_type", "value"])
    ev.write.parquet(src)
    _route_check(
        monkeypatch,
        candles,
        "candles_rebuild_frame",
        lambda: candles.candles_apply_batch(
            spark, src, str(tmp_path / "gold"), spark.read.parquet(src)
        ),
    )


@pytest.fixture()
def _cdc_fixture(spark, tmp_path):
    ev = _events(spark, ["event_id", "ts", "event_type", "value"]).select(
        "event_id",
        F.to_date("ts").alias("day"),
        "event_type",
        "value",
    )
    fact_path = str(tmp_path / "fact")
    ev.write.parquet(fact_path)
    batch = ev.limit(20).select(
        "event_id",
        "day",
        "event_type",
        (F.col("value") * 2).alias("value"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
    )
    return fact_path, batch.localCheckpoint()


def test_ivm_apply_routes_through_merge_frame(
    spark, tmp_path, monkeypatch, _cdc_fixture
):
    from options_data_pipeline_spark.streaming import ivm

    fact_path, batch = _cdc_fixture
    _route_check(
        monkeypatch,
        ivm,
        "ivm_apply_merge_frame",
        lambda: ivm.ivm_apply_batch(
            spark, fact_path, str(tmp_path / "view"), batch, 0
        ),
    )


def test_join_ivm_apply_routes_through_adjust_frames(
    spark, tmp_path, monkeypatch, _cdc_fixture
):
    from options_data_pipeline_spark.streaming import ivm

    fact_path, batch = _cdc_fixture
    dim_path = str(tmp_path / "dim")
    (
        spark.read.parquet(fact_path)
        .select("event_type")
        .distinct()
        .select("event_type", F.lit("G0").alias("grp"))
        .write.parquet(dim_path)
    )
    for seam in ("join_ivm_adjust_frame", "join_ivm_view_adjust_frame"):
        _route_check(
            monkeypatch,
            ivm,
            seam,
            lambda: ivm.join_ivm_apply_batch(
                spark,
                fact_path,
                str(tmp_path / f"agg_{seam}"),
                str(tmp_path / f"view_{seam}"),
                dim_path,
                batch,
                0,
            ),
        )


def test_ivm_consumers_route_through_consume_seams(
    spark, tmp_path, monkeypatch
):
    """VERDICT r13 ask #3: the `#consume` audit rows pin the view-READ
    paths — meaningful only if the twins' terminal reads actually
    execute the seams.  Both batch twins (and their stream twins, which
    share the same final read) must trip them."""
    from options_data_pipeline_spark.plans import quality

    _route_check(
        monkeypatch,
        quality,
        "ivm_view_consume_frame",
        lambda: quality.q_agg_ivm_twin(spark, SF_DIR),
    )
    _route_check(
        monkeypatch,
        quality,
        "jivm_view_consume_frame",
        lambda: quality.q_join_ivm_twin(spark, SF_DIR),
    )
