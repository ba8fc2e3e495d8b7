"""Golden-hash regression pin for ``pca_project`` (VERDICT r9 ask #1).

The query has no SQL oracle (eigendecomposition), so for nine rounds its
driver row was rows-only: a component sign flip or reorder would have
passed every algebraic invariant in tests/test_pca.py.  These tests pin
the actual projected VALUES — the committed canonical hash per scale in
plans/goldens.py must reproduce at HEAD, and a deliberately sign-flipped
projection must hash DIFFERENTLY (the probe that proves the pin has
teeth).  tools/driver_sim.py adjudicates the same goldens per run, so
``CORRECTNESS_SELF_*`` carries a ``golden_hash`` row instead of
``no_oracle``.
"""

from __future__ import annotations

import os

import pytest

from options_data_pipeline_spark.plans.goldens import (
    GOLDEN_HASHES,
    golden_for,
)

from ._compare import canonical_hash


def _project_hash(spark, sf_dir: str) -> str:
    from options_data_pipeline_spark.plans.vectors import q_pca_project

    return canonical_hash(q_pca_project(spark, sf_dir).toPandas())


def test_golden_hash_sf0001(spark):
    sf_dir = "/root/testdata/sf0.001"
    assert _project_hash(spark, sf_dir) == golden_for("pca_project", sf_dir)


@pytest.mark.parametrize("sf", ["sf0.01", "sf0.1"])
def test_golden_hash_other_scales(spark, sf):
    sf_dir = f"/root/testdata/{sf}"
    if not os.path.exists(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    assert _project_hash(spark, sf_dir) == golden_for("pca_project", sf_dir)


def test_every_golden_entry_names_a_registry_query():
    from options_data_pipeline_spark.plans import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    for name in GOLDEN_HASHES:
        assert name in qs, f"golden for unknown query {name}"
        # goldens exist to cover the no-oracle gap; an oracle-bearing
        # query must be adjudicated by the oracle, not shadowed by a pin
        assert name not in oracles, f"{name} has an oracle AND a golden"


def test_sign_flip_goes_red(spark):
    """Flipping one component's sign must change the canonical hash —
    i.e. the golden pin actually detects the failure mode (sign/order
    drift) that the algebraic invariants cannot."""
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.operators.pca import (
        fit_loadings,
        project,
    )
    from options_data_pipeline_spark.plans.vectors import (
        _PCA_COMPONENTS,
        parallelized,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    emb = parallelized(spark, load_table(spark, sf_dir, "embeddings"))
    loadings, _ = fit_loadings(emb, n_components=_PCA_COMPONENTS)
    flat = emb.select(F.posexplode("embedding").alias("pos", "vf"))
    mean_rows = (
        flat.groupBy("pos")
        .agg(
            (F.sum(F.col("vf").cast("decimal(38,6)")) / F.count(F.lit(1)))
            .cast("double")
            .alias("mu")
        )
        .orderBy("pos")
        .collect()
    )
    means = [r["mu"] for r in mean_rows]
    flipped = loadings.copy()
    flipped[1] = -flipped[1]  # the un-canonical sign choice
    pdf = (
        project(emb, flipped, means)
        .select("vec_id", "label", "pc1", "pc2")
        .toPandas()
    )
    assert canonical_hash(pdf) != golden_for("pca_project", sf_dir)
