"""The t2 gate, run locally at sf0.001: every registry query must match
its DuckDB oracle exactly (rows, columns, values)."""

from __future__ import annotations

import pytest

from options_data_pipeline_spark.plans import registry

from ._compare import assert_frames_match
from .conftest import SF_DIR

NAMES = sorted(registry.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = registry.queries()[name]
    oracles = registry.oracle_sql()
    spark_pdf = q(spark, SF_DIR).toPandas()
    if name not in oracles:
        assert spark_pdf is not None  # rows-only check
        return
    oracle_pdf = ddb.execute(oracles[name]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)
