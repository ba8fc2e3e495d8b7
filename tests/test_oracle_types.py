"""Static oracle-type gate (VERDICT r5 #2): DESCRIBE every registry
oracle in DuckDB and assert no output column is typed WITH TIME ZONE.

The r5 `candle_resample` driver-red came from DuckDB's `to_timestamp()`
returning TIMESTAMP WITH TIME ZONE while Spark emits plain TIMESTAMP —
a mismatch the strict driver sees but a names-only schema compare does
not. DESCRIBE plans the query without executing it, so this covers the
whole registry in seconds and flags the defect class at the source.
"""

from __future__ import annotations

import pytest

from options_data_pipeline_spark.plans import registry

ORACLES = registry.oracle_sql()
NAMES = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", NAMES)
def test_oracle_has_no_tz_columns(ddb, name):
    desc = ddb.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in desc
        if "WITH TIME ZONE" in typ.upper() or "TIMESTAMPTZ" in typ.upper()
    ]
    assert not offenders, (
        f"{name}: oracle emits tz-aware column(s) {offenders} — Spark "
        "emits naive TIMESTAMP, so the driver's strict schema/hash "
        "check will fail. Use make_timestamp(micros) or CAST(... AS "
        "TIMESTAMP) in the oracle SQL."
    )
