"""Spark-vs-DuckDB result comparison — the single source of truth shared
by the pytest t2 gate and tools/driver_sim.py / tools/check_queries.py.

STRICTER than the external driver by design (VERDICT r5 #2): the r5
`candle_resample` driver-red slipped through because the old harness
tz-normalized timestamps before hashing and compared schemas by sorted
column names only. This canon is tz-SENSITIVE (a tz-aware timestamp
keeps its UTC offset in the hashed isoformat, so TIMESTAMPTZ never
matches naive TIMESTAMP) and dtype-strict (per-column canonical kind
labels must agree, not just names).
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # tz-sensitive on purpose: isoformat() keeps the offset, so an
        # aware timestamp can never hash equal to a naive one.
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        # exact bit repr — our determinism contract is bitwise equality
        return v.hex()
    if isinstance(v, (bool,)):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def _col_kind(pdf: pd.DataFrame, c) -> str:
    """Canonical type label for a result column. Distinguishes the
    classes a strict driver compare distinguishes — naive vs tz-aware
    timestamp, date vs timestamp, int vs float vs bool vs str vs bytes
    vs array — while staying robust to pandas conversion quirks both
    engines share (nullable BIGINT -> float64 happens on both sides for
    the same data)."""
    dt = pdf.dtypes[c]
    s = str(dt)
    if s.startswith("datetime64"):
        return (
            "timestamptz" if getattr(dt, "tz", None) is not None
            else "timestamp"
        )
    if s in ("bool", "boolean"):
        return "bool"
    if "int" in s.lower():
        return "int"
    if s.startswith("float"):
        return "float"
    for v in pdf[c]:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (pd.Timestamp, datetime.datetime)):
            return "timestamptz" if v.tzinfo is not None else "timestamp"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array"
        if isinstance(v, dict):
            return "map"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, float):
            return "float"
        return type(v).__name__
    return "empty"  # all-null column carries no type evidence in pandas


def schemas_match(spdf: pd.DataFrame, opdf: pd.DataFrame) -> bool:
    """Dtype-strict: same sorted names AND same canonical kind per
    column ('empty' wildcards an all-null column)."""
    if sorted(spdf.columns) != sorted(opdf.columns):
        return False
    for c in spdf.columns:
        ks, ko = _col_kind(spdf, c), _col_kind(opdf, c)
        if ks != ko and "empty" not in (ks, ko):
            return False
    return True


def schema_kinds(pdf: pd.DataFrame) -> dict[str, str]:
    return {c: _col_kind(pdf, c) for c in pdf.columns}


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(df.iloc[i][c]) for c in cols) for i in range(len(df))
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def canonical_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for r in canonical_rows(pdf):
        h.update(repr(r).encode())
    return h.hexdigest()


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
    )
    assert schemas_match(spark_pdf, oracle_pdf), (
        f"{name}: dtype mismatch {schema_kinds(spark_pdf)} vs "
        f"{schema_kinds(oracle_pdf)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first 3:\n"
        + "\n".join(f"  spark={a}\n  duck ={b}" for _, a, b in mismatches[:3])
        + f"\n  (cols sorted: {sorted(spark_pdf.columns)})"
    )
