"""Spark-vs-DuckDB result comparison mirroring the driver's t2 gate:
row count, column names, and order-insensitive exact values."""

from __future__ import annotations

import datetime
import math

import pandas as pd


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
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


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(df.iloc[i][c]) for c in cols) for i in range(len(df))
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
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
