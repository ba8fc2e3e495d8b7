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
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        # numpy scalars coerce to Python ints: under numpy>=2.0,
        # repr(np.int64(5)) is 'np.int64(5)', which would hash-split
        # engines that yield plain ints for the same value (ADVICE r6)
        return int(v)
    if isinstance(v, np.floating):
        return float(v).hex()
    if isinstance(v, decimal.Decimal):
        # scale-insensitive: Decimal('1.5') and Decimal('1.50') are equal
        # values and must hash equal (ADVICE r6); normalize() canonicalizes
        # the exponent, and the extra format guard pins 1E+1 -> '10'
        d = v.normalize()
        return format(d, "f")
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
    # dtype-predicate checks, not substring matching: 'interval[int64]'
    # or other composite dtype names containing 'int' must not label as
    # int (ADVICE r6)
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
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
    # duplicate column names would make pdf.dtypes[c] return a Series and
    # the kind compare misbehave (ADVICE r6); compare positionally in
    # name-sorted order instead, which is also what the hash canon does
    s_order = sorted(range(len(spdf.columns)), key=lambda i: spdf.columns[i])
    o_order = sorted(range(len(opdf.columns)), key=lambda i: opdf.columns[i])
    for si, oi in zip(s_order, o_order):
        ks = _col_kind(spdf.iloc[:, [si]].set_axis(["_c"], axis=1), "_c")
        ko = _col_kind(opdf.iloc[:, [oi]].set_axis(["_c"], axis=1), "_c")
        if ks != ko and "empty" not in (ks, ko):
            return False
    return True


def schema_kinds(pdf: pd.DataFrame) -> dict[str, str]:
    return {c: _col_kind(pdf, c) for c in pdf.columns}


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    # positional access in name-sorted order: immune to duplicate column
    # names (df.iloc[i][c] on a dup name returns a Series) and avoids a
    # per-cell name lookup
    order = sorted(range(len(df.columns)), key=lambda i: df.columns[i])
    series = [df.iloc[:, i] for i in order]
    rows = [
        tuple(_canon_cell(s.iloc[i]) for s in series) for i in range(len(df))
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
