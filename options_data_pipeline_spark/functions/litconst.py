"""JVM-parsed constant-array literals.

Building a k x d plan constant Column-by-Column costs one py4j round
trip per element — measured ~2.7 s of pure driver time for 32x64 plane
matrices (execution of the same plan: 0.6 s). Rendering the constant as
SQL text and parsing it with ONE ``F.expr`` call eliminates that
entirely, and is bit-exact: ``repr(float)`` is the shortest
round-tripping decimal form and ``Double.parseDouble`` recovers the
identical IEEE value, so the resulting literals equal their
``F.lit(float(...))`` counterparts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def double_array_sql(vals: Sequence[float]) -> str:
    """SQL text for an array<double> constant."""
    return "array(" + ", ".join(f"{float(v)!r}D" for v in vals) + ")"


def double_matrix_sql(rows: Sequence[Sequence[float]]) -> str:
    """SQL text for an array<array<double>> constant."""
    return "array(" + ", ".join(double_array_sql(r) for r in rows) + ")"


def lit_double_array(vals: Sequence[float]) -> Column:
    return F.expr(double_array_sql(vals))


def lit_double_matrix(rows: Sequence[Sequence[float]]) -> Column:
    return F.expr(double_matrix_sql(rows))
