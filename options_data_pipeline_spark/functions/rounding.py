"""Portable rounding / deterministic-aggregation helpers.

The correctness gate compares every query against a DuckDB oracle by value
hash, so any expression we emit must evaluate to the *identical* bits in
both engines. Two rules make that true:

1. **Rounding**: Spark's ``round``/``bround`` round via BigDecimal on the
   double's shortest decimal repr, DuckDB rounds differently again, and the
   reference rounds Python ``Decimal`` half-even
   (/root/reference/src/pipeline/aggregators/base.py:46). None of the three
   agree on edge cases. We standardize on an explicit half-away-from-zero
   formula built from IEEE primitives (``floor``, ``abs``, ``sign``) that
   both engines evaluate identically: this is a documented divergence from
   the reference's banker's rounding (SURVEY.md §7 risk 1).

2. **Sums over doubles are order-dependent.** Whenever a query SUMs or
   AVGs a double column, both the Spark plan and the oracle first cast to
   DECIMAL (exact, associative), aggregate, and cast the result back to
   double. The cast double->decimal uses round-half-up in both engines and
   the inputs are 2-decimal money-like values, so the decimals agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


ROUND_PASSTHROUGH = 1e9  # |x| beyond this: no meaningful 4-dec fraction


def round_half_away(col: Column, scale: int = 4) -> Column:
    """Round half away from zero at ``scale`` decimals, IEEE-portable.

    Guard: Spark's ``floor(double)`` returns LONG and silently clamps at
    Long.MAX (found by the property suite with degenerate near-zero
    opens), while DuckDB's floor stays double — so huge magnitudes are
    passed through unrounded in BOTH engines (above the threshold a
    double has no representable ``scale``-decimal fraction anyway).
    """
    factor = float(10**scale)
    rounded = F.floor(F.abs(col) * factor + F.lit(0.5)) / factor * _sign(col)
    return F.when(F.abs(col) >= F.lit(ROUND_PASSTHROUGH), col).otherwise(rounded)


def _sign(col: Column) -> Column:
    # F.signum(0.0) == 0.0 which would zero the rounded magnitude of 0 — fine.
    # But signum(-0.2) = -1.0: exactly what we need.
    return F.when(col < 0, F.lit(-1.0)).otherwise(F.lit(1.0))


def sql_round_half_away(expr: str, scale: int = 4) -> str:
    """The DuckDB-side twin of :func:`round_half_away` (same IEEE ops,
    same huge-magnitude passthrough)."""
    factor = float(10**scale)
    rounded = (
        f"floor(abs({expr}) * {factor} + 0.5) / {factor}"
        f" * (CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END)"
    )
    return (
        f"(CASE WHEN abs({expr}) >= {ROUND_PASSTHROUGH} THEN ({expr})"
        f" ELSE {rounded} END)"
    )


def dec_sum(col: Column, precision: int = 38, scale: int = 6) -> Column:
    """Deterministic SUM of a double column: exact decimal accumulation,
    result cast back to double. Identical bits regardless of partitioning."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def sql_dec_sum(expr: str, precision: int = 38, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
