"""AMS (Alon-Matias-Szegedy) F2 sketch: self-join-size / key-skew
estimates from one pass.

F2 = sum over keys of count(key)^2 is the statistic behind two scale
decisions this engine keeps making: self-join/join OUTPUT size (the
thing a planner wants before committing to a shuffle strategy) and key
skew (F2/n >> typical count means a hot key — salt it).  Computing F2
exactly costs a full groupBy over the keys; the AMS sketch (Alon,
Matias & Szegedy, "The space complexity of approximating the frequency
moments", STOC 1996) gets an unbiased estimate from D running counters:

* per sketch row r, a +/-1 hash s_r(key); the counter is
  X_r = sum over OCCURRENCES of s_r(key) — each occurrence contributes
  its sign, so per-key counts accumulate without ever grouping by key;
* E[X_r^2] = F2; averaging X_r^2 over D rows gives relative error
  ~ sqrt(2/D).

Mergeable by ADDITION (X_r counters sum across partitions/days), like
the CMS grid.  Same determinism contract as the other sketches: the
sign is the parity of the row-salted 60-bit md5 hash, counters are
exact integers, and the only float op is the final divide-by-D."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D = 64  # sketch rows: rel. error ~ sqrt(2/64) ~= 18%
#: divisor as an exact python double, repr-shared with oracle SQL
D_F = float(D)


def ams_sign(r: int, key: Column) -> Column:
    """+1/-1 from the parity of the row-salted md5-prefix hash."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{r}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(2)) * 2 - 1).cast("long")


def sql_ams_sign(r: int, key_sql: str) -> str:
    return (
        f"((('0x' || substr(md5('{r}:' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 15))::BIGINT % 2) * 2 - 1)"
    )


def ams_counters(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., r, x): the D signed counters per group — one map-side-
    combined groupBy whose shuffle carries D cells per mapper; the raw
    keys are never grouped."""
    rows = df.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        ams_sign(r, F.col(key_col)).alias("s"),
                    )
                    for r in range(D)
                ]
            )
        ).alias("rs"),
    )
    return (
        rows.select(*group_cols, "rs.r", "rs.s")
        .groupBy(*group_cols, "r")
        .agg(F.sum("s").alias("x"))
    )


def ams_f2_estimate(
    counters: DataFrame, group_cols: list[str]
) -> DataFrame:
    """(group..., f2_est): mean of X_r^2 over the D rows.  X_r^2 and
    the sum stay exact integers; the single float op is the final /D."""
    return counters.groupBy(*group_cols).agg(
        (
            F.sum(F.col("x") * F.col("x")).cast("double") / F.lit(D_F)
        ).alias("f2_est")
    )


def sql_ams_f2(counters_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`ams_f2_estimate` over counter rows
    (``group_sql`` columns, r, x)."""
    return f"""
    SELECT {group_sql}, CAST(SUM(x * x) AS DOUBLE) / {D_F!r} AS f2_est
    FROM ({counters_sql}) GROUP BY {group_sql}
    """
