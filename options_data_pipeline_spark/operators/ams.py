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

Cost shape (measured: a 64-way per-row explode of md5 folds ran the
sf0.1 query in ~15 s): the D signs come from TWO md5 hashes per row —
sign r is BIT (r mod 32) of hash (r div 32) — and the reduction is ONE
hash aggregate with D sum columns (map-side combined, no row blow-up),
unpivoted to (r, x) rows only after the aggregate, when each group is
a single row.  md5 bits are far stronger than the 4-wise independence
the AMS analysis asks for.

Mergeable by ADDITION (X_r counters sum across partitions/days), like
the CMS grid.  Same determinism contract as the other sketches: bit
extraction from the shared 60-bit md5-prefix hash, exact-integer
counters, and the only float op is the final divide-by-D."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D = 64  # sketch rows: rel. error ~ sqrt(2/64) ~= 18%
#: divisor as an exact python double, repr-shared with oracle SQL
D_F = float(D)
#: sign r reads bit (r % SIGN_BITS) of hash (r // SIGN_BITS)
SIGN_BITS = 32


def _hash60(salt: int, key: Column) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def _sql_hash60(salt: int, key_sql: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}:' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 15))::BIGINT"
    )


def ams_sign(r: int, key: Column) -> Column:
    """+1/-1: bit (r % 32) of the (r // 32)-salted md5-prefix hash."""
    h = _hash60(r // SIGN_BITS, key)
    return (
        F.shiftright(h, r % SIGN_BITS).bitwiseAND(F.lit(1)) * 2 - 1
    ).cast("long")


def sql_ams_sign(r: int, key_sql: str) -> str:
    h = _sql_hash60(r // SIGN_BITS, key_sql)
    return f"((({h} >> {r % SIGN_BITS}) & 1) * 2 - 1)"


def ams_counters(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., r, x): the D signed counters per group — one hash
    aggregate with D sum columns over the scan (the two md5s per row
    are subexpression-shared across their 32 signs), stacked to rows
    once each group is a single row.  The raw keys are never grouped;
    the shuffle carries D longs per mapper per group."""
    key = F.col(key_col)
    hashes = [_hash60(s, key) for s in range(D // SIGN_BITS)]
    sums = [
        F.sum(
            (
                F.shiftright(hashes[r // SIGN_BITS], r % SIGN_BITS)
                .bitwiseAND(F.lit(1))
                * 2
                - 1
            ).cast("long")
        ).alias(f"x{r}")
        for r in range(D)
    ]
    agg = df.groupBy(*group_cols).agg(*sums)
    stack = (
        f"stack({D}, "
        + ", ".join(f"{r}, x{r}" for r in range(D))
        + ") AS (r, x)"
    )
    return agg.selectExpr(*group_cols, stack)


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


def sql_ams_counters(key_sql: str, from_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`ams_counters`: SELECT text producing
    (``group_sql`` columns, r, x) via the same aggregate-then-unpivot
    shape (the 64 UNION branches read the tiny aggregated row, not the
    input).  ``group_sql`` must be a comma-joined plain column list."""
    sums = ", ".join(
        f"SUM(CAST({sql_ams_sign(r, key_sql)} AS BIGINT)) AS x{r}"
        for r in range(D)
    )
    unpivot = " UNION ALL ".join(
        f"SELECT {group_sql}, {r} AS r, x{r} AS x FROM agg"
        for r in range(D)
    )
    return f"""
    WITH agg AS (
        SELECT {group_sql}, {sums} FROM {from_sql} GROUP BY {group_sql}
    )
    {unpivot}
    """


def sql_ams_f2(counters_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`ams_f2_estimate` over counter rows
    (``group_sql`` columns, r, x)."""
    return f"""
    SELECT {group_sql}, CAST(SUM(x * x) AS DOUBLE) / {D_F!r} AS f2_est
    FROM ({counters_sql}) GROUP BY {group_sql}
    """
