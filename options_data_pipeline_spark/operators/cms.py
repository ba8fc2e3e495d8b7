"""Count-Min Sketch: mergeable point-frequency estimates.

Misra-Gries (:mod:`heavyhitters`) answers "which tokens are frequent";
it cannot answer "how often does THIS token occur" for an arbitrary
probe — its summary drops everything below the bar.  CMS (Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications", J. Algorithms 2005) keeps a D x W counter grid:
every occurrence increments one counter per row (row-salted hash), a
point query reads the MIN over its D cells — always an OVERestimate
(collisions only add), within eps*N with probability 1-delta for
W = e/eps, D = ln(1/delta).

Why it earns a slot at 100 TB: the grid is D*W integers regardless of
input size, counters MERGE BY ADDITION — per-partition / per-day / per-
language sketches sum into any rollup with no rescan — and the build is
one map-side-combined groupBy whose shuffle carries at most D*W cells
per mapper.

Determinism: row-salted md5 hashes (``md5(r || ':' || token)``), the
same 60-bit-prefix machinery as :mod:`hll` / :mod:`kmv`; everything is
integer arithmetic — no float anywhere, both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D = 4  # hash rows
W = 512  # counters per row


def cms_col(r: int, token: Column) -> Column:
    """Counter column of ``token`` in hash row ``r``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{r}:"), token.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(W))


def sql_cms_col(r: int, token_sql: str) -> str:
    return (
        f"(('0x' || substr(md5('{r}:' || CAST({token_sql} AS VARCHAR)),"
        f" 1, 15))::BIGINT % {W})"
    )


def cms_build(
    tokens: DataFrame, token_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., r, c, cnt): the CMS grid per group from one pass —
    explode the D rows per occurrence, then ONE map-side-combined
    groupBy; the shuffle moves <= D*W cells per mapper, not tokens."""
    rows = tokens.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_col(r, F.col(token_col)).alias("c"),
                    )
                    for r in range(D)
                ]
            )
        ).alias("rc"),
    )
    return (
        rows.select(*group_cols, "rc.r", "rc.c")
        .groupBy(*group_cols, "r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(grid: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge grids to a coarser grouping: counters ADD."""
    return grid.groupBy(*group_cols, "r", "c").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_query(
    grid: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., token, est): min over the D cells; absent cells read 0
    (a row whose cell was never touched has no grid entry).  ``probes``
    is a tiny frame — it broadcasts onto the <= groups*D*W-row grid.

    The grid's columns must be exactly ``group_cols + (r, c, cnt)`` and
    ``probes`` must carry the same group columns: probing a grouped grid
    without naming its groups would join every group's cells to every
    probe and min ACROSS groups — a silent wrong answer (ADVICE r7).
    Merge unwanted group columns away first with :func:`cms_merge`."""
    gcols = list(group_cols or [])
    expected = set(gcols) | {"r", "c", "cnt"}
    if set(grid.columns) != expected:
        raise ValueError(
            f"cms_query with group_cols={gcols} needs a grid with columns "
            f"exactly {sorted(expected)}; got {sorted(grid.columns)}. Merge "
            "group columns away first: cms_merge(grid, group_cols=[...])."
        )
    cells = probes.select(
        *gcols,
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_col(r, F.col(token_col)).alias("c"),
                    )
                    for r in range(D)
                ]
            )
        ).alias("rc"),
    ).select(*gcols, token_col, "rc.r", "rc.c")
    joined = cells.join(F.broadcast(grid), [*gcols, "r", "c"], "left").select(
        *gcols,
        token_col,
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cell"),
    )
    return joined.groupBy(*gcols, token_col).agg(F.min("cell").alias("est"))
