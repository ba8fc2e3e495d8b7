"""Deterministic bottom-k row reservoirs (rank-hash sampling).

The sketch-store family (HLL / CMS / HIST / DDS / KMV) carries
COUNTERS; a training-data pipeline also needs the rows themselves — a
uniform (or weight-proportional) sample per partition that can be
merged upward without re-touching the raw data: eyeball samples per
crawl day, eval slices per language, seed rows for labeling.

The classic reservoir (Vitter's Algorithm R) is sequential and
RNG-stateful — wrong on both counts for a distributed, replayed
pipeline.  The rank-hash formulation fixes both: give every row a
DETERMINISTIC priority and keep the bottom ``k`` per group.

* **uniform**: priority = the shared 60-bit md5-prefix hash
  (:func:`..operators.kmv.hash60`) of the row key — a fixed uniform
  draw per key, identical across engines, retries, and replays;
* **weighted**: priority = ``CAST(h AS DOUBLE) / CAST(w AS DOUBLE)``.
  Two IEEE-correctly-rounded core ops (long→double conversion,
  division) on identical operands — bit-portable with no libm — and
  heavier rows systematically draw smaller priorities, the
  exponential-clocks shape of weighted sampling (Efraimidis-Spirakis
  A-ES uses u^(1/w); ``h/w`` is the same order statistic family with
  the exp() hazard removed, and it is THE definition of this operator's
  contract).

**Merge law** (the store property): the union of per-partition
bottom-k sets contains the global bottom-k — any row among the k
smallest overall is among the k smallest of its own partition — so
rolling day samples up to a week is ``union → re-bottom-k``, exactly
the KMV merge, applied to whole rows.  No resketching, no raw rescan.

Scale shape: ranking goes through :func:`..operators.ranks.
grouped_topk` (salted two-phase) — never a one-task-per-group window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmv import hash60, sql_hash60

#: rows kept per reservoir (group) — pinned, shared with oracles
RSV_K = 8

#: domain tag so reservoir priorities never collide with other users of
#: the shared hash (same discipline as every md5 consumer here)
RSV_TAG = "rsv#"


def rsv_priority(key: Column) -> Column:
    """Uniform deterministic priority of a row key."""
    return hash60(F.concat(F.lit(RSV_TAG), key.cast("string")))


def sql_rsv_priority(key_sql: str) -> str:
    return sql_hash60(f"'{RSV_TAG}' || CAST({key_sql} AS VARCHAR)")


def rsv_weighted_priority(key: Column, weight: Column) -> Column:
    """Weight-proportional priority: h/w as one IEEE double division —
    bit-portable (both casts and the division are correctly rounded on
    identical operands in Spark and DuckDB).  ``weight`` must be a
    positive integer column; callers filter/guard their domain."""
    return rsv_priority(key).cast("double") / weight.cast("double")


def sql_rsv_weighted_priority(key_sql: str, weight_sql: str) -> str:
    return (
        f"(CAST({sql_rsv_priority(key_sql)} AS DOUBLE)"
        f" / CAST({weight_sql} AS DOUBLE))"
    )


def reservoir_bottom_k(
    df: DataFrame,
    group_cols: Sequence[str],
    priority_col: str,
    tie_col: str,
    k: int = RSV_K,
) -> DataFrame:
    """Bottom-``k`` rows per group by (priority, tie) ascending, with a
    ``rank`` column — the reservoir itself and the merge step share
    this one primitive (union in, bottom-k out).  Salted two-phase
    ranking; the tie column (the row key — unique) makes the order
    total, so the kept set is deterministic even under 60-bit hash
    collisions."""
    from .ranks import grouped_topk

    return grouped_topk(
        df,
        list(group_cols),
        [(priority_col, False), (tie_col, False)],
        k,
        tie_col,
    )
