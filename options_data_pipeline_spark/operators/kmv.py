"""KMV (k-minimum-values / bottom-k theta) distinct sketches.

HLL (:mod:`hll`) answers "how many distinct" and merges by union — but
it cannot intersect: "how many users did BOTH click and purchase" needs
a sketch that carries a uniform sample of the key space.  KMV keeps the
``K`` smallest hash values per group (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002; the theta-sketch
framing is Dasgupta et al., "A framework for estimating cardinality of
set expressions", 2015-16 DataSketches line).  Estimates:

* |S| ≈ (K-1) / theta where theta = h_K / 2^60 (the K-th smallest hash
  scaled to (0,1)); if the group has fewer than K distinct keys the
  sketch IS the set and the count is exact;
* union: the K smallest of the two sketches' union is a valid KMV of
  A ∪ B (each sketch contains EVERY hash below its own theta);
* intersection: inclusion-exclusion over the three estimates, clamped
  at 0.

Same determinism contract as :mod:`hll`: the 60-bit md5-prefix hash is
reproduced bit-for-bit by DuckDB, ranks tie-break on the hash value
itself (distinct values — no ties), and the only float op is the final
``(K-1) * 2^60 / h_K`` division.

Scale shape: one distinct-pair shuffle, then the bottom-K per group via
:func:`ranks.grouped_topk` (salted two phases — no one-task-per-group
window over billions of keys); everything downstream touches <= K rows
per group."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K = 64
#: (K-1) * 2^60 — exact python double, repr-shared with oracle SQL
EST_NUM = float(K - 1) * float(1 << 60)


def hash60(col) -> F.Column:
    """The shared 60-bit md5-prefix hash (see :mod:`hll`)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def sql_hash60(key_sql: str) -> str:
    return f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))::BIGINT"


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., h, rank): the K smallest distinct key hashes per
    group.  Distinct first (one shuffle on (group, key)), then the
    salted two-phase bottom-K — never a full-group single task."""
    from .ranks import grouped_topk

    hashed = (
        df.select(*group_cols, F.col(key_col).alias("_k"))
        .distinct()
        .select(*group_cols, hash60(F.col("_k")).alias("h"))
    )
    return grouped_topk(
        hashed, group_cols, [("h", False)], K, "h"
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., n_kept, est): (K-1)/theta when the sketch is full,
    the exact kept count when the group had fewer than K keys."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    est = F.when(
        F.col("n_kept") < K, F.col("n_kept").cast("double")
    ).otherwise(F.lit(EST_NUM) / F.col("h_k").cast("double"))
    return agg.select(*group_cols, "n_kept", est.alias("est"))


def sql_kmv_estimate(sketch_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`kmv_estimate` over sketch rows
    (``group_sql`` columns, h)."""
    return f"""
    SELECT {group_sql}, COUNT(*) AS n_kept,
           CASE WHEN COUNT(*) < {K} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE {EST_NUM!r} / CAST(MAX(h) AS DOUBLE) END AS est
    FROM ({sketch_sql}) GROUP BY {group_sql}
    """
