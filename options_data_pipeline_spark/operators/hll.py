"""Deterministic mergeable HyperLogLog distinct-count sketches.

At 100 TB "how many distinct users" is a sketch problem: an exact
count-distinct shuffles every key once per question asked, while an HLL
register set is <= 256 rows per group, mergeable with a ``max`` —
compute per partition / per day / per source once, answer global and
rolled-up questions forever without rescanning the raw keys (Flajolet,
Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007, including its
linear-counting small-range branch).

Determinism is the whole design here (Spark's own
``approx_count_distinct`` is a black-box HLL++ whose hash no other
engine reproduces):

* hash = the first 15 hex chars of md5(key) read as a 60-bit integer —
  both engines agree bit-for-bit (``conv(substring(md5(x),1,15),16,10)``
  in Spark, ``('0x' || substr(md5(x),1,15))::BIGINT`` in DuckDB);
* bucket = low ``P_BITS`` bits, w = the high 52 bits, rho = 53 -
  bitlen(w) where bitlen is the length of ``bin(w)`` with leading zeros
  stripped — identical string machinery both engines, no float log2;
* the harmonic sum ``sum(2^-reg)`` is carried as the EXACT integer
  ``sum(2^(62-reg))`` in DECIMAL(38,0) — rho is in [1, 53], so every
  term is a long-safe power of two and the sum is associative across
  any partitioning; floats appear only in the final single division
  (and the ``m*ln(m/z)`` linear branch, which callers round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P_BITS = 8
M = 1 << P_BITS  # 256 registers
W_BITS = 60 - P_BITS  # 52 w-bits -> rho in [1, 53]
ALPHA = 0.7213 / (1 + 1.079 / M)
#: numerator of the raw estimate — one python-double constant whose
#: repr is shared verbatim with the oracle SQL: alpha * m^2 * 2^62
RAW_NUM = ALPHA * M * M * float(1 << 62)
LINEAR_THRESHOLD = 2.5 * M


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., bucket, reg): the HLL sketch of ``key_col`` per group
    as rows — at most ``M`` rows per group whatever the input size,
    produced by one map-side-combined groupBy.  Merging sketches is a
    further ``groupBy(bucket).max(reg)`` — no rescan of the raw keys."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    rho = (
        F.lit(W_BITS + 1)
        - F.length(F.regexp_replace(F.bin(F.shiftright(h, P_BITS)), "^0+", ""))
    ).cast("int")
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(M)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def merge_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches down to a coarser grouping: max per register.
    This is the operation that makes the sketch worth storing — a
    year's per-day sketches roll up to any range without a rescan."""
    return regs.groupBy(*group_cols, "bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., buckets_seen, hll_estimate): Flajolet's estimator with
    the small-range linear-counting branch, from register rows.

    The per-group reduction is exact-integer (see module doc): missing
    buckets contribute ``2^62`` each; the only floating point is the
    final ``RAW_NUM / S`` division and the linear branch's ``ln``."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("CAST(shiftleft(1L, 62 - reg) AS DECIMAL(38,0))")).alias(
            "s2"
        ),
        F.count(F.lit(1)).alias("buckets_seen"),
    )
    z = F.lit(M) - F.col("buckets_seen")
    s_full = (
        F.col("s2")
        + z.cast("decimal(38,0)") * F.lit(1 << 62).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(RAW_NUM) / s_full
    linear = F.lit(float(M)) * F.log(F.lit(float(M)) / z.cast("double"))
    est = F.when(
        (raw <= F.lit(LINEAR_THRESHOLD)) & (z > 0), linear
    ).otherwise(raw)
    return agg.select(*group_cols, "buckets_seen", est.alias("hll_estimate"))


def sql_hll_registers(key_sql: str, from_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`hll_registers`: SELECT text producing
    (``group_sql`` columns, bucket, reg).  ``group_sql`` is a
    comma-joined column list (must be plain column names)."""
    h = f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
    SELECT {group_sql}, bucket, MAX(rho) AS reg FROM (
        SELECT {group_sql}, h % {M} AS bucket,
               CAST({W_BITS + 1} - length(regexp_replace(
                    bin(h // {1 << P_BITS}), '^0+', '')) AS INT) AS rho
        FROM (SELECT {group_sql}, {h} AS h FROM {from_sql})
    ) GROUP BY {group_sql}, bucket
    """


def sql_hll_estimate(regs_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`hll_estimate` over register rows
    (``group_sql`` columns, bucket, reg)."""
    s_full = (
        f"CAST(SUM(CAST((CAST(1 AS BIGINT) << (62 - reg)) AS DECIMAL(38,0)))"
        f" + CAST(({M} - COUNT(*)) AS DECIMAL(38,0))"
        f" * CAST({1 << 62} AS DECIMAL(38,0)) AS DOUBLE)"
    )
    raw = f"({RAW_NUM!r} / {s_full})"
    linear = f"({float(M)!r} * ln({float(M)!r} / ({M} - COUNT(*))))"
    return f"""
    SELECT {group_sql}, COUNT(*) AS buckets_seen,
           CASE WHEN {raw} <= {LINEAR_THRESHOLD!r} AND ({M} - COUNT(*)) > 0
                THEN {linear} ELSE {raw} END AS hll_estimate
    FROM ({regs_sql}) GROUP BY {group_sql}
    """
