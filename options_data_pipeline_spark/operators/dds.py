"""Relative-error quantile sketch buckets (DDSketch re-expressed as
exact decimal integer/string arithmetic).

DDSketch (Masson/Rim/Lee, VLDB 2019) gives quantiles with a RELATIVE
error guarantee by bucketing values at ``ceil(log_gamma |v|)`` — the
property the equi-width histogram store lacks: equi-width bins are
fixed-ABSOLUTE-error, so the p999 of a heavy-tailed value lands in one
giant bin, while log-scale buckets keep the same percentage width at
every magnitude.

The canonical bucket index needs ``ln()``, which this codebase treats
as a cross-engine libm hazard (Spark-JVM vs DuckDB last-ulp differences
flip bucket membership at boundaries and break the driver hash).  This
module uses the DECIMAL-log equivalent instead: quantize the value to
9 dp as a scaled BIGINT (the shared ``floor(abs*1e9 + 0.5)`` formula
from operators/pca.py), then bucket = the first ``DDS_SIG``
significant digits plus the decade, re-signed:

    bucket(v) = sign(v) * prefix3(m) * 10^(digits(m) - 3),  m = |v|*1e9

i.e. the bucket id IS the bucket's lower absolute bound at 1e-9 scale —
a BIGINT whose natural ordering is value order, computed with only
length/substr/repeat/CAST string ops that are bit-identical in Spark
and DuckDB.  With 3 significant digits the bucket's relative width is
<= 1/100 (gamma = 1.01), so any quantile answered at the bucket
midpoint carries <= 0.5% relative error at EVERY magnitude.  Counts are
plain per-bucket longs: mergeable by ADD (the same additive-store law
the CMS/histogram stores use), ~<= 900 buckets per decade spanned.
"""

from __future__ import annotations

#: significant digits per bucket (gamma ~= 1 + 10^-(DDS_SIG-1))
DDS_SIG = 3

#: quantiles the store consumer answers (p999 is the point of the
#: relative-error design — the equi-width store smears it)
DDS_QS = (0.5, 0.9, 0.99, 0.999)


#: magnitude bound of the in-range bucketing: |v| * 1e9 + 0.5 must fit
#: a signed 64-bit long (Long.MAX ~ 9.22e18), so |v| above this bound
#: routes to the overflow bucket instead of the scaled-long quantizer.
#: Without the guard Spark's non-ANSI cast CLAMPS to Long.MAX while
#: DuckDB RAISES on the same out-of-range cast (ADVICE r10) — the guard
#: text is shared, so both engines take the same branch.
DDS_MAX_ABS = 9.0e9

#: overflow bucket id: strictly above every in-range bucket id (the
#: largest in-range id is 922 * 10^16 for m near Long.MAX), so the
#: sentinel keeps value ordering and stays a valid BIGINT in both
#: engines.
DDS_OVERFLOW_BUCKET = 9_223_000_000_000_000_000


def sql_dds_bucket(val_sql: str) -> str:
    """Bucket id of ``val_sql`` as shared Spark/DuckDB SQL text: the
    signed lower absolute bound of the value's relative-error bucket,
    as a BIGINT at 1e-9 scale.  Pure integer/string arithmetic — no
    ln(), no pow().  Magnitudes at or above :data:`DDS_MAX_ABS` land in
    the signed overflow bucket (the scaled long would overflow, and
    Spark clamps where DuckDB raises)."""
    v = f"CAST({val_sql} AS DOUBLE)"
    m = f"CAST(floor(abs({v}) * 1000000000.0 + 0.5) AS BIGINT)"
    digits = f"length(CAST({m} AS STRING))"
    prefix = f"CAST(substr(CAST({m} AS STRING), 1, {DDS_SIG}) AS BIGINT)"
    # 10^(digits-3) built by string repeat: exact at any magnitude,
    # no libm pow
    scale = (
        f"CAST('1' || repeat('0', greatest({digits} - {DDS_SIG}, 0))"
        " AS BIGINT)"
    )
    sign = f"(CASE WHEN {v} < 0 THEN -1 ELSE 1 END)"
    return (
        f"(CASE WHEN abs({v}) >= {DDS_MAX_ABS!r}"
        f" THEN {sign} * CAST({DDS_OVERFLOW_BUCKET} AS BIGINT)"
        f" WHEN {m} = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE {sign} * {prefix} * {scale} END)"
    )


def sql_dds_mid(bucket_sql: str) -> str:
    """Bucket midpoint VALUE (double) of a bucket id, as shared SQL
    text: the bucket covers absolute m in [p*10^k, (p+1)*10^k), so the
    midpoint is (|bucket| + 0.5 * 10^k) / 1e9, re-signed.  One IEEE
    double expression of identical operands in both engines."""
    a = f"abs({bucket_sql})"
    digits = f"length(CAST({a} AS STRING))"
    scale = (
        f"CAST('1' || repeat('0', greatest({digits} - {DDS_SIG}, 0))"
        " AS BIGINT)"
    )
    sign = f"(CASE WHEN {bucket_sql} < 0 THEN -1.0 ELSE 1.0 END)"
    return (
        f"(CASE WHEN {bucket_sql} = 0 THEN 0.0"
        f" ELSE {sign} * (CAST({a} AS DOUBLE)"
        f" + 0.5 * CAST({scale} AS DOUBLE)) / 1000000000.0 END)"
    )
