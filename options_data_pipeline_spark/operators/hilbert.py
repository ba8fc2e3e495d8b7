"""Hilbert-curve clustering keys for multi-dimensional data skipping.

Same role as :mod:`.zorder` (one integer key that gives every output
file a tight bounding box in BOTH interleaved dimensions), one strictly
better locality property: consecutive Hilbert indices are always GRID
NEIGHBORS (unit Manhattan step), while the Morton curve takes long
diagonal jumps at power-of-two boundaries — so an equal-width range of
Hilbert keys covers a more compact region, and range predicates touch
fewer files at the same file count.  This is the curve AWS S3 spatial
layouts and many OLAP engines cluster by when z-order isn't tight
enough.

Construction is the classic quadrant-rotation walk (the public-domain
``xy2d`` loop, e.g. Wikipedia "Hilbert curve"): per bit level ``s``,
the quadrant id ``(3·rx) XOR ry`` contributes ``s²`` steps and the
frame rotates/reflects.  The rotation is stateful, so unlike Morton
there is no closed-form bit shuffle — the loop UNROLLS into ``bits``
rounds of pure integer column arithmetic (whole-stage-codegen
friendly, no UDF), with named intermediate columns per round so the
expression tree stays linear in ``bits``.

Everything is integer math end-to-end; :func:`hilbert_sql_ctes`
generates the IDENTICAL unrolled rounds as chained DuckDB CTEs, so the
oracle reproduces every index bit-for-bit.  The flip uses ``n−1−x``
(full-grid complement): ``n−1−x`` is the bitwise complement of ``x``
in ``bits`` bits, and later rounds only read strictly lower bits, so
it agrees with the sub-square flip — both engines unroll the same
form, and the unit suite pins bijectivity + unit-step adjacency
(tests/test_hilbert.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (grid 0..2^BITS-1) — matches zorder.BITS so the
#: two layouts are comparable bucket-for-bucket
BITS = 10


def with_hilbert_index(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = BITS,
    out: str = "h",
) -> DataFrame:
    """Append the Hilbert index ``out`` of grid point ``(x, y)`` (both
    already quantized to ``0..2^bits-1`` — reuse
    :func:`..operators.zorder.quantize`).  ``bits`` unrolled rounds;
    intermediate columns are dropped."""
    n = 1 << bits
    d = df.withColumn("__hx", x.cast("long")).withColumn(
        "__hy", y.cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        d = (
            d.withColumn(
                "__rx",
                (F.col("__hx").bitwiseAND(F.lit(s)) > 0)
                .cast("long"),
            )
            .withColumn(
                "__ry",
                (F.col("__hy").bitwiseAND(F.lit(s)) > 0)
                .cast("long"),
            )
            .withColumn(
                out,
                F.col(out)
                + F.lit(s * s).cast("long")
                * (F.lit(3) * F.col("__rx")).bitwiseXOR(F.col("__ry")),
            )
        )
        flip_x = F.when(
            F.col("__rx") == 1, F.lit(n - 1) - F.col("__hx")
        ).otherwise(F.col("__hx"))
        flip_y = F.when(
            F.col("__rx") == 1, F.lit(n - 1) - F.col("__hy")
        ).otherwise(F.col("__hy"))
        # ry == 0: flip (iff rx == 1) then swap; ry == 1: unchanged
        nx = F.when(F.col("__ry") == 0, flip_y).otherwise(F.col("__hx"))
        ny = F.when(F.col("__ry") == 0, flip_x).otherwise(F.col("__hy"))
        d = (
            d.withColumn("__nx", nx)
            .withColumn("__ny", ny)
            .drop("__hx", "__hy")
            .withColumnRenamed("__nx", "__hx")
            .withColumnRenamed("__ny", "__hy")
        )
    return d.drop("__hx", "__hy", "__rx", "__ry")


def hilbert_sql_ctes(
    x: str, y: str, bits: int = BITS, src: str = "g0"
) -> tuple[str, str, str]:
    """The identical unrolled rounds as DuckDB SQL.

    Returns ``(ctes, final_cte, index_col)``: ``ctes`` is a CTE-body
    fragment to splice after a seed CTE named ``src`` that must expose
    integer columns ``{x}``, ``{y}`` plus whatever payload columns the
    caller carries (they are forwarded with ``* EXCLUDE`` renames);
    the Hilbert index is column ``hd`` of CTE ``final_cte``."""
    n = 1 << bits
    parts = []
    prev = src
    # seed round-state columns
    parts.append(
        f"h0 AS (SELECT *, CAST({x} AS BIGINT) AS hx,"
        f" CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {prev})"
    )
    prev = "h0"
    for r, i in enumerate(range(bits - 1, -1, -1), start=1):
        s = 1 << i
        cur = f"h{r}"
        parts.append(
            f"""{cur} AS (
    SELECT * EXCLUDE (hx, hy, hd),
           CASE WHEN ((hy & {s}) > 0) THEN hx
                WHEN ((hx & {s}) > 0) THEN {n - 1} - hy
                ELSE hy END AS hx,
           CASE WHEN ((hy & {s}) > 0) THEN hy
                WHEN ((hx & {s}) > 0) THEN {n - 1} - hx
                ELSE hx END AS hy,
           hd + {s * s} * xor(3 * (CASE WHEN (hx & {s}) > 0
                                        THEN 1 ELSE 0 END),
                              CASE WHEN (hy & {s}) > 0
                                   THEN 1 ELSE 0 END) AS hd
    FROM {prev})"""
        )
        prev = cur
    return ",\n".join(parts), prev, "hd"


def hilbert_xy2d_py(n: int, x: int, y: int) -> int:
    """Driver-side reference (the verbatim public xy2d walk) — used by
    the unit suite to pin the column unrolling against an independent
    implementation, never on any data path."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d
