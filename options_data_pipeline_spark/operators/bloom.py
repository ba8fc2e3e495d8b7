"""DataFrame-native Bloom filter for anti-join prefiltering.

Incremental ingest at 100 TB adjudicates an incoming batch against a
standing corpus of billions of keys.  A direct anti-join shuffles the
FULL incoming batch against the FULL key set even though almost every
incoming row is genuinely new.  The classic fix is the Bloom-filter
semi-join: an m-bit filter over the existing keys is compact (~1.2 GB
per 10^9 keys at 1% fpp), broadcasts once, and discards ~99% of the
new rows map-side; only might-contain rows (true dups plus the fpp
tail) reach the exact anti-join.  The final answer is EXACT — Bloom
filters have no false negatives — while the shuffle sees ~|dups| rows
instead of |batch| rows.

Spark's own bloom machinery is unusable here: ``bloom_filter_agg`` /
``might_contain`` are internal expressions (not on the public function
registry), and ``DataFrameStatFunctions.bloomFilter`` materializes the
filter on the driver and would need a row-at-a-time Python UDF to
probe.  This module instead builds the filter AS A DATAFRAME — a
``(word, bits)`` bitmap of at most ``ceil(m/63)`` rows aggregated with
``bit_or`` — and probes it with a broadcast hash join.  Words pack 63
usable bits (shift 0..62): the repo-wide bloom convention (shared with
the two index queries in ``plans/quality.py``) that keeps the sign bit
forever clear — DuckDB raises on ``1::BIGINT << 63`` where Spark
wraps negative, and ``bit_count`` on a sign-bit word need not be
litigated if bits ever reach an oracle.  Every step is
JVM-side expression work, fully distributed, and (deliberately)
oracle-checkable: the k probe positions derive from md5 hex arithmetic
that Spark (``conv(substr(md5(x),..),16,10)``) and DuckDB
(``('0x' || substr(md5(x),..))::UBIGINT``) compute bit-identically.

Positions use the Kirsch–Mitzenmacher double-hashing scheme
``pos_i = (h1 + i*h2) mod m`` with h1/h2 the two 60-bit halves of
md5(key), which preserves the standard fpp bound with just one
digest per row.

Reference parity: the reference dedups on write via ``ON CONFLICT
(trade_id) DO NOTHING`` inside PostgreSQL
(`reference/src/pipeline/collectors/deribit.py:128`); the engine-side
equivalent at scale is exactly this prefiltered anti-join feeding K2
``insert_if_absent``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default filter geometry: 2^20 bits / k=5 holds ~10^5 keys at ~1% fpp.
#: At real corpus scale callers size m ~ 10 bits per existing key.
M_BITS = 1 << 20
K_HASHES = 5


def _halves(key: Column) -> tuple[Column, Column]:
    """The two 60-bit halves of md5(key) as longs (h1, h2)."""
    d = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 16, 15), 16, 10).cast("long")
    return h1, h2


def bloom_positions(key: Column, m_bits: int = M_BITS, k: int = K_HASHES) -> Column:
    """``array<long>`` of the k bit positions for ``key``.

    (h1 + i*h2) stays inside signed-64 range: h1, h2 < 2^60 and
    i <= k-1, so the sum is < 2^60 * (k+1) — safe for k <= 7.
    """
    if k > 7:
        raise ValueError("k > 7 overflows the 60-bit double-hash sum")
    h1, h2 = _halves(key)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)),
    )


def bloom_build(
    existing: DataFrame, key: Column, m_bits: int = M_BITS, k: int = K_HASHES
) -> DataFrame:
    """Aggregate existing keys into a ``(word long, bits long)`` bitmap.

    At most ``ceil(m_bits/63)`` rows regardless of |existing| — the
    whole frame is broadcastable by construction.  One shuffle (the
    word groupBy), map-side combined: each task emits at most ~m/63
    partial words no matter how many keys it scans.
    """
    pos = existing.select(
        F.explode(bloom_positions(key, m_bits, k)).alias("pos")
    )
    return (
        pos.groupBy(F.floor(F.col("pos") / F.lit(63)).cast("long").alias("word"))
        .agg(F.bit_or(F.expr("shiftleft(1L, CAST(pos % 63 AS INT))")).alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    bitmap: DataFrame,
    key: Column,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """``probe`` + ``bloom_pass``: true iff all k bits are set.

    ZERO shuffles of the probe side: the obvious form (explode the k
    positions, join, fold back with a groupBy) shuffles k x |probe|
    rows just to AND five booleans.  Instead each of the k positions
    gets its own broadcast LEFT join against the (word, bits) bitmap —
    the probe's partitioning is untouched, so at 100 TB the filter is
    applied entirely map-side and the k joins fuse into one codegen
    stage.  A position whose word row is absent from the bitmap is an
    unset bit (left-join null -> false).
    """
    if k > 7:
        raise ValueError("k > 7 overflows the 60-bit double-hash sum")
    h1, h2 = _halves(key)
    keep = list(probe.columns)
    out = probe
    hits = []
    for i in range(k):
        pos_c = f"_bpos{i}"
        out = out.withColumn(
            pos_c, F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(m_bits))
        )
        # the SAME bitmap frame each time (only a SubqueryAlias differs,
        # which canonicalization strips) so all k BroadcastExchanges
        # collapse into one + (k-1) ReusedExchange nodes
        bm = bitmap.alias(f"_bf{i}")
        out = out.join(
            F.broadcast(bm),
            F.floor(F.col(pos_c) / F.lit(63)).cast("long")
            == F.col(f"_bf{i}.word"),
            "left",
        )
        hits.append(
            F.coalesce(F.col(f"_bf{i}.bits"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(1L, CAST({pos_c} % 63 AS INT))")
            )
            != 0
        )
    passed = hits[0]
    for h in hits[1:]:
        passed = passed & h
    return out.select(*keep, passed.alias("bloom_pass"))
