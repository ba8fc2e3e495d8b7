"""Skew-resilient join: deterministic salting.

AQE's skew-join handling (enabled in the session factory) splits
oversized *shuffle* partitions at runtime, but a broadcast-ineligible
join against a dimension with a handful of pathologically hot keys still
benefits from classic salting: replicate each dim row ``n_salts`` times,
scatter fact rows across the salt space, and join on (key, salt) so a
hot key's rows spread over ``n_salts`` tasks instead of one straggler.

The fact-side salt is ``xxhash64`` over the whole row — NOT ``rand()``:
task retries and replays must land every row on the same salt or results
become nondeterministic under failure (the same reason every other
"random" choice in this engine is hash-derived).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``n_salts`` ways.

    Result is exactly ``fact.join(dim, on, how)`` (oracle-checkable);
    only the physical distribution changes. Supports inner/left joins
    (the dim side is replicated, so right/full would multiply rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [*on, "__salt"], how).drop("__salt")


def duplicate_spread_salt(on: str, n_salts: int):
    """Salt column for value-duplicate-heavy facts: hash of (key,
    source file, in-file row ordinal) via the ``_metadata`` hidden
    columns. Value-identical rows of a hot key land on DIFFERENT salts
    (they differ in row_index), yet the salt stays deterministic under
    task retries — an immutable file's (path, row_index) never changes,
    unlike ``rand()`` or partition-relative counters. Only resolvable on
    frames that are direct file-source scans (parquet/orc/json/csv)."""
    return F.pmod(
        F.xxhash64(
            F.col(on),
            F.col("_metadata.file_path"),
            F.col("_metadata.row_index"),
        ),
        F.lit(n_salts),
    ).cast("int")


def skewed_fact_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    n_hot: int = 8,
    skew_factor: float = 8.0,
    spread_duplicates: bool = False,
) -> DataFrame:
    """Differentiated skew join for two FACT tables (inner, single key).

    ``salted_join`` replicates the whole dim side — fine for a dimension,
    wrong when both sides are facts.  The 100 TB pattern is to split by
    key temperature instead:

    1. count keys on EACH side and take the union of the ``n_hot``
       heaviest per side (bounded driver collect — ≤ 2*n_hot rows,
       never the key space; a right-hot key straggles the shuffle just
       as hard as a left-hot one);
    2. HOT path: left-hot rows scatter over ``n_salts`` via xxhash64 (a
       deterministic salt — retries land on the same salt), right-hot
       rows replicate ``n_salts`` ways, join on (key, salt) so each hot
       key spreads over n_salts tasks instead of one straggler;
    3. COLD path: plain shuffle join (AQE handles residual imbalance);
    4. union.

    Result is exactly ``left.join(right, on, "inner")`` — the oracle for
    any query built on this is the plain join.  Inner-only: null keys
    never match, and the hot/cold split drops neither side's matchable
    rows.

    A key only counts as hot when its row count exceeds ``skew_factor``
    times the side's mean rows-per-key (ADVICE r4: the top-N of an
    unskewed table is just its heaviest ordinary keys; splitting on them
    buys nothing and costs two extra scans). With no key above
    threshold, the plain join is returned untouched. ``skew_factor=0``
    disables the gate (always salt the top-N) — for demos/regression
    fixtures that must exercise the hot path deterministically.

    By default the salt hashes the full LEFT row value, so
    value-IDENTICAL duplicate rows of a hot key share one salt —
    dedup-heavy facts keep their straggler (results stay right; the
    spread degrades). ``spread_duplicates=True`` switches to
    :func:`duplicate_spread_salt` — hash of (key, source file, in-file
    row ordinal) — which spreads identical rows while staying
    deterministic under task retries; it requires ``left`` to be a
    direct file-source scan (the hidden ``_metadata`` column must
    resolve).
    """

    def _hot_keys(side: DataFrame) -> list:
        counts = side.groupBy(on).agg(F.count(F.lit(1)).alias("__cnt"))
        top = counts.orderBy(F.desc("__cnt"), F.col(on)).limit(n_hot).collect()
        top = [r for r in top if r[0] is not None]
        if not top or skew_factor <= 0:
            return [r[0] for r in top]
        # second action on the same counts frame reuses its shuffle files
        mean = counts.agg(F.avg("__cnt")).collect()[0][0] or 0.0
        return [r[0] for r in top if r["__cnt"] >= skew_factor * mean]

    hot_keys = sorted(set(_hot_keys(left)) | set(_hot_keys(right)))
    if not hot_keys:
        return left.join(right, on, "inner")
    l_hot = left.where(F.col(on).isin(hot_keys))
    l_cold = left.where(~F.col(on).isin(hot_keys))
    r_hot = right.where(F.col(on).isin(hot_keys))
    r_cold = right.where(~F.col(on).isin(hot_keys))
    if spread_duplicates:
        salt = duplicate_spread_salt(on, n_salts)
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
        ).cast("int")
    l_salted = l_hot.withColumn("__salt", salt)
    r_salted = r_hot.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    hot_joined = l_salted.join(r_salted, [on, "__salt"], "inner").drop("__salt")
    cold_joined = l_cold.join(r_cold, on, "inner")
    return hot_joined.unionByName(cold_joined)
