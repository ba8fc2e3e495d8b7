"""Heavy hitters (frequent keys) without a full-key-space shuffle.

The naive ``GROUP BY key HAVING count(*) > share * n`` shuffles EVERY
key — at 100 TB with billions of mostly-cold keys that is the single
most expensive aggregation shape there is, run just to find a handful
of hot keys. The classic two-pass alternative keeps the guarantee
exact:

1. **Summarize**: one ``mapInPandas`` pass runs Misra-Gries with
   ``n_counters`` counters per partition, and rides the partition's row
   count along in the same output (one sentinel row per partition), so
   no separate counting scan is needed. MG's guarantee: any key whose
   TRUE count in a partition exceeds partition_rows / n_counters
   survives that partition's summary — so any key with global count >
   n_rows / n_counters survives in at least one summary (pigeonhole
   over the partition decomposition). Summaries are tiny: ≤ n_counters
   + 1 rows per partition.
2. **Verify**: collect the candidate keys (≤ partitions x n_counters —
   bounded, broadcastable), semi-join the input down to candidate rows
   only, and count THOSE exactly. Keys above the threshold are reported
   with exact counts and shares.

Completeness: ``min_share >= 1 / n_counters`` is required for the MG
superset guarantee to cover the threshold (checked — a silent violation
would drop true heavy hitters). Soundness: the verify pass counts
exactly, so false candidates are filtered out. Net: the only shuffle
carries candidate rows — for a skewed table that is the hot keys' rows,
not the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_COUNTERS = 256


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_share: float,
    n_counters: int = DEFAULT_COUNTERS,
) -> DataFrame:
    """Keys whose row share exceeds ``min_share``, with EXACT counts.

    Output: (key_col, n_rows, share), one row per qualifying key.
    Null keys are ignored (no grouping semantics for null).
    """
    if min_share < 1.0 / n_counters:
        raise ValueError(
            f"min_share={min_share} below the MG guarantee 1/{n_counters}; "
            "raise n_counters or the share threshold"
        )
    keyed = df.select(key_col).where(F.col(key_col).isNotNull())
    key_type = keyed.schema[key_col].dataType
    summary_schema = T.StructType(
        [
            T.StructField(key_col, key_type),  # null on the sentinel row
            T.StructField("_prows", T.LongType()),
        ]
    )
    k_counters = int(n_counters)
    kname = key_col

    def mg_summaries(batches):
        import pandas as pd

        counters: dict = {}
        prows = 0
        for pdf in batches:
            for v in pdf.iloc[:, 0].values:
                v = v.item() if hasattr(v, "item") else v
                prows += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k_counters:
                    counters[v] = 1
                else:
                    dead = []
                    for c in counters:  # decrement-all step
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        # dtype=object: a None sentinel in an int64 column would coerce
        # keys to float64 and silently corrupt values above 2^53 —
        # object dtype hands Arrow exact Python ints (review r4)
        yield pd.DataFrame(
            {
                kname: pd.Series(
                    list(counters.keys()) + [None], dtype=object
                ),
                "_prows": [0] * len(counters) + [prows],
            }
        )

    summaries = keyed.mapInPandas(mg_summaries, schema=summary_schema)
    # one tiny action materializes candidates + total row count together
    agg = summaries.groupBy(kname).agg(F.sum("_prows").alias("_p")).collect()
    n_total = sum(int(r["_p"]) for r in agg if r[kname] is None)
    cand_keys = [r[kname] for r in agg if r[kname] is not None]
    if n_total == 0 or not cand_keys:
        return (
            keyed.limit(0)
            .groupBy(kname)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(kname, "n_rows", F.lit(0.0).alias("share"))
        )
    threshold = float(min_share) * n_total
    # exact verification over candidate rows only: the broadcast semi
    # join prunes the input BEFORE the counting shuffle (candidates are
    # ≤ partitions x n_counters — bounded, never the key space)
    cand_df = df.sparkSession.createDataFrame(
        [(k,) for k in cand_keys], T.StructType([T.StructField(kname, key_type)])
    )
    hot_rows = keyed.join(F.broadcast(cand_df), kname, "left_semi")
    return (
        hot_rows.groupBy(kname)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > threshold)
        .select(
            kname,
            "n_rows",
            (F.col("n_rows") / F.lit(float(n_total))).alias("share"),
        )
    )


# --- truncated-counts heavy-hitters STORE (round 12) ------------------------

#: counters kept per day summary — sized so truncation genuinely fires
#: at every test scale (>= 11 distinct keys per day at sf0.001); at
#: production scale m sizes to the 1/phi heavy-hitter threshold.
MG_STORE_M = 8


def mg_truncate(
    counts: DataFrame,
    group_cols: list[str],
    key_col: str,
    m: int = MG_STORE_M,
    cnt_col: str = "cnt",
    err_col: str = "err",
) -> DataFrame:
    """Truncate exact per-key ``counts`` to the top-``m`` keys per
    group — the DETERMINISTIC mergeable heavy-hitters summary (the
    store form of Misra-Gries / SpaceSaving; Agarwal et al.,
    "Mergeable Summaries"), completing the family next to the
    probabilistic CMS store.

    Input rows: ``(*group_cols, key_col, cnt_col, err_col)`` where
    ``err_col`` is the accumulated bound carried in (constant per
    group; 0 for exact first-pass counts).  Output keeps the top-m
    keys by the total order (cnt desc, key asc) with their counts
    UNCHANGED, appends ``rank`` (1..m), and sets
    ``err_out = err_in + c_{m+1}`` where ``c_{m+1}`` is the (m+1)-th
    largest count (0 when the group has <= m keys).

    The bound law (pinned in tests/test_mg_store.py): for any key,
    true count ∈ [cnt, cnt + err] if present, true count <= err if
    absent — preserved by truncation (absent keys' counts are <=
    c_{m+1} + their prior slack) and by additive merges (sum counts,
    sum the sources' errs).

    Scale shape: ranking goes through the salted two-phase
    ``grouped_topk`` (never a one-task-per-group window); the (m+1)-th
    count and the per-group err are broadcast-sized aggregates."""
    from .ranks import grouped_topk

    top = grouped_topk(
        counts,
        group_cols,
        [(cnt_col, True), (key_col, False)],
        m + 1,
        salt_col=key_col,
    )
    cm1 = top.where(F.col("rank") == m + 1).groupBy(*group_cols).agg(
        F.max(cnt_col).alias("__cm1")
    )
    err_in = counts.groupBy(*group_cols).agg(
        F.max(err_col).alias("__err_in")
    )
    return (
        top.where(F.col("rank") <= m)
        .drop(err_col)
        .join(F.broadcast(cm1), group_cols, "left")
        .join(F.broadcast(err_in), group_cols)
        .select(
            *group_cols,
            key_col,
            F.col(cnt_col).cast("long").alias(cnt_col),
            (
                F.col("__err_in")
                + F.coalesce(F.col("__cm1"), F.lit(0))
            ).cast("long").alias(err_col),
            F.col("rank").cast("long").alias("rank"),
        )
    )
