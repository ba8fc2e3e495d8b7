"""Distributed exact global rank (two-phase row_number).

An unpartitioned ``row_number() OVER (ORDER BY ...)`` funnels the whole
input through ONE task — fine over a provably tiny aggregate, a
straggler-of-one over anything with unbounded cardinality (billions of
user keys, a 10^8-term vocabulary).  The two-phase decomposition keeps
the total order exact while staying parallel:

1. sample split keys (fixed seed — deterministic) and derive ``B-1``
   lexicographic range boundaries;
2. bucket every row by comparing its sort key to the boundaries — a PURE
   FUNCTION OF THE ROW VALUE.  This is deliberately NOT
   ``spark_partition_id()`` over ``repartitionByRange``: AQE coalesces
   the two consumer branches of a shuffle independently, so physical
   partition ids are not branch-stable (measured: ranks came out wrong),
   while a value-based bucket is identical in every branch by
   construction;
3. local ``row_number`` within each bucket (hash shuffle on the bucket);
4. per-bucket counts cumsum'd into offsets with a window over AT MOST
   ``B`` rows (bounded by a constant, not data cardinality), broadcast
   back; global rank = local rank + offset.

The split-point sampling runs two small eager jobs (count + sample) at
plan-build time — the same cost RangePartitioner pays inside
``repartitionByRange``, paid deterministically here (seed pinned, so
retries and branch recomputation see identical buckets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# below this row count a single-task window is cheaper than the extra
# sampling pass; 1M rows of (key, long) is ~tens of MB in one task
SMALL_INPUT_ROWS = 1_000_000
_SAMPLES_PER_BUCKET = 64
_SEED = 42


def _order_exprs(order: Sequence[tuple[str, bool]]) -> list[Column]:
    return [
        F.col(name).desc() if desc else F.col(name).asc()
        for name, desc in order
    ]


def _after_split(order: Sequence[tuple[str, bool]], split: tuple) -> Column:
    """Row's sort key strictly follows ``split`` in the total order
    (lexicographic, honoring per-column direction)."""
    expr = F.lit(False)
    for (name, desc), sval in reversed(list(zip(order, split))):
        col, lit = F.col(name), F.lit(sval)
        after = (col < lit) if desc else (col > lit)
        expr = after | ((col == lit) & expr)
    return expr


def distributed_row_number(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    out_col: str = "rank",
    num_buckets: int | None = None,
) -> DataFrame:
    """Append an exact global ``row_number`` over ``order`` to ``df``.

    ``order`` is ``[(column_name, descending), ...]`` and must be a
    deterministic TOTAL order over non-null keys (include a unique
    tie-break column) — the same contract an unpartitioned row_number
    has, minus the single-task bottleneck.
    """
    return grouped_distributed_row_number(
        df, [], order, out_col=out_col, num_buckets=num_buckets
    )


def grouped_distributed_row_number(
    df: DataFrame,
    groups: Sequence[str],
    order: Sequence[tuple[str, bool]],
    out_col: str = "rank",
    num_buckets: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Exact per-group ``row_number`` over ``order`` WITHOUT one task
    per group — the grouped form of the two-phase rank (VERDICT r13
    ask #1: ``Window.partitionBy(enum_key)`` over a non-aggregated
    input funnels ~1/|enums| of the table through one task's sort).

    The range shuffle gains a partition-key prefix: split points are
    sampled from the SORT KEYS globally (groups with similar value
    distributions share them — the enum-dim case), every row buckets
    by pure value comparison exactly as in the ungrouped form, and the
    local ``row_number`` runs per ``(group, bucket)``.  Per-group
    bucket counts cumsum into offsets with a window over AT MOST
    ``num_buckets`` rows per group (constant-bounded), broadcast back
    on the null-safe ``(group, bucket)`` key — null group keys rank
    within their own group, matching ``Window.partitionBy``.

    Intended for LOW-cardinality group keys (enums, priorities,
    segments): the offsets frame is |groups| x buckets rows and is
    broadcast.  For high-cardinality groups a plain partitioned window
    is already parallel — use that instead.

    ``total_col``: when set, also append the per-group row count
    (rank denominators — percent_rank/cume_dist/ntile are pure rank
    arithmetic once ``(rank, n)`` are known).
    """
    from .materialize import materialize

    groups = list(groups)
    order = [(n, bool(d)) for n, d in order]
    key_names = [n for n, _ in order]
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )

    # Materialize the input ONCE before any decision job: the count and
    # the split-point sample would otherwise re-execute the full input
    # lineage (for a vocabulary that means re-exploding the corpus) —
    # one extra pass per decision at 100 TB. The checkpoint is the same
    # compact frame the rank must shuffle anyway.
    df = materialize(df)
    n_rows = df.count()
    splits: list[tuple] = []
    if n_rows > SMALL_INPUT_ROWS and num_buckets > 1:
        frac = min(1.0, (num_buckets * _SAMPLES_PER_BUCKET) / n_rows)
        sampled = _sort_keys(
            [
                tuple(r)
                for r in df.select(*key_names)
                .sample(False, frac, seed=_SEED)
                .collect()
            ],
            order,
        )
        if sampled:
            step = max(1, len(sampled) // num_buckets)
            seen = set()
            for i in range(step, len(sampled), step):
                t = sampled[i]
                if t not in seen:
                    seen.add(t)
                    splits.append(t)
                if len(splits) >= num_buckets - 1:
                    break

    if splits:
        bucket = sum(
            (_after_split(order, s).cast("int") for s in splits), F.lit(0)
        )
    else:
        bucket = F.lit(0)
    # null sort keys would evaluate the split comparisons to NULL and be
    # silently DROPPED by the bucket join below (while the small-input
    # window path would rank them) — enforce the documented non-null
    # contract loudly instead (review r4)
    null_key = None
    for n in key_names:
        cond = F.col(n).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    bucket = F.when(
        null_key,
        F.raise_error(
            F.lit(
                "distributed_row_number: null sort key — the order must "
                "be a non-null total order (filter or coalesce first)"
            )
        ).cast("int"),
    ).otherwise(bucket)
    bucketed = df.withColumn("_bkt", bucket)
    w_local = Window.partitionBy(*groups, "_bkt").orderBy(
        *_order_exprs(order)
    )
    local = bucketed.withColumn(
        "_lrank", F.row_number().over(w_local).cast("long")
    )
    counts = local.groupBy(*groups, "_bkt").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # cumsum over <= num_buckets rows PER GROUP: bounded by a constant,
    # so the (group-)partitioned window here is NOT a scale hazard
    w_off = (
        Window.partitionBy(*groups)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    ]
    if total_col is not None:
        off_cols.append(
            F.sum("_cnt").over(Window.partitionBy(*groups)).alias(total_col)
        )
    offsets = counts.select(*groups, "_bkt", *off_cols)
    # null-safe equi join on the group prefix: Window.partitionBy puts
    # null group keys in their own partition, and a plain column-list
    # join would silently DROP those rows
    ren = offsets.withColumnRenamed("_bkt", "__o_bkt")
    for g in groups:
        ren = ren.withColumnRenamed(g, f"__o_{g}")
    cond = F.col("_bkt") == F.col("__o_bkt")
    for g in groups:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__o_{g}"))
    return (
        local.join(F.broadcast(ren), cond)
        .withColumn(out_col, (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_bkt", "_lrank", "_off", "__o_bkt", *[f"__o_{g}" for g in groups])
    )


def _sort_keys(
    keys: list[tuple], order: Sequence[tuple[str, bool]]
) -> list[tuple]:
    """Sort key tuples by the (possibly mixed-direction) lexicographic
    order without assuming negatable types: stable multi-pass sort from
    the last column to the first."""
    out = list(keys)
    for i in range(len(order) - 1, -1, -1):
        _, desc = order[i]
        out.sort(key=lambda t, i=i: t[i], reverse=desc)
    return out


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[tuple[str, bool]],
    k: int,
    salt_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact top-k rows per group without a one-task-per-group window.

    ``Window.partitionBy(group)`` puts each group's ENTIRE candidate set
    in one task — for per-query ANN that is the whole corpus per query.
    Phase A ranks within (group, salt) — ``buckets``-way parallel, and
    any row ranked > k inside its salt bucket cannot be in the group's
    global top-k (rank within a subset lower-bounds global rank), so
    phase B re-ranks only the <= buckets*k survivors per group.  Same
    contract as an unpartitioned per-group row_number: ``order`` (with
    its tie-break) must be a deterministic total order; ``salt_col`` is
    any integer column (hashed rows spread round-robin-ish via pmod).

    Appends ``rank`` (1..k) and drops rows beyond k.
    """
    gcols = list(group_cols)
    oexprs = [
        (F.col(n).desc() if d else F.col(n).asc()) for n, d in order
    ]
    salted = Window.partitionBy(
        *gcols, F.pmod(F.col(salt_col), F.lit(buckets))
    ).orderBy(*oexprs)
    survivors = (
        df.withColumn("__srk", F.row_number().over(salted))
        .where(F.col("__srk") <= k)
        .drop("__srk")
    )
    final = Window.partitionBy(*gcols).orderBy(*oexprs)
    return (
        survivors.withColumn("rank", F.row_number().over(final).cast("long"))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str,
    k: int = 60,
    out: str = "rrf_raw",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack, Clarke &
    Buettcher, SIGIR 2009): score(d) = sum_i 1/(k + rank_i(d)), items
    missing from a list contribute 0 for it.

    Each input frame carries (``id_col``, ``rank``); the output joins
    them full-outer on ``id_col`` with ``rank`` renamed ``rank_{i}``
    (input order) and appends ``out``.  The fold is fixed left-to-right
    over i, and each term is 1.0/(k + rank) in DOUBLE — the same
    expression an oracle must spell as CAST(1 AS DOUBLE)/(k + r), so
    fused scores are bit-comparable across engines.

    Scale: the inputs are top-k lists — the heavy lifting (BM25 scan,
    ANN index) happens upstream; fusion joins |lists| * k rows.  With
    unbounded inputs the full-outer joins shuffle on ``id_col`` only.
    """
    from functools import reduce

    renamed = [
        df.select(id_col, F.col("rank").alias(f"rank_{i}"))
        for i, df in enumerate(ranked)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), renamed)
    score = F.coalesce(
        F.lit(1.0) / (F.lit(k) + F.col("rank_0")), F.lit(0.0)
    )
    for i in range(1, len(renamed)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{i}")), F.lit(0.0)
        )
    return joined.withColumn(out, score)
