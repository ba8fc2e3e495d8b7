"""Block-carry decomposition for exact bounded trailing windows.

``Window.partitionBy(group).orderBy(...).rowsBetween(-k, 0)`` has a
constant per-row frame, but Spark still routes EVERY row of a group
through one task's sort — a one-task-per-enum-group funnel at 100 TB
(VERDICT r11 #1 sweep).  The block-carry decomposition keeps the frame
exact and the sort parallel:

- blocks are contiguous ranges of the total order (any monotone
  bucketing of the leading order column qualifies — week buckets of a
  timestamp here);
- each block's trailing window runs independently, in parallel;
- the k rows a block's head needs from the past are exactly the last
  k rows of the union of earlier blocks' TAILS: a row outside its
  own block's last-k has ≥ k successors inside that block, so it can
  never reach a later block's frame.  And because every NON-EMPTY
  block contributes ≥ 1 tail row, those last k rows lie entirely
  within the k NEAREST non-empty predecessor blocks — so each target
  block pairs with at most k predecessor blocks (≤ k² candidate rows
  per target block, ≤ k²·|blocks| per group overall, linear in the
  time span; ADVICE r12: the unpruned pairing joined every target
  with ALL earlier tails, quadratic in block count).  The per-group
  block list used for the pruning is metadata-sized (one row per
  non-empty block) and is exact even when a block's carry spans MANY
  sparse earlier blocks;
- carried context rows seed the frame and are dropped from the
  output; the first block of a group gets no context, exactly like a
  global window's truncated leading frames.

Used by ``plans/quality.q_rolling_median``; the sparse-block carry
path (context reaching across several near-empty blocks) is pinned by
``tests/test_rolling_blocked.py`` against the naive global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_trailing_list(
    df: DataFrame,
    groups: list[str],
    order_cols: list[str],
    value_col: str,
    k: int,
    blk: Column,
    out_col: str = "__w",
) -> DataFrame:
    """Append ``out_col`` = the SORTED array of ``value_col`` over the
    exact trailing ``(k-1)``-preceding-to-current rows frame in
    ``order_cols`` order within ``groups`` — computed with per-block
    windows plus tail carry, never a whole-group window.

    ``blk`` must be monotone non-decreasing in the leading order
    column(s) so blocks are contiguous ranges of the total order;
    ``order_cols`` must be a deterministic total order (include a
    unique tiebreak).  Output keeps ``df``'s columns.
    """
    carry = k - 1
    base = df.withColumn("__blk", blk.cast("long"))
    desc = [F.col(c).desc() for c in order_cols]
    w_tail = Window.partitionBy(*groups, "__blk").orderBy(*desc)
    tails = (
        base.withColumn("__trn", F.row_number().over(w_tail))
        .where(F.col("__trn") <= carry)
        .drop("__trn")
    )
    # rank the per-group NON-EMPTY block list (metadata-sized — one row
    # per block; the window runs over block counts, never data): the
    # dense rank lets the carry join pair each target with only its
    # `carry` nearest non-empty predecessors
    w_rank = Window.partitionBy(*groups).orderBy("__blk")
    blocks = (
        base.select(*groups, "__blk")
        .distinct()
        .withColumn("__brank", F.row_number().over(w_rank))
    )
    tails_r = tails.join(F.broadcast(blocks), [*groups, "__blk"])
    tgts = blocks.select(
        *groups,
        F.col("__blk").alias("__tgt"),
        F.col("__brank").alias("__tgt_rank"),
    )
    from functools import reduce

    on = reduce(
        lambda a, b2: a & b2,
        [F.col(f"t.{g}") == F.col(f"b.{g}") for g in groups],
    )
    cand = (
        tails_r.alias("t")
        .join(
            F.broadcast(tgts).alias("b"),
            on
            & (F.col("t.__blk") < F.col("b.__tgt"))
            # nearest-predecessor prune: each non-empty block tails >= 1
            # row, so context beyond `carry` non-empty blocks back is
            # unreachable (>= carry nearer rows precede it in the union)
            & (F.col("b.__tgt_rank") - F.col("t.__brank") <= carry),
        )
        .select(
            *[F.col(f"t.{c}").alias(c) for c in df.columns],
            F.col("b.__tgt").alias("__blk"),
        )
    )
    w_ctx = Window.partitionBy(*groups, "__blk").orderBy(*desc)
    ctx = (
        cand.withColumn("__crn", F.row_number().over(w_ctx))
        .where(F.col("__crn") <= carry)
        .drop("__crn")
        .withColumn("__ctx", F.lit(True))
    )
    unioned = base.withColumn("__ctx", F.lit(False)).unionByName(ctx)
    w = (
        Window.partitionBy(*groups, "__blk")
        .orderBy(*order_cols)
        .rowsBetween(-carry, 0)
    )
    arr = F.array_sort(F.collect_list(value_col).over(w))
    return (
        unioned.withColumn(out_col, arr)
        .where(~F.col("__ctx"))
        .drop("__blk", "__ctx")
    )
