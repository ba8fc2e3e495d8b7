"""Streaming incremental view maintenance with replay protection.

The batch IVM twins (``plans/quality.py``: `agg_ivm_twin`,
`join_ivm_twin`) prove the maintenance ALGEBRA — +new/−old adjustments
merged by group key equal the survivor-state recompute.  This module
proves the maintenance SURVIVES the delivery model: foreachBatch is
at-least-once, and IVM adjustments are ADDITIVE, so a replayed
maintenance batch would double-apply (+Δ twice) — the exact failure the
idempotent sinks (HLL max, reservoir bottom-k, candle recompute) are
immune to and the additive sketch stores stamp away per day.

The same stamped-swap recipe lifts to a maintained VIEW: the view
store carries ``_bid``, the id of the last batch folded in, written in
the SAME atomic replace as the counters.  A re-delivered batch (same
or smaller id) is skipped wholesale before any adjustment is computed.
The FACT advance needs no stamp: :func:`..sinks.upsert.apply_cdc` is
last-write-wins keyed by (key, seq), so re-applying an identical batch
is idempotent by construction — the asymmetry between the two stores
is the point, and it is documented per store, not hand-waved globally.

Ordering inside one apply: adjustments are computed against the
PRE-batch fact (the retraction lookups need the old values), then the
view swaps (counters + stamp atomically), then the fact advances.  A
crash between view-swap and fact-advance replays the batch: the view
skips (stamped), the fact re-applies idempotently — converged.  A
crash before the view-swap replays everything — nothing was committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sinks.upsert import _atomic_replace, _read_target, apply_cdc
from .candles import read_event_stream


def ivm_apply_batch(
    spark: SparkSession,
    fact_path: str,
    view_path: str,
    batch: DataFrame,
    batch_id: int,
) -> None:
    """Fold one CDC micro-batch into the maintained (type, day)
    count/sum view, exactly once.

    Batch schema: (event_id, day, event_type, value, op, seq) — the
    Debezium-shaped log the batch twins use.  Skip-on-stamp covers the
    VIEW only: a replayed batch costs one 1-row read of the view's
    ``_bid`` plus the (idempotent, last-write-wins) fact re-apply —
    the fact advance is OUTSIDE the skip, because a crash between the
    view swap and the fact advance replays with the view stamped and
    the fact stale; skipping apply_cdc there would lose the batch's
    CDC rows forever (ADVICE r11, high)."""
    view = _read_target(spark, view_path)
    if _stamped(view, batch_id):
        # already folded into the view: at-least-once replay.  The
        # view skips wholesale, but the fact must still advance —
        # apply_cdc is keyed last-write-wins on (event_id, seq), so
        # re-applying an identical batch is a no-op when the fact
        # already advanced and the missing advance when it didn't.
        apply_cdc(spark, fact_path, batch, keys=["event_id"], seq_col="seq")
        return
    batch = batch.localCheckpoint()
    merged = ivm_apply_merge_frame(spark, fact_path, view, batch, batch_id)
    # counters + stamp in ONE atomic replace: the commit granule
    _atomic_replace(merged.localCheckpoint(), view_path)
    # fact advance AFTER the view commit: replay-idempotent on its own
    # (last-write-wins by seq), so it carries no stamp
    apply_cdc(spark, fact_path, batch, keys=["event_id"], seq_col="seq")


def ivm_apply_merge_frame(
    spark: SparkSession,
    fact_path: str,
    view: DataFrame | None,
    batch: DataFrame,
    batch_id: int,
) -> DataFrame:
    """The EXACT lazy merged-view frame one IVM apply commits per
    trigger: batch joined against PRE-batch fact truth → (+/-)
    adjustments → full-join merge with the current view → drained-group
    eviction → ``_bid`` stamp.  The audit seam for
    `stream_agg_ivm_twin#apply_merge` (VERDICT r12 #2)."""
    fact = spark.read.parquet(fact_path)
    old = fact.select(
        "event_id",
        F.col("day").alias("_oday"),
        F.col("event_type").alias("_otype"),
        F.col("value").alias("_oval"),
    )
    delta = batch.join(old, "event_id", "left")
    minus = delta.where(F.col("op").isin("U", "D")).select(
        F.col("_otype").alias("event_type"),
        F.col("_oday").alias("day"),
        F.lit(-1).cast("long").alias("d_cnt"),
        (-F.col("_oval")).cast("decimal(25,6)").alias("d_sval"),
    )
    plus = delta.where(F.col("op").isin("I", "U")).select(
        "event_type",
        "day",
        F.lit(1).cast("long").alias("d_cnt"),
        F.col("value").cast("decimal(25,6)").alias("d_sval"),
    )
    adj = (
        minus.unionByName(plus)
        .groupBy("event_type", "day")
        .agg(
            F.sum("d_cnt").cast("long").alias("d_cnt"),
            F.sum("d_sval").alias("d_sval"),
        )
    )
    cur = (
        view.select("event_type", "day", "cnt", "sval")
        if view is not None
        else None
    )
    zero = F.lit(0).cast("decimal(25,6)")
    if cur is None:
        merged = adj.select(
            "event_type",
            "day",
            F.col("d_cnt").alias("cnt"),
            F.coalesce(F.col("d_sval"), zero).cast("decimal(25,6)").alias(
                "sval"
            ),
        ).where(F.col("cnt") > 0)
    else:
        merged = (
            cur.join(adj, ["event_type", "day"], "full")
            .select(
                "event_type",
                "day",
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    + F.coalesce(F.col("d_cnt"), F.lit(0))
                ).cast("long").alias("cnt"),
                (
                    F.coalesce(F.col("sval"), zero)
                    + F.coalesce(F.col("d_sval"), zero)
                ).cast("decimal(25,6)").alias("sval"),
            )
            .where(F.col("cnt") > 0)
        )
    return merged.withColumn("_bid", F.lit(batch_id))


def ivm_view_stream(
    spark: SparkSession,
    source_dir: str,
    fact_path: str,
    view_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the (type, day) aggregate view from a CDC-log stream:
    each micro-batch of change rows advances the view by delta-sized
    adjustments — the dashboard never pays a fact rescan, and the
    ``_bid``-stamped swap makes at-least-once delivery exactly-once."""
    stream = read_event_stream(spark, source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ivm_apply_batch(spark, fact_path, view_path, batch_df, batch_id)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _stamped(view: DataFrame | None, batch_id: int) -> bool:
    """True when the store's ``_bid`` already reached ``batch_id``."""
    if view is None or "_bid" not in view.columns:
        return False
    last = view.agg(F.max("_bid")).first()[0]
    return last is not None and last >= batch_id


def _merge_adj_stamped(
    spark: SparkSession,
    store_path: str,
    adj: DataFrame,
    keys: list[str],
    batch_id: int,
) -> None:
    """Full-join merge of (+cnt, +sval) adjustments into a stamped
    count/sum store, evicting drained groups; counters + stamp in one
    atomic replace."""
    cur = _read_target(spark, store_path)
    zero = F.lit(0).cast("decimal(25,6)")
    base = cur.select(*keys, "cnt", "sval") if cur is not None else None
    if base is None:
        merged = adj.select(
            *keys,
            F.col("d_cnt").alias("cnt"),
            F.coalesce(F.col("d_sval"), zero).cast("decimal(25,6)").alias(
                "sval"
            ),
        )
    else:
        merged = base.join(adj, keys, "full").select(
            *keys,
            (
                F.coalesce(F.col("cnt"), F.lit(0))
                + F.coalesce(F.col("d_cnt"), F.lit(0))
            ).cast("long").alias("cnt"),
            (
                F.coalesce(F.col("sval"), zero)
                + F.coalesce(F.col("d_sval"), zero)
            ).cast("decimal(25,6)").alias("sval"),
        )
    _atomic_replace(
        merged.where(F.col("cnt") > 0)
        .withColumn("_bid", F.lit(batch_id))
        .localCheckpoint(),
        store_path,
    )


def join_ivm_apply_batch(
    spark: SparkSession,
    fact_path: str,
    agg_path: str,
    view_path: str,
    dim_path: str,
    batch: DataFrame,
    batch_id: int,
) -> None:
    """Fold one fact-CDC micro-batch into the JOIN-view maintenance
    triple (fact, per-(type, day) partial aggregate, per-(grp, day)
    view), exactly once under at-least-once delivery.

    Replay discipline for a MULTI-store commit: both derived stores
    carry their own ``_bid`` (additive merges double-apply without
    one), the adjustments are computed ONLY from pre-batch state
    (batch, fact, dim) — never from the other derived store — and the
    fact advances LAST, unstamped (apply_cdc is last-write-wins
    idempotent).  Any crash point replays convergently: adjustments
    recompute identically from the unchanged fact, already-stamped
    stores skip, the fact re-applies idempotently."""
    agg_cur = _read_target(spark, agg_path)
    view_cur = _read_target(spark, view_path)
    agg_done = _stamped(agg_cur, batch_id)
    view_done = _stamped(view_cur, batch_id)
    if not (agg_done and view_done):
        batch = batch.localCheckpoint()
        d_agg = join_ivm_adjust_frame(spark, fact_path, batch).localCheckpoint()
        if not agg_done:
            _merge_adj_stamped(
                spark, agg_path, d_agg, ["event_type", "day"], batch_id
            )
        if not view_done:
            dim = spark.read.parquet(dim_path)
            v_adj = join_ivm_view_adjust_frame(d_agg, dim)
            _merge_adj_stamped(
                spark, view_path, v_adj, ["grp", "day"], batch_id
            )
    apply_cdc(spark, fact_path, batch, keys=["event_id"], seq_col="seq")


def join_ivm_adjust_frame(
    spark: SparkSession, fact_path: str, batch: DataFrame
) -> DataFrame:
    """The EXACT lazy per-(type, day) adjustment frame one join-IVM
    apply computes per trigger — batch joined against PRE-batch fact
    truth only (never the derived stores).  The audit seam for
    `stream_join_ivm_twin#apply_adjust` (VERDICT r12 #2)."""
    fact = spark.read.parquet(fact_path)
    old = fact.select(
        "event_id",
        F.col("day").alias("_oday"),
        F.col("event_type").alias("_otype"),
        F.col("value").alias("_oval"),
    )
    delta = batch.join(old, "event_id", "left")
    minus = delta.where(F.col("op").isin("U", "D")).select(
        F.col("_otype").alias("event_type"),
        F.col("_oday").alias("day"),
        F.lit(-1).cast("long").alias("d_cnt"),
        (-F.col("_oval")).cast("decimal(25,6)").alias("d_sval"),
    )
    plus = delta.where(F.col("op").isin("I", "U")).select(
        "event_type",
        "day",
        F.lit(1).cast("long").alias("d_cnt"),
        F.col("value").cast("decimal(25,6)").alias("d_sval"),
    )
    return (
        minus.unionByName(plus)
        .groupBy("event_type", "day")
        .agg(
            F.sum("d_cnt").cast("long").alias("d_cnt"),
            F.sum("d_sval").cast("decimal(25,6)").alias("d_sval"),
        )
    )


def join_ivm_view_adjust_frame(d_agg: DataFrame, dim: DataFrame) -> DataFrame:
    """Route the partial-aggregate adjustments through the dimension to
    per-(grp, day) view adjustments — the second recurring frame of one
    join-IVM apply (`stream_join_ivm_twin#apply_view_adjust`)."""
    return (
        d_agg.join(dim, "event_type")
        .groupBy("grp", "day")
        .agg(
            F.sum("d_cnt").cast("long").alias("d_cnt"),
            F.sum("d_sval").cast("decimal(25,6)").alias("d_sval"),
        )
    )


def join_ivm_view_stream(
    spark: SparkSession,
    source_dir: str,
    fact_path: str,
    agg_path: str,
    view_path: str,
    dim_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the fact ⋈ dim aggregate view (and its partial-
    aggregate tree) from a fact-CDC stream — the join-IVM algebra of
    ``plans/quality.q_join_ivm_twin`` under the streaming delivery
    model."""
    stream = read_event_stream(spark, source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        join_ivm_apply_batch(
            spark, fact_path, agg_path, view_path, dim_path,
            batch_df, batch_id,
        )

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
