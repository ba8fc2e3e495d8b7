"""Physical-plan assertions — the 100 TB posture, checked in CI.

Correctness says the operators compute the right answer; these tests pin
*how*: filters reach the parquet scan, projections prune the read schema,
dimension joins broadcast, aggregates combine map-side, and the shuffle
count per operator stays at its designed minimum. A regression here means
a plan that still passes the oracle but would fall over at scale.
"""

from __future__ import annotations

import re

import pytest

from options_data_pipeline_spark.plans import options, sessions, tpch

from .conftest import SF_DIR


def fmt(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def shuffle_exchanges(plan: str) -> list[str]:
    """Numbered shuffle Exchange nodes (broadcast exchanges excluded)."""
    return [
        ln.strip()
        for ln in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange$", ln.strip())
    ]


def test_pricing_summary_pushdown_pruning_single_shuffle(spark):
    plan = fmt(spark, tpch.q_pricing_summary(spark, SF_DIR))
    # predicate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned: 16-column lineitem read as the 7 needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = m.group(1)
    assert "l_comment" not in cols and "l_orderkey" not in cols
    assert cols.count(":") == 7
    # classic partial/final hash aggregate: exactly one shuffle
    assert len(shuffle_exchanges(plan)) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_region_revenue_broadcasts_all_dimensions(spark):
    plan = fmt(spark, tpch.q_region_revenue(spark, SF_DIR))
    # 5-way star join: every dimension side must broadcast, never shuffle
    # (formatted explain prints each node in tree + detail; count details)
    joins = re.findall(r"^\(\d+\) BroadcastHashJoin$", plan, re.M)
    assert len(joins) == 5
    assert "SortMergeJoin" not in plan
    # the only shuffle is the final group-by
    assert len(shuffle_exchanges(plan)) == 1
    # date filter pushed into the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_hourly_candles_is_single_shuffle(spark):
    plan = fmt(spark, sessions.q_hourly_candles(spark, SF_DIR))
    # ticks -> candles is one groupBy. Struct-keyed min_by/max_by falls
    # back to SortAggregate (struct buffers aren't hash-aggregable), but
    # the scale-critical property holds: a PARTIAL aggregate runs before
    # the exchange, so the shuffle carries one row per candle, not per
    # tick.
    assert len(shuffle_exchanges(plan)) == 1
    tree = plan.split("(1) Scan")[0]  # the indented tree section
    tree_lines = tree.splitlines()
    exchange_at = next(i for i, ln in enumerate(tree_lines) if "+- Exchange" in ln)
    below = "\n".join(tree_lines[exchange_at + 1 :])
    assert "Aggregate" in below  # partial agg is a child of the shuffle


def test_daily_sessions_two_level_rollup_two_shuffles(spark):
    plan = fmt(spark, sessions.q_daily_sessions(spark, SF_DIR))
    # level 1: ticks->hourly agg; level 2: window + groupBy on the session
    # key SHARE one partitioning (same keys), so the whole chain is 2
    assert len(shuffle_exchanges(plan)) == 2


def test_option_chain_at_most_two_shuffles(spark):
    plan = fmt(spark, options.q_option_chain_ohlc(spark, SF_DIR))
    # parallelizing repartition + the A5 groupBy; the 24-column aggregate
    # itself must stay a single-shuffle hash aggregate (no windows)
    assert len(shuffle_exchanges(plan)) <= 2
    assert "Window" not in plan


def test_events_scan_prunes_columns(spark):
    plan = fmt(spark, sessions.q_hourly_candles(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = m.group(1)
    # events has 6 columns; the candle query needs 4
    assert "props" not in cols and "user_id" not in cols


def test_partition_pruning_on_date_partitioned_layout(spark, tmp_path_factory):
    """The bronze/gold layout is date-partitioned; a time predicate must
    prune partitions at the scan, not filter rows after reading."""
    import pyspark.sql.functions as F

    from options_data_pipeline_spark.sources.tables import load_table

    path = str(tmp_path_factory.mktemp("part") / "events_by_day")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    scan = spark.read.parquet(path).where(F.col("day") == "2024-01-02")
    plan = fmt(spark, scan)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1)  # predicate became a partition filter
    # and the row filter did NOT survive as a post-scan Filter node
    assert "PushedFilters: []" in plan or "isnotnull(day" in plan


def test_vocab_top_tokens_partial_agg_soaks_explode(spark):
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_vocab_top_tokens(spark, SF_DIR))
    # the explode fan-out (~doc_len x rows) must be absorbed by a partial
    # hash aggregate BEFORE the (lang, token) shuffle — the shuffle then
    # carries one row per distinct token, not one per occurrence
    assert "Generate" in plan  # the explode
    assert plan.count("HashAggregate") >= 2  # partial + final
    # in the numbered tree the partial aggregate must sit between the
    # Generate and the Exchange (map-side combine before the shuffle)
    tree = [ln.strip() for ln in plan.splitlines() if re.match(r"^\(\d+\)", ln.strip())]
    gen_i = next(i for i, ln in enumerate(tree) if "Generate" in ln)
    agg_i = next(i for i, ln in enumerate(tree) if "HashAggregate" in ln and i > gen_i)
    exch_i = next(i for i, ln in enumerate(tree) if ln.endswith("Exchange") and i > gen_i)
    assert gen_i < agg_i < exch_i
    # top-k rank runs on the aggregated (small) result
    assert "Window" in plan


def test_top_orders_per_segment_single_rank_shuffle_after_join(spark):
    plan = fmt(spark, tpch.q_top_orders_per_segment(spark, SF_DIR))
    # the rank window partitions on the 5-value segment key only after
    # the join has reduced each row to 3 columns; no extra exchanges
    # beyond (join, window) — and the window's sort is per-partition,
    # never a global range sort
    assert "Window" in plan
    assert len(shuffle_exchanges(plan)) <= 3
    assert "rangepartitioning" not in plan.lower()


def test_pii_scrub_no_shuffle_narrow_pipeline(spark):
    """PII detect/redact/flag is pure per-row expression work — zero
    exchanges, no Python: the whole query is scan -> project."""
    from options_data_pipeline_spark.plans import pii

    plan = fmt(spark, pii.q_pii_scrub(spark, SF_DIR))
    assert len(shuffle_exchanges(plan)) == 0
    assert "Window" not in plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan


def test_token_shards_prefix_sum_shape(spark):
    """The two-level prefix sum: windows hash-partition on (lang, segment)
    — never a global range sort — and the per-segment offset table joins
    back as a broadcast, so the only full-data exchanges are the local
    window's hash repartition and the final summary groupBy."""
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_token_shards(spark, SF_DIR))
    assert "rangepartitioning" not in plan.lower()  # no global sort anywhere
    assert "BroadcastHashJoin" in plan  # offsets stitched via broadcast
    assert "SortMergeJoin" not in plan
    # full-data shuffles: local window + summary agg; the offset branch's
    # two exchanges carry |segments| rows, a constant
    assert len(shuffle_exchanges(plan)) <= 4


def test_cluster_survivors_argmax_is_single_aggregate(spark):
    """Survivor choice is max_by over a struct — one groupBy with a
    partial aggregate, not a rank window over the joined members."""
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_cluster_survivors(spark, SF_DIR))
    assert "max_by" in plan
    # the final argmax section has no Window (the upstream dedup graph
    # machinery contributes plan nodes of its own, so scope the check)
    final = plan.split("(1) ")[0]
    assert "Window" not in final


def test_ngram_contamination_broadcasts_probe_side(spark):
    """The probe-shingle side must broadcast; document shingles must never
    be the build side of anything, and the hit count must partial-agg."""
    from options_data_pipeline_spark.plans import pii

    plan = fmt(spark, pii.q_ngram_contamination(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # per-doc counting: partial + final aggregate around one exchange;
    # the only other exchange is the probe-side distinct (|probes| rows)
    assert plan.count("HashAggregate") >= 2
    assert len(shuffle_exchanges(plan)) <= 2


def test_rare_tokens_two_aggregations_no_window(spark):
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_rare_tokens(spark, SF_DIR))
    assert "Window" not in plan
    # vocab agg + per-doc agg (+ token join); explode fan-outs are soaked
    # by partial aggregates before each exchange
    assert plan.count("HashAggregate") >= 4  # 2x (partial + final)


def test_embedding_quantize_zero_shuffle_no_python(spark):
    from options_data_pipeline_spark.plans import vectors

    plan = fmt(spark, vectors.q_embedding_quantize(spark, SF_DIR))
    # the only exchange is `parallelized`'s repartition spreading the
    # single-row-group bench parquet; the quantization itself adds none
    assert len(shuffle_exchanges(plan)) <= 1
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan


def test_doc_chunks_is_shuffle_free(spark):
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_doc_chunks(spark, SF_DIR))
    # per-row sequence + explode: a pure map-side fan-out — zero exchanges
    assert "Generate" in plan
    assert len(shuffle_exchanges(plan)) == 0


def test_unigram_logprob_broadcasts_vocab(spark):
    from options_data_pipeline_spark.plans import text

    # audit the derivation below the session-artifact cache (the registry
    # query serves the materialized artifact, whose plan is just a scan)
    plan = fmt(spark, text._unigram_doc_scores(spark, SF_DIR))
    # occurrences join the scored vocabulary by broadcast, never by
    # shuffling the (much larger) token-occurrence side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_supplier_blame_joins_hash_partition_no_cartesian(spark):
    plan = fmt(spark, tpch.q_supplier_blame(spark, SF_DIR))
    # the EXISTS/NOT EXISTS decorrelation must stay equi-join based
    # (hash-partitioned on l_orderkey with residual suppkey inequality) —
    # a nested-loop/cartesian here would be quadratic at scale
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_props_extract_stays_jvm_side(spark):
    from options_data_pipeline_spark.plans import quality

    plan = fmt(spark, quality.q_props_extract(spark, SF_DIR))
    # JSON extraction is a Catalyst expression (from_json), not a Python
    # UDF, and the profile is one partial+final hash aggregate
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(shuffle_exchanges(plan)) == 1
    assert plan.count("HashAggregate") >= 2


def test_candle_ffill_single_fill_window(spark):
    from options_data_pipeline_spark.plans import quality

    plan = fmt(spark, quality.q_candle_ffill(spark, SF_DIR))
    # exactly one Window (the forward fill), partitioned by instrument —
    # no global (unpartitioned) window anywhere in the chain
    assert plan.count(") Window") == 1
    assert len(shuffle_exchanges(plan)) <= 4


def test_order_priority_check_semi_join_pushdown(spark):
    plan = fmt(spark, tpch.q_order_priority_check(spark, SF_DIR))
    # Catalyst decorrelates EXISTS into a semi join; the date constant
    # pushes into the orders scan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_reconcile_counts_preaggregates_both_sides(spark):
    from options_data_pipeline_spark.plans import quality

    plan = fmt(spark, quality.q_reconcile_counts(spark, SF_DIR))
    # both branches reduce to per-instrument rows BEFORE the outer join:
    # >= 4 aggregates (partial+final per side) around a tiny join
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 4


def test_small_quantity_revenue_broadcasts_both_builds(spark):
    plan = fmt(spark, tpch.q_small_quantity_revenue(spark, SF_DIR))
    # brand dim AND the per-part average both broadcast: the lineitem
    # side never shuffles for a join (the only exchanges feed aggregates)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EqualTo(p_brand,Brand#11)" in plan


def test_large_orders_probe_side_broadcasts(spark):
    plan = fmt(spark, tpch.q_large_orders(spark, SF_DIR))
    # the having-filtered aggregate and the customer dim broadcast;
    # orders is probed in place, never exchanged for the joins
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_customer_order_counts_outer_join_partial_agg(spark):
    plan = fmt(spark, tpch.q_customer_order_counts(spark, SF_DIR))
    # priority predicate pushed to the orders scan (= ON-clause placement)
    assert "Not(EqualTo(o_orderpriority,4-NOT SPECIFIED))" in plan
    # both aggregation levels have map-side partials
    assert plan.count("HashAggregate") >= 4


def test_sales_opportunity_anti_join_no_cartesian(spark):
    plan = fmt(spark, tpch.q_sales_opportunity(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # acctbal predicate reaches the customer scan
    assert "GreaterThan(c_acctbal,0.0)" in plan


def test_gap_event_overlap_is_equi_join_not_nested_loop(spark):
    from options_data_pipeline_spark.plans import quality

    plan = fmt(spark, quality.q_gap_event_overlap(spark, SF_DIR))
    # the range predicate must ride a hash equi-join on the bucket,
    # never a quadratic nested-loop / cartesian plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_funnel_stages_two_aggregates_no_join(spark):
    from options_data_pipeline_spark.plans import quality

    plan = fmt(spark, quality.q_funnel_stages(spark, SF_DIR))
    # conditional-min funnel: no self-joins, no windows — just the
    # per-user aggregate and the single-row reduction, both partial
    assert "Join" not in plan
    assert ") Window" not in plan
    assert len(shuffle_exchanges(plan)) <= 2


def test_chunk_dedup_two_uniform_shuffles(spark):
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_chunk_dedup(spark, SF_DIR))
    # md5 window + doc_id reassembly (+ the outer-join back to totals);
    # all keys hash-uniform, chunk fan-out is narrow (no pre-window join)
    assert "CartesianProduct" not in plan
    assert plan.count(") Window") == 1


def test_bm25_broadcasts_stats_filters_before_shuffle(spark):
    from options_data_pipeline_spark.plans import retrieval

    plan = fmt(spark, retrieval.q_bm25_search(spark, SF_DIR))
    # the idf / corpus-stat sides broadcast; the postings never sort-merge
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the query-term filter sits under the tf aggregate's exchange, so the
    # corpus-wide shuffle carries matching postings only
    assert re.search(r"Filter.*term#\d+ IN", plan) or "term#" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final tf


def test_domain_mixture_single_corpus_shuffle(spark):
    from options_data_pipeline_spark.plans import retrieval

    plan = fmt(spark, retrieval.q_domain_mixture(spark, SF_DIR))
    # ONE corpus scan (the totals window must not re-scan), one
    # map-side-combined groupBy; the window runs on the tiny aggregate
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert len(shuffle_exchanges(plan)) <= 2
    assert "SortMergeJoin" not in plan
    # corpus scan reads only the columns it needs, not text-adjacent extras
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert "n_chars" not in m.group(1)


def test_incremental_dedup_no_batch_x_corpus_join(spark):
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_incremental_dedup(spark, SF_DIR))
    # candidate generation must stay bucket-keyed: no quadratic plans
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_normalize_zero_shuffles_pruned_scan(spark):
    from options_data_pipeline_spark.plans import text

    plan = fmt(spark, text.q_text_normalize(spark, SF_DIR))
    # pure scan-level expression chain: no exchanges at all, and the scan
    # reads only (doc_id, text)
    assert len(shuffle_exchanges(plan)) == 0
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m.group(1).count(":") == 2


def test_label_cohesion_broadcasts_centroids(spark):
    from options_data_pipeline_spark.plans import vectors

    plan = fmt(spark, vectors.q_label_cohesion(spark, SF_DIR))
    # the #labels x dim centroid table broadcasts back to the corpus; the
    # corpus itself never sort-merges
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_promo_revenue_broadcast_dim_pushed_dates(spark):
    plan = fmt(spark, tpch.q_promo_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan  # pushed to the scan
    assert plan.count("HashAggregate") >= 2  # one partial-agg pass


def test_priority_shipping_fact_fact_join_pushed_dates(spark):
    plan = fmt(spark, tpch.q_priority_shipping(spark, SF_DIR))
    # orders is fact-sized: the join must key-shuffle, not build a
    # broadcast of a 1.5M-row-per-SF table
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_capped_running_sum_one_shuffle_one_pyeval(spark):
    """The clamped fold is ONE hash exchange + ONE Arrow python node —
    no per-key grouped-map, no window, no sort beyond the partition-local
    one feeding the fold."""
    from options_data_pipeline_spark.plans import timeseries

    plan = fmt(spark, timeseries.q_capped_running_sum(spark, SF_DIR))
    assert len(shuffle_exchanges(plan)) == 1
    assert len(re.findall(r"^\(\d+\) MapInPandas$", plan, re.M)) == 1
    assert "Window" not in plan


def test_user_value_trend_partial_aggregates_no_window(spark):
    """Grouped OLS rides sufficient statistics: partial+final hash
    aggregate on the user key, zero windows, zero python."""
    from options_data_pipeline_spark.plans import timeseries

    plan = fmt(spark, timeseries.q_user_value_trend(spark, SF_DIR))
    assert len(shuffle_exchanges(plan)) == 1
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert "Window" not in plan and "InPandas" not in plan


def test_cumulative_uniques_window_runs_on_compact_aggregate(spark):
    """The only window sits ABOVE both aggregates (it scans O(#days)
    rows); the events scan reads just (ts, user_id)."""
    from options_data_pipeline_spark.plans import timeseries

    plan = fmt(spark, timeseries.q_cumulative_uniques(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).count(":") == 2
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    # one window node over the output of two partial+final aggregates
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 4


def test_key_skew_report_reads_only_the_key(spark):
    """The final plan starts at the materialized rank input (ExistingRDD
    — the two-phase rank checkpoints the per-key aggregate before its
    decision jobs), so assert column pruning on the pre-rank lineage the
    materialize job actually executes: the per-key count over events."""
    import pyspark.sql.functions as F

    from options_data_pipeline_spark.sources.tables import load_table

    per_key = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    plan = fmt(spark, per_key)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).count(":") == 1 and "user_id" in m.group(1)
    # and the query itself runs off the checkpointed aggregate
    from options_data_pipeline_spark.plans import quality

    qplan = fmt(spark, quality.q_key_skew_report(spark, SF_DIR))
    assert "ExistingRDD" in qplan


def test_candles_stream_rewrites_only_trailing_partitions(spark, tmp_path_factory):
    """T2 write-cost contract, CI-pinned (VERDICT r6 ask #7): the gold
    candle table is day-partitioned and each foreachBatch MERGE
    dynamically overwrites ONLY the day partitions its touched buckets
    fall in — prior days' data files must survive byte-for-byte
    (reference aggregators/option_ohlc.py:36-41 rewrites only its
    trailing window; a whole-table rewrite per trigger is the 100 TB
    failure mode)."""
    import os

    from pyspark.sql import functions as F

    from options_data_pipeline_spark.streaming.candles import (
        incremental_candles_stream,
    )

    tmp = str(tmp_path_factory.mktemp("stream_parts"))
    src, gold, ckpt = f"{tmp}/src", f"{tmp}/gold", f"{tmp}/ckpt"

    def events(rows):
        return spark.createDataFrame(
            [(i, ts, "btc", v) for i, (ts, v) in enumerate(rows)],
            "event_id long, ts_s string, event_type string, value double",
        ).select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )

    # day 1 + day 2
    events(
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 11:00:00", 2.0),
         ("2024-01-02 09:00:00", 3.0)]
    ).coalesce(1).write.mode("append").parquet(src)
    q = incremental_candles_stream(spark, src, gold, ckpt)
    q.awaitTermination(120)

    def snapshot(path):
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = (
                    os.path.getmtime(p), os.path.getsize(p)
                )
        return out

    before = snapshot(gold)
    day1 = {k: v for k, v in before.items() if "bucket_date=2024-01-01" in k}
    assert day1, "gold table is not day-partitioned"

    # a later batch touches only day 2 (late tick) and day 3 (new)
    events(
        [("2024-01-02 09:30:00", 4.0), ("2024-01-03 08:00:00", 5.0)]
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = incremental_candles_stream(spark, src, gold, ckpt)
    q2.awaitTermination(120)

    after = snapshot(gold)
    # day-1 partition: identical files, byte-for-byte untouched
    day1_after = {
        k: v for k, v in after.items() if "bucket_date=2024-01-01" in k
    }
    assert day1_after == day1, "untouched day partition was rewritten"
    # day-2 was repaired (late tick) and day-3 inserted
    assert any("bucket_date=2024-01-03" in k for k in after)
    candles = spark.read.parquet(gold)
    d2 = candles.where(
        (F.col("bucket_ts") == "2024-01-02 09:00:00")
    ).first()
    assert d2["close"] == 4.0 and d2["n_ticks"] == 2


def test_sketch_store_consumers_never_scan_raw_events(spark, tmp_path_factory):
    """Sketch-store PAYOFF contract (VERDICT r7 ask #4): the weekly
    consumers answer from the stored day-partition sketch rows ONLY —
    the raw events parquet must be ABSENT from the consumer plan. This
    is the whole economics of the store at 100 TB: ingest hashes raw
    keys once; every later rollup question reads <= a few hundred
    stored rows per partition."""
    from options_data_pipeline_spark.plans import stores

    tmp = str(tmp_path_factory.mktemp("sketch_stores"))
    hll_path = f"{tmp}/hll_days"
    grid_path, cand_path = f"{tmp}/cms_days", f"{tmp}/cands"
    grain_path = f"{tmp}/hll_grain"
    stores.build_hll_day_store(spark, SF_DIR, hll_path)
    stores.build_cms_day_store(spark, SF_DIR, grid_path, cand_path)
    stores.build_hll_grain_store(spark, SF_DIR, grain_path)

    hll_plan = fmt(spark, stores.hll_week_consumer(spark, hll_path))
    cms_plan = fmt(
        spark, stores.cms_week_topk_consumer(spark, grid_path, cand_path)
    )
    cube_plan = fmt(spark, stores.hll_cube_consumer(spark, grain_path))
    hist_path = f"{tmp}/hist_days"
    stores.build_hist_day_store(spark, SF_DIR, hist_path)
    hist_plan = fmt(
        spark, stores.hist_week_quantile_consumer(spark, hist_path)
    )
    dds_path = f"{tmp}/dds_days"
    stores.build_dds_day_store(spark, SF_DIR, dds_path)
    dds_plan = fmt(
        spark, stores.dds_week_quantile_consumer(spark, dds_path)
    )
    for name, plan in (
        ("hll", hll_plan), ("cms", cms_plan), ("cube", cube_plan),
        ("hist", hist_plan), ("dds", dds_plan),
    ):
        assert "events.parquet" not in plan, (
            f"{name} consumer plan scans raw events — store defeated"
        )
    # cube consumer: scan -> Expand (grouping sets) -> max-merge ->
    # estimate; the register store is the only input
    assert "hll_grain" in cube_plan
    assert len(shuffle_exchanges(cube_plan)) <= 2
    # and they really read the stores
    assert "hll_days" in hll_plan
    assert "cms_days" in cms_plan and "cands" in cms_plan
    # HLL consumer: scan -> (week,bucket) max-merge -> (week) estimate;
    # two aggregate shuffles and nothing else
    assert len(shuffle_exchanges(hll_plan)) <= 2
    # CMS consumer: the <= weeks*D*W-row grid must BROADCAST onto the
    # probe cells, never shuffle-join
    assert "BroadcastHashJoin" in cms_plan
    assert "SortMergeJoin" not in cms_plan


def test_ivf_index_maintenance_equals_rebuild(spark, tmp_path_factory):
    """ANN index maintenance contract (round-8 frontier): after the
    delta upsert through the move-aware partitioned MERGE, the stored
    index STATE (every row, including cell assignment) equals a full
    rebuild over the merged corpus — no stale rows in moved keys' old
    cells, no missing evictions. The registry query adjudicates the
    search result; this pins the stronger state-level equality."""
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.operators.similarity import ivf_assign
    from options_data_pipeline_spark.plans.vectors import (
        IDX_UPD_MOD,
        _maintained_ivf_index,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    tmp = str(tmp_path_factory.mktemp("ivf_idx"))
    metrics = _maintained_ivf_index(spark, SF_DIR, f"{tmp}/index")
    assert metrics["inserted"] > 0 and metrics["updated"] > 0
    assert metrics["moved"] > 0, (
        "fixture too tame: no updated vector changed cell, the move path "
        "is untested"
    )

    maintained = {
        (r.cid, r.cell, tuple(r.cv))
        for r in spark.read.parquet(f"{tmp}/index").collect()
    }
    merged = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("cid"),
        F.when(
            F.col("vec_id") % IDX_UPD_MOD == 1, F.reverse("embedding")
        ).otherwise(F.col("embedding")).alias("cv"),
    )
    rebuild = {
        (r.cid, r.cell, tuple(r.cv))
        for r in ivf_assign(merged, "cv", nprobe=1)
        .select("cid", "cv", "cell")
        .collect()
    }
    assert maintained == rebuild


def test_band_index_maintenance_equals_rebuild(spark, tmp_path_factory):
    """Near-dup index maintenance contract (round-8 frontier): after the
    delta upsert, the stored MinHash band index equals a full rebuild
    over the merged corpus — revised docs' stale band rows are evicted
    from their old shards. The registry query adjudicates the candidate
    pairs; this pins the state-level equality and that the fixture
    really moves rows across shards."""
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.plans.text import (
        MH_UPD_MOD,
        MH_UPD_SUFFIX,
        _maintained_band_index,
        _mh_band_rows,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    tmp = str(tmp_path_factory.mktemp("mh_idx"))
    metrics = _maintained_band_index(spark, SF_DIR, f"{tmp}/bands")
    assert metrics["inserted"] > 0 and metrics["updated"] > 0
    assert metrics["moved"] > 0, (
        "fixture too tame: no revised doc's band hash changed shard"
    )

    maintained = {
        (r.doc_id, r.band, r.band_hash, r.shard)
        for r in spark.read.parquet(f"{tmp}/bands").collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    merged = (
        docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % MH_UPD_MOD == 1,
                F.concat(F.col("text"), F.lit(MH_UPD_SUFFIX)),
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" copied")).alias("text"),
            )
        )
    )
    rebuild = {
        (r.doc_id, r.band, r.band_hash, r.shard)
        for r in _mh_band_rows(merged).collect()
    }
    assert maintained == rebuild


def test_bpe_apply_plan_is_pure_scan(spark):
    """Tokenizer throughput contract (round-8 frontier): applying the
    trained merge table corpus-wide is pure JVM expression work — no
    Python evaluation, no explode fan-out, no aggregate shuffle; the
    only permitted exchange is the scan-parallelizing repartition."""
    from options_data_pipeline_spark.plans import text as T

    plan = fmt(spark, T.q_bpe_apply_expr(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" not in plan  # per-token explode would fan out rows
    assert "HashAggregate" not in plan  # token count folds row-locally
    assert len(shuffle_exchanges(plan)) <= 1  # parallelized() only
