"""Systemic determinism contract: a representative query from every
family must produce BIT-IDENTICAL results under different shuffle
parallelism.

This is the invariant all the engine's determinism machinery exists for
(decimal accumulation, struct-ordered min_by/max_by, md5-derived
randomness, fixed-point integer iteration, portable rounding): if any
aggregate or join were partition-order sensitive, changing
``spark.sql.shuffle.partitions`` would change the hash. The DuckDB
parity suite can't catch an instability that happens to match the
oracle under ONE partitioning — this does.
"""

from __future__ import annotations

import pytest

from options_data_pipeline_spark.plans import registry

from ._compare import canonical_rows
from .conftest import SF_DIR

# one per family: scan-agg, session rollup, window, as-of, near-dup,
# ANN, packing prefix-sum, sampling, graph iteration, exact weighted
# median, retrieval scoring, islands
SAMPLE = [
    "pricing_summary",
    "daily_sessions",
    "rolling_median",
    "nearest_click",
    "minhash_near_dups",
    "ann_cosine_topk",
    "token_shards",
    "mixture_resample",
    "pagerank_parts",
    "weighted_median_price",
    "bm25_search",
    "interval_coverage",
    "qty_price_corr",
    "value_drift_psi",
    "hierarchy_rollup",
    "snapshot_diff",
    "span_corruption",
    # round-4 families: correlated argmin, scalar-HAVING, RANGE frames,
    # scaled-integer covariance, index-recall join, trigram top-k
    "min_cost_supplier",
    "important_parts",
    "trailing_spend",
    "embedding_covariance",
    "ann_recall",
    "frequent_ngrams",
    # round-3 continuation: stateful fold (mapInPandas dict state),
    # ordered sequence collapse, grouped OLS, collocations, KS drift
    "capped_running_sum",
    "top_event_paths",
    "user_value_trend",
    "bigram_pmi",
    "length_ks_drift",
    # round-4: two-phase distributed rank (VERDICT r3 ask #2) and the
    # differentiated fact-fact skew join (ask #7)
    "key_skew_report",
    "zipf_fit",
    "salted_user_spend",
    "approx_stats",
    # round-5 families: df-capped posting self-join, stdlib PNG decode,
    # decimal chi-square, streaming twins, distributed retrieval rank,
    # iterative BPE, BS pricing math, CDC reduction, SCD2 windows
    "ngram_jaccard_pairs",
    "image_probe",
    "benford_chisq",
    "stream_candles_twin",
    # round-10: at-least-once replay through the candles MERGE sink
    "stream_candles_replay_twin",
    "retrieval_ndcg",
    "bpe_tokenize",
    "bs_greeks",
    "cdc_apply_twin",
    "scd2_history",
    # round-8 families: iterate chains over exact decimals (greedy MMR,
    # MM rating fit, IRLS, backward induction), sketch-store consumers,
    # index maintenance under upserts, bootstrap order statistics,
    # conformal exact quantiles, survival log-sums, replace-chain BPE
    "mmr_rerank",
    "bradley_terry",
    "huber_regression",
    "american_put_premium",
    "crr_binomial_price",
    "hll_week_from_store",
    "cms_topk_from_store",
    "ivf_index_upsert",
    "minhash_index_upsert",
    # round-10: maintenance-only split against the pre-staged artifact
    "minhash_index_maintain",
    # round-10: relative-error quantile store (decimal-log buckets)
    "dds_quantile_store",
    # round-10: exact shared-token-span screen (diagonal islands)
    "exact_substring_contamination",
    # round-10: Lloyd-round index compaction through the moving MERGE
    "ivf_index_recluster",
    # round-10: fourth store type through the shared additive stream
    "dds_store_stream_twin",
    # round-10: two-pass chained moments (LW shrinkage closed form)
    "ledoit_wolf_shrinkage",
    # round-10: K-round multiplicative-weights chain over broadcast folds
    "mwu_domain_reweight",
    # round-10 wave 4: truncated steady-state Kalman, frozen-vocab
    # drift, duplicated-span token mass
    "kalman_local_level",
    "tokenizer_coverage_drift",
    "self_dup_span_mass",
    # round-10 wave 5: table maintenance (OPTIMIZE compaction, IVM)
    "small_file_compaction",
    "agg_ivm_twin",
    "bpe_apply_expr",
    "bigram_perplexity",
    "poisson_bootstrap_ci",
    "conformal_interval",
    "kaplan_meier",
    "cusum_changepoint",
    "seasonal_decompose",
    "group_advantage",
    "token_kl_divergence",
    "revenue_gini",
    "fim_transform",
    "readability_score",
    "temperature_mixture",
    "auc_roc",
    "returns_acf",
    "transition_entropy",
    "amihud_illiq",
    "hurst_exponent",
    # round-9 families: grouping-set register merges, closed-form WLS
    # over 9dp moments, AR(1)/xcorr moment closures, KN count joins,
    # struct-ordered preference extremals
    "hll_cube",
    "vol_surface_fit",
    "ou_half_life",
    "lead_lag_xcorr",
    "kn_bigram_lm",
    "dpo_pair_build",
    # wave 2: truncated-recursion window fold, order-statistic risk
    # pair, rank-threshold pair probe, corpus-histogram S-curve sweep
    "garch_vol",
    "var_es_historical",
    "tail_dependence",
    "tokenizer_fertility",
    "ngram_novelty_decay",
    "minhash_lsh_tuning",
    # wave 3: adjugate portfolio closure, islands-over-running-peak,
    # stored-bin CDF inversion, unrolled synchronous LPA rounds
    "min_var_portfolio",
    "drawdown_duration",
    "hist_quantile_store",
    "label_propagation",
    # wave 4: chained-broadcast IRLS fixed point (rational link)
    "logistic_irls",
    # wave 5: jump-robust moment ratio, compact-histogram deciles
    "jump_test",
    "k_anonymity",
    # wave 6: chained-coefficient scoring, dimension-frame ESS moments
    "calibration_curve",
    "importance_ess",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_result_is_partitioning_invariant(spark, name):
    q = registry.queries()[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        low = canonical_rows(q(spark, SF_DIR).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        high = canonical_rows(q(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert low == high


AQE_SENSITIVE = [
    # the two-phase rank was originally built on spark_partition_id()
    # over repartitionByRange and produced WRONG ranks precisely because
    # AQE coalesces the two consumer branches of the shuffle
    # independently; the value-based bucket fix must hold with AQE off
    # and on (same hash either way)
    "key_skew_report",
    "zipf_fit",
    "salted_user_spend",
    "ann_recall",
    "token_heavy_hitters",
]


@pytest.mark.parametrize("name", AQE_SENSITIVE)
def test_result_is_aqe_invariant(spark, name):
    q = registry.queries()[name]
    original = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = canonical_rows(q(spark, SF_DIR).toPandas())
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = canonical_rows(q(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", original)
    assert off == on
