"""Degenerate-input behavior of the round-9 analytics plans: singular
normal equations, series shorter than the window, empty pair clocks,
one-doc groups, sub-3-asset universes. At 100 TB something is always
degenerate — these must return NULL/empty/identity, never throw.

The plans read parquet tables, so each test stages a tiny synthetic
``events``/``documents`` dir and calls the plan against it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from options_data_pipeline_spark.plans import options as OP
from options_data_pipeline_spark.plans import text as TX
from options_data_pipeline_spark.plans import timeseries as TS

EVENTS = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)
DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def _stage_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EVENTS).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _stage_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOCS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_vol_surface_single_strike_is_singular_not_thrown(spark, tmp_path):
    # one strike per expiry -> rank-deficient normal equations -> det 0
    # -> nullif guard -> NULL coefficients (never a divide error)
    rows = [
        (i, "2024-01-01 10:00:00", 4, "view", 10.0 + i, "{}")
        for i in range(6)
    ]
    sf = _stage_events(spark, tmp_path, rows)
    out = OP.q_vol_surface_fit(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 1
    assert r["base_iv"] is None and r["skew"] is None
    assert r["curvature"] is None


def test_ou_half_life_constant_and_short_series(spark, tmp_path):
    rows = [
        # 'flat': constant level -> zero variance -> phi NULL
        (1, "2024-01-01 10:00:00", 1, "flat", 5.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "flat", 5.0, "{}"),
        (3, "2024-01-01 12:00:00", 1, "flat", 5.0, "{}"),
        # 'lone': single hour -> no lag pairs -> absent from output
        (4, "2024-01-01 10:00:00", 1, "lone", 7.0, "{}"),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in TS.q_ou_half_life(spark, sf).collect()}
    assert set(got) == {"flat"}
    assert got["flat"]["phi"] is None
    assert got["flat"]["half_life_hours"] is None


def test_lead_lag_xcorr_single_common_hour(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "aa", 1.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "bb", 2.0, "{}"),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    out = TS.q_lead_lag_xcorr(spark, sf).collect()
    # one common hour: every lag's correlation denominator is 0 -> NULL
    assert len(out) == 7  # lags -3..3 for the single pair
    assert all(r["xcorr"] is None for r in out)


def test_garch_vol_series_shorter_than_truncation(spark, tmp_path):
    rows = [
        (i, f"2024-01-01 {10 + i}:00:00", 1, "v", 10.0 + i, "{}")
        for i in range(5)  # 5 hours << K+1 lags
    ]
    sf = _stage_events(spark, tmp_path, rows)
    assert TS.q_garch_vol(spark, sf).count() == 0  # no complete window


def test_var_es_single_return(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "v", 10.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "v", 12.0, "{}"),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    out = TS.q_var_es_historical(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    # one return: k = ceil(0.05 * 1) = 1, VaR == ES == the return
    assert r["n_obs"] == 1 and r["k_tail"] == 1
    assert r["var95"] == pytest.approx(0.2)
    assert r["es95"] == pytest.approx(0.2)


def test_tail_dependence_disjoint_clocks(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "aa", 1.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "aa", 2.0, "{}"),
        (3, "2024-01-02 10:00:00", 1, "bb", 1.0, "{}"),
        (4, "2024-01-02 11:00:00", 1, "bb", 2.0, "{}"),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    # return clocks never overlap -> the pair has no common rows
    assert TS.q_tail_dependence(spark, sf).count() == 0


def test_min_var_portfolio_under_three_assets(spark, tmp_path):
    rows = [
        (i, f"2024-01-01 {10 + i % 4}:00:00", 1, t, float(i), "{}")
        for i in range(8)
        for t in ("aa", "bb")
    ]
    sf = _stage_events(spark, tmp_path, rows)
    out = TS.q_min_var_portfolio(spark, sf).collect()
    # two assets: the 3-series common clock is empty -> NULL weights,
    # 0 observations, no throw
    assert len(out) == 1
    assert out[0]["n_obs"] == 0
    assert out[0]["w_1"] is None


def test_drawdown_duration_monotone_series_has_no_spells(spark, tmp_path):
    rows = [
        (i, f"2024-01-01 {10 + i}:00:00", 1, "up", 10.0 + i, "{}")
        for i in range(6)
    ]
    sf = _stage_events(spark, tmp_path, rows)
    # strictly rising: never underwater -> the type has no spell row
    assert TS.q_drawdown_duration(spark, sf).count() == 0


def test_kn_bigram_lm_no_bigrams(spark, tmp_path):
    rows = [
        (1, "solo", "en", "web", 4),
        (2, "", "en", "web", 0),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    assert TX.q_kn_bigram_lm(spark, sf).count() == 0


def test_dpo_pair_build_drops_singleton_groups(spark, tmp_path):
    rows = [
        (1, "the a of and to good text here", "en", "web", 30),
        (2, "zzz", "en", "books", 3),  # singleton group: no pair
        (3, "another the of to in doc", "en", "web", 25),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    out = TX.q_dpo_pair_build(spark, sf).collect()
    assert {(r["lang"], r["source"]) for r in out} == {("en", "web")}
    r = out[0]
    assert r["chosen_doc"] != r["rejected_doc"]
    assert r["margin"] >= 0


def test_tokenizer_fertility_empty_text_no_throw(spark, tmp_path):
    rows = [
        (1, "", "en", "web", 0),
        (2, "two words", "en", "web", 9),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    out = TX.q_tokenizer_fertility(spark, sf).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2


def test_ngram_novelty_decay_short_docs(spark, tmp_path):
    rows = [
        (0, "a b", "en", "web", 3),  # < 3 words: zero 3-grams
        (9, "x y z w", "en", "web", 7),
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    out = TX.q_ngram_novelty_decay(spark, sf).collect()
    # only doc 9 contributes grams; its decile holds 2 novel 3-grams
    assert len(out) == 1
    assert out[0]["distinct_grams"] == 2
    assert out[0]["novel_grams"] == 2
    assert out[0]["novelty_rate"] == pytest.approx(1.0)
