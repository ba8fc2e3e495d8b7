"""Independent-reference cross-validation for the round-9 numeric
operators: a SECOND axis beyond the DuckDB oracles.  The oracle proves
Spark and DuckDB compute the same thing; these prove that thing is the
RIGHT thing — the truncated GARCH form against the sequential
recursion it unrolls, the adjugate portfolio solve against
numpy.linalg, the Elliott-IRLS fixed point against a plain-numpy
reimplementation, label propagation against a naive dict-based spread.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from options_data_pipeline_spark.plans import text as TX
from options_data_pipeline_spark.plans import timeseries as TS

from .conftest import SF_DIR

EVENTS = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)


def _stage_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EVENTS).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _r9(x: float) -> float:
    # the engine's half-away-from-zero 9 dp quantization
    return math.floor(abs(x) * 1e9 + 0.5) / 1e9 * (1.0 if x >= 0 else -1.0)


def test_garch_closed_form_equals_sequential_recursion(spark, tmp_path):
    """The truncated lag-sum IS the GARCH(1,1) recursion unrolled: on a
    series long enough to have complete windows, the closed form must
    track the sequential filter within the documented beta^K tail bound
    (relative to the filter's own scale)."""
    hours = 40
    rows = [
        (i, f"2024-01-0{1 + i // 24} {i % 24:02d}:00:00", 1, "v",
         100.0 + 10.0 * math.sin(i * 0.7) + (i % 5), "{}")
        for i in range(hours)
    ]
    sf = _stage_events(spark, tmp_path, rows)
    out = {
        str(r["h"]): r["sigma2"]
        for r in TS.q_garch_vol(spark, sf).collect()
    }
    assert out, "no complete windows — fixture too short"

    # python sequential filter on the SAME quantized returns
    levels = [100.0 + 10.0 * math.sin(i * 0.7) + (i % 5) for i in range(hours)]
    rets = [
        _r9((levels[i] - levels[i - 1]) / levels[i - 1])
        for i in range(1, hours)
    ]
    r2 = [
        math.floor(abs(r * r) * 1e12 + 0.5) / 1e12  # 12 dp, values >= 0
        for r in rets
    ]
    w, a, b = TS.GARCH_OMEGA, TS.GARCH_ALPHA, TS.GARCH_BETA
    sig = w / (1.0 - b)  # stationary start
    seq = {}
    for t in range(1, len(r2)):
        sig = w + a * r2[t - 1] + b * sig
        seq[t] = sig
    # closed form drops beta^K * sigma_{t-K}; bound the gap by that tail.
    # q_garch_vol emits one row per return index with K lags available;
    # compare the SORTED value multisets instead of re-deriving hour keys
    tail = b ** TS.GARCH_K * max(seq.values())
    spark_vals = sorted(out.values())
    seq_vals = sorted(s for t, s in seq.items() if t >= TS.GARCH_K)
    assert len(spark_vals) == len(seq_vals)
    for sv, qv in zip(spark_vals, seq_vals):
        assert abs(sv - qv) <= tail + 1e-8, (sv, qv, tail)


def test_min_var_portfolio_matches_numpy(spark):
    """The adjugate closure must equal numpy.linalg.solve on the same
    covariance matrix (w = S^-1 1 / 1' S^-1 1)."""
    row = TS.q_min_var_portfolio(spark, SF_DIR).collect()[0]
    rets = TS._hourly_returns(spark, SF_DIR)
    pdf = rets.toPandas()
    types = sorted(pdf["event_type"].unique())[:3]
    wide = pdf[pdf["event_type"].isin(types)].pivot_table(
        index="h", columns="event_type", values="r", aggfunc="max"
    ).dropna()
    x = wide[types].to_numpy(dtype=float)
    cov = np.cov(x, rowvar=False, bias=True)  # population cov (1/n)
    inv1 = np.linalg.solve(cov, np.ones(3))
    wts = inv1 / inv1.sum()
    assert row["n_obs"] == len(x)
    got = [row["w_1"], row["w_2"], row["w_3"]]
    assert np.allclose(got, wts, atol=1e-6), (got, wts)
    assert row["asset_1"] == types[0] and row["asset_3"] == types[2]


def test_logistic_irls_matches_numpy_reference(spark):
    """Three Elliott-IRLS rounds re-implemented in numpy (same link,
    same 9 dp coefficient quantization, same ridge) must land on the
    same coefficients."""
    row = TX.q_logistic_irls(spark, SF_DIR).collect()[0]
    from options_data_pipeline_spark.operators.textstats import quality_score
    from options_data_pipeline_spark.sources.tables import load_table

    docs = quality_score(load_table(spark, SF_DIR, "documents")).select(
        "n_chars", "stopword_ratio", "lang"
    ).toPandas()
    x1 = np.array([_r9(math.log(1.0 + float(c))) for c in docs["n_chars"]])
    x2 = np.array([_r9(float(s)) for s in docs["stopword_ratio"]])
    y = (docs["lang"] == "en").to_numpy(dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta = np.zeros(3)
    for _ in range(TX.IRLS_ROUNDS):
        eta = X @ beta
        p = 0.5 * (1.0 + eta / (1.0 + np.abs(eta)))
        w = p * (1.0 - p) + 1e-6
        z = eta + (y - p) / w
        # the engine quantizes each moment term to 9 dp before the sum;
        # at this tolerance plain float64 sums agree far below 1e-5
        A = X.T @ (w[:, None] * X) + TX.IRLS_RIDGE * np.eye(3)
        t = X.T @ (w * z)
        beta = np.array([_r9(v) for v in np.linalg.solve(A, t)])
    got = [row["beta_0"], row["beta_len"], row["beta_stop"]]
    assert np.allclose(got, beta, atol=1e-5), (got, beta)
    assert row["n_docs"] == len(docs)


def test_label_propagation_matches_naive_python(spark):
    """Three synchronous LP rounds re-implemented as plain dict spread
    over the same co-purchase edges must produce the identical
    assignment (weighted majority, ties to the smallest label)."""
    from options_data_pipeline_spark.plans.affinity import (
        LP_ROUNDS,
        LP_SEED_MOD,
        q_label_propagation,
        support_edge_artifact,
    )
    from options_data_pipeline_spark.sources.tables import load_table

    got = {
        r["part"]: r["label"]
        for r in q_label_propagation(spark, SF_DIR).collect()
    }
    edges = support_edge_artifact(spark, SF_DIR).collect()
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF_DIR, "part").collect()
    }
    adj: dict[int, list[tuple[int, int]]] = {}
    for e in edges:
        adj.setdefault(e["part_a"], []).append((e["part_b"], e["support"]))
        adj.setdefault(e["part_b"], []).append((e["part_a"], e["support"]))
    seeds = {k: v for k, v in part.items() if k % LP_SEED_MOD == 0}
    labels = dict(seeds)
    for _ in range(LP_ROUNDS):
        votes: dict[int, dict[str, int]] = {}
        for src, lbl in labels.items():
            for dst, w in adj.get(src, []):
                votes.setdefault(dst, {}).setdefault(lbl, 0)
                votes[dst][lbl] += w
        nxt = dict(seeds)
        for node, vv in votes.items():
            if node in seeds:
                continue
            nxt[node] = min(vv.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    assert got == labels


def test_var_es_worst_k_convention(spark):
    """VaR/ES against a direct sorted-tail computation on the same
    return series (worst-k convention, k = ceil(0.05 n))."""
    rows = TS.q_var_es_historical(spark, SF_DIR).collect()
    rets = TS._hourly_returns(spark, SF_DIR).toPandas()
    for r in rows:
        series = sorted(
            float(v) for v in rets[rets["event_type"] == r["event_type"]]["r"]
        )
        k = max(1, math.ceil(TS.VAR_ALPHA * len(series)))
        assert r["n_obs"] == len(series)
        assert r["k_tail"] == k
        assert r["var95"] == pytest.approx(series[k - 1], abs=1e-9)
        assert r["es95"] == pytest.approx(
            sum(series[:k]) / k, abs=1e-6
        )
