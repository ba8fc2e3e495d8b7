"""Independent-reference cross-validation for the round-10 analytics
(the second correctness axis beyond the DuckDB oracles, following
tests/test_round9_references.py): naive numpy/python reimplementations
must agree with the engine's distributed closed forms."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_ledoit_wolf_against_numpy(spark):
    """The distributed two-pass LW estimator must match a direct numpy
    implementation of Ledoit & Wolf 2004 computed on the same
    common-clock return matrix (tolerance-grade: numpy skips the 9 dp
    product quantization, which perturbs the moments at ~1e-9)."""
    from options_data_pipeline_spark.plans.timeseries import (
        PORT_ASSETS,
        _hourly_returns,
        q_ledoit_wolf_shrinkage,
    )

    got = q_ledoit_wolf_shrinkage(spark, SF_DIR).first()

    rets = _hourly_returns(spark, SF_DIR)
    types = sorted(
        r["event_type"] for r in rets.select("event_type").distinct().collect()
    )[:PORT_ASSETS]
    rows = (
        rets.where(F.col("event_type").isin(types))
        .groupBy("h")
        .pivot("event_type", types)
        .agg(F.first("r"))
        .dropna()
        .orderBy("h")
        .collect()
    )
    X = np.array(
        [[float(r[t]) for t in types] for r in rows], dtype=np.float64
    )
    n, p = X.shape
    assert got["n_obs"] == n and p == 3
    Xc = X - X.mean(axis=0)
    S = Xc.T @ Xc / n
    m = np.trace(S) / p
    d2 = np.sum((S - m * np.eye(p)) ** 2) / p
    bbar2 = sum(
        np.sum((np.outer(x, x) - S) ** 2) / p for x in Xc
    ) / n**2
    b2 = min(bbar2, d2)
    delta = b2 / d2
    shrunk = delta * m * np.eye(p) + (1 - delta) * S

    assert abs(got["mu_trace"] - m) < 1e-6
    assert abs(got["d2"] - d2) < 1e-6
    assert abs(got["b2"] - b2) < 1e-6
    assert abs(got["delta"] - delta) < 1e-4
    for idx, (i, k) in enumerate(
        ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    ):
        col = f"c{i + 1}{k + 1}"
        assert abs(got[col] - shrunk[i, k]) < 1e-6, col
    # and the estimator does what it exists for: genuine shrinkage,
    # never past the target
    assert 0.0 < got["delta"] <= 1.0


def test_mwu_reweight_against_naive_python(spark):
    """The K-round multiplicative-weights chain must match a naive
    dict-based reimplementation driven by the same per-domain losses
    (tolerance-grade: the naive loop skips the per-round 9 dp weight
    quantization)."""
    from options_data_pipeline_spark.plans.text import (
        MWU_ETA,
        MWU_ROUNDS,
        q_mwu_domain_reweight,
    )

    rows = {r["lang"]: r for r in q_mwu_domain_reweight(spark, SF_DIR).collect()}
    losses = {lang: r["loss"] for lang, r in rows.items()}
    w = {lang: 1.0 / len(losses) for lang in losses}
    trajectory = []
    for _ in range(MWU_ROUNDS):
        lbar = sum(w[d] * losses[d] for d in w)
        wu = {d: max(w[d] * (1.0 + MWU_ETA * (losses[d] - lbar)), 0.0) for d in w}
        z = sum(wu.values())
        w = {d: wu[d] / z for d in w}
        trajectory.append(dict(w))
    for k in range(1, MWU_ROUNDS + 1):
        for lang in losses:
            assert abs(rows[lang][f"w_r{k}"] - trajectory[k - 1][lang]) < 1e-6
    # weights renormalize each round and upweight the lossiest domain
    assert abs(sum(r[f"w_r{MWU_ROUNDS}"] for r in rows.values()) - 1.0) < 1e-6
    worst = max(losses, key=lambda d: losses[d])
    assert rows[worst][f"w_r{MWU_ROUNDS}"] > 1.0 / len(losses)


def test_kalman_against_sequential_recursion(spark):
    """The truncated geometric lag sum must approximate the SEQUENTIAL
    steady-state Kalman recursion m_t = m_{t-1} + K(y_t - m_{t-1}) it
    unrolls, within the documented (1-K)^KAL_K tail bound (the GARCH
    cross-validation pattern on a different filter)."""
    from options_data_pipeline_spark.plans.timeseries import (
        KAL_K,
        _kalman_gain,
        q_kalman_local_level,
    )

    from options_data_pipeline_spark.sources.tables import load_table

    _, gain = _kalman_gain()
    got = {
        (r["event_type"], r["h"]): r["kalman_level"]
        for r in q_kalman_local_level(spark, SF_DIR).collect()
    }
    assert got
    # independent hourly series straight from raw events (pandas), then
    # the exact sequential recursion m_t = m_{t-1} + K(y_t - m_{t-1})
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("value").isNotNull())
        .select(F.date_trunc("hour", "ts").alias("h"), "event_type", "value")
        .toPandas()
    )
    tail = (1.0 - gain) ** KAL_K
    checked = 0
    for etype, grp in ev.groupby("event_type"):
        hourly = grp.groupby("h")["value"].mean().sort_index()
        ys = list(hourly.values)
        hs = list(hourly.index)
        m = ys[0]
        ymax = abs(ys[0])
        for i in range(1, len(ys)):
            m = m + gain * (ys[i] - m)
            ymax = max(ymax, abs(ys[i]))
            key = (etype, hs[i].to_pydatetime())
            if key in got:
                # the truncated filter drops the >=KAL_K-lag mass the
                # recursion carries: bounded by (1-K)^K of the running
                # level scale, plus quantization slack
                assert abs(got[key] - m) <= tail * ymax + 1e-3, key
                checked += 1
    assert checked > 100


def test_self_dup_span_mass_bounds(spark):
    """Coverage fractions are well-formed and the corpus's planted
    duplication is actually visible (nonzero dup mass somewhere)."""
    from options_data_pipeline_spark.plans.pii import q_self_dup_span_mass

    rows = q_self_dup_span_mass(spark, SF_DIR).collect()
    assert rows
    assert any(r["dup_tokens"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["dup_tokens"] <= r["total_tokens"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_compaction_reduces_files_and_preserves_content(spark, tmp_path):
    """compact_partitions(rows_per_file=...): fewer files, exact ceil
    layout, identical content, untouched partitions left alone."""
    from pyspark.sql import functions as F2

    from options_data_pipeline_spark.sinks.layout import compact_partitions

    store = str(tmp_path / "t")
    df = spark.range(500).select(
        (F2.col("id") % 2).cast("string").alias("p"), F2.col("id").alias("v")
    )
    df.repartition(16).write.partitionBy("p").parquet(store)
    import os

    def nfiles(p):
        return len(
            [f for f in os.listdir(f"{store}/p={p}") if f.endswith(".parquet")]
        )

    before = {p: nfiles(p) for p in ("0", "1")}
    assert min(before.values()) > 2
    stats = compact_partitions(
        spark, store, "p", partitions=["0"], rows_per_file=100
    )
    assert stats["partitions_compacted"] == 1
    assert nfiles("0") == -(-250 // 100)  # ceil
    assert nfiles("1") == before["1"]  # untouched partition left alone
    back = spark.read.parquet(store)
    assert back.count() == 500
    assert back.agg(F2.sum("v")).first()[0] == sum(range(500))


def test_compaction_splits_oversized_partitions(spark, tmp_path):
    """rows_per_file mode must rewrite on ANY file-count mismatch: a
    partition holding FEWER files than ceil(rows/target) (e.g. one fat
    file after a bulk load) must SPLIT to the deterministic ceil, not
    be skipped — otherwise the layout oracle diverges as soon as
    partitions outgrow the incoming fragment count (ADVICE r10)."""
    import os

    from pyspark.sql import functions as F2

    from options_data_pipeline_spark.sinks.layout import compact_partitions

    store = str(tmp_path / "t")
    df = spark.range(500).select(
        (F2.col("id") % 2).cast("string").alias("p"), F2.col("id").alias("v")
    )
    # 1 writer task: each partition lands exactly ONE (oversized) file
    df.repartition(1).write.partitionBy("p").parquet(store)

    def nfiles(p):
        return len(
            [f for f in os.listdir(f"{store}/p={p}") if f.endswith(".parquet")]
        )

    assert nfiles("0") == 1 and nfiles("1") == 1
    compact_partitions(spark, store, "p", rows_per_file=100)
    assert nfiles("0") == -(-250 // 100)  # split 1 -> ceil = 3
    assert nfiles("1") == -(-250 // 100)
    back = spark.read.parquet(store)
    assert back.count() == 500
    assert back.agg(F2.sum("v")).first()[0] == sum(range(500))


def test_compaction_counts_keyed_by_directory_token(spark, tmp_path):
    """Partition tokens that Spark's inference normalizes (zero-padded
    ints: directory p=00 reads back as int 0) must still resolve to
    their true row counts — a missed lookup used to default to 0 rows
    and wrongly compact to a single file (ADVICE r10)."""
    import os

    from pyspark.sql import functions as F2

    from options_data_pipeline_spark.sinks.layout import compact_partitions

    store = str(tmp_path / "t")
    df = spark.range(500).select(
        F2.when(F2.col("id") % 2 == 0, "00").otherwise("01").alias("p"),
        F2.col("id").alias("v"),
    )
    df.repartition(8).write.partitionBy("p").parquet(store)

    def nfiles(p):
        return len(
            [f for f in os.listdir(f"{store}/p={p}") if f.endswith(".parquet")]
        )

    compact_partitions(spark, store, "p", rows_per_file=100)
    # 250 rows per partition -> ceil(250/100) = 3 files, NOT 1
    assert nfiles("00") == 3
    assert nfiles("01") == 3
    assert spark.read.parquet(store).count() == 500


def test_ivm_view_evicts_drained_groups(spark):
    """Groups whose count reaches zero must vanish from the maintained
    view (a zero-count group row would diverge from the recompute)."""
    from options_data_pipeline_spark.plans.quality import q_agg_ivm_twin

    from .conftest import SF_DIR as _SF

    rows = q_agg_ivm_twin(spark, _SF).collect()
    assert rows
    assert all(r["cnt"] > 0 for r in rows)
