"""Unit tests for the deterministic mergeable HLL sketch
(options_data_pipeline_spark/operators/hll.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators import hll


def _py_hash(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _py_registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in keys:
        h = _py_hash(str(k))
        bucket = h % hll.M
        w = h >> hll.P_BITS
        rho = hll.W_BITS + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs: dict[int, int]) -> float:
    s = sum(2.0 ** -r for r in regs.values()) + (hll.M - len(regs))
    raw = hll.ALPHA * hll.M * hll.M / s
    z = hll.M - len(regs)
    if raw <= 2.5 * hll.M and z > 0:
        return hll.M * math.log(hll.M / z)
    return raw


def test_registers_match_python(spark):
    keys = [f"user-{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r.bucket, r.reg)
        for r in hll.hll_registers(df, "k", []).collect()
    }
    assert got == set(_py_registers(keys).items())


def test_merge_equals_union_sketch(spark):
    """Sketch(A) max-merged with Sketch(B) is EXACTLY Sketch(A ∪ B) —
    the property that makes per-partition sketches composable."""
    a = [f"a-{i}" for i in range(400)]
    b = [f"b-{i}" for i in range(400)] + a[:100]  # overlap too
    fa = spark.createDataFrame([("g", k) for k in a], "g string, k string")
    fb = spark.createDataFrame([("g", k) for k in b], "g string, k string")
    ra = hll.hll_registers(fa, "k", ["g"])
    rb = hll.hll_registers(fb, "k", ["g"])
    merged = {
        (r.bucket, r.reg)
        for r in hll.merge_registers(ra.unionByName(rb), ["g"]).collect()
    }
    union = {
        (r.bucket, r.reg)
        for r in hll.hll_registers(
            fa.unionByName(fb), "k", ["g"]
        ).collect()
    }
    assert merged == union


@pytest.mark.parametrize("n", [40, 5000])
def test_estimate_matches_python_and_is_close(spark, n):
    """Both branches (linear counting at n=40, raw HLL at n=5000):
    Spark's estimate equals the python model to float precision and
    lands within 5 standard errors of the truth."""
    keys = [f"k-{i}" for i in range(n)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    regs = hll.hll_registers(df, "k", [])
    [row] = hll.hll_estimate(regs, []).collect()
    want = _py_estimate(_py_registers(keys))
    assert row.hll_estimate == pytest.approx(want, rel=1e-12)
    stderr = 1.04 / math.sqrt(hll.M)
    assert abs(row.hll_estimate - n) / n < 5 * stderr


def test_registers_bounded_by_m(spark):
    df = spark.range(100_000).select(F.col("id").cast("string").alias("k"))
    assert hll.hll_registers(df, "k", []).count() <= hll.M


# --- KMV ---------------------------------------------------------------------


def _py_kmv(keys):
    from options_data_pipeline_spark.operators import kmv

    hs = sorted({_py_hash(str(k)) for k in keys})
    return hs[: kmv.K]


def test_kmv_sketch_matches_python(spark):
    from options_data_pipeline_spark.operators import kmv

    keys = [f"u{i}" for i in range(500)] * 2  # duplicates collapse
    df = spark.createDataFrame([("g", k) for k in keys], "g string, k string")
    got = sorted(r.h for r in kmv.kmv_sketch(df, "k", ["g"]).collect())
    assert got == _py_kmv(keys)


def test_kmv_estimate_exact_below_k(spark):
    from options_data_pipeline_spark.operators import kmv

    df = spark.createDataFrame([("g", f"u{i}") for i in range(40)],
                               "g string, k string")
    sk = kmv.kmv_sketch(df, "k", ["g"])
    [row] = kmv.kmv_estimate(sk, ["g"]).collect()
    assert row.n_kept == 40 and row.est == 40.0


def test_kmv_estimate_close_above_k(spark):
    import math

    from options_data_pipeline_spark.operators import kmv

    n = 3000
    df = spark.createDataFrame([("g", f"u{i}") for i in range(n)],
                               "g string, k string")
    sk = kmv.kmv_sketch(df, "k", ["g"])
    [row] = kmv.kmv_estimate(sk, ["g"]).collect()
    want = kmv.EST_NUM / float(_py_kmv([f"u{i}" for i in range(n)])[-1])
    assert row.est == want
    assert abs(row.est - n) / n < 5 / math.sqrt(kmv.K - 2)


# --- CMS ---------------------------------------------------------------------


def _py_cms_grid(tokens):
    from options_data_pipeline_spark.operators import cms

    grid = {}
    for t in tokens:
        for r in range(cms.D):
            c = _py_hash(f"{r}:{t}") % cms.W
            grid[(r, c)] = grid.get((r, c), 0) + 1
    return grid


def test_cms_grid_matches_python(spark):
    from options_data_pipeline_spark.operators import cms

    tokens = [f"t{i % 37}" for i in range(1000)]
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    got = {(r.r, r.c): r.cnt for r in cms.cms_build(df, "token", []).collect()}
    assert got == _py_cms_grid(tokens)


def test_cms_merge_equals_direct_build(spark):
    """Counters add: per-group grids summed == one global build."""
    from options_data_pipeline_spark.operators import cms

    rows = [(f"g{i % 3}", f"t{i % 101}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, token string")
    merged = {
        (r.r, r.c): r.cnt
        for r in cms.cms_merge(
            cms.cms_build(df, "token", ["g"]), []
        ).collect()
    }
    direct = {
        (r.r, r.c): r.cnt
        for r in cms.cms_build(df.select("token"), "token", []).collect()
    }
    assert merged == direct


def test_cms_query_overestimates_only_and_matches_python(spark):
    """5000 distinct keys >> W forces collisions: est >= exact always,
    and est equals the python CMS min-over-rows exactly."""
    from options_data_pipeline_spark.operators import cms

    tokens = [f"key-{i}" for i in range(5000)] + ["key-7"] * 50
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    grid = cms.cms_build(df, "token", [])
    probe_list = ["key-7", "key-123", "absent-key"]
    probes = spark.createDataFrame([(t,) for t in probe_list], "token string")
    got = {r.token: r.est for r in cms.cms_query(grid, probes).collect()}

    pygrid = _py_cms_grid(tokens)
    exact = {"key-7": 51, "key-123": 1, "absent-key": 0}
    some_collision = False
    for t in probe_list:
        want = min(
            pygrid.get((r, _py_hash(f"{r}:{t}") % cms.W), 0)
            for r in range(cms.D)
        )
        assert got[t] == want
        assert got[t] >= exact[t]
        some_collision = some_collision or got[t] > exact[t]
    # deterministic hash, 5000 keys >> 512 counters: collisions certain
    assert some_collision


def test_cms_query_rejects_grouped_grid(spark):
    """ADVICE r7: a grid still carrying group columns would join every
    group's cells to every probe and min ACROSS groups — cms_query must
    refuse it rather than return a silent wrong answer."""
    import pytest

    from options_data_pipeline_spark.operators import cms

    rows = [(f"g{i % 3}", f"t{i % 11}") for i in range(100)]
    df = spark.createDataFrame(rows, "g string, token string")
    grouped = cms.cms_build(df, "token", ["g"])
    probes = spark.createDataFrame([("t1",)], "token string")
    with pytest.raises(ValueError, match="grid with columns"):
        cms.cms_query(grouped, probes)
    # merged away, the same grid is accepted
    assert cms.cms_query(
        cms.cms_merge(grouped, []), probes
    ).collect()[0].est > 0
    # and a grouped probe against the grouped grid is the supported path
    gprobes = spark.createDataFrame(
        [("g0", "t1"), ("g1", "t1")], "g string, token string"
    )
    per_group = {
        (r.g, r.token): r.est
        for r in cms.cms_query(grouped, gprobes, group_cols=["g"]).collect()
    }
    direct = {
        (g, "t1"): sum(1 for gg, t in rows if gg == g and t == "t1")
        for g in ("g0", "g1")
    }
    # W=512 >> 11 distinct tokens: no collisions, est == exact count
    assert per_group == direct


# --- AMS F2 ------------------------------------------------------------------


def _py_ams_sign(r, key):
    from options_data_pipeline_spark.operators import ams

    h = _py_hash(f"{r // ams.SIGN_BITS}:{key}")
    return ((h >> (r % ams.SIGN_BITS)) & 1) * 2 - 1


def test_ams_counters_match_python(spark):
    from options_data_pipeline_spark.operators import ams

    keys = [f"u{i % 23}" for i in range(700)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {(r.r, r.x) for r in ams.ams_counters(df, "k", []).collect()}
    want = {}
    for k in keys:
        for r in range(ams.D):
            want[r] = want.get(r, 0) + _py_ams_sign(r, k)
    assert got == set(want.items())


def test_ams_f2_unbiased_enough(spark):
    """est equals the python-model mean of X^2 exactly, and lands
    within 5*sqrt(2/D) of the true F2 for a zipf-ish distribution."""
    import math

    from options_data_pipeline_spark.operators import ams

    keys = []
    for i in range(60):
        keys += [f"u{i}"] * (60 // (i + 1))
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    [row] = ams.ams_f2_estimate(
        ams.ams_counters(df, "k", []), []
    ).collect()
    xs = {}
    for k in keys:
        for r in range(ams.D):
            xs[r] = xs.get(r, 0) + _py_ams_sign(r, k)
    want = sum(x * x for x in xs.values()) / ams.D_F
    assert row.f2_est == want
    from collections import Counter

    f2 = sum(c * c for c in Counter(keys).values())
    assert abs(row.f2_est - f2) / f2 < 5 * math.sqrt(2 / ams.D)


def test_ams_counters_merge_by_addition(spark):
    from options_data_pipeline_spark.operators import ams
    from pyspark.sql import functions as F

    a = [(f"u{i % 11}",) for i in range(200)]
    b = [(f"u{i % 17}",) for i in range(300)]
    fa = spark.createDataFrame(a, "k string")
    fb = spark.createDataFrame(b, "k string")
    summed = {
        (r.r, r.x)
        for r in ams.ams_counters(fa, "k", [])
        .unionByName(ams.ams_counters(fb, "k", []))
        .groupBy("r")
        .agg(F.sum("x").alias("x"))
        .collect()
    }
    direct = {
        (r.r, r.x)
        for r in ams.ams_counters(
            fa.unionByName(fb), "k", []
        ).collect()
    }
    assert summed == direct


def test_ams_join_size_estimate_matches_python(spark):
    """Inner-product estimator: mean_r(Xa_r * Xb_r) == python model,
    and within 5*sqrt(2/D) relative error of the true join size."""
    import math

    from options_data_pipeline_spark.operators import ams

    a_keys = [f"u{i % 13}" for i in range(400)]
    b_keys = [f"u{i % 29}" for i in range(300)]
    fa = spark.createDataFrame([(k,) for k in a_keys], "k string")
    fb = spark.createDataFrame([(k,) for k in b_keys], "k string")
    ca = ams.ams_counters(fa, "k", []).select("r", F.col("x").alias("xa"))
    cb = ams.ams_counters(fb, "k", []).select("r", F.col("x").alias("xb"))
    [row] = (
        ca.join(cb, "r")
        .agg(
            (F.sum(F.col("xa") * F.col("xb")).cast("double") / ams.D_F)
            .alias("est")
        )
        .collect()
    )
    xa, xb = {}, {}
    for k in a_keys:
        for r in range(ams.D):
            xa[r] = xa.get(r, 0) + _py_ams_sign(r, k)
    for k in b_keys:
        for r in range(ams.D):
            xb[r] = xb.get(r, 0) + _py_ams_sign(r, k)
    want = sum(xa[r] * xb[r] for r in range(ams.D)) / ams.D_F
    assert row.est == want

    from collections import Counter

    na, nb = Counter(a_keys), Counter(b_keys)
    true = sum(na[k] * nb.get(k, 0) for k in na)
    assert abs(row.est - true) / true < 5 * math.sqrt(2 / ams.D)
