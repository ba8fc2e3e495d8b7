"""Textbook pins for operators/survival.py: the Freireich et al.
(1963) 6-MP vs placebo trial — the fixture every survival text and
lifelines' own docs verify against.  Expected values are computed in
EXACT Fraction arithmetic from the published definitions (plus the
published rounded statistics as external anchors), so a shared
risk-set-convention error in the operator cannot slip through oracle
parity."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.survival import (
    km_survival_at,
    logrank_two_sample,
)

# Freireich 1963: remission durations in weeks.
SIX_MP_EVENTS = [6, 6, 6, 7, 10, 13, 16, 22, 23]
SIX_MP_CENSORED = [6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35]
PLACEBO_EVENTS = [1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8,
                  11, 11, 12, 12, 15, 17, 22, 23]


def _durs_df(spark, arms):
    rows = []
    for arm, events, censored in arms:
        rows += [(arm, t, 1, 0) for t in events]
        rows += [(arm, t, 0, 1) for t in censored]
    return spark.createDataFrame(
        rows, "arm string, dur long, d long, c long"
    )


def _km_reference(events, censored, t):
    """Exact-fraction KM at horizon t from the definition."""
    times = sorted(set(events))
    s = Fraction(1)
    for v in times:
        if v > t:
            break
        d = events.count(v)
        r = sum(1 for e in events if e >= v) + sum(
            1 for c in censored if c >= v
        )
        s *= 1 - Fraction(d, r)
    return s


def test_km_matches_freireich_fractions(spark):
    probes = (5, 6, 10, 16, 23, 35)
    df = _durs_df(spark, [("6mp", SIX_MP_EVENTS, SIX_MP_CENSORED)])
    out = km_survival_at(df, ["arm"], "dur", "d", "c", probes)
    got = {r["t"]: r for r in out.collect()}
    for t in probes:
        exp = float(_km_reference(SIX_MP_EVENTS, SIX_MP_CENSORED, t))
        assert got[t]["survival"] == pytest.approx(exp, rel=1e-12), t
        assert (got[t]["n"], got[t]["n_events"], got[t]["n_censored"]) \
            == (21, 9, 12)
    # published anchors (Freireich KM curve): S(6)=18/21≈0.857,
    # S(10)≈0.753
    assert got[6]["survival"] == pytest.approx(0.857, abs=5e-4)
    assert got[10]["survival"] == pytest.approx(0.753, abs=5e-4)


def _logrank_reference(a_events, a_censored, b_events, b_censored):
    """Exact-fraction O1/E1/V from the hypergeometric definition."""
    times = sorted(set(a_events) | set(b_events))
    o1 = len(a_events)
    e1 = Fraction(0)
    v = Fraction(0)
    for t in times:
        d1 = a_events.count(t)
        d2 = b_events.count(t)
        d = d1 + d2
        r1 = sum(1 for e in a_events if e >= t) + sum(
            1 for c in a_censored if c >= t
        )
        r2 = sum(1 for e in b_events if e >= t) + sum(
            1 for c in b_censored if c >= t
        )
        r = r1 + r2
        e1 += Fraction(d * r1, r)
        if r > 1:
            v += Fraction(d * r1 * r2 * (r - d), r * r * (r - 1))
    return o1, e1, v


def test_logrank_matches_freireich(spark):
    df = _durs_df(
        spark,
        [
            ("6mp", SIX_MP_EVENTS, SIX_MP_CENSORED),
            ("placebo", PLACEBO_EVENTS, []),
        ],
    )
    out = logrank_two_sample(
        df, F.col("arm") == "6mp", "dur", "d", "c"
    ).collect()[0]
    o1, e1, v = _logrank_reference(
        SIX_MP_EVENTS, SIX_MP_CENSORED, PLACEBO_EVENTS, []
    )
    assert (out["n1"], out["n2"], out["o1"]) == (21, 21, o1)
    assert out["e1"] == pytest.approx(float(e1), rel=1e-12)
    assert out["var_s"] == pytest.approx(float(v), rel=1e-12)
    # the published chi-square statistic for this trial is ~16.79
    assert out["z"] ** 2 == pytest.approx(16.79, abs=0.02)
    assert out["z"] < 0  # 6-MP has FEWER events than expected


def test_km_no_censoring_is_empirical_survival(spark):
    # without censoring KM must equal 1 - ECDF at each probe
    events = [1, 2, 2, 3, 5, 5, 5, 9]
    df = _durs_df(spark, [("a", events, [])])
    out = km_survival_at(df, ["arm"], "dur", "d", "c", (2, 5, 9))
    got = {r["t"]: r["survival"] for r in out.collect()}
    n = len(events)
    for t in (2, 5, 9):
        frac = sum(1 for e in events if e > t) / n
        assert got[t] == pytest.approx(frac, rel=1e-12)


def test_aalen_johansen_matches_fraction_reference(spark):
    # competing risks: cause events, other events, censored — exact
    # fraction walk of CIF(t) = sum S(v-) * d1(v)/r(v)
    cause = [2, 2, 5, 8]
    other = [1, 3, 5, 5, 9]
    cens = [4, 7, 10, 10]
    rows = (
        [("g", t, 1, 0, 0) for t in cause]
        + [("g", t, 0, 1, 0) for t in other]
        + [("g", t, 0, 0, 1) for t in cens]
    )
    df = spark.createDataFrame(
        rows, "g string, dur long, d1 long, d2 long, c long"
    )
    from options_data_pipeline_spark.operators.survival import (
        aalen_johansen_at,
    )

    probes = (1, 2, 5, 8, 10)
    out = aalen_johansen_at(
        df, ["g"], "dur", "d1", "c", "d2", probes
    )
    got = {r["t"]: r for r in out.collect()}

    def ref(t):
        times = sorted(set(cause) | set(other))
        s = Fraction(1)
        cif = Fraction(0)
        for v in times:
            if v > t:
                break
            d1 = cause.count(v)
            d = d1 + other.count(v)
            r = (
                sum(1 for e in cause if e >= v)
                + sum(1 for e in other if e >= v)
                + sum(1 for e in cens if e >= v)
            )
            cif += s * Fraction(d1, r)
            s *= 1 - Fraction(d, r)
        return s, cif

    for t in probes:
        s, cif = ref(t)
        assert got[t]["surv"] == pytest.approx(float(s), rel=1e-12), t
        assert got[t]["cif"] == pytest.approx(float(cif), rel=1e-12), t
        assert (got[t]["n"], got[t]["n_cause"], got[t]["n_other"],
                got[t]["n_censored"]) == (13, 4, 5, 4)
    # invariant: CIF_cause + CIF_other + S = 1 wherever no censoring
    # precedes — at t=2 (no censor before 2): spot-check CIF <= 1 - S
    assert got[10]["cif"] <= 1 - got[10]["surv"] + 1e-12


def test_stratified_logrank_combines_strata(spark):
    # two strata, each the SAME small two-arm dataset: the combined
    # O/E/V must be exactly twice the single-stratum values, and the
    # single-stratum values must match the fraction reference
    a_ev, a_cn = [3, 5, 7], [6]
    b_ev, b_cn = [1, 2, 4], [8]
    rows = []
    for stratum in ("s1", "s2"):
        rows += [(stratum, "A", t, 1, 0) for t in a_ev]
        rows += [(stratum, "A", t, 0, 1) for t in a_cn]
        rows += [(stratum, "B", t, 1, 0) for t in b_ev]
        rows += [(stratum, "B", t, 0, 1) for t in b_cn]
    df = spark.createDataFrame(
        rows, "st string, arm string, dur long, d long, c long"
    )
    from options_data_pipeline_spark.operators.survival import (
        combine_logrank_strata,
        logrank_two_sample,
    )

    per = logrank_two_sample(
        df, F.col("arm") == "A", "dur", "d", "c", strata=["st"]
    )
    rows_per = {r["st"]: r for r in per.collect()}
    o1, e1, v = _logrank_reference(a_ev, a_cn, b_ev, b_cn)
    for st in ("s1", "s2"):
        r = rows_per[st]
        assert (r["n1"], r["n2"], r["o1"]) == (4, 4, o1)
        assert r["e1"] == pytest.approx(float(e1), rel=1e-12)
        assert r["var_s"] == pytest.approx(float(v), rel=1e-12)
    comb = combine_logrank_strata(per, "st").collect()[0]
    assert (comb["n_strata"], comb["n1"], comb["n2"], comb["o1"]) == (
        2, 8, 8, 2 * o1,
    )
    assert comb["e1"] == pytest.approx(2 * float(e1), rel=1e-12)
    assert comb["var_s"] == pytest.approx(2 * float(v), rel=1e-12)
