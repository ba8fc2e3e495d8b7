"""Distributed survival analysis: Kaplan-Meier and the log-rank test.

Right-censored duration data is the one place a naive histogram is
actively WRONG (open waits are exactly the long ones, so dropping them
biases survival down); the standard estimators need per-event-time
risk sets, which single-node libraries (lifelines, R ``survival``)
build with an O(n) sequential sweep.  Engine-side both reduce to the
repo's value-level prefix algebra:

- **risk sets** are exclusive cumulative weights: at-risk just before
  time v = total − cum_excl(events + censored), per distinct duration
  — ONE :func:`.prefixsum.grouped_value_prefix_multi` pass with
  (event, censored) weight columns, fully parallel (censoring AT v
  keeps the subject at risk at v, the standard convention);
- **the KM product** Π (1 − d/r) and the log-rank moment sums
  Σ d·r₁/r, Σ d·r₁·r₂(r−d)/(r²(r−1)) are folded SEQUENTIALLY over the
  compact sorted event-time array (FP products/sums are not
  associative; the pinned left-fold order makes the doubles
  bit-identical cross-engine — the ``ewma_close`` pattern).  The
  array is bounded by the distinct-duration domain, not by data.

The unit suite pins both estimators against the textbook 6-MP arm of
Freireich et al. (the example every survival text and lifelines'
docs verify against) with EXACT-FRACTION expected values — oracle
parity alone cannot catch a shared risk-set-convention error, a
fraction-exact external fixture can.

Integer durations and weights throughout; doubles appear only in the
per-element factors/terms (single IEEE divisions) and the folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def km_risk_sets(
    durs: DataFrame,
    groups: list[str],
    dur_col: str,
    event_col: str,
    censor_col: str,
) -> DataFrame:
    """Per (group, distinct duration): event count ``d``, at-risk
    count ``r`` (just before the duration), group totals ``n`` /
    ``n_events`` / ``n_censored`` — one two-weight prefix pass."""
    from .prefixsum import grouped_value_prefix_multi

    pre = grouped_value_prefix_multi(
        durs,
        groups,
        value_col=dur_col,
        weights={"d": F.col(event_col), "c": F.col(censor_col)},
    )
    at_risk = (F.col("tw_d") + F.col("tw_c")) - (
        (F.col("cum_d") - F.col("vw_d"))
        + (F.col("cum_c") - F.col("vw_c"))
    )
    return pre.select(
        *groups,
        F.col("value").alias("v"),
        F.col("vw_d").alias("d"),
        at_risk.alias("r"),
        (F.col("tw_d") + F.col("tw_c")).cast("long").alias("n"),
        F.col("tw_d").cast("long").alias("n_events"),
        F.col("tw_c").cast("long").alias("n_censored"),
    )


def km_survival_at(
    durs: DataFrame,
    groups: list[str],
    dur_col: str,
    event_col: str,
    censor_col: str,
    probes: tuple[int, ...],
) -> DataFrame:
    """Kaplan-Meier survival read at pinned probe horizons: one row
    per (group, probe t) with ``n, n_events, n_censored, survival``
    (unrounded double — callers round for the hash contract).  The
    event-time array per group is the compact distinct-duration frame;
    the fold order (duration ascending, seed 1.0, acc·(1 − d/r)) is
    the cross-engine contract."""
    rs = km_risk_sets(durs, groups, dur_col, event_col, censor_col)
    arrs = rs.groupBy(*groups).agg(
        F.max("n").alias("n"),
        F.max("n_events").alias("n_events"),
        F.max("n_censored").alias("n_censored"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("d") > 0,
                    F.struct(
                        F.col("v").alias("v"),
                        F.col("d").alias("d"),
                        F.col("r").alias("r"),
                    ),
                )
            )
        ).alias("evs"),
    )
    probed = arrs.select(
        *groups,
        "n",
        "n_events",
        "n_censored",
        F.explode(
            F.array(*[F.lit(int(t)).cast("long") for t in probes])
        ).alias("t"),
        "evs",
    )
    surv = F.aggregate(
        F.filter("evs", lambda s: s["v"] <= F.col("t")),
        F.lit(1.0),
        lambda acc, s: acc
        * (
            F.lit(1.0)
            - s["d"].cast("double") / s["r"].cast("double")
        ),
    )
    return probed.select(
        *groups,
        "t",
        "n",
        "n_events",
        "n_censored",
        surv.alias("survival"),
    )


def logrank_two_sample(
    durs: DataFrame,
    is_a: Column,
    dur_col: str,
    event_col: str,
    censor_col: str,
    strata: list[str] | None = None,
) -> DataFrame:
    """Two-sample log-rank test: one row per stratum (one total when
    ``strata`` is empty/None) with ``n1, n2, o1`` (exact longs),
    ``e1, var_s, z`` (unrounded doubles; ``z`` null when the variance
    is 0).  ``is_a`` marks sample A's rows; the risk sets come off one
    4-weight prefix pass and the rational moment sums are order-pinned
    left folds over the sorted event-time array.  For the STRATIFIED
    test, combine the per-stratum rows with
    :func:`combine_logrank_strata` — risk sets never mix across
    strata, only the O/E/V moments add."""
    from .prefixsum import grouped_value_prefix_multi

    strata = list(strata or [])
    zero = F.lit(0)
    pre = grouped_value_prefix_multi(
        durs,
        strata,
        value_col=dur_col,
        weights={
            "d1": F.when(is_a, F.col(event_col)).otherwise(zero),
            "c1": F.when(is_a, F.col(censor_col)).otherwise(zero),
            "d2": F.when(~is_a, F.col(event_col)).otherwise(zero),
            "c2": F.when(~is_a, F.col(censor_col)).otherwise(zero),
        },
    )
    r1 = (F.col("tw_d1") + F.col("tw_c1")) - (
        (F.col("cum_d1") - F.col("vw_d1"))
        + (F.col("cum_c1") - F.col("vw_c1"))
    )
    r2 = (F.col("tw_d2") + F.col("tw_c2")) - (
        (F.col("cum_d2") - F.col("vw_d2"))
        + (F.col("cum_c2") - F.col("vw_c2"))
    )
    d = F.col("vw_d1") + F.col("vw_d2")
    r = r1 + r2
    dd = d.cast("double")
    rr1, rr2, rrd = r1.cast("double"), r2.cast("double"), r.cast("double")
    te = dd * rr1 / rrd
    tv = F.when(
        r > 1,
        (dd * rr1 * rr2 * (r - d).cast("double"))
        / (rrd * rrd * (r - 1).cast("double")),
    ).otherwise(F.lit(0.0))
    cells = pre.select(
        *strata,
        F.col("value").alias("v"),
        "vw_d1",
        d.alias("__dtot"),
        te.alias("__te"),
        tv.alias("__tv"),
        (F.col("tw_d1") + F.col("tw_c1")).alias("__n1"),
        (F.col("tw_d2") + F.col("tw_c2")).alias("__n2"),
    )
    arr = cells.groupBy(*strata).agg(
        F.max("__n1").cast("long").alias("n1"),
        F.max("__n2").cast("long").alias("n2"),
        F.sum("vw_d1").cast("long").alias("o1"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__dtot") > 0,
                    F.struct(
                        F.col("v").alias("v"),
                        F.col("__te").alias("te"),
                        F.col("__tv").alias("tv"),
                    ),
                )
            )
        ).alias("evs"),
    )
    e1 = F.aggregate("evs", F.lit(0.0), lambda acc, s: acc + s["te"])
    vv = F.aggregate("evs", F.lit(0.0), lambda acc, s: acc + s["tv"])
    folded = arr.select(
        *strata, "n1", "n2", "o1", e1.alias("e1"), vv.alias("var_s")
    )
    z = F.when(
        F.col("var_s") > 0,
        (F.col("o1").cast("double") - F.col("e1"))
        / F.sqrt(F.col("var_s")),
    )
    return folded.select(
        *strata, "n1", "n2", "o1", "e1", "var_s", z.alias("z")
    )


def combine_logrank_strata(
    per_stratum: DataFrame, stratum_col: str
) -> DataFrame:
    """The stratified log-rank statistic from per-stratum rows:
    O = Σ o1 (exact), E = Σ e1 and V = Σ var_s folded in STRATUM-KEY
    ORDER (double sums are order-dependent; the sorted fold is the
    cross-engine contract), z = (O − E)/√V.  One row out."""
    arr = per_stratum.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("n1").cast("long").alias("n1"),
        F.sum("n2").cast("long").alias("n2"),
        F.sum("o1").cast("long").alias("o1"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(stratum_col).alias("k"),
                    F.col("e1").alias("e1"),
                    F.col("var_s").alias("vv"),
                )
            )
        ).alias("ks"),
    )
    e1 = F.aggregate("ks", F.lit(0.0), lambda acc, s: acc + s["e1"])
    vv = F.aggregate("ks", F.lit(0.0), lambda acc, s: acc + s["vv"])
    folded = arr.select(
        "n_strata", "n1", "n2", "o1",
        e1.alias("e1"), vv.alias("var_s"),
    )
    z = F.when(
        F.col("var_s") > 0,
        (F.col("o1").cast("double") - F.col("e1"))
        / F.sqrt(F.col("var_s")),
    )
    return folded.select(
        "n_strata", "n1", "n2", "o1", "e1", "var_s", z.alias("z")
    )


def aalen_johansen_at(
    durs: DataFrame,
    groups: list[str],
    dur_col: str,
    cause_col: str,
    censor_col: str,
    other_col: str,
    probes: tuple[int, ...],
) -> DataFrame:
    """Aalen-Johansen cumulative incidence of the CAUSE event under
    competing risks: CIF(t) = Σ_{v≤t} S(v−)·d_cause(v)/r(v), where S
    is the ALL-CAUSE Kaplan-Meier — the estimator that answers "what
    fraction has had the cause event by t" when other events compete
    (1 − KM of the cause alone overstates it; the classic competing-
    risks fallacy).  ``cause_col``/``other_col``/``censor_col`` are
    0/1 row weights.

    Same algebra as KM — risk sets off one 3-weight prefix pass — plus
    a STRUCT-accumulator fold carrying (s, cif) through the sorted
    event-time array: cif' = cif + s·(d_cause/r) BEFORE s' = s·(1 −
    d/r), per-element fractions precomputed as single divisions.  One
    row per (group, probe): ``n, n_cause, n_other, n_censored,
    surv (all-cause), cif`` (unrounded doubles)."""
    from .prefixsum import grouped_value_prefix_multi

    pre = grouped_value_prefix_multi(
        durs,
        groups,
        value_col=dur_col,
        weights={
            "d1": F.col(cause_col),
            "d2": F.col(other_col),
            "c": F.col(censor_col),
        },
    )
    tot = F.col("tw_d1") + F.col("tw_d2") + F.col("tw_c")
    cum_excl = (
        (F.col("cum_d1") - F.col("vw_d1"))
        + (F.col("cum_d2") - F.col("vw_d2"))
        + (F.col("cum_c") - F.col("vw_c"))
    )
    r = tot - cum_excl
    d = F.col("vw_d1") + F.col("vw_d2")
    fd = F.col("vw_d1").cast("double") / r.cast("double")
    fs = F.lit(1.0) - d.cast("double") / r.cast("double")
    cells = pre.select(
        *groups,
        F.col("value").alias("v"),
        d.alias("__dtot"),
        fd.alias("__fd"),
        fs.alias("__fs"),
        F.col("tw_d1").alias("__nd1"),
        F.col("tw_d2").alias("__nd2"),
        F.col("tw_c").alias("__nc"),
    )
    arrs = cells.groupBy(*groups).agg(
        (
            F.max("__nd1") + F.max("__nd2") + F.max("__nc")
        ).cast("long").alias("n"),
        F.max("__nd1").cast("long").alias("n_cause"),
        F.max("__nd2").cast("long").alias("n_other"),
        F.max("__nc").cast("long").alias("n_censored"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__dtot") > 0,
                    F.struct(
                        F.col("v").alias("v"),
                        F.col("__fd").alias("fd"),
                        F.col("__fs").alias("fs"),
                    ),
                )
            )
        ).alias("evs"),
    )
    probed = arrs.select(
        *groups,
        "n",
        "n_cause",
        "n_other",
        "n_censored",
        F.explode(
            F.array(*[F.lit(int(t)).cast("long") for t in probes])
        ).alias("t"),
        "evs",
    )
    state = F.aggregate(
        F.filter("evs", lambda s: s["v"] <= F.col("t")),
        F.struct(
            F.lit(1.0).alias("s"), F.lit(0.0).alias("cif")
        ),
        lambda acc, x: F.struct(
            (acc["s"] * x["fs"]).alias("s"),
            (acc["cif"] + acc["s"] * x["fd"]).alias("cif"),
        ),
    )
    return probed.select(
        *groups,
        "t",
        "n",
        "n_cause",
        "n_other",
        "n_censored",
        state["s"].alias("surv"),
        state["cif"].alias("cif"),
    )
