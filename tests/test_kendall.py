"""Unit pins for the distributed exact Kendall S operator
(operators/kendall.py): equality with an independent O(n²) reference
on adversarial tie/skew shapes, bucket-count invariance (B is a
parallelism knob, never a correctness knob), and degenerate groups."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.kendall import (
    kendall_s_frame,
    kendall_s_reference,
)


def _run(spark, rows, groups, n_xbuckets=8):
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = kendall_s_frame(df, groups, "x", "y", n_xbuckets=n_xbuckets)
    return {
        tuple(r[g] for g in groups): (
            r["n"], r["s"], r["tx_pairs"], r["ty_pairs"], r["ty_var"]
        )
        for r in out.collect()
    }


def _expected(rows):
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    return {(g,): kendall_s_reference(v) for g, v in by_g.items()}


def test_matches_reference_on_adversarial_shapes(spark):
    rng = random.Random(42)
    rows = []
    # group a: heavy x ties (5 distinct x), mostly distinct y
    rows += [("a", rng.randrange(5), rng.randrange(-1000, 1000))
             for _ in range(200)]
    # group b: distinct x (a time series), heavy y ties
    rows += [("b", i, rng.randrange(4)) for i in range(150)]
    # group c: negatives, duplicated (x, y) cells, narrow domain
    rows += [("c", rng.randrange(-3, 3), rng.randrange(-2, 2))
             for _ in range(120)]
    # group d: perfectly concordant
    rows += [("d", i, 10 * i) for i in range(40)]
    # group e: perfectly discordant
    rows += [("e", i, -i) for i in range(40)]
    assert _run(spark, rows, ["g"]) == _expected(rows)


def test_bucket_count_invariance(spark):
    rng = random.Random(7)
    rows = [("a", rng.randrange(100), rng.randrange(50))
            for _ in range(300)]
    outs = [_run(spark, rows, ["g"], n_xbuckets=b) for b in (1, 4, 32)]
    assert outs[0] == outs[1] == outs[2] == _expected(rows)


def test_cross_strategy_invariance(spark):
    # r15: the fold and probe cross-term strategies are two physical
    # shapes of ONE integer algebra — identical output on a tie-heavy
    # mix, grouped and ungrouped, across bucket counts
    rng = random.Random(11)
    rows = [("a", rng.randrange(6), rng.randrange(-40, 40))
            for _ in range(250)]
    rows += [("b", i, rng.randrange(3)) for i in range(120)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    for b in (2, 8, 32):
        for groups in (["g"], []):
            from options_data_pipeline_spark.operators.kendall import (
                kendall_s_frame as ksf,
            )
            fold = ksf(df, groups, "x", "y", n_xbuckets=b, cross="fold")
            probe = ksf(df, groups, "x", "y", n_xbuckets=b, cross="probe")
            key = lambda r: tuple(r[g] for g in groups)  # noqa: E731
            got_f = {key(r): (r["n"], r["s"], r["tx_pairs"], r["ty_pairs"],
                              r["ty_var"]) for r in fold.collect()}
            got_p = {key(r): (r["n"], r["s"], r["tx_pairs"], r["ty_pairs"],
                              r["ty_var"]) for r in probe.collect()}
            assert got_f == got_p
            if groups:  # and both match the O(n²) reference
                assert got_f == _expected(rows)


def test_degenerate_groups(spark):
    rows = [
        ("one", 5, 7),                       # single row: no pairs
        ("xtie", 3, 1), ("xtie", 3, 2), ("xtie", 3, 3),  # all x tied
        ("ytie", 1, 9), ("ytie", 2, 9), ("ytie", 3, 9),  # all y tied
        ("both", 4, 4), ("both", 4, 4),      # identical rows
    ]
    got = _run(spark, rows, ["g"])
    assert got[("one",)] == (1, 0, 0, 0, 0)
    assert got[("xtie",)] == (3, 0, 3, 0, 0)
    assert got[("ytie",)] == (3, 0, 0, 3, 66)
    assert got[("both",)] == (2, 0, 1, 1, 18)


def test_null_rows_dropped_pairwise(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None), ("a", None, 30), ("a", 4, 40)],
        "g string, x long, y long",
    )
    out = kendall_s_frame(df, ["g"], "x", "y").collect()[0]
    assert (out["n"], out["s"]) == (2, 1)


def test_ungrouped_form(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(10), rng.randrange(-5, 5)) for _ in range(80)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = kendall_s_frame(df, [], "x", "y", n_xbuckets=4).collect()
    assert len(out) == 1
    exp = kendall_s_reference(rows)
    r = out[0]
    assert (r["n"], r["s"], r["tx_pairs"], r["ty_pairs"], r["ty_var"]) == exp


def test_ungrouped_single_distinct_x(spark):
    # ADVICE r14: the ungrouped reassembly uses a condition-true LEFT
    # join precisely so a legitimately-EMPTY s_within (every x tied →
    # the single-x short-circuit empties the kernel input) cannot
    # annihilate the one output row — pin that path: one row, s = 0,
    # n and tie terms intact.
    df = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], "x long, y long"
    )
    out = kendall_s_frame(df, [], "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["s"], r["tx_pairs"], r["ty_pairs"], r["ty_var"]) == (
        3, 0, 3, 0, 0,
    )


def test_null_group_keys_dropped_not_half_joined(spark):
    # a null group key must be DROPPED (documented contract), never
    # emitted as a half-joined row with null tie/within columns — the
    # internal reassembly joins are column-list (null-unsafe) joins
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), (None, 3, 30), (None, 4, 40)],
        "g string, x long, y long",
    )
    out = kendall_s_frame(df, ["g"], "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert r["g"] == "a"
    assert (r["n"], r["s"], r["tx_pairs"], r["ty_pairs"]) == (2, 1, 0, 0)
