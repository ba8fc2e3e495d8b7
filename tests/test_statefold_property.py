"""Property-based invariants of the clamped fold: for random deltas,
bounds, and key layouts, the grouped-map fold, the distributed
composition scan, and a plain-Python reference walk must agree exactly.
One Spark round per example is slow, so the strategy packs several keys
into a single example and caps example counts."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from options_data_pipeline_spark.operators.statefold import (
    _compose,
    clamped_running_sum,
    clamped_running_sum_scan,
)


def _reference(rows, lo, hi):
    """Plain-Python walk: the executable spec."""
    out = {}
    state: dict[str, int] = {}
    for k, seq, d in sorted(rows):
        bal = state.get(k, 0) + d
        bal = min(hi, max(lo, bal))
        state[k] = bal
        out[(k, seq)] = float(bal)
    return out


@st.composite
def fold_case(draw):
    n_keys = draw(st.integers(1, 4))
    lo = draw(st.integers(-50, 0))
    hi = draw(st.integers(1, 120))
    rows = []
    for ki in range(n_keys):
        n = draw(st.integers(1, 30))
        deltas = draw(
            st.lists(st.integers(-200, 200), min_size=n, max_size=n)
        )
        rows += [(f"k{ki}", i, d) for i, d in enumerate(deltas)]
    return rows, lo, hi


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(fold_case())
def test_fold_and_scan_match_reference(spark, case):
    rows, lo, hi = case
    df = spark.createDataFrame(rows, "k string, seq int, delta long")
    kw = dict(keys=["k"], order=["seq"], delta_col="delta",
              lo=lo, hi=hi, divisor=1.0, out_col="bal")
    expect = _reference(rows, lo, hi)
    fold = {(r.k, r.seq): r.bal for r in clamped_running_sum(df, **kw).collect()}
    assert fold == expect
    scan = {
        (r.k, r.seq): r.bal
        for r in clamped_running_sum_scan(df, num_partitions=3, **kw).collect()
    }
    assert scan == expect
    spark.catalog.clearCache()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-30, 0), st.integers(0, 60), st.integers(-100, 100)
        ).map(lambda t: (float(min(t[0], t[1])), float(max(t[0], t[1])), t[2])),
        min_size=2,
        max_size=6,
    ),
    st.integers(-80, 80),
)
def test_compose_chain_associativity(gs, x0):
    """Folding the whole chain through _compose equals applying the maps
    one-by-one, for any association order (left fold vs right fold)."""
    def apply(g, x):
        lo, hi, d = g
        return min(hi, max(lo, x + d))

    direct = float(x0)
    for g in gs:
        direct = apply(g, direct)

    left = gs[0]
    for g in gs[1:]:
        left = _compose(left, g)

    right = gs[-1]
    for g in reversed(gs[:-1]):
        right = _compose(g, right)

    assert apply(left, float(x0)) == direct
    assert apply(right, float(x0)) == direct


# --- greedy sequence packing shares the fold contract ------------------------


def _pack_reference(rows, budget):
    """Plain-Python walk of the reset-on-overflow packing recurrence."""
    out = {}
    state: dict[str, tuple[int, int]] = {}
    for k, seq, t in sorted(rows):
        pack, filled = state.get(k, (0, 0))
        if filled > 0 and filled + t > budget:
            pack += 1
            filled = 0
        out[(k, seq)] = (pack, filled)
        state[k] = (pack, filled + t)
    return out


@st.composite
def pack_case(draw):
    n_keys = draw(st.integers(1, 4))
    budget = draw(st.integers(1, 40))
    rows = []
    for ki in range(n_keys):
        n = draw(st.integers(1, 30))
        toks = draw(st.lists(st.integers(1, 60), min_size=n, max_size=n))
        rows += [(f"k{ki}", i, t) for i, t in enumerate(toks)]
    return rows, budget


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pack_case())
def test_greedy_pack_matches_reference(spark, case):
    from options_data_pipeline_spark.operators.packing import (
        greedy_sequence_pack,
    )

    rows, budget = case
    df = spark.createDataFrame(rows, "k string, seq int, t long")
    got = {
        (r.k, r.seq): (r.pack_id, r.pack_offset)
        for r in greedy_sequence_pack(
            df, keys=["k"], order=["seq"], token_col="t", budget=budget
        ).collect()
    }
    assert got == _pack_reference(rows, budget)
    # invariant: a pack never exceeds budget unless it is a single
    # oversized document (offset 0)
    fills: dict[tuple, int] = {}
    toks = {(k, s): t for k, s, t in rows}
    for (k, s), (p, off) in got.items():
        fills[(k, p)] = max(fills.get((k, p), 0), off + toks[(k, s)])
    for (k, p), total in fills.items():
        members = [s for (kk, s), (pp, _) in got.items() if kk == k and pp == p]
        assert total <= budget or len(members) == 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pack_case())
def test_greedy_pack_scan_matches_grouped_fold(spark, case):
    """The two-phase boundary-segment scan must be bit-equal to the
    grouped fold under partition counts that force keys to span
    partitions (including every key in one partition and one key
    spread over all of them)."""
    from options_data_pipeline_spark.operators.packing import (
        greedy_sequence_pack,
        greedy_sequence_pack_scan,
    )

    rows, budget = case
    df = spark.createDataFrame(rows, "k string, seq int, t long")
    kw = dict(keys=["k"], order=["seq"], token_col="t", budget=budget)
    expect = {
        (r.k, r.seq): (r.pack_id, r.pack_offset)
        for r in greedy_sequence_pack(df, **kw).collect()
    }
    for nparts in (1, 5):
        got = {
            (r.k, r.seq): (r.pack_id, r.pack_offset)
            for r in greedy_sequence_pack_scan(
                df, num_partitions=nparts, **kw
            ).collect()
        }
        assert got == expect, f"num_partitions={nparts}"


def test_greedy_pack_scan_single_key_spans_all_partitions(spark):
    """Deterministic worst case for the first-reset lemma: one key, 400
    docs, 16 partitions — every partition boundary carries entering
    state, and oversized docs land on boundaries."""
    from options_data_pipeline_spark.operators.packing import (
        greedy_sequence_pack,
        greedy_sequence_pack_scan,
    )

    toks = [((i * 7919) % 29) + 1 for i in range(400)]
    toks[24] = toks[199] = toks[398] = 300  # oversized, near boundaries
    rows = [("k", i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "k string, seq int, t long")
    kw = dict(keys=["k"], order=["seq"], token_col="t", budget=64)
    expect = {
        r.seq: (r.pack_id, r.pack_offset)
        for r in greedy_sequence_pack(df, **kw).collect()
    }
    got = {
        r.seq: (r.pack_id, r.pack_offset)
        for r in greedy_sequence_pack_scan(
            df, num_partitions=16, **kw
        ).collect()
    }
    assert got == expect
