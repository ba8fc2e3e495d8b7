"""Property-based fidelity test: session_ohlc vs an independent Python
model of the reference's aggregate_ohlc semantics
(/root/reference/src/pipeline/aggregators/base.py:87-153).

The model below is written straight from the SURVEY.md §2.5 A1 semantics
(sort by time; first/last open/close; strict >/< argmax keeps the first
extremum; chmax tie -> chlow; firstextremumtype ladder), NOT from the
Spark implementation — so agreement under randomized inputs is evidence
the struct-ordered min_by/max_by encoding reproduces the row-at-a-time
loop exactly.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from options_data_pipeline_spark.operators.session_ohlc import session_ohlc


def model_aggregate(rows):
    """Reference semantics, row-at-a-time (prices already floats)."""
    rows = sorted(rows, key=lambda r: r[0])
    opens = [r[1] for r in rows]
    highs = [r[2] for r in rows]
    lows = [r[3] for r in rows]
    closes = [r[4] for r in rows]
    o, c = opens[0], closes[-1]
    hi, hi_i = highs[0], 0
    lo, lo_i = lows[0], 0
    for i, h in enumerate(highs):
        if h > hi:   # strict: first occurrence wins
            hi, hi_i = h, i
    for i, l in enumerate(lows):
        if l < lo:
            lo, lo_i = l, i

    def pct(target):
        if o == 0:
            return 0.0
        raw = (target - o) / o * 100.0
        if abs(raw) >= 1e9:  # engine passthrough guard (rounding.py)
            return raw
        scaled = abs(raw) * 10000.0
        import math

        return math.floor(scaled + 0.5) / 10000.0 * (-1.0 if raw < 0 else 1.0)

    chhigh, chlow, chclose = pct(hi), pct(lo), pct(c)
    chmax = chhigh if abs(chhigh) > abs(chlow) else chlow
    if hi_i < lo_i:
        fet = "HIGH"
    elif lo_i < hi_i:
        fet = "LOW"
    else:
        fet = "HIGH" if abs(chhigh) >= abs(chlow) else "LOW"
    return {
        "open": o, "close": c, "high": hi, "low": lo,
        "chhightime": hi_i, "chlowtime": lo_i,
        "chhigh": chhigh, "chlow": chlow, "chclose": chclose,
        "chmax": chmax, "firstextremumtype": fet,
    }


price = st.floats(min_value=0.0, max_value=1000.0, allow_nan=False, width=32)


@st.composite
def candle_rows(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        o = draw(price)
        cl = draw(price)
        h = max(o, cl) + draw(st.floats(0, 50, allow_nan=False, width=32))
        lo = min(o, cl) - draw(st.floats(0, 50, allow_nan=False, width=32))
        # distinct in-session hours keep ordering unambiguous
        rows.append((datetime.datetime(2024, 1, 10, 8 + i, 0), o, h, lo, cl))
    return rows


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=candle_rows())
def test_session_ohlc_matches_reference_model(spark, rows):
    df = spark.createDataFrame(
        [("X", *r) for r in rows],
        "instrument string, datetime timestamp, open double, high double,"
        " low double, close double",
    )
    out = session_ohlc(
        df,
        session_start=F.lit("2024-01-10 08:00:00").cast("timestamp"),
        keys=("instrument",),
        time_col="datetime",
    ).collect()[0]
    want = model_aggregate(rows)
    for k, v in want.items():
        got = out[k]
        if isinstance(v, float):
            assert abs(got - v) < 1e-9, (k, got, v)
        else:
            assert got == v, (k, got, v)
