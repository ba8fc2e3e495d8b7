"""Time-series analytics the reference's OHLC domain implies but never
ships: drawdown scans, time-weighted averages over irregular samples,
user-base accumulation, and a clamped sequential accumulator.

All four are new *shapes* for the engine:

- ``max_drawdown`` — running-peak window then per-key argmax with a
  first-wins tie ladder (the A1 tie discipline applied to a derived
  window metric).
- ``twap`` — interval-weighted aggregation where the weight itself is a
  window function (``lead`` gap to the next sample), DECIMAL-exact.
- ``cumulative_uniques`` — global first-occurrence collapse followed by
  a running total over the *compact* daily aggregate (the unbounded
  window runs over O(#days) rows, never over raw events).
- ``capped_running_sum`` — the clamped fold from
  :mod:`..operators.statefold`: sequential per-key state that no window
  frame expresses, pinned against a DuckDB recursive CTE.

Reference anchors: session OHLC chain (`/root/reference/src/pipeline/
aggregators/base.py:87-153`) for the tie ladders; the incremental
resume loop (`collectors/binance.py:147-156`) for per-key carried
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.statefold import (
    clamped_running_sum,
    clamped_running_sum_oracle_sql,
)
from ..sources.tables import load_table
from .sessions import HOURLY_CTE, hourly_candles

# engagement meter saturation bounds, in cents
ENGAGEMENT_LO = 0
ENGAGEMENT_HI = 50_000


# ---------------------------------------------------------------------------
# max_drawdown
# ---------------------------------------------------------------------------

def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough drawdown per instrument over hourly closes.

    Running peak is a rows-frame MAX over the per-instrument hourly
    candles (bucket_ts is unique within an instrument, so ordering is
    total); the drawdown fraction uses only IEEE-exact ops (sub, div)
    on identical doubles, so it is engine-portable without rounding.
    Ties on the max drawdown keep the EARLIEST trough (struct-ordered
    max_by, the A1 first-wins discipline). Two shuffles total: the
    candle rollup, then the per-instrument window+aggregate (same key,
    so AQE keeps them colocated).
    """
    hourly = hourly_candles(spark, sf_dir)
    w = (
        Window.partitionBy("instrument")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("close").over(w)
    dd = F.when(peak == 0, F.lit(0.0)).otherwise(
        (peak - F.col("close")) / peak
    )
    scanned = hourly.select(
        "instrument", "bucket_ts", "close",
        peak.alias("peak"), dd.alias("dd"),
    )
    # argmax with earliest-trough tie-break: order struct(dd, -epoch)
    tie = F.struct(
        F.col("dd"), (-F.unix_micros(F.col("bucket_ts"))).alias("neg_ts")
    )
    return scanned.groupBy("instrument").agg(
        F.max("dd").alias("max_drawdown"),
        F.max_by(F.col("bucket_ts"), tie).alias("trough_ts"),
        F.max_by(F.col("peak"), tie).alias("peak_price"),
        F.max_by(F.col("close"), tie).alias("trough_price"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )


def oracle_max_drawdown() -> str:
    return f"""
WITH {HOURLY_CTE},
scanned AS (
    SELECT instrument, h, close,
           max(close) OVER (PARTITION BY instrument ORDER BY h
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
    FROM hourly
),
dd AS (
    SELECT instrument, h, close, peak,
           CASE WHEN peak = 0 THEN 0.0 ELSE (peak - close) / peak END AS dd,
           count(*) OVER (PARTITION BY instrument) AS n_hours
    FROM scanned
),
ranked2 AS (
    SELECT *, row_number() OVER (PARTITION BY instrument
                                 ORDER BY dd DESC, h ASC) AS r
    FROM dd
)
SELECT instrument, dd AS max_drawdown, h AS trough_ts,
       peak AS peak_price, close AS trough_price, n_hours
FROM ranked2 WHERE r = 1
"""


# ---------------------------------------------------------------------------
# twap
# ---------------------------------------------------------------------------

def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average close per (instrument, day) over the
    irregular hourly candles: each candle's close holds until the next
    candle that day (last candle holds to midnight), the textbook TWAP
    on gappy samples. Weights are exact integer seconds from a ``lead``
    window; the weighted sum accumulates DECIMAL, so the aggregate is
    order-independent; the single final division is IEEE-exact.
    """
    hourly = hourly_candles(spark, sf_dir)
    df = hourly.withColumn("day", F.date_trunc("day", F.col("bucket_ts")))
    w = Window.partitionBy("instrument", "day").orderBy("bucket_ts")
    next_ts = F.lead("bucket_ts").over(w)
    day_end = F.col("day") + F.expr("INTERVAL 1 DAY")
    weight = (
        F.unix_timestamp(F.coalesce(next_ts, day_end))
        - F.unix_timestamp(F.col("bucket_ts"))
    ).cast("long")
    weighted = df.select(
        "instrument", "day",
        weight.alias("w_secs"),
        (F.col("close").cast("decimal(18,6)") * weight).alias("pw"),
    )
    return (
        weighted.groupBy("instrument", "day")
        .agg(
            (
                F.sum("pw").cast("double")
                / F.sum("w_secs").cast("double")
            ).alias("twap"),
            F.sum("w_secs").cast("long").alias("covered_secs"),
            F.count(F.lit(1)).cast("long").alias("n_candles"),
        )
    )


def oracle_twap() -> str:
    return f"""
WITH {HOURLY_CTE},
daily AS (
    SELECT instrument, date_trunc('day', h) AS day, h, close,
           lead(h) OVER (PARTITION BY instrument, date_trunc('day', h)
                         ORDER BY h) AS next_h
    FROM hourly
),
weighted AS (
    SELECT instrument, day,
           CAST(epoch(coalesce(next_h, day + INTERVAL 1 DAY)) - epoch(h) AS BIGINT) AS w_secs,
           CAST(close AS DECIMAL(18,6))
               * CAST(epoch(coalesce(next_h, day + INTERVAL 1 DAY)) - epoch(h) AS BIGINT) AS pw
    FROM daily
)
SELECT instrument, day,
       CAST(SUM(pw) AS DOUBLE) / CAST(SUM(w_secs) AS DOUBLE) AS twap,
       CAST(SUM(w_secs) AS BIGINT) AS covered_secs,
       CAST(count(*) AS BIGINT) AS n_candles
FROM weighted GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# cumulative_uniques
# ---------------------------------------------------------------------------

def q_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users and the running size of the user base.

    Cumulative COUNT(DISTINCT) is not window-expressible at scale; the
    scalable decomposition is (1) collapse each user to their first
    active day — one hash aggregate on the hash-uniform user key — then
    (2) count per day and run an unbounded-preceding SUM over the
    per-day aggregate, whose cardinality is O(#days): the only
    single-partition window in the plan runs on dozens of rows, never
    on the fact table.
    """
    ev = load_table(spark, sf_dir, "events")
    # day as a TIMESTAMP (date_trunc), not DATE: identical pandas dtype
    # on both engines for the comparator
    first_day = (
        ev.groupBy("user_id")
        .agg(F.min(F.date_trunc("day", F.col("ts"))).alias("day"))
    )
    daily = first_day.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


def oracle_cumulative_uniques() -> str:
    return """
WITH first_day AS (
    SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1
),
daily AS (
    SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM first_day GROUP BY 1
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumulative_users
FROM daily
"""


# ---------------------------------------------------------------------------
# capped_running_sum
# ---------------------------------------------------------------------------

def q_capped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement meter: every event adds its value, errors
    subtract it, and the meter saturates at [0, 500] after EVERY step —
    the clamped fold (see :mod:`..operators.statefold` for why no
    window frame can express this and how it still scales).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # Pre-scale to exact integer cents with the repo's portable
    # half-away rule (floor(|v|*100 + 0.5) * sign): bit-identical in
    # both engines, so the fold runs on exact BIGINTs.
    cents = F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)).cast("long")
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    src = ev.select(
        "user_id", "ts", "event_id", (cents * sign).alias("delta")
    )
    return clamped_running_sum(
        src,
        keys=["user_id"],
        order=["ts", "event_id"],
        delta_col="delta",
        lo=ENGAGEMENT_LO,
        hi=ENGAGEMENT_HI,
        divisor=100.0,
        out_col="balance",
    )


def oracle_capped_running_sum() -> str:
    src = """src AS (
    SELECT user_id, ts, event_id,
           CAST(floor(abs(value) * 100 + 0.5) AS BIGINT)
               * (CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS delta
    FROM events WHERE value IS NOT NULL
)"""
    return clamped_running_sum_oracle_sql(
        source_cte=src,
        keys="user_id",
        order_cols="ts, event_id",
        lo=ENGAGEMENT_LO,
        hi=ENGAGEMENT_HI,
        divisor=100.0,
        out_col="balance",
        select_cols="user_id, ts, event_id",
    )


# ---------------------------------------------------------------------------
# top_event_paths
# ---------------------------------------------------------------------------

PATH_PREFIX_LEN = 3   # leading events kept per session path
PATH_TOP = 20


def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common session-opening event paths: per 30-minute activity
    session, the first ``PATH_PREFIX_LEN`` event types in time order
    collapsed to a ``view>click>purchase`` path string, then counted
    across sessions — the navigation-flow report.

    The ordered collapse is ``array_sort(collect_list(struct(ts,
    event_id, event_type)))`` inside the session aggregate: struct
    ordering makes the sequence total (ties break on event_id), so the
    path string is deterministic under any partitioning — no window,
    no second shuffle; sessionization reuses ``F.session_window``
    exactly as `user_sessions` (proven equal to the gaps-and-islands
    SQL there). Two shuffles end-to-end (session agg, path count).
    """
    ev = load_table(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(
        F.slice(
            F.transform(ordered, lambda x: x["event_type"]),
            1, PATH_PREFIX_LEN,
        ),
        ">",
    )
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            path.alias("path"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        sessions.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(PATH_TOP)
    )


def oracle_top_event_paths() -> str:
    return f"""
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
        CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
),
paths AS (
    SELECT user_id, sid,
           array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id),
                          1, {PATH_PREFIX_LEN}), '>') AS path,
           count(*) AS n_events
    FROM sess GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path ASC
LIMIT {PATH_TOP}
"""


# ---------------------------------------------------------------------------
# user_value_trend — grouped OLS on sufficient statistics
# ---------------------------------------------------------------------------

TREND_MIN_N = 5
_TREND_T0 = "2024-01-01 00:00:00"  # x origin: keeps x small => BIGINT-exact x²


def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase-value trend: OLS slope of value (cents) vs
    time, computed entirely from the five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) — each an exact BIGINT partial aggregate, so
    the regression is one scan + one hash aggregate with map-side
    combine and NO per-user sort: the textbook scale-out decomposition
    of grouped regression.

    x is seconds since a fixed origin (bounds x² within BIGINT at any
    per-user history this domain produces), y is portable half-away
    cents. The final slope/intercept arithmetic converts the exact
    integers to doubles in a pinned association order, so both engines
    compute bit-identical results.
    """
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    # whole seconds via floored micros on BOTH engines (DuckDB's epoch()
    # keeps the fractional part and its BIGINT cast rounds — a 1-second
    # x disagreement on ~half the rows otherwise)
    x = (
        F.expr("unix_micros(ts) div 1000000")
        - F.unix_timestamp(F.lit(_TREND_T0).cast("timestamp"))
    ).cast("long")
    y = F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)).cast("long")
    src = ev.select("user_id", x.alias("x"), y.alias("y"))
    stats = src.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).where(F.col("n") >= TREND_MIN_N)
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    sxy_d = F.col("sxy").cast("double")
    sxx_d = F.col("sxx").cast("double")
    denom = n_d * sxx_d - sx_d * sx_d
    slope = F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        (n_d * sxy_d - sx_d * sy_d) / denom
    )
    return stats.select(
        "user_id",
        F.col("n").alias("n_purchases"),
        (slope * 86400.0 / 100.0).alias("slope_per_day"),
        ((sy_d / n_d) / 100.0).alias("mean_value"),
    )


def oracle_user_value_trend() -> str:
    return f"""
WITH src AS (
    SELECT user_id,
           (epoch_us(ts) // 1000000)
               - CAST(epoch(TIMESTAMP '{_TREND_T0}') AS BIGINT) AS x,
           CAST(floor(abs(value) * 100 + 0.5) AS BIGINT) AS y
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
stats AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM src GROUP BY 1
    HAVING count(*) >= {TREND_MIN_N}
)
SELECT user_id, n AS n_purchases,
       (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
             ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        END) * 86400.0 / 100.0 AS slope_per_day,
       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS mean_value
FROM stats
"""


# ---------------------------------------------------------------------------
# session_pattern_match — MATCH_RECOGNIZE-style sequence detection
# ---------------------------------------------------------------------------

# browse-then-buy with no intervening error: one or more view/click
# steps leading directly into a purchase, anywhere in the session
_SESSION_PATTERN = "(view|click)>((view|click)>)*purchase"


def q_session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection over sessions — the MATCH_RECOGNIZE
    workload (SQL:2016 row pattern matching, which Spark lacks natively)
    expressed as ordered collapse + regex: each 30-minute session's
    events become a total-order ``a>b>c`` string inside the session
    aggregate (the `top_event_paths` mechanism), and the pattern is an
    anchored-free regex both engines interpret identically (alternation,
    concatenation, star — the regular-language core, no engine-specific
    syntax). Output: per user, sessions matched vs total.

    Scale: the string per session is bounded by session length (30-min
    inactivity splits), the match is row-local, and the rollup is one
    partial-aggregable groupBy — no NFA state machine across rows, no
    self-join chain (the naive SQL encoding of sequence patterns).
    """
    ev = load_table(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(
        F.transform(ordered, lambda x: x["event_type"]), ">"
    )
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(path.alias("path"))
    )
    matched = F.when(
        F.col("path").rlike(_SESSION_PATTERN), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        sessions.select("user_id", matched.alias("m"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("m").cast("long").alias("matched_sessions"),
        )
        .where(F.col("matched_sessions") > 0)
    )


def oracle_session_pattern_match() -> str:
    return f"""
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
        CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
),
paths AS (
    SELECT user_id, sid,
           array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
    FROM sess GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN regexp_matches(path, '{_SESSION_PATTERN}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS matched_sessions
FROM paths GROUP BY 1
HAVING SUM(CASE WHEN regexp_matches(path, '{_SESSION_PATTERN}')
               THEN 1 ELSE 0 END) > 0
"""


# ---------------------------------------------------------------------------
# rolling_beta — sliding-frame bivariate regression, DECIMAL-exact
# ---------------------------------------------------------------------------

BETA_WINDOW = 24   # trailing samples per frame
BETA_MIN_N = 12


def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-sample regression slope (beta) of one instrument's
    hourly close against another's, over the hours where both traded.

    The determinism point of this query: sliding-frame FLOAT sums are
    engine-divergent by construction (Spark re-aggregates each frame in
    row order; DuckDB maintains a segment tree — different association
    orders, different last-ulp results). Every frame statistic here
    (Σx, Σy, Σxy, Σx²) therefore accumulates exact DECIMAL; the only
    floating arithmetic is the final pinned-order beta expression over
    exact operands. Shapes: one candle rollup, one hour-aligned
    equi-join of two skinny series, one ordered window over the
    compact joined series (O(#hours) rows).
    """
    hourly = hourly_candles(spark, sf_dir)
    x = hourly.where(F.col("instrument") == "view").select(
        F.col("bucket_ts").alias("hour_ts"),
        F.col("close").cast("decimal(18,6)").alias("x"),
    )
    y = hourly.where(F.col("instrument") == "click").select(
        F.col("bucket_ts").alias("hour_ts"),
        F.col("close").cast("decimal(18,6)").alias("y"),
    )
    j = x.join(y, "hour_ts")
    w = (
        Window.orderBy("hour_ts")
        .rowsBetween(-(BETA_WINDOW - 1), 0)
    )
    n = F.count(F.lit(1)).over(w).cast("long")
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    n_d = n.cast("double")
    denom = n_d * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    beta = F.when(
        (n < BETA_MIN_N) | (denom == 0), F.lit(None).cast("double")
    ).otherwise(
        (n_d * sxy.cast("double") - sx.cast("double") * sy.cast("double"))
        / denom
    )
    return j.select(
        "hour_ts",
        F.col("x").cast("double").alias("x_close"),
        F.col("y").cast("double").alias("y_close"),
        n.alias("n_samples"),
        beta.alias("beta"),
    )


def oracle_rolling_beta() -> str:
    return f"""
WITH {HOURLY_CTE},
x AS (
    SELECT h AS hour_ts, CAST(close AS DECIMAL(18,6)) AS x
    FROM hourly WHERE instrument = 'view'
),
y AS (
    SELECT h AS hour_ts, CAST(close AS DECIMAL(18,6)) AS y
    FROM hourly WHERE instrument = 'click'
),
j AS (SELECT x.hour_ts, x.x, y.y FROM x JOIN y USING (hour_ts)),
framed AS (
    SELECT hour_ts, x, y,
           CAST(COUNT(*) OVER w AS BIGINT) AS n,
           SUM(x) OVER w AS sx,
           SUM(y) OVER w AS sy,
           SUM(x * y) OVER w AS sxy,
           SUM(x * x) OVER w AS sxx
    FROM j
    WINDOW w AS (ORDER BY hour_ts
                 ROWS BETWEEN {BETA_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT hour_ts,
       CAST(x AS DOUBLE) AS x_close,
       CAST(y AS DOUBLE) AS y_close,
       n AS n_samples,
       CASE WHEN n < {BETA_MIN_N}
              OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
            ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       END AS beta
FROM framed
"""


# ---------------------------------------------------------------------------
# user_burstiness — inter-arrival-time analytics
# ---------------------------------------------------------------------------

BURST_MIN_GAPS = 5


def q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness of event inter-arrival times — the
    Goh–Barabási measure B = (cv - 1)/(cv + 1) on the coefficient of
    variation of gaps (B → -1 periodic, 0 Poisson, → 1 bursty). The
    behavioral-rhythm profile (bot detection, engagement typing) that
    complements `gap_scan`'s completeness view of the same lag shape.

    Gaps are exact whole-second BIGINTs from a lag window (floored
    micros, the `user_value_trend` rule); Σg and Σg² are exact integer
    aggregates, so cv = sqrt(n·Σg² - (Σg)²) / Σg touches floats only in
    the final pinned-order expression (sqrt is correctly rounded —
    portable). One window + one hash aggregate, both on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.expr("unix_micros(ts) div 1000000")
    gap = (secs - F.lag(secs).over(w)).cast("long")
    gaps = ev.select(
        "user_id", gap.alias("g")
    ).where(F.col("g").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    ).where((F.col("n_gaps") >= BURST_MIN_GAPS) & (F.col("sg") > 0))
    n_d = F.col("n_gaps").cast("double")
    sg_d = F.col("sg").cast("double")
    sgg_d = F.col("sgg").cast("double")
    cv = F.sqrt(n_d * sgg_d - sg_d * sg_d) / sg_d
    return stats.select(
        "user_id", "n_gaps",
        (sg_d / n_d).alias("mean_gap_secs"),
        cv.alias("cv"),
        ((cv - F.lit(1.0)) / (cv + F.lit(1.0))).alias("burstiness"),
    )


def oracle_user_burstiness() -> str:
    return f"""
WITH gaps AS (
    SELECT user_id,
           (epoch_us(ts) // 1000000)
               - lag(epoch_us(ts) // 1000000)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
    FROM events
),
stats AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(SUM(g) AS BIGINT) AS sg,
           CAST(SUM(g * g) AS BIGINT) AS sgg
    FROM gaps WHERE g IS NOT NULL
    GROUP BY 1
    HAVING count(*) >= {BURST_MIN_GAPS} AND SUM(g) > 0
)
SELECT user_id, n_gaps,
       CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_secs,
       sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
            - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
           / CAST(sg AS DOUBLE) AS cv,
       (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
             - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
            / CAST(sg AS DOUBLE) - 1.0)
       / (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
               - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
              / CAST(sg AS DOUBLE) + 1.0) AS burstiness
FROM stats
"""


# ---------------------------------------------------------------------------
# retention_curve — day-N cohort retention
# ---------------------------------------------------------------------------

RETENTION_DAYS = (1, 3, 7)


def q_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention per signup-day cohort: of the users first seen on
    day D, how many came back exactly N days later (N = 1, 3, 7) — the
    growth dashboard's retention triangle, flattened.

    Decomposition: first-occurrence collapse (one hash aggregate on the
    user key), a distinct (user, day) activity table, one join back on
    the user key, then per-user boolean offsets collapse into the
    cohort aggregate. Day offsets are exact integer divisions of
    midnight-truncated micros — no date arithmetic ambiguity — and
    every rate is one double division of exact counts.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    act = ev.select("user_id", day.alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    off = F.expr(
        "(unix_micros(day) - unix_micros(d0)) div 86400000000"
    ).alias("off")
    j = act.join(first, "user_id").select("user_id", "d0", off)
    per_user = j.groupBy("user_id", "d0").agg(
        *[
            F.max(F.when(F.col("off") == k, 1).otherwise(0)).alias(f"r{k}")
            for k in RETENTION_DAYS
        ]
    )
    agg = per_user.groupBy("d0").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[F.sum(f"r{k}").cast("long").alias(f"retained_d{k}") for k in RETENTION_DAYS],
    )
    return agg.select(
        F.col("d0").alias("cohort_day"),
        "n_users",
        *[F.col(f"retained_d{k}") for k in RETENTION_DAYS],
        *[
            (
                F.col(f"retained_d{k}").cast("double")
                / F.col("n_users").cast("double")
            ).alias(f"rate_d{k}")
            for k in RETENTION_DAYS
        ],
    )


def oracle_retention_curve() -> str:
    rs = ",\n           ".join(
        f"MAX(CASE WHEN off = {k} THEN 1 ELSE 0 END) AS r{k}"
        for k in RETENTION_DAYS
    )
    sums = ",\n       ".join(
        f"CAST(SUM(r{k}) AS BIGINT) AS retained_d{k}" for k in RETENTION_DAYS
    )
    rates = ",\n       ".join(
        f"CAST(SUM(r{k}) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate_d{k}"
        for k in RETENTION_DAYS
    )
    return f"""
WITH act AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
first AS (
    SELECT user_id, min(day) AS d0 FROM act GROUP BY 1
),
j AS (
    SELECT a.user_id, f.d0,
           (epoch_us(a.day) - epoch_us(f.d0)) // 86400000000 AS off
    FROM act a JOIN first f ON a.user_id = f.user_id
),
per_user AS (
    SELECT user_id, d0,
           {rs}
    FROM j GROUP BY 1, 2
)
SELECT d0 AS cohort_day,
       CAST(count(*) AS BIGINT) AS n_users,
       {sums},
       {rates}
FROM per_user GROUP BY 1
"""


def q_capped_running_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME engagement-meter semantics as `capped_running_sum`,
    executed by the DISTRIBUTED two-phase composition scan
    (:func:`..operators.statefold.clamped_running_sum_scan`) instead of
    the single-pass fold — registered separately so the scan path gets
    its own driver correctness row against the identical recursive-CTE
    oracle. Any divergence between the capped-affine composition
    algebra and the direct fold shows up here as a hash mismatch.
    """
    from ..operators.statefold import clamped_running_sum_scan

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)).cast("long")
    sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    src = ev.select(
        "user_id", "ts", "event_id", (cents * sign).alias("delta")
    )
    return clamped_running_sum_scan(
        src,
        keys=["user_id"],
        order=["ts", "event_id"],
        delta_col="delta",
        lo=ENGAGEMENT_LO,
        hi=ENGAGEMENT_HI,
        divisor=100.0,
        out_col="balance",
    )


# ---------------------------------------------------------------------------
# seasonal_decompose
# ---------------------------------------------------------------------------

SEASONAL_HALF_WINDOW = 12  # centered 25-hour trend MA


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (trend + hour-of-day seasonal +
    residual) of each event type's hourly mean series — the STL-lite
    pass monitoring pipelines run before alerting on residuals.

    trend = centered 25-hour moving average; seasonal = mean of the
    detrended series by hour-of-day; residual = y - trend - seasonal.

    Bit-determinism: the hourly means, the MA, and the seasonal means
    are all DECIMAL-sum / exact-count divisions over 9-dp-quantized
    inputs, so every window and group sum is associative — the only
    doubles are the final divisions, evaluated with oracle-identical
    grouping. Windows run over the COMPACT hourly aggregate (O(#hours)
    rows per type), never raw events."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "value",
        )
        .groupBy("event_type", "hour_ts")
        .agg(
            (dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("y")
        )
    )
    yq = round_half_away(F.col("y"), 9).cast("decimal(28,9)")
    hourly = hourly.select("event_type", "hour_ts", "y", yq.alias("yq"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-SEASONAL_HALF_WINDOW, SEASONAL_HALF_WINDOW)
    )
    trend = (F.sum("yq").over(w).cast("double") / F.count(F.lit(1)).over(w))
    detr = hourly.select(
        "event_type",
        "hour_ts",
        "y",
        trend.alias("trend"),
        round_half_away(F.col("y") - trend, 9)
        .cast("decimal(28,9)")
        .alias("dq"),
        F.hour("hour_ts").alias("hod"),
    )
    seas = detr.groupBy("event_type", "hod").agg(
        (F.sum("dq").cast("double") / F.count(F.lit(1))).alias("seasonal")
    )
    out = detr.join(seas, ["event_type", "hod"])
    return out.select(
        "event_type",
        "hour_ts",
        round_half_away(F.col("y"), 6).alias("y"),
        round_half_away(F.col("trend"), 6).alias("trend"),
        round_half_away(F.col("seasonal"), 6).alias("seasonal"),
        round_half_away(
            F.col("y") - F.col("trend") - F.col("seasonal"), 6
        ).alias("residual"),
    )


def oracle_seasonal_decompose() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    hw = SEASONAL_HALF_WINDOW
    yq = sql_round_half_away("y", 9)
    trend = (
        f"(CAST(SUM(yq) OVER (PARTITION BY event_type ORDER BY hour_ts "
        f"ROWS BETWEEN {hw} PRECEDING AND {hw} FOLLOWING) AS DOUBLE) "
        f"/ COUNT(*) OVER (PARTITION BY event_type ORDER BY hour_ts "
        f"ROWS BETWEEN {hw} PRECEDING AND {hw} FOLLOWING))"
    )
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hour_ts,
           {sql_dec_sum('value', scale=6)} / count(*) AS y
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
hq AS (
    SELECT event_type, hour_ts, y, CAST({yq} AS DECIMAL(28,9)) AS yq
    FROM hourly
),
detr AS (
    SELECT event_type, hour_ts, y, {trend} AS trend,
           CAST({sql_round_half_away(f"y - {trend}", 9)} AS DECIMAL(28,9)) AS dq,
           CAST(extract('hour' FROM hour_ts) AS INT) AS hod
    FROM hq
),
seas AS (
    SELECT event_type, hod,
           CAST(SUM(dq) AS DOUBLE) / count(*) AS seasonal
    FROM detr GROUP BY 1, 2
)
SELECT detr.event_type, detr.hour_ts,
       {sql_round_half_away('y', 6)} AS y,
       {sql_round_half_away('trend', 6)} AS trend,
       {sql_round_half_away('seasonal', 6)} AS seasonal,
       {sql_round_half_away('y - trend - seasonal', 6)} AS residual
FROM detr JOIN seas ON seas.event_type = detr.event_type
                   AND seas.hod = detr.hod
"""


# ---------------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the cumulative sum
    of (daily mean - global mean) peaks in magnitude at the most likely
    level-shift day (Page 1954) — the drift detector a data-quality
    monitor runs per segment per day.

    The CUSUM path is an EXACT DECIMAL running sum of 9-dp-quantized
    deviations (associative, partitioning-independent), so the argmax
    day — ties break earliest — is bit-deterministic; windows run over
    the compact daily aggregate only."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = (
        ev.select(
            "event_type", F.to_date("ts").alias("day"), "value"
        )
        .groupBy("event_type", "day")
        .agg((dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("m"))
        .select(
            "event_type",
            "day",
            round_half_away(F.col("m"), 9).cast("decimal(28,9)").alias("mq"),
        )
    )
    wall = Window.partitionBy("event_type")
    mu = round_half_away(
        F.sum("mq").over(wall).cast("double")
        / F.count(F.lit(1)).over(wall),
        9,
    ).cast("decimal(28,9)")
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    withc = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(wall).alias("n_days"),
        F.sum(F.col("mq") - mu).over(wrun).alias("cusum"),
    )
    best = withc.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.max(
            F.struct(
                F.abs(F.col("cusum")).alias("a"),
                (-F.unix_date(F.col("day"))).alias("nd"),
            )
        ).alias("t"),
    )
    return best.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.date_from_unix_date(-F.col("t.nd")).cast("timestamp").alias("cp_day"),
        round_half_away(F.col("t.a").cast("double"), 6).alias("max_abs_cusum"),
    )


def oracle_cusum_changepoint() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    mu = sql_round_half_away(
        "CAST(SUM(mq) OVER (PARTITION BY event_type) AS DOUBLE)"
        " / COUNT(*) OVER (PARTITION BY event_type)",
        9,
    )
    return f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST({sql_round_half_away(
               sql_dec_sum('value', scale=6) + ' / count(*)', 9)}
               AS DECIMAL(28,9)) AS mq
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
withmu AS (
    SELECT event_type, day, mq,
           CAST({mu} AS DECIMAL(28,9)) AS mu,
           COUNT(*) OVER (PARTITION BY event_type) AS n_days
    FROM daily
),
cus AS (
    SELECT event_type, day, n_days,
           SUM(mq - mu) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS cusum
    FROM withmu
),
ranked AS (
    SELECT event_type, day, n_days, abs(cusum) AS a,
           row_number() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day ASC) AS rn
    FROM cus
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(day AS TIMESTAMP) AS cp_day,
       {sql_round_half_away('CAST(a AS DOUBLE)', 6)} AS max_abs_cusum
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------

#: users whose last event falls in the final KM_CENSOR_DAYS of the
#: observation window are right-censored (still "alive" at cutoff)
KM_CENSOR_DAYS = 3


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (days from first to
    last event), right-censoring users still active near the window
    edge — the churn-analysis estimator product teams run at cohort
    scale: S(t) = prod_{t_i <= t} (1 - d_i / n_i) over distinct event
    times, with n_i = at-risk count (lifetime >= t_i, censored or not)
    and d_i = observed churns at t_i.

    The survival product is computed as exp(sum ln(1 - d/n)) with each
    factor's log rounded once to 9 dp DECIMAL — the running sum is then
    exact and associative, so the curve is bit-deterministic however
    the per-time rows partition (the engine's standard product-as-
    decimal-log-sum recipe). Everything windows over the COMPACT
    distinct-lifetime table (O(#days) rows), never raw events."""
    from ..functions.rounding import round_half_away

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(F.max(F.to_date("ts")).alias("mx"))
    # subject = (user, event_type) engagement spell: sparse enough that
    # real churn exists in the fixture (per-user activity alone spans
    # the whole window at every test scale)
    users = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
        .crossJoin(F.broadcast(cutoff))
        .select(
            F.datediff(F.col("last_day"), F.col("first_day")).alias("t"),
            (
                F.datediff(F.col("mx"), F.col("last_day")) >= KM_CENSOR_DAYS
            ).alias("churned"),
        )
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).alias("total_t"),
        F.sum(F.col("churned").cast("long")).alias("d"),
    )
    w_ge = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_run = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.select(
        "t",
        "d",
        F.sum("total_t").over(w_ge).alias("n"),
    ).where(F.col("d") > 0)
    logf = round_half_away(
        F.log(
            1.0
            - F.col("d").cast("double") / F.col("n").cast("double")
        ),
        9,
    ).cast("decimal(28,9)")
    curve = at_risk.select(
        "t",
        "n",
        "d",
        F.sum(logf).over(w_run).alias("ls"),
    )
    return curve.select(
        F.col("t").cast("int").alias("t_days"),
        F.col("n").alias("at_risk"),
        F.col("d").alias("churned"),
        round_half_away(F.exp(F.col("ls").cast("double")), 6).alias("survival"),
    )


def oracle_kaplan_meier() -> str:
    from ..functions.rounding import sql_round_half_away

    logf = sql_round_half_away(
        "ln(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))", 9
    )
    return f"""
WITH cutoff AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
users AS (
    SELECT date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) AS t,
           date_diff('day', MAX(CAST(ts AS DATE)), (SELECT mx FROM cutoff))
               >= {KM_CENSOR_DAYS} AS churned
    FROM events GROUP BY user_id, event_type
),
per_t AS (
    SELECT t, count(*) AS total_t,
           CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM users GROUP BY 1
),
at_risk AS (
    SELECT t, d,
           CAST(SUM(total_t) OVER (ORDER BY t DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
    FROM per_t
),
curve AS (
    SELECT t, n, d,
           SUM(CAST({logf} AS DECIMAL(28,9))) OVER (ORDER BY t ASC
               ROWS UNBOUNDED PRECEDING) AS ls
    FROM at_risk WHERE d > 0
)
SELECT CAST(t AS INT) AS t_days, n AS at_risk, d AS churned,
       {sql_round_half_away("exp(CAST(ls AS DOUBLE))", 6)} AS survival
FROM curve
"""


# ---------------------------------------------------------------------------
# returns_acf
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3)


def q_returns_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of hourly mean-value changes per event type at
    lags 1-3 — the momentum/mean-reversion diagnostic quant monitoring
    keeps on every series (ACF(1) < 0 = mean-reverting microstructure).

    Determinism: hourly means and their diffs quantize to 9 dp DECIMAL,
    every moment (sum r, sum r^2, sum r_t * r_{t-k}) is an exact
    DECIMAL sum, and the ACF closes over the exact moments in double
    with oracle-identical grouping. Lagged products come from a window
    lag over the COMPACT hourly series — O(#hours) rows per type."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg((dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("m"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    # DECIMAL(18,9), deliberately narrow: r*r and r*r_lag must stay
    # under 38 digits of ideal precision or Spark silently ROUNDS the
    # product (the huber lesson) — (18,9)^2 -> (37,18), exact
    r = round_half_away(
        F.col("m") - F.lag("m", 1).over(w), 9
    ).cast("decimal(18,9)")
    rets = hourly.select("event_type", "h", r.alias("r")).where(
        F.col("r").isNotNull()
    )
    lag_cols = [
        F.lag("r", k).over(w).alias(f"rl{k}") for k in ACF_LAGS
    ]
    lagged = rets.select("event_type", "h", "r", *lag_cols)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("s"),
        F.sum(F.col("r") * F.col("r")).alias("ss"),
    ]
    for k in ACF_LAGS:
        aggs.append(
            F.sum(F.col("r") * F.col(f"rl{k}")).alias(f"sp{k}")
        )
        aggs.append(
            F.count(F.col(f"rl{k}")).cast("long").alias(f"np{k}")
        )
    agg = lagged.groupBy("event_type").agg(*aggs)
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.col("ss").cast("double") / n - mean * mean
    out_cols = [
        F.col("event_type"),
        F.col("n").cast("long").alias("n_returns"),
        round_half_away(var, 9).alias("variance"),
    ]
    for k in ACF_LAGS:
        # standard sample ACF: covariance at lag k over variance, both
        # normalized by n (Box-Jenkins convention)
        cov_k = (
            F.col(f"sp{k}").cast("double") / n
            - mean * mean * (F.col(f"np{k}").cast("double") / n)
        )
        out_cols.append(
            round_half_away(cov_k / var, 6).alias(f"acf{k}")
        )
    return agg.select(*out_cols)


def oracle_returns_acf() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    lag_sel = ", ".join(
        f"lag(r, {k}) OVER (PARTITION BY event_type ORDER BY h) AS rl{k}"
        for k in ACF_LAGS
    )
    mom = ", ".join(
        f"SUM(r * rl{k}) AS sp{k}, CAST(COUNT(rl{k}) AS BIGINT) AS np{k}"
        for k in ACF_LAGS
    )
    acfs = []
    for k in ACF_LAGS:
        cov = (
            f"(CAST(sp{k} AS DOUBLE) / nd - mean * mean"
            f" * (CAST(np{k} AS DOUBLE) / nd))"
        )
        acfs.append(f"{sql_round_half_away(f'{cov} / var', 6)} AS acf{k}")
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           {sql_dec_sum('value', scale=6)} / count(*) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
rets AS (
    SELECT event_type, h, r FROM (
        SELECT event_type, h,
               CAST({sql_round_half_away(
                   "m - lag(m, 1) OVER (PARTITION BY event_type ORDER BY h)",
                   9)} AS DECIMAL(18,9)) AS r
        FROM hourly
    ) WHERE r IS NOT NULL
),
lagged AS (
    SELECT event_type, r, {lag_sel} FROM rets
),
agg AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           SUM(r) AS s, SUM(r * r) AS ss, {mom}
    FROM lagged GROUP BY 1
),
closed AS (
    SELECT *, CAST(n AS DOUBLE) AS nd,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
    FROM agg
),
closed2 AS (
    SELECT *, CAST(ss AS DOUBLE) / nd - mean * mean AS var FROM closed
)
SELECT event_type, n AS n_returns,
       {sql_round_half_away('var', 9)} AS variance,
       {", ".join(acfs)}
FROM closed2
"""


# ---------------------------------------------------------------------------
# amihud_illiq
# ---------------------------------------------------------------------------


def q_amihud_illiq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity per instrument: the mean over days of
    |daily return| / daily volume (tick count as the volume proxy),
    scaled by 1e6 — the standard price-impact-per-unit-flow measure
    liquidity monitoring ranks books by.

    Daily closes come from a struct-ordered max_by over the hourly
    candles (no sort), returns are one lag window over the compact
    per-day series, and each day's |ret|/vol term rounds once to 9 dp
    DECIMAL so the across-days mean is an exact sum — the standard
    chain discipline."""
    from ..functions.rounding import round_half_away

    hourly = hourly_candles(spark, sf_dir)
    daily = (
        hourly.withColumn("day", F.date_trunc("day", "bucket_ts"))
        .groupBy("instrument", "day")
        .agg(
            F.max_by(F.col("close"), F.col("bucket_ts")).alias("close"),
            F.sum("n_ticks").cast("long").alias("vol"),
        )
    )
    w = Window.partitionBy("instrument").orderBy("day")
    ret = F.col("close") / F.lag("close", 1).over(w) - 1.0
    terms = daily.select(
        "instrument",
        "day",
        "vol",
        round_half_away(
            F.abs(ret) / F.col("vol").cast("double") * 1e6, 9
        )
        .cast("decimal(28,9)")
        .alias("t"),
    ).where(F.col("t").isNotNull())
    return (
        terms.groupBy("instrument")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("vol").cast("long").alias("total_ticks"),
            (F.sum("t").cast("double") / F.count(F.lit(1))).alias("illiq"),
        )
        .select(
            "instrument",
            "n_days",
            "total_ticks",
            round_half_away(F.col("illiq"), 6).alias("amihud_illiq_x1e6"),
        )
    )


def oracle_amihud_illiq() -> str:
    from ..functions.rounding import sql_round_half_away

    term = sql_round_half_away(
        "abs(close / lag_close - 1.0) / CAST(vol AS DOUBLE) * 1000000.0", 9
    )
    return f"""
WITH {HOURLY_CTE},
daily AS (
    SELECT instrument, date_trunc('day', h) AS day,
           max_by(close, h) AS close,
           CAST(SUM(n_ticks) AS BIGINT) AS vol
    FROM hourly GROUP BY 1, 2
),
lagged AS (
    SELECT instrument, day, vol, close,
           lag(close, 1) OVER (PARTITION BY instrument ORDER BY day)
               AS lag_close
    FROM daily
),
terms AS (
    SELECT instrument, day, vol,
           CAST({term} AS DECIMAL(28,9)) AS t
    FROM lagged WHERE lag_close IS NOT NULL
)
SELECT instrument, CAST(count(*) AS BIGINT) AS n_days,
       CAST(SUM(vol) AS BIGINT) AS total_ticks,
       {sql_round_half_away(
           'CAST(SUM(t) AS DOUBLE) / count(*)', 6)} AS amihud_illiq_x1e6
FROM terms GROUP BY 1
"""


# ---------------------------------------------------------------------------
# hurst_exponent
# ---------------------------------------------------------------------------

HURST_WINDOWS = (8, 16, 32)


def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per event type via classical rescaled-range (R/S)
    analysis (Hurst 1951; Mandelbrot & Wallis 1969): chop the hourly
    return series into non-overlapping blocks of m ∈ {8, 16, 32},
    compute each block's range of cumulative mean-deviations over its
    std, average R/S per m, and fit H as the log-log slope — H < 0.5
    mean-reverting, > 0.5 trending.

    The exactness trick: within a block, deviations are carried SCALED
    BY m — d_i = m·r_i − Σr — so the mean subtraction never divides
    (m·(r_i − μ) = d_i exactly); the cumulative Z, its range R' = m·R,
    and the squared-deviation sum S'² = m²·Σ(r−μ)² are all exact
    DECIMALs, and R/S = R'·√m / √(S'²) costs one sqrt + one division
    in double per block. Deviations re-quantize to DECIMAL(15,9) so
    squares stay inside Spark's 38-digit product cap (the returns_acf
    lesson). Per-block windows span ≤ 32 rows of the compact hourly
    series; the final 3-point log-log OLS is closed-form."""
    import math

    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"), "value")
        .groupBy("event_type", "h")
        .agg((dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("m"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    rets = (
        hourly.select(
            "event_type",
            "h",
            round_half_away(F.col("m") - F.lag("m", 1).over(w), 9)
            .cast("decimal(18,9)")
            .alias("r"),
        )
        .where(F.col("r").isNotNull())
        .select(
            "event_type",
            "r",
            (F.row_number().over(w) - 1).alias("idx"),
        )
    )
    from ..operators.materialize import materialize

    rets = materialize(rets)

    per_m = []
    for m in HURST_WINDOWS:
        blocks = rets.select(
            "event_type",
            "r",
            "idx",
            (F.col("idx") / m).cast("long").alias("blk"),
        )
        # drop incomplete trailing blocks
        sizes = blocks.groupBy("event_type", "blk").agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("r").alias("bs"),
        )
        full = blocks.join(
            sizes.where(F.col("bn") == m), ["event_type", "blk"]
        )
        d = (F.lit(m) * F.col("r") - F.col("bs")).cast("decimal(15,9)")
        wb = (
            Window.partitionBy("event_type", "blk")
            .orderBy("idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        zs = full.select(
            "event_type",
            "blk",
            F.sum(d).over(wb).alias("z"),
            (d * d).alias("d2"),
        )
        br = zs.groupBy("event_type", "blk").agg(
            (F.max("z") - F.min("z")).alias("rng"),
            F.sum("d2").alias("s2"),
        )
        rs = round_half_away(
            F.col("rng").cast("double")
            * math.sqrt(float(m))
            / F.sqrt(F.col("s2").cast("double")),
            9,
        ).cast("decimal(28,9)")
        per_m.append(
            br.where(F.col("s2") > 0)
            .select("event_type", rs.alias("rs"))
            .groupBy("event_type")
            .agg(
                (F.sum("rs").cast("double") / F.count(F.lit(1))).alias(
                    f"rs{m}"
                )
            )
        )
    joined = per_m[0]
    for p in per_m[1:]:
        joined = joined.join(p, "event_type")
    # 3-point OLS of ln(rs) on ln(m): slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2)
    xs = [math.log(float(m)) for m in HURST_WINDOWS]
    n = float(len(xs))
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    ys = [F.log(F.col(f"rs{m}")) for m in HURST_WINDOWS]
    sy = ys[0] + ys[1] + ys[2]
    sxy = sum((F.lit(x) * y for x, y in zip(xs, ys)), F.lit(0.0))
    hurst = (F.lit(n) * sxy - F.lit(sx) * sy) / F.lit(n * sxx - sx * sx)
    return joined.select(
        "event_type",
        *[
            round_half_away(F.col(f"rs{m}"), 6).alias(f"rs{m}")
            for m in HURST_WINDOWS
        ],
        round_half_away(hurst, 6).alias("hurst"),
    )


def oracle_hurst_exponent() -> str:
    import math

    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    m_ctes = []
    for m in HURST_WINDOWS:
        rs = sql_round_half_away(
            f"CAST(rng AS DOUBLE) * {math.sqrt(float(m))!r}"
            f" / sqrt(CAST(s2 AS DOUBLE))",
            9,
        )
        m_ctes.append(f"""
blk{m} AS (
    SELECT event_type, r, idx, CAST(idx // {m} AS BIGINT) AS blk
    FROM rets
),
sz{m} AS (
    SELECT event_type, blk, count(*) AS bn, SUM(r) AS bs
    FROM blk{m} GROUP BY 1, 2
),
z{m} AS (
    SELECT b.event_type, b.blk,
           SUM(CAST({m} * b.r - s.bs AS DECIMAL(15,9)))
               OVER (PARTITION BY b.event_type, b.blk ORDER BY b.idx
                     ROWS UNBOUNDED PRECEDING) AS z,
           CAST({m} * b.r - s.bs AS DECIMAL(15,9))
               * CAST({m} * b.r - s.bs AS DECIMAL(15,9)) AS d2
    FROM blk{m} b JOIN sz{m} s
      ON s.event_type = b.event_type AND s.blk = b.blk AND s.bn = {m}
),
br{m} AS (
    SELECT event_type, blk, MAX(z) - MIN(z) AS rng, SUM(d2) AS s2
    FROM z{m} GROUP BY 1, 2
),
rs{m} AS (
    SELECT event_type,
           CAST(SUM(CAST({rs} AS DECIMAL(28,9))) AS DOUBLE) / count(*)
               AS rs{m}
    FROM br{m} WHERE s2 > 0 GROUP BY 1
)""")
    xs = [math.log(float(m)) for m in HURST_WINDOWS]
    n = float(len(xs))
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sy = " + ".join(f"ln(rs{m})" for m in HURST_WINDOWS)
    sxy = " + ".join(
        f"{x!r} * ln(rs{m})" for x, m in zip(xs, HURST_WINDOWS)
    )
    hurst = (
        f"(({n!r} * (0.0 + {sxy}) - {sx!r} * ({sy}))"
        f" / {n * sxx - sx * sx!r})"
    )
    rs_cols = ", ".join(
        f"{sql_round_half_away(f'rs{m}', 6)} AS rs{m}" for m in HURST_WINDOWS
    )
    joins = " ".join(
        f"JOIN rs{m} USING (event_type)" for m in HURST_WINDOWS[1:]
    )
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           {sql_dec_sum('value', scale=6)} / count(*) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
rets AS (
    SELECT event_type, r,
           row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS idx
    FROM (
        SELECT event_type, h,
               CAST({sql_round_half_away(
                   "m - lag(m, 1) OVER (PARTITION BY event_type ORDER BY h)",
                   9)} AS DECIMAL(18,9)) AS r
        FROM hourly
    ) WHERE r IS NOT NULL
),
{",".join(m_ctes)}
SELECT event_type, {rs_cols},
       {sql_round_half_away(hurst, 6)} AS hurst
FROM rs{HURST_WINDOWS[0]} {joins}
"""


# ---------------------------------------------------------------------------
# ou_half_life
# ---------------------------------------------------------------------------


def q_ou_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reversion speed per event type: AR(1) fit of the hourly
    level series m_t = phi * m_{t-1} + c + eps, with the
    Ornstein-Uhlenbeck half-life -ln 2 / ln phi and the equilibrium
    level c / (1 - phi) — the "how fast does it come back" diagnostic
    quant desks keep next to the ACF (:func:`q_returns_acf` asks "is it
    mean-reverting"; this asks "with what time constant").

    Scale shape: the regression never sees raw events — one map-side-
    combined groupBy compacts the stream to O(#hours) rows per type,
    lag pairs come from one window over that compact frame, and the
    five OLS moments are exact DECIMAL sums (9 dp-quantized levels,
    (18,9)x(18,9) products stay under Spark's 38-digit clamp), closed
    in pinned-order double.  half_life/eq_mean gate to the stationary
    region 0 < phi < 1 (NULL outside: a non-reverting series has no
    half-life)."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg((dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("m"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    m9 = round_half_away(F.col("m"), 9).cast("decimal(18,9)")
    lagged = hourly.select(
        "event_type",
        m9.alias("y"),
        F.lag(m9, 1).over(w).alias("x"),
    ).where(F.col("x").isNotNull())
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    phi = (nd * sxy - sx * sy) / F.nullif(nd * sxx - sx * sx, F.lit(0.0))
    stationary = (phi > 0) & (phi < 1)
    half_life = F.when(
        stationary, -F.log(F.lit(2.0)) / F.log(phi)
    )
    eq_mean = F.when(
        stationary, ((sy - phi * sx) / nd) / (F.lit(1.0) - phi)
    )
    from ..functions.rounding import round_half_away as r6

    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        r6(phi, 6).alias("phi"),
        r6(half_life, 6).alias("half_life_hours"),
        r6(eq_mean, 6).alias("eq_mean"),
    )


def oracle_ou_half_life() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    m9 = (
        f"CAST({sql_round_half_away('m', 9)} AS DECIMAL(18,9))"
    )
    phi = (
        "((nd * sxy - sx * sy) / nullif(nd * sxx - sx * sx, 0.0))"
    )
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           {sql_dec_sum('value', scale=6)} / count(*) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
lagged AS (
    SELECT event_type, y, x FROM (
        SELECT event_type, {m9} AS y,
               lag({m9}, 1) OVER (
                   PARTITION BY event_type ORDER BY h) AS x
        FROM hourly
    ) WHERE x IS NOT NULL
),
agg AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * x) AS sxx, SUM(x * y) AS sxy
    FROM lagged GROUP BY 1
),
closed AS (
    SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
           CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
           CAST(sxx AS DOUBLE) AS sxx, CAST(sxy AS DOUBLE) AS sxy
    FROM agg
),
fit AS (
    SELECT event_type, n, {phi} AS phi,
           nd, sx, sy
    FROM closed
)
SELECT event_type, n AS n_pairs,
       {sql_round_half_away('phi', 6)} AS phi,
       {sql_round_half_away(
           "CASE WHEN phi > 0 AND phi < 1 THEN -ln(2.0) / ln(phi) END", 6)}
           AS half_life_hours,
       {sql_round_half_away(
           "CASE WHEN phi > 0 AND phi < 1 THEN"
           " ((sy - phi * sx) / nd) / (1.0 - phi) END", 6)}
           AS eq_mean
FROM fit
"""


# ---------------------------------------------------------------------------
# lead_lag_xcorr
# ---------------------------------------------------------------------------

XCORR_LAGS = (1, 2, 3)


def q_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH series moves first: cross-correlation of hourly levels for
    every event-type pair at step-lags -3..3 on their common clock —
    lag +k correlates a_t with b_{t+k} (a leads), negative lags the
    mirror — the lead-lag screen run before building any pairs signal.

    Scale shape: raw events compact to O(#hours) rows per type ONCE;
    the pair frame is the inner self-join of compact series on the hour
    (|pairs| x |common hours| rows, never raw x raw); ONE window pass
    adds lead columns for both legs, and all 7 lags' correlation moments
    reduce in a single conditional aggregate (5 exact-DECIMAL sums +
    count per lag), closed in pinned-order double with the textbook
    (n*sxy - sx*sy) / sqrt(...) form.  No per-lag rescans, no explode.

    Determinism: levels quantize to 9 dp DECIMAL(18,9) before any
    product (products stay under the 38-digit clamp); the lag subsets
    are count()-consistent because every moment masks on the SAME
    lead-null predicate."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    m9 = round_half_away(
        (dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))), 9
    ).cast("decimal(18,9)")
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg(m9.alias("m"))
    )
    a = hourly.select(
        F.col("event_type").alias("ta"), "h", F.col("m").alias("ma")
    )
    b = hourly.select(
        F.col("event_type").alias("tb"), "h", F.col("m").alias("mb")
    )
    pairs = a.join(b, "h").where(F.col("ta") < F.col("tb"))
    w = Window.partitionBy("ta", "tb").orderBy("h")
    lead_cols = []
    for k in XCORR_LAGS:
        lead_cols.append(F.lead("ma", k).over(w).alias(f"la{k}"))
        lead_cols.append(F.lead("mb", k).over(w).alias(f"lb{k}"))
    frame = pairs.select("ta", "tb", "h", "ma", "mb", *lead_cols)

    # per (pair, lag) moments: lag 0 once, +k = (ma, lb_k), -k = (mb, la_k)
    def moments(xc, yc, tag):
        ok = yc.isNotNull()
        return [
            F.count(F.when(ok, F.lit(1))).alias(f"n_{tag}"),
            F.sum(F.when(ok, xc)).alias(f"sx_{tag}"),
            F.sum(F.when(ok, yc)).alias(f"sy_{tag}"),
            F.sum(F.when(ok, xc * xc)).alias(f"sxx_{tag}"),
            F.sum(F.when(ok, yc * yc)).alias(f"syy_{tag}"),
            F.sum(F.when(ok, xc * yc)).alias(f"sxy_{tag}"),
        ]

    aggs = moments(F.col("ma"), F.col("mb"), "p0")
    for k in XCORR_LAGS:
        aggs += moments(F.col("ma"), F.col(f"lb{k}"), f"p{k}")
        aggs += moments(F.col("mb"), F.col(f"la{k}"), f"m{k}")
    agg = frame.groupBy("ta", "tb").agg(*aggs)

    def corr(tag):
        nd = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        den = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
        return (nd * sxy - sx * sy) / F.nullif(den, F.lit(0.0))

    lag_structs = [
        F.struct(
            F.lit(0).alias("lag"),
            F.col("n_p0").cast("long").alias("n_obs"),
            round_half_away(corr("p0"), 6).alias("xcorr"),
        )
    ]
    for k in XCORR_LAGS:
        lag_structs.append(
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"n_p{k}").cast("long").alias("n_obs"),
                round_half_away(corr(f"p{k}"), 6).alias("xcorr"),
            )
        )
        lag_structs.append(
            F.struct(
                F.lit(-k).alias("lag"),
                F.col(f"n_m{k}").cast("long").alias("n_obs"),
                round_half_away(corr(f"m{k}"), 6).alias("xcorr"),
            )
        )
    return agg.select(
        "ta", "tb", F.explode(F.array(*lag_structs)).alias("s")
    ).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("s.lag").cast("int").alias("lag"),
        F.col("s.n_obs").alias("n_obs"),
        F.col("s.xcorr").alias("xcorr"),
    )


def oracle_lead_lag_xcorr() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    m_expr = sql_dec_sum("value", scale=6) + " / count(*)"
    m9 = f"CAST({sql_round_half_away(m_expr, 9)} AS DECIMAL(18,9))"
    lead_sel = []
    for k in XCORR_LAGS:
        lead_sel.append(
            f"lead(ma, {k}) OVER (PARTITION BY ta, tb ORDER BY h) AS la{k}"
        )
        lead_sel.append(
            f"lead(mb, {k}) OVER (PARTITION BY ta, tb ORDER BY h) AS lb{k}"
        )

    def moments(x, y, tag):
        ok = f"{y} IS NOT NULL"
        return (
            f"CAST(count(*) FILTER (WHERE {ok}) AS BIGINT) AS n_{tag}, "
            f"SUM({x}) FILTER (WHERE {ok}) AS sx_{tag}, "
            f"SUM({y}) FILTER (WHERE {ok}) AS sy_{tag}, "
            f"SUM({x} * {x}) FILTER (WHERE {ok}) AS sxx_{tag}, "
            f"SUM({y} * {y}) FILTER (WHERE {ok}) AS syy_{tag}, "
            f"SUM({x} * {y}) FILTER (WHERE {ok}) AS sxy_{tag}"
        )

    mom_sql = [moments("ma", "mb", "p0")]
    for k in XCORR_LAGS:
        mom_sql.append(moments("ma", f"lb{k}", f"p{k}"))
        mom_sql.append(moments("mb", f"la{k}", f"m{k}"))

    def corr(tag):
        nd = f"CAST(n_{tag} AS DOUBLE)"
        sx = f"CAST(sx_{tag} AS DOUBLE)"
        sy = f"CAST(sy_{tag} AS DOUBLE)"
        sxx = f"CAST(sxx_{tag} AS DOUBLE)"
        syy = f"CAST(syy_{tag} AS DOUBLE)"
        sxy = f"CAST(sxy_{tag} AS DOUBLE)"
        den = (
            f"(sqrt({nd} * {sxx} - {sx} * {sx})"
            f" * sqrt({nd} * {syy} - {sy} * {sy}))"
        )
        return f"(({nd} * {sxy} - {sx} * {sy}) / nullif({den}, 0.0))"

    rows = [
        f"SELECT ta, tb, 0 AS lag, n_p0 AS n_obs, "
        f"{sql_round_half_away(corr('p0'), 6)} AS xcorr FROM agg"
    ]
    for k in XCORR_LAGS:
        rows.append(
            f"SELECT ta, tb, {k} AS lag, n_p{k} AS n_obs, "
            f"{sql_round_half_away(corr(f'p{k}'), 6)} AS xcorr FROM agg"
        )
        rows.append(
            f"SELECT ta, tb, -{k} AS lag, n_m{k} AS n_obs, "
            f"{sql_round_half_away(corr(f'm{k}'), 6)} AS xcorr FROM agg"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h, {m9} AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb, a.h,
           a.m AS ma, b.m AS mb
    FROM hourly a JOIN hourly b ON a.h = b.h
    WHERE a.event_type < b.event_type
),
frame AS (
    SELECT ta, tb, h, ma, mb, {", ".join(lead_sel)} FROM pairs
),
agg AS (
    SELECT ta, tb, {", ".join(mom_sql)}
    FROM frame GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b, CAST(lag AS INT) AS lag, n_obs, xcorr
FROM ({union})
"""


# ---------------------------------------------------------------------------
# garch_vol
# ---------------------------------------------------------------------------

GARCH_OMEGA = 2e-6
GARCH_ALPHA = 0.10
GARCH_BETA = 0.85
GARCH_K = 20  # truncation depth: beta^20 ~ 0.039, tail bound documented


def q_garch_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GARCH(1,1) conditional variance per event type with pinned
    params — the volatility filter risk engines run on every series —
    computed NOT as the sequential recursion but as its truncated
    closed form:

        sigma2_t = omega * (1 - b^K) / (1 - b)
                   + alpha * sum_{k=0..K-1} b^k * r2_{t-1-k}

    (unrolling sigma2_t = omega + alpha*r2_{t-1} + beta*sigma2_{t-1}
    K times; the dropped tail is beta^K * sigma2_{t-K} <= 3.9% of a
    bounded quantity at K=20 — and the TRUNCATED filter is itself the
    deterministic contract here, oracle-reproduced term for term).

    Scale shape: the recursion LOOKS sequential (each t needs t-1) but
    the geometric decay makes it a fixed-depth weighted lag sum — K lag
    columns from ONE window pass over the compact hourly frame, folded
    in pinned left-to-right order with exact literal b^k weights.  No
    statefold kernel, no iteration, distributes like any window query.

    Determinism: squared returns quantize to DECIMAL(18,9); the b^k
    literals are Python-computed doubles repr-shared with the oracle;
    the fold order is pinned textually in both engines."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg((dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("m"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    r = round_half_away(
        (F.col("m") - F.lag("m", 1).over(w))
        / F.nullif(F.lag("m", 1).over(w), F.lit(0.0)),
        9,
    ).cast("decimal(18,9)")
    rets = hourly.select("event_type", "h", r.alias("r")).where(
        F.col("r").isNotNull()
    )
    r2 = round_half_away(
        (F.col("r") * F.col("r")).cast("double"), 12
    )
    sq = rets.select("event_type", "h", r2.alias("r2"))
    lag_cols = [
        F.lag("r2", k + 1).over(w).alias(f"l{k}") for k in range(GARCH_K)
    ]
    lagged = sq.select("event_type", "h", "r2", *lag_cols)
    base = GARCH_OMEGA * (1.0 - GARCH_BETA**GARCH_K) / (1.0 - GARCH_BETA)
    acc = F.lit(base)
    for k in range(GARCH_K):
        acc = acc + F.lit(GARCH_ALPHA * GARCH_BETA**k) * F.col(f"l{k}")
    complete = lagged.where(F.col(f"l{GARCH_K - 1}").isNotNull())
    return complete.select(
        "event_type",
        "h",
        # 8 dp: sigma2 is O(1e3) here, so a 1e-12 quantum sits inside
        # double ulp noise (a 1-ulp cross-engine difference in the
        # 21-term chain flips the rounding); 1e-8 is 4 decades above it
        round_half_away(acc, 8).alias("sigma2"),
        round_half_away(F.sqrt(acc), 9).alias("garch_vol"),
    )


def oracle_garch_vol() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    lag_sel = ", ".join(
        f"lag(r2, {k + 1}) OVER (PARTITION BY event_type ORDER BY h) AS l{k}"
        for k in range(GARCH_K)
    )
    base = GARCH_OMEGA * (1.0 - GARCH_BETA**GARCH_K) / (1.0 - GARCH_BETA)
    acc = f"{base!r}"
    for k in range(GARCH_K):
        acc = f"{acc} + {GARCH_ALPHA * GARCH_BETA**k!r} * l{k}"
    r = sql_round_half_away(
        "(m - lag(m, 1) OVER (PARTITION BY event_type ORDER BY h))"
        " / nullif(lag(m, 1) OVER (PARTITION BY event_type ORDER BY h), 0.0)",
        9,
    )
    r2 = sql_round_half_away("CAST(r * r AS DOUBLE)", 12)
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           {sql_dec_sum('value', scale=6)} / count(*) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
rets AS (
    SELECT event_type, h, r FROM (
        SELECT event_type, h, CAST({r} AS DECIMAL(18,9)) AS r FROM hourly
    ) WHERE r IS NOT NULL
),
sq AS (
    SELECT event_type, h, {r2} AS r2 FROM rets
),
lagged AS (
    SELECT event_type, h, r2, {lag_sel} FROM sq
)
SELECT event_type, h,
       {sql_round_half_away(f'({acc})', 8)} AS sigma2,
       {sql_round_half_away(f'sqrt({acc})', 9)} AS garch_vol
FROM lagged WHERE l{GARCH_K - 1} IS NOT NULL
"""


# ---------------------------------------------------------------------------
# var_es_historical
# ---------------------------------------------------------------------------

VAR_ALPHA = 0.05


def q_var_es_historical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR and expected shortfall per event type: the exact
    empirical 5% quantile of hourly returns (order statistic, worst-k
    convention: k = ceil(alpha*n)) and the mean of the worst k — the
    risk pair every desk publishes nightly.

    Scale shape: returns live on the COMPACT hourly frame (O(#hours)
    rows per type); the rank window partitions BY TYPE (parallel across
    groups, never a single-partition global sort), and the tail mean is
    an exact decimal sum over k rows.  Ties in the return value are
    harmless: the k-th smallest VALUE is tie-invariant, and the tail
    mean averages k EQUAL-or-smaller rows whichever tied row the ladder
    picks (h breaks ties deterministically)."""
    from ..functions.rounding import round_half_away

    rets = _hourly_returns(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("r").asc(), F.col("h").asc())
    ranked = rets.select(
        "event_type",
        "r",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    k = F.ceil(F.lit(VAR_ALPHA) * F.col("n").cast("double")).cast("long")
    tail = ranked.where(F.col("rn") <= F.greatest(k, F.lit(1)))
    agg = tail.groupBy("event_type").agg(
        F.max("n").alias("n_obs"),
        F.count(F.lit(1)).alias("k_tail"),
        F.max("r").alias("var95"),  # the k-th smallest = max of worst k
        F.sum("r").alias("tail_sum"),
    )
    es = F.col("tail_sum").cast("double") / F.col("k_tail").cast("double")
    return agg.select(
        "event_type",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("k_tail").cast("long").alias("k_tail"),
        F.col("var95").cast("double").alias("var95"),
        round_half_away(es, 9).alias("es95"),
    )


def _hourly_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared compact hourly-return frame: 9 dp DECIMAL(18,9) simple
    returns of the hourly mean level per event type (the returns_acf
    construction, extracted for the risk family)."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg((dec_sum(F.col("value"), scale=6) / F.count(F.lit(1))).alias("m"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    r = round_half_away(
        (F.col("m") - F.lag("m", 1).over(w))
        / F.nullif(F.lag("m", 1).over(w), F.lit(0.0)),
        9,
    ).cast("decimal(18,9)")
    return hourly.select("event_type", "h", r.alias("r")).where(
        F.col("r").isNotNull()
    )


_HOURLY_RETURNS_SQL = """
hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           {msum} / count(*) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
rets AS (
    SELECT event_type, h, r FROM (
        SELECT event_type, h, CAST({r9} AS DECIMAL(18,9)) AS r FROM hourly
    ) WHERE r IS NOT NULL
)
"""


def _hourly_returns_sql() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    r9 = sql_round_half_away(
        "(m - lag(m, 1) OVER (PARTITION BY event_type ORDER BY h))"
        " / nullif(lag(m, 1) OVER (PARTITION BY event_type ORDER BY h), 0.0)",
        9,
    )
    return _HOURLY_RETURNS_SQL.format(
        msum=sql_dec_sum("value", scale=6), r9=r9
    )


def oracle_var_es_historical() -> str:
    from ..functions.rounding import sql_round_half_away

    return f"""
WITH {_hourly_returns_sql()},
ranked AS (
    SELECT event_type, r,
        row_number() OVER (PARTITION BY event_type ORDER BY r ASC, h ASC) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n
    FROM rets
),
tail AS (
    SELECT * FROM ranked
    WHERE rn <= greatest(CAST(ceil({VAR_ALPHA!r} * CAST(n AS DOUBLE)) AS BIGINT), 1)
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_obs,
       CAST(count(*) AS BIGINT) AS k_tail,
       CAST(MAX(r) AS DOUBLE) AS var95,
       {sql_round_half_away(
           'CAST(SUM(r) AS DOUBLE) / CAST(count(*) AS DOUBLE)', 9)} AS es95
FROM tail GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# tail_dependence
# ---------------------------------------------------------------------------

TAIL_Q = 0.10


def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower-tail co-crash dependence per event-type pair: on the
    common hourly clock, P(both series in their own worst decile)
    divided by the independence baseline 0.10 — the copula diagnostic
    that catches "correlations go to one in a crash" before a
    covariance model misses it (lambda ~ 1 means crashes coincide;
    ~ 0.1-baseline-normalized 1.0 means independent).

    Scale shape: per-series decile thresholds are order statistics on
    the COMPACT per-type return frame (rank window partitioned by
    type); crash flags join back by type (broadcast — one row per
    type), and pair counting is the aligned inner self-join on the hour
    (|pairs| x |common hours| rows).  Everything downstream of the
    hourly compaction is dimension-sized."""
    from ..functions.rounding import round_half_away

    rets = _hourly_returns(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("r").asc(), F.col("h").asc())
    ranked = rets.select(
        "event_type",
        "h",
        "r",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    k = F.greatest(
        F.ceil(F.lit(TAIL_Q) * F.col("n").cast("double")).cast("long"),
        F.lit(1),
    )
    flagged = ranked.select(
        "event_type", "h", (F.col("rn") <= k).alias("crash")
    )
    a = flagged.select(
        F.col("event_type").alias("ta"), "h", F.col("crash").alias("ca")
    )
    b = flagged.select(
        F.col("event_type").alias("tb"), "h", F.col("crash").alias("cb")
    )
    pairs = a.join(b, "h").where(F.col("ta") < F.col("tb"))
    agg = pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum((F.col("ca") & F.col("cb")).cast("long")).alias("n_both"),
    )
    lam = (
        F.col("n_both").cast("double") / F.col("n_common").cast("double")
    ) / F.lit(TAIL_Q)
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n_common").cast("long").alias("n_common"),
        F.col("n_both").cast("long").alias("n_both"),
        round_half_away(lam, 6).alias("tail_dep"),
    )


def oracle_tail_dependence() -> str:
    from ..functions.rounding import sql_round_half_away

    lam = (
        "(CAST(n_both AS DOUBLE) / CAST(n_common AS DOUBLE))"
        f" / {TAIL_Q!r}"
    )
    return f"""
WITH {_hourly_returns_sql()},
ranked AS (
    SELECT event_type, h, r,
        row_number() OVER (PARTITION BY event_type ORDER BY r ASC, h ASC) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n
    FROM rets
),
flagged AS (
    SELECT event_type, h,
        rn <= greatest(CAST(ceil({TAIL_Q!r} * CAST(n AS DOUBLE)) AS BIGINT), 1)
            AS crash
    FROM ranked
),
pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb,
           a.crash AS ca, b.crash AS cb
    FROM flagged a JOIN flagged b ON a.h = b.h
    WHERE a.event_type < b.event_type
),
agg AS (
    SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_common,
           CAST(SUM(CAST(ca AND cb AS BIGINT)) AS BIGINT) AS n_both
    FROM pairs GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b, n_common, n_both,
       {sql_round_half_away(lam, 6)} AS tail_dep
FROM agg
"""


# ---------------------------------------------------------------------------
# min_var_portfolio
# ---------------------------------------------------------------------------

PORT_ASSETS = 3


def q_min_var_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form minimum-variance portfolio over the three
    alphabetically-first event-type return series: the covariance matrix
    from exact-decimal common-clock moments, inverted by the 3x3
    ADJUGATE in pinned-order double, w = S^-1 1 / (1' S^-1 1) — Markowitz
    construction as ONE aggregate plus scalar algebra.  No solver, no
    collect, no iteration: at any scale the cost is the hourly
    compaction plus a 9-sum reduction.

    Determinism: role assignment (a1 < a2 < a3 lexicographically) is a
    rank over the distinct type dimension; the common clock keeps hours
    where ALL THREE series have a return; products of DECIMAL(18,9)
    returns stay exact under the 38-digit clamp; the adjugate and the
    weight normalization expand in the same textual order in both
    engines."""
    from ..functions.rounding import round_half_away

    rets = _hourly_returns(spark, sf_dir)
    roles = (
        rets.select("event_type")
        .distinct()
        .withColumn(
            "role",
            F.row_number().over(Window.orderBy("event_type")),
        )
        .where(F.col("role") <= PORT_ASSETS)
    )
    tagged = rets.join(F.broadcast(roles), "event_type")
    wide = (
        tagged.groupBy("h")
        .agg(
            F.max(F.when(F.col("role") == 1, F.col("r"))).alias("r1"),
            F.max(F.when(F.col("role") == 2, F.col("r"))).alias("r2"),
            F.max(F.when(F.col("role") == 3, F.col("r"))).alias("r3"),
        )
        .where(
            F.col("r1").isNotNull()
            & F.col("r2").isNotNull()
            & F.col("r3").isNotNull()
        )
    )
    sums = [F.count(F.lit(1)).alias("n")]
    for i in (1, 2, 3):
        sums.append(F.sum(f"r{i}").alias(f"s{i}"))
    for i, j in ((1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)):
        sums.append(
            F.sum(F.col(f"r{i}") * F.col(f"r{j}")).alias(f"s{i}{j}")
        )
    agg = wide.agg(*sums)
    nd = F.col("n").cast("double")
    mean = {i: F.col(f"s{i}").cast("double") / nd for i in (1, 2, 3)}
    cov = {}
    for i, j in ((1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)):
        cov[(i, j)] = (
            F.col(f"s{i}{j}").cast("double") / nd - mean[i] * mean[j]
        )
        cov[(j, i)] = cov[(i, j)]
    c = cov
    # adjugate rows of the symmetric covariance (pinned expansion)
    a11 = c[(2, 2)] * c[(3, 3)] - c[(2, 3)] * c[(2, 3)]
    a12 = c[(1, 3)] * c[(2, 3)] - c[(1, 2)] * c[(3, 3)]
    a13 = c[(1, 2)] * c[(2, 3)] - c[(1, 3)] * c[(2, 2)]
    a22 = c[(1, 1)] * c[(3, 3)] - c[(1, 3)] * c[(1, 3)]
    a23 = c[(1, 2)] * c[(1, 3)] - c[(1, 1)] * c[(2, 3)]
    a33 = c[(1, 1)] * c[(2, 2)] - c[(1, 2)] * c[(1, 2)]
    det = (
        c[(1, 1)] * a11 + c[(1, 2)] * a12 + c[(1, 3)] * a13
    )
    # S^-1 1 rows (adjugate row sums / det); det cancels in the weights
    g1 = a11 + a12 + a13
    g2 = a12 + a22 + a23
    g3 = a13 + a23 + a33
    gsum = F.nullif(g1 + g2 + g3, F.lit(0.0))
    port_var = F.col("det") / F.col("gs")
    closed = agg.select(
        F.col("n").cast("long").alias("n_obs"),
        (g1 / gsum).alias("w1"),
        (g2 / gsum).alias("w2"),
        (g3 / gsum).alias("w3"),
        det.alias("det"),
        gsum.alias("gs"),
    )
    names = roles.groupBy().pivot("role", [1, 2, 3]).agg(
        F.first("event_type")
    )
    out = closed.crossJoin(F.broadcast(names))
    return out.select(
        F.col("1").alias("asset_1"),
        F.col("2").alias("asset_2"),
        F.col("3").alias("asset_3"),
        "n_obs",
        round_half_away(F.col("w1"), 9).alias("w_1"),
        round_half_away(F.col("w2"), 9).alias("w_2"),
        round_half_away(F.col("w3"), 9).alias("w_3"),
        round_half_away(port_var, 12).alias("port_var"),
    )


def oracle_min_var_portfolio() -> str:
    from ..functions.rounding import sql_round_half_away

    mean = {i: f"(CAST(s{i} AS DOUBLE) / nd)" for i in (1, 2, 3)}
    c = {}
    for i, j in ((1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)):
        c[(i, j)] = (
            f"(CAST(s{i}{j} AS DOUBLE) / nd - {mean[i]} * {mean[j]})"
        )
        c[(j, i)] = c[(i, j)]
    a11 = f"({c[(2,2)]} * {c[(3,3)]} - {c[(2,3)]} * {c[(2,3)]})"
    a12 = f"({c[(1,3)]} * {c[(2,3)]} - {c[(1,2)]} * {c[(3,3)]})"
    a13 = f"({c[(1,2)]} * {c[(2,3)]} - {c[(1,3)]} * {c[(2,2)]})"
    a22 = f"({c[(1,1)]} * {c[(3,3)]} - {c[(1,3)]} * {c[(1,3)]})"
    a23 = f"({c[(1,2)]} * {c[(1,3)]} - {c[(1,1)]} * {c[(2,3)]})"
    a33 = f"({c[(1,1)]} * {c[(2,2)]} - {c[(1,2)]} * {c[(1,2)]})"
    det = f"({c[(1,1)]} * {a11} + {c[(1,2)]} * {a12} + {c[(1,3)]} * {a13})"
    g1 = f"({a11} + {a12} + {a13})"
    g2 = f"({a12} + {a22} + {a23})"
    g3 = f"({a13} + {a23} + {a33})"
    gsum = f"nullif({g1} + {g2} + {g3}, 0.0)"
    prods = ", ".join(
        f"SUM(r{i} * r{j}) AS s{i}{j}"
        for i, j in ((1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3))
    )
    return f"""
WITH {_hourly_returns_sql()},
roles AS (
    SELECT event_type,
           row_number() OVER (ORDER BY event_type) AS role
    FROM (SELECT DISTINCT event_type FROM rets)
    QUALIFY role <= {PORT_ASSETS}
),
wide AS (
    SELECT h,
           MAX(CASE WHEN role = 1 THEN r END) AS r1,
           MAX(CASE WHEN role = 2 THEN r END) AS r2,
           MAX(CASE WHEN role = 3 THEN r END) AS r3
    FROM rets JOIN roles USING (event_type)
    GROUP BY h
    HAVING r1 IS NOT NULL AND r2 IS NOT NULL AND r3 IS NOT NULL
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           SUM(r1) AS s1, SUM(r2) AS s2, SUM(r3) AS s3, {prods}
    FROM wide
),
closed AS (
    SELECT n, CAST(n AS DOUBLE) AS nd,
           s1, s2, s3, s11, s12, s13, s22, s23, s33
    FROM agg
),
names AS (
    SELECT
        MAX(CASE WHEN role = 1 THEN event_type END) AS asset_1,
        MAX(CASE WHEN role = 2 THEN event_type END) AS asset_2,
        MAX(CASE WHEN role = 3 THEN event_type END) AS asset_3
    FROM roles
)
SELECT asset_1, asset_2, asset_3, n AS n_obs,
       {sql_round_half_away(f"{g1} / {gsum}", 9)} AS w_1,
       {sql_round_half_away(f"{g2} / {gsum}", 9)} AS w_2,
       {sql_round_half_away(f"{g3} / {gsum}", 9)} AS w_3,
       {sql_round_half_away(f"{det} / {gsum}", 12)} AS port_var
FROM closed, names
"""


# ---------------------------------------------------------------------------
# drawdown_duration
# ---------------------------------------------------------------------------


def q_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drawdown pair completed: per event type, the LONGEST
    underwater spell (consecutive hours below the running peak of the
    hourly level) with its own worst depth, plus the global max
    drawdown — "how deep" (:func:`q_max_drawdown` asks it of candle
    closes) and now "how long", the statistic that separates a crash
    from a bleed.

    Scale shape: gaps-and-islands composed with a running extremum, all
    of it window work over the COMPACT hourly frame (O(#hours) rows per
    type, partition-parallel windows).  The island id is the classic
    row_number difference — no self-joins, no iteration.  Tie ladder:
    the longest spell breaks ties to the EARLIEST island (min start
    hour), pinned via struct-ordered max."""
    from ..functions.rounding import dec_sum, round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg(
            round_half_away(
                dec_sum(F.col("value"), scale=6) / F.count(F.lit(1)), 9
            ).cast("decimal(18,9)").alias("m")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    peaked = hourly.select(
        "event_type",
        "h",
        "m",
        F.max("m").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("peak"),
    )
    flagged = peaked.withColumn("uw", F.col("m") < F.col("peak"))
    grp = flagged.withColumn(
        "grp",
        F.row_number().over(w)
        - F.row_number().over(
            Window.partitionBy("event_type", "uw").orderBy("h")
        ),
    )
    dd = (F.col("m").cast("double") / F.col("peak").cast("double")) - 1.0
    spells = (
        grp.where(F.col("uw"))
        .withColumn("dd", dd)
        .groupBy("event_type", "grp")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("h").alias("start_h"),
            F.min("dd").alias("spell_depth"),
        )
    )
    # longest spell; ties -> earliest start (max over (len, -epoch))
    pick = spells.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("len").alias("len"),
                (-F.unix_timestamp("start_h")).alias("neg_start"),
                F.col("start_h").alias("start_h"),
                F.col("spell_depth").alias("spell_depth"),
            )
        ).alias("s"),
        F.count(F.lit(1)).alias("n_spells"),
    )
    worst = flagged.select(
        "event_type", dd.alias("dd")
    ).groupBy("event_type").agg(F.min("dd").alias("max_dd"))
    out = pick.join(worst, "event_type")
    return out.select(
        "event_type",
        F.col("n_spells").cast("long").alias("n_spells"),
        F.col("s.len").cast("long").alias("longest_spell_hours"),
        F.col("s.start_h").alias("spell_start"),
        round_half_away(F.col("s.spell_depth"), 9).alias("spell_depth"),
        round_half_away(F.col("max_dd"), 9).alias("max_drawdown"),
    )


def oracle_drawdown_duration() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    m9 = sql_round_half_away(
        sql_dec_sum("value", scale=6) + " / count(*)", 9
    )
    dd = "(CAST(m AS DOUBLE) / CAST(peak AS DOUBLE)) - 1.0"
    return f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           CAST({m9} AS DECIMAL(18,9)) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
peaked AS (
    SELECT event_type, h, m,
           MAX(m) OVER (PARTITION BY event_type ORDER BY h
                        ROWS UNBOUNDED PRECEDING) AS peak
    FROM hourly
),
flagged AS (
    SELECT *, m < peak AS uw FROM peaked
),
grp AS (
    SELECT *,
        row_number() OVER (PARTITION BY event_type ORDER BY h)
        - row_number() OVER (PARTITION BY event_type, uw ORDER BY h) AS grp
    FROM flagged
),
spells AS (
    SELECT event_type, grp, CAST(count(*) AS BIGINT) AS len,
           MIN(h) AS start_h, MIN({dd}) AS spell_depth
    FROM grp WHERE uw GROUP BY 1, 2
),
pick AS (
    SELECT event_type, len, start_h, spell_depth,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY len DESC, start_h ASC) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n_spells
    FROM spells
),
worst AS (
    SELECT event_type, MIN({dd}) AS max_dd FROM flagged GROUP BY 1
)
SELECT p.event_type, CAST(p.n_spells AS BIGINT) AS n_spells,
       p.len AS longest_spell_hours, p.start_h AS spell_start,
       {sql_round_half_away('p.spell_depth', 9)} AS spell_depth,
       {sql_round_half_away('w.max_dd', 9)} AS max_drawdown
FROM pick p JOIN worst w ON p.event_type = w.event_type
WHERE p.rn = 1
"""


# ---------------------------------------------------------------------------
# jump_test
# ---------------------------------------------------------------------------


def q_jump_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jump detection per event type: realized variance (sum r^2)
    against bipower variation ((pi/2) * sum |r_t| |r_{t-1}|,
    Barndorff-Nielsen & Shephard) — BV is robust to jumps while RV is
    not, so max(0, RV/BV - 1) isolates the JUMP share of volatility,
    the statistic that separates "vol is high" from "something gapped".

    Scale shape: one lag window over the compact hourly return frame,
    then exact decimal moment sums (|r| products of DECIMAL(18,9) stay
    under the 38-digit clamp); the ratio closes in pinned double."""
    from ..functions.rounding import round_half_away

    rets = _hourly_returns(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = rets.select(
        "event_type",
        "r",
        F.lag("r", 1).over(w).alias("rl"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r") * F.col("r")).alias("rv"),
        F.sum(F.abs(F.col("r")) * F.abs(F.col("rl"))).alias("bv_raw"),
        F.count(F.col("rl")).cast("long").alias("n_pairs"),
    )
    half_pi = 1.5707963267948966  # pi/2, repr-shared with the oracle
    rv = F.col("rv").cast("double")
    bv = F.lit(half_pi) * F.col("bv_raw").cast("double")
    jump = F.greatest(F.lit(0.0), rv / F.nullif(bv, F.lit(0.0)) - F.lit(1.0))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_returns"),
        F.col("n_pairs").alias("n_pairs"),
        round_half_away(rv, 9).alias("realized_var"),
        round_half_away(bv, 9).alias("bipower_var"),
        round_half_away(jump, 6).alias("jump_share"),
    )


def oracle_jump_test() -> str:
    from ..functions.rounding import sql_round_half_away

    half_pi = 1.5707963267948966
    bv = f"({half_pi!r} * CAST(bv_raw AS DOUBLE))"
    rv = "CAST(rv AS DOUBLE)"
    jump = f"greatest(0.0, {rv} / nullif({bv}, 0.0) - 1.0)"
    return f"""
WITH {_hourly_returns_sql()},
lagged AS (
    SELECT event_type, r,
           lag(r, 1) OVER (PARTITION BY event_type ORDER BY h) AS rl
    FROM rets
),
agg AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           SUM(r * r) AS rv,
           SUM(abs(r) * abs(rl)) AS bv_raw,
           CAST(COUNT(rl) AS BIGINT) AS n_pairs
    FROM lagged GROUP BY 1
)
SELECT event_type, n AS n_returns, n_pairs,
       {sql_round_half_away(rv, 9)} AS realized_var,
       {sql_round_half_away(bv, 9)} AS bipower_var,
       {sql_round_half_away(jump, 6)} AS jump_share
FROM agg
"""


# ---------------------------------------------------------------------------
# ledoit_wolf_shrinkage
# ---------------------------------------------------------------------------

_LW_PAIRS = ((1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3))


def q_ledoit_wolf_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledoit-Wolf shrinkage of the 3-series common-clock covariance
    toward the scaled identity (round-10 wave 3): the closed-form
    optimal intensity delta* = min(1, b-bar^2/d^2) from Ledoit & Wolf
    2004 ("A well-conditioned estimator..."), where m = tr(S)/p,
    d^2 = ||S - mI||^2 and b-bar^2 = (1/n^2) sum_t ||x_t x_t' - S||^2
    (normalized Frobenius) — the covariance estimate a desk actually
    feeds an optimizer when n is small relative to noise, and the
    natural audit next to `min_var_portfolio`'s raw-S weights.

    Distributed shape: TWO chained compact aggregates (means, then
    demeaned 2nd/4th-order moments with the 1-row means frame
    broadcast — the IRLS chaining pattern), then scalar algebra; no
    solver, no collect.  The fourth-order term reduces to
    sum_t p_ij^2 - n S_ij^2 because sum_t p_ij = n S_ij on demeaned
    data, so everything rides the same quantized products.

    Determinism: per-row demeaned products quantize to 9 dp ONCE
    (p9 = round9((r_i - mu_i)(r_j - mu_j)), O(1)-magnitude so the
    quantum sits ~7 decades above double ulp) and BOTH the second-order
    sums and their squares accumulate as exact DECIMAL of that same
    p9 — engine-order-free; the closed form expands in pinned textual
    order in both engines."""
    from ..functions.rounding import round_half_away
    from ..operators.materialize import materialize

    rets = _hourly_returns(spark, sf_dir)
    roles = (
        rets.select("event_type")
        .distinct()
        .withColumn(
            "role", F.row_number().over(Window.orderBy("event_type"))
        )
        .where(F.col("role") <= PORT_ASSETS)
    )
    tagged = rets.join(F.broadcast(roles), "event_type")
    # the common-clock frame feeds BOTH moment passes (means, then the
    # demeaned products) — materialize or the hourly window chain
    # re-derives per branch (first audit: 14 shuffles / 8 windows)
    wide = materialize(
        tagged.groupBy("h")
        .agg(
            F.max(F.when(F.col("role") == 1, F.col("r"))).alias("r1"),
            F.max(F.when(F.col("role") == 2, F.col("r"))).alias("r2"),
            F.max(F.when(F.col("role") == 3, F.col("r"))).alias("r3"),
        )
        .where(
            F.col("r1").isNotNull()
            & F.col("r2").isNotNull()
            & F.col("r3").isNotNull()
        )
    )
    mom1 = wide.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"r{i}").alias(f"s{i}") for i in (1, 2, 3)],
    ).select(
        "n",
        *[
            round_half_away(
                F.col(f"s{i}").cast("double")
                / F.col("n").cast("double"),
                9,
            ).alias(f"mu{i}")
            for i in (1, 2, 3)
        ],
    )
    j = wide.crossJoin(F.broadcast(mom1))
    x = {
        i: round_half_away(
            F.col(f"r{i}").cast("double") - F.col(f"mu{i}"), 9
        )
        for i in (1, 2, 3)
    }
    p9 = {
        (i, k): round_half_away(x[i] * x[k], 9).cast("decimal(18,9)")
        for i, k in _LW_PAIRS
    }
    agg = j.groupBy("n").agg(
        *[F.sum(p9[(i, k)]).alias(f"sp{i}{k}") for i, k in _LW_PAIRS],
        *[
            F.sum(p9[(i, k)] * p9[(i, k)]).alias(f"sq{i}{k}")
            for i, k in _LW_PAIRS
        ],
    )
    nd = F.col("n").cast("double")
    S = {
        (i, k): F.col(f"sp{i}{k}").cast("double") / nd
        for i, k in _LW_PAIRS
    }
    q = {(i, k): F.col(f"sq{i}{k}").cast("double") for i, k in _LW_PAIRS}
    m = (S[(1, 1)] + S[(2, 2)] + S[(3, 3)]) / F.lit(3.0)
    d2 = (
        (S[(1, 1)] - m) * (S[(1, 1)] - m)
        + (S[(2, 2)] - m) * (S[(2, 2)] - m)
        + (S[(3, 3)] - m) * (S[(3, 3)] - m)
        + F.lit(2.0)
        * (
            S[(1, 2)] * S[(1, 2)]
            + S[(1, 3)] * S[(1, 3)]
            + S[(2, 3)] * S[(2, 3)]
        )
    ) / F.lit(3.0)
    bsum = (
        (q[(1, 1)] - nd * S[(1, 1)] * S[(1, 1)])
        + (q[(2, 2)] - nd * S[(2, 2)] * S[(2, 2)])
        + (q[(3, 3)] - nd * S[(3, 3)] * S[(3, 3)])
        + F.lit(2.0)
        * (
            (q[(1, 2)] - nd * S[(1, 2)] * S[(1, 2)])
            + (q[(1, 3)] - nd * S[(1, 3)] * S[(1, 3)])
            + (q[(2, 3)] - nd * S[(2, 3)] * S[(2, 3)])
        )
    )
    bbar2 = bsum / (nd * nd * F.lit(3.0))
    b2 = F.least(bbar2, d2)
    delta = b2 / F.nullif(d2, F.lit(0.0))
    shrunk = {
        (i, k): delta * m * F.lit(1.0 if i == k else 0.0)
        + (F.lit(1.0) - delta) * S[(i, k)]
        for i, k in _LW_PAIRS
    }
    names = roles.groupBy().pivot("role", [1, 2, 3]).agg(
        F.first("event_type")
    )
    out = agg.crossJoin(F.broadcast(names))
    return out.select(
        F.col("1").alias("asset_1"),
        F.col("2").alias("asset_2"),
        F.col("3").alias("asset_3"),
        F.col("n").cast("long").alias("n_obs"),
        round_half_away(m, 9).alias("mu_trace"),
        round_half_away(d2, 9).alias("d2"),
        round_half_away(b2, 9).alias("b2"),
        round_half_away(delta, 9).alias("delta"),
        *[
            round_half_away(shrunk[(i, k)], 9).alias(f"c{i}{k}")
            for i, k in _LW_PAIRS
        ],
    )


def oracle_ledoit_wolf_shrinkage() -> str:
    from ..functions.rounding import sql_round_half_away

    mu = {
        i: sql_round_half_away(
            f"CAST(s{i} AS DOUBLE) / CAST(n AS DOUBLE)", 9
        )
        for i in (1, 2, 3)
    }
    x = {
        i: sql_round_half_away(f"CAST(r{i} AS DOUBLE) - mu{i}", 9)
        for i in (1, 2, 3)
    }
    p9 = {
        (i, k): (
            "CAST("
            + sql_round_half_away(f"({x[i]}) * ({x[k]})", 9)
            + " AS DECIMAL(18,9))"
        )
        for i, k in _LW_PAIRS
    }
    sp = ", ".join(
        f"SUM({p9[(i, k)]}) AS sp{i}{k}" for i, k in _LW_PAIRS
    )
    sq = ", ".join(
        f"SUM({p9[(i, k)]} * {p9[(i, k)]}) AS sq{i}{k}"
        for i, k in _LW_PAIRS
    )
    S = {
        (i, k): f"(CAST(sp{i}{k} AS DOUBLE) / nd)" for i, k in _LW_PAIRS
    }
    q = {(i, k): f"CAST(sq{i}{k} AS DOUBLE)" for i, k in _LW_PAIRS}
    m = f"(({S[(1,1)]} + {S[(2,2)]} + {S[(3,3)]}) / 3.0)"
    d2 = (
        f"((({S[(1,1)]} - {m}) * ({S[(1,1)]} - {m})"
        f" + ({S[(2,2)]} - {m}) * ({S[(2,2)]} - {m})"
        f" + ({S[(3,3)]} - {m}) * ({S[(3,3)]} - {m})"
        f" + 2.0 * ({S[(1,2)]} * {S[(1,2)]}"
        f" + {S[(1,3)]} * {S[(1,3)]}"
        f" + {S[(2,3)]} * {S[(2,3)]})) / 3.0)"
    )
    bsum = (
        f"(({q[(1,1)]} - nd * {S[(1,1)]} * {S[(1,1)]})"
        f" + ({q[(2,2)]} - nd * {S[(2,2)]} * {S[(2,2)]})"
        f" + ({q[(3,3)]} - nd * {S[(3,3)]} * {S[(3,3)]})"
        f" + 2.0 * (({q[(1,2)]} - nd * {S[(1,2)]} * {S[(1,2)]})"
        f" + ({q[(1,3)]} - nd * {S[(1,3)]} * {S[(1,3)]})"
        f" + ({q[(2,3)]} - nd * {S[(2,3)]} * {S[(2,3)]})))"
    )
    bbar2 = f"({bsum} / (nd * nd * 3.0))"
    b2 = f"least({bbar2}, {d2})"
    delta = f"({b2} / nullif({d2}, 0.0))"
    shrunk_cols = ", ".join(
        sql_round_half_away(
            f"{delta} * {m} * {1.0 if i == k else 0.0!r}"
            f" + (1.0 - {delta}) * {S[(i, k)]}",
            9,
        )
        + f" AS c{i}{k}"
        for i, k in _LW_PAIRS
    )
    return f"""
WITH {_hourly_returns_sql()},
roles AS (
    SELECT event_type,
           row_number() OVER (ORDER BY event_type) AS role
    FROM (SELECT DISTINCT event_type FROM rets)
    QUALIFY role <= {PORT_ASSETS}
),
wide AS (
    SELECT h,
           MAX(CASE WHEN role = 1 THEN r END) AS r1,
           MAX(CASE WHEN role = 2 THEN r END) AS r2,
           MAX(CASE WHEN role = 3 THEN r END) AS r3
    FROM rets JOIN roles USING (event_type)
    GROUP BY h
    HAVING r1 IS NOT NULL AND r2 IS NOT NULL AND r3 IS NOT NULL
),
mom1 AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           SUM(r1) AS s1, SUM(r2) AS s2, SUM(r3) AS s3
    FROM wide
),
mus AS (
    SELECT n, {mu[1]} AS mu1, {mu[2]} AS mu2, {mu[3]} AS mu3 FROM mom1
),
agg AS (
    SELECT n, {sp}, {sq}
    FROM wide, mus
    GROUP BY n
),
closed AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM agg),
names AS (
    SELECT
        MAX(CASE WHEN role = 1 THEN event_type END) AS asset_1,
        MAX(CASE WHEN role = 2 THEN event_type END) AS asset_2,
        MAX(CASE WHEN role = 3 THEN event_type END) AS asset_3
    FROM roles
)
SELECT asset_1, asset_2, asset_3, n AS n_obs,
       {sql_round_half_away(m, 9)} AS mu_trace,
       {sql_round_half_away(d2, 9)} AS d2,
       {sql_round_half_away(b2, 9)} AS b2,
       {sql_round_half_away(delta, 9)} AS delta,
       {shrunk_cols}
FROM closed, names
"""


# ---------------------------------------------------------------------------
# kalman_local_level
# ---------------------------------------------------------------------------

#: pinned local-level noise variances (process Q, observation R): the
#: steady-state gain below derives from these in PYTHON (engine-
#: independent code), so both plans inline the same repr literals.
KAL_Q = 1.0
KAL_R = 9.0
KAL_K = 20  # truncation depth: (1-gain)^20 ~ 1.3e-3, tail documented


def _kalman_gain() -> tuple[float, float]:
    """(P, K): the local-level Riccati fixed point and steady-state
    gain.  P solves P^2 + P*Q - Q*R = 0 -> P = (-Q + sqrt(Q^2+4QR))/2;
    K = (P+Q)/(P+Q+R).  sqrt is IEEE-754 correctly rounded (unlike
    exp/ln/pow), and this runs in Python anyway — the plans only ever
    see the repr-shared literal weights."""
    import math

    p = (-KAL_Q + math.sqrt(KAL_Q * KAL_Q + 4.0 * KAL_Q * KAL_R)) / 2.0
    k = (p + KAL_Q) / (p + KAL_Q + KAL_R)
    return p, k


def q_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state Kalman filtering of the hourly level per event type
    (round-10 wave 4): the local-level model y_t = mu_t + eps(R),
    mu_t = mu_{t-1} + eta(Q) converges to a CONSTANT optimal gain K
    (Riccati fixed point, :func:`_kalman_gain`), making the filter an
    exponentially-weighted average — which unrolls, GARCH-style, as a
    truncated geometric lag sum with literal weights K(1-K)^k:

        level_t = sum_{k=0..K-1} K (1-K)^k y_{t-k}

    (dropped tail = (1-K)^K of a bounded level, ~0.13% at K=20 — and
    the truncated filter IS the deterministic contract, reproduced
    term-for-term by the oracle).  The point next to `ewma_close`: the
    smoothing constant is not a knob, it is DERIVED from the pinned
    noise ratio — the optimal-filter discipline.

    Scale shape: K lag columns from ONE window pass over the compact
    hourly frame, folded in pinned left-to-right order.  Determinism:
    the hourly level closes as exact-decimal sum DIVIDED IN DOUBLE
    then 6-dp-quantized (decimal/decimal division scale differs across
    engines); the gain weights are Python-computed repr literals."""
    from ..functions.rounding import dec_sum, round_half_away

    _, gain = _kalman_gain()
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg(
            dec_sum(F.col("value"), scale=6).alias("sv"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "event_type",
            "h",
            round_half_away(
                F.col("sv").cast("double") / F.col("cnt").cast("double"), 6
            ).alias("y"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lag_cols = [
        F.lag("y", k).over(w).alias(f"l{k}") for k in range(KAL_K)
    ]
    lagged = hourly.select("event_type", "h", "y", *lag_cols)
    acc = F.lit(0.0)
    for k in range(KAL_K):
        acc = acc + F.lit(gain * (1.0 - gain) ** k) * F.col(f"l{k}")
    complete = lagged.where(F.col(f"l{KAL_K - 1}").isNotNull())
    return complete.select(
        "event_type",
        "h",
        "y",
        # 6 dp on an O(1e2) level: quantum 5+ decades above double ulp
        round_half_away(acc, 6).alias("kalman_level"),
    )


def oracle_kalman_local_level() -> str:
    from ..functions.rounding import sql_dec_sum, sql_round_half_away

    _, gain = _kalman_gain()
    y = sql_round_half_away(
        "CAST(sv AS DOUBLE) / CAST(cnt AS DOUBLE)", 6
    )
    lag_sel = ", ".join(
        f"lag(y, {k}) OVER (PARTITION BY event_type ORDER BY h) AS l{k}"
        for k in range(KAL_K)
    )
    acc = "0.0"
    for k in range(KAL_K):
        acc = f"{acc} + {gain * (1.0 - gain) ** k!r} * l{k}"
    return f"""
WITH hourly0 AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           {sql_dec_sum('value', scale=6)} AS sv,
           count(*) AS cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
hourly AS (
    SELECT event_type, h, {y} AS y FROM hourly0
),
lagged AS (
    SELECT event_type, h, y, {lag_sel} FROM hourly
)
SELECT event_type, h, y,
       {sql_round_half_away(f'({acc})', 6)} AS kalman_level
FROM lagged WHERE l{KAL_K - 1} IS NOT NULL
"""
