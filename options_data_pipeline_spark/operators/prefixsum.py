"""Distributed exact prefix sums over grouped, value-ordered data.

The quantile family's scale problem (VERDICT r11 #1): an ordered
cumulative window ``Window.partitionBy(group).orderBy(value)`` funnels
EVERY row of a group through one task's sort.  When the group key is a
low-cardinality enum (event types, languages, markets), that task sees
~1/|groups| of the table — the classic 100 TB scale-killer.

Two observations turn every exact-quantile computation in this repo
into a fully parallel plan, exactly (not approximately):

1. **Order statistics only need VALUE-level cumulative weights.**  The
   q-quantile is the smallest value v with CW(v) >= threshold, where
   CW(v) = Σ weight over rows with value <= v — the row-level tiebreak
   order (event_id etc.) never changes which VALUE first crosses any
   threshold.  So the row-level window collapses onto a map-side-
   combined ``groupBy(group, value)`` pre-aggregate whose output is
   |distinct values| rows, and which is immune to heavy single-value
   tie skew by construction.

2. **Over distinct values, the cumulative sum decomposes into the
   two-level segment prefix sum** (the ``pack_token_shards`` algebra,
   :mod:`.packing`): segments are contiguous value intervals (any
   monotone bucketing qualifies), so

       global_cum = Σ (whole earlier segments)  +  local running sum

   Level 1 windows run per (group, segment) in parallel; level 2 runs
   over the per-segment totals and broadcasts back.

Segment assignment derives from the OBSERVED per-group (min, max): the
group's value span splits into ``n_segments`` equal intervals, so the
per-group segment count is bounded by a CONSTANT — independent of the
value domain and of the distinct-value count (ADVICE r12: a fixed
absolute width made the level-2 offset window and its broadcast scale
with the domain for wide-domain doubles such as conformal residuals).
The bounds come from the same distinct-value pre-aggregate that feeds
the group totals, so deriving them adds no extra pass over the data.
Any monotone bucketing yields identical results — the segmentation is
a parallelism knob, never a correctness knob.

Used by ``plans/quality.py``: `weighted_median` (weighted quantiles),
`conformal_interval` (single order-statistic selection), and
`value_percentiles` (interpolated percentiles from the two bracketing
order statistics); and by ``plans/text.py``: `length_ks_drift` /
`quantile_map_lengths` (cumulative distribution tables over distinct
document lengths).  Reference parity: the reference computes order
statistics inside PostgreSQL (``percentile_cont``), which hides the
same distribution problem this module solves engine-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default per-group segment count — a parallelism tunable, not a
#: correctness knob: any segmentation yields identical results, it only
#: sets level-1 task size (distinct values per segment) and the level-2
#: offsets frame size (<= N_SEGMENTS rows per group, by construction).
N_SEGMENTS = 256


def segment_expr(
    value: Column, vmin: Column, vmax: Column, n_segments: int
) -> Column:
    """Segment id in ``[0, n_segments)`` for ``value`` within the
    observed group bounds ``[vmin, vmax]`` — monotone non-decreasing in
    ``value`` (IEEE subtraction/multiplication/division by a positive
    constant preserve order; floor and the top cap preserve it), so
    segments are contiguous value intervals as the prefix-sum algebra
    requires.  Degenerate span (single distinct value) maps to 0.

    NaN handling (ADVICE r13): NaN sorts LAST in Spark's total order,
    so NaN values map to the top segment — without the guard, a single
    NaN made ``rel`` NaN for itself and (via a NaN ``span``) for EVERY
    row of the group, collapsing the whole group into one segment and
    silently reintroducing the one-task funnel this module removes.
    ``span`` can still be NaN only when the caller passes NaN bounds
    (or inf - inf); that degrades to segment 0 for the non-NaN rows —
    correct, just unparallel — instead of corrupting monotonicity."""
    v = value.cast("double")
    span = vmax.cast("double") - vmin.cast("double")
    rel = (v - vmin.cast("double")) * F.lit(float(n_segments)) / span
    return (
        F.when(F.isnan(v), F.lit(n_segments - 1))
        .when(span.isNull() | F.isnan(span) | (span <= 0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_segments - 1).cast("long"),
                F.floor(rel).cast("long"),
            )
        )
        .cast("long")
    )


def grouped_value_prefix(
    df: DataFrame,
    groups: list[str],
    value_col: str = "value",
    weight_col: Column | None = None,
    n_segments: int = N_SEGMENTS,
    seg_width: float | None = None,
    materialize_values: bool = True,
) -> DataFrame:
    """Per (``groups``, distinct ``value_col``): the exact inclusive
    cumulative weight ``cum`` in value order, plus the group total
    ``tw`` — computed with zero unbounded-group windows.

    ``weight_col`` defaults to 1 per row (plain cumulative counts).
    ``groups`` may be empty (one global distribution).  ``seg_width``
    forces a fixed absolute segment width instead of the derived
    bounded-count segmentation — for tests that pin equality across
    segmentations; production callers should leave the default.
    ``materialize_values`` (default on) cuts lineage at the
    distinct-value pre-aggregate: the level-1 window, the group-stats
    frame, and the level-2 offsets are three plan BRANCHES of that
    aggregate, and unbarriered Catalyst re-derives each branch from
    the source — three corpus scans where one suffices (the r13
    scan-count audit made this visible).  The checkpoint costs one
    compact |distinct values| frame and bounds every branch by it.
    Output columns: ``*groups, value, vw (this value's weight), cum
    (inclusive cumulative weight), tw (group total)``.  All weight
    arithmetic is exact (long); the caller picks thresholds.
    """
    out = grouped_value_prefix_multi(
        df,
        groups,
        value_col=value_col,
        weights={"w": weight_col if weight_col is not None else F.lit(1)},
        n_segments=n_segments,
        seg_width=seg_width,
        materialize_values=materialize_values,
    )
    return out.select(
        *groups,
        "value",
        F.col("vw_w").alias("vw"),
        F.col("cum_w").alias("cum"),
        F.col("tw_w").alias("tw"),
    )


def grouped_value_prefix_multi(
    df: DataFrame,
    groups: list[str],
    value_col: str,
    weights: dict[str, Column],
    n_segments: int = N_SEGMENTS,
    seg_width: float | None = None,
    materialize_values: bool = True,
) -> DataFrame:
    """:func:`grouped_value_prefix` for SEVERAL weight columns over the
    SAME value order in one pass — the two-sample shape (`length_ks_drift`
    cumulates the en and non-en counts per distinct length; computing
    them as two separate prefixes would scan the corpus twice and then
    need an as-of join to align the tables).  Output per (``groups``,
    distinct value): ``vw_<name>, cum_<name>, tw_<name>`` per weight.
    """
    names = list(weights)
    # null semantics (ADVICE r13): Spark's `percentile` (and every
    # order-statistic consumer here) IGNORES null values — without the
    # filter the null distinct-value row was dropped by the null-unsafe
    # segment join while its weight still inflated tw and the offsets,
    # silently treating nulls as smallest values.  NaN is a real value
    # (sorts last) and stays; `segment_expr` routes it monotonically.
    vw = (
        df.where(F.col(value_col).isNotNull())
        .select(
            *groups,
            F.col(value_col).alias("value"),
            *[
                w.cast("long").alias(f"__w_{n}")
                for n, w in weights.items()
            ],
        )
        .groupBy(*groups, "value")
        .agg(*[F.sum(f"__w_{n}").alias(f"vw_{n}") for n in names])
    )
    if materialize_values:
        from .materialize import materialize

        vw = materialize(vw)
    # group bounds + totals from the SAME distinct-value pre-aggregate:
    # one tiny frame (|groups| rows) broadcast back.  Bounds exclude
    # NaN (max() would return it, making the span NaN for the whole
    # group); NaN rows segment via segment_expr's top-segment branch.
    not_nan = ~F.isnan(F.col("value").cast("double"))
    gstats = vw.groupBy(*groups).agg(
        F.min(F.when(not_nan, F.col("value"))).alias("__vmin"),
        F.max(F.when(not_nan, F.col("value"))).alias("__vmax"),
        *[F.sum(f"vw_{n}").alias(f"tw_{n}") for n in names],
    )
    if groups:
        joined = vw.join(F.broadcast(gstats), list(groups))
    else:
        joined = vw.crossJoin(F.broadcast(gstats))
    if seg_width is not None:
        seg = F.when(
            F.isnan(F.col("value").cast("double")),
            F.lit(1 << 62),  # NaN sorts last -> past every floor id
        ).otherwise(
            F.floor(F.col("value") / F.lit(seg_width))
        ).cast("long")
    else:
        seg = segment_expr(
            F.col("value"), F.col("__vmin"), F.col("__vmax"), n_segments
        )
    with_seg = joined.withColumn("__seg", seg)
    # level 1: local inclusive cumsums inside each (group, segment)
    w_local = (
        Window.partitionBy(*groups, "__seg")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_seg.select(
        "*",
        *[
            F.sum(f"vw_{n}").over(w_local).alias(f"__lc_{n}")
            for n in names
        ],
    )
    # level 2: per-segment totals -> exclusive running offsets per group
    # (<= n_segments rows per group by construction), broadcast back.
    # In the ungrouped form this is a one-task window over <= n_segments
    # rows — DESIGNED (bounded by the constant, not data).  Spark still
    # logs its no-partition-defined warning for it: a literal partition
    # key is constant-folded away before WindowExec checks the spec, so
    # the warning keys on the spec shape, never the input size
    # (adjudicated in PERFORMANCE.md r13).
    w_seg = (
        Window.partitionBy(*groups)
        .orderBy("__seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_seg.groupBy(*groups, "__seg")
        .agg(*[F.sum(f"vw_{n}").alias(f"__st_{n}") for n in names])
        .select(
            *groups,
            "__seg",
            *[
                F.coalesce(
                    F.sum(f"__st_{n}").over(w_seg), F.lit(0)
                ).alias(f"__off_{n}")
                for n in names
            ],
        )
    )
    return (
        local.join(F.broadcast(offsets), [*groups, "__seg"])
        .select(
            *groups,
            "value",
            *[f"vw_{n}" for n in names],
            *[
                (F.col(f"__lc_{n}") + F.col(f"__off_{n}")).alias(
                    f"cum_{n}"
                )
                for n in names
            ],
            *[f"tw_{n}" for n in names],
        )
    )


def grouped_rank_select(
    prefix: DataFrame,
    groups: list[str],
    rank: Column,
) -> DataFrame:
    """From a :func:`grouped_value_prefix` frame: per group, the
    smallest value whose inclusive cumulative weight reaches ``rank``
    (a Column over the prefix frame's columns, e.g. a function of
    ``tw``).  Output: ``*groups, value, tw``."""
    return (
        prefix.where(F.col("cum") >= rank)
        .groupBy(*groups)
        .agg(F.min("value").alias("value"), F.max("tw").alias("tw"))
    )


def grouped_interp_percentiles(
    df: DataFrame,
    groups: list[str],
    value_col: str,
    qs: list[float],
    out_names: list[str],
    materialize_values: bool = True,
) -> DataFrame:
    """Exact INTERPOLATED percentiles per group from the distinct-value
    prefix sum — the drop-in for Spark's exact ``percentile`` aggregate,
    which buffers EVERY value of a group in one reducer's hash map (the
    same one-task-per-enum-group funnel as an ordered window, hidden
    inside an aggregate; r12 memory rule).  Each percentile needs only
    the two order statistics bracketing rank p = q·(n−1), both read off
    the cumulative counts, plus the exact interpolation expression
    Spark's Percentile.scala evaluates — ``(ceil(p)−p)·lo +
    (p−floor(p))·hi`` with the integral-rank case short-circuited to
    ``lo`` — which DuckDB's ``quantile_cont`` matches bit-for-bit
    (verified across rounds on this data; `value_percentiles` is the
    long-standing driver row for the law).

    Output: one row per group with ``*groups, *out_names (double),
    n (long — the non-null value count the percentile ranks over)``.
    """
    pfx = grouped_value_prefix(
        df, groups, value_col=value_col,
        materialize_values=materialize_values,
    )
    return prefix_interp_percentiles(pfx, groups, qs, out_names)


def prefix_interp_percentiles(
    pfx: DataFrame,
    groups: list[str],
    qs: list[float],
    out_names: list[str],
) -> DataFrame:
    """:func:`grouped_interp_percentiles` from an ALREADY-BUILT
    :func:`grouped_value_prefix` frame — for callers that need the
    prefix for more than the thresholds (winsorized/trimmed moments,
    outlier-fence counts) and must not scan the corpus once per use
    (r14; the prefix frame is the compact shared intermediate the r13
    scan doctrine says to reuse)."""
    aggs = []
    for q, nm in zip(qs, out_names):
        p = F.lit(q) * (F.col("tw") - 1).cast("double")
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.floor(p) + 1, F.col("value"))
            ).alias(f"__lo_{nm}")
        )
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.ceil(p) + 1, F.col("value"))
            ).alias(f"__hi_{nm}")
        )
    sel = pfx.groupBy(*groups).agg(*aggs, F.max("tw").alias("__n"))
    outs = []
    for q, nm in zip(qs, out_names):
        p = F.lit(q) * (F.col("__n") - 1).cast("double")
        lo = F.col(f"__lo_{nm}").cast("double")
        hi = F.col(f"__hi_{nm}").cast("double")
        outs.append(
            F.when(F.floor(p) == F.ceil(p), lo)
            .otherwise(
                (F.ceil(p).cast("double") - p) * lo
                + (p - F.floor(p).cast("double")) * hi
            )
            .alias(nm)
        )
    return sel.select(
        *groups, *outs, F.col("__n").cast("long").alias("n")
    )
