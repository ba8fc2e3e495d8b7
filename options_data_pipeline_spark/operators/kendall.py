"""Exact distributed Kendall S (concordant − discordant pairs).

Kendall's tau-b and the Mann-Kendall trend test both reduce to the
pair statistic ``S = Σ_{i<j} sign(x_j − x_i) · sign(y_j − y_i)`` — an
all-pairs sum that naive engines compute with an O(n²) self-join and
single-node libraries with a Fenwick/merge-sort sweep, neither of
which distributes.  The r14 frontier parked tau-b for exactly this
reason ("needs a 2-D dominance sweep that doesn't decompose into the
prefix algebra").  It does decompose; the observation is the same
value-level one that powers :mod:`.prefixsum`:

1. **Bucket x by VALUE** (the integer-grid quantization of
   :mod:`.zorder` — monotone, deterministic, and x-ties can never
   straddle a bucket).  Every pair is then either *within* one bucket
   or *across* two buckets whose x-order is known.

2. **Across buckets the x-sign is constant (+1)**, so the pair sum
   collapses onto VALUE-level y-weights: for a row with value ``v`` in
   bucket ``b``, its contribution against every earlier bucket ``b'``
   is ``(# y < v in b') − (# y > v in b')``.  With ``cum``/``vw``/
   ``tw`` per bucket from ONE
   :func:`..operators.prefixsum.grouped_value_prefix_multi` pass over
   the (bucket, y)-cells — B per-bucket weight columns over the
   group's shared value order, so every bucket's cumulative table is
   evaluated at EVERY value in the group with zero probe rows — that
   is

       f(b', v) = (cum − vw) − (tw − cum) = 2·cum − vw − tw

   and the cross-bucket total per cell is ``Σ_{b'<b} f(b', v)``: a
   CONSTANT-width fold over the B per-bucket columns at the cell's own
   row — bounded by the bucket count, never by data.

3. **Within a bucket** pairs need the full sign·sign, but the bucket
   is a bounded slice (n/B rows, tunable) and ties are pre-collapsed
   to distinct (x, y) cells — an exact vectorized kernel per (group,
   bucket) task (`applyInPandas`), embarrassingly parallel.

Everything is integer-exact end-to-end (the contract requires integer
x/y — quantize money to cents, dates to epoch days), so a DuckDB
oracle reproduces S bit-for-bit from an independent O(pairs)
self-join at adjudication scale.  Tie terms for tau-b's denominator
and Mann-Kendall's variance come off the SAME materialized cell frame
(zero extra corpus scans).

Scale shape: one corpus scan → distinct-(x,y) cell aggregate
(map-side combined, materialized); ONE multi-weight grouped prefix
pass over the y-cells (two-level segment algebra, fully parallel —
no probe expansion, r15); the within-bucket kernels are independent
tasks.  No pair join, no one-task sweep, no driver loop.

Skew caveat (same class as ``segment_expr``): bucket occupancy follows
the x VALUE distribution, so a pathological x domain (all mass in one
grid cell with distinct y) concentrates one kernel task; ties are
immune (cells collapse), and B is a parallelism knob, never a
correctness knob (tests pin B-invariance).

Reference parity: the reference ships correlation analytics for its
trades store via pandas/PostgreSQL (``scipy.stats.kendalltau`` scale
class — single node); this module is the engine-side replacement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default x-bucket count — a kernel-size knob: a within-bucket kernel
#: task sees ~n_group/B rows; the cross-bucket fold is B literal
#: columns wide but its ROW count no longer depends on B (r15)
N_XBUCKETS = 32

#: chunk edge for the within-bucket O(m²) sign kernel — bounds the
#: dense (chunk × m) sign matrices to ~16 MB
_KERNEL_CHUNK = 1024


def kendall_s_frame(
    df: DataFrame,
    groups: list[str],
    x_col: str,
    y_col: str,
    n_xbuckets: int = N_XBUCKETS,
    cross: str = "fold",
) -> DataFrame:
    """Per group: the exact pair statistic and every tie aggregate the
    tau-b / Mann-Kendall family needs.

    ``cross`` picks the cross-bucket strategy (r15; both compute the
    SAME integer S — equality is unit-pinned):

    - ``"fold"`` (default): ONE multi-weight value prefix per group
      with B per-bucket weight columns, then a constant-width
      earlier-bucket column fold per cell.  1× cells_y rows — no probe
      expansion — at the cost of ~3B generated columns, so it is the
      right shape when B is SMALL (interleaved A/B at sf0.1: B=4 fold
      3.7 s vs B=16 probe 5.1 s on the all-distinct calendar axis;
      B=32 fold 6.7 s vs B=32 probe 3.9 s — the column width, not the
      rows, dominates a toy scale).
    - ``"probe"``: the r14 shape — every cell probes each earlier
      bucket (≤ (B−1)× row expansion into one narrow prefix pass).
      The right shape when B must stay LARGE, e.g. a tie-heavy x whose
      single-x buckets skip the within-kernel only while buckets are
      narrower than the x domain.

    ``x_col`` and ``y_col`` MUST be integer-valued (long-castable
    without loss — cents, counts, epoch days): all arithmetic is then
    exact and the result is engine-independent.  Null x or y rows are
    dropped (pairwise-complete, the scipy/PostgreSQL convention), and
    so are NULL-KEYED groups — the internal reassembly joins are
    column-list (null-unsafe) joins, so without the filter a null
    group key would keep its ``n`` row but silently lose its
    tie/within columns (the r13 prefixsum ADVICE trap class); an
    explicit drop makes the contract total instead of latent.

    Output per group: ``n`` (rows), ``s`` (Σ sign·sign over pairs),
    ``tx_pairs``/``ty_pairs`` (Σ t(t−1)/2 over x-/y-tie groups — the
    tau-b denominator terms), ``ty_var`` (Σ t(t−1)(2t+5) over y-tie
    groups — the Mann-Kendall variance correction).

    Range bound: every output is a 64-bit long and |s| ≤ n(n−1)/2, so
    the statistic is exact for group sizes up to ~3×10⁹ rows (≳2^63
    pairs beyond that) — comfortably past any per-GROUP cardinality a
    100 TB table's enum keys produce; for a single global group
    larger than that, pre-aggregate to the distinct-(x, y) grain
    first (the cell collapse is lossless for S).
    """
    from .materialize import materialize

    keep = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    base = df.where(keep).select(
        *groups,
        F.col(x_col).cast("long").alias("__kx"),
        F.col(y_col).cast("long").alias("__ky"),
    )
    gb = base.groupBy(*groups).agg(
        F.min("__kx").alias("__xmin"), F.max("__kx").alias("__xmax")
    )
    if groups:
        withb = base.join(F.broadcast(gb), list(groups))
    else:
        withb = base.crossJoin(F.broadcast(gb))
    # value-grid bucket: (x − xmin) · B // span — monotone, x-ties
    # bucket-stable (same integer-exactness argument as zorder.quantize)
    num = (F.col("__kx") - F.col("__xmin")) * F.lit(n_xbuckets).cast(
        "long"
    )
    den = (F.col("__xmax") - F.col("__xmin") + F.lit(1)).cast("long")
    xb = F.floor(num / den).cast("long")
    cells = materialize(
        withb.select(*groups, xb.alias("__xb"), "__kx", "__ky")
        .groupBy(*groups, "__xb", "__kx", "__ky")
        .agg(F.count(F.lit(1)).alias("__kc"))
    )

    # --- within-bucket exact kernel (independent bounded tasks) ---
    # NESTED so cloudpickle serializes it by VALUE: a module-level
    # kernel pickles by reference and the external driver's Python
    # workers cannot import this package (only numpy/pandas are on
    # their path) — the repo-wide applyInPandas contract.
    chunk = _KERNEL_CHUNK

    def _within_bucket_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact Σ sign(Δx)·sign(Δy)·c_i·c_j over unordered cell pairs
        # of one (group, bucket) slice: the matrix is symmetric (both
        # signs flip), so S = Σ_{i,j} / 2 with a zero diagonal;
        # chunked so memory stays bounded regardless of cell count
        x = pdf["__kx"].to_numpy(np.int64)
        y = pdf["__ky"].to_numpy(np.int64)
        c = pdf["__kc"].to_numpy(np.int64)
        total = 0
        m = len(x)
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            sx = np.sign(x[np.newaxis, :] - x[lo:hi, np.newaxis])
            sy = np.sign(y[np.newaxis, :] - y[lo:hi, np.newaxis])
            w = c[lo:hi, np.newaxis] * c[np.newaxis, :]
            total += int((sx * sy * w).sum())
        out = pdf.iloc[:1].drop(columns=["__kx", "__ky", "__kc"]).copy()
        out["s_within"] = total // 2
        return out

    key_cols = [*groups, "__xb"]
    # Single-x-bucket short-circuit (r14 optimization): a bucket whose
    # cells share ONE x value has sign(Δx) = 0 for every within-bucket
    # pair, so its s_within is identically zero — only multi-x buckets
    # need the kernel.  On a tie-heavy x (order counts: a handful of
    # distinct values spread over the value grid) this empties the
    # Python path entirely; the filter is one tiny aggregate over the
    # materialized cell frame broadcast back, never a corpus pass.
    multi_x = (
        cells.groupBy(*key_cols)
        .agg((F.min("__kx") < F.max("__kx")).alias("__mx"))
        .where(F.col("__mx"))
        .select(*key_cols)
    )
    kcells = cells.join(F.broadcast(multi_x), key_cols)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in cells.select(*key_cols).schema.fields
    )
    s_within = (
        kcells.groupBy(*key_cols)
        .applyInPandas(_within_bucket_kernel, f"{schema}, s_within long")
        .groupBy(*groups)
        .agg(F.sum("s_within").alias("__sw"))
    )

    # --- cross-bucket term (strategy per ``cross``, r15) ---
    # "fold": ONE multi-weight value prefix per group (B per-bucket
    # weight columns), then per cell (b, v) the earlier-bucket sum is a
    # CONSTANT-width column fold of B long terms:
    #
    #   Σ_{b'<b} f(b', v) = Σ_{b'<b} (2·cum_{b'}(v) − vw_{b'}(v) − tw_{b'})
    #
    # — identical algebra to the probe shape's window (buckets absent
    # from a group contribute all-zero columns, exactly as they
    # contributed nothing to the window), so s is bit-identical; the
    # cross term's ROW count no longer scales with B, making B a
    # kernel-size knob (VERDICT r14 ask #4).
    # "probe": the r14 union-merge — each cell probes every earlier
    # bucket into one narrow per-(group, bucket) prefix — kept for
    # call sites that need a LARGE B (see the docstring A/B numbers).
    cy = cells.groupBy(*groups, "__xb", "__ky").agg(
        F.sum("__kc").alias("__w")
    )
    if cross == "probe":
        from pyspark.sql.window import Window

        from .prefixsum import grouped_value_prefix

        buckets = cy.select(*groups, "__xb").distinct()
        if groups:
            probes = cy.alias("t").join(
                F.broadcast(buckets.alias("p")),
                [F.col(f"t.{g}").eqNullSafe(F.col(f"p.{g}")) for g in groups]
                + [F.col("p.__xb") < F.col("t.__xb")],
            )
        else:
            probes = cy.alias("t").join(
                F.broadcast(buckets.alias("p")),
                F.col("p.__xb") < F.col("t.__xb"),
            )
        probes = probes.select(
            *[F.col(f"t.{g}") for g in groups],
            F.col("p.__xb").alias("__xb"),
            F.col("t.__ky").alias("__ky"),
            F.lit(0).cast("long").alias("__w"),
        )
        pre = grouped_value_prefix(
            cy.select(*groups, "__xb", "__ky", "__w").unionByName(probes),
            [*groups, "__xb"],
            value_col="__ky",
            weight_col=F.col("__w"),
        )
        f_term = (2 * F.col("cum") - F.col("vw") - F.col("tw")).alias("__f")
        w_lg = (
            Window.partitionBy(*groups, "value")
            .orderBy("__xb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        lg = pre.select(*groups, "__xb", "value", "vw", f_term).select(
            *groups,
            "__xb",
            "value",
            "vw",
            F.coalesce(F.sum("__f").over(w_lg), F.lit(0)).alias("__lg"),
        )
        s_cross = lg.groupBy(*groups).agg(
            F.sum(F.col("vw") * F.col("__lg")).alias("__sc")
        )
    else:
        from .prefixsum import grouped_value_prefix_multi

        pfxm = grouped_value_prefix_multi(
            cy,
            groups,
            value_col="__ky",
            weights={
                f"b{b}": F.when(
                    F.col("__xb") == b, F.col("__w")
                ).otherwise(F.lit(0))
            for b in range(n_xbuckets)
            },
            # cy is one small aggregate over the MATERIALIZED cell
            # frame: the prefix's three internal branches re-derive it
            # from ExistingRDD, so the eager distinct-value checkpoint
            # would buy nothing and cost one sync (the r14 wave-3
            # per-call-site policy)
            materialize_values=False,
        ).withColumnRenamed("value", "__ky")

        def _below(prefix: str):
            # Σ over buckets strictly before the cell's own — B literal
            # terms, all long arithmetic (codegen-friendly at B ≤ 64)
            expr = F.lit(0).cast("long")
            for b in range(n_xbuckets):
                expr = expr + F.when(
                    F.col("__xb") > b, F.col(f"{prefix}b{b}")
                ).otherwise(F.lit(0))
            return expr

        joined = cy.join(pfxm, [*groups, "__ky"])
        s_cross = joined.groupBy(*groups).agg(
            F.sum(
                F.col("__w")
                * (2 * _below("cum_") - _below("vw_") - _below("tw_"))
            ).alias("__sc")
        )

    # --- tie aggregates, all off the materialized cell frame ---
    def tie_aggs(col: str, tag: str, with_var: bool, with_n: bool) -> DataFrame:
        t = cells.groupBy(*groups, col).agg(F.sum("__kc").alias("__t"))
        # t(t−1) is even, so >>1 IS the exact /2 — never a double
        # division (whose 2^53 mantissa a giant tie group's t² exceeds)
        aggs = [
            F.sum(
                F.shiftright(F.col("__t") * (F.col("__t") - 1), 1)
            ).cast("long").alias(f"t{tag}_pairs")
        ]
        if with_var:
            aggs.append(
                F.sum(
                    F.col("__t")
                    * (F.col("__t") - 1)
                    * (2 * F.col("__t") + 5)
                ).cast("long").alias(f"t{tag}_var")
            )
        if with_n:
            # Σ_x t_x IS the group row count — riding it here retires
            # the separate counts aggregation branch over cells and its
            # reassembly join (r14 optimization: one less shuffle chain,
            # one less join, identical algebra)
            aggs.append(F.sum("__t").cast("long").alias("n"))
        return t.groupBy(*groups).agg(*aggs)

    def j(a: DataFrame, b: DataFrame) -> DataFrame:
        if groups:
            return a.join(b, list(groups), "left")
        # left-preserving even when b is EMPTY (the single-x-bucket
        # short-circuit can legitimately empty s_within; a plain
        # crossJoin would annihilate the output row)
        return a.join(b, F.lit(True), "left")

    out = j(
        j(j(tie_aggs("__kx", "x", False, True),
            tie_aggs("__ky", "y", True, False)), s_within),
        s_cross,
    )
    return out.select(
        *groups,
        "n",
        (
            F.coalesce(F.col("__sw"), F.lit(0))
            + F.coalesce(F.col("__sc"), F.lit(0))
        ).cast("long").alias("s"),
        F.col("tx_pairs"),
        F.col("ty_pairs"),
        F.col("ty_var"),
    )


def kendall_s_reference(
    rows: list[tuple[int, int]]
) -> tuple[int, int, int, int, int]:
    """Driver-side O(n²) reference for the unit suite (never on a data
    path): returns ``(n, s, tx_pairs, ty_pairs, ty_var)``."""
    from collections import Counter

    n = len(rows)
    s = 0
    for i in range(n):
        for k in range(i + 1, n):
            sx = (rows[k][0] > rows[i][0]) - (rows[k][0] < rows[i][0])
            sy = (rows[k][1] > rows[i][1]) - (rows[k][1] < rows[i][1])
            s += sx * sy
    tx = Counter(r[0] for r in rows)
    ty = Counter(r[1] for r in rows)
    tx_pairs = sum(t * (t - 1) // 2 for t in tx.values())
    ty_pairs = sum(t * (t - 1) // 2 for t in ty.values())
    ty_var = sum(t * (t - 1) * (2 * t + 5) for t in ty.values())
    return n, s, tx_pairs, ty_pairs, ty_var
