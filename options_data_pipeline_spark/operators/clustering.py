"""K-means clustering over embedding columns (Lloyd's algorithm).

The iterative-ML workhorse of a training-data pipeline: semantic
bucketing of a corpus (SemDeDup-style dedup pruning, topic balancing,
curriculum binning) all start from "assign every embedding to its
nearest centroid and re-fit".

Spark-first shape, same as MLlib's KMeans but expressed on DataFrames:

- **Assignment is a narrow map** — centroids are collected to the driver
  (k x dim doubles, bounded exactly like a broadcast-join build side)
  and embedded as one constant array-of-structs the per-row fold scans,
  so assigning N rows shuffles nothing. At 100 TB this is the property
  that matters: the only per-iteration shuffle is the centroid update.
- **Centroid update is one map-side-combined groupBy** over
  (cluster, dim) after a ``posexplode`` of the vectors — k*dim output
  rows regardless of corpus size.

Cross-engine determinism (the oracle recomputes the identical fixpoint
in DuckDB):

- distances are LEFT-FOLD sums of squared diffs in dimension order —
  Spark ``F.aggregate`` with 0.0 init, DuckDB no-init ``list_reduce``
  (equal bitwise: terms are squares, and 0.0 + x == x for x >= 0);
- centroid means use the repo-standard exact accumulation
  ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)`` — the
  decimal sum is order-free, so Spark's partial aggregation and DuckDB's
  sequential scan agree bitwise;
- ties in the argmin break to the lowest centroid id on both sides.

Reference parity note: the reference engine has no ML operators; this
extends the surface per the training-data-pipeline brief (SemDeDup /
corpus bucketing), like operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_half_away

DEFAULT_K = 8
DEFAULT_ITERATIONS = 2
CENTROID_DECIMAL = "decimal(38,6)"

# SemDeDup cell sizing: the within-cell pairwise join is quadratic in
# cell population, so k must GROW with the corpus — a fixed k makes
# cells n/k and pair expansion (n/k)^2, a scale-killer at 100x data.
# TARGET_CELL_SIZE fixes the average cell, making total pair work
# n/target * target^2 = n * target — LINEAR in corpus size.
TARGET_CELL_SIZE = 512
# Hard per-cell cap: a cell that still exceeds this (skewed centroid)
# is deterministically re-split into ceil(size/cap) sub-cells by
# vec_id % n_sub; pairs are only compared within a sub-cell. This is
# the standard SemDeDup approximation (pairs across sub-cells of one
# oversized cell are forgone) and bounds worst-case pair expansion.
MAX_CELL_SIZE = 4096

# re-split literal-map ceiling: above this many OVERSIZED cells the
# n_sub literals stop being a plan constant and the count-window path
# takes over (collect stays bounded by this gate)
_RESPLIT_MAP_GATE = 4096


def adaptive_k(
    n: int,
    target_cell_size: int = TARGET_CELL_SIZE,
    floor_k: int = DEFAULT_K,
) -> int:
    """k for an n-vector corpus: ceil(n / target_cell_size), never
    below ``floor_k``. Linear-in-n pair work (see TARGET_CELL_SIZE)."""
    import math

    return max(floor_k, math.ceil(n / target_cell_size))


def _as_double_vectors(
    emb: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def assign_to_centroids(
    vecs: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, v, cluster, dist): nearest centroid per vector.

    ``centroids`` is driver-side (bounded like a broadcast build side),
    embedded as one constant array-of-structs; the per-row work is a
    higher-order-function fold over it — zero exchanges, so assignment
    is a single narrow pass over the corpus however large it is. Ties
    break to the lowest centroid id via lexicographic struct ordering on
    (dist, cid).

    The fold is a left fold in dimension order with 0.0 init — bitwise
    equal to DuckDB's no-init ``list_reduce`` because every term is a
    square (>= +0.0, and 0.0 + x == x for x >= 0). An earlier unrolled
    k x dim nested-add form was codegen-friendly per row but cost ~6 s
    of Catalyst planning per assignment (measured, k=8 x 64 dims); the
    constant-array HOF plans in milliseconds and the interpreted per-row
    cost is k*dim multiply-adds — at extreme k*dim the right move is a
    vectorized Pandas UDF, which would trade away oracle bit-parity
    (numpy reduces pairwise, not left-fold).
    """
    # JVM-parsed constant (functions/litconst.py rationale): k x dim
    # literals built Column-by-Column cost a py4j trip per element, and
    # kmeans rebuilds this plan EVERY iteration
    from ..functions.litconst import double_array_sql

    cent = F.expr(
        "array(" + ", ".join(
            f"named_struct('cid', {int(cid)}, 'cv', {double_array_sql(cv)})"
            for cid, cv in centroids
        ) + ")"
    )
    best = F.array_min(
        F.transform(
            cent,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("v"), c["cv"], lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ).alias("d"),
                c["cid"].alias("c"),
            ),
        )
    )
    return vecs.select(
        "vec_id",
        "v",
        best["c"].alias("cluster"),
        best["d"].alias("dist"),
    )


def update_centroids(assigned: DataFrame) -> list[tuple[int, list[float]]]:
    """Exact-decimal per-dimension means, collected (k x dim rows only).

    posexplode -> groupBy(cluster, pos) is one shuffle whose output is
    k*dim rows regardless of input size; the decimal sum makes the mean
    independent of partial-aggregation order (bitwise reproducible).
    Empty clusters simply drop out (both engines agree).
    """
    rows = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(F.col("x").cast(CENTROID_DECIMAL)).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["c"]
    return [
        (cid, [dims[i] for i in range(len(dims))])
        for cid, dims in sorted(by_cluster.items())
    ]


def kmeans_assign(
    emb: DataFrame,
    k: int = DEFAULT_K,
    iterations: int = DEFAULT_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds; return (vec_id, cluster, dist).

    Seeds are the vectors with ``id_col < k`` — deterministic and
    oracle-reproducible (k-means++ would need engine-private randomness).
    ``dist`` is the squared L2 distance to the final centroid, rounded
    half-away to 4 dp (repo rounding convention).
    """
    vecs = _as_double_vectors(emb, id_col, vec_col)
    seeds = [
        (int(r["vec_id"]), list(r["v"]))
        for r in vecs.where(F.col("vec_id") < k).collect()
    ]
    centroids = sorted(seeds)
    assigned = assign_to_centroids(vecs, centroids)
    for _ in range(iterations - 1):
        centroids = update_centroids(assigned)
        assigned = assign_to_centroids(vecs, centroids)
    return assigned.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        round_half_away(F.col("dist"), 4).alias("dist"),
    )


def normalize_vectors(vecs: DataFrame) -> DataFrame:
    """L2-normalize the ``v`` column (left-fold norm, dimension order).

    Scaled duplicates become bitwise-identical unit vectors: 2x scaling
    multiplies both the components and the norm by an exact power of
    two, and IEEE division cancels it exactly — which is what makes
    planted-twin recall provable in :func:`semantic_prune`.

    The norm rides into the division as a zip_with against an
    array_repeat rather than a lambda-captured outer column: Catalyst's
    attribute rewrite loses lambda-captured outer references under
    projection collapse / self-join dedup (INTERNAL_ERROR_ATTRIBUTE_NOT_
    FOUND), so the lambda here touches only its own variables.
    """
    from .similarity import _dot

    norm = F.sqrt(_dot(F.col("v"), F.col("v")))
    return vecs.select(
        "vec_id",
        F.zip_with(
            F.col("v"),
            F.array_repeat(norm, F.size(F.col("v"))),
            lambda x, n: x / n,
        ).alias("v"),
    )


def semantic_prune(
    emb: DataFrame,
    k: int | None = None,
    iterations: int = DEFAULT_ITERATIONS,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reliable: bool = False,
    max_cell_size: int | None = MAX_CELL_SIZE,
) -> DataFrame:
    """SemDeDup: semantic near-duplicate pruning via k-means bucketing.

    The O(n^2) pairwise-cosine problem becomes tractable by comparing
    ONLY within k-means cells (Abbas et al. 2023, SemDeDup): cluster the
    L2-normalized embeddings, then for each cell compute pairwise cosine
    (= dot of unit vectors) and drop the higher id of every pair at
    ``sim >= threshold``. Returns the dropped set
    (vec_id, cluster, max_sim) — max_sim is the strongest same-cell
    similarity to a lower-id vector.

    Scale shape: ``k=None`` (the default) sizes k ADAPTIVELY as
    :func:`adaptive_k` — ceil(n / TARGET_CELL_SIZE) — so average cell
    population stays constant and total pair work is LINEAR in corpus
    size instead of quadratic-in-(n/k). Cells an unlucky centroid still
    overgrows are re-split by ``vec_id % ceil(size / max_cell_size)``
    (deterministic, oracle-reproducible) before the pairwise join, which
    caps worst-case expansion at ~max_cell_size^2 per sub-cell. The cell
    self-join shuffles on (cluster, sub); assignment itself is
    shuffle-free (see :func:`assign_to_centroids`).
    """
    from .similarity import _dot

    from .materialize import materialize

    # materialized: consumed by the seed collect and every assignment
    # pass, and the checkpoint stops CollapseProject from inlining the
    # normalize expressions into the assignment's HOF lambdas (Catalyst
    # loses attribute references nested two lambda levels deep —
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND without this barrier)
    vecs = materialize(
        normalize_vectors(_as_double_vectors(emb, id_col, vec_col)), reliable
    )
    if k is None:
        # one count job over the materialized (skinny) vector table —
        # the same bounded driver read a broadcast-join sizing makes
        k = adaptive_k(vecs.count())
    seeds = [
        (int(r["vec_id"]), list(r["v"]))
        for r in vecs.where(F.col("vec_id") < k).collect()
    ]
    centroids = sorted(seeds)
    assigned = assign_to_centroids(vecs, centroids)
    for _ in range(iterations - 1):
        centroids = update_centroids(assigned)
        assigned = assign_to_centroids(vecs, centroids)

    # materialize before the cell self-join (both pair sides consume the
    # assignment — halves the recompute), and give the b side its OWN
    # materialization: Spark 4's DeduplicateRelations re-instances a
    # relation joined with itself but loses attribute rewrites nested in
    # HOF lambdas (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND); two distinct
    # leaf relations never trigger the rewrite. The b-side copy is a
    # projection of the first checkpoint, so the extra job only re-writes
    # (id, cluster, vector) rows, not the assignment compute.
    assigned = materialize(assigned.select("vec_id", "cluster", "v"), reliable)
    if max_cell_size is None:
        # no re-split: trust adaptive k to bound cells (skips the
        # oversized-cell probe; keep the default cap whenever an
        # adversarial cell-size distribution is possible)
        assigned = assigned.withColumn("sub", F.lit(0).cast("bigint"))
    else:
        # Hard cap on cell population: re-split any oversized cell into
        # ceil(size / max_cell_size) sub-cells keyed by vec_id % n_sub.
        # Only cells ACTUALLY over the cap matter, and with adaptive k
        # there are normally none — so probe for them with one aggregate.
        # The probe collect is LIMIT-bounded to _RESPLIT_MAP_GATE + 1
        # rows: the driver never materializes more than the gate,
        # regardless of how adversarial the cell-size distribution is
        # (an all-oversized k-cluster corpus collects gate+1 rows, not
        # k). Common case: empty -> sub = 0, no join, no window, no
        # barrier. Small overflow -> n_sub rides in as a literal map
        # (same plan-constant discipline as the centroid matrices).
        # Pathological overflow (limit hit) -> count window over the
        # cell, collect-free. The r4 shape instead joined a materialized
        # k-row aggregate back in; that extra job+checkpoint was ~1.4 s
        # of the ~1.6 s semdedup_artifact_build regression
        # (PERFORMANCE.md), and the unmaterialized join trips
        # DeduplicateRelations' INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on
        # ANSI sessions. None of the paths below self-join, so the bug
        # cannot fire.
        oversized = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_cell_size)
            .limit(_RESPLIT_MAP_GATE + 1)
            .collect()
        )
        if not oversized:
            assigned = assigned.withColumn("sub", F.lit(0).cast("bigint"))
        elif len(oversized) <= _RESPLIT_MAP_GATE:
            # one JVM-parsed expression, not per-element Columns: building
            # a k-entry map Column-by-Column costs a py4j round trip per
            # literal (the r4 plan-constant-matrix lesson); try_element_at
            # keeps the lookup ANSI-safe for the non-oversized clusters
            pairs = ", ".join(
                f"{int(r['cluster'])}, {int(-(-r['n'] // max_cell_size))}L"
                for r in sorted(oversized, key=lambda r: r["cluster"])
            )
            n_sub = F.expr(
                f"coalesce(try_element_at(map({pairs}), cluster), 1L)"
            ).cast("bigint")
            assigned = assigned.withColumn(
                "sub", F.pmod(F.col("vec_id").cast("bigint"), n_sub)
            )
        else:
            from pyspark.sql import Window

            w = Window.partitionBy("cluster")
            assigned = assigned.withColumn(
                "sub",
                F.pmod(
                    F.col("vec_id").cast("bigint"),
                    F.ceil(
                        F.count(F.lit(1)).over(w) / F.lit(float(max_cell_size))
                    ).cast("bigint"),
                ),
            )
    a = assigned.select(
        "cluster", "sub",
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
    )
    b = materialize(
        assigned.select(
            "cluster", "sub",
            F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        ),
        reliable,
    )
    sim = round_half_away(_dot(F.col("va"), F.col("vb")), 4)
    pairs = (
        a.join(b, ["cluster", "sub"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .where(F.col("sim") >= threshold)
    )
    return pairs.groupBy(
        F.col("id_b").alias("vec_id"), F.col("cluster").cast("int").alias("cluster")
    ).agg(F.max("sim").alias("max_sim"))
