"""Iterative graph operators: connected components via label propagation.

Near-duplicate PAIRS (minhash/simhash/LSH output) are not yet dedup
decisions — transitive chains (A~B, B~C) must collapse into one cluster
with one canonical survivor. That is connected components, the canonical
*iterative* algorithm of a dedup pipeline.

Spark-first shape: min-label propagation. Each iteration is one
distributed join + groupBy (labels flow across edges); the driver loop
only checks the converged-count, so total work is
O(diameter x |E|/cluster) — dedup graphs have tiny diameters (duplicate
chains), so this terminates in a handful of rounds. Per-iteration
``localCheckpoint`` truncates the lineage so the plan does not grow
exponentially with iterations (the classic iterative-algorithm trap).

The DuckDB oracle computes the same fixpoint as a recursive CTE
(transitive closure + min reachable id) — exact agreement, including
cluster ids (min doc id of the component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
    reliable: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    id = the minimum node id reachable from the node.

    ``reliable=True`` switches the per-iteration materialization from
    executor-local blocks to fault-tolerant checkpoints (see
    :mod:`.materialize`) — the cluster-scale mode where losing one
    executor must not restart a multi-hour run.
    """
    # materialize the symmetric edge list ONCE: edges often come from an
    # expensive pipeline (minhash etc.) and every iteration joins against
    # them — without this, each round re-runs the whole upstream plan
    sym = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        reliable,
    )
    labels = materialize(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id")),
        reliable,
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nb_label"))
        )
        # the changed flag rides along in the same pass: a node's label
        # moves iff a strictly smaller neighbor label arrived, so the
        # convergence probe is a scan of the checkpointed result rather
        # than an extra join against the previous labels
        new_labels = materialize(
            labels.join(neighbor_min, labels["id"] == neighbor_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
                (F.col("nb_label") < F.col("label")).alias("moved"),
            ),
            reliable,
        )
        changed = new_labels.where(F.col("moved")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id").alias("node"), F.col("label").alias("component"))
