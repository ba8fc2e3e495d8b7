"""Lineage-truncation helper for iterative operators.

Iterative algorithms (label propagation, LSH pipelines re-using a
shingle store) must cut lineage every iteration or the plan grows without
bound. Two ways to cut it, with different failure semantics:

- ``localCheckpoint()`` — executor-local block storage. Cheapest (no
  DFS write) and the right default on local[*] and for benchmarks, but
  the blocks die with their executor: on a real cluster a lost node
  forces a full recompute *from the beginning* (the lineage is gone).
- ``checkpoint()`` — reliable checkpoint to the SparkContext checkpoint
  directory (HDFS/object store on a cluster). Survives executor loss,
  which is what a 100 TB dedup job wants: a multi-hour connected-
  components run must not restart because one of 1000 executors died.

Operators take ``reliable: bool = False`` and route through
:func:`materialize`, so the policy is a one-flag switch at the call
site rather than a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Cut ``df``'s lineage, returning a materialized frame.

    ``reliable=True`` uses a fault-tolerant ``checkpoint()`` and requires
    ``spark.sparkContext.setCheckpointDir(...)`` to point at storage that
    survives executor loss (HDFS/S3/... on a cluster)."""
    if not reliable:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable=True needs a checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir('<dfs path>') first "
            "(a path that survives executor loss)."
        )
    return df.checkpoint()
