"""Session-scoped cache for deterministic derived artifacts.

A curation pass over an immutable corpus snapshot derives the same
intermediate tables again and again: the hashed shingle store feeds
MinHash signatures, the verified near-dup pairs feed pairwise removal,
transitive clustering, survivor election, and incremental batch
adjudication. Recomputing them per query is pure waste — a production
pipeline materializes such artifacts once per snapshot (a feature/
artifact store) and every downstream job reads the materialization.

This module is the in-session equivalent: ``session_artifact`` builds a
derived frame once per (SparkSession, key), cuts its lineage via
:func:`.materialize.materialize`, and hands the same materialized frame
to every subsequent consumer. Correctness is unaffected — cached
artifacts are deterministic functions of the immutable inputs named by
the key — and plan-shape tests exercise the operators directly, below
this cache, so the audited plans stay the real ones.

Keys are namespaced by ``applicationId`` so a cached frame can never
leak into a different session (checkpointed blocks die with their
SparkContext). The cache is bounded FIFO; at the default size it holds
a handful of skinny per-doc tables.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .materialize import materialize

_MAX_ENTRIES = 32
_CACHE: OrderedDict[tuple, DataFrame] = OrderedDict()


def session_artifact(
    spark: SparkSession,
    key: str,
    builder: Callable[[], DataFrame],
    reliable: bool = False,
    store_dir: str | None = None,
) -> DataFrame:
    """Materialized ``builder()`` output, computed once per (session, key).

    ``key`` must name the artifact's full derivation (inputs + variant +
    thresholds); two different derivations must never share a key.

    ``store_dir`` upgrades the in-session memo to a PERSISTED artifact
    store: the artifact is written to ``<store_dir>/<key-slug>`` parquet
    on first build and read back by every later consumer — including
    consumers in *other* sessions. This is the 100 TB posture: derived
    tables of an immutable corpus snapshot (signatures, near-dup pairs,
    LM scores) survive the cluster that computed them, and downstream
    jobs scan the store instead of recomputing. Executor loss costs
    nothing (the store is on the DFS), unlike ``localCheckpoint``.
    """
    full_key = (spark.sparkContext.applicationId, key, reliable, store_dir)
    df = _CACHE.get(full_key)
    if df is not None:
        return df
    if store_dir is not None:
        path = f"{store_dir}/{_slug(key)}"
        try:
            df = spark.read.parquet(path)
            df.schema  # force a footer read: missing/corrupt -> rebuild
        except Exception:
            builder().write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
    else:
        df = materialize(builder(), reliable)
    _CACHE[full_key] = df
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return df


def _slug(key: str) -> str:
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
