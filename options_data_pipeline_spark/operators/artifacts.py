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
) -> DataFrame:
    """Materialized ``builder()`` output, computed once per (session, key).

    ``key`` must name the artifact's full derivation (inputs + variant +
    thresholds); two different derivations must never share a key.
    """
    full_key = (spark.sparkContext.applicationId, key, reliable)
    df = _CACHE.get(full_key)
    if df is None:
        df = materialize(builder(), reliable)
        _CACHE[full_key] = df
        while len(_CACHE) > _MAX_ENTRIES:
            _CACHE.popitem(last=False)
    return df
