"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k via broadcast of the (small) query set
against the full corpus — the scan side stays partition-parallel, so this
is the right shape even at 100 TB as long as the query set broadcasts.
Scale path: LSH-bucketed variant (random hyperplane signs) that prunes the
candidate set before exact scoring, mirroring the MinHash-LSH design in
:mod:`.dedup`.

Dot products use ``zip_with`` + a left-fold ``aggregate`` in DOUBLE — a
native Catalyst expression evaluated element-by-element in a fixed order,
so results are deterministic and oracle-comparable (the DuckDB twin uses
``list_reduce`` with the same fold order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_half_away


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    corpus_id: str = "cid",
    query_vec: str = "qv",
    corpus_vec: str = "cv",
    sim_scale: int = 4,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (excluding itself), ranked on the rounded similarity
    with id tie-break so results are stable across engines."""
    pairs = corpus.crossJoin(F.broadcast(queries)).where(
        F.col(query_id) != F.col(corpus_id)
    )
    sim = round_half_away(cosine(F.col(query_vec), F.col(corpus_vec)), sim_scale)
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        pairs.withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id, corpus_id, "cosine_sim", F.col("rank").cast("long").alias("rank")
        )
    )
