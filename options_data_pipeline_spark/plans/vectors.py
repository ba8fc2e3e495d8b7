"""Similarity-search queries over ``embeddings`` (array<float>, 64-dim)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_round_half_away
from ..operators.similarity import cosine_topk
from ..sources.tables import load_table

N_QUERIES = 20
TOP_K = 5


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    return cosine_topk(queries, corpus, k=TOP_K)


def oracle_ann_cosine_topk() -> str:
    # Same left-fold dot product as the Spark expression (list_reduce is a
    # sequential fold; 0.0 + x1 == x1 bitwise), same rounded-sim ranking.
    dot = (
        "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    qq = (
        "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * qv[i]),"
        " (acc, x) -> acc + x)"
    )
    cc = (
        "list_reduce(list_transform(range(1, len(cv)+1), i -> cv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    sim = sql_round_half_away(f"({dot} / sqrt({qq} * {cc}))", 4)
    return f"""
WITH q AS (
    SELECT vec_id AS qid,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
    SELECT vec_id AS cid,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings
),
pairs AS (
    SELECT qid, cid, {sim} AS cosine_sim
    FROM q CROSS JOIN c
    WHERE qid != cid
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cosine_sim DESC, cid ASC) AS rank
    FROM pairs
)
SELECT qid, cid, cosine_sim, rank FROM rk WHERE rank <= {TOP_K}
"""
