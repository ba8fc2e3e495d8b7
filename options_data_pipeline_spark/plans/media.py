"""Multimodal queries over ``documents`` reinterpreted as binary media.

The corpus is pure ASCII (verified), so DuckDB can reproduce the byte
semantics of the Pandas-UDF kernels exactly: octet counts are string
lengths, byte sums are ascii-code sums, and md5-over-bytes equals
md5-over-text. That makes even the ``mapInPandas`` path hash-checkable —
the fake decode kernel is deterministic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal as MM
from ..sources.tables import load_table, parallelized

_KIND_SQL = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)
_ASCII_SUM = (
    "CAST(list_sum(list_transform(range(1, length(text) + 1),"
    " i -> ascii(substring(text, i, 1)))) AS BIGINT)"
)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.extract_features(MM.documents_as_media(docs))


def oracle_media_features() -> str:
    return f"""
SELECT doc_id AS media_id, {_KIND_SQL} AS kind,
       CAST(length(text) AS BIGINT) AS n_bytes,
       {_ASCII_SUM} AS sum_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = MM.sample_frames(MM.documents_as_media(docs), frame_bytes=64, every_n=2)
    return frames.select("media_id", "frame_no", "frame_md5")


def oracle_media_frames() -> str:
    # Plain select-list unnest (not LATERAL) — portable across DuckDB
    # versions; LATERAL-correlated unnest is newer syntax and was the
    # suspected cause of the round-1 driver dropping this query's row.
    return """
SELECT media_id, CAST(f AS BIGINT) AS frame_no,
       md5(substring(text, CAST(f * 64 + 1 AS INT), 64)) AS frame_md5
FROM (
  SELECT doc_id AS media_id, text,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS f
  FROM documents
)
WHERE f % 2 = 0
"""


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over opaque *binary* payloads: digest every payload in
    the ``mapInPandas`` feature pass, then one map-side-combined groupBy
    on the md5 — the scale shape for petabyte media dedup (bytes never
    shuffle; only 16-byte digests do). Runs over the planted corpus (see
    plans.text) so duplicate groups provably exist."""
    from pyspark.sql import functions as F

    from .text import planted_corpus

    media = MM.documents_as_media(planted_corpus(spark, sf_dir))
    feats = MM.extract_features(media)
    return (
        feats.groupBy("payload_md5")
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .where(F.col("n_copies") > 1)
    )


def oracle_media_dedup() -> str:
    from .text import _PLANTED_SQL

    return f"""
WITH {_PLANTED_SQL.strip()}
SELECT md5(text) AS payload_md5,
       min(doc_id) AS canonical_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(length(text)) AS BIGINT) AS n_bytes
FROM corpus
GROUP BY 1
HAVING count(*) > 1
"""
