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
