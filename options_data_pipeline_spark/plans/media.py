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


def q_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-probe triage with a NON-circular oracle.

    Payloads are CONSTRUCTED as PNG-signature + IHDR headers carrying
    each doc's (n_chars, doc_id % 4096) as big-endian width/height —
    built with native byte expressions (unhex/lpad/hex, no UDF) — and
    every third doc gets raw text bytes instead (a non-PNG to triage
    out). The Spark side then runs the REAL ``probe_png_headers``
    mapInPandas kernel, which knows nothing about the construction: it
    struct-parses the binary at fixed offsets. The DuckDB oracle
    independently INVERTS the bytes with hex arithmetic
    (``('0x' || hex(substring(payload,17,4)))::BIGINT``), so the check
    is construct-in-SQL vs parse-in-Python — unlike the md5-symmetric
    fake-codec checks, a wrong offset, endianness, or magic test on
    either side breaks the hash.
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    be32 = lambda col: F.expr(  # noqa: E731 — big-endian 4-byte int
        f"unhex(lpad(hex(cast({col} as int)), 8, '0'))"
    )
    png_header = F.concat(
        F.expr("unhex('89504E470D0A1A0A')"),   # PNG signature
        F.expr("unhex('0000000D')"),           # IHDR length
        F.encode(F.lit("IHDR"), "UTF-8"),
        be32("n_chars"),                       # width
        be32("doc_id % 4096"),                 # height
        F.expr("unhex('0802000000')"),         # bit depth 8, color 2, ...
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("blob"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        F.when(
            F.col("doc_id") % 3 == 0, F.encode(F.col("text"), "UTF-8")
        )
        .otherwise(png_header)
        .alias("payload"),
    )
    probed = MM.probe_png_headers(media)
    return probed.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("is_png").cast("long")).alias("n_png"),
        F.sum("width").alias("sum_width"),
        F.sum("height").alias("sum_height"),
        F.sum(F.col("bit_depth") * F.lit(100) + F.col("color_type")).alias(
            "fmt_checksum"
        ),
    )


def oracle_media_probe() -> str:
    return """
WITH media AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'blob' ELSE 'image' END AS kind,
           CASE WHEN doc_id % 3 = 0 THEN encode(text)
                ELSE from_hex('89504E470D0A1A0A') || from_hex('0000000D')
                     || encode('IHDR')
                     || from_hex(lpad(hex(CAST(n_chars AS INT)), 8, '0'))
                     || from_hex(lpad(hex(CAST(doc_id % 4096 AS INT)), 8, '0'))
                     || from_hex('0802000000')
           END AS payload
    FROM documents
),
probed AS (
    -- DuckDB has no BLOB slicing: parse in hex-string space (2 hex
    -- chars per byte -> byte offset b is hex offset 2b-1)
    SELECT media_id, kind, hex(payload) AS h,
           length(hex(payload)) >= 52
           AND substr(hex(payload), 1, 16) = '89504E470D0A1A0A'
           AND substr(hex(payload), 25, 8) = '49484452' AS is_png,
           CAST(concat('0x', substr(hex(payload), 33, 8)) AS BIGINT)
               AS width,
           CAST(concat('0x', substr(hex(payload), 41, 8)) AS BIGINT)
               AS height,
           CAST(concat('0x', substr(hex(payload), 49, 2)) AS BIGINT)
               AS bit_depth,
           CAST(concat('0x', substr(hex(payload), 51, 2)) AS BIGINT)
               AS color_type
    FROM media
)
SELECT kind,
       count(*) AS n_media,
       CAST(SUM(CASE WHEN is_png THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
       CAST(SUM(CASE WHEN is_png THEN width END) AS BIGINT) AS sum_width,
       CAST(SUM(CASE WHEN is_png THEN height END) AS BIGINT) AS sum_height,
       CAST(SUM(CASE WHEN is_png THEN bit_depth * 100 + color_type END)
            AS BIGINT) AS fmt_checksum
FROM probed GROUP BY 1
"""
