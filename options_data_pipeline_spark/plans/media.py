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


def q_video_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-container triage closing the media triple (PNG, WAV, MP4),
    same NON-circular oracle discipline: payloads are CONSTRUCTED as
    ISO-BMFF box lists — ``ftyp`` (major brand 'isom') then
    ``moov``/``mvhd`` carrying (timescale = n_chars, duration =
    doc_id % 65536) as big-endian u32 — via native byte expressions.
    The Spark side runs the REAL ``probe_mp4_headers`` box WALKER
    (iterative size-chained parse, one level of recursion into moov —
    it knows nothing of the construction), and the DuckDB oracle
    independently inverts the fields with hex-substring arithmetic plus
    the structural prefix checks. A wrong box size, offset, or
    endianness on either side breaks the hash. Every third doc carries
    raw text bytes — a text blob's first 4 ASCII bytes read as a
    >500 MB box size, so the walker triages it out on the very first
    header, which the oracle mirrors by checking the constructed
    prefix.
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    be32 = lambda col: F.expr(  # noqa: E731 — big-endian 4-byte int
        f"unhex(lpad(hex(cast({col} as int)), 8, '0'))"
    )
    mp4_header = F.concat(
        be32("20"),                          # ftyp box size
        F.encode(F.lit("ftyp"), "UTF-8"),
        F.encode(F.lit("isom"), "UTF-8"),    # major brand
        be32("512"),                         # minor version
        F.encode(F.lit("mp41"), "UTF-8"),    # compatible brand
        be32("36"),                          # moov box size (8 + mvhd 28)
        F.encode(F.lit("moov"), "UTF-8"),
        be32("28"),                          # mvhd box size
        F.encode(F.lit("mvhd"), "UTF-8"),
        be32("0"),                           # version + flags
        be32("0"),                           # creation time
        be32("0"),                           # modification time
        be32("n_chars"),                     # timescale
        be32("doc_id % 65536"),              # duration
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("blob"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.when(
            F.col("doc_id") % 3 == 0, F.encode(F.col("text"), "UTF-8")
        )
        .otherwise(mp4_header)
        .alias("payload"),
    )
    probed = MM.probe_mp4_headers(parallelized(spark, media))
    return probed.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("is_mp4").cast("long")).alias("n_mp4"),
        F.max("brand").alias("brand"),
        F.sum("timescale").alias("sum_timescale"),
        F.sum("duration").alias("sum_duration"),
        F.sum(
            F.when(F.col("is_mp4"), F.col("n_boxes"))
        ).cast("long").alias("n_boxes_mp4"),
    )


def oracle_video_probe() -> str:
    return """
WITH media AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'blob' ELSE 'video' END AS kind,
           CASE WHEN doc_id % 3 = 0 THEN encode(text)
                ELSE from_hex('00000014') || encode('ftyp') || encode('isom')
                     || from_hex('00000200') || encode('mp41')
                     || from_hex('00000024') || encode('moov')
                     || from_hex('0000001C') || encode('mvhd')
                     || from_hex('000000000000000000000000')
                     || from_hex(lpad(hex(CAST(n_chars AS INT)), 8, '0'))
                     || from_hex(lpad(hex(CAST(doc_id % 65536 AS INT)), 8, '0'))
           END AS payload
    FROM documents
),
probed AS (
    -- hex-space parse (2 hex chars per byte -> byte offset b is hex
    -- offset 2b+1): structural prefix checks stand in for the walker's
    -- size-chain (the construction is fixed-layout), field inversions
    -- pin offsets/endianness
    SELECT media_id, kind, hex(payload) AS h,
           octet_length(payload) = 56
           AND substr(hex(payload), 1, 8) = '00000014'
           AND substr(hex(payload), 9, 8) = '66747970'
           AND substr(hex(payload), 41, 8) = '00000024'
           AND substr(hex(payload), 49, 8) = '6D6F6F76'
           AND substr(hex(payload), 57, 8) = '0000001C'
           AND substr(hex(payload), 65, 8) = '6D766864' AS is_mp4,
           -- TRY_CAST: a text blob shorter than the parsed offsets
           -- yields empty substrings ('0x' alone); those rows are
           -- excluded by is_mp4, but the projection must not error
           concat(
               chr(TRY_CAST(concat('0x', substr(hex(payload), 17, 2)) AS INT)),
               chr(TRY_CAST(concat('0x', substr(hex(payload), 19, 2)) AS INT)),
               chr(TRY_CAST(concat('0x', substr(hex(payload), 21, 2)) AS INT)),
               chr(TRY_CAST(concat('0x', substr(hex(payload), 23, 2)) AS INT))
           ) AS brand_raw,
           TRY_CAST(concat('0x', substr(hex(payload), 97, 8)) AS BIGINT)
               AS timescale,
           TRY_CAST(concat('0x', substr(hex(payload), 105, 8)) AS BIGINT)
               AS duration
    FROM media
)
SELECT kind,
       count(*) AS n_media,
       CAST(SUM(CASE WHEN is_mp4 THEN 1 ELSE 0 END) AS BIGINT) AS n_mp4,
       MAX(CASE WHEN is_mp4 THEN brand_raw END) AS brand,
       CAST(SUM(CASE WHEN is_mp4 THEN timescale END) AS BIGINT)
           AS sum_timescale,
       CAST(SUM(CASE WHEN is_mp4 THEN duration END) AS BIGINT)
           AS sum_duration,
       CAST(SUM(CASE WHEN is_mp4 THEN 2 END) AS BIGINT) AS n_boxes_mp4
FROM probed GROUP BY 1
"""


def q_audio_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio triage with the same NON-circular oracle discipline as
    `media_probe`, for the WAV container: payloads are CONSTRUCTED as
    RIFF/WAVE + fmt + data-chunk headers carrying per-doc parameters
    (channels from doc_id parity, sample rate from doc_id, frame count
    from n_chars) via native little-endian byte expressions; the Spark
    side parses them with the REAL ``probe_wav_headers`` struct kernel
    (which knows nothing of the construction), and the DuckDB oracle
    independently INVERTS the little-endian fields with hex-substring
    arithmetic. A wrong offset, endianness, or magic test on either
    side breaks the hash. Every third doc carries raw text bytes (the
    non-audio to triage out).
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )

    def le(col_expr: str, nbytes: int):
        parts = ", ".join(
            f"lpad(hex(CAST(({col_expr}) div {256 ** i} % 256 AS INT)), 2, '0')"
            for i in range(nbytes)
        )
        return F.expr(f"unhex(concat({parts}))")

    channels = "1 + doc_id % 2"
    rate = "8000 + (doc_id % 8) * 1000"
    balign = f"({channels}) * 2"
    dsize = f"n_chars * ({balign})"
    wav_header = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(f"36 + {dsize}", 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le("16", 4),                      # fmt chunk size
        le("1", 2),                       # PCM
        le(channels, 2),
        le(rate, 4),
        le(f"({rate}) * ({balign})", 4),  # byte rate
        le(balign, 2),
        le("16", 2),                      # bits per sample
        F.encode(F.lit("data"), "UTF-8"),
        le(dsize, 4),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("blob"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        F.when(F.col("doc_id") % 3 == 0, F.encode(F.col("text"), "UTF-8"))
        .otherwise(wav_header)
        .alias("payload"),
    )
    probed = MM.probe_wav_headers(media)
    return probed.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("is_wav").cast("long")).alias("n_wav"),
        F.sum("n_channels").alias("sum_channels"),
        F.sum("sample_rate").alias("sum_rate"),
        F.sum("n_frames").alias("sum_frames"),
        F.sum("bits_per_sample").alias("sum_bits"),
    )


def oracle_audio_probe() -> str:
    # little-endian inversion in hex-string space: byte offset o (0-based)
    # lives at hex offset 2*o + 1 (1-based); LE value = sum of byte_i*256^i
    def le_val(byte_off: int, nbytes: int) -> str:
        terms = " + ".join(
            f"CAST(concat('0x', substr(h, {2 * (byte_off + i) + 1}, 2)) AS BIGINT)"
            f" * {256 ** i}"
            for i in range(nbytes)
        )
        return f"({terms})"

    ch = le_val(22, 2)
    rate = le_val(24, 4)
    balign = le_val(32, 2)
    bits = le_val(34, 2)
    dsize = le_val(40, 4)
    return f"""
WITH media AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'blob' ELSE 'audio' END AS kind,
           CASE WHEN doc_id % 3 = 0 THEN encode(text)
                ELSE encode('RIFF')
                     || from_hex(lpad(hex(CAST((36 + n_chars * ((1 + doc_id % 2) * 2)) % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((36 + n_chars * ((1 + doc_id % 2) * 2)) // 256 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((36 + n_chars * ((1 + doc_id % 2) * 2)) // 65536 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((36 + n_chars * ((1 + doc_id % 2) * 2)) // 16777216 % 256 AS INT)), 2, '0'))
                     || encode('WAVEfmt ')
                     || from_hex('10000000') || from_hex('0100')
                     || from_hex(lpad(hex(CAST((1 + doc_id % 2) % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((1 + doc_id % 2) // 256 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((8000 + (doc_id % 8) * 1000) % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((8000 + (doc_id % 8) * 1000) // 256 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((8000 + (doc_id % 8) * 1000) // 65536 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((8000 + (doc_id % 8) * 1000) // 16777216 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST(((8000 + (doc_id % 8) * 1000) * ((1 + doc_id % 2) * 2)) % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST(((8000 + (doc_id % 8) * 1000) * ((1 + doc_id % 2) * 2)) // 256 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST(((8000 + (doc_id % 8) * 1000) * ((1 + doc_id % 2) * 2)) // 65536 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST(((8000 + (doc_id % 8) * 1000) * ((1 + doc_id % 2) * 2)) // 16777216 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST(((1 + doc_id % 2) * 2) % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST(((1 + doc_id % 2) * 2) // 256 % 256 AS INT)), 2, '0'))
                     || from_hex('1000')
                     || encode('data')
                     || from_hex(lpad(hex(CAST((n_chars * ((1 + doc_id % 2) * 2)) % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((n_chars * ((1 + doc_id % 2) * 2)) // 256 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((n_chars * ((1 + doc_id % 2) * 2)) // 65536 % 256 AS INT)), 2, '0'))
                     || from_hex(lpad(hex(CAST((n_chars * ((1 + doc_id % 2) * 2)) // 16777216 % 256 AS INT)), 2, '0'))
           END AS payload
    FROM documents
),
probed AS (
    SELECT media_id, kind, hex(payload) AS h,
           octet_length(payload) AS n_bytes
    FROM media
),
parsed AS (
    SELECT media_id, kind,
           CASE WHEN n_bytes >= 44
                     AND substr(h, 1, 8) = '52494646'
                     AND substr(h, 17, 8) = '57415645'
                     AND substr(h, 25, 8) = '666D7420'
                THEN {le_val(20, 2)} = 1
           AND substr(h, 73, 8) = '64617461'
                     AND {balign} > 0
                ELSE FALSE END AS is_wav,
           CASE WHEN n_bytes >= 44 THEN {ch} END AS n_channels,
           CASE WHEN n_bytes >= 44 THEN {rate} END AS sample_rate,
           CASE WHEN n_bytes >= 44 THEN {bits} END AS bits_per_sample,
           CASE WHEN n_bytes >= 44 AND {balign} > 0 THEN {dsize} // {balign} END AS n_frames
    FROM probed
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(SUM(CASE WHEN is_wav THEN 1 ELSE 0 END) AS BIGINT) AS n_wav,
       CAST(SUM(CASE WHEN is_wav THEN n_channels END) AS BIGINT) AS sum_channels,
       CAST(SUM(CASE WHEN is_wav THEN sample_rate END) AS BIGINT) AS sum_rate,
       CAST(SUM(CASE WHEN is_wav THEN n_frames END) AS BIGINT) AS sum_frames,
       CAST(SUM(CASE WHEN is_wav THEN bits_per_sample END) AS BIGINT) AS sum_bits
FROM parsed GROUP BY 1
"""


# deterministic synthetic waveform: s_i = ((doc_id + i) % 251) - 125,
# int16 range, encoded two's-complement little-endian
_PCM_N = "least(n_chars, 256)"   # samples per doc, bounded for plan sanity


def q_media_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full REAL audio decode, adversarially checked: each doc carries a
    mono 16-bit WAV whose PCM samples follow a known formula; Spark
    struct-parses every byte of the stream (`operators/multimodal.py`
    ``pcm_stats``) while the oracle computes the identical statistics
    FROM THE FORMULA (unnested ranges, never touching the bytes). The
    construction encodes two's-complement little-endian int16 with
    native expressions; a sign, endianness, or offset defect in the
    decode kernel — or the construction — breaks the hash. All
    statistics are exact integers.
    """
    from pyspark.sql import functions as F

    # parallelized: the per-row work (build + struct-decode a full PCM
    # stream) dwarfs the repartition of two skinny columns
    docs = parallelized(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )

    n = _PCM_N
    sample = f"((doc_id + i) % 251) - 125"
    enc = f"((({sample}) + 65536) % 65536)"
    data_hex = (
        f"concat_ws('', transform(sequence(0, {n} - 1), i -> "
        f"concat(lpad(hex(CAST({enc} % 256 AS INT)), 2, '0'), "
        f"lpad(hex(CAST({enc} div 256 AS INT)), 2, '0'))))"
    )

    def le(col_expr: str, nbytes: int):
        parts = ", ".join(
            f"lpad(hex(CAST(({col_expr}) div {256 ** i} % 256 AS INT)), 2, '0')"
            for i in range(nbytes)
        )
        return F.expr(f"unhex(concat({parts}))")

    dsize = f"({n}) * 2"
    payload = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(f"36 + {dsize}", 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le("16", 4), le("1", 2), le("1", 2),       # PCM, mono
        le("8000", 4), le("16000", 4),             # rate, byte rate
        le("2", 2), le("16", 2),                   # block align, bits
        F.encode(F.lit("data"), "UTF-8"),
        le(dsize, 4),
        F.expr(f"unhex({data_hex})"),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"), payload.alias("payload")
    )
    stats = MM.pcm_stats(media)
    return stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_payloads"),
        F.sum(F.col("is_wav").cast("long")).alias("n_wav"),
        F.sum("n_samples").cast("long").alias("total_samples"),
        F.sum("sum_abs").cast("long").alias("total_abs"),
        F.max("peak").cast("long").alias("max_peak"),
    )


def oracle_media_pcm_stats() -> str:
    # the oracle NEVER builds or parses bytes: it evaluates the
    # generating formula directly over an unnested sample index range
    return """
WITH per_doc AS (
    SELECT doc_id, least(n_chars, 256) AS n FROM documents
),
samples AS (
    SELECT doc_id, unnest(range(0, n)) AS i, n FROM per_doc
),
vals AS (
    SELECT doc_id, abs(((doc_id + i) % 251) - 125) AS a FROM samples
)
SELECT CAST((SELECT count(*) FROM per_doc) AS BIGINT) AS n_payloads,
       CAST((SELECT count(*) FROM per_doc) AS BIGINT) AS n_wav,
       CAST((SELECT SUM(n) FROM per_doc) AS BIGINT) AS total_samples,
       CAST(SUM(a) AS BIGINT) AS total_abs,
       CAST(MAX(a) AS BIGINT) AS max_peak
FROM vals
"""


# --- image_probe: FULL stdlib PNG decode, adversarially constructed ---
# Per-doc image parameters (image docs only; every 3rd doc carries raw
# text bytes as the non-image to triage out):
#   W = 2 + doc_id % 3, H = 2 + doc_id % 2, stride R = 3W, base = 7*doc_id
#   raw pixel byte (y, j) = (base + y*R + j) % 256
#   row y is stored with PNG filter type y % 3 (None / Sub / Up)
# The arithmetic-progression pixels make the FILTERED bytes closed-form
# (Sub rows become [raw0, raw1, raw2, 3, 3, ...]; Up rows become the
# constant R % 256), so the whole payload — zlib stream with a STORED
# deflate block, adler32 via an aggregate fold, chunk CRCs via crc32()
# — is built from native expressions. The decode kernel
# (operators/multimodal.py decode_png_pixels) walks chunks, verifies
# CRCs, inflates with real zlib, and reconstructs the scanlines; the
# oracle evaluates the raw-pixel formula directly and never touches
# bytes. A defect in the chunk walk, CRC/adler math, stored-block
# framing, or filter reconstruction on either side breaks the hash.
_IMG_W = "(2 + doc_id % 3)"
_IMG_H = "(2 + doc_id % 2)"
_IMG_R = f"(3 * {_IMG_W})"
_IMG_BASE = "(doc_id * 7)"


def q_image_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = parallelized(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def be(col_expr: str, nbytes: int):
        parts = ", ".join(
            f"lpad(hex(CAST(({col_expr}) div {256 ** i} % 256 AS INT)), 2, '0')"
            for i in range(nbytes - 1, -1, -1)
        )
        return F.expr(f"unhex(concat({parts}))")

    # filtered scanlines as array<bigint>: one filter byte + R data bytes
    # per row (see the construction note above)
    data_arr = f"""
    flatten(transform(sequence(0, {_IMG_H} - 1), y -> concat(
      array(CAST(y % 3 AS BIGINT)),
      transform(sequence(0, {_IMG_R} - 1), j -> CAST(
        CASE
          WHEN y % 3 = 0 THEN ({_IMG_BASE} + y * {_IMG_R} + j) % 256
          WHEN y % 3 = 1 THEN IF(j < 3, ({_IMG_BASE} + y * {_IMG_R} + j) % 256, 3)
          ELSE {_IMG_R} % 256
        END AS BIGINT)))))
    """
    with_data = (
        docs.withColumn("data", F.expr(data_arr))
        .withColumn("dlen", F.size("data").cast("long"))
        .withColumn(
            "ad",
            F.expr(
                "aggregate(data, named_struct('s1', 1L, 's2', 0L), "
                "(a, b) -> named_struct('s1', (a.s1 + b) % 65521, "
                "'s2', (a.s2 + a.s1 + b) % 65521))"
            ),
        )
        .withColumn(
            "zarr",
            F.expr(
                # zlib header 78 01, stored-block header (final, LEN, NLEN),
                # raw data, adler32 big-endian (s2_hi s2_lo s1_hi s1_lo)
                "concat(array(120L, 1L, 1L, dlen % 256, dlen div 256, "
                "(65535 - dlen) % 256, (65535 - dlen) div 256), data, "
                "array(ad.s2 div 256, ad.s2 % 256, ad.s1 div 256, ad.s1 % 256))"
            ),
        )
        .withColumn(
            "zbin",
            F.expr("unhex(concat_ws('', transform(zarr, b -> lpad(hex(b), 2, '0'))))"),
        )
        .withColumn("ihdr_body", F.concat(be(_IMG_W, 4), be(_IMG_H, 4), F.expr("x'0802000000'")))
        .withColumn("ihdr_tagged", F.concat(F.encode(F.lit("IHDR"), "UTF-8"), F.col("ihdr_body")))
        .withColumn("idat_tagged", F.concat(F.encode(F.lit("IDAT"), "UTF-8"), F.col("zbin")))
    )
    png = F.concat(
        F.expr("x'89504E470D0A1A0A'"),
        be("13", 4),
        F.col("ihdr_tagged"),
        be("crc32(ihdr_tagged)", 4),
        be("octet_length(zbin)", 4),
        F.col("idat_tagged"),
        be("crc32(idat_tagged)", 4),
        be("0", 4),
        F.encode(F.lit("IEND"), "UTF-8"),
        F.expr("x'AE426082'"),
    )
    media = with_data.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("blob"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        F.when(F.col("doc_id") % 3 == 0, F.encode(F.col("text"), "UTF-8"))
        .otherwise(png)
        .alias("payload"),
    )
    probed = MM.decode_png_pixels(media)
    from pyspark.sql import functions as F2

    return probed.groupBy("kind").agg(
        F2.count(F2.lit(1)).alias("n_media"),
        F2.sum(F2.col("is_png").cast("long")).alias("n_png"),
        F2.sum("width").cast("long").alias("sum_width"),
        F2.sum("height").cast("long").alias("sum_height"),
        F2.sum("n_px").cast("long").alias("sum_pixels"),
        F2.sum("sum_px").cast("long").alias("sum_pixel_bytes"),
        F2.sum("sum_r").cast("long").alias("sum_red"),
    )


def oracle_image_probe() -> str:
    # formula-only: the oracle never builds or parses a byte of PNG
    return """
WITH per_doc AS (
    SELECT doc_id, (2 + doc_id % 3) AS w, (2 + doc_id % 2) AS h,
           CASE WHEN doc_id % 3 = 0 THEN 'blob' ELSE 'image' END AS kind
    FROM documents
),
ys AS (
    SELECT doc_id, w, unnest(range(0, h)) AS y
    FROM per_doc WHERE kind = 'image'
),
pix AS (
    SELECT doc_id, w, y, unnest(range(0, 3 * w)) AS j FROM ys
),
vals AS (
    SELECT doc_id, j, (doc_id * 7 + y * 3 * w + j) % 256 AS v FROM pix
),
doc_stats AS (
    SELECT doc_id, SUM(v) AS sum_px,
           SUM(CASE WHEN j % 3 = 0 THEN v END) AS sum_r
    FROM vals GROUP BY doc_id
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
       CAST(SUM(CASE WHEN kind = 'image' THEN w END) AS BIGINT) AS sum_width,
       CAST(SUM(CASE WHEN kind = 'image' THEN h END) AS BIGINT) AS sum_height,
       CAST(SUM(CASE WHEN kind = 'image' THEN w * h END) AS BIGINT) AS sum_pixels,
       CAST(SUM(s.sum_px) AS BIGINT) AS sum_pixel_bytes,
       CAST(SUM(s.sum_r) AS BIGINT) AS sum_red
FROM per_doc LEFT JOIN doc_stats s USING (doc_id)
GROUP BY kind
"""
