"""JSON-lines document ingestion with corrupt-record quarantine.

Web-scale training corpora arrive as JSONL (one document object per
line, gzip-sharded); the reference never reads files at all (its inputs
are REST APIs, reference src/pipeline/collectors/*), so this extends the
source surface the way a Spark-native corpus pipeline needs it:

- **Schema-explicit reads.** Inferring a schema over 100 TB of JSONL
  means a full extra pass; the reader always takes an explicit schema
  and keeps the scan single-pass. Column pruning still applies (Spark's
  JSON reader parses only the requested fields).
- **PERMISSIVE + quarantine, not fail-fast.** At corpus scale some lines
  are always mangled. The reader runs in PERMISSIVE mode with a
  ``_corrupt_record`` capture column: :func:`split_corrupt` routes bad
  lines to a quarantine DataFrame (the T6-style self-heal posture —
  ingest never stops, bad data is preserved for repair) while the clean
  side drops the capture column.
- **Deterministic doc ids.** Corpus joins need a stable key; when the
  input has none, :func:`with_doc_id` derives one as md5 over the raw
  line content — content-addressed, replay-stable, no
  ``monotonically_increasing_id`` partition-layout dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Read JSONL with an explicit schema; malformed lines land in
    ``_corrupt_record`` instead of failing the job."""
    # StructType.add mutates in place — build a fresh copy instead so the
    # caller's schema object survives repeated reads intact
    capture = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(capture)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV twin of :func:`read_jsonl`: explicit schema, PERMISSIVE parse,
    malformed lines captured in ``_corrupt_record`` for
    :func:`split_corrupt`."""
    capture = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(capture)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the capture column, corrupt
    rows keep only it (the raw line, for repair/re-ingest).

    Spark refuses to answer queries that reference *only* the corrupt
    column straight off a JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN):
    the parsed result must be materialized first. ``cache()`` here also
    means the two output branches share one parse of the input."""
    df = df.cache()
    corrupt = F.col(CORRUPT_COL).isNotNull()
    clean = df.where(~corrupt).drop(CORRUPT_COL)
    quarantine = df.where(corrupt).select(F.col(CORRUPT_COL).alias("raw_line"))
    return clean, quarantine


def with_doc_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content-addressed stable id: the first 16 hex of md5(text) as a
    bigint. Deterministic under replay and independent of partition
    layout (unlike monotonically_increasing_id)."""
    hex16 = F.substring(F.md5(F.col(text_col)), 1, 15)
    return df.withColumn("doc_id", F.conv(hex16, 16, 10).cast("long"))
