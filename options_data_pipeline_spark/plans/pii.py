"""PII-scrub / contamination queries over ``documents``.

The synthetic corpus contains no natural PII, so (exactly like
``plans/text.py``'s planted duplicates) both engines deterministically
plant it: id-derived emails, phone numbers, SSNs, IPv4 addresses, and a
benchmark canary phrase are appended to ``doc_id``-selected rows in a
fixed order. The Spark plan and the DuckDB oracle build the identical
corpus, so detection counts AND the redacted text itself (as md5) are
hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pii as P
from ..sources.tables import load_table

CONTAMINATION_PROBES = [
    "the quick brown fox jumps over the lazy dog",
    "four score and seven years ago",
]


def _planted(cond: Column, *parts: Column) -> Column:
    return F.when(cond, F.concat(*parts)).otherwise(F.lit(""))


def pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT parallelized: the scrub family's contract is a zero-shuffle
    # narrow pipeline (scan -> project, CI-pinned) — at production scale
    # the scan is well-partitioned and a repartition of full text rows
    # is pure cost; the local under-partitioning only costs ~0.2 s here
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = did.cast("string")
    text = F.concat(
        F.col("text"),
        _planted(did % 7 == 0, F.lit(" reach me at user"), s, F.lit("@example.com")),
        _planted(
            did % 11 == 0,
            F.lit(" call 555-"),
            (did % 900 + 100).cast("string"),
            F.lit("-"),
            (did % 9000 + 1000).cast("string"),
        ),
        _planted(
            did % 13 == 0,
            F.lit(" ssn is "),
            (did % 900 + 100).cast("string"),
            F.lit("-"),
            (did % 90 + 10).cast("string"),
            F.lit("-"),
            (did % 9000 + 1000).cast("string"),
        ),
        _planted(
            did % 17 == 0,
            F.lit(" from 10.0."),
            (did % 256).cast("string"),
            F.lit("."),
            (did % 250).cast("string"),
        ),
        _planted(did % 23 == 0, F.lit(" " + CONTAMINATION_PROBES[0])),
    )
    return docs.select("doc_id", text.alias("text"), "lang", "source")


_PII_CORPUS_SQL = """
corpus AS (
    SELECT doc_id,
        text
        || CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 13 = 0 THEN ' ssn is ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 90 + 10 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 17 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 23 = 0 THEN ' the quick brown fox jumps over the lazy dog' ELSE '' END
        AS text,
        lang, source
    FROM documents
)
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect -> redact -> contamination-flag, one narrow expression
    pipeline (no shuffle at all: every column derives from the row)."""
    corpus = pii_corpus(spark, sf_dir)
    out = P.flag_contamination(
        P.redact_pii(P.detect_pii(corpus)), CONTAMINATION_PROBES
    )
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        "n_pii",
        "is_contaminated",
        F.md5("redacted_text").alias("redacted_md5"),
    )


def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-overlap decontamination (scales to millions of probe
    n-grams where the verbatim-substring scan cannot): planted canary
    docs must surface with their full probe-bigram hit counts."""
    corpus = pii_corpus(spark, sf_dir)
    return P.ngram_contamination(corpus, CONTAMINATION_PROBES, min_hits=2)


def oracle_ngram_contamination() -> str:
    probes = ", ".join(f"('{p}')" for p in CONTAMINATION_PROBES)
    bigrams = (
        "list_transform(range(1, len(string_split(text, ' '))), "
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])"
    )
    return f"""
WITH {_PII_CORPUS_SQL.strip()},
doc_sh AS (
    SELECT DISTINCT doc_id, shingle
    FROM (SELECT doc_id, unnest({bigrams}) AS shingle FROM corpus)
),
probes(text) AS (VALUES {probes}),
probe_sh AS (
    SELECT DISTINCT unnest({bigrams}) AS shingle FROM probes
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits
FROM doc_sh JOIN probe_sh USING (shingle)
GROUP BY doc_id
HAVING count(*) >= 2
"""


def oracle_pii_scrub() -> str:
    counts = []
    redacted = "text"
    for name, pattern, token in P.PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all(text, '{pattern}')) AS BIGINT) AS n_{name}"
        )
        redacted = f"regexp_replace({redacted}, '{pattern}', '{token}', 'g')"
    probes = " OR ".join(f"contains(text, '{p}')" for p in CONTAMINATION_PROBES)
    return f"""
WITH {_PII_CORPUS_SQL.strip()}
SELECT doc_id,
    {", ".join(counts)},
    CAST(len(regexp_extract_all(text, '{P.PII_PATTERNS[0][1]}'))
       + len(regexp_extract_all(text, '{P.PII_PATTERNS[1][1]}'))
       + len(regexp_extract_all(text, '{P.PII_PATTERNS[2][1]}'))
       + len(regexp_extract_all(text, '{P.PII_PATTERNS[3][1]}')) AS BIGINT) AS n_pii,
    ({probes}) AS is_contaminated,
    md5({redacted}) AS redacted_md5
FROM corpus
"""
