"""PII detection/redaction and benchmark-contamination flagging.

A training-data pipeline must scrub personally identifiable information
and drop documents that leak evaluation benchmarks before anything
reaches a training shard. Both are pure expression work — regexp counts,
regexp replaces, substring probes — so they run inside whole-stage
codegen, scale linearly with input splits, and never leave the JVM (the
reference engine has no equivalent; this extends its surface the way
SURVEY §6 prescribes for LLM-data workloads).

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB oracle): character classes, bounded repetition,
``\\b`` word boundaries — no lookarounds, no lazy quantifiers.

Contamination probes: with a handful of probe phrases an OR of
``contains`` compiles into one codegen stage (the shape used here). At a
real benchmark-suite scale (millions of probe n-grams) the same decision
becomes a broadcast semi-join of document shingles against the probe
n-gram set — the `minhash`/`ngram` machinery in :mod:`.dedup` already
provides the shingle side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies them in this exact sequence (the oracle must
# mirror the order — replacing emails first keeps their digits away from
# the phone/ssn patterns).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count PII hits per kind (``n_email`` ... ``n_ipv4``) plus the
    total. Counting precedes redaction, so overlapping kinds each see the
    original text."""
    t = F.col(text_col)
    total = F.lit(0)
    for name, pattern, _ in PII_PATTERNS:
        c = F.regexp_count(t, F.lit(pattern)).cast("long")
        df = df.withColumn(f"n_{name}", c)
        total = total + F.col(f"n_{name}")
    return df.withColumn("n_pii", total.cast("long"))


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted_text"
) -> DataFrame:
    """Replace every PII match with its kind token, applying the patterns
    in :data:`PII_PATTERNS` order."""
    t = F.col(text_col)
    for _, pattern, token in PII_PATTERNS:
        t = F.regexp_replace(t, pattern, token)
    return df.withColumn(out_col, t)


def flag_contamination(
    df: DataFrame, probes: Sequence[str], text_col: str = "text"
) -> DataFrame:
    """``is_contaminated`` = the document contains any probe phrase
    verbatim (benchmark-leak canaries)."""
    t = F.col(text_col)
    flag = F.lit(False)
    for p in probes:
        flag = flag | t.contains(p)
    return df.withColumn("is_contaminated", flag)


def ngram_contamination(
    docs: DataFrame,
    probes: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 2,
) -> DataFrame:
    """Decontamination at benchmark-suite scale: overlap of document
    word-bigram shingles with the probe set's shingles.

    This is the shape that survives millions of probe n-grams where the
    verbatim ``contains`` scan cannot: documents explode into shingles
    once (the same shingle machinery the dedup pipeline uses, reference-
    free), the probe set becomes a distinct-shingle frame that
    *broadcasts*, and the overlap is a broadcast inner join + per-doc
    count — one map-side-combinable aggregation, no shuffle carrying
    document text. Emits only suspect docs (``n_probe_hits >=
    min_hits``), so the output is proportional to contamination, not
    corpus size.
    """
    from .dedup import shingles

    spark = docs.sparkSession
    probe_rows = [(p,) for p in probes]
    probe_sh = (
        shingles(
            spark.createDataFrame(probe_rows, "text string").withColumn(
                "doc_id", F.lit(0)
            ),
            text_col="text",
        )
        .select("shingle")
        .distinct()
    )
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col)
    return (
        doc_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy(F.col(id_col))
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
        .where(F.col("n_probe_hits") >= min_hits)
    )
