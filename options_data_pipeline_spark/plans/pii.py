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


# --- exact-substring contamination: verified shared token spans --------------

#: word n-gram length for the exact screen; a match means >= this many
#: consecutive tokens shared verbatim
EXSUB_N = 8

#: eval-slice selector: doc_id % EXSUB_MOD == EXSUB_RES is the held-out
#: "benchmark" set; everything else is training corpus
EXSUB_MOD, EXSUB_RES = 10, 7


def _positional_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gram): 1-based positional word ``EXSUB_N``-grams as
    the literal space-joined token text — EXACT semantics, no hashing
    (a hash join would admit false-positive contamination).  Row-local
    array expression: each doc fans out to its (len - N + 1) grams with
    no shuffle; the only exchange in the whole screen is the gram join."""
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (EXSUB_N - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", F.slice(toks, i, EXSUB_N)
            ).alias("gram"),
        ),
    )
    return (
        docs.where(F.size(toks) >= EXSUB_N)
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", "g.pos", "g.gram")
    )


def q_exact_substring_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT shared-token-span contamination screen (round-10 wave 2):
    for every (train doc, eval doc) pair sharing at least one verbatim
    ``EXSUB_N``-token window, report the hit count and the LONGEST run
    of consecutive matching windows — i.e. the longest exact shared
    substring in tokens, the Lee-et-al. suffix-array decontamination
    semantics re-expressed as a sorted n-gram join + gaps-and-islands.

    Why this beats the shingle-overlap screen (`ngram_contamination`):
    hit counts can be inflated by common phrases scattered through a
    document; a 90-token consecutive span is a COPY.  The diagonal
    trick makes runs cheap: a shared span of length L appears as L-N+1
    matches with constant (train_pos - eval_pos), so grouping matches
    by that diagonal and counting consecutive train positions recovers
    the span length without ever comparing strings beyond the join.

    Scale shape: docs fan out to positional grams row-locally (no
    shuffle); in production the eval side is a benchmark set — tiny vs
    a 100 TB corpus — and the optimizer (AQE) broadcasts it, leaving
    the train-side gram frame unshuffled.  The join strategy is LEFT TO
    THE OPTIMIZER rather than forced: the harness selector
    (``doc_id % 10``) makes the eval slice corpus-proportional, so a
    hard ``F.broadcast`` would lie about the scale contract (ADVICE
    r10).  Islands run on match rows only (output-proportional, like
    every screen in this family).  No suffix array, no driver-side
    text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_spans(docs)


def exact_substring_spans(docs: DataFrame) -> DataFrame:
    """The screen's core over any (doc_id, text) frame — split out so
    unit tests can pin the span semantics on planted corpora
    (tests/test_exact_substring.py)."""
    grams = _positional_grams(docs)
    ev = (
        grams.where(F.col("doc_id") % EXSUB_MOD == EXSUB_RES)
        .select(
            F.col("doc_id").alias("eval_doc"),
            F.col("pos").alias("epos"),
            "gram",
        )
    )
    tr = (
        grams.where(F.col("doc_id") % EXSUB_MOD != EXSUB_RES)
        .select(
            F.col("doc_id").alias("train_doc"),
            F.col("pos").alias("tpos"),
            "gram",
        )
    )
    from ..operators.materialize import materialize

    # match rows feed BOTH the island windows and the hit counts —
    # materialize (output-proportional frame) or the gram join
    # re-derives per branch.  No forced broadcast: the eval side is
    # benchmark-sized in production but corpus-proportional under the
    # harness selector, so the optimizer picks the strategy (ADVICE
    # r10)
    m = materialize(
        tr.join(ev, "gram")
        .select(
            "train_doc",
            "eval_doc",
            (F.col("tpos") - F.col("epos")).alias("diag"),
            "tpos",
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("train_doc", "eval_doc", "diag").orderBy("tpos")
    runs = m.withColumn("grp", F.col("tpos") - F.row_number().over(w))
    spans = runs.groupBy("train_doc", "eval_doc", "diag", "grp").agg(
        (F.count(F.lit(1)) + (EXSUB_N - 1)).alias("span_tokens")
    )
    hits = m.groupBy("train_doc", "eval_doc").agg(
        F.countDistinct("tpos").alias("n_hits")
    )
    worst = spans.groupBy("train_doc", "eval_doc").agg(
        F.max("span_tokens").cast("long").alias("max_span_tokens")
    )
    # both sides are contamination-proportional: broadcast the span side
    return hits.join(F.broadcast(worst), ["train_doc", "eval_doc"]).select(
        "train_doc", "eval_doc", "n_hits", "max_span_tokens"
    )


def oracle_exact_substring_contamination() -> str:
    n = EXSUB_N
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id, i AS pos,
           array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS gram
    FROM toks, unnest(generate_series(1, len(t) - {n - 1})) AS u(i)
    WHERE len(t) >= {n}
),
ev AS (
    SELECT doc_id AS eval_doc, pos AS epos, gram FROM grams
    WHERE doc_id % {EXSUB_MOD} = {EXSUB_RES}
),
tr AS (
    SELECT doc_id AS train_doc, pos AS tpos, gram FROM grams
    WHERE doc_id % {EXSUB_MOD} <> {EXSUB_RES}
),
m AS (
    SELECT DISTINCT train_doc, eval_doc, tpos - epos AS diag, tpos
    FROM tr JOIN ev USING (gram)
),
runs AS (
    SELECT train_doc, eval_doc, diag, tpos,
           tpos - row_number() OVER (PARTITION BY train_doc, eval_doc, diag
                                     ORDER BY tpos) AS grp
    FROM m
),
spans AS (
    SELECT train_doc, eval_doc, diag, grp,
           count(*) + {n - 1} AS span_tokens
    FROM runs GROUP BY 1, 2, 3, 4
)
SELECT h.train_doc, h.eval_doc, h.n_hits, w.max_span_tokens
FROM (
    SELECT train_doc, eval_doc,
           CAST(count(DISTINCT tpos) AS BIGINT) AS n_hits
    FROM m GROUP BY 1, 2
) h
JOIN (
    SELECT train_doc, eval_doc,
           CAST(max(span_tokens) AS BIGINT) AS max_span_tokens
    FROM spans GROUP BY 1, 2
) w USING (train_doc, eval_doc)
"""


def q_self_dup_span_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup PAYOFF estimator (round-10 wave 4): per lang, the
    fraction of corpus tokens covered by at least one exact
    ``EXSUB_N``-token span shared with ANOTHER document — the number
    that says what exact-substring deduplication would actually delete,
    measured BEFORE paying for the dedup itself.  The intra-corpus
    sibling of `exact_substring_contamination` (train↔eval) and the
    exactness upgrade over the MinHash estimate (signature similarity
    ≠ deletable token mass).

    Scale shape: one corpus-wide gram groupBy finds grams appearing in
    ≥2 distinct documents — the single honest shuffle; everything after
    is proportional to DUPLICATION MASS, not corpus size: only shared
    grams fan out to their N token positions, and the distinct
    (doc, position) collapse + per-lang reduction run on that
    output-proportional frame.  Exact integer counts end to end."""
    from ..functions.rounding import round_half_away

    from ..operators.materialize import materialize

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    grams = _positional_grams(docs)
    # grams living in >= 2 distinct docs; the gram text itself is the
    # join key (exact semantics, no hash false positives)
    shared_keys = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    shared = grams.join(shared_keys, "gram", "left_semi")
    covered = materialize(
        shared.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("pos"), F.col("pos") + F.lit(EXSUB_N - 1)
                )
            ).alias("tok_pos"),
        ).distinct()
    )
    per_doc = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_tokens")
    )
    totals = docs.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_toks")
    )
    joined = totals.join(per_doc, "doc_id", "left").na.fill(
        {"dup_tokens": 0}
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum("dup_tokens").cast("long").alias("dup_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "dup_tokens",
            round_half_away(
                F.col("dup_tokens").cast("double")
                / F.col("total_tokens").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def oracle_self_dup_span_mass() -> str:
    from ..functions.rounding import sql_round_half_away

    n = EXSUB_N
    frac = sql_round_half_away(
        "CAST(dup_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)", 6
    )
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id, i AS pos,
           array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS gram
    FROM toks, unnest(generate_series(1, len(t) - {n - 1})) AS u(i)
    WHERE len(t) >= {n}
),
shared_keys AS (
    SELECT gram FROM grams GROUP BY gram
    HAVING count(DISTINCT doc_id) >= 2
),
covered AS (
    SELECT DISTINCT g.doc_id, g.pos + o.k AS tok_pos
    FROM grams g
    JOIN shared_keys USING (gram),
    unnest(generate_series(0, {n - 1})) AS o(k)
),
per_doc AS (
    SELECT doc_id, count(*) AS dup_tokens FROM covered GROUP BY 1
),
totals AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks
    FROM documents
),
agg AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(COALESCE(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens
    FROM totals t LEFT JOIN per_doc p USING (doc_id)
    GROUP BY lang
)
SELECT lang, n_docs, total_tokens, dup_tokens, {frac} AS dup_frac
FROM agg
"""
