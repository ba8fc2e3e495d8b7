"""Text-analysis operators for large-scale training-data pipelines.

All pure native expressions (split / array ops / regexp) — no UDFs — so
they run inside whole-stage codegen and scale linearly with input splits.
Language ID is an n-gram/marker-word heuristic; quality scoring follows
the usual length/stopword/punctuation recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "it"]
MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}
# BPE-ish tokenization: runs of letters, runs of digits, or single symbols
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def words(text: Column) -> Column:
    return F.split(text, " ")


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts, type-token ratio, average token length."""
    t = F.col(text_col)
    w = words(t)
    n_tokens = F.size(w).cast("long")
    n_chars = F.length(t).cast("long")
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_calc", n_chars)
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(w)).cast("long"))
        .withColumn("type_token_ratio", F.col("n_distinct_tokens") / F.col("n_tokens"))
        .withColumn(
            "avg_token_len",
            (F.col("n_chars_calc") - (F.col("n_tokens") - 1)) / F.col("n_tokens"),
        )
        .withColumn(
            "n_bpe_tokens", F.regexp_count(t, F.lit(TOKEN_RE)).cast("long")
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0, 1]: favors medium-length
    docs with a healthy stopword ratio and low symbol noise."""
    t = F.col(text_col)
    w = words(t)
    n_tokens = F.size(w).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double")
    n_symbols = F.regexp_count(t, F.lit("[^a-zA-Z0-9 ]")).cast("double")
    stop_ratio = n_stop / n_tokens
    symbol_ratio = n_symbols / F.length(t).cast("double")
    length_component = F.least(F.lit(1.0), n_tokens / 64.0)
    return (
        df.withColumn("stopword_ratio", stop_ratio)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn(
            "quality_score",
            length_component * 0.5
            + F.least(F.lit(1.0), stop_ratio * 4.0) * 0.3
            + (F.lit(1.0) - F.least(F.lit(1.0), symbol_ratio * 10.0)) * 0.2,
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count distinct marker hits per
    language, predict the argmax (ties: en > es > zh, deterministic)."""
    t = F.col(text_col)
    dw = F.array_distinct(words(t))
    hits = {}
    for lang, markers in MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits[lang] = F.size(F.array_intersect(dw, arr)).cast("long")
    en, es, zh = hits["en"], hits["es"], hits["zh"]
    predicted = (
        F.when((en >= es) & (en >= zh), F.lit("en"))
        .when(es >= zh, F.lit("es"))
        .otherwise(F.lit("zh"))
    )
    return (
        df.withColumn("en_hits", en)
        .withColumn("es_hits", es)
        .withColumn("zh_hits", zh)
        .withColumn("predicted_lang", predicted)
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText rules):
    duplicate-bigram fraction and the share of the most frequent token.

    The bigram ratio is pure array math on the row (zero shuffle). The
    top-token share needs per-(doc, token) counts — an explode soaked by
    a map-side partial aggregate, then a per-doc max: the vocabulary
    shape, bounded by distinct tokens per doc, never a window."""
    t = F.col(text_col)
    w = words(t)
    n_tokens = F.size(w).cast("long")
    n_grams = (n_tokens - 1).cast("long")
    grams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    n_distinct_grams = F.size(F.array_distinct(grams)).cast("long")
    with_grams = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_grams", n_grams)
        .withColumn("n_distinct_grams", n_distinct_grams)
        .withColumn(
            "dup_gram_ratio",
            F.when(n_grams <= 0, F.lit(0.0)).otherwise(
                (F.col("n_grams") - F.col("n_distinct_grams"))
                / F.col("n_grams").cast("double")
            ),
        )
    )
    top = (
        df.select("doc_id", F.explode(w).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_token_count"))
    )
    return with_grams.join(top, "doc_id").withColumn(
        "top_token_share", F.col("max_token_count") / F.col("n_tokens").cast("double")
    )


def rare_token_stats(df: DataFrame, min_count: int = 3, text_col: str = "text") -> DataFrame:
    """Corpus-frequency quality signal (the CCNet shape, integer-exact):
    fraction of a document's tokens whose *corpus-wide* count is below
    ``min_count``. Two aggregations: global token counts (map-side
    combined; at 100 TB this is the vocabulary, shuffled by token —
    uniform keys), then token occurrences joined to their counts and
    re-aggregated per doc. All thresholds are integer comparisons, so
    the score is an exact rational — no float-accumulation ordering
    hazard across engines or partitionings."""
    toks = df.select("doc_id", F.explode(words(F.col(text_col))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("corpus_count"))
    return (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("corpus_count") < min_count, 1).otherwise(0)
            ).cast("long").alias("n_rare"),
        )
        .withColumn("rare_ratio", F.col("n_rare") / F.col("n_tokens").cast("double"))
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact-content hash + order-independent
    bag-of-words hash (for shuffled-word duplicates)."""
    t = F.col(text_col)
    bag = F.array_join(F.array_sort(F.array_distinct(words(t))), " ")
    return df.withColumn("content_hash", F.md5(t)).withColumn(
        "bagofwords_hash", F.md5(bag)
    )
