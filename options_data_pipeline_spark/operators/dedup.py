"""Deduplication operators: exact, MinHash-LSH near-dup, n-gram Jaccard.

Scale design (the point of these operators at 100 TB):

- **Exact**: hash-groupBy on a content digest — one shuffle keyed by the
  digest, perfectly parallel, no skew beyond true duplicate groups.
- **MinHash + LSH**: per-doc signatures are a single groupBy over
  (doc, permutation); banding turns near-dup search into an equi-join on
  (band, band_signature) — candidate pairs only, never the O(n²) cross
  join. Verification re-computes true Jaccard only for candidates.
- **n-gram Jaccard**: the verification kernel, also usable standalone on
  a bounded candidate set.

Portability note: the "random" permutations are md5 over
``shingle + '#' + seed`` and the min is taken over the hex *string* —
MinHash only needs a uniform total order per permutation, and VARCHAR
min() agrees across Spark and DuckDB, which keeps the whole pipeline
oracle-checkable with zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PERMS = 8
DEFAULT_BANDS = 4


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical documents by content hash; emit canonical id."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word-bigram shingles per document."""
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, n_perms: int = DEFAULT_PERMS) -> DataFrame:
    """One row per (doc_id, perm): min md5(shingle#perm) hex string."""
    perms = F.explode(F.sequence(F.lit(0), F.lit(n_perms - 1))).alias("perm")
    return (
        sh.select("doc_id", "shingle", perms)
        .groupBy("doc_id", "perm")
        .agg(
            F.min(
                F.md5(F.concat(F.col("shingle"), F.lit("#"), F.col("perm").cast("string")))
            ).alias("minhash")
        )
    )


def lsh_candidates(
    sigs: DataFrame, n_perms: int = DEFAULT_PERMS, n_bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash): candidate
    near-dup pairs with doc_a < doc_b."""
    rows_per_band = n_perms // n_bands
    banded = (
        sigs.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("perm"), F.col("minhash")))
                        ),
                        lambda x: x["minhash"],
                    ),
                    "|",
                )
            ).alias("band_hash")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """True bigram-set Jaccard for each candidate pair; keep >= threshold."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perms: int = DEFAULT_PERMS,
    n_bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-duplicate pipeline: shingle -> sign -> band
    -> bucket-join -> Jaccard-verify."""
    sh = shingles(docs, id_col, text_col)
    sigs = minhash_signatures(sh, n_perms)
    cand = lsh_candidates(sigs, n_perms, n_bands)
    return jaccard_verify(cand, sh, threshold)
