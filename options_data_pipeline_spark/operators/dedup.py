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

Verification joins the small candidate-pair set against a per-doc
shingle-SET table (one array row per doc, built once) and intersects
arrays JVM-side — the pair set is broadcast, so verification adds zero
shuffles beyond building the set table. At 100 TB the LSH band join is
the only large shuffle, and it is keyed by (band, band_hash) which is
uniform by construction of the hash.

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


def _gram_array(text_col: str):
    """Distinct word-bigram shingles of ``text_col`` as an array column.

    ``zip_with`` over two shifted slices instead of ``transform`` over an
    index ``sequence``: the indexed form re-evaluates ``element_at`` (and
    the enclosing split) per element in the interpreted HOF path, measured
    ~6x slower at sf0.1.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return F.array_distinct(grams)


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc: (doc_id, shingles array, n_sh).

    This is the narrow store every downstream step derives from — built in
    a single scan, no shuffle.
    """
    return df.select(
        F.col(id_col).alias("doc_id"), _gram_array(text_col).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word-bigram shingles per document, exploded long-form."""
    return shingle_sets(df, id_col, text_col).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )


def hashed_shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """:func:`shingle_sets` with each shingle compacted to the first 8 hex
    chars of its md5 — the minhash path never needs the shingle *text*
    (signatures hash it again anyway; verification only intersects), so
    storing 8-char digests shrinks the materialized store and every
    downstream compare (~25% off the whole pipeline, measured sf0.1).

    Deterministic across engines (DuckDB: ``substr(md5(g), 1, 8)``), so
    the oracle reproduces it exactly. A 32-bit prefix collision inside
    one doc-pair's union (p ~ 1e-6 per pair) would nudge ``n_common`` by
    one — both engines nudge identically, and the LSH family itself is
    already approximate; the exact-text path (:func:`shingle_sets`)
    remains for the n-gram Jaccard operator whose contract is exact."""
    w = F.split(F.col(text_col), " ")
    grams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda x, y: F.substring(F.md5(F.concat_ws(" ", x, y)), 1, 8),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.array_distinct(grams).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))


def hash_compact_sets(sets: DataFrame) -> DataFrame:
    """:func:`hashed_shingle_sets` derived from an EXISTING exact-text
    shingle store instead of re-shingling the corpus: hash each stored
    shingle row-locally and re-distinct (a distinct set hashes to a
    distinct-after-collision set identically in both derivations). Used
    when the exact store is already a shared session artifact — one
    shingling pass serves the Jaccard, SimHash, and MinHash paths."""
    return sets.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                "shingles", lambda s: F.substring(F.md5(s), 1, 8)
            )
        ).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))


def minhash_signatures(sets: DataFrame, n_perms: int = DEFAULT_PERMS) -> DataFrame:
    """One row per doc: array ``mh`` of ``n_perms`` minhashes (hex strings).

    Signature p = min over shingles of an 8-hex slice of
    md5(shingle + '#' + p//4): one 128-bit digest yields FOUR independent
    32-bit permutation values (bytes 0-3, 4-7, 8-11, 12-15 of the hex),
    so the digest work per shingle is ``ceil(n_perms/4)`` md5 calls
    instead of ``n_perms`` — 4x less at any scale (digest cost dominates
    the signature stage on wide corpora). MinHash only needs a uniform
    total order per permutation, and an 8-hex substring of md5 is
    exactly that; VARCHAR min() agrees across Spark and DuckDB.

    All ``n_perms`` aggregates are unrolled plain ``min(substring(md5))``
    expressions — whole-stage codegen with subexpression elimination
    computes each shared digest once — and the single groupBy(doc_id)
    combines map-side, so the shuffle carries one skinny row per document.
    """
    sh = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    digests = {
        d: F.md5(F.concat(F.col("shingle"), F.lit(f"#{d}")))
        for d in range((n_perms + 3) // 4)
    }
    aggs = [
        F.min(F.substring(digests[p // 4], (p % 4) * 8 + 1, 8)).alias(f"mh_{p}")
        for p in range(n_perms)
    ]
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    return per_doc.select(
        "doc_id", F.array(*[F.col(f"mh_{p}") for p in range(n_perms)]).alias("mh")
    )


def lsh_candidates(
    sigs: DataFrame, n_perms: int = DEFAULT_PERMS, n_bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Band the signatures and bucket-join on (band, band_hash): candidate
    near-dup pairs with doc_a < doc_b.

    ``sigs`` is :func:`minhash_signatures` output (doc_id, mh array). Band
    hashes are sliced out of the signature array row-locally; the only
    shuffle is the groupBy on the bucket key, and bucket membership lists
    are tiny by LSH construction (only near-dups collide on all rows of a
    band), so the in-bucket pair expansion never explodes.
    """
    banded = banded_signatures(sigs, n_perms, n_bands)
    return bucket_pairs(banded, ["band", "band_hash"])


def banded_signatures(
    sigs: DataFrame, n_perms: int = DEFAULT_PERMS, n_bands: int = DEFAULT_BANDS
) -> DataFrame:
    """(doc_id, band, band_hash): the LSH band table of a signature set.

    Exposed separately from :func:`lsh_candidates` so cross-cohort
    probes (an incoming batch against a standing corpus's band table —
    see :mod:`..streaming.corpus_dedup`) can equi-join two band tables
    instead of re-bucketing the union."""
    rows_per_band = n_perms // n_bands
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(
                F.array_join(
                    F.slice(F.col("mh"), b * rows_per_band + F.lit(1), rows_per_band),
                    "|",
                )
            ).alias("band_hash"),
        ),
    )
    return sigs.select(
        "doc_id", F.explode(bands).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_hash")


def bucket_pairs(df: DataFrame, key_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Distinct ordered id pairs co-occurring in any bucket.

    One shuffle (groupBy on the bucket key); in-bucket pair expansion is
    row-local. The caller guarantees buckets stay small (LSH banding),
    which is what keeps this sub-quadratic.
    """
    buckets = (
        df.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def df_capped(
    exploded: DataFrame, key_cols: list[str], cap: int
) -> DataFrame:
    """Drop posting-list keys whose document frequency exceeds ``cap``.

    ``exploded`` is an inverted-index frame (one row per (key, doc)); the
    result keeps only rows whose key appears in at most ``cap`` documents.
    This is the standard boilerplate guard in large-scale n-gram dedup:
    a shingle shared by d documents emits d^2 candidate rows in the
    posting-list self-join, and template/navigation/license shingles have
    d in the millions at corpus scale while carrying zero dedup signal
    (true near-dup pairs also share many RARE shingles, so recall is
    unaffected). With the cap, total candidate rows are bounded by
    cap * |postings| instead of sum(df^2).

    Shape: one count aggregate keyed exactly like the downstream self-join
    (partial aggregation makes the hot keys cheap) and an inner join back
    against the surviving keys. Both reuse the same (key) exchange as the
    self-join that follows, and each exploded row matches at most one key
    row, so no skew is amplified.
    """
    counts = exploded.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__df"))
    keep = counts.where(F.col("__df") <= cap).select(*key_cols)
    return exploded.join(keep, list(key_cols))


def jaccard_verify(pairs: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """True bigram-set Jaccard for each candidate pair; keep >= threshold.

    ``sets`` is the output of :func:`shingle_sets`. The candidate pair set
    is broadcast (LSH keeps it small by construction), so this adds no
    shuffle: two broadcast-hash joins against the set store, then a pure
    ``array_intersect`` per surviving row.
    """
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    return (
        a.join(F.broadcast(pairs), "doc_a")
        .join(b, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
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
    reliable: bool = False,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-duplicate pipeline: shingle -> sign -> band
    -> bucket-join -> Jaccard-verify.

    The per-doc shingle-set store (hash-compacted, see
    :func:`hashed_shingle_sets`) is materialized: it feeds three
    subplans (signatures + both verify sides) and Spark's exchange reuse
    does not cover scan+transform subtrees — measured ~25% of the
    pipeline recomputing grams without it. ``reliable=True`` writes a
    fault-tolerant checkpoint instead of executor-local blocks (see
    :mod:`.materialize`) for cluster runs where node loss must not
    recompute the shingle store from scratch. ``sets`` supplies an
    already-materialized hashed store (e.g. :func:`hash_compact_sets`
    over a shared exact-store artifact) and skips the build.
    """
    from .materialize import materialize

    if sets is None:
        sets = materialize(hashed_shingle_sets(docs, id_col, text_col), reliable)
    sigs = minhash_signatures(sets, n_perms)
    cand = lsh_candidates(sigs, n_perms, n_bands)
    return jaccard_verify(cand, sets, threshold)
