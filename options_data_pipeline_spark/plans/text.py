"""Training-data text queries over ``documents``.

To make the dedup pipelines demonstrable (the synthetic corpus has no
natural duplicates), both engines deterministically plant duplicates:
exact copies for ``doc_id % 97 == 0`` (id + 200000) and near-dups with one
appended word for ``doc_id % 50 == 0`` (id + 100000). The Spark side and
the DuckDB oracle build the identical planted corpus, so the dedup results
are fully checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_half_away
from ..operators import bloom as BF
from ..operators import dedup as D
from ..operators import simhash as SH
from ..operators import textstats as TS
from ..operators.materialize import materialize
from ..sources.tables import load_table, parallelized

_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        docs.where(F.col("doc_id") % 97 == 0)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("source", F.lit("mirror"))
    )
    near = (
        docs.where(F.col("doc_id") % 50 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" copied")))
        .withColumn("source", F.lit("scrape"))
    )
    # parallelized on the UNION (not the scan): every consumer of this
    # corpus (shingle explode + md5 hashing, simhash votes) would
    # otherwise inherit the scan's ~3 partitions — measured at
    # sf0.1/local[32]: near-dup artifact build 4.5 -> 2.0 s, warm
    # simhash 4.7 -> 1.9 s. Repartitioning after the union keeps the
    # total at defaultParallelism instead of 3x it per branch. (An older
    # note here claimed the repartition cost more than the map-side win;
    # that predates the shared shingle artifact and is wrong at 32
    # cores.)
    return parallelized(
        spark,
        docs.select(_DOC_COLS)
        .unionByName(exact.select(_DOC_COLS))
        .unionByName(near.select(_DOC_COLS)),
    )


_PLANTED_SQL = """
corpus AS (
    SELECT doc_id, text, lang, source, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 200000, text, lang, 'mirror', n_chars
    FROM documents WHERE doc_id % 97 = 0
    UNION ALL
    SELECT doc_id + 100000, text || ' copied', lang, 'scrape', n_chars
    FROM documents WHERE doc_id % 50 = 0
)
"""

_SHINGLES_SQL = """
shingles AS (
    SELECT DISTINCT doc_id, shingle
    FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(string_split(text, ' '))),
                      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
                   AS shingle
        FROM corpus
    )
)
"""

# the minhash path's hash-compacted store (operators/dedup.py
# hashed_shingle_sets): hash THEN distinct, exactly like
# array_distinct over the hashed grams
_HASHED_SHINGLES_SQL = """
shingles AS (
    SELECT DISTINCT doc_id, substr(md5(shingle), 1, 8) AS shingle
    FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(string_split(text, ' '))),
                      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
                   AS shingle
        FROM corpus
    )
)
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TS.doc_stats(docs).select(
        "doc_id", "lang", "source", "n_tokens", "n_chars_calc",
        "n_distinct_tokens", "type_token_ratio", "avg_token_len", "n_bpe_tokens",
    )


def oracle_doc_stats() -> str:
    return """
SELECT doc_id, lang, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars_calc,
    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        / CAST(len(string_split(text, ' ')) AS BIGINT) AS type_token_ratio,
    (CAST(length(text) AS BIGINT) - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1))
        / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_token_len,
    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT)
        AS n_bpe_tokens
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TS.quality_score(docs).select(
        "doc_id", "stopword_ratio", "symbol_ratio", "quality_score"
    )


def oracle_text_quality() -> str:
    stop = "['the','a','of','and','to','in','is','on','for','it']"
    return f"""
WITH base AS (
    SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        CAST(len(list_filter(string_split(text, ' '),
                             w -> list_contains({stop}, w))) AS DOUBLE) AS n_stop,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) AS n_symbols,
        CAST(length(text) AS DOUBLE) AS n_chars
    FROM documents
)
SELECT doc_id,
    n_stop / n_tokens AS stopword_ratio,
    n_symbols / n_chars AS symbol_ratio,
    least(1.0, n_tokens / 64.0) * 0.5
      + least(1.0, (n_stop / n_tokens) * 4.0) * 0.3
      + (1.0 - least(1.0, (n_symbols / n_chars) * 10.0)) * 0.2 AS quality_score
FROM base
"""


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = TS.lang_id(docs)
    return out.select(
        "doc_id", "lang", "en_hits", "es_hits", "zh_hits", "predicted_lang",
        (F.col("predicted_lang") == F.col("lang")).alias("is_match"),
    )


def oracle_lang_profile() -> str:
    def hits(markers):
        arr = "[" + ",".join(f"'{m}'" for m in markers) + "]"
        return (
            f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), {arr}))"
            " AS BIGINT)"
        )

    en, es, zh = (hits(TS.MARKERS[k]) for k in ("en", "es", "zh"))
    return f"""
WITH h AS (
    SELECT doc_id, lang, {en} AS en_hits, {es} AS es_hits, {zh} AS zh_hits
    FROM documents
)
SELECT doc_id, lang, en_hits, es_hits, zh_hits,
    CASE WHEN en_hits >= es_hits AND en_hits >= zh_hits THEN 'en'
         WHEN es_hits >= zh_hits THEN 'es' ELSE 'zh' END AS predicted_lang,
    (CASE WHEN en_hits >= es_hits AND en_hits >= zh_hits THEN 'en'
          WHEN es_hits >= zh_hits THEN 'es' ELSE 'zh' END) = lang AS is_match
FROM h
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TS.fingerprint(docs).select("doc_id", "content_hash", "bagofwords_hash")


def oracle_fingerprint() -> str:
    return """
SELECT doc_id, md5(text) AS content_hash,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS bagofwords_hash
FROM documents
"""


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = planted_corpus(spark, sf_dir)
    return D.exact_dup_groups(corpus)


def oracle_exact_dup_groups() -> str:
    return f"""
WITH {_PLANTED_SQL}
SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM corpus GROUP BY 1
"""


def planted_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified MinHash near-dup pairs of the planted corpus, as a
    session artifact: the corpus snapshot is immutable, so the pairs are
    derived once per session and shared by every consumer
    (``minhash_near_dups``, ``corpus_curation``, ``dedup_clusters``,
    ``cluster_survivors``, ``incremental_dedup``) instead of re-running
    the shingle -> sign -> band -> verify pipeline per query — the
    artifact-store behavior a production curation pass has at scale.
    """
    from ..operators.artifacts import session_artifact
    from ..operators.materialize import materialize

    def build() -> DataFrame:
        # one shingling pass corpus-wide: the hashed store derives from
        # the shared exact-text store artifact row-locally
        hashed = materialize(
            D.hash_compact_sets(planted_shingle_sets(spark, sf_dir))
        )
        return D.minhash_near_dups(
            planted_corpus(spark, sf_dir), threshold=0.5, sets=hashed
        )

    return session_artifact(spark, f"planted_near_dup_pairs:{sf_dir}:t=0.5", build)


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return planted_near_dup_pairs(spark, sf_dir)


def oracle_minhash_near_dups() -> str:
    n_perms, n_bands = D.DEFAULT_PERMS, D.DEFAULT_BANDS
    rows = n_perms // n_bands
    return f"""
WITH {_PLANTED_SQL}, {_HASHED_SHINGLES_SQL},
sigs AS (
    -- permutation p reads an 8-hex slice of digest p//4 (4 perms per md5),
    -- mirroring operators/dedup.py:minhash_signatures exactly
    SELECT doc_id, perm,
           min(substr(md5(shingle || '#' || CAST(CAST(perm // 4 AS INT) AS VARCHAR)),
                      CAST((perm % 4) * 8 + 1 AS INT), 8)) AS minhash
    FROM shingles, (SELECT unnest(range(0, {n_perms})) AS perm)
    GROUP BY 1, 2
),
banded AS (
    SELECT doc_id, CAST(floor(perm / {rows}) AS INT) AS band,
           md5(string_agg(minhash, '|' ORDER BY perm)) AS band_hash
    FROM sigs GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY 1),
common AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       n_common / (na.n_sh + nb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
"""


def planted_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-text word-bigram shingle store of the planted corpus as a
    session artifact (shared by the n-gram Jaccard and SimHash queries;
    the MinHash path uses its hash-compacted twin)."""
    from ..operators.artifacts import session_artifact

    return session_artifact(
        spark,
        f"planted_shingle_sets:{sf_dir}",
        lambda: D.shingle_sets(planted_corpus(spark, sf_dir)),
    )


# Document-frequency cap for the EXACT n-gram pair queries
# (ngram_jaccard_pairs, containment_pairs). A shingle appearing in d
# documents emits d^2 rows in the posting-list self-join; boilerplate
# shingles (navigation chrome, license headers, templates) have d in the
# millions at 100 TB, so the uncapped join is a job-killer on one hot
# (lang, shingle) key. Shingles with df > cap are dropped from the
# shingle UNIVERSE (numerator AND denominator) before the join — the
# standard move in large-scale n-gram dedup; near-dup pairs also share
# many rare shingles, so recall at jaccard >= 0.5 is unaffected. The
# DuckDB oracles apply the IDENTICAL cap. 256 is ~1.6x the max df
# observed at sf0.1 (158), so results at all test scales are unchanged;
# the bound itself is pinned by tests/test_dedup_unit.py's planted
# boilerplate fixture.
SHINGLE_DF_CAP = 256


def capped_shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Df-capped (doc_id, lang, shingle) posting table of the planted
    corpus as a materialized session artifact. Production pipelines
    materialize the postings of an immutable snapshot once; here the
    cap (count + keep-key join) runs once at artifact build instead of
    being re-planned per consumer branch of the self-join."""
    from ..operators.artifacts import session_artifact

    def build() -> DataFrame:
        corpus = planted_corpus(spark, sf_dir)
        sets = planted_shingle_sets(spark, sf_dir)
        langs = corpus.select("doc_id", "lang")
        sh_l = sets.select(
            "doc_id", F.explode("shingles").alias("shingle")
        ).join(langs, "doc_id")
        return with_doc_sizes(D.df_capped(sh_l, ["lang", "shingle"], SHINGLE_DF_CAP))

    return session_artifact(
        spark, f"capped_shingle_postings:{sf_dir}:{SHINGLE_DF_CAP}", build
    )


def with_doc_sizes(capped: DataFrame) -> DataFrame:
    """Attach the per-doc surviving-shingle count (``n_sh``) to a capped
    posting table. Runs at artifact build, so the pair queries read the
    size off the posting row instead of re-joining a sizes table (saves
    two doc-keyed joins + a groupBy per consumer)."""
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return capped.join(sizes, "doc_id")


def shingle_pair_counts(capped: DataFrame) -> DataFrame:
    """(lang, shingle)-keyed inverted-index self-join over an ALREADY
    df-capped posting table with per-doc sizes attached (see
    :func:`capped_shingle_postings` / :func:`..operators.dedup.df_capped`
    / :func:`with_doc_sizes`). Returns one row per candidate pair with
    ``n_common`` plus both documents' capped-universe sizes ``n_a`` /
    ``n_b`` (the jaccard/containment denominators use the SAME universe).
    Candidate rows are bounded by cap * |postings| instead of
    sum(df^2)."""
    sa = capped.select(
        F.col("doc_id").alias("doc_a"), "lang", "shingle",
        F.col("n_sh").alias("n_a"),
    )
    sb = capped.select(
        F.col("doc_id").alias("doc_b"), "lang", "shingle",
        F.col("n_sh").alias("n_b"),
    )
    return (
        sa.join(sb, ["lang", "shingle"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )


_DF_CAP_SQL = f"""
keep_keys AS (
    SELECT lang, shingle FROM sh_l GROUP BY 1, 2
    HAVING count(*) <= {SHINGLE_DF_CAP}
),
capped AS (
    SELECT s.doc_id, s.shingle, s.lang
    FROM sh_l s JOIN keep_keys USING (lang, shingle)
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM capped a JOIN capped b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id AND a.lang = b.lang
    GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM capped GROUP BY 1)
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone n-gram Jaccard near-dup (no LSH): all same-lang pairs
    sharing at least one (df-capped) shingle, kept at jaccard >= 0.5.

    The inverted-index self-join uses the composite key (lang, shingle) so
    cross-language pairs never materialize, and the pair counts from that
    join ARE ``n_common`` — no second pass. Shingles with document
    frequency > SHINGLE_DF_CAP are dropped from the universe first (see
    the cap note above); per-doc sizes ride on the posting rows, so no
    sizes join is needed.
    """
    pairs = shingle_pair_counts(capped_shingle_postings(spark, sf_dir))
    return (
        pairs.withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def oracle_ngram_jaccard_pairs() -> str:
    return f"""
WITH {_PLANTED_SQL}, {_SHINGLES_SQL},
sh_l AS (
    SELECT s.doc_id, s.shingle, c.lang
    FROM shingles s JOIN corpus c USING (doc_id)
),
{_DF_CAP_SQL}
SELECT doc_a, doc_b, n_common,
       n_common / (na.n_sh + nb.n_sh - n_common) AS jaccard
FROM pairs
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
"""


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = planted_corpus(spark, sf_dir)
    return SH.simhash_near_dups(corpus, sets=planted_shingle_sets(spark, sf_dir))


def oracle_simhash_near_dups() -> str:
    """Exact all-pairs scan — the *check* for the banded Spark pipeline,
    which has provably full recall at hamming <= N_BANDS - 1."""
    odd = "('1','3','5','7','9','b','d','f')"
    votes = ",\n        ".join(
        f"sum(CASE WHEN substring(md5(shingle), {i + 1}, 1) IN {odd}"
        f" THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(SH.N_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v_{i} >= 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(SH.N_BITS)
    )
    return f"""
WITH {_PLANTED_SQL}, {_SHINGLES_SQL},
votes AS (
    SELECT doc_id,
        {votes}
    FROM shingles GROUP BY doc_id
),
sigs AS (SELECT doc_id, {sig} AS sig FROM votes)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {SH.MAX_HAMMING}
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline: quality gate -> language
    agreement -> exact dedup (keep canonical) -> near-dup removal (drop
    the higher id of each qualifying pair) -> per (lang, source) corpus
    stats. One DataFrame chain; every stage is an operator that is also
    individually oracle-checked."""
    corpus = planted_corpus(spark, sf_dir)
    scored = TS.quality_score(TS.lang_id(corpus))
    kept = scored.where(
        (F.col("quality_score") >= 0.5) & (F.col("predicted_lang") == F.col("lang"))
    )
    canon = (
        kept.withColumn("content_hash", F.md5("text"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy("doc_id")
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn", "content_hash")
    )
    near = planted_near_dup_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    survivors = canon.join(near, "doc_id", "left_anti")
    return survivors.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
    )


def oracle_corpus_curation() -> str:
    stop = "['the','a','of','and','to','in','is','on','for','it']"
    minhash_body = oracle_minhash_near_dups().split("WITH", 1)[1]
    return f"""
WITH {minhash_body.rsplit("SELECT", 1)[0]}
, near_pairs AS (
    SELECT doc_a, doc_b, n_common,
           n_common / (na.n_sh + nb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
),
dropped AS (SELECT DISTINCT doc_b AS doc_id FROM near_pairs),
scored AS (
    SELECT *,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        CAST(len(list_filter(string_split(text, ' '),
                             w -> list_contains({stop}, w))) AS DOUBLE) AS n_stop,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) AS n_sym,
        CAST(length(text) AS DOUBLE) AS n_ch
    FROM corpus
),
quality AS (
    SELECT *,
        least(1.0, n_tok / 64.0) * 0.5
          + least(1.0, (n_stop / n_tok) * 4.0) * 0.3
          + (1.0 - least(1.0, (n_sym / n_ch) * 10.0)) * 0.2 AS quality_score,
        CASE WHEN len(list_intersect(list_distinct(string_split(text, ' ')),
                                     ['the','a','of','and','to'])) >=
                  len(list_intersect(list_distinct(string_split(text, ' ')),
                                     ['el','la','de','y','que']))
              AND len(list_intersect(list_distinct(string_split(text, ' ')),
                                     ['the','a','of','and','to'])) >=
                  len(list_intersect(list_distinct(string_split(text, ' ')),
                                     ['de','le','shi','bu','wo']))
             THEN 'en'
             WHEN len(list_intersect(list_distinct(string_split(text, ' ')),
                                     ['el','la','de','y','que'])) >=
                  len(list_intersect(list_distinct(string_split(text, ' ')),
                                     ['de','le','shi','bu','wo']))
             THEN 'es' ELSE 'zh' END AS predicted_lang
    FROM scored
),
kept AS (
    SELECT * FROM quality
    WHERE quality_score >= 0.5 AND predicted_lang = lang
),
canon AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
    ) WHERE rn = 1
),
survivors AS (
    SELECT c.* FROM canon c
    WHERE c.doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT lang, source, count(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM survivors GROUP BY 1, 2
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clustering: exact-dup edges + minhash near-dup
    edges -> connected components (iterative min-label propagation).
    Every clustered doc maps to its component's minimum doc id."""
    from ..operators.graph import connected_components

    corpus = planted_corpus(spark, sf_dir)
    hashes = corpus.select("doc_id", F.md5("text").alias("h"))
    canon = hashes.groupBy("h").agg(F.min("doc_id").alias("c"))
    exact_edges = (
        hashes.join(canon, "h")
        .where(F.col("doc_id") != F.col("c"))
        .select(F.col("c").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    near_edges = planted_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = exact_edges.unionByName(near_edges).distinct()
    return connected_components(edges)


def oracle_dedup_clusters() -> str:
    """Same fixpoint as a recursive transitive closure."""
    minhash_body = oracle_minhash_near_dups().split("WITH", 1)[1]
    prefix = minhash_body.rsplit("SELECT", 1)[0]
    return f"""
WITH RECURSIVE {prefix}
, near_edges AS (
    SELECT doc_a, doc_b
    FROM common
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
),
hashes AS (SELECT doc_id, md5(text) AS h FROM corpus),
canon AS (SELECT h, min(doc_id) AS c FROM hashes GROUP BY h),
exact_edges AS (
    SELECT c AS doc_a, doc_id AS doc_b FROM hashes JOIN canon USING (h)
    WHERE doc_id != c
),
all_edges AS (
    SELECT doc_a, doc_b FROM exact_edges
    UNION
    SELECT doc_a, doc_b FROM near_edges
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM all_edges
    UNION
    SELECT doc_b, doc_a FROM all_edges
),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS node, least(a, min(b)) AS component
FROM reach GROUP BY a
"""


def q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup resolved at the *cluster* level: each connected
    component of the duplicate graph keeps its highest-quality member
    (ties: lowest doc id), instead of `corpus_curation`'s pairwise
    drop-the-higher-id rule. This is the policy real curation pipelines
    want — the survivor is chosen by merit, not by graph arrival order.

    Shape: the component map (one row per clustered doc — tiny relative
    to the corpus) joins the per-doc quality scores, then a single
    map-side-combinable groupBy picks the argmax via lexicographic
    struct ordering (max_by on (quality, -id)) — no window, no second
    shuffle."""
    clusters = q_dedup_clusters(spark, sf_dir)
    qual = TS.quality_score(planted_corpus(spark, sf_dir)).select(
        F.col("doc_id").alias("node"), "quality_score"
    )
    members = clusters.join(qual, "node")
    order = F.struct(
        F.col("quality_score").alias("q"), (-F.col("node")).alias("nid")
    )
    return members.groupBy("component").agg(
        F.max_by("node", order).alias("survivor"),
        F.max_by("quality_score", order).alias("survivor_quality"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )


def oracle_cluster_survivors() -> str:
    clusters_sql = oracle_dedup_clusters()
    prefix = clusters_sql.rsplit("SELECT", 1)[0]
    return f"""{prefix}
, clusters AS (
    SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
),
qbase AS (
    SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        CAST(len(list_filter(string_split(text, ' '),
                             w -> list_contains(['the','a','of','and','to','in','is','on','for','it'], w))) AS DOUBLE) AS n_stop,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) AS n_sym,
        CAST(length(text) AS DOUBLE) AS n_ch
    FROM corpus
),
qual AS (
    SELECT doc_id AS node,
        least(1.0, n_tok / 64.0) * 0.5
          + least(1.0, (n_stop / n_tok) * 4.0) * 0.3
          + (1.0 - least(1.0, (n_sym / n_ch) * 10.0)) * 0.2 AS quality_score
    FROM qbase
),
ranked AS (
    SELECT component, node, quality_score,
           row_number() OVER (PARTITION BY component
                              ORDER BY quality_score DESC, node ASC) AS rn
    FROM clusters JOIN qual USING (node)
)
SELECT component,
       max(CASE WHEN rn = 1 THEN node END) AS survivor,
       max(CASE WHEN rn = 1 THEN quality_score END) AS survivor_quality,
       CAST(count(*) AS BIGINT) AS n_members
FROM ranked GROUP BY component
"""


def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted shard manifest (see :mod:`..operators.packing`):
    every (lang, shard) with its doc/token counts and id range. The
    Spark plan is the two-level distributed prefix sum; the oracle is
    the naive single window — provably the same assignment, so the
    hash check verifies the parallel decomposition itself."""
    from ..operators.packing import pack_token_shards, shard_summary

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    packed = pack_token_shards(docs, budget=2000, segment_width=128)
    return shard_summary(packed)


def oracle_token_shards() -> str:
    return """
WITH toks AS (
    SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
    SELECT *, COALESCE(SUM(n_tokens) OVER (
        PARTITION BY lang ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM toks
)
SELECT lang, CAST(CAST(before AS BIGINT) // 2000 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM cum GROUP BY 1, 2
"""


SEQ_PACK_BUDGET = 256   # tokens per training sequence


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy sequence packing (see
    :func:`..operators.packing.greedy_sequence_pack`): per (lang,
    source) shard, documents in doc-id order fill 256-token training
    sequences, a document never spanning two. One row per document with
    its sequence id and token offset — the layout a sequence-packing
    exporter writes. The reset-on-overflow fold is not window-
    expressible; the oracle replays it as a recursive CTE, so the hash
    check adjudicates the stateful executor itself."""
    from ..operators.packing import greedy_sequence_pack

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
    )
    return greedy_sequence_pack(
        docs,
        keys=["lang", "source"],
        order=["doc_id"],
        token_col="n_tokens",
        budget=SEQ_PACK_BUDGET,
    )


def oracle_sequence_pack() -> str:
    b = SEQ_PACK_BUDGET
    return f"""
WITH RECURSIVE toks AS (
    SELECT lang, source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
ordered AS (
    SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
    FROM toks
),
walk AS (
    SELECT lang, source, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS pack_id,
           CAST(0 AS BIGINT) AS pack_offset,
           n_tokens AS filled
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.lang, o.source, o.doc_id, o.n_tokens, o.rn,
           CASE WHEN w.filled > 0 AND w.filled + o.n_tokens > {b}
                THEN w.pack_id + 1 ELSE w.pack_id END,
           CASE WHEN w.filled > 0 AND w.filled + o.n_tokens > {b}
                THEN CAST(0 AS BIGINT) ELSE w.filled END,
           CASE WHEN w.filled > 0 AND w.filled + o.n_tokens > {b}
                THEN o.n_tokens ELSE w.filled + o.n_tokens END
    FROM walk w
    JOIN ordered o ON o.lang = w.lang AND o.source = w.source
                   AND o.rn = w.rn + 1
)
SELECT lang, source, doc_id, n_tokens, pack_id, pack_offset FROM walk
"""


def q_sequence_pack_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed two-phase form of `sequence_pack`
    (:func:`..operators.packing.greedy_sequence_pack_scan`:
    boundary-segment function tables via the first-reset lemma, driver
    fold, partition-local replay) adjudicated against the SAME
    recursive-CTE oracle as the grouped fold — the hash check proves
    the parallel decomposition itself, exactly like
    `capped_running_scan` does for the clamped fold."""
    from ..operators.packing import greedy_sequence_pack_scan

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
    )
    return greedy_sequence_pack_scan(
        docs,
        keys=["lang", "source"],
        order=["doc_id"],
        token_col="n_tokens",
        budget=SEQ_PACK_BUDGET,
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split at near-dup-CLUSTER granularity: every doc
    hashes on its dedup-cluster representative (component min id from
    `dedup_clusters`; unclustered docs represent themselves), so a
    near-duplicate pair can never straddle train and test — the
    leakage-safe refinement of `train_split`'s per-doc hash. Same
    ~80/10/10 md5 thresholds; per (lang, split) doc / cluster / token
    counts.

    Shape: the component map (one row per *clustered* doc — a small
    fraction of the corpus) broadcast-left-joins the corpus, the split
    is a scan-level expression on the coalesced representative, then
    one map-side-combinable aggregate. At 100 TB the broadcast holds as
    long as the duplicate set fits an executor (tens of millions of
    rows); past that, drop the hint and let AQE pick the shuffle join —
    the plan is otherwise unchanged."""
    clusters = q_dedup_clusters(spark, sf_dir)
    docs = planted_corpus(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ", -1)).cast("long").alias("__tok"),
    )
    members = docs.join(
        F.broadcast(clusters.withColumnRenamed("node", "doc_id")),
        "doc_id",
        "left",
    )
    rep = F.coalesce("component", "doc_id")
    key = F.substring(
        F.md5(F.concat(F.lit("split#"), rep.cast("string"))), 1, 4
    )
    split = (
        F.when(key < "cccc", F.lit("train"))
        .when(key < "e666", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        members.select(
            "lang", split.alias("split"), rep.alias("__rep"), "__tok"
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("__rep").cast("long").alias("n_clusters"),
            F.sum("__tok").cast("long").alias("n_tokens"),
        )
    )


def oracle_leakage_safe_split() -> str:
    clusters_sql = oracle_dedup_clusters()
    prefix = clusters_sql.rsplit("SELECT", 1)[0]
    return f"""{prefix}
, clusters AS (
    SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
),
labeled AS (
    SELECT c.lang,
           COALESCE(cl.component, c.doc_id) AS rep,
           len(string_split(c.text, ' ')) AS t
    FROM corpus c LEFT JOIN clusters cl ON cl.node = c.doc_id
)
SELECT lang,
    CASE WHEN substr(md5('split#' || CAST(rep AS VARCHAR)), 1, 4) < 'cccc'
         THEN 'train'
         WHEN substr(md5('split#' || CAST(rep AS VARCHAR)), 1, 4) < 'e666'
         THEN 'val' ELSE 'test' END AS split,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
    CAST(sum(t) AS BIGINT) AS n_tokens
FROM labeled GROUP BY 1, 2
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition profile (duplicate-bigram fraction, top-token
    share) — the Gopher-style repetition filters."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return TS.repetition_stats(docs).select(
        "doc_id", "n_tokens", "n_grams", "n_distinct_grams",
        "dup_gram_ratio", "max_token_count", "top_token_share",
    )


def oracle_doc_repetition() -> str:
    return """
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
    SELECT doc_id,
        CAST(len(w) AS BIGINT) AS n_tokens,
        CAST(len(w) - 1 AS BIGINT) AS n_grams,
        CAST(len(list_distinct(list_transform(range(1, len(w)),
             i -> w[i] || ' ' || w[i+1]))) AS BIGINT) AS n_distinct_grams
    FROM base
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
mx AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_token_count FROM cnt GROUP BY 1)
SELECT g.doc_id, n_tokens, n_grams, n_distinct_grams,
    CASE WHEN n_grams <= 0 THEN 0.0
         ELSE (n_grams - n_distinct_grams) / CAST(n_grams AS DOUBLE) END
        AS dup_gram_ratio,
    max_token_count,
    max_token_count / CAST(n_tokens AS DOUBLE) AS top_token_share
FROM g JOIN mx ON g.doc_id = mx.doc_id
"""


def q_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rare-token scoring (integer-exact CCNet-style
    quality signal): global vocabulary counts joined back onto token
    occurrences, re-aggregated per document."""
    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return TS.rare_token_stats(docs, min_count=3)


def oracle_rare_tokens() -> str:
    return """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
vocab AS (SELECT token, count(*) AS corpus_count FROM tok GROUP BY 1)
SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN corpus_count < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
    sum(CASE WHEN corpus_count < 3 THEN 1 ELSE 0 END)
        / CAST(count(*) AS DOUBLE) AS rare_ratio
FROM tok JOIN vocab USING (token)
GROUP BY doc_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data curation.

    Per-language sampling rates (en 25%, others ~10%) via an md5-derived
    uniform key — the standard reservoir-free technique for reproducible
    corpus downsampling at any scale: no RNG state, no driver coordination,
    re-runs and backfills select the identical subset. The hex key is
    compared lexicographically (fixed-length lowercase hex orders the same
    as its numeric value), so the filter is a plain scan predicate that
    pushes down and never shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit("sample#"), F.col("doc_id").cast("string"))), 1, 4
    )
    thresh = F.when(F.col("lang") == "en", F.lit("4000")).otherwise(F.lit("1999"))
    return docs.where(key < thresh).select("doc_id", "lang", "source", "n_chars")


def oracle_stratified_sample() -> str:
    return """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5('sample#' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE WHEN lang = 'en' THEN '4000' ELSE '1999' END
"""


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: width-8 token-count buckets with global share.

    One map-side-combined groupBy over the scan; the share divides by a
    scalar total brought in as a broadcast cross join (1 row) — explicit
    about intent, unlike an unpartitioned window, which warns at plan
    time and implies a single-partition sort that isn't needed here.
    """
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " ", -1))
    bucket = (F.floor(ntok / F.lit(8)) * 8).cast("long")
    agg = docs.groupBy(bucket.alias("token_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok.cast("long")).alias("sum_tokens"),
    )
    total = agg.agg(F.sum("n_docs").alias("__total"))
    return agg.crossJoin(F.broadcast(total)).select(
        "token_bucket", "n_docs", "sum_tokens",
        (F.col("n_docs") / F.col("__total")).alias("doc_share"),
    )


def oracle_token_histogram() -> str:
    return """
WITH agg AS (
    SELECT CAST(floor(len(string_split(text, ' ')) / 8) * 8 AS BIGINT) AS token_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
    FROM documents GROUP BY 1
)
SELECT token_bucket, n_docs, sum_tokens,
       n_docs / SUM(n_docs) OVER () AS doc_share
FROM agg
"""


HH_MIN_SHARE = 0.01  # report tokens carrying > 1% of all token mass


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent tokens via two-pass Misra-Gries
    (operators/heavyhitters.py): per-partition bounded summaries ->
    broadcast candidate set -> exact verification of candidate rows
    only. The Zipfian token distribution is the textbook input — a
    handful of stopword-like tokens hold >1% shares while the tail is
    millions of cold keys that NEVER shuffle (the naive GROUP BY
    HAVING oracle shuffles every one of them). Exact by construction:
    MG guarantees the candidate superset at min_share >= 1/n_counters,
    the verify pass counts exactly."""
    from ..operators.heavyhitters import heavy_hitters

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.split("text", " ", -1)).alias("token")
    ).where(F.length("token") > 0)
    out = heavy_hitters(toks, "token", min_share=HH_MIN_SHARE)
    return out.select(
        "token",
        "n_rows",
        # round the derived share so the count/count division is
        # engine-portable (house rule)
        round_half_away(F.col("share"), 9).alias("share"),
    )


def oracle_token_heavy_hitters() -> str:
    from ..functions.rounding import sql_round_half_away

    share = sql_round_half_away(
        "COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM toks)", 9
    )
    return f"""
WITH toks AS (
    SELECT t AS token
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE length(t) > 0
)
SELECT token, COUNT(*) AS n_rows, {share} AS share
FROM toks
GROUP BY token
HAVING COUNT(*) > {HH_MIN_SHARE} * (SELECT COUNT(*) FROM toks)
"""


def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary head: top-5 tokens by frequency.

    The vocabulary-building shape every tokenizer-training pipeline runs:
    explode tokens (rows fan out ~doc_len x), count by (lang, token) with
    map-side partial aggregation soaking up the fan-out, then a per-lang
    rank over the already-aggregated (small) result. Ties broken by token
    so both engines rank identically. At 100 TB the explode never
    materializes globally — it streams through the partial aggregate.
    """
    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select("lang", F.explode(F.split("text", " ", -1)).alias("token"))
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    # salted two-phase top-k: the (lang, token) aggregate is
    # vocabulary-sized (10^8 terms at 100 TB), so a per-lang
    # row_number window would sort a whole language's vocabulary in
    # one task (VERDICT r11 #1 sweep)
    from ..operators.ranks import grouped_topk

    return (
        grouped_topk(
            counts.withColumn("__salt", F.xxhash64("token")),
            ["lang"],
            [("n", True), ("token", False)],
            5,
            salt_col="__salt",
        )
        .select("lang", "token", "n", F.col("rank").alias("rk"))
    )


def oracle_vocab_top_tokens() -> str:
    return """
WITH toks AS (
    SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
    SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY 1, 2
),
ranked AS (
    SELECT lang, token, n,
           row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rk
    FROM counts
)
SELECT lang, token, n, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= 5
"""


# --- context-window chunking -------------------------------------------------

_CHUNK_WINDOW = 64   # tokens per training chunk
_CHUNK_STRIDE = 48   # => 16-token overlap between consecutive chunks


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunker with overlap — the sequence-splitting
    step that turns curated documents into model-context-sized training
    rows (each chunk carries an md5 so downstream exact-dedup can run on
    chunks, not docs).

    Scale: a pure narrow fan-out — per-row ``sequence`` + ``explode``,
    no shuffle anywhere; at 100 TB this is a map-only stage whose output
    partitioning follows the input. The token array is materialized once
    per row and sliced per chunk (Tungsten keeps the array in the row
    buffer; no per-chunk re-split)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunked = (
        docs.withColumn("__toks", F.split(F.col("text"), " "))
        .withColumn("__n", F.size(F.col("__toks")))
        .withColumn(
            "chunk_id",
            F.explode(F.expr(f"sequence(0L, (__n - 1) div {_CHUNK_STRIDE})")),
        )
    )
    chunk = F.slice(
        F.col("__toks"),
        (F.col("chunk_id") * _CHUNK_STRIDE + 1).cast("int"),
        _CHUNK_WINDOW,
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def oracle_doc_chunks() -> str:
    w, s = _CHUNK_WINDOW, _CHUNK_STRIDE
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
    SELECT doc_id, w,
           unnest(range(0, ((len(w) - 1) // {s}) + 1)) AS chunk_id
    FROM base
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(w[(chunk_id * {s} + 1):(chunk_id * {s} + {w})]) AS BIGINT)
           AS chunk_tokens,
       md5(array_to_string(w[(chunk_id * {s} + 1):(chunk_id * {s} + {w})], ' '))
           AS chunk_md5
FROM c
"""


# --- corpus unigram language-model scoring -----------------------------------


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (the cheap stand-in for a KenLM
    perplexity filter): corpus token frequencies give per-token
    log-probabilities; each document scores the mean log-prob of its
    tokens — low scores flag gibberish / OOV-heavy documents.

    Cross-engine determinism: ln() differs by ULPs between libm
    implementations, so each *vocabulary row* (few distinct tokens, not
    every occurrence) rounds its log-prob to 9 dp and is carried as an
    exact DECIMAL; per-doc sums are then associative and identical under
    any partitioning, and the final mean rounds to 6 dp.

    Scale: vocabulary aggregation is map-side combined (uniform token
    keys); the occurrences->vocab join broadcasts in practice (a
    vocabulary is tiny next to the corpus) and the per-doc re-aggregation
    shuffles on doc_id once.

    The per-doc score table is a session artifact — the LM-score column
    a curation pass derives once and reads from three queries
    (``unigram_logprob``, ``logprob_trim``, ``quality_calibration``);
    without it each consumer replays the explode + vocab join
    (plan-audited at 15 shuffles for the trim query vs ~3 with it)."""
    from ..operators.artifacts import session_artifact

    return session_artifact(
        spark,
        f"unigram_doc_scores:{sf_dir}",
        lambda: _unigram_doc_scores(spark, sf_dir),
    )


def _unigram_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import round_half_away

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    toks = docs.select("doc_id", F.explode(TS.words(F.col("text"))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("corpus_count"))
    total = vocab.agg(F.sum("corpus_count").cast("double").alias("total"))
    scored_vocab = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        round_half_away(
            F.log(F.col("corpus_count").cast("double") / F.col("total")), 9
        )
        .cast("decimal(28,9)")
        .alias("logp"),
    )
    return (
        toks.join(F.broadcast(scored_vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logp").alias("__sum_logp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            round_half_away(
                F.col("__sum_logp").cast("double") / F.col("n_tokens"), 6
            ).alias("avg_logprob"),
        )
    )


def oracle_unigram_logprob() -> str:
    from ..functions.rounding import sql_round_half_away

    logp = sql_round_half_away("ln(corpus_count / total)", 9)
    avg = sql_round_half_away("CAST(sum(logp) AS DOUBLE) / count(*)", 6)
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
vocab AS (SELECT token, count(*) AS corpus_count FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(corpus_count) AS DOUBLE) AS total FROM vocab),
v AS (SELECT token, CAST({logp} AS DECIMAL(28,9)) AS logp FROM vocab, tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, {avg} AS avg_logprob
FROM tok JOIN v USING (token)
GROUP BY doc_id
"""


# --- deterministic train/val/test split --------------------------------------


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based train/val/test assignment (~80/10/10) with per-(lang,
    split) document and token counts — the reproducible split every
    training pipeline needs: no RNG state, stable under re-runs,
    backfills, and cluster-size changes, because membership depends only
    on the doc id. The 4-hex md5 key compares lexicographically, so the
    assignment is a scan-level expression (no shuffle before the final
    tiny aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit("split#"), F.col("doc_id").cast("string"))), 1, 4
    )
    split = (
        F.when(key < "cccc", F.lit("train"))      # 0xcccc/0x10000 = 79.99%
        .when(key < "e666", F.lit("val"))          # next ~10%
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            "lang",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("__tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
        )
    )


def oracle_train_split() -> str:
    return """
SELECT lang,
    CASE WHEN substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
         THEN 'train'
         WHEN substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
         THEN 'val' ELSE 'test' END AS split,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
"""


# --- edit-distance verification under prefix blocking ------------------------


def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match verification by true edit distance: block candidate
    pairs on a shared 64-char prefix (an equi-join — never all-pairs),
    then verify with ``levenshtein`` and keep pairs within 16 edits.
    Complements the set-based similarity family (minhash/simhash measure
    token overlap; edit distance catches small in-place mutations).

    Scale: the self-join shuffles on the prefix key; block sizes bound
    the quadratic verify to within-block pairs (a hot prefix — e.g.
    boilerplate headers — is the skew case; the mitigation is a longer
    or hashed block key, same knob as LSH band width). levenshtein is a
    JVM codegen expression, O(len^2) per pair, applied only to
    survivors of the blocking join."""
    corpus = planted_corpus(spark, sf_dir)
    blocked = corpus.select(
        "doc_id", "text", F.substring("text", 1, 64).alias("blk")
    )
    a = blocked.select(
        F.col("blk"), F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")
    )
    b = blocked.select(
        F.col("blk"), F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")
    )
    return (
        a.join(b, "blk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= 16)
    )


def oracle_edit_distance_pairs() -> str:
    return f"""
WITH {_PLANTED_SQL.strip()},
blocked AS (SELECT doc_id, text, substring(text, 1, 64) AS blk FROM corpus)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 16
"""


# --- chunk-level (paragraph) dedup: CCNet-style ------------------------------

_PDEDUP_WINDOW = 10  # tokens per dedup unit ("paragraph" of the corpus)


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup (CCNet): drop every repeated chunk except
    its globally-first occurrence, then rebuild each document from the
    surviving chunks.

    Documents are split into non-overlapping ``_PDEDUP_WINDOW``-token
    units (the corpus has no newlines, so fixed windows stand in for
    paragraphs); a unit survives iff its md5's first occurrence — lowest
    (doc_id, chunk_idx) — is this one. Unlike doc-level dedup, this
    removes boilerplate shared across *different* documents while
    keeping the documents themselves.

    Scale shape: narrow chunk fan-out (sequence + explode, no shuffle),
    one md5-partitioned window min for the first-occurrence test (hash-
    uniform keys — no skew by construction), one groupBy(doc_id) to
    reassemble. Two shuffles total, both on uniform keys; no joins.
    """
    W = _PDEDUP_WINDOW
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunked = (
        docs.withColumn("__toks", F.split(F.col("text"), " "))
        .withColumn("__n", F.size(F.col("__toks")))
        .withColumn(
            "chunk_idx",
            F.explode(F.expr(f"sequence(0L, (__n - 1) div {W})")),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    (F.col("chunk_idx") * W + 1).cast("int"),
                    W,
                ),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn("chunk_md5", F.md5("chunk_text"))
    )
    first = F.min(F.struct("doc_id", "chunk_idx")).over(
        Window.partitionBy("chunk_md5")
    )
    surviving = chunked.withColumn("__first", first).where(
        (F.col("doc_id") == F.col("__first.doc_id"))
        & (F.col("chunk_idx") == F.col("__first.chunk_idx"))
    )
    kept = surviving.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_chunks"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            )
        ).alias("dedup_md5"),
    )
    totals = chunked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return (
        totals.join(kept, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("kept_chunks", F.lit(0)).alias("kept_chunks"),
            F.coalesce("dedup_md5", F.md5(F.lit(""))).alias("dedup_md5"),
        )
    )


def oracle_chunk_dedup() -> str:
    w = _PDEDUP_WINDOW
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
chunks AS (
    SELECT doc_id, chunk_idx,
           array_to_string(
               toks[chunk_idx * {w} + 1 : chunk_idx * {w} + {w}], ' '
           ) AS chunk_text
    FROM (SELECT doc_id, toks,
                 unnest(range(0, ((len(toks) - 1) // {w}) + 1)) AS chunk_idx
          FROM base)
),
hashed AS (
    SELECT doc_id, chunk_idx, chunk_text, md5(chunk_text) AS chunk_md5
    FROM chunks
),
marked AS (
    SELECT doc_id, chunk_idx, chunk_text,
           min(ROW(doc_id, chunk_idx)) OVER (PARTITION BY chunk_md5)
               AS first_occ
    FROM hashed
),
kept AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS kept_chunks,
           md5(string_agg(chunk_text, ' ' ORDER BY chunk_idx)) AS dedup_md5
    FROM marked
    WHERE first_occ = ROW(doc_id, chunk_idx)
    GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_chunks AS BIGINT) AS n_chunks,
       COALESCE(kept_chunks, 0) AS kept_chunks,
       COALESCE(dedup_md5, md5('')) AS dedup_md5
FROM (SELECT doc_id, count(*) AS n_chunks FROM hashed GROUP BY 1) t
LEFT OUTER JOIN kept ON t.doc_id = kept.doc_id
"""


# --- incremental batch dedup -------------------------------------------------


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: adjudicate an INCOMING batch against the
    EXISTING corpus — the shape every continuously-ingesting training
    pipeline runs per crawl drop. The planted mirror/scrape docs play
    the incoming batch; the original documents are the standing corpus.

    Verdict per incoming doc: ``exact_dup`` (content hash already in the
    corpus), ``near_dup`` (LSH candidate verified at Jaccard >= 0.5
    against a corpus doc), else ``unique``; ``base_match`` is the lowest
    matching corpus id.

    Scale shape: the exact probe is one equi-join on the content digest
    (AQE broadcasts the batch side when it is small — the common case);
    the near probe reuses the MinHash/LSH bucket join, then keeps only
    cross-side pairs — candidate generation over corpus+batch is the
    same single bucket-keyed shuffle as ``minhash_near_dups``, never a
    batch x corpus comparison. Batch membership is a predicate on the
    planted id space (>= 100000), mirrored verbatim in the oracle.
    """
    corpus = planted_corpus(spark, sf_dir)
    is_new = F.col("source").isin("mirror", "scrape")
    newb = corpus.where(is_new)
    base = corpus.where(~is_new)

    base_hashes = (
        base.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("exact_match"))
    )
    exact = newb.select("doc_id", F.md5("text").alias("h")).join(
        base_hashes, "h", "left"
    )

    verified = planted_near_dup_pairs(spark, sf_dir)
    near = (
        verified.where((F.col("doc_a") < 100000) & (F.col("doc_b") >= 100000))
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("near_match"))
    )

    verdict = (
        F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
        .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
    )
    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            verdict.alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("base_match"),
        )
    )


def oracle_incremental_dedup() -> str:
    minhash_sql = oracle_minhash_near_dups()
    prefix = minhash_sql.split("WITH", 1)[1].rsplit("SELECT", 1)[0]
    return f"""
WITH {prefix}
, near AS (
    SELECT doc_b AS doc_id, min(doc_a) AS near_match
    FROM common
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
      AND doc_a < 100000 AND doc_b >= 100000
    GROUP BY 1
),
base_hashes AS (
    SELECT md5(text) AS h, min(doc_id) AS exact_match
    FROM corpus WHERE source NOT IN ('mirror', 'scrape')
    GROUP BY 1
),
newb AS (
    SELECT doc_id, md5(text) AS h FROM corpus
    WHERE source IN ('mirror', 'scrape')
)
SELECT n.doc_id,
       CASE WHEN bh.exact_match IS NOT NULL THEN 'exact_dup'
            WHEN nr.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'unique' END AS verdict,
       COALESCE(bh.exact_match, nr.near_match) AS base_match
FROM newb n
LEFT OUTER JOIN base_hashes bh ON n.h = bh.h
LEFT OUTER JOIN near nr ON nr.doc_id = n.doc_id
"""


def q_bloom_prefilter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup: the 100 TB form of the
    exact-probe half of ``incremental_dedup``.

    An m-bit Bloom filter over the standing corpus's content digests is
    built as a bit_or-aggregated ``(word, bits)`` bitmap (<= m/64 rows,
    broadcastable regardless of corpus size), probed map-side by the
    incoming batch, and only might-contain rows reach the exact hash
    anti-join.  ``bloom_pass=false`` rows are emitted as new without
    ever touching the shuffle join — at production scale that is ~99%
    of a crawl drop, so the anti-join's shuffle shrinks from |batch| to
    ~|dups|.  The answer stays exact (no false negatives); the oracle
    recomputes both the membership verdict AND the k-bit probe from the
    same md5-hex arithmetic, so a hash-construction drift on either
    side fails the row hash, not just the summary.

    Scale shape: one map-side-combined groupBy bounded at m/64 rows
    (filter build), k broadcast joins (probe, zero probe-side
    shuffles), one equi-join that only the bloom survivors enter.  The
    static PLANS.md row over-counts exchanges: the k probe joins all
    broadcast the SAME canonical bitmap plan, which AQE dedups at stage
    materialization — the executed plan shows the bitmap built once + 9
    ReusedExchange across both union branches (static explain can't
    show reuse under AQE; mechanically pinned since r13 by
    tests/test_plan_audit.py::test_bloom_prefilter_executed_plan_reuses_bitmap
    via tools/plan_audit.executed_audit).  Cite: reference dedup-on-write is
    PostgreSQL ``ON CONFLICT (trade_id) DO NOTHING``
    (`reference/src/pipeline/collectors/deribit.py:128`); this is the
    engine-side equivalent that K2 ``insert_if_absent`` composes with.
    """
    corpus = planted_corpus(spark, sf_dir)
    is_new = F.col("source").isin("mirror", "scrape")
    incoming = corpus.where(is_new)
    base = corpus.where(~is_new)

    bitmap = BF.bloom_build(base, F.col("text"))
    probed = BF.bloom_probe(
        incoming.select("doc_id", "text"), bitmap, F.col("text")
    ).select("doc_id", F.md5("text").alias("h"), "bloom_pass")

    base_hashes = (
        base.select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("present", F.lit(True))
    )
    survivors = (
        probed.where("bloom_pass")
        .join(base_hashes, "h", "left")
        .select("doc_id", "bloom_pass", F.col("present").isNull().alias("is_new"))
    )
    definite = probed.where(~F.col("bloom_pass")).select(
        "doc_id", "bloom_pass", F.lit(True).alias("is_new")
    )
    return survivors.unionByName(definite)


def oracle_bloom_prefilter_dedup() -> str:
    m, k = BF.M_BITS, BF.K_HASHES
    return f"""
WITH {_PLANTED_SQL.strip().rstrip()},
base AS (SELECT * FROM corpus WHERE source NOT IN ('mirror', 'scrape')),
inc AS (SELECT doc_id, text FROM corpus WHERE source IN ('mirror', 'scrape')),
base_bits AS (
    SELECT DISTINCT (h1 + g.i * h2) % {m} AS pos
    FROM (
        SELECT ('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT AS h1,
               ('0x' || substr(md5(text), 16, 15))::UBIGINT::BIGINT AS h2
        FROM base
    )
    CROSS JOIN generate_series(0, {k - 1}) AS g(i)
),
inc_pos AS (
    SELECT doc_id, (h1 + g.i * h2) % {m} AS pos
    FROM (
        SELECT doc_id,
               ('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT AS h1,
               ('0x' || substr(md5(text), 16, 15))::UBIGINT::BIGINT AS h2
        FROM inc
    )
    CROSS JOIN generate_series(0, {k - 1}) AS g(i)
),
flags AS (
    SELECT doc_id, bool_and(b.pos IS NOT NULL) AS bloom_pass
    FROM inc_pos p LEFT OUTER JOIN base_bits b ON p.pos = b.pos
    GROUP BY doc_id
)
SELECT i.doc_id, f.bloom_pass,
       CASE WHEN NOT f.bloom_pass THEN TRUE ELSE bh.h IS NULL END AS is_new
FROM inc i
JOIN flags f ON f.doc_id = i.doc_id
LEFT OUTER JOIN (SELECT DISTINCT md5(text) AS h FROM base) bh
       ON md5(i.text) = bh.h
"""


# --- text normalization audit ------------------------------------------------


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass audit: lowercase, strip non-alphanumerics,
    collapse whitespace — the canonical pre-dedup text cleanup — with
    per-doc before/after sizes and the digest of the normalized form
    (what an exact-dedup stage downstream would key on).

    Pure scan-level expressions (regexp_replace chains); zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_before"),
        F.length(normalized).cast("long").alias("n_chars_after"),
        (F.length("text") - F.length(normalized)).cast("long").alias("n_removed"),
        F.md5(normalized).alias("norm_md5"),
    )


def oracle_text_normalize() -> str:
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text),"
        " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    )
    return f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_before,
       CAST(length({norm}) AS BIGINT) AS n_chars_after,
       CAST(length(text) - length({norm}) AS BIGINT) AS n_removed,
       md5({norm}) AS norm_md5
FROM documents
"""


# --- quality-score calibration ----------------------------------------------


def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table: fixed-width quality-score buckets vs the
    unigram-LM score — does the cheap heuristic rank documents the same
    way the LM does? Fixed-width buckets (floor(q*10)) instead of
    deciles on purpose: an ntile would demand a GLOBAL sort of the
    corpus, while the bucket id is a scan-level expression — the shape
    that survives 100 TB. Joins two per-doc derived tables on doc_id and
    reduces to at most 11 rows."""
    quality = TS.quality_score(
        parallelized(spark, load_table(spark, sf_dir, "documents"))
    ).select("doc_id", "quality_score")
    lm = q_unigram_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    from ..functions.rounding import round_half_away

    joined = quality.join(lm, "doc_id").select(
        F.floor(F.col("quality_score") * 10).cast("int").alias("q_bucket"),
        F.col("quality_score").cast("decimal(28,9)").alias("q"),
        F.col("avg_logprob").cast("decimal(28,9)").alias("lp"),
    )
    return joined.groupBy("q_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        round_half_away(
            F.sum("q").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_quality"),
        round_half_away(
            F.sum("lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_logprob"),
    )


def oracle_quality_calibration() -> str:
    from ..functions.rounding import sql_round_half_away

    base = oracle_unigram_logprob().strip()
    quality_sql = oracle_text_quality().strip()
    mean_q = sql_round_half_away("CAST(sum(q) AS DOUBLE) / count(*)", 6)
    mean_lp = sql_round_half_away("CAST(sum(lp) AS DOUBLE) / count(*)", 6)
    return f"""
WITH lm AS ({base}),
qual AS ({quality_sql})
SELECT CAST(floor(qual.quality_score * 10) AS INT) AS q_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       {mean_q} AS mean_quality,
       {mean_lp} AS mean_logprob
FROM (SELECT doc_id, quality_score, CAST(quality_score AS DECIMAL(28,9)) AS q
      FROM qual) qual
JOIN (SELECT doc_id, CAST(avg_logprob AS DECIMAL(28,9)) AS lp FROM lm) lm
  ON qual.doc_id = lm.doc_id
GROUP BY 1
"""


# --- composed corpus health report -------------------------------------------


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-language corpus health dashboard: doc/token volumes, mean
    heuristic quality, mean unigram-LM score, and the exact-duplicate
    count — one row per language, composing three derived tables the
    engine already maintains (quality scores, the LM-score artifact, and
    content digests). Every input is per-doc and joins on doc_id before
    a single tiny groupBy; the LM scores come from the session artifact,
    so this report adds ONE corpus scan beyond it."""
    from ..functions.rounding import round_half_away

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("__tok"),
        F.md5("text").alias("__h"),
    )
    dup_counts = base.groupBy("lang", "__h").agg(
        F.count(F.lit(1)).alias("__n")
    )
    dups = dup_counts.groupBy("lang").agg(
        F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("exact_dup_docs")
    )
    qual = TS.quality_score(docs).select(
        "doc_id", F.col("quality_score").cast("decimal(28,9)").alias("__q")
    )
    lm = q_unigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("avg_logprob").cast("decimal(28,9)").alias("__lp")
    )
    per_doc = base.join(qual, "doc_id").join(lm, "doc_id")
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        round_half_away(
            F.sum("__q").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_quality"),
        round_half_away(
            F.sum("__lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_logprob"),
    )
    return agg.join(dups, "lang")


def oracle_corpus_report() -> str:
    from ..functions.rounding import sql_round_half_away

    qual = oracle_text_quality().strip()
    lm = oracle_unigram_logprob().strip()
    mean_q = sql_round_half_away("CAST(sum(q) AS DOUBLE) / count(*)", 6)
    mean_lp = sql_round_half_away("CAST(sum(lp) AS DOUBLE) / count(*)", 6)
    return f"""
WITH qual AS ({qual}),
lm AS ({lm}),
base AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS tok, md5(text) AS h
    FROM documents
),
dups AS (
    SELECT lang,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
               AS exact_dup_docs
    FROM (SELECT lang, h, count(*) AS n FROM base GROUP BY 1, 2)
    GROUP BY 1
),
per_doc AS (
    SELECT b.lang, b.tok,
           CAST(qual.quality_score AS DECIMAL(28,9)) AS q,
           CAST(lm.avg_logprob AS DECIMAL(28,9)) AS lp
    FROM base b
    JOIN qual ON qual.doc_id = b.doc_id
    JOIN lm ON lm.doc_id = b.doc_id
),
agg AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           {mean_q} AS mean_quality,
           {mean_lp} AS mean_logprob
    FROM per_doc GROUP BY 1
)
SELECT agg.lang, n_docs, n_tokens, mean_quality, mean_logprob, exact_dup_docs
FROM agg JOIN dups ON agg.lang = dups.lang
"""


# --- cross-source duplication matrix -----------------------------------------


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair (a < b),
    how many identical-text doc pairs span the two sources — the view
    that tells a crawl pipeline WHICH feeds mirror each other (the
    planted mirror/scrape cohorts light up against their origins).

    Shape: per-(hash, source) counts first (one map-side-combined
    groupBy — the fan-in happens BEFORE any join), then a self-join on
    the content hash restricted to hashes seen in >1 source; pair count
    = n_a x n_b. The join input is one row per (hash, source), a
    vanishing fraction of the corpus."""
    from ..operators.materialize import materialize

    corpus = planted_corpus(spark, sf_dir)
    # hs feeds BOTH sides of the self-join — unbarriered, each side
    # re-scanned the corpus (r13 scans audit: 6 scans).  hs is the
    # compact per-(hash, source) aggregate, so one checkpoint bounds
    # the matrix at one corpus scan.
    hs = materialize(
        corpus.select(F.md5("text").alias("h"), "source")
        .groupBy("h", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = hs.select("h", F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    b = hs.select("h", F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.col("n_a") * F.col("n_b")).cast("long").alias("dup_pairs"),
            F.countDistinct("h").alias("shared_texts"),
        )
    )


def oracle_source_overlap() -> str:
    return f"""
WITH {_PLANTED_SQL},
hs AS (
    SELECT md5(text) AS h, source, count(*) AS n
    FROM corpus GROUP BY 1, 2
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum(a.n * b.n) AS BIGINT) AS dup_pairs,
       CAST(count(DISTINCT a.h) AS BIGINT) AS shared_texts
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""


# substring-level dedup: fixed-width char spans on a stride; a span seen
# in >= 2 distinct docs is cross-doc boilerplate (the span-granular
# variant of Lee et al.'s exact-substring dedup)
_SPAN_W = 40
_SPAN_STRIDE = 20


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated character spans: top 100 spans (by distinct
    doc count) appearing in at least two documents.

    Each doc fans out to ~len/stride fixed-width char spans (a scan-level
    sequence+explode, no shuffle), then one hash aggregate on span_md5
    computes (distinct docs, occurrences) with partial aggregation; the
    top-100 is TakeOrderedAndProject, never a global sort. Fan-out is
    linear in corpus bytes — the same I/O the shingle stores already pay
    — and the md5 keys are hash-uniform, so the aggregate has no skew by
    construction.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = (
        docs.withColumn(
            "pos",
            F.explode(
                F.expr(
                    f"sequence(1, greatest(length(text) - {_SPAN_W - 1}, 1),"
                    f" {_SPAN_STRIDE})"
                )
            ),
        )
        .select(
            "doc_id",
            F.md5(
                F.expr(f"substring(text, pos, {_SPAN_W})")
            ).alias("span_md5"),
        )
    )
    return (
        spans.groupBy("span_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(
            F.col("n_docs").desc(),
            F.col("n_occurrences").desc(),
            F.col("span_md5").asc(),
        )
        .limit(100)
    )


def oracle_repeated_spans() -> str:
    return f"""
WITH spans AS (
    -- scalar range() + unnest: DuckDB's lateral generate_series cannot
    -- take column arguments; range() is stop-exclusive hence the +1
    SELECT doc_id,
           md5(substr(text, CAST(pos AS INT), {_SPAN_W})) AS span_md5
    FROM (
        SELECT d.doc_id, d.text,
               unnest(range(1, greatest(length(d.text) - {_SPAN_W - 1}, 1) + 1,
                            {_SPAN_STRIDE})) AS pos
        FROM documents d
    )
)
SELECT span_md5,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM spans
GROUP BY 1
HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, span_md5 ASC
LIMIT 100
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sampling: keep each doc with
    probability (n_chars / max_n_chars) * 0.5 — longer docs (more
    tokens) are proportionally more likely to be kept, the standard
    token-mass-preserving downsample.

    The coin is the first 8 md5 hex digits parsed as an integer u in
    [0, 2^32); the keep test `u * max_chars < n_chars * 2^31` is pure
    BIGINT arithmetic (products < 2^63), so the selected set is
    bit-identical across engines, partitionings, and re-runs — no RNG
    state, no float rounding. The corpus max is a scalar aggregate
    broadcast into the scan predicate.
    """
    docs = load_table(spark, sf_dir, "documents")
    maxc = docs.agg(F.max("n_chars").alias("max_chars"))
    u = F.expr(
        "cast(conv(substring(md5(concat('wsample#', cast(doc_id as string)))"
        ", 1, 8), 16, 10) as bigint)"
    )
    return (
        docs.crossJoin(F.broadcast(maxc))
        .where(u * F.col("max_chars") < F.col("n_chars") * F.lit(2147483648))
        .select("doc_id", "lang", "source", "n_chars")
    )


def oracle_weighted_sample() -> str:
    return """
SELECT doc_id, lang, source, n_chars
FROM documents
CROSS JOIN (SELECT max(n_chars) AS max_chars FROM documents)
WHERE CAST(concat('0x', substr(md5('wsample#' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) * max_chars
      < n_chars * 2147483648
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot reconciliation: classify every doc across two
    dataset versions as added / removed / changed / unchanged — the
    CDC-style diff a versioned data lake computes between releases.

    Snapshot v2 is derived deterministically from v1 in-plan (docs with
    id % 11 == 3 dropped, id % 7 == 2 get edited text, plus re-keyed
    additions), so both engines materialize identical versions with no
    side files. The diff itself is ONE full-outer join on the id plus an
    md5 comparison — the scalable shape (hash-partitioned join, no
    window, content equality via digest, never string compare).
    """
    v1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = v1.where(F.col("doc_id") % 11 != 3)
    edited = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 2,
            F.concat(F.lit("v2 revision: "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    added = v1.where(F.col("doc_id") % 13 == 5).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    v2 = edited.unionByName(added)

    a = v1.select("doc_id", F.md5("text").alias("md5_v1"))
    b = v2.select("doc_id", F.md5("text").alias("md5_v2"))
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("md5_v1").isNull(), F.lit("added"))
        .when(F.col("md5_v2").isNull(), F.lit("removed"))
        .when(F.col("md5_v1") != F.col("md5_v2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def oracle_snapshot_diff() -> str:
    return """
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 2 THEN 'v2 revision: ' || text
                ELSE text END AS text
    FROM v1 WHERE doc_id % 11 != 3
    UNION ALL
    SELECT doc_id + 1000000, text FROM v1 WHERE doc_id % 13 = 5
),
j AS (
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           md5(a.text) AS md5_v1, md5(b.text) AS md5_v2
    FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
)
SELECT CASE WHEN md5_v1 IS NULL THEN 'added'
            WHEN md5_v2 IS NULL THEN 'removed'
            WHEN md5_v1 <> md5_v2 THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*) AS n_docs,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM j GROUP BY 1
"""


# MLM-style corruption: mask ~16% of tokens (md5 coin per (doc, pos))
_MASK_THRESHOLD = "29"  # first 2 md5 hex chars < '29' -> 41/256 ~ 16%


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic masked-LM corruption pairs: per document, the
    masked input and the extraction targets, as digests.

    The mask coin is md5(doc_id # position) — reproducible across
    engines, partitionings, and re-runs (the property a training
    pipeline needs so restarts regenerate byte-identical examples). The
    whole transform is array lambdas inside the scan stage (indexed
    `transform`/`filter`, no shuffle, no UDF); position indices are
    1-based to match the oracle's 1-based list lambdas.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")

    def coin(i):
        # i is Spark's 0-based lambda index; hash the 1-based position
        return F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    (i + 1).cast("string"),
                )
            ),
            1,
            2,
        ) < F.lit(_MASK_THRESHOLD)

    masked = F.transform(
        toks, lambda x, i: F.when(coin(i), F.lit("<M>")).otherwise(x)
    )
    targets = F.filter(toks, lambda x, i: coin(i))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(targets).cast("long").alias("n_masked"),
        F.md5(F.array_join(masked, " ")).alias("masked_md5"),
        F.md5(F.array_join(targets, " ")).alias("targets_md5"),
    )


def oracle_span_corruption() -> str:
    coin = (
        "substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR)),"
        f" 1, 2) < '{_MASK_THRESHOLD}'"
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, (x, i) -> {coin})) AS BIGINT) AS n_masked,
       md5(array_to_string(
           list_transform(toks, (x, i) ->
               CASE WHEN {coin} THEN '<M>' ELSE x END), ' ')) AS masked_md5,
       -- DuckDB: array_to_string([]) is NULL, Spark joins to '' — pin
       md5(coalesce(array_to_string(
           list_filter(toks, (x, i) -> {coin}), ' '), '')) AS targets_md5
FROM t
"""


# --- round-4: corpus-wide frequent n-grams -----------------------------------

_FNG_MIN_DOCS = 3
_FNG_TOP = 50


def q_frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent word trigrams: the boilerplate/template
    detector (navigation chrome, license headers, prompt-injection
    strings) every pretraining pipeline runs before span-level dedup.

    Scan-level trigram fan-out (~len/1 per doc, linear in corpus bytes)
    absorbed by one partially-aggregated groupBy on the gram string;
    the (distinct-doc, occurrence) pair comes from a single aggregate.
    Top-50 is TakeOrderedAndProject — never a global sort. Ties broken
    by the gram text so both engines rank identically.
    """
    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    grams_expr = (
        "CASE WHEN size(split(text, ' ')) >= 3 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', split(text, ' ')[i-1], split(text, ' ')[i],"
        " split(text, ' ')[i+1])) "
        "ELSE array() END"
    )
    grams = docs.select("doc_id", F.explode(F.expr(grams_expr)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= _FNG_MIN_DOCS)
        .orderBy(
            F.col("n_docs").desc(),
            F.col("n_occurrences").desc(),
            F.col("ngram").asc(),
        )
        .limit(_FNG_TOP)
    )


def oracle_frequent_ngrams() -> str:
    return f"""
WITH grams AS (
    SELECT doc_id,
           unnest(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1] || ' '
                    || string_split(text, ' ')[i+2])) AS ngram
    FROM documents
)
SELECT ngram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM grams
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= {_FNG_MIN_DOCS}
ORDER BY n_docs DESC, n_occurrences DESC, ngram ASC
LIMIT {_FNG_TOP}
"""


# --- round-4: BPE tokenizer-training pair counts -----------------------------

_BPE_TOP = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE training round: the corpus's top adjacent character-pair
    frequencies over the word-frequency table (operators/bpe.py) — the
    distributed step every merge iteration repeats.

    Scale shape: the corpus collapses to (word, freq) once (one groupBy);
    the pair fan-out then runs over DISTINCT WORDS, not corpus tokens —
    the reduction that makes iterative BPE affordable at 100 TB. Ties
    break lexicographically so the top-20 is deterministic.
    """
    from ..operators.bpe import pair_counts, with_symbols, word_freq_table

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    words = word_freq_table(docs)
    return (
        pair_counts(with_symbols(words))
        .orderBy(
            F.col("pair_count").desc(),
            F.col("left").asc(),
            F.col("right").asc(),
        )
        .limit(_BPE_TOP)
    )


def oracle_bpe_pair_counts() -> str:
    return f"""
WITH words AS (
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY 1
),
pairs AS (
    SELECT freq,
           unnest(list_transform(range(1, greatest(length(word) - 1, 0) + 1),
                  i -> struct_pack(l := word[i], r := word[i+1]))) AS p
    FROM words
)
SELECT p.l AS "left", p.r AS "right", CAST(SUM(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY 1, 2
ORDER BY pair_count DESC, "left" ASC, "right" ASC
LIMIT {_BPE_TOP}
"""


# ---------------------------------------------------------------------------
# bigram_pmi — collocation mining
# ---------------------------------------------------------------------------

_PMI_MIN_PAIR = 5   # min bigram occurrences before PMI is meaningful
_PMI_TOP = 50


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: adjacent word pairs ranked by a PMI-style
    association ratio — the phrase detector (``"new york"``,
    ``"machine learning"``) run before vocabulary building so
    multi-word units become single tokens.

    The statistic is the exact rational

        ratio = (c_ab * N_uni * N_uni) / (N_bi * c_a * c_b)

    (the exp of PMI with unigram/bigram normalizers) computed with
    IEEE-exact double products in a pinned association order — no
    ``log``, so no libm variance between engines. Shapes: one bigram
    fan-out + hash aggregate, one unigram aggregate, two 1-row scalar
    aggregates broadcast, then two joins against the unigram counts on
    the hash-uniform term key (dimension-sized — AQE broadcasts them).
    Top-50 is TakeOrderedAndProject.
    """
    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.length("term") > 0
    )
    # Materialize both compact aggregates: three plan branches consume
    # the unigram counts (marginal a, marginal b, normalizer) and two
    # consume the bigram counts — without a materialization point
    # Catalyst re-derives the corpus explode+aggregate per branch
    # (12 shuffles, 5 corpus scans; with it: the corpus is scanned once
    # per gram order and the join inputs are vocabulary-sized tables).
    uni = materialize(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("c_term"))
    )
    n_uni = uni.agg(F.sum("c_term").cast("long").alias("n_uni"))

    bigram_expr = (
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i-1] AS term_a, split(text, ' ')[i] AS term_b)) "
        "ELSE array() END"
    )
    bi = materialize(
        docs.select(F.explode(F.expr(bigram_expr)).alias("bg"))
        .select("bg.term_a", "bg.term_b")
        .where((F.length("term_a") > 0) & (F.length("term_b") > 0))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _PMI_MIN_PAIR)
    )
    n_bi = bi.agg(F.sum("c_ab").cast("long").alias("n_bi"))

    ua = uni.select(F.col("term").alias("term_a"), F.col("c_term").alias("c_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("c_term").alias("c_b"))
    ratio = (
        F.col("c_ab").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
    ) / (
        F.col("n_bi").cast("double")
        * F.col("c_a").cast("double")
        * F.col("c_b").cast("double")
    )
    return (
        bi.join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "term_a", "term_b",
            F.col("c_ab").cast("long").alias("pair_count"),
            F.col("c_a").cast("long").alias("count_a"),
            F.col("c_b").cast("long").alias("count_b"),
            ratio.alias("pmi_ratio"),
        )
        .orderBy(
            F.col("pmi_ratio").desc(),
            F.col("pair_count").desc(),
            F.col("term_a").asc(),
            F.col("term_b").asc(),
        )
        .limit(_PMI_TOP)
    )


def oracle_bigram_pmi() -> str:
    return f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
uni AS (
    SELECT term, count(*) AS c_term FROM toks WHERE length(term) > 0 GROUP BY 1
),
nu AS (SELECT CAST(SUM(c_term) AS BIGINT) AS n_uni FROM uni),
bg AS (
    SELECT p.term_a, p.term_b
    FROM (
        SELECT unnest(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
                   i -> struct_pack(term_a := string_split(text, ' ')[i],
                                    term_b := string_split(text, ' ')[i+1]))) AS p
        FROM documents
    )
    WHERE length(p.term_a) > 0 AND length(p.term_b) > 0
),
bi AS (
    SELECT term_a, term_b, count(*) AS c_ab
    FROM bg GROUP BY 1, 2
    HAVING count(*) >= {_PMI_MIN_PAIR}
),
nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bi FROM bi)
SELECT bi.term_a, bi.term_b,
       CAST(bi.c_ab AS BIGINT) AS pair_count,
       CAST(ua.c_term AS BIGINT) AS count_a,
       CAST(ub.c_term AS BIGINT) AS count_b,
       (CAST(bi.c_ab AS DOUBLE) * CAST(nu.n_uni AS DOUBLE) * CAST(nu.n_uni AS DOUBLE))
           / (CAST(nb.n_bi AS DOUBLE) * CAST(ua.c_term AS DOUBLE) * CAST(ub.c_term AS DOUBLE))
           AS pmi_ratio
FROM bi
JOIN uni ua ON ua.term = bi.term_a
JOIN uni ub ON ub.term = bi.term_b
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi_ratio DESC, pair_count DESC, term_a ASC, term_b ASC
LIMIT {_PMI_TOP}
"""


# ---------------------------------------------------------------------------
# length_ks_drift — two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------

def q_length_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the document
    length distribution of English and non-English docs — the
    distribution-drift gate a corpus pipeline runs when a new source or
    language mix lands.

    Exactness: D = max_v |F_en(v) - F_other(v)| is evaluated on the
    INTEGER cross-product |ca*n2 - cb*n1| (ca, cb = cumulative counts at
    each distinct length), so the argmax and the max are found with zero
    float comparisons; the single division by n1*n2 happens once at the
    end. Shapes (re-planned r13, VERDICT r12 #3): both cumulative
    distributions come from ONE two-level segment prefix sum over the
    distinct lengths (``operators/prefixsum.grouped_value_prefix_multi``
    — the en and non-en weights cumulate in the same pass), so no
    unpartitioned window ever sees more than one bounded value-segment;
    the totals ride along as ``tw_*``, and the final argmax is one
    1-row reduce.
    """
    from ..operators.prefixsum import grouped_value_prefix_multi

    docs = load_table(spark, sf_dir, "documents")
    pfx = grouped_value_prefix_multi(
        docs,
        [],
        value_col="n_chars",
        weights={
            "a": F.when(F.col("lang") == "en", 1).otherwise(0),
            "b": F.when(F.col("lang") != "en", 1).otherwise(0),
        },
    )
    scored = pfx.select(
        F.col("value").alias("v"),
        F.col("tw_a").cast("long").alias("n1"),
        F.col("tw_b").cast("long").alias("n2"),
        F.abs(
            F.col("cum_a") * F.col("tw_b") - F.col("cum_b") * F.col("tw_a")
        ).alias("num"),
    )
    # argmax with smallest-v tie-break: struct-ordered max_by
    tie = F.struct(F.col("num"), (-F.col("v")).alias("neg_v"))
    return scored.groupBy("n1", "n2").agg(
        (
            F.max("num").cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        ).alias("ks_stat"),
        F.max_by(F.col("v"), tie).alias("at_length"),
    ).select("n1", "n2", "ks_stat", "at_length")


def oracle_length_ks_drift() -> str:
    return """
WITH per_len AS (
    SELECT n_chars AS v,
           SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
           SUM(CASE WHEN lang != 'en' THEN 1 ELSE 0 END) AS b
    FROM documents GROUP BY 1
),
cum AS (
    SELECT v,
           SUM(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
           SUM(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
    FROM per_len
),
tot AS (
    SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2 FROM per_len
),
scored AS (
    SELECT v, n1, n2, abs(ca * n2 - cb * n1) AS num
    FROM cum CROSS JOIN tot
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY num DESC, v ASC) AS r FROM scored
)
SELECT n1, n2,
       CAST(num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks_stat,
       v AS at_length
FROM ranked WHERE r = 1
"""


# ---------------------------------------------------------------------------
# zipf_fit — power-law diagnostic of the corpus vocabulary
# ---------------------------------------------------------------------------

def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) against ln(rank) over
    the corpus vocabulary — the power-law diagnostic (a healthy natural
    corpus fits slope ≈ -1; template/boilerplate floods flatten it).

    Portability recipe: ln() differs by ULPs across libm builds, so
    both log factors follow the house rule — round to 9 dp and carry as
    DECIMAL(18,9) — and every OLS sufficient statistic (Σx, Σy, Σxy,
    Σx²) is then an EXACT decimal sum; only the final slope/intercept
    expression touches floats, in pinned association order. Rank is a
    total order (count desc, term asc). Heaps' law keeps the vocabulary
    sublinear in corpus size but still ~10^8+ terms at 100 TB, so the
    rank is the two-phase distributed row_number (operators/ranks.py)
    — range shuffle + per-partition rank + broadcast offset cumsum —
    never a single-partition window (VERDICT r3 ask #2)."""
    from ..functions.rounding import round_half_away
    from ..operators.ranks import distributed_row_number

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.length("term") > 0
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    ranked = distributed_row_number(
        vocab, [("freq", True), ("term", False)], out_col="rank"
    ).select("freq", "rank")
    lx = round_half_away(F.log(F.col("rank").cast("double")), 9).cast(
        "decimal(18,9)"
    )
    ly = round_half_away(F.log(F.col("freq").cast("double")), 9).cast(
        "decimal(18,9)"
    )
    stats = ranked.select(lx.alias("x"), ly.alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy_d, sxx_d = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = n_d * sxx_d - sx_d * sx_d
    slope = (n_d * sxy_d - sx_d * sy_d) / denom
    # Outputs rounded at 6 dp (house rule): DuckDB converts a
    # DECIMAL(38,18) sum to DOUBLE through its int128 numerator (two
    # roundings), Spark's BigDecimal converts once — a last-ULP sum
    # divergence that surfaced at sf0.1. Rounding the derived
    # statistics absorbs it on both sides.
    return stats.select(
        F.col("n").alias("n_terms"),
        round_half_away(slope, 6).alias("zipf_slope"),
        round_half_away((sy_d - slope * sx_d) / n_d, 6).alias("intercept"),
    )


def oracle_zipf_fit() -> str:
    from ..functions.rounding import sql_round_half_away

    lx = sql_round_half_away("ln(CAST(rank AS DOUBLE))", 9)
    ly = sql_round_half_away("ln(CAST(freq AS DOUBLE))", 9)
    slope_sql = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    icept_sql = (
        f"(CAST(sy AS DOUBLE) - ({slope_sql}) * CAST(sx AS DOUBLE))"
        " / CAST(n AS DOUBLE)"
    )
    return f"""
WITH vocab AS (
    SELECT term, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    WHERE length(term) > 0 GROUP BY 1
),
ranked AS (
    SELECT freq,
           CAST(row_number() OVER (ORDER BY freq DESC, term ASC) AS BIGINT) AS rank
    FROM vocab
),
logs AS (
    SELECT CAST({lx} AS DECIMAL(18,9)) AS x,
           CAST({ly} AS DECIMAL(18,9)) AS y
    FROM ranked
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM logs
)
SELECT n AS n_terms,
       {sql_round_half_away(slope_sql, 6)} AS zipf_slope,
       {sql_round_half_away(icept_sql, 6)} AS intercept
FROM stats
"""


# ---------------------------------------------------------------------------
# quantile_map_lengths — distribution alignment via exact rank mapping
# ---------------------------------------------------------------------------

def q_quantile_map_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: map each non-English document length to
    its English-distribution equivalent — the distribution-alignment
    transform (normalize a feature across domains before mixing them in
    training data) on the same integer-exact machinery as
    `length_ks_drift`.

    For each distinct non-en length v with cumulative count cb (of n2),
    the target rank in the en distribution is ceil(cb*n1/n2) — integer
    ceiling division, no float quantiles — and the mapped length is the
    smallest en length whose cumulative count reaches that rank. Both
    cumulative tables come from the two-level segment prefix sum
    (``operators/prefixsum.grouped_value_prefix_multi`` — re-planned
    r13, VERDICT r12 #3: one pass cumulates both language sides, no
    unpartitioned data-sized window); they are O(distinct lengths), and
    the rank-lookup inequality join runs between those compact tables
    (the as-of operator is the swap-in at scale). Zero float
    comparisons anywhere.
    """
    from ..operators.materialize import materialize
    from ..operators.prefixsum import grouped_value_prefix_multi

    docs = load_table(spark, sf_dir, "documents")
    # one pass over the corpus cumulates BOTH distributions; the prefix
    # frame feeds the scalar-total branch, the target side, and the
    # rank join, so it is materialized once (compact by construction)
    pfx = materialize(
        grouped_value_prefix_multi(
            docs,
            [],
            value_col="n_chars",
            weights={
                "en": F.when(F.col("lang") == "en", 1).otherwise(0),
                "ot": F.when(F.col("lang") != "en", 1).otherwise(0),
            },
        )
    )
    n1 = pfx.agg(F.max("tw_en").cast("long").alias("n1"))
    other = pfx.where(F.col("vw_ot") > 0).select(
        F.col("value").alias("v"),
        F.col("cum_ot").alias("cum"),
        F.col("tw_ot").cast("long").alias("n2"),
    )
    tgt = (
        other.crossJoin(F.broadcast(n1))
        .select(
            "v", F.col("cum").alias("cb"), "n1", "n2",
            F.expr("(cum * n1 + n2 - 1) div n2").alias("r"),
        )
    )
    en_l = pfx.where(F.col("vw_en") > 0).select(
        F.col("value").alias("u"), F.col("cum_en").alias("ca")
    )
    mapped = (
        tgt.join(F.broadcast(en_l), F.col("ca") >= F.col("r"))
        .groupBy("v", "cb", "r")
        .agg(F.min("u").cast("long").alias("mapped_len"))
    )
    return mapped.select(
        F.col("v").cast("long").alias("orig_len"),
        F.col("cb").cast("long").alias("cum_other"),
        F.col("r").cast("long").alias("target_rank"),
        "mapped_len",
    )


def oracle_quantile_map_lengths() -> str:
    return """
WITH en_per AS (
    SELECT n_chars AS v, count(*) AS c FROM documents WHERE lang = 'en' GROUP BY 1
),
en_cum AS (
    SELECT v AS u,
           SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
    FROM en_per
),
ot_per AS (
    SELECT n_chars AS v, count(*) AS c FROM documents WHERE lang != 'en' GROUP BY 1
),
ot_cum AS (
    SELECT v,
           SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
    FROM ot_per
),
tot AS (
    SELECT (SELECT CAST(MAX(ca) AS BIGINT) FROM en_cum) AS n1,
           (SELECT CAST(MAX(cb) AS BIGINT) FROM ot_cum) AS n2
),
tgt AS (
    SELECT v, cb, (cb * n1 + n2 - 1) // n2 AS r
    FROM ot_cum CROSS JOIN tot
)
SELECT CAST(t.v AS BIGINT) AS orig_len,
       CAST(t.cb AS BIGINT) AS cum_other,
       CAST(t.r AS BIGINT) AS target_rank,
       CAST(MIN(e.u) AS BIGINT) AS mapped_len
FROM tgt t JOIN en_cum e ON e.ca >= t.r
GROUP BY 1, 2, 3
"""


CONTAINMENT_T = 0.9


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram CONTAINMENT near-dup: pairs where the smaller document's
    shingle set is (almost) a subset of the larger's — containment =
    n_common / min(|A|, |B|). Catches template-wrapped and
    quote-with-commentary duplication that symmetric Jaccard dilutes
    (a 100-line doc pasted into a 1000-line page scores Jaccard ~0.1
    but containment ~1.0). Same df-capped inverted-index (lang, shingle)
    self-join shape as ``ngram_jaccard_pairs`` (see SHINGLE_DF_CAP) —
    candidates bounded by cap * |postings|, never all pairs; the
    direction column says which side is the contained one."""
    pairs = shingle_pair_counts(capped_shingle_postings(spark, sf_dir))
    return (
        pairs.withColumn(
            "containment",
            F.col("n_common") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .where(F.col("containment") >= CONTAINMENT_T)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "containment",
            F.when(F.col("n_a") <= F.col("n_b"), "a_in_b")
            .otherwise("b_in_a")
            .alias("direction"),
        )
    )


def oracle_containment_pairs() -> str:
    return f"""
WITH {_PLANTED_SQL}, {_SHINGLES_SQL},
sh_l AS (
    SELECT s.doc_id, s.shingle, c.lang
    FROM shingles s JOIN corpus c USING (doc_id)
),
{_DF_CAP_SQL}
SELECT doc_a, doc_b, n_common,
       n_common / least(na.n_sh, nb.n_sh) AS containment,
       CASE WHEN na.n_sh <= nb.n_sh THEN 'a_in_b' ELSE 'b_in_a' END
           AS direction
FROM pairs
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE n_common / least(na.n_sh, nb.n_sh) >= {CONTAINMENT_T}
"""


# ---------------------------------------------------------------------------
# bpe_tokenize — the APPLY half of the tokenizer surface
# ---------------------------------------------------------------------------

_BPE_APPLY_MERGES = 6


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE training loop, adjudicated end-to-end: run
    ``_BPE_APPLY_MERGES`` merge rounds over the (word, freq) table and
    report each learned merge with the corpus token count after it.
    ``bpe_pair_counts`` pins ONE pair-count round; this query pins the
    whole iterate — pair stats, deterministic argmax (count desc, then
    lexicographic), and the left-to-right non-overlapping merge fold
    (operators/bpe.py apply_merge) whose effect is visible through the
    exact identity tokens_after = tokens_before - pair_count.

    Scale shape: the corpus collapses to distinct (word, freq) once;
    each round is one map-side-combined pair aggregate + a 1-row
    collect, with the symbol frame checkpointed every other round so
    lineage stays flat. The result itself is merge-count rows built
    from those bounded collects. The oracle replays the identical six
    rounds unrolled in SQL (list_reduce struct fold)."""
    from ..operators.bpe import (
        apply_merge,
        best_pair,
        with_symbols,
        word_freq_table,
    )
    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    symbols = materialize(with_symbols(word_freq_table(docs)))
    tokens = int(
        symbols.agg(
            F.sum(F.col("freq") * F.size("syms")).cast("long")
        ).collect()[0][0]
    )
    rows: list[tuple] = []
    for step in range(1, _BPE_APPLY_MERGES + 1):
        top = best_pair(symbols)
        if top is None or top[2] < 2:
            break
        left, right, cnt = top
        tokens -= int(cnt)
        rows.append((step, left, right, int(cnt), tokens))
        symbols = apply_merge(symbols, left, right)
        if step % 2 == 0 and step < _BPE_APPLY_MERGES:
            symbols = materialize(symbols)
    return spark.createDataFrame(
        rows, "step int, left string, right string, pair_count long, tokens_after long"
    )


def _bpe_training_stages_sql() -> str:
    """The ``p{i}/b{i}/syms{i}`` training-round CTE chain shared by the
    BPE oracles (``oracle_bpe_tokenize``, ``oracle_bpe_apply_expr``) —
    expects ``words``/``syms0`` CTEs in scope, emits one (pair count,
    argmax, merge fold) stage per round.

    The merge fold mirrors operators/bpe.py apply_merge exactly.
    DuckDB's list_reduce corrupts nested-list accumulators (struct of
    VARCHAR[] loses earlier appends mid-fold, observed on 1.x), so the
    (out, pend) state rides in ONE VARCHAR: "<pend> <out joined>" —
    symbols come from space-split words, so a space can never occur
    inside a symbol and the encoding is unambiguous. The reduce's
    seed is the raw first symbol (no space = pend-only, out empty)."""

    def pend(acc: str) -> str:
        return f"string_split({acc}, ' ')[1]"

    def rest(acc: str) -> str:
        return (
            f"CASE WHEN instr({acc}, ' ') = 0 THEN '' "
            f"ELSE substr({acc}, length({pend(acc)}) + 2) END"
        )

    def app(r: str, item: str) -> str:
        return f"CASE WHEN ({r}) = '' THEN {item} ELSE ({r}) || ' ' || ({item}) END"

    stages = []
    for i in range(1, _BPE_APPLY_MERGES + 1):
        prev = f"syms{i - 1}"
        l, r = f"b{i}.l", f"b{i}.r"
        lam = f"""(acc, x) -> CASE
            WHEN {pend('acc')} = {l} AND x = {r}
              THEN ' ' || {app(rest('acc'), f'{l} || {r}')}
            WHEN {pend('acc')} = '' THEN x || ' ' || {rest('acc')}
            ELSE x || ' ' || {app(rest('acc'), pend('acc'))} END"""
        finish = (
            f"CASE WHEN {pend('red')} = '' THEN {rest('red')} "
            f"ELSE {app(rest('red'), pend('red'))} END"
        )
        stages.append(f"""
p{i} AS (
    SELECT pr[1] AS l, pr[2] AS r, SUM(freq) AS c
    FROM (SELECT freq,
                 unnest(list_transform(range(1, greatest(len(syms) - 1, 0) + 1),
                        j -> [syms[j], syms[j+1]])) AS pr
          FROM {prev})
    GROUP BY 1, 2
),
b{i} AS (SELECT l, r, c FROM p{i} WHERE c >= 2
         ORDER BY c DESC, l ASC, r ASC LIMIT 1),
syms{i} AS (
    SELECT word, freq,
      (SELECT string_split({finish}, ' ')
       FROM (SELECT list_reduce(s.syms, {lam}) AS red)) AS syms
    FROM {prev} s, b{i}
)""")
    return ",".join(stages)


def oracle_bpe_tokenize() -> str:
    unions = "\nUNION ALL ".join(
        f"SELECT {i} AS step, l, r, c FROM b{i}"
        for i in range(1, _BPE_APPLY_MERGES + 1)
    )
    return f"""
WITH words AS (
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY 1
),
syms0 AS (
    SELECT word, freq,
           list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
    FROM words
),
tok0 AS (SELECT SUM(freq * len(syms)) AS t FROM syms0),
{_bpe_training_stages_sql()},
merges AS ({unions})
SELECT CAST(step AS INT) AS step, l AS "left", r AS "right",
       CAST(c AS BIGINT) AS pair_count,
       CAST((SELECT t FROM tok0)
            - SUM(c) OVER (ORDER BY step ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS tokens_after
FROM merges
"""


# --- count-min sketch point frequencies ---------------------------------------

CMS_PROBES = (
    "shuffle", "broadcast", "join", "scan", "window",
    "stream", "the", "zz_never_in_corpus",
)


def q_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-frequency estimates for fixed probe tokens from per-language
    Count-Min grids summed into one global grid — the mergeable-sketch
    path (:mod:`..operators.cms`): per-partition grids add, the probe
    reads min over D cells, the exact count rides along to make the
    one-sided overestimate auditable (the absent probe shows est >= 0
    = exact).  The corpus is scanned once; the shuffle carries counter
    cells, never tokens."""
    from ..operators import cms

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    tokens = docs.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    grid = cms.cms_merge(
        cms.cms_build(tokens, "token", ["lang"]), []
    )
    probes = spark.createDataFrame(
        [(t,) for t in CMS_PROBES], "token string"
    )
    est = cms.cms_query(grid, probes)
    exact = (
        tokens.where(F.col("token").isin(*CMS_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.join(exact, "token", "left")
        .select(
            "token",
            "est",
            F.coalesce(F.col("exact"), F.lit(0).cast("long")).alias("exact"),
        )
    )


def oracle_cms_token_freq() -> str:
    from ..operators.cms import D, sql_cms_col

    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    cell_exprs = " UNION ALL ".join(
        f"SELECT token, {r} AS r, {sql_cms_col(r, 'token')} AS c FROM toks"
        for r in range(D)
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT token, {r} AS r, {sql_cms_col(r, 'token')} AS c FROM probes"
        for r in range(D)
    )
    return f"""
WITH toks AS (
    SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
cells AS ({cell_exprs}),
grid AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
probes(token) AS (VALUES {probes}),
pc AS ({probe_cells}),
est AS (
    SELECT pc.token, MIN(COALESCE(g.cnt, 0)) AS est
    FROM pc LEFT JOIN grid g ON g.r = pc.r AND g.c = pc.c
    GROUP BY 1
),
exact AS (
    SELECT token, COUNT(*) AS exact FROM toks
    WHERE token IN (SELECT token FROM probes) GROUP BY 1
)
SELECT e.token, e.est, COALESCE(x.exact, 0) AS exact
FROM est e LEFT JOIN exact x USING (token)
"""


# --- feature hashing (the hashing trick) --------------------------------------

FEAT_DIM = 256


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al., "Feature hashing
    for large scale multitask learning", ICML 2009): token -> dimension
    ``hash60(token) % 256``, counts summed per (doc, dim).  The fixed
    output width is the point at 100 TB: no vocabulary pass, no fit
    step, new tokens land deterministically — the vectorizer IS a
    scan-level expression.  The result row carries nnz / l1 and an md5
    over the canonical "dim:count" encoding, so the hash gate audits
    every sparse vector exactly without shipping 256 columns."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("token")), 1, 15), 16, 10
    ).cast("long")
    cells = (
        toks.select("doc_id", F.pmod(h, F.lit(FEAT_DIM)).alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vec = F.sort_array(
        F.collect_list(F.struct(F.col("dim"), F.col("cnt")))
    )
    enc = F.concat_ws(
        ";",
        F.transform(
            vec,
            lambda s: F.concat_ws(":", s["dim"].cast("string"),
                                  s["cnt"].cast("string")),
        ),
    )
    return (
        cells.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.sum("cnt").alias("l1"),
            F.md5(enc).alias("vec_md5"),
        )
        .where(F.col("doc_id") % 7 == 0)
    )


def oracle_feature_hash() -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
    FROM documents
),
cells AS (
    SELECT doc_id,
           (('0x' || substr(md5(token), 1, 15))::BIGINT % {FEAT_DIM}) AS dim,
           COUNT(*) AS cnt
    FROM toks GROUP BY 1, 2
)
SELECT doc_id, COUNT(*) AS nnz, CAST(SUM(cnt) AS BIGINT) AS l1,
       md5(string_agg(dim || ':' || cnt, ';' ORDER BY dim)) AS vec_md5
FROM cells
WHERE doc_id % 7 = 0
GROUP BY 1
"""


# --- MinHash band-index maintenance under corpus upserts ----------------------

#: delta composition for the band-index maintenance query: every
#: ``doc_id % MH_UPD_MOD == 1`` document is REVISED in place (appended
#: section changes its shingle set, so its band hashes — and usually
#: their shard — change), while the planted mirror/scrape copies arrive
#: as NEW documents. The mutation literal is shared with the oracle.
MH_UPD_MOD = 8
MH_UPD_SUFFIX = " revised edition appendix"


def _mh_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash, shard) LSH band-index rows of ``docs``
    — shard is the first hex nibble of the band hash, the partition key
    of the stored index (an update's new band hash lands in an
    arbitrary shard, exercising the move-aware MERGE)."""
    rows = D.banded_signatures(
        D.minhash_signatures(D.hashed_shingle_sets(docs))
    )
    return rows.withColumn("shard", F.substring("band_hash", 1, 1))


def _maintained_band_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> dict[str, int]:
    """Build the standing corpus's band index, then maintain it with one
    delta batch through the move-aware partitioned MERGE.

    The 100 TB contract: signatures are computed ONLY for the delta
    documents (shingle+md5 cost ∝ |delta|, never a corpus re-signature),
    and the index rewrite touches only the shards holding the delta's
    old ∪ new band rows.  A revised document's stale band rows are
    evicted from their old shards, so the maintained index equals a
    full rebuild of the merged corpus — the oracle adjudicates exactly
    that via the candidate-pair set."""
    from ..sinks.upsert import upsert_partitioned_moving

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _mh_band_rows(docs).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(index_path)

    return upsert_partitioned_moving(
        spark,
        index_path,
        _mh_band_rows(_mh_delta(docs)),
        keys=["doc_id", "band"],
        partition_col="shard",
    )


def _mh_delta(docs: DataFrame) -> DataFrame:
    """The deterministic delta batch shared by the composite
    (`minhash_index_upsert`) and maintenance-only
    (`minhash_index_maintain`) queries AND their common oracle: revised
    in-place documents (band hashes — and shards — change) plus newly
    arrived mirror/scrape copies."""
    revised = docs.where(F.col("doc_id") % MH_UPD_MOD == 1).select(
        "doc_id", F.concat(F.col("text"), F.lit(MH_UPD_SUFFIX)).alias("text")
    )
    mirrors = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    scrapes = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copied")).alias("text"),
    )
    return revised.unionByName(mirrors).unionByName(scrapes)


def band_index_candidates(spark: SparkSession, index_path: str) -> DataFrame:
    """(doc_a, doc_b, bands_agree) near-dup candidate pairs read from
    the MAINTAINED band index only — no document text, no re-hashing;
    one groupBy on the bucket key, row-local pair expansion."""
    idx = spark.read.parquet(index_path).select("doc_id", "band", "band_hash")
    buckets = (
        idx.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = buckets.select(
        "band",
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
        ).alias("p"),
    ).select("band", "p.doc_a", "p.doc_b")
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.countDistinct("band").alias("bands_agree")
    )


def q_minhash_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup index maintenance under corpus upserts, end-to-end:
    standing band index → delta batch (revised + newly-arrived docs)
    re-signatured ONLY for the delta and merged via the move-aware
    partitioned MERGE → candidate pairs enumerated from the maintained
    index.  The oracle rebuilds the band table of the merged corpus
    from scratch, so the driver hash proves maintenance ≡ rebuild: a
    stale band row surviving a revision (phantom pair) or a missed
    insert (lost pair) fails the hash."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="mh_idx_")
    try:
        index_path = f"{base}/bands"
        _maintained_band_index(spark, sf_dir, index_path)
        out = band_index_candidates(spark, index_path).orderBy(
            "doc_a", "doc_b"
        )
        # teardown survival: cut lineage (localCheckpoint) so the result
        # blocks outlive the tempdir rmtree -- never a per-row driver
        # collect (VERDICT r10 ask #1)
        return materialize(out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def minhash_band_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing corpus's band-index rows as a session artifact —
    the full-corpus signature pass is a derived table of the immutable
    snapshot, paid once per snapshot in production (and timed separately
    by bench.py's ``minhash_band_artifact_build`` row), not once per
    maintenance cycle."""
    from ..operators.artifacts import session_artifact

    return session_artifact(
        spark,
        f"mh_band_rows:{sf_dir}",
        lambda: _mh_band_rows(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        ),
    )


def q_minhash_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance-only split of ``minhash_index_upsert`` (VERDICT r9
    ask #5): the standing band index comes PRE-STAGED from the session
    artifact store, so this row times what actually recurs at 100 TB —
    delta-only re-signature, the move-aware shard MERGE, and candidate
    consumption — while the one-time full-corpus signature build (~60%
    of the composite row) amortizes into the artifact store.

    The staging write (artifact frame → shard-partitioned snapshot the
    MERGE can mutate) stays inside the row: it is write-only I/O of the
    compact index, the in-production equivalent of cloning the index's
    table-format metadata before a maintenance transaction.  Correctness
    is the same contract as the composite query — the identical oracle
    rebuilds the merged corpus's band table from scratch, so maintenance
    ≡ rebuild regardless of staging."""
    import shutil
    import tempfile

    from ..sinks.upsert import upsert_partitioned_moving

    base = tempfile.mkdtemp(prefix="mh_maint_")
    try:
        index_path = f"{base}/bands"
        minhash_band_artifact(spark, sf_dir).write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(index_path)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        upsert_partitioned_moving(
            spark,
            index_path,
            _mh_band_rows(_mh_delta(docs)),
            keys=["doc_id", "band"],
            partition_col="shard",
        )
        out = band_index_candidates(spark, index_path).orderBy(
            "doc_a", "doc_b"
        )
        # teardown survival: cut lineage (localCheckpoint) so the result
        # blocks outlive the tempdir rmtree -- never a per-row driver
        # collect (VERDICT r10 ask #1)
        return materialize(out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def oracle_minhash_index_upsert() -> str:
    n_perms, n_bands = D.DEFAULT_PERMS, D.DEFAULT_BANDS
    rows = n_perms // n_bands
    return f"""
WITH corpus AS (
    SELECT doc_id,
           CASE WHEN doc_id % {MH_UPD_MOD} = 1
                THEN text || '{MH_UPD_SUFFIX}' ELSE text END AS text
    FROM documents
    UNION ALL
    SELECT doc_id + 200000, text FROM documents WHERE doc_id % 97 = 0
    UNION ALL
    SELECT doc_id + 100000, text || ' copied' FROM documents
    WHERE doc_id % 50 = 0
),
{_HASHED_SHINGLES_SQL.strip().rstrip()},
sigs AS (
    SELECT doc_id, perm,
           min(substr(md5(shingle || '#' || CAST(CAST(perm // 4 AS INT) AS VARCHAR)),
                      CAST((perm % 4) * 8 + 1 AS INT), 8)) AS minhash
    FROM shingles, (SELECT unnest(range(0, {n_perms})) AS perm)
    GROUP BY 1, 2
),
banded AS (
    SELECT doc_id, CAST(floor(perm / {rows}) AS INT) AS band,
           md5(string_agg(minhash, '|' ORDER BY perm)) AS band_hash
    FROM sigs GROUP BY 1, 2
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(COUNT(DISTINCT band) AS BIGINT) AS bands_agree
FROM cand GROUP BY 1, 2
"""


# --- BPE apply as pure column expressions (pandas-free tokenizer twin) --------


def q_bpe_apply_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide BPE tokenization as PURE JVM column expressions — the
    throughput path a 100 TB tokenize job needs: after the bounded
    training loop derives the merge table (same iterate ``bpe_tokenize``
    adjudicates), applying it to every document is a zero-shuffle,
    zero-Python scan (plan-pinned in
    tests/test_scale_plans.py::test_bpe_apply_plan_is_pure_scan).

    The apply encoding: a word's symbol sequence rides in one string
    with every symbol wrapped in single spaces (`` a  b  c ``), so merge
    round (l, r) is a LITERAL left-to-right non-overlapping
    ``replace(' l  r ' -> ' lr ')`` — exactly the ``apply_merge`` fold
    semantics (symbols never contain spaces), but as one codegen-able
    string op per round instead of a higher-order fold. Output per doc:
    BPE token count and the md5 of the full token stream (word order
    preserved), so the driver hash pins every token of every document.
    """
    from ..operators.bpe import (
        apply_merge,
        best_pair,
        with_symbols,
        word_freq_table,
    )
    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    symbols = materialize(with_symbols(word_freq_table(docs)))
    merges: list[tuple[str, str]] = []
    for step in range(1, _BPE_APPLY_MERGES + 1):
        top = best_pair(symbols)
        if top is None or top[2] < 2:
            break
        left, right, _ = top
        merges.append((left, right))
        symbols = apply_merge(symbols, left, right)
        if step % 2 == 0 and step < _BPE_APPLY_MERGES:
            symbols = materialize(symbols)

    def seg(w):  # noqa: ANN001 — Column lambda
        e = F.concat(F.lit(" "), F.array_join(F.split(w, ""), "  "), F.lit(" "))
        for left, right in merges:
            e = F.replace(
                e, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        return F.trim(F.replace(e, F.lit("  "), F.lit(" ")))

    words = F.filter(
        F.split(F.col("text"), " ", -1), lambda w: F.length(w) > 0
    )
    tstrs = F.transform(words, seg)
    return docs.select(
        "doc_id",
        F.aggregate(
            tstrs,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.size(F.split(t, " ", -1)),
        ).alias("n_bpe_tokens"),
        F.md5(F.array_join(tstrs, " ")).alias("stream_md5"),
    )


def oracle_bpe_apply_expr() -> str:
    # the same wrap / replace / collapse encoding, with the merge table
    # derived by the shared training stages and captured into one row
    # (m) the per-doc lambda references
    enc = (
        "' ' || array_to_string(list_transform("
        "range(1, length(w) + 1), i -> w[i]), '  ') || ' '"
    )
    chain = enc
    for i in range(1, _BPE_APPLY_MERGES + 1):
        chain = (
            f"replace({chain}, ' ' || m.l{i} || '  ' || m.r{i} || ' ', "
            f"' ' || m.l{i} || m.r{i} || ' ')"
        )
    m_cols = ", ".join(
        f"(SELECT l FROM b{i}) AS l{i}, (SELECT r FROM b{i}) AS r{i}"
        for i in range(1, _BPE_APPLY_MERGES + 1)
    )
    return f"""
WITH words AS (
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY 1
),
syms0 AS (
    SELECT word, freq,
           list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
    FROM words
),
{_bpe_training_stages_sql()},
m AS (SELECT {m_cols}),
docs AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
    FROM documents
),
tok AS (
    SELECT doc_id,
           list_transform(ws, w -> trim(replace({chain}, '  ', ' '))) AS tstrs
    FROM docs, m
)
SELECT doc_id,
       CAST(list_sum(list_transform(tstrs,
            t -> len(string_split(t, ' ')))) AS BIGINT) AS n_bpe_tokens,
       md5(array_to_string(tstrs, ' ')) AS stream_md5
FROM tok
"""


# --- bigram LM perplexity (CCNet-style quality filter) -------------------------


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram language-model score with add-one smoothing —
    the perplexity-filter shape (CCNet / Wenzek 2020) pretraining
    curation runs at corpus scale: P(w_i | w_{i-1}) = (c(w_{i-1} w_i)
    + 1) / (c(w_{i-1}) + V), doc score = mean log-prob over its bigram
    positions, ppl = exp(-avg).  High-ppl docs are the gibberish the
    filter drops.

    Cross-engine determinism follows the unigram query's recipe: each
    MODEL row (distinct bigram, not every occurrence) rounds ln() to
    9 dp and is carried as exact DECIMAL, so per-doc sums are
    associative under any partitioning; ppl derives from the ROUNDED
    average, keeping exp() inputs bit-identical.

    Scale shape: bigrams come from a row-local zip_with (no posexplode
    ordering shuffle); the model build is one map-side-combined groupBy;
    the scoring join keys on (prev, cur) — at real scale a shuffle join
    by design (a bigram table does not broadcast), here AQE picks the
    broadcast."""
    from ..functions.rounding import round_half_away

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    w = F.filter(TS.words(F.col("text")), lambda x: F.length(x) > 0)
    grams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    bi = docs.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", "g.prev", "g.cur"
    )
    toks = docs.select(F.explode(w).alias("token"))
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("uc"))
    vsize = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bc = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bc"))
    model = (
        bc.join(uni.select(F.col("token").alias("prev"), "uc"), "prev")
        .crossJoin(F.broadcast(vsize))
        .select(
            "prev",
            "cur",
            round_half_away(
                F.log(
                    (F.col("bc").cast("double") + 1.0)
                    / (F.col("uc").cast("double") + F.col("v"))
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("logp"),
        )
    )
    scored = (
        bi.join(model, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp").alias("__s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            round_half_away(
                F.col("__s").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        round_half_away(F.exp(-F.col("avg_logprob")), 4).alias("ppl"),
    )


def oracle_bigram_perplexity() -> str:
    from ..functions.rounding import sql_round_half_away

    logp = sql_round_half_away("ln((bc + 1.0) / (uc + v))", 9)
    avg = sql_round_half_away("CAST(sum(logp) AS DOUBLE) / count(*)", 6)
    ppl = sql_round_half_away("exp(-avg_logprob)", 4)
    return f"""
WITH ws AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
    FROM documents
),
bi AS (
    SELECT doc_id, g[1] AS prev, g[2] AS cur
    FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                      i -> [w[i], w[i + 1]])) AS g
        FROM ws
    )
),
uni AS (
    SELECT token, count(*) AS uc
    FROM (SELECT unnest(w) AS token FROM ws) GROUP BY 1
),
vs AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
bc AS (SELECT prev, cur, count(*) AS bc FROM bi GROUP BY 1, 2),
model AS (
    SELECT prev, cur, CAST({logp} AS DECIMAL(28,9)) AS logp
    FROM bc JOIN uni ON uni.token = bc.prev, vs
),
scored AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           {avg} AS avg_logprob
    FROM bi JOIN model USING (prev, cur)
    GROUP BY 1
)
SELECT doc_id, n_bigrams, avg_logprob, {ppl} AS ppl FROM scored
"""


# --- fill-in-the-middle transform ----------------------------------------------

FIM_PRE, FIM_SUF, FIM_MID = "<PRE>", "<SUF>", "<MID>"


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022, the
    PSM format code models train on): each document's token stream is
    split at two HASH-DERIVED points into (prefix, middle, suffix) and
    re-emitted as ``<PRE> prefix <SUF> suffix <MID> middle`` — the
    reordering that teaches infilling. Split points come from md5 of
    the doc id (not an RNG), so the transform is reproducible under
    re-runs, backfills and any partitioning — the same determinism
    contract as ``train_split``. Documents under 3 tokens pass through
    untransformed (fim_applied = false).

    Everything is row-local array arithmetic (slice / array_join /
    integer md5), zero shuffles after the scan; the md5 of the
    transformed text pins every emitted token in the driver hash."""
    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    w = F.filter(TS.words(F.col("text")), lambda x: F.length(x) > 0)
    n = F.size(w)
    h1 = F.conv(
        F.substring(F.md5(F.concat(F.lit("fim#a#"), F.col("doc_id").cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.lit("fim#b#"), F.col("doc_id").cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    # 1 <= a < n ; a <= b < n  (prefix nonempty by construction, middle
    # may be empty, suffix nonempty when b < n)
    a = (F.pmod(h1, n - 1) + 1).cast("int")
    b = (a + F.pmod(h2, n - a)).cast("int")
    applied = n >= 3
    prefix = F.array_join(F.slice(w, 1, a), " ")
    middle = F.array_join(F.slice(w, a + 1, b - a), " ")
    suffix = F.array_join(F.slice(w, b + 1, n - b), " ")
    # explicit concat, not concat_ws: an EMPTY middle (b == a) must not
    # leave a trailing separator after <MID>
    psm = F.concat(
        F.lit(FIM_PRE + " "), prefix,
        F.lit(" " + FIM_SUF + " "), suffix,
        F.lit(" " + FIM_MID),
        F.when(b - a > 0, F.concat(F.lit(" "), middle)).otherwise(F.lit("")),
    )
    out_text = F.when(applied, psm).otherwise(F.array_join(w, " "))
    return docs.select(
        "doc_id",
        applied.alias("fim_applied"),
        F.when(applied, a).otherwise(F.lit(0)).cast("int").alias("n_prefix"),
        F.when(applied, b - a).otherwise(F.lit(0)).cast("int").alias("n_middle"),
        F.when(applied, n - b).otherwise(n).cast("int").alias("n_suffix"),
        F.md5(out_text).alias("psm_md5"),
    )


def oracle_fim_transform() -> str:
    h1 = "(('0x' || substr(md5('fim#a#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
    h2 = "(('0x' || substr(md5('fim#b#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
    return f"""
WITH ws AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
    FROM documents
),
pts AS (
    SELECT doc_id, w, len(w) AS n,
           CAST({h1} % (len(w) - 1) + 1 AS INT) AS a
    FROM ws
),
pts2 AS (
    SELECT doc_id, w, n, a,
           CAST(a + ({h2} % (n - a)) AS INT) AS b,
           n >= 3 AS applied
    FROM pts
),
built AS (
    SELECT doc_id, applied,
           CASE WHEN applied THEN a ELSE 0 END AS n_prefix,
           CASE WHEN applied THEN b - a ELSE 0 END AS n_middle,
           CASE WHEN applied THEN n - b ELSE n END AS n_suffix,
           CASE WHEN applied THEN
               '{FIM_PRE} ' || array_to_string(w[1:a], ' ')
               || ' {FIM_SUF} ' || array_to_string(w[b+1:n], ' ')
               || ' {FIM_MID}'
               || CASE WHEN b - a > 0
                       THEN ' ' || array_to_string(w[a+1:b], ' ')
                       ELSE '' END
           ELSE array_to_string(w, ' ') END AS out_text
    FROM pts2
)
SELECT doc_id, applied AS fim_applied,
       CAST(n_prefix AS INT) AS n_prefix,
       CAST(n_middle AS INT) AS n_middle,
       CAST(n_suffix AS INT) AS n_suffix,
       md5(out_text) AS psm_md5
FROM built
"""


# --- per-doc KL divergence from the corpus token distribution -------------------


def q_token_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(p_doc || p_corpus) over token unigrams per document — the
    information-theoretic "how unlike the corpus is this document"
    score (domain-shift / contamination triage; complements the LM
    perplexity filter, which measures fluency, not typicality).

    Every doc token has corpus support (the corpus includes the doc),
    so the divergence is finite by construction. Per-(doc, token)
    terms p*(ln p - ln q) round once to 9 dp DECIMAL, making the
    per-doc sum associative under any partitioning (the unigram
    recipe); the vocab join is the same broadcast-in-practice /
    shuffle-at-scale shape as ``unigram_logprob``."""
    from ..functions.rounding import round_half_away

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(TS.words(F.col("text")), lambda x: F.length(x) > 0)
        ).alias("token"),
    )
    dt = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    dn = dt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cc"))
    total = vocab.agg(F.sum("cc").cast("double").alias("tot"))
    term = (
        dt.join(dn, "doc_id")
        .join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n",
            round_half_away(
                (F.col("c").cast("double") / F.col("n").cast("double"))
                * (
                    F.log(F.col("c").cast("double") / F.col("n").cast("double"))
                    - F.log(F.col("cc").cast("double") / F.col("tot"))
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t"),
        )
    )
    return (
        term.groupBy("doc_id")
        .agg(
            F.max(F.col("n")).cast("long").alias("n_tokens"),
            F.sum("t").alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            round_half_away(F.col("s").cast("double"), 6).alias("kl_bits_nat"),
        )
    )


def oracle_token_kl_divergence() -> str:
    from ..functions.rounding import sql_round_half_away

    p = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    q = "(CAST(cc AS DOUBLE) / tot)"
    term = sql_round_half_away(f"{p} * (ln{p} - ln({q}))", 9)
    return f"""
WITH toks AS (
    SELECT doc_id, t AS token FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                      x -> length(x) > 0)) AS t
        FROM documents
    )
),
dt AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY 1, 2),
dn AS (SELECT doc_id, SUM(c) AS n FROM dt GROUP BY 1),
vocab AS (SELECT token, count(*) AS cc FROM toks GROUP BY 1),
tot AS (SELECT CAST(SUM(cc) AS DOUBLE) AS tot FROM vocab),
term AS (
    SELECT dt.doc_id, n, CAST({term} AS DECIMAL(28,9)) AS t
    FROM dt JOIN dn USING (doc_id) JOIN vocab USING (token), tot
)
SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
       {sql_round_half_away("CAST(SUM(t) AS DOUBLE)", 6)} AS kl_bits_nat
FROM term GROUP BY 1
"""


# --- readability scoring ---------------------------------------------------------


def q_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per document — the classic text-quality
    heuristic curation stacks keep next to the LM filters (too-low
    scores flag run-on machine text, too-high flag fragment spam):
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/word), with
    syllables approximated by vowel-group counts (the standard cheap
    estimator). Sentence splits on [.!?]+, vowel groups on [aeiouy]+ —
    the same RE2/Java-regex-compatible patterns in both engines; all
    counts are exact integers, the score one shared double expression.
    Pure scan work: zero shuffles, no UDFs."""
    from ..functions.rounding import round_half_away

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "text"
    )
    n_words = F.size(
        F.filter(TS.words(F.col("text")), lambda x: F.length(x) > 0)
    ).cast("long")
    n_sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), "[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    n_syll = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast("long"),
        F.lit(1).cast("long"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        round_half_away(score, 4).alias("flesch"),
    )


def oracle_readability_score() -> str:
    from ..functions.rounding import sql_round_half_away

    n_words = (
        "CAST(len(list_filter(string_split(text, ' '),"
        " x -> length(x) > 0)) AS BIGINT)"
    )
    n_sents = (
        "greatest(CAST(len(list_filter(regexp_split_to_array(text,"
        " '[.!?]+'), s -> length(trim(s)) > 0)) AS BIGINT), 1)"
    )
    n_syll = (
        "greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))"
        " AS BIGINT), 1)"
    )
    score = (
        f"(206.835 - 1.015 * (CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE))"
        f" - 84.6 * (CAST(sy AS DOUBLE) / CAST(nw AS DOUBLE)))"
    )
    return f"""
WITH counts AS (
    SELECT doc_id, lang,
           {n_words} AS nw, {n_sents} AS ns, {n_syll} AS sy
    FROM documents
)
SELECT doc_id, lang, nw AS n_words, ns AS n_sentences, sy AS n_syllables,
       {sql_round_half_away(score, 4)} AS flesch
FROM counts
"""


# ---------------------------------------------------------------------------
# kn_bigram_lm
# ---------------------------------------------------------------------------

KN_DISCOUNT = 0.75
KN_TOPK = 40


def q_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing every
    production n-gram LM uses — for the corpus's top bigrams:

        P_kn(b|a) = max(c_ab - d, 0) / c_a
                    + (d * N1+(a,.) / c_a) * (N1+(.,b) / B)

    with d = 0.75, N1+(a,.) = distinct continuations of a, N1+(.,b) =
    distinct left contexts of b (the "how many contexts has b completed"
    novelty count that makes KN beat plain backoff), B = distinct bigram
    types.  Discount mass conserves by construction: what max(c-d,0)
    removes is exactly what the continuation term redistributes.

    Scale shape: ONE bigram fan-out + hash aggregate compacts the corpus
    to distinct (a, b) rows; context totals c_a / N1+(a,.) and the
    continuation counts N1+(.,b) are vocabulary-sized aggregates OVER
    that compact table (not corpus rescans — n1p_a is just count(*),
    the rows are already distinct pairs); scoring joins the top-k probe
    rows against two dimension tables (AQE broadcasts them) and a 1-row
    scalar.  Arithmetic is pinned-order double over exact integer counts
    (:func:`..plans.text.q_bigram_pmi` is the exact-rational cousin;
    KN's discount makes a division chain unavoidable).

    Reference parity: beyond-reference LLM-data surface (the reference
    has no text ops); the selection ladder (c_ab desc, a, b) keeps the
    probe set deterministic at any parallelism."""
    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "text"
    )
    bigram_expr = (
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(split(text, ' ')[i-1] AS term_a, split(text, ' ')[i] AS term_b)) "
        "ELSE array() END"
    )
    bi = materialize(
        docs.select(F.explode(F.expr(bigram_expr)).alias("bg"))
        .select("bg.term_a", "bg.term_b")
        .where((F.length("term_a") > 0) & (F.length("term_b") > 0))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ctx = bi.groupBy("term_a").agg(
        F.sum("c_ab").cast("long").alias("c_a"),
        F.count(F.lit(1)).cast("long").alias("n1p_a"),
    )
    cont = bi.groupBy("term_b").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_b")
    )
    btot = bi.agg(F.count(F.lit(1)).cast("long").alias("b_types"))
    top = bi.orderBy(
        F.col("c_ab").desc(), F.col("term_a"), F.col("term_b")
    ).limit(KN_TOPK)
    scored = (
        top.join(ctx, "term_a")
        .join(cont, "term_b")
        .crossJoin(F.broadcast(btot))
    )
    d = F.lit(KN_DISCOUNT)
    c_ab = F.col("c_ab").cast("double")
    c_a = F.col("c_a").cast("double")
    n1a = F.col("n1p_a").cast("double")
    n1b = F.col("n1p_b").cast("double")
    bt = F.col("b_types").cast("double")
    p_kn = (
        F.greatest(c_ab - d, F.lit(0.0)) / c_a
        + ((d * n1a) / c_a) * (n1b / bt)
    )
    return scored.select(
        "term_a",
        "term_b",
        F.col("c_ab").cast("long").alias("c_ab"),
        "c_a",
        "n1p_a",
        "n1p_b",
        round_half_away(p_kn, 9).alias("p_kn"),
    )


def oracle_kn_bigram_lm() -> str:
    from ..functions.rounding import sql_round_half_away

    p_kn = (
        "(greatest(CAST(c_ab AS DOUBLE) - 0.75, 0.0) / CAST(c_a AS DOUBLE)"
        " + ((0.75 * CAST(n1p_a AS DOUBLE)) / CAST(c_a AS DOUBLE))"
        " * (CAST(n1p_b AS DOUBLE) / CAST(b_types AS DOUBLE)))"
    )
    return f"""
WITH toks AS (
    SELECT string_split(text, ' ') AS w FROM documents
),
bi AS (
    SELECT term_a, term_b, CAST(count(*) AS BIGINT) AS c_ab FROM (
        SELECT w[i] AS term_a, w[i + 1] AS term_b FROM (
            SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2
        )
    )
    WHERE length(term_a) > 0 AND length(term_b) > 0
    GROUP BY 1, 2
),
ctx AS (
    SELECT term_a, CAST(SUM(c_ab) AS BIGINT) AS c_a,
           CAST(count(*) AS BIGINT) AS n1p_a
    FROM bi GROUP BY 1
),
cont AS (
    SELECT term_b, CAST(count(*) AS BIGINT) AS n1p_b FROM bi GROUP BY 1
),
btot AS (SELECT CAST(count(*) AS BIGINT) AS b_types FROM bi),
top AS (
    SELECT * FROM bi
    ORDER BY c_ab DESC, term_a, term_b LIMIT {KN_TOPK}
)
SELECT term_a, term_b, c_ab, c_a, n1p_a, n1p_b,
       {sql_round_half_away(p_kn, 9)} AS p_kn
FROM top JOIN ctx USING (term_a) JOIN cont USING (term_b), btot
"""


# ---------------------------------------------------------------------------
# dpo_pair_build
# ---------------------------------------------------------------------------


def q_dpo_pair_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO-style training: per
    (lang, source) prompt group, *chosen* = the quality-score argmax and
    *rejected* = the argmin (doc_id tie ladder, lower id wins), with the
    preference margin attached — the deterministic pair-mining step that
    turns a scored corpus into a preference dataset.

    Scale shape: the score is a pure row expression
    (:func:`..operators.textstats.quality_score`, the hash-green
    text_quality scorer), and the extremal selection is ONE map-side-
    combined groupBy over struct-ordered min/max — no windows, no
    self-joins, no shuffles beyond the single group aggregate.  Groups
    with a single doc produce a degenerate pair (chosen == rejected,
    margin 0) and are filtered: a preference pair needs two documents."""
    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    scored = TS.quality_score(docs).select(
        "lang",
        "source",
        "doc_id",
        round_half_away(F.col("quality_score"), 9).alias("q"),
    )
    # struct order: higher score first, then LOWER doc_id (negate id)
    best = F.max(
        F.struct(F.col("q"), (-F.col("doc_id")).alias("nid"))
    ).alias("best")
    worst = F.min(
        F.struct(F.col("q"), F.col("doc_id").alias("pid"))
    ).alias("worst")
    agg = scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), best, worst
    )
    return (
        agg.where(F.col("n_docs") >= 2)
        .select(
            "lang",
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            (-F.col("best.nid")).cast("long").alias("chosen_doc"),
            F.col("worst.pid").cast("long").alias("rejected_doc"),
            F.col("best.q").alias("chosen_score"),
            F.col("worst.q").alias("rejected_score"),
            round_half_away(F.col("best.q") - F.col("worst.q"), 9).alias(
                "margin"
            ),
        )
    )


def oracle_dpo_pair_build() -> str:
    from ..functions.rounding import sql_round_half_away

    stop = "['the','a','of','and','to','in','is','on','for','it']"
    score = (
        "least(1.0, n_tokens / 64.0) * 0.5"
        " + least(1.0, (n_stop / n_tokens) * 4.0) * 0.3"
        " + (1.0 - least(1.0, (n_symbols / n_chars) * 10.0)) * 0.2"
    )
    return f"""
WITH base AS (
    SELECT lang, source, doc_id,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        CAST(len(list_filter(string_split(text, ' '),
                             w -> list_contains({stop}, w))) AS DOUBLE) AS n_stop,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) AS n_symbols,
        CAST(length(text) AS DOUBLE) AS n_chars
    FROM documents
),
scored AS (
    SELECT lang, source, doc_id,
           {sql_round_half_away(score, 9)} AS q
    FROM base
),
ranked AS (
    SELECT lang, source, doc_id, q,
        row_number() OVER (PARTITION BY lang, source
                           ORDER BY q DESC, doc_id ASC) AS rb,
        row_number() OVER (PARTITION BY lang, source
                           ORDER BY q ASC, doc_id ASC) AS rw,
        count(*) OVER (PARTITION BY lang, source) AS n_docs
    FROM scored
)
SELECT b.lang, b.source, CAST(b.n_docs AS BIGINT) AS n_docs,
       b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
       b.q AS chosen_score, w.q AS rejected_score,
       {sql_round_half_away('b.q - w.q', 9)} AS margin
FROM ranked b
JOIN ranked w ON b.lang = w.lang AND b.source = w.source
WHERE b.rb = 1 AND w.rw = 1 AND b.n_docs >= 2
"""


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency report per (lang, source): fertility
    (BPE-ish tokens per whitespace word) and bytes per token — THE
    table a team reads before committing a vocabulary, because a
    fertility regression on one language silently doubles its training
    cost.  Tokens use the engine's BPE-ish pre-tokenizer convention
    (letter runs | digit runs | single symbols, the doc_stats regex).

    Scale shape: both counts are pure row expressions; ONE map-side-
    combined groupBy over the (lang, source) dimension key reduces the
    corpus — exact integer sums, two double divisions at the end."""
    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    words = F.size(
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    ).cast("long")
    toks = F.regexp_count(
        F.col("text"), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")
    ).cast("long")
    rows = docs.select(
        "lang",
        "source",
        words.alias("n_words"),
        toks.alias("n_tokens"),
        F.length("text").cast("long").alias("n_bytes"),
    )
    agg = rows.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_bytes").alias("bytes"),
    )
    fert = F.col("tokens").cast("double") / F.col("words").cast("double")
    bpt = F.col("bytes").cast("double") / F.col("tokens").cast("double")
    return agg.select(
        "lang",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("words").cast("long").alias("words"),
        F.col("tokens").cast("long").alias("tokens"),
        F.col("bytes").cast("long").alias("bytes"),
        round_half_away(fert, 6).alias("fertility"),
        round_half_away(bpt, 6).alias("bytes_per_token"),
    )


def oracle_tokenizer_fertility() -> str:
    from ..functions.rounding import sql_round_half_away

    return f"""
WITH rows_t AS (
    SELECT lang, source,
        CAST(len(list_filter(string_split(text, ' '),
                             t -> length(t) > 0)) AS BIGINT) AS n_words,
        CAST(len(regexp_extract_all(text,
                 '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
),
agg AS (
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS words,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           CAST(SUM(n_bytes) AS BIGINT) AS bytes
    FROM rows_t GROUP BY 1, 2
)
SELECT lang, source, n_docs, words, tokens, bytes,
       {sql_round_half_away(
           'CAST(tokens AS DOUBLE) / CAST(words AS DOUBLE)', 6)} AS fertility,
       {sql_round_half_away(
           'CAST(bytes AS DOUBLE) / CAST(tokens AS DOUBLE)', 6)}
           AS bytes_per_token
FROM agg
"""


# ---------------------------------------------------------------------------
# ngram_novelty_decay
# ---------------------------------------------------------------------------

NOVELTY_N = 3  # word n-gram order
NOVELTY_DECILES = 10


def q_ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per doc-id decile, how many of the decile's
    distinct word 3-grams are seen for the FIRST time there — the "is
    more crawl still adding information" curve that decides when to stop
    scaling a source (novelty_rate decaying toward 0 = the source is
    exhausted).

    Scale shape: the corpus explodes to (gram, doc) ONCE and immediately
    collapses to distinct pairs (map-side combine); first occurrence is
    min(doc_id) per gram over that COMPACT table; decile bucketing is a
    pure expression against the 1-row max-id scalar (broadcast); both
    counts reduce dimension-sized frames.  Nothing downstream of the
    first collapse scales with corpus size — only with vocabulary."""
    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    gram_expr = (
        f"CASE WHEN size(split(text, ' ')) >= {NOVELTY_N} THEN "
        f"transform(sequence(1, size(split(text, ' ')) - {NOVELTY_N - 1}), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i, {NOVELTY_N}))) "
        "ELSE array() END"
    )
    gd = materialize(
        docs.select(
            "doc_id", F.explode(F.expr(gram_expr)).alias("gram")
        ).distinct()
    )
    firsts = gd.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    maxid = docs.agg((F.max("doc_id") + 1).alias("mx"))
    dec = F.least(
        F.lit(NOVELTY_DECILES - 1),
        F.floor(
            F.col("doc_id").cast("double") * NOVELTY_DECILES
            / F.col("mx").cast("double")
        ).cast("int"),
    )
    seen = (
        gd.crossJoin(F.broadcast(maxid))
        .select(dec.alias("decile"), "gram")
        .distinct()
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("distinct_grams"))
    )
    fdec = F.least(
        F.lit(NOVELTY_DECILES - 1),
        F.floor(
            F.col("first_doc").cast("double") * NOVELTY_DECILES
            / F.col("mx").cast("double")
        ).cast("int"),
    )
    novel = (
        firsts.crossJoin(F.broadcast(maxid))
        .select(fdec.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    out = seen.join(novel, "decile", "left")
    rate = (
        F.coalesce(F.col("novel_grams"), F.lit(0)).cast("double")
        / F.col("distinct_grams").cast("double")
    )
    return out.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("distinct_grams").cast("long").alias("distinct_grams"),
        F.coalesce(F.col("novel_grams"), F.lit(0))
        .cast("long")
        .alias("novel_grams"),
        round_half_away(rate, 6).alias("novelty_rate"),
    )


def oracle_ngram_novelty_decay() -> str:
    from ..functions.rounding import sql_round_half_away

    n = NOVELTY_N
    d = NOVELTY_DECILES
    return f"""
WITH gd AS (
    SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               array_to_string(w[i:i + {n - 1}], ' ') AS gram
        FROM (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {n - 1})) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents)
            WHERE len(w) >= {n}
        )
    )
),
mx AS (SELECT MAX(doc_id) + 1 AS mx FROM documents),
firsts AS (
    SELECT gram, MIN(doc_id) AS first_doc FROM gd GROUP BY 1
),
seen AS (
    SELECT decile, CAST(count(*) AS BIGINT) AS distinct_grams FROM (
        SELECT DISTINCT
            least({d - 1}, CAST(floor(CAST(doc_id AS DOUBLE) * {d}
                / CAST(mx AS DOUBLE)) AS INT)) AS decile,
            gram
        FROM gd, mx
    ) GROUP BY 1
),
novel AS (
    SELECT least({d - 1}, CAST(floor(CAST(first_doc AS DOUBLE) * {d}
               / CAST(mx AS DOUBLE)) AS INT)) AS decile,
           CAST(count(*) AS BIGINT) AS novel_grams
    FROM firsts, mx GROUP BY 1
)
SELECT s.decile, s.distinct_grams,
       CAST(COALESCE(n.novel_grams, 0) AS BIGINT) AS novel_grams,
       {sql_round_half_away(
           "CAST(COALESCE(n.novel_grams, 0) AS DOUBLE)"
           " / CAST(s.distinct_grams AS DOUBLE)", 6)} AS novelty_rate
FROM seen s LEFT JOIN novel n ON s.decile = n.decile
"""


# ---------------------------------------------------------------------------
# minhash_lsh_tuning
# ---------------------------------------------------------------------------

#: (bands, rows_per_band) configs on a 128-perm production signature
#: budget — powers of two so the S-curve closes by exact squaring
LSH_CONFIGS = ((64, 2), (32, 4), (16, 8), (8, 16), (4, 32))
LSH_SIM_BINS = 20
LSH_TAU = 0.5  # the near-dup bar the banding must protect


def _pow2_chain(x: str, e: int) -> str:
    """SQL text for x**e with e a power of two, by exact repeated
    squaring — both engines evaluate the identical multiplication tree,
    so no libm pow() variance can split the hash."""
    assert e & (e - 1) == 0 and e >= 1
    t = x
    while e > 1:
        t = f"({t} * {t})"
        e //= 2
    return t


def q_minhash_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding design query: for each (bands, rows) split of a
    128-perm signature budget, the EXPECTED candidate volume, recall on
    true near-dups (jaccard >= 0.5), and false-candidate rate below the
    bar — evaluated against the CORPUS'S OWN pair-similarity histogram,
    not a textbook curve.  This is the table that picks the banding
    BEFORE an expensive re-shingle at 100 TB: the S-curve
    p(s) = 1 - (1 - s^r)^b is analytic, so the whole sweep costs one
    20-bin histogram, no re-hashing per config.

    Scale shape: the similarity distribution comes from the df-capped
    inverted-index pair counts (:func:`shingle_pair_counts` — bounded by
    cap x |postings|, never all-pairs), collapsed to a 20-bin histogram;
    each config's expectation is a 20-row weighted sum with the S-curve
    closed by EXACT repeated squaring (b, r are powers of two — no
    libm pow anywhere).  The implied threshold (1/b)^(1/r) is a Python
    literal per config, repr-shared with the oracle."""
    from ..operators.materialize import materialize

    pairs = shingle_pair_counts(capped_shingle_postings(spark, sf_dir))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    hist = materialize(
        pairs.select(
            F.least(
                F.lit(LSH_SIM_BINS - 1),
                F.floor(jac * LSH_SIM_BINS).cast("int"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mid = "((CAST(bin AS DOUBLE) + 0.5) / 20.0)"
    per_config = []
    for b, r in LSH_CONFIGS:
        sr = _pow2_chain(mid, r)
        p = f"(1.0 - {_pow2_chain(f'(1.0 - {sr})', b)})"
        cfg = hist.select(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            F.col("cnt"),
            F.expr(p).alias("p"),
            (F.col("bin") >= int(LSH_TAU * LSH_SIM_BINS)).alias("hi"),
        ).groupBy("bands", "rows_per_band").agg(
            F.sum(
                round_half_away(F.col("cnt") * F.col("p"), 6).cast(
                    "decimal(25,6)"
                )
            ).alias("exp_cand"),
            F.sum(
                F.when(
                    F.col("hi"),
                    round_half_away(F.col("cnt") * F.col("p"), 6).cast(
                        "decimal(25,6)"
                    ),
                )
            ).alias("exp_hi"),
            F.sum(F.when(F.col("hi"), F.col("cnt"))).alias("n_hi"),
            F.sum(F.when(~F.col("hi"), F.col("cnt"))).alias("n_lo"),
            F.sum(
                F.when(
                    ~F.col("hi"),
                    round_half_away(F.col("cnt") * F.col("p"), 6).cast(
                        "decimal(25,6)"
                    ),
                )
            ).alias("exp_lo"),
        ).select(
            "bands",
            "rows_per_band",
            F.lit(round((1.0 / b) ** (1.0 / r), 9)).alias("threshold"),
            round_half_away(F.col("exp_cand").cast("double"), 6).alias(
                "expected_candidates"
            ),
            round_half_away(
                F.col("exp_hi").cast("double")
                / F.col("n_hi").cast("double"),
                6,
            ).alias("recall_above_tau"),
            round_half_away(
                F.col("exp_lo").cast("double")
                / F.col("n_lo").cast("double"),
                6,
            ).alias("fp_rate_below_tau"),
        )
        per_config.append(cfg)
    out = per_config[0]
    for cfg in per_config[1:]:
        out = out.unionByName(cfg)
    return out.select(
        F.col("bands").cast("int").alias("bands"),
        F.col("rows_per_band").cast("int").alias("rows_per_band"),
        "threshold",
        "expected_candidates",
        "recall_above_tau",
        "fp_rate_below_tau",
    )


def oracle_minhash_lsh_tuning() -> str:
    from ..functions.rounding import sql_round_half_away

    mid = "((CAST(bin AS DOUBLE) + 0.5) / 20.0)"
    selects = []
    for b, r in LSH_CONFIGS:
        sr = _pow2_chain(mid, r)
        p = f"(1.0 - {_pow2_chain(f'(1.0 - {sr})', b)})"
        term = f"CAST({sql_round_half_away(f'cnt * {p}', 6)} AS DECIMAL(25,6))"
        hi = f"bin >= {int(LSH_TAU * LSH_SIM_BINS)}"
        selects.append(f"""
SELECT CAST({b} AS INT) AS bands, CAST({r} AS INT) AS rows_per_band,
       {round((1.0 / b) ** (1.0 / r), 9)!r} AS threshold,
       {sql_round_half_away(f'CAST(SUM({term}) AS DOUBLE)', 6)}
           AS expected_candidates,
       {sql_round_half_away(
           f"CAST(SUM({term}) FILTER (WHERE {hi}) AS DOUBLE)"
           f" / CAST(SUM(cnt) FILTER (WHERE {hi}) AS DOUBLE)", 6)}
           AS recall_above_tau,
       {sql_round_half_away(
           f"CAST(SUM({term}) FILTER (WHERE NOT ({hi})) AS DOUBLE)"
           f" / CAST(SUM(cnt) FILTER (WHERE NOT ({hi})) AS DOUBLE)", 6)}
           AS fp_rate_below_tau
FROM hist""")
    union = " UNION ALL ".join(selects)
    return f"""
WITH {_PLANTED_SQL}, {_SHINGLES_SQL},
sh_l AS (
    SELECT s.doc_id, s.shingle, c.lang
    FROM shingles s JOIN corpus c USING (doc_id)
),
{_DF_CAP_SQL},
jacs AS (
    SELECT n_common / (na.n_sh + nb.n_sh - n_common) AS jaccard
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
),
hist AS (
    SELECT least({LSH_SIM_BINS - 1},
                 CAST(floor(jaccard * {LSH_SIM_BINS}) AS INT)) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM jacs GROUP BY 1
)
{union}
"""


# ---------------------------------------------------------------------------
# logistic_irls
# ---------------------------------------------------------------------------

IRLS_ROUNDS = 3
#: ridge term added to the normal-equation diagonal: keeps the 3x3
#: solve well-conditioned when a feature is near-constant in a slice
IRLS_RIDGE = 1e-3


def _elliott(eta):
    """Rational sigmoid p = 0.5 * (1 + eta / (1 + |eta|)) — the Elliott
    activation.  Chosen over exp() deliberately: the link is pure
    IEEE add/mul/div/abs, so Spark and DuckDB produce bit-identical
    probabilities (libm exp() is NOT guaranteed identical across
    engines, and IRLS feeds each round's output into the next — a
    1-ulp exp() divergence would compound across rounds)."""
    return 0.5 * (1.0 + eta / (1.0 + F.abs(eta)))


def _irls_fit(spark: SparkSession, sf_dir: str):
    """Shared Elliott-IRLS fit: returns (feats, beta) where ``feats``
    is the quantized (x1, x2, y) frame and ``beta`` the trained 1-row
    coefficient frame — consumed by :func:`q_logistic_irls` (the
    training query) and :func:`q_calibration_curve` (the reliability
    audit of the SAME coefficients, chained rather than retrained).

    ``beta`` is a SESSION ARTIFACT (r15, VERDICT r14 ask #7): the
    3-round fit — three corpus-pass moment aggregates — used to run
    once inside EACH consumer, so one bench/session paid for six
    corpus aggregates where three suffice.  The trained 1-row
    coefficient frame is exactly the shape the artifact store exists
    for (deterministic function of the immutable snapshot, consumed by
    multiple queries); the bench times the build cold as
    ``irls_beta_artifact_build``, like the other artifact rows."""
    return _irls_feats(spark, sf_dir), irls_beta_artifact(spark, sf_dir)


def irls_beta_artifact(spark: SparkSession, sf_dir: str):
    """The trained 1-row IRLS coefficient frame as a session artifact
    (see :func:`_irls_fit`)."""
    from ..operators.artifacts import session_artifact

    def build():
        _feats, beta = _irls_fit_impl(spark, sf_dir)
        return beta

    return session_artifact(
        spark,
        f"irls_beta:{sf_dir}:rounds={IRLS_ROUNDS}:ridge={IRLS_RIDGE!r}",
        build,
    )


def q_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING inside the engine: predict
    ``lang = 'en'`` from two document features (log length, stopword
    ratio) with a quasi-logistic model fit by 3 rounds of IRLS — each
    round ONE weighted-moments aggregate over the corpus plus a pinned
    3x3 ridge-regularized Cramer solve, rounds chained by broadcast
    1-row coefficient frames.  Iterative ML training with zero
    collects, zero UDFs, zero libm (see :func:`_elliott`).

    At 100 TB each round is a map-side-combined aggregate (9 decimal
    moment sums) — the training cost is ROUNDS corpus passes, the
    textbook distributed-IRLS shape; the solve is driver-free scalar
    algebra on a 1-row frame.

    Determinism: features quantize to 9 dp; eta, p, and the working
    response close over pinned-order double; every moment term
    re-quantizes to 9 dp before its exact decimal sum; the Cramer text
    is identical in both engines."""
    feats, beta = _irls_fit(spark, sf_dir)
    return beta.select(
        "n_docs",
        F.col("b0").alias("beta_0"),
        F.col("b1").alias("beta_len"),
        F.col("b2").alias("beta_stop"),
    )


def _irls_feats(spark: SparkSession, sf_dir: str):
    """The quantized (x1, x2, y) feature frame — one corpus pass,
    shared text with the oracle's ``feats`` CTE."""
    from ..functions.rounding import round_half_away

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    scored = TS.quality_score(docs)
    x1 = round_half_away(
        F.log(F.lit(1.0) + F.col("n_chars").cast("double")), 9
    )
    x2 = round_half_away(F.col("stopword_ratio"), 9)
    return scored.select(
        x1.alias("x1"),
        x2.alias("x2"),
        (F.col("lang") == "en").cast("double").alias("y"),
    ).where(F.col("x2").isNotNull())


def _irls_fit_impl(spark: SparkSession, sf_dir: str):
    from ..functions.rounding import round_half_away

    feats = _irls_feats(spark, sf_dir)

    def mom(expr, name):
        return F.sum(
            round_half_away(expr, 9).cast("decimal(25,9)")
        ).alias(name)

    beta = None  # (b0, b1, b2) 1-row frame; None = zero start
    for _ in range(IRLS_ROUNDS):
        if beta is None:
            frame = feats.select(
                "x1", "x2", "y",
                F.lit(0.0).alias("b0"),
                F.lit(0.0).alias("b1"),
                F.lit(0.0).alias("b2"),
            )
        else:
            frame = feats.crossJoin(F.broadcast(beta))
        eta = (
            F.col("b0")
            + F.col("b1") * F.col("x1")
            + F.col("b2") * F.col("x2")
        )
        p = _elliott(eta)
        w_ = p * (1.0 - p) + F.lit(1e-6)  # floor keeps weights positive
        z = eta + (F.col("y") - p) / w_
        r = frame.select(
            "x1", "x2", w_.alias("w"), z.alias("z")
        )
        agg = r.agg(
            mom(F.col("w"), "s00"),
            mom(F.col("w") * F.col("x1"), "s01"),
            mom(F.col("w") * F.col("x2"), "s02"),
            mom((F.col("w") * F.col("x1")) * F.col("x1"), "s11"),
            mom((F.col("w") * F.col("x1")) * F.col("x2"), "s12"),
            mom((F.col("w") * F.col("x2")) * F.col("x2"), "s22"),
            mom(F.col("w") * F.col("z"), "t0"),
            mom((F.col("w") * F.col("x1")) * F.col("z"), "t1"),
            mom((F.col("w") * F.col("x2")) * F.col("z"), "t2"),
            F.count(F.lit(1)).alias("n"),
        )
        c = {k: F.col(k).cast("double") for k in
             ("s00", "s01", "s02", "s11", "s12", "s22", "t0", "t1", "t2")}
        m11 = c["s00"] + F.lit(IRLS_RIDGE)
        m22 = c["s11"] + F.lit(IRLS_RIDGE)
        m33 = c["s22"] + F.lit(IRLS_RIDGE)
        m12, m13, m23 = c["s01"], c["s02"], c["s12"]
        a11 = m22 * m33 - m23 * m23
        a12 = m13 * m23 - m12 * m33
        a13 = m12 * m23 - m13 * m22
        a22 = m11 * m33 - m13 * m13
        a23 = m12 * m13 - m11 * m23
        a33 = m11 * m22 - m12 * m12
        det = m11 * a11 + m12 * a12 + m13 * a13
        dz = F.nullif(det, F.lit(0.0))
        nb0 = (a11 * c["t0"] + a12 * c["t1"] + a13 * c["t2"]) / dz
        nb1 = (a12 * c["t0"] + a22 * c["t1"] + a23 * c["t2"]) / dz
        nb2 = (a13 * c["t0"] + a23 * c["t1"] + a33 * c["t2"]) / dz
        # re-quantize the coefficients between rounds: the fixed point
        # both engines iterate must pass through representable values
        beta = agg.select(
            round_half_away(nb0, 9).alias("b0"),
            round_half_away(nb1, 9).alias("b1"),
            round_half_away(nb2, 9).alias("b2"),
            F.col("n").cast("long").alias("n_docs"),
        )
    return feats, beta


def oracle_logistic_irls() -> str:
    return f"""
WITH {_irls_chain_sql()}
SELECT n AS n_docs, b0 AS beta_0, b1 AS beta_len, b2 AS beta_stop
FROM beta{IRLS_ROUNDS - 1}
"""


def _irls_chain_sql() -> str:
    """The shared WITH-body text: feats + the unrolled IRLS rounds,
    ending at ``beta{IRLS_ROUNDS-1}`` — the oracle twin of
    :func:`_irls_fit`."""
    from ..functions.rounding import sql_round_half_away

    stop = "['the','a','of','and','to','in','is','on','for','it']"

    def mom(expr, name):
        return (
            f"SUM(CAST({sql_round_half_away(expr, 9)} AS DECIMAL(25,9)))"
            f" AS {name}"
        )

    def solve_sql(i):
        c = {k: f"CAST(a{i}.{k} AS DOUBLE)" for k in
             ("s00", "s01", "s02", "s11", "s12", "s22", "t0", "t1", "t2")}
        m11 = f"({c['s00']} + {IRLS_RIDGE!r})"
        m22 = f"({c['s11']} + {IRLS_RIDGE!r})"
        m33 = f"({c['s22']} + {IRLS_RIDGE!r})"
        m12, m13, m23 = c["s01"], c["s02"], c["s12"]
        a11 = f"({m22} * {m33} - {m23} * {m23})"
        a12 = f"({m13} * {m23} - {m12} * {m33})"
        a13 = f"({m12} * {m23} - {m13} * {m22})"
        a22 = f"({m11} * {m33} - {m13} * {m13})"
        a23 = f"({m12} * {m13} - {m11} * {m23})"
        a33 = f"({m11} * {m22} - {m12} * {m12})"
        det = f"({m11} * {a11} + {m12} * {a12} + {m13} * {a13})"
        dz = f"nullif({det}, 0.0)"
        nb0 = f"(({a11} * {c['t0']} + {a12} * {c['t1']} + {a13} * {c['t2']}) / {dz})"
        nb1 = f"(({a12} * {c['t0']} + {a22} * {c['t1']} + {a23} * {c['t2']}) / {dz})"
        nb2 = f"(({a13} * {c['t0']} + {a23} * {c['t1']} + {a33} * {c['t2']}) / {dz})"
        return (
            f"SELECT {sql_round_half_away(nb0, 9)} AS b0, "
            f"{sql_round_half_away(nb1, 9)} AS b1, "
            f"{sql_round_half_away(nb2, 9)} AS b2, "
            f"a{i}.n AS n FROM agg{i} a{i}"
        )

    rounds = []
    for i in range(IRLS_ROUNDS):
        if i == 0:
            src = "SELECT x1, x2, y, 0.0 AS b0, 0.0 AS b1, 0.0 AS b2 FROM feats"
        else:
            src = f"SELECT f.x1, f.x2, f.y, b.b0, b.b1, b.b2 FROM feats f, beta{i - 1} b"
        eta = "(b0 + b1 * x1 + b2 * x2)"
        p = f"(0.5 * (1.0 + {eta} / (1.0 + abs({eta}))))"
        w = f"({p} * (1.0 - {p}) + 1e-06)"
        z = f"({eta} + (y - {p}) / {w})"
        rounds.append(f"""r{i} AS (
    SELECT x1, x2, {w} AS w, {z} AS z FROM ({src})
),
agg{i} AS (
    SELECT {mom('w', 's00')}, {mom('w * x1', 's01')}, {mom('w * x2', 's02')},
           {mom('(w * x1) * x1', 's11')}, {mom('(w * x1) * x2', 's12')},
           {mom('(w * x2) * x2', 's22')},
           {mom('w * z', 't0')}, {mom('(w * x1) * z', 't1')},
           {mom('(w * x2) * z', 't2')},
           CAST(count(*) AS BIGINT) AS n
    FROM r{i}
),
beta{i} AS ({solve_sql(i)})""")
    chain = ",\n".join(rounds)
    x1 = sql_round_half_away("ln(1.0 + CAST(n_chars AS DOUBLE))", 9)
    x2 = sql_round_half_away("n_stop / n_tokens", 9)
    return f"""base AS (
    SELECT lang, n_chars,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        CAST(len(list_filter(string_split(text, ' '),
                             w -> list_contains({stop}, w))) AS DOUBLE) AS n_stop
    FROM documents
),
feats AS (
    SELECT {x1} AS x1, {x2} AS x2,
           CAST(lang = 'en' AS DOUBLE) AS y
    FROM base
    WHERE ({x2}) IS NOT NULL
),
{chain}"""


# ---------------------------------------------------------------------------
# k_anonymity
# ---------------------------------------------------------------------------

KANON_K = 5
KANON_DECILES = 10


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a corpus ships: group documents by the
    quasi-identifier tuple (lang, source, length decile) and report,
    per anonymity band, how many groups and documents sit there — with
    the headline "fraction of documents re-identifiable at k < 5".
    This is the k-anonymity screen run on metadata BEFORE any release:
    a document alone in its quasi-identifier cell is linkable even with
    the text scrubbed (:func:`q_pii_scrub` handles content; this
    handles SHAPE).

    Scale shape: deciles come from exact global length ranks (two-pass:
    a 10-row boundary table via the percent threshold on sorted counts
    — here via ntile on the compact distinct-length frame would skew,
    so the bucket is value-based: floor(10 * rank / (n+1)) over a rank
    window partitioned by nothing BUT computed on the compact
    (n_chars -> count) frame, O(distinct lengths) rows); the group
    sizes are one corpus aggregate; the band report reduces a
    group-sized frame."""
    from ..functions.rounding import round_half_away
    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars"
    )
    # value-based decile boundaries from the COMPACT length histogram:
    # cum/total over O(distinct lengths) rows, ties share a bucket.
    # materialize(): the histogram feeds TWO branches (boundaries and
    # the total) and the group frame feeds THREE (bands, total, risk) —
    # without a materialization point Catalyst re-derives the corpus
    # aggregate per branch (18 shuffles; with: 6)
    lh = materialize(docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c")))
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = lh.withColumn("cum", F.sum("c").over(w)).crossJoin(
        F.broadcast(lh.agg(F.sum("c").cast("long").alias("tot")))
    )
    dec = F.least(
        F.lit(KANON_DECILES - 1),
        F.floor(
            (F.col("cum") - F.col("c")).cast("double")
            * KANON_DECILES
            / F.col("tot").cast("double")
        ).cast("int"),
    )
    buckets = cum.select("n_chars", dec.alias("len_decile"))
    tagged = docs.join(F.broadcast(buckets), "n_chars")
    groups = materialize(
        tagged.groupBy("lang", "source", "len_decile").agg(
            F.count(F.lit(1)).alias("g_size")
        )
    )
    band = (
        F.when(F.col("g_size") >= F.lit(KANON_K * 4), F.lit("k20+"))
        .when(F.col("g_size") >= F.lit(KANON_K), F.lit("k5-19"))
        .when(F.col("g_size") >= 2, F.lit("k2-4"))
        .otherwise(F.lit("k1"))
    )
    per_band = groups.select(band.alias("band"), "g_size").groupBy(
        "band"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("g_size").cast("long").alias("n_docs"),
    )
    tot = groups.agg(
        F.sum("g_size").cast("long").alias("total_docs"),
        F.sum(
            F.when(F.col("g_size") < KANON_K, F.col("g_size")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("at_risk"),
    )
    out = per_band.crossJoin(F.broadcast(tot))
    frac = F.col("at_risk").cast("double") / F.col("total_docs").cast("double")
    return out.select(
        "band",
        "n_groups",
        "n_docs",
        F.col("at_risk").alias("docs_below_k"),
        round_half_away(frac, 6).alias("frac_below_k"),
    )


def oracle_k_anonymity() -> str:
    from ..functions.rounding import sql_round_half_away

    k = KANON_K
    d = KANON_DECILES
    return f"""
WITH docs AS (
    SELECT doc_id, lang, source, n_chars FROM documents
),
lh AS (
    SELECT n_chars, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY 1
),
cum AS (
    SELECT n_chars, c,
           SUM(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum,
           (SELECT SUM(c) FROM lh) AS tot
    FROM lh
),
buckets AS (
    SELECT n_chars,
           least({d - 1}, CAST(floor(CAST(cum - c AS DOUBLE) * {d}
                / CAST(tot AS DOUBLE)) AS INT)) AS len_decile
    FROM cum
),
groups AS (
    SELECT lang, source, len_decile, CAST(count(*) AS BIGINT) AS g_size
    FROM docs JOIN buckets USING (n_chars)
    GROUP BY 1, 2, 3
),
banded AS (
    SELECT CASE WHEN g_size >= {k * 4} THEN 'k20+'
                WHEN g_size >= {k} THEN 'k5-19'
                WHEN g_size >= 2 THEN 'k2-4'
                ELSE 'k1' END AS band,
           g_size
    FROM groups
),
per_band AS (
    SELECT band, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(g_size) AS BIGINT) AS n_docs
    FROM banded GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(g_size) AS BIGINT) AS total_docs,
           CAST(SUM(CASE WHEN g_size < {k} THEN g_size ELSE 0 END)
                AS BIGINT) AS at_risk
    FROM groups
)
SELECT band, n_groups, n_docs, at_risk AS docs_below_k,
       {sql_round_half_away(
           'CAST(at_risk AS DOUBLE) / CAST(total_docs AS DOUBLE)', 6)}
           AS frac_below_k
FROM per_band, tot
"""


# ---------------------------------------------------------------------------
# calibration_curve
# ---------------------------------------------------------------------------

CALIB_BINS = 10


def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the trained classifier: score the corpus
    with the :func:`q_logistic_irls` coefficients (CHAINED from the
    same fit, not retrained), bucket predicted probability into 10
    bins, and report observed vs predicted rate per bin with the
    expected calibration error — the audit that decides whether a
    quality filter's threshold means what it says before it gates
    100 TB of data.

    Scale shape: scoring is a broadcast 1-row coefficient join + pure
    row expressions; the diagram is one map-side-combined aggregate
    over bin ids; ECE is a <= 10-row reduction broadcast back onto the
    bins.  Everything after the (already-aggregate) training rounds is
    one corpus pass."""
    from ..functions.rounding import round_half_away
    from ..operators.materialize import materialize

    feats, beta = _irls_fit(spark, sf_dir)
    # beta is already materialized by the session-artifact seam
    # (without a materialization point the 3-round training chain
    # would re-derive per consumer branch)
    scored = feats.crossJoin(F.broadcast(beta))
    eta = (
        F.col("b0")
        + F.col("b1") * F.col("x1")
        + F.col("b2") * F.col("x2")
    )
    p = round_half_away(_elliott(eta), 9)
    binned = scored.select(
        F.least(
            F.lit(CALIB_BINS - 1), F.floor(p * CALIB_BINS).cast("int")
        ).alias("bin"),
        p.alias("p"),
        "y",
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p").cast("decimal(25,9)")).alias("sp"),
        F.sum(F.col("y").cast("decimal(25,9)")).alias("sy"),
    )
    mean_p = F.col("sp").cast("double") / F.col("n").cast("double")
    obs = F.col("sy").cast("double") / F.col("n").cast("double")
    gap = F.abs(obs - mean_p)
    rows = agg.select(
        "bin",
        F.col("n").cast("long").alias("n_docs"),
        round_half_away(mean_p, 9).alias("mean_pred"),
        round_half_away(obs, 9).alias("obs_rate"),
        round_half_away(gap, 9).alias("abs_gap"),
        (F.col("n").cast("double") * gap).alias("_w_gap"),
    )
    rows = materialize(rows)  # <= CALIB_BINS rows, feeds ece AND output
    ece = rows.agg(
        (
            F.sum(round_half_away(F.col("_w_gap"), 9).cast("decimal(25,9)"))
            .cast("double")
            / F.sum(F.col("n_docs")).cast("double")
        ).alias("_ece")
    )
    return rows.crossJoin(F.broadcast(ece)).select(
        "bin",
        "n_docs",
        "mean_pred",
        "obs_rate",
        "abs_gap",
        round_half_away(F.col("_ece"), 9).alias("ece"),
    )


def oracle_calibration_curve() -> str:
    from ..functions.rounding import sql_round_half_away

    eta = "(b0 + b1 * x1 + b2 * x2)"
    p_raw = f"(0.5 * (1.0 + {eta} / (1.0 + abs({eta}))))"
    p = sql_round_half_away(p_raw, 9)
    mean_p = "CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)"
    obs = "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"
    gap = f"abs(({obs}) - ({mean_p}))"
    w_gap = sql_round_half_away(f"CAST(n AS DOUBLE) * ({gap})", 9)
    return f"""
WITH {_irls_chain_sql()},
binned AS (
    SELECT least({CALIB_BINS - 1},
                 CAST(floor(({p}) * {CALIB_BINS}) AS INT)) AS bin,
           {p} AS p, y
    FROM feats, beta{IRLS_ROUNDS - 1}
),
agg AS (
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(p AS DECIMAL(25,9))) AS sp,
           SUM(CAST(y AS DECIMAL(25,9))) AS sy
    FROM binned GROUP BY 1
),
rows_t AS (
    SELECT bin, n AS n_docs,
           {sql_round_half_away(mean_p, 9)} AS mean_pred,
           {sql_round_half_away(obs, 9)} AS obs_rate,
           {sql_round_half_away(gap, 9)} AS abs_gap,
           CAST({w_gap} AS DECIMAL(25,9)) AS w_gap
    FROM agg
),
ece AS (
    SELECT CAST(SUM(w_gap) AS DOUBLE) / CAST(SUM(n_docs) AS DOUBLE) AS e
    FROM rows_t
)
SELECT bin, n_docs, mean_pred, obs_rate, abs_gap,
       {sql_round_half_away('e', 9)} AS ece
FROM rows_t, ece
"""


# ---------------------------------------------------------------------------
# importance_ess
# ---------------------------------------------------------------------------


def q_importance_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of importance-weighted domain mixtures:
    for a target domain distribution, per-doc weight w = target_share /
    empirical_share and ESS = (sum w)^2 / sum w^2 — the one number that
    says whether a reweighted mixture actually HAS the data it claims
    (ESS collapse means the mixture is a few documents reweighted into
    a trench coat).  Two standard targets: uniform over sources, and
    sqrt-temperature flattening (share ∝ sqrt(empirical), the
    multilingual-sampling convention).

    Scale shape: weights are constant within a source, so every moment
    reduces on the DIMENSION-sized (source, count) frame — sum w =
    sum_src n_src * w_src — one corpus aggregate then O(#sources)
    arithmetic; nothing per-doc ever shuffles."""
    from ..functions.rounding import round_half_away

    from ..operators.materialize import materialize

    docs = parallelized(spark, load_table(spark, sf_dir, "documents"))
    # the (source, count) dimension frame feeds the totals AND both
    # schemes' moment aggregates — materialize or the corpus aggregate
    # re-derives per branch
    src = materialize(
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    )
    # sqrt(n) terms quantize to 9 dp and accumulate through exact DECIMAL
    # (ADVICE r9): a raw double SUM is partition-order-dependent, and a
    # last-ulp difference in sq_tot can flip the 9-dp quantization of w
    # near a rounding boundary.  Same dec_sum pattern as every other
    # moment sum in this module.
    tot = src.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            round_half_away(F.sqrt(F.col("n").cast("double")), 9)
            .cast("decimal(25,9)")
        ).alias("sq_tot_dec"),
    )
    j = src.crossJoin(F.broadcast(tot))
    emp = F.col("n").cast("double") / F.col("nn").cast("double")
    schemes = {
        "uniform": (F.lit(1.0) / F.col("k").cast("double")) / emp,
        "sqrt_temp": (
            round_half_away(F.sqrt(F.col("n").cast("double")), 9)
            / F.col("sq_tot_dec").cast("double")
        )
        / emp,
    }
    outs = []
    for name, w_src in schemes.items():
        w9 = round_half_away(w_src, 9)
        agg = j.select(
            F.col("n"),
            w9.alias("w"),
        ).agg(
            F.sum(F.col("n")).cast("long").alias("n_docs"),
            F.sum(
                round_half_away(F.col("n").cast("double") * F.col("w"), 9)
                .cast("decimal(25,9)")
            ).alias("sw"),
            F.sum(
                round_half_away(
                    F.col("n").cast("double") * (F.col("w") * F.col("w")), 9
                ).cast("decimal(25,9)")
            ).alias("sw2"),
        )
        sw = F.col("sw").cast("double")
        sw2 = F.col("sw2").cast("double")
        ess = (sw * sw) / sw2
        outs.append(
            agg.select(
                F.lit(name).alias("scheme"),
                "n_docs",
                round_half_away(sw, 6).alias("sum_w"),
                round_half_away(ess, 6).alias("ess"),
                round_half_away(
                    ess / F.col("n_docs").cast("double"), 6
                ).alias("ess_frac"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def oracle_importance_ess() -> str:
    from ..functions.rounding import sql_round_half_away

    emp = "(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))"
    selects = []
    for name, w_src in (
        ("uniform", f"((1.0 / CAST(k AS DOUBLE)) / {emp})"),
        ("sqrt_temp",
         f"(({sql_round_half_away('sqrt(CAST(n AS DOUBLE))', 9)}"
         f" / CAST(sq_tot_dec AS DOUBLE)) / {emp})"),
    ):
        w9 = sql_round_half_away(w_src, 9)
        sw_term = sql_round_half_away(f"CAST(n AS DOUBLE) * ({w9})", 9)
        sw2_term = sql_round_half_away(
            f"CAST(n AS DOUBLE) * (({w9}) * ({w9}))", 9
        )
        selects.append(f"""
SELECT '{name}' AS scheme,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       {sql_round_half_away(
           'CAST(SUM(CAST(' + sw_term + ' AS DECIMAL(25,9))) AS DOUBLE)', 6)}
           AS sum_w,
       {sql_round_half_away(
           '(CAST(SUM(CAST(' + sw_term + ' AS DECIMAL(25,9))) AS DOUBLE)'
           ' * CAST(SUM(CAST(' + sw_term + ' AS DECIMAL(25,9))) AS DOUBLE))'
           ' / CAST(SUM(CAST(' + sw2_term + ' AS DECIMAL(25,9))) AS DOUBLE)',
           6)} AS ess,
       {sql_round_half_away(
           '((CAST(SUM(CAST(' + sw_term + ' AS DECIMAL(25,9))) AS DOUBLE)'
           ' * CAST(SUM(CAST(' + sw_term + ' AS DECIMAL(25,9))) AS DOUBLE))'
           ' / CAST(SUM(CAST(' + sw2_term + ' AS DECIMAL(25,9))) AS DOUBLE))'
           ' / CAST(SUM(n) AS DOUBLE)', 6)} AS ess_frac
FROM j""")
    union = " UNION ALL ".join(selects)
    return f"""
WITH src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
           SUM(CAST({sql_round_half_away('sqrt(CAST(n AS DOUBLE))', 9)}
               AS DECIMAL(25,9))) AS sq_tot_dec
    FROM src
),
j AS (SELECT * FROM src, tot)
{union}
"""


# ---------------------------------------------------------------------------
# mwu_domain_reweight
# ---------------------------------------------------------------------------

#: multiplicative-weights step size and round count — pinned literals
#: shared with the oracle.  eta is small enough that the update factor
#: (1 + eta * excess) stays positive for this corpus's loss spread; the
#: greatest(., 0) clamp documents the boundary rather than relying on it.
MWU_ETA = 0.1
MWU_ROUNDS = 3


def q_mwu_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-shaped domain mixture reweighting WITHOUT libm (round-10
    wave 3): K pinned rounds of the multiplicative-weights update
    w ← w·(1 + eta·(L_m − Σ w L)) / Z over per-domain mean LM losses —
    the domain-upweighting loop a training-mixture pass runs, with the
    exponentiated-gradient ``exp()`` replaced by its first-order
    rational update so the fixed point is bit-portable across engines
    (the same libm argument as the IRLS Elliott link).

    Losses come from the unigram-logprob artifact (L_m = mean of
    −avg_logprob over the domain's documents, exact-decimal sum): the
    corpus is scanned once; every round after that is arithmetic over
    the DOMAIN-sized frame chained by broadcast 1-row reductions —
    zero collects, zero UDFs, per-round cost O(#domains) regardless of
    corpus size.  Weights quantize to 9 dp per round, so the Σ wL and
    Z reductions are order-free exact-decimal sums."""
    from ..functions.rounding import round_half_away

    from ..operators.materialize import materialize

    scores = q_unigram_logprob(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    dom = materialize(
        scores.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (-F.col("avg_logprob")).cast("decimal(18,6)")
            ).alias("sl"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            round_half_away(
                F.col("sl").cast("double") / F.col("n_docs").cast("double"),
                9,
            ).alias("loss"),
        )
    )
    m = dom.agg(F.count(F.lit(1)).cast("double").alias("m"))
    # each round consumes the weight frame in TWO branches (the Σ wL /
    # Z reductions and the next round's select) — without a materialize
    # per round Catalyst re-derives the whole chain per branch and the
    # plan compounds ~2^K (first audit: 127 shuffles; with it: one
    # domain-frame checkpoint per round)
    w = materialize(
        dom.crossJoin(F.broadcast(m)).select(
            "lang",
            "n_docs",
            "loss",
            round_half_away(F.lit(1.0) / F.col("m"), 9).alias("w"),
        )
    )
    carried: list[str] = []
    for k in range(1, MWU_ROUNDS + 1):
        lbar = w.agg(
            F.sum(
                round_half_away(F.col("w") * F.col("loss"), 9).cast(
                    "decimal(25,9)"
                )
            )
            .cast("double")
            .alias("lbar")
        )
        wu = w.crossJoin(F.broadcast(lbar)).withColumn(
            "wu",
            round_half_away(
                F.greatest(
                    F.col("w")
                    * (
                        F.lit(1.0)
                        + F.lit(MWU_ETA)
                        * (F.col("loss") - F.col("lbar"))
                    ),
                    F.lit(0.0),
                ),
                9,
            ),
        )
        z = wu.agg(
            F.sum(F.col("wu").cast("decimal(25,9)"))
            .cast("double")
            .alias("z")
        )
        w = materialize(
            wu.crossJoin(F.broadcast(z))
            .select(
                "lang",
                "n_docs",
                "loss",
                *carried,
                round_half_away(F.col("wu") / F.col("z"), 9).alias("w"),
            )
            .withColumn(f"w_r{k}", F.col("w"))
        )
        carried.append(f"w_r{k}")
    return w.select("lang", "n_docs", "loss", *carried)


def oracle_mwu_domain_reweight() -> str:
    from ..functions.rounding import sql_round_half_away

    logp = sql_round_half_away("ln(corpus_count / total)", 9)
    avg = sql_round_half_away("CAST(sum(logp) AS DOUBLE) / count(*)", 6)
    loss = sql_round_half_away(
        "CAST(SUM(CAST(-avg_logprob AS DECIMAL(18,6))) AS DOUBLE)"
        " / CAST(count(*) AS DOUBLE)",
        9,
    )
    w0 = sql_round_half_away("1.0 / m", 9)
    rounds = []
    prev = "w0"
    for k in range(1, MWU_ROUNDS + 1):
        wl = sql_round_half_away(f"{prev}.w * {prev}.loss", 9)
        wu = sql_round_half_away(
            f"greatest({prev}.w * (1.0 + {MWU_ETA!r}"
            f" * ({prev}.loss - lbar{k})), 0.0)",
            9,
        )
        wnext = sql_round_half_away(f"wu{k} / z{k}", 9)
        cols = ["lang", "n_docs", "loss", f"{wnext} AS w"]
        cols += [f"w_r{i}" for i in range(1, k)]
        cols.append(f"{wnext} AS w_r{k}")
        rounds.append(f"""
lb{k} AS (
    SELECT CAST(SUM(CAST({wl} AS DECIMAL(25,9))) AS DOUBLE) AS lbar{k}
    FROM {prev}
),
u{k} AS (
    SELECT {prev}.*, {wu} AS wu{k} FROM {prev}, lb{k}
),
zz{k} AS (
    SELECT CAST(SUM(CAST(wu{k} AS DECIMAL(25,9))) AS DOUBLE) AS z{k}
    FROM u{k}
),
w{k} AS (
    SELECT {", ".join(cols)}
    FROM u{k}, zz{k}
)""")
        prev = f"w{k}"
    rounds_sql = ",".join(rounds)
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (SELECT token, count(*) AS corpus_count FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(corpus_count) AS DOUBLE) AS total FROM vocab),
v AS (SELECT token, CAST({logp} AS DECIMAL(28,9)) AS logp FROM vocab, tot),
scores AS (
    SELECT doc_id, {avg} AS avg_logprob
    FROM tok JOIN v USING (token)
    GROUP BY doc_id
),
dom AS (
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs, {loss} AS loss
    FROM scores s JOIN documents d USING (doc_id)
    GROUP BY d.lang
),
mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM dom),
w0 AS (SELECT lang, n_docs, loss, {w0} AS w FROM dom, mm),
{rounds_sql}
SELECT lang, n_docs, loss,
       {", ".join(f"w_r{i}" for i in range(1, MWU_ROUNDS + 1))}
FROM w{MWU_ROUNDS}
"""


# ---------------------------------------------------------------------------
# tokenizer_coverage_drift
# ---------------------------------------------------------------------------

#: vocabulary freeze window: doc-id deciles 0..TOKCOV_FREEZE-1 define
#: the frozen vocab; later deciles are the "new crawl" being scored
TOKCOV_FREEZE = 3


def q_tokenizer_coverage_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-vocab coverage drift (round-10 wave 4): freeze the token
    vocabulary on the first ``TOKCOV_FREEZE`` doc-id deciles, then
    report per decile the OOV token rate and distinct-OOV type count —
    the "is our tokenizer going stale against new data" report run
    before committing a vocab to a full-corpus tokenize job.  The
    complement of `ngram_novelty_decay`: that curve asks whether new
    data still adds N-GRAMS; this asks whether a FROZEN tokenizer
    still covers new data.

    Scale shape: one corpus token pass; the frozen vocab is a
    vocabulary-sized frame that BROADCASTS into a left join; per-decile
    reductions are map-side combined.  Decile boundaries are exact
    integer arithmetic over the dense doc-id space (floor(id*10/(max+1))
    of <2^53 integers in double — identical in both engines)."""
    from ..functions.rounding import round_half_away

    docs = parallelized(spark, load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    maxid = docs.agg(F.max("doc_id").alias("mx"))
    deciled = docs.crossJoin(F.broadcast(maxid)).select(
        F.floor(
            F.col("doc_id").cast("double")
            * F.lit(10.0)
            / (F.col("mx").cast("double") + F.lit(1.0))
        ).cast("int").alias("decile"),
        "text",
    )
    # the vocab pass explodes ONLY the freeze slice (filter before the
    # token fan-out — at 100 TB that's a 70% scan-and-explode saving on
    # the vocabulary job, and it decouples the two passes' lineage)
    vocab = (
        deciled.where(F.col("decile") < TOKCOV_FREEZE)
        .select(F.explode(TS.words(F.col("text"))).alias("token"))
        .distinct()
        .withColumn("_known", F.lit(1))
    )
    toks = deciled.select(
        "decile", F.explode(TS.words(F.col("text"))).alias("token")
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    return (
        joined.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_known").isNull(), 1).otherwise(0)
            ).cast("long").alias("oov_tokens"),
            F.countDistinct(
                F.when(F.col("_known").isNull(), F.col("token"))
            ).alias("oov_types"),
        )
        .select(
            "decile",
            "n_tokens",
            "oov_tokens",
            "oov_types",
            round_half_away(
                F.col("oov_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


def oracle_tokenizer_coverage_drift() -> str:
    from ..functions.rounding import sql_round_half_away

    rate = sql_round_half_away(
        "CAST(oov_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6
    )
    return f"""
WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
toks AS (
    SELECT CAST(floor(CAST(doc_id AS DOUBLE) * 10.0
                      / (CAST(mx AS DOUBLE) + 1.0)) AS INT) AS decile,
           unnest(string_split(text, ' ')) AS token
    FROM documents, mx
),
vocab AS (
    SELECT DISTINCT token FROM toks WHERE decile < {TOKCOV_FREEZE}
),
joined AS (
    SELECT t.decile, t.token, v.token AS known
    FROM toks t LEFT JOIN vocab v USING (token)
),
agg AS (
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN known IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           CAST(count(DISTINCT CASE WHEN known IS NULL THEN token END)
                AS BIGINT) AS oov_types
    FROM joined GROUP BY decile
)
SELECT decile, n_tokens, oov_tokens, oov_types, {rate} AS oov_rate
FROM agg
"""


def af_minhash_index_maintain(
    spark: SparkSession, sf_dir: str, scratch: str
) -> dict[str, DataFrame]:
    """Interior frames for the plan audit (`audit_frames`): the
    delta-only band re-signature and the candidate-pair consumption
    over the maintained index."""
    from ..sinks.upsert import upsert_partitioned_moving

    index_path = f"{scratch}/bands"
    minhash_band_artifact(spark, sf_dir).write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(index_path)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta_rows = _mh_band_rows(_mh_delta(docs))
    upsert_partitioned_moving(
        spark,
        index_path,
        delta_rows,
        keys=["doc_id", "band"],
        partition_col="shard",
    )
    return {
        "delta_build": delta_rows,
        "consume": band_index_candidates(spark, index_path),
    }
