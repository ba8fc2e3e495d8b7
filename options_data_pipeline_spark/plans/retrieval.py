"""Retrieval and corpus-mixture queries over ``documents``.

Training-data pipelines need more than dedup: they rank documents
against keyword probes (BM25 — the classic lexical retrieval scorer),
rebalance the corpus across domains (mixture reweighting), and trim
quality-score outliers (winsorization). Each query here is the
Spark-first shape of one of those steps, with an exact DuckDB oracle.

Scale notes (the shapes that survive 100 TB):

- **BM25**: the postings list is filtered to the query terms *before*
  any shuffle — the only corpus-wide exchange carries (doc, term, tf)
  for matching rows, a vanishing fraction of the corpus. Document
  frequencies and corpus stats are tiny aggregates broadcast back; the
  per-doc score sum shuffles on doc_id once.
- **Mixture**: one map-side-combined groupBy on (source, lang) plus a
  scalar broadcast — nothing else touches the corpus.
- **Winsorize**: the bounds are a single exact-percentile aggregate
  (two skinny doubles broadcast); clamping is a scan-level expression.

Float determinism follows the house rules (:mod:`..functions.rounding`):
``ln()`` results are rounded to 9 dp and carried as DECIMAL so sums are
associative; final scores round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_half_away, sql_round_half_away
from ..sources.tables import load_table

# Fixed keyword probe for the BM25 query (mid/high-frequency corpus terms).
QUERY_TERMS = ("shuffle", "broadcast", "join")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
# corpora below this many docs score everything in one pass — the WAND
# threshold subquery only pays off once the doc-length join it prunes is
# the dominant cost (measured: pruning was 2.3x SLOWER at sf0.1's ~10k
# docs). Tests monkeypatch this to pin the pruned path's exactness.
PRUNE_MIN_DOCS = 100_000
# corpus-size probe memo: one zero-column count per (session, snapshot)
# — the snapshot is immutable, so the gate decision never changes
_N_DOCS_MEMO: dict[tuple[str, str], int] = {}


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k for a fixed keyword query.

    Inverted-index shape: explode tokens, keep only query-term postings
    (the filter sits under the first exchange, so the corpus-wide
    shuffle carries matching postings only), aggregate tf per
    (doc, term), broadcast-join the per-term document frequencies and
    the (N, avgdl) scalars, score, and sum per doc.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  [the "plus-one" BM25+
    variant that keeps idf positive]; per-term partial scores are
    rounded to 9 dp DECIMAL so the per-doc sum is associative and
    engine-portable; the reported score rounds to 6 dp and orders the
    top-k (ties: doc_id).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.lower(F.col("text")), " ")
    dl = docs.select("doc_id", F.size(words).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    postings = (
        docs.select("doc_id", F.explode(words).alias("term"))
        .where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "df",
        round_half_away(
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
            9,
        )
        .cast("decimal(28,9)")
        .alias("idf"),
        "avgdl",
    )

    def score_t(tf, idf_col, dl_col, avgdl):
        return (
            idf_col.cast("double")
            * (tf * (BM25_K1 + 1.0))
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_col / avgdl))
        )

    # --- scale gate (VERDICT r3 ask #3) --------------------------------
    # The WAND threshold subquery pays for itself only when the corpus
    # is large enough that pruning the doc-length join beats the extra
    # candidate-scoring job — at sf0.1 it regressed 2.3x. Below the
    # floor, run the plain single-pass scoring plan (bit-identical
    # output; both paths share the same rounded-decimal arithmetic).
    # count docs, not dl: counting dl would force the tokenization just
    # to decide the path; a zero-column count over the documents scan is
    # metadata-cheap, and memoized per (session, snapshot)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    n_docs_total = _N_DOCS_MEMO.get(memo_key)
    if n_docs_total is None:
        n_docs_total = docs.select("doc_id").count()
        _N_DOCS_MEMO[memo_key] = n_docs_total
    if n_docs_total < PRUNE_MIN_DOCS:
        scored = (
            postings.join(F.broadcast(idf), "term")
            .join(dl, "doc_id")
            .select(
                "doc_id",
                round_half_away(
                    score_t(F.col("tf"), F.col("idf"), F.col("dl"), F.col("avgdl")),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("s"),
            )
            .groupBy("doc_id")
            .agg(
                round_half_away(
                    F.sum(F.col("s").cast("decimal(38,9)")).cast("double"), 6
                ).alias("bm25"),
                F.count(F.lit(1)).cast("long").alias("n_terms"),
            )
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(BM25_TOP_K)
        )
        return scored.select("doc_id", "bm25", "n_terms")

    # --- WAND-style exact pruning --------------------------------------
    # Per-term score ceiling: score_t < idf * (k1+1) for any tf/dl, so a
    # doc's total is bounded by the sum of ceilings of its matched terms.
    # theta = the k-th best TRUE score among docs matching the RAREST
    # query term (a small, broadcastable candidate set). At least k real
    # docs score >= theta, so any doc whose ceiling-sum < theta provably
    # cannot reach the top-k — postings dominated by frequent terms are
    # dropped BEFORE the corpus-wide doc-length join. The final top-k is
    # bit-identical to the unpruned plan (oracle unchanged).
    from ..operators.materialize import materialize

    postings = materialize(postings)
    per_doc = (
        postings.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("tf", "idf")).alias("ts"),
            F.sum(F.col("idf").cast("double") * (BM25_K1 + 1.0)).alias("ub"),
            F.min("avgdl").alias("avgdl"),
        )
    )

    rarest = idf.orderBy("df", "term").limit(1).select("term")
    cand = postings.join(F.broadcast(rarest), "term").select("doc_id")
    cand_scored = (
        postings.join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            round_half_away(
                score_t(F.col("tf"), F.col("idf"), F.col("dl"), F.col("avgdl")), 9
            )
            .cast("decimal(28,9)")
            .alias("s"),
        )
        .groupBy("doc_id")
        .agg(round_half_away(F.sum("s").cast("double"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .collect()
    )
    # fewer than k candidates -> no provable threshold -> prune nothing
    theta = (
        cand_scored[-1].bm25 if len(cand_scored) >= BM25_TOP_K else float("-inf")
    )

    survivors = per_doc.where(F.col("ub") >= theta).join(dl, "doc_id")
    # survivors' scores fold over the collected (tf, idf) pairs at scan
    # level — the per-term DECIMAL(28,9) partials sum exactly (order-
    # free), identical to the unpruned per-posting aggregation
    per_term = lambda acc, t: (  # noqa: E731
        acc
        + round_half_away(
            score_t(t["tf"], t["idf"], F.col("dl"), F.col("avgdl")), 9
        ).cast("decimal(28,9)")
    ).cast("decimal(38,9)")
    total = F.aggregate(
        F.col("ts"), F.lit(0).cast("decimal(38,9)"), per_term
    )
    return (
        survivors.select(
            "doc_id",
            round_half_away(total.cast("double"), 6).alias("bm25"),
            F.size("ts").cast("long").alias("n_terms"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


def oracle_bm25_search() -> str:
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    idf = sql_round_half_away("ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)", 9)
    k1p1 = BM25_K1 + 1.0
    score = sql_round_half_away(
        f"CAST(idf AS DOUBLE) * (tf * {k1p1}) / "
        f"(tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))",
        9,
    )
    final = sql_round_half_away("CAST(sum(s) AS DOUBLE)", 6)
    return f"""
WITH dl AS (
    SELECT doc_id, len(string_split(lower(text), ' ')) AS dl FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
postings AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents)
    WHERE term IN ({terms})
    GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
idf AS (
    SELECT term, CAST({idf} AS DECIMAL(28,9)) AS idf, avgdl
    FROM dfreq, stats
),
scored AS (
    SELECT p.doc_id, CAST({score} AS DECIMAL(28,9)) AS s
    FROM postings p
    JOIN idf USING (term)
    JOIN dl USING (doc_id)
)
SELECT doc_id, {final} AS bm25, CAST(count(*) AS BIGINT) AS n_terms
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP_K}
"""


def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture reweighting: per (source, lang) token shares and
    the up/down-sampling weight that would flatten the mixture to a
    uniform token budget across domains.

    weight = min(1, target_share / actual_share) — the standard
    downsample-only policy (never duplicate data, only subsample
    over-represented domains). One map-side-combined groupBy plus a
    scalar broadcast; the weights table is exactly what a sampling pass
    (cf. ``stratified_sample``) consumes as its per-stratum rates.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_dom = (
        docs.select(
            "source",
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("__tok"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
        )
    )
    # Totals via an unpartitioned window OVER THE AGGREGATED table — not a
    # separate agg + cross join, which would plan a second full corpus
    # scan (Spark does not reuse the groupBy subtree across branches).
    # The window sees one row per (source, lang): a few hundred rows on a
    # single partition, regardless of corpus size.
    from pyspark.sql import Window

    everything = Window.partitionBy()
    per_dom = per_dom.select(
        "*",
        F.sum("n_tokens").over(everything).alias("total_tokens"),
        F.count(F.lit(1)).over(everything).alias("n_domains"),
    )
    share = F.col("n_tokens").cast("double") / F.col("total_tokens")
    target = F.lit(1.0) / F.col("n_domains")
    return per_dom.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        round_half_away(share, 6).alias("token_share"),
        round_half_away(F.least(F.lit(1.0), target / share), 6).alias(
            "sample_weight"
        ),
    )


def oracle_domain_mixture() -> str:
    share = "CAST(n_tokens AS DOUBLE) / total_tokens"
    weight = f"least(1.0, (1.0 / n_domains) / ({share}))"
    return f"""
WITH per_dom AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1, 2
),
totals AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS n_domains
    FROM per_dom
)
SELECT source, lang, n_docs, n_tokens,
       {sql_round_half_away(share, 6)} AS token_share,
       {sql_round_half_away(weight, 6)} AS sample_weight
FROM per_dom, totals
"""


def q_logprob_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized quality trim on the unigram-LM score: compute the
    exact p05/p95 of per-doc avg log-prob, clamp every score into the
    window, and flag the outliers a curation pass would drop.

    The bounds are one exact-percentile aggregate over the (already
    tiny) per-doc score table, broadcast back as two scalars; the clamp
    is a scan-level expression. Re-uses the ``unigram_logprob`` pipeline
    as its input stage.
    """
    from .text import q_unigram_logprob

    scored = q_unigram_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    # winsorization bounds from the distinct-value prefix sum
    # (re-planned r13: the exact `percentile` aggregate buffered every
    # doc's score in one reducer — an ungrouped funnel over |docs|)
    from ..operators.prefixsum import grouped_interp_percentiles

    # materialize_values=False (r14): `scored` serves from the session
    # artifact store (already materialized), so the prefix branches
    # re-aggregate the compact doc-score frame instead of paying an
    # eager checkpoint — no corpus scan either way
    bounds = grouped_interp_percentiles(
        scored, [], "avg_logprob", [0.05, 0.95], ["p05", "p95"],
        materialize_values=False,
    ).select("p05", "p95")
    clamped = F.least(F.greatest(F.col("avg_logprob"), F.col("p05")), F.col("p95"))
    return scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "avg_logprob",
        round_half_away(clamped, 6).alias("winsorized"),
        (
            (F.col("avg_logprob") < F.col("p05"))
            | (F.col("avg_logprob") > F.col("p95"))
        ).alias("is_outlier"),
    )


def oracle_logprob_trim() -> str:
    from .text import oracle_unigram_logprob

    base = oracle_unigram_logprob().strip()
    clamped = "least(greatest(avg_logprob, p05), p95)"
    return f"""
WITH scored AS ({base}),
bounds AS (
    SELECT quantile_cont(avg_logprob, 0.05) AS p05,
           quantile_cont(avg_logprob, 0.95) AS p95
    FROM scored
)
SELECT doc_id, avg_logprob,
       {sql_round_half_away(clamped, 6)} AS winsorized,
       (avg_logprob < p05 OR avg_logprob > p95) AS is_outlier
FROM scored, bounds
"""


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the ``domain_mixture`` weights: deterministic weighted
    downsampling to a near-uniform token budget, reported as per-domain
    before/after counts. A doc survives when its md5-uniform draw
    (first 6 hex of md5('mix#'||doc_id) / 16^6) falls under its
    domain's sample_weight — replay-stable, no RNG state, exactly the
    ``stratified_sample`` scan-predicate mechanism driven by *computed*
    rates instead of fixed ones.

    Scale shape: weights are a tiny aggregate broadcast back onto the
    corpus scan; the survival test is a scan-level expression; one final
    map-side-combined groupBy reports the audit."""
    docs = load_table(spark, sf_dir, "documents")
    weights = q_domain_mixture(spark, sf_dir).select(
        "source", "lang", "sample_weight"
    )
    # draw and threshold compare as FIXED-WIDTH lowercase hex strings
    # (lexicographic == numeric for same-width hex) — the train_split
    # mechanism, avoiding any hex->int builtin that differs cross-engine
    draw = F.substring(
        F.md5(F.concat(F.lit("mix#"), F.col("doc_id").cast("string"))), 1, 6
    )
    threshold = F.lower(
        F.lpad(
            F.hex(
                F.floor(F.col("sample_weight") * F.lit(float(16**6))).cast("bigint")
            ),
            6,
            "0",
        )
    )
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    # weight >= 1.0 must keep EVERYTHING: floor(1.0 * 16^6) = 0x1000000
    # hex-encodes to 7 chars and lpad(...,6) would TRUNCATE it to
    # '100000', silently dropping ~93.75% of a domain that should be
    # kept whole. Saturate the predicate before the hex compare.
    keep = (F.col("sample_weight") >= 1.0) | (draw < threshold)
    return (
        docs.select("doc_id", "source", "lang", toks.alias("__tok"))
        .join(F.broadcast(weights), ["source", "lang"])
        .select(
            "source",
            "lang",
            "__tok",
            keep.alias("__keep"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__keep"), 1).otherwise(0)).cast("long").alias("kept_docs"),
            F.sum(F.when(F.col("__keep"), F.col("__tok")).otherwise(F.lit(0))).alias("kept_tokens"),
        )
    )


def oracle_mixture_resample() -> str:
    mixture = oracle_domain_mixture().strip()
    draw = "substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 6)"
    threshold = (
        "lower(lpad(hex(CAST(floor(w.sample_weight * 16777216.0) AS BIGINT)),"
        " 6, '0'))"
    )
    return f"""
WITH weights AS ({mixture}),
scored AS (
    SELECT d.source, d.lang,
           len(string_split(d.text, ' ')) AS tok,
           (w.sample_weight >= 1.0 OR {draw} < {threshold}) AS keep
    FROM documents d
    JOIN weights w ON d.source = w.source AND d.lang = w.lang
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(sum(CASE WHEN keep THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM scored GROUP BY 1, 2
"""


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tf-idf terms — the
    summarization/tagging primitive of a corpus pipeline (BM25 ranks
    docs for a query; this ranks terms for a doc).

    idf = ln(N / df) rounded to 9 dp DECIMAL (house float rule); tf-idf
    = tf x idf is then an exact DECIMAL product, so the per-doc rank
    has no float-ordering hazard at all. Vocabulary document
    frequencies broadcast (a vocab is tiny next to its corpus); the
    rank window partitions on doc_id — hash-uniform, never a global
    sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        round_half_away(F.log(F.col("n_docs") / F.col("df")), 9)
        .cast("decimal(28,9)")
        .alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id", "term", (F.col("tf").cast("decimal(28,9)") * F.col("idf")).alias("w")
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("term"))
    )
    return (
        scored.withColumn("rank", rk)
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "rank",
            "term",
            round_half_away(F.col("w").cast("double"), 6).alias("tfidf"),
        )
    )


def oracle_doc_keywords() -> str:
    idf = sql_round_half_away("ln(CAST(n_docs AS DOUBLE) / df)", 9)
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
idf AS (SELECT term, CAST({idf} AS DECIMAL(28,9)) AS idf FROM dfreq, nd),
scored AS (
    SELECT doc_id, term, CAST(tf AS DECIMAL(28,9)) * idf AS w
    FROM tf JOIN idf USING (term)
),
rk AS (
    SELECT doc_id, term, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS rank
    FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
       {sql_round_half_away("CAST(w AS DOUBLE)", 6)} AS tfidf
FROM rk WHERE rank <= 3
"""


# --- retrieval quality metrics: NDCG@10 / MRR over BM25 rankings ------
# Three fixed 2-term probes; binary relevance is INDEPENDENT of the
# scorer (a doc is relevant iff it contains BOTH terms), so the metrics
# judge the ranking rather than restating it. Gains 1/log2(rank+1) are
# rounded to 9 dp DECIMAL before summation (associative, engine-
# portable); ndcg/mrr round to 6 dp.
EVAL_QUERIES = ((1, ("join", "merge")), (2, ("scan", "filter")), (3, ("sort", "order")))
NDCG_K = 10


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval metrics per probe query: candidates are scored
    with the SAME rounded-decimal BM25 arithmetic as ``bm25_search``
    (per-term partials shared across the three probes in one plan);
    the per-query ranking uses the two-phase distributed row_number
    over (qid, score desc, doc_id) — no single-partition window — and
    a 3-row broadcast rebases it to a per-query rank."""
    from ..operators.ranks import distributed_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.lower(F.col("text")), " ")
    dl = docs.select("doc_id", F.size(words).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    all_terms = sorted({t for _, ts in EVAL_QUERIES for t in ts})
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in EVAL_QUERIES for t in ts], "qid int, term string"
    )
    postings = (
        docs.select("doc_id", F.explode(words).alias("term"))
        .where(F.col("term").isin(*all_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        round_half_away(
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
            9,
        ).cast("decimal(28,9)").alias("idf"),
        "avgdl",
    )
    s = round_half_away(
        F.col("idf").cast("double")
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))),
        9,
    ).cast("decimal(28,9)")
    per_doc = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select("qid", "doc_id", s.alias("s"))
        .groupBy("qid", "doc_id")
        .agg(
            round_half_away(
                F.sum(F.col("s").cast("decimal(38,9)")).cast("double"), 6
            ).alias("bm25"),
            F.count(F.lit(1)).alias("n_match"),
        )
    )
    ranked = distributed_row_number(
        per_doc,
        [("qid", False), ("bm25", True), ("doc_id", False)],
        out_col="grank",
    )
    base = ranked.groupBy("qid").agg(F.min("grank").alias("gmin"))
    ranked = ranked.join(F.broadcast(base), "qid").withColumn(
        "r", F.col("grank") - F.col("gmin") + 1
    )
    rel = F.col("n_match") == 2
    gain = F.when(
        rel & (F.col("r") <= NDCG_K),
        round_half_away(
            F.lit(1.0) / F.log2(F.col("r").cast("double") + 1.0), 9
        ).cast("decimal(28,9)"),
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    agg = ranked.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(rel.cast("long")).alias("n_relevant"),
        F.sum(gain.cast("decimal(38,9)")).alias("dcg"),
        F.min(F.when(rel & (F.col("r") <= NDCG_K), F.col("r"))).alias("fr"),
    )
    idcg = F.aggregate(
        F.sequence(
            F.lit(1), F.least(F.lit(NDCG_K).cast("long"), F.col("n_relevant")).cast("int")
        ),
        F.lit(0).cast("decimal(38,9)"),
        lambda acc, i: (
            acc
            + round_half_away(
                F.lit(1.0) / F.log2(i.cast("double") + 1.0), 9
            ).cast("decimal(28,9)")
        ).cast("decimal(38,9)"),
    )
    return agg.select(
        "qid",
        "n_candidates",
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.when(
            F.col("n_relevant") > 0,
            round_half_away(
                F.col("dcg").cast("double") / idcg.cast("double"), 6
            ),
        ).otherwise(F.lit(0.0)).alias("ndcg_10"),
        F.when(
            F.col("fr").isNotNull(),
            round_half_away(F.lit(1.0) / F.col("fr").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("mrr_10"),
    )


def oracle_retrieval_ndcg() -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, ts in EVAL_QUERIES for t in ts)
    all_terms = ", ".join(
        f"'{t}'" for t in sorted({t for _, ts in EVAL_QUERIES for t in ts})
    )
    idf = sql_round_half_away("ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)", 9)
    k1p1 = BM25_K1 + 1.0
    score = sql_round_half_away(
        f"CAST(idf AS DOUBLE) * (tf * {k1p1}) / "
        f"(tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))",
        9,
    )
    bm25 = sql_round_half_away("CAST(sum(s) AS DOUBLE)", 6)
    gain9 = sql_round_half_away("1.0 / log2(r + 1.0)", 9)
    igain9 = sql_round_half_away("1.0 / log2(i + 1.0)", 9)
    ndcg6 = sql_round_half_away("CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)", 6)
    mrr6 = sql_round_half_away("1.0 / fr", 6)
    return f"""
WITH dl AS (
    SELECT doc_id, len(string_split(lower(text), ' ')) AS dl FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
q(qid, term) AS (VALUES {vals}),
postings AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents)
    WHERE term IN ({all_terms})
    GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
idf AS (
    SELECT term, CAST({idf} AS DECIMAL(28,9)) AS idf, avgdl
    FROM dfreq, stats
),
scored AS (
    SELECT q.qid, p.doc_id, CAST({score} AS DECIMAL(28,9)) AS s
    FROM postings p
    JOIN q USING (term)
    JOIN idf USING (term)
    JOIN dl USING (doc_id)
),
perdoc AS (
    SELECT qid, doc_id, {bm25} AS bm25, count(*) AS n_match
    FROM scored GROUP BY 1, 2
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS r
    FROM perdoc
),
agg AS (
    SELECT qid,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN n_match = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant,
           SUM(CASE WHEN n_match = 2 AND r <= {NDCG_K}
                    THEN CAST({gain9} AS DECIMAL(28,9))
                    ELSE CAST(0 AS DECIMAL(28,9)) END) AS dcg,
           MIN(CASE WHEN n_match = 2 AND r <= {NDCG_K} THEN r END) AS fr
    FROM ranked GROUP BY 1
),
idcg_t AS (
    SELECT a.qid, SUM(CAST({igain9} AS DECIMAL(28,9))) AS idcg
    FROM agg a, unnest(range(1, least({NDCG_K}, a.n_relevant) + 1)) AS t(i)
    WHERE a.n_relevant > 0
    GROUP BY 1
)
SELECT a.qid, a.n_candidates, a.n_relevant,
       CASE WHEN a.n_relevant > 0 THEN {ndcg6} ELSE 0.0 END AS ndcg_10,
       CASE WHEN fr IS NOT NULL THEN {mrr6} ELSE 0.0 END AS mrr_10
FROM agg a LEFT JOIN idcg_t USING (qid)
"""


# --- hybrid lexical + dense retrieval (RRF) ----------------------------------
#
# Production retrieval fuses a lexical arm (BM25) with a dense arm (ANN
# over embeddings) — reciprocal-rank fusion is the standard score-free
# combiner (Cormack, Clarke & Buettcher, SIGIR 2009: 1/(k + rank) sums).
# The corpus-scale work happens inside each arm (BM25's filtered
# postings, the ANN index); fusion itself only ever touches two top-k
# lists, so it is bounded no matter the corpus size.

RRF_K = 60
HYBRID_TOP_K = 10


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 of RRF(BM25 arm over ``documents``, cosine arm over
    ``embeddings`` for a fixed deterministic probe vector), fused on
    doc_id == vec_id.  ``lex_rank``/``dense_rank`` are NULL where an arm
    missed the doc; ``rrf`` rounds the raw fused double to 6 dp while
    the ordering uses the raw value (vec-id tie-break)."""
    from pyspark.sql import Window

    from ..functions.litconst import lit_double_array
    from ..operators.ranks import rrf_fuse
    from ..operators.similarity import _pseudo_vec, cosine_topk
    from ..sources.tables import parallelized

    lex0 = q_bm25_search(spark, sf_dir)
    # 20-row arm: the unpartitioned window is bounded by BM25_TOP_K
    w_lex = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = lex0.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("rank")
    )

    emb = parallelized(spark, load_table(spark, sf_dir, "embeddings"))
    corpus = emb.select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    probe = spark.range(1).select(
        F.lit(-1).cast("long").alias("qid"),
        lit_double_array(_pseudo_vec("hybrid", 0)).alias("qv"),
    )
    dense = cosine_topk(probe, corpus, k=BM25_TOP_K).select(
        F.col("cid").alias("doc_id"), "rank"
    )

    fused = rrf_fuse([lex, dense], "doc_id", k=RRF_K)
    w_fin = Window.orderBy(F.col("rrf_raw").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(w_fin).cast("long")
        )
        .where(F.col("fused_rank") <= HYBRID_TOP_K)
        .select(
            "doc_id",
            F.col("rank_0").alias("lex_rank"),
            F.col("rank_1").alias("dense_rank"),
            round_half_away(F.col("rrf_raw"), 6).alias("rrf"),
            "fused_rank",
        )
    )


def oracle_hybrid_rrf() -> str:
    from ..operators.similarity import _pseudo_vec

    qv = "[" + ", ".join(repr(x) for x in _pseudo_vec("hybrid", 0)) + "]"
    dot = (
        "list_reduce(list_transform(range(1, len(cv)+1),"
        " i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)),"
        " (acc, x) -> acc + x)"
    )
    norm = (
        "list_reduce(list_transform(range(1, len({a})+1),"
        " i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)),"
        " (acc, x) -> acc + x)"
    )
    sim = sql_round_half_away(
        f"({dot} / sqrt({norm.format(a='qv')} * {norm.format(a='cv')}))", 4
    )
    term = "COALESCE(CAST(1 AS DOUBLE) / ({k} + {r}), CAST(0 AS DOUBLE))"
    rrf_raw = (
        term.format(k=RRF_K, r="l.rank") + " + " + term.format(k=RRF_K, r="d.rank")
    )
    return f"""
WITH lex0 AS ({oracle_bm25_search()}),
lex AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
    FROM lex0
),
dense0 AS (
    SELECT vec_id AS cid, {sim} AS cosine_sim
    FROM (SELECT vec_id, embedding AS cv, {qv} AS qv FROM embeddings)
),
dense AS (
    SELECT cid AS doc_id, rank FROM (
        SELECT cid, row_number() OVER (ORDER BY cosine_sim DESC, cid ASC) AS rank
        FROM dense0)
    WHERE rank <= {BM25_TOP_K}
),
fused AS (
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.rank AS lex_rank, d.rank AS dense_rank,
           {rrf_raw} AS rrf_raw
    FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank,
       {sql_round_half_away('rrf_raw', 6)} AS rrf,
       row_number() OVER (ORDER BY rrf_raw DESC, doc_id ASC) AS fused_rank
FROM fused
QUALIFY fused_rank <= {HYBRID_TOP_K}
"""


# --- temperature sampling over domains -----------------------------------------

#: temperatures the mixture schedule reports. alpha=1 is proportional
#: (no rebalancing), alpha -> 0 approaches uniform; 0.3 / 0.7 are the
#: standard multilingual-pretraining settings (mT5/XLM-R lineage).
MIXTURE_ALPHAS = (0.3, 0.7, 1.0)


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture schedule per (source, lang) domain:
    sampling probability p_i ∝ n_i^alpha for each alpha, plus the
    effective epoch count each domain would see under a one-corpus-pass
    token budget (epochs_i = p_i * total_tokens / n_i) — the standard
    knob for rebalancing a multilingual / multi-source pretraining
    mixture (low-resource domains get p_i above their natural share at
    alpha < 1, and the epochs column shows the duplication price).

    Scale shape: one map-side-combined groupBy to domain grain, then an
    unpartitioned window over the FEW domain rows (same device as
    ``domain_mixture`` — never a second corpus scan); everything after
    the aggregate is arithmetic on a few hundred rows."""
    from pyspark.sql import Window

    from ..functions.rounding import round_half_away

    docs = load_table(spark, sf_dir, "documents")
    per_dom = (
        docs.select(
            "source",
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("__tok"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("__tok").alias("n_tokens"))
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w).cast("double")
    out_cols = [F.col("source"), F.col("lang"), F.col("n_tokens")]
    for a in MIXTURE_ALPHAS:
        tag = str(a).replace(".", "")
        pow_a = F.pow(F.col("n_tokens").cast("double"), F.lit(float(a)))
        z = F.sum(pow_a).over(w)
        p = pow_a / z
        out_cols.append(round_half_away(p, 6).alias(f"p_a{tag}"))
        out_cols.append(
            round_half_away(
                p * total / F.col("n_tokens").cast("double"), 4
            ).alias(f"epochs_a{tag}")
        )
    return per_dom.select(*out_cols)


def oracle_temperature_mixture() -> str:
    from ..functions.rounding import sql_round_half_away

    cols = []
    for a in MIXTURE_ALPHAS:
        tag = str(a).replace(".", "")
        pow_a = f"pow(CAST(n_tokens AS DOUBLE), {float(a)!r})"
        p = f"({pow_a} / SUM({pow_a}) OVER ())"
        cols.append(f"{sql_round_half_away(p, 6)} AS p_a{tag}")
        cols.append(
            sql_round_half_away(
                f"({p} * CAST(SUM(n_tokens) OVER () AS DOUBLE)"
                f" / CAST(n_tokens AS DOUBLE))",
                4,
            )
            + f" AS epochs_a{tag}"
        )
    return f"""
WITH per_dom AS (
    SELECT source, lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1, 2
)
SELECT source, lang, n_tokens, {", ".join(cols)}
FROM per_dom
"""
