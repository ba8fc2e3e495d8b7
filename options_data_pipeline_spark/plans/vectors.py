"""Similarity-search queries over ``embeddings`` (array<float>, 64-dim)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.litconst import lit_double_array
from ..functions.rounding import round_half_away, sql_round_half_away
from ..operators.similarity import cosine_topk
from ..operators.materialize import materialize
from ..sources.tables import load_table, parallelized

N_QUERIES = 20
TOP_K = 5


def _emb_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The (queries, corpus) frames every ANN query starts from,
    materialized ONCE per session via the artifact store (VERDICT r3
    ask #9): ``ann_recall`` runs both the brute-force and IVF sides, and
    without the artifact each side re-derived its own scan + projection
    of the same immutable embeddings snapshot."""
    from ..operators.artifacts import session_artifact

    queries = session_artifact(
        spark,
        f"ann_queries:{sf_dir}:n={N_QUERIES}",
        lambda: load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")),
    )
    corpus = session_artifact(
        spark,
        f"ann_corpus:{sf_dir}",
        lambda: parallelized(
            spark,
            load_table(spark, sf_dir, "embeddings").select(
                F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
            ),
        ),
    )
    return queries, corpus


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries, corpus = _emb_frames(spark, sf_dir)
    return cosine_topk(queries, corpus, k=TOP_K)


def oracle_ann_cosine_topk() -> str:
    # Same left-fold dot product as the Spark expression (list_reduce is a
    # sequential fold; 0.0 + x1 == x1 bitwise), same rounded-sim ranking.
    dot = (
        "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    qq = (
        "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * qv[i]),"
        " (acc, x) -> acc + x)"
    )
    cc = (
        "list_reduce(list_transform(range(1, len(cv)+1), i -> cv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    sim = sql_round_half_away(f"({dot} / sqrt({qq} * {cc}))", 4)
    return f"""
WITH q AS (
    SELECT vec_id AS qid,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
    SELECT vec_id AS cid,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings
),
pairs AS (
    SELECT qid, cid, {sim} AS cosine_sim
    FROM q CROSS JOIN c
    WHERE qid != cid
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cosine_sim DESC, cid ASC) AS rank
    FROM pairs
)
SELECT qid, cid, cosine_sim, rank FROM rk WHERE rank <= {TOP_K}
"""


# --- planted scaled duplicates (cosine exactly 1.0 with their source) -------
# The synthetic embeddings have no natural near-dups (max pairwise cosine
# ~0.51), so both engines plant rescaled copies: vec_id % 20 == 0 gets a
# twin at vec_id + 100000 with every component doubled (exact in binary
# floating point, so the pair's cosine is 1.0 and LSH recall is provable).

PLANT_MOD = 20
NEAR_DUP_THRESHOLD = 0.9


def planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelized: the hyperplane sign banding downstream is 32 plane
    # dots x 64 dims per row, and the embeddings scan yields ~1-3
    # partitions — same under-partitioning fix as planted_corpus (the
    # old note here claiming the repartition cost more was measured at
    # sf0.01 before the banding grew; wrong at sf0.1/local[32])
    emb = parallelized(spark, load_table(spark, sf_dir, "embeddings"))
    twins = emb.where(F.col("vec_id") % PLANT_MOD == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
        "label",
    )
    return emb.select("vec_id", "embedding", "label").unionByName(twins)


_PLANTED_EMB_SQL = f"""
emb2 AS (
    SELECT vec_id, embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + 100000,
           list_transform(embedding, x -> CAST(x * 2 AS FLOAT)), label
    FROM embeddings WHERE vec_id % {PLANT_MOD} = 0
)
"""


def _sql_dot(a: str, b: str) -> str:
    """Same left-fold dot product as the Spark ``_dot`` expression
    (list_reduce is a sequential fold; 0.0 + x1 == x1 bitwise)."""
    return (
        f"list_reduce(list_transform(range(1, len({a})+1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),"
        " (acc, x) -> acc + x)"
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dups

    return embedding_near_dups(
        planted_embeddings(spark, sf_dir), threshold=NEAR_DUP_THRESHOLD
    )


def oracle_embedding_near_dups() -> str:
    """Exact all-pairs scan >= threshold — the check for the LSH pipeline
    (every qualifying pair is a rescaled copy at cosine 1.0, which agrees
    with its twin on every sign band, so banded recall is exact)."""
    dot = _sql_dot("a.v", "b.v")
    qqa, qqb = _sql_dot("a.v", "a.v"), _sql_dot("b.v", "b.v")
    sim = sql_round_half_away(f"({dot} / sqrt({qqa} * {qqb}))", 4)
    return f"""
WITH {_PLANTED_EMB_SQL},
e AS (SELECT vec_id, embedding AS v FROM emb2)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {sim} AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {sim} >= {NEAR_DUP_THRESHOLD}
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    queries, corpus = _emb_frames(spark, sf_dir)
    return ivf_topk(queries, corpus, k=TOP_K, nprobe=2)


def oracle_ivf_topk() -> str:
    """Replicates the IVF computation exactly (deterministic centroids,
    same fold-order dots, same tie-breaks) — a strong oracle for an
    *approximate* index: the check is 'the index does what it says', not
    'the index equals exact top-k'."""
    from ..operators.similarity import centroids

    cells = ", ".join(
        "({}, [{}])".format(c, ", ".join(repr(x) for x in vec))
        for c, vec in enumerate(centroids())
    )
    cell_sim = _sql_dot("e.v", "w.w")
    dot = _sql_dot("q.qv", "c.cv")
    qq, cc = _sql_dot("q.qv", "q.qv"), _sql_dot("c.cv", "c.cv")
    sim = sql_round_half_away(f"({dot} / sqrt({qq} * {cc}))", 4)
    return f"""
WITH cells(cell, w) AS (VALUES {cells}),
scored AS (
    SELECT e.vec_id, e.v, w.cell, {cell_sim} AS cell_sim
    FROM (SELECT vec_id, embedding AS v FROM embeddings) e
    CROSS JOIN (SELECT cell, w FROM cells) w
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cell_sim DESC, cell ASC) AS cell_rank
    FROM scored
),
c AS (SELECT vec_id AS cid, v AS cv, cell FROM ranked WHERE cell_rank = 1),
q AS (SELECT vec_id AS qid, v AS qv, cell FROM ranked
      WHERE cell_rank <= 2 AND vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.qid, c.cid, {sim} AS cosine_sim
    FROM q JOIN c USING (cell)
    WHERE q.qid != c.cid
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cosine_sim DESC, cid ASC) AS rank
    FROM pairs
)
SELECT qid, cid, cosine_sim, rank FROM rk WHERE rank <= {TOP_K}
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding compression audit: per-vector scale, quantized-array
    md5, reconstruction SSE. Zero-shuffle expression pipeline."""
    from ..operators.similarity import quantize_int8

    emb = parallelized(spark, load_table(spark, sf_dir, "embeddings"))
    return quantize_int8(emb)


def oracle_embedding_quantize() -> str:
    err = "(v[i] - CAST(q[i] AS DOUBLE) * scale / 127)"
    sse = (
        f"list_reduce(list_transform(range(1, len(q)+1),"
        f" i -> {err} * {err}), (acc, x) -> acc + x)"
    )
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
sc AS (
    SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM v
),
qq AS (
    SELECT vec_id, v, scale,
           list_transform(v, x -> COALESCE(
               CAST(floor(x / nullif(scale, 0.0) * 127 + 0.5) AS INT), 0)) AS q
    FROM sc
)
SELECT vec_id,
    CAST(len(q) AS BIGINT) AS n_dims,
    scale,
    {sql_round_half_away(sse, 6)} AS sse,
    md5(array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',')) AS q_md5
FROM qq
"""


# --- k-means clustering -----------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embedding corpus (see
    :mod:`..operators.clustering` for the broadcast-centroid scale
    design). Seeds = vec_id < k; 2 rounds; squared-L2 assignment."""
    from ..operators.clustering import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=KMEANS_K, iterations=KMEANS_ITERS)


def oracle_kmeans_clusters() -> str:
    # Mirrors operators/clustering.py exactly: left-fold squared-L2
    # (list_reduce, no init — all terms are squares so no -0.0 issue),
    # exact-decimal centroid means, (dist, cid) argmin tiebreak.
    k, d = KMEANS_K, 64
    dist = (
        "list_reduce(list_transform(range(1, {n}), i ->"
        " (v[i] - cv[i]) * (v[i] - cv[i])), (acc, x) -> acc + x)"
    ).format(n=d + 1)
    dist_r = sql_round_half_away("dist", 4)
    return f"""
WITH vecs AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
seed AS (
    SELECT vec_id AS cid, v AS cv FROM vecs WHERE vec_id < {k}
),
a1 AS (
    SELECT vec_id, v, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT x.vec_id, x.v, s.cid, {dist} AS dist
          FROM vecs x CROSS JOIN seed s)
),
cent AS (
    SELECT cid, pos,
           CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS c
    FROM (SELECT cid, unnest(v) AS x,
                 unnest(range(0, len(v))) AS pos
          FROM a1 WHERE rn = 1)
    GROUP BY 1, 2
),
cent_v AS (
    SELECT cid, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1
),
a2 AS (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT x.vec_id, s.cid, {dist} AS dist
          FROM vecs x CROSS JOIN cent_v s)
)
SELECT vec_id, CAST(cid AS INT) AS cluster, {dist_r} AS dist
FROM a2 WHERE rn = 1
"""


# --- SemDeDup: semantic pruning inside k-means cells ------------------------

SEMDEDUP_THRESHOLD = 0.9


def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the planted corpus: cluster L2-normalized
    embeddings (k-means, 2 Lloyd rounds), then pairwise cosine ONLY
    within cells; drop the higher id at sim >= 0.9. The planted scaled
    twins normalize to bitwise-identical unit vectors, so recall of the
    true duplicates is provable, not probabilistic."""
    from ..operators.artifacts import session_artifact
    from ..operators.clustering import semantic_prune

    # The dropped set is a deterministic function of the immutable corpus
    # snapshot and is consumed by BOTH this query and curation_decisions;
    # serve it from the session artifact store (built once per snapshot,
    # like the near-dup pair store). bench.py times the build explicitly
    # as semdedup_artifact_build.
    def _build() -> DataFrame:
        emb = planted_embeddings(spark, sf_dir)
        # k=None -> adaptive: ceil(n / TARGET_CELL_SIZE), floored at
        # KMEANS_K. The oracle computes the identical k from count(*), so
        # parity holds at EVERY sf, not just the ones where adaptive == 8.
        return semantic_prune(
            emb, k=None, iterations=KMEANS_ITERS, threshold=SEMDEDUP_THRESHOLD
        )

    key = (
        f"semantic_prune:{sf_dir}:planted:k=adaptive:"
        f"iters={KMEANS_ITERS}:thr={SEMDEDUP_THRESHOLD}"
    )
    return session_artifact(spark, key, _build)


def oracle_semantic_prune() -> str:
    from ..operators.clustering import (
        DEFAULT_K,
        MAX_CELL_SIZE,
        TARGET_CELL_SIZE,
    )

    d = 64
    k = (
        f"(SELECT greatest({DEFAULT_K}, CAST(ceil(cnt / {TARGET_CELL_SIZE}.0)"
        f" AS BIGINT)) FROM params)"
    )
    dist = (
        "list_reduce(list_transform(range(1, {n}), i ->"
        " (v[i] - cv[i]) * (v[i] - cv[i])), (acc, x) -> acc + x)"
    ).format(n=d + 1)
    dot = (
        "list_reduce(list_transform(range(1, {n}), i ->"
        " x.v[i] * y.v[i]), (acc, t) -> acc + t)"
    ).format(n=d + 1)
    sim = sql_round_half_away(dot, 4)
    return f"""
WITH {_PLANTED_EMB_SQL},
raw AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rv
    FROM emb2
),
vecs AS (
    SELECT vec_id,
           list_transform(rv, x -> x / sqrt(
               list_reduce(list_transform(rv, y -> y * y),
                           (acc, t) -> acc + t))) AS v
    FROM raw
),
params AS (SELECT count(*) AS cnt FROM vecs),
seed AS (
    SELECT vec_id AS cid, v AS cv FROM vecs WHERE vec_id < {k}
),
a1 AS (
    SELECT vec_id, v, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT x.vec_id, x.v, s.cid, {dist} AS dist
          FROM vecs x CROSS JOIN seed s)
),
cent AS (
    SELECT cid, pos,
           CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS c
    FROM (SELECT cid, unnest(v) AS x,
                 unnest(range(0, len(v))) AS pos
          FROM a1 WHERE rn = 1)
    GROUP BY 1, 2
),
cent_v AS (
    SELECT cid, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1
),
a2 AS (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT x.vec_id, s.cid, {dist} AS dist
          FROM vecs x CROSS JOIN cent_v s)
),
m AS (
    SELECT a2.vec_id, a2.cid, vecs.v
    FROM a2 JOIN vecs USING (vec_id) WHERE a2.rn = 1
),
cellsz AS (
    SELECT cid, CAST(ceil(count(*) / {MAX_CELL_SIZE}.0) AS BIGINT) AS n_sub
    FROM m GROUP BY 1
),
msub AS (
    SELECT m.vec_id, m.cid, m.v, m.vec_id % c.n_sub AS sub
    FROM m JOIN cellsz c USING (cid)
),
pairs AS (
    SELECT y.vec_id AS id_b, y.cid AS cluster, {sim} AS sim
    FROM msub x JOIN msub y
      ON x.cid = y.cid AND x.sub = y.sub AND x.vec_id < y.vec_id
)
SELECT id_b AS vec_id, CAST(cluster AS INT) AS cluster, max(sim) AS max_sim
FROM pairs WHERE sim >= {SEMDEDUP_THRESHOLD}
GROUP BY 1, 2
"""


# --- per-label centroid cohesion --------------------------------------------


def q_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space QA: per label, the centroid and how tightly the
    label's vectors hug it (mean / min cosine to centroid). Low cohesion
    flags mislabeled or heterogeneous strata before they poison a
    curriculum or a contrastive objective.

    Scale shape: centroids are one map-side-combined groupBy over
    (label, dim) after posexplode — #labels x dim rows out regardless of
    corpus size — then broadcast back; the per-row cosine is a narrow
    fold. Means accumulate as exact DECIMAL (order-free, bitwise
    reproducible under any partitioning — house rule)."""
    from ..functions.rounding import round_half_away

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "label",
        F.col("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = (
        vecs.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    cos = round_half_away(
        dot(F.col("v"), F.col("cv"))
        / F.sqrt(dot(F.col("v"), F.col("v")) * dot(F.col("cv"), F.col("cv"))),
        9,
    ).cast("decimal(28,9)")
    scored = vecs.join(F.broadcast(cent), "label").select(
        "label", cos.alias("cos")
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        round_half_away(
            F.sum("cos").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_cos"),
        round_half_away(F.min("cos").cast("double"), 6).alias("min_cos"),
    )


def oracle_label_cohesion() -> str:
    dot_vc = (
        "list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    dot_vv = (
        "list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * v[i]),"
        " (acc, x) -> acc + x)"
    )
    dot_cc = (
        "list_reduce(list_transform(range(1, len(cv)+1), i -> cv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    cos = sql_round_half_away(f"{dot_vc} / sqrt({dot_vv} * {dot_cc})", 9)
    mean = sql_round_half_away("CAST(sum(cos) AS DOUBLE) / count(*)", 6)
    mn = sql_round_half_away("CAST(min(cos) AS DOUBLE)", 6)
    return f"""
WITH vecs AS (
    SELECT label, vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
cent AS (
    SELECT label, pos,
           CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS c
    FROM (SELECT label, unnest(v) AS x, unnest(range(0, len(v))) AS pos
          FROM vecs)
    GROUP BY 1, 2
),
cent_v AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1),
scored AS (
    SELECT vecs.label, CAST({cos} AS DECIMAL(28,9)) AS cos
    FROM vecs JOIN cent_v ON vecs.label = cent_v.label
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       {mean} AS mean_cos, {mn} AS min_cos
FROM scored GROUP BY label
"""


# --- random-projection dimensionality reduction ------------------------------

RP_OUT_DIMS = 8
RP_IN_DIMS = 64


def _rp_signs(j: int) -> list[int]:
    """Deterministic +-1 row j of the projection matrix: the parity of
    the first hex char of md5('rp#j#i'). Computed once driver-side and
    embedded as a plan constant in BOTH engines (the matrix is part of
    the operator's definition, like a model weight — not data)."""
    import hashlib

    return [
        1 if int(hashlib.md5(f"rp#{j}#{i}".encode()).hexdigest()[0], 16) % 2 else -1
        for i in range(RP_IN_DIMS)
    ]


def q_rp_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection: 64-dim embeddings down
    to 8 dims with a deterministic +-1 sign matrix (scaled 1/sqrt(d)).
    The cheap dimensionality-reduction pass before coarse clustering or
    visualization; sign matrices are the classic Achlioptas choice.

    Scale shape: the matrix rides as a constant array in the plan
    (kmeans-centroid pattern) and each output dim is a row-local fold —
    zero shuffles, embarrassingly parallel at any corpus size.
    """
    from ..functions.rounding import round_half_away

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    scale = float(RP_IN_DIMS) ** 0.5
    outs = []
    for j in range(RP_OUT_DIMS):
        sv = lit_double_array(_rp_signs(j))
        fold = F.aggregate(
            F.zip_with(F.col("v"), sv, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        outs.append(round_half_away(fold / F.lit(scale), 6).alias(f"r_{j}"))
    return vecs.select("vec_id", *outs)


def oracle_rp_reduce() -> str:
    scale = float(RP_IN_DIMS) ** 0.5
    cols = []
    for j in range(RP_OUT_DIMS):
        sv = "[" + ", ".join(f"{float(s)}" for s in _rp_signs(j)) + "]"
        fold = (
            f"list_reduce(list_transform(range(1, {RP_IN_DIMS + 1}),"
            f" i -> v[i] * ({sv})[i]), (acc, t) -> acc + t)"
        )
        cols.append(sql_round_half_away(f"{fold} / {scale}", 6) + f" AS r_{j}")
    cols_sql = ",\n       ".join(cols)
    return f"""
WITH vecs AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
)
SELECT vec_id,
       {cols_sql}
FROM vecs
"""


_CURATION_QUALITY_MIN = 0.3


def q_curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation: the final keep/drop decision per document,
    joining the TEXT quality signal with the EMBEDDING semantic-dup
    signal — the composition a real training-data pipeline runs after
    computing both.

    keep = quality_score >= threshold AND not semantically-duplicated.
    The dedup side is the full SemDeDup pipeline (adaptive-k k-means +
    within-cell cosine) reused from `semantic_prune`; its dropped set
    left-anti-joins the quality-scored corpus on the aligned
    vec_id == doc_id key. Output is the per-(lang, keep) summary a
    curation report needs. One broadcast-able dropped set (duplicates
    are a small fraction by construction), one scan of documents.
    """
    from ..operators.textstats import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).select(
        "doc_id", "lang", "n_chars", "quality_score"
    )
    dropped = q_semantic_prune(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("is_dup")
    )
    keep = (
        (F.col("quality_score") >= F.lit(_CURATION_QUALITY_MIN))
        & F.col("is_dup").isNull()
    )
    return (
        scored.join(dropped, "doc_id", "left_outer")
        .groupBy("lang", keep.alias("keep"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def oracle_curation_decisions() -> str:
    from .text import oracle_text_quality

    return f"""
WITH quality AS (
    SELECT q.doc_id, d.lang, d.n_chars, q.quality_score
    FROM ({oracle_text_quality()}) q
    JOIN documents d USING (doc_id)
),
dropped AS (
    SELECT vec_id AS doc_id FROM ({oracle_semantic_prune()})
)
SELECT quality.lang,
       quality.quality_score >= {_CURATION_QUALITY_MIN}
           AND dropped.doc_id IS NULL AS keep,
       count(*) AS n_docs,
       CAST(SUM(quality.n_chars) AS BIGINT) AS sum_chars
FROM quality LEFT JOIN dropped USING (doc_id)
GROUP BY 1, 2
"""


# --- round-4: PCA family ------------------------------------------------------


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding dimensions —
    the distributed half of tall-skinny PCA (see operators/pca.py).

    Exact DECIMAL moment sums make every entry bit-deterministic under
    any partitioning; the d(d+1)/2 = 2080 output rows are constant in
    corpus size, so the query's output never grows with n.
    """
    from ..operators.pca import covariance_frame

    emb = parallelized(spark, load_table(spark, sf_dir, "embeddings"))
    return covariance_frame(emb)


def oracle_embedding_covariance() -> str:
    # same scaled-integer quantization as operators/pca.py flat_positions:
    # an explicit IEEE half-away formula, not a float->decimal cast (the
    # engines split scale-6 cast ties differently)
    cov = sql_round_half_away(
        "(sxy_s - sx_i * sx_j / n_d) / 1000000000000.0 / n_d", 9
    )
    return f"""
WITH flat AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(floor(abs(CAST(unnest(embedding) AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT)
           * (CASE WHEN CAST(unnest(embedding) AS DOUBLE) < 0
                   THEN -1 ELSE 1 END) AS w
    FROM embeddings
),
moments2 AS (
    SELECT a.i AS i, b.i AS j, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(a.w * b.w AS DECIMAL(38,0))) AS DOUBLE) AS sxy_s
    FROM flat a JOIN flat b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY 1, 2
),
means AS (
    SELECT i, CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS sx_s
    FROM flat GROUP BY 1
)
SELECT m2.i, m2.j, m2.n_vecs, {cov} AS cov
FROM (
    SELECT m2.i, m2.j, m2.n_vecs, m2.sxy_s,
           mi.sx_s AS sx_i, mj.sx_s AS sx_j,
           CAST(m2.n_vecs AS DOUBLE) AS n_d
    FROM moments2 m2
    JOIN means mi ON m2.i = mi.i
    JOIN means mj ON m2.j = mj.i
) m2
"""


_PCA_COMPONENTS = 2


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tall-skinny PCA projection: fit d×d loadings from the exact
    covariance frame (driver-side eigh of a 64×64 matrix — no data
    volume), then project every embedding as a narrow per-row fold.

    No SQL oracle: eigendecomposition is not SQL-expressible. The
    driver records a rows-only check; the algebraic invariants
    (orthonormal loadings, descending explained variance, projection
    variance ≈ eigenvalue) are pinned by tests/test_pca.py.
    """
    from ..operators.pca import fit_loadings, project

    emb = parallelized(spark, load_table(spark, sf_dir, "embeddings"))
    loadings, _ = fit_loadings(emb, n_components=_PCA_COMPONENTS)
    flat = emb.select(F.posexplode("embedding").alias("pos", "vf"))
    mean_rows = (
        flat.groupBy("pos")
        .agg((F.sum(F.col("vf").cast("decimal(38,6)")) / F.count(F.lit(1)))
             .cast("double").alias("mu"))
        .orderBy("pos")
        .collect()
    )
    means = [r["mu"] for r in mean_rows]
    return project(emb, loadings, means).select(
        "vec_id", "label", "pc1", "pc2"
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@k of the IVF index against the
    exact brute-force top-k, per query point — the measurement loop any
    ANN deployment runs before trusting an approximate index.

    Both sides reuse the registry pipelines unchanged (fed from the
    session-artifact embeddings frames — one scan, not four). The
    comparison collapses each side to per-qid id-sets FIRST: the
    ``collect_set`` aggregations reuse their side's rank-window hash
    partitioning on qid (no new exchange), and the set-vs-set compare is
    a broadcast join of two |Q|-row frames + ``array_intersect`` — the
    (qid, cid) pairwise join it replaces cost two sort-merge exchanges
    plus a re-aggregation shuffle (VERDICT r3 ask #9: 8 -> ≤5 shuffles).
    """
    exact_sets = (
        q_ann_cosine_topk(spark, sf_dir)
        .groupBy("qid")
        .agg(F.collect_set("cid").alias("_exact"))
    )
    approx_sets = (
        q_ivf_topk(spark, sf_dir)
        .groupBy("qid")
        .agg(F.collect_set("cid").alias("_approx"))
    )
    joined = exact_sets.join(F.broadcast(approx_sets), "qid", "left")
    n_hits = F.size(
        F.array_intersect(
            F.col("_exact"),
            F.coalesce(F.col("_approx"), F.array().cast("array<long>")),
        )
    ).cast("long")
    return joined.select(
        "qid",
        n_hits.alias("n_hits"),
        (n_hits / F.lit(float(TOP_K))).alias("recall_at_k"),
    )


def oracle_ann_recall() -> str:
    return f"""
WITH exact AS ({oracle_ann_cosine_topk()}),
approx AS ({oracle_ivf_topk()})
SELECT exact.qid,
       CAST(COUNT(approx.cid) AS BIGINT) AS n_hits,
       COUNT(approx.cid) / CAST({TOP_K} AS DOUBLE) AS recall_at_k
FROM exact
LEFT JOIN approx ON exact.qid = approx.qid AND exact.cid = approx.cid
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# hard_negatives — contrastive mining
# ---------------------------------------------------------------------------

HN_K = 3  # hardest negatives kept per anchor


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the
    HN_K most-similar vectors with a DIFFERENT label — the pairs a
    contrastive/embedding trainer needs (similar in vector space,
    separated by supervision).

    Same guarded broadcast-cross-join shape as ``ann_cosine_topk``
    (anchors broadcast, corpus repartitioned so the O(|A|x|C|) scoring
    spreads across tasks), with the label-inequality predicate applied
    before ranking so the window only sees cross-label pairs. At scale
    the corpus side swaps for the IVF cell-probe path unchanged — the
    predicate composes with any candidate generator.
    """
    from ..operators.similarity import _dot
    from ..functions.rounding import round_half_away
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    corpus = parallelized(
        spark,
        emb.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.col("label").alias("clabel"),
        ),
    )
    q = anchors.withColumn("_qq", _dot(F.col("qv"), F.col("qv")))
    c = corpus.withColumn("_cc", _dot(F.col("cv"), F.col("cv")))
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("clabel") != F.col("qlabel")
    )
    sim = round_half_away(
        _dot(F.col("qv"), F.col("cv")) / F.sqrt(F.col("_qq") * F.col("_cc")), 4
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine_sim").desc(), F.col("cid").asc()
    )
    return (
        pairs.withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HN_K)
        .select(
            "qid", F.col("qlabel").alias("anchor_label"),
            "cid", F.col("clabel").alias("negative_label"),
            "cosine_sim", F.col("rank").cast("long").alias("rank"),
        )
    )


def oracle_hard_negatives() -> str:
    dot = (
        "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    qq = (
        "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * qv[i]),"
        " (acc, x) -> acc + x)"
    )
    cc = (
        "list_reduce(list_transform(range(1, len(cv)+1), i -> cv[i] * cv[i]),"
        " (acc, x) -> acc + x)"
    )
    sim = sql_round_half_away(f"({dot} / sqrt({qq} * {cc}))", 4)
    return f"""
WITH q AS (
    SELECT vec_id AS qid, label AS qlabel,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
    SELECT vec_id AS cid, label AS clabel,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings
),
pairs AS (
    SELECT qid, qlabel, cid, clabel, {sim} AS cosine_sim
    FROM q CROSS JOIN c
    WHERE clabel != qlabel
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cosine_sim DESC, cid ASC) AS rank
    FROM pairs
)
SELECT qid, qlabel AS anchor_label, cid, clabel AS negative_label,
       cosine_sim, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {HN_K}
"""


# --- product quantization ----------------------------------------------------


def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-5 neighbors for every 97th vector (see
    :mod:`..operators.pq` for the scale design: bounded per-subspace
    codebooks, one-scan encode, constant-table ADC fan-out, salted
    two-phase rank).  ``adc`` is the asymmetric distance, rounded to
    4 dp for the cross-engine hash; ranking uses the RAW double (bit-
    identical both engines — every fold is fixed-order IEEE) with
    vec_id tie-break."""
    from ..functions.rounding import round_half_away
    from ..operators import pq as PQ
    from ..operators.clustering import _as_double_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = parallelized(spark, _as_double_vectors(emb, "vec_id", "embedding"))
    books = PQ.train_codebooks(vecs)
    queries = sorted(
        (int(r["vec_id"]), list(r["v"]))
        for r in vecs.where(F.col("vec_id") % 97 == 0).collect()
    )
    out = PQ.adc_topk(vecs, queries, books)
    return out.select(
        "qid", "rank", "vec_id", round_half_away(F.col("adc"), 4).alias("adc")
    )


def oracle_pq_ann_topk() -> str:
    from ..operators.pq import CODES, SUBDIM, SUBSPACES, TOPK

    def dist(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {SUBDIM + 1}), i ->"
            f" ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
        )

    return f"""
WITH vecs AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
sub AS (
    SELECT vec_id, g.s,
           list_slice(v, (g.s - 1) * {SUBDIM} + 1, g.s * {SUBDIM}) AS sv
    FROM vecs CROSS JOIN generate_series(1, {SUBSPACES}) g(s)
),
seed AS (SELECT s, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {CODES}),
a1 AS (
    SELECT vec_id, s, sv, cid,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, cid) AS rn
    FROM (SELECT x.vec_id, x.s, x.sv, c.cid, {dist('x.sv', 'c.cv')} AS dist
          FROM sub x JOIN seed c ON c.s = x.s)
),
cent AS (
    SELECT s, cid, pos,
           CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS c
    FROM (SELECT s, cid, unnest(sv) AS x,
                 unnest(range(0, len(sv))) AS pos
          FROM a1 WHERE rn = 1)
    GROUP BY 1, 2, 3
),
cb AS (SELECT s, cid, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1, 2),
enc AS (
    SELECT vec_id, s, cid AS code FROM (
        SELECT x.vec_id, x.s, c.cid,
               row_number() OVER (PARTITION BY x.vec_id, x.s
                                  ORDER BY {dist('x.sv', 'c.cv')}, c.cid) AS rn
        FROM sub x JOIN cb c ON c.s = x.s)
    WHERE rn = 1
),
q AS (SELECT vec_id AS qid, s, sv AS qv FROM sub WHERE vec_id % 97 = 0),
dt AS (
    SELECT qid, q.s, c.cid, {dist('q.qv', 'c.cv')} AS d
    FROM q JOIN cb c ON c.s = q.s
),
scored AS (
    SELECT t.qid, e.vec_id,
           list_reduce(list(t.d ORDER BY t.s), (acc, x) -> acc + x) AS adc
    FROM enc e JOIN dt t ON t.s = e.s AND t.cid = e.code
    GROUP BY t.qid, e.vec_id
),
ranked AS (
    SELECT qid, vec_id, adc,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc, vec_id) AS rank
    FROM scored WHERE vec_id <> qid
)
SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
       {sql_round_half_away('adc', 4)} AS adc
FROM ranked WHERE rank <= {TOPK}
"""


# --- IVFADC -----------------------------------------------------------------

IVFADC_QMOD = 89


def q_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC approximate top-5 for every 89th vector: coarse cells
    (the deterministic :func:`similarity.centroids` set), residual PQ
    codes, nprobe=2 probe join — see :func:`..operators.pq.ivfadc_topk`
    for the composed pruning story."""
    from ..functions.rounding import round_half_away
    from ..operators import pq as PQ
    from ..operators.clustering import _as_double_vectors
    from ..operators.similarity import centroids

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = parallelized(spark, _as_double_vectors(emb, "vec_id", "embedding"))
    queries = sorted(
        (int(r["vec_id"]), list(r["v"]))
        for r in vecs.where(F.col("vec_id") % IVFADC_QMOD == 0).collect()
    )
    out = PQ.ivfadc_topk(vecs, queries, centroids())
    return out.select(
        "qid", "rank", "vec_id", round_half_away(F.col("adc"), 4).alias("adc")
    )


def oracle_ivfadc_topk() -> str:
    from ..operators.pq import CODES, NPROBE, SUBDIM, SUBSPACES, TOPK
    from ..operators.similarity import DIM, centroids

    cells = ", ".join(
        "({}, [{}])".format(c, ", ".join(repr(x) for x in vec))
        for c, vec in enumerate(centroids())
    )

    def dist(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {SUBDIM + 1}), i ->"
            f" ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
        )

    return f"""
WITH vecs AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
cells(cell, w) AS (VALUES {cells}),
crank AS (
    SELECT e.vec_id, e.v, c.cell, c.w,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_dot('e.v', 'c.w')} DESC,
                                       c.cell ASC) AS rn
    FROM vecs e CROSS JOIN cells c
),
resid AS (
    SELECT vec_id, cell,
           list_transform(range(1, {DIM + 1}), i -> v[i] - w[i]) AS v
    FROM crank WHERE rn = 1
),
sub AS (
    SELECT vec_id, cell, g.s,
           list_slice(v, (g.s - 1) * {SUBDIM} + 1, g.s * {SUBDIM}) AS sv
    FROM resid CROSS JOIN generate_series(1, {SUBSPACES}) g(s)
),
seed AS (SELECT s, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {CODES}),
a1 AS (
    SELECT vec_id, s, sv, cid,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, cid) AS rn
    FROM (SELECT x.vec_id, x.s, x.sv, c.cid, {dist('x.sv', 'c.cv')} AS dist
          FROM sub x JOIN seed c ON c.s = x.s)
),
cent AS (
    SELECT s, cid, pos,
           CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS c
    FROM (SELECT s, cid, unnest(sv) AS x,
                 unnest(range(0, len(sv))) AS pos
          FROM a1 WHERE rn = 1)
    GROUP BY 1, 2, 3
),
cb AS (SELECT s, cid, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1, 2),
enc AS (
    SELECT vec_id, cell, s, cid AS code FROM (
        SELECT x.vec_id, x.cell, x.s, c.cid,
               row_number() OVER (PARTITION BY x.vec_id, x.s
                                  ORDER BY {dist('x.sv', 'c.cv')}, c.cid) AS rn
        FROM sub x JOIN cb c ON c.s = x.s)
    WHERE rn = 1
),
qprobe AS (
    SELECT e.vec_id AS qid, c.cell,
           list_transform(range(1, {DIM + 1}), i -> e.v[i] - c.w[i]) AS rq,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_dot('e.v', 'c.w')} DESC,
                                       c.cell ASC) AS pr
    FROM vecs e CROSS JOIN cells c
    WHERE e.vec_id % {IVFADC_QMOD} = 0
),
qsub AS (
    SELECT qid, cell, g.s,
           list_slice(rq, (g.s - 1) * {SUBDIM} + 1, g.s * {SUBDIM}) AS qv
    FROM (SELECT * FROM qprobe WHERE pr <= {NPROBE})
    CROSS JOIN generate_series(1, {SUBSPACES}) g(s)
),
dt AS (
    SELECT q.qid, q.cell, q.s, c.cid, {dist('q.qv', 'c.cv')} AS d
    FROM qsub q JOIN cb c ON c.s = q.s
),
scored AS (
    SELECT t.qid, e.vec_id,
           list_reduce(list(t.d ORDER BY t.s), (acc, x) -> acc + x) AS adc
    FROM enc e JOIN dt t
      ON t.cell = e.cell AND t.s = e.s AND t.cid = e.code
    WHERE e.vec_id <> t.qid
    GROUP BY t.qid, e.vec_id
),
ranked AS (
    SELECT qid, vec_id, adc,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc, vec_id) AS rank
    FROM scored
)
SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
       {sql_round_half_away('adc', 4)} AS adc
FROM ranked WHERE rank <= {TOPK}
"""


# --- IVF index maintenance under upserts --------------------------------------

#: delta composition: vec_id % IDX_NEW_MOD == 0 arrives NEW (absent from
#: the base index); vec_id % IDX_UPD_MOD == 1 is UPDATED in place with a
#: deterministically mutated vector (element order reversed — both
#: engines reverse identically).  The two classes are disjoint.
IDX_NEW_MOD = 5
IDX_UPD_MOD = 10


def _maintained_ivf_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> dict[str, int]:
    """Build the base IVF index, then maintain it with one delta batch
    through :func:`..sinks.upsert.upsert_partitioned_moving`.

    The 100 TB contract: the delta's assignment cost is ∝ |delta| (only
    delta vectors are scored against the FROZEN coarse centroids — no
    retrain, no corpus rescan), and the index rewrite touches only the
    old ∪ new cells of the batch.  An updated vector that re-assigns to
    a different cell is evicted from its old cell partition, so the
    maintained index equals a full rebuild (pinned in
    tests/test_scale_plans.py::test_ivf_index_maintenance_equals_rebuild).
    """
    from ..operators.similarity import ivf_assign

    base, delta = _ivf_base_delta(spark, sf_dir)
    idx0 = ivf_assign(base, "cv", nprobe=1).select("cid", "cv", "cell")
    idx0.write.mode("overwrite").partitionBy("cell").parquet(index_path)

    didx = ivf_assign(delta, "cv", nprobe=1).select("cid", "cv", "cell")
    from ..sinks.upsert import upsert_partitioned_moving

    return upsert_partitioned_moving(
        spark, index_path, didx, keys=["cid"], partition_col="cell"
    )


def _ivf_base_delta(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The shared (standing corpus, delta batch) split — module-level
    so the plan audit inspects the same delta-assignment frame the
    maintenance executes (`audit_frames`)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    base = emb.where(F.col("cid") % IDX_NEW_MOD != 0)
    delta = emb.where(F.col("cid") % IDX_NEW_MOD == 0).unionByName(
        base.where(F.col("cid") % IDX_UPD_MOD == 1).select(
            "cid", F.reverse(F.col("cv")).alias("cv")
        )
    )
    return base, delta


def ivf_index_search(
    spark: SparkSession, index_path: str, nprobe: int = 2, k: int = TOP_K
) -> DataFrame:
    """IVF top-k over the MAINTAINED index table: the corpus side's
    cell assignment is read back from the store (never recomputed);
    only the <= N_QUERIES probe vectors are scored against centroids."""
    from ..functions.rounding import round_half_away
    from ..operators.similarity import _dot, ivf_assign
    from pyspark.sql import Window

    index = spark.read.parquet(index_path).select("cid", "cv", "cell")
    queries = index.where(F.col("cid") < N_QUERIES).select(
        F.col("cid").alias("qid"), F.col("cv").alias("qv")
    )
    q_probes = ivf_assign(queries, "qv", nprobe=nprobe).select(
        "qid", "qv", "cell"
    )
    pairs = index.join(F.broadcast(q_probes), "cell").where(
        F.col("qid") != F.col("cid")
    )
    qq = _dot(F.col("qv"), F.col("qv"))
    cc = _dot(F.col("cv"), F.col("cv"))
    sim = round_half_away(_dot(F.col("qv"), F.col("cv")) / F.sqrt(qq * cc), 4)
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine_sim").desc(), F.col("cid").asc()
    )
    return (
        pairs.withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine_sim", "rank")
    )


def q_ivf_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index maintenance under upserts, end-to-end: base index →
    delta batch (new + mutated vectors) maintained via the move-aware
    partitioned MERGE → IVF search over the maintained store.  The
    oracle searches a FULL REBUILD of the merged corpus, so the driver
    hash proves maintenance ≡ rebuild — stale rows in a moved key's old
    cell or a missed eviction fail the hash, not just a pytest."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        index_path = f"{base}/index"
        _maintained_ivf_index(spark, sf_dir, index_path)
        out = ivf_index_search(spark, index_path).orderBy("qid", "rank")
        # teardown survival: cut lineage (localCheckpoint) so the result
        # blocks outlive the tempdir rmtree -- never a per-row driver
        # collect (VERDICT r10 ask #1)
        return materialize(out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def oracle_ivf_index_upsert() -> str:
    from ..operators.similarity import centroids

    cells = ", ".join(
        "({}, [{}])".format(c, ", ".join(repr(x) for x in vec))
        for c, vec in enumerate(centroids())
    )
    cell_sim = _sql_dot("e.v", "w.w")
    dot = _sql_dot("q.qv", "c.cv")
    qq, cc = _sql_dot("q.qv", "q.qv"), _sql_dot("c.cv", "c.cv")
    sim = sql_round_half_away(f"({dot} / sqrt({qq} * {cc}))", 4)
    return f"""
WITH cells(cell, w) AS (VALUES {cells}),
emb AS (
    SELECT vec_id,
           CASE WHEN vec_id % {IDX_UPD_MOD} = 1
                THEN list_reverse(embedding) ELSE embedding END AS v
    FROM embeddings
),
scored AS (
    SELECT e.vec_id, e.v, w.cell, {cell_sim} AS cell_sim
    FROM emb e CROSS JOIN (SELECT cell, w FROM cells) w
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cell_sim DESC, cell ASC) AS cell_rank
    FROM scored
),
c AS (SELECT vec_id AS cid, v AS cv, cell FROM ranked WHERE cell_rank = 1),
q AS (SELECT vec_id AS qid, v AS qv, cell FROM ranked
      WHERE cell_rank <= 2 AND vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.qid, c.cid, {sim} AS cosine_sim
    FROM q JOIN c USING (cell)
    WHERE q.qid != c.cid
),
rk AS (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cosine_sim DESC, cid ASC) AS rank
    FROM pairs
)
SELECT qid, cid, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {TOP_K}
"""


# --- IVF index re-cluster compaction under drift -------------------------------


def _index_cell_means(spark: SparkSession, index_path: str) -> DataFrame:
    """(cell, i, mu): exact-decimal per-cell component means of the
    MAINTAINED index rows only — the Lloyd-round centroid update reads
    the index, never the raw corpus.  Components quantize at 1e-6 as
    scaled LONGs (the operators/pca.py formula), sum as exact DECIMAL
    (order-free), and close in one double division rounded to 9 dp —
    bit-identical in any engine evaluating the same text."""
    idx = spark.read.parquet(index_path).select("cell", "cv")
    vd = F.col("vf").cast("double")
    w = F.floor(F.abs(vd) * F.lit(1000000.0) + F.lit(0.5)) * F.when(
        vd < 0, F.lit(-1)
    ).otherwise(F.lit(1))
    flat = idx.select(
        "cell", F.posexplode("cv").alias("pos", "vf")
    ).select("cell", (F.col("pos") + 1).alias("i"), w.cast("long").alias("w"))
    return flat.groupBy("cell", "i").agg(
        round_half_away(
            F.sum(F.col("w").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0),
            9,
        ).alias("mu")
    )


def q_ivf_index_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index COMPACTION under drift (round-10 wave 2, VERDICT r9
    ask #4c): after upserts shift the vector distribution
    (`_maintained_ivf_index`'s new + mutated delta), one deterministic
    Lloyd round recomputes each cell's centroid as the exact-decimal
    mean of its CURRENT members — read from the index, no raw rescan —
    then reassigns only the vectors whose argmax cell changed, moved
    through the move-aware partitioned MERGE (rewrite touches old ∪ new
    cells only).  Output is the full (cid, cell, moved) assignment read
    back from the re-clustered STORE, so the driver hash adjudicates
    the physical index state: a stale row surviving in a moved key's
    old cell partition, a missed eviction, or a drifted centroid all
    fail the hash.

    The oracle rebuilds from scratch: merged corpus → frozen-centroid
    assignment → the same decimal means → the same fold-text
    reassignment, so re-clustered-in-place ≡ rebuilt-at-new-centroids.

    Scale shape: the centroid update is ONE map-side-combined aggregate
    over the index (N_CELLS·DIM output rows, 512 here — the only
    collect); reassignment scores each index row against broadcast
    literal centroids row-locally; the MERGE's write cost follows the
    DRIFT (moved rows' cells), not the index size."""
    import shutil
    import tempfile

    from ..operators.similarity import DIM, N_CELLS, centroids, ivf_assign
    from ..sinks.upsert import upsert_partitioned_moving

    base = tempfile.mkdtemp(prefix="ivf_recl_")
    try:
        index_path = f"{base}/index"
        _maintained_ivf_index(spark, sf_dir, index_path)
        # pin the pre-recluster state: the store mutates below, and a
        # lazy re-read would silently re-derive cell_before from the
        # POST-merge files
        pre = spark.read.parquet(index_path).select(
            "cid", "cv", F.col("cell").cast("int").alias("cell_before")
        ).localCheckpoint()

        got = {
            (r["cell"], r["i"]): r["mu"]
            for r in _index_cell_means(spark, index_path).collect()
        }
        new_cells = []
        for cell in range(N_CELLS):
            if (cell, 1) in got:
                new_cells.append([got[(cell, i)] for i in range(1, DIM + 1)])
            else:  # drained cell: keep its frozen centroid
                new_cells.append(centroids()[cell])

        re_assigned = ivf_assign(
            pre.select("cid", "cv"), "cv", cells=new_cells, nprobe=1
        ).select("cid", "cv", "cell")
        moved_delta = (
            re_assigned.join(pre.select("cid", "cell_before"), "cid")
            .where(F.col("cell") != F.col("cell_before"))
            .select("cid", "cv", "cell")
            .localCheckpoint()
        )
        upsert_partitioned_moving(
            spark, index_path, moved_delta, keys=["cid"],
            partition_col="cell",
        )
        after = spark.read.parquet(index_path).select(
            "cid", F.col("cell").cast("long").alias("cell")
        )
        out = after.join(pre.select("cid", "cell_before"), "cid").select(
            "cid",
            "cell",
            (F.col("cell") != F.col("cell_before")).cast("int").alias(
                "moved"
            ),
        )
        # teardown survival: cut lineage (localCheckpoint) so the result
        # blocks outlive the tempdir rmtree -- never a per-row driver
        # collect (VERDICT r10 ask #1)
        return materialize(out)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def oracle_ivf_index_recluster() -> str:
    from ..operators.similarity import DIM, N_CELLS, centroids

    cells = ", ".join(
        "({}, [{}])".format(c, ", ".join(repr(x) for x in vec))
        for c, vec in enumerate(centroids())
    )
    sim0 = _sql_dot("e.v", "w.w")
    sim1 = _sql_dot("e.v", "n.w")
    mu = sql_round_half_away(
        "CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE) / 1000000.0",
        9,
    )
    return f"""
WITH cells(cell, w) AS (VALUES {cells}),
emb AS (
    SELECT vec_id,
           CASE WHEN vec_id % {IDX_UPD_MOD} = 1
                THEN list_reverse(embedding) ELSE embedding END AS v
    FROM embeddings
),
scored0 AS (
    SELECT e.vec_id, e.v, w.cell, {sim0} AS cell_sim
    FROM emb e CROSS JOIN cells w
),
a0 AS (
    SELECT vec_id, v, cell AS cell_before FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cell_sim DESC, cell ASC) AS rk
        FROM scored0
    ) WHERE rk = 1
),
flat AS (
    SELECT cell_before AS cell, i,
           CAST(floor(abs(CAST(v[i] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
             * (CASE WHEN CAST(v[i] AS DOUBLE) < 0 THEN -1 ELSE 1 END) AS w
    FROM a0, unnest(generate_series(1, len(v))) AS u(i)
),
means AS (
    SELECT cell, i, {mu} AS mu FROM flat GROUP BY 1, 2
),
grid AS (
    SELECT c.cell, gi.i
    FROM (SELECT unnest(range(0, {N_CELLS})) AS cell) c
    CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS i) gi
),
comps AS (
    SELECT g.cell, g.i, COALESCE(m.mu, fc.w[g.i]) AS mu
    FROM grid g
    LEFT JOIN means m ON m.cell = g.cell AND m.i = g.i
    JOIN cells fc ON fc.cell = g.cell
),
newc AS (SELECT cell, list(mu ORDER BY i) AS w FROM comps GROUP BY cell),
scored1 AS (
    SELECT e.vec_id, e.cell_before, n.cell, {sim1} AS cell_sim
    FROM a0 e CROSS JOIN newc n
),
a1 AS (
    SELECT vec_id, cell_before, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cell_sim DESC, cell ASC) AS rk
        FROM scored1
    ) WHERE rk = 1
)
SELECT vec_id AS cid, CAST(cell AS BIGINT) AS cell,
       CAST(cell <> cell_before AS INT) AS moved
FROM a1
"""


# --- MMR diversification rerank ------------------------------------------------

MMR_LAMBDA_SQL = "CAST(0.7 AS DECIMAL(2,1))"
MMR_ONE_MINUS_SQL = "CAST(0.3 AS DECIMAL(2,1))"
MMR_CAND = 12
MMR_K = 5


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    per query, greedily select ``MMR_K`` of the top-``MMR_CAND``
    candidates maximizing lambda*sim(q,d) - (1-lambda)*max sim(d,
    selected) — the diversification pass retrieval stacks run after ANN.

    Determinism across engines is the interesting part: a greedy argmax
    chain amplifies any float divergence (one flipped pick rewrites
    every later step), so candidate and pairwise cosines are rounded to
    9 dp ONCE and carried as exact DECIMAL — every score, subtraction
    and max after that is integer-exact arithmetic both engines agree
    on bit-for-bit, and ties break on the lower cid.

    Scale shape: candidates per query are bounded (the ANN stage's
    top-k), so the pairwise table is <= CAND^2 rows per query and each
    greedy step is one bounded groupBy — no per-query windows over the
    corpus, no driver collect."""
    from ..functions.rounding import round_half_away

    queries, corpus = _emb_frames(spark, sf_dir)
    from pyspark.sql import Window

    from ..operators.similarity import _dot

    qq = _dot(F.col("qv"), F.col("qv"))
    cc = _dot(F.col("cv"), F.col("cv"))
    sim = _dot(F.col("qv"), F.col("cv")) / F.sqrt(qq * cc)
    scored = (
        queries.crossJoin(corpus)
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            "cv",
            round_half_away(sim, 9).cast("decimal(28,9)").alias("sq"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sq").desc(), F.col("cid").asc())
    cand = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= MMR_CAND)
        .drop("rnk")
    )
    from ..operators.materialize import materialize

    cand = materialize(cand)

    a = cand.select("qid", F.col("cid").alias("a"), F.col("cv").alias("va"))
    b = cand.select("qid", F.col("cid").alias("b"), F.col("cv").alias("vb"))
    psim = (
        _dot(F.col("va"), F.col("vb"))
        / F.sqrt(_dot(F.col("va"), F.col("va")) * _dot(F.col("vb"), F.col("vb")))
    )
    pairs = materialize(
        a.join(b, "qid")
        .where(F.col("a") != F.col("b"))
        .select(
            "qid", "a", "b",
            round_half_away(psim, 9).cast("decimal(28,9)").alias("sab"),
        )
    )

    lam = F.expr(MMR_LAMBDA_SQL)
    om = F.expr(MMR_ONE_MINUS_SQL)
    state = cand.select(
        "qid", "cid", "sq", F.lit(0).cast("decimal(28,9)").alias("m")
    )
    picks = []
    for step in range(1, MMR_K + 1):
        score = (lam * F.col("sq") - om * F.col("m")).alias("score")
        ranked = state.select("qid", "cid", "sq", "m", score)
        pick = (
            ranked.groupBy("qid")
            .agg(F.max(F.struct(F.col("score"), (-F.col("cid")).alias("nc"))).alias("t"))
            .select(
                "qid",
                (-F.col("t.nc")).alias("p_cid"),
                F.col("t.score").alias("p_score"),
            )
        )
        picks.append(
            pick.select(
                "qid",
                F.lit(step).alias("step"),
                F.col("p_cid").alias("cid"),
                F.col("p_score").alias("score"),
            )
        )
        if step == MMR_K:
            break
        state = (
            state.join(pick, "qid")
            .where(F.col("cid") != F.col("p_cid"))
            .join(
                pairs.select(
                    "qid", F.col("a").alias("p_cid"), F.col("b").alias("cid"), "sab"
                ),
                ["qid", "p_cid", "cid"],
            )
            .select(
                "qid", "cid", "sq",
                F.greatest(F.col("m"), F.col("sab")).alias("m"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        "qid",
        F.col("step").cast("int").alias("step"),
        "cid",
        round_half_away(F.col("score").cast("double"), 6).alias("mmr_score"),
    )


def oracle_mmr_rerank() -> str:
    dot_q = _sql_dot("q.qv", "c.cv")
    sim_q = (
        f"({dot_q} / sqrt({_sql_dot('q.qv', 'q.qv')} * {_sql_dot('c.cv', 'c.cv')}))"
    )
    dot_p = _sql_dot("x.cv", "y.cv")
    sim_p = (
        f"({dot_p} / sqrt({_sql_dot('x.cv', 'x.cv')} * {_sql_dot('y.cv', 'y.cv')}))"
    )
    r9q = sql_round_half_away(sim_q, 9)
    r9p = sql_round_half_away(sim_p, 9)
    lam, om = MMR_LAMBDA_SQL, MMR_ONE_MINUS_SQL

    stages = []
    for i in range(1, MMR_K + 1):
        prev = f"st{i - 1}"
        stages.append(f"""
p{i} AS (
    SELECT qid, cid AS p_cid, score AS p_score FROM (
        SELECT qid, cid, {lam} * sq - {om} * m AS score,
               row_number() OVER (PARTITION BY qid
                   ORDER BY {lam} * sq - {om} * m DESC, cid ASC) AS rn
        FROM {prev}
    ) WHERE rn = 1
)""")
        if i < MMR_K:
            stages.append(f"""
st{i} AS (
    SELECT s.qid, s.cid, s.sq, greatest(s.m, pr.sab) AS m
    FROM {prev} s
    JOIN p{i} p ON p.qid = s.qid AND s.cid != p.p_cid
    JOIN pairs pr ON pr.qid = s.qid AND pr.a = p.p_cid AND pr.b = s.cid
)""")
    unions = "\nUNION ALL ".join(
        f"SELECT qid, {i} AS step, p_cid AS cid, p_score FROM p{i}"
        for i in range(1, MMR_K + 1)
    )
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
scored AS (
    SELECT q.qid, c.cid, c.cv, CAST({r9q} AS DECIMAL(28,9)) AS sq
    FROM q CROSS JOIN c WHERE q.qid != c.cid
),
cand AS (
    SELECT qid, cid, cv, sq FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY sq DESC, cid ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {MMR_CAND}
),
pairs AS (
    SELECT x.qid, x.cid AS a, y.cid AS b,
           CAST({r9p} AS DECIMAL(28,9)) AS sab
    FROM cand x JOIN cand y ON x.qid = y.qid AND x.cid != y.cid
),
st0 AS (SELECT qid, cid, sq, CAST(0 AS DECIMAL(28,9)) AS m FROM cand),
{",".join(stages)},
sel AS ({unions})
SELECT qid, CAST(step AS INT) AS step, cid,
       {sql_round_half_away("CAST(p_score AS DOUBLE)", 6)} AS mmr_score
FROM sel
"""


# --- embedding drift monitor (round 11) -------------------------------------


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor (round-11 wave 5): the ml-ops
    check a training pipeline runs before trusting a new crawl batch —
    freeze a reference centroid on vec-id deciles 0-2, then per decile
    report the cohort size and the cosine of its exact-decimal centroid
    against the frozen one.  A decile whose cosine sags is a
    distribution shift in the vector column (new domain, encoder
    regression, pipeline bug) caught BEFORE a 100 TB tokenize/index
    job consumes it.

    Determinism end-to-end: components quantize at 1e-6 as scaled longs
    (the shared pca/ivf formula), per-(decile, dim) means close as
    exact DECIMAL sums (order-free) rounded to 9 dp, the cosine's dot
    and norms re-quantize those means at 1e-9 and accumulate as exact
    DECIMAL(38,0) products, and the single double division + IEEE sqrt
    at the end are correctly rounded on identical operands in both
    engines — no libm beyond sqrt.

    Scale shape: one posexplode scan + two map-side-combined aggregates
    (per-decile-dim, then per-decile over <= 10*DIM mean rows); the
    frozen centroid is the same aggregate over three deciles.  Nothing
    is ever collected."""
    from ..operators.materialize import materialize

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    dec = (F.col("vec_id") % 10).cast("int").alias("decile")
    vd = F.col("vf").cast("double")
    w = F.floor(F.abs(vd) * F.lit(1000000.0) + F.lit(0.5)) * F.when(
        vd < 0, F.lit(-1)
    ).otherwise(F.lit(1))
    flat = emb.select(
        dec, F.posexplode("embedding").alias("pos", "vf")
    ).select("decile", (F.col("pos") + 1).alias("i"), w.cast("long").alias("w"))

    def mean_by(df, keys):
        return df.groupBy(*keys).agg(
            round_half_away(
                F.sum(F.col("w").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1000000.0),
                9,
            ).alias("mu")
        )

    per_dec = mean_by(flat, ["decile", "i"])
    frozen = mean_by(
        flat.where(F.col("decile") <= 2).drop("decile"), ["i"]
    ).select("i", F.col("mu").alias("mu0"))

    def q9(c):
        return (
            F.floor(F.abs(c) * F.lit(1000000000.0) + F.lit(0.5))
            * F.when(c < 0, F.lit(-1)).otherwise(F.lit(1))
        ).cast("decimal(38,0)")

    j = per_dec.join(F.broadcast(frozen), "i").select(
        "decile",
        (q9(F.col("mu0")) * q9(F.col("mu"))).alias("xy"),
        (q9(F.col("mu0")) * q9(F.col("mu0"))).alias("xx"),
        (q9(F.col("mu")) * q9(F.col("mu"))).alias("yy"),
    )
    sums = j.groupBy("decile").agg(
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
        F.sum("yy").alias("syy"),
    )
    counts = emb.select(dec).groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    cos = F.col("sxy").cast("double") / F.sqrt(
        F.col("sxx").cast("double") * F.col("syy").cast("double")
    )
    out = (
        sums.join(counts, "decile")
        .select(
            "decile",
            "n_vecs",
            round_half_away(cos, 6).alias("cos_vs_frozen"),
        )
        .orderBy("decile")
    )
    return materialize(out)


def oracle_embedding_drift() -> str:
    mu = sql_round_half_away(
        "CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE) / 1000000.0",
        9,
    )
    q9 = (
        "CAST(CAST(floor(abs({c}) * 1000000000.0 + 0.5) AS BIGINT)"
        " * (CASE WHEN {c} < 0 THEN -1 ELSE 1 END) AS DECIMAL(38,0))"
    )
    cos = (
        "CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE)"
        " * CAST(syy AS DOUBLE))"
    )
    return f"""
WITH flat AS (
    SELECT CAST(vec_id % 10 AS INTEGER) AS decile, u.i,
           CAST(floor(abs(CAST(embedding[i] AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT)
           * (CASE WHEN CAST(embedding[i] AS DOUBLE) < 0 THEN -1 ELSE 1 END)
               AS w
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
),
per_dec AS (
    SELECT decile, i, {mu} AS mu FROM flat GROUP BY decile, i
),
frozen AS (
    SELECT i, {mu} AS mu0 FROM flat WHERE decile <= 2 GROUP BY i
),
j AS (
    SELECT decile,
           {q9.format(c='mu0')} * {q9.format(c='mu')} AS xy,
           {q9.format(c='mu0')} * {q9.format(c='mu0')} AS xx,
           {q9.format(c='mu')} * {q9.format(c='mu')} AS yy
    FROM per_dec JOIN frozen USING (i)
),
sums AS (
    SELECT decile, SUM(xy) AS sxy, SUM(xx) AS sxx, SUM(yy) AS syy
    FROM j GROUP BY decile
),
counts AS (
    SELECT CAST(vec_id % 10 AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM embeddings GROUP BY 1
)
SELECT decile, n_vecs, {sql_round_half_away(cos, 6)} AS cos_vs_frozen
FROM sums JOIN counts USING (decile)
ORDER BY decile
"""


def af_ivf_index_upsert(
    spark: SparkSession, sf_dir: str, scratch: str
) -> dict[str, DataFrame]:
    """Interior frames for the plan audit (`audit_frames`): the
    delta-only assignment (frozen centroids, cost ∝ |delta|) and the
    IVF search over the maintained store."""
    from ..operators.similarity import ivf_assign

    index_path = f"{scratch}/index"
    _maintained_ivf_index(spark, sf_dir, index_path)
    _base, delta = _ivf_base_delta(spark, sf_dir)
    didx = ivf_assign(delta, "cv", nprobe=1).select("cid", "cv", "cell")
    return {
        "delta_assign": didx,
        "search": ivf_index_search(spark, index_path),
    }
