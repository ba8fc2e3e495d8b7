"""Product quantization (PQ) for billion-scale approximate NN search.

Brute-force cosine/L2 top-k (``similarity.cosine_topk``) reads every
float of every vector per query; IVF (``similarity.ivf_topk``) prunes
which vectors are read but not how much of each.  PQ attacks the other
axis: each vector is compressed to S small codes (here 4 codes of 4
bits' worth — 16 centroids per subspace), and query-time distance is a
few table lookups per vector instead of a 64-dim float walk.  At
10^9+ vectors this is the difference between scanning 256 GB of floats
and 4 GB of codes — the standard memory-bound regime trick (Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011; the IVFADC pipeline composes this with our IVF).

Spark-first layout:

* **train**: per subspace, the same bounded Lloyd machinery as
  :mod:`clustering` (seed = ``vec_id < CODES``, one exact-decimal
  centroid update) — driver holds S x CODES x SUBDIM doubles, the same
  "bounded like a broadcast build side" contract as k-means centroids.
* **encode**: ONE narrow scan; all S argmin folds are constant-array
  higher-order expressions (zero exchanges, codegen'd).
* **ADC search**: the per-query distance tables (S x CODES doubles per
  query) are computed driver-side in plain left-fold IEEE arithmetic
  and embedded as one constant array-of-structs; the scan explodes it
  per row — map-side fan-out, no shuffle until the salted top-k rank.
  Distance = dt0[c0] + dt1[c1] + dt2[c2] + dt3[c3] in fixed left
  order, so every value is bit-identical to the DuckDB oracle's
  ordered ``list_reduce``.

Asymmetric (query stays uncompressed) — the paper's recommended
variant: only the database side pays quantization error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litconst import double_array_sql

#: 64-dim embeddings -> 4 subspaces x 16 dims, 16 centroids each
SUBSPACES = 4
SUBDIM = 16
CODES = 16
TOPK = 5
NPROBE = 2


def _sub(v: Column, s: int) -> Column:
    """Subvector of subspace ``s`` (0-based): dims [s*SUBDIM, (s+1)*SUBDIM)."""
    return F.slice(v, s * SUBDIM + 1, SUBDIM)


def train_codebooks(
    vecs: DataFrame,
) -> list[list[tuple[int, list[float]]]]:
    """One codebook per subspace: seed with ``vec_id < CODES``, one
    Lloyd assignment + exact-decimal centroid update (iterations=2 in
    the ``kmeans_assign`` counting).  Returns S driver-side lists of
    (cid, centroid) — S*CODES*SUBDIM doubles total, bounded.

    All S subspaces train in TWO jobs, not 2*S: one bounded collect for
    every subspace's seeds, then one corpus pass that assigns each row
    in all S subspaces (the same constant-array (dist, cid) struct-min
    fold as :func:`clustering.assign_to_centroids`) and feeds one
    (s, cluster, pos) decimal-mean aggregate — numerically identical to
    the per-subspace loop (measured: the loop's 8 corpus scans were the
    dominant cost of both PQ bench queries)."""
    from .clustering import CENTROID_DECIMAL

    seed_full = sorted(
        (int(r["vec_id"]), list(r["v"]))
        for r in vecs.where(F.col("vec_id") < CODES).collect()
    )
    seed_books = [
        [(cid, v[s * SUBDIM : (s + 1) * SUBDIM]) for cid, v in seed_full]
        for s in range(SUBSPACES)
    ]
    structs = [
        F.struct(
            F.lit(s).alias("s"),
            _argmin_code(F.col("v"), s, seed_books[s]).alias("cluster"),
            _sub(F.col("v"), s).alias("sv"),
        )
        for s in range(SUBSPACES)
    ]
    rows = (
        vecs.select(F.explode(F.array(*structs)).alias("a"))
        .select("a.s", "a.cluster", F.posexplode("a.sv").alias("pos", "x"))
        .groupBy("s", "cluster", "pos")
        .agg(
            (
                F.sum(F.col("x").cast(CENTROID_DECIMAL)).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .collect()
    )
    by_sub: dict[int, dict[int, dict[int, float]]] = {}
    for r in rows:
        by_sub.setdefault(r["s"], {}).setdefault(r["cluster"], {})[
            r["pos"]
        ] = r["c"]
    return [
        [
            (cid, [dims[i] for i in range(len(dims))])
            for cid, dims in sorted(by_sub.get(s, {}).items())
        ]
        for s in range(SUBSPACES)
    ]


def _argmin_code(v: Column, s: int, book: list[tuple[int, list[float]]]) -> Column:
    """Code (centroid id) of subspace ``s`` for the full vector ``v`` —
    the same constant-array (dist, cid) struct-min fold as
    ``assign_to_centroids``, inlined so all S subspaces encode in one
    scan instead of S."""
    cent = F.expr(
        "array(" + ", ".join(
            f"named_struct('cid', {int(cid)}, 'cv', {double_array_sql(cv)})"
            for cid, cv in book
        ) + ")"
    )
    sub = _sub(v, s)
    best = F.array_min(
        F.transform(
            cent,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(sub, c["cv"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ).alias("d"),
                c["cid"].alias("c"),
            ),
        )
    )
    return best["c"]


def pq_encode(
    vecs: DataFrame, books: list[list[tuple[int, list[float]]]]
) -> DataFrame:
    """(vec_id, code0..code{S-1}): one narrow pass, zero exchanges."""
    return vecs.select(
        "vec_id",
        *[
            _argmin_code(F.col("v"), s, books[s]).alias(f"code{s}")
            for s in range(SUBSPACES)
        ],
    )


def _adc_tables(
    queries: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
) -> str:
    """Constant array-of-structs SQL: one struct per query holding its S
    dense distance tables (indexed by cid; cids whose cluster emptied
    never occur as codes, their slots hold +1e30).  Driver-side floats
    ARE IEEE doubles and the fold is the same left-to-right
    (q[i]-c[i])^2 accumulation as the SQL/oracle folds — bit-equal."""
    structs = []
    for qid, qv in queries:
        fields = [f"'qid', CAST({int(qid)} AS BIGINT)"]
        for s, book in enumerate(books):
            qs = qv[s * SUBDIM : (s + 1) * SUBDIM]
            table = [1e30] * CODES
            for cid, cv in book:
                acc = 0.0
                for x, y in zip(qs, cv):
                    acc += (x - y) * (x - y)
                table[cid] = acc
            fields.append(f"'dt{s}', {double_array_sql(table)}")
        structs.append("named_struct(" + ", ".join(fields) + ")")
    return "array(" + ",\n ".join(structs) + ")"


def adc_topk(
    vecs: DataFrame,
    queries: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    k: int = TOPK,
) -> DataFrame:
    """(qid, rank, vec_id, adc): asymmetric-distance top-k per query.

    Scale shape: encode scan -> explode the constant per-query table
    array (|queries| bounded, map-side fan-out) -> 4 element_at adds ->
    salted two-phase per-query rank (operators/ranks.grouped_topk) —
    no per-query single task, no shuffle before the rank's first
    salted phase."""
    from .ranks import grouped_topk

    enc = pq_encode(vecs, books)
    qconst = F.expr(_adc_tables(queries, books))
    fanned = enc.select(
        "vec_id", *[f"code{s}" for s in range(SUBSPACES)],
        F.explode(qconst).alias("q"),
    ).select(
        F.col("q")["qid"].alias("qid"),
        "vec_id",
        *[f"code{s}" for s in range(SUBSPACES)],
        *[F.col("q")[f"dt{s}"].alias(f"dt{s}") for s in range(SUBSPACES)],
    )
    return _rank_adc(fanned, k)


def _rank_adc(cand: DataFrame, k: int) -> DataFrame:
    """(qid, rank, vec_id, adc) from candidate rows carrying codes +
    per-query tables: 4 ``element_at`` adds in fixed left order, self
    pairs dropped, salted two-phase per-query rank."""
    from .ranks import grouped_topk

    adc = F.element_at("dt0", F.col("code0").cast("int") + 1)
    for s in range(1, SUBSPACES):
        adc = adc + F.element_at(f"dt{s}", F.col(f"code{s}").cast("int") + 1)
    scored = cand.select(
        "qid", "vec_id", adc.alias("adc")
    ).where(F.col("vec_id") != F.col("qid"))
    return grouped_topk(
        scored, ["qid"], [("adc", False), ("vec_id", False)], k, "vec_id"
    ).select("qid", "rank", "vec_id", "adc")


# --- IVFADC: coarse quantizer + residual PQ ---------------------------------


def coarse_residuals(
    vecs: DataFrame, cells: list[list[float]]
) -> DataFrame:
    """(vec_id, cell, v): each vector's nearest coarse cell (same
    deterministic dot-product rank as :func:`similarity.ivf_assign`,
    ties to the lower cell id) and its residual v - centroid[cell].
    One narrow scan + the per-vector rank; the residual lookup is
    ``element_at`` into one constant matrix — no join."""
    from ..functions.litconst import double_matrix_sql
    from .similarity import ivf_assign

    assigned = ivf_assign(vecs, "v", cells=cells, nprobe=1).select(
        "vec_id", "v", "cell"
    )
    w = F.element_at(F.expr(double_matrix_sql(cells)), F.col("cell") + 1)
    return assigned.select(
        "vec_id", "cell", F.zip_with("v", w, lambda x, y: x - y).alias("v")
    )


def probe_tables(
    queries: list[tuple[int, list[float]]],
    cells: list[list[float]],
    books: list[list[tuple[int, list[float]]]],
    nprobe: int = NPROBE,
) -> list[tuple]:
    """Driver-side IVFADC probe rows: for each query, its ``nprobe``
    best coarse cells (dot desc, cell asc — same order as
    ``ivf_assign``) and, per probed cell, the S distance tables of the
    query's residual in THAT cell.  Python floats are IEEE doubles and
    every fold here is the same left fold the SQL expressions use —
    bit-equal to the oracle.  |queries| * nprobe rows, broadcast-sized."""
    rows = []
    for qid, qv in queries:
        sims = []
        for cell, w in enumerate(cells):
            acc = 0.0
            for x, y in zip(qv, w):
                acc += x * y
            sims.append((cell, acc))
        sims.sort(key=lambda t: (-t[1], t[0]))
        for cell, _ in sims[:nprobe]:
            rq = [x - y for x, y in zip(qv, cells[cell])]
            tabs = []
            for s, book in enumerate(books):
                qs = rq[s * SUBDIM : (s + 1) * SUBDIM]
                table = [1e30] * CODES
                for cid, cv in book:
                    acc = 0.0
                    for x, y in zip(qs, cv):
                        acc += (x - y) * (x - y)
                    table[cid] = acc
                tabs.append(table)
            rows.append((qid, cell, *tabs))
    return rows


def ivfadc_topk(
    vecs: DataFrame,
    queries: list[tuple[int, list[float]]],
    cells: list[list[float]],
    k: int = TOPK,
    nprobe: int = NPROBE,
) -> DataFrame:
    """(qid, rank, vec_id, adc): the full IVFADC pipeline (Jégou et al.
    2011 §V) — coarse-quantize, PQ-encode the RESIDUALS (one shared
    codebook set, the paper's recommended variant), then per query scan
    only its ``nprobe`` probed cells with residual distance tables.

    Scale shape vs plain ADC: the probe-table frame keys candidates by
    ``cell``, so the broadcast hash join prunes the scan to
    ~nprobe/|cells| of the corpus BEFORE any distance math — compose of
    IVF's read pruning and PQ's byte pruning.  At 10^9 vectors: codes
    live partitioned by cell (partition pruning serves the probe join),
    tables stay |queries|*nprobe rows (broadcast), and the only shuffle
    is the salted top-k rank."""
    resid = coarse_residuals(vecs, cells)
    books = train_codebooks(resid.select("vec_id", "v"))
    enc = resid.select(
        "vec_id",
        "cell",
        *[
            _argmin_code(F.col("v"), s, books[s]).alias(f"code{s}")
            for s in range(SUBSPACES)
        ],
    )
    schema = "qid long, cell int, " + ", ".join(
        f"dt{s} array<double>" for s in range(SUBSPACES)
    )
    ptab = vecs.sparkSession.createDataFrame(
        probe_tables(queries, cells, books, nprobe), schema
    )
    return _rank_adc(enc.join(F.broadcast(ptab), "cell"), k)
