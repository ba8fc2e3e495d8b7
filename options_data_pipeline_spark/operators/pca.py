"""Distributed PCA over an embedding column.

The decomposition that scales to 100 TB is the classic tall-skinny one:
the data is (n × d) with d small (64 here), so the d×d Gram/covariance
matrix is computed distributed (one aggregate over the corpus — the only
full scan), the eigendecomposition runs on the driver on a d×d matrix
(microseconds, no data volume), and the projection is a per-row narrow
map with the loadings broadcast. No iteration, two jobs total.

Two Gram paths:

- :func:`covariance_frame` — exact-DECIMAL pair sums via a position
  self-join; bitwise deterministic under any partitioning, used by the
  hash-checked ``embedding_covariance`` registry query.
- :func:`gram_partial` — Arrow-batched ``mapInPandas`` partial outer
  products (one d×d float64 partial per batch, summed driver-side).
  This is the at-scale shape (d² floats per partition crossing the
  wire instead of d²·n pair rows), float-accumulated so only
  tolerance-comparable; a unit test pins it against the exact path.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_half_away

_SCALE = 1_000_000  # quantize embeddings at 1e-6 as exact scaled integers


def flat_positions(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, i, w): 1-based position explode with values quantized to
    1e-6 as exact scaled LONGs — the shared input of the moment
    aggregates.

    The quantization is an explicit half-away-from-zero IEEE formula
    (floor/abs on the exactly-upcast double), NOT a float->decimal cast:
    Spark casts via the float's shortest decimal string, DuckDB rounds
    the exact binary value, and the two split scale-6 ties differently
    (found by the driver-sim hash gate at sf0.01)."""
    vd = F.col("vf").cast("double")
    w = F.floor(F.abs(vd) * _SCALE + F.lit(0.5)) * F.when(
        vd < 0, F.lit(-1)
    ).otherwise(F.lit(1))
    return emb.select(
        "vec_id", F.posexplode(vec_col).alias("pos", "vf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        w.cast("long").alias("w"),
    )


def covariance_frame(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle population covariance entries (i <= j) of the
    embedding dimensions, bit-deterministic.

    Raw moments are exact DECIMAL sums (order-free); the closed form
    cov = (Sxy - Sx*Sy/n)/n is one IEEE double evaluation of identical
    operands in any engine, pinned at 9 decimals.

    Shape: explode to (vec_id, i, v) — linear fan-out d× — then a
    vec_id-co-partitioned self-join expands each row group to its
    d(d+1)/2 pairs, absorbed immediately by a partially-aggregated
    groupBy on (i, j): d² running sums per task, nothing quadratic in n
    ever materializes.
    """
    # Per-row upper-triangle pair products as ONE nested array expression
    # (no self-join): each vector fans out to its d(d+1)/2 (i, j, w_i*w_j)
    # structs row-locally, so the only shuffle in the whole plan is the
    # d²-group partial aggregate. (An earlier version self-joined the
    # exploded positions on vec_id — a full n·d shuffle that this
    # expression makes unnecessary.) Products stay in LONG (|w| ≤ 1e6 ·
    # |v|max; embeddings are O(1)-magnitude so no overflow headroom
    # issues), summed as exact DECIMAL(38,0): associative, engine-
    # agnostic; descaled only in the final double closed form.
    wd = (
        "transform({v}, x -> CAST(floor(abs(CAST(x AS DOUBLE)) * {s} + 0.5)"
        " AS BIGINT) * (CASE WHEN CAST(x AS DOUBLE) < 0 THEN -1 ELSE 1 END))"
    ).format(v=vec_col, s=_SCALE)
    pairs_expr = (
        "flatten(transform(sequence(1, size({w})), i ->"
        " transform(sequence(i, size({w})), j ->"
        " struct(i AS i, j AS j, {w}[i-1] * {w}[j-1] AS p))))"
    ).format(w="__w")
    fan = emb.selectExpr(f"{wd} AS __w").select(
        F.explode(F.expr(pairs_expr)).alias("t")
    )
    moments2 = fan.select("t.i", "t.j", "t.p").groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("p").cast("decimal(38,0)")).cast("double").alias("sxy_s"),
    )
    flat = flat_positions(emb, vec_col)
    means = flat.groupBy("i").agg(
        F.sum(F.col("w").cast("decimal(38,0)")).cast("double").alias("sx_s")
    )
    mi = means.select(F.col("i").alias("__mi"), F.col("sx_s").alias("sx_i"))
    mj = means.select(F.col("i").alias("__mj"), F.col("sx_s").alias("sx_j"))
    n = F.col("n_vecs").cast("double")
    scale2 = F.lit(float(_SCALE) * float(_SCALE))
    return (
        moments2.join(F.broadcast(mi), F.col("i") == F.col("__mi"))
        .join(F.broadcast(mj), F.col("j") == F.col("__mj"))
        .select(
            "i", "j", "n_vecs",
            round_half_away(
                (F.col("sxy_s") - F.col("sx_i") * F.col("sx_j") / n)
                / scale2 / n,
                9,
            ).alias("cov"),
        )
    )


def gram_partial(emb: DataFrame, vec_col: str = "embedding"):
    """At-scale Gram path: (sum_outer d×d, sum d, count) via per-batch
    numpy partials. Returns (numpy S2 [d,d], numpy S1 [d], n). Float
    accumulation — tolerance-grade, not hash-grade."""
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    def _partials(batches: Iterable) -> Iterable:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = _np.stack(
                [_np.asarray(x, dtype=_np.float64) for x in pdf["__v"]]
            )
            yield _pd.DataFrame(
                {
                    "s2": [m.T.dot(m).ravel().tolist()],
                    "s1": [m.sum(axis=0).tolist()],
                    "n": [len(m)],
                }
            )

    src = emb.select(F.col(vec_col).alias("__v"))
    parts = src.mapInPandas(
        _partials, schema="s2 array<double>, s1 array<double>, n long"
    ).collect()
    if not parts:
        return None, None, 0
    d = len(parts[0]["s1"])
    s2 = np.zeros((d, d))
    s1 = np.zeros(d)
    n = 0
    for row in parts:
        s2 += np.asarray(row["s2"]).reshape(d, d)
        s1 += np.asarray(row["s1"])
        n += row["n"]
    return s2, s1, n


def fit_loadings(
    emb: DataFrame, n_components: int = 2, vec_col: str = "embedding"
):
    """Principal-component loadings from the exact covariance frame.

    Collects only the d(d+1)/2 covariance entries (d=64 → 2080 rows),
    eigendecomposes on the driver, and returns (loadings [k,d] rounded
    to 9 dp, eigenvalues [k]). Sign convention: each component's
    largest-|coordinate| is made positive (first such index on ties) so
    the output is unique regardless of LAPACK sign choices.
    """
    import numpy as np

    rows = covariance_frame(emb, vec_col).collect()
    d = max(r["j"] for r in rows)
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = []
    for idx in order:
        w = vecs[:, idx]
        pivot = int(np.argmax(np.abs(np.round(w, 12))))
        if w[pivot] < 0:
            w = -w
        comps.append(np.round(w, 9))
    return np.stack(comps), vals[order]


def project(
    emb: DataFrame,
    loadings,
    means,
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Project each embedding onto the given (k × d) loadings after
    centering by ``means`` (length-d). Pure narrow expression: the
    per-row dot product is a fixed-order left-to-right fold
    (``F.aggregate``), so results do not depend on partitioning."""
    out = emb
    d = len(means)
    from ..functions.litconst import lit_double_array

    mean_arr = lit_double_array(means)
    for m, w in enumerate(loadings, start=1):
        w_arr = lit_double_array(w)
        centered = F.zip_with(
            F.col(vec_col).cast("array<double>"), mean_arr,
            lambda x, mu: x - mu,
        )
        dot = F.aggregate(
            F.zip_with(centered, w_arr, lambda x, ww: x * ww),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{out_prefix}{m}", round_half_away(dot, 6))
    assert d  # docstring contract: means length defines d
    return out
