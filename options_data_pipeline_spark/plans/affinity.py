"""Co-occurrence / graph-affinity analytics over the order-lines fact.

The reference pipeline has no graph surface; these queries prove the
engine's iterative/graph shapes on Spark — bounded self-join pair
expansion, degree-oriented triangle enumeration, and a fixed-point
integer PageRank whose arithmetic is exactly reproducible across
engines (no float accumulation order dependence).

Scale notes common to all three: the raw pair expansion is bounded by
per-order basket size (≤ ~13 distinct parts per order in TPC-H-like
data, so ≤ C(13,2) = 78 pair rows per order — linear in the fact, not
quadratic in the dimension); every downstream shuffle is keyed on
hash-uniform part ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.artifacts import session_artifact
from ..operators.graphalgo import PR_SCALE, pagerank_fixed_point, triangle_stats
from ..sources.tables import load_table

# minimum co-occurrence count for a pair to become a graph edge — keeps
# the affinity graph sparse (support-1 pairs are noise at any scale)
EDGE_SUPPORT = 2

PR_ITERS = 3


def _order_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) pairs → co-occurring part pairs (a < b).

    One aggregate to distinct the basket rows, then a self-equi-join on
    l_orderkey. The join is per-order and baskets are small, so the
    output is O(|lineitem| × basket_size), never |part|².
    """
    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.alias("a")
    b = lp.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
    )


_PAIR_SQL = f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
    ),
    edge AS (
        SELECT part_a, part_b, count(*) AS support
        FROM pair GROUP BY 1, 2
        HAVING count(*) >= {EDGE_SUPPORT}
    )
"""


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs by support, with lift.

    Pair counts via one hash aggregate on (part_a, part_b); per-part
    order counts join back on the hash-uniform part key for the lift
    denominator. Lift operands are exact integers cast to double, so the
    IEEE result is engine-independent.
    """
    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = lp.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    part_cnt = lp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("part_orders")
    )
    support = support_edge_artifact(spark, sf_dir)
    ca = part_cnt.select(
        F.col("l_partkey").alias("part_a"),
        F.col("part_orders").alias("orders_a"),
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("part_b"),
        F.col("part_orders").alias("orders_b"),
    )
    # part_cnt is O(|parts|) — scales with the dimension, so no forced
    # broadcast (AQE picks broadcast when it fits); n_orders is one row
    return (
        support.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            "orders_a",
            "orders_b",
            (
                F.col("support").cast("double")
                * F.col("n_orders").cast("double")
                / (
                    F.col("orders_a").cast("double")
                    * F.col("orders_b").cast("double")
                )
            ).alias("lift"),
        )
        .orderBy(
            F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(50)
    )


def oracle_basket_pairs() -> str:
    return f"""
{_PAIR_SQL},
    cnt AS (
        SELECT l_partkey, count(*) AS part_orders FROM lp GROUP BY 1
    ),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lp)
SELECT e.part_a, e.part_b, e.support,
       ca.part_orders AS orders_a, cb.part_orders AS orders_b,
       CAST(e.support AS DOUBLE) * CAST(tot.n_orders AS DOUBLE)
           / (CAST(ca.part_orders AS DOUBLE) * CAST(cb.part_orders AS DOUBLE))
           AS lift
FROM edge e
JOIN cnt ca ON ca.l_partkey = e.part_a
JOIN cnt cb ON cb.l_partkey = e.part_b
CROSS JOIN tot
ORDER BY e.support DESC, e.part_a ASC, e.part_b ASC
LIMIT 50
"""


def support_edge_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized co-purchase edge list (part_a < part_b, support).

    Derived once per corpus snapshot via the session artifact store —
    triangle counting and PageRank each consume the edge list from
    multiple plan branches (degrees, orientation, closure, iteration),
    and without a materialization point Catalyst re-derives the
    lineitem self-join per branch (~68 exchanges). At 100 TB the edge
    list is a persisted derived table; `store_dir` upgrades this memo
    to that posture.
    """

    def build() -> DataFrame:
        return (
            _order_part_pairs(spark, sf_dir)
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= EDGE_SUPPORT)
        )

    return session_artifact(
        spark, f"affinity_edges#{sf_dir}#sup{EDGE_SUPPORT}", build
    )


def _support_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return support_edge_artifact(spark, sf_dir).select("part_a", "part_b")


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + clustering coefficient of the co-purchase graph.

    Thin wrapper over :func:`..operators.graphalgo.triangle_stats`
    (degree-oriented enumeration — see its docstring for the scale
    argument) applied to the materialized support-edge artifact.
    """
    return triangle_stats(_support_edges(spark, sf_dir))


def oracle_triangle_count() -> str:
    # the oracle enumerates with the simple id-orientation (a<b<c); the
    # triangle COUNT is orientation-invariant, which is exactly what we
    # want to pin: Spark's degree-oriented plan must agree with the
    # naive enumeration.
    return f"""
{_PAIR_SQL},
    deg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT part_a AS node FROM edge
            UNION ALL SELECT part_b FROM edge
        ) GROUP BY 1
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edge e1
        JOIN edge e2 ON e2.part_a = e1.part_b
        JOIN edge e3 ON e3.part_a = e1.part_a AND e3.part_b = e2.part_b
    )
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM edge) AS n_edges,
       (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       tri.n_triangles,
       3.0 * CAST(tri.n_triangles AS DOUBLE)
           / CAST((SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS DOUBLE)
           AS clustering_coeff
FROM tri
"""


def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank over the co-purchase graph, 3
    iterations, damping 0.85 — top 20 parts by rank.

    Thin wrapper over :func:`..operators.graphalgo.pagerank_fixed_point`
    (bit-exact integer arithmetic — see its docstring) applied to the
    materialized support-edge artifact.
    """
    ranks = pagerank_fixed_point(_support_edges(spark, sf_dir), iters=PR_ITERS)
    return ranks.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(20)


def oracle_pagerank_parts() -> str:
    base = PR_SCALE * 15 // 100
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
        SELECT e.dst AS node,
               -- SUM(BIGINT) is HUGEINT in DuckDB; pin back to BIGINT so
               -- the arithmetic (and the pandas dtype) matches Spark LONG
               {base} + (85 * CAST(SUM({prev}.rank // d.deg) AS BIGINT)) // 100
                   AS rank
        FROM edges e
        JOIN deg d ON d.node = e.src
        JOIN {prev} ON {prev}.node = e.src
        GROUP BY 1
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(iters)
    return f"""
{_PAIR_SQL},
    edges AS (
        SELECT part_a AS src, part_b AS dst FROM edge
        UNION ALL SELECT part_b, part_a FROM edge
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg),
    {chain}
SELECT node, rank FROM {prev}
ORDER BY rank DESC, node ASC
LIMIT 20
"""


# --- Bradley-Terry rating fit (preference-data shape) ---------------------------

BT_PLAYERS = 8
BT_ITERS = 4
BT_WIN_THRESHOLD = 50.0


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength ratings fit by ``BT_ITERS`` rounds of the
    MM (minorization-maximization) update (Hunter 2004) — the model
    behind pairwise-preference leaderboards (LLM arenas, RLHF reward
    calibration): r_i <- w_i / sum_j n_ij / (r_i + r_j), renormalized to
    sum to the player count each round.

    Match fixture: every event is a deterministic pairing of two of
    ``BT_PLAYERS`` synthetic players (event_id digits), the higher
    `value` side wins — exact integer/boolean derivation both engines
    repeat. The iterate is the interesting part at scale: each round is
    one join of the (i, j, n_ij) pair table against the current ratings
    + one grouped sum, never a per-player loop; millions of players
    would shuffle on hash-uniform ids exactly like this 8-row toy.

    Bit-determinism: each MM term n_ij/(r_i + r_j) rounds to 12 dp and
    sums as exact DECIMAL (associative under any partitioning); the
    per-round ratings re-quantize to 12 dp, so every round starts from
    identical bits in both engines (the chain-amplification discipline
    of ``mmr_rerank``)."""
    from pyspark.sql import Window

    from ..functions.rounding import round_half_away

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    m = ev.select(
        (F.col("event_id") % BT_PLAYERS).alias("a"),
        (F.expr(f"(event_id DIV {BT_PLAYERS}) % {BT_PLAYERS}")).alias("b"),
        (F.col("value") >= BT_WIN_THRESHOLD).alias("a_wins"),
    ).where(F.col("a") != F.col("b"))
    wins = (
        m.select(F.when(F.col("a_wins"), F.col("a")).otherwise(F.col("b")).alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pairs = (
        m.select("a", "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # symmetrize to directed (i, j, n_ij): every match involves both sides
    pairsd = (
        pairs.select(F.col("a").alias("i"), F.col("b").alias("j"), "n")
        .unionByName(
            pairs.select(F.col("b").alias("i"), F.col("a").alias("j"), "n")
        )
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n"))
    )
    from ..operators.materialize import materialize

    # the iterate references pairsd AND wins once per unrolled MM round
    # — unbarriered, every round re-embedded the events scan behind
    # `wins` (the r13 scans audit showed 18 parquet scans / 66
    # exchanges in the static plan).  All three fixtures are compact
    # (<= players / pairs rows), so checkpointing them bounds the whole
    # fit at one corpus scan per fixture.
    pairsd = materialize(pairsd)
    wins = materialize(wins)
    n_matches = pairsd.groupBy("i").agg(F.sum("n").alias("n_matches"))
    r = pairsd.select("i").distinct().select("i", F.lit(1.0).alias("r"))
    w_all = Window.partitionBy()
    for _ in range(BT_ITERS):
        t = (
            pairsd.join(r.select(F.col("i"), F.col("r").alias("ri")), "i")
            .join(
                r.select(F.col("i").alias("j"), F.col("r").alias("rj")), "j"
            )
            .select(
                "i",
                round_half_away(
                    F.col("n").cast("double") / (F.col("ri") + F.col("rj")), 12
                )
                .cast("decimal(28,12)")
                .alias("t"),
            )
        )
        s = t.groupBy("i").agg(F.sum("t").alias("s"))
        raw = wins.join(s, "i").select(
            "i",
            (F.col("w").cast("double") / F.col("s").cast("double")).alias("rr"),
        )
        z = F.sum(
            round_half_away(F.col("rr"), 12).cast("decimal(28,12)")
        ).over(w_all)
        r = raw.select(
            "i",
            round_half_away(
                F.col("rr") * float(BT_PLAYERS) / z.cast("double"), 12
            ).alias("r"),
        )
    return (
        r.join(wins, "i")
        .join(n_matches, "i")
        .select(
            F.col("i").cast("int").alias("player"),
            F.col("w").alias("wins"),
            "n_matches",
            round_half_away(F.col("r"), 6).alias("rating"),
        )
    )


def oracle_bradley_terry() -> str:
    from ..functions.rounding import sql_round_half_away

    stages = []
    for it in range(1, BT_ITERS + 1):
        prev = f"r{it - 1}"
        term = sql_round_half_away("n / (ri.r + rj.r)", 12)
        stages.append(f"""
t{it} AS (
    SELECT p.i, CAST({term} AS DECIMAL(28,12)) AS t
    FROM pairsd p
    JOIN {prev} ri ON ri.i = p.i
    JOIN {prev} rj ON rj.i = p.j
),
s{it} AS (SELECT i, SUM(t) AS s FROM t{it} GROUP BY 1),
raw{it} AS (
    SELECT wins.i, CAST(wins.w AS DOUBLE) / CAST(s AS DOUBLE) AS rr
    FROM wins JOIN s{it} ON s{it}.i = wins.i
),
r{it} AS (
    SELECT i, {sql_round_half_away(
        f"rr * {float(BT_PLAYERS)!r} / CAST(SUM(CAST("
        + sql_round_half_away("rr", 12)
        + " AS DECIMAL(28,12))) OVER () AS DOUBLE)", 12)} AS r
    FROM raw{it}
)""")
    return f"""
WITH m AS (
    SELECT event_id % {BT_PLAYERS} AS a,
           (event_id // {BT_PLAYERS}) % {BT_PLAYERS} AS b,
           value >= {BT_WIN_THRESHOLD!r} AS a_wins
    FROM events WHERE value IS NOT NULL
),
m2 AS (SELECT * FROM m WHERE a != b),
wins AS (
    SELECT CASE WHEN a_wins THEN a ELSE b END AS i, count(*) AS w
    FROM m2 GROUP BY 1
),
pairs AS (SELECT a, b, count(*) AS n FROM m2 GROUP BY 1, 2),
pairsd AS (
    SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
        SELECT a AS i, b AS j, n FROM pairs
        UNION ALL SELECT b AS i, a AS j, n FROM pairs
    ) GROUP BY 1, 2
),
nm AS (SELECT i, CAST(SUM(n) AS BIGINT) AS n_matches FROM pairsd GROUP BY 1),
r0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS r FROM pairsd),
{",".join(stages)}
SELECT CAST(r{BT_ITERS}.i AS INT) AS player,
       CAST(wins.w AS BIGINT) AS wins, nm.n_matches,
       {sql_round_half_away("r" + str(BT_ITERS) + ".r", 6)} AS rating
FROM r{BT_ITERS}
JOIN wins ON wins.i = r{BT_ITERS}.i
JOIN nm ON nm.i = r{BT_ITERS}.i
"""


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

LP_ROUNDS = 3
LP_SEED_MOD = 7  # parts with p_partkey % 7 == 0 are seeded with p_brand


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spread on the co-purchase graph: a seeded
    minority of parts (p_partkey % 7 == 0) carry their brand as a fixed
    label; ``LP_ROUNDS`` pinned rounds of weighted-majority adoption
    (edge support as the weight, ties to the lexicographically smallest
    label) infer labels for the rest — the community/label-inference
    shape (LPA) that iterates WITHOUT a driver loop: each round is one
    join + one aggregate, unrolled as ``LP_ROUNDS`` deterministic stages
    exactly like the PageRank fixed point (:func:`q_pagerank_parts`).

    Determinism: standard LPA is order-sensitive (async updates); this
    is the SYNCHRONOUS variant with an exact integer weight sum and a
    total tie order (weight desc, label asc), so every round is a pure
    function of the previous frame — partition-invariant and
    oracle-reproducible.  Seeds are clamped (never overwritten), the
    update is monotone in coverage: unlabeled nodes gain labels, labeled
    non-seeds may switch only by majority.

    Scale: edges come from the materialized support artifact; each
    round shuffles the (node, label) frontier — O(V+E) per round, the
    canonical distributed LPA cost."""
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    edges = support_edge_artifact(spark, sf_dir)
    sym = edges.select(
        F.col("part_a").alias("src"),
        F.col("part_b").alias("dst"),
        "support",
    ).unionByName(
        edges.select(
            F.col("part_b").alias("src"),
            F.col("part_a").alias("dst"),
            "support",
        )
    )
    from ..operators.materialize import materialize

    # seeds are referenced TWICE per unrolled round (clamp union +
    # anti-join) — unbarriered, every round re-embedded the parts scan
    # (the r13 scans audit showed 10 parquet scans).  The seed frame is
    # compact (|parts|/LP_SEED_MOD rows), so one checkpoint bounds the
    # whole spread at one parts scan.
    seeds = materialize(
        parts.where(F.col("p_partkey") % LP_SEED_MOD == 0).select(
            F.col("p_partkey").alias("node"), F.col("p_brand").alias("label")
        )
    )
    labels = seeds
    for _ in range(LP_ROUNDS):
        votes = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "label", "support")
            .groupBy("node", "label")
            .agg(F.sum("support").cast("long").alias("w"))
        )
        adopted = votes.groupBy("node").agg(
            F.min(
                F.struct((-F.col("w")).alias("nw"), F.col("label"))
            ).alias("s")
        ).select("node", F.col("s.label").alias("label"))
        labels = seeds.unionByName(
            adopted.join(seeds.select("node"), "node", "left_anti")
        )
    is_seed = (F.col("node") % LP_SEED_MOD == 0).cast("int")
    return labels.select(
        F.col("node").cast("long").alias("part"),
        "label",
        is_seed.alias("is_seed"),
    )


def oracle_label_propagation() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, LP_ROUNDS + 1):
        rounds.append(f"""votes{i} AS (
        SELECT e.dst AS node, {prev}.label,
               CAST(SUM(e.support) AS BIGINT) AS w
        FROM sym e JOIN {prev} ON {prev}.node = e.src
        GROUP BY 1, 2
    ),
    adopted{i} AS (
        SELECT node, label FROM (
            SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY w DESC, label ASC) AS rn
            FROM votes{i}
        ) WHERE rn = 1
    ),
    l{i} AS (
        SELECT node, label FROM seeds
        UNION ALL
        SELECT a.node, a.label FROM adopted{i} a
        WHERE a.node NOT IN (SELECT node FROM seeds)
    )""")
        prev = f"l{i}"
    chain = ",\n    ".join(rounds)
    return f"""
{_PAIR_SQL},
    sym AS (
        SELECT part_a AS src, part_b AS dst, support FROM edge
        UNION ALL
        SELECT part_b AS src, part_a AS dst, support FROM edge
    ),
    seeds AS (
        SELECT p_partkey AS node, p_brand AS label FROM part
        WHERE p_partkey % {LP_SEED_MOD} = 0
    ),
    l0 AS (SELECT * FROM seeds),
    {chain}
SELECT CAST(node AS BIGINT) AS part, label,
       CAST(node % {LP_SEED_MOD} = 0 AS INT) AS is_seed
FROM {prev}
"""
