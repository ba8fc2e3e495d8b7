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
