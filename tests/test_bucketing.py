"""Bucketed co-located join: the 100 TB shuffle-elimination path.

At scale, the fact-to-fact joins (orders x lineitem) cannot broadcast;
the design answer is bucketing both sides on the join key at write time
so the join needs NO exchange at read time. This test writes both tables
bucketed into the session catalog and asserts the join plan is
shuffle-free — the property that survives a 1000-executor cluster.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR
from .test_scale_plans import fmt, shuffle_exchanges

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped after the module
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    (orders.write.mode("overwrite").bucketBy(N_BUCKETS, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(N_BUCKETS, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("lineitem_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy is decided by distribution,
    # as it would be for two fact tables at 100 TB
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        l = spark.table("lineitem_b")
        joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
            "o_orderkey", "l_extendedprice", "o_totalprice"
        )
        plan = fmt(spark, joined)
        assert len(shuffle_exchanges(plan)) == 0  # co-located: no exchange
        # correctness unchanged vs the unbucketed join
        plain = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_is_shuffle_free(bucketed):
    spark = bucketed
    agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = fmt(spark, agg)
    # grouping on the bucket key: distribution already satisfied
    assert len(shuffle_exchanges(plan)) == 0
