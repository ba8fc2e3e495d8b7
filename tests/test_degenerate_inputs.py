"""Degenerate-input behavior: empty frames, single rows, no matches.

At 100 TB something is always empty — a partition, a day, a language
stratum, a filter with no survivors. Operators must return empty/identity
results, not throw."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from options_data_pipeline_spark.operators import dedup as D
from options_data_pipeline_spark.operators.gaps import detect_gaps, gap_summary
from options_data_pipeline_spark.operators.graph import connected_components
from options_data_pipeline_spark.operators.simhash import simhash_near_dups


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_empty_corpus(spark):
    assert D.minhash_near_dups(_docs(spark, [])).count() == 0


def test_minhash_single_doc(spark):
    assert D.minhash_near_dups(_docs(spark, [(1, "a b c d")])).count() == 0


def test_minhash_one_word_docs(spark):
    # a 1-token doc has ZERO bigram shingles: must not throw, never match
    out = D.minhash_near_dups(
        _docs(spark, [(1, "solo"), (2, "solo"), (3, "a b a b")])
    )
    assert {tuple(r)[:2] for r in out.collect()} == set()


def test_exact_dup_groups_empty(spark):
    assert D.exact_dup_groups(_docs(spark, [])).count() == 0


def test_simhash_empty_and_single(spark):
    assert simhash_near_dups(_docs(spark, [])).count() == 0
    assert simhash_near_dups(_docs(spark, [(1, "x y z")])).count() == 0


def test_detect_gaps_empty_and_single_row(spark):
    ev = spark.createDataFrame([], "instrument string, ts timestamp")
    assert detect_gaps(ev, keys=("instrument",)).count() == 0
    one = spark.createDataFrame(
        [("btc", "2024-01-01 10:00:00")], "instrument string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert detect_gaps(one, keys=("instrument",)).count() == 0


def test_gap_summary_of_no_gaps(spark):
    ev = spark.createDataFrame([], "instrument string, ts timestamp")
    gaps = detect_gaps(ev, keys=("instrument",))
    assert gap_summary(gaps, keys=("instrument",)).count() == 0


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(edges).count() == 0


def test_connected_components_self_loop_only(spark):
    edges = spark.createDataFrame([(5, 5)], "doc_a long, doc_b long")
    out = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert out == {(5, 5)}


def test_kmeans_fewer_vectors_than_k(spark):
    from options_data_pipeline_spark.operators.clustering import kmeans_assign

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    out = kmeans_assign(emb, k=8, iterations=2)
    rows = {r.vec_id: r.cluster for r in out.collect()}
    assert set(rows) == {0, 1}  # every vector assigned despite k > n


def test_cosine_topk_empty_queries(spark):
    from options_data_pipeline_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    q = emb.where(F.lit(False)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    assert cosine_topk(q, c, k=3, parallelism=2).count() == 0


def test_clamped_fold_empty_and_scan_empty(spark):
    from options_data_pipeline_spark.operators.statefold import (
        clamped_running_sum,
        clamped_running_sum_scan,
    )

    empty = spark.createDataFrame([], "k string, seq int, delta long")
    kw = dict(keys=["k"], order=["seq"], delta_col="delta",
              lo=0, hi=10, divisor=1.0, out_col="bal")
    assert clamped_running_sum(empty, **kw).count() == 0
    assert clamped_running_sum_scan(empty, num_partitions=4, **kw).count() == 0
    spark.catalog.clearCache()


def test_distributed_rank_empty_and_single(spark):
    from options_data_pipeline_spark.operators.ranks import (
        distributed_row_number,
    )

    empty = spark.createDataFrame([], "k int, v int")
    assert distributed_row_number(empty, [("v", False)], "r").count() == 0
    one = spark.createDataFrame([(5, 1)], "k int, v int")
    rows = distributed_row_number(one, [("v", False)], "r").collect()
    assert [(r.k, r.v, r.r) for r in rows] == [(5, 1, 1)]


def test_skewed_fact_join_empty_sides(spark):
    from options_data_pipeline_spark.operators.skew import skewed_fact_join

    left = spark.createDataFrame([], "k int, lv int")
    right = spark.createDataFrame([(1, 2)], "k int, rv int")
    assert skewed_fact_join(left, right, on="k").count() == 0
    assert skewed_fact_join(right, left, on="k").count() == 0


def test_mp4_probe_empty_payload(spark):
    from options_data_pipeline_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, "v", b"")], "media_id long, kind string, payload binary"
    )
    out = MM.probe_mp4_headers(media).collect()
    assert len(out) == 1 and not out[0].is_mp4 and out[0].n_bytes == 0


def test_df_capped_empty_and_all_hot(spark):
    from options_data_pipeline_spark.operators.dedup import df_capped

    empty = spark.createDataFrame([], "doc_id long, lang string, shingle string")
    assert df_capped(empty, ["lang", "shingle"], 5).count() == 0
    # every key over the cap -> everything dropped, no error
    hot = spark.createDataFrame(
        [(i, "en", "same") for i in range(10)],
        "doc_id long, lang string, shingle string",
    )
    assert df_capped(hot, ["lang", "shingle"], 3).count() == 0


def test_decode_png_pixels_empty_and_garbage(spark):
    from options_data_pipeline_spark.operators import multimodal as MM

    empty = spark.createDataFrame([], "media_id long, kind string, payload binary")
    assert MM.decode_png_pixels(empty).count() == 0
    garbage = spark.createDataFrame(
        [(1, "image", b""), (2, "image", b"\x89PNG\r\n\x1a\x0a"), (3, "image", b"\x00" * 100)],
        "media_id long, kind string, payload binary",
    )
    rows = MM.decode_png_pixels(garbage).collect()
    assert len(rows) == 3 and not any(r.is_png for r in rows)


def test_apply_cdc_empty_log_on_existing_target(spark, tmp_path):
    from options_data_pipeline_spark.sinks.upsert import apply_cdc

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, 10, "U", 1.0)], "k long, seq long, op string, v double")
    apply_cdc(spark, path, base, ["k"], "seq")
    empty = spark.createDataFrame([], "k long, seq long, op string, v double")
    m = apply_cdc(spark, path, empty, ["k"], "seq")
    assert m == {"inserted": 0, "updated": 0, "deleted": 0}
    assert spark.read.parquet(path).count() == 1
