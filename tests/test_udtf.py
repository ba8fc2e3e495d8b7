"""Python UDTF surface: the imperative chunker must be row-for-row
identical to the native sequence+explode expression — the gate any
future UDTF must pass before replacing a native shape (§2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from options_data_pipeline_spark.functions.udtf import register_udtfs
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR

WIDTH = 32


def _native_chunks(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    chunked = (
        docs.withColumn("__toks", F.split(F.col("text"), " "))
        .withColumn(
            "chunk_idx",
            F.explode(
                F.expr(f"sequence(0, (size(__toks) - 1) div {WIDTH})")
            ),
        )
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.array_join(
            F.slice(
                F.col("__toks"), (F.col("chunk_idx") * WIDTH + 1), WIDTH
            ),
            " ",
        ).alias("chunk_text"),
    )


def test_udtf_matches_native_explode(spark):
    register_udtfs(spark)
    load_table(spark, SF_DIR, "documents").createOrReplaceTempView(
        "udtf_docs"
    )
    via_udtf = spark.sql(
        f"SELECT d.doc_id, c.chunk_idx, c.chunk_text "
        f"FROM udtf_docs d, LATERAL chunk_text(d.text, {WIDTH}) c"
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, _native_chunks(spark).collect()))
    assert a == b
    assert len(a) > 100


def test_udtf_null_text_yields_no_rows(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_null_docs")
    rows = spark.sql(
        f"SELECT doc_id, chunk_idx FROM udtf_null_docs d, "
        f"LATERAL chunk_text(d.text, {WIDTH})"
    ).collect()
    assert [(r.doc_id, r.chunk_idx) for r in rows] == [(2, 0)]
