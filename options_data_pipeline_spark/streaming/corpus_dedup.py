"""Streaming incremental corpus dedup: adjudicate arriving documents
against a standing corpus, micro-batch by micro-batch.

The batch form (``plans/text.py:q_incremental_dedup``) re-derives
everything per run; the streaming form is what a continuously-ingesting
training pipeline actually deploys: the standing corpus's dedup
artifacts — content-hash table, hashed shingle store, LSH band table —
are built ONCE when the stream starts (at 100 TB they would be the
persisted artifact-store tables), and each micro-batch only computes
signatures for ITS OWN rows, probing the corpus artifacts with
broadcast-friendly equi-joins:

- exact probe: batch md5 against the corpus hash table;
- near probe: batch band table equi-joined to the corpus band table on
  (band, band_hash) — candidates only, never batch x corpus — then true
  Jaccard against the corpus shingle store at ``threshold``.

Per-doc verdicts (``exact_dup`` / ``near_dup`` / ``unique`` + lowest
matching corpus id) append to the sink; appends are idempotent per
(epoch, doc) because every step is deterministic.

The integration test pins stream/batch EQUIVALENCE: feeding the planted
mirror/scrape docs through this stream yields exactly the batch
``incremental_dedup`` verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_PERMS,
    banded_signatures,
    hashed_shingle_sets,
    minhash_signatures,
)
from ..operators.materialize import materialize


def corpus_dedup_artifacts(
    base_docs: DataFrame, reliable: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(hash table, shingle store, band table) of the standing corpus,
    each materialized once — the artifact-store build step."""
    hashes = materialize(
        base_docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("base_match")),
        reliable,
    )
    sets = materialize(hashed_shingle_sets(base_docs), reliable)
    bands = materialize(
        banded_signatures(minhash_signatures(sets, DEFAULT_PERMS)), reliable
    )
    return hashes, sets, bands


def adjudicate_batch(
    batch: DataFrame,
    base_hashes: DataFrame,
    base_sets: DataFrame,
    base_bands: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Verdicts for one (small) batch of incoming docs against the
    standing corpus artifacts. Pure DataFrame logic — usable from
    foreachBatch or directly on a static batch."""
    batch_sets = hashed_shingle_sets(batch)
    batch_bands = banded_signatures(minhash_signatures(batch_sets, DEFAULT_PERMS))

    exact = batch.select("doc_id", F.md5("text").alias("h")).join(
        base_hashes.withColumnRenamed("base_match", "exact_match"), "h", "left"
    )

    cand = (
        batch_bands.select(
            F.col("doc_id").alias("new_id"), "band", "band_hash"
        )
        .join(
            base_bands.select(
                F.col("doc_id").alias("base_id"), "band", "band_hash"
            ),
            ["band", "band_hash"],
        )
        .select("new_id", "base_id")
        .distinct()
    )
    a = batch_sets.select(
        F.col("doc_id").alias("new_id"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = base_sets.select(
        F.col("doc_id").alias("base_id"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    near = (
        a.join(F.broadcast(cand), "new_id")
        .join(b, "base_id")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.min("base_id").alias("near_match"))
    )

    verdict = (
        F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
        .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
    )
    return exact.join(near, "doc_id", "left").select(
        "doc_id",
        verdict.alias("verdict"),
        F.coalesce("exact_match", "near_match").alias("base_match"),
    )


def incremental_dedup_stream(
    spark,
    src_dir: str,
    base_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
):
    """availableNow stream: parquet doc files in ``src_dir`` -> per-doc
    verdict rows appended to ``out_dir``. Returns the StreamingQuery."""
    base_hashes, base_sets, base_bands = corpus_dedup_artifacts(base_docs)
    schema = base_docs.schema

    def _adjudicate(batch: DataFrame, epoch_id: int) -> None:
        out = adjudicate_batch(
            batch, base_hashes, base_sets, base_bands, threshold
        )
        out.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(_adjudicate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
