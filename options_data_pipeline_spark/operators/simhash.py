"""SimHash near-duplicate detection (portable, zero-UDF).

SimHash maps each document to a short bit signature such that documents
with similar token sets land at small Hamming distance. Pipeline:

1. **Signature** (one groupBy): for bit *i*, sum +1/-1 votes over the
   document's distinct word-bigram shingles — the vote is the parity of
   the *i*-th hex char of ``md5(shingle)``, a coin flip both Spark and
   DuckDB compute identically on strings, which keeps the whole operator
   oracle-checkable. One md5 per shingle serves all 32 bits (md5's hex
   chars are independent enough for sim-hashing; a per-bit salted hash
   costs 32x the digest work for no measurable quality gain here).
   Bit *i* is 1 when the vote sum is >= 0.
   Bigrams, not unigrams: this corpus shares most of its unigram
   vocabulary across documents, which left unigram signatures nearly
   constant (measured: >1k unrelated pairs at Hamming 0); bigram sets are
   distinctive, so the votes decorrelate.
2. **Candidates**: the signature's bits are split into ``N_BANDS``
   disjoint nibbles; documents sharing any (band, nibble-value) bucket
   pair up. By pigeonhole, a pair within Hamming distance
   ``N_BANDS - 1`` MUST agree on at least one full band, so banding has
   perfect recall for the distance threshold used here — the Spark
   banded result provably equals the oracle's exact all-pairs scan.
3. **Verify**: exact Hamming distance via ``bit_count(sig_a XOR sig_b)``
   on the (broadcast) candidate pairs.

Scale: signatures are one map-side-combined groupBy over exploded
tokens; candidate generation is one shuffle on the bucket key; no
all-pairs computation ever materializes (the oracle's O(n²) scan is the
*check*, not the algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _gram_array, bucket_pairs

N_BITS = 32
N_BANDS = 4
MAX_HAMMING = N_BANDS - 1  # pigeonhole: banding recall is exact up to this
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def _vote(i: int):
    """+1/-1 vote of a token for bit i (parity of md5's i-th hex char).

    Expects a ``__md5`` column holding md5(token) so the digest is
    computed once per row, not once per bit.
    """
    probe = F.substring(F.col("__md5"), i + 1, 1)
    return F.when(probe.isin(*_ODD_HEX), F.lit(1)).otherwise(F.lit(-1))


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sets: DataFrame | None = None,
) -> DataFrame:
    """One row per doc: (doc_id, sig) with a 32-bit simhash as a long.

    Unrolled into ``N_BITS`` plain conditional-sum aggregates so the
    whole computation stays in whole-stage codegen and combines map-side
    (one skinny row per doc crosses the shuffle).

    ``sets`` optionally supplies a pre-built (doc_id, shingles) store
    (:func:`..dedup.shingle_sets`, possibly a shared session artifact)
    so the shingling pass is not recomputed per consumer.
    """
    if sets is not None:
        tokens = sets.select("doc_id", F.explode("shingles").alias("token"))
    else:
        tokens = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_gram_array(text_col)).alias("token"),
        )
    tokens = tokens.withColumn("__md5", F.md5(F.col("token")))
    aggs = [F.sum(_vote(i)).alias(f"v_{i}") for i in range(N_BITS)]
    votes = tokens.groupBy("doc_id").agg(*aggs)
    sig = None
    for i in range(N_BITS):
        bit = F.when(F.col(f"v_{i}") >= 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return votes.select("doc_id", sig.alias("sig"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = MAX_HAMMING,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Pairs of documents within ``max_hamming`` simhash bits.

    ``max_hamming`` must stay < N_BANDS for the banded candidate set to
    provably cover every qualifying pair (see module docstring).
    ``sets`` passes a pre-built shingle store through to the signature
    stage.
    """
    if max_hamming >= N_BANDS:
        raise ValueError("banding only has full recall for hamming < N_BANDS")
    sigs = simhash_signatures(df, id_col, text_col, sets=sets)
    bits_per_band = N_BITS // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sig"), b * bits_per_band)
                .bitwiseAND(F.lit(2**bits_per_band - 1))
                .alias("nibble"),
            )
            for b in range(N_BANDS)
        ]
    )
    # Signatures ride INSIDE the bucket rows, so the sig pipeline runs
    # exactly once and verification needs no join back: bucket -> in-bucket
    # pair expansion -> row-local bit_count. One shuffle end to end.
    banded = sigs.select(
        F.explode(bands).alias("bb"), F.struct("doc_id", "sig").alias("item")
    ).select("bb.band", "bb.nibble", "item")
    buckets = (
        banded.groupBy("band", "nibble")
        .agg(F.array_sort(F.collect_list("item")).alias("items"))
        .where(F.size("items") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.transform(
                        F.slice(F.col("items"), i + F.lit(2), F.size(F.col("items"))),
                        lambda y: F.struct(
                            x["doc_id"].alias("doc_a"),
                            y["doc_id"].alias("doc_b"),
                            x["sig"].alias("sig_a"),
                            y["sig"].alias("sig_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*").distinct()
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
