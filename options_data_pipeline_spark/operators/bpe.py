"""Distributed BPE tokenizer training (byte-pair-encoding merges).

Classic BPE (Sennrich et al. 2016) trains on the *word-frequency table*,
not the raw corpus: the corpus collapses to (word, freq) once — at 100 TB
the distinct-word table is orders of magnitude smaller than the text and
is the only thing the iterative phase ever touches. Each merge round is
the same driver-coordination pattern as Lloyd's k-means
(operators/clustering.py): a distributed aggregate finds the
globally-best pair (collecting exactly ONE row), and a row-local array
fold applies the merge everywhere — no shuffle in the apply step.

Merge semantics: left-to-right non-overlapping, the standard greedy pass
("aaa" under merge (a,a) -> [aa, a]). Ties on pair frequency break
lexicographically so training is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): whitespace tokenization (engine convention), one
    map-side-combined groupBy over the corpus — the only full-corpus
    pass in BPE training."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ", -1)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(col: Column) -> Column:
    # split('abc', '') -> [a, b, c] in Spark 4 (no empty tail)
    return F.split(col, "")


def with_symbols(words: DataFrame) -> DataFrame:
    """Seed the merge loop: each word as its character-symbol array."""
    return words.select(
        "word", "freq", _chars(F.col("word")).alias("syms")
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbolization:
    (left, right, pair_count), freq-weighted. Row-local fan-out into one
    partially-aggregated groupBy — the per-iteration distributed step."""
    pairs = symbols.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i-1] AS l, syms[i] AS r))"
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("freq").alias("pair_count"))


def best_pair(symbols: DataFrame) -> tuple[str, str, int] | None:
    """The globally most frequent adjacent pair (lexicographic on ties);
    collects exactly one row."""
    row = (
        pair_counts(symbols)
        .orderBy(
            F.col("pair_count").desc(),
            F.col("left").asc(),
            F.col("right").asc(),
        )
        .limit(1)
        .collect()
    )
    if not row:
        return None
    r = row[0]
    return r["left"], r["right"], r["pair_count"]


def apply_merge(symbols: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every left-to-right non-overlapping (left, right) adjacency
    into the concatenated symbol — a pure per-row array fold, zero
    shuffles.

    The fold state is (output array, pending symbol): each step either
    completes a merge (pending == left and current == right), flushes the
    pending symbol, or holds the current one; finish flushes the last
    pending symbol. The empty-string sentinel is safe because symbols are
    never empty (split('') never emits them past the seed filter).
    """
    merged = F.lit(left + right)
    fold = F.aggregate(
        F.col("syms"),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pend"),
        ),
        lambda acc, s: F.when(
            (acc["pend"] == F.lit(left)) & (s == F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit("").alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pend"] == F.lit(""), acc["out"]
                ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))).alias(
                    "out"
                ),
                s.alias("pend"),
            )
        ),
        lambda acc: F.when(
            acc["pend"] == F.lit(""), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )
    return symbols.withColumn("syms", fold)


def train_bpe(
    words: DataFrame, n_merges: int, checkpoint_every: int = 8
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Run ``n_merges`` BPE rounds over a (word, freq) table.

    Returns (ordered merge list, final symbolization frame). Per round:
    one distributed pair-count aggregate + a 1-row collect + a row-local
    fold — the k-means-style driver loop. The symbol frame is
    periodically localCheckpointed so lineage doesn't grow linearly with
    merges (same device as the k-means iterate).
    """
    symbols = with_symbols(words)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = best_pair(symbols)
        if top is None or top[2] < 2:
            break
        left, right, _ = top
        merges.append((left, right))
        symbols = apply_merge(symbols, left, right)
        if (i + 1) % checkpoint_every == 0:
            symbols = symbols.localCheckpoint(eager=True)
    return merges, symbols


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Driver-side reference tokenizer: apply the learned merge list in
    order to one word (test utility; the distributed form is the same
    fold ``apply_merge`` runs)."""
    syms = list(word)
    for left, right in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
