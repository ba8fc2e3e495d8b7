"""BPE trainer (operators/bpe.py): hand-computable merges on the classic
corpus, reconstruction invariants, and the distributed fold vs the
driver-side reference tokenizer."""

from __future__ import annotations

import pytest

from options_data_pipeline_spark.operators.bpe import (
    apply_merge,
    best_pair,
    pair_counts,
    segment_word,
    train_bpe,
    with_symbols,
    word_freq_table,
)


@pytest.fixture(scope="module")
def words(spark):
    # Sennrich et al.'s worked example: freqs chosen so merges are
    # unambiguous (es -> est -> lo -> ...)
    data = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    return spark.createDataFrame(data, "word string, freq long")


def test_pair_counts_are_freq_weighted(spark, words):
    rows = {
        (r["left"], r["right"]): r["pair_count"]
        for r in pair_counts(with_symbols(words)).collect()
    }
    # 'es' appears in newest(6) and widest(3)
    assert rows[("e", "s")] == 9
    # 'lo' in low(5) and lower(2)
    assert rows[("l", "o")] == 7


def test_training_learns_expected_merges(spark, words):
    merges, final = train_bpe(words, n_merges=4)
    assert merges[0] == ("e", "s")       # 9, the global max
    assert merges[1] == ("es", "t")      # est: 9
    assert ("l", "o") in merges[:4]      # lo: 7
    # reconstruction: concatenated symbols always equal the word
    for r in final.collect():
        assert "".join(r["syms"]) == r["word"]


def test_apply_merge_is_left_to_right_nonoverlapping(spark):
    df = spark.createDataFrame([("aaa", 1)], "word string, freq long")
    out = apply_merge(with_symbols(df), "a", "a").collect()[0]["syms"]
    assert out == ["aa", "a"]


def test_distributed_fold_matches_reference_tokenizer(spark, words):
    merges, final = train_bpe(words, n_merges=6)
    for r in final.collect():
        assert r["syms"] == segment_word(r["word"], merges)


def test_best_pair_tiebreak_is_lexicographic(spark):
    df = spark.createDataFrame(
        [("ab", 3), ("cd", 3)], "word string, freq long"
    )
    assert best_pair(with_symbols(df))[:2] == ("a", "b")


def test_word_freq_table_counts(spark):
    docs = spark.createDataFrame(
        [("x", "the cat the hat"), ("y", "the end")],
        "doc_id string, text string",
    )
    rows = {r["word"]: r["freq"] for r in word_freq_table(docs).collect()}
    assert rows == {"the": 3, "cat": 1, "hat": 1, "end": 1}


def _bpe_parity(spark, tmp_path, texts):
    """Run q_bpe_tokenize and its oracle over a synthetic corpus and
    assert the strict-canon match (ADVICE r6: the Spark side breaks the
    merge loop at pair-count < 2; the oracle must stop at the same
    round, not unroll all six)."""
    import duckdb
    import pandas as pd

    from options_data_pipeline_spark.plans.text import (
        oracle_bpe_tokenize,
        q_bpe_tokenize,
    )
    from tests._compare import assert_frames_match

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    spark_pdf = q_bpe_tokenize(spark, str(tmp_path)).toPandas()
    ddb = duckdb.connect()
    ddb.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle_pdf = ddb.execute(oracle_bpe_tokenize()).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, "bpe_tokenize[degenerate]")
    return spark_pdf


def test_bpe_tokenize_oracle_parity_zero_merges(spark, tmp_path):
    # every pair occurs once -> Spark breaks immediately; the oracle
    # must yield zero rows too
    out = _bpe_parity(spark, tmp_path, ["ab cd ef"])
    assert len(out) == 0


def test_bpe_tokenize_oracle_parity_early_stop(spark, tmp_path):
    # (a,a) count 2 -> exactly one merge, then no pair reaches count 2:
    # both sides must stop after step 1 of the 6 unrolled rounds
    out = _bpe_parity(spark, tmp_path, ["aa", "aa"])
    assert list(out["step"]) == [1]
