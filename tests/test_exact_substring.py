"""Exact-substring contamination semantics (plans/pii.py): planted
corpora with KNOWN shared spans — the discriminating cases the driver
hash can't isolate (it only proves Spark == DuckDB on the shipped
corpus)."""

from __future__ import annotations

from options_data_pipeline_spark.plans.pii import (
    EXSUB_N,
    exact_substring_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tokens(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_verbatim_copy_reports_full_span(spark):
    """A 20-token verbatim copy must report max_span_tokens == 20 and
    n_hits == 20 - N + 1 matching windows."""
    span = _tokens("s", 20)
    rows = [
        (7, span + " " + _tokens("e", 10)),          # eval doc
        (1, _tokens("a", 15) + " " + span),          # train doc with copy
        (2, _tokens("b", 30)),                       # clean train doc
    ]
    out = {
        (r["train_doc"], r["eval_doc"]): r
        for r in exact_substring_spans(_docs(spark, rows)).collect()
    }
    assert set(out) == {(1, 7)}
    assert out[(1, 7)]["max_span_tokens"] == 20
    assert out[(1, 7)]["n_hits"] == 20 - EXSUB_N + 1


def test_scattered_phrase_vs_contiguous_copy(spark):
    """Two disjoint 8-token matches must NOT fuse into one long span —
    the property hit-count screens lack: n_hits is the same whether the
    overlap is scattered or contiguous, max_span_tokens is not."""
    p1, p2 = _tokens("p", EXSUB_N), _tokens("q", EXSUB_N)
    rows = [
        (7, p1 + " " + p2),                               # eval: p1 then p2
        # train doc 1: both phrases, separated by filler (scattered)
        (1, p1 + " " + _tokens("x", 12) + " " + p2),
        # train doc 2: the contiguous 16-token copy
        (2, _tokens("y", 5) + " " + p1 + " " + p2 + " " + _tokens("z", 5)),
    ]
    out = {
        r["train_doc"]: r
        for r in exact_substring_spans(_docs(spark, rows)).collect()
    }
    assert out[1]["max_span_tokens"] == EXSUB_N   # scattered: two 8-spans
    assert out[2]["max_span_tokens"] == 2 * EXSUB_N  # contiguous: one 16
    # same window hit count on the contiguous side as two scattered + the
    # 8 bridging windows
    assert out[2]["n_hits"] == EXSUB_N + 1


def test_sub_n_overlap_invisible(spark):
    """Shared runs shorter than N tokens produce no report — the screen's
    floor, by design (that regime belongs to ngram_contamination)."""
    short = _tokens("s", EXSUB_N - 1)
    rows = [
        (7, short + " " + _tokens("e", 10)),
        (1, _tokens("a", 10) + " " + short),
    ]
    assert exact_substring_spans(_docs(spark, rows)).count() == 0


def test_repeated_gram_in_eval_does_not_inflate(spark):
    """A gram occurring TWICE in the eval doc must not double-count
    train hits (the DISTINCT on (pair, diag, tpos) plus countDistinct
    tpos)."""
    p = _tokens("p", EXSUB_N)
    rows = [
        (7, p + " " + p),                    # eval repeats the phrase
        (1, _tokens("a", 10) + " " + p),     # train has it once
    ]
    out = exact_substring_spans(_docs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_hits"] == 1
    assert out[0]["max_span_tokens"] == EXSUB_N
