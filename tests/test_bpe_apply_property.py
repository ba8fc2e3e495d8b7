"""Property tests for the bpe_apply_expr encoding (no Spark needed):
the space-wrapped symbol encoding + left-to-right literal replace chain
must segment EXACTLY like the reference greedy tokenizer
(operators/bpe.py segment_word), because Python str.replace shares the
left-to-right non-overlapping semantics of Spark's replace() and
DuckDB's replace(). Pinning the equivalence here means the engines only
need to match the STRING OPS, which the oracle hash already proves."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from options_data_pipeline_spark.operators.bpe import segment_word
from options_data_pipeline_spark.plans.options import _log_binoms


def _encode(word: str) -> str:
    return " " + "  ".join(list(word)) + " "


def _apply_chain(word: str, merges: list[tuple[str, str]]) -> list[str]:
    e = _encode(word)
    for left, right in merges:
        e = e.replace(f" {left}  {right} ", f" {left}{right} ")
    return e.replace("  ", " ").strip().split(" ")


@settings(max_examples=300, deadline=None)
@given(
    word=st.text(alphabet="abcde", min_size=1, max_size=12),
    merge_idx=st.lists(
        st.tuples(
            st.sampled_from("abcde"),
            st.sampled_from("abcde"),
        ),
        min_size=0,
        max_size=6,
    ),
)
def test_replace_chain_equals_reference_tokenizer(word, merge_idx):
    # grow multi-char merges the way training does: later merges may
    # reference tokens produced by earlier ones
    merges = list(merge_idx)
    assert _apply_chain(word, merges) == segment_word(word, merges)


@settings(max_examples=50, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=10),
)
def test_replace_chain_overlapping_merges(word):
    # the classic overlap trap: merge (a, a) over runs of 'a' must pair
    # left-to-right without overlap ('aaa' -> ['aa', 'a'])
    merges = [("a", "a"), ("aa", "aa"), ("b", "b")]
    assert _apply_chain(word, merges) == segment_word(word, merges)


def test_log_binoms_match_exact_binomials():
    for n in (8, 16, 64):
        lc = _log_binoms(n)
        assert len(lc) == n + 1
        for k in range(n + 1):
            assert math.isclose(
                lc[k], math.log(math.comb(n, k)), rel_tol=1e-12, abs_tol=1e-12
            )
