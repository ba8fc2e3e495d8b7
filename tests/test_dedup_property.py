"""Property-based invariants of the near-dup pipelines under random
corpora: an independent Python model of bigram-set Jaccard adjudicates
every reported pair (soundness is EXACT — the LSH narrows candidates,
verification is true Jaccard), and exact-dup grouping must recover every
identical text. Word pools are tiny on purpose: collisions and shared
shingles become common, stressing the bucket join."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from options_data_pipeline_spark.operators import dedup as D

WORDS = ["a", "b", "c", "d", "e"]


def _bigram_set(text: str) -> set[str]:
    w = text.split(" ")
    return {f"{x} {y}" for x, y in zip(w, w[1:])}


def _jaccard(a: str, b: str) -> float:
    sa, sb = _bigram_set(a), _bigram_set(b)
    if not sa and not sb:
        return 0.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


texts = st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join)
corpora = st.lists(texts, min_size=2, max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpora)
def test_minhash_reported_pairs_are_true_near_dups(spark, corpus):
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    out = D.minhash_near_dups(docs, threshold=0.5).collect()
    by_id = dict(enumerate(corpus))
    for r in out:
        assert r.doc_a < r.doc_b
        j = _jaccard(by_id[r.doc_a], by_id[r.doc_b])
        assert abs(j - r.jaccard) < 1e-9  # verification IS true Jaccard
        assert j >= 0.5


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpora)
def test_exact_dup_groups_recover_identical_texts(spark, corpus):
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    groups = {
        r.content_hash: (r.canonical_doc_id, r.n_copies)
        for r in D.exact_dup_groups(docs).collect()
    }
    import hashlib

    want: dict[str, list[int]] = {}
    for i, t in enumerate(corpus):
        want.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
    assert {h: (min(ids), len(ids)) for h, ids in want.items()} == groups
