"""Committed-artifact integrity (VERDICT r7 ask #1): the round-7
end-of-round snapshot committed a mid-run ``driver_sim`` output and
truncated the 206-entry sf0.01 self-adjudication artifact to 1 entry.
Two defenses now exist: ``tools/driver_sim.py`` writes a ``.partial``
sidecar and atomically renames on completion, and this gate asserts the
CURRENT round's committed ``CORRECTNESS_SELF_*`` artifacts carry exactly
the registry's query set — a truncated or stale artifact fails CI.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from options_data_pipeline_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _self_artifacts_by_round() -> dict[int, list[str]]:
    by_round: dict[int, list[str]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_SELF_r*.json")):
        m = re.match(r"CORRECTNESS_SELF_r(\d+)", os.path.basename(path))
        if m:
            by_round.setdefault(int(m.group(1)), []).append(path)
    return by_round


def test_no_partial_sidecar_committed():
    # a sidecar in the WORKING TREE is fine (an in-flight driver_sim
    # run); the invariant is that one can never be TRACKED/committed
    import subprocess

    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_SELF*.partial"],
        cwd=REPO, capture_output=True, text=True, timeout=30,
    ).stdout.strip()
    assert not tracked, (
        f"driver_sim sidecar committed to git — remove it: {tracked}"
    )


def test_latest_self_adjudication_matches_registry():
    by_round = _self_artifacts_by_round()
    if not by_round:
        pytest.skip("no self-adjudication artifacts yet")
    latest = max(by_round)
    expected = set(registry.queries())
    problems = []
    for path in sorted(by_round[latest]):
        with open(path) as fh:
            got = set(json.load(fh))
        if got != expected:
            missing = sorted(expected - got)[:5]
            extra = sorted(got - expected)[:5]
            problems.append(
                f"{os.path.basename(path)}: {len(got)} entries vs "
                f"{len(expected)} registry queries; missing={missing} "
                f"extra={extra}"
            )
    assert not problems, (
        "latest-round self-adjudication artifacts out of sync with the "
        "registry (truncated commit or stale regeneration):\n"
        + "\n".join(problems)
    )


def test_latest_self_adjudication_is_green():
    by_round = _self_artifacts_by_round()
    if not by_round:
        pytest.skip("no self-adjudication artifacts yet")
    latest = max(by_round)
    for path in sorted(by_round[latest]):
        with open(path) as fh:
            report = json.load(fh)
        bad = [
            name
            for name, row in report.items()
            if not row.get("hash_match") and row.get("err") != "no_oracle"
        ]
        assert not bad, f"{os.path.basename(path)}: non-green rows {bad[:10]}"
