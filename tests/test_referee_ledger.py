"""The referee-coverage ledger (tools/referee_coverage.py) must stay
synced to the live contract: every queries() entry present, no stale
entries, every cited test existing, and ZERO parity-only queries —
each of the 151 has at least one non-oracle referee or targeted
property test. This is the invariant that keeps new queries from
shipping with oracle parity as their only correctness evidence."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_ledger_synced_and_no_parity_only_queries():
    import referee_coverage

    assert referee_coverage.validate() == []


def test_every_query_has_a_referee_class():
    import referee_coverage

    missing = [
        q
        for q, ev in referee_coverage.LEDGER.items()
        if not ev.get("referee")
    ]
    assert missing == [], f"queries with property-only evidence: {missing}"


def test_committed_artifact_matches_ledger():
    """REFEREE_COVERAGE.json is generated from the LEDGER
    (`python tools/referee_coverage.py --write`); a ledger change
    without regenerating the artifact must fail here, never drift."""
    import json

    import referee_coverage

    with open(referee_coverage.ARTIFACT_PATH) as fh:
        committed = json.load(fh)
    assert committed == referee_coverage.artifact_dict()


def test_property_coverage_floor():
    """Round-9 floor (VERDICT r8 #4 closed the ratchet): EVERY contract
    query carries a targeted property or plan test on top of the oracle
    referee — the ledger ENFORCES it, so a new query cannot ship with
    oracle parity plus blanket guards as its only evidence."""
    import referee_coverage

    n_prop = sum(
        1 for ev in referee_coverage.LEDGER.values() if ev["property"]
    )
    n_total = len(referee_coverage.LEDGER)
    assert n_prop == n_total, (
        f"property/plan coverage regressed to {n_prop} < {n_total}"
    )
