"""Pins for STALE.json, the local re-verification ledger (r12 verdict
task #2).

The driver adjudicates ~50 of the registry's gates per round, so most
greens are rounds old. ``gate_hash`` mechanically flags gates whose
source moved since their last driver adjudication; this ledger is the
auditable evidence that the builder re-verified those gates locally
against the CURRENT source. The core invariant:

    stale_gates ∩ not-locally-reverified-at-current-hash = ∅

i.e. no gate may sit stale without a ledger pass whose recorded source
hash matches the live tree. Editing an operator without re-running
``tools/check_correctness.py`` on its gates turns this red — by design.
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from icegopher_spark import gate_hash as gh  # noqa: E402
from icegopher_spark.queries import QUERIES  # noqa: E402

LEDGER_PATH = REPO / "STALE.json"

REQUIRED_FIELDS = {
    "last_driver_round",
    "stale_per_gate_hash",
    "locally_reverified_at",
    "verified_commit",
    "gate_hash",
    "result",
    "sf",
}


def _ledger() -> dict:
    if not LEDGER_PATH.exists():
        pytest.skip("STALE.json not yet emitted (run tools/check_correctness.py)")
    return json.loads(LEDGER_PATH.read_text())


def _latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.rsplit("r", 1)[-1])
        for n in json.loads(p.read_text()):
            latest[n] = max(latest.get(n, 0), rnd)
    return latest


def test_ledger_keys_subset_of_registry():
    ledger = _ledger()
    assert set(ledger) <= set(QUERIES), sorted(set(ledger) - set(QUERIES))


def test_ledger_entries_well_formed():
    ledger = _ledger()
    for name, entry in ledger.items():
        assert REQUIRED_FIELDS <= set(entry), (name, sorted(entry))
        assert entry["result"] in {"pass", "fail", "rows-only"}, name
        assert isinstance(entry["last_driver_round"], int), name


def test_stale_greens_carry_current_hash_local_pass():
    """Every gate flagged stale by gate_hash must have been locally
    re-verified against the exact source now in the tree."""
    ledger = _ledger()
    latest = _latest_rounds()
    locs = {n: (q.fn.__module__, q.fn.__name__) for n, q in QUERIES.items()}
    stale = gh.stale_gates(locs, latest)
    unverified = sorted(
        n
        for n in stale
        if ledger.get(n, {}).get("result") not in {"pass", "rows-only"}
        or ledger.get(n, {}).get("gate_hash") != gh.current_gate_hash(*locs[n])
    )
    assert unverified == [], (
        f"{len(unverified)} stale gates lack a current-hash local pass "
        f"(run: python tools/check_correctness.py /root/testdata/sf0.01 "
        f"{' '.join(unverified[:8])}...): {unverified}"
    )


def test_no_ledger_fail_results():
    ledger = _ledger()
    failed = sorted(n for n, e in ledger.items() if e["result"] == "fail")
    assert failed == [], failed
