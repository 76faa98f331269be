"""Pins for the source-hash staleness detector (r11 verdict task #1).

The rotation must re-verify a gate whose implementation changed after
its last driver adjudication BEFORE spending window slots on untouched
equally-green gates — and that detection must be mechanical (git +
AST), not a hand-maintained list.
"""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from icegopher_spark import gate_hash as gh  # noqa: E402


# ---------------------------------------------------------------------------
# rotation-order pins (pure function, no I/O)


def _order(weight, latest, stale, names=None):
    import __spark_entry__ as E

    names = names or sorted(set(weight) | set(latest) | set(stale))
    return E._rotation_order(list(names), weight, latest, stale)


def test_edited_gate_outsorts_untouched_equally_green_gate():
    """The verdict's done-criterion: same weight, same last-adjudicated
    round — the one whose source changed since that round leads."""
    weight = {"edited": (1, 3.0), "untouched": (1, 3.0)}
    latest = {"edited": 9, "untouched": 9}
    assert _order(weight, latest, stale={"edited"}) == ["edited", "untouched"]


def test_stale_group_leads_regardless_of_recency():
    """A gate edited after a RECENT green still out-sorts an untouched
    gate whose green is older — staleness trumps recency, so the next
    window leads with edited-since-green queries."""
    weight = {"edited_recent": (1, 5.0), "old_green": (1, 1.0)}
    latest = {"edited_recent": 11, "old_green": 2}
    assert _order(weight, latest, stale={"edited_recent"}) == [
        "edited_recent",
        "old_green",
    ]


def test_red_still_leads_stale():
    weight = {"red": (0, 0.25), "edited": (1, 3.0)}
    latest = {"red": 11, "edited": 9}
    assert _order(weight, latest, stale={"edited"}) == ["red", "edited"]


def test_never_adjudicated_joins_stale_group_and_leads_it():
    """New gates (latest round 0) sort inside the stale group ahead of
    edited-but-once-seen gates."""
    weight = {"edited": (1, 2.0)}
    latest = {"edited": 7}
    out = _order(weight, latest, stale={"edited"}, names=["edited", "brand_new"])
    assert out == ["brand_new", "edited"]


def test_hand_list_is_gone():
    import __spark_entry__ as E

    assert not hasattr(E, "_STALE_GREEN"), (
        "the hand-maintained stale list must stay deleted — staleness "
        "is detected mechanically by icegopher_spark.gate_hash"
    )


# ---------------------------------------------------------------------------
# hash mechanics on synthetic sources (deterministic, history-free)

_MOD = "icegopher_spark.__fake_gatehash_mod__"
_SRC_V1 = '''
from pyspark.sql import functions as F

HELPER_SQL = "SELECT 1 AS one"

def helper(df):
    return df.withColumn("x", F.lit(1))

def gate(spark, sf_dir):
    return helper(spark.range(1))
'''
# same behavior-relevant text, different comments/whitespace
_SRC_V1_REFORMATTED = '''
from pyspark.sql import functions as F

# a comment that must NOT change the hash
HELPER_SQL = "SELECT 1 AS one"


def helper(df):
    # another comment
    return df.withColumn("x", F.lit(1))


def gate(spark, sf_dir):
    return helper(spark.range(1))
'''
# helper body changed — the gate's hash must change even though the
# gate function itself is untouched
_SRC_V2_HELPER_EDIT = _SRC_V1.replace('F.lit(1)', 'F.lit(2)')
# unrelated top-level function added — must NOT change the gate's hash
_SRC_V3_UNRELATED = _SRC_V1 + '''
def unrelated(df):
    return df
'''


@pytest.fixture()
def fake_module(monkeypatch):
    """Serve synthetic module sources through the git layer under
    unique fake commit ids (unique keys keep the lru_caches honest)."""
    sources: dict[str, str] = {}
    real_blob = gh._blob.__wrapped__

    def fake_blob(commit, relpath):
        if commit in sources and relpath == "icegopher_spark/__fake_gatehash_mod__.py":
            return sources[commit]
        return real_blob(commit, relpath)

    real_relpath = gh._module_relpath

    def fake_relpath(modname):
        if modname == _MOD:
            return "icegopher_spark/__fake_gatehash_mod__.py"
        return real_relpath(modname)

    monkeypatch.setattr(gh, "_blob", fake_blob)
    monkeypatch.setattr(gh, "_module_relpath", fake_relpath)

    def hash_at(tag: str, source: str) -> str:
        sources[tag] = source
        return gh._gate_hash_from_tree(
            _MOD, "gate", ("git", tag), lambda r: fake_blob(tag, r)
        )

    return hash_at


def test_comment_only_edit_does_not_change_hash(fake_module):
    h1 = fake_module("fakeA", _SRC_V1)
    h2 = fake_module("fakeB", _SRC_V1_REFORMATTED)
    assert h1 is not None and h1 == h2


def test_helper_edit_changes_gate_hash(fake_module):
    h1 = fake_module("fakeC", _SRC_V1)
    h2 = fake_module("fakeD", _SRC_V2_HELPER_EDIT)
    assert h1 is not None and h2 is not None and h1 != h2


def test_unrelated_toplevel_addition_keeps_hash(fake_module):
    h1 = fake_module("fakeE", _SRC_V1)
    h2 = fake_module("fakeF", _SRC_V3_UNRELATED)
    assert h1 is not None and h1 == h2


# ---------------------------------------------------------------------------
# live-repo integration (loose: repo history keeps moving)


def test_current_hashes_exist_for_all_gates():
    from icegopher_spark.queries import QUERIES

    missing = [
        n
        for n, q in QUERIES.items()
        if gh.current_gate_hash(q.fn.__module__, q.fn.__name__) is None
    ]
    assert not missing, f"gates without a computable source hash: {missing}"


def test_stale_gates_is_subset_of_registry():
    import json

    from icegopher_spark.queries import QUERIES

    latest = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(p.read_text())
        rnd = int(p.stem.rsplit("r", 1)[-1])
        for n in rows:
            latest[n] = max(latest.get(n, 0), rnd)
    locs = {n: (q.fn.__module__, q.fn.__name__) for n, q in QUERIES.items()}
    stale = gh.stale_gates(locs, latest)
    assert stale <= set(QUERIES)


def test_round_commit_resolves_for_recorded_rounds():
    rounds = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not rounds:
        pytest.skip("no adjudication history yet")
    last = int(rounds[-1].stem.rsplit("r", 1)[-1])
    assert gh._round_commit(last) is not None


def test_round_commit_untracked_artifact_falls_back_to_predrop_commit():
    """r12 verdict task #1: the driver drops the newest round's
    CORRECTNESS json WITHOUT committing it; _round_commit must still
    resolve (to the last commit predating the drop) instead of marking
    the whole fresh window stale."""
    import subprocess

    rel = "CORRECTNESS_r97.json"
    path = REPO / rel
    if path.exists():
        pytest.skip("round 97 artifact unexpectedly exists")
    gh._round_commit.cache_clear()
    try:
        path.write_text("{}")
        got = gh._round_commit(97)
        assert got is not None
        # the artifact was just written, so the pre-drop commit is HEAD
        head = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
        ).stdout.strip()
        assert got == head
    finally:
        path.unlink(missing_ok=True)
        gh._round_commit.cache_clear()


def test_round_commit_tracked_without_add_commit_stays_unknown(monkeypatch):
    """Shallow-clone shape: the artifact is TRACKED but its add-commit
    is beyond history. The mtime fallback must NOT fire (checkout reset
    the mtime to 'now' → it would pin HEAD and false-green the whole
    round); unknown → stale is the safe direction."""
    rel_calls = []

    def fake_git(*args):
        rel_calls.append(args)
        if args[0] == "log":
            return ""  # no add-commit visible
        if args[0] == "ls-files":
            return "CORRECTNESS_r96.json\n"  # tracked
        return ""

    monkeypatch.setattr(gh, "_git", fake_git)
    gh._round_commit.cache_clear()
    path = REPO / "CORRECTNESS_r96.json"
    try:
        path.write_text("{}")
        assert gh._round_commit(96) is None
    finally:
        path.unlink(missing_ok=True)
        gh._round_commit.cache_clear()
