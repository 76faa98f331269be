"""Registry/docs consistency: the gate count published in COVERAGE.md
must match the live `queries()` registry (r8 verdict item #5 — the doc
said 156 while the registry had 157; this pins the number so it can
never drift again)."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_registry_count_matches_docs():
    import __spark_entry__ as E

    q = E.queries()
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"^GATE_COUNT:\s*(\d+)\s*$", text, re.M)
    assert m, "COVERAGE.md must carry a machine-parsable 'GATE_COUNT: N' line"
    assert int(m.group(1)) == len(q), (
        f"COVERAGE.md GATE_COUNT={m.group(1)} but queries() has {len(q)} "
        "entries — update the doc when adding/removing gates"
    )


def test_every_query_has_oracle_or_is_documented():
    """Every registry entry carries an oracle (the r6+ invariant:
    zero rows-only checks)."""
    import __spark_entry__ as E

    q = set(E.queries())
    o = set(E.oracle_sql())
    missing = q - o
    assert not missing, f"queries without oracle_sql entries: {sorted(missing)}"
    extra = o - q
    assert not extra, f"oracle_sql entries without queries: {sorted(extra)}"
