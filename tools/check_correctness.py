"""Driver-mimicking correctness check: run every registered query on
Spark and its DuckDB oracle, sort columns by name and rows by value,
and compare exactly. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]

Every run also folds its results into ``STALE.json`` at the repo root
(r12 verdict task #2): the driver adjudicates only ~50 gates per round,
so greens earned rounds ago sit under code that has since moved. The
ledger records, per locally re-verified gate, the round of its last
driver adjudication, whether ``gate_hash`` flags it stale against that
round, the source hash the local re-verify ran against, and the result
— so "the builder re-ran the full registry locally" is an auditable
artifact instead of a claim. ``tests/test_stale_ledger.py`` pins that
every gate currently flagged stale carries a ledger pass whose recorded
hash matches the live source.
"""

from __future__ import annotations

import datetime
import json
import subprocess
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from icegopher_spark import gate_hash as gh  # noqa: E402
from icegopher_spark.queries import QUERIES, TABLES  # noqa: E402
from icegopher_spark.session import get_spark  # noqa: E402


def latest_driver_rounds() -> dict[str, int]:
    """Gate name -> most recent round with a CORRECTNESS row."""
    latest: dict[str, int] = {}
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.rsplit("r", 1)[-1])
        try:
            rows = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for n in rows:
            latest[n] = max(latest.get(n, 0), rnd)
    return latest


def update_stale_ledger(results: dict[str, str], sf_dir: str) -> None:
    """Merge this run's per-gate results into STALE.json. Entries for
    gates not in this run are preserved (subset runs refresh only what
    they checked); entries for gates gone from the registry are
    dropped."""
    path = _REPO / "STALE.json"
    try:
        ledger = json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        ledger = {}
    ledger = {k: v for k, v in ledger.items() if k in QUERIES}
    latest = latest_driver_rounds()
    # restrict the staleness sweep to the gates this run actually
    # checked — a single-gate --only re-verify must not pay a
    # full-registry AST + git-blob closure hash
    locs = {
        n: (QUERIES[n].fn.__module__, QUERIES[n].fn.__name__) for n in results
    }
    stale = gh.stale_gates(locs, latest)
    try:
        head = subprocess.run(
            ["git", "-C", str(_REPO), "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip() or None
    except (OSError, subprocess.TimeoutExpired):
        head = None
    now = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    for name, result in results.items():
        mod, fn = locs[name]
        ledger[name] = {
            "last_driver_round": latest.get(name, 0),
            "stale_per_gate_hash": name in stale,
            "locally_reverified_at": now,
            "verified_commit": head,
            "gate_hash": gh.current_gate_hash(mod, fn),
            "result": result,
            "sf": Path(sf_dir).name,
        }
    path.write_text(json.dumps(ledger, indent=1, sort_keys=True) + "\n")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    results: dict[str, str] = {}
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = "fail"
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            results[name] = "rows-only"
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(q.oracle_text()).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = "fail"
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            results[name] = "fail"
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            results[name] = "fail"
            print(f"FAIL  {name}: rows {len(s)} vs {len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            results[name] = "pass"
            print(f"PASS  {name} ({len(s)} rows, {time.time()-t0:.1f}s)")
        except AssertionError as e:
            failures.append(name)
            results[name] = "fail"
            msg = str(e).split("\n")[0:6]
            print(f"FAIL  {name}: value mismatch: {' | '.join(msg)}")
    if results:
        update_stale_ledger(results, sf_dir)
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
