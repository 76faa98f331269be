"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query smoke check at sf0.001.
queries()         — name → (spark, sf_dir) -> DataFrame, one per
                    implemented operator from SURVEY.md §2.
oracle_sql()      — name → equivalent DuckDB SQL (omitted for the
                    non-SQL-expressible ops → rows-only check).

The driver adjudicates queries in dict order and caps the run (~50 at
round 1), so ``queries()`` orders entries least-adjudicated-first by
scanning past ``CORRECTNESS_r*.json`` results: a query never seen by
the driver sorts before one with a rows-only check, which sorts before
one with a full oracle hash-match. Coverage therefore rotates across
rounds without hand-editing the registry.

Implementations live in icegopher_spark/queries.py.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from icegopher_spark.queries import QUERIES  # noqa: E402


def _adjudication_weight() -> dict[str, tuple[int, float]]:
    """How much driver scrutiny each query has already received, keyed
    for the rotation sort as (red_last_round, total_weight).

    Per round: a full oracle match counts 1.0, a rows-only
    (``no_oracle``) row 0.5, and a FAILED or ERRORED adjudication 0.25
    — so known-red queries out-sort rows-only passes. On top of that,
    any query red in the LATEST round gets red_last_round=0 (everything
    else 1), so last round's failures always lead the capped window
    regardless of accumulated weight.
    """
    weight: dict[str, float] = {}
    red_latest: set[str] = set()
    rounds = sorted(_REPO.glob("CORRECTNESS_r*.json"))
    for path in rounds:
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        latest = path == rounds[-1]
        if latest:
            red_latest.clear()
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                w = 1.0
            elif row.get("err") == "no_oracle":
                w = 0.5
            else:  # hash mismatch, or a real error
                w = 0.25
                if latest:
                    red_latest.add(name)
            weight[name] = weight.get(name, 0.0) + w
    return {
        name: (0 if name in red_latest else 1, w) for name, w in weight.items()
    }


def _latest_adjudicated_round() -> dict[str, int]:
    """query name -> highest round number whose CORRECTNESS file holds
    a row for it."""
    latest: dict[str, int] = {}
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
            rnd = int(path.stem.rsplit("r", 1)[-1])
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name in rows:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _stale_set() -> set[str]:
    """Gates whose source hash differs from the hash at their last
    driver adjudication (r11 verdict task #1: mechanical staleness
    replaces the old hand-maintained _STALE_GREEN list). On any failure
    the gate is treated as stale — re-verify sooner, never trust a
    green the code may have outgrown."""
    try:
        from icegopher_spark import gate_hash

        locations = {
            n: (q.fn.__module__, q.fn.__name__) for n, q in QUERIES.items()
        }
        return gate_hash.stale_gates(locations, _latest_adjudicated_round())
    except Exception:
        return set(QUERIES)


def _rotation_order(
    names: list[str],
    weight: dict[str, tuple[int, float]],
    latest: dict[str, int],
    stale: set[str],
) -> list[str]:
    """Pure rotation sort (factored out for the pytest pin).

    Order: last-round reds first; then the stale group — gates whose
    code changed since their last adjudication, plus never-adjudicated
    gates — so every green the driver reports was earned by the code as
    it stands now; within each group, least-recently-adjudicated first
    (never-seen = round 0 leads), then least accumulated scrutiny, then
    registry order for determinism."""
    index = {n: i for i, n in enumerate(names)}

    def key(n: str):
        red, w = weight.get(n, (0, 0.0))
        in_stale_group = 0 if (n in stale or latest.get(n, 0) == 0) else 1
        return (red, in_stale_group, latest.get(n, 0), w, index[n])

    return sorted(names, key=key)


_ORDER_CACHE: list[str] | None = None


def _ordered_names() -> list[str]:
    # cached per process: the stale-set hash pass costs ~5s and the
    # driver calls queries() and oracle_sql() back-to-back
    global _ORDER_CACHE
    if _ORDER_CACHE is None or set(_ORDER_CACHE) != set(QUERIES):
        _ORDER_CACHE = _rotation_order(
            list(QUERIES),
            _adjudication_weight(),
            _latest_adjudicated_round(),
            _stale_set(),
        )
    return list(_ORDER_CACHE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle_text()
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
