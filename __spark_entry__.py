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


def _adjudication_weight() -> dict[str, float]:
    """How much driver scrutiny each query has already received.

    Full oracle match counts 1.0 per round, a rows-only (``no_oracle``)
    row counts 0.5 — so queries that previously ran rows-only but now
    carry an oracle get re-adjudicated before long-green ones.
    """
    weight: dict[str, float] = {}
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                weight[name] = weight.get(name, 0.0) + 1.0
            else:
                weight[name] = weight.get(name, 0.0) + 0.5
    return weight


def _ordered_names() -> list[str]:
    names = list(QUERIES)
    weight = _adjudication_weight()
    index = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (weight.get(n, 0.0), index[n]))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
