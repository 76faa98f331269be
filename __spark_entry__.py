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


# Queries whose implementation changed AFTER their last green
# adjudication: (names, edit round). Their accumulated weight is
# discounted so the rotation re-verifies them against current code
# ahead of multiply-green queries — but only until a LATER round
# adjudicates them again, at which point the discount expires.
# r3 edit: the TPC-H join block's broadcast hints (queries.py, commit
# 482260b) changed after the block's r1/r2 greens.
_STALE_GREEN: list[tuple[tuple[str, ...], int]] = [
    (
        (
            "q2_min_cost_supplier",
            "q5_local_supplier_volume",
            "q7_volume_shipping",
            "q8_national_market_share",
            "q9_profit_by_nation_year",
            "q10_returned_items",
            "q13_customer_distribution",
            "q15_top_supplier",
            "q18_large_volume_customer",
            "topk_suppliers_per_nation",
        ),
        3,
    ),
    # r4 edits: simhash block tables + sig split, LSH vectorized keys +
    # recall oracles, dedup case-pin refactor (word_ngrams), q15 window
    # removal, multimodal codec autodetect, avro task-commit protocol,
    # events footer probe. All re-verified locally vs oracles this
    # round; listed so the DRIVER's adjudication also lands on current
    # code.
    (
        (
            "dedup_simhash",
            "dedup_minhash_lsh",
            "dedup_ngram_jaccard",
            "dedup_exact",
            "sim_lsh_topk",
            "sim_neardup_embeddings",
            "sim_ivf_topk",
            "sim_ivf_index_topk",
            "mm_thumbnails",
            "mm_image_features",
            "iceberg_avro_roundtrip",
            "events_hourly_rollup",
            "events_sessionization",
        ),
        4,
    ),
]


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


def _stale_discount() -> dict[str, float]:
    latest = _latest_adjudicated_round()
    out: dict[str, float] = {}
    for names, edit_round in _STALE_GREEN:
        for n in names:
            if latest.get(n, 0) <= edit_round:
                out[n] = 2.0
    return out


def _ordered_names() -> list[str]:
    """Rotation order: last-round reds first, then by how LONG AGO the
    query was last adjudicated (never-seen = round 0, so new queries
    lead), then by accumulated scrutiny weight. Recency outranks weight
    (round-5 change): a query green twice in r1+r2 needs re-checking
    more than one green once in r4 — the old weight-first sort left 19
    r1/r2-latest queries behind the 50-query window indefinitely."""
    names = list(QUERIES)
    weight = _adjudication_weight()
    discount = _stale_discount()
    latest = _latest_adjudicated_round()
    index = {n: i for i, n in enumerate(names)}

    def key(n: str):
        red, w = weight.get(n, (0, 0.0))
        return (red, latest.get(n, 0), max(w - discount.get(n, 0.0), 0.0), index[n])

    return sorted(names, key=key)


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
