"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query smoke check at sf0.001.
queries()         — name → (spark, sf_dir) -> DataFrame, one per
                    implemented operator from SURVEY.md §2.
oracle_sql()      — name → equivalent DuckDB SQL (omitted for the
                    non-SQL-expressible ops → rows-only check).

Implementations live in icegopher_spark/queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from icegopher_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
