"""Persist-registry thread safety (r9 verdict #8): interleaved calls in
one SparkSession must never orphan a persisted frame (a leak for the
session's lifetime) or corrupt the registry dict — stealing another
in-flight call's warm cache is allowed (costs a recompute only)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

import icegopher_spark.iceberg.write as W
from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg.changelog import _PAIR_CACHES, changelog_df
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField


def _mk(spark, path, n=30):
    schema = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "v", DoubleType(), False),
        ),
        schema_id=0,
    )
    t = W.create_table(str(path), schema)
    df = spark.range(n).select(F.col("id").alias("k"), F.col("id").cast("double").alias("v"))
    t = W.append(t, df)
    t = W.delete_where_mor(t, spark, E.equal_to("k", 1))
    t = W.append(t, spark.createDataFrame([(100, 1.0)], "k long, v double"))
    return t


def _persisted_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_concurrent_changelogs_no_leak(spark, tmp_path):
    tables = [_mk(spark, tmp_path / f"t{i}") for i in range(2)]
    first = [t.metadata.snapshots[0].snapshot_id for t in tables]
    # baseline: other suites in the shared session may hold persisted
    # frames of their own (simhash slot, incremental index, ...) — this
    # test asserts the CHANGELOG registry's growth only
    baseline = _persisted_count(spark) - sum(
        len(v) for v in _PAIR_CACHES.values()
    )

    def run(i: int):
        t = tables[i % 2]
        rows = changelog_df(t, spark, from_snapshot_id=first[i % 2]).collect()
        # delete of k=1 plus insert of k=100 must always be present
        kinds = {(r["k"], r["_change_type"]) for r in rows}
        assert (1, "delete") in kinds and (100, "insert") in kinds

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(run, range(12)))  # raises if any worker failed

    # registry holds at most one frame list per table, and the total
    # persisted-block residency is bounded by what those lists track —
    # nothing orphaned by the interleaving
    # scope to THIS test's tables: the session-shared registry holds
    # other suites' (drained or latest) entries under their own keys
    ours = {t.location for t in tables}
    assert sum(1 for k in _PAIR_CACHES if k in ours) <= 2
    tracked = sum(len(v) for v in _PAIR_CACHES.values())
    assert _persisted_count(spark) - baseline <= tracked + 2


def test_concurrent_simhash_no_leak(spark):
    from icegopher_spark.operators.dedup import _SIMHASH_SIG_CACHE, simhash_neardup_pairs

    df = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 5} jumps over") for i in range(40)],
        "doc_id long, text string",
    )

    def run(_: int):
        simhash_neardup_pairs(df, max_hamming=2).count()

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(run, range(8)))
    assert len(_SIMHASH_SIG_CACHE) == 1  # exactly the latest call's slot
