"""Streaming Iceberg sink: snapshot-per-batch appends, exactly-once on
batch replay, and the full incremental-source -> transform -> Iceberg
sink loop."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType
from icegopher_spark.streaming.iceberg_sink import (
    committed_batches,
    foreach_batch_appender,
    write_stream_to_iceberg,
)
from icegopher_spark.streaming.pipelines import read_events_stream

SF_DIR = "/root/testdata/sf0.001"

EVENTS_SCHEMA = Schema(
    (
        NestedField(1, "event_id", LongType(), True),
        NestedField(2, "user_id", LongType(), False),
        NestedField(3, "event_type", StringType(), False),
        NestedField(4, "value", DoubleType(), False),
    ),
    schema_id=0,
)


def test_stream_into_iceberg_table(spark, tmp_path):
    t = W.create_table(str(tmp_path / "sink"), EVENTS_SCHEMA)
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    write_stream_to_iceberg(stream, t, str(tmp_path / "ckpt"), query_id="q1")

    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    got = t.scan().to_df(spark)
    assert got.count() == n_events
    snap = t.current_snapshot()
    assert snap.summary["streaming.query-id"] == "q1"
    assert committed_batches(t, "q1") != set()


def test_replayed_batch_is_noop(spark, tmp_path):
    t = W.create_table(str(tmp_path / "sink"), EVENTS_SCHEMA)
    df = (
        spark.range(100)
        .selectExpr(
            "id AS event_id", "id % 7 AS user_id", "'view' AS event_type", "1.5 AS value"
        )
    )
    appender = foreach_batch_appender(t, "q2")
    appender(df, 0)
    assert t.scan().to_df(spark).count() == 100
    v1 = len(t.metadata.snapshots)
    appender(df, 0)  # replay after simulated failure
    assert t.scan().to_df(spark).count() == 100  # no duplicates
    assert len(t.metadata.snapshots) == v1  # no new snapshot
    appender(df, 1)  # a genuinely new batch appends
    assert t.scan().to_df(spark).count() == 200
    assert committed_batches(t, "q2") == {0, 1}


def test_incremental_source_to_sink_loop(spark, tmp_path):
    """Iceberg -> Iceberg CDC: appends land in the source table; the
    snapshot-diff incremental read feeds the sink table."""
    src = W.create_table(str(tmp_path / "src"), EVENTS_SCHEMA)
    dst = W.create_table(str(tmp_path / "dst"), EVENTS_SCHEMA)
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS event_id", "id % 5 AS user_id", "'buy' AS event_type", "2.0 AS value"
    )
    src = W.append(src, mk(0, 50))
    src = W.append(src, mk(50, 80))
    s1, s2 = (s.snapshot_id for s in src.metadata.snapshots)
    # the "stream": files added between snapshots, pushed to the sink
    delta = src.scan().incremental_to_df(spark, s1, s2)
    appender = foreach_batch_appender(dst, "cdc")
    appender(delta, 0)
    assert dst.scan().to_df(spark).count() == 30
    got = sorted(r["event_id"] for r in dst.scan().to_df(spark).collect())
    assert got == list(range(50, 80))


def test_inline_maintenance_compacts_small_batches(spark, tmp_path):
    t = W.create_table(str(tmp_path / "sink_m"), EVENTS_SCHEMA)
    appender = foreach_batch_appender(t, "q3", compact_every=3, rewrite_manifests_every=3)
    for b in range(6):
        df = spark.range(b * 10, b * 10 + 10).selectExpr(
            "id AS event_id", "id % 7 AS user_id", "'view' AS event_type", "1.5 AS value"
        ).coalesce(1)
        appender(df, b)
    assert t.scan().to_df(spark).count() == 60  # maintenance lost nothing
    # compaction bin-packed the per-batch small files
    tasks = t.scan().plan_files()
    assert len(tasks) < 6
    # rewritten manifests: planning reads O(1) manifests, not one/batch
    from icegopher_spark.iceberg.manifests import read_manifest_list

    snap = t.current_snapshot()
    manifests = read_manifest_list(t.io.read(snap.manifest_list))
    assert len(manifests) <= 2
    # replay idempotency survives maintenance snapshots in history
    v = len(t.metadata.snapshots)
    appender(
        spark.range(10).selectExpr(
            "id AS event_id", "id % 7 AS user_id", "'view' AS event_type", "1.5 AS value"
        ),
        2,
    )
    assert len(t.metadata.snapshots) == v
    assert t.scan().to_df(spark).count() == 60


def test_upsert_sink_latest_key_wins(spark, tmp_path):
    from icegopher_spark.streaming.iceberg_sink import foreach_batch_upserter

    t = W.create_table(str(tmp_path / "upsink"), EVENTS_SCHEMA)
    up = foreach_batch_upserter(t, "q4", ["event_id"])

    def batch(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double"
        ).coalesce(1)

    up(batch([(1, 10, "view", 1.0), (2, 20, "view", 2.0)]), 0)
    up(batch([(2, 20, "buy", 9.0), (3, 30, "view", 3.0)]), 1)  # updates key 2
    got = {r["event_id"]: r for r in t.scan().to_df(spark).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2]["event_type"] == "buy" and got[2]["value"] == 9.0
    # replay of batch 1 is a no-op (no new snapshot, same contents)
    n_snaps = len(t.metadata.snapshots)
    up(batch([(2, 20, "buy", 9.0), (3, 30, "view", 3.0)]), 1)
    assert len(t.metadata.snapshots) == n_snaps
    assert t.scan().to_df(spark).count() == 3
    # first-commit path stamped too: batch 0 recorded on an empty table
    from icegopher_spark.streaming.iceberg_sink import committed_batches

    assert committed_batches(t, "q4") == {0, 1}


def test_two_queries_same_table_get_distinct_default_query_ids(spark, tmp_path):
    """r6: the default query_id derives from the CHECKPOINT, not the
    table — two distinct queries writing the same table previously
    shared an idempotency namespace, and the second query's batch ids
    looked already-committed: its batches were silently dropped."""
    t = W.create_table(str(tmp_path / "sink2"), EVENTS_SCHEMA)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    def run(ck):
        stream = read_events_stream(spark, f"{SF_DIR}/events.parquet").select(
            "event_id", "user_id", "event_type", "value"
        )
        write_stream_to_iceberg(stream, t, str(tmp_path / ck))  # no query_id

    run("ck_a")
    run("ck_b")  # same batch ids (0..), different logical query
    t.refresh()
    assert t.scan().to_df(spark).count() == 2 * n_events
    qids = {
        s.summary.get("streaming.query-id") for s in t.metadata.snapshots
    } - {None}
    assert len(qids) == 2  # one namespace per checkpoint


def test_replayed_batch_recommits_after_rollback(spark, tmp_path):
    """r8 review wave 6: committed_batches must consult the current
    branch's ANCESTRY — a batch undone by rollback_to stays in
    metadata.snapshots until expiration, and counting it as committed
    silently dropped its replay (exactly-once became data loss)."""
    from icegopher_spark.iceberg import refs, write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_sink import (
        committed_batches,
        foreach_batch_appender,
    )

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "rb")
    t = W.create_table(loc, sch)
    app = foreach_batch_appender(t, "q1")
    app(spark.range(0, 5).selectExpr("id AS k"), 0)
    good = t.current_snapshot().snapshot_id
    app(spark.range(5, 10).selectExpr("id AS k"), 1)
    assert committed_batches(t, "q1") == {0, 1}

    # undo batch 1
    t2 = refs.rollback_to(t, good)
    assert committed_batches(t2, "q1") == {0}  # ancestry, not full list
    # the replay re-commits instead of silently no-opping
    app2 = foreach_batch_appender(t2, "q1")
    app2(spark.range(5, 10).selectExpr("id AS k"), 1)
    assert sorted(r["k"] for r in t2.scan().to_df(spark).collect()) == list(range(10))
