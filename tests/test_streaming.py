"""Structured Streaming pipelines replayed with availableNow and
compared against their batch twins."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.queries import load
from icegopher_spark.streaming import pipelines as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return P.read_events_stream(spark, f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def events_batch(spark):
    return load(spark, SF, "events")


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming


def test_hourly_rollup_matches_batch(spark, events_stream, events_batch):
    out = P.run_stream_to_table(P.hourly_rollup(events_stream), spark, "update")
    batch = (
        events_batch.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0


def test_sliding_each_event_in_two_windows(spark, events_stream, events_batch):
    out = P.run_stream_to_table(P.sliding_counts(events_stream), spark, "update")
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == 2 * events_batch.count()


def test_session_rollup_counts(spark, events_stream, events_batch):
    out = P.run_stream_to_table(
        P.session_rollup(events_stream, watermark="0 seconds"), spark, "append"
    )
    # every emitted session has ≥1 event; total ≤ event count
    assert 0 < out.count() <= events_batch.count()
    assert out.filter(F.col("n_events") < 1).count() == 0


def test_stream_dedup_noop_on_unique_ids(spark, events_stream, events_batch):
    out = P.run_stream_to_table(P.stream_dedup(events_stream), spark, "append")
    assert out.count() == events_batch.select("event_id").distinct().count()


def test_running_user_totals_matches_batch(spark, events_stream, events_batch):
    out = P.run_stream_to_table(P.running_user_totals(events_stream), spark, "update")
    batch = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    got = out.select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_custom_sessionizer_matches_native_session_window(spark):
    """applyInPandasWithState + EventTimeTimeout sessionizer must close
    exactly the sessions the native session_window closes (append mode,
    watermark-complete sessions), with identical bounds and counts."""
    ev = P.read_events_stream(spark, f"{SF}/events.parquet")
    native = P.run_stream_to_table(
        P.session_rollup(ev, watermark="0 seconds"), spark, "append"
    )
    ev2 = P.read_events_stream(spark, f"{SF}/events.parquet")
    custom = P.run_stream_to_table(
        P.custom_sessionizer(ev2, gap_minutes=30, watermark="0 seconds"), spark, "append"
    )
    key = lambda r: (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
    assert sorted(map(key, custom.collect())) == sorted(map(key, native.collect()))


def test_stream_stream_full_outer_emits_both_null_sides(spark):
    """FULL outer = inner matches + watermark-expired nulls from BOTH
    sides (left join only emits view-side nulls)."""
    from icegopher_spark import streaming_queries as SQ

    out = SQ.stream_stream_full_join(spark, SF).cache()
    n_view_null = out.filter("view_id IS NULL").count()
    n_purch_null = out.filter("purchase_id IS NULL").count()
    n_matched = out.filter("view_id IS NOT NULL AND purchase_id IS NOT NULL").count()
    assert n_view_null > 0 and n_purch_null > 0 and n_matched > 0
    # every row carries the surviving side's user_id
    assert out.filter("user_id IS NULL").count() == 0
    out.unpersist()


def test_static_enriched_rollup_matches_batch(spark, events_stream, events_batch):
    dim = load(spark, SF, "customer").select("c_custkey", "c_nationkey")
    out = P.run_stream_to_table(P.static_enriched_rollup(events_stream, dim), spark, "update")
    batch = (
        events_batch.join(dim, events_batch.user_id == dim.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_iceberg_stream_source_tails_incrementally(spark, tmp_path):
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_source import IcebergAppendStreamSource

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "tail")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(0, 10).selectExpr("id AS k"))
    t = W.append(t, spark.range(10, 20).selectExpr("id AS k"))

    spark.dataSource.register(IcebergAppendStreamSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("icegopher_appends")
            .option("location", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r["k"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(20))
    # restart from the SAME checkpoint after a new append: offsets are
    # persisted snapshot indices, so the old snapshots do NOT replay —
    # any reprocessing would show up as duplicates in the append sink
    W.append(t, spark.range(20, 25).selectExpr("id AS k"))
    assert drain() == list(range(25))


def test_iceberg_stream_source_projects_evolved_schema(spark, tmp_path):
    import uuid

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.evolve import update_schema
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, StringType
    from icegopher_spark.streaming.iceberg_source import IcebergAppendStreamSource

    sch = Schema(
        (NestedField(1, "k", LongType(), True), NestedField(2, "name", StringType(), False)),
        schema_id=0,
    )
    loc = str(tmp_path / "evo")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(3).select(F.col("id").alias("k"), F.lit("old").alias("name")))
    t = update_schema(t).rename_column("name", "label").commit()
    t = W.append(t, spark.range(3, 5).select(F.col("id").alias("k"), F.lit("new").alias("label")))

    spark.dataSource.register(IcebergAppendStreamSource)
    name = "evo" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("icegopher_appends")
        .option("location", loc)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    assert got == [(0, "old"), (1, "old"), (2, "old"), (3, "new"), (4, "new")]


def test_iceberg_stream_source_survives_snapshot_expiration(spark, tmp_path):
    """Offsets anchor on snapshot IDs, not list indices: expiring old
    snapshots between drains must not shift the stream's position."""
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.maintenance import expire_snapshots
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_source import IcebergAppendStreamSource

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "exp")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(0, 10).selectExpr("id AS k"))
    t = W.append(t, spark.range(10, 20).selectExpr("id AS k"))

    spark.dataSource.register(IcebergAppendStreamSource)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("icegopher_appends")
            .option("location", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r["k"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(20))
    # maintenance drops the first snapshot (indices shift by 1), then a
    # new append lands; the checkpointed stream must emit ONLY the new
    # rows — an index-based offset would replay snapshot 2's rows
    t = expire_snapshots(t, retain_last=1, delete_files=False)
    assert len(t.metadata.snapshots) == 1
    W.append(t, spark.range(20, 25).selectExpr("id AS k"))
    assert drain() == list(range(25))


def test_iceberg_stream_source_admission_control(spark, tmp_path):
    """max-snapshots-per-trigger bounds steady-state batch size: with 4
    appends and a cap of 1, processAllAvailable takes one snapshot per
    micro-batch after the first."""
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_source import IcebergAppendStreamSource

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "adm")
    t = W.create_table(loc, sch)
    for i in range(4):
        t = W.append(t, spark.range(i * 5, i * 5 + 5).selectExpr("id AS k"))

    spark.dataSource.register(IcebergAppendStreamSource)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("icegopher_appends")
        .option("location", loc)
        .option("max-snapshots-per-trigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == list(range(20))


def test_iceberg_stream_source_refuses_delete_snapshots(spark, tmp_path):
    """Append-only contract is ENFORCED (round-5 ADVICE): a streamed
    overwrite/delete snapshot raises in planning instead of silently
    emitting rows that are logically deleted; skip-*-snapshots options
    opt into skipping the snapshot wholesale."""
    from pyspark.sql.utils import StreamingQueryException

    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_source import IcebergAppendStreamSource

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "del")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(0, 10).selectExpr("id AS k"))
    t = W.delete_where(t, spark, E.less_than("k", 3))  # CoW delete snapshot
    t = W.append(t, spark.range(10, 15).selectExpr("id AS k"))

    spark.dataSource.register(IcebergAppendStreamSource)

    def drain(opts):
        rdr = spark.readStream.format("icegopher_appends").option("location", loc)
        for k, v in opts.items():
            rdr = rdr.option(k, v)
        q = (
            rdr.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r["k"] for r in spark.read.parquet(str(tmp_path / "out")).collect())

    op = t.metadata.snapshots[1].summary.get("operation")
    assert op in ("overwrite", "delete")
    with pytest.raises(StreamingQueryException, match="cannot be retracted"):
        drain({})
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    shutil.rmtree(str(tmp_path / "out"), ignore_errors=True)
    # skipping the delete snapshot streams only the two appends' rows
    got = drain({f"skip-{op}-snapshots": "true"})
    assert got == list(range(10)) + list(range(10, 15))


def test_stream_minhash_index_contents_equal_batch(spark, tmp_path):
    """The streamed index must hold exactly the batch-computed band
    entries (micro-batching cannot change per-doc signatures)."""
    import os

    from icegopher_spark.operators import dedup as D
    from icegopher_spark.streaming.iceberg_sink import foreach_batch_appender

    src = "/root/testdata/sf0.001/documents.parquet"
    schema = spark.read.parquet(src).schema
    sdir = str(tmp_path / "src")
    os.makedirs(sdir)
    os.symlink(os.path.abspath(src), f"{sdir}/documents.parquet")

    t = D.minhash_index_create(str(tmp_path / "idx"))
    app = foreach_batch_appender(t, "qid")

    def ingest(bdf, bid):
        e = D.minhash_band_entries(bdf, max_doc_freq=None).select(
            F.col("band").cast("int").alias("band"), "key", "id"
        )
        app(e, bid)

    q = (
        spark.readStream.schema(schema)
        .parquet(sdir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t.refresh()
    got = sorted(map(tuple, t.scan().to_df(spark).collect()))
    want = sorted(
        map(
            tuple,
            D.minhash_band_entries(spark.read.parquet(src), max_doc_freq=None)
            .select(F.col("band").cast("int"), "key", "id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_iceberg_stream_source_skips_unpublished_branch_snapshots(spark, tmp_path):
    """WAP staging (r6): snapshots appended on a branch live in
    md.snapshots but are NOT on main's ancestry — the append stream
    must not emit them until published, and must emit them after."""
    from icegopher_spark.iceberg import refs, write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_source import IcebergAppendStreamSource

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "wap")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(0, 10).selectExpr("id AS k"))
    # stage on an audit branch: rows must stay invisible to the stream
    t = refs.create_branch(t, "audit")
    t = W.append(t, spark.range(10, 20).selectExpr("id AS k"), branch="audit")

    spark.dataSource.register(IcebergAppendStreamSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("icegopher_appends")
            .option("location", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r["k"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(10))  # staged rows invisible
    # publish: fast-forward main to the audit head
    t.refresh()
    t = refs.rollback_to(t, t.metadata.refs["audit"].snapshot_id)
    assert drain() == list(range(20))  # published rows appear, no dupes


def _drain_cdc(spark, loc, ckpt, out):
    from icegopher_spark.streaming.iceberg_cdc_source import IcebergCdcStreamSource

    spark.dataSource.register(IcebergCdcStreamSource)
    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_cdc_stream_source_dv_and_pos_deletes(spark, tmp_path):
    """The CDC stream must equal the batch changelog on a table mixing
    appends, a DV delete, and a positional MOR delete."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.changelog import changelog_df
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, StringType

    sch = Schema(
        (NestedField(1, "k", LongType(), True), NestedField(2, "tag", StringType(), False)),
        schema_id=0,
    )
    loc = str(tmp_path / "cdc")
    rows = [(i, "ab"[i % 2]) for i in range(40)]
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(t, spark.createDataFrame(rows, "k long, tag string").coalesce(1))
    t = W.delete_where_dv(t, spark, E.less_than("k", 5))
    t = W.delete_where_mor(t, spark, E.equal_to("tag", "b"))

    got = _drain_cdc(spark, loc, str(tmp_path / "ck"), str(tmp_path / "out"))
    g = sorted(
        (r["_change_type"], r["k"], r["tag"]) for r in got.collect()
    )
    root = t.metadata.snapshots[0].snapshot_id
    want_df = changelog_df(t, spark, root, None)
    want = sorted(
        ("delete", r["k"], r["tag"]) if r["_change_type"] == "delete"
        else ("insert", r["k"], r["tag"])
        for r in want_df.collect()
    )
    # the stream also carries the first append's inserts
    want = sorted(want + [("insert", k, tag) for k, tag in rows])
    assert g == want
    # deletes are exactly: k<5 (DV) plus tag='b' with k>=5 (already-
    # deleted rows must not re-emit through the MOR delete)
    dels = [(k, tag) for c, k, tag in g if c == "delete"]
    assert sorted(dels) == sorted(
        [(k, tag) for k, tag in rows if k < 5]
        + [(k, tag) for k, tag in rows if tag == "b" and k >= 5]
    )


def test_cdc_stream_source_cow_and_checkpoint(spark, tmp_path):
    """CoW delete emits the removed files' still-live rows as deletes
    (carryover rows as delete+insert pairs), and a checkpoint restart
    emits only the NEW snapshots."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "cow")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(0, 20).selectExpr("id AS k").coalesce(1))
    t = W.delete_where(t, spark, E.less_than("k", 3))  # CoW

    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    got = _drain_cdc(spark, loc, ckpt, out)
    by = {(r["_change_type"], r["k"]) for r in got.collect()}
    # CoW: whole file deleted (20 rows), survivors re-inserted (17)
    assert {("delete", k) for k in range(20)} <= by
    assert {("insert", k) for k in range(3, 20)} <= by
    n_first = got.count()
    assert n_first == 20 + 20 + 17

    # restart after a MOR delete: only the new snapshot's deletes emit
    t = W.delete_where_mor(t, spark, E.equal_to("k", 10))
    got2 = _drain_cdc(spark, loc, ckpt, out)
    assert got2.count() == n_first + 1
    new_rows = [
        (r["_change_type"], r["k"], r["_commit_snapshot_id"]) for r in got2.collect()
    ]
    last = t.metadata.snapshots[-1].snapshot_id
    assert ("delete", 10, last) in new_rows


def test_cdc_stream_source_refuses_equality_deletes(spark, tmp_path):
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "eq")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(0, 10).selectExpr("id AS k"))
    keys = spark.range(0, 3).selectExpr("id AS k")
    W.delete_keys(t, spark, keys, ["k"])

    from pyspark.sql.utils import StreamingQueryException

    from icegopher_spark.streaming.iceberg_cdc_source import IcebergCdcStreamSource

    spark.dataSource.register(IcebergCdcStreamSource)  # isolation-safe
    with pytest.raises(StreamingQueryException, match="equality-delete"):
        q = (
            spark.readStream.format("icegopher_cdc")
            .option("location", loc)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_cdc_stream_source_refuses_pre_range_equality_deletes(spark, tmp_path):
    """Eq deletes LIVE BEFORE the stream's range can't be subtracted
    from later row deletes — the plan must refuse, and converting them
    (rewrite_equality_deletes) unblocks the stream."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import maintenance as M
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from pyspark.sql.utils import StreamingQueryException

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "preeq")
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(t, spark.range(0, 20).selectExpr("id AS k").coalesce(1))
    t = W.delete_keys(t, spark, spark.range(0, 3).selectExpr("id AS k"), ["k"])
    t = W.delete_where_dv(t, spark, E.equal_to("k", 5))

    def run(ck):
        q = (
            spark.readStream.format("icegopher_cdc")
            .option("location", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / f"out{ck}"))
            .option("checkpointLocation", str(tmp_path / f"ck{ck}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from icegopher_spark.streaming.iceberg_cdc_source import IcebergCdcStreamSource

    spark.dataSource.register(IcebergCdcStreamSource)
    with pytest.raises(StreamingQueryException, match="equality-delete"):
        run("a")

    # conversion retires the eq FILES, but the eq COMMIT stays in
    # history — a full-history replay still refuses...
    t = M.rewrite_equality_deletes(t, spark)
    with pytest.raises(StreamingQueryException, match="equality-delete"):
        run("b")

    # ...and skip-equality-snapshots opts into skipping it wholesale:
    # the DV delete (k=5) and the CONVERSION's replace commit stream
    # fine; the skipped eq keys never emit
    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", loc)
        .option("skip-equality-snapshots", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "outc"))
        .option("checkpointLocation", str(tmp_path / "ckc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["_change_type"], r["k"])
           for r in spark.read.parquet(str(tmp_path / "outc")).collect()}
    assert ("delete", 5) in got
    assert ("delete", 4) not in got
    assert ("delete", 0) not in got  # skipped eq keys never emit


def test_changes_batch_datasource_matches_stream(spark, tmp_path):
    """spark.read.format('icegopher_changes') over a fixed snapshot
    range must produce the stream's change rows, and from-snapshot-id
    slices the range exclusively."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField
    from icegopher_spark.streaming.iceberg_cdc_source import (
        IcebergChangesDataSource,
    )

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    loc = str(tmp_path / "bc")
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(t, spark.range(0, 10).selectExpr("id AS k").coalesce(1))
    t = W.delete_where_dv(t, spark, E.less_than("k", 3))
    s1, s2 = (s.snapshot_id for s in t.metadata.snapshots)

    spark.dataSource.register(IcebergChangesDataSource)
    full = (
        spark.read.format("icegopher_changes")
        .option("location", loc)
        .load()
    )
    got = {(r["_change_type"], r["k"]) for r in full.collect()}
    assert got == {("insert", k) for k in range(10)} | {("delete", k) for k in range(3)}

    # exclusive from: only the DV delete's changes
    tail = (
        spark.read.format("icegopher_changes")
        .option("location", loc)
        .option("from-snapshot-id", str(s1))
        .load()
    )
    assert {(r["_change_type"], r["k"]) for r in tail.collect()} == {
        ("delete", 0), ("delete", 1), ("delete", 2)
    }
    assert {r["_commit_snapshot_id"] for r in tail.collect()} == {s2}

    # unknown to-snapshot-id refuses (anchored by id, like the stream)
    import pytest as _pt

    with _pt.raises(Exception, match="no longer on the table"):
        (
            spark.read.format("icegopher_changes")
            .option("location", loc)
            .option("to-snapshot-id", "424242")
            .load()
            .collect()
        )


def test_cdc_stream_anchored_past_eq_migration(spark, tmp_path):
    """The migrate-then-stream composition (r7 verdict #2): with the
    poison equality-delete snapshot still on the lineage, (a) an
    unanchored fresh checkpoint refuses at history replay, (b) option
    starting-snapshot-id anchored at the migration commit streams the
    post-migration changes exactly (== the batch changelog over the
    same range; the replacement DV's delta subtracts the MIGRATION's
    DVs as prior state), (c) skip-equality-snapshots replays the full
    history minus the key deletes (the documented exactness trade)."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import maintenance as M
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.changelog import changelog_df
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, StringType
    from icegopher_spark.streaming.iceberg_cdc_source import IcebergCdcStreamSource
    from pyspark.sql.utils import StreamingQueryException

    sch = Schema(
        (NestedField(1, "k", LongType(), True), NestedField(2, "tag", StringType(), False)),
        schema_id=0,
    )
    loc = str(tmp_path / "eqmig")
    rows = [(i, "ab"[i % 2]) for i in range(20)]
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(t, spark.createDataFrame(rows, "k long, tag string").coalesce(1))
    t = W.delete_keys(t, spark, spark.range(0, 4).selectExpr("id AS k"), ["k"])
    t = M.rewrite_equality_deletes(t, spark)
    mig_id = t.current_snapshot().snapshot_id
    # post-migration: a replacement DV (delta vs the migration's DVs)
    # and a plain append
    t = W.delete_where_dv(t, spark, E.equal_to("tag", "b"))
    t = W.append(t, spark.createDataFrame([(100, "c")], "k long, tag string"))

    spark.dataSource.register(IcebergCdcStreamSource)

    def run(ck_name, out_name, **opts):
        r = spark.readStream.format("icegopher_cdc").option("location", loc)
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / out_name))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ck_name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r["_change_type"], r["k"], r["tag"])
            for r in spark.read.parquet(str(tmp_path / out_name)).collect()
        )

    # (a) unanchored fresh checkpoint replays into the poison snapshot
    with pytest.raises(StreamingQueryException, match="equality-delete"):
        run("ck_poison", "out_poison")

    # (b) anchored at the migration: post-migration changes only.
    # live at anchor = k in 4..19; DV delete removes tag='b' (odd k)
    # among them; append adds (100,'c')
    got = run("ck_anchor", "out_anchor", **{"starting-snapshot-id": str(mig_id)})
    want = sorted(
        [("delete", k, tag) for k, tag in rows if k >= 4 and tag == "b"]
        + [("insert", 100, "c")]
    )
    assert got == want
    # and equals the batch changelog over the same snapshot range
    batch = sorted(
        (r["_change_type"], r["k"], r["tag"])
        for r in changelog_df(t, spark, mig_id, None).collect()
    )
    assert got == batch

    # (c) skip-equality-snapshots: full replay minus the key deletes —
    # every original insert emits, eq-deleted keys 0..3 never emit a
    # delete, later DV/append changes still do
    got_skip = run(
        "ck_skip", "out_skip", **{"skip-equality-snapshots": "true"}
    )
    want_skip = sorted(
        [("insert", k, tag) for k, tag in rows]
        + [("insert", 100, "c")]
        + [("delete", k, tag) for k, tag in rows if k >= 4 and tag == "b"]
    )
    assert got_skip == want_skip

    # a bogus anchor fails loudly instead of silently replaying root
    with pytest.raises(StreamingQueryException, match="no longer"):
        run("ck_bogus", "out_bogus", **{"starting-snapshot-id": "12345"})


def test_stream_sources_refuse_variant_columns(spark, tmp_path):
    """Both streaming planners refuse variant tables actionably BEFORE
    the arrow conversion (the executor pyarrow kernel can't open the
    variant logical type; a deep OSError would be undiagnosable)."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, VariantType
    from icegopher_spark.streaming.iceberg_cdc_source import _CdcStreamReader
    from icegopher_spark.streaming.iceberg_source import _AppendStreamReader

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "v", VariantType(), False),
        ),
        schema_id=0,
    )
    loc = str(tmp_path / "vref")
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(
        t,
        spark.range(3).select(
            "id", F.parse_json(F.lit('{"a":1}')).alias("v")
        ).selectExpr("id AS k", "v"),
    )
    for reader_cls in (_AppendStreamReader, _CdcStreamReader):
        r = reader_cls({"location": loc})
        with pytest.raises(ValueError, match="variant column"):
            r.partitions({"idx": 0, "last_id": 0}, r.latestOffset())
