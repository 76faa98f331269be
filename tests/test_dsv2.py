"""The Python DataSource face (iceberg/dsv2.py): standard
DataFrameReader/Writer API over our tables — write/read round-trip,
overwrite atomicity, the documented refusals, and empty-task handling."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.dsv2 import IcebergDataSource
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.table import Table
from icegopher_spark.iceberg.transforms import PartitionField, PartitionSpec, parse_transform
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "q", DoubleType(), False),
        NestedField(3, "flag", StringType(), False),
    ),
    schema_id=0,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(IcebergDataSource)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 0.5).alias("q"),
        F.concat(F.lit("f"), (F.col("id") % 4).cast("string")).alias("flag"),
    )


def test_write_read_roundtrip_with_pushed_filter(spark, tmp_path):
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 500).write.format("icegopher").option("location", loc).mode("append").save()
    _df(spark, 500, 600).write.format("icegopher").option("location", loc).mode("append").save()

    t = Table.from_location(loc)
    assert len(t.metadata.snapshots) == 2
    assert t.scan().to_df(spark).count() == 600

    got = (
        spark.read.format("icegopher")
        .option("location", loc)
        .load()
        .filter("k >= 590 AND flag = 'f3'")
    )
    exp = _df(spark, 0, 600).filter("k >= 590 AND flag = 'f3'")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_overwrite_replaces_all(spark, tmp_path):
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 100).write.format("icegopher").option("location", loc).mode("append").save()
    _df(spark, 0, 7).write.format("icegopher").option("location", loc).mode("overwrite").save()
    t = Table.from_location(loc)
    assert t.current_snapshot().summary["operation"] == "overwrite"
    assert t.scan().to_df(spark).count() == 7


def test_empty_tasks_produce_no_files(spark, tmp_path):
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 3).repartition(8).write.format("icegopher").option(
        "location", loc
    ).mode("append").save()
    t = Table.from_location(loc)
    assert t.scan().to_df(spark).count() == 3
    assert int(t.current_snapshot().summary["total-data-files"]) <= 3


def test_mor_positional_deletes_applied_in_reader(spark, tmp_path):
    """Positional deletes are masked out inside the Arrow read — the
    datasource result equals the native delete-applied scan."""
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 50).write.format("icegopher").option("location", loc).mode("append").save()
    t = Table.from_location(loc)
    t = W.delete_where_mor(t, spark, E.equal_to("flag", "f1"))

    got = spark.read.format("icegopher").option("location", loc).load()
    native = t.scan().to_df(spark)
    assert got.count() == native.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, native.collect()))
    assert got.filter("flag = 'f1'").count() == 0


def test_equality_deletes_applied_in_reader(spark, tmp_path):
    """Equality deletes are masked inside the Arrow read (round-5;
    previously a documented refusal) — result equals the native
    delete-applied scan, and sequence-number scoping holds: rows
    appended AFTER the delete keep their deleted key values."""
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 50).write.format("icegopher").option("location", loc).mode("append").save()
    t = Table.from_location(loc)
    t = W.delete_keys(t, spark, spark.createDataFrame([("f2",)], "flag string"), ["flag"])
    # post-delete append re-introduces flag=f2 rows (higher seq number:
    # the delete must NOT apply to them)
    _df(spark, 100, 120).write.format("icegopher").option("location", loc).mode("append").save()
    t = Table.from_location(loc)

    got = spark.read.format("icegopher").option("location", loc).load()
    native = t.scan().to_df(spark)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, native.collect()))
    # pre-delete f2 rows gone, post-delete f2 rows (k in 100..119) kept
    f2 = got.filter("flag = 'f2'").select("k").collect()
    assert sorted(r.k for r in f2) == [102, 106, 110, 114, 118]


def test_equality_delete_multi_column_and_null_keys(spark, tmp_path):
    """Multi-column equality keys match per-row tuples; null keys never
    match (Spark's null-unsafe join equality on the native path)."""
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    rows = [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, None), (4, 4.0, "a")]
    df = spark.createDataFrame(rows, "k long, q double, flag string")
    df.write.format("icegopher").option("location", loc).mode("append").save()
    t = Table.from_location(loc)
    # delete (k=1, flag='a') and a null-keyed row that must match nothing
    keys = spark.createDataFrame([(1, "a"), (9, None)], "k long, flag string")
    t = W.delete_keys(t, spark, keys, ["k", "flag"])

    got = sorted(
        (r.k, r.flag) for r in spark.read.format("icegopher").option("location", loc).load().collect()
    )
    native = sorted((r.k, r.flag) for r in t.scan().to_df(spark).collect())
    assert got == native == [(2, "b"), (3, None), (4, "a")]


def test_partitioned_write_clusters_and_prunes(spark, tmp_path):
    """Partitioned datasource writes: each task splits its batches by
    the partition tuple; the committed manifest prunes on both the
    identity and the bucket field."""
    loc = str(tmp_path / "t")
    spec = PartitionSpec(
        [
            PartitionField(3, 1000, "flag", parse_transform("identity")),
            PartitionField(1, 1001, "kb", parse_transform("bucket[4]")),
        ]
    )
    W.create_table(loc, SCHEMA, spec)
    _df(spark, 0, 400).write.format("icegopher").option("location", loc).mode(
        "append"
    ).save()
    t = Table.from_location(loc)
    native = t.scan().to_df(spark)
    assert native.count() == 400
    # identical content to a native append of the same rows
    exp = _df(spark, 0, 400)
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, exp.collect()))
    # partition pruning works on the committed partition tuples
    total = len(t.scan().plan_files())
    flag_only = len(t.scan(row_filter=E.equal_to("flag", "f2")).plan_files())
    point = len(
        t.scan(
            row_filter=E.equal_to("flag", "f2") & E.equal_to("k", 42)
        ).plan_files()
    )
    assert flag_only < total
    assert point <= flag_only
    got = t.scan(row_filter=E.equal_to("flag", "f2") & E.equal_to("k", 42)).to_df(spark)
    assert [r["k"] for r in got.collect()] == [42]


def test_partitioned_write_refuses_divergent_encoding(spark, tmp_path):
    """identity-on-double stays a plan-time refusal (NaN/-0.0 partition
    grouping is ill-defined); identity-on-timestamp became a supported
    path in r6 (test_dsv2_temporal_partition_writes_match_native)."""
    from icegopher_spark.iceberg.types import DoubleType

    loc = str(tmp_path / "t")
    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "v", DoubleType(), False),
        ),
        schema_id=0,
    )
    spec = PartitionSpec([PartitionField(2, 1000, "v", parse_transform("identity"))])
    W.create_table(loc, sch, spec)
    df = spark.range(3).selectExpr("id AS k", "cast(id as double) AS v")
    with pytest.raises(Exception, match="unsupported partition value type"):
        df.write.format("icegopher").option("location", loc).mode("append").save()


def test_snapshot_id_time_travel_read(spark, tmp_path):
    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 30).write.format("icegopher").option("location", loc).mode("append").save()
    _df(spark, 30, 60).write.format("icegopher").option("location", loc).mode("append").save()
    first = Table.from_location(loc).metadata.snapshots[0]
    got = (
        spark.read.format("icegopher")
        .option("location", loc)
        .option("snapshot-id", str(first.snapshot_id))
        .load()
    )
    assert got.count() == 30 and got.agg(F.max("k")).first()[0] == 29


def test_schema_evolution_projection_in_reader(spark, tmp_path):
    """Old files project by field ID: renamed columns come back under
    the new name, added columns null-fill — identical to the native
    scan."""
    from icegopher_spark.iceberg.evolve import update_schema
    from icegopher_spark.iceberg.types import DoubleType as DT
    from icegopher_spark.iceberg.types import StringType as ST

    sch = Schema(
        (NestedField(1, "k", LongType(), True), NestedField(2, "name", ST(), False)),
        schema_id=0,
    )
    loc = str(tmp_path / "t")
    t = W.create_table(loc, sch)
    t = W.append(t, spark.range(5).select(F.col("id").alias("k"), F.lit("old").alias("name")))
    t = update_schema(t).rename_column("name", "label").add_column("score", DT()).commit()
    t = W.append(
        t,
        spark.range(5, 8).select(
            F.col("id").alias("k"), F.lit("new").alias("label"), F.lit(1.5).alias("score")
        ),
    )
    native = sorted(map(tuple, t.scan().to_df(spark).collect()))
    got = sorted(
        map(tuple, spark.read.format("icegopher").option("location", loc).load().collect())
    )
    assert got == native
    assert got[0] == (0, "old", None) and got[-1] == (7, "new", 1.5)


def test_catalog_table_resolution(spark, tmp_path):
    """.option('catalog', warehouse).option('table', 'ns.tbl') resolves
    through the catalog layer instead of a raw location."""
    from icegopher_spark.iceberg.catalog import load_catalog

    wh = str(tmp_path / "wh")
    cat = load_catalog("wh", wh)
    cat.create_table(("db", "vals"), SCHEMA)
    _df(spark, 0, 25).write.format("icegopher").option("catalog", wh).option(
        "table", "db.vals"
    ).mode("append").save()
    got = (
        spark.read.format("icegopher")
        .option("catalog", wh)
        .option("table", "db.vals")
        .load()
    )
    assert got.count() == 25
    assert cat.load_table(("db", "vals")).scan().to_df(spark).count() == 25


def test_stream_writer_one_snapshot_per_batch_exactly_once(spark, tmp_path):
    """writeStream.format('icegopher'): each micro-batch commits one
    snapshot carrying its batch id; a replayed batch id is skipped
    (exactly-once across restarts)."""
    from icegopher_spark.iceberg.dsv2 import _IcebergStreamWriter

    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    src_dir = str(tmp_path / "src")
    _df(spark, 0, 40).write.parquet(src_dir)

    stream = spark.readStream.schema(_df(spark, 0, 1).schema).parquet(src_dir)
    q = (
        stream.writeStream.format("icegopher")
        .option("location", loc)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    t = Table.from_location(loc)
    assert t.scan().to_df(spark).count() == 40
    assert t.current_snapshot().summary["stream-id"] == "default"
    committed_batch = int(t.current_snapshot().summary["stream-batch-id"])

    # simulate a replay of the SAME batch id: commit must be skipped
    w = _IcebergStreamWriter({"location": loc}, [])
    class _Msg:  # a fake successful task message with no files
        entries = []
    before = len(t.metadata.snapshots)
    w.commit([_Msg()], committed_batch)
    assert len(Table.from_location(loc).metadata.snapshots) == before

    # and a NEW batch id commits
    w.commit([_Msg()], committed_batch + 1)
    t2 = Table.from_location(loc)
    assert len(t2.metadata.snapshots) == before + 1
    assert t2.scan().to_df(spark).count() == 40  # no data rows added


def test_bucket_partitioned_datasource_write_prunes(spark, tmp_path):
    """Datasource write through a bucket[8] spec (vectorized murmur3
    kernel on the write path): files land in bucket dirs matching the
    spec hash, and a point lookup prunes to one bucket's files."""
    from icegopher_spark.iceberg.transforms import BucketTransform
    from icegopher_spark.iceberg.types import LongType as IceLong

    loc = str(tmp_path / "t")
    spec = PartitionSpec([PartitionField(1, 1000, "k_bucket", parse_transform("bucket[8]"))])
    W.create_table(loc, SCHEMA, spec)
    _df(spark, 0, 400).write.format("icegopher").option("location", loc).mode("append").save()

    t = Table.from_location(loc)
    tasks = t.scan().plan_files()
    # datasource writes carry partition values in the MANIFEST (no hive
    # dirs): every task must have a spec-hash bucket value
    assert all(task.file.partition.get("k_bucket") in range(8) for task in tasks)
    bt = BucketTransform(8)
    native = t.scan().to_df(spark)
    assert native.count() == 400
    rows = native.collect()
    assert sorted(r.k for r in rows) == list(range(400))
    # point lookup prunes to the key's bucket
    target = bt.apply(123, IceLong())
    flt = E.equal_to("k", 123)
    planned = t.scan(row_filter=flt).plan_files()
    assert 0 < len(planned) < len(tasks)
    assert all(task.file.partition["k_bucket"] == target for task in planned)
    # string-bucket spec also works through the vectorized kernel
    loc2 = str(tmp_path / "t2")
    spec2 = PartitionSpec([PartitionField(3, 1000, "flag_b", parse_transform("bucket[4]"))])
    W.create_table(loc2, SCHEMA, spec2)
    _df(spark, 0, 100).write.format("icegopher").option("location", loc2).mode("append").save()
    t2 = Table.from_location(loc2)
    assert t2.scan().to_df(spark).count() == 100
    got = {task.file.partition["flag_b"] for task in t2.scan().plan_files()}
    from icegopher_spark.iceberg.types import StringType as IceStr

    bt4 = BucketTransform(4)
    want = {bt4.apply(f"f{i}", IceStr()) for i in range(4)}
    assert got == want


def test_bucket_write_with_null_keys(spark, tmp_path):
    """Null bucket-source values must land in the null partition, not
    crash the manifest commit (round-5 review: pd.NA from the
    vectorized kernel slipped past the writer's null check)."""
    loc = str(tmp_path / "t")
    spec = PartitionSpec([PartitionField(1, 1000, "kb", parse_transform("bucket[4]"))])
    sch = Schema(
        (
            NestedField(1, "k", LongType(), False),
            NestedField(2, "q", DoubleType(), False),
        ),
        schema_id=0,
    )
    W.create_table(loc, sch)
    # recreate with the bucket spec (create_table signature)
    import shutil

    shutil.rmtree(loc)
    W.create_table(loc, sch, spec)
    df = spark.createDataFrame([(1, 1.0), (None, 2.0), (17, 3.0)], "k long, q double")
    df.write.format("icegopher").option("location", loc).mode("append").save()
    t = Table.from_location(loc)
    rows = sorted(((r.k, r.q) for r in t.scan().to_df(spark).collect()), key=lambda x: x[1])
    assert rows == [(1, 1.0), (None, 2.0), (17, 3.0)]
    parts = {task.file.partition.get("kb") for task in t.scan().plan_files()}
    assert None in parts  # null row in the null partition


def test_eq_delete_reordered_key_columns(spark, tmp_path):
    """A delete parquet whose columns are the key names in a DIFFERENT
    order must match by name, not position (round-5 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from icegopher_spark.iceberg.dsv2 import _apply_eq_deletes

    dpath = str(tmp_path / "del.parquet")
    # file columns [flag, k] while key order is (k, flag)
    pq.write_table(
        pa.table({"flag": ["a"], "k": pa.array([1], type=pa.int64())}), dpath
    )
    batch = pa.record_batch(
        {"k": pa.array([1, 1, 2], type=pa.int64()), "flag": ["a", "b", "a"]}
    )
    out = list(_apply_eq_deletes(iter([batch]), ((dpath, ("k", "flag")),)))
    kept = [(k, f) for k, f in zip(out[0]["k"].to_pylist(), out[0]["flag"].to_pylist())]
    assert kept == [(1, "b"), (2, "a")]  # only (k=1, flag='a') deleted


def test_eq_delete_bigint_keys_with_nulls_stay_exact(spark, tmp_path):
    """int64 keys above 2^53 in a batch CONTAINING NULLS must not
    collapse through float64 (round-5 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from icegopher_spark.iceberg.dsv2 import _apply_eq_deletes

    big = 9_007_199_254_740_993  # 2^53 + 1: == 2^53 after float64
    dpath = str(tmp_path / "del.parquet")
    pq.write_table(pa.table({"k": pa.array([big], type=pa.int64())}), dpath)
    batch = pa.record_batch({"k": pa.array([big, big - 1, None], type=pa.int64())})
    out = list(_apply_eq_deletes(iter([batch]), ((dpath, ("k",)),)))
    assert out[0]["k"].to_pylist() == [big - 1, None]  # big deleted, neighbors kept


def test_eq_delete_dropped_key_field_refused(spark, tmp_path):
    """An equality delete keyed on a field later dropped from the schema
    must refuse loudly (partial-key masking would over-delete)."""
    from icegopher_spark.iceberg.evolve import update_schema

    loc = str(tmp_path / "t")
    W.create_table(loc, SCHEMA)
    _df(spark, 0, 20).write.format("icegopher").option("location", loc).mode("append").save()
    t = Table.from_location(loc)
    keys = spark.createDataFrame([(1, "f1")], "k long, flag string")
    t = W.delete_keys(t, spark, keys, ["k", "flag"])
    t = update_schema(t).drop_column("flag").commit()
    with pytest.raises(Exception, match="not in the .* schema|partial key"):
        spark.read.format("icegopher").option("location", loc).load().collect()
    with pytest.raises(ValueError, match="not in the scan schema"):
        Table.from_location(loc).scan().to_df(spark).collect()


def test_dsv2_reads_orc_tables(spark, tmp_path):
    """r6: the DataSource face dispatches per file format — ORC files
    previously crashed with parquet magic-byte errors; Avro refuses at
    plan time with a pointer to the native path."""
    loc = str(tmp_path / "orc_t")
    W.create_table(loc, SCHEMA, properties={"write.format.default": "orc"})
    t = Table.from_location(loc)
    W.append(t, _df(spark, 0, 200))
    got = spark.read.format("icegopher").option("location", loc).load()
    assert got.count() == 200
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _df(spark, 0, 200).collect())
    )

    avro_loc = str(tmp_path / "avro_t")
    W.create_table(avro_loc, SCHEMA, properties={"write.format.default": "avro"})
    W.append(Table.from_location(avro_loc), _df(spark, 0, 10))
    with pytest.raises(Exception, match="AVRO"):
        spark.read.format("icegopher").option("location", avro_loc).load().count()


def test_dsv2_stream_complete_mode_overwrites(spark, tmp_path):
    """r6: Complete output mode must REPLACE table contents per batch;
    the writer previously ignored the overwrite flag and appended."""
    loc = str(tmp_path / "agg_t")
    AGG_SCHEMA = Schema(
        (
            NestedField(1, "flag", StringType(), False),
            NestedField(2, "n", LongType(), False),
        ),
        schema_id=0,
    )
    W.create_table(loc, AGG_SCHEMA)
    src = str(tmp_path / "src")
    _df(spark, 0, 100).write.parquet(src)
    sdf = (
        spark.readStream.schema(_df(spark, 0, 1).schema)
        .parquet(src)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        sdf.writeStream.format("icegopher")
        .option("location", loc)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = Table.from_location(loc)
    got = {r["flag"]: r["n"] for r in t.scan().to_df(spark).collect()}
    assert got == {"f0": 25, "f1": 25, "f2": 25, "f3": 25}  # no duplicates
    assert (t.current_snapshot().summary or {}).get("operation") == "overwrite"


def test_dsv2_time_travel_sees_snapshot_schema(spark, tmp_path):
    """r6: .option('snapshot-id') reads under the SNAPSHOT's schema —
    a column dropped since must still surface."""
    from icegopher_spark.iceberg.evolve import UpdateSchema

    loc = str(tmp_path / "tt")
    W.create_table(loc, SCHEMA)
    t = Table.from_location(loc)
    t = W.append(t, _df(spark, 0, 20))
    snap = t.current_snapshot().snapshot_id
    UpdateSchema(t).drop_column("q").commit()
    got = (
        spark.read.format("icegopher")
        .option("location", loc)
        .option("snapshot-id", str(snap))
        .load()
    )
    assert "q" in got.columns
    assert got.count() == 20
    # and the current read hides it
    now = spark.read.format("icegopher").option("location", loc).load()
    assert "q" not in now.columns


def test_dsv2_writes_record_nan_counts(spark, tmp_path):
    """r6: dsv2-written (pyarrow) files carry write-time NaN tallies —
    the footer can't prove NaN-freeness (pyarrow skips NaN in stats),
    and without the counts float gt/ge pruning must stay conservative."""
    loc = str(tmp_path / "nan_t")
    W.create_table(loc, SCHEMA)
    rows = [(1, 1.0, "a"), (2, float("nan"), "b"), (3, 5.0, "c")]
    spark.createDataFrame(rows, "k long, q double, flag string").coalesce(1).write.format(
        "icegopher"
    ).option("location", loc).mode("append").save()
    t = Table.from_location(loc)
    [task] = t.scan().plan_files()
    q_fid = t.schema.find_field("q").field_id
    assert task.file.nan_value_counts == {q_fid: 1}
    # and a NaN-free write proves zero, enabling gt pruning
    loc2 = str(tmp_path / "clean_t")
    W.create_table(loc2, SCHEMA)
    _df(spark, 0, 10).coalesce(1).write.format("icegopher").option(
        "location", loc2
    ).mode("append").save()
    t2 = Table.from_location(loc2)
    assert t2.scan(row_filter=E.greater_than("q", 1e9)).plan_files() == []


def test_dsv2_temporal_partition_writes_match_native(spark, tmp_path):
    """r6: day/hour transforms on timestamp sources crashed the dsv2
    write path (np.datetime64 missed _coerce; pandas groupby float-
    coerced object keys), and identity-on-timestamp was a plan-time
    refusal. All three must now write the same manifest partition
    values as the native W.append path, including a NULL source row."""
    import datetime as dt

    from icegopher_spark.iceberg.transforms import (
        PartitionField,
        PartitionSpec,
        parse_transform,
    )
    from icegopher_spark.iceberg.types import LongType, NestedField, TimestampType

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "ts", TimestampType(), False),
        ),
        schema_id=0,
    )
    rows = [(1, dt.datetime(2024, 1, 1, 5)), (2, dt.datetime(2024, 1, 2, 6)), (3, None)]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz").coalesce(1)
    for trname in ("day", "identity", "hour"):
        spec = PartitionSpec([PartitionField(2, 1000, "p", parse_transform(trname))])
        loc = str(tmp_path / f"t_{trname}")
        W.create_table(loc, sch, spec)
        df.write.format("icegopher").option("location", loc).mode("append").save()
        t = Table.from_location(loc)
        got = sorted(str(task.file.partition) for task in t.scan().plan_files())

        loc2 = str(tmp_path / f"n_{trname}")
        t2 = W.create_table(loc2, sch, spec)
        t2 = W.append(t2, df)
        want = sorted(str(task.file.partition) for task in t2.scan().plan_files())
        assert got == want, trname
        assert t.scan().to_df(spark).count() == 3
        # partition pruning must hold on the dsv2-written table
        flt = E.less_than("ts", dt.datetime(2024, 1, 2))
        assert len(t.scan(row_filter=flt).plan_files()) == 1


def test_dsv2_refuses_variant_columns(spark, tmp_path):
    """r8 review: the batch DataSource face shares the streams' pyarrow
    executor kernel — it must refuse variant tables at PLAN time with
    the same actionable message, not die per-task in pyarrow."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, VariantType

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "v", VariantType(), False),
        ),
        schema_id=0,
    )
    loc = str(tmp_path / "vds")
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(
        t,
        spark.range(3).select(
            F.col("id").alias("k"), F.parse_json(F.lit('{"a":1}')).alias("v")
        ),
    )
    spark.dataSource.register(IcebergDataSource)
    with pytest.raises(Exception, match="variant"):
        spark.read.format("icegopher").option("location", loc).load().count()


def test_dsv2_refuses_variant_write_and_nested_variant_read(spark, tmp_path):
    """r8 review wave 2: (a) the WRITE face must refuse variant tables
    (its pyarrow writer would drop the variant logical-type annotation
    and commit files contradicting the declared schema); (b) the read
    guards must catch variant NESTED inside a struct, not just
    top-level columns."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import (
        LongType,
        NestedField,
        StructType,
        VariantType,
    )

    # (a) write refusal on a plain variant table
    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "v", VariantType(), False),
        ),
        schema_id=0,
    )
    loc = str(tmp_path / "vw")
    W.create_table(loc, sch, format_version=3)
    spark.dataSource.register(IcebergDataSource)
    with pytest.raises(Exception, match="cannot WRITE variant"):
        (
            spark.range(2)
            .select(F.col("id").alias("k"), F.parse_json(F.lit("{}")).alias("v"))
            .write.format("icegopher")
            .mode("append")
            .option("location", loc)
            .save()
        )

    # (b) nested variant read refusal
    nsch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(
                2,
                "s",
                StructType((NestedField(3, "payload", VariantType(), False),)),
                False,
            ),
        ),
        schema_id=0,
    )
    nloc = str(tmp_path / "vn")
    t = W.create_table(nloc, nsch, format_version=3)
    t = W.append(
        t,
        spark.range(2).select(
            F.col("id").alias("k"),
            F.struct(F.parse_json(F.lit('{"a":1}')).alias("payload")).alias("s"),
        ),
    )
    with pytest.raises(Exception, match="variant"):
        spark.read.format("icegopher").option("location", nloc).load().count()
