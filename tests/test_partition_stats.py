"""Partition statistics files: aggregation from manifests, parquet
round-trip, metadata registration (replacement per snapshot), and
delete-file counting."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.partition_stats import (
    compute_partition_stats,
    read_partition_stats,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.table import Table
from icegopher_spark.iceberg.transforms import (
    PartitionField,
    PartitionSpec,
    parse_transform,
)
from icegopher_spark.iceberg.types import (
    LongType,
    NestedField,
    StringType,
    TimestampType,
)

SCHEMA = Schema(
    (
        NestedField(1, "id", LongType(), True),
        NestedField(2, "cat", StringType(), False),
        NestedField(3, "ts", TimestampType(), False),
    ),
    schema_id=0,
)
SPEC = PartitionSpec(
    [PartitionField(3, 1000, "ts_day", parse_transform("day"))]
)


def _df(spark, n, day0=0):
    rows = [
        (i, "ab"[i % 2], dt.datetime(2021, 1, 1 + day0 + (i % 3), 6, 0, 0))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id bigint, cat string, ts timestamp_ntz")


def test_partition_stats_counts_and_roundtrip(tmp_path, spark):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, SPEC)
    t = W.append(t, _df(spark, 30))
    t = compute_partition_stats(t)
    assert len(t.metadata.partition_statistics) == 1
    got = {
        r["partition"]["ts_day"]: (r["data_record_count"], r["data_file_count"])
        for r in read_partition_stats(t, spark).collect()
    }
    assert got == {dt.date(2021, 1, 1): (10, 1), dt.date(2021, 1, 2): (10, 1),
                   dt.date(2021, 1, 3): (10, 1)}
    # reload from disk: registration survives the metadata round-trip
    t2 = Table.from_location(t.location)
    assert t2.metadata.partition_statistics == t.metadata.partition_statistics


def test_partition_stats_replaced_per_snapshot_and_deletes(tmp_path, spark):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, SPEC)
    t = W.append(t, _df(spark, 30))
    t = compute_partition_stats(t)
    first_path = t.metadata.partition_statistics[0]["statistics-path"]
    # MOR delete adds a positional delete file; stats for the NEW
    # snapshot count it, and the old registration stays for time travel
    t = W.delete_where_mor(t, spark, E.less_than("id", 6))
    t = compute_partition_stats(t)
    assert len(t.metadata.partition_statistics) == 2
    stats = read_partition_stats(t, spark)
    row = stats.agg(
        F.sum("position_delete_record_count").alias("pd"),
        F.sum("data_record_count").alias("dr"),
    ).collect()[0]
    assert row["pd"] == 6  # deleted rows counted as position deletes
    assert row["dr"] == 30  # data files unchanged under MOR
    # recomputing the SAME snapshot replaces, not appends
    t = compute_partition_stats(t)
    assert len(t.metadata.partition_statistics) == 2
    assert first_path in {
        e["statistics-path"] for e in t.metadata.partition_statistics
    }


def test_partition_stats_requires_snapshot(tmp_path, spark):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, SPEC)
    with pytest.raises(ValueError, match="no snapshots"):
        compute_partition_stats(t)
    t = W.append(t, _df(spark, 3))
    with pytest.raises(ValueError, match="no partition statistics"):
        read_partition_stats(t, spark)


def test_expire_drops_stats_and_orphan_keeps_live(tmp_path, spark):
    import os

    from icegopher_spark.iceberg.maintenance import expire_snapshots, orphan_files

    t = W.create_table(str(tmp_path / "t"), SCHEMA, SPEC)
    t = W.append(t, _df(spark, 9))
    t = compute_partition_stats(t)
    old_path = t.metadata.partition_statistics[0]["statistics-path"]
    t = W.append(t, _df(spark, 6, day0=10))
    t = compute_partition_stats(t)
    assert len(t.metadata.partition_statistics) == 2
    # live registrations are never orphans, whatever their age
    assert old_path not in set(orphan_files(t, older_than_ms=0))
    t = expire_snapshots(t, retain_last=1)
    # the expired snapshot's registration is gone AND its file deleted
    assert [e["snapshot-id"] for e in t.metadata.partition_statistics] == [
        t.current_snapshot().snapshot_id
    ]
    assert not os.path.exists(old_path)
    # the surviving registration still reads back
    assert (
        read_partition_stats(t, spark).agg(F.sum("data_record_count")).collect()[0][0]
        == 15
    )
