"""Iceberg V3 deletion-vector lifecycle tests: write DVs, read them
back on both faces (native scan + DSv2), replacement/supersede
semantics, interop with V2 positional deletes, changelog delta
reporting, and compaction."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg.dsv2 import IcebergDataSource

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.changelog import changelog_df
from icegopher_spark.iceberg.manifests import (
    FORMAT_PUFFIN,
    DataFileContent,
    ManifestContent,
    fetch_entries,
    read_manifest_list,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "v", DoubleType(), False),
        NestedField(3, "tag", StringType(), False),
    ),
    schema_id=0,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, tag string").coalesce(1)


def _rows(t, spark):
    return sorted(tuple(r) for r in t.scan().to_df(spark).collect())


def _dv_entries(t):
    snap = t.current_snapshot()
    out = []
    for m in read_manifest_list(t.io.read(snap.manifest_list)):
        if m.content != ManifestContent.DELETES:
            continue
        for e in fetch_entries(m, t.io.read(m.manifest_path), discard_deleted=True):
            if e.data_file.is_deletion_vector:
                out.append(e)
    return out


def test_dv_delete_basic(spark, tmp_path):
    t = W.create_table(str(tmp_path / "dv1"), SCHEMA)
    rows = [(i, float(i), "a" if i % 2 else "b") for i in range(100)]
    t = W.append(t, _df(spark, rows))
    t = W.delete_where_dv(t, spark, E.less_than("k", 10))
    assert _rows(t, spark) == sorted((i, float(i), "a" if i % 2 else "b") for i in range(10, 100))
    entries = _dv_entries(t)
    assert len(entries) == 1
    df = entries[0].data_file
    assert df.file_format == FORMAT_PUFFIN
    assert df.content == DataFileContent.POSITION_DELETES
    assert df.record_count == 10
    assert df.referenced_data_file and df.content_offset is not None
    assert df.file_path.endswith(".puffin")


def test_dv_replacement_supersedes(spark, tmp_path):
    """A second DV delete on the same file produces ONE live DV that is
    the union, and drops the old entry (V3 invariant)."""
    t = W.create_table(str(tmp_path / "dv2"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i), "x") for i in range(50)]))
    t = W.delete_where_dv(t, spark, E.less_than("k", 10))
    t = W.delete_where_dv(t, spark, E.greater_than_or_equal("k", 40))
    assert _rows(t, spark) == [(i, float(i), "x") for i in range(10, 40)]
    entries = _dv_entries(t)
    assert len(entries) == 1, "old DV entry must be superseded"
    assert entries[0].data_file.record_count == 20  # 10 low + 10 high


def test_dv_no_matches_is_noop(spark, tmp_path):
    t = W.create_table(str(tmp_path / "dv3"), SCHEMA)
    t = W.append(t, _df(spark, [(1, 1.0, "x")]))
    sid = t.current_snapshot().snapshot_id
    t = W.delete_where_dv(t, spark, E.equal_to("k", 999))
    assert t.current_snapshot().snapshot_id == sid, "no-op must not commit"


def test_dv_on_top_of_positional_mor(spark, tmp_path):
    """Mixed V2 + V3: a DV after a positional MOR delete must be the
    union for the file; both apply idempotently at read."""
    t = W.create_table(str(tmp_path / "dv4"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i), "x") for i in range(30)]))
    t = W.delete_where_mor(t, spark, E.less_than("k", 5))
    t = W.delete_where_dv(t, spark, E.greater_than_or_equal("k", 25))
    assert _rows(t, spark) == [(i, float(i), "x") for i in range(5, 25)]
    e = _dv_entries(t)
    assert len(e) == 1
    # DV is the union: 5 mor-deleted + 5 dv-deleted
    assert e[0].data_file.record_count == 10


def test_positional_mor_after_dv(spark, tmp_path):
    t = W.create_table(str(tmp_path / "dv5"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i), "x") for i in range(30)]))
    t = W.delete_where_dv(t, spark, E.less_than("k", 5))
    t = W.delete_where_mor(t, spark, E.greater_than_or_equal("k", 25))
    assert _rows(t, spark) == [(i, float(i), "x") for i in range(5, 25)]


def test_dv_multiple_files(spark, tmp_path):
    """Deletes spanning several data files → one DV per affected file."""
    t = W.create_table(str(tmp_path / "dv6"), SCHEMA)
    for base in (0, 100, 200):
        t = W.append(t, _df(spark, [(base + i, float(i), "x") for i in range(50)]))
    t = W.delete_where_dv(t, spark, E.equal_to("v", 7.0))  # one row in each file
    assert len(_dv_entries(t)) == 3
    got = _rows(t, spark)
    assert len(got) == 147
    assert all(r[1] != 7.0 for r in got)


def test_dv_dsv2_read_matches_native(spark, tmp_path):
    spark.dataSource.register(IcebergDataSource)
    t = W.create_table(str(tmp_path / "dv7"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i % 7), "x") for i in range(200)]))
    t = W.delete_where_dv(t, spark, E.equal_to("v", 3.0))
    native = _rows(t, spark)
    via_dsv2 = sorted(
        tuple(r)
        for r in spark.read.format("icegopher")
        .option("location", t.location)
        .load()
        .collect()
    )
    assert via_dsv2 == native
    assert len(native) == 200 - len([i for i in range(200) if i % 7 == 3])


def test_dv_changelog_reports_delta_only(spark, tmp_path):
    """Changelog for a replacement DV snapshot reports only the newly
    deleted rows, not the whole superset bitmap."""
    t = W.create_table(str(tmp_path / "dv8"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i), "x") for i in range(20)]))
    t = W.delete_where_dv(t, spark, E.less_than("k", 5))
    mid = t.current_snapshot().snapshot_id
    t = W.delete_where_dv(t, spark, E.less_than("k", 8))  # 3 new rows
    ch = changelog_df(t, spark, from_snapshot_id=mid)
    dels = sorted(
        r["k"] for r in ch.filter(F.col("_change_type") == "delete").collect()
    )
    assert dels == [5, 6, 7]


def test_dv_then_compaction_drops_delete_state(spark, tmp_path):
    from icegopher_spark.iceberg.maintenance import compact_data_files

    t = W.create_table(str(tmp_path / "dv9"), SCHEMA)
    for base in (0, 50):
        t = W.append(t, _df(spark, [(base + i, float(i), "x") for i in range(50)]))
    t = W.delete_where_dv(t, spark, E.less_than("k", 10))
    before = _rows(t, spark)
    t = compact_data_files(
        t, spark, target_file_size=1 << 20, small_file_threshold=1 << 20
    )
    assert _rows(t, spark) == before


def test_dv_cow_delete_after_dv(spark, tmp_path):
    """CoW delete on a DV table must apply the DV before rewriting —
    rows DV-deleted earlier must not resurrect."""
    t = W.create_table(str(tmp_path / "dv10"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i), "a" if i < 15 else "b") for i in range(30)]))
    t = W.delete_where_dv(t, spark, E.less_than("k", 5))
    t = W.delete_where(t, spark, E.equal_to("tag", "b"))
    assert _rows(t, spark) == [(i, float(i), "a") for i in range(5, 15)]


def test_dv_time_travel_sees_old_state(spark, tmp_path):
    t = W.create_table(str(tmp_path / "dv11"), SCHEMA)
    t = W.append(t, _df(spark, [(i, float(i), "x") for i in range(10)]))
    s1 = t.current_snapshot().snapshot_id
    t = W.delete_where_dv(t, spark, E.less_than("k", 5))
    old = sorted(
        tuple(r) for r in t.scan(snapshot_id=s1).to_df(spark).collect()
    )
    assert old == [(i, float(i), "x") for i in range(10)]
    assert len(_rows(t, spark)) == 5
