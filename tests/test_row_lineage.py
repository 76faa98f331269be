"""Iceberg V3 row lineage: first-row-id assignment on commit,
read-time inheritance, _row_id/_last_updated_sequence_number scan
columns, stability across MOR/DV deletes, lineage-preserving
compaction, and lazy assignment after a v2->v3 upgrade.

Spec semantics (public Iceberg table spec v3): table metadata carries
``next-row-id``; each commit stamps the snapshot's ``first-row-id``
and assigns ranges to still-unassigned data manifests (manifest_file
field 520); data files inherit from the manifest (data_file field
142); a row's ``_row_id`` is first_row_id + position unless the file
materializes the reserved column explicitly.
"""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.evolve import upgrade_format_version
from icegopher_spark.iceberg.maintenance import compact_data_files
from icegopher_spark.iceberg.manifests import (
    DataFile,
    ManifestContent,
    ManifestEntry,
    ManifestEntryStatus,
    ManifestFile,
    fetch_entries,
    read_manifest_list,
    write_manifest,
    write_manifest_list,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import LongType, NestedField, StringType

SCHEMA = Schema(
    (
        NestedField(1, "id", LongType(), True),
        NestedField(2, "grp", StringType(), False),
    ),
    schema_id=0,
)


def _mkdf(spark, ids):
    rows = [(int(i), "even" if i % 2 == 0 else "odd") for i in ids]
    # one ordered file per append => _row_id assignment is deterministic
    return spark.createDataFrame(rows, "id bigint, grp string").coalesce(1).orderBy("id")


@pytest.fixture()
def v3_table(tmp_path, spark):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, format_version=3)
    t = W.append(t, _mkdf(spark, range(0, 10)))
    t = W.append(t, _mkdf(spark, range(100, 105)))
    return t


def _lineage_rows(spark, t, **scan_kw):
    df = t.scan(with_lineage=True, **scan_kw).to_df(spark)
    return {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in df.collect()
    }


def test_create_v3_metadata(tmp_path):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, format_version=3)
    assert t.metadata.format_version == 3
    assert t.metadata.next_row_id == 0


def test_append_assigns_ids(spark, v3_table):
    t = v3_table
    assert t.metadata.next_row_id == 15
    snaps = sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)
    assert snaps[0].first_row_id == 0
    assert snaps[1].first_row_id == 10
    got = _lineage_rows(spark, t)
    assert got == {
        **{i: (i, 1) for i in range(0, 10)},
        **{100 + k: (10 + k, 2) for k in range(5)},
    }


def test_manifest_list_first_row_id_roundtrip(v3_table):
    snap = v3_table.current_snapshot()
    manifests = read_manifest_list(v3_table.io.read(snap.manifest_list))
    data = [m for m in manifests if m.content == ManifestContent.DATA]
    assert sorted(m.first_row_id for m in data) == [0, 10]


def test_inheritance_skips_explicit_and_deleted():
    def df(path, n, frid=None):
        return DataFile(file_path=path, record_count=n, first_row_id=frid)

    entries = [
        ManifestEntry(ManifestEntryStatus.ADDED, 1, df("a", 4), 5, 5),
        ManifestEntry(ManifestEntryStatus.EXISTING, 1, df("b", 7, frid=1000), 3, 3),
        # DELETED entry between the null-id files: must neither receive
        # nor consume ids, in BOTH read modes — otherwise assignment
        # depends on discard_deleted and ids shift across readers
        ManifestEntry(ManifestEntryStatus.DELETED, 1, df("dead", 9), 2, 2),
        ManifestEntry(ManifestEntryStatus.ADDED, 1, df("c", 2), 5, 5),
    ]
    data = write_manifest(entries, [], "{}", "[]")
    mf = ManifestFile("m", len(data), sequence_number=5, first_row_id=50)
    out = fetch_entries(mf, data)
    by_path = {e.data_file.file_path: e.data_file.first_row_id for e in out}
    # explicit id kept and consumes nothing; null ids pack contiguously
    assert by_path == {"a": 50, "b": 1000, "dead": None, "c": 54}
    out_dd = fetch_entries(mf, data, discard_deleted=True)
    assert {
        e.data_file.file_path: e.data_file.first_row_id for e in out_dd
    } == {"a": 50, "b": 1000, "c": 54}
    # round-trip: materialized ids survive re-encode into a new manifest
    data2 = write_manifest(out, [], "{}", "[]")
    mf2 = ManifestFile("m2", len(data2), sequence_number=6, first_row_id=9999)
    out2 = fetch_entries(mf2, data2)
    assert {e.data_file.file_path: e.data_file.first_row_id for e in out2} == by_path


def test_mor_delete_keeps_ids(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E

    t = W.delete_where_mor(v3_table, spark, E.less_than("id", 3))
    got = _lineage_rows(spark, t)
    assert set(got) == set(range(3, 10)) | set(range(100, 105))
    assert got[3] == (3, 1) and got[104] == (14, 2)


def test_dv_delete_keeps_ids(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E

    t = W.delete_where_dv(v3_table, spark, E.equal_to("grp", "odd"))
    got = _lineage_rows(spark, t)
    assert set(got) == {0, 2, 4, 6, 8, 100, 102, 104}
    assert got == {
        **{i: (i, 1) for i in (0, 2, 4, 6, 8)},
        **{i: (10 + (i - 100), 2) for i in (100, 102, 104)},
    }


def test_compaction_preserves_ids(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E

    t = W.delete_where_dv(v3_table, spark, E.less_than("id", 5))
    before = _lineage_rows(spark, t)
    t = compact_data_files(t, spark, target_file_size=1 << 30)
    files = {
        task.file.file_path for task in t.scan().plan_files()
    }
    assert len(files) == 1, "compaction should have merged both small files"
    after = _lineage_rows(spark, t)
    assert after == before
    # and the table still answers a plain scan identically
    ids = sorted(
        r["id"] for r in t.scan().to_df(spark).collect()
    )
    assert ids == [5, 6, 7, 8, 9, 100, 101, 102, 103, 104]


def test_post_compaction_append_ids_fresh(spark, v3_table):
    t = compact_data_files(v3_table, spark, target_file_size=1 << 30)
    next_before = t.metadata.next_row_id
    t = W.append(t, _mkdf(spark, range(200, 203)))
    got = _lineage_rows(spark, t)
    assert got[200][0] == next_before
    assert [got[i][0] for i in (200, 201, 202)] == [
        next_before,
        next_before + 1,
        next_before + 2,
    ]
    # ids stay globally unique
    all_ids = [rid for rid, _ in got.values()]
    assert len(all_ids) == len(set(all_ids))


def test_upgrade_lazy_assignment(tmp_path, spark):
    t = W.create_table(str(tmp_path / "t"), SCHEMA)  # v2
    t = W.append(t, _mkdf(spark, range(0, 6)))
    with pytest.raises(ValueError, match="format-version 3"):
        t.scan(with_lineage=True)
    t = upgrade_format_version(t, 3)
    assert t.metadata.format_version == 3 and t.metadata.next_row_id == 0
    # pre-assignment files scan with null _row_id (no invented ids)
    got = _lineage_rows(spark, t)
    assert all(rid is None for rid, _ in got.values())
    # first post-upgrade commit assigns the whole table
    t = W.append(t, _mkdf(spark, range(10, 13)))
    got = _lineage_rows(spark, t)
    assert all(rid is not None for rid, _ in got.values())
    all_ids = sorted(rid for rid, _ in got.values())
    assert all_ids == list(range(9))
    assert t.metadata.next_row_id == 9


def test_downgrade_refused(v3_table):
    with pytest.raises(ValueError, match="downgrade"):
        upgrade_format_version(v3_table, 2)


def test_lineage_off_schema_unchanged(spark, v3_table):
    cols = t_cols = v3_table.scan().to_df(spark).columns
    assert "_row_id" not in cols and "_last_updated_sequence_number" not in t_cols


def test_rewrite_manifests_keeps_ids(spark, v3_table):
    from icegopher_spark.iceberg.maintenance import rewrite_manifests

    before = _lineage_rows(spark, v3_table)
    t = rewrite_manifests(v3_table)
    manifests = read_manifest_list(t.io.read(t.current_snapshot().manifest_list))
    assert len([m for m in manifests if m.content == ManifestContent.DATA]) == 1
    # consolidation materialized every id: rows keep them exactly
    assert _lineage_rows(spark, t) == before
    # and post-rewrite appends never collide with the materialized ids
    t = W.append(t, _mkdf(spark, range(300, 302)))
    got = _lineage_rows(spark, t)
    ids = [rid for rid, _ in got.values()]
    assert len(ids) == len(set(ids))


def test_update_where_preserves_ids_and_bumps_seq(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E

    before = _lineage_rows(spark, v3_table)
    t = W.update_where(v3_table, spark, E.less_than("id", 3), {"grp": "updated"})
    new_seq = t.metadata.last_sequence_number
    got = _lineage_rows(spark, t)
    assert set(got) == set(before)
    for i, (rid, seq) in got.items():
        assert rid == before[i][0], "update must carry _row_id forward"
        if i < 3:
            assert seq == new_seq, "updated rows bump to the committing seq"
        else:
            assert seq == before[i][1], "carried rows keep their old seq"
    rows = {r["id"]: r["grp"] for r in t.scan().to_df(spark).collect()}
    assert rows[0] == "updated" and rows[2] == "updated"
    assert rows[5] == "odd" and rows[100] == "even"


def test_update_where_rejects_unknown_column(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E

    with pytest.raises(ValueError, match="unknown columns"):
        W.update_where(v3_table, spark, E.less_than("id", 3), {"nope": 1})


def test_changelog_by_lineage(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E
    from icegopher_spark.iceberg.changelog import changelog_by_lineage

    t = v3_table
    s1 = t.current_snapshot().snapshot_id
    t = W.update_where(t, spark, E.equal_to("id", 4), {"grp": "upd"})
    t = W.delete_where_dv(t, spark, E.equal_to("id", 7))
    t = W.append(t, _mkdf(spark, [500]))
    # compaction moves every row between files — pure carryover noise
    # that a value-level diff would misreport; lineage must emit nothing
    t = compact_data_files(t, spark, target_file_size=1 << 30)

    df = changelog_by_lineage(t, spark, s1)
    rows = df.collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["_change_type"], []).append(r)
    assert [(r["id"], r["_row_id"]) for r in by_kind["insert"]] == [(500, 15)]
    assert [(r["id"], r["_row_id"], r["grp"]) for r in by_kind["delete"]] == [
        (7, 7, "odd")
    ]
    assert [(r["id"], r["_row_id"], r["grp"]) for r in by_kind["update_preimage"]] == [
        (4, 4, "even")
    ]
    assert [(r["id"], r["_row_id"], r["grp"]) for r in by_kind["update_postimage"]] == [
        (4, 4, "upd")
    ]
    assert len(rows) == 4, "carryover (compaction/CoW survivors) must not appear"


def test_changelog_by_lineage_refuses_unassigned(tmp_path, spark):
    from icegopher_spark.iceberg.changelog import changelog_by_lineage

    t = W.create_table(str(tmp_path / "t"), SCHEMA)  # v2
    t = W.append(t, _mkdf(spark, range(3)))
    s1 = t.current_snapshot().snapshot_id
    with pytest.raises(ValueError, match="format-version 3"):
        changelog_by_lineage(t, spark, s1)
    t = upgrade_format_version(t, 3)
    with pytest.raises(ValueError, match="no assigned row ids"):
        changelog_by_lineage(t, spark, s1, t.current_snapshot().snapshot_id)


def test_append_of_lineage_frame_gets_fresh_ids(spark, v3_table):
    """A user append of a frame that happens to carry _row_id (e.g. a
    scan-with-lineage copy) must get FRESH ids — the reserved columns
    are carried only by explicit lineage-preserving rewrites."""
    src = (
        v3_table.scan(with_lineage=True)
        .to_df(spark)
        .filter(F.col("id") < 2)
        .withColumn("id", F.col("id") + 9000)
    )
    t = W.append(v3_table, src)
    got = _lineage_rows(spark, t)
    ids = [rid for rid, _ in got.values()]
    assert len(ids) == len(set(ids)), "copied rows duplicated live _row_ids"
    assert got[9000][0] >= 15 and got[9001][0] >= 15


def test_zorder_preserves_ids(spark, v3_table):
    from icegopher_spark.iceberg.maintenance import rewrite_clustered

    before = _lineage_rows(spark, v3_table)
    t = rewrite_clustered(v3_table, spark, "id", "id", n_files=2)
    assert _lineage_rows(spark, t) == before


def test_changelog_by_lineage_across_schema_evolution(spark, v3_table):
    import icegopher_spark.iceberg.expressions as E
    from icegopher_spark.iceberg.changelog import changelog_by_lineage
    from icegopher_spark.iceberg.evolve import update_schema

    t = v3_table
    s1 = t.current_snapshot().snapshot_id
    t = (
        update_schema(t)
        .rename_column("grp", "bucket")
        .add_column("note", StringType(), default="d")
        .commit()
    )
    t = W.append(
        t,
        spark.createDataFrame(
            [(700, "even", "x")], "id bigint, bucket string, note string"
        ).coalesce(1),
    )
    t = W.delete_where_dv(t, spark, E.equal_to("id", 3))
    rows = changelog_by_lineage(t, spark, s1).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["_change_type"], []).append(r)
    assert [(r["id"], r["bucket"], r["note"]) for r in by_kind["insert"]] == [
        (700, "even", "x")
    ]
    # old-side image surfaces under CURRENT names; the post-snapshot
    # column fills with its initial-default
    assert [(r["id"], r["bucket"], r["note"]) for r in by_kind["delete"]] == [
        (3, "odd", "d")
    ]
    assert set(by_kind) == {"insert", "delete"}
