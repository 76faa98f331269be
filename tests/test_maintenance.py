"""Maintenance actions: compaction, manifest rewrite, snapshot
expiration, orphan files. Beyond-reference capabilities (reference write
path is WIP, cmd/icegopher/main.go:314) following Iceberg's maintenance
spec; required at 100 TB scale."""

import os

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import maintenance as M
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.manifests import ManifestContent, read_manifest_list
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.transforms import PartitionField, PartitionSpec, parse_transform
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = Schema(
    (
        NestedField(1, "l_orderkey", LongType(), True),
        NestedField(2, "l_quantity", DoubleType(), False),
        NestedField(3, "l_returnflag", StringType(), False),
    ),
    schema_id=0,
)


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )


def _mk_table(tmp_path, n_appends, lineitem, spec=None, rows_per=200):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, spec=spec)
    for i in range(n_appends):
        t = W.append(t, lineitem.limit(rows_per * (i + 1)).offset(rows_per * i))
    return t


def _data_file_paths(t):
    snap = t.current_snapshot()
    out = []
    for m in read_manifest_list(t.io.read(snap.manifest_list)):
        if m.content == ManifestContent.DELETES:
            continue
        from icegopher_spark.iceberg.manifests import fetch_entries

        for e in fetch_entries(m, t.io.read(m.manifest_path), discard_deleted=True):
            out.append(e.data_file.file_path)
    return out


def test_compact_small_files(spark, tmp_path, lineitem):
    t = _mk_table(tmp_path, 5, lineitem)
    before = t.scan().to_df(spark)
    n_before = before.count()
    files_before = _data_file_paths(t)
    assert len(files_before) == 5
    pre_snap = t.current_snapshot().snapshot_id

    t = M.compact_data_files(t, spark, target_file_size=64 * 1024 * 1024)
    files_after = _data_file_paths(t)
    assert len(files_after) == 1
    after = t.scan().to_df(spark)
    assert after.count() == n_before
    # value-level equality
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, before.collect()))
    assert t.current_snapshot().summary["operation"] == "replace"
    # time travel to pre-compaction still sees the old layout
    old = t.scan(snapshot_id=pre_snap).to_df(spark)
    assert old.count() == n_before


def test_compact_respects_partitions(spark, tmp_path, lineitem):
    spec = PartitionSpec([PartitionField(3, 1000, "flag", parse_transform("identity"))])
    t = _mk_table(tmp_path, 4, lineitem, spec=spec)
    n = t.scan().to_df(spark).count()
    t = M.compact_data_files(t, spark, target_file_size=64 * 1024 * 1024)
    files = _data_file_paths(t)
    # one output file per partition value (3 return flags)
    assert len(files) == 3
    assert t.scan().to_df(spark).count() == n
    # partition pruning still works post-compaction
    pruned = t.scan(row_filter=E.equal_to("l_returnflag", "R"))
    tasks = pruned.plan_files()
    assert len(tasks) == 1


def test_compact_applies_positional_deletes(spark, tmp_path, lineitem):
    t = _mk_table(tmp_path, 3, lineitem)
    t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 10.0))
    expect = t.scan().to_df(spark)
    n_expect = expect.count()
    assert n_expect < 600
    t = M.compact_data_files(t, spark, target_file_size=64 * 1024 * 1024)
    after = t.scan().to_df(spark)
    assert after.count() == n_expect
    assert after.filter(F.col("l_quantity") < 10.0).count() == 0
    # deletes were folded into the rewrite: compacted data has no
    # matching positional deletes anymore, but the table still scans
    # through the delete-aware path without double-applying
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, expect.collect()))


def test_rewrite_manifests(spark, tmp_path, lineitem):
    t = _mk_table(tmp_path, 6, lineitem)
    snap = t.current_snapshot()
    assert len(read_manifest_list(t.io.read(snap.manifest_list))) == 6
    n = t.scan().to_df(spark).count()
    t = M.rewrite_manifests(t)
    snap = t.current_snapshot()
    assert len(read_manifest_list(t.io.read(snap.manifest_list))) == 1
    assert t.scan().to_df(spark).count() == n
    # data files untouched — only metadata reorganized
    assert len(_data_file_paths(t)) == 6


def test_expire_snapshots(spark, tmp_path, lineitem):
    t = _mk_table(tmp_path, 3, lineitem)
    # overwrite makes the 3 appended files unreachable from the head
    t = W.overwrite(t, lineitem.limit(50))
    all_snaps = [s.snapshot_id for s in t.metadata.snapshots]
    assert len(all_snaps) == 4
    orphan_candidates = set(_data_file_paths(t))  # files of the head snapshot

    t = M.expire_snapshots(t, retain_last=1)
    assert [s.snapshot_id for s in t.metadata.snapshots] == all_snaps[-1:]
    # head still scans fine
    assert t.scan().to_df(spark).count() == 50
    # files referenced only by expired snapshots are gone from disk
    import glob

    on_disk = set(glob.glob(str(tmp_path / "tbl" / "data" / "**" / "*.parquet"), recursive=True))
    assert on_disk == {p.replace("file://", "") for p in orphan_candidates}
    # history pruned
    assert len(t.history()) == 1


def test_expire_keeps_refs(spark, tmp_path, lineitem):
    t = _mk_table(tmp_path, 3, lineitem)
    # tag the first snapshot as a ref
    first = t.metadata.snapshots[0].snapshot_id
    raw = t.metadata.to_json_dict()
    raw["refs"]["archive"] = {"snapshot-id": first, "type": "tag"}
    from icegopher_spark.iceberg.metadata import parse_metadata

    t.metadata = parse_metadata(raw)
    t = M.expire_snapshots(t, retain_last=1)
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert first in kept  # pinned by the tag
    assert t.scan(snapshot_id=first).to_df(spark).count() == 200


def test_orphan_files(spark, tmp_path, lineitem):
    t = _mk_table(tmp_path, 2, lineitem)
    junk = str(tmp_path / "tbl" / "data" / "leftover-uncommitted.parquet")
    lineitem.limit(5).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "junkdir"))
    os.makedirs(os.path.dirname(junk), exist_ok=True)
    with open(junk, "wb") as f:
        f.write(b"not really parquet")
    # default 3-day age threshold: the just-written junk file is too
    # young — an in-flight writer's files must never be classified
    assert junk not in M.orphan_files(t)
    orphans = M.orphan_files(t, older_than_ms=0)
    assert junk in orphans
    # nothing referenced is listed
    referenced = {p.replace("file://", "") for p in _data_file_paths(t)}
    assert not (set(orphans) & referenced)
    assert junk not in M.remove_orphan_files(t)  # age-guarded by default
    removed = M.remove_orphan_files(t, older_than_ms=0)
    assert junk in removed and not os.path.exists(junk)
    assert t.scan().to_df(spark).count() == 400


# -- z-order clustering rewrite ---------------------------------------------


def _py_morton(a: int, b: int) -> int:
    z = 0
    for i in range(31):
        z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_morton(spark):
    from icegopher_spark.operators.zorder import zvalue

    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 67890), (2**31 - 1, 2**31 - 1)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in df.withColumn("z", zvalue(F.col("a"), F.col("b"))).collect()}
    for a, b in pairs:
        assert got[(a, b)] == _py_morton(a, b), (a, b)


def test_zvalue_nulls_sort_first(spark):
    from icegopher_spark.operators.zorder import zvalue

    df = spark.createDataFrame([(None, 5), (5, None), (0, 0)], "a long, b long")
    zs = [r["z"] for r in df.withColumn("z", zvalue(F.col("a"), F.col("b"))).collect()]
    assert zs[0] == -1 and zs[1] == -1 and zs[2] == 0


def test_rewrite_clustered_prunes_and_preserves(spark, tmp_path):
    schema = Schema(
        (
            NestedField(1, "x", LongType(), True),
            NestedField(2, "y", LongType(), True),
        ),
        schema_id=0,
    )
    # a grid: x-sorted appends give tight x bounds but full-range y bounds
    rows = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    t = W.create_table(str(tmp_path / "zt"), schema)
    t = W.append(t, rows)
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))
    t = M.rewrite_clustered(t, spark, "x", "y", n_files=8)

    assert t.current_snapshot().summary["operation"] == "replace"
    after = sorted(map(tuple, t.scan().to_df(spark).collect()))
    assert after == before  # lossless rewrite

    flt = (
        E.greater_than_or_equal("x", 10)
        & E.less_than_or_equal("x", 20)
        & E.greater_than_or_equal("y", 10)
        & E.less_than_or_equal("y", 20)
    )
    planned = len(t.scan(row_filter=flt).plan_files())
    total = int(t.current_snapshot().summary["total-data-files"])
    assert total == 8
    # an 11x64 box of a 64x64 grid must not need every z-range file
    assert planned < total


def test_rewrite_clustered_partitioned_table(spark, tmp_path):
    """Round-5: z-order rewrite of a PARTITIONED table clusters within
    each partition of the live spec — lossless, files stay under their
    partition dirs, and a box query prunes beyond the partition filter."""
    from icegopher_spark.iceberg.transforms import (
        PartitionField,
        PartitionSpec,
        parse_transform,
    )
    from icegopher_spark.iceberg.types import StringType

    schema = Schema(
        (
            NestedField(1, "x", LongType(), True),
            NestedField(2, "y", LongType(), True),
            NestedField(3, "g", StringType(), False),
        ),
        schema_id=0,
    )
    spec = PartitionSpec([PartitionField(3, 1000, "g_p", parse_transform("identity"))])
    rows = spark.range(0, 8192).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") / 64) % 64).cast("long").alias("y"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
    )
    t = W.create_table(str(tmp_path / "zp"), schema, spec)
    t = W.append(t, rows)
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))
    t = M.rewrite_clustered(t, spark, "x", "y", n_files=8)

    assert t.current_snapshot().summary["operation"] == "replace"
    after = sorted(map(tuple, t.scan().to_df(spark).collect()))
    assert after == before  # lossless rewrite

    tasks = t.scan().plan_files()
    assert all("g_p=" in task.file.file_path for task in tasks)
    assert all(task.file.partition.get("g_p") in ("even", "odd") for task in tasks)

    part = E.equal_to("g", "even")
    box = (
        part
        & E.greater_than_or_equal("x", 10)
        & E.less_than_or_equal("x", 20)
        & E.greater_than_or_equal("y", 10)
        & E.less_than_or_equal("y", 20)
    )
    part_only = len(t.scan(row_filter=part).plan_files())
    planned = len(t.scan(row_filter=box).plan_files())
    assert planned < part_only  # z-stats prune beyond partition pruning


def test_zvalue_n_matches_reference(spark):
    """3-column Morton must interleave bit i of column j at position
    i*3 + j (python reference), nulls -> -1."""
    from icegopher_spark.operators.zorder import zvalue_n

    def ref(vals, n=3, bits=21):
        z = 0
        for j, v in enumerate(vals):
            v = max(0, min(v, (1 << bits) - 1))
            for i in range(bits):
                z |= ((v >> i) & 1) << (i * n + j)
        return z

    rows = [(0, 0, 0), (1, 2, 4), (7, 7, 7), (2**21 - 1, 5, 2**40), (None, 1, 2)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c", zvalue_n([F.col("a"), F.col("b"), F.col("c")]).alias("z")
    ).collect()
    for r in got:
        if r.a is None:
            assert r.z == -1
        else:
            assert r.z == ref([r.a, r.b, r.c]), (r.a, r.b, r.c)


def test_rewrite_clustered_three_columns(spark, tmp_path):
    """3-column z-order rewrite: lossless, and a 3-D box query prunes."""
    schema = Schema(
        (
            NestedField(1, "x", LongType(), True),
            NestedField(2, "y", LongType(), True),
            NestedField(3, "w", LongType(), True),
        ),
        schema_id=0,
    )
    rows = spark.range(0, 4096).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16) % 16).cast("long").alias("y"),
        (F.col("id") / 256).cast("long").alias("w"),
    )
    t = W.create_table(str(tmp_path / "z3"), schema)
    t = W.append(t, rows)
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))
    t = M.rewrite_clustered(t, spark, "x", "y", "w", n_files=8)
    after = sorted(map(tuple, t.scan().to_df(spark).collect()))
    assert after == before

    flt = (
        E.greater_than_or_equal("x", 2) & E.less_than_or_equal("x", 5)
        & E.greater_than_or_equal("y", 2) & E.less_than_or_equal("y", 5)
        & E.greater_than_or_equal("w", 2) & E.less_than_or_equal("w", 5)
    )
    planned = len(t.scan(row_filter=flt).plan_files())
    total = int(t.current_snapshot().summary["total-data-files"])
    assert total == 8
    assert planned < total


# --- positional-delete -> deletion-vector migration ----------------------


def _delete_manifest_entries(t):
    from icegopher_spark.iceberg.manifests import DataFileContent, fetch_entries

    snap = t.current_snapshot()
    pos, dvs, eqs = [], [], []
    for m in read_manifest_list(t.io.read(snap.manifest_list)):
        if m.content != ManifestContent.DELETES:
            continue
        for e in fetch_entries(m, t.io.read(m.manifest_path), discard_deleted=True):
            f = e.data_file
            if f.content == DataFileContent.EQUALITY_DELETES:
                eqs.append(f)
            elif f.is_deletion_vector:
                dvs.append(f)
            else:
                pos.append(f)
    return pos, dvs, eqs


def test_rewrite_deletes_migrates_pos_files(spark, tmp_path, lineitem):
    from icegopher_spark.iceberg.evolve import upgrade_format_version

    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=2)
    t = W.append(t, lineitem.limit(400))
    t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 5.0))
    t = W.delete_where_mor(t, spark, E.equal_to("l_returnflag", "A"))
    pos, dvs, _ = _delete_manifest_entries(t)
    assert pos and not dvs
    old_pd_paths = {f.file_path.replace("file://", "") for f in pos}
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))

    t = upgrade_format_version(t, 3)
    t = M.rewrite_position_delete_files(t, spark)

    pos, dvs, _ = _delete_manifest_entries(t)
    assert not pos, "positional-delete entries must be retired"
    assert dvs, "expected replacement deletion vectors"
    # one DV per referenced data file (V3 invariant)
    refs = [f.referenced_data_file for f in dvs]
    assert len(refs) == len(set(refs))
    after = sorted(map(tuple, t.scan().to_df(spark).collect()))
    assert after == before
    assert t.current_snapshot().summary["operation"] == "replace"

    # expire then reclaims the old positional-delete parquet files
    t = M.expire_snapshots(t, retain_last=1)
    for p in old_pd_paths:
        assert not os.path.exists(p), f"expire left stale pos-delete file {p}"
    assert sorted(map(tuple, t.scan().to_df(spark).collect())) == before


def test_rewrite_deletes_folds_existing_dv(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(400))
    t = W.delete_where_dv(t, spark, E.less_than("l_quantity", 3.0))
    t = W.delete_where_mor(t, spark, E.equal_to("l_returnflag", "R"))
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))
    pos, dvs, _ = _delete_manifest_entries(t)
    assert pos and dvs

    t = M.rewrite_position_delete_files(t, spark)
    pos, dvs, _ = _delete_manifest_entries(t)
    assert not pos
    refs = [f.referenced_data_file for f in dvs]
    assert len(refs) == len(set(refs)), "superseded DV entries must be dropped"
    assert sorted(map(tuple, t.scan().to_df(spark).collect())) == before


def test_rewrite_deletes_preserves_eq_deletes(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(300))
    keys = lineitem.limit(300).filter(F.col("l_returnflag") == "N").select("l_orderkey").distinct().limit(5)
    t = W.delete_keys(t, spark, keys, ["l_orderkey"])
    t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 2.0))
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))

    t = M.rewrite_position_delete_files(t, spark)
    pos, dvs, eqs = _delete_manifest_entries(t)
    assert not pos and dvs and eqs, "equality deletes must survive migration"
    assert sorted(map(tuple, t.scan().to_df(spark).collect())) == before


def test_rewrite_deletes_requires_v3(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=2)
    t = W.append(t, lineitem.limit(100))
    with pytest.raises(ValueError, match="format-version"):
        M.rewrite_position_delete_files(t, spark)


def test_rewrite_deletes_noop_without_pos_deletes(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(100))
    t = W.delete_where_dv(t, spark, E.less_than("l_quantity", 3.0))
    snap = t.current_snapshot().snapshot_id
    t2 = M.rewrite_position_delete_files(t, spark)
    assert t2.current_snapshot().snapshot_id == snap, "no-op must not commit"


def test_rewrite_deletes_drops_dead_file_garbage(spark, tmp_path, lineitem):
    """After compaction, positional-delete files reference only
    rewritten-away data files; migration must retire the garbage
    entries without writing any DV and leave the scan unchanged."""
    from icegopher_spark.iceberg.evolve import upgrade_format_version

    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=2)
    for i in range(3):
        t = W.append(t, lineitem.limit(100 * (i + 1)).offset(100 * i))
    t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 4.0))
    t = M.compact_data_files(t, spark, target_file_size=64 * 1024 * 1024)
    pos, dvs, _ = _delete_manifest_entries(t)
    assert pos, "compaction carries delete manifests forward"
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))

    t = upgrade_format_version(t, 3)
    t = M.rewrite_position_delete_files(t, spark)
    pos, dvs, _ = _delete_manifest_entries(t)
    assert not pos and not dvs, "dead-file garbage needs no DV"
    assert sorted(map(tuple, t.scan().to_df(spark).collect())) == before


def test_cli_rewrite_deletes(spark, tmp_path, lineitem, capsys):
    from icegopher_spark.iceberg.cli import main as cli_main
    from icegopher_spark.iceberg.evolve import upgrade_format_version

    wh = tmp_path / "wh"
    (wh / "db").mkdir(parents=True)
    t = W.create_table(str(wh / "db" / "li"), SCHEMA, format_version=2)
    t = W.append(t, lineitem.limit(200))
    t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 5.0))
    upgrade_format_version(t, 3)

    rc = cli_main(["--catalog", str(wh), "rewrite-deletes", "db.li"])
    out = capsys.readouterr().out
    assert rc == 0 and "deletion vectors" in out
    # second run: nothing left to migrate
    rc = cli_main(["--catalog", str(wh), "rewrite-deletes", "db.li"])
    out = capsys.readouterr().out
    assert rc == 0 and "no positional-delete files" in out


# --- equality-delete -> deletion-vector conversion ------------------------


def test_rewrite_equality_deletes(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(400))
    keys = (
        lineitem.limit(400)
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey")
        .distinct()
    )
    t = W.delete_keys(t, spark, keys, ["l_orderkey"])
    # a later append re-inserting deleted keys must survive (seq scope)
    reinsert = lineitem.limit(400).filter(F.col("l_orderkey") % 7 == 0).limit(5)
    t = W.append(t, reinsert)
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))
    pos, dvs, eqs = _delete_manifest_entries(t)
    assert eqs and not dvs

    t = M.rewrite_equality_deletes(t, spark)
    pos, dvs, eqs = _delete_manifest_entries(t)
    assert not eqs, "equality-delete entries must be retired"
    assert dvs, "expected replacement deletion vectors"
    refs = [f.referenced_data_file for f in dvs]
    assert len(refs) == len(set(refs))
    assert sorted(map(tuple, t.scan().to_df(spark).collect())) == before

    # a fresh eq delete after conversion still applies (normal MOR path)
    more = t.scan().to_df(spark).select("l_orderkey").distinct().limit(3)
    t = M.rewrite_equality_deletes(W.delete_keys(t, spark, more, ["l_orderkey"]), spark)
    pos, dvs, eqs = _delete_manifest_entries(t)
    assert not eqs


def test_rewrite_equality_deletes_noop_and_guard(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "v2"), SCHEMA, format_version=2)
    t = W.append(t, lineitem.limit(50))
    with pytest.raises(ValueError, match="format-version"):
        M.rewrite_equality_deletes(t, spark)

    t3 = W.create_table(str(tmp_path / "v3"), SCHEMA, format_version=3)
    t3 = W.append(t3, lineitem.limit(50))
    snap = t3.current_snapshot().snapshot_id
    out = M.rewrite_equality_deletes(t3, spark)
    assert out.current_snapshot().snapshot_id == snap, "no eq deletes -> no commit"


def test_rewrite_equality_deletes_folds_prior_dv(spark, tmp_path, lineitem):
    """A file carrying both a DV (from a prior DV delete) and an
    applicable eq delete gets ONE replacement DV unioning both."""
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(300))
    t = W.delete_where_dv(t, spark, E.less_than("l_quantity", 3.0))
    keys = (
        lineitem.limit(300)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .limit(20)
    )
    t = W.delete_keys(t, spark, keys, ["l_orderkey"])
    before = sorted(map(tuple, t.scan().to_df(spark).collect()))

    t = M.rewrite_equality_deletes(t, spark)
    pos, dvs, eqs = _delete_manifest_entries(t)
    assert not eqs
    refs = [f.referenced_data_file for f in dvs]
    assert len(refs) == len(set(refs)), "one DV per file after the fold"
    assert sorted(map(tuple, t.scan().to_df(spark).collect())) == before


def test_rewrite_equality_deletes_rename_safe(spark, tmp_path, lineitem):
    """r7 review: a by-name current-schema read after a column rename
    nulls the eq-key column, matches nothing, and the eq entries were
    still dropped — silent resurrection. The field-ID read must match."""
    from icegopher_spark.iceberg.evolve import update_schema

    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(200))
    keys = lineitem.limit(200).select("l_orderkey").distinct().limit(10)
    t = W.delete_keys(t, spark, keys, ["l_orderkey"])
    expect_n = t.scan().to_df(spark).count()
    t = update_schema(t).rename_column("l_orderkey", "okey").commit()

    t = M.rewrite_equality_deletes(t, spark)
    pos, dvs, eqs = _delete_manifest_entries(t)
    assert not eqs and dvs, "rename must not defeat the key match"
    assert t.scan().to_df(spark).count() == expect_n


def test_delete_where_dv_rename_safe(spark, tmp_path, lineitem):
    """Same lesson for the DV delete path: the filter binds against the
    CURRENT name but files physically carry the old one."""
    from icegopher_spark.iceberg.evolve import update_schema

    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, format_version=3)
    t = W.append(t, lineitem.limit(200))
    t = update_schema(t).rename_column("l_quantity", "qty").commit()
    t = W.delete_where_dv(t, spark, E.less_than("qty", 5.0))
    got = t.scan().to_df(spark)
    assert got.filter(F.col("qty") < 5.0).count() == 0
    assert got.count() == lineitem.limit(200).filter(F.col("l_quantity") >= 5.0).count()


def test_compute_table_stats_ndv(spark, tmp_path):
    """ANALYZE: exact NDV per column written as Puffin blobs, registered
    under metadata statistics, replaced (not duplicated) on re-run, and
    readable through both table_ndv and the raw Puffin footer."""
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.maintenance import (
        NDV_BLOB_TYPE,
        compute_table_stats,
        table_ndv,
    )
    from icegopher_spark.iceberg.puffin import read_puffin_footer
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, StringType

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "tag", StringType(), False),
        ),
        schema_id=0,
    )
    loc = str(tmp_path / "stats")
    t = W.create_table(loc, sch)
    rows = [(i % 7, "ab"[i % 2]) for i in range(50)]
    t = W.append(t, spark.createDataFrame(rows, "k long, tag string"))
    t = compute_table_stats(t, spark)

    assert table_ndv(t) == {"k": 7, "tag": 2}
    reg = t.metadata.statistics
    assert len(reg) == 1 and reg[0]["snapshot-id"] == t.current_snapshot().snapshot_id
    # raw Puffin: blob payload is the 8-byte big-endian ndv; footer
    # size registered exactly
    data = t.io.read(reg[0]["statistics-path"])
    footer = read_puffin_footer(data)
    by_field = {b["fields"][0]: b for b in footer["blobs"]}
    assert by_field[1]["type"] == NDV_BLOB_TYPE
    off, ln = by_field[1]["offset"], by_field[1]["length"]
    assert int.from_bytes(data[off : off + ln], "big") == 7
    assert reg[0]["file-size-in-bytes"] == len(data)

    # re-run replaces the entry for the same snapshot
    t = compute_table_stats(t, spark)
    assert len(t.metadata.statistics) == 1
    # a new snapshot gets its own entry; the old one is retained
    t = W.append(t, spark.createDataFrame([(99, "z")], "k long, tag string"))
    t = compute_table_stats(t, spark)
    assert len(t.metadata.statistics) == 2
    assert table_ndv(t) == {"k": 8, "tag": 3}
    # column subset MERGES with the snapshot's prior registration
    # (r8 review: a partial re-analyze must not destroy other columns)
    t2 = compute_table_stats(t, spark, columns=["tag"])
    assert table_ndv(t2) == {"k": 8, "tag": 3}
    with pytest.raises(ValueError, match="eligible"):
        compute_table_stats(t, spark, columns=["nope"])


def test_orphan_files_distributed_matches_driver(spark, tmp_path, lineitem):
    """r8 verdict #2: the distributed discovery (executor-side manifest
    decode + parallel tree walk + anti-join) classifies a many-files
    table EXACTLY like the driver walk — same orphans, same live-file
    protection, same age guard, same _cache/noise exclusions."""
    t = _mk_table(tmp_path, 4, lineitem, rows_per=100)
    ddir = str(tmp_path / "tbl" / "data")
    os.makedirs(ddir, exist_ok=True)
    # plant a spread of junk: fake datafiles, nested dir garbage,
    # noise files that must NOT be treated as orphans, a _cache
    # sidecar, and a too-young file under a nonzero age cutoff
    junk = [f"{ddir}/zz-junk-{i}.parquet" for i in range(25)]
    nested = str(tmp_path / "tbl" / "data" / "deep" / "deeper")
    os.makedirs(nested, exist_ok=True)
    junk += [f"{nested}/stray-{i}.bin" for i in range(5)]
    for p in junk:
        with open(p, "wb") as f:
            f.write(b"junk")
    for noise in ("_SUCCESS", "x.crc", "_started_123", "_committed_456"):
        with open(f"{ddir}/{noise}", "wb") as f:
            f.write(b"")
    cache_dir = str(tmp_path / "tbl" / "data" / "_cache")
    os.makedirs(cache_dir, exist_ok=True)
    with open(f"{cache_dir}/density.parquet", "wb") as f:
        f.write(b"sidecar")
    # a file directly under the table ROOT exercises the driver-listed
    # top_files branch (no directory to fan out)
    root_junk = str(tmp_path / "tbl" / "root-stray.tmp")
    with open(root_junk, "wb") as f:
        f.write(b"stray")
    junk.append(root_junk)

    driver = M.orphan_files(t, older_than_ms=0)
    dist = M.orphan_files_distributed(t, spark, older_than_ms=0)
    assert dist == driver
    assert set(junk) <= set(dist)
    assert not any("_cache" in p for p in dist)
    assert not any(os.path.basename(p).startswith(("_SUCCESS", "_started", "_committed")) for p in dist)
    # age guard: with the default 3-day cutoff nothing just-written
    # qualifies on either path
    assert M.orphan_files_distributed(t, spark) == M.orphan_files(t)
    # distributed removal leaves the table scannable and junk gone
    removed = M.remove_orphan_files(t, older_than_ms=0, spark=spark)
    assert set(junk) <= set(removed)
    assert t.scan().to_df(spark).count() == 400


def test_compute_table_stats_approx_mode(spark):
    """r8 verdict #3: mode='approx' (HyperLogLog++ via
    approx_count_distinct) pins its relative error against exact NDV
    on the lineitem fixture and marks its blobs ndv-mode=approx so
    readers can tell; exact stays the default/oracled path."""
    import tempfile

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.maintenance import (
        compute_table_stats,
        table_ndv,
    )
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField

    sch = Schema(
        (
            NestedField(1, "l_orderkey", LongType(), True),
            NestedField(2, "l_quantity", DoubleType(), False),
        ),
        schema_id=0,
    )
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    with tempfile.TemporaryDirectory() as d:
        t = W.create_table(f"{d}/t", sch)
        t = W.append(t, li)
        exact = table_ndv(compute_table_stats(t, spark))
        ta = compute_table_stats(t, spark, mode="approx", approx_rsd=0.05)
        approx = table_ndv(ta)
        for col in ("l_orderkey", "l_quantity"):
            rel_err = abs(approx[col] - exact[col]) / exact[col]
            # rsd=0.05 → 3-sigma bound 15%; generous but pinned
            assert rel_err < 0.15, (col, approx[col], exact[col])
        # approx blobs are marked so a reader can tell
        reg = ta.metadata.statistics[-1]
        for b in reg["blob-metadata"]:
            assert b["properties"]["ndv-mode"] == "approx"
            assert b["properties"]["ndv-rsd"] == "0.05"
        with pytest.raises(ValueError, match="mode"):
            compute_table_stats(t, spark, mode="bogus")


def test_cli_analyze(spark, tmp_path, lineitem, capsys):
    """r9: `analyze` CLI verb — exact and approx modes both register
    NDV stats and report them."""
    import json as _json

    from icegopher_spark.iceberg.cli import main as cli_main

    wh = tmp_path / "wh"
    (wh / "db").mkdir(parents=True)
    t = W.create_table(str(wh / "db" / "li"), SCHEMA)
    W.append(t, lineitem.limit(200))

    rc = cli_main(["--catalog", str(wh), "analyze", "db.li"])
    out = capsys.readouterr().out
    assert rc == 0 and "ndv (exact)" in out
    exact = _json.loads(out.split(": ", 1)[1])
    assert exact["l_orderkey"] > 0

    rc = cli_main(
        ["--catalog", str(wh), "analyze", "db.li", "--approx", "--columns", "l_orderkey"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "approx" in out
    approx = _json.loads(out.split(": ", 1)[1])
    # merged registration keeps the other columns' exact blobs
    assert set(approx) == set(exact)
    assert abs(approx["l_orderkey"] - exact["l_orderkey"]) <= 0.15 * exact["l_orderkey"]
