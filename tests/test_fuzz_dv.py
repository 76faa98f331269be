"""Differential fuzz for deletion vectors: seeded random delete
sequences applied twice to identical tables — once with V2 positional
MOR deletes, once with V3 deletion vectors — must agree with each
other and with a Python set model after every step, on both read
faces. Also fuzzes the roaring serde against a brute-force bitmap at
container boundaries."""

import random

import numpy as np
import pytest

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.puffin import deserialize_roaring64, serialize_roaring64
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import LongType, NestedField, StringType

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "tag", StringType(), False),
    ),
    schema_id=0,
)


@pytest.mark.parametrize("seed", [3, 17])
def test_dv_vs_mor_vs_model(spark, tmp_path, seed):
    rng = random.Random(seed)

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, tag string").coalesce(1)

    t_mor = W.create_table(str(tmp_path / f"mor_{seed}"), SCHEMA)
    t_dv = W.create_table(str(tmp_path / f"dv_{seed}"), SCHEMA)
    model: set[tuple] = set()
    next_k = 0

    for step in range(6):
        op = rng.choice(["append", "delete", "delete", "append_delete"])
        if op == "append" or not model:
            rows = [(next_k + i, rng.choice("ab")) for i in range(rng.randint(5, 20))]
            next_k += len(rows)
            t_mor = W.append(t_mor, df_of(rows))
            t_dv = W.append(t_dv, df_of(rows))
            model.update(rows)
        else:
            lo = rng.randint(0, next_k)
            hi = lo + rng.randint(1, 12)
            pred = E.greater_than_or_equal("k", lo) & E.less_than("k", hi)
            t_mor = W.delete_where_mor(t_mor, spark, pred)
            t_dv = W.delete_where_dv(t_dv, spark, pred)
            model = {r for r in model if not (lo <= r[0] < hi)}
        got_mor = sorted(tuple(r) for r in t_mor.scan().to_df(spark).collect())
        got_dv = sorted(tuple(r) for r in t_dv.scan().to_df(spark).collect())
        want = sorted(model)
        assert got_dv == want, f"seed={seed} step={step} dv vs model"
        assert got_mor == want, f"seed={seed} step={step} mor vs model"

    # DSv2 face agrees at the end state
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    via_dsv2 = sorted(
        tuple(r)
        for r in spark.read.format("icegopher")
        .option("location", t_dv.location)
        .load()
        .collect()
    )
    assert via_dsv2 == sorted(model)


@pytest.mark.parametrize("seed", [1, 9, 42])
def test_roaring_fuzz_boundaries(seed):
    """Clustered draws around container boundaries (0, 4096, 65536,
    2^32) — the places a split-point off-by-one would hide."""
    rng = np.random.default_rng(seed)
    anchors = np.array([0, 4095, 4096, 4097, 65535, 65536, 2**32 - 1, 2**32, 2**33])
    parts = [
        (a + rng.integers(0, 64, size=200).astype(np.uint64)) for a in anchors
    ]
    # one dense container to force the bitset path
    parts.append(np.arange(10 * 65536, 10 * 65536 + 5000, dtype=np.uint64))
    v = np.unique(np.concatenate(parts))
    assert np.array_equal(deserialize_roaring64(serialize_roaring64(v)), v)


@pytest.mark.parametrize("seed", [7, 29])
def test_dv_migration_fuzz(spark, tmp_path, seed):
    """Migration invariant fuzz: random append/MOR-delete sequences on
    a V2 table, upgrade to v3, rewrite_position_delete_files —
    scan must equal the Python set model; zero positional-delete
    entries survive; at most one DV per referenced data file; a
    further DV delete after migration folds cleanly."""
    from icegopher_spark.iceberg.evolve import upgrade_format_version
    from icegopher_spark.iceberg.maintenance import (
        rewrite_position_delete_files,
    )
    from icegopher_spark.iceberg.manifests import (
        DataFileContent,
        ManifestContent,
        fetch_entries,
        read_manifest_list,
    )

    rng = random.Random(seed)

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, tag string").coalesce(1)

    t = W.create_table(str(tmp_path / f"mig_{seed}"), SCHEMA, format_version=2)
    model: set[tuple] = set()
    next_k = 0
    for _ in range(5):
        if rng.random() < 0.5 or not model:
            rows = [(next_k + i, rng.choice("abc")) for i in range(rng.randint(5, 25))]
            next_k += len(rows)
            t = W.append(t, df_of(rows))
            model.update(rows)
        else:
            lo = rng.randint(0, next_k)
            hi = lo + rng.randint(1, 15)
            pred = E.greater_than_or_equal("k", lo) & E.less_than("k", hi)
            t = W.delete_where_mor(t, spark, pred)
            model = {r for r in model if not (lo <= r[0] < hi)}

    t = upgrade_format_version(t, 3)
    t = rewrite_position_delete_files(t, spark)

    got = sorted(tuple(r) for r in t.scan().to_df(spark).collect())
    assert got == sorted(model), f"seed={seed} post-migration scan"
    pos, dv_refs = 0, []
    snap = t.current_snapshot()
    for m in read_manifest_list(t.io.read(snap.manifest_list)):
        if m.content != ManifestContent.DELETES:
            continue
        for e in fetch_entries(m, t.io.read(m.manifest_path), discard_deleted=True):
            f = e.data_file
            if f.is_deletion_vector:
                dv_refs.append(f.referenced_data_file)
            elif f.content == DataFileContent.POSITION_DELETES:
                pos += 1
    assert pos == 0, f"seed={seed}: {pos} positional-delete entries survive"
    assert len(dv_refs) == len(set(dv_refs)), f"seed={seed}: duplicate DVs"

    # post-migration DV delete folds on top of the migrated state
    if model:
        lo = min(r[0] for r in model)
        t = W.delete_where_dv(t, spark, E.equal_to("k", lo))
        model = {r for r in model if r[0] != lo}
        got = sorted(tuple(r) for r in t.scan().to_df(spark).collect())
        assert got == sorted(model), f"seed={seed} post-migration DV delete"


@pytest.mark.parametrize("seed", [11, 37])
def test_cdc_stream_vs_batch_changelog_fuzz(spark, tmp_path, seed):
    """Differential fuzz: random append/DV/MOR sequences on a v3 table
    — the CDC STREAM's change rows must equal changelog_df's over the
    same range (no CoW in the mix, so no carryover-netting divergence),
    and the batch DataSource face must equal the stream."""
    from icegopher_spark.iceberg.changelog import changelog_df
    from icegopher_spark.streaming.iceberg_cdc_source import (
        IcebergCdcStreamSource,
        IcebergChangesDataSource,
    )

    rng = random.Random(seed)

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, tag string").coalesce(1)

    loc = str(tmp_path / f"cdcfuzz_{seed}")
    t = W.create_table(loc, SCHEMA, format_version=3)
    next_k = 0
    have_rows = False
    for _ in range(6):
        op = rng.choice(["append", "dv", "mor"])
        if op == "append" or not have_rows:
            rows = [(next_k + i, rng.choice("abc")) for i in range(rng.randint(4, 15))]
            next_k += len(rows)
            t = W.append(t, df_of(rows))
            have_rows = True
        elif op == "dv":
            lo = rng.randint(0, next_k)
            t = W.delete_where_dv(
                t, spark, E.greater_than_or_equal("k", lo) & E.less_than("k", lo + 6)
            )
        else:
            t = W.delete_where_mor(t, spark, E.equal_to("tag", rng.choice("abc")))

    spark.dataSource.register(IcebergCdcStreamSource)
    spark.dataSource.register(IcebergChangesDataSource)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    key = lambda r: (r["_change_type"], r["k"], r["tag"], r["_commit_snapshot_id"])
    stream_rows = sorted(map(key, spark.read.parquet(out).collect()))

    root = t.metadata.snapshots[0].snapshot_id
    batch = changelog_df(t, spark, root, None)
    want = sorted(map(key, batch.collect()))
    # the stream additionally emits the ROOT snapshot's inserts, which
    # changelog_df(from=root) excludes (exclusive from)
    root_ins = sorted(
        ("insert", r["k"], r["tag"], root)
        for r in t.scan(snapshot_id=root).to_df(spark).collect()
    )
    assert stream_rows == sorted(want + root_ins), f"seed={seed} stream vs changelog"

    ds_rows = sorted(
        map(
            key,
            spark.read.format("icegopher_changes").option("location", loc).load().collect(),
        )
    )
    assert ds_rows == stream_rows, f"seed={seed} batch face vs stream"
