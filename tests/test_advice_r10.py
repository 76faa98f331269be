"""Regression tests for the round-10 ADVICE findings (Delta protocol
compliance of the DML/checkpoint plane):

  1. (high) restore_delta emits remove(path, CURRENT dv) alongside
     add(path, old dv) when a surviving path's deletion vector differs
     between the two versions — the protocol reconciles file actions
     by (path, dv uniqueId), so the old add alone left BOTH logical
     files live for spec-compliant readers.
  2. (med) legacy writer versions enforce the generated/identity
     column refusal: delta-spark writes generated columns at writer
     v4 and identity columns at v6 — gating only on minWriterVersion
     == 7 writerFeatures let legacy tables through.
  3. (med) adds that attach a deletion vector mark their stats
     tightBounds=false (wide bounds over the physical file), in DML
     commits AND checkpoint rows.
  4. (low) log replay keys file state by (path, dv uniqueId) — a
     foreign writer serializing add(path, new dv) BEFORE
     remove(path, old dv) in one commit reconciles identically.
  5. (low) checkpoints retain remove tombstones younger than
     delta.deletedFileRetentionDuration.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from icegopher_spark.delta import load_delta, read_delta
from icegopher_spark.delta_write import (
    append_delta,
    create_delta_table,
    delete_where_delta,
    restore_delta,
    write_checkpoint,
)

SCHEMA_DDL = "k long, v string"


def _mk_table(spark, loc, n=20):
    # single data file: the DV-swap assertions below inspect ONE
    # (path, dv) instance
    df = spark.createDataFrame([(i, f"v{i}") for i in range(n)], SCHEMA_DDL).coalesce(1)
    create_delta_table(loc, df.schema, None)
    append_delta(spark, loc, df)
    return df


def _commit_actions(loc, version):
    with open(os.path.join(loc, "_delta_log", f"{version:020d}.json")) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def test_restore_swaps_dv_with_remove_of_current_instance(spark, tmp_path):
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    v1 = load_delta(loc).version
    v2 = delete_where_delta(spark, loc, F.col("k") % 2 == 0)
    dv_current = dict(load_delta(loc).deletion_vectors)
    assert dv_current, "delete must attach a deletion vector"

    v3 = restore_delta(loc, v1)
    assert v3 == v2 + 1
    actions = _commit_actions(loc, v3)
    removes = [a["remove"] for a in actions if a.get("remove")]
    adds = [a["add"] for a in actions if a.get("add")]
    # the surviving path's CURRENT (path, dv) instance is removed...
    (dv_path, dv_desc), = dv_current.items()
    rel = os.path.relpath(dv_path, loc)
    rm = next(r for r in removes if r["path"] == rel)
    assert rm.get("deletionVector") == dv_desc
    # ...and the restored instance (no DV at v1) is re-added
    assert any(a["path"] == rel and "deletionVector" not in a for a in adds)
    # replay agrees: exactly the v1 row set, no duplicates
    rows = read_delta(spark, loc).collect()
    assert sorted(r["k"] for r in rows) == list(range(20))


def test_restore_after_dv_dml_roundtrip_via_replay(spark, tmp_path):
    """End-to-end: two DV generations, restore to the middle one — the
    (path, dv uniqueId)-keyed replay must land on exactly that DV."""
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    delete_where_delta(spark, loc, F.col("k") % 5 == 0)
    v_mid = load_delta(loc).version
    mid_dv = dict(load_delta(loc).deletion_vectors)
    delete_where_delta(spark, loc, F.col("k") % 3 == 0)

    restore_delta(loc, v_mid)
    snap = load_delta(loc)
    assert {os.path.relpath(p, loc): d for p, d in snap.deletion_vectors.items()} == {
        os.path.relpath(p, loc): d for p, d in mid_dv.items()
    }
    rows = read_delta(spark, loc).collect()
    assert sorted(r["k"] for r in rows) == [k for k in range(20) if k % 5 != 0]


@pytest.mark.parametrize(
    "min_writer, meta_key",
    [
        (4, "delta.generationExpression"),
        (6, "delta.identity.start"),
    ],
)
def test_legacy_writer_version_value_producing_refusal(
    spark, tmp_path, min_writer, meta_key
):
    loc = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], SCHEMA_DDL)
    create_delta_table(loc, df.schema, None)
    # rewrite commit 0: legacy protocol + a column carrying the
    # generated/identity obligation in its field metadata
    p0 = os.path.join(loc, "_delta_log", f"{0:020d}.json")
    actions = _commit_actions(loc, 0)
    for a in actions:
        if a.get("protocol"):
            a["protocol"] = {
                "minReaderVersion": 1,
                "minWriterVersion": min_writer,
            }
        if a.get("metaData"):
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"][1]["metadata"] = {meta_key: "something"}
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(p0, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")

    with pytest.raises(NotImplementedError, match="legacy minWriterVersion"):
        append_delta(spark, loc, df)


def test_legacy_writer_version_without_usage_still_writes(spark, tmp_path):
    """minWriterVersion=6 but NO generated/identity column in the
    schema: the obligation is vacuous — appends proceed."""
    loc = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], SCHEMA_DDL)
    create_delta_table(loc, df.schema, None)
    p0 = os.path.join(loc, "_delta_log", f"{0:020d}.json")
    actions = _commit_actions(loc, 0)
    for a in actions:
        if a.get("protocol"):
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 6}
    with open(p0, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    append_delta(spark, loc, df)
    assert read_delta(spark, loc).count() == 1


def test_dv_add_stats_marked_wide(spark, tmp_path):
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    v = delete_where_delta(spark, loc, F.col("k") < 3)
    adds = [a["add"] for a in _commit_actions(loc, v) if a.get("add")]
    dv_adds = [a for a in adds if a.get("deletionVector")]
    assert dv_adds
    for a in dv_adds:
        st = json.loads(a["stats"])
        assert st.get("tightBounds") is False
        # numRecords stays the PHYSICAL count (wide bounds semantics)
        assert st["numRecords"] == 20

    # checkpoint rows for DV-carrying files carry the same marking
    write_checkpoint(loc)
    import pyarrow.parquet as pq

    cp = pq.read_table(
        os.path.join(loc, "_delta_log", f"{v:020d}.checkpoint.parquet")
    ).to_pylist()
    cp_adds = [r["add"] for r in cp if r.get("add")]
    for a in cp_adds:
        if a.get("deletionVector") and a["deletionVector"].get("storageType"):
            assert json.loads(a["stats"]).get("tightBounds") is False


def test_replay_add_before_remove_in_one_commit(spark, tmp_path):
    """Foreign-writer action order: add(path, new dv) serialized BEFORE
    remove(path, old dv) in the same commit must keep exactly the new
    instance live (the old path-keyed last-wins replay dropped the
    file entirely)."""
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    v = delete_where_delta(spark, loc, F.col("k") % 4 == 0)
    # rewrite the DML commit with the add FIRST
    p = os.path.join(loc, "_delta_log", f"{v:020d}.json")
    actions = _commit_actions(loc, p and v)
    adds = [a for a in actions if a.get("add")]
    removes = [a for a in actions if a.get("remove")]
    others = [a for a in actions if not (a.get("add") or a.get("remove"))]
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(a) for a in others + adds + removes) + "\n")

    rows = read_delta(spark, loc).collect()
    assert sorted(r["k"] for r in rows) == [k for k in range(20) if k % 4 != 0]


def test_checkpoint_carries_unexpired_tombstones(spark, tmp_path):
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    v = delete_where_delta(spark, loc, F.col("k") % 2 == 0)
    cp_v = write_checkpoint(loc)
    import pyarrow.parquet as pq

    cp_rows = pq.read_table(
        os.path.join(loc, "_delta_log", f"{cp_v:020d}.checkpoint.parquet")
    ).to_pylist()
    removes = [r["remove"] for r in cp_rows if r.get("remove")]
    # the DV swap's remove (fresh — inside the 7-day default window)
    assert removes, "checkpoint must retain recent remove tombstones"
    assert all(rm["deletionTimestamp"] > 0 for rm in removes)
    # a reader seeded from the checkpoint sees them as tombstones, not
    # as live-set edits
    snap = load_delta(loc)
    assert {t["path"] for t in snap.tombstones} >= {rm["path"] for rm in removes}
    assert sorted(
        r["k"] for r in read_delta(spark, loc).collect()
    ) == [k for k in range(20) if k % 2 != 0]

    # tombstones expire with the configured retention: rebuild the
    # checkpoint with a zero-second window — no remove rows
    from icegopher_spark.delta_write import set_properties_delta

    set_properties_delta(
        loc, {"delta.deletedFileRetentionDuration": "interval 0 seconds"}
    )
    cp_v2 = write_checkpoint(loc)
    cp_rows2 = pq.read_table(
        os.path.join(loc, "_delta_log", f"{cp_v2:020d}.checkpoint.parquet")
    ).to_pylist()
    assert not any(r.get("remove") for r in cp_rows2)
    assert v  # silence unused warnings


def test_tombstones_survive_checkpoint_roundtrip(spark, tmp_path):
    """remove → checkpoint → vacuum the JSON prefix → the next
    checkpoint still carries the tombstone (seeded from the previous
    checkpoint, not from the vacuumed JSON)."""
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    v = delete_where_delta(spark, loc, F.col("k") % 2 == 0)
    cp1 = write_checkpoint(loc)
    for old_v in range(cp1):
        os.remove(os.path.join(loc, "_delta_log", f"{old_v:020d}.json"))
    df = spark.createDataFrame([(100, "x")], SCHEMA_DDL)
    append_delta(spark, loc, df)
    cp2 = write_checkpoint(loc)
    import pyarrow.parquet as pq

    cp_rows = pq.read_table(
        os.path.join(loc, "_delta_log", f"{cp2:020d}.checkpoint.parquet")
    ).to_pylist()
    assert any(r.get("remove") for r in cp_rows)
    assert v and cp2 > cp1


def test_domain_metadata_replay_and_checkpoint_carry(spark, tmp_path):
    """protocol § Domain Metadata: latest action per domain wins,
    removed=true tombstones it, and checkpoints carry live domains
    VERBATIM — dropping them erases another engine's state (the same
    loss class as dropping txn rows, fixed in r9)."""
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    v = load_delta(loc).version + 1
    lines = [
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": json.dumps({"cols": ["k"]}),
                            "removed": False}},
        {"domainMetadata": {"domain": "ephemeral.domain",
                            "configuration": "{}", "removed": False}},
        {"domainMetadata": {"domain": "ephemeral.domain",
                            "configuration": "{}", "removed": True}},
    ]
    with open(os.path.join(loc, "_delta_log", f"{v:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in lines) + "\n")

    snap = load_delta(loc)
    assert set(snap.domain_metadata) == {"delta.clustering"}
    assert json.loads(snap.domain_metadata["delta.clustering"]["configuration"]) == {
        "cols": ["k"]
    }

    # checkpoint → vacuum the JSON → the domain survives the roundtrip
    cp = write_checkpoint(loc)
    for old_v in range(cp + 1):
        p = os.path.join(loc, "_delta_log", f"{old_v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    snap2 = load_delta(loc)
    assert snap2.domain_metadata == snap.domain_metadata
    assert read_delta(spark, loc).count() == 20


def test_write_v2_checkpoint_roundtrip(spark, tmp_path):
    """write_checkpoint(style='v2') emits a uuid-named top file
    (checkpointMetadata + protocol/metaData/txn verbatim) + a sidecar
    with the file actions; after vacuuming every JSON commit the
    independent replay reconstructs files, DVs and tombstones.
    delta.checkpointPolicy=v2 selects it under style='auto'."""
    loc = str(tmp_path / "t")
    _mk_table(spark, loc)
    delete_where_delta(spark, loc, F.col("k") % 3 == 0)
    # enable the v2Checkpoints feature (the DV delete upgraded to
    # reader 3 / writer 7 already)
    snap = load_delta(loc)
    proto = dict(snap.protocol)
    proto["readerFeatures"] = sorted(set(proto["readerFeatures"]) | {"v2Checkpoints"})
    proto["writerFeatures"] = sorted(set(proto["writerFeatures"]) | {"v2Checkpoints"})
    v = snap.version + 1
    with open(os.path.join(loc, "_delta_log", f"{v:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": proto}) + "\n")

    from icegopher_spark.delta_write import set_properties_delta

    set_properties_delta(loc, {"delta.checkpointPolicy": "v2"})
    before = load_delta(loc)
    cp = write_checkpoint(loc)  # style='auto' → v2 via the policy
    d = os.path.join(loc, "_delta_log")
    v2_names = [
        fn for fn in os.listdir(d)
        if fn.startswith(f"{cp:020d}.checkpoint.") and fn != f"{cp:020d}.checkpoint.parquet"
    ]
    assert v2_names, "auto style must have produced a uuid-named v2 checkpoint"
    assert os.listdir(os.path.join(d, "_sidecars"))

    for old_v in range(cp + 1):
        p = os.path.join(d, f"{old_v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    after = load_delta(loc)
    assert after.protocol == before.protocol
    assert after.files == before.files
    assert after.deletion_vectors == before.deletion_vectors
    assert {t["path"] for t in after.tombstones} == {
        t["path"] for t in before.tombstones
    }
    got = sorted(r["k"] for r in read_delta(spark, loc).collect())
    assert got == [k for k in range(20) if k % 3 != 0]

    # explicit v2 on a table WITHOUT the feature refuses
    loc2 = str(tmp_path / "nofeat")
    _mk_table(spark, loc2)
    with pytest.raises(ValueError, match="v2Checkpoints"):
        write_checkpoint(loc2, style="v2")


def test_ict_writes_are_monotonic(spark, tmp_path, monkeypatch):
    """With delta.enableInCommitTimestamps=true, every commit carries a
    strictly-increasing commitInfo.inCommitTimestamp even when the wall
    clock stalls or runs backwards (§ ICT: max(now, prev+1))."""
    import icegopher_spark.delta_write as dw

    loc = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], SCHEMA_DDL)
    create_delta_table(
        loc, df.schema, None,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    # freeze the clock: monotonicity must come from prev+1, not time
    frozen = dw.time.time()
    monkeypatch.setattr(dw.time, "time", lambda: frozen)
    for _ in range(3):
        append_delta(spark, loc, df)

    icts = []
    for v in range(4):
        acts = _commit_actions(loc, v)
        ci = next(a["commitInfo"] for a in acts if a.get("commitInfo"))
        icts.append(ci["inCommitTimestamp"])
    assert icts == sorted(set(icts)), f"not strictly increasing: {icts}"
    # timestamp travel resolves by ICT
    assert load_delta(loc, timestamp_ms=icts[2]).version == 2
