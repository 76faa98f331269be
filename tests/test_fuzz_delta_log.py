"""Differential fuzz: random Delta transaction logs (adds, removes,
checkpoints, vacuumed prefixes) replayed by `load_delta` must match a
pure-Python simulator at EVERY version — the same idiom as the DV /
lineage / pruning fuzz suites."""

from __future__ import annotations

import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from icegopher_spark.delta import load_delta

_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_commit(loc, version, actions, ts):
    lines = [json.dumps({"commitInfo": {"timestamp": ts}})] + [
        json.dumps(a) for a in actions
    ]
    with open(
        os.path.join(loc, "_delta_log", f"{version:020d}.json"), "w"
    ) as f:
        f.write("\n".join(lines) + "\n")


def _write_checkpoint(loc, version, live: dict[str, dict]):
    pv_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [("path", pa.string()), ("partitionValues", pv_t), ("size", pa.int64()),
         ("modificationTime", pa.int64()), ("dataChange", pa.bool_())]
    )
    meta_t = pa.struct(
        [("id", pa.string()), ("format", pa.struct([("provider", pa.string())])),
         ("schemaString", pa.string()), ("partitionColumns", pa.list_(pa.string())),
         ("configuration", pa.map_(pa.string(), pa.string())), ("createdTime", pa.int64())]
    )
    proto_t = pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())])
    rows_add = [
        {"path": p, "partitionValues": list(pv.items()), "size": 1,
         "modificationTime": 1, "dataChange": False}
        for p, pv in sorted(live.items())
    ]
    n = 2 + len(rows_add)
    tbl = pa.table({
        "protocol": pa.array([{"minReaderVersion": 1, "minWriterVersion": 2}]
                             + [None] * (n - 1), type=proto_t),
        "metaData": pa.array([None, {"id": "f", "format": {"provider": "parquet"},
                                     "schemaString": _SCHEMA_STRING,
                                     "partitionColumns": ["p"],
                                     "configuration": [], "createdTime": 1}]
                             + [None] * (n - 2), type=meta_t),
        "add": pa.array([None, None] + rows_add, type=add_t),
    })
    pq.write_table(tbl, os.path.join(loc, "_delta_log", f"{version:020d}.checkpoint.parquet"))
    with open(os.path.join(loc, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": n}, f)


@pytest.mark.parametrize("seed", [11, 23, 47, 101])
def test_random_log_matches_simulator(tmp_path, seed):
    rng = random.Random(seed)
    loc = str(tmp_path / f"t{seed}")
    os.makedirs(os.path.join(loc, "_delta_log"))

    live: dict[str, dict] = {}          # simulator state
    states: list[dict] = []             # live set AFTER each version
    checkpoints: list[int] = []
    next_file = 0

    n_versions = rng.randint(4, 12)
    for v in range(n_versions):
        actions = []
        if v == 0:
            actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
            actions.append({"metaData": {
                "id": "f", "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA_STRING, "partitionColumns": ["p"],
                "configuration": {}, "createdTime": 1}})
        # random adds
        for _ in range(rng.randint(1 if v == 0 else 0, 3)):
            path = f"f{next_file}.parquet"
            next_file += 1
            pv = {"p": rng.choice(["a", "b", None])}
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 1, "modificationTime": 1,
                                    "dataChange": True}})
            live[path] = pv
        # random removes of live files
        for _ in range(rng.randint(0, 2)):
            if live and rng.random() < 0.7:
                path = rng.choice(sorted(live))
                actions.append({"remove": {"path": path, "deletionTimestamp": 1,
                                           "dataChange": True}})
                del live[path]
        # re-add of a previously removed path (upsert-style) sometimes
        if rng.random() < 0.2 and next_file > 0:
            path = f"f{rng.randrange(next_file)}.parquet"
            pv = {"p": "r"}
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 2, "modificationTime": 2,
                                    "dataChange": True}})
            live[path] = pv
        _write_commit(loc, v, actions, ts=1000 + v)
        states.append(dict(live))
        if rng.random() < 0.3:
            _write_checkpoint(loc, v, live)
            checkpoints.append(v)

    # every version reconstructs exactly (JSON fully present)
    for v, expect in enumerate(states):
        snap = load_delta(loc, version=v)
        got = {os.path.relpath(p, loc): pv for p, pv in snap.files}
        # None partition values serialize as null and come back as None
        assert got == expect, f"seed={seed} v={v}"

    # timestamp travel agrees with version travel
    for v in range(n_versions):
        assert load_delta(loc, timestamp_ms=1000 + v).version == v

    # vacuum the JSON prefix up to the LAST checkpoint: replay must
    # still reconstruct every version >= that checkpoint
    if checkpoints:
        cp = max(checkpoints)
        for v in range(cp):
            os.remove(os.path.join(loc, "_delta_log", f"{v:020d}.json"))
        for v in range(cp, n_versions):
            snap = load_delta(loc, version=v)
            got = {os.path.relpath(p, loc): pv for p, pv in snap.files}
            assert got == states[v], f"seed={seed} post-vacuum v={v}"


def _write_checkpoint_dv(loc, version, live: dict[str, tuple]):
    """Checkpoint writer for the DV fuzz: live maps path -> (pv, dv|None)."""
    pv_t = pa.map_(pa.string(), pa.string())
    dv_t = pa.struct(
        [("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
         ("offset", pa.int32()), ("sizeInBytes", pa.int32()),
         ("cardinality", pa.int64())]
    )
    add_t = pa.struct(
        [("path", pa.string()), ("partitionValues", pv_t), ("size", pa.int64()),
         ("modificationTime", pa.int64()), ("dataChange", pa.bool_()),
         ("deletionVector", dv_t)]
    )
    meta_t = pa.struct(
        [("id", pa.string()), ("format", pa.struct([("provider", pa.string())])),
         ("schemaString", pa.string()), ("partitionColumns", pa.list_(pa.string())),
         ("configuration", pa.map_(pa.string(), pa.string())), ("createdTime", pa.int64())]
    )
    proto_t = pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
                         ("readerFeatures", pa.list_(pa.string())),
                         ("writerFeatures", pa.list_(pa.string()))])
    rows_add = [
        {"path": p, "partitionValues": list(pv.items()), "size": 1,
         "modificationTime": 1, "dataChange": False, "deletionVector": dv}
        for p, (pv, dv) in sorted(live.items())
    ]
    n = 2 + len(rows_add)
    tbl = pa.table({
        "protocol": pa.array(
            [{"minReaderVersion": 3, "minWriterVersion": 7,
              "readerFeatures": ["deletionVectors"],
              "writerFeatures": ["deletionVectors"]}] + [None] * (n - 1),
            type=proto_t),
        "metaData": pa.array([None, {"id": "f", "format": {"provider": "parquet"},
                                     "schemaString": _SCHEMA_STRING,
                                     "partitionColumns": ["p"],
                                     "configuration": [], "createdTime": 1}]
                             + [None] * (n - 2), type=meta_t),
        "add": pa.array([None, None] + rows_add, type=add_t),
    })
    pq.write_table(tbl, os.path.join(loc, "_delta_log", f"{version:020d}.checkpoint.parquet"))
    with open(os.path.join(loc, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": n}, f)


def _rand_dv(rng) -> dict:
    """A structurally valid inline DV descriptor (never dereferenced by
    metadata-only replay; positions [k] keep cardinality honest)."""
    from icegopher_spark.delta_dv import z85encode
    from icegopher_spark.iceberg.puffin import DV_MAGIC, serialize_roaring64

    k = rng.randrange(5)
    body = DV_MAGIC + serialize_roaring64([k])
    return {
        "storageType": "i",
        "pathOrInlineDv": z85encode(body),
        "sizeInBytes": len(body),
        "cardinality": 1,
    }


@pytest.mark.parametrize("seed", [7, 31, 59, 97])
def test_random_log_with_dvs_and_compaction(tmp_path, seed):
    """Round-10 surface under fuzz: DV attach/update (remove+add swap),
    dataChange=false compactions, DV-carrying checkpoints, vacuumed
    prefixes — replay must track the (file, DV) state exactly."""
    rng = random.Random(seed)
    loc = str(tmp_path / f"t{seed}")
    os.makedirs(os.path.join(loc, "_delta_log"))

    live: dict[str, tuple] = {}   # path -> (pv, dv|None)
    states: list[dict] = []
    checkpoints: list[int] = []
    next_file = 0

    n_versions = rng.randint(5, 12)
    for v in range(n_versions):
        actions = []
        if v == 0:
            actions.append({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}})
            actions.append({"metaData": {
                "id": "f", "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA_STRING, "partitionColumns": ["p"],
                "configuration": {}, "createdTime": 1}})
        for _ in range(rng.randint(1 if v == 0 else 0, 3)):
            path = f"f{next_file}.parquet"
            next_file += 1
            pv = {"p": rng.choice(["a", "b"])}
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 1, "modificationTime": 1,
                                    "dataChange": True}})
            live[path] = (pv, None)
        # DV attach/update on a live file: remove(old) + add(new dv) —
        # and sometimes serialized ADD-FIRST: the protocol keys file
        # actions by (path, dv uniqueId), so a foreign writer emitting
        # add(new dv) before remove(old dv) in one commit must
        # reconcile identically (r10 advice: path-keyed last-wins
        # replay silently dropped the file in that order)
        if live and rng.random() < 0.5:
            path = rng.choice(sorted(live))
            pv, old_dv = live[path]
            rm = {"path": path, "deletionTimestamp": 1, "dataChange": True}
            if old_dv:
                rm["deletionVector"] = old_dv
            dv = _rand_dv(rng)
            add = {"add": {"path": path, "partitionValues": pv,
                           "size": 1, "modificationTime": 1,
                           "dataChange": True, "deletionVector": dv}}
            if rng.random() < 0.5:
                actions.extend([{"remove": rm}, add])
            else:
                actions.extend([add, {"remove": rm}])
            live[path] = (pv, dv)
        # plain remove — carrying the live instance's DV when it has
        # one, as the (path, dv uniqueId) reconciliation rule requires
        if live and rng.random() < 0.3:
            path = rng.choice(sorted(live))
            rm = {"path": path, "deletionTimestamp": 1, "dataChange": True}
            if live[path][1]:
                rm["deletionVector"] = live[path][1]
            actions.append({"remove": rm})
            del live[path]
        # dataChange=false compaction: fold 2 files into one
        if len(live) >= 2 and rng.random() < 0.3:
            a, b = sorted(live)[:2]
            for p in (a, b):
                rm = {"path": p, "deletionTimestamp": 1, "dataChange": False}
                if live[p][1]:
                    rm["deletionVector"] = live[p][1]
                actions.append({"remove": rm})
                del live[p]
            path = f"f{next_file}.parquet"
            next_file += 1
            pv = {"p": "c"}
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 2, "modificationTime": 2,
                                    "dataChange": False}})
            live[path] = (pv, None)
        _write_commit(loc, v, actions, ts=1000 + v)
        states.append({p: (dict(pv), dict(dv) if dv else None)
                       for p, (pv, dv) in live.items()})
        if rng.random() < 0.3:
            _write_checkpoint_dv(loc, v, live)
            checkpoints.append(v)

    def _clean(dv):
        # checkpoint replay normalizes the struct (absent fields come
        # back as explicit nulls) — compare on present values only
        return {k: v for k, v in dv.items() if v is not None} if dv else None

    def _observed(v):
        snap = load_delta(loc, version=v)
        out = {}
        for p, pv in snap.files:
            rel = os.path.relpath(p, loc)
            out[rel] = (dict(pv), _clean(snap.deletion_vectors.get(p)))
        return out

    for v, expect in enumerate(states):
        assert _observed(v) == expect, f"seed={seed} v={v}"

    if checkpoints:
        cp = max(checkpoints)
        for v in range(cp):
            os.remove(os.path.join(loc, "_delta_log", f"{v:020d}.json"))
        for v in range(cp, n_versions):
            assert _observed(v) == states[v], f"seed={seed} post-vacuum v={v}"


@pytest.mark.parametrize("style", ["classic", "v2"])
@pytest.mark.parametrize("seed", [13, 43])
def test_checkpoint_roundtrip_equals_replay(tmp_path, seed, style):
    """Differential: for a random DV-bearing log, the snapshot seeded
    from OUR OWN checkpoint (classic or uuid+sidecar v2) with every
    JSON commit vacuumed must equal the pure-JSON replay — files, DVs,
    tombstone keys, txn watermarks, protocol and table identity."""
    from icegopher_spark.delta_write import write_checkpoint

    rng = random.Random(seed)
    loc = str(tmp_path / f"t{seed}{style}")
    os.makedirs(os.path.join(loc, "_delta_log"))

    live: dict[str, tuple] = {}
    next_file = 0
    n_versions = rng.randint(4, 9)
    for v in range(n_versions):
        actions = []
        if v == 0:
            actions.append({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "v2Checkpoints"],
                "writerFeatures": ["deletionVectors", "v2Checkpoints"]}})
            actions.append({"metaData": {
                "id": "f-roundtrip", "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA_STRING, "partitionColumns": ["p"],
                "configuration": {}, "createdTime": 1}})
            actions.append({"txn": {"appId": "sink-a", "version": 1}})
        for _ in range(rng.randint(1 if v == 0 else 0, 3)):
            path = f"f{next_file}.parquet"
            next_file += 1
            pv = {"p": rng.choice(["a", "b"])}
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 1, "modificationTime": 1,
                                    "dataChange": True}})
            live[path] = (pv, None)
        if live and rng.random() < 0.5:  # DV swap
            path = rng.choice(sorted(live))
            pv, old_dv = live[path]
            # deletionTimestamp far-future: inside the retention window,
            # so the checkpoint must RETAIN the tombstone (expiry is
            # covered by test_checkpoint_carries_unexpired_tombstones)
            rm = {"path": path, "deletionTimestamp": 1_900_000_000_000,
                  "dataChange": True}
            if old_dv:
                rm["deletionVector"] = old_dv
            dv = _rand_dv(rng)
            actions.append({"remove": rm})
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 1, "modificationTime": 1,
                                    "dataChange": True, "deletionVector": dv}})
            live[path] = (pv, dv)
        if live and rng.random() < 0.3:  # plain remove (recent tombstone)
            path = rng.choice(sorted(live))
            rm = {"path": path, "deletionTimestamp": 1_900_000_000_000,
                  "dataChange": True}
            if live[path][1]:
                rm["deletionVector"] = live[path][1]
            actions.append({"remove": rm})
            del live[path]
        if rng.random() < 0.3:
            actions.append({"txn": {"appId": "sink-a", "version": v + 1}})
        _write_commit(loc, v, actions, ts=1000 + v)
    # data files must exist: write_checkpoint stats getsize() per live file
    for path in {p for p in live}:
        with open(os.path.join(loc, path), "wb") as f:
            f.write(b"x")

    snap_json = load_delta(loc)
    write_checkpoint(loc, style=style)
    for v in range(n_versions):
        os.remove(os.path.join(loc, "_delta_log", f"{v:020d}.json"))
    snap_cp = load_delta(loc)

    def _key(snap):
        return {
            "files": sorted((os.path.relpath(p, loc), pv) for p, pv in snap.files),
            "dvs": {
                os.path.relpath(p, loc): {
                    k: v for k, v in d.items() if v is not None
                }
                for p, d in snap.deletion_vectors.items()
            },
            "tombs": sorted(t["path"] for t in snap.tombstones),
            "txn": snap.app_versions,
            "protocol": snap.protocol,
            "id": snap.metadata_raw.get("id"),
        }

    assert _key(snap_cp) == _key(snap_json), f"{seed}/{style}"
