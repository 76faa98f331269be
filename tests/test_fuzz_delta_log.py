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
