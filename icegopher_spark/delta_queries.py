"""Delta-format gates: read, time travel, log-level partition pruning,
and the Delta→Iceberg migration path.

The fixture is a hand-authored Delta table built STRICTLY from the
public protocol (delta.io PROTOCOL.md) — data files written by
pyarrow, the `_delta_log` JSON and the version-2 parquet checkpoint
composed field by field — so the gates prove interop with the wire
format, not round-tripping through this module's own writer (there is
none; the reader is the product).

Fixture commit history over `orders` (all splits keyed on
``o_orderkey % 3`` so every oracle is plain SQL over the base table):

  v0  protocol + metaData + adds: keys %3==0, one file per priority
  v1  adds: keys %3==1
  v2  removes the '5-LOW' file of v0 (a partition-targeted DELETE)
      — and a parquet CHECKPOINT is written at v2 (_last_checkpoint)
  v3  adds: keys %3==2

so the latest-version read must seed from the checkpoint and replay
only v3, and the live set is  NOT(key%3==0 AND priority='5-LOW').

Data files live FLAT at the table root (no hive-style dirs): the
protocol makes `partitionValues` in the log authoritative, and a
reader that infers partitions from paths silently misreads tables
laid out this way — the gate would catch that.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .delta import read_delta
from .queries import dec, register

_CACHE_ROOT = "/tmp/icegopher_tables"

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "o_orderkey", "type": "long", "nullable": True, "metadata": {}},
            {"name": "o_custkey", "type": "long", "nullable": True, "metadata": {}},
            {
                "name": "o_totalprice",
                "type": "double",
                "nullable": True,
                "metadata": {},
            },
            {
                "name": "o_orderpriority",
                "type": "string",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
)

# fixed, strictly-increasing commit timestamps (ms) so timestamp
# travel is deterministic across rebuilds
_T0 = 1_700_000_000_000


def _one_commit_files(sf_dir: str, residue: int) -> dict[str, pa.Table]:
    """{priority: data table} for keys with o_orderkey % 3 == residue.
    Data files do NOT contain the partition column (per protocol,
    partition values live only in the log)."""
    import duckdb

    src = f"{sf_dir}/orders.parquet"
    if os.path.isdir(src):
        # scaled copies are Spark-written DIRECTORIES of part files
        src = f"{src}/*.parquet"
    con = duckdb.connect()
    out: dict[str, pa.Table] = {}
    for prio in _PRIORITIES:
        t = con.execute(
            f"""
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM '{src}'
            WHERE o_orderkey % 3 = {residue} AND o_orderpriority = ?
            ORDER BY o_orderkey
            """,
            [prio],
        ).fetch_arrow_table()
        out[prio] = t
    con.close()
    return out


def _fname(version: int, prio: str) -> str:
    slug = prio.split("-")[0]
    return f"part-{version:05d}-{slug}.parquet"


def _add_action(loc: str, version: int, prio: str) -> dict:
    path = _fname(version, prio)
    full = os.path.join(loc, path)
    return {
        "add": {
            "path": path,
            "partitionValues": {"o_orderpriority": prio},
            "size": os.path.getsize(full),
            "modificationTime": _T0 + version * 1000,
            "dataChange": True,
        }
    }


def _write_commit(loc: str, version: int, actions: list[dict]) -> None:
    lines = [
        json.dumps(
            {
                "commitInfo": {
                    "timestamp": _T0 + version * 1000,
                    "operation": "TEST-FIXTURE",
                }
            }
        )
    ] + [json.dumps(a) for a in actions]
    with open(
        os.path.join(loc, "_delta_log", f"{version:020d}.json"), "w", encoding="utf-8"
    ) as f:
        f.write("\n".join(lines) + "\n")


def _write_checkpoint(loc: str, version: int, live: dict[str, dict]) -> None:
    """Classic single-part parquet checkpoint: one row per action with
    struct columns protocol / metaData / add (PROTOCOL.md
    § Checkpoints). `live` maps data path → partitionValues."""
    pv_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pv_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())])

    rows_proto: list = [{"minReaderVersion": 1, "minWriterVersion": 2}]
    rows_meta: list = [
        {
            "id": "icegopher-delta-fixture",
            "format": {"provider": "parquet"},
            "schemaString": _SCHEMA_STRING,
            "partitionColumns": ["o_orderpriority"],
            "configuration": [("delta.enableChangeDataFeed", "true")],
            "createdTime": _T0,
        }
    ]
    rows_add = [
        {
            "path": p,
            "partitionValues": list(pv.items()),
            "size": os.path.getsize(os.path.join(loc, p)),
            "modificationTime": _T0,
            "dataChange": False,
        }
        for p, pv in sorted(live.items())
    ]
    n = 2 + len(rows_add)
    proto_col = pa.array(rows_proto + [None] * (n - 1), type=proto_t)
    meta_col = pa.array([None] + rows_meta + [None] * (n - 2), type=meta_t)
    add_col = pa.array([None, None] + rows_add, type=add_t)
    tbl = pa.table({"protocol": proto_col, "metaData": meta_col, "add": add_col})
    pq.write_table(
        tbl, os.path.join(loc, "_delta_log", f"{version:020d}.checkpoint.parquet")
    )
    with open(os.path.join(loc, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": n}, f)


def build_delta_fixture(sf_dir: str, loc: str) -> None:
    """Author the 4-commit Delta table described in the module doc."""
    os.makedirs(os.path.join(loc, "_delta_log"), exist_ok=True)
    # data files for the three residue commits (v0, v1, v3)
    for version, residue in ((0, 0), (1, 1), (3, 2)):
        for prio, t in _one_commit_files(sf_dir, residue).items():
            pq.write_table(t, os.path.join(loc, _fname(version, prio)))

    meta_action = {
        "metaData": {
            "id": "icegopher-delta-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _SCHEMA_STRING,
            "partitionColumns": ["o_orderpriority"],
            "configuration": {"delta.enableChangeDataFeed": "true"},
            "createdTime": _T0,
        }
    }
    proto_action = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

    _write_commit(
        loc,
        0,
        [proto_action, meta_action]
        + [_add_action(loc, 0, p) for p in _PRIORITIES],
    )
    _write_commit(loc, 1, [_add_action(loc, 1, p) for p in _PRIORITIES])
    _write_commit(
        loc,
        2,
        [
            {
                "remove": {
                    "path": _fname(0, "5-LOW"),
                    "deletionTimestamp": _T0 + 2000,
                    "dataChange": True,
                }
            }
        ],
    )
    # live set as of v2: v0 files minus the 5-LOW remove, plus v1 files
    live = {
        _fname(v, p): {"o_orderpriority": p}
        for v in (0, 1)
        for p in _PRIORITIES
        if not (v == 0 and p == "5-LOW")
    }
    _write_checkpoint(loc, 2, live)
    _write_commit(loc, 3, [_add_action(loc, 3, p) for p in _PRIORITIES])
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write("4-commits+checkpoint@2+cdf\n")


def delta_fixture_path(sf_dir: str) -> str:
    """Build-or-reuse the fixture (self-healing like _cached_table:
    a partial build is wiped and rebuilt, never trusted)."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == "4-commits+checkpoint@2+cdf":
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_fixture(sf_dir, loc)
    return loc


_ICT_MARKER = "ict@4-commits+misleading-wallclock"


def build_delta_ict_fixture(sf_dir: str, loc: str) -> None:
    """The classic 4-commit fixture, rewritten as an In-Commit-
    Timestamp table (protocol § In-Commit Timestamps): every commit's
    `commitInfo` carries an authoritative, strictly-increasing
    `inCommitTimestamp` (_T0 + v*1000) while the wall-clock `timestamp`
    field is DELIBERATELY constant (_T0) — a reader resolving
    timestamp travel by `timestamp` (or file mtime, which is build
    time here) lands on the wrong version."""
    build_delta_fixture(sf_dir, loc)
    for v in range(4):
        p = os.path.join(loc, "_delta_log", f"{v:020d}.json")
        actions = [json.loads(ln) for ln in open(p, encoding="utf-8") if ln.strip()]
        for a in actions:
            if "commitInfo" in a:
                a["commitInfo"] = {
                    "timestamp": _T0,  # misleading on purpose
                    "inCommitTimestamp": _T0 + v * 1000,
                    "operation": "TEST-FIXTURE",
                }
            if "protocol" in a:
                a["protocol"] = {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": [],
                    "writerFeatures": ["inCommitTimestamp"],
                }
            if "metaData" in a:
                conf = dict(a["metaData"].get("configuration") or {})
                conf["delta.enableInCommitTimestamps"] = "true"
                a["metaData"]["configuration"] = conf
        with open(p, "w", encoding="utf-8") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write(_ICT_MARKER + "\n")


def delta_ict_fixture_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_ict"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _ICT_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_ict_fixture(sf_dir, loc)
    return loc


_V2CP_MARKER = "v2-checkpoint@1+sidecar+tail@2"


def build_delta_v2cp_fixture(sf_dir: str, loc: str) -> None:
    """Hand-author a table whose only checkpoint is a V2 (uuid-named)
    parquet checkpoint with a SIDECAR file (protocol § V2 Spec), and
    whose pre-checkpoint JSON is vacuumed — the read MUST seed from the
    V2 checkpoint:

      v0  protocol(v2Checkpoints) + metaData + adds keys %3==0   [vacuumed]
      v1  adds keys %3==1, removes the '5-LOW' file of v0        [vacuumed]
          + V2 checkpoint `...checkpoint.<uuid>.parquet` at v1:
            checkpointMetadata/protocol/metaData in the TOP file,
            file actions (adds + the remove tombstone) in
            `_sidecars/<uuid>.parquet`
      v2  adds keys %3==2 (the JSON tail)

    Live set = NOT(key%3==0 AND priority='5-LOW') — identical to the
    classic fixture, so the oracle is shared."""
    import uuid as _uuid

    os.makedirs(os.path.join(loc, "_delta_log", "_sidecars"), exist_ok=True)
    for version, residue in ((0, 0), (1, 1), (2, 2)):
        for prio, t in _one_commit_files(sf_dir, residue).items():
            pq.write_table(t, os.path.join(loc, _fname(version, prio)))

    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoints"],
        "writerFeatures": ["v2Checkpoints"],
    }
    meta = {
        "id": "icegopher-delta-v2cp-fixture",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _SCHEMA_STRING,
        "partitionColumns": ["o_orderpriority"],
        "configuration": {},
        "createdTime": _T0,
    }
    _write_commit(
        loc,
        0,
        [{"protocol": proto}, {"metaData": meta}]
        + [_add_action(loc, 0, p) for p in _PRIORITIES],
    )
    _write_commit(
        loc,
        1,
        [_add_action(loc, 1, p) for p in _PRIORITIES]
        + [
            {
                "remove": {
                    "path": _fname(0, "5-LOW"),
                    "deletionTimestamp": _T0 + 1000,
                    "dataChange": True,
                }
            }
        ],
    )

    # --- the V2 checkpoint at v1, composed field by field ---
    live = {
        _fname(v, p): {"o_orderpriority": p}
        for v in (0, 1)
        for p in _PRIORITIES
        if not (v == 0 and p == "5-LOW")
    }
    pv_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pv_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    rm_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    rows_add = [
        {
            "path": p,
            "partitionValues": list(pv.items()),
            "size": os.path.getsize(os.path.join(loc, p)),
            "modificationTime": _T0,
            "dataChange": False,
        }
        for p, pv in sorted(live.items())
    ]
    rows_rm = [
        {
            "path": _fname(0, "5-LOW"),
            "deletionTimestamp": _T0 + 1000,
            "dataChange": False,
        }
    ]
    n_sc = len(rows_add) + len(rows_rm)
    u = str(_uuid.uuid4())
    sidecar_name = f"{u}.parquet"
    sidecar_path = os.path.join(loc, "_delta_log", "_sidecars", sidecar_name)
    pq.write_table(
        pa.table(
            {
                "add": pa.array(rows_add + [None] * len(rows_rm), type=add_t),
                "remove": pa.array([None] * len(rows_add) + rows_rm, type=rm_t),
            }
        ),
        sidecar_path,
    )

    cm_t = pa.struct([("version", pa.int64())])
    sc_t = pa.struct(
        [
            ("path", pa.string()),
            ("sizeInBytes", pa.int64()),
            ("modificationTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    meta_row = {**meta, "format": {"provider": "parquet"}, "configuration": []}
    sc_row = {
        "path": sidecar_name,
        "sizeInBytes": os.path.getsize(sidecar_path),
        "modificationTime": _T0 + 1000,
    }
    top = pa.table(
        {
            "checkpointMetadata": pa.array(
                [{"version": 1}, None, None, None], type=cm_t
            ),
            "protocol": pa.array([None, proto, None, None], type=proto_t),
            "metaData": pa.array([None, None, meta_row, None], type=meta_t),
            "sidecar": pa.array([None, None, None, sc_row], type=sc_t),
        }
    )
    pq.write_table(
        top,
        os.path.join(loc, "_delta_log", f"{1:020d}.checkpoint.{u}.parquet"),
    )
    with open(os.path.join(loc, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 4 + n_sc}, f)

    # vacuum the pre-checkpoint JSON: the V2 checkpoint is now the only
    # authority for versions <= 1
    for v in (0, 1):
        os.remove(os.path.join(loc, "_delta_log", f"{v:020d}.json"))

    _write_commit(loc, 2, [_add_action(loc, 2, p) for p in _PRIORITIES])
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write(_V2CP_MARKER + "\n")


def delta_v2cp_fixture_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_v2cp"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _V2CP_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_v2cp_fixture(sf_dir, loc)
    return loc


def _priority_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("total_price"),
    )


delta_read_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE NOT (o_orderkey % 3 = 0 AND o_orderpriority = '5-LOW')
GROUP BY o_orderpriority
"""


@register(
    "delta_read",
    delta_read_oracle,
    "Delta log replay (checkpoint seed + JSON tail) -> partitioned scan",
)
def delta_read(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-version read: seeds from the v2 parquet checkpoint and
    replays only the v3 JSON commit; partition values come from the
    log (files are flat at the root) via one broadcast path-join."""
    loc = delta_fixture_path(sf)
    return _priority_agg(read_delta(spark, loc))


delta_tt_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderpriority
"""


@register(
    "delta_time_travel",
    delta_tt_oracle,
    "Delta version travel: v1 read skips the later delete + append",
)
def delta_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    loc = delta_fixture_path(sf)
    return _priority_agg(read_delta(spark, loc, version=1))


delta_pruned_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
"""


@register(
    "delta_partition_pruned",
    delta_pruned_oracle,
    "log-level partition pruning: only the 3 URGENT files are scanned",
)
def delta_partition_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """Pruning happens at PLAN time against the log's partitionValues
    (the Delta analogue of Iceberg manifest pruning) — 3 of 14 live
    files survive; `tests/test_delta.py` pins the inputFiles count."""
    loc = delta_fixture_path(sf)
    df = read_delta(
        spark, loc, partition_filter=lambda pv: pv["o_orderpriority"] == "1-URGENT"
    )
    return _priority_agg(df)


@register(
    "delta_ict_timestamp_travel",
    delta_tt_oracle,
    "timestamp travel resolves by commitInfo.inCommitTimestamp (ICT)",
)
def delta_ict_timestamp_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Timestamp travel on an In-Commit-Timestamp table: the target
    instant (_T0+1000ms) is v1's inCommitTimestamp; the misleading
    constant wall-clock `timestamp` field (and build-time file mtimes)
    would resolve to the LATEST version instead — so this gate fails
    against any resolver not honoring ICT precedence."""
    loc = delta_ict_fixture_path(sf)
    return _priority_agg(read_delta(spark, loc, timestamp_ms=_T0 + 1000))


@register(
    "delta_v2_checkpoint_read",
    delta_read_oracle,
    "Delta V2 (uuid+sidecar) checkpoint seed + JSON tail read",
)
def delta_v2_checkpoint_read(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-version read of a table whose pre-checkpoint JSON is
    vacuumed: the uuid-named V2 checkpoint (checkpointMetadata +
    sidecar file actions, protocol § V2 Spec) seeds the state and the
    v2 JSON commit replays on top.  Same live set as `delta_read`, so
    the oracle is shared."""
    loc = delta_v2cp_fixture_path(sf)
    return _priority_agg(read_delta(spark, loc))


@register(
    "delta_to_iceberg_migrate",
    delta_read_oracle,
    "Delta -> Iceberg metadata-plane migration, read back via Iceberg scan",
)
def delta_to_iceberg_migrate(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass migration: read the Delta table's live version, append
    into an Iceberg table (full write plane: stats, manifests), then
    answer from the ICEBERG scan — proving the estate-merge path a
    mixed-format 100 TB shop needs. The Iceberg table is /tmp-cached
    with the same self-heal contract as the other iceberg fixtures."""
    from .iceberg import write as W
    from .iceberg.schema import Schema
    from .iceberg.table import Table
    from .iceberg.transforms import PartitionSpec
    from .iceberg.types import DoubleType, LongType, NestedField, StringType
    from .iceberg_queries import _cached_table

    def build(loc2: str) -> Table:
        schema = Schema(
            (
                NestedField(1, "o_orderkey", LongType(), True),
                NestedField(2, "o_custkey", LongType(), False),
                NestedField(3, "o_totalprice", DoubleType(), False),
                NestedField(4, "o_orderpriority", StringType(), False),
            ),
            schema_id=0,
        )
        t = W.create_table(loc2, schema, PartitionSpec([]))
        df = read_delta(spark, delta_fixture_path(sf))
        return W.append(t, df)

    t = _cached_table(
        sf,
        "orders_from_delta",
        lambda t: len(t.metadata.snapshots) == 1,
        build,
    )
    return _priority_agg(t.scan().to_df(spark))


delta_vacuum_oracle = """
SELECT COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 3 = 0 AND o_orderpriority = '5-LOW'
"""


@register(
    "delta_vacuum_preview",
    delta_vacuum_oracle,
    "VACUUM dry-run finds exactly the log-removed file's rows",
)
def delta_vacuum_preview(spark: SparkSession, sf: str) -> DataFrame:
    """The v2 DELETE removed v0's 5-LOW file from the log; with the
    retention window collapsed, vacuum_candidates must surface exactly
    that file — so reading the candidates back yields exactly the
    deleted rows, which the oracle recomputes from the base table.
    (now_ms is pinned far ahead so the fixture's mtimes can't protect
    the file; retention 0 drops time-travel protection.)"""
    from .delta import vacuum_candidates

    loc = delta_fixture_path(sf)
    cands = vacuum_candidates(loc, retention_ms=0, now_ms=_T0 + 10**12)
    if not cands:
        raise AssertionError("vacuum dry-run found no candidates — fixture broken")
    df = spark.read.parquet(*cands)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


_VACX_MARKER = "vacx-fixture@v1"


def delta_vacx_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """The shared orders fixture COPIED then actually VACUUMed
    (retention 0, rail overridden, now pinned ahead of the mtimes):
    the one log-removed file must be gone from disk while every live
    file survives."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_vacx"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _VACX_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta import vacuum_delta

    src = delta_fixture_path(sf_dir)
    shutil.copytree(src, loc)
    os.remove(ok) if os.path.exists(ok) else None
    deleted = vacuum_delta(
        loc, retention_ms=0, enforce_retention_check=False, now_ms=_T0 + 10**12
    )
    if not deleted:
        raise AssertionError("vacuum deleted nothing — fixture broken")
    with open(ok, "w") as f:
        f.write(_VACX_MARKER + "\n")
    return loc


@register(
    "delta_vacuum_execute",
    # vacuum must not change the visible row set: same oracle as the
    # plain delta read gate's current-version semantics
    lambda: delta_read_oracle,
    "Executed VACUUM: unreferenced file deleted from disk, every live "
    "file survives, the table reads identically",
)
def delta_vacuum_execute(spark: SparkSession, sf: str) -> DataFrame:
    """If vacuum deleted a LIVE file the scan would lose rows (or fail
    outright); if it somehow resurrected the removed file the counts
    would inflate — either way the hash mismatches the current-version
    oracle."""
    loc = delta_vacx_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return _priority_agg(df)


delta_export_oracle = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "delta_export_roundtrip",
    delta_export_oracle,
    "Iceberg -> Delta export (writer + checkpoint), read back via Delta reader",
)
def delta_export_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """The reverse interop path: the Iceberg lineitem fixture's current
    snapshot exported as a NEW partitioned Delta table (distributed
    parquet write, hive layout, one JSON commit, finishing checkpoint),
    then answered THROUGH the Delta reader — so the gate exercises
    writer and reader against each other and hash-checks the values
    against the base table."""
    from .delta_write import export_iceberg_to_delta
    from .iceberg_queries import _table_for

    t = _table_for(spark, sf)
    key = sf.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/lineitem_delta_export"
    ok = os.path.join(loc, "_FIXTURE_OK")
    rebuild = True
    if os.path.exists(ok):
        try:
            with open(ok) as fh:
                rebuild = fh.read().strip() != "export-v1"
        except OSError:
            rebuild = True
    if rebuild:
        shutil.rmtree(loc, ignore_errors=True)
        export_iceberg_to_delta(spark, t, loc, ["l_returnflag"])
        with open(ok, "w") as fh:
            fh.write("export-v1\n")
    df = read_delta(spark, loc)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
    )


delta_cdf_oracle = """
SELECT 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 'insert', 1, COUNT(*),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
FROM orders WHERE o_orderkey % 3 = 1
UNION ALL
SELECT 'delete', 2, COUNT(*),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
FROM orders WHERE o_orderkey % 3 = 0 AND o_orderpriority = '5-LOW'
UNION ALL
SELECT 'insert', 3, COUNT(*),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
FROM orders WHERE o_orderkey % 3 = 2
"""


@register(
    "delta_cdf_read",
    delta_cdf_oracle,
    "Delta Change Data Feed: per-commit inserts + recovered deletes",
)
def delta_cdf_read(spark: SparkSession, sf: str) -> DataFrame:
    """CDC parity with the Iceberg changelog, on the Delta side: the
    fixture's v2 DELETE has no cdc files, so the reader must recover
    the deleted rows by reading the REMOVED file with partition values
    from the replay state at removal time."""
    from .delta import read_changes

    loc = delta_fixture_path(sf)
    ch = read_changes(spark, loc, 0, 3)
    return ch.groupBy("_change_type", "_commit_version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# stream/batch parity: the CDF stream gate (registered by
# streaming_queries, which queries.py imports before this module)
# shares the batch oracle — one SQL text serves both faces.
from .queries import QUERIES as _QUERIES  # noqa: E402

if "stream_delta_cdf" in _QUERIES:
    _QUERIES["stream_delta_cdf"].oracle = delta_cdf_oracle


# ---------------------------------------------------------------------------
# Deletion-vector fixture (r10): a second, unpartitioned Delta table
# whose history exercises the protocol's DV surface end to end —
# on-disk 'u' DVs, a DV UPDATE (remove+add of the same file swapping
# bitmaps), and an inline 'i' DV.  Every DV's positions are chosen by
# an o_orderkey predicate over the file's sorted rows, so all oracles
# stay plain SQL over the base `orders` view:
#
#   v0  protocol (reader v3, readerFeatures [deletionVectors]) +
#       metaData + adds: file_r<r> = keys %3==r, sorted by o_orderkey
#   v1  DV DELETE on file_r0: positions of keys %5==0      ('u' file)
#   v2  DV UPDATE on file_r0: new DV = keys %5==0 OR %7==0 ('u' file)
#   v3  DV DELETE on file_r1: positions of keys %11==0     (inline)
#
# live set at v3:  NOT(k%3=0 AND (k%5=0 OR k%7=0))
#                  AND NOT(k%3=1 AND k%11=0)

_DV_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "o_orderkey", "type": "long", "nullable": True, "metadata": {}},
            {"name": "o_custkey", "type": "long", "nullable": True, "metadata": {}},
            {
                "name": "o_totalprice",
                "type": "double",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
)

_DV_MARKER = "dv-fixture@v3"


def _dv_fixture_meta() -> dict:
    return {
        "metaData": {
            "id": "icegopher-delta-dv-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _DV_SCHEMA_STRING,
            "partitionColumns": [],
            "configuration": {"delta.enableChangeDataFeed": "true"},
            "createdTime": _T0,
        }
    }


def _residue_table(sf_dir: str, residue: int):
    """orders columns for keys %3==residue, sorted by o_orderkey (the
    sort makes DV positions a pure function of the key predicate)."""
    import duckdb

    src = f"{sf_dir}/orders.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con = duckdb.connect()
    t = con.execute(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM '{src}' WHERE o_orderkey % 3 = {residue}
        ORDER BY o_orderkey
        """
    ).fetch_arrow_table()
    con.close()
    return t


def _dv_add(loc: str, path: str, dv: dict | None, data_change: bool = True) -> dict:
    a = {
        "path": path,
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(loc, path)),
        "modificationTime": _T0,
        "dataChange": data_change,
    }
    if dv is not None:
        a["deletionVector"] = dv
    return {"add": a}


def build_delta_dv_fixture(sf_dir: str, loc: str) -> None:
    import numpy as np

    from .delta_dv import write_dv_file, z85encode
    from .iceberg.puffin import DV_MAGIC, serialize_roaring64

    os.makedirs(os.path.join(loc, "_delta_log"), exist_ok=True)
    tables = {r: _residue_table(sf_dir, r) for r in (0, 1, 2)}
    for r, t in tables.items():
        pq.write_table(t, os.path.join(loc, f"file_r{r}.parquet"))

    keys0 = np.asarray(tables[0]["o_orderkey"])
    keys1 = np.asarray(tables[1]["o_orderkey"])
    pos_v1 = np.nonzero(keys0 % 5 == 0)[0].astype("uint64")
    pos_v2 = np.nonzero((keys0 % 5 == 0) | (keys0 % 7 == 0))[0].astype("uint64")
    pos_v3 = np.nonzero(keys1 % 11 == 0)[0].astype("uint64")

    proto = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    }
    _write_commit(
        loc, 0,
        [proto, _dv_fixture_meta()]
        + [_dv_add(loc, f"file_r{r}.parquet", None) for r in (0, 1, 2)],
    )

    dv1 = write_dv_file(loc, pos_v1)
    _write_commit(
        loc, 1,
        [
            {"remove": {"path": "file_r0.parquet", "deletionTimestamp": _T0 + 1000,
                        "dataChange": True}},
            _dv_add(loc, "file_r0.parquet", dv1),
        ],
    )
    dv2 = write_dv_file(loc, pos_v2)
    _write_commit(
        loc, 2,
        [
            {"remove": {"path": "file_r0.parquet", "deletionTimestamp": _T0 + 2000,
                        "dataChange": True, "deletionVector": dv1}},
            _dv_add(loc, "file_r0.parquet", dv2),
        ],
    )
    # inline DV ('i'): body = magic + portable roaring64, Z85-encoded
    body = DV_MAGIC + serialize_roaring64(pos_v3, assume_sorted_unique=True)
    dv3 = {
        "storageType": "i",
        "pathOrInlineDv": z85encode(body),
        "sizeInBytes": len(body),
        "cardinality": int(len(pos_v3)),
    }
    _write_commit(
        loc, 3,
        [
            {"remove": {"path": "file_r1.parquet", "deletionTimestamp": _T0 + 3000,
                        "dataChange": True}},
            _dv_add(loc, "file_r1.parquet", dv3),
        ],
    )
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write(_DV_MARKER + "\n")


def delta_dv_fixture_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_dv"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _DV_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_dv_fixture(sf_dir, loc)
    return loc


delta_dv_read_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE NOT (o_orderkey % 3 = 0 AND (o_orderkey % 5 = 0 OR o_orderkey % 7 = 0))
  AND NOT (o_orderkey % 3 = 1 AND o_orderkey % 11 = 0)
"""


@register(
    "delta_dv_read",
    delta_dv_read_oracle,
    "Delta deletion-vector read: 'u'-file + inline DVs masked via "
    "(file, _metadata.row_index) anti-join",
)
def delta_dv_read(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-version read of the DV fixture: file_r0's rows are
    masked by the UPDATED on-disk DV (v2 replaced v1's bitmap — stale
    masks would fail the oracle), file_r1's by an inline Z85 DV.

    Spec anchors: delta.io PROTOCOL.md § Deletion Vectors (the blob
    framing is byte-identical to Iceberg V3's deletion-vector-v1, so
    `iceberg/puffin.py`'s roaring codec is reused)."""
    loc = delta_dv_fixture_path(sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


delta_dv_cdf_oracle = """
SELECT * FROM (
  SELECT 'delete' AS change_type, CAST(1 AS BIGINT) AS commit_version,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 = 0
  UNION ALL
  SELECT 'delete', CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(o_orderkey % 1000) AS BIGINT)
  FROM orders
  WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0
  UNION ALL
  SELECT 'delete', CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(o_orderkey % 1000) AS BIGINT)
  FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 11 = 0
) WHERE n_rows > 0
"""


@register(
    "delta_dv_cdf",
    delta_dv_cdf_oracle,
    "Delta CDF over DV commits: row-accurate deletes from bitmap "
    "diffs (new DV minus old), not file-granularity resends",
)
def delta_dv_cdf(spark: SparkSession, sf: str) -> DataFrame:
    """The v2 DV UPDATE must surface ONLY the newly-masked rows
    (%7==0 minus %5==0) — a file-granularity reader would re-emit the
    whole file as delete+insert; delta-spark's CDF does the same bitmap
    diff."""
    from .delta import read_changes

    loc = delta_dv_fixture_path(sf)
    ch = read_changes(spark, loc, 1, 3)
    return ch.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
    )


# ---------------------------------------------------------------------------
# Column-mapping fixture (r10): same orders splits, but the table uses
# delta.columnMapping.mode=name — data files carry opaque PHYSICAL
# column names ("col-<n>"), the schemaString maps them to logical
# names, minReaderVersion=2, and partitionValues are keyed by the
# partition column's PHYSICAL name (protocol § Column Mapping).

_CM_PHYS = {
    "o_orderkey": "col-1a2b",
    "o_custkey": "col-3c4d",
    "o_totalprice": "col-5e6f",
    "o_orderpriority": "col-7a8b",
}

_CM_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": n,
                "type": t,
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": i + 1,
                    "delta.columnMapping.physicalName": _CM_PHYS[n],
                },
            }
            for i, (n, t) in enumerate(
                [
                    ("o_orderkey", "long"),
                    ("o_custkey", "long"),
                    ("o_totalprice", "double"),
                    ("o_orderpriority", "string"),
                ]
            )
        ],
    }
)

_CM_MARKER = "cm-fixture@v1"


def build_delta_cm_fixture(sf_dir: str, loc: str) -> None:
    os.makedirs(os.path.join(loc, "_delta_log"), exist_ok=True)
    # data files: keys %3==0 at v0, %3==1 at v1, one file per priority,
    # columns RENAMED to their physical names (partition col omitted)
    for version, residue in ((0, 0), (1, 1)):
        for prio, t in _one_commit_files(sf_dir, residue).items():
            t = t.rename_columns(
                [_CM_PHYS[c] for c in ("o_orderkey", "o_custkey", "o_totalprice")]
            )
            pq.write_table(t, os.path.join(loc, _fname(version, prio)))

    meta = {
        "metaData": {
            "id": "icegopher-delta-cm-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _CM_SCHEMA_STRING,
            "partitionColumns": ["o_orderpriority"],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "4",
            },
            "createdTime": _T0,
        }
    }
    proto = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}

    def cm_add(version: int, prio: str) -> dict:
        path = _fname(version, prio)
        return {
            "add": {
                "path": path,
                # keyed by the PHYSICAL partition column name
                "partitionValues": {_CM_PHYS["o_orderpriority"]: prio},
                "size": os.path.getsize(os.path.join(loc, path)),
                "modificationTime": _T0 + version * 1000,
                "dataChange": True,
            }
        }

    _write_commit(loc, 0, [proto, meta] + [cm_add(0, p) for p in _PRIORITIES])
    _write_commit(loc, 1, [cm_add(1, p) for p in _PRIORITIES])
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write(_CM_MARKER + "\n")


def delta_cm_fixture_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_cm"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _CM_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_cm_fixture(sf_dir, loc)
    return loc


delta_cm_read_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderpriority
"""


@register(
    "delta_column_mapping_read",
    delta_cm_read_oracle,
    "Delta column-mapping (name mode): physical-name scan re-labelled "
    "to logical, partitionValues keyed by physical name",
)
def delta_column_mapping_read(spark: SparkSession, sf: str) -> DataFrame:
    """Reads a mode=name table whose parquet columns are opaque
    physical ids — a reader that scans by logical name returns all
    NULLs (schema-on-read miss), and one that keys partitionValues by
    logical name drops every partition (inner-join miss); both fail
    this oracle."""
    loc = delta_cm_fixture_path(sf)
    df = read_delta(spark, loc)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Nested column-mapped WRITE (r11): create + append + DV delete through
# a mapping that renames nested struct fields at every level.

_CMW_MARKER = "cmw-nested-fixture@v1"


def delta_cmw_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """Create-or-reuse a column-mapped Delta table with a NESTED struct
    column, written entirely by this repo's writer: create (mapping
    ids + physical names at every nesting level), append (nested
    physical relabel via positional CAST), then a DV delete THROUGH
    the mapping.  Read back by the independent reader + SQL oracle."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_cmw"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _CMW_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table, delete_where_delta
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.struct(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("price"),
        ).alias("info"),
    )
    create_delta_table(loc, orders.schema, column_mapping=True)
    append_delta(spark, loc, orders)
    delete_where_delta(spark, loc, F.col("k") % 5 == 0)
    with open(ok, "w") as f:
        f.write(_CMW_MARKER + "\n")
    return loc


delta_cm_nested_write_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_custkey % 1000) AS BIGINT) AS cust_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 5 <> 0
"""


@register(
    "delta_cm_nested_write",
    delta_cm_nested_write_oracle,
    "column-mapped WRITE with nested struct renames (positional CAST) "
    "+ DV delete through the mapping",
)
def delta_cm_nested_write(spark: SparkSession, sf: str) -> DataFrame:
    """r10 verdict #4: nested renames now WRITE — the parquet files
    carry opaque physical names at both nesting levels; the logical
    read + oracle prove the relabel is lossless, and the DV delete
    proves the DML plane composes with nested mappings."""
    loc = delta_cmw_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("info.custkey") % 1000).cast("bigint").alias("cust_chk"),
        F.round(F.sum(F.col("info.price").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# DV-writing DELETE (r10): the write half of the deletion-vector loop.

_DVW_MARKER = "dvw-fixture@v1"


def delta_dvw_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """Create-or-reuse a Delta table written ENTIRELY by this repo's
    writer (create + append + two DV deletes), then read back by the
    independent reader + SQL oracle: the deletes are o_orderkey%9==0
    and then %13==0, so the second DV must UNION the first (superset
    invariant) or rows resurrect."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_dvw"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _DVW_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table, delete_where_delta
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders)
    delete_where_delta(spark, loc, F.col("o_orderkey") % 9 == 0)
    delete_where_delta(spark, loc, F.col("o_orderkey") % 13 == 0)
    with open(ok, "w") as f:
        f.write(_DVW_MARKER + "\n")
    return loc


delta_dv_delete_write_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 9 <> 0 AND o_orderkey % 13 <> 0
"""


@register(
    "delta_dv_delete_write",
    delta_dv_delete_write_oracle,
    "DV-writing DELETE: two successive merge-on-read deletes, second "
    "bitmap a superset of the first; protocol auto-upgraded",
)
def delta_dv_delete_write(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end write-side DVs: positions from _metadata.row_index in
    the predicate scan, bitmaps built + DV files written executor-side
    (applyInPandas per affected file), remove+add commit swapping the
    descriptor, protocol upgraded to reader 3 + deletionVectors.  The
    read-back goes through the same reader the spec-composed byte
    fixtures pin."""
    loc = delta_dvw_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Variant (r11): Delta variantType columns, written and read by this
# repo's own writer/reader through Spark's native parquet variant.

_VAR_MARKER = "variant-fixture@v1"


def delta_variant_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """Create-or-reuse a Delta table with a VARIANT payload column
    built from orders (ok/tp fields), written by this repo's writer —
    create auto-declares the variantType feature vector."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_variant"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _VAR_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.parse_json(
            F.concat(
                F.lit('{"ok": '),
                F.col("o_orderkey").cast("string"),
                F.lit(', "tp": '),
                F.col("o_totalprice").cast("string"),
                F.lit("}"),
            )
        ).alias("payload"),
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders)
    with open(ok, "w") as f:
        f.write(_VAR_MARKER + "\n")
    return loc


delta_variant_read_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS okey_sum,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
"""


@register(
    "delta_variant_read",
    delta_variant_read_oracle,
    "Delta variantType: write + read a VARIANT column, extract typed "
    "fields with variant_get",
)
def delta_variant_read(spark: SparkSession, sf: str) -> DataFrame:
    """The payload column is semi-structured VARIANT (protocol §
    Variant Data Type; feature auto-declared on create); the read is
    the plain batch scan and extraction is codegen variant_get — a
    reader that drops or misreads the variant column fails both sums."""
    loc = delta_variant_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.try_variant_get("payload", "$.ok", "long"))
        .cast("bigint")
        .alias("okey_sum"),
        F.round(
            F.sum(
                F.try_variant_get("payload", "$.tp", "double").cast("decimal(12,2)")
            ),
            2,
        )
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Type widening (r11): files written under NARROWER types than the
# current schema (protocol § Type Widening).

_TW_MARKER = "typewidening-fixture@v1"


def build_delta_typewidening_fixture(sf_dir: str, loc: str) -> None:
    """v0: file_r0 written with INT32 keys under an int schema;
    v1: metaData widens both key columns to long (delta.typeChanges in
    field metadata, typeWidening feature) + file_r1 written with INT64
    keys.  A reader that trusts the file footers over the table schema
    produces mixed types; one that refuses the feature bounces the
    table — both fail the oracle."""
    os.makedirs(os.path.join(loc, "_delta_log"), exist_ok=True)
    for r in (0, 1):
        t = _residue_table(sf_dir, r)
        if r == 0:
            t = t.set_column(0, "o_orderkey", t["o_orderkey"].cast(pa.int32()))
            t = t.set_column(1, "o_custkey", t["o_custkey"].cast(pa.int32()))
        pq.write_table(t, os.path.join(loc, f"file_r{r}.parquet"))

    def _schema(key_type: str, with_changes: bool) -> str:
        changes_md = (
            {
                "delta.typeChanges": [
                    {"fromType": "integer", "toType": "long", "tableVersion": 1}
                ]
            }
            if with_changes
            else {}
        )
        return json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "o_orderkey", "type": key_type, "nullable": True,
                     "metadata": dict(changes_md)},
                    {"name": "o_custkey", "type": key_type, "nullable": True,
                     "metadata": dict(changes_md)},
                    {"name": "o_totalprice", "type": "double", "nullable": True,
                     "metadata": {}},
                ],
            }
        )

    meta = {
        "id": "icegopher-delta-tw-fixture",
        "format": {"provider": "parquet", "options": {}},
        "partitionColumns": [],
        "configuration": {},
        "createdTime": _T0,
    }
    _write_commit(
        loc,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {**meta, "schemaString": _schema("integer", False)}},
            _dv_add(loc, "file_r0.parquet", None),
        ],
    )
    _write_commit(
        loc,
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            {"metaData": {**meta, "schemaString": _schema("long", True)}},
            _dv_add(loc, "file_r1.parquet", None),
        ],
    )
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write(_TW_MARKER + "\n")


def delta_typewidening_fixture_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_typewidening"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _TW_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_typewidening_fixture(sf_dir, loc)
    return loc


delta_type_widening_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS okey_sum,
       CAST(SUM(o_custkey % 1000) AS BIGINT) AS cust_chk
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
"""


@register(
    "delta_type_widening",
    delta_type_widening_oracle,
    "type widening: int32-written files read under the widened long "
    "schema in one scan",
)
def delta_type_widening(spark: SparkSession, sf: str) -> DataFrame:
    """One scan over a mixed-width file set projected into the CURRENT
    (widened) schema — int32 footers upcast to long in the reader, no
    UDF, no per-file branching."""
    loc = delta_typewidening_fixture_path(sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("okey_sum"),
        F.sum(F.col("o_custkey") % 1000).cast("bigint").alias("cust_chk"),
    )


# ---------------------------------------------------------------------------
# Row tracking (r11): stable row ids from add.baseRowId — the Delta
# twin of the Iceberg row-lineage plane.

_RT_MARKER = "rowtracking-fixture@v1"


def build_delta_rowtracking_fixture(sf_dir: str, loc: str) -> None:
    """Hand-author a row-tracked table (protocol § Row Tracking):

      v0  protocol(writer 7: rowTracking+domainMetadata) + metaData +
          adds for residues 0 and 1, each with a baseRowId (0 and
          |file r0|) + the delta.rowTracking high-water-mark domain
      v1  DV delete of file r0's keys %5==0 — the swap's re-add
          carries the SAME baseRowId (id preservation: survivors keep
          base + original position)
    """
    import numpy as np

    from .delta_dv import write_dv_file

    os.makedirs(os.path.join(loc, "_delta_log"), exist_ok=True)
    tables = {r: _residue_table(sf_dir, r) for r in (0, 1)}
    for r, t in tables.items():
        pq.write_table(t, os.path.join(loc, f"file_r{r}.parquet"))
    n0 = tables[0].num_rows
    bases = {0: 0, 1: n0}
    hwm = n0 + tables[1].num_rows - 1

    actions = [
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        },
        _dv_fixture_meta(),
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
                "removed": False,
            }
        },
    ]
    for r in (0, 1):
        a = _dv_add(loc, f"file_r{r}.parquet", None)
        a["add"]["baseRowId"] = bases[r]
        a["add"]["defaultRowCommitVersion"] = 0
        actions.append(a)
    _write_commit(loc, 0, actions)

    keys0 = np.asarray(tables[0]["o_orderkey"])
    pos = np.nonzero(keys0 % 5 == 0)[0].astype("uint64")
    dv = write_dv_file(loc, pos)
    rm = {
        "path": "file_r0.parquet",
        "deletionTimestamp": _T0 + 1000,
        "dataChange": True,
    }
    add = _dv_add(loc, "file_r0.parquet", dv)
    add["add"]["baseRowId"] = bases[0]  # id preservation across the swap
    add["add"]["defaultRowCommitVersion"] = 0
    _write_commit(loc, 1, [{"remove": rm}, add])
    with open(os.path.join(loc, "_FIXTURE_OK"), "w") as f:
        f.write(_RT_MARKER + "\n")


def delta_rowtracking_fixture_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_rowtracking"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _RT_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)
    build_delta_rowtracking_fixture(sf_dir, loc)
    return loc


delta_row_ids_oracle = """
WITH b AS (
  SELECT o_orderkey, o_orderkey % 3 AS r,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey % 3 ORDER BY o_orderkey)
           - 1 AS pos
  FROM orders WHERE o_orderkey % 3 IN (0, 1)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(pos + CASE WHEN r = 0 THEN 0
            ELSE (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
            END) AS BIGINT) AS rowid_sum,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk
FROM b
WHERE NOT (r = 0 AND o_orderkey % 5 = 0)
"""


@register(
    "delta_row_ids",
    delta_row_ids_oracle,
    "row tracking: stable _row_id = add.baseRowId + file position, "
    "unchanged by a deletion-vector delete",
)
def delta_row_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Reads a row-tracked table with ``with_row_ids=True``: each row's
    stable id is its file's baseRowId + its file ordinal, attached via
    a broadcast (path → base) map on the scan's row index — and a DV
    delete between the commits must leave SURVIVORS' ids untouched
    (positions are file ordinals, not live ordinals).  The oracle
    recomputes ids from first principles with a window function."""
    loc = delta_rowtracking_fixture_path(sf)
    df = read_delta(spark, loc, with_row_ids=True)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_row_id").cast("bigint").alias("rowid_sum"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
    )


# ---------------------------------------------------------------------------
# Writer-emitted CDC files (r11): UPDATE on a CDF-enabled table writes
# _change_data/ files carrying update_preimage/update_postimage pairs.

_CDCW_MARKER = "cdcw-fixture@v1"


def delta_cdcw_fixture_path(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """(table location, update-commit version) for a CDF-enabled orders
    table written by this repo's writer: create(+CDF) → append →
    update_where (price bump on o_orderkey%9==0).  The update commit
    carries cdc actions, making it row-accurate CDF authority."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_cdcw"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _CDCW_MARKER:
                    return loc, 2
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table, update_where_delta
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(
        loc, orders.schema,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    append_delta(spark, loc, orders)
    v = update_where_delta(
        spark, loc, F.col("o_orderkey") % 9 == 0,
        {"o_totalprice": F.col("o_totalprice") + F.lit(10.0)},
    )
    assert v == 2
    with open(ok, "w") as f:
        f.write(_CDCW_MARKER + "\n")
    return loc, v


delta_update_cdf_oracle = """
SELECT _change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(14,2))), 2) AS DOUBLE) AS price_sum
FROM (
  SELECT 'update_preimage' AS _change_type, o_totalprice AS price
  FROM orders WHERE o_orderkey % 9 = 0
  UNION ALL
  SELECT 'update_postimage' AS _change_type, o_totalprice + 10.0 AS price
  FROM orders WHERE o_orderkey % 9 = 0
)
GROUP BY _change_type
"""


@register(
    "delta_update_cdf",
    delta_update_cdf_oracle,
    "writer-emitted cdc files: UPDATE surfaces row-accurate "
    "update_preimage/update_postimage pairs through CDF",
)
def delta_update_cdf(spark: SparkSession, sf: str) -> DataFrame:
    """The UPDATE commit wrote _change_data/ files (protocol § Add CDC
    File), so read_changes attributes it as pre/post image pairs — a
    reader synthesizing delete+insert from the file actions (the
    non-CDF fallback) produces the wrong _change_type values and fails
    this oracle."""
    from .delta import read_changes

    loc, v = delta_cdcw_fixture_path(spark, sf)
    ch = read_changes(spark, loc, v, v)
    return ch.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("price_sum"),
    )


# ---------------------------------------------------------------------------
# Zero-copy Delta → Iceberg link (r11): the reverse of
# link_iceberg_to_delta — in-place file adoption + DV→Puffin
# translation; closes the two-way zero-copy migration loop.


@register(
    "delta_link_import",
    delta_dv_delete_write_oracle,
    "zero-copy Delta→Iceberg link: in-place adoption of the Delta "
    "files + DV→Puffin translation, answered from the ICEBERG scan",
)
def delta_link_import(spark: SparkSession, sf: str) -> DataFrame:
    """Links the writer-built DV fixture (two unioned DV deletes) into
    a fresh Iceberg table WITHOUT copying data — the Iceberg scan's
    files alias the Delta files and the delete state rides as V3
    deletion vectors.  Same oracle as the Delta-side read: both faces
    must see the identical row set."""
    from .iceberg_queries import _cached_table

    delta_loc = delta_dvw_fixture_path(spark, sf)

    def build(loc2: str):
        from .delta_write import link_delta_to_iceberg

        return link_delta_to_iceberg(spark, delta_loc, loc2)

    t = _cached_table(
        sf,
        "orders_from_delta_link",
        # full build = adoption append + one DV-delete snapshot
        lambda t: len(t.metadata.snapshots) == 2,
        build,
    )
    df = t.scan().to_df(spark)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# OPTIMIZE (r10): dataChange=false compaction with DV folding.

_OPT_MARKER = "opt-fixture@v1"


def delta_opt_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """An orders table written as 8 small files + two DV deletes, then
    OPTIMIZEd: the files and their deletion vectors collapse into
    ~one live-rows-only file.  The read-back must still match the
    delete oracle — compaction must move bytes, never rows."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_opt"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _OPT_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta import load_delta
    from .delta_write import (
        append_delta,
        create_delta_table,
        delete_where_delta,
        optimize_delta,
    )
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders.repartition(8))  # 8 small files
    delete_where_delta(spark, loc, F.col("o_orderkey") % 9 == 0)
    delete_where_delta(spark, loc, F.col("o_orderkey") % 13 == 0)
    before = load_delta(loc)
    v = optimize_delta(spark, loc)
    after = load_delta(loc)
    assert v is not None and len(after.files) < len(before.files)
    assert not after.deletion_vectors  # DVs folded away
    with open(ok, "w") as f:
        f.write(_OPT_MARKER + "\n")
    return loc


@register(
    "delta_optimize_roundtrip",
    delta_dv_delete_write_oracle,  # identical rows before/after OPTIMIZE
    "OPTIMIZE compaction: dataChange=false rewrite folding DVs; row "
    "set provably unchanged (same oracle as the delete gate)",
)
def delta_optimize_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Bin-packing compaction must be invisible to readers: the gate
    reuses the DV-delete oracle verbatim, so a single resurrected or
    dropped row hash-mismatches.  The commit's dataChange=false actions
    are what the stream source passes through silently (r9 advice #3's
    fix, exercised from the WRITER side here)."""
    loc = delta_opt_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER (r12): multi-column clustering rewrite.

_ZORD_MARKER = "zorder-fixture@v1"


def delta_zorder_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """orders as 8 small files + a DV delete, then OPTIMIZE ZORDER BY
    (o_custkey, o_orderkey): the rewrite folds the DV, and every output
    file's per-column min/max tightens on BOTH cluster columns — the
    construction asserts the clustering actually narrowed per-file
    o_custkey ranges vs the pre-rewrite layout (row-hash ordering), not
    just that rows survived."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_zorder"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _ZORD_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta import load_delta
    from .delta_write import (
        append_delta,
        create_delta_table,
        delete_where_delta,
        zorder_delta,
    )
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders.repartition(8))
    delete_where_delta(spark, loc, F.col("o_orderkey") % 7 == 0)

    before = load_delta(loc)
    v = zorder_delta(spark, loc, "o_custkey", "o_orderkey", n_files=8)
    after = load_delta(loc)
    assert v == before.version + 1
    assert not after.deletion_vectors  # DV folded into the rewrite
    # clustering effect: per-file o_orderkey spans must shrink vs the
    # hash-ordered before-layout (read footers directly — stats are
    # also in the log, but footers are ground truth). o_orderkey is the
    # wider-range cluster column, so Morton order is dominated by its
    # high bits and its spans tighten hardest; o_custkey's narrow
    # domain (~n/10 distinct values) tightens only once files subdivide
    # within an orderkey range — the standard z-order shape.
    import pyarrow.parquet as _pq

    def mean_span(files, col_idx):
        spans = []
        for p in files:
            md = _pq.ParquetFile(p).metadata
            lo = min(
                md.row_group(g).column(col_idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(col_idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    before_span = mean_span([p for p, _ in before.files], 0)
    after_span = mean_span([p for p, _ in after.files], 0)
    assert after_span < before_span / 2, (
        f"zorder did not tighten o_orderkey file ranges: "
        f"{before_span:.0f} -> {after_span:.0f}"
    )
    with open(ok, "w") as f:
        f.write(_ZORD_MARKER + "\n")
    return loc


delta_zorder_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(SUM(o_custkey % 1000) AS BIGINT) AS ckey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 7 <> 0
"""


@register(
    "delta_zorder_optimize",
    delta_zorder_oracle,
    "OPTIMIZE ZORDER BY (custkey, orderkey): dataChange=false Morton "
    "rewrite folding DVs; fixture asserts per-file ranges tightened",
)
def delta_zorder_optimize(spark: SparkSession, sf: str) -> DataFrame:
    """Clustering must move bytes, never rows: the oracle recomputes
    the DV-delete survivor set, so a row lost or duplicated by the
    rewrite hash-mismatches; the fixture separately asserts the layout
    actually clustered (mean per-file o_custkey span halves)."""
    loc = delta_zorder_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.sum(F.col("o_custkey") % 1000).cast("bigint").alias("ckey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# RESTORE (r10): rollback-as-a-commit.

_RESTORE_MARKER = "restore-fixture@v1"


def delta_restore_fixture_path(sf_dir: str) -> str:
    """The 4-commit fixture copied and RESTOREd to version 1: the v2
    DELETE and the v3 adds must both unwind, as ONE new commit (v4) —
    time travel to v2/v3 keeps working."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_restore"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _RESTORE_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta import load_delta
    from .delta_write import restore_delta

    src = delta_fixture_path(sf_dir)
    shutil.copytree(src, loc)
    os.remove(os.path.join(loc, "_FIXTURE_OK"))
    v = restore_delta(loc, 1)
    assert v == 4 and load_delta(loc).version == 4
    with open(ok, "w") as f:
        f.write(_RESTORE_MARKER + "\n")
    return loc


delta_restore_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderpriority
"""


@register(
    "delta_restore_read",
    delta_restore_oracle,
    "RESTORE TO VERSION AS OF: one commit re-adds the v1 live set "
    "(the v2 DELETE and v3 adds unwind); time travel preserved",
)
def delta_restore_read(spark: SparkSession, sf: str) -> DataFrame:
    """Rollback semantics: after restore-to-1, the live set is exactly
    v1's (keys %3 in (0,1), all priorities — including the '5-LOW' file
    the v2 DELETE had removed), while versions 2/3 remain readable via
    time travel (pytest-pinned)."""
    loc = delta_restore_fixture_path(sf)
    return _priority_agg(read_delta(spark, loc))


# ---------------------------------------------------------------------------
# UPDATE (r10): one-commit DV-masked update.

_UPD_MARKER = "upd-fixture@v1"


def delta_upd_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_upd"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _UPD_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table, update_where_delta
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders)
    update_where_delta(
        spark, loc,
        F.col("o_orderkey") % 11 == 0,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1000.0)},
    )
    with open(ok, "w") as f:
        f.write(_UPD_MARKER + "\n")
    return loc


delta_update_write_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(ROUND(SUM(CAST(
         CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS DECIMAL(13,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
"""


@register(
    "delta_update_write",
    delta_update_write_oracle,
    "DV-masked UPDATE: one commit = pre-image masked by DV swaps + "
    "post-image rows in new files; row count unchanged",
)
def delta_update_write(spark: SparkSession, sf: str) -> DataFrame:
    """UPDATE without whole-file rewrites: touched files keep their
    untouched rows behind a deletion vector; only changed rows' bytes
    are written.  The oracle prices the update as a CASE over the base
    table, so a doubled row (DV not applied) or a lost row (post-image
    not written) hash-mismatches on BOTH n_rows and total_price."""
    loc = delta_upd_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(13,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# MERGE upsert (r10): Delta twin of iceberg_merge_upsert.

_MRG_MARKER = "mrg-fixture@v1"


def delta_mrg_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """orders table upserted: every orderkey ≡ 3 (mod 50) collapses to
    one row with totalprice 777; plus 5 brand-new keys — both in ONE
    commit (DV swaps + new files)."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_mrg"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _MRG_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table, merge_upsert_delta
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders)
    src = (
        orders.filter(F.col("o_orderkey") % 50 == 3)
        .select("o_orderkey")
        .distinct()
        .select(
            "o_orderkey",
            F.lit(-1).cast("long").alias("o_custkey"),
            F.lit(777.0).alias("o_totalprice"),
        )
    ).unionByName(
        spark.createDataFrame(
            [(10_000_000 + i, -1, 777.0) for i in range(5)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
    )
    merge_upsert_delta(spark, loc, src, ["o_orderkey"])
    with open(ok, "w") as f:
        f.write(_MRG_MARKER + "\n")
    return loc


delta_merge_oracle = """
WITH src_keys AS (
  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 50 = 3
),
merged AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src_keys)
  UNION ALL
  SELECT o_orderkey, CAST(777 AS DOUBLE) FROM src_keys
  UNION ALL
  SELECT 10000000 + i, CAST(777 AS DOUBLE) FROM range(5) t(i)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(13,2))), 2) AS DOUBLE)
         AS total_price
FROM merged
"""


@register(
    "delta_merge_upsert",
    delta_merge_oracle,
    "MERGE upsert, Delta face: DV swaps erase pre-images, source lands "
    "as new files, ONE commit (twin of iceberg_merge_upsert)",
)
def delta_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    loc = delta_mrg_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(13,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Full MERGE WHEN-clause matrix (r12).

_MRGX_MARKER = "mrgx-fixture@v1"


def delta_mrgx_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """orders merged with all four WHEN clauses in ONE commit:
    matched keys (≡3 mod 10) either delete (when the source marks
    o_custkey negative: keys ≡3 mod 40) or update o_totalprice to the
    doubled source price; 5 new keys insert only when odd; and target
    keys ≡0 mod 97 with no source row are swept by the
    not-matched-by-source delete."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/orders_delta_mrgx"
    ok = os.path.join(loc, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _MRGX_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc, ignore_errors=True)

    from .delta_write import append_delta, create_delta_table, merge_delta
    from .queries import load as _load

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_delta_table(loc, orders.schema)
    append_delta(spark, loc, orders)
    src = orders.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 40 == 3, F.lit(-1).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    ).unionByName(
        spark.createDataFrame(
            [(10_000_000 + i, -1, 777.0) for i in range(5)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
    )
    merge_delta(
        spark,
        loc,
        src,
        ["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        matched_condition="s.o_custkey >= 0",
        when_matched_delete="s.o_custkey < 0",
        when_not_matched_insert=True,
        not_matched_condition="s.o_orderkey % 2 = 1",
        when_not_matched_by_source_delete="t.o_orderkey % 97 = 0",
    )
    with open(ok, "w") as f:
        f.write(_MRGX_MARKER + "\n")
    return loc


delta_merge_matrix_oracle = """
WITH src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 40 = 3 THEN CAST(-1 AS BIGINT)
              ELSE o_custkey END AS o_custkey,
         o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT 10000000 + i, CAST(-1 AS BIGINT), CAST(777.0 AS DOUBLE)
  FROM range(5) t(i)
),
merged AS (
  -- matched + update clause (source custkey >= 0): new totalprice only
  SELECT t.o_orderkey, t.o_custkey, s.o_totalprice
  FROM orders t JOIN src s USING (o_orderkey)
  WHERE s.o_custkey >= 0
  -- matched + delete clause rows (s.o_custkey < 0) are simply absent
  UNION ALL
  -- unmatched target rows survive unless the by-source sweep hits
  SELECT t.o_orderkey, t.o_custkey, t.o_totalprice
  FROM orders t
  WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
    AND t.o_orderkey % 97 <> 0
  UNION ALL
  -- conditional inserts: new keys, odd only
  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
  FROM src s
  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM orders)
    AND s.o_orderkey % 2 = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(SUM(o_custkey % 1000) AS BIGINT) AS ckey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(13,2))), 2) AS DOUBLE)
         AS total_price
FROM merged
"""


@register(
    "delta_merge_matrix",
    delta_merge_matrix_oracle,
    "Full MERGE WHEN-clause matrix: conditional matched update/delete, "
    "conditional insert, not-matched-by-source delete — one commit",
)
def delta_merge_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """The oracle recomputes all four clause outcomes relationally, so
    a row routed to the wrong clause (updated instead of deleted,
    swept instead of kept, inserted against its condition) shifts
    n_rows or a checksum and hash-mismatches."""
    loc = delta_mrgx_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.sum(F.col("o_custkey") % 1000).cast("bigint").alias("ckey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(13,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Zero-copy link export (r10): Iceberg files registered in a Delta log.

_LNK_MARKER = "lnk-fixture@v2"


def delta_lnk_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """An Iceberg orders table with MOR positional deletes (%9==0),
    LINK-exported: the Delta log points at the SAME parquet files, the
    delete state travels as a translated deletion vector."""
    key = sf_dir.strip("/").replace("/", "_")
    loc_root = f"{_CACHE_ROOT}/{key}/orders_link"
    loc = f"{loc_root}/delta"
    ok = os.path.join(loc_root, "_FIXTURE_OK")
    if os.path.exists(ok):
        try:
            with open(ok) as f:
                if f.read().strip() == _LNK_MARKER:
                    return loc
        except OSError:
            pass
    shutil.rmtree(loc_root, ignore_errors=True)
    os.makedirs(loc_root, exist_ok=True)

    import icegopher_spark.iceberg.write as W
    from icegopher_spark.iceberg.schema import Schema as ISchema
    from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField

    from .delta_write import link_iceberg_to_delta
    from .queries import load as _load

    schema = ISchema(
        (
            NestedField(1, "o_orderkey", LongType(), True),
            NestedField(2, "o_custkey", LongType(), False),
            NestedField(3, "o_totalprice", DoubleType(), False),
        ),
        schema_id=0,
    )
    t = W.create_table(f"{loc_root}/iceberg", schema)
    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = W.append(t, orders)
    # MOR positional deletes for o_orderkey % 9 == 0: mod isn't a bound
    # predicate, so the delete goes through delete_where_mor's Spark
    # Column overload — the predicate evaluates row-level in the scan
    # and positions are written distributed, with no driver-side
    # key materialization (r11 verdict task #4 removed the old
    # collect()-an-IN-list construction, which pulled ~N/9 keys to the
    # driver at bench scale)
    from pyspark.sql import functions as SF

    t = W.delete_where_mor(t, spark, SF.col("o_orderkey") % 9 == 0)
    link_iceberg_to_delta(spark, t, loc)
    with open(ok, "w") as f:
        f.write(_LNK_MARKER + "\n")
    return loc


delta_link_export_oracle = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey % 1000) AS BIGINT) AS okey_chk,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 9 <> 0
"""


@register(
    "delta_link_export",
    delta_link_export_oracle,
    "Zero-copy Iceberg->Delta link: same parquet files, positional "
    "deletes translated to a Delta DV — O(metadata) migration",
)
def delta_link_export(spark: SparkSession, sf: str) -> DataFrame:
    loc = delta_lnk_fixture_path(spark, sf)
    df = read_delta(spark, loc)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Batch DataSource face (r10): format("icegopher_delta").

delta_datasource_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE NOT (o_orderkey % 3 = 0 AND o_orderpriority = '5-LOW')
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


@register(
    "delta_datasource_read",
    delta_datasource_oracle,
    "format('icegopher_delta') batch face: shared Arrow kernel with "
    "the stream source; pushed IN-filter prunes files at plan time",
)
def delta_datasource_read(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-face Delta read: the session enables python filterPushdown,
    so the IN predicate on the partition column reaches pushFilters and
    prunes files against the log's partitionValues BEFORE any parquet
    opens (pruning pinned by tests/test_delta_dsv2.py); Spark re-applies
    the filter row-level, so pruning can only drop whole files, never
    rows."""
    from .delta_dsv2 import DeltaBatchDataSource

    spark.dataSource.register(DeltaBatchDataSource)
    loc = delta_fixture_path(sf)
    df = (
        spark.read.format("icegopher_delta")
        .option("location", loc)
        .load()
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    )
    return _priority_agg(df)
