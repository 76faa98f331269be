"""Minimal Delta Lake table READER, built from the public Delta
transaction-log protocol (delta.io PROTOCOL.md).

A Delta table is a directory of parquet data files plus a
``_delta_log/`` of zero-padded, ordered JSON commits (and optional
parquet checkpoints).  Each commit is newline-delimited JSON actions;
replaying ``add``/``remove`` actions yields the file set of any
version.  This module implements the read path only:

  * version + timestamp time travel (``version=`` / ``timestamp_ms=``)
  * partition columns reconstructed from each file's
    ``partitionValues`` — the protocol stores them in the LOG, not in
    the data files, so a plain parquet scan of a partitioned Delta
    table silently drops columns
  * parquet checkpoints honored via ``_last_checkpoint``: replay is
    O(commits since checkpoint), not O(table history), and pre-
    checkpoint JSON may have been vacuumed away entirely
  * metadata-plane partition pruning (``partition_filter=``) before
    any data file is opened
  * loud refusal of features this reader cannot honor silently:
    deletion vectors on live files, column mapping (id/name modes),
    unsupported ``readerFeatures`` — misreading is worse than failing

Why a Delta reader in an Iceberg-centric engine: migration.  A 100 TB
estate is rarely single-format; ``read_delta`` + the Iceberg write
plane (`iceberg.write.append`) is a one-pass migration path, and the
reader is metadata-scale on the driver (file LIST only — the data
path is a normal distributed parquet scan with one broadcast join to
re-attach partition values).

The reference engine is Iceberg-only (catalog.go:40-47); this module
is engine-surface the reference lacks, added because a training-data
pipeline at 100 TB routinely ingests Delta-format drops.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "DeltaSnapshot",
    "load_delta",
    "read_delta",
    "read_changes",
    "vacuum_candidates",
    "delta_history",
]


# readerFeatures this implementation actually honors (protocol §
# "Table Features").  `timestampNtz` is a pure type-system feature —
# parquet TIMESTAMP(isAdjustedToUTC=false) reads natively.
_SUPPORTED_READER_FEATURES = {"timestampNtz"}


@dataclass
class DeltaSnapshot:
    """The resolved state of one table version: schema + live files."""

    version: int
    schema: StructType
    partition_columns: list[str]
    # (absolute data path, partitionValues as written — str|None values)
    files: list[tuple[str, dict[str, str | None]]] = field(default_factory=list)
    configuration: dict[str, str] = field(default_factory=dict)


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_delta_log")


def _version_of(fn: str) -> int:
    return int(fn.split(".", 1)[0])


def _list_log(table_path: str) -> tuple[list[int], list[int]]:
    """(sorted json commit versions, sorted checkpoint versions).

    Multi-part checkpoints (`.checkpoint.<part>.<of>.parquet`) are
    recognized and counted once; v2/uuid checkpoints are refused by
    the _last_checkpoint reader below.
    """
    commits, checkpoints = set(), set()
    for fn in os.listdir(_log_dir(table_path)):
        if fn.endswith(".json") and fn.split(".")[0].isdigit():
            commits.add(_version_of(fn))
        elif ".checkpoint" in fn and fn.endswith(".parquet"):
            checkpoints.add(_version_of(fn))
    return sorted(commits), sorted(checkpoints)


def _checkpoint_paths(table_path: str, version: int) -> list[str]:
    """All parquet parts of the checkpoint at `version` (1 or N files)."""
    d = _log_dir(table_path)
    single = os.path.join(d, f"{version:020d}.checkpoint.parquet")
    if os.path.exists(single):
        return [single]
    parts = sorted(
        os.path.join(d, fn)
        for fn in os.listdir(d)
        if fn.startswith(f"{version:020d}.checkpoint.") and fn.endswith(".parquet")
    )
    if not parts:
        raise FileNotFoundError(f"checkpoint {version} listed but no parquet found")
    return parts


def _refuse(feature: str, where: str) -> None:
    raise NotImplementedError(
        f"Delta reader: table uses {feature} ({where}), which this "
        "minimal reader does not implement — refusing rather than "
        "misreading. Supported: add/remove replay, checkpoints, "
        "partition values, version/timestamp travel."
    )


def _check_protocol(protocol: dict) -> None:
    min_reader = int(protocol.get("minReaderVersion", 1))
    if min_reader >= 3:
        feats = set(protocol.get("readerFeatures") or [])
        unsupported = feats - _SUPPORTED_READER_FEATURES
        if unsupported:
            _refuse(f"readerFeatures {sorted(unsupported)}", "protocol action")
    elif min_reader == 2:
        # reader v2 == column mapping; checked again on metaData, but a
        # protocol-only log (pre-metadata replay) must already refuse
        pass
    elif min_reader > 3:  # pragma: no cover — future-proofing
        _refuse(f"minReaderVersion={min_reader}", "protocol action")


def _check_metadata(meta: dict) -> None:
    conf = meta.get("configuration") or {}
    mapping = conf.get("delta.columnMapping.mode", "none")
    if mapping not in ("", "none"):
        _refuse(f"column mapping mode '{mapping}'", "metaData.configuration")


def _apply_action(state: dict, action: dict) -> None:
    """Replay one action into {files: {path: partitionValues},
    metaData, protocol}.  Later actions win within and across commits
    (commits are applied in version order, actions in file order)."""
    if "add" in action and action["add"] is not None:
        a = action["add"]
        if a.get("deletionVector"):
            _refuse("deletion vectors", f"add {a.get('path')}")
        pv = a.get("partitionValues") or {}
        if not isinstance(pv, dict):
            # checkpoint parquet stores partitionValues as map<str,str>,
            # which pyarrow surfaces as a list of (k, v) pairs
            pv = dict(pv)
        state["files"][a["path"]] = pv
    elif "remove" in action and action["remove"] is not None:
        state["files"].pop(action["remove"]["path"], None)
    elif "metaData" in action and action["metaData"] is not None:
        _check_metadata(action["metaData"])
        state["metaData"] = action["metaData"]
    elif "protocol" in action and action["protocol"] is not None:
        _check_protocol(action["protocol"])
        state["protocol"] = action["protocol"]
    # txn / commitInfo / cdc / domainMetadata: no effect on the file set


def _replay_checkpoint(state: dict, table_path: str, version: int) -> None:
    """Seed replay state from a parquet checkpoint: one row per action,
    struct columns `add`, `remove`, `metaData`, `protocol` (protocol
    § "Checkpoints"). Tombstones (`remove`) in a checkpoint exist only
    for VACUUM bookkeeping — the live file set is the `add` rows."""
    import pyarrow.parquet as pq

    for part in _checkpoint_paths(table_path, version):
        tbl = pq.read_table(part)
        cols = set(tbl.schema.names)
        rows = tbl.to_pylist()
        for row in rows:
            for key in ("protocol", "metaData", "add"):
                if key in cols and row.get(key) is not None:
                    _apply_action(state, {key: row[key]})


def _commit_timestamp(table_path: str, version: int) -> int:
    """Commit time in ms: `commitInfo.timestamp` when present (the
    in-log value survives file copies), else file mtime (the protocol's
    stated fallback)."""
    p = os.path.join(_log_dir(table_path), f"{version:020d}.json")
    with open(p, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            action = json.loads(line)
            ci = action.get("commitInfo")
            if ci and "timestamp" in ci:
                return int(ci["timestamp"])
    return int(os.path.getmtime(p) * 1000)


def _resolve_version(
    table_path: str,
    commits: list[int],
    checkpoints: list[int],
    version: int | None,
    timestamp_ms: int | None,
) -> int:
    latest = max([*commits, *checkpoints])
    if version is not None and timestamp_ms is not None:
        raise ValueError("pass version= or timestamp_ms=, not both")
    if version is None and timestamp_ms is None:
        return latest
    if version is not None:
        if version > latest:
            raise ValueError(f"version {version} > latest {latest}")
        return version
    # timestamp travel: newest commit whose timestamp <= given (same
    # semantics as Iceberg's snapshot-as-of and Delta's own resolver)
    best = None
    for v in commits:
        if _commit_timestamp(table_path, v) <= timestamp_ms:
            best = v
    if best is None:
        raise ValueError(
            f"no commit at or before timestamp {timestamp_ms} "
            "(earliest readable commit is newer)"
        )
    return best


def load_delta(
    table_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DeltaSnapshot:
    """Replay the transaction log to a :class:`DeltaSnapshot`.

    Driver cost is metadata-scale: one directory listing plus the JSON
    commits after the newest checkpoint ≤ target version (the
    checkpoint itself is a columnar parquet read).  No data file is
    opened.
    """
    log_dir = _log_dir(table_path)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path}")
    commits, checkpoints = _list_log(table_path)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log: {table_path}")
    target = _resolve_version(table_path, commits, checkpoints, version, timestamp_ms)

    # newest checkpoint ≤ target seeds the state; JSON replays the rest
    start_cp = max((c for c in checkpoints if c <= target), default=None)
    state: dict = {"files": {}, "metaData": None, "protocol": None}
    if start_cp is not None:
        _replay_checkpoint(state, table_path, start_cp)
    replay_from = (start_cp + 1) if start_cp is not None else 0
    for v in range(replay_from, target + 1):
        p = os.path.join(log_dir, f"{v:020d}.json")
        if not os.path.exists(p):
            if v in checkpoints:
                continue  # checkpoint-only version (JSON vacuumed)
            raise FileNotFoundError(
                f"commit {v} missing from _delta_log (log has a hole; "
                f"earliest checkpoint covering it: {start_cp})"
            )
        with open(p, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    _apply_action(state, json.loads(line))

    meta = state["metaData"]
    if meta is None:
        raise ValueError(
            f"no metaData action found replaying to version {target} — "
            "corrupt log or checkpoint"
        )
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    files = [
        (os.path.join(table_path, p), pv) for p, pv in sorted(state["files"].items())
    ]
    return DeltaSnapshot(
        version=target,
        schema=schema,
        partition_columns=part_cols,
        files=files,
        configuration=dict(meta.get("configuration") or {}),
    )


def read_delta(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
    partition_filter=None,
) -> DataFrame:
    """Read a Delta table as a Spark DataFrame.

    ``partition_filter`` is an optional ``dict[str, str|None] -> bool``
    applied to each file's partitionValues at PLAN time — files are
    pruned before the scan, which is the Delta analogue of Iceberg's
    manifest-level partition pruning (the log, like a manifest, carries
    per-file partition tuples).

    Physical shape: ONE distributed parquet scan over the surviving
    files.  For partitioned tables the partition columns are re-attached
    by a broadcast hash join on the file path (`input_file_name()` ⋈
    a files→values map of metadata size) — per-partition-group unions
    would blow the plan up at 100 TB (one scan node per partition),
    and hive-style path inference is not guaranteed by the protocol.
    """
    snap = load_delta(table_path, version=version, timestamp_ms=timestamp_ms)
    files = snap.files
    if partition_filter is not None:
        files = [(p, pv) for p, pv in files if partition_filter(pv)]
    return _scan_files(spark, snap.schema, snap.partition_columns, files)


def _scan_files(
    spark: SparkSession,
    schema: StructType,
    partition_columns: list[str],
    files: list[tuple[str, dict]],
    extra_schema: StructType | None = None,
) -> DataFrame:
    """ONE distributed parquet scan over `files`, with each file's
    partitionValues re-attached via a broadcast path join.  Shared by
    the batch read and the CDF read.  `extra_schema` appends columns
    that live IN the data files but not in the table schema (the CDF
    `_change_type` column of cdc files)."""
    data_fields = [f for f in schema.fields if f.name not in partition_columns]
    if extra_schema is not None:
        data_fields = data_fields + list(extra_schema.fields)
    data_schema = StructType(data_fields)
    out_names = [f.name for f in schema.fields] + (
        [f.name for f in extra_schema.fields] if extra_schema is not None else []
    )

    if not files:
        return spark.createDataFrame([], StructType(
            [f for f in schema.fields] + (list(extra_schema.fields) if extra_schema else [])
        ))

    paths = [p for p, _ in files]
    df = spark.read.schema(data_schema).parquet(*paths)
    if not partition_columns:
        return df.select(*out_names)

    # metadata-size (path → partition values) frame, broadcast-joined.
    part_fields = [f for f in schema.fields if f.name in partition_columns]
    # input_file_name() percent-encodes the path like a Java URI
    # (space→%20, %→%25) but leaves RFC-3986 pchar sub-delims (+ = & …)
    # literal — so the MAP side must encode the same way. Decoding the
    # Spark side instead (url_decode) would corrupt literal '+' to a
    # space. Verified empirically against Spark 4; a mismatch here
    # silently DROPS the partition's rows (inner join).
    from urllib.parse import quote as _q

    def _uri_path(p: str) -> str:
        return _q(os.path.abspath(p), safe="/!$&'()*+,;=:@-._~")

    rows = []
    for p, pv in files:
        rows.append(
            (_uri_path(p), *[pv.get(f.name) for f in part_fields])
        )
    map_schema = StructType.fromDDL(
        "__delta_path string, "
        + ", ".join(f"`{f.name}__raw` string" for f in part_fields)
    )
    pmap = spark.createDataFrame(rows, map_schema)
    for f_ in part_fields:
        raw = F.col(f"{f_.name}__raw")
        typed = raw.cast(f_.dataType)
        if f_.dataType.simpleString() != "string":
            # '' means NULL for non-string partition types (protocol)
            typed = F.when(raw == "", F.lit(None).cast(f_.dataType)).otherwise(typed)
        pmap = pmap.withColumn(f_.name, typed)
    pmap = pmap.drop(*[f"{f_.name}__raw" for f_ in part_fields])

    # input_file_name() yields a URI: file:///a/b (or file:/a/b);
    # stripping "file:" + an optional "//" leaves the os path /a/b,
    # matching os.path.abspath on the map side
    joined = df.withColumn(
        "__delta_path", F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
    )
    out = joined.join(F.broadcast(pmap), "__delta_path", "inner").drop("__delta_path")
    # present columns in declared schema order
    return out.select(*out_names)


def vacuum_candidates(
    table_path: str,
    retention_ms: int = 7 * 24 * 3600 * 1000,
    now_ms: int | None = None,
) -> list[str]:
    """Dry-run VACUUM: data files under the table root that are (a) not
    in the CURRENT version's live set, (b) not referenced by any commit
    whose timestamp is within the retention window (time travel to
    those versions must keep working), and (c) whose mtime is older
    than the retention cutoff (an in-flight writer's uncommitted file
    is never a candidate — same guard as Iceberg orphan GC).

    Returns absolute paths; deletion is the caller's decision.  Driver
    cost is metadata-scale plus one directory walk — the same contract
    as `iceberg/maintenance.py::orphan_files`, and like it, the walk
    would become a distributed listing on an object store.
    """
    import time as _time

    if now_ms is None:
        now_ms = int(_time.time() * 1000)
    cutoff_ms = now_ms - retention_ms
    commits, checkpoints = _list_log(table_path)
    latest = max([*commits, *checkpoints])

    # live set of the current version, plus every version still inside
    # the retention window (their files must survive for time travel)
    protected_versions = {latest}
    for v in commits:
        if _commit_timestamp(table_path, v) >= cutoff_ms:
            protected_versions.add(v)
    referenced: set[str] = set()
    for v in sorted(protected_versions):
        try:
            snap = load_delta(table_path, version=v)
        except FileNotFoundError:
            continue  # pre-checkpoint version no longer reconstructable
        referenced.update(p for p, _ in snap.files)

    root = os.path.abspath(table_path)
    log_root = os.path.abspath(_log_dir(table_path))
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        if os.path.abspath(dirpath).startswith(log_root):
            continue  # the transaction log is never vacuumed
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.abspath(os.path.join(dirpath, fn))
            if p in referenced:
                continue
            try:
                if os.path.getmtime(p) * 1000 > cutoff_ms:
                    continue
            except OSError:
                continue
            out.append(p)
    return sorted(out)


def _classify_changes(
    table_path: str,
    snap: DeltaSnapshot,
    starting_version: int,
    end: int,
) -> tuple[dict, dict]:
    """Replay the log and attribute change files per commit in
    ``[starting_version, end]``.  Returns
    ``({(version, 'insert'|'delete'): [(abs_path, pv)]},
    {version: [(abs_path, pv)]})`` — the second dict holds cdc files
    (in-file _change_type).  State replays from the newest checkpoint
    below the range so removed files' partitionValues are known at
    removal time.  Shared by the batch CDF read and the CDF stream."""
    commits, checkpoints = _list_log(table_path)
    log_dir = _log_dir(table_path)

    start_cp = max((c for c in checkpoints if c < starting_version), default=None)
    state: dict = {"files": {}, "metaData": None, "protocol": None}
    if start_cp is not None:
        _replay_checkpoint(state, table_path, start_cp)
    replay_from = (start_cp + 1) if start_cp is not None else 0

    schema_json = json.dumps(json.loads(snap.schema.json()), sort_keys=True)
    # {(version, change_type): [(path, pv), ...]} — within one commit a
    # path is unique, so the per-group path-map join is collision-free
    plain: dict[tuple[int, str], list[tuple[str, dict]]] = {}
    cdc: dict[int, list[tuple[str, dict]]] = {}

    for v in range(replay_from, end + 1):
        p = os.path.join(log_dir, f"{v:020d}.json")
        if not os.path.exists(p):
            if v < starting_version and v in checkpoints:
                continue  # pre-range, checkpoint-covered
            raise FileNotFoundError(
                f"CDF: commit {v} missing from _delta_log — per-commit "
                "changes cannot be attributed (vacuumed log?)"
            )
        in_range = v >= starting_version
        v_adds: list[dict] = []
        v_removes: list[tuple[str, dict]] = []  # (path, pv at removal)
        v_cdc: list[dict] = []
        with open(p, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if a.get("cdc") is not None:
                    v_cdc.append(a["cdc"])
                    continue
                if in_range and a.get("metaData") is not None:
                    ms = a["metaData"].get("schemaString")
                    if ms and json.dumps(json.loads(ms), sort_keys=True) != schema_json:
                        raise ValueError(
                            f"CDF: commit {v} changes the table schema inside "
                            "the requested range; split the read at that version"
                        )
                if a.get("remove") is not None and in_range:
                    rp = a["remove"]["path"]
                    if a["remove"].get("dataChange", True):
                        pv = a["remove"].get("partitionValues") or state["files"].get(rp)
                        if pv is None:
                            raise ValueError(
                                f"CDF: remove of {rp} at commit {v} predates "
                                "the replayable log — cannot recover its "
                                "partition values"
                            )
                        v_removes.append((rp, dict(pv)))
                if a.get("add") is not None and in_range and a["add"].get("dataChange", True):
                    v_adds.append(a["add"])
                _apply_action(state, a)
        if not in_range:
            continue
        if v_cdc:
            # cdc files are the only authority for this commit's changes
            cdc[v] = [
                (os.path.join(table_path, c["path"]), dict(c.get("partitionValues") or {}))
                for c in v_cdc
            ]
            continue
        if v_adds:
            plain[(v, "insert")] = [
                (os.path.join(table_path, a["path"]), dict(a.get("partitionValues") or {}))
                for a in v_adds
            ]
        if v_removes:
            plain[(v, "delete")] = [
                (os.path.join(table_path, rp), dict(rpv)) for rp, rpv in v_removes
            ]
    return plain, cdc


def read_changes(
    spark: SparkSession,
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> DataFrame:
    """Change Data Feed: row-level changes per commit in
    ``[starting_version, ending_version]`` — the Delta analogue of the
    Iceberg changelog (`iceberg/changelog.py`).

    Output: table columns + ``_change_type`` (insert / delete /
    update_preimage / update_postimage) + ``_commit_version``.

    Sources of change rows, per the protocol's CDF rules:
      * a commit carrying ``cdc`` actions: those files are the ONLY
        authority for that commit's changes (they carry _change_type
        in-file, including update pre/post images);
      * otherwise: ``add`` actions with dataChange=true are inserts,
        ``remove`` actions with dataChange=true are deletes — the
        removed file's rows are read back, with partitionValues taken
        from the replay state at removal time (remove actions aren't
        required to carry them);
      * dataChange=false adds/removes (OPTIMIZE/compaction) move bytes,
        not rows — no change rows, state still advances.

    Physical shape: one scan per (commit, change-kind) group, unioned —
    O(commits in range) plan nodes, which is bounded by the range the
    caller asked for (delta-spark attributes CDF per commit the same
    way). A single global scan is NOT possible: the same physical file
    can legitimately appear in several change events (inserted at v0,
    deleted at v2, re-added at v5), and a path-keyed map join would
    multiply its rows across all of them.
    """
    from pyspark.sql.types import LongType, StringType, StructField

    commits, checkpoints = _list_log(table_path)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log: {table_path}")
    latest = max([*commits, *checkpoints])
    end = latest if ending_version is None else ending_version
    if not 0 <= starting_version <= end <= latest:
        raise ValueError(
            f"bad CDF range [{starting_version}, {end}] (latest {latest})"
        )

    snap = load_delta(table_path, version=end)  # schema authority + refusals
    plain, cdc = _classify_changes(table_path, snap, starting_version, end)

    ct_field = StructField("_change_type", StringType(), True)
    cv_field = StructField("_commit_version", LongType(), True)
    out_schema = StructType([*snap.schema.fields, ct_field, cv_field])
    out_names = [f.name for f in out_schema.fields]
    pieces: list[DataFrame] = []
    for (v, kind), group in sorted(plain.items()):
        df = _scan_files(spark, snap.schema, snap.partition_columns, group)
        pieces.append(
            df.withColumn("_change_type", F.lit(kind)).withColumn(
                "_commit_version", F.lit(v).cast("long")
            )
        )
    for v, group in sorted(cdc.items()):
        df = _scan_files(
            spark,
            snap.schema,
            snap.partition_columns,
            group,
            extra_schema=StructType([ct_field]),
        )
        pieces.append(df.withColumn("_commit_version", F.lit(v).cast("long")))
    if not pieces:
        return spark.createDataFrame([], out_schema)
    out = pieces[0].select(*out_names)
    for p_ in pieces[1:]:
        out = out.unionByName(p_.select(*out_names))
    return out


def delta_history(table_path: str) -> list[dict]:
    """Commit history, newest first — the inspection-plane twin of
    `iceberg/inspect.py::history` for the Delta side.  One dict per
    reconstructable JSON commit: version, timestamp (ms), operation
    (from commitInfo when present), and action counts.  Driver-side,
    metadata-scale (JSON only; checkpoint-only versions appear with
    operation 'UNKNOWN (checkpoint-only)')."""
    commits, checkpoints = _list_log(table_path)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log: {table_path}")
    out: list[dict] = []
    for v in sorted(set(commits) | set(checkpoints), reverse=True):
        p = os.path.join(_log_dir(table_path), f"{v:020d}.json")
        if not os.path.exists(p):
            out.append(
                {
                    "version": v,
                    "timestamp": None,
                    "operation": "UNKNOWN (checkpoint-only)",
                    "n_adds": None,
                    "n_removes": None,
                }
            )
            continue
        op, ts, n_add, n_rm = None, None, 0, 0
        with open(p, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                ci = a.get("commitInfo")
                if ci:
                    op = ci.get("operation", op)
                    ts = ci.get("timestamp", ts)
                if a.get("add") is not None:
                    n_add += 1
                if a.get("remove") is not None:
                    n_rm += 1
        if ts is None:
            ts = int(os.path.getmtime(p) * 1000)
        out.append(
            {
                "version": v,
                "timestamp": ts,
                "operation": op or "UNKNOWN",
                "n_adds": n_add,
                "n_removes": n_rm,
            }
        )
    return out
