"""Iceberg table as a CDC Structured Streaming source:
`spark.readStream.format("icegopher_cdc")` tails the snapshot log and
emits row-LEVEL changes — inserts AND deletes — tagged with
``_change_type`` ('insert' | 'delete') and ``_commit_snapshot_id``.

The append-only source (iceberg_source.py) must refuse or skip
overwrite/delete snapshots; this source represents them. The batch
twin is changelog.py (same per-snapshot semantics); streaming
consumers get the same rows incrementally with exactly-once offsets
anchored in the main-branch lineage.

Per-snapshot semantics (lineage oldest → newest):
  * `append`: ADDED data files → inserts.
  * `replace` (compaction/z-order/DV migration): skipped — byte
    movement, not rows.
  * `delete`/`overwrite`:
      - ADDED data files → inserts;
      - ADDED deletion vectors → the file's NEWLY-deleted positions
        (new bitmap minus the file's prior delete state — DVs are
        replacement supersets) → deletes;
      - ADDED positional-delete files → their (path, pos) rows minus
        prior state → deletes;
      - REMOVED data files (copy-on-write) → their still-live rows →
        deletes. Carryover rows of a CoW rewrite therefore emit as a
        delete+insert PAIR (un-netted — the stream cannot see across
        files; net with the batch changelog's ``net=True`` if needed).
  * ADDED equality-delete files REFUSE loudly: materializing eq keys
    into row pre-images needs cross-file joins a self-contained
    partition read cannot do — run
    ``maintenance.rewrite_equality_deletes`` first (the stream then
    sees DVs) or use the batch changelog. Option
    ``skip-equality-snapshots`` opts into IGNORING the key deletes
    (the snapshot's data files and DVs still emit) — a documented
    exactness trade, not a wholesale snapshot skip.

Option ``starting-snapshot-id`` (r8) anchors a FRESH checkpoint after
the given snapshot (exclusive) instead of replaying full history —
the CDC bootstrap pattern (batch-read state at the anchor, stream
changes after), and the exact path past pre-migration equality-delete
snapshots: rewrite_equality_deletes, then anchor at the migration
commit (gate stream_cdc_after_eq_migrate).

Scale posture: planning is driver-side over manifest entries (one
partition per changed file — the same fan-out as the batch scan);
reads run on executors via pyarrow with NO Spark session: position
bitmaps decode from Puffin bytes, positional-delete parquets read
with a file_path pushdown filter, and row selection is an Arrow
``take``. Only parquet data files are supported (matching the append
source); others refuse loudly.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from .iceberg_source import _AppendStreamReader

CHANGE_TYPE = "_change_type"
COMMIT_SNAPSHOT = "_commit_snapshot_id"


class _CdcPartition(InputPartition):
    def __init__(
        self,
        kind: str,  # insert | delete_rows | delete_file | empty
        path: str = "",
        snapshot_id: int = 0,
        column_map=None,
        arrow_schema=None,
        new_pos_paths=(),  # positional-delete parquets added this snapshot
        new_dvs=(),  # (puffin_path, offset, length) added this snapshot
        prior_pos_paths=(),  # applicable prior positional-delete parquets
        prior_dvs=(),  # applicable prior DVs
    ):
        self.kind = kind
        self.path = path
        self.snapshot_id = snapshot_id
        self.column_map = column_map
        self.arrow_schema = arrow_schema
        self.new_pos_paths = tuple(new_pos_paths)
        self.new_dvs = tuple(new_dvs)
        self.prior_pos_paths = tuple(prior_pos_paths)
        self.prior_dvs = tuple(prior_dvs)


def _positions_for(path, pos_paths, dvs):
    """Deleted positions for data file ``path`` from positional-delete
    parquets (file_path pushdown) + DV bitmaps — pure pyarrow/numpy."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..iceberg.puffin import read_dv
    from ..iceberg.table import strip_file_scheme

    out = []
    for p in pos_paths:
        t = pq.read_table(
            strip_file_scheme(p),
            columns=["file_path", "pos"],
            # writers record file_path as written by Spark's _metadata
            # (file://{path}) or normalized (/…); cover every scheme
            # spelling so pushdown never silently drops positions
            filters=[
                ("file_path", "in", [path, f"file:{path}", f"file://{path}"])
            ],
        )
        if t.num_rows:
            out.append(t.column("pos").to_numpy(zero_copy_only=False))
    for puffin_path, off, length in dvs:
        with open(strip_file_scheme(puffin_path), "rb") as f:
            data = f.read()
        out.append(read_dv(data, int(off), int(length)).astype("int64"))
    if not out:
        return np.empty(0, dtype="int64")
    return np.unique(np.concatenate(out))


class _CdcStreamReader(_AppendStreamReader):
    """Shares lineage/offset/anchor mechanics with the append reader;
    overrides planning + the partition kernel."""

    def __init__(self, options):
        super().__init__(options)
        # analog of the append source's skip flags: equality-delete
        # FILES (added in-range or live before it) refuse by default;
        # opting in IGNORES the key deletes — the snapshot's data files
        # and DVs still emit, but its eq deletes never do, and a later
        # DV may re-report rows the eq already removed. The exact path
        # is rewrite_equality_deletes + a checkpoint anchored past the
        # eq commits.
        self.skip_eq = (
            options.get("skip-equality-snapshots", "false").lower() == "true"
        )

    def partitions(self, start: dict, end: dict):
        from pyspark.sql.pandas.types import to_arrow_schema

        from ..iceberg.dsv2 import column_map_for
        from ..iceberg.manifests import (
            DataFileContent,
            ManifestContent,
            ManifestEntryStatus,
            fetch_entries,
            read_manifest_list,
        )
        from ..iceberg.table import strip_file_scheme

        t = self._table()
        io, md, current = t.io, t.metadata, t.schema
        from ..iceberg.types import contains_variant as _has_var

        bad = [f.name for f in current.fields if _has_var(f.field_type)]
        if bad:
            raise ValueError(
                f"streaming source cannot read variant column(s) {bad}: "
                "the executor kernel reads parquet via pyarrow, which "
                "rejects the variant logical type — use the batch scan "
                "(Spark-native variant) or deselect by evolving a view "
                "without the variant column"
            )
        arrow_schema = to_arrow_schema(current.to_spark())
        lineage = self._main_lineage(md)
        lo = self._anchor(md, start, lineage)
        hi = self._anchor(md, end, lineage)

        def snap_state(snap):
            """(live data entries by path, delete-file state, has_eq)
            at snap. NOTE: catch-up planning walks this per snapshot in
            the batch range — O(snapshots × manifests); bound long
            catch-ups with max-snapshots-per-trigger."""
            data: dict[str, object] = {}
            pos_files: list = []  # (path, seq)
            dvs: dict[str, tuple] = {}  # referenced path -> (puffin, off, len)
            has_eq = False
            eq_added = None  # an eq-delete file ADDED by this snapshot
            if snap is None:
                return data, pos_files, dvs, has_eq, eq_added
            for m in read_manifest_list(io.read(snap.manifest_list)):
                entries = fetch_entries(
                    m, io.read(m.manifest_path), discard_deleted=True
                )
                if m.content == ManifestContent.DELETES:
                    for e in entries:
                        f = e.data_file
                        if f.content == DataFileContent.EQUALITY_DELETES:
                            has_eq = True
                            if (
                                e.status == ManifestEntryStatus.ADDED
                                and e.snapshot_id == snap.snapshot_id
                            ):
                                eq_added = f.file_path
                            continue
                        if f.is_deletion_vector:
                            dvs[strip_file_scheme(f.referenced_data_file or "")] = (
                                f.file_path,
                                f.content_offset,
                                # defend like _dv_positions_df: a foreign
                                # writer may omit the size (r7 review 2)
                                int(f.content_size_in_bytes or 0),
                            )
                        else:
                            pos_files.append(
                                (f.file_path, e.sequence_number or 0)
                            )
                else:
                    for e in entries:
                        data[strip_file_scheme(e.data_file.file_path)] = e
            return data, pos_files, dvs, has_eq, eq_added

        parts: list[_CdcPartition] = []
        # parent of the FIRST emitted snapshot; state rolls forward
        parent = None
        if lo < hi and lineage[lo].parent_snapshot_id:
            parent = md.snapshot_by_id(lineage[lo].parent_snapshot_id)
            if parent is None:
                # the parent was EXPIRED: with an empty prior state the
                # first retained snapshot's replacement DVs would emit
                # their FULL bitmaps as "newly deleted" and pre-history
                # inserts never emitted — refuse like _anchor does for
                # an expired checkpoint anchor (r7 review 2)
                raise ValueError(
                    f"snapshot {lineage[lo].snapshot_id}'s parent "
                    f"{lineage[lo].parent_snapshot_id} was expired; the "
                    "CDC stream cannot reconstruct the prior delete "
                    "state — start from a later offset or use the batch "
                    "changelog over the retained range"
                )
        prev_data, prev_pos, prev_dvs, prev_eq, _ = snap_state(parent)
        if prev_eq and not self.skip_eq:
            # live equality deletes predating this batch are not part of
            # the per-file prior-state subtraction (materializing them
            # needs cross-file key joins), so a later DV covering an
            # already-eq-deleted row would re-emit its delete — refuse
            # rather than mis-report (r7 review wave 2)
            raise ValueError(
                "the table carries live equality-delete files from "
                "before this batch's range; the CDC stream cannot "
                "subtract key deletes from later row deletes — run "
                "maintenance.rewrite_equality_deletes first or use "
                "the batch changelog"
            )
        for snap in lineage[lo:hi]:
            op = (snap.summary or {}).get("operation")
            cur_data, cur_pos, cur_dvs, _cur_eq, eq_added = snap_state(snap)
            if op == "replace":
                prev_data, prev_pos, prev_dvs = cur_data, cur_pos, cur_dvs
                continue

            def cmap_for(sid):
                fs = (md.schema_by_id(sid) if sid is not None else None) or current
                cm = column_map_for(fs, current)
                return cm or tuple((f.name, f.name, None) for f in current.fields)

            # -- inserts: data files added by this snapshot ------------
            for path, e in cur_data.items():
                if path in prev_data or e.snapshot_id != snap.snapshot_id:
                    continue
                if e.data_file.file_format != "PARQUET":
                    raise ValueError(
                        f"CDC stream supports parquet data files only; "
                        f"{e.data_file.file_path} is {e.data_file.file_format}"
                    )
                esnap = md.snapshot_by_id(e.snapshot_id)
                parts.append(
                    _CdcPartition(
                        "insert",
                        path,
                        snap.snapshot_id,
                        cmap_for(esnap.schema_id if esnap else None),
                        arrow_schema,
                    )
                )

            # -- new delete files this snapshot -------------------------
            prev_pos_set = {p for p, _ in prev_pos}
            new_pos = [p for p, _ in cur_pos if p not in prev_pos_set]
            new_dv_by_file = {
                f: coords
                for f, coords in cur_dvs.items()
                if prev_dvs.get(f) != coords
            }
            # eq deletes: refuse additions loudly (detected during the
            # snap_state walk — no second manifest pass, r7 review 2)
            if eq_added is not None and not self.skip_eq:
                raise ValueError(
                    f"snapshot {snap.snapshot_id} adds equality-delete "
                    f"file {eq_added}: the CDC stream cannot materialize "
                    "key deletes per-partition — run "
                    "maintenance.rewrite_equality_deletes first (DVs "
                    "stream fine) or use the batch changelog"
                )

            # targets of new deletes that still exist (MOR)
            affected: dict[str, dict] = {}
            for f, coords in new_dv_by_file.items():
                affected.setdefault(f, {"dvs": [], "pos": []})["dvs"].append(coords)
            if new_pos:
                # a positional-delete file can reference many data files;
                # every pre-existing live file is a candidate — the
                # executor kernel's file_path pushdown makes non-matches
                # O(footer). Restrict to files live at the PARENT (a
                # file added and deleted within one snapshot is not
                # representable by the write paths here).
                for f in prev_data:
                    if f in cur_data:
                        affected.setdefault(f, {"dvs": [], "pos": []})[
                            "pos"
                        ].extend(new_pos)
            for f, nd in affected.items():
                e = prev_data.get(f) or cur_data.get(f)
                if e is None:
                    continue
                if e.data_file.file_format != "PARQUET":
                    raise ValueError(
                        f"CDC stream supports parquet data files only; "
                        f"{e.data_file.file_path} is {e.data_file.file_format}"
                    )
                data_seq = e.sequence_number or 0
                prior_pos = [p for p, s in prev_pos if s >= data_seq]
                prior_dv = [prev_dvs[f]] if f in prev_dvs else []
                esnap = md.snapshot_by_id(e.snapshot_id)
                parts.append(
                    _CdcPartition(
                        "delete_rows",
                        f,
                        snap.snapshot_id,
                        cmap_for(esnap.schema_id if esnap else None),
                        arrow_schema,
                        new_pos_paths=nd["pos"],
                        new_dvs=nd["dvs"],
                        prior_pos_paths=prior_pos,
                        prior_dvs=prior_dv,
                    )
                )

            # -- copy-on-write: data files REMOVED by this snapshot -----
            for path, e in prev_data.items():
                if path in cur_data:
                    continue
                if e.data_file.file_format != "PARQUET":
                    raise ValueError(
                        f"CDC stream supports parquet data files only; "
                        f"{e.data_file.file_path} is {e.data_file.file_format}"
                    )
                data_seq = e.sequence_number or 0
                prior_pos = [p for p, s in prev_pos if s >= data_seq]
                prior_dv = [prev_dvs[path]] if path in prev_dvs else []
                esnap = md.snapshot_by_id(e.snapshot_id)
                parts.append(
                    _CdcPartition(
                        "delete_file",
                        path,
                        snap.snapshot_id,
                        cmap_for(esnap.schema_id if esnap else None),
                        arrow_schema,
                        prior_pos_paths=prior_pos,
                        prior_dvs=prior_dv,
                    )
                )

            prev_data, prev_pos, prev_dvs = cur_data, cur_pos, cur_dvs

        return parts or [_CdcPartition("empty")]

    def read(self, partition: _CdcPartition):
        return _read_cdc_partition(partition)


def _read_cdc_partition(partition: _CdcPartition):
    """Executor-side CDC partition kernel — shared by the streaming
    reader and the batch `icegopher_changes` DataSource face."""
    if partition.kind == "empty":
        return iter([])
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..iceberg.dsv2 import project_batches
    from ..iceberg.table import strip_file_scheme

    if partition.kind == "insert":
        tbl = pq.read_table(strip_file_scheme(partition.path))
        change = "insert"
    else:
        # positions first: a candidate file the new delete files
        # don't actually touch costs only delete-metadata reads,
        # never a data-file scan
        prior = _positions_for(
            partition.path, partition.prior_pos_paths, partition.prior_dvs
        )
        if partition.kind == "delete_file":
            keep = None  # resolved against num_rows below
        else:  # delete_rows: newly-deleted positions
            new = _positions_for(
                partition.path, partition.new_pos_paths, partition.new_dvs
            )
            keep = np.setdiff1d(new, prior)
            if keep.size == 0:
                return iter([])
        tbl = pq.read_table(strip_file_scheme(partition.path))
        if keep is None:
            # still-live rows of a CoW-removed file
            keep = np.setdiff1d(np.arange(tbl.num_rows, dtype="int64"), prior)
            if keep.size == 0:
                return iter([])
        tbl = tbl.take(pa.array(keep))
        change = "delete"

    batches = project_batches(
        tbl.to_batches(), partition.column_map, partition.arrow_schema
    )
    sid = partition.snapshot_id

    def tagged():
        for b in batches:
            n = b.num_rows
            arrays = list(b.columns) + [
                pa.array([change] * n, pa.string()),
                pa.array(np.full(n, sid, dtype="int64")),
            ]
            names = list(b.schema.names) + [CHANGE_TYPE, COMMIT_SNAPSHOT]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return tagged()


class IcebergCdcStreamSource(DataSource):
    """Usage:

        spark.dataSource.register(IcebergCdcStreamSource)
        df = (spark.readStream.format("icegopher_cdc")
              .option("location", table_location).load())
    """

    @classmethod
    def name(cls) -> str:
        return "icegopher_cdc"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from ..iceberg.table import Table

        base = Table.from_location(self.options["location"]).schema.to_spark()
        return StructType(
            list(base.fields)
            + [
                StructField(CHANGE_TYPE, StringType()),
                StructField(COMMIT_SNAPSHOT, LongType()),
            ]
        )

    def streamReader(self, schema):
        return _CdcStreamReader(self.options)


from pyspark.sql.datasource import DataSourceReader


class _ChangesBatchReader(DataSourceReader):
    """Batch twin: a fixed snapshot range planned by the SAME CDC
    planner, read by the SAME partition kernel."""

    def __init__(self, options):
        self.options = options

    def partitions(self):
        from ..iceberg.table import Table

        r = _CdcStreamReader(self.options)
        t = Table.from_location(self.options["location"])
        lineage = r._main_lineage(t.metadata)
        if not lineage:
            return [_CdcPartition("empty")]
        from_id = int(self.options.get("from-snapshot-id", "0"))
        to_raw = self.options.get("to-snapshot-id")
        to_id = int(to_raw) if to_raw else lineage[-1].snapshot_id
        # offsets anchor by snapshot ID (same rule as the stream):
        # from is EXCLUSIVE (0 = table origin), to is INCLUSIVE and
        # must be on the main lineage — _anchor raises otherwise
        start = {"idx": 0, "last_id": from_id}
        end = {"idx": 0, "last_id": to_id}
        r._anchor(t.metadata, end, lineage)  # validate before planning
        return r.partitions(start, end)

    def read(self, partition: _CdcPartition):
        return _read_cdc_partition(partition)


class IcebergChangesDataSource(DataSource):
    """Batch CDC face (the SQL-friendly twin of changelog.changelog_df
    and of the icegopher_cdc stream):

        spark.dataSource.register(IcebergChangesDataSource)
        df = (spark.read.format("icegopher_changes")
              .option("location", loc)
              .option("from-snapshot-id", str(s0))   # exclusive; 0 = origin
              .option("to-snapshot-id", str(s2))     # inclusive; default head
              .load())

    Emits the same rows + _change_type/_commit_snapshot_id columns with
    the same refusal rules (equality deletes, expired parents). Unlike
    changelog_df there is no carryover netting — copy-on-write
    carryovers appear as delete+insert pairs."""

    @classmethod
    def name(cls) -> str:
        return "icegopher_changes"

    def schema(self):
        return IcebergCdcStreamSource.schema(self)

    def reader(self, schema):
        return _ChangesBatchReader(self.options)
