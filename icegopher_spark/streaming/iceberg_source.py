"""Iceberg table as a Structured Streaming SOURCE via Spark 4's Python
DataSource API: `spark.readStream.format("icegopher_appends")` tails a
table's snapshot log, emitting the rows each new snapshot appends.

Completes the streaming story (write side: streaming/iceberg_sink.py;
batch incremental: TableScan.plan_incremental_files): a downstream
pipeline can now subscribe to a table the way it would to Kafka.
Reference parity: the reference models the snapshot lineage this
source walks (table/snapshots.go) but has no read path at all.

Semantics
  * Offsets are indices into the MAIN-branch ancestry (parent-id chain
    of the current snapshot, root → current), so replay between two
    offsets is deterministic AND branch-staged commits (write-audit-
    publish) are invisible until actually published to main — walking
    the raw snapshot list would emit audit-branch rows that logically
    never existed on the table (r6 review). A staged snapshot enters
    the lineage at its publish position, so nothing is skipped either.
  * Each micro-batch plans the ADDED data files of the new snapshots;
    `replace` snapshots (compaction) are skipped, matching the CDC
    surface (changelog.py).
  * Append-only contract, ENFORCED: overwrite/delete snapshots (and
    any added delete file) raise in planning — their removed rows
    cannot be retracted through a row-emitting source. Options
    `skip-overwrite-snapshots` / `skip-delete-snapshots` opt into
    skipping such snapshots wholesale (mirrors upstream Iceberg's
    streaming-skip-*-snapshots); tables needing real retraction use
    the batch changelog instead.

Scale posture
  * Planning (offsets -> file list) is driver-side and O(new
    manifests), the same cost profile as batch scan planning.
  * Row reads run on EXECUTORS: `read(partition)` yields Arrow record
    batches straight from the parquet file — one InputPartition per
    data file, so a 1000-executor cluster fans out exactly like the
    batch scan path, and nothing row-shaped ever crosses the driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str, column_map=None, arrow_schema=None):
        self.path = path
        self.column_map = column_map
        self.arrow_schema = arrow_schema


class _AppendStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.location = options["location"]
        # admission control: cap snapshots per micro-batch so a stream
        # catching up on a long-lived table takes bounded batches
        # instead of one giant one (0 = unbounded)
        self.max_per_trigger = int(options.get("max-snapshots-per-trigger", "0"))
        # append-only contract ENFORCEMENT (round-5, ADVICE): a snapshot
        # that removes rows (overwrite/delete) or adds MOR delete files
        # cannot be represented by a row-emitting source — refuse by
        # default (upstream Iceberg's SparkMicroBatchStream behavior),
        # or skip the whole snapshot when the matching option is set
        # (mirrors streaming-skip-overwrite/delete-snapshots).
        self.skip_overwrite = options.get("skip-overwrite-snapshots", "false").lower() == "true"
        self.skip_delete = options.get("skip-delete-snapshots", "false").lower() == "true"
        # anchor a FRESH checkpoint after a specific snapshot (exclusive)
        # instead of replaying the full history — the CDC bootstrap
        # pattern (batch-read table state at the anchor, stream changes
        # after it) and the sanctioned way past poison history such as
        # pre-migration equality-delete snapshots (mirrors upstream
        # Iceberg's stream-from-timestamp). An anchor not on the main
        # lineage fails loudly at the first batch (_anchor).
        self.start_after = int(options.get("starting-snapshot-id", "0"))
        self._last_served: dict | None = None

    def _table(self):
        from ..iceberg.table import Table

        return Table.from_location(self.location)

    def initialOffset(self) -> dict:
        # idx is advisory; _anchor re-resolves by snapshot ID so the
        # offset stays correct across expire_snapshots
        return {"idx": 0, "last_id": self.start_after}

    @staticmethod
    def _main_lineage(md) -> list:
        """Snapshots on MAIN's ancestry, root → current. Branch-staged
        (WAP) snapshots live in md.snapshots but not in this chain
        until published, so the stream never emits unpublished rows."""
        out = []
        cur = md.current_snapshot
        while cur is not None:
            out.append(cur)
            cur = (
                md.snapshot_by_id(cur.parent_snapshot_id)
                if cur.parent_snapshot_id is not None
                else None
            )
        out.reverse()
        return out

    def latestOffset(self) -> dict:
        md = self._table().metadata
        snaps = self._main_lineage(md)
        hi = len(snaps)
        if self.max_per_trigger > 0 and self._last_served is not None:
            # advance at most N snapshots past the last offset served.
            # Only after the first batch of this run: a fresh reader
            # doesn't know the checkpointed position, and a capped
            # latest that fell BEHIND the checkpoint would stall the
            # stream — so restart catch-up is one uncapped batch, then
            # steady-state batches are bounded.
            base = self._anchor(md, self._last_served, snaps)
            hi = min(hi, base + self.max_per_trigger)
        off = {
            "idx": hi,
            "last_id": snaps[hi - 1].snapshot_id if hi > 0 else 0,
        }
        self._last_served = off
        return off

    @classmethod
    def _anchor(cls, md, off: dict, lineage: list | None = None) -> int:
        """Resolve an offset to a position in the CURRENT main lineage.
        Offsets carry the last consumed snapshot ID because
        expire_snapshots shifts positions — anchoring by ID keeps a
        checkpointed stream correct across table maintenance. An anchor
        no longer on the lineage raises: either it was expired (the
        snapshots between checkpoint and now are gone — continuing
        would silently skip their rows) or main was rolled back past it
        (history rewritten under the stream)."""
        if not off.get("last_id"):
            return 0
        if lineage is None:
            lineage = cls._main_lineage(md)
        for i, s in enumerate(lineage):
            if s.snapshot_id == off["last_id"]:
                return i + 1
        raise ValueError(
            f"stream offset anchor snapshot {off['last_id']} is no longer "
            "on the table's main history (expired or rolled back); "
            "restart the stream from scratch"
        )

    def partitions(self, start: dict, end: dict):
        from ..iceberg.manifests import (
            DataFileContent,
            ManifestEntryStatus,
            fetch_entries,
            read_manifest_list,
        )

        from pyspark.sql.pandas.types import to_arrow_schema

        from ..iceberg.dsv2 import column_map_for

        t = self._table()
        io = t.io
        md = t.metadata
        current = t.schema
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
        parts: list[_FilePartition] = []
        for snap in lineage[lo:hi]:
            op = (snap.summary or {}).get("operation")
            if op == "replace":
                continue  # byte movement, not new rows
            if op in ("overwrite", "delete"):
                if (op == "overwrite" and self.skip_overwrite) or (
                    op == "delete" and self.skip_delete
                ):
                    continue  # user opted out of this snapshot entirely
                raise ValueError(
                    f"snapshot {snap.snapshot_id} is a {op!r} commit: its removed "
                    "rows cannot be retracted through an append stream. Use the "
                    "batch changelog for CDC, or set option "
                    f"'skip-{op}-snapshots'='true' to skip such snapshots"
                )
            # files written before a schema change project by field ID
            # (rename-safe, added columns null-filled) — same contract
            # as the batch faces
            file_schema = (
                md.schema_by_id(snap.schema_id) if snap.schema_id is not None else None
            ) or current
            cmap = column_map_for(file_schema, current)
            # always run the projection/cast step (identity map when the
            # file schema IS current) so emitted Arrow types match the
            # declared schema exactly — absorbs e.g. INT96 timestamps
            # decoding as Timestamp(NANOS); zero-copy on agreement
            if cmap is None:
                cmap = tuple((f.name, f.name, None) for f in current.fields)
            for m in read_manifest_list(io.read(snap.manifest_list)):
                # the sink carries prior manifests forward, so snapshot
                # k's list holds ~k manifests; only the ones THIS
                # snapshot added can contain ADDED entries for it —
                # without this filter catch-up decodes O(snapshots²)
                # manifests (r6 review)
                if m.added_snapshot_id != snap.snapshot_id:
                    continue
                for e in fetch_entries(m, io.read(m.manifest_path), discard_deleted=True):
                    if e.status != ManifestEntryStatus.ADDED or e.snapshot_id != snap.snapshot_id:
                        continue
                    if e.data_file.content != DataFileContent.DATA:
                        # spec-violating writer: delete files under a
                        # non-overwrite/delete operation — never emit
                        # rows that are logically deleted
                        raise ValueError(
                            f"snapshot {snap.snapshot_id} adds delete file "
                            f"{e.data_file.file_path}; append stream cannot "
                            "apply deletes — use the batch changelog"
                        )
                    parts.append(
                        _FilePartition(
                            e.data_file.file_path,
                            cmap,
                            arrow_schema if cmap is not None else None,
                        )
                    )
        # Spark requires >= 1 partition per batch; an empty batch reads
        # a sentinel partition that yields nothing
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter([])
        import pyarrow.parquet as pq

        from ..iceberg.dsv2 import project_batches
        from ..iceberg.table import strip_file_scheme

        batches = pq.ParquetFile(strip_file_scheme(partition.path)).iter_batches()
        if partition.column_map is None:
            return batches
        return project_batches(batches, partition.column_map, partition.arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # offsets derive from the table's own snapshot log


class IcebergAppendStreamSource(DataSource):
    """Usage:

        spark.dataSource.register(IcebergAppendStreamSource)
        df = (spark.readStream.format("icegopher_appends")
              .option("location", table_location).load())
    """

    @classmethod
    def name(cls) -> str:
        return "icegopher_appends"

    def schema(self):
        from ..iceberg.table import Table

        return Table.from_location(self.options["location"]).schema.to_spark()

    def streamReader(self, schema):
        return _AppendStreamReader(self.options)
