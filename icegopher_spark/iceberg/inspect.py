"""Metadata tables as DataFrames: files / snapshots / manifests / refs /
history / partitions — the engine-side equivalent of the reference CLI's
`files --history` tree rendering (cmd/icegopher/output.go:108-158) and
of Iceberg's `SELECT * FROM tbl.files` metadata tables.

Small driver-side lists → createDataFrame; at 100k+ manifests the same
rows could be parallelized, but metadata volumes are driver-sized by
construction (one row per file/manifest, not per data row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class InspectTables:
    def __init__(self, table) -> None:
        self.table = table

    def snapshots(self, spark: SparkSession) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("parent_id", T.LongType()),
                T.StructField("sequence_number", T.LongType()),
                T.StructField("timestamp_ms", T.LongType()),
                T.StructField("operation", T.StringType()),
                T.StructField("manifest_list", T.StringType()),
                T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
            ]
        )
        rows = [
            (
                s.snapshot_id,
                s.parent_snapshot_id,
                s.sequence_number,
                s.timestamp_ms,
                s.operation,
                s.manifest_list,
                s.summary,
            )
            for s in self.table.metadata.snapshots
        ]
        return spark.createDataFrame(rows, schema)

    def refs(self, spark: SparkSession) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("max_reference_age_ms", T.LongType()),
                T.StructField("min_snapshots_to_keep", T.IntegerType()),
                T.StructField("max_snapshot_age_ms", T.LongType()),
            ]
        )
        rows = [
            (
                name,
                r.snapshot_ref_type,
                r.snapshot_id,
                r.max_ref_age_ms,
                r.min_snapshots_to_keep,
                r.max_snapshot_age_ms,
            )
            for name, r in self.table.metadata.refs.items()
        ]
        return spark.createDataFrame(rows, schema)

    def history(self, spark: SparkSession) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField("made_current_at_ms", T.LongType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("is_current_ancestor", T.BooleanType()),
            ]
        )
        ancestors = set()
        cur = self.table.metadata.current_snapshot
        while cur is not None:
            ancestors.add(cur.snapshot_id)
            cur = (
                self.table.metadata.snapshot_by_id(cur.parent_snapshot_id)
                if cur.parent_snapshot_id
                else None
            )
        rows = [
            (e["timestamp-ms"], e["snapshot-id"], e["snapshot-id"] in ancestors)
            for e in self.table.metadata.snapshot_log
        ]
        return spark.createDataFrame(rows, schema)

    def manifests(self, spark: SparkSession) -> DataFrame:
        from .manifests import read_manifest_list

        schema = T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("length", T.LongType()),
                T.StructField("partition_spec_id", T.IntegerType()),
                T.StructField("content", T.IntegerType()),
                T.StructField("sequence_number", T.LongType()),
                T.StructField("min_sequence_number", T.LongType()),
                T.StructField("added_snapshot_id", T.LongType()),
                T.StructField("added_files_count", T.IntegerType()),
                T.StructField("existing_files_count", T.IntegerType()),
                T.StructField("deleted_files_count", T.IntegerType()),
                T.StructField("added_rows_count", T.LongType()),
                T.StructField("existing_rows_count", T.LongType()),
            ]
        )
        snap = self.table.current_snapshot()
        rows = []
        if snap is not None:
            for m in read_manifest_list(self.table.io.read(snap.manifest_list)):
                rows.append(
                    (
                        m.manifest_path,
                        m.manifest_length,
                        m.partition_spec_id,
                        int(m.content),
                        m.sequence_number,
                        m.min_sequence_number,
                        m.added_snapshot_id,
                        m.added_files_count,
                        m.existing_files_count,
                        m.deleted_files_count,
                        m.added_rows_count,
                        m.existing_rows_count,
                    )
                )
        return spark.createDataFrame(rows, schema)

    def files(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        from .manifests import fetch_entries, read_manifest_list

        schema = T.StructType(
            [
                T.StructField("content", T.IntegerType()),
                T.StructField("file_path", T.StringType()),
                T.StructField("file_format", T.StringType()),
                T.StructField("partition", T.MapType(T.StringType(), T.StringType())),
                T.StructField("record_count", T.LongType()),
                T.StructField("file_size_in_bytes", T.LongType()),
                T.StructField("sequence_number", T.LongType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("status", T.IntegerType()),
            ]
        )
        md = self.table.metadata
        # `is not None`, not truthiness: an explicit snapshot_id=0 must
        # look up (and fail on) snapshot 0, not silently answer for the
        # current snapshot (r6)
        snap = (
            md.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else md.current_snapshot
        )
        rows = []
        if snap is not None:
            for m in read_manifest_list(self.table.io.read(snap.manifest_list)):
                for e in fetch_entries(m, self.table.io.read(m.manifest_path), True):
                    df = e.data_file
                    rows.append(
                        (
                            int(df.content),
                            df.file_path,
                            df.file_format,
                            {k: str(v) for k, v in df.partition.items()},
                            df.record_count,
                            df.file_size_in_bytes,
                            e.sequence_number,
                            e.snapshot_id,
                            int(e.status),
                        )
                    )
        return spark.createDataFrame(rows, schema)

    def partitions(self, spark: SparkSession) -> DataFrame:
        """Aggregate files by partition tuple."""
        from pyspark.sql import functions as F

        files = self.files(spark)
        return (
            files.groupBy("partition")
            .agg(
                F.count(F.lit(1)).alias("file_count"),
                F.sum("record_count").alias("record_count"),
                F.sum("file_size_in_bytes").alias("total_size_bytes"),
            )
        )

    def metadata_log(self, spark: SparkSession) -> DataFrame:
        """metadata_log_entries metadata table: the table's metadata-file
        lineage (one row per superseded metadata JSON + the current)."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("timestamp_ms", T.LongType()),
                T.StructField("metadata_file", T.StringType()),
            ]
        )
        md = self.table.metadata
        rows = [
            (int(e.get("timestamp-ms", 0)), e.get("metadata-file", ""))
            for e in md.metadata_log
        ] + [(md.last_updated_ms, self.table.metadata_location)]
        return spark.createDataFrame(rows, schema)

    def changes(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
        net: bool = True,
    ) -> DataFrame:
        """CDC changes metadata table: row-level inserts/deletes between
        snapshots (see changelog.changelog_df)."""
        from .changelog import changelog_df

        return changelog_df(self.table, spark, from_snapshot_id, to_snapshot_id, net)
