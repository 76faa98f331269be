"""Delta table as a Structured Streaming SOURCE: tail the transaction
log, emitting the snapshot at stream start and then each commit's
added rows — the Delta analogue of `iceberg_source.py` (and of
delta-spark's own streaming source semantics).

Semantics
  * Offsets are log versions: ``{"version": v}`` = consumed THROUGH
    commit v.  The first micro-batch is the LIVE FILE SET of the
    starting snapshot (bootstrap, like delta-spark's initial snapshot);
    every later batch is the ``add`` actions of commits
    ``(start, end]`` — per-commit attribution comes straight from the
    JSON log, no state of our own.
  * ``starting-version`` skips the bootstrap and tails adds from that
    version (inclusive) — the "changes only" subscription.
  * Append-only contract ENFORCED: a tailed commit containing
    ``remove`` actions (DELETE/UPDATE/OVERWRITE) raises —
    its retractions cannot flow through a row-emitting source.
    ``skip-change-commits`` = "true" skips such commits wholesale
    (mirrors delta-spark's skipChangeCommits). Deletion vectors and
    mid-stream schema changes refuse loudly.
  * ``max-versions-per-trigger`` bounds catch-up batch sizes
    (admission control, same pattern as the Iceberg source).

Scale posture: planning is driver-side and O(new commits) of JSON;
row reads run on executors, one InputPartition per data file with the
file's partitionValues attached as constant Arrow columns — nothing
row-shaped crosses the driver.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        pv: dict | None,
        schema_json: str | None,
        change_type: str | None = None,
        commit_version: int | None = None,
        cdc_in_file: bool = False,
    ):
        self.path = path
        self.pv = pv
        self.schema_json = schema_json
        # CDF mode: constant _change_type per file (insert/delete), or
        # cdc_in_file=True when the file itself carries _change_type
        self.change_type = change_type
        self.commit_version = commit_version
        self.cdc_in_file = cdc_in_file


def _pv_value(raw: str | None, spark_type: str):
    """Decode one partitionValues string per the protocol's Partition
    Value Serialization rules ('' == NULL for non-strings)."""
    if raw is None:
        return None
    if spark_type == "string":
        return raw
    if raw == "":
        return None
    if spark_type in ("tinyint", "smallint", "int", "bigint", "integer", "long"):
        return int(raw)
    if spark_type in ("double", "float"):
        return float(raw)
    if spark_type == "boolean":
        return raw == "true"
    if spark_type == "date":
        return datetime.date.fromisoformat(raw)
    raise NotImplementedError(
        f"Delta stream: partition type {spark_type} not supported"
    )


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.location = options["location"]
        self.max_per_trigger = int(options.get("max-versions-per-trigger", "0"))
        self.skip_change = (
            options.get("skip-change-commits", "false").lower() == "true"
        )
        self.cdf = options.get("read-change-feed", "false").lower() == "true"
        self.starting_version = options.get("starting-version")
        if self.cdf and self.starting_version is None:
            raise ValueError(
                "read-change-feed requires starting-version (a CDF stream "
                "tails commits; there is no snapshot bootstrap to fall "
                "back to)"
            )
        if self.cdf and self.skip_change:
            raise ValueError(
                "read-change-feed and skip-change-commits are mutually "
                "exclusive — CDF exists to EMIT change commits"
            )
        self._last_served: int | None = None

    # -- offsets ---------------------------------------------------------

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"version": int(self.starting_version) - 1, "bootstrap": False}
        return {"version": -1, "bootstrap": True}

    def _latest_version(self) -> int:
        from ..delta import _list_log

        commits, checkpoints = _list_log(self.location)
        return max([*commits, *checkpoints])

    def latestOffset(self) -> dict:
        hi = self._latest_version()
        if self.max_per_trigger > 0 and self._last_served is not None:
            hi = min(hi, self._last_served + self.max_per_trigger)
        self._last_served = hi
        return {"version": hi, "bootstrap": False}

    # -- planning --------------------------------------------------------

    def _snapshot(self, version: int | None = None):
        from ..delta import load_delta

        return load_delta(self.location, version=version)

    def partitions(self, start: dict, end: dict):
        snap = self._snapshot(end["version"])
        schema_json = snap.schema.json()
        parts: list[_DeltaFilePartition] = []

        if self.cdf:
            # CDF stream: each batch is read_changes over (start, end] —
            # same shared classifier, same per-commit attribution
            from ..delta import _classify_changes

            lo = start["version"] + 1
            if lo > end["version"]:
                return [_DeltaFilePartition("", None, None)]
            plain, cdc = _classify_changes(
                self.location, snap, lo, end["version"]
            )
            for (v, kind), group in sorted(plain.items()):
                for p, pv in group:
                    parts.append(
                        _DeltaFilePartition(
                            p, pv, schema_json, change_type=kind, commit_version=v
                        )
                    )
            for v, group in sorted(cdc.items()):
                for p, pv in group:
                    parts.append(
                        _DeltaFilePartition(
                            p, pv, schema_json, commit_version=v, cdc_in_file=True
                        )
                    )
            return parts or [_DeltaFilePartition("", None, None)]

        # the explicit flag decides: starting-version=0 encodes as
        # {version: -1, bootstrap: False} and must TAIL from commit 0,
        # not bootstrap (version<0 is only the fallback for offsets
        # checkpointed without the flag)
        if start.get("bootstrap", start["version"] < 0):
            # first batch: the whole live set at `end` (initial snapshot)
            for p, pv in snap.files:
                parts.append(_DeltaFilePartition(p, pv, schema_json))
            return parts or [_DeltaFilePartition("", None, None)]

        base_schema = self._snapshot(start["version"]).schema.json() if (
            start["version"] >= 0
        ) else schema_json
        if base_schema != schema_json:
            raise ValueError(
                "Delta stream: table schema changed between offsets "
                f"{start['version']} and {end['version']}; restart the "
                "stream to pick up the new schema"
            )

        log_dir = os.path.join(self.location, "_delta_log")
        for v in range(start["version"] + 1, end["version"] + 1):
            cpath = os.path.join(log_dir, f"{v:020d}.json")
            if not os.path.exists(cpath):
                raise FileNotFoundError(
                    f"Delta stream: commit {v} missing (vacuumed log?) — "
                    "cannot attribute adds per version; restart the stream"
                )
            adds, removes = [], 0
            with open(cpath, encoding="utf-8") as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if a.get("remove"):
                        removes += 1
                    add = a.get("add")
                    if add:
                        if add.get("deletionVector"):
                            raise NotImplementedError(
                                f"Delta stream: commit {v} adds a deletion "
                                "vector; not supported"
                            )
                        adds.append(add)
                    if a.get("metaData") is not None:
                        ms = a["metaData"].get("schemaString")
                        if ms and json.loads(ms) != json.loads(schema_json):
                            raise ValueError(
                                f"Delta stream: commit {v} changes the table "
                                "schema mid-stream; restart the stream"
                            )
            if removes:
                if self.skip_change:
                    continue  # user opted out of change commits entirely
                raise ValueError(
                    f"Delta stream: commit {v} removes files (DELETE/UPDATE/"
                    "OVERWRITE); an append stream cannot retract rows. Set "
                    "option 'skip-change-commits'='true' to skip such "
                    "commits, or consume the table in batch"
                )
            for add in adds:
                parts.append(
                    _DeltaFilePartition(
                        os.path.join(self.location, add["path"]),
                        add.get("partitionValues") or {},
                        schema_json,
                    )
                )
        return parts or [_DeltaFilePartition("", None, None)]

    # -- executor read ----------------------------------------------------

    def read(self, partition: _DeltaFilePartition):
        if not partition.path:
            return iter([])
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        schema = StructType.fromJson(json.loads(partition.schema_json))
        cdf = partition.commit_version is not None
        out_schema = schema
        if cdf:
            out_schema = StructType(
                [
                    *schema.fields,
                    StructField("_change_type", StringType(), True),
                    StructField("_commit_version", LongType(), True),
                ]
            )
        arrow_schema = to_arrow_schema(out_schema)
        pv = partition.pv or {}
        data_names = [f.name for f in schema.fields if f.name not in pv]
        if partition.cdc_in_file:
            data_names.append("_change_type")

        def gen():
            pf = pq.ParquetFile(partition.path)
            for batch in pf.iter_batches(columns=data_names):
                cols = []
                for f in out_schema.fields:
                    target = arrow_schema.field(f.name).type
                    if f.name == "_change_type" and cdf:
                        if partition.cdc_in_file:
                            cols.append(batch.column(f.name).cast(target))
                        else:
                            cols.append(
                                pa.array(
                                    [partition.change_type] * batch.num_rows
                                ).cast(target)
                            )
                    elif f.name == "_commit_version" and cdf:
                        cols.append(
                            pa.array(
                                [partition.commit_version] * batch.num_rows
                            ).cast(target)
                        )
                    elif f.name in pv:
                        val = _pv_value(pv[f.name], f.dataType.simpleString())
                        cols.append(
                            pa.array([val] * batch.num_rows).cast(target)
                        )
                    else:
                        cols.append(batch.column(f.name).cast(target))
                yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

        return gen()

    def commit(self, end: dict) -> None:
        pass  # offsets derive from the table's own log


class DeltaAppendStreamSource(DataSource):
    """Usage:

        spark.dataSource.register(DeltaAppendStreamSource)
        df = (spark.readStream.format("icegopher_delta_stream")
              .option("location", table_path).load())
    """

    @classmethod
    def name(cls) -> str:
        return "icegopher_delta_stream"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from ..delta import load_delta

        base = load_delta(self.options["location"]).schema
        if self.options.get("read-change-feed", "false").lower() == "true":
            return StructType(
                [
                    *base.fields,
                    StructField("_change_type", StringType(), True),
                    StructField("_commit_version", LongType(), True),
                ]
            )
        return base

    def streamReader(self, schema):
        return _DeltaStreamReader(self.options)
