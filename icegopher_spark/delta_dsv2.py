"""Delta table as a Spark Python DataSource (BATCH face):
``spark.dataSource.register(DeltaBatchDataSource)`` then
``spark.read.format("icegopher_delta").option("location", path)``.

Planning is the same log replay the function API uses (`delta.py`:
checkpoints, deletion vectors, column mapping); the executor kernel is
the STREAM source's `read_file_partition` — one Arrow reader, two
planners, zero drift between the faces.

Pushed-filter file pruning: with
``spark.sql.python.filterPushdown.enabled`` true, EqualTo / In /
IsNull (+their Not forms) on PARTITION columns prune files at PLAN
time against the log's partitionValues — the Delta analogue of the
Iceberg face's manifest pruning.  Every filter is reported unconsumed,
so Spark still applies them row-level and results are identical with
pruning on or off (same contract as `iceberg/dsv2.py`).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader

from .streaming.delta_source import _DeltaFilePartition, read_file_partition

__all__ = ["DeltaBatchDataSource"]


def _partition_prune(filters, part_cols: set[str], nmap: dict[str, str]):
    """Pushed Spark Filters -> a partitionValues predicate (dict of
    RAW string values -> bool), using only the filters we can evaluate
    exactly against the protocol's string serialization.  ``nmap``
    translates logical -> physical key (column mapping)."""
    tests = []
    for f in filters:
        kind = type(f).__name__
        negated = False
        if kind == "Not":
            f = f.child
            kind = type(f).__name__
            negated = True
        try:
            col = ".".join(f.attribute)
        except AttributeError:
            continue
        if col not in part_cols:
            continue
        key = nmap.get(col, col)

        def _ser(v):
            # Delta partition-value serialization, not Python str():
            # booleans are 'true'/'false' (str(True) == 'True' would
            # prune every live file — silent empty result)
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        if kind == "EqualTo":
            want = _ser(f.value)
            tests.append(
                (lambda pv, k=key, w=want: pv.get(k) == w, negated)
            )
        elif kind == "In":
            wants = {_ser(v) for v in f.value}
            tests.append(
                (lambda pv, k=key, w=wants: pv.get(k) in w, negated)
            )
        elif kind == "IsNull":
            tests.append((lambda pv, k=key: pv.get(k) is None, negated))
        elif kind == "IsNotNull":
            tests.append((lambda pv, k=key: pv.get(k) is not None, negated))

    if not tests:
        return None

    def pred(pv: dict) -> bool:
        for t, neg in tests:
            hit = t(pv)
            if neg:
                hit = not hit
            if not hit:
                return False
        return True

    return pred


def _stats_keep(filters, stats: dict | None) -> bool:
    """Data skipping: False = the file provably contains NO matching
    row.  Conservative: only numeric/bool bounds (the writer never
    emits string stats — foreign writers may truncate them) and only
    filters whose semantics are exact on min/max; anything else keeps
    the file.  Sound with deletion vectors: stats bound a SUPERSET of
    the live rows, so skipping can only be less aggressive."""
    if not stats:
        return True
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    nulls = stats.get("nullCount") or {}
    nrec = stats.get("numRecords")

    def _num(x):
        return x if isinstance(x, (int, float)) and not isinstance(x, bool) else None

    for f in filters:
        kind = type(f).__name__
        if kind == "Not":
            continue  # negations over ranges are not exact — keep
        try:
            col = ".".join(f.attribute)
        except AttributeError:
            continue
        if kind == "IsNull":
            if col in nulls and nulls[col] == 0:
                return False
            continue
        if kind == "IsNotNull":
            if col in nulls and nrec is not None and nulls[col] == nrec:
                return False
            continue
        mn, mx = _num(mins.get(col)), _num(maxs.get(col))
        if mn is None or mx is None:
            continue
        v = _num(getattr(f, "value", None))
        if v is None:
            continue
        if kind == "EqualTo" and (v < mn or v > mx):
            return False
        if kind == "GreaterThan" and mx <= v:
            return False
        if kind == "GreaterThanOrEqual" and mx < v:
            return False
        if kind == "LessThan" and mn >= v:
            return False
        if kind == "LessThanOrEqual" and mn > v:
            return False
    return True


class _DeltaBatchReader(DataSourceReader):
    """Base reader WITHOUT pushFilters (implementing it trips
    DATA_SOURCE_PUSHDOWN_DISABLED when the session conf is off — same
    split as iceberg/dsv2.py)."""

    def __init__(self, options):
        self.location = options["location"]
        self.version = options.get("version")
        self.timestamp_ms = options.get("timestamp-ms")
        self._filters = None

    def _snapshot(self):
        from .delta import load_delta

        return load_delta(
            self.location,
            version=int(self.version) if self.version is not None else None,
            timestamp_ms=(
                int(self.timestamp_ms) if self.timestamp_ms is not None else None
            ),
        )

    def partitions(self):
        from .delta import _partition_name_map
        from .delta_dv import dv_job_spec
        from .streaming.delta_source import _refuse_variant_schema

        snap = self._snapshot()
        _refuse_variant_schema(snap.schema, "icegopher_delta DataSource")
        phys_map = None
        if snap.physical_schema is not None:
            for lf, pf in zip(snap.schema.fields, snap.physical_schema.fields):
                if lf.dataType.json() != pf.dataType.json():
                    raise NotImplementedError(
                        "icegopher_delta DataSource: column mapping renames "
                        f"NESTED fields (column {lf.name!r}) — use "
                        "read_delta() (positional-CAST path) instead"
                    )
            phys_map = {
                lf.name: pf.name
                for lf, pf in zip(snap.schema.fields, snap.physical_schema.fields)
                if lf.name != pf.name
            }
        nmap = _partition_name_map(snap) or {}

        files = snap.files
        if self._filters:
            pred = _partition_prune(
                self._filters, set(snap.partition_columns), nmap
            )
            if pred is not None:
                files = [(p, pv) for p, pv in files if pred(pv)]
            # data skipping on add.stats min/max (non-partition columns)
            files = [
                (p, pv)
                for p, pv in files
                if _stats_keep(self._filters, snap.file_stats.get(p))
            ]

        # DV decode specs only — the bitmap decodes executor-side in
        # read_file_partition (driver ships coordinates, not positions)
        masks = {}
        if snap.deletion_vectors:
            kept = {p for p, _ in files}
            masks = {
                p: ("exclude", {"dv": dv_job_spec(self.location, d)})
                for p, d in snap.deletion_vectors.items()
                if p in kept
            }
        schema_json = snap.schema.json()
        inv = {v: k for k, v in (phys_map or {}).items()}
        parts = []
        for p, pv in files:
            fp = _DeltaFilePartition(p, pv, schema_json, mask=masks.get(p))
            fp.phys_map = phys_map
            if fp.pv:
                # partitionValues keyed physically under mapping — the
                # reader kernel matches schema fields by logical name
                fp.pv = {inv.get(k, k): v for k, v in fp.pv.items()}
            parts.append(fp)
        return parts or [_DeltaFilePartition("", None, None)]

    def read(self, partition: _DeltaFilePartition):
        return read_file_partition(partition)


class _DeltaPushdownBatchReader(_DeltaBatchReader):
    def pushFilters(self, filters):
        self._filters = list(filters)
        # all filters reported unconsumed: pruning only, Spark applies
        # every predicate row-level
        return filters


class DeltaBatchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "icegopher_delta"

    def schema(self):
        from .delta import load_delta

        v = self.options.get("version")
        ts = self.options.get("timestamp-ms")
        return load_delta(
            self.options["location"],
            version=int(v) if v is not None else None,
            timestamp_ms=int(ts) if ts is not None else None,
        ).schema

    def reader(self, schema):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        enabled = "false"
        if spark is not None:
            try:
                enabled = spark.conf.get(
                    "spark.sql.python.filterPushdown.enabled", "false"
                )
            except Exception:  # noqa: BLE001
                enabled = "false"
        if str(enabled).lower() == "true":
            return _DeltaPushdownBatchReader(self.options)
        return _DeltaBatchReader(self.options)
