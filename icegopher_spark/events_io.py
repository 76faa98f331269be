"""Schema-adaptive loader for the events table (batch + streaming).

The synthetic events.parquet has stored its `ts` column two different
ways across driver builds:

  * TIMESTAMP(NANOS) — Spark's vectorized reader rejects nanos, so the
    file is read with ``spark.sql.legacy.parquet.nanosAsLong`` and the
    int64 nanos truncated to microseconds (integer division: ns values
    ~1.7e18 overflow double precision, so no float math). Spark's
    ``div`` truncates toward zero, which is exactly DuckDB's ns→µs
    behavior (verified empirically: -1500 ns → -1 µs in both).
  * plain ``timestamp[us]`` (TIMESTAMP_NTZ to Spark) — read as-is and
    cast to TimestampType. The session time zone is pinned to UTC
    (session.py), so the cast is value-identical to DuckDB's naive
    reading of the same file.

Both loaders below inspect the parquet footer (driver-side, no Spark
job) and branch on the ACTUAL stored type instead of hard-coding a
layout — hard-coding is what regressed seven gate queries in round 2
when the driver regenerated the data with a new ts type.

Everything downstream sees ``ts`` as TimestampType regardless of the
file layout, so window/session/watermark/as-of logic is layout-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _first_parquet_file(path: str) -> str:
    if os.path.isdir(path):
        # recurse: a partitioned dataset (key=.../part-0.parquet) has no
        # top-level *.parquet, and returning the DIRECTORY crashed the
        # footer probe on a dataset Spark itself reads fine (r6)
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for entry in sorted(files):
                if entry.endswith(".parquet") and not entry.startswith("_"):
                    return os.path.join(root, entry)
        # falling through to the directory itself would crash the
        # footer probe with an unrelated ArrowInvalid far from here
        raise FileNotFoundError(f"no parquet files under {path}")
    return path


def events_ts_unit(path: str) -> str:
    """Classify the stored ts type: 'ns' (TIMESTAMP(NANOS)), 'us'
    (Spark-readable timestamp), or 'long' (raw int64 epoch nanos).

    Probes the parquet PHYSICAL type, not the arrow-level type: Spark's
    default parquet writer stores timestamps as INT96, which pyarrow
    surfaces as timestamp[ns] — indistinguishable at the arrow level
    from the TIMESTAMP(NANOS) layout that needs the nanos-as-long
    workaround, yet Spark reads INT96 natively as TimestampType."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = _first_parquet_file(path)
    ps = pq.ParquetFile(f).schema
    for i in range(len(ps)):
        col = ps.column(i)
        if col.name != "ts":
            continue
        if col.physical_type == "INT96":
            return "us"  # legacy Spark layout, read natively
        lt = str(col.logical_type or "")
        if lt.startswith("Timestamp"):
            return "ns" if "nano" in lt.lower() else "us"
        break
    t = pq.read_schema(f).field("ts").type
    if pa.types.is_timestamp(t):
        return "ns" if t.unit == "ns" else "us"
    return "long"


def _enable_nanos_as_long(spark: SparkSession) -> None:
    """Session-global by necessity: the vectorized reader consults the
    conf at EXECUTION time, so it can't be scoped to this one (lazy)
    read. Other nano-timestamp parquet reads in the session will also
    see int64 — acceptable here because events is the only nanos table.
    A failed set with the conf still off would crash the later read far
    from the cause, so raise the clear error now instead of swallowing."""
    conf = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        spark.conf.set(conf, "true")
    except Exception as exc:  # noqa: BLE001 — static conf in some deployments
        if (spark.conf.get(conf, "false") or "").lower() != "true":
            raise RuntimeError(
                f"events file stores TIMESTAMP(NANOS) but {conf} could not "
                "be enabled on this session; set it at session start"
            ) from exc


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the events table with `ts` normalized to
    TimestampType (UTC session) whatever the file's physical layout."""
    unit = events_ts_unit(path)
    if unit in ("ns", "long"):
        if unit == "ns":
            _enable_nanos_as_long(spark)
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def events_stream_schema(path: str) -> tuple[T.StructType, bool]:
    """(schema for readStream, needs_ns_division). The file source
    requires a user schema; build it to match the file's actual ts
    layout instead of pinning one."""
    unit = events_ts_unit(path)
    ts_type: T.DataType = T.LongType() if unit in ("ns", "long") else T.TimestampType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", ts_type),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return schema, unit in ("ns", "long")
