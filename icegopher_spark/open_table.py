"""Format sniffer: open any table directory — Iceberg, Delta, or plain
parquet — through one entry point.

A mixed 100 TB estate is never single-format; pipeline code that needs
a DataFrame should not have to care which committee won in each corner
of the lake. Detection is structural (which metadata plane exists),
never content-guessing:

  * ``metadata/*.metadata.json`` (or ``version-hint.text``) → Iceberg,
    full scan path (manifest pruning, deletes, time travel upstream
    via the returned handle)
  * ``_delta_log/`` → Delta, log replay via `delta.read_delta`
  * otherwise, if the path contains parquet → plain parquet dir
    (hive partition discovery is Spark's)

Ambiguity (both planes present) is an ERROR, not a preference — a
directory carrying two transaction logs has diverged and picking one
silently would read half the truth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["detect_format", "open_table"]


def detect_format(path: str) -> str:
    """'iceberg' | 'delta' | 'parquet' (raises on ambiguity/unknown)."""
    has_iceberg = os.path.isdir(os.path.join(path, "metadata")) and any(
        fn.endswith(".metadata.json") or fn == "version-hint.text"
        for fn in os.listdir(os.path.join(path, "metadata"))
    )
    has_delta = os.path.isdir(os.path.join(path, "_delta_log"))
    if has_iceberg and has_delta:
        raise ValueError(
            f"{path} carries BOTH an Iceberg metadata/ plane and a "
            "_delta_log/ — refusing to guess which is authoritative"
        )
    if has_iceberg:
        return "iceberg"
    if has_delta:
        return "delta"
    if os.path.isdir(path):
        for dirpath, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return "parquet"
    raise ValueError(f"{path}: no Iceberg/Delta metadata and no parquet files")


def open_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Read ``path`` as a DataFrame regardless of format. ``version`` /
    ``timestamp_ms`` time-travel where the format supports it (Iceberg:
    version = snapshot id; Delta: log version); plain parquet rejects
    them loudly instead of ignoring them."""
    fmt = detect_format(path)
    if fmt == "iceberg":
        from .iceberg.table import Table

        t = Table.from_location(path)
        kwargs = {}
        if version is not None:
            kwargs["snapshot_id"] = version
        if timestamp_ms is not None:
            snap = t.metadata.snapshot_as_of(timestamp_ms)
            if snap is None:
                raise ValueError(f"no snapshot at or before {timestamp_ms}")
            kwargs["snapshot_id"] = snap.snapshot_id
        return t.scan(**kwargs).to_df(spark)
    if fmt == "delta":
        from .delta import read_delta

        return read_delta(spark, path, version=version, timestamp_ms=timestamp_ms)
    if version is not None or timestamp_ms is not None:
        raise ValueError("plain parquet directories have no version history")
    return spark.read.parquet(path)
