"""Executor-side Arrow readers for formats where Spark's built-in
source can't give us what the Iceberg spec needs:

* ORC with exact row ordinals — Spark exposes `_metadata.row_index`
  for parquet only, but positional deletes (reference
  manifest.go:548-551) are defined on the file's absolute row ordinal.
  `pyarrow.orc` reads each file whole per task, so the ordinal is
  exact regardless of Spark's split planning.
* Avro data files — the `spark-avro` package isn't bundled; the same
  pure-Python OCF codec that handles manifest Avro (avro_io.py, ported
  from the reference's internal/avro_schemas.go) decodes data blocks
  executor-side.

Both run as `mapInPandas` over a one-row-per-file DataFrame: planning
stays explicit (our file list), reading is distributed and
Arrow-batched. This is the documented escape hatch of the build plan —
Pandas-UDF-backed reading only where the built-in source genuinely
can't express the semantics.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .io import strip_scheme
from .schema import Schema

_POS_FIELDS = [T.StructField("_file", T.StringType()), T.StructField("_pos", T.LongType())]


def _with_pos_schema(spark_schema: T.StructType) -> T.StructType:
    return T.StructType(_POS_FIELDS + list(spark_schema.fields))


def _coerce_batch(
    pdf: pd.DataFrame, spark_schema: T.StructType, session_tz: str = "UTC"
) -> pd.DataFrame:
    """Align pandas dtypes with the target Spark schema (timestamps from
    µs ints, dates from epoch-day ints, nullable ints).

    Stored Avro timestamptz micros are UTC instants; Spark interprets a
    NAIVE datetime64 column from mapInPandas as session-LOCAL wall time,
    so TimestampType columns convert UTC → session tz before dropping
    the tz (identity at UTC). TimestampNTZ micros are wall-clock and
    stay naive as-is."""
    import numpy as np

    def _micros_series(col):
        # exact µs-unit datetime64 from int µs, NOT pd.to_datetime
        # (which builds ns-based values: crashes past 2262, e.g. the
        # 9999-12-31 'no expiry' sentinel — r6 review; also float64
        # intermediate corrupts µs >= 2^53, i.e. any current epoch)
        mask = pd.isna(col).to_numpy()
        iv = np.where(mask, 0, col.fillna(0).to_numpy(dtype="int64"))
        s = pd.Series(iv.view("datetime64[us]"))
        s[mask] = pd.NaT
        return s

    for f in spark_schema.fields:
        if f.name not in pdf.columns:
            pdf[f.name] = None
        col = pdf[f.name]
        already_dt = str(col.dtype).startswith("datetime")
        if isinstance(f.dataType, T.TimestampType) and not already_dt:
            pdf[f.name] = (
                _micros_series(col)
                .dt.tz_localize("UTC")
                .dt.tz_convert(session_tz)
                .dt.tz_localize(None)
            )
        elif isinstance(f.dataType, T.TimestampNTZType) and not already_dt:
            pdf[f.name] = _micros_series(col)
        elif isinstance(f.dataType, T.DateType) and not already_dt:
            # epoch-day ints -> date objects (int64 -> date32 has no
            # Arrow cast; every read of an Avro date column crashed).
            # Object columns may hold python ints (nullable) — or real
            # date objects, which pass through untouched. Exact ordinal
            # arithmetic: a ns-based to_datetime crashed on far dates.
            nonnull = col.dropna()
            if str(col.dtype).startswith(("int", "float")) or (
                len(nonnull) and isinstance(nonnull.iloc[0], int)
            ):
                from datetime import date as _date
                from datetime import timedelta as _td

                epoch = _date(1970, 1, 1)
                pdf[f.name] = [
                    None if pd.isna(v) else epoch + _td(days=int(v)) for v in col
                ]
    return pdf[[f.name for f in spark_schema.fields]]


def _float_field_names(spark_schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in spark_schema.fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    ]


def _masked_schema(out_schema: T.StructType, float_fields: list[str]) -> T.StructType:
    return T.StructType(
        list(out_schema.fields)
        + [T.StructField(f"__null_{n}", T.BooleanType()) for n in float_fields]
    )


def _resurrect_nan(df: DataFrame, spark_schema, out_schema, float_fields):
    """JVM-side inverse of the pandas bridge's NaN/null collapse: the
    Python reader shipped a was-null boolean per float column (Spark's
    Arrow conversion of a pandas-UDF result maps NaN to NULL), so a
    value that arrived null with mask false can only have been NaN."""
    from pyspark.sql import functions as F

    for f in spark_schema.fields:
        if f.name in float_fields:
            df = df.withColumn(
                f.name,
                F.when(F.col(f"__null_{f.name}"), F.lit(None).cast(f.dataType))
                .otherwise(
                    F.coalesce(F.col(f.name), F.lit(float("nan")).cast(f.dataType))
                ),
            ).drop(f"__null_{f.name}")
    return df.select(*[sf.name for sf in out_schema.fields])


def read_orc_with_pos(
    spark: SparkSession, paths: list[str], spark_schema: T.StructType
) -> DataFrame:
    """Distributed ORC read returning (_file, _pos, *columns) with
    spec-exact per-file row ordinals. Float NaN/null fidelity rides the
    same was-null masks as the Avro reader — the Arrow stripe batch
    still distinguishes them; pandas doesn't."""
    out_schema = _with_pos_schema(spark_schema)
    names = [f.name for f in spark_schema.fields]
    if not paths:
        return spark.createDataFrame([], out_schema)
    tz = spark.conf.get("spark.sql.session.timeZone") or "UTC"
    float_fields = _float_field_names(spark_schema)

    def gen(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.orc as orc

        for pdf in iterator:
            for path in pdf["path"]:
                f = orc.ORCFile(strip_scheme(path))
                pos = 0
                for i in range(f.nstripes):
                    batch = f.read_stripe(i, columns=[n for n in names])
                    masks = {
                        n: batch.column(n).is_null().to_pylist()
                        for n in float_fields
                        if n in batch.schema.names
                    }
                    b = batch.to_pandas()
                    b = _coerce_batch(b, spark_schema, tz)
                    for n in float_fields:
                        b[f"__null_{n}"] = pd.Series(
                            masks.get(n, [True] * len(b)), dtype=bool
                        )
                    b.insert(0, "_pos", range(pos, pos + len(b)))
                    b.insert(0, "_file", path)
                    pos += len(b)
                    yield b

    files = spark.createDataFrame([(p,) for p in paths], ["path"]).repartition(len(paths))
    out = files.mapInPandas(gen, _masked_schema(out_schema, float_fields))
    return _resurrect_nan(out, spark_schema, out_schema, float_fields)


def read_avro_files(
    spark: SparkSession,
    paths: list[str],
    spark_schema: T.StructType,
    with_pos: bool = False,
) -> DataFrame:
    """Distributed Avro OCF data-file read via the pure-Python codec.

    Slower per-byte than a JVM source (pure-Python decode), but Avro
    DATA files are rare in practice (parquet dominates); this makes
    them readable at all, distributed, without extra packages.
    """
    out_schema = _with_pos_schema(spark_schema) if with_pos else spark_schema
    if not paths:
        return spark.createDataFrame([], out_schema)
    tz = spark.conf.get("spark.sql.session.timeZone") or "UTC"

    # NaN/null fidelity (r13): the pandas bridge maps BOTH float NaN and
    # null to NaN on the way in, and Spark's Arrow conversion of a
    # pandas-UDF result maps NaN back to NULL — so a NaN in an Avro
    # double column would silently read as null. Ship an explicit
    # was-null boolean per float column out of the Python decoder and
    # resurrect NaN JVM-side (shared helpers with read_orc_with_pos).
    float_fields = _float_field_names(spark_schema)
    masked_schema = _masked_schema(out_schema, float_fields)

    def gen(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avro_io import read_ocf

        for pdf in iterator:
            for path in pdf["path"]:
                with open(strip_scheme(path), "rb") as fh:
                    _schema, _meta, rows = read_ocf(fh.read())
                masks = {
                    n: [r.get(n) is None for r in rows] for n in float_fields
                }
                b = pd.DataFrame(rows)
                b = _coerce_batch(b, spark_schema, tz)
                for n in float_fields:
                    b[f"__null_{n}"] = pd.Series(masks[n], dtype=bool)
                if with_pos:
                    b.insert(0, "_pos", range(len(b)))
                    b.insert(0, "_file", path)
                yield b

    files = spark.createDataFrame([(p,) for p in paths], ["path"]).repartition(len(paths))
    out = files.mapInPandas(gen, masked_schema)
    return _resurrect_nan(out, spark_schema, out_schema, float_fields)


def iceberg_schema_to_avro(schema: Schema, name: str = "record") -> dict:
    """Avro record schema for an Iceberg schema (primitives; field-id
    props like the reference's manifest schemas,
    internal/avro_schemas.go:34-190)."""
    from . import types as IT

    def prim(t) -> object:
        if isinstance(t, IT.BooleanType):
            return "boolean"
        if isinstance(t, IT.IntegerType):
            return "int"
        if isinstance(t, IT.LongType):
            return "long"
        if isinstance(t, IT.FloatType):
            return "float"
        if isinstance(t, IT.DoubleType):
            return "double"
        if isinstance(t, IT.StringType):
            return "string"
        if isinstance(t, IT.BinaryType):
            return "bytes"
        if isinstance(t, IT.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(t, (IT.TimestampType, IT.TimestampTzType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        raise NotImplementedError(f"avro data files: unsupported type {t}")

    fields = []
    for f in schema.fields:
        ft = prim(f.field_type)
        fields.append(
            {
                "name": f.name,
                "field-id": f.field_id,
                "type": ft if f.required else ["null", ft],
                **({} if f.required else {"default": None}),
            }
        )
    return {"type": "record", "name": name, "fields": fields}


def write_avro_data_file(path: str, schema: Schema, rows: list[dict]) -> None:
    """Write an Avro OCF data file (driver-side; small fixtures/tests
    only — bulk table writes go through ``write_avro_files``).
    Timestamps must already be µs ints."""
    from .avro_io import write_ocf

    avro_schema = iceberg_schema_to_avro(schema)
    data = write_ocf(avro_schema, rows, {"iceberg.schema": json.dumps(schema.to_json_dict())})
    with open(strip_scheme(path), "wb") as fh:
        fh.write(data)


def _pdf_to_records(
    pdf: pd.DataFrame, schema: Schema, session_tz: str = "UTC"
) -> list[dict]:
    """Pandas batch → Avro-ready python records, typed per the Iceberg
    schema (timestamps to µs ints, dates to epoch days, numpy scalars
    to python).

    Timestamptz values arrive from mapInPandas as NAIVE session-local
    wall times; the Iceberg spec stores UTC micros, so they localize to
    ``session_tz`` before taking the epoch value (identity at UTC).
    Plain (ntz) timestamps are wall-clock and encode as-is."""
    from datetime import date as _date

    from . import types as IT

    from datetime import datetime as _dtm
    from datetime import timedelta as _tdl
    from datetime import timezone as _tz

    _EPOCH_UTC = _dtm(1970, 1, 1, tzinfo=_tz.utc)
    _EPOCH_NAIVE = _dtm(1970, 1, 1)

    def _utc_micros(v) -> int:
        # datetime arithmetic, NOT pd.Timestamp(...).value: .value is
        # ns-based and overflows for far-range timestamps like the
        # 9999-12-31 sentinel (r6 review); µs arithmetic spans the
        # whole datetime range exactly
        ts = pd.Timestamp(v)
        if ts.tzinfo is None:
            ts = ts.tz_localize(session_tz)
        py = ts.to_pydatetime(warn=False)
        return (py - _EPOCH_UTC) // _tdl(microseconds=1)

    def _naive_micros(v) -> int:
        py = pd.Timestamp(v).to_pydatetime(warn=False)
        if py.tzinfo is not None:
            py = py.astimezone(_tz.utc).replace(tzinfo=None)
        return (py - _EPOCH_NAIVE) // _tdl(microseconds=1)

    cols: dict[str, list] = {}
    for f in schema.fields:
        series = pdf[f.name]
        t = f.field_type
        if isinstance(t, IT.TimestampTzType):
            vals = [None if pd.isna(v) else _utc_micros(v) for v in series]
        elif isinstance(t, IT.TimestampType):
            vals = [None if pd.isna(v) else _naive_micros(v) for v in series]
        elif isinstance(t, IT.DateType):
            # date objects pass straight to ordinal arithmetic —
            # pd.Timestamp(date(9999,12,31)) overflows ns (r6 review)
            vals = [
                None
                if pd.isna(v)
                else (
                    (v if isinstance(v, _date) and not isinstance(v, _dtm) else pd.Timestamp(v).date())
                    - _date(1970, 1, 1)
                ).days
                for v in series
            ]
        elif isinstance(t, (IT.IntegerType, IT.LongType)):
            vals = [None if pd.isna(v) else int(v) for v in series]
        elif isinstance(t, (IT.FloatType, IT.DoubleType)):
            # NaN arrives indistinguishable from null in the float64
            # pandas column; the JVM-computed __null_ mask (added by
            # write_avro_files) restores the difference so a NaN row
            # is WRITTEN as NaN, not silently nulled
            mask = pdf.get(f"__null_{f.name}")
            if mask is not None:
                vals = [
                    None if m else float(v)
                    for v, m in zip(series, mask)
                ]
            else:
                vals = [None if pd.isna(v) else float(v) for v in series]
        elif isinstance(t, IT.BooleanType):
            vals = [None if pd.isna(v) else bool(v) for v in series]
        elif isinstance(t, IT.BinaryType):
            # pd.isna, not `is None`: a NaN null in an object column
            # would otherwise raise bytes(nan) / write the string 'nan'
            vals = [None if (v is None or v is pd.NA) or (isinstance(v, float) and pd.isna(v)) else bytes(v) for v in series]
        else:
            vals = [None if (v is None or v is pd.NA) or (isinstance(v, float) and pd.isna(v)) else str(v) for v in series]
        cols[f.name] = vals
    names = list(cols)
    return [{k: cols[k][i] for k in names} for i in range(len(pdf))]


def write_avro_files(
    df: DataFrame,
    schema: Schema,
    out_dir: str,
    partition_cols: list[str] | None = None,
) -> list[str]:
    """Distributed Avro OCF DATA-file write via ``mapInPandas`` — the
    bulk-write twin of ``read_avro_files``. Each task encodes its own
    batches with the pure-Python codec; nothing materializes on the
    driver (only written paths come back). With ``partition_cols``,
    rows land in hive-style dirs (``name=value/``); callers should
    repartition by those columns first so a task writes few distinct
    partitions.

    Task-commit protocol (what FileOutputCommitter does for the
    built-in sources): each task writes under an attempt-scoped
    staging dir, ``collect()`` returns rows only from SUCCESSFUL
    attempts, and the driver promotes exactly those files into
    ``out_dir`` before deleting the whole staging tree — so a failed,
    retried, or speculative attempt can never leak a file into the
    commit harvest."""
    import os
    import shutil as _shutil
    import uuid as _uuid
    from datetime import date as _date

    from pyspark.sql import types as ST

    avro_schema = iceberg_schema_to_avro(schema)
    meta = {"iceberg.schema": json.dumps(schema.to_json_dict())}
    pcols = list(partition_cols or [])
    # NaN/null fidelity: pandas float64 collapses null into NaN on the
    # way into mapInPandas — compute the true null mask JVM-side so
    # _pdf_to_records writes NaN as NaN and null as null
    from pyspark.sql import functions as _F

    from . import types as _IT

    for f in schema.fields:
        if isinstance(f.field_type, (_IT.FloatType, _IT.DoubleType)):
            df = df.withColumn(f"__null_{f.name}", _F.isnull(f.name))
    base = strip_scheme(out_dir)
    staging_root = os.path.join(base, f"_staging-{_uuid.uuid4().hex[:8]}")
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"

    def _hive_escape(s: str) -> str:
        # percent-escape the chars Hive/Spark escape in partition dirs —
        # the read path unquote()s, so an UNescaped '/', '%' or control
        # char would corrupt the dir structure / manifest value
        return "".join(
            f"%{ord(c):02X}" if (c in "\\/:=%#*?\"'\x7f" or ord(c) < 0x20) else c
            for c in s
        )

    def _dir_value(v) -> str:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "__HIVE_DEFAULT_PARTITION__"
        if isinstance(v, _date):
            return _hive_escape(v.isoformat())
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return _hive_escape(str(v))

    def gen(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from .avro_io import write_ocf

        ctx = TaskContext.get()
        attempt = f"attempt-{ctx.taskAttemptId()}" if ctx else "attempt-driver"
        for pdf in iterator:
            if not len(pdf):
                continue
            groups = (
                [(None, pdf)]
                if not pcols
                else list(pdf.groupby(pcols, dropna=False, sort=True))
            )
            for key, g in groups:
                sub = ""
                if pcols:
                    key_t = key if isinstance(key, tuple) else (key,)
                    sub = "/".join(
                        f"{n}={_dir_value(v)}" for n, v in zip(pcols, key_t)
                    )
                fname = f"{_uuid.uuid4().hex[:16]}.avro"
                d = os.path.join(staging_root, attempt, sub)
                os.makedirs(d, exist_ok=True)
                path = os.path.join(d, fname)
                data = write_ocf(
                    avro_schema, _pdf_to_records(g, schema, session_tz), meta
                )
                with open(path, "wb") as fh:
                    fh.write(data)
                yield pd.DataFrame(
                    {
                        "path": [path],
                        "rel": [os.path.join(sub, fname) if sub else fname],
                    }
                )

    # no n_rows column: the commit path re-derives record counts from
    # OCF block headers (count_ocf_rows), which doubles as a post-write
    # integrity check
    out_schema = ST.StructType(
        [
            ST.StructField("path", ST.StringType()),
            ST.StructField("rel", ST.StringType()),
        ]
    )
    try:
        written = df.mapInPandas(gen, out_schema).collect()
        final_paths = []
        for r in written:
            dst = os.path.join(base, r["rel"])
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(r["path"], dst)
            final_paths.append(dst)
    finally:
        _shutil.rmtree(staging_root, ignore_errors=True)
    return final_paths
