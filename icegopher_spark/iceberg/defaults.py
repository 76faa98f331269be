"""Column default values (Iceberg V3, table spec Appendix D).

Decodes a field's stored JSON single-value default (``initial-default``
/ ``write-default``) into a Spark Column, so

- scans fill columns that postdate a file with the field's
  initial-default instead of null (`table.py` projection fill), and
- writes fill columns absent from the incoming DataFrame with the
  field's write-default (`write.py` alignment select).

Timestamps are built as SQL literals (``TIMESTAMP_NTZ '…'`` /
``TIMESTAMP '…+00:00'``) rather than ``F.lit(datetime)`` so the value
is exact regardless of the session timezone; the strings are formatted
from validated integers, never from user text.
"""

from __future__ import annotations

from datetime import date as _date
from datetime import timedelta as _timedelta
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .literals import _fmt_ts_micros, parse_json_single_value
from .types import (
    DateType,
    DecimalType,
    IcebergType,
    ListType,
    MapType,
    NestedField,
    StructType,
    TimestampNsType,
    TimestampTzNsType,
    TimestampType,
    TimestampTzType,
    UUIDType,
    to_spark_type,
)


def _null(t: IcebergType) -> Column:
    return F.lit(None).cast(to_spark_type(t))


def _value_to_column(t: IcebergType, v: Any) -> Column:
    if isinstance(t, DateType):
        return F.lit(_date(1970, 1, 1) + _timedelta(days=int(v)))
    if isinstance(t, TimestampType):
        return F.expr(f"TIMESTAMP_NTZ '{_fmt_ts_micros(int(v))}'")
    if isinstance(t, TimestampTzType):
        return F.expr(f"TIMESTAMP '{_fmt_ts_micros(int(v))}+00:00'")
    # V3 ns timestamps: the stored default is int NANOS; the Spark
    # surface is µs (same "nanos->micros floorDiv" rule as the read
    # path). Without this branch the raw int fell through to
    # F.lit(int).cast(timestamp_ntz), which Spark REFUSES — so adding
    # a ns column with a default made the whole table unscannable
    # (r9 review).
    if isinstance(t, TimestampNsType):
        return F.expr(f"TIMESTAMP_NTZ '{_fmt_ts_micros(int(v) // 1000)}'")
    if isinstance(t, TimestampTzNsType):
        return F.expr(f"TIMESTAMP '{_fmt_ts_micros(int(v) // 1000)}+00:00'")
    if isinstance(t, UUIDType):
        return F.lit(str(v))
    if isinstance(t, DecimalType):
        return F.lit(v).cast(to_spark_type(t))
    if isinstance(t, StructType):
        parts = []
        for f in t.fields:
            sub = v.get(f.field_id)
            parts.append(
                (_value_to_column(f.field_type, sub) if sub is not None else _null(f.field_type))
                .alias(f.name)
            )
        return F.struct(*parts)
    if isinstance(t, ListType):
        st = to_spark_type(t)
        if not v:
            return F.expr("array()").cast(st)
        return F.array(
            *[
                _value_to_column(t.element_type, e) if e is not None else _null(t.element_type)
                for e in v
            ]
        ).cast(st)
    if isinstance(t, MapType):
        st = to_spark_type(t)
        if not v:
            return F.expr("map()").cast(st)
        return F.map_from_arrays(
            F.array(*[_value_to_column(t.key_type, k) for k, _ in v]),
            F.array(
                *[
                    _value_to_column(t.value_type, mv) if mv is not None else _null(t.value_type)
                    for _, mv in v
                ]
            ),
        ).cast(st)
    # bool / int / long / float / double / string / fixed / binary /
    # time (bigint µs-since-midnight): F.lit handles the Python value
    return F.lit(v).cast(to_spark_type(t))


def default_column(field: NestedField, which: str) -> Column | None:
    """The Spark Column for ``field``'s stored default, or None if the
    field has no such default. ``which`` is 'initial' (scan fill) or
    'write' (write fill)."""
    raw = field.initial_default if which == "initial" else field.write_default
    if raw is None:
        return None
    v = parse_json_single_value(field.field_type, raw)
    return _value_to_column(field.field_type, v).cast(to_spark_type(field.field_type))


def _arrow_py(t: IcebergType, v: Any) -> Any:
    """Internal representation -> the Python form pyarrow accepts for
    the corresponding arrow type (struct defaults re-key by NAME; date
    stays int days and timestamps int µs — pa.array interprets raw
    integers as the storage unit for date32/timestamp types)."""
    if isinstance(t, StructType):
        return {
            f.name: (
                None
                if v.get(f.field_id) is None
                else _arrow_py(f.field_type, v[f.field_id])
            )
            for f in t.fields
        }
    if isinstance(t, ListType):
        return [None if e is None else _arrow_py(t.element_type, e) for e in v]
    if isinstance(t, MapType):
        return [
            (
                _arrow_py(t.key_type, k),
                None if mv is None else _arrow_py(t.value_type, mv),
            )
            for k, mv in v
        ]
    if isinstance(t, UUIDType):
        return str(v)
    if isinstance(t, (TimestampNsType, TimestampTzNsType)):
        # arrow schema for ns columns is timestamp('us') (the Spark
        # surface) — a raw int-nanos default would be read as µs,
        # shifting the value 1000x (r9 review)
        return int(v) // 1000
    return v


def default_arrow_value(field: NestedField, which: str = "initial") -> Any:
    """The field's default in arrow-compatible Python form (picklable —
    computed at plan time, shipped to executors inside the DSv2 column
    map / writer plan), or None when the field has no such default.
    ``which`` is 'initial' (scan fill) or 'write' (write fill)."""
    raw = field.initial_default if which == "initial" else field.write_default
    if raw is None:
        return None
    v = parse_json_single_value(field.field_type, raw)
    return _arrow_py(field.field_type, v)
