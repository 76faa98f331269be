"""Iceberg type system: 15 primitives + struct/list/map, JSON round-trip,
and conversion to/from Spark SQL types.

Semantics follow the Iceberg spec as realized by the reference
(zeroshade/icegopher types.go:61-570): field-ID-based nested types,
`fixed[N]`/`decimal(P,S)` parsed via regex, and a singleton registry of
primitive types. Spark mapping per SURVEY.md §1.2 (time has no Spark
equivalent → long + annotation).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

_FIXED_RE = re.compile(r"^fixed\[(\d+)\]$")
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")


class IcebergType:
    """Base for all Iceberg types."""

    def __str__(self) -> str:  # pragma: no cover - overridden
        raise NotImplementedError

    def __repr__(self) -> str:
        return str(self)

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and str(self) == str(other)

    def __hash__(self) -> int:
        return hash(str(self))

    @property
    def is_primitive(self) -> bool:
        return isinstance(self, PrimitiveType)


class PrimitiveType(IcebergType):
    name: str = ""

    def __str__(self) -> str:
        return self.name


class BooleanType(PrimitiveType):
    name = "boolean"


class IntegerType(PrimitiveType):
    name = "int"


class LongType(PrimitiveType):
    name = "long"


class FloatType(PrimitiveType):
    name = "float"


class DoubleType(PrimitiveType):
    name = "double"


class DateType(PrimitiveType):
    """Days since 1970-01-01 (int32)."""

    name = "date"


class TimeType(PrimitiveType):
    """Microseconds since midnight (int64)."""

    name = "time"


class TimestampType(PrimitiveType):
    """Microseconds since epoch, no timezone."""

    name = "timestamp"


class TimestampTzType(PrimitiveType):
    """Microseconds since epoch, stored UTC."""

    name = "timestamptz"


class TimestampNsType(PrimitiveType):
    """V3: nanoseconds since epoch, no timezone. Spark's finest
    timestamp grain is microseconds, so the Spark surface truncates
    toward negative infinity (floor-division by 1000 — the same rule
    Iceberg's Java implementation uses for ns->µs); the metadata plane
    (literals, bounds, defaults) keeps full int64 nanos."""

    name = "timestamp_ns"


class TimestampTzNsType(PrimitiveType):
    """V3: nanoseconds since epoch, stored UTC. Same µs truncation rule
    on the Spark surface as ``timestamp_ns``."""

    name = "timestamptz_ns"


class UnknownType(PrimitiveType):
    """V3: a column whose type could not be determined at write time.
    All values are null; the field must be optional; reads surface as
    Spark NullType (always-null column)."""

    name = "unknown"


class VariantType(PrimitiveType):
    """V3: semi-structured value (binary-encoded metadata + value).
    Spark 4 has a native VariantType with the same parquet physical
    layout (struct<metadata: binary, value: binary>), so the read and
    write surfaces pass through natively; extract with
    ``variant_get``/``to_json``. Variant columns carry NO column stats
    or bounds (unprunable, like the spec says for unshredded variant)
    and cannot be partition-transform or single-value-serde inputs."""

    name = "variant"


class StringType(PrimitiveType):
    name = "string"


class UUIDType(PrimitiveType):
    name = "uuid"


class BinaryType(PrimitiveType):
    name = "binary"


@dataclass(frozen=True)
class FixedType(PrimitiveType):
    length: int = 0

    def __str__(self) -> str:
        return f"fixed[{self.length}]"

    __hash__ = IcebergType.__hash__
    __eq__ = IcebergType.__eq__


@dataclass(frozen=True)
class DecimalType(PrimitiveType):
    precision: int = 0
    scale: int = 0

    def __str__(self) -> str:
        return f"decimal({self.precision}, {self.scale})"

    __hash__ = IcebergType.__hash__
    __eq__ = IcebergType.__eq__


# Singleton registry (reference: PrimitiveTypes, types.go:544-570).
PRIMITIVE_TYPES: dict[str, PrimitiveType] = {
    t.name: t()
    for t in (
        BooleanType,
        IntegerType,
        LongType,
        FloatType,
        DoubleType,
        DateType,
        TimeType,
        TimestampType,
        TimestampTzType,
        TimestampNsType,
        TimestampTzNsType,
        UnknownType,
        VariantType,
        StringType,
        UUIDType,
        BinaryType,
    )
}


class UnsupportedTypeError(ValueError):
    """A V3 type that is recognized but not implemented here. Raised
    when the offending column is SELECTED (or written), with the type
    and column named, so metadata written by another engine fails
    actionably instead of with a generic 'unknown primitive type'
    (r6 verdict #3). Since r9 the refusal is PER-COLUMN, not at parse:
    a geo column no longer makes the whole table unloadable — deselect
    it and every other column scans normally (r8 verdict #1b)."""

    def __init__(self, type_name: str, column: str | None = None) -> None:
        self.type_name = type_name
        self.column = column
        at = f"column {column!r} has" if column else ""
        super().__init__(
            f"{at} Iceberg V3 type {type_name!r} which is not supported "
            "by this engine (recognized but unimplemented: "
            "geometry/geography); deselect the column to scan the rest "
            "of the table, or read it with an engine that implements it"
        )


# V3 types we can NAME but not represent: parameterized
# `geometry(<crs>)` / `geography(<crs>, <algorithm>)` (bare forms too).
# `variant` graduated to a real type in r8 (VariantType above).
_UNSUPPORTED_V3_RE = re.compile(r"^(geometry|geography)\s*(\(.*\))?$")


@dataclass(frozen=True)
class UnsupportedGeoType(PrimitiveType):
    """Placeholder for a RECOGNIZED-but-unimplemented V3 geo type
    (``geometry(<crs>)`` / ``geography(<crs>, <algorithm>)``). Parsing
    into a placeholder instead of raising (r9, was r6 verdict #3
    behavior) makes geo tables DESELECT-TOLERANT: a table containing
    one geo column still loads and every other column scans normally;
    only an attempt to SELECT/convert/write the geo column raises the
    precise ``UnsupportedTypeError``. ``str()`` round-trips the
    original type string so metadata re-serialization preserves it
    byte-exactly (type_to_json falls back to str). Semantics anchor:
    reference types.go:61-135 (type JSON dispatch)."""

    type_str: str = ""

    def __str__(self) -> str:
        return self.type_str

    __hash__ = IcebergType.__hash__
    __eq__ = IcebergType.__eq__


@dataclass(frozen=True)
class NestedField:
    """A named, ID'd field (reference: types.go:137-146)."""

    field_id: int
    name: str
    field_type: IcebergType
    required: bool = False
    doc: str | None = None
    initial_default: Any = None
    write_default: Any = None

    def __str__(self) -> str:
        req = "required" if self.required else "optional"
        doc = f" ({self.doc})" if self.doc else ""
        return f"{self.field_id}: {self.name}: {req} {self.field_type}{doc}"


@dataclass(frozen=True)
class StructType(IcebergType):
    fields: tuple[NestedField, ...] = ()

    def __str__(self) -> str:
        inner = ", ".join(str(f) for f in self.fields)
        return f"struct<{inner}>"

    def field_by_id(self, field_id: int) -> NestedField | None:
        for f in self.fields:
            if f.field_id == field_id:
                return f
        return None


@dataclass(frozen=True)
class ListType(IcebergType):
    element_id: int = 0
    element_type: IcebergType = field(default_factory=StringType)
    element_required: bool = False

    def __str__(self) -> str:
        return f"list<{self.element_type}>"

    @property
    def element_field(self) -> NestedField:
        return NestedField(self.element_id, "element", self.element_type, self.element_required)


@dataclass(frozen=True)
class MapType(IcebergType):
    key_id: int = 0
    key_type: IcebergType = field(default_factory=StringType)
    value_id: int = 0
    value_type: IcebergType = field(default_factory=StringType)
    value_required: bool = False

    def __str__(self) -> str:
        return f"map<{self.key_type}, {self.value_type}>"

    @property
    def key_field(self) -> NestedField:
        return NestedField(self.key_id, "key", self.key_type, True)

    @property
    def value_field(self) -> NestedField:
        return NestedField(self.value_id, "value", self.value_type, self.value_required)


# --------------------------------------------------------------------------
# JSON (de)serialization — the Iceberg schema-JSON dialect
# --------------------------------------------------------------------------


def type_from_json(obj: Any) -> IcebergType:
    """Parse a type from its JSON form (string for primitives, object
    for nested); reference typeIFace.UnmarshalJSON (types.go:61-135)."""
    if isinstance(obj, str):
        if obj in PRIMITIVE_TYPES:
            return PRIMITIVE_TYPES[obj]
        m = _FIXED_RE.match(obj)
        if m:
            return FixedType(int(m.group(1)))
        m = _DECIMAL_RE.match(obj)
        if m:
            return DecimalType(int(m.group(1)), int(m.group(2)))
        m = _UNSUPPORTED_V3_RE.match(obj)
        if m:
            # recognized geo type: parse into a placeholder so the
            # TABLE stays loadable; refusal happens per-column at
            # select/convert time (UnsupportedGeoType docstring)
            return UnsupportedGeoType(obj)
        raise ValueError(f"unknown primitive type: {obj!r}")
    t = obj.get("type")
    if t == "struct":
        return StructType(tuple(field_from_json(f) for f in obj["fields"]))
    if t == "list":
        return ListType(
            element_id=obj["element-id"],
            element_type=type_from_json(obj["element"]),
            element_required=obj.get("element-required", True),
        )
    if t == "map":
        return MapType(
            key_id=obj["key-id"],
            key_type=type_from_json(obj["key"]),
            value_id=obj["value-id"],
            value_type=type_from_json(obj["value"]),
            value_required=obj.get("value-required", True),
        )
    raise ValueError(f"unknown nested type: {t!r}")


def field_from_json(obj: dict) -> NestedField:
    ftype = type_from_json(obj["type"])
    required = obj.get("required", False)
    if isinstance(ftype, UnknownType) and required:
        # V3 spec: `unknown` columns hold only nulls, so a required
        # unknown field is unsatisfiable — reject at the parse boundary
        raise ValueError(
            f"field {obj['name']!r} (id {obj['id']}): `unknown` type "
            "must be optional"
        )
    return NestedField(
        field_id=obj["id"],
        name=obj["name"],
        field_type=ftype,
        required=required,
        doc=obj.get("doc"),
        initial_default=obj.get("initial-default"),
        write_default=obj.get("write-default"),
    )


def type_to_json(t: IcebergType) -> Any:
    if isinstance(t, StructType):
        return {"type": "struct", "fields": [field_to_json(f) for f in t.fields]}
    if isinstance(t, ListType):
        return {
            "type": "list",
            "element-id": t.element_id,
            "element": type_to_json(t.element_type),
            "element-required": t.element_required,
        }
    if isinstance(t, MapType):
        return {
            "type": "map",
            "key-id": t.key_id,
            "key": type_to_json(t.key_type),
            "value-id": t.value_id,
            "value": type_to_json(t.value_type),
            "value-required": t.value_required,
        }
    return str(t)


def field_to_json(f: NestedField) -> dict:
    out: dict[str, Any] = {
        "id": f.field_id,
        "name": f.name,
        "type": type_to_json(f.field_type),
        "required": f.required,
    }
    if f.doc is not None:
        out["doc"] = f.doc
    if f.initial_default is not None:
        out["initial-default"] = f.initial_default
    if f.write_default is not None:
        out["write-default"] = f.write_default
    return out


# --------------------------------------------------------------------------
# Spark conversion (SURVEY.md §1.2 mapping table)
# --------------------------------------------------------------------------

_PRIM_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),  # µs since midnight; Spark has no TimeType
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    # V3 nanos: Spark's finest grain is µs — values truncate toward
    # negative infinity (floorDiv by 1000); full nanos stay available
    # on the metadata plane (literals/bounds/defaults)
    "timestamp_ns": T.TimestampNTZType(),
    "timestamptz_ns": T.TimestampType(),
    "unknown": T.NullType(),  # V3: always-null column
    "variant": T.VariantType(),  # V3: Spark-native since 4.0
    "string": T.StringType(),
    "uuid": T.StringType(),  # canonical text form
    "binary": T.BinaryType(),
}


def to_spark_type(t: IcebergType) -> T.DataType:
    if isinstance(t, UnsupportedGeoType):
        raise UnsupportedTypeError(t.type_str)
    if isinstance(t, StructType):
        return T.StructType(
            [
                T.StructField(
                    f.name,
                    _to_spark_type_named(f.field_type, f.name),
                    nullable=not f.required,
                    # Spark has no TimeType: `time` columns surface as
                    # bigint µs-since-midnight, annotated so the logical
                    # type survives visibly in df.schema metadata
                    metadata=(
                        {"iceberg.field-id": f.field_id, "iceberg.type": "time",
                         "iceberg.unit": "micros-since-midnight"}
                        if isinstance(f.field_type, TimeType)
                        else {"iceberg.field-id": f.field_id,
                              "iceberg.type": f.field_type.name,
                              "iceberg.truncation": "nanos->micros floorDiv"}
                        if isinstance(
                            f.field_type, (TimestampNsType, TimestampTzNsType)
                        )
                        else {"iceberg.field-id": f.field_id}
                    ),
                )
                for f in t.fields
            ]
        )
    if isinstance(t, ListType):
        return T.ArrayType(to_spark_type(t.element_type), containsNull=not t.element_required)
    if isinstance(t, MapType):
        return T.MapType(
            to_spark_type(t.key_type),
            to_spark_type(t.value_type),
            valueContainsNull=not t.value_required,
        )
    if isinstance(t, FixedType):
        return T.BinaryType()
    if isinstance(t, DecimalType):
        return T.DecimalType(t.precision, t.scale)
    return _PRIM_TO_SPARK[t.name]


def _to_spark_type_named(t: IcebergType, name: str) -> T.DataType:
    """to_spark_type with the owning field's name attached to the
    unsupported-type refusal, so 'deselect column X' is actionable."""
    try:
        return to_spark_type(t)
    except UnsupportedTypeError as e:
        if e.column is None:
            raise UnsupportedTypeError(e.type_name, column=name) from None
        raise


def from_spark_type(dt: T.DataType, next_id) -> IcebergType:
    """Convert a Spark type to Iceberg, assigning fresh field IDs via
    the ``next_id`` callable (used when importing existing DataFrames)."""
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = next_id()
            fields.append(
                NestedField(fid, f.name, from_spark_type(f.dataType, next_id), not f.nullable)
            )
        return StructType(tuple(fields))
    if isinstance(dt, T.ArrayType):
        eid = next_id()
        return ListType(eid, from_spark_type(dt.elementType, next_id), not dt.containsNull)
    if isinstance(dt, T.MapType):
        kid, vid = next_id(), next_id()
        return MapType(
            kid,
            from_spark_type(dt.keyType, next_id),
            vid,
            from_spark_type(dt.valueType, next_id),
            not dt.valueContainsNull,
        )
    if isinstance(dt, T.DecimalType):
        return DecimalType(dt.precision, dt.scale)
    rev = {
        T.BooleanType(): BooleanType(),
        T.ByteType(): IntegerType(),
        T.ShortType(): IntegerType(),
        T.IntegerType(): IntegerType(),
        T.LongType(): LongType(),
        T.FloatType(): FloatType(),
        T.DoubleType(): DoubleType(),
        T.DateType(): DateType(),
        T.TimestampNTZType(): TimestampType(),
        T.TimestampType(): TimestampTzType(),
        T.StringType(): StringType(),
        T.BinaryType(): BinaryType(),
        T.VariantType(): VariantType(),
    }
    if dt in rev:
        return rev[dt]
    raise ValueError(f"cannot convert Spark type {dt} to Iceberg")


def contains_unsupported(t: IcebergType) -> bool:
    """True when ``t`` is or nests an UnsupportedGeoType anywhere —
    same shape as contains_variant: the scan path uses this to SKIP
    geo fields the projection doesn't select (deselect tolerance) and
    to refuse, per-column, the ones it does."""
    if isinstance(t, UnsupportedGeoType):
        return True
    if isinstance(t, StructType):
        return any(contains_unsupported(f.field_type) for f in t.fields)
    if isinstance(t, ListType):
        return contains_unsupported(t.element_type)
    if isinstance(t, MapType):
        return contains_unsupported(t.key_type) or contains_unsupported(t.value_type)
    return False


def contains_variant(t: IcebergType) -> bool:
    """True when ``t`` is or nests a VariantType anywhere (struct field,
    list element, map key/value). The pyarrow-kernel faces must refuse
    such schemas at PLAN time — a top-level-only isinstance check lets
    struct<payload: variant> through to an undiagnosable executor
    OSError (r8 review wave 2)."""
    if isinstance(t, VariantType):
        return True
    if isinstance(t, StructType):
        return any(contains_variant(f.field_type) for f in t.fields)
    if isinstance(t, ListType):
        return contains_variant(t.element_type)
    if isinstance(t, MapType):
        return contains_variant(t.key_type) or contains_variant(t.value_type)
    return False
