"""Typed literals: construction, the cast/promotion matrix with overflow
sentinels, and the Iceberg single-value binary (de)serialization used to
decode manifest lower/upper bounds.

Reference semantics: expressions/literals.go (constructors 40-84, cast
matrix 234-773, sentinels 155-217, binary round-trip 90-149 and
per-type marshal blocks). Binary spec: little-endian ints/floats, UTF-8
strings, big-endian 16-byte UUID, minimal two's-complement big-endian
unscaled decimal.
"""

from __future__ import annotations

import decimal as _decimal
import math as _math
import struct
import uuid as _uuid
from dataclasses import dataclass
from datetime import date, datetime, time, timedelta, timezone
from decimal import Decimal
from typing import Any

from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    StringType,
    TimestampNsType,
    TimestampType,
    TimestampTzNsType,
    TimestampTzType,
    TimeType,
    UUIDType,
)

# V3 nanosecond-precision timestamp pair (int64 nanos since epoch)
_NS_TYPES = (TimestampNsType, TimestampTzNsType)
_US_TYPES = (TimestampType, TimestampTzType)

INT_MIN, INT_MAX = -(2**31), 2**31 - 1
LONG_MIN, LONG_MAX = -(2**63), 2**63 - 1
FLOAT_MAX = 3.4028234663852886e38


class _Sentinel:
    """Overflow sentinel returned by casts that exceed the target range
    (reference literals.go:155-217); lets the binder fold predicates
    like `int_col == 2^40` to constant false."""

    def __init__(self, name: str) -> None:
        self.name = name

    def __repr__(self) -> str:
        return self.name


IntAboveMax = _Sentinel("IntAboveMax")
IntBelowMin = _Sentinel("IntBelowMin")
LongAboveMax = _Sentinel("LongAboveMax")
LongBelowMin = _Sentinel("LongBelowMin")
FloatAboveMax = _Sentinel("FloatAboveMax")
FloatBelowMin = _Sentinel("FloatBelowMin")

SENTINELS = {IntAboveMax, IntBelowMin, LongAboveMax, LongBelowMin, FloatAboveMax, FloatBelowMin}

ABOVE = {IntAboveMax, LongAboveMax, FloatAboveMax}
BELOW = {IntBelowMin, LongBelowMin, FloatBelowMin}

_EPOCH_DATE = date(1970, 1, 1)


@dataclass(frozen=True)
class Literal:
    """A typed literal value. ``value`` uses natural Python types:
    int for int/long/date(days)/time(µs)/timestamp(µs), float for
    float/double, str, bytes, bool, Decimal, uuid.UUID."""

    value: Any
    literal_type: IcebergType

    def __repr__(self) -> str:
        return f"Literal({self.value!r}: {self.literal_type})"

    # -- casts ----------------------------------------------------------

    def to(self, target: IcebergType):
        """Cast to ``target``; returns a Literal, a sentinel, or raises
        ValueError on an invalid cast (matching the reference matrix)."""
        src, v = self.literal_type, self.value
        if isinstance(target, LongType) and isinstance(v, int) and not isinstance(v, bool):
            # Python ints are unbounded, so L(2**70) carries a LongType
            # tag with an un-encodable value; the same-type early return
            # then skipped sentinel folding and the filter reached Spark
            # as an overflowing long literal (r6 review)
            if v > LONG_MAX:
                return LongAboveMax
            if v < LONG_MIN:
                return LongBelowMin
        if src == target:
            return self
        out = _cast(src, v, target)
        if out in SENTINELS:
            return out
        if out is None:
            raise ValueError(f"cannot cast {self!r} to {target}")
        return Literal(out, target)

    # -- binary (Iceberg single-value spec) -----------------------------

    def to_bytes(self) -> bytes:
        return literal_to_bytes(self)


def L(value: Any, t: IcebergType | None = None) -> Literal:
    """Literal constructor with natural-type inference."""
    if t is not None:
        return Literal(value, t)
    if isinstance(value, bool):
        return Literal(value, BooleanType())
    if isinstance(value, int):
        return Literal(value, IntegerType() if INT_MIN <= value <= INT_MAX else LongType())
    if isinstance(value, float):
        return Literal(value, DoubleType())
    if isinstance(value, str):
        return Literal(value, StringType())
    if isinstance(value, bytes):
        return Literal(value, BinaryType())
    if isinstance(value, Decimal):
        sign, digits, exp = value.as_tuple()
        return Literal(value, DecimalType(max(len(digits), -exp), max(-exp, 0)))
    if isinstance(value, _uuid.UUID):
        return Literal(value, UUIDType())
    if isinstance(value, datetime):
        # integer arithmetic: float .timestamp()*1e6 corrupts micros
        # beyond 2^53 us (~year 2255 — incl. the 9999-12-31 sentinel,
        # which rounded UP past datetime.max; r6 review)
        ts = value.replace(tzinfo=value.tzinfo or timezone.utc)
        micros = (ts - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
            microseconds=1
        )
        return Literal(micros, TimestampTzType() if value.tzinfo else TimestampType())
    if isinstance(value, date):
        return Literal((value - _EPOCH_DATE).days, DateType())
    if isinstance(value, time):
        micros = ((value.hour * 60 + value.minute) * 60 + value.second) * 1_000_000 + value.microsecond
        return Literal(micros, TimeType())
    raise TypeError(f"no literal type for {type(value)}")


def _parse_date(s: str) -> int:
    return (date.fromisoformat(s) - _EPOCH_DATE).days


def _parse_time(s: str) -> int:
    t = time.fromisoformat(s)
    return ((t.hour * 60 + t.minute) * 60 + t.second) * 1_000_000 + t.microsecond


def _parse_ts(s: str) -> int:
    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    # exact integer micros (see the datetime literal path above)
    return (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(microseconds=1)


_NS_FRACTION_RE = __import__("re").compile(r"\.(\d{7,9})(?=$|[Z+\-])")


def _parse_ts_ns(s: str) -> int:
    """ISO timestamp -> int64 nanos since epoch. Python's datetime caps
    at µs, so a 7-9 digit fraction is split off and re-added as exact
    integer nanos (fromisoformat would raise on it)."""
    m = _NS_FRACTION_RE.search(s)
    extra_ns = 0
    if m:
        frac = m.group(1)
        extra_ns = int(frac.ljust(9, "0"))
        s = s[: m.start()] + s[m.end():]
        return _parse_ts(s) * 1000 + extra_ns
    return _parse_ts(s) * 1000


def _to_decimal(v: Any, target: DecimalType) -> Decimal | None:
    """Quantize to the target scale under an explicit high-precision
    context: the default 28-digit context raises InvalidOperation for
    values needing more digits (e.g. 1e20 at scale 10 = 31 digits) even
    when they FIT the target type, crashing bind() mid-scan (r6
    review). Values that genuinely exceed the target precision return
    None → a clean 'cannot cast' instead."""
    try:
        with _decimal.localcontext() as ctx:
            ctx.prec = 80  # > 38-digit iceberg max + any scale shift
            out = Decimal(str(v)).quantize(Decimal(1).scaleb(-target.scale))
    except ArithmeticError:
        return None  # NaN/inf or beyond-context values
    _sign, digits, _exp = out.as_tuple()
    if len(digits) > target.precision:
        return None
    return out


def _cast(src: IcebergType, v: Any, target: IcebergType) -> Any:
    """Returns the cast value, a sentinel, or None for invalid."""
    # int →
    if isinstance(src, IntegerType):
        if isinstance(target, LongType):
            return v
        if isinstance(target, FloatType) or isinstance(target, DoubleType):
            return float(v)
        if isinstance(target, DateType) or isinstance(target, TimeType):
            return v
        if isinstance(target, DecimalType):
            return Decimal(v)
    # long →
    if isinstance(src, LongType):
        if isinstance(target, IntegerType):
            if v > INT_MAX:
                return IntAboveMax
            if v < INT_MIN:
                return IntBelowMin
            return v
        if isinstance(target, (FloatType, DoubleType)):
            return float(v)
        if isinstance(target, (TimeType, TimestampType, TimestampTzType)):
            return v
        if isinstance(target, DecimalType):
            return Decimal(v)
    # float →
    if isinstance(src, FloatType):
        if isinstance(target, DoubleType):
            return v
        if isinstance(target, DecimalType):
            return _to_decimal(v, target)
    # double →
    if isinstance(src, DoubleType):
        if isinstance(target, FloatType):
            if _math.isinf(v) or _math.isnan(v):
                return v  # float32 represents ±inf/NaN exactly — NOT an
                # overflow: the sentinel would fold eq(f, inf) to
                # always-false and drop matching rows (r6 review)
            if v > FLOAT_MAX:
                return FloatAboveMax
            if v < -FLOAT_MAX:
                return FloatBelowMin
            return v
        if isinstance(target, DecimalType):
            return _to_decimal(v, target)
    # string →
    if isinstance(src, StringType):
        try:
            if isinstance(target, IntegerType):
                n = int(v)
                if n > INT_MAX:
                    return IntAboveMax
                if n < INT_MIN:
                    return IntBelowMin
                return n
            if isinstance(target, LongType):
                n = int(v)
                if n > LONG_MAX:
                    return LongAboveMax
                if n < LONG_MIN:
                    return LongBelowMin
                return n
            if isinstance(target, (FloatType, DoubleType)):
                return float(v)
            if isinstance(target, DateType):
                return _parse_date(v)
            if isinstance(target, TimeType):
                return _parse_time(v)
            if isinstance(target, (TimestampType, TimestampTzType)):
                return _parse_ts(v)
            if isinstance(target, UUIDType):
                return _uuid.UUID(v)
            if isinstance(target, DecimalType):
                return _to_decimal(v, target)
            if isinstance(target, BooleanType):
                lv = v.lower()
                if lv in ("true", "t", "1"):
                    return True
                if lv in ("false", "f", "0"):
                    return False
                return None
        except (ValueError, ArithmeticError):
            return None
    # V3 nanosecond timestamps: ns->µs truncates toward -inf (floorDiv
    # by 1000 — Iceberg Java's rule); µs->ns multiplies and can overflow
    # int64 (years past ~2262), surfacing the standard sentinels so the
    # binder folds out-of-range predicates instead of corrupting them
    if isinstance(src, _NS_TYPES):
        if isinstance(target, _NS_TYPES):
            return v
        if isinstance(target, _US_TYPES):
            return v // 1000  # Python // floors toward -inf for ints
        if isinstance(target, DateType):
            d = 86_400_000_000_000
            return v // d
    if isinstance(src, _US_TYPES) and isinstance(target, _NS_TYPES):
        n = v * 1000
        if n > LONG_MAX:
            return LongAboveMax
        if n < LONG_MIN:
            return LongBelowMin
        return n
    if isinstance(src, (IntegerType, LongType)) and isinstance(target, _NS_TYPES):
        return v
    if isinstance(src, DateType) and isinstance(target, _NS_TYPES):
        n = v * 86_400_000_000_000
        if n > LONG_MAX:
            return LongAboveMax
        if n < LONG_MIN:
            return LongBelowMin
        return n
    if isinstance(src, StringType) and isinstance(target, _NS_TYPES):
        try:
            n = _parse_ts_ns(v)
        except (ValueError, ArithmeticError):
            return None
        # same int64 sentinel rule as the µs->ns path: '9999-12-31'-ish
        # strings overflow nanos (~year 2262) and must FOLD, not crash
        # struct.pack at serialization time (r7 review)
        if n > LONG_MAX:
            return LongAboveMax
        if n < LONG_MIN:
            return LongBelowMin
        return n
    # date/time/timestamp conversions
    if isinstance(src, (TimestampType, TimestampTzType)) and isinstance(
        target, (TimestampType, TimestampTzType)
    ):
        # micros-since-epoch are identical for both representations
        # (naive literals are interpreted as UTC at construction), so a
        # naive datetime binds against a timestamptz column and vice
        # versa instead of raising 'cannot cast' (r6 review)
        return v
    if isinstance(src, (TimestampType, TimestampTzType)) and isinstance(target, DateType):
        return v // 86_400_000_000  # Python // already floors toward -inf
    if isinstance(src, DateType) and isinstance(target, (TimestampType, TimestampTzType)):
        return v * 86_400_000_000
    # bytes ↔ fixed
    if isinstance(src, BinaryType) and isinstance(target, FixedType):
        return v if len(v) == target.length else None
    if isinstance(src, FixedType) and isinstance(target, BinaryType):
        return v
    # decimal → decimal (same scale only)
    if isinstance(src, DecimalType) and isinstance(target, DecimalType):
        return v if src.scale == target.scale else None
    return None


# --------------------------------------------------------------------------
# Binary (de)serialization — Iceberg single-value spec
# --------------------------------------------------------------------------


def literal_to_bytes(lit: Literal) -> bytes:
    t, v = lit.literal_type, lit.value
    if isinstance(t, BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(t, IntegerType):
        return struct.pack("<i", v)
    if isinstance(t, (LongType, TimeType, TimestampType, TimestampTzType,
                      TimestampNsType, TimestampTzNsType)):
        return struct.pack("<q", v)
    if isinstance(t, DateType):
        return struct.pack("<i", v)
    if isinstance(t, FloatType):
        return struct.pack("<f", v)
    if isinstance(t, DoubleType):
        return struct.pack("<d", v)
    if isinstance(t, StringType):
        return v.encode("utf-8")
    if isinstance(t, UUIDType):
        return v.bytes  # big-endian 16 bytes
    if isinstance(t, (BinaryType, FixedType)):
        return bytes(v)
    if isinstance(t, DecimalType):
        from .transforms import _min_twos_complement_len

        # explicit 80-digit context: the default 28-digit context rounds
        # 29..38-digit unscaled values during scaleb, corrupting stats
        # bounds on write (r8 review wave 3)
        with _decimal.localcontext() as _ctx:
            _ctx.prec = 80
            unscaled = int(v.scaleb(t.scale).to_integral_value())
        # MINIMAL two's complement (Java BigInteger.toByteArray): the
        # old formula padded exact negative powers like -128 to ff80,
        # spec-divergent bytes for external readers (r6)
        length = _min_twos_complement_len(unscaled)
        return unscaled.to_bytes(length, "big", signed=True)
    raise TypeError(f"cannot serialize {lit!r}")


def literal_from_bytes(data: bytes, t: IcebergType) -> Literal:
    """Type-dispatched decode of stats bytes (reference
    literals.go:90-149)."""
    if isinstance(t, BooleanType):
        return Literal(data[0] != 0, t)
    if isinstance(t, IntegerType):
        return Literal(struct.unpack("<i", data)[0], t)
    if isinstance(t, (LongType, TimeType, TimestampType, TimestampTzType,
                      TimestampNsType, TimestampTzNsType)):
        return Literal(struct.unpack("<q", data)[0], t)
    if isinstance(t, DateType):
        return Literal(struct.unpack("<i", data)[0], t)
    if isinstance(t, FloatType):
        return Literal(struct.unpack("<f", data)[0], t)
    if isinstance(t, DoubleType):
        return Literal(struct.unpack("<d", data)[0], t)
    if isinstance(t, StringType):
        return Literal(data.decode("utf-8"), t)
    if isinstance(t, UUIDType):
        return Literal(_uuid.UUID(bytes=bytes(data)), t)
    if isinstance(t, FixedType):
        if len(data) != t.length:
            raise ValueError(f"fixed[{t.length}] from {len(data)} bytes")
        return Literal(bytes(data), t)
    if isinstance(t, BinaryType):
        return Literal(bytes(data), t)
    if isinstance(t, DecimalType):
        unscaled = int.from_bytes(data, "big", signed=True)
        # same 80-digit context on decode: a correctly-written 38-digit
        # bound must not round while rescaling (r8 review wave 3)
        with _decimal.localcontext() as _ctx:
            _ctx.prec = 80
            return Literal(Decimal(unscaled).scaleb(-t.scale), t)
    raise TypeError(f"cannot deserialize {t}")


# --------------------------------------------------------------------------
# Ordering helpers for bounds comparison (metrics evaluator)
# --------------------------------------------------------------------------


def compare_values(a: Any, b: Any, t: IcebergType) -> int:
    """Total order per type; UUIDs compare as 16-byte big-endian
    (reference literals.go:707-715), bytes lexicographically."""
    if isinstance(t, UUIDType):
        a, b = a.bytes if isinstance(a, _uuid.UUID) else a, b.bytes if isinstance(b, _uuid.UUID) else b
    if isinstance(t, BooleanType):
        a, b = int(a), int(b)
    return (a > b) - (a < b)


# --------------------------------------------------------------------------
# JSON single-value serialization (Iceberg table spec Appendix D) —
# the representation of column default values (`initial-default` /
# `write-default`, a V3 feature) inside table metadata JSON.
#
# Internal Python representations match Literal conventions: int for
# int/long, int days for date, int µs for time/timestamp/timestamptz,
# float, str, bool, Decimal, uuid.UUID, bytes for fixed/binary;
# composites use dict[int, Any] keyed by field id for struct, list for
# list, and list[tuple[key, value]] for map (keys may be unhashable).
# --------------------------------------------------------------------------


def _fmt_time_micros(micros: int) -> str:
    if not 0 <= micros < 86_400_000_000:
        raise ValueError(f"time out of range: {micros}µs")
    s, us = divmod(micros, 1_000_000)
    h, rem = divmod(s, 3600)
    m, sec = divmod(rem, 60)
    return f"{h:02d}:{m:02d}:{sec:02d}.{us:06d}"


def _fmt_ts_micros(micros: int) -> str:
    dt = datetime(1970, 1, 1) + timedelta(microseconds=micros)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f")


def _fmt_ts_nanos(nanos: int) -> str:
    """ISO form with a 9-digit fraction (spec Appendix D for the V3
    ns types); the sub-µs residue is appended to the µs formatting."""
    micros, rem = divmod(nanos, 1000)  # floor division: rem in [0,1000)
    return _fmt_ts_micros(micros) + f"{rem:03d}"


def json_single_value(t: IcebergType, v: Any) -> Any:
    """Encode an internal-representation value as the JSON form the
    spec mandates for that type (nulls are not encodable: a null
    default is expressed by OMITTING initial-default/write-default)."""
    from .types import ListType, MapType, StructType

    if v is None:
        raise ValueError("null is not a JSON single value; omit the default instead")
    if isinstance(t, BooleanType):
        if not isinstance(v, bool):
            raise TypeError(f"boolean default from {type(v).__name__}")
        return v
    if isinstance(t, (IntegerType, LongType)):
        if isinstance(v, bool) or not isinstance(v, int):
            raise TypeError(f"{t.name} default from {type(v).__name__}")
        lo, hi = (INT_MIN, INT_MAX) if isinstance(t, IntegerType) else (LONG_MIN, LONG_MAX)
        if not lo <= v <= hi:
            raise ValueError(f"{t.name} default out of range: {v}")
        return v
    if isinstance(t, (FloatType, DoubleType)):
        if isinstance(v, bool):
            raise TypeError(f"{t.name} default from bool")
        v = float(v)
        if not _math.isfinite(v):
            # the spec's JSON form for float/double is a JSON number;
            # NaN/Infinity have no defined encoding and spec-strict
            # readers reject any string here — refuse at write time
            raise ValueError(f"{t.name} default must be finite, got {v}")
        return v
    if isinstance(t, DecimalType):
        d = _to_decimal(v, t)
        if d is None:
            raise ValueError(f"{v!r} does not fit decimal({t.precision},{t.scale})")
        return f"{d:f}"
    if isinstance(t, DateType):
        return (_EPOCH_DATE + timedelta(days=int(v))).isoformat()
    if isinstance(t, TimeType):
        return _fmt_time_micros(int(v))
    if isinstance(t, TimestampType):
        return _fmt_ts_micros(int(v))
    if isinstance(t, TimestampTzType):
        return _fmt_ts_micros(int(v)) + "+00:00"
    if isinstance(t, TimestampNsType):
        return _fmt_ts_nanos(int(v))
    if isinstance(t, TimestampTzNsType):
        return _fmt_ts_nanos(int(v)) + "+00:00"
    if isinstance(t, StringType):
        if not isinstance(v, str):
            raise TypeError(f"string default from {type(v).__name__}")
        return v
    if isinstance(t, UUIDType):
        return str(v if isinstance(v, _uuid.UUID) else _uuid.UUID(str(v)))
    if isinstance(t, FixedType):
        if len(v) != t.length:
            raise ValueError(f"fixed[{t.length}] default of {len(v)} bytes")
        return bytes(v).hex()
    if isinstance(t, BinaryType):
        return bytes(v).hex()
    if isinstance(t, StructType):
        if not isinstance(v, dict):
            raise TypeError("struct default must be a dict keyed by field id")
        by_id = {f.field_id: f for f in t.fields}
        unknown = set(v) - set(by_id)
        if unknown:
            raise ValueError(f"struct default has unknown field ids: {sorted(unknown)}")
        out = {}
        for fid, fv in v.items():
            if fv is None:
                continue  # spec: only non-null fields appear
            out[str(fid)] = json_single_value(by_id[fid].field_type, fv)
        for f in t.fields:
            if f.required and str(f.field_id) not in out:
                raise ValueError(f"struct default missing required field {f.field_id}")
        return out
    if isinstance(t, ListType):
        return [
            None if e is None else json_single_value(t.element_type, e) for e in v
        ]
    if isinstance(t, MapType):
        keys, vals = [], []
        for k, mv in v:
            keys.append(json_single_value(t.key_type, k))
            vals.append(None if mv is None else json_single_value(t.value_type, mv))
        return {"keys": keys, "values": vals}
    raise TypeError(f"cannot JSON-encode a {t} value")


def parse_json_single_value(t: IcebergType, j: Any) -> Any:
    """Decode the metadata-JSON form back to the internal
    representation (inverse of json_single_value)."""
    from .types import ListType, MapType, StructType

    if j is None:
        raise ValueError("null is not a JSON single value")
    if isinstance(t, BooleanType):
        if not isinstance(j, bool):
            raise TypeError(f"boolean from JSON {type(j).__name__}")
        return j
    if isinstance(t, (IntegerType, LongType)):
        if isinstance(j, bool) or not isinstance(j, int):
            raise TypeError(f"{t.name} from JSON {type(j).__name__}")
        lo, hi = (INT_MIN, INT_MAX) if isinstance(t, IntegerType) else (LONG_MIN, LONG_MAX)
        if not lo <= j <= hi:
            raise ValueError(f"{t.name} out of range: {j}")
        return j
    if isinstance(t, (FloatType, DoubleType)):
        # spec: a JSON number; NaN/Infinity have no defined JSON form
        if isinstance(j, bool) or not isinstance(j, (int, float)):
            raise TypeError(f"{t.name} from JSON {type(j).__name__}")
        return float(j)
    if isinstance(t, DecimalType):
        d = _to_decimal(Decimal(str(j)), t)
        if d is None:
            raise ValueError(f"{j!r} does not fit decimal({t.precision},{t.scale})")
        return d
    if isinstance(t, DateType):
        return _parse_date(j)
    if isinstance(t, TimeType):
        return _parse_time(j)
    if isinstance(t, (TimestampType, TimestampTzType)):
        return _parse_ts(j)
    if isinstance(t, _NS_TYPES):
        return _parse_ts_ns(j)
    if isinstance(t, StringType):
        if not isinstance(j, str):
            raise TypeError(f"string from JSON {type(j).__name__}")
        return j
    if isinstance(t, UUIDType):
        return _uuid.UUID(j)
    if isinstance(t, FixedType):
        b = bytes.fromhex(j)
        if len(b) != t.length:
            raise ValueError(f"fixed[{t.length}] from {len(b)} bytes")
        return b
    if isinstance(t, BinaryType):
        return bytes.fromhex(j)
    if isinstance(t, StructType):
        # ids absent from `t` are skipped, not rejected: scans decode
        # defaults against the PROJECTED (column-pruned) schema, which
        # may have dropped sub-fields the stored default still carries
        by_id = {str(f.field_id): f for f in t.fields}
        return {
            int(k): parse_json_single_value(by_id[k].field_type, fv)
            for k, fv in j.items()
            if k in by_id
        }
    if isinstance(t, ListType):
        return [
            None if e is None else parse_json_single_value(t.element_type, e)
            for e in j
        ]
    if isinstance(t, MapType):
        keys, vals = j["keys"], j["values"]
        if len(keys) != len(vals):
            raise ValueError("map JSON keys/values length mismatch")
        return [
            (
                parse_json_single_value(t.key_type, k),
                None if v is None else parse_json_single_value(t.value_type, v),
            )
            for k, v in zip(keys, vals)
        ]
    raise TypeError(f"cannot JSON-decode a {t} value")
