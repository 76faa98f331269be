"""Partition transforms: parse, Python evaluation (for metadata /
planning), Spark Column evaluation (for write clustering), and inclusive
predicate projection (for partition pruning).

The reference parses transforms but never evaluates them
(partitions.go:179-225; PartitionType returns empty at 179-183), so
evaluation semantics here come from the Iceberg spec. Bucket hashing is
the spec's 32-bit Murmur3 over the single-value binary encoding —
implemented in pure Python (driver) and as a vectorized pandas UDF
(executors); verified against the spec's published test vectors.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
import uuid as _uuid
from dataclasses import dataclass
from decimal import Decimal
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .types import (
    BinaryType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")

MICROS_PER_HOUR = 3_600_000_000
MICROS_PER_DAY = 86_400_000_000


# --------------------------------------------------------------------------
# Murmur3 x86 32-bit (public algorithm, Austin Appleby) — seed 0
# --------------------------------------------------------------------------

_C1, _C2 = 0xCC9E2D51, 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Returns a SIGNED 32-bit hash (matching Java int semantics)."""
    h = seed & _M32
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def _min_twos_complement_len(v: int) -> int:
    """MINIMAL two's-complement byte length (Java BigInteger.toByteArray,
    which the Iceberg spec's decimal hashing requires). The old
    (bit_length + 8) // 8 formula over-padded exact negative powers
    -2^(8k-1) (-128 encoded as ff80, spec says 80) — a DIFFERENT
    murmur3 bucket than every other engine computes (r6 review)."""
    if v < 0:
        return ((~v).bit_length() + 8) // 8
    return max((v.bit_length() + 8) // 8, 1)


def _bucket_encode(value: Any, t: IcebergType) -> bytes:
    """Single-value encoding for bucket hashing (Iceberg spec)."""
    from .types import TimestampNsType, TimestampTzNsType

    if isinstance(
        t,
        (
            IntegerType,
            LongType,
            DateType,
            TimeType,
            TimestampType,
            TimestampTzType,
            # V3: bucket over timestamp_ns hashes the raw nanos long
            # (spec appendix B hashes the underlying long value)
            TimestampNsType,
            TimestampTzNsType,
        ),
    ):
        return struct.pack("<q", int(value))
    if isinstance(t, StringType):
        return value.encode("utf-8")
    if isinstance(t, DecimalType):
        # explicit high-precision context: the DEFAULT 28-digit context
        # silently ROUNDS unscaled values of decimal(29..38) columns,
        # hashing the wrong bytes (r8 review wave 3; literals._to_decimal
        # fixed the same trap in r6)
        import decimal as _dec

        with _dec.localcontext() as _ctx:
            _ctx.prec = 80
            unscaled = int(Decimal(value).scaleb(t.scale).to_integral_value())
        length = _min_twos_complement_len(unscaled)
        return unscaled.to_bytes(length, "big", signed=True)
    if isinstance(t, UUIDType):
        return value.bytes if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value)).bytes
    if isinstance(t, (BinaryType, FixedType)):
        return bytes(value)
    if isinstance(t, (FloatType, DoubleType)):
        return struct.pack("<q", struct.unpack("<q", struct.pack("<d", float(value)))[0])
    raise TypeError(f"cannot bucket type {t}")


def bucket_hash(value: Any, t: IcebergType) -> int:
    return murmur3_32(_bucket_encode(value, t))


def murmur3_32_vec8(vals):
    """Vectorized murmur3_32 over little-endian 8-byte encodings.

    ``vals`` is an int64 numpy array holding the spec's ``<q`` encoding
    (ints/longs directly; dates as epoch days; timestamps as epoch µs).
    An 8-byte input is exactly two 4-byte blocks with no tail, so the
    whole hash is branch-free and vectorizes: bit-identical to
    ``murmur3_32(struct.pack("<q", v))`` for every int64 ``v``.
    Returns a uint64 array whose low 32 bits are the (unsigned) hash.
    """
    import numpy as np

    m = np.uint64(_M32)
    u = vals.astype(np.int64).view(np.uint64)
    h = np.zeros(len(u), dtype=np.uint64)
    for k in (u & m, (u >> np.uint64(32)) & m):
        k = (k * np.uint64(_C1)) & m
        k = ((k << np.uint64(15)) | (k >> np.uint64(17))) & m
        k = (k * np.uint64(_C2)) & m
        h ^= k
        h = ((h << np.uint64(13)) | (h >> np.uint64(19))) & m
        h = (h * np.uint64(5) + np.uint64(0xE6546B64)) & m
    h ^= np.uint64(8)  # length
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & m
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & m
    h ^= h >> np.uint64(16)
    return h


def murmur3_32_vec_bytes(buf, offsets, lengths):
    """Vectorized murmur3_32 over variable-length byte strings.

    ``buf`` is a flat uint8 array holding every row's encoding
    back-to-back; ``offsets``/``lengths`` (int64) locate each slice.
    Blocks are gathered four bytes at a time with per-row active masks,
    so the kernel runs ``max(len)//4 + 1`` numpy passes instead of a
    Python loop per value — bit-identical to ``murmur3_32(bytes)`` for
    every input (verified against random byte strings in
    test_transforms). Returns a uint64 array whose low 32 bits are the
    (unsigned) hash.
    """
    import numpy as np

    m = np.uint64(_M32)
    c1, c2 = np.uint64(_C1), np.uint64(_C2)
    n = len(offsets)
    # pad so 4-byte gathers at a row boundary stay in range
    data = np.concatenate([np.asarray(buf, dtype=np.uint8), np.zeros(4, dtype=np.uint8)]).astype(
        np.uint64
    )
    off = np.asarray(offsets, dtype=np.int64)
    ln = np.asarray(lengths, dtype=np.int64)
    nblocks = ln // 4
    h = np.zeros(n, dtype=np.uint64)
    for j in range(int(nblocks.max()) if n else 0):
        active = nblocks > j
        # inactive rows gather from offset 0 (discarded) to stay in bounds
        base = np.where(active, off + 4 * j, 0)
        k = (
            data[base]
            | (data[base + 1] << np.uint64(8))
            | (data[base + 2] << np.uint64(16))
            | (data[base + 3] << np.uint64(24))
        )
        k = (k * c1) & m
        k = ((k << np.uint64(15)) | (k >> np.uint64(17))) & m
        k = (k * c2) & m
        h2 = h ^ k
        h2 = ((h2 << np.uint64(13)) | (h2 >> np.uint64(19))) & m
        h2 = (h2 * np.uint64(5) + np.uint64(0xE6546B64)) & m
        h = np.where(active, h2, h)
    # tail (1-3 bytes): same mixing as a block but no h-rotate step
    tail_len = ln - 4 * nblocks
    base = off + 4 * nblocks  # == next row's offset at most; padded
    k = np.zeros(n, dtype=np.uint64)
    k = np.where(tail_len >= 3, k ^ (data[base + 2] << np.uint64(16)), k)
    k = np.where(tail_len >= 2, k ^ (data[base + 1] << np.uint64(8)), k)
    k = np.where(tail_len >= 1, k ^ data[base], k)
    k = (k * c1) & m
    k = ((k << np.uint64(15)) | (k >> np.uint64(17))) & m
    k = (k * c2) & m
    h = np.where(tail_len >= 1, h ^ k, h)
    h ^= ln.astype(np.uint64) & m
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & m
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & m
    h ^= h >> np.uint64(16)
    return h


# --------------------------------------------------------------------------
# Transforms
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Transform:
    name: str

    def __str__(self) -> str:
        return self.name

    # Python-side evaluation on a single value (None-safe)
    def apply(self, value: Any, source_type: IcebergType) -> Any:
        raise NotImplementedError

    # Spark-side evaluation for write clustering / pruning
    def to_column(self, col: Column, source_type: IcebergType) -> Column:
        raise NotImplementedError

    # result type of the transform
    def result_type(self, source_type: IcebergType) -> IcebergType:
        return source_type


class IdentityTransform(Transform):
    def __init__(self) -> None:
        super().__init__("identity")

    def apply(self, value, source_type):
        return value

    def to_column(self, col, source_type):
        return col


class VoidTransform(Transform):
    def __init__(self) -> None:
        super().__init__("void")

    def apply(self, value, source_type):
        return None

    def to_column(self, col, source_type):
        return F.lit(None)

    def result_type(self, source_type):
        return source_type


@dataclass(frozen=True)
class BucketTransform(Transform):
    num_buckets: int = 0

    def __init__(self, num_buckets: int) -> None:
        object.__setattr__(self, "name", f"bucket[{num_buckets}]")
        object.__setattr__(self, "num_buckets", num_buckets)

    def apply(self, value, source_type):
        if value is None:
            return None
        return (bucket_hash(value, source_type) & 0x7FFFFFFF) % self.num_buckets

    def to_column(self, col, source_type):
        """Iceberg-spec bucket as a vectorized pandas UDF.

        Spark's built-in F.hash is Murmur3 with seed 42 and different
        per-type encodings — NOT bit-compatible — so for correct bucket
        pruning and write clustering we compute the spec hash in a
        pandas UDF (numpy-vectorized for 8-byte integer encodings, the
        overwhelmingly common bucket sources).

        For those 8-byte sources the Iceberg int64 encoding is computed
        JVM-SIDE (unix_micros / unix_date / long cast) and a NON-NULL
        long column handed to the UDF (nulls re-applied with when()):
        the arrow→pandas hop otherwise converts nullable longs to
        float64 — corrupting values ≥ 2^53 — and timestamps to
        datetime64[ns], which crashes outside 1677-2262 (r6 review)."""
        n = self.num_buckets
        if isinstance(source_type, (IntegerType, LongType)):
            enc = col.cast("long")
        elif isinstance(source_type, (TimestampType, TimestampTzType)):
            enc = F.unix_micros(col.cast("timestamp"))
        elif isinstance(source_type, DateType):
            enc = F.unix_date(col.cast("date"))
        else:
            return _bucket_udf(n, source_type)(col)
        hashed = _bucket_udf_int64(n)(F.coalesce(enc, F.lit(0)))
        return F.when(col.isNotNull(), hashed)

    def result_type(self, source_type):
        return IntegerType()


def _series_to_int64_encoding(s, st: IcebergType):
    """(int64 values, null mask) for the 8-byte-encoded bucket sources.

    Masked positions hold 0 (hashed then discarded) so the hash kernel
    never sees NaT/NaN sentinels."""
    import numpy as np
    import pandas as pd

    if isinstance(st, (TimestampType, TimestampTzType)):
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(s.dtype):
            mask = s.isna().to_numpy()
            # view the payload at the series' NATIVE unit: converting
            # to datetime64[ns] first silently WRAPS values outside
            # 1677-2262 (e.g. the 9999-12-31 'no expiry' sentinel
            # encoded as year 1816 → wrong bucket/partition; r6 review)
            arr = s.to_numpy()
            unit = np.datetime_data(arr.dtype)[0]
            iv = np.where(mask, 0, arr.view("int64"))  # zero NaT payloads
            scale_up = {"s": 1_000_000, "ms": 1_000, "us": 1}
            micros = iv // 1_000 if unit == "ns" else iv * scale_up[unit]
            return micros, mask
        # object dtype of datetime.datetime (pyarrow timestamp_as_object
        # or far-range values): exact integer micros, mirroring the
        # DateType object path below — falling through to the generic
        # int64 conversion raised TypeError (r8 review wave 3)
        mask = s.isna().to_numpy()
        epoch_dt = _dt.datetime(1970, 1, 1)
        one_us = _dt.timedelta(microseconds=1)
        micros = np.fromiter(
            (
                0
                if m
                else (
                    (v.astimezone(_dt.timezone.utc).replace(tzinfo=None) if v.tzinfo else v)
                    - epoch_dt
                )
                // one_us
                for v, m in zip(s, mask.tolist())
            ),
            dtype=np.int64,
            count=len(s),
        )
        return micros, mask
    elif isinstance(st, DateType):
        mask = s.isna().to_numpy()
        if pd.api.types.is_datetime64_any_dtype(s.dtype):
            arr = s.to_numpy()
            unit = np.datetime_data(arr.dtype)[0]
            iv = np.where(mask, 0, arr.view("int64"))
            per_day = {"s": 86_400, "ms": 86_400_000, "us": 86_400_000_000,
                       "ns": 86_400_000_000_000}[unit]
            # floor division is exact for date-valued timestamps and
            # spec-correct (floor) for any stray intra-day component
            return iv // per_day, mask
        # Arrow hands DateType over as object datetime.date: exact
        # ordinal arithmetic — pd.to_datetime would crash (ns range)
        # on far dates like 9999-12-31 (r6 review)
        epoch = _dt.date(1970, 1, 1)
        days = np.fromiter(
            (0 if m else (v - epoch).days for v, m in zip(s, mask.tolist())),
            dtype=np.int64,
            count=len(s),
        )
        return days, mask
    elif pd.api.types.is_integer_dtype(s.dtype):
        if isinstance(s.dtype, pd.api.extensions.ExtensionDtype):
            # nullable Int64: to_numpy(int64) raises on NA; fillna
            # keeps exact int64 values (r6 review)
            mask = s.isna().to_numpy()
            return s.fillna(0).to_numpy(dtype="int64"), mask
        return s.to_numpy(dtype="int64"), np.zeros(len(s), dtype=bool)
    mask = s.isna().to_numpy()
    if pd.api.types.is_float_dtype(s.dtype):
        # int column with nulls converted to float64 upstream: values
        # at/above 2^53 have ALREADY lost precision and would hash to
        # the wrong bucket — pruning would then silently drop their
        # rows. Refuse loudly; callers should convert arrow->pandas
        # with integer_object_nulls=True instead (r6 review).
        vals = s.fillna(0.0).to_numpy(dtype="float64")
        if np.any(np.abs(vals) >= 2.0**53):
            raise ValueError(
                "int64 bucket source arrived as float64 with values >= 2^53 "
                "(precision already lost); convert with integer_object_nulls=True"
            )
        return vals.astype("int64"), mask
    # object dtype (python ints + None): exact conversion
    return s.fillna(0).to_numpy(dtype="int64"), mask


def bucket_series(s, n: int, st: IcebergType):
    """Vectorized spec-bucket of a pandas Series -> nullable Int32
    Series. The single kernel entry point shared by the Spark pandas
    UDF (``_bucket_udf``) and the datasource write path's partition
    evaluation (dsv2._partition_keys) — no per-row Python anywhere."""
    import numpy as np
    import pandas as pd

    if isinstance(st, (IntegerType, LongType, DateType, TimestampType, TimestampTzType)):
        vals, mask = _series_to_int64_encoding(s, st)
        h = murmur3_32_vec8(vals)
    elif isinstance(st, (FloatType, DoubleType)):
        # spec: hash the double's IEEE bits as an 8-byte <q encoding —
        # routes through the fixed-width numpy kernel. NaN is treated as
        # null (matches the pre-vectorized behavior; pandas cannot
        # distinguish NaN-value from null in a float column anyway).
        mask = s.isna().to_numpy()
        h = murmur3_32_vec8(s.fillna(0.0).to_numpy(dtype=np.float64).view(np.int64))
    else:
        # variable-length encodings (string/decimal/uuid/binary): encode
        # once per value (thin C-level call), then hash all rows in one
        # vectorized flat-buffer pass (round-5: was per-row Python)
        mask = s.isna().to_numpy()
        vals = s.to_numpy(dtype=object)
        if isinstance(st, StringType):
            enc = [b"" if m else v.encode("utf-8") for v, m in zip(vals, mask.tolist())]
        else:
            enc = [
                b"" if m else _bucket_encode(_coerce(v, st), st)
                for v, m in zip(vals, mask.tolist())
            ]
        lengths = np.fromiter(map(len, enc), dtype=np.int64, count=len(enc))
        offsets = np.zeros(len(enc), dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
        h = murmur3_32_vec_bytes(buf, offsets, lengths)
    res = ((h & np.uint64(0x7FFFFFFF)) % np.uint64(n)).astype("int32")
    out = pd.array(res, dtype="Int32")
    out[mask] = pd.NA
    return pd.Series(out)


def _bucket_udf(n: int, st: IcebergType):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _bucket(s: pd.Series) -> pd.Series:
        return bucket_series(s, n, st)

    _bucket.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_bucket, "int")


def _bucket_udf_int64(n: int):
    """Bucket over a PRE-ENCODED, non-null int64 column (the JVM-side
    encoding in BucketTransform.to_column): the series arrives as exact
    numpy int64, so the flat murmur3 kernel applies directly."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _bucket(s: pd.Series) -> pd.Series:
        import numpy as np

        h = murmur3_32_vec8(s.to_numpy(dtype="int64"))
        res = ((h & np.uint64(0x7FFFFFFF)) % np.uint64(n)).astype("int32")
        return pd.Series(res)

    _bucket.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_bucket, "int")


def _coerce(v: Any, t: IcebergType) -> Any:
    """Convert Spark/pandas natural values to the transform's expected
    encoding input (dates → epoch days, timestamps → µs)."""
    import datetime as dt

    import pandas as pd

    if isinstance(t, DateType) and isinstance(v, (dt.date,)):
        return (v - dt.date(1970, 1, 1)).days
    if isinstance(t, (TimestampType, TimestampTzType)):
        if isinstance(v, pd.Timestamp):
            return v.value // 1000
        if isinstance(v, dt.datetime):
            ts = v.replace(tzinfo=v.tzinfo or dt.timezone.utc)
            # integer arithmetic: float .timestamp()*1e6 is off by
            # multiple µs beyond 2^53 µs (~year 2255) and int() rounds
            # toward zero (r6 review, reproduced numerically)
            epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
            return (ts - epoch) // dt.timedelta(microseconds=1)
    return v


@dataclass(frozen=True)
class TruncateTransform(Transform):
    width: int = 0

    def __init__(self, width: int) -> None:
        object.__setattr__(self, "name", f"truncate[{width}]")
        object.__setattr__(self, "width", width)

    def apply(self, value, source_type):
        if value is None:
            return None
        w = self.width
        if isinstance(source_type, (IntegerType, LongType)):
            return value - (value % w)  # Python % is floor-mod, spec-correct for negatives
        if isinstance(source_type, DecimalType):
            # high-precision context: the default 28-digit context rounds
            # 29..38-digit unscaled values on BOTH scaleb calls (r8 wave 3)
            import decimal as _dec

            with _dec.localcontext() as _ctx:
                _ctx.prec = 80
                unscaled = int(
                    Decimal(value).scaleb(source_type.scale).to_integral_value()
                )
                return Decimal(unscaled - (unscaled % w)).scaleb(
                    -source_type.scale
                )
        if isinstance(source_type, StringType):
            return value[:w]
        if isinstance(source_type, (BinaryType, FixedType)):
            return bytes(value)[:w]
        raise TypeError(f"cannot truncate {source_type}")

    def to_column(self, col, source_type):
        w = self.width
        if isinstance(source_type, (IntegerType, LongType)):
            # floor semantics for negatives: v - pmod(v, w)
            return col - F.pmod(col, F.lit(w))
        if isinstance(source_type, StringType):
            return F.substring(col, 1, w)
        if isinstance(source_type, DecimalType):
            # pure decimal arithmetic: the old long-cast + float `/`
            # lost precision above 2^53 unscaled and NULLed p>=19
            # values, writing wrong/null partition keys (r6 review).
            # pmod(value, w·10^-s) == (unscaled mod w)·10^-s exactly.
            s = source_type.scale
            step = F.lit(Decimal(w).scaleb(-s))
            return (col - F.pmod(col, step)).cast(
                f"decimal({source_type.precision},{s})"
            )
        if isinstance(source_type, (BinaryType, FixedType)):
            # F.substring works on BINARY directly (returns binary);
            # the old _jc.toString() SQL-text detour broke on column
            # names needing quoting and under Spark Connect (r6 review)
            return F.substring(col, 1, w)
        raise TypeError(f"cannot truncate {source_type}")


class _TemporalTransform(Transform):
    def apply(self, value, source_type):
        if value is None:
            return None
        if isinstance(source_type, DateType):
            days = value
            return self._from_days(days)
        from .types import TimestampNsType, TimestampTzNsType

        if isinstance(source_type, (TimestampNsType, TimestampTzNsType)):
            # V3 nanos: floor-divide to micros first (the spec's temporal
            # transforms are defined on the µs plane; treating nanos as
            # micros made projected day ordinals 1000x too large, so
            # eq/ge pruning silently dropped every file — r8 wave 3)
            return self._from_micros(value // 1000)
        micros = value
        return self._from_micros(micros)

    def _from_days(self, days: int) -> int:
        raise NotImplementedError

    def _from_micros(self, micros: int) -> int:
        raise NotImplementedError

    def result_type(self, source_type):
        return IntegerType()


def _days_to_ymd(days: int) -> tuple[int, int, int]:
    import datetime as dt

    d = dt.date(1970, 1, 1) + dt.timedelta(days=days)
    return d.year, d.month, d.day


def _floordiv_col(num: Column, div: int) -> Column:
    """Exact floor division of a long column (pmod-based, no float
    truncation-toward-zero bug for negative pre-1970 values)."""
    d = F.lit(div)
    return ((num - F.pmod(num, d)) / d).cast("long")


_EPOCH_DATE = "1970-01-01"


def _utc_days_col(col: Column, source_type: IcebergType) -> Column:
    """Epoch-day ordinal of a date/timestamp column, always agreeing
    with the Python ``apply()`` path regardless of
    ``spark.sql.session.timeZone``.

    Iceberg ``timestamp`` maps to Spark TIMESTAMP_NTZ (wall clock): the
    ordinal comes from ``to_date``, a timezone-free field extraction —
    casting ntz to TIMESTAMP first would reinterpret the wall clock in
    the session zone and shift the partition value. Iceberg
    ``timestamptz`` maps to Spark TIMESTAMP (an instant):
    ``unix_micros`` is exact and zone-independent there."""
    if isinstance(source_type, DateType):
        return F.datediff(col, F.lit(_EPOCH_DATE).cast("date")).cast("long")
    if isinstance(source_type, TimestampType):  # ntz wall clock
        return F.datediff(F.to_date(col), F.lit(_EPOCH_DATE).cast("date")).cast("long")
    return _floordiv_col(F.unix_micros(col), MICROS_PER_DAY)


def _utc_date_col(col: Column, source_type: IcebergType) -> Column:
    """The column as its Iceberg calendar DATE (identity for date
    sources, wall-clock date for ntz, UTC date for timestamptz)."""
    if isinstance(source_type, DateType):
        return col
    if isinstance(source_type, TimestampType):  # ntz wall clock
        return F.to_date(col)
    return F.date_add(
        F.lit(_EPOCH_DATE).cast("date"), _utc_days_col(col, source_type).cast("int")
    )


class YearTransform(_TemporalTransform):
    def __init__(self) -> None:
        super().__init__("year")

    def _from_days(self, days):
        return _days_to_ymd(days)[0] - 1970

    def _from_micros(self, micros):
        days = micros // MICROS_PER_DAY
        return _days_to_ymd(days)[0] - 1970

    def to_column(self, col, source_type):
        return (F.year(_utc_date_col(col, source_type)) - F.lit(1970)).cast("int")


class MonthTransform(_TemporalTransform):
    def __init__(self) -> None:
        super().__init__("month")

    def _from_days(self, days):
        y, m, _ = _days_to_ymd(days)
        return (y - 1970) * 12 + m - 1

    def _from_micros(self, micros):
        return self._from_days(micros // MICROS_PER_DAY)

    def to_column(self, col, source_type):
        d = _utc_date_col(col, source_type)
        return ((F.year(d) - F.lit(1970)) * 12 + F.month(d) - F.lit(1)).cast("int")


class DayTransform(_TemporalTransform):
    def __init__(self) -> None:
        super().__init__("day")

    def _from_days(self, days):
        return days

    def _from_micros(self, micros):
        return micros // MICROS_PER_DAY

    def to_column(self, col, source_type):
        # Emit a DATE column (not an int ordinal): Spark then writes
        # ISO partition dirs (ts_day=2020-01-01) exactly like Iceberg's
        # human-readable convention, and the dir parser round-trips it.
        return _utc_date_col(col, source_type)

    def result_type(self, source_type):
        return DateType()


class HourTransform(_TemporalTransform):
    def __init__(self) -> None:
        super().__init__("hour")

    def _from_days(self, days):
        raise TypeError("hour transform not valid for date columns")

    def _from_micros(self, micros):
        return micros // MICROS_PER_HOUR

    def to_column(self, col, source_type):
        # floor (not truncate-toward-zero) so pre-1970 timestamps agree
        # with the Python apply() path; ntz uses field extraction
        # (hour ordinal = day ordinal × 24 + wall-clock hour) to stay
        # independent of the session timezone
        if isinstance(source_type, DateType):
            # mirror _from_days: fail with the same clear error instead
            # of an opaque AnalysisException from unix_micros on a DATE
            raise TypeError("hour transform not valid for date columns")
        if isinstance(source_type, TimestampType):  # ntz wall clock
            return (_utc_days_col(col, source_type) * F.lit(24) + F.hour(col)).cast("int")
        return _floordiv_col(F.unix_micros(col), MICROS_PER_HOUR).cast("int")


def parse_transform(s: str) -> Transform:
    """Parse a transform string (reference partitions.go:189-225)."""
    sl = s.lower()
    if sl == "identity":
        return IdentityTransform()
    if sl == "void":
        return VoidTransform()
    if sl in ("year", "years"):
        return YearTransform()
    if sl in ("month", "months"):
        return MonthTransform()
    if sl in ("day", "days", "date"):
        return DayTransform()
    if sl in ("hour", "hours", "date_hour"):
        return HourTransform()
    m = _BUCKET_RE.match(sl)
    if m:
        n = int(m.group(1))
        if n <= 0:
            # loud at parse time, not ZeroDivisionError mid-scan (r8 w3)
            raise ValueError(f"bucket width must be positive: {s!r}")
        return BucketTransform(n)
    m = _TRUNCATE_RE.match(sl)
    if m:
        n = int(m.group(1))
        if n <= 0:
            # truncate[0] silently maps every value to ''/b'' (r8 w3)
            raise ValueError(f"truncate width must be positive: {s!r}")
        return TruncateTransform(n)
    raise ValueError(f"invalid transform: {s!r}")


# --------------------------------------------------------------------------
# Partition spec
# --------------------------------------------------------------------------

PARTITION_DATA_ID_START = 1000


@dataclass(frozen=True)
class PartitionField:
    """(reference partitions.go:40-45)"""

    source_id: int
    field_id: int
    name: str
    transform: Transform

    def __str__(self) -> str:
        return f"{self.field_id}: {self.name}: {self.transform}({self.source_id})"


class PartitionSpec:
    def __init__(self, fields: list[PartitionField] | tuple[PartitionField, ...] = (), spec_id: int = 0):
        self.fields = tuple(fields)
        self.spec_id = spec_id

    def __eq__(self, other):
        return (
            isinstance(other, PartitionSpec)
            and self.spec_id == other.spec_id
            and self.fields == other.fields
        )

    def __repr__(self):
        inner = ", ".join(str(f) for f in self.fields)
        return f"PartitionSpec(spec_id={self.spec_id}, [{inner}])"

    @property
    def is_unpartitioned(self) -> bool:
        return not self.fields or all(isinstance(f.transform, VoidTransform) for f in self.fields)

    def fields_by_source_id(self, source_id: int) -> list[PartitionField]:
        return [f for f in self.fields if f.source_id == source_id]

    def to_json_dict(self) -> dict:
        return {
            "spec-id": self.spec_id,
            "fields": [
                {
                    "source-id": f.source_id,
                    "field-id": f.field_id,
                    "name": f.name,
                    "transform": str(f.transform),
                }
                for f in self.fields
            ],
        }

    @classmethod
    def from_json_dict(cls, obj: dict) -> "PartitionSpec":
        fields = [
            PartitionField(
                source_id=f["source-id"],
                field_id=f.get("field-id", PARTITION_DATA_ID_START + i),
                name=f["name"],
                transform=parse_transform(f["transform"]),
            )
            for i, f in enumerate(obj.get("fields", ()))
        ]
        return cls(fields, spec_id=obj.get("spec-id", 0))

    def partition_type(self, schema) -> "Any":
        """The struct type of partition tuples under this spec — the
        piece the reference left unimplemented (partitions.go:179-183)."""
        from .types import NestedField, StructType

        fields = []
        for pf in self.fields:
            src = schema.find_field(pf.source_id)
            if src is None:
                raise ValueError(f"partition source id {pf.source_id} not in schema")
            fields.append(
                NestedField(pf.field_id, pf.name, pf.transform.result_type(src.field_type), False)
            )
        return StructType(tuple(fields))


UNPARTITIONED_SPEC = PartitionSpec()
