"""Transform parsing (reference partitions_test.go:30-80) and
evaluation against the Iceberg spec's published bucket-hash vectors —
evaluation is the part the reference never implemented."""

import uuid
from decimal import Decimal

import pytest

from icegopher_spark.iceberg import types as it
from icegopher_spark.iceberg.transforms import (
    BucketTransform,
    IdentityTransform,
    PartitionField,
    PartitionSpec,
    TruncateTransform,
    VoidTransform,
    bucket_hash,
    murmur3_32,
    parse_transform,
)


@pytest.mark.parametrize(
    "s,expected",
    [
        ("identity", "identity"),
        ("IdEnTiTy", "identity"),
        ("void", "void"),
        ("year", "year"),
        ("years", "year"),
        ("month", "month"),
        ("day", "day"),
        ("date", "day"),
        ("hour", "hour"),
        ("date_hour", "hour"),
        ("bucket[5]", "bucket[5]"),
        ("bucket[100]", "bucket[100]"),
        ("truncate[10]", "truncate[10]"),
    ],
)
def test_parse_transform(s, expected):
    assert str(parse_transform(s)) == expected


@pytest.mark.parametrize("bad", ["bucket[]", "bucket", "truncate[]", "unknown", ""])
def test_parse_transform_invalid(bad):
    with pytest.raises(ValueError):
        parse_transform(bad)


# Iceberg spec Appendix B test vectors
SPEC_VECTORS = [
    (34, it.IntegerType(), 2017239379),
    (34, it.LongType(), 2017239379),
    (17486, it.DateType(), -653330422),
    (81068000000, it.TimeType(), -662762989),
    (1510871468000000, it.TimestampType(), -2047944441),
    (Decimal("14.20"), it.DecimalType(9, 2), -500754589),
    ("iceberg", it.StringType(), 1210000089),
    (uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"), it.UUIDType(), 1488055340),
    (b"\x00\x01\x02\x03", it.BinaryType(), -188683207),
]


@pytest.mark.parametrize("value,t,expected", SPEC_VECTORS)
def test_bucket_hash_spec_vectors(value, t, expected):
    assert bucket_hash(value, t) == expected


def test_murmur_empty():
    assert murmur3_32(b"") == 0


def test_bucket_apply():
    t = BucketTransform(16)
    assert t.apply(34, it.IntegerType()) == (2017239379 & 0x7FFFFFFF) % 16
    assert t.apply(None, it.IntegerType()) is None


def test_truncate_ints_floor_semantics():
    t = TruncateTransform(10)
    assert t.apply(1, it.IntegerType()) == 0
    assert t.apply(-1, it.IntegerType()) == -10
    assert t.apply(10, it.IntegerType()) == 10
    assert t.apply(-10, it.IntegerType()) == -10


def test_truncate_string_decimal():
    assert TruncateTransform(3).apply("iceberg", it.StringType()) == "ice"
    assert TruncateTransform(50).apply(Decimal("10.65"), it.DecimalType(9, 2)) == Decimal("10.50")


def test_temporal_transforms():
    d = 17486  # 2017-11-16
    assert parse_transform("year").apply(d, it.DateType()) == 47
    assert parse_transform("month").apply(d, it.DateType()) == 574
    assert parse_transform("day").apply(d, it.DateType()) == 17486
    micros = 1510871468000000  # 2017-11-16T22:31:08
    assert parse_transform("hour").apply(micros, it.TimestampType()) == 419686
    assert parse_transform("year").apply(micros, it.TimestampType()) == 47


def test_void_identity():
    assert VoidTransform().apply(42, it.IntegerType()) is None
    assert IdentityTransform().apply(42, it.IntegerType()) == 42


def test_partition_spec_json_roundtrip():
    spec = PartitionSpec(
        [
            PartitionField(3, 1000, "flag", parse_transform("identity")),
            PartitionField(1, 1001, "okb", parse_transform("bucket[4]")),
        ],
        spec_id=3,
    )
    again = PartitionSpec.from_json_dict(spec.to_json_dict())
    assert again == spec
    assert not spec.is_unpartitioned
    assert PartitionSpec().is_unpartitioned


def test_partition_type():
    from icegopher_spark.iceberg.schema import Schema

    schema = Schema(
        (
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "ts", it.TimestampType(), False),
        )
    )
    spec = PartitionSpec(
        [
            PartitionField(2, 1000, "ts_day", parse_transform("day")),
            PartitionField(1, 1001, "id_bucket", parse_transform("bucket[8]")),
        ]
    )
    pt = spec.partition_type(schema)
    assert [str(f.field_type) for f in pt.fields] == ["date", "int"]
    assert [f.field_id for f in pt.fields] == [1000, 1001]


# ---- vectorized murmur3 kernel (round-4: the 8-byte hot path) ----


def test_murmur_vec8_matches_scalar():
    """The numpy kernel must be bit-identical to murmur3_32 over the
    <q encoding for every int64 — random draws plus the edge lattice."""
    import struct

    import numpy as np

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64),
            np.array(
                [0, 1, -1, 34, 17486, 1510871468000000, 2**63 - 1, -(2**63), 2**31, -(2**31)],
                dtype=np.int64,
            ),
        ]
    )
    from icegopher_spark.iceberg.transforms import murmur3_32_vec8

    h = murmur3_32_vec8(vals)
    for v, hv in zip(vals.tolist(), h.tolist()):
        expect = murmur3_32(struct.pack("<q", v)) & 0xFFFFFFFF
        assert (hv & 0xFFFFFFFF) == expect, v


def test_bucket_udf_vectorized_nulls_and_temporal(spark):
    """Spark round-trip through the pandas UDF: long/date/timestamp
    columns with nulls/NaT bucket identically to the scalar apply()."""
    import datetime as dt

    import pyspark.sql.functions as F

    t16 = BucketTransform(16)
    rows = [
        (34, dt.date(2017, 11, 16), dt.datetime(2017, 11, 16, 22, 31, 8)),
        (None, None, None),
        (-7, dt.date(1969, 12, 31), dt.datetime(1969, 12, 31, 23, 59, 59)),
        (2**62, dt.date(2100, 1, 1), dt.datetime(2100, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "id long, d date, ts timestamp")
    out = df.select(
        t16.to_column(F.col("id"), it.LongType()).alias("b_id"),
        t16.to_column(F.col("d"), it.DateType()).alias("b_d"),
        t16.to_column(F.col("ts"), it.TimestampType()).alias("b_ts"),
    ).collect()

    epoch = dt.date(1970, 1, 1)
    for (id_, d, ts), row in zip(rows, out):
        if id_ is None:
            assert row.b_id is None and row.b_d is None and row.b_ts is None
            continue
        assert row.b_id == t16.apply(id_, it.LongType())
        assert row.b_d == t16.apply((d - epoch).days, it.DateType())
        micros = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        assert row.b_ts == t16.apply(micros, it.TimestampType())


def test_bucket_udf_scalar_path_string(spark):
    """String bucket source matches the spec hash (vectorized r5)."""
    import pyspark.sql.functions as F

    t = BucketTransform(16)
    df = spark.createDataFrame([("iceberg",), (None,)], "s string")
    out = df.select(t.to_column(F.col("s"), it.StringType()).alias("b")).collect()
    assert out[0].b == (1210000089 & 0x7FFFFFFF) % 16
    assert out[1].b is None


def test_murmur_vec_bytes_matches_scalar():
    """The variable-length numpy kernel must be bit-identical to
    murmur3_32 for arbitrary byte strings: random lengths 0..67 covering
    every tail residue, plus spec-vector encodings."""
    import numpy as np

    from icegopher_spark.iceberg.transforms import murmur3_32_vec_bytes

    rng = np.random.default_rng(11)
    chunks = [bytes(rng.integers(0, 256, size=int(ln), dtype=np.uint8)) for ln in rng.integers(0, 68, size=500)]
    chunks += [b"", b"a", b"ab", b"abc", b"abcd", "iceberg".encode(), b"\x00" * 9]
    lengths = np.array([len(c) for c in chunks], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    buf = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    h = murmur3_32_vec_bytes(buf, offsets, lengths)
    for c, hv in zip(chunks, h.tolist()):
        assert (hv & 0xFFFFFFFF) == (murmur3_32(c) & 0xFFFFFFFF), c


def test_bucket_udf_vectorized_varlen_types(spark):
    """Spark round-trip: string/decimal/binary/double bucket sources
    agree with the scalar spec path, nulls preserved."""
    from decimal import Decimal

    import pyspark.sql.functions as F

    t = BucketTransform(32)
    rows = [
        ("howl", Decimal("12.34"), bytearray(b"\x00\x01\x02\x03"), 1.5),
        (None, None, None, None),
        ("", Decimal("-99.99"), bytearray(b""), -0.0),
        ("héllo wörld", Decimal("0.00"), bytearray(b"\xff" * 9), float("inf")),
    ]
    df = spark.createDataFrame(rows, "s string, d decimal(10,2), b binary, f double")
    out = df.select(
        t.to_column(F.col("s"), it.StringType()).alias("bs"),
        t.to_column(F.col("d"), it.DecimalType(10, 2)).alias("bd"),
        t.to_column(F.col("b"), it.BinaryType()).alias("bb"),
        t.to_column(F.col("f"), it.DoubleType()).alias("bf"),
    ).collect()
    for (s, d, b, f), row in zip(rows, out):
        assert row.bs == (None if s is None else t.apply(s, it.StringType()))
        assert row.bd == (None if d is None else t.apply(d, it.DecimalType(10, 2)))
        assert row.bb == (None if b is None else t.apply(bytes(b), it.BinaryType()))
        assert row.bf == (None if f is None else t.apply(f, it.DoubleType()))


def test_bucket_series_hypothesis_unicode():
    """Property check (no Spark needed): bucket_series must equal the
    scalar spec path for arbitrary unicode strings and decimals."""
    from decimal import Decimal

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from icegopher_spark.iceberg.transforms import BucketTransform, bucket_series

    t = BucketTransform(64)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(st.text(max_size=40), st.none()), max_size=25))
    def check_strings(vals):
        s = pd.Series(vals, dtype=object)
        got = bucket_series(s, 64, it.StringType()).tolist()
        want = [None if v is None else t.apply(v, it.StringType()) for v in vals]
        assert [None if g is pd.NA else g for g in got] == want

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.decimals(
                min_value=-10**9, max_value=10**9, places=2, allow_nan=False
            ),
            max_size=20,
        )
    )
    def check_decimals(vals):
        s = pd.Series([Decimal(v) for v in vals], dtype=object)
        got = bucket_series(s, 64, it.DecimalType(12, 2)).tolist()
        want = [t.apply(v, it.DecimalType(12, 2)) for v in vals]
        assert list(got) == want

    check_strings()
    check_decimals()


def test_decimal_bucket_minimal_twos_complement():
    """r6: -128 must encode as the spec's minimal b'\\x80' (Java
    BigInteger.toByteArray), not padded b'\\xff\\x80' — different bytes
    hash to a different murmur3 bucket than every other engine."""
    from decimal import Decimal

    from icegopher_spark.iceberg.transforms import _bucket_encode, _min_twos_complement_len
    from icegopher_spark.iceberg.types import DecimalType

    t = DecimalType(9, 2)
    assert _bucket_encode(Decimal("-1.28"), t) == b"\x80"
    assert _bucket_encode(Decimal("-327.68"), t) == b"\x80\x00"
    assert _bucket_encode(Decimal("1.27"), t) == b"\x7f"
    assert _bucket_encode(Decimal("1.28"), t) == b"\x00\x80"
    # exhaustive parity with int.to_bytes minimal round-trip
    for v in range(-70000, 70000, 7):
        n = _min_twos_complement_len(v)
        assert int.from_bytes(v.to_bytes(n, "big", signed=True), "big", signed=True) == v
        if n > 1:  # minimality: one byte fewer must NOT fit
            import pytest as _pt

            with _pt.raises(OverflowError):
                v.to_bytes(n - 1, "big", signed=True)


def test_truncate_decimal_column_exact_beyond_2_53(spark):
    """r6: the truncate[w] decimal column path must match apply()
    exactly for unscaled values beyond float precision."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from icegopher_spark.iceberg.transforms import parse_transform
    from icegopher_spark.iceberg.types import DecimalType

    t = DecimalType(18, 2)
    tr = parse_transform("truncate[10]")
    vals = [Decimal("123456789012345.67"), Decimal("-123456789012345.67"), Decimal("0.05")]
    df = spark.createDataFrame([(v,) for v in vals], f"d decimal(18,2)")
    got = [r["out"] for r in df.select(tr.to_column(F.col("d"), t).alias("out")).collect()]
    want = [tr.apply(v, t) for v in vals]
    assert got == want


def test_bucket_series_nullable_int64_extension_exact():
    """r6: nullable Int64 extension arrays crashed to_numpy; and the
    float64 fallback corrupted values >= 2^53. Exact paths now."""
    import pandas as pd
    import pytest

    from icegopher_spark.iceberg.transforms import BucketTransform, bucket_series
    from icegopher_spark.iceberg.types import LongType

    big = 2**53 + 1
    tr = BucketTransform(16)
    # Int64 extension with a null: exact, matches the scalar spec path
    s = pd.Series(pd.array([big, None, 7], dtype="Int64"))
    out = bucket_series(s, 16, LongType())
    assert out[1] is pd.NA or pd.isna(out[1])
    assert out[0] == tr.apply(big, LongType())
    assert out[2] == tr.apply(7, LongType())
    # object dtype (python ints + None): also exact
    s2 = pd.Series([big, None, 7], dtype=object)
    out2 = bucket_series(s2, 16, LongType())
    assert out2[0] == tr.apply(big, LongType())
    # float64 with already-lost precision: loud refusal, not wrong buckets
    s3 = pd.Series([float(big), None])
    with pytest.raises(ValueError, match="2\\^53"):
        bucket_series(s3, 16, LongType())


def test_binary_truncate_to_column(spark):
    """r6: binary truncate used a _jc.toString() SQL detour that broke
    on names needing quoting; F.substring works on binary directly."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg.transforms import TruncateTransform
    from icegopher_spark.iceberg.types import BinaryType

    df = spark.createDataFrame([(bytearray(b"abcdef"),)], "`raw payload` binary")
    col = TruncateTransform(4).to_column(F.col("`raw payload`"), BinaryType())
    [row] = df.select(col.alias("t")).collect()
    assert bytes(row["t"]) == b"abcd"


def test_bucket_series_far_range_timestamp_and_date():
    """r6: converting to datetime64[ns] wrapped values outside
    1677-2262 (9999-12-31 hashed as year 1816 — wrong bucket, silently
    pruned rows). The encoder must view the series' native unit."""
    import datetime as dt

    import pandas as pd

    from icegopher_spark.iceberg.transforms import BucketTransform, bucket_series
    from icegopher_spark.iceberg.types import DateType, TimestampType

    tr = BucketTransform(16)
    far = dt.datetime(9999, 12, 31, 0, 0, 0)
    s = pd.Series([far, None]).astype("datetime64[us]")
    out = bucket_series(s, 16, TimestampType())
    micros = (far.replace(tzinfo=dt.timezone.utc) - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)) // dt.timedelta(microseconds=1)
    assert out[0] == tr.apply(micros, TimestampType())
    assert pd.isna(out[1])
    # object datetime.date far-range: exact ordinal arithmetic
    s2 = pd.Series([dt.date(9999, 12, 31), None], dtype=object)
    out2 = bucket_series(s2, 16, DateType())
    days = (dt.date(9999, 12, 31) - dt.date(1970, 1, 1)).days
    assert out2[0] == tr.apply(days, DateType())
    assert pd.isna(out2[1])


def test_decimal38_bucket_truncate_exact():
    """r8 review wave 3: the DEFAULT 28-digit Decimal context silently
    rounded 29..38-digit unscaled values inside scaleb, hashing the
    wrong bucket bytes and truncating to the wrong partition value."""
    from decimal import Decimal

    from icegopher_spark.iceberg.transforms import (
        TruncateTransform,
        _bucket_encode,
    )
    from icegopher_spark.iceberg.types import DecimalType

    t = DecimalType(38, 2)
    v = Decimal("123456789012345678901234567890123456.78")
    enc = _bucket_encode(v, t)
    want_unscaled = 12345678901234567890123456789012345678
    assert int.from_bytes(enc, "big", signed=True) == want_unscaled
    tr = TruncateTransform(10)
    got = tr.apply(v, t)
    # expectation computed in a wide context (the default 28-digit one
    # rounds this very assertion — the exact trap under test)
    import decimal as _dec

    with _dec.localcontext() as ctx:
        ctx.prec = 80
        want = Decimal(want_unscaled - (want_unscaled % 10)).scaleb(-2)
    assert got == want == Decimal("123456789012345678901234567890123456.70")


def test_decimal38_bound_bytes_exact():
    """Stats-bound serde must round-trip 38-digit decimals exactly."""
    from decimal import Decimal

    from icegopher_spark.iceberg.literals import (
        Literal,
        literal_from_bytes,
        literal_to_bytes,
    )
    from icegopher_spark.iceberg.types import DecimalType

    t = DecimalType(38, 2)
    v = Decimal("123456789012345678901234567890123456.78")
    data = literal_to_bytes(Literal(v, t))
    back = literal_from_bytes(data, t)
    assert back.value == v


def test_ns_timestamp_transforms():
    """r8 review wave 3: temporal transforms on V3 ns timestamps must
    floor to the µs plane first (nanos-as-micros made projected day
    ordinals 1000x too large → every file pruned); bucket hashes the
    raw nanos long instead of raising."""
    from icegopher_spark.iceberg.transforms import (
        BucketTransform,
        DayTransform,
        HourTransform,
        YearTransform,
        bucket_hash,
    )
    from icegopher_spark.iceberg.types import (
        TimestampNsType,
        TimestampType,
        TimestampTzNsType,
    )

    micros = 1_709_251_200_000_000  # 2024-03-01T00:00:00
    nanos = micros * 1000
    for tr in (DayTransform(), HourTransform(), YearTransform()):
        assert tr.apply(nanos, TimestampNsType()) == tr.apply(
            micros, TimestampType()
        ), tr
        # pre-1970 floor behavior matches too (floorDiv by 1000)
        assert tr.apply(-nanos - 1, TimestampNsType()) == tr.apply(
            -micros - 1, TimestampType()
        ), tr
    # bucket: hashes the nanos long (no TypeError), deterministic
    b = BucketTransform(16)
    assert 0 <= b.apply(nanos, TimestampTzNsType()) < 16
    assert bucket_hash(nanos, TimestampNsType()) == bucket_hash(
        nanos, TimestampNsType()
    )


def test_parse_transform_rejects_zero_width():
    import pytest

    from icegopher_spark.iceberg.transforms import parse_transform

    with pytest.raises(ValueError, match="positive"):
        parse_transform("bucket[0]")
    with pytest.raises(ValueError, match="positive"):
        parse_transform("truncate[0]")


def test_bucket_series_object_dtype_timestamps():
    """r8 review wave 3: an object-dtype series of datetime.datetime
    (pyarrow timestamp_as_object / far-range values) must bucket-encode
    exactly like the datetime64 path, not crash in the int64 fallback."""
    import datetime as dt

    import pandas as pd

    from icegopher_spark.iceberg.transforms import bucket_series
    from icegopher_spark.iceberg.types import TimestampType

    stamps = [
        dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
        None,
        dt.datetime(9999, 12, 31, 23, 59, 59),  # outside datetime64[ns]
        dt.datetime(1950, 6, 1),
    ]
    obj = pd.Series(stamps, dtype="object")
    got = bucket_series(obj, 16, TimestampType())
    assert got[1] is pd.NA or pd.isna(got[1])
    # the representable subset agrees with the datetime64[us] path
    native = pd.Series(
        pd.array([stamps[0], None, None, stamps[3]], dtype="datetime64[us]")
    )
    want = bucket_series(native, 16, TimestampType())
    assert got[0] == want[0] and got[3] == want[3]
    assert 0 <= got[2] < 16
