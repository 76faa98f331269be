"""Literal casts, sentinels, and byte-exact binary round-trip — the
de-facto conformance suite for stats decoding (fixtures match the
reference's literals_test.go:395-437 byte values, which are the public
Iceberg single-value spec)."""

import struct
import uuid
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from icegopher_spark.iceberg.literals import (
    FloatAboveMax,
    FloatBelowMin,
    IntAboveMax,
    IntBelowMin,
    L,
    Literal,
    LongAboveMax,
    LongBelowMin,
    compare_values,
    literal_from_bytes,
    literal_to_bytes,
)
from icegopher_spark.iceberg.types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)


# -- simple conversions (reference TestLiteralSimpleConversions) -----------


def test_int_to_long_float_double():
    lit = L(34, IntegerType())
    assert lit.to(LongType()).value == 34
    assert lit.to(FloatType()).value == 34.0
    assert lit.to(DoubleType()).value == 34.0


def test_int_to_date_time():
    assert L(17486, IntegerType()).to(DateType()).value == 17486


def test_string_casts():
    assert L("2017-08-18").to(DateType()).value == 17396
    assert L("14:21:01.919").to(TimeType()).value == 51661919000
    assert L("2017-08-18T14:21:01.919234").to(TimestampType()).value == 1503066061919234
    assert L("true").to(BooleanType()).value is True
    assert L("12345").to(IntegerType()).value == 12345
    assert L("3.14").to(DoubleType()).value == 3.14
    u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert L(str(u)).to(UUIDType()).value == u


def test_string_decimal_cast():
    assert L("34.560").to(DecimalType(8, 3)).value == Decimal("34.560")


def test_invalid_casts_raise():
    with pytest.raises(ValueError):
        L(True, BooleanType()).to(IntegerType())
    with pytest.raises(ValueError):
        L("notanumber").to(IntegerType())


# -- overflow sentinels (reference TestLiteralConvertOutsideBounds) --------


def test_long_to_int_sentinels():
    assert L(2**40, LongType()).to(IntegerType()) is IntAboveMax
    assert L(-(2**40), LongType()).to(IntegerType()) is IntBelowMin
    assert L(34, LongType()).to(IntegerType()).value == 34


def test_string_to_long_sentinels():
    assert L(str(2**70)).to(LongType()) is LongAboveMax
    assert L(str(-(2**70))).to(LongType()) is LongBelowMin


def test_double_to_float_sentinels():
    assert L(1e40, DoubleType()).to(FloatType()) is FloatAboveMax
    assert L(-1e40, DoubleType()).to(FloatType()) is FloatBelowMin


# -- binary round trip (reference TestLiteralRoundTripMarshal) -------------

BYTE_FIXTURES = [
    (Literal(True, BooleanType()), b"\x01"),
    (Literal(False, BooleanType()), b"\x00"),
    (Literal(1234, IntegerType()), b"\xd2\x04\x00\x00"),
    (Literal(1234, LongType()), b"\xd2\x04\x00\x00\x00\x00\x00\x00"),
    (Literal(struct.unpack("<f", b"\x00\x00\x90\xc0")[0], FloatType()), b"\x00\x00\x90\xc0"),
    (Literal(-4.5, DoubleType()), struct.pack("<d", -4.5)),
    (Literal(17486, DateType()), b"\x4e\x44\x00\x00"),
    (Literal(81068000000, TimeType()), struct.pack("<q", 81068000000)),
    (Literal(1510871468000000, TimestampType()), struct.pack("<q", 1510871468000000)),
    (Literal("iceberg", StringType()), b"iceberg"),
    (
        Literal(uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"), UUIDType()),
        bytes.fromhex("f79c3e09677c4bbda4793f349cb785e7"),
    ),
    (Literal(b"\x01\x02\x03", BinaryType()), b"\x01\x02\x03"),
    (Literal(b"\x01\x02\x03", FixedType(3)), b"\x01\x02\x03"),
]


@pytest.mark.parametrize("lit,expected", BYTE_FIXTURES)
def test_byte_fixture_roundtrip(lit, expected):
    assert literal_to_bytes(lit) == expected
    back = literal_from_bytes(expected, lit.literal_type)
    assert back.value == lit.value


def test_decimal_twos_complement():
    # 14.20 scale 2 → unscaled 1420 → minimal big-endian two's complement
    lit = Literal(Decimal("14.20"), DecimalType(9, 2))
    data = literal_to_bytes(lit)
    assert int.from_bytes(data, "big", signed=True) == 1420
    assert literal_from_bytes(data, DecimalType(9, 2)).value == Decimal("14.20")
    neg = Literal(Decimal("-14.20"), DecimalType(9, 2))
    datan = literal_to_bytes(neg)
    assert int.from_bytes(datan, "big", signed=True) == -1420
    assert literal_from_bytes(datan, DecimalType(9, 2)).value == Decimal("-14.20")


# -- property-based round trips --------------------------------------------


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
@settings(max_examples=200)
def test_int_roundtrip(v):
    t = IntegerType()
    assert literal_from_bytes(literal_to_bytes(Literal(v, t)), t).value == v


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200)
def test_long_roundtrip(v):
    t = LongType()
    assert literal_from_bytes(literal_to_bytes(Literal(v, t)), t).value == v


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=200)
def test_double_roundtrip(v):
    t = DoubleType()
    assert literal_from_bytes(literal_to_bytes(Literal(v, t)), t).value == v


@given(st.text(max_size=100))
@settings(max_examples=200)
def test_string_roundtrip(v):
    t = StringType()
    assert literal_from_bytes(literal_to_bytes(Literal(v, t)), t).value == v


@given(st.decimals(allow_nan=False, allow_infinity=False, places=2, min_value=-(10**20), max_value=10**20))
@settings(max_examples=200)
def test_decimal_roundtrip(v):
    t = DecimalType(24, 2)
    assert literal_from_bytes(literal_to_bytes(Literal(v, t)), t).value == v


def test_uuid_ordering_bytes():
    a = uuid.UUID("00000000-0000-0000-0000-000000000001")
    b = uuid.UUID("ff000000-0000-0000-0000-000000000000")
    assert compare_values(a, b, UUIDType()) < 0


def test_timestamp_tz_crosscasts():
    """r6: micros are identical for ntz/tz; a naive datetime literal
    must bind against a timestamptz column instead of 'cannot cast'."""
    from icegopher_spark.iceberg.types import TimestampType, TimestampTzType

    lit = Literal(1_000_000, TimestampType())
    assert lit.to(TimestampTzType()).value == 1_000_000
    lit2 = Literal(1_000_000, TimestampTzType())
    assert lit2.to(TimestampType()).value == 1_000_000


def test_double_to_float_infinity_passthrough():
    from icegopher_spark.iceberg.types import DoubleType, FloatType

    assert Literal(float("inf"), DoubleType()).to(FloatType()).value == float("inf")
    assert Literal(float("-inf"), DoubleType()).to(FloatType()).value == float("-inf")


def test_float_to_decimal_large_values_no_crash():
    """r6: quantize under the default 28-digit context raised
    InvalidOperation for values that FIT the target type."""
    import pytest

    from icegopher_spark.iceberg.types import DecimalType, DoubleType

    # 1e20 at scale 10 needs 31 digits — fits decimal(38,10)
    out = Literal(1e20, DoubleType()).to(DecimalType(38, 10))
    assert out.value == Decimal("100000000000000000000.0000000000")
    # 1e30 at scale 10 needs 41 digits — beyond precision 38: clean error
    with pytest.raises(ValueError, match="cannot cast"):
        Literal(1e30, DoubleType()).to(DecimalType(38, 10))


def test_long_literal_beyond_int64_folds_to_sentinel():
    """r6: L(2**70) carried an un-encodable LongType value and the
    same-type early return skipped sentinel folding entirely."""
    from icegopher_spark.iceberg.literals import LongAboveMax, LongBelowMin
    from icegopher_spark.iceberg.types import LongType

    assert Literal(2**70, LongType()).to(LongType()) is LongAboveMax
    assert Literal(-(2**70), LongType()).to(LongType()) is LongBelowMin
