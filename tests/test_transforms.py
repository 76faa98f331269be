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
