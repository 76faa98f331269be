"""Inclusive metrics evaluator truth table (reference
visitors.go:185-305 + Iceberg-spec extensions) against hand-built
DataFiles, and inclusive projection through transforms."""

import struct

from icegopher_spark.iceberg.evaluators import (
    InclusiveMetricsEvaluator,
    ManifestEvaluator,
    PartitionEvaluator,
    inclusive_projection,
)
from icegopher_spark.iceberg.expressions import (
    AlwaysTrue,
    equal_to,
    greater_than,
    greater_than_or_equal,
    is_in,
    is_null,
    less_than,
    not_equal_to,
    not_null,
    starts_with,
)
from icegopher_spark.iceberg.manifests import DataFile, FieldSummary
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.transforms import (
    PartitionField,
    PartitionSpec,
    parse_transform,
)
from icegopher_spark.iceberg.types import (
    DoubleType,
    IntegerType,
    LongType,
    NestedField,
    StringType,
)

SCHEMA = Schema(
    (
        NestedField(1, "id", LongType(), True),
        NestedField(2, "name", StringType(), False),
        NestedField(3, "score", DoubleType(), False),
    )
)


def make_file(
    lo_id=None, hi_id=None, nulls_name=None, values_name=None, lo_name=None, hi_name=None, n=100
):
    lower, upper = {}, {}
    if lo_id is not None:
        lower[1] = struct.pack("<q", lo_id)
    if hi_id is not None:
        upper[1] = struct.pack("<q", hi_id)
    if lo_name is not None:
        lower[2] = lo_name.encode()
    if hi_name is not None:
        upper[2] = hi_name.encode()
    value_counts = {1: n}
    null_counts = {1: 0}
    if values_name is not None:
        value_counts[2] = values_name
    if nulls_name is not None:
        null_counts[2] = nulls_name
    return DataFile(
        file_path="/f.parquet",
        record_count=n,
        file_size_in_bytes=n * 10,
        value_counts=value_counts,
        null_value_counts=null_counts,
        lower_bounds=lower or None,
        upper_bounds=upper or None,
    )


def ev(expr):
    return InclusiveMetricsEvaluator(SCHEMA, expr)


def test_empty_file_never_matches():
    f = make_file(lo_id=0, hi_id=10, n=0)
    assert ev(AlwaysTrue()).eval(f) is False


def test_bounds_lt():
    f = make_file(lo_id=10, hi_id=20)
    assert ev(less_than("id", 10)).eval(f) is False
    assert ev(less_than("id", 11)).eval(f) is True
    assert ev(less_than("id", 5)).eval(f) is False


def test_bounds_gt_ge():
    f = make_file(lo_id=10, hi_id=20)
    assert ev(greater_than("id", 20)).eval(f) is False
    assert ev(greater_than("id", 19)).eval(f) is True
    assert ev(greater_than_or_equal("id", 20)).eval(f) is True
    assert ev(greater_than_or_equal("id", 21)).eval(f) is False


def test_eq_in_bounds():
    f = make_file(lo_id=10, hi_id=20)
    assert ev(equal_to("id", 15)).eval(f) is True
    assert ev(equal_to("id", 9)).eval(f) is False
    assert ev(equal_to("id", 21)).eval(f) is False
    assert ev(is_in("id", 1, 2, 15)).eval(f) is True
    assert ev(is_in("id", 1, 2, 3)).eval(f) is False


def test_ne_always_might_match():
    f = make_file(lo_id=10, hi_id=10)
    assert ev(not_equal_to("id", 10)).eval(f) is True


def test_null_count_pruning():
    f = make_file(values_name=100, nulls_name=0)
    assert ev(is_null("name")).eval(f) is False
    f2 = make_file(values_name=100, nulls_name=100)
    assert ev(not_null("name")).eval(f2) is False
    assert ev(equal_to("name", "x")).eval(f2) is False  # all nulls


def test_missing_stats_might_match():
    f = DataFile(file_path="/f", record_count=5, file_size_in_bytes=50)
    assert ev(equal_to("id", 123456)).eval(f) is True
    assert ev(is_null("name")).eval(f) is True


def test_starts_with_bounds():
    f = make_file(values_name=10, nulls_name=0, lo_name="apple", hi_name="banana")
    assert ev(starts_with("name", "app")).eval(f) is True
    assert ev(starts_with("name", "cherry")).eval(f) is False
    assert ev(starts_with("name", "aa")).eval(f) is False


# -- inclusive projection --------------------------------------------------


def day_spec():
    schema = Schema(
        (
            NestedField(1, "id", LongType(), True),
            NestedField(2, "ts", __import__("icegopher_spark.iceberg.types", fromlist=["TimestampType"]).TimestampType(), False),
        )
    )
    spec = PartitionSpec(
        [
            PartitionField(2, 1000, "ts_day", parse_transform("day")),
            PartitionField(1, 1001, "id_bucket", parse_transform("bucket[8]")),
        ]
    )
    return schema, spec


def test_projection_identity():
    schema = SCHEMA
    spec = PartitionSpec([PartitionField(1, 1000, "id_p", parse_transform("identity"))])
    proj = inclusive_projection(schema, spec, equal_to("id", 5))
    assert "id_p" in repr(proj)


def test_projection_bucket_eq_only():
    schema, spec = day_spec()
    proj = inclusive_projection(schema, spec, equal_to("id", 34))
    # bucket[8] of long 34 → 2017239379 & MAX % 8
    expected = (2017239379 & 0x7FFFFFFF) % 8
    assert f"eq(ref(id_bucket), {expected})" in repr(proj)
    # range predicates don't project through bucket
    proj2 = inclusive_projection(schema, spec, greater_than("id", 34))
    assert repr(proj2) == "true"


def test_projection_day_monotonic():
    schema, spec = day_spec()
    micros = 1510871468000000  # 2017-11-16T22:31:08 → day 17486
    proj = inclusive_projection(schema, spec, less_than("ts", micros))
    assert "le(ref(ts_day), 17486)" in repr(proj)


def test_partition_evaluator():
    schema, spec = day_spec()
    pf = inclusive_projection(schema, spec, equal_to("id", 34))
    pe = PartitionEvaluator(spec, schema, pf)
    bucket = (2017239379 & 0x7FFFFFFF) % 8
    assert pe.eval({"ts_day": 100, "id_bucket": bucket}) is True
    assert pe.eval({"ts_day": 100, "id_bucket": bucket + 1}) is False


def test_manifest_evaluator_bounds():
    schema = SCHEMA
    spec = PartitionSpec([PartitionField(1, 1000, "id_p", parse_transform("identity"))])
    pf = inclusive_projection(schema, spec, equal_to("id", 5))
    me = ManifestEvaluator(spec, schema, pf)
    inside = [FieldSummary(False, None, struct.pack("<q", 0), struct.pack("<q", 10))]
    outside = [FieldSummary(False, None, struct.pack("<q", 50), struct.pack("<q", 99))]
    assert me.eval(inside) is True
    assert me.eval(outside) is False
    assert me.eval([]) is True  # no summaries → can't prune
