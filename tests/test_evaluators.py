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


# ---- round-5 review: NaN soundness across all three pruning planes ----


def _nan_file():
    """All-NaN double column `score` (field 3): 10 values, all NaN."""
    return DataFile(
        file_path="/nan",
        record_count=10,
        file_size_in_bytes=100,
        value_counts={3: 10},
        null_value_counts={3: 0},
        nan_value_counts={3: 10},
    )


def test_metrics_all_nan_ne_not_in_might_match():
    """NaN != x and NaN NOT IN (...) are TRUE in Spark/DuckDB — an
    all-NaN file must not be pruned for ne/not_in (or gt/ge)."""
    from icegopher_spark.iceberg.expressions import not_in

    f = _nan_file()
    for expr in (
        not_equal_to("score", 5.0),
        not_in("score", 5.0, 6.0),
        greater_than("score", 5.0),
        greater_than_or_equal("score", 5.0),
    ):
        assert InclusiveMetricsEvaluator(SCHEMA, expr).eval(f) is True, expr
    # ...while the ops NaN can never satisfy still prune
    for expr in (less_than("score", 5.0), equal_to("score", 5.0), is_in("score", 5.0)):
        assert InclusiveMetricsEvaluator(SCHEMA, expr).eval(f) is False, expr


def test_metrics_nan_literal_never_prunes():
    """col < NaN is TRUE for every non-NaN value in Spark — bounds
    cannot reason about a NaN literal."""
    f = make_file(lo_id=0, hi_id=10)
    nan = float("nan")
    for expr in (
        less_than("score", nan),
        greater_than("score", nan),
        equal_to("score", nan),
        not_equal_to("score", nan),
    ):
        assert InclusiveMetricsEvaluator(SCHEMA, expr).eval(make_file(lo_id=0, hi_id=10)) is True, expr
    assert InclusiveMetricsEvaluator(SCHEMA, is_in("score", nan, 5.0)).eval(f) is True


_NAN_SPEC = PartitionSpec([PartitionField(3, 1000, "score_p", parse_transform("identity"))])


def test_manifest_null_and_nan_partitions_not_null_might_match():
    """contains_null + contains_nan + no bounds: NaN partitions are
    non-null, so not_null must NOT prune the manifest."""
    ev = ManifestEvaluator(_NAN_SPEC, SCHEMA, not_null("score_p"))
    s = FieldSummary(contains_null=True, contains_nan=True, lower_bound=None, upper_bound=None)
    assert ev.eval([s]) is True
    # with NaN ruled out it IS all-null and prunes
    s2 = FieldSummary(contains_null=True, contains_nan=False, lower_bound=None, upper_bound=None)
    assert ManifestEvaluator(_NAN_SPEC, SCHEMA, not_null("score_p")).eval([s2]) is False


def test_manifest_all_nan_partitions_gt_might_match():
    """No usable bounds + contains_nan: gt/ge may match (NaN sorts above
    everything); lt/eq still prune when there are no nulls."""
    s = FieldSummary(contains_null=False, contains_nan=True, lower_bound=None, upper_bound=None)
    assert ManifestEvaluator(_NAN_SPEC, SCHEMA, greater_than("score_p", 5.0)).eval([s]) is True
    assert ManifestEvaluator(_NAN_SPEC, SCHEMA, less_than("score_p", 5.0)).eval([s]) is False
    assert ManifestEvaluator(_NAN_SPEC, SCHEMA, equal_to("score_p", 5.0)).eval([s]) is False


def test_writer_partition_summaries_nan_safe():
    """Writer summaries: NaN partition values must not poison min/max
    (which would null the bounds and prune matching files) and must set
    contains_nan."""
    from icegopher_spark.iceberg.write import _partition_summaries

    files = [
        DataFile(file_path="/a", record_count=1, file_size_in_bytes=1, partition={"score_p": float("nan")}),
        DataFile(file_path="/b", record_count=1, file_size_in_bytes=1, partition={"score_p": 1.0}),
    ]
    (s,) = _partition_summaries(_NAN_SPEC, SCHEMA, files)
    assert s.contains_nan is True
    assert s.lower_bound is not None and s.upper_bound is not None
    # and the manifest evaluator now keeps eq(1.0)
    assert ManifestEvaluator(_NAN_SPEC, SCHEMA, equal_to("score_p", 1.0)).eval([s]) is True


def test_partition_evaluator_nan_semantics():
    """NaN partition tuple values follow Spark/DuckDB total order: equal
    to itself, above everything."""
    from icegopher_spark.iceberg.expressions import is_nan, not_in, not_nan

    nanrow = {"score_p": float("nan")}
    cases = [
        (not_equal_to("score_p", 5.0), True),
        (greater_than("score_p", 5.0), True),
        (greater_than_or_equal("score_p", 5.0), True),
        (less_than("score_p", 5.0), False),
        (equal_to("score_p", 5.0), False),
        (not_in("score_p", 5.0, 6.0), True),
        (is_nan("score_p"), True),
        (not_nan("score_p"), False),
    ]
    for expr, want in cases:
        ev = PartitionEvaluator(_NAN_SPEC, SCHEMA, expr)
        assert ev.eval(nanrow) is want, expr


def test_partition_evaluator_starts_with_binary():
    """starts_with over a BINARY identity partition must evaluate (the
    round-5 review found str(v).startswith(bytes) raising TypeError in
    executor-side planning)."""
    from icegopher_spark.iceberg.types import BinaryType

    bsch = Schema((NestedField(4, "b", BinaryType(), True),))
    spec = PartitionSpec([PartitionField(4, 1000, "b_p", parse_transform("identity"))])
    ev = PartitionEvaluator(spec, bsch, starts_with("b_p", b"ab"))
    assert ev.eval({"b_p": b"abc"}) is True
    assert ev.eval({"b_p": b"xyz"}) is False
    # mismatched literal/value types conservatively keep the file
    ev2 = PartitionEvaluator(spec, bsch, starts_with("b_p", b"ab"))
    assert ev2.eval({"b_p": 42}) is True


def test_not_nan_matches_null_partition_values():
    """r6: NOT isnan(NULL) is TRUE in Spark — files in null partitions
    must survive a not_nan filter."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg.evaluators import PartitionEvaluator
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.transforms import PartitionField, PartitionSpec, parse_transform
    from icegopher_spark.iceberg.types import DoubleType, NestedField

    sch = Schema((NestedField(1, "f", DoubleType(), False),), schema_id=0)
    spec = PartitionSpec([PartitionField(1, 1000, "f", parse_transform("identity"))])
    ev = PartitionEvaluator(spec, sch, E.not_nan("f"))
    assert ev.eval({"f": None}) is True
    assert ev.eval({"f": 1.5}) is True
    assert ev.eval({"f": float("nan")}) is False


def test_unknown_nan_stats_defeat_float_upper_bound_pruning():
    """r6: a file with NO nan_value_counts for a float column may still
    hold NaN rows (spec makes the stat optional) — gt/ge must not prune
    on the NaN-free upper bound."""
    import struct as _struct

    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg.evaluators import InclusiveMetricsEvaluator
    from icegopher_spark.iceberg.manifests import DataFile
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import DoubleType, NestedField

    sch = Schema((NestedField(1, "f", DoubleType(), False),), schema_id=0)
    df = DataFile(
        file_path="/x.parquet",
        record_count=10,
        file_size_in_bytes=100,
        partition={},
        lower_bounds={1: _struct.pack("<d", 1.0)},
        upper_bounds={1: _struct.pack("<d", 10.0)},
        nan_value_counts=None,  # unknown — NOT "no NaNs"
    )
    ev = InclusiveMetricsEvaluator(sch, E.greater_than("f", 100.0))
    assert ev.eval(df) is True  # NaN rows would satisfy f > 100
    # with NaNs explicitly ruled out, the bound prunes again
    df2 = DataFile(
        file_path="/x.parquet",
        record_count=10,
        file_size_in_bytes=100,
        partition={},
        lower_bounds={1: _struct.pack("<d", 1.0)},
        upper_bounds={1: _struct.pack("<d", 10.0)},
        nan_value_counts={1: 0},
    )
    assert InclusiveMetricsEvaluator(sch, E.greater_than("f", 100.0)).eval(df2) is False


def test_far_range_timestamp_literal_exact(spark):
    """r6: timestamp literals beyond 2^53 us must compile exactly (the
    9999-12-31 sentinel previously lost microseconds to float division)."""
    from datetime import datetime

    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg.expressions import ensure_bound, to_spark_column
    from icegopher_spark.iceberg.literals import Literal
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import NestedField, TimestampType

    sch = Schema((NestedField(1, "ts", TimestampType(), False),), schema_id=0)
    sentinel = datetime(9999, 12, 31, 23, 59, 59, 999999)
    micros = Literal(sentinel, TimestampType()).value
    bound = ensure_bound(sch, E.equal_to("ts", sentinel), True)
    df = spark.createDataFrame([(sentinel,)], "ts timestamp_ntz")
    assert df.filter(to_spark_column(bound)).count() == 1
