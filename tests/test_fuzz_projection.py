"""Property-based soundness check for inclusive projection: for ANY
value v and row predicate P, if P(v) holds then the projected
partition predicate must hold on transform(v).

This is the invariant that makes partition pruning SAFE — a violation
means a manifest/file containing matching rows gets skipped and rows
silently disappear. Runs entirely driver-side (no Spark): the same
code path production planning uses (ensure_bound -> inclusive_projection
-> PartitionEvaluator + Transform.apply).

Covers every transform x type combination the spec defines semantics
for, including the floor-division edge cases (negative longs under
truncate, pre-1970 dates under year/month/day ordinals).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg.evaluators import PartitionEvaluator, inclusive_projection
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.transforms import PartitionField, PartitionSpec, parse_transform
from icegopher_spark.iceberg.types import (
    DateType,
    DecimalType,
    LongType,
    NestedField,
    StringType,
    TimestampType,
)

import datetime as dt

_LONG_VALS = st.integers(min_value=-(10**6), max_value=10**6)
_STR_VALS = st.text(alphabet="abcdefgh01", min_size=0, max_size=8)
_DAY_VALS = st.integers(min_value=-20000, max_value=20000)  # ±~55y around epoch
_MICRO_VALS = st.integers(min_value=-(2 * 10**15), max_value=2 * 10**15)
# timestamp literals must bind from datetime/ISO (no int->timestamp cast,
# matching the reference matrix); row values stay raw µs ints
_TS_LITS = st.datetimes(
    min_value=dt.datetime(1907, 1, 1), max_value=dt.datetime(2033, 1, 1)
)

_OPS_ORD = ("lt", "le", "gt", "ge", "eq", "ne", "in", "not_in")
_BUILD = {
    "lt": E.less_than,
    "le": E.less_than_or_equal,
    "gt": E.greater_than,
    "ge": E.greater_than_or_equal,
    "eq": E.equal_to,
    "ne": E.not_equal_to,
}

_DEC_VALS = st.decimals(
    min_value="-99999.99", max_value="99999.99", places=2, allow_nan=False, allow_infinity=False
)

CASES = [
    (LongType(), ("bucket[8]", "truncate[10]", "identity"), _LONG_VALS, _LONG_VALS, _OPS_ORD),
    (DecimalType(9, 2), ("truncate[10]", "bucket[8]", "identity"), _DEC_VALS, _DEC_VALS, _OPS_ORD),
    (StringType(), ("bucket[4]", "truncate[3]"), _STR_VALS, _STR_VALS, _OPS_ORD + ("starts_with",)),
    (DateType(), ("year", "month", "day", "bucket[16]"), _DAY_VALS, _DAY_VALS, _OPS_ORD),
    (TimestampType(), ("year", "month", "day", "hour"), _MICRO_VALS, _TS_LITS, _OPS_ORD),
]


@st.composite
def projection_cases(draw):
    t, transforms, vals, lit_vals, ops = draw(st.sampled_from(CASES))
    tr_name = draw(st.sampled_from(transforms))
    op = draw(st.sampled_from(ops))
    v = draw(vals)
    if op in ("in", "not_in"):
        lits = tuple(draw(st.lists(lit_vals, min_size=1, max_size=4)))
        pred = (E.is_in if op == "in" else E.not_in)("c", *lits)
    elif op == "starts_with":
        pred = E.starts_with("c", draw(st.text(alphabet="abcdefgh01", min_size=0, max_size=4)))
    else:
        pred = _BUILD[op]("c", draw(lit_vals))
    return t, tr_name, pred, v


@settings(max_examples=400, deadline=None)
@given(case=projection_cases())
def test_projection_is_inclusive(case):
    t, tr_name, pred, v = case
    tr = parse_transform(tr_name)
    schema = Schema((NestedField(1, "c", t, False),), schema_id=0)
    spec = PartitionSpec([PartitionField(1, 1000, "p", tr)])
    id_spec = PartitionSpec([PartitionField(1, 1001, "c", parse_transform("identity"))])

    # source-side truth: the same predicate projected through identity
    src_eval = PartitionEvaluator(
        id_spec, schema, inclusive_projection(schema, id_spec, pred)
    )
    if not src_eval.eval({"c": v}):
        return  # P(v) false — nothing to check

    projected = inclusive_projection(schema, spec, pred)
    part_eval = PartitionEvaluator(spec, schema, projected)
    pv = tr.apply(v, t)
    assert part_eval.eval({"p": pv}), (
        f"unsound projection: {tr_name} over {t}, pred {pred}, value {v!r} -> {pv!r}"
    )


def test_projection_not_vacuous_for_bucket_eq():
    """Guard against 'sound because AlwaysTrue': bucket must actually
    project equality into a partition-space equality."""
    from icegopher_spark.iceberg.expressions import AlwaysTrue

    schema = Schema((NestedField(1, "c", LongType(), False),), schema_id=0)
    spec = PartitionSpec([PartitionField(1, 1000, "p", parse_transform("bucket[8]"))])
    projected = inclusive_projection(schema, spec, E.equal_to("c", 42))
    assert not isinstance(projected, AlwaysTrue)
    pe = PartitionEvaluator(spec, schema, projected)
    b = parse_transform("bucket[8]").apply(42, LongType())
    assert pe.eval({"p": b})
    assert not pe.eval({"p": (b + 1) % 8})
