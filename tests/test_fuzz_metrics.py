"""Property-based soundness for the inclusive metrics evaluator: build
a DataFile whose stats (bounds, value/null/NaN counts) are derived
HONESTLY from a generated row set; if the evaluator says
ROWS_CANNOT_MATCH, no generated row may satisfy the predicate.

A violation is the silent-row-loss failure mode: a file pruned by
min/max stats while containing matching rows. Driver-side only — the
same DataFile surface production planning consumes (manifests.py).

NaN rows and NaN literals are exercised through EVERY predicate with
the Spark/DuckDB total order as ground truth (NaN equals itself, sorts
above everything) — round 5 widened this after a review found the
all-NaN shortcut wrongly pruning ne/not_in/gt/ge.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg.evaluators import InclusiveMetricsEvaluator
from icegopher_spark.iceberg.literals import Literal, literal_to_bytes
from icegopher_spark.iceberg.manifests import DataFile
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

_FID = 1


def _mk_file(values, t):
    present = [v for v in values if v is not None]
    nans = [v for v in present if isinstance(v, float) and math.isnan(v)]
    ordered = [v for v in present if not (isinstance(v, float) and math.isnan(v))]
    lower = upper = None
    if ordered:
        lower = literal_to_bytes(Literal(min(ordered), t))
        upper = literal_to_bytes(Literal(max(ordered), t))
    return DataFile(
        file_path="mem://f",
        file_format="PARQUET",
        record_count=len(values),
        file_size_in_bytes=1,
        partition={},
        value_counts={_FID: len(values)},
        null_value_counts={_FID: len(values) - len(present)},
        nan_value_counts={_FID: len(nans)},
        lower_bounds={_FID: lower} if lower is not None else {},
        upper_bounds={_FID: upper} if upper is not None else {},
    )


def _matches(op, v, lits):
    """Row-level truth; None = null, NaN only reaches nan/null ops."""
    if op == "is_null":
        return v is None
    if op == "not_null":
        return v is not None
    if op == "is_nan":
        return v is not None and isinstance(v, float) and math.isnan(v)
    if op == "not_nan":
        return v is not None and not (isinstance(v, float) and math.isnan(v))
    if v is None:
        return False

    def cmp3(a):
        # Spark/DuckDB total order: NaN equals itself, sorts above all
        v_nan = isinstance(v, float) and math.isnan(v)
        a_nan = isinstance(a, float) and math.isnan(a)
        if v_nan and a_nan:
            return 0
        if v_nan:
            return 1
        if a_nan:
            return -1
        return (v > a) - (v < a)

    a = lits[0] if lits else None
    return {
        "lt": lambda: cmp3(a) < 0,
        "le": lambda: cmp3(a) <= 0,
        "gt": lambda: cmp3(a) > 0,
        "ge": lambda: cmp3(a) >= 0,
        "eq": lambda: cmp3(a) == 0,
        "ne": lambda: cmp3(a) != 0,
        "in": lambda: any(cmp3(x) == 0 for x in lits),
        "not_in": lambda: all(cmp3(x) != 0 for x in lits),
        "starts_with": lambda: str(v).startswith(a),
    }[op]()


_LONGS = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
_DOUBLES = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
)
_STRS = st.one_of(st.none(), st.text(alphabet="abc", min_size=0, max_size=4))

_ORDERED_OPS = ["lt", "le", "gt", "ge", "eq", "ne", "in", "not_in"]


@st.composite
def metric_cases(draw):
    kind = draw(st.sampled_from(["long", "double", "string"]))
    if kind == "long":
        t, vals, lit_s = LongType(), _LONGS, st.integers(min_value=-1000, max_value=1000)
        ops = _ORDERED_OPS + ["is_null", "not_null"]
    elif kind == "double":
        t, vals = DoubleType(), _DOUBLES
        # NaN literals included: bounds cannot reason about them, so
        # the evaluator must never prune (r5 NaN-soundness fixes)
        lit_s = st.one_of(
            st.just(float("nan")),
            st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
        )
        ops = _ORDERED_OPS + ["is_null", "not_null", "is_nan", "not_nan"]
    else:
        t, vals, lit_s = StringType(), _STRS, st.text(alphabet="abc", min_size=0, max_size=4)
        ops = _ORDERED_OPS + ["is_null", "not_null", "starts_with"]
    values = draw(st.lists(vals, min_size=1, max_size=12))
    op = draw(st.sampled_from(ops))
    lits = tuple(draw(st.lists(lit_s, min_size=1, max_size=3))) if op in ("in", "not_in") else (
        (draw(lit_s),) if op not in ("is_null", "not_null", "is_nan", "not_nan") else ()
    )
    return t, values, op, lits


_BUILDERS = {
    "lt": E.less_than,
    "le": E.less_than_or_equal,
    "gt": E.greater_than,
    "ge": E.greater_than_or_equal,
    "eq": E.equal_to,
    "ne": E.not_equal_to,
    "in": E.is_in,
    "not_in": E.not_in,
    "starts_with": E.starts_with,
    "is_null": E.is_null,
    "not_null": E.not_null,
    "is_nan": E.is_nan,
    "not_nan": E.not_nan,
}


@settings(max_examples=500, deadline=None)
@given(case=metric_cases())
def test_metrics_skip_is_sound(case):
    t, values, op, lits = case
    pred = _BUILDERS[op]("c", *lits) if lits else _BUILDERS[op]("c")
    schema = Schema((NestedField(_FID, "c", t, False),), schema_id=0)
    ev = InclusiveMetricsEvaluator(schema, pred)
    f = _mk_file(values, t)
    if ev.eval(f):
        return  # might-match: always allowed
    hits = [v for v in values if _matches(op, v, lits)]
    assert not hits, (
        f"file skipped but rows match: op={op} lits={lits} values={values} hits={hits}"
    )
