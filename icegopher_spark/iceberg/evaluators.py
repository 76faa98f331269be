"""Stats-based pruning: the inclusive metrics evaluator (per data
file), the manifest partition-summary evaluator, and inclusive
projection of row filters through partition transforms.

Reference semantics: expressions/visitors.go:176-461 — Eval 207-226,
IsNull 283-294, NotNull 296-305, Equal 463-476, NotEqual→always-match
478-480, bounds compare per type withinBounds 307-461; NaN-poisoned
float bounds are unusable (343-367). Extended to the full predicate set
(LT/LE/GT/GE/In/StartsWith) the reference left unimplemented, following
the Iceberg spec's InclusiveMetricsEvaluator truth table.
"""

from __future__ import annotations

import math
from typing import Any

from .expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BooleanExpression,
    BoundPredicate,
    Not,
    Or,
    ensure_bound,
    rewrite_not,
)
from .literals import Literal, compare_values, literal_from_bytes
from .manifests import DataFile, FieldSummary
from .schema import Schema
from .transforms import (
    BucketTransform,
    DayTransform,
    HourTransform,
    IdentityTransform,
    MonthTransform,
    PartitionSpec,
    TruncateTransform,
    VoidTransform,
    YearTransform,
)
from .types import DoubleType, FloatType, NestedField, StringType

ROWS_MIGHT_MATCH = True
ROWS_CANNOT_MATCH = False


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)

_MONOTONIC = (TruncateTransform, YearTransform, MonthTransform, DayTransform, HourTransform)


class InclusiveMetricsEvaluator:
    """Answers: might any row of this data file match the filter?
    Conservative (inclusive): missing stats → might match."""

    def __init__(self, schema: Schema, expr: BooleanExpression, case_sensitive: bool = True):
        self.schema = schema
        # ensure_bound passes Always*/already-bound through, so one call
        # covers every input shape (r5 review: the old two-way branch
        # reduced to exactly this)
        self.expr = ensure_bound(schema, rewrite_not(expr), case_sensitive)

    def eval(self, file: DataFile) -> bool:
        if file.record_count == 0:
            return ROWS_CANNOT_MATCH
        return self._visit(self.expr, file)

    def _visit(self, e: BooleanExpression, f: DataFile) -> bool:
        if isinstance(e, AlwaysTrue):
            return ROWS_MIGHT_MATCH
        if isinstance(e, AlwaysFalse):
            return ROWS_CANNOT_MATCH
        if isinstance(e, Not):
            raise ValueError("NOT must be rewritten before metrics evaluation")
        if isinstance(e, And):
            return self._visit(e.left, f) and self._visit(e.right, f)
        if isinstance(e, Or):
            return self._visit(e.left, f) or self._visit(e.right, f)
        assert isinstance(e, BoundPredicate), f"unexpected {e!r}"
        return self._pred(e, f)

    # -- helpers ---------------------------------------------------------

    @staticmethod
    def _nulls_only(f: DataFile, fid: int) -> bool:
        vc = (f.value_counts or {}).get(fid)
        nc = (f.null_value_counts or {}).get(fid)
        return vc is not None and nc is not None and vc == nc

    @staticmethod
    def _nans_only(f: DataFile, fid: int) -> bool:
        vc = (f.value_counts or {}).get(fid)
        nanc = (f.nan_value_counts or {}).get(fid)
        return vc is not None and nanc is not None and vc == nanc

    def _lower(self, f: DataFile, field: NestedField) -> Literal | None:
        raw = (f.lower_bounds or {}).get(field.field_id)
        if raw is None:
            return None
        lit = literal_from_bytes(raw, field.field_type)
        # NaN lower bound → unusable (reference visitors.go:348-363)
        if isinstance(field.field_type, (FloatType, DoubleType)) and math.isnan(lit.value):
            return None
        return lit

    def _upper(self, f: DataFile, field: NestedField) -> Literal | None:
        raw = (f.upper_bounds or {}).get(field.field_id)
        if raw is None:
            return None
        lit = literal_from_bytes(raw, field.field_type)
        if isinstance(field.field_type, (FloatType, DoubleType)) and math.isnan(lit.value):
            return None
        return lit

    def _pred(self, p: BoundPredicate, f: DataFile) -> bool:
        field = p.term.field
        fid = field.field_id
        t = field.field_type
        op = p.op

        if op == "is_null":
            nc = (f.null_value_counts or {}).get(fid)
            if nc == 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "not_null":
            if self._nulls_only(f, fid):
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "is_nan":
            nanc = (f.nan_value_counts or {}).get(fid)
            if nanc == 0:
                return ROWS_CANNOT_MATCH
            if self._nulls_only(f, fid):
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "not_nan":
            if self._nans_only(f, fid):
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH

        # value predicates: a column of only nulls matches nothing —
        # SQL three-valued logic fails EVERY comparison on null, ne and
        # not_in included
        if self._nulls_only(f, fid):
            return ROWS_CANNOT_MATCH
        # a NaN comparison literal defeats bound reasoning entirely:
        # Spark/DuckDB order NaN above everything (and NaN = NaN is
        # true), which min/max bounds cannot express (r5 review)
        if op in ("lt", "le", "gt", "ge", "eq", "ne") and _is_nan(p.literal.value):
            return ROWS_MIGHT_MATCH
        if op in ("in", "not_in") and any(_is_nan(l.value) for l in p.literals):
            return ROWS_MIGHT_MATCH
        # all-NaN column: NaN compares LARGER than every literal in
        # Spark/DuckDB, so only the ops NaN can never satisfy may prune
        # — ne / not_in / gt / ge DO match NaN rows (r5 review fix)
        if self._nans_only(f, fid) and op in ("lt", "le", "eq", "in", "starts_with"):
            return ROWS_CANNOT_MATCH
        # float bounds exclude NaN (spec), so a KNOWN NaN row defeats
        # upper-bound pruning for gt/ge — the NaN row satisfies them
        # regardless of the non-NaN maximum (caught by the hardened
        # metrics fuzz after the r5 review fixes)
        if op in ("gt", "ge") and isinstance(t, (FloatType, DoubleType)):
            nanc = (f.nan_value_counts or {}).get(fid)
            # UNKNOWN (None) must be might-contain-NaN: a spec-compliant
            # writer may omit the optional nan counts while the file
            # holds NaN rows that satisfy gt/ge regardless of the
            # (NaN-free, spec-required) upper bound (r6 review)
            if nanc is None or nanc:
                return ROWS_MIGHT_MATCH

        if op == "lt":
            lo = self._lower(f, field)
            if lo is not None and compare_values(lo.value, p.literal.value, t) >= 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "le":
            lo = self._lower(f, field)
            if lo is not None and compare_values(lo.value, p.literal.value, t) > 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "gt":
            hi = self._upper(f, field)
            if hi is not None and compare_values(hi.value, p.literal.value, t) <= 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "ge":
            hi = self._upper(f, field)
            if hi is not None and compare_values(hi.value, p.literal.value, t) < 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "eq":
            lo = self._lower(f, field)
            if lo is not None and compare_values(lo.value, p.literal.value, t) > 0:
                return ROWS_CANNOT_MATCH
            hi = self._upper(f, field)
            if hi is not None and compare_values(hi.value, p.literal.value, t) < 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "ne":
            return ROWS_MIGHT_MATCH  # (reference visitors.go:478-480)
        if op == "in":
            lo, hi = self._lower(f, field), self._upper(f, field)
            if lo is not None and all(
                compare_values(lo.value, l.value, t) > 0 for l in p.literals
            ):
                return ROWS_CANNOT_MATCH
            if hi is not None and all(
                compare_values(hi.value, l.value, t) < 0 for l in p.literals
            ):
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "not_in":
            return ROWS_MIGHT_MATCH
        if op == "starts_with":
            if not isinstance(t, StringType):
                return ROWS_MIGHT_MATCH
            prefix = p.literal.value
            lo, hi = self._lower(f, field), self._upper(f, field)
            if lo is not None and lo.value[: len(prefix)] > prefix:
                return ROWS_CANNOT_MATCH
            if hi is not None and hi.value[: len(prefix)] < prefix:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "not_starts_with":
            return ROWS_MIGHT_MATCH
        return ROWS_MIGHT_MATCH


# --------------------------------------------------------------------------
# Manifest-level pruning via partition field summaries
# --------------------------------------------------------------------------


class ManifestEvaluator:
    """Evaluates a partition-space filter against a manifest's per-field
    summaries (contains_null/contains_nan/lower/upper); conservative."""

    def __init__(self, spec: PartitionSpec, schema: Schema, partition_filter: BooleanExpression):
        self.partition_schema = Schema(spec.partition_type(schema).fields)
        self.expr = ensure_bound(self.partition_schema, rewrite_not(partition_filter), True) if not isinstance(
            partition_filter, (AlwaysTrue, AlwaysFalse)
        ) else partition_filter
        # position of each partition field in the summaries list
        self._pos = {f.field_id: i for i, f in enumerate(self.partition_schema.fields)}

    def eval(self, summaries: list[FieldSummary]) -> bool:
        if not summaries:
            return ROWS_MIGHT_MATCH
        return self._visit(self.expr, summaries)

    def _visit(self, e: BooleanExpression, s: list[FieldSummary]) -> bool:
        if isinstance(e, AlwaysTrue):
            return ROWS_MIGHT_MATCH
        if isinstance(e, AlwaysFalse):
            return ROWS_CANNOT_MATCH
        if isinstance(e, And):
            return self._visit(e.left, s) and self._visit(e.right, s)
        if isinstance(e, Or):
            return self._visit(e.left, s) or self._visit(e.right, s)
        assert isinstance(e, BoundPredicate)
        return self._pred(e, s)

    def _pred(self, p: BoundPredicate, summaries: list[FieldSummary]) -> bool:
        field = p.term.field
        pos = self._pos.get(field.field_id)
        if pos is None or pos >= len(summaries):
            return ROWS_MIGHT_MATCH
        s = summaries[pos]
        t = field.field_type
        op = p.op

        if op == "is_null":
            return ROWS_MIGHT_MATCH if s.contains_null else ROWS_CANNOT_MATCH
        if op == "not_null":
            # all-null only when NaN partitions are ruled out too — NaN
            # values are non-null (upstream's !containsNaN guard; r5).
            # For float fields an UNKNOWN contains_nan (writer omitted
            # the optional flag) must count as possible-NaN, same as
            # the gt/ge rule below: {null, NaN} summaries have no
            # bounds yet hold non-null rows (r6 review)
            nan_possible = isinstance(t, (FloatType, DoubleType)) and (
                s.contains_nan is not False
            )
            if s.contains_null and not nan_possible and s.lower_bound is None:
                return ROWS_CANNOT_MATCH  # all-null partition values
            return ROWS_MIGHT_MATCH
        if op in ("is_nan", "not_nan"):
            if op == "is_nan" and s.contains_nan is False:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH

        # NaN comparison literals defeat bound reasoning (see the
        # metrics evaluator's identical guard; r5 review)
        if op in ("lt", "le", "gt", "ge", "eq", "ne") and _is_nan(p.literal.value):
            return ROWS_MIGHT_MATCH
        if op in ("in", "not_in") and any(_is_nan(l.value) for l in p.literals):
            return ROWS_MIGHT_MATCH

        # summary bounds exclude NaN, so NaN partitions defeat
        # upper-bound pruning for gt/ge (NaN sorts above every literal).
        # For float fields an UNKNOWN contains_nan (writer omitted the
        # optional flag) must count as possible-NaN (r6 review)
        if (
            op in ("gt", "ge")
            and isinstance(t, (FloatType, DoubleType))
            and s.contains_nan is not False
        ):
            return ROWS_MIGHT_MATCH

        lo = literal_from_bytes(s.lower_bound, t) if s.lower_bound is not None else None
        hi = literal_from_bytes(s.upper_bound, t) if s.upper_bound is not None else None
        if isinstance(t, (FloatType, DoubleType)):
            if lo is not None and math.isnan(lo.value):
                lo = None
            if hi is not None and math.isnan(hi.value):
                hi = None
        if lo is None and hi is None:
            # no usable bounds: values are nulls and/or NaNs. NaN fails
            # lt/le/eq/in/starts_with (non-NaN literals guaranteed by
            # the guard above) but SATISFIES gt/ge — those may prune
            # only when NaN partitions are ruled out (r5 review)
            if op in ("lt", "le", "eq", "in", "starts_with"):
                return ROWS_CANNOT_MATCH if not s.contains_null else ROWS_MIGHT_MATCH
            if op in ("gt", "ge") and (
                not isinstance(t, (FloatType, DoubleType))
                or s.contains_nan is False
            ):
                return ROWS_CANNOT_MATCH if not s.contains_null else ROWS_MIGHT_MATCH
            return ROWS_MIGHT_MATCH

        if op == "lt":
            return ROWS_CANNOT_MATCH if lo is not None and compare_values(lo.value, p.literal.value, t) >= 0 else ROWS_MIGHT_MATCH
        if op == "le":
            return ROWS_CANNOT_MATCH if lo is not None and compare_values(lo.value, p.literal.value, t) > 0 else ROWS_MIGHT_MATCH
        if op == "gt":
            return ROWS_CANNOT_MATCH if hi is not None and compare_values(hi.value, p.literal.value, t) <= 0 else ROWS_MIGHT_MATCH
        if op == "ge":
            return ROWS_CANNOT_MATCH if hi is not None and compare_values(hi.value, p.literal.value, t) < 0 else ROWS_MIGHT_MATCH
        if op == "eq":
            if lo is not None and compare_values(lo.value, p.literal.value, t) > 0:
                return ROWS_CANNOT_MATCH
            if hi is not None and compare_values(hi.value, p.literal.value, t) < 0:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "in":
            if lo is not None and all(compare_values(lo.value, l.value, t) > 0 for l in p.literals):
                return ROWS_CANNOT_MATCH
            if hi is not None and all(compare_values(hi.value, l.value, t) < 0 for l in p.literals):
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        if op == "starts_with" and isinstance(t, StringType):
            prefix = p.literal.value
            if lo is not None and lo.value[: len(prefix)] > prefix:
                return ROWS_CANNOT_MATCH
            if hi is not None and hi.value[: len(prefix)] < prefix:
                return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH
        return ROWS_MIGHT_MATCH


# --------------------------------------------------------------------------
# Partition-tuple evaluator (per data file)
# --------------------------------------------------------------------------


class PartitionEvaluator:
    """Evaluates the projected partition filter against a data file's
    partition tuple (a name → value dict)."""

    def __init__(self, spec: PartitionSpec, schema: Schema, partition_filter: BooleanExpression):
        self.partition_schema = Schema(spec.partition_type(schema).fields)
        if isinstance(partition_filter, (AlwaysTrue, AlwaysFalse)):
            self.expr: BooleanExpression = partition_filter
        else:
            self.expr = ensure_bound(self.partition_schema, rewrite_not(partition_filter), True)

    def eval(self, partition: dict[str, Any]) -> bool:
        return self._visit(self.expr, partition)

    def _visit(self, e: BooleanExpression, row: dict[str, Any]) -> bool:
        if isinstance(e, AlwaysTrue):
            return True
        if isinstance(e, AlwaysFalse):
            return False
        if isinstance(e, And):
            return self._visit(e.left, row) and self._visit(e.right, row)
        if isinstance(e, Or):
            return self._visit(e.left, row) or self._visit(e.right, row)
        assert isinstance(e, BoundPredicate)
        v = row.get(e.term.field.name)
        op = e.op
        if op == "is_null":
            return v is None
        if op == "not_null":
            return v is not None
        if op == "is_nan":
            return _is_nan(v)
        if op == "not_nan":
            # Spark's NOT isnan(NULL) is TRUE (isnan is false for null),
            # and Iceberg Java's NOT_NAN matches nulls too — requiring
            # v is not None wrongly pruned files in null partitions (r6)
            return not _is_nan(v)
        if v is None:
            return False
        t = e.term.field.field_type

        def cmp(a: Any, b: Any) -> int:
            # Spark/DuckDB NaN total order: NaN equals itself and sorts
            # ABOVE everything — compare_values alone returns 0 for any
            # NaN operand, which made ne/lt/gt prune wrongly (r5 review)
            a_nan, b_nan = _is_nan(a), _is_nan(b)
            if a_nan and b_nan:
                return 0
            if a_nan:
                return 1
            if b_nan:
                return -1
            return compare_values(a, b, t)

        if op == "eq":
            return cmp(v, e.literal.value) == 0
        if op == "ne":
            return cmp(v, e.literal.value) != 0
        if op == "lt":
            return cmp(v, e.literal.value) < 0
        if op == "le":
            return cmp(v, e.literal.value) <= 0
        if op == "gt":
            return cmp(v, e.literal.value) > 0
        if op == "ge":
            return cmp(v, e.literal.value) >= 0
        if op == "in":
            return any(cmp(v, l.value) == 0 for l in e.literals)
        if op == "not_in":
            return all(cmp(v, l.value) != 0 for l in e.literals)
        if op == "starts_with":
            # str-vs-str or bytes-vs-bytes evaluate exactly; any other
            # combination (r5 review: str(v).startswith(bytes) raised)
            # conservatively keeps the file
            if isinstance(v, (str, bytes)) and type(e.literal.value) is type(v):
                return v.startswith(e.literal.value)
            return True
        if op == "not_starts_with":
            if isinstance(v, (str, bytes)) and type(e.literal.value) is type(v):
                return not v.startswith(e.literal.value)
            return True
        return True


# --------------------------------------------------------------------------
# Inclusive projection: row filter → partition-space filter
# --------------------------------------------------------------------------


def inclusive_projection(
    schema: Schema, spec: PartitionSpec, row_filter: BooleanExpression, case_sensitive: bool = True
) -> BooleanExpression:
    """Project a (bound or unbound) row filter into partition space.

    Inclusive: the projected filter matches AT LEAST the partitions that
    contain matching rows. Identity projects exactly; monotonic
    transforms (truncate/year/month/day/hour) project comparisons
    through the transform; bucket projects only eq/in. Anything else →
    AlwaysTrue (no pruning). The reference only declared the hook
    (scanner.go:124-142); semantics follow the Iceberg spec.
    """
    bound = ensure_bound(schema, rewrite_not(row_filter), case_sensitive) if not isinstance(
        row_filter, (AlwaysTrue, AlwaysFalse)
    ) else row_filter
    return _project(bound, schema, spec)


def _project(e: BooleanExpression, schema: Schema, spec: PartitionSpec) -> BooleanExpression:
    if isinstance(e, (AlwaysTrue, AlwaysFalse)):
        return e
    if isinstance(e, And):
        return And(_project(e.left, schema, spec), _project(e.right, schema, spec))
    if isinstance(e, Or):
        # inclusive OR: if either side can't be projected it becomes
        # AlwaysTrue, making the whole OR unprunable — correct.
        return Or(_project(e.left, schema, spec), _project(e.right, schema, spec))
    assert isinstance(e, BoundPredicate)
    parts = spec.fields_by_source_id(e.term.field.field_id)
    out: BooleanExpression | None = None
    for pf in parts:
        p = _project_pred(e, pf, schema)
        if p is not None:
            out = p if out is None else And(out, p)
    return out if out is not None else AlwaysTrue()


def _project_pred(e: BoundPredicate, pf, schema) -> BooleanExpression | None:
    from .expressions import Reference, UnboundPredicate

    tr = pf.transform
    src_type = e.term.field.field_type
    op = e.op

    if isinstance(tr, VoidTransform):
        return None
    if isinstance(tr, IdentityTransform):
        return UnboundPredicate(op, Reference(pf.name), e.literals)
    if op in ("is_null", "not_null"):
        # transforms preserve null
        return UnboundPredicate(op, Reference(pf.name), ())
    if isinstance(tr, BucketTransform):
        if op in ("eq", "in"):
            lits = tuple(
                Literal(tr.apply(l.value, src_type), tr.result_type(src_type)) for l in e.literals
            )
            return UnboundPredicate(op, Reference(pf.name), lits)
        return None
    if isinstance(tr, _MONOTONIC):
        if op in ("lt", "le"):
            # x < v  ⇒  t(x) <= t(v)  (inclusive)
            lit = Literal(tr.apply(e.literal.value, src_type), tr.result_type(src_type))
            return UnboundPredicate("le", Reference(pf.name), (lit,))
        if op in ("gt", "ge"):
            lit = Literal(tr.apply(e.literal.value, src_type), tr.result_type(src_type))
            return UnboundPredicate("ge", Reference(pf.name), (lit,))
        if op in ("eq", "in"):
            lits = tuple(
                Literal(tr.apply(l.value, src_type), tr.result_type(src_type)) for l in e.literals
            )
            return UnboundPredicate(op, Reference(pf.name), lits)
        if op == "starts_with" and isinstance(tr, TruncateTransform) and isinstance(src_type, StringType):
            v = e.literal.value
            if len(v) >= tr.width:
                return UnboundPredicate(
                    "starts_with", Reference(pf.name), (Literal(v[: tr.width], src_type),)
                )
            return UnboundPredicate("starts_with", Reference(pf.name), (Literal(v, src_type),))
        return None
    return None
