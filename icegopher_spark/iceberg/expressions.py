"""Boolean expression IR: unbound ↔ bound predicate trees, binding with
literal promotion + overflow folding, NOT-rewriting (De Morgan), and a
compiler to ``pyspark.sql.Column``.

Reference semantics: expressions/expressions.go (algebra 64-288),
expressions/visitors.go (visitor 32-110, Bind 112-146, RewriteNot
148-174). Extended beyond the reference with the full predicate set —
LT/LE/GT/GE/In/NotIn/IsNaN/NotNaN/StartsWith — which the reference left
as TODOs (visitors.go:45-48); their semantics follow the Iceberg spec.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .literals import (
    ABOVE,
    BELOW,
    SENTINELS,
    Literal,
    L,
)
from .schema import Accessor, Schema
from .types import DecimalType, DoubleType, FloatType, IcebergType, NestedField

# -- operations -------------------------------------------------------------

OPS_NEGATION = {
    "is_null": "not_null",
    "not_null": "is_null",
    "is_nan": "not_nan",
    "not_nan": "is_nan",
    "eq": "ne",
    "ne": "eq",
    "lt": "ge",
    "le": "gt",
    "gt": "le",
    "ge": "lt",
    "in": "not_in",
    "not_in": "in",
    "starts_with": "not_starts_with",
    "not_starts_with": "starts_with",
}

UNARY_OPS = {"is_null", "not_null", "is_nan", "not_nan"}
LITERAL_OPS = {"eq", "ne", "lt", "le", "gt", "ge", "starts_with", "not_starts_with"}
SET_OPS = {"in", "not_in"}


class BooleanExpression:
    def __and__(self, other: "BooleanExpression") -> "BooleanExpression":
        return And(self, other)

    def __or__(self, other: "BooleanExpression") -> "BooleanExpression":
        return Or(self, other)

    def __invert__(self) -> "BooleanExpression":
        return self.negate()

    def negate(self) -> "BooleanExpression":
        raise NotImplementedError


@dataclass(frozen=True)
class AlwaysTrue(BooleanExpression):
    def negate(self):
        return AlwaysFalse()

    def __repr__(self):
        return "true"


@dataclass(frozen=True)
class AlwaysFalse(BooleanExpression):
    def negate(self):
        return AlwaysTrue()

    def __repr__(self):
        return "false"


@dataclass(frozen=True)
class And(BooleanExpression):
    left: BooleanExpression
    right: BooleanExpression

    def negate(self):
        return Or(self.left.negate(), self.right.negate())

    def __repr__(self):
        return f"({self.left!r} and {self.right!r})"


@dataclass(frozen=True)
class Or(BooleanExpression):
    left: BooleanExpression
    right: BooleanExpression

    def negate(self):
        return And(self.left.negate(), self.right.negate())

    def __repr__(self):
        return f"({self.left!r} or {self.right!r})"


@dataclass(frozen=True)
class Not(BooleanExpression):
    child: BooleanExpression

    def negate(self):
        return self.child

    def __repr__(self):
        return f"not({self.child!r})"


@dataclass(frozen=True)
class Reference:
    """Unbound named term (reference expressions.go:37-62)."""

    name: str

    def __repr__(self):
        return f"ref({self.name})"


@dataclass(frozen=True)
class BoundReference:
    """Schema-resolved term: field + accessor for metadata-row eval."""

    field: NestedField
    accessor: Accessor | None
    path: str  # dotted column path for Spark

    def eval(self, row: Any) -> Any:
        return self.accessor.get(row) if self.accessor else None

    def __repr__(self):
        return f"bound({self.path}#{self.field.field_id})"


@dataclass(frozen=True)
class UnboundPredicate(BooleanExpression):
    op: str
    term: Reference
    literals: tuple[Literal, ...] = ()

    def negate(self):
        return UnboundPredicate(OPS_NEGATION[self.op], self.term, self.literals)

    def __repr__(self):
        lits = ", ".join(repr(l.value) for l in self.literals)
        return f"{self.op}({self.term!r}{', ' + lits if lits else ''})"

    def bind(self, schema: Schema, case_sensitive: bool = True) -> BooleanExpression:
        field = schema.find_field(self.term.name, case_sensitive)
        if field is None:
            raise ValueError(f"cannot bind {self.term.name!r}: not in schema")
        path = schema.find_column_name(field.field_id) or field.name
        bound_term = BoundReference(field, schema.accessor_for(field.field_id), path)

        if self.op in UNARY_OPS:
            # is_null on a required column folds to false; not_null to true
            if self.op == "is_null" and field.required:
                return AlwaysFalse()
            if self.op == "not_null" and field.required:
                return AlwaysTrue()
            if self.op in ("is_nan", "not_nan") and not isinstance(
                field.field_type, (FloatType, DoubleType)
            ):
                raise ValueError(f"{self.op} on non-floating column {field.name!r}")
            return BoundPredicate(self.op, bound_term)

        # float -> decimal comparisons: an INEXACT literal must adjust
        # the operator, never round the value (r8 review wave 3: d <
        # 0.994 on decimal(4,2) rounded to d < 0.99, flipping the
        # verdict for rows at exactly 0.99 in BOTH pruning and the
        # exact refilter). Rewritten to the equivalent exact decimal
        # comparison: lt/le v -> le floor(v); gt/ge v -> ge ceil(v);
        # eq -> constant false; ne -> not-null; inexact IN/NOT_IN
        # members can never equal a column value and drop out.
        op = self.op
        lits = list(self.literals)
        ftype = field.field_type
        if isinstance(ftype, DecimalType) and any(
            isinstance(l.value, float) and not isinstance(l.value, bool)
            for l in lits
        ):
            import decimal as _dec
            from decimal import Decimal as _D

            def _floor_split(v: float):
                # Returns None when the literal is too large to
                # quantize at the working precision (e.g. 1e100 on
                # decimal(4,2)): the caller falls through to the cast
                # path, whose overflow sentinels fold with a typed
                # error/AlwaysTrue-or-False instead of a raw
                # decimal.InvalidOperation (r8 advice #1).
                try:
                    with _dec.localcontext() as ctx:
                        ctx.prec = 80
                        d = _D(str(v))
                        fl = d.quantize(
                            _D(1).scaleb(-ftype.scale), rounding=_dec.ROUND_FLOOR
                        )
                except _dec.InvalidOperation:
                    return None
                return d, fl

            if op in ("lt", "le", "gt", "ge") and len(lits) == 1:
                split = _floor_split(lits[0].value)
                if split is not None and split[1] != split[0]:
                    fl = split[1]
                    if op in ("lt", "le"):
                        op, lits = "le", [Literal(fl, ftype)]
                    else:
                        op = "ge"
                        lits = [Literal(fl + _D(1).scaleb(-ftype.scale), ftype)]
            elif op in ("eq", "ne") and len(lits) == 1:
                split = _floor_split(lits[0].value)
                if split is not None and split[1] != split[0]:
                    if op == "eq":
                        return AlwaysFalse()
                    if field.required:
                        return AlwaysTrue()
                    return BoundPredicate("not_null", bound_term)
            elif op in ("in", "not_in"):
                kept = []
                for l in lits:
                    if isinstance(l.value, float) and not isinstance(l.value, bool):
                        split = _floor_split(l.value)
                        if split is not None and split[1] != split[0]:
                            continue
                    kept.append(l)
                lits = kept

        # literal promotion to the column type, with overflow folding
        # (reference expressions.go:146-154 + literals.go:155-217)
        cast: list[Literal] = []
        for lit in lits:
            out = lit.to(field.field_type)
            if out in SENTINELS:
                folded = _fold_sentinel(op, out)
                if folded is not None:
                    # a vacuously-true comparison still excludes NULL
                    # rows in SQL (NULL < 2^40 is not TRUE), and the
                    # bound expression doubles as the exact row filter
                    # — folding to AlwaysTrue would let NULL rows
                    # through for large literals only (r6 review).
                    # NotNull prunes identically and filters correctly;
                    # on a required column AlwaysTrue is exact.
                    if isinstance(folded, AlwaysTrue) and not field.required:
                        return BoundPredicate("not_null", bound_term)
                    return folded
                continue  # sentinel member of IN-set: drop it
            cast.append(out)

        if op in SET_OPS:
            if not cast:
                if op == "in":
                    return AlwaysFalse()
                # empty not_in: vacuously true for non-null rows only
                if field.required:
                    return AlwaysTrue()
                return BoundPredicate("not_null", bound_term)
            vals = tuple(dict.fromkeys(cast))  # dedup, keep order
            if len(vals) == 1:
                eq_op = "eq" if op == "in" else "ne"
                return BoundPredicate(eq_op, bound_term, vals)
            return BoundPredicate(op, bound_term, vals)
        return BoundPredicate(op, bound_term, tuple(cast))


def _fold_sentinel(op: str, sentinel) -> BooleanExpression | None:
    """Constant-fold a comparison whose literal overflowed the column
    type. E.g. int_col < 2^40 → always true."""
    above = sentinel in ABOVE
    if op == "eq":
        return AlwaysFalse()
    if op == "ne":
        return AlwaysTrue()
    if op in ("lt", "le"):
        return AlwaysTrue() if above else AlwaysFalse()
    if op in ("gt", "ge"):
        return AlwaysFalse() if above else AlwaysTrue()
    return None  # in/not_in: caller drops the member


@dataclass(frozen=True)
class BoundPredicate(BooleanExpression):
    op: str
    term: BoundReference
    literals: tuple[Literal, ...] = ()

    def negate(self):
        return BoundPredicate(OPS_NEGATION[self.op], self.term, self.literals)

    def __repr__(self):
        lits = ", ".join(repr(l.value) for l in self.literals)
        return f"{self.op}({self.term!r}{', ' + lits if lits else ''})"

    @property
    def literal(self) -> Literal:
        return self.literals[0]


# -- convenience constructors ----------------------------------------------


def _pred(op: str, name: str, *values: Any) -> UnboundPredicate:
    lits = tuple(v if isinstance(v, Literal) else L(v) for v in values)
    return UnboundPredicate(op, Reference(name), lits)


def is_null(name: str):
    return _pred("is_null", name)


def not_null(name: str):
    return _pred("not_null", name)


def is_nan(name: str):
    return _pred("is_nan", name)


def not_nan(name: str):
    return _pred("not_nan", name)


def equal_to(name: str, v: Any):
    return _pred("eq", name, v)


def not_equal_to(name: str, v: Any):
    return _pred("ne", name, v)


def less_than(name: str, v: Any):
    return _pred("lt", name, v)


def less_than_or_equal(name: str, v: Any):
    return _pred("le", name, v)


def greater_than(name: str, v: Any):
    return _pred("gt", name, v)


def greater_than_or_equal(name: str, v: Any):
    return _pred("ge", name, v)


def is_in(name: str, *values: Any):
    return _pred("in", name, *values)


def not_in(name: str, *values: Any):
    return _pred("not_in", name, *values)


def starts_with(name: str, v: str):
    return _pred("starts_with", name, v)


def not_starts_with(name: str, v: str):
    return _pred("not_starts_with", name, v)


# -- visitors ---------------------------------------------------------------


class BooleanExpressionVisitor:
    """Generic visitor (reference visitors.go:32-110)."""

    def visit_true(self):
        raise NotImplementedError

    def visit_false(self):
        raise NotImplementedError

    def visit_not(self, child_result):
        raise NotImplementedError

    def visit_and(self, left_result, right_result):
        raise NotImplementedError

    def visit_or(self, left_result, right_result):
        raise NotImplementedError

    def visit_unbound_predicate(self, pred: UnboundPredicate):
        raise NotImplementedError

    def visit_bound_predicate(self, pred: BoundPredicate):
        raise NotImplementedError


def visit_expr(expr: BooleanExpression, visitor: BooleanExpressionVisitor):
    if isinstance(expr, AlwaysTrue):
        return visitor.visit_true()
    if isinstance(expr, AlwaysFalse):
        return visitor.visit_false()
    if isinstance(expr, Not):
        return visitor.visit_not(visit_expr(expr.child, visitor))
    if isinstance(expr, And):
        return visitor.visit_and(visit_expr(expr.left, visitor), visit_expr(expr.right, visitor))
    if isinstance(expr, Or):
        return visitor.visit_or(visit_expr(expr.left, visitor), visit_expr(expr.right, visitor))
    if isinstance(expr, UnboundPredicate):
        return visitor.visit_unbound_predicate(expr)
    if isinstance(expr, BoundPredicate):
        return visitor.visit_bound_predicate(expr)
    raise TypeError(f"unknown expression: {expr!r}")


def bind_expr(
    schema: Schema, expr: BooleanExpression, case_sensitive: bool = True
) -> BooleanExpression:
    """Schema-resolve an unbound tree (reference visitors.go:112-146)."""
    if isinstance(expr, (AlwaysTrue, AlwaysFalse)):
        return expr
    if isinstance(expr, Not):
        return Not(bind_expr(schema, expr.child, case_sensitive))
    if isinstance(expr, And):
        return And(
            bind_expr(schema, expr.left, case_sensitive),
            bind_expr(schema, expr.right, case_sensitive),
        )
    if isinstance(expr, Or):
        return Or(
            bind_expr(schema, expr.left, case_sensitive),
            bind_expr(schema, expr.right, case_sensitive),
        )
    if isinstance(expr, UnboundPredicate):
        return expr.bind(schema, case_sensitive)
    if isinstance(expr, BoundPredicate):
        raise ValueError("found already-bound predicate while binding")
    raise TypeError(f"unknown expression: {expr!r}")


def ensure_bound(
    schema: Schema, expr: BooleanExpression, case_sensitive: bool = True
) -> BooleanExpression:
    """Like bind_expr but passes already-bound predicates through —
    for pipelines where the filter may arrive bound or unbound."""
    if isinstance(expr, (AlwaysTrue, AlwaysFalse, BoundPredicate)):
        return expr
    if isinstance(expr, Not):
        return Not(ensure_bound(schema, expr.child, case_sensitive))
    if isinstance(expr, And):
        return And(
            ensure_bound(schema, expr.left, case_sensitive),
            ensure_bound(schema, expr.right, case_sensitive),
        )
    if isinstance(expr, Or):
        return Or(
            ensure_bound(schema, expr.left, case_sensitive),
            ensure_bound(schema, expr.right, case_sensitive),
        )
    if isinstance(expr, UnboundPredicate):
        return expr.bind(schema, case_sensitive)
    raise TypeError(f"unknown expression: {expr!r}")


def rewrite_not(expr: BooleanExpression) -> BooleanExpression:
    """Eliminate Not by pushing inversion down (reference
    visitors.go:148-174); required before metadata evaluation."""
    if isinstance(expr, Not):
        return rewrite_not(expr.child.negate())
    if isinstance(expr, And):
        return And(rewrite_not(expr.left), rewrite_not(expr.right))
    if isinstance(expr, Or):
        return Or(rewrite_not(expr.left), rewrite_not(expr.right))
    return expr


# -- compile to Spark Column ------------------------------------------------


def _lit_value(lit: Literal) -> Any:
    """Spark-friendly literal value (dates/timestamps kept as their
    integer encodings are converted by the caller's column type)."""
    from datetime import date, datetime, timedelta, timezone

    from .types import (
        DateType,
        TimestampNsType,
        TimestampType,
        TimestampTzNsType,
        TimestampTzType,
        TimeType,
        UUIDType,
    )

    t = lit.literal_type
    if isinstance(t, DateType):
        return date(1970, 1, 1) + timedelta(days=lit.value)
    # integer micros + timedelta, NOT fromtimestamp(micros/1e6): the
    # float division corrupts microseconds beyond 2^53 µs (first hits
    # ~year 2242 — e.g. the 9999-12-31 'no expiry' sentinel), and the
    # exact Spark re-filter then matches zero rows (r6 review)
    _epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    if isinstance(t, TimestampTzType):
        return _epoch + timedelta(microseconds=lit.value)
    if isinstance(t, TimestampType):
        return (_epoch + timedelta(microseconds=lit.value)).replace(tzinfo=None)
    # V3 ns timestamps surface in Spark as µs (floor-truncated at read,
    # types.py); the exact re-filter therefore compares over the
    # truncated plane: the literal floors the same way. Metadata
    # pruning keeps full nanos (r7 review: the raw int64 literal raised
    # DATATYPE_MISMATCH against the timestamp column).
    if isinstance(t, TimestampTzNsType):
        return _epoch + timedelta(microseconds=lit.value // 1000)
    if isinstance(t, TimestampNsType):
        return (_epoch + timedelta(microseconds=lit.value // 1000)).replace(tzinfo=None)
    if isinstance(t, UUIDType):
        return str(lit.value)
    return lit.value


def to_spark_column(expr: BooleanExpression) -> Column:
    """Compile a bound (or unbound — names used as-is) expression to a
    Spark Column for exact re-application after file pruning."""
    if isinstance(expr, AlwaysTrue):
        return F.lit(True)
    if isinstance(expr, AlwaysFalse):
        return F.lit(False)
    if isinstance(expr, Not):
        return ~to_spark_column(expr.child)
    if isinstance(expr, And):
        return to_spark_column(expr.left) & to_spark_column(expr.right)
    if isinstance(expr, Or):
        return to_spark_column(expr.left) | to_spark_column(expr.right)
    if isinstance(expr, UnboundPredicate):
        col = F.col(expr.term.name)
        # _lit_value, NOT .value: date/timestamp literals store their
        # epoch-day/micros int encodings, and comparing a DATE column
        # to a raw int raises DATATYPE_MISMATCH in the delete paths
        # that compile unbound filters (r6 review)
        vals = [_lit_value(l) for l in expr.literals]
        return _pred_column(expr.op, col, vals)
    if isinstance(expr, BoundPredicate):
        col = F.col(expr.term.path)
        vals = [_lit_value(l) for l in expr.literals]
        return _pred_column(expr.op, col, vals)
    raise TypeError(f"unknown expression: {expr!r}")


def _pred_column(op: str, col: Column, vals: list[Any]) -> Column:
    if op == "is_null":
        return col.isNull()
    if op == "not_null":
        return col.isNotNull()
    if op == "is_nan":
        return F.isnan(col)
    if op == "not_nan":
        return ~F.isnan(col)
    if op == "eq":
        return col == vals[0]
    if op == "ne":
        return col != vals[0]
    if op == "lt":
        return col < vals[0]
    if op == "le":
        return col <= vals[0]
    if op == "gt":
        return col > vals[0]
    if op == "ge":
        return col >= vals[0]
    if op == "in":
        return col.isin(vals)
    if op == "not_in":
        return ~col.isin(vals)
    if op == "starts_with":
        return col.startswith(vals[0])
    if op == "not_starts_with":
        return ~col.startswith(vals[0])
    raise ValueError(f"unknown op {op!r}")
