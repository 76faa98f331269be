"""Expression algebra: negate/De Morgan, binding with promotion +
overflow folding, rewrite_not (reference expressions.go:64-288,
visitors.go:112-174)."""

import pytest

from icegopher_spark.iceberg.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BoundPredicate,
    Not,
    Or,
    bind_expr,
    equal_to,
    greater_than,
    is_in,
    is_null,
    less_than,
    not_in,
    not_null,
    rewrite_not,
    starts_with,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import (
    DoubleType,
    IntegerType,
    LongType,
    NestedField,
    StringType,
)

SCHEMA = Schema(
    (
        NestedField(1, "id", IntegerType(), True),
        NestedField(2, "name", StringType(), False),
        NestedField(3, "total", LongType(), False),
        NestedField(4, "score", DoubleType(), False),
    )
)


def test_negate_pairs():
    assert equal_to("id", 5).negate() == pytest.approx_eq if False else True
    assert repr(equal_to("id", 5).negate()).startswith("ne(")
    assert repr(is_null("name").negate()).startswith("not_null(")
    assert repr(less_than("id", 5).negate()).startswith("ge(")
    assert repr(is_in("id", 1, 2).negate()).startswith("not_in(")


def test_de_morgan():
    e = Not(And(equal_to("id", 1), is_null("name")))
    r = rewrite_not(e)
    assert isinstance(r, Or)
    assert repr(r.left).startswith("ne(")
    assert repr(r.right).startswith("not_null(")


def test_double_not_elimination():
    e = Not(Not(equal_to("id", 1)))
    assert rewrite_not(e) == equal_to("id", 1)


def test_bind_simple():
    b = bind_expr(SCHEMA, equal_to("id", 5))
    assert isinstance(b, BoundPredicate)
    assert b.term.field.field_id == 1
    assert b.literal.value == 5


def test_bind_case_insensitive():
    b = bind_expr(SCHEMA, equal_to("ID", 5), case_sensitive=False)
    assert isinstance(b, BoundPredicate)
    with pytest.raises(ValueError):
        bind_expr(SCHEMA, equal_to("ID", 5), case_sensitive=True)


def test_bind_promotes_literal():
    b = bind_expr(SCHEMA, equal_to("total", 5))  # int literal → long column
    assert isinstance(b, BoundPredicate)
    assert str(b.literal.literal_type) == "long"


def test_bind_overflow_folds_eq_false():
    assert bind_expr(SCHEMA, equal_to("id", 2**40)) == AlwaysFalse()


def test_bind_overflow_folds_lt_true():
    assert bind_expr(SCHEMA, less_than("id", 2**40)) == AlwaysTrue()
    assert bind_expr(SCHEMA, greater_than("id", 2**40)) == AlwaysFalse()


def test_bind_is_null_on_required_folds():
    assert bind_expr(SCHEMA, is_null("id")) == AlwaysFalse()
    assert bind_expr(SCHEMA, not_null("id")) == AlwaysTrue()


def test_bind_in_dedup_and_single_collapse():
    b = bind_expr(SCHEMA, is_in("id", 5, 5, 5))
    assert isinstance(b, BoundPredicate)
    assert b.op == "eq"
    b2 = bind_expr(SCHEMA, is_in("id"))
    assert b2 == AlwaysFalse()
    b3 = bind_expr(SCHEMA, not_in("id"))
    assert b3 == AlwaysTrue()


def test_bind_in_drops_overflow_members():
    b = bind_expr(SCHEMA, is_in("id", 5, 2**40))
    assert isinstance(b, BoundPredicate)
    assert b.op == "eq"  # one member left → eq
    assert b.literal.value == 5


def test_bind_unknown_column_raises():
    with pytest.raises(ValueError):
        bind_expr(SCHEMA, equal_to("nope", 1))


def test_starts_with_bind():
    b = bind_expr(SCHEMA, starts_with("name", "ab"))
    assert isinstance(b, BoundPredicate)
    assert b.op == "starts_with"


def test_expression_operators():
    e = equal_to("id", 1) & is_null("name") | greater_than("total", 10)
    assert isinstance(e, Or)
    assert isinstance(e.left, And)
    inv = ~equal_to("id", 1)
    assert repr(inv).startswith("ne(")


def test_bind_overflow_fold_is_null_safe_on_nullable():
    """r6: a vacuously-true comparison still excludes NULL rows in SQL,
    and the bound expression doubles as the exact row filter — on a
    NULLABLE column the fold must be not_null, not AlwaysTrue."""
    from icegopher_spark.iceberg.expressions import not_equal_to

    b = bind_expr(SCHEMA, less_than("total", 2**70))  # 'total' nullable
    assert isinstance(b, BoundPredicate) and b.op == "not_null"
    b2 = bind_expr(SCHEMA, not_equal_to("total", 2**70))
    assert isinstance(b2, BoundPredicate) and b2.op == "not_null"
    assert bind_expr(SCHEMA, not_in("total")).op == "not_null"
    # eq stays a plain false: no row (null or not) can match
    assert bind_expr(SCHEMA, equal_to("total", 2**70)) == AlwaysFalse()


def test_bind_infinity_not_treated_as_overflow():
    """r6: +inf is exactly representable in float32 — the overflow
    sentinel folded eq(f, inf) to always-false and dropped real rows."""
    from icegopher_spark.iceberg.types import FloatType

    float_schema = Schema((NestedField(1, "f", FloatType(), False),))
    b = bind_expr(float_schema, equal_to("f", float("inf")))
    assert isinstance(b, BoundPredicate) and b.op == "eq"
    assert b.literal.value == float("inf")
    b2 = bind_expr(float_schema, less_than("f", float("-inf")))
    assert isinstance(b2, BoundPredicate) and b2.op == "lt"


def test_to_spark_column_unbound_temporal_literals(spark):
    """r6: the delete paths compile UNBOUND filters; date/timestamp
    literals must convert from their int encodings or Spark raises
    DATATYPE_MISMATCH comparing DATE to INT."""
    from datetime import date, datetime

    from pyspark.sql import functions as F

    from icegopher_spark.iceberg.expressions import less_than, to_spark_column

    df = spark.createDataFrame(
        [(date(2019, 12, 31), datetime(2019, 12, 31, 12, 0, 0)),
         (date(2020, 1, 2), datetime(2020, 1, 2, 12, 0, 0))],
        "d date, ts timestamp",
    )
    got = df.filter(to_spark_column(less_than("d", date(2020, 1, 1)))).count()
    assert got == 1
    got2 = df.filter(to_spark_column(less_than("ts", datetime(2020, 1, 1)))).count()
    assert got2 == 1


def test_float_to_decimal_bind_is_op_aware():
    """r8 review wave 3: binding `d < 0.994` on decimal(4,2) must NOT
    round the literal to 0.99 (that flips the verdict for rows at
    exactly 0.99 in both pruning and the exact refilter). Inexact
    float literals adjust the OPERATOR instead: lt/le -> le floor,
    gt/ge -> ge ceil, eq -> constant false, ne -> not-null; inexact
    IN members drop."""
    from decimal import Decimal

    from icegopher_spark.iceberg.expressions import (
        AlwaysFalse,
        equal_to,
        greater_than,
        is_in,
        less_than,
        not_equal_to,
    )
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import DecimalType, NestedField

    sch = Schema((NestedField(1, "d", DecimalType(4, 2), False),), schema_id=0)

    p = less_than("d", 0.994).bind(sch)
    assert p.op == "le" and p.literals[0].value == Decimal("0.99")
    p = greater_than("d", 0.994).bind(sch)
    assert p.op == "ge" and p.literals[0].value == Decimal("1.00")
    p = less_than("d", -0.994).bind(sch)
    assert p.op == "le" and p.literals[0].value == Decimal("-1.00")
    assert isinstance(equal_to("d", 0.994).bind(sch), AlwaysFalse)
    assert not_equal_to("d", 0.994).bind(sch).op == "not_null"
    # exact literals keep their op; inexact IN members vanish
    p = less_than("d", 0.25).bind(sch)
    assert p.op == "lt" and p.literals[0].value == Decimal("0.25")
    p = is_in("d", 0.994, 0.25).bind(sch)
    assert p.op == "eq" and p.literals[0].value == Decimal("0.25")
