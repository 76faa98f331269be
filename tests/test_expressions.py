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
