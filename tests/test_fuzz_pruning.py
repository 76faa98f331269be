"""Differential fuzzing of the predicate / pruning layer: random
boolean expression trees run through the FULL Iceberg scan path
(manifest partition summaries -> partition tuples -> min/max metrics ->
residual Spark filter) must return exactly the rows DuckDB returns for
the same predicate over the raw parquet.

This is the layer with the most hand-written logic (binding, literal
promotion, inclusive projection, three-valued logic around nulls), so
it gets property-based coverage on top of the unit tests in
test_evaluators.py / test_expressions.py. Any over-pruning (dropping a
file whose rows matched) or mis-evaluated residual shows up as a
count/sum mismatch.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icegopher_spark.iceberg import expressions as E

SF_DIR = "/root/testdata/sf0.001"

# (builder, sql template) per leaf predicate; values drawn from the
# actual column domains so predicates are selective but rarely empty
_LONGS = st.integers(min_value=-10, max_value=6100)
_QTYS = st.floats(min_value=-1.0, max_value=55.0, allow_nan=False, allow_infinity=False)
_FLAGS = st.sampled_from(["A", "N", "R", "Z"])
_DATES = st.sampled_from(
    ["1995-06-01", "1996-01-01", "1997-03-15", "1998-09-02", "2001-01-01"]
)


def _leaf_long(v):
    return [
        (E.less_than("l_orderkey", v), f"l_orderkey < {v}"),
        (E.greater_than_or_equal("l_orderkey", v), f"l_orderkey >= {v}"),
        (E.equal_to("l_orderkey", v), f"l_orderkey = {v}"),
        (E.not_equal_to("l_orderkey", v), f"l_orderkey <> {v}"),
        (E.is_in("l_orderkey", v, v + 7, v + 100), f"l_orderkey IN ({v}, {v + 7}, {v + 100})"),
        (E.not_in("l_orderkey", v, v + 1), f"l_orderkey NOT IN ({v}, {v + 1})"),
    ]


def _leaf_qty(v):
    v = round(v, 2)
    return [
        (E.less_than("l_quantity", v), f"l_quantity < {v}"),
        (E.greater_than("l_quantity", v), f"l_quantity > {v}"),
        (E.less_than_or_equal("l_quantity", v), f"l_quantity <= {v}"),
    ]


def _leaf_flag(v):
    return [
        (E.equal_to("l_returnflag", v), f"l_returnflag = '{v}'"),
        (E.not_equal_to("l_returnflag", v), f"l_returnflag <> '{v}'"),
        (E.is_in("l_returnflag", v, "N"), f"l_returnflag IN ('{v}', 'N')"),
        (E.starts_with("l_returnflag", v), f"l_returnflag LIKE '{v}%'"),
    ]


def _leaf_date(v):
    return [
        (
            E.greater_than_or_equal("l_shipdate", v),
            f"l_shipdate >= TIMESTAMP '{v} 00:00:00'",
        ),
        (E.less_than("l_shipdate", v), f"l_shipdate < TIMESTAMP '{v} 00:00:00'"),
    ]


@st.composite
def predicate_trees(draw):
    """Random expression tree of depth <= 2 over mixed-type leaves."""
    leaves = []
    leaves.extend(_leaf_long(draw(_LONGS)))
    leaves.extend(_leaf_qty(draw(_QTYS)))
    leaves.extend(_leaf_flag(draw(_FLAGS)))
    leaves.extend(_leaf_date(draw(_DATES)))
    a_expr, a_sql = draw(st.sampled_from(leaves))
    shape = draw(st.sampled_from(["leaf", "and", "or", "not", "and3"]))
    if shape == "leaf":
        return a_expr, a_sql
    b_expr, b_sql = draw(st.sampled_from(leaves))
    if shape == "and":
        return a_expr & b_expr, f"({a_sql}) AND ({b_sql})"
    if shape == "or":
        return a_expr | b_expr, f"({a_sql}) OR ({b_sql})"
    if shape == "not":
        return ~a_expr, f"NOT ({a_sql})"
    c_expr, c_sql = draw(st.sampled_from(leaves))
    return (a_expr & b_expr) | c_expr, f"(({a_sql}) AND ({b_sql})) OR ({c_sql})"


@pytest.fixture(scope="module")
def ice_table(spark):
    from icegopher_spark.iceberg_queries import _table_for

    return _table_for(spark, SF_DIR)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    return con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=predicate_trees())
def test_pruned_scan_matches_duckdb(spark, ice_table, oracle_con, tree):
    expr, sql = tree
    scan = ice_table.scan(row_filter=expr)
    rows = scan.to_df(spark).select("l_orderkey").collect()
    n, s = len(rows), sum(r[0] for r in rows)
    want_n, want_s = oracle_con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(l_orderkey), 0) FROM lineitem WHERE {sql}"
    ).fetchone()
    assert (n, s or 0) == (want_n, int(want_s)), sql


@pytest.fixture(scope="module")
def ds_reader(spark, ice_table):
    """The same table through the datasource face (filter translation
    + pruning + Spark-side residuals)."""
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    return (
        spark.read.format("icegopher")
        .option("location", ice_table.location)
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=predicate_trees())
def test_datasource_read_matches_duckdb(spark, ds_reader, oracle_con, tree):
    """End-to-end through spark.read.format('icegopher'): pushed-filter
    translation prunes files, Spark re-applies residuals — result must
    equal DuckDB on the raw parquet."""
    _expr, sql = tree
    rows = ds_reader.load().filter(sql.replace("TIMESTAMP ", "TIMESTAMP")).select(
        "l_orderkey"
    ).collect()
    n, s = len(rows), sum(r[0] for r in rows)
    want_n, want_s = oracle_con.execute(
        f"SELECT COUNT(*), COALESCE(SUM(l_orderkey), 0) FROM lineitem WHERE {sql}"
    ).fetchone()
    assert (n, s or 0) == (want_n, int(want_s)), sql


@pytest.fixture(scope="module")
def eqdel_reader(spark):
    """Datasource reader over a table carrying an equality-delete file
    (every l_orderkey ≡ 7 mod 100 deleted) — round-5: the reader masks
    eq-deletes executor-side instead of refusing."""
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource
    from icegopher_spark.iceberg_queries import _eqdel_table_for

    spark.dataSource.register(IcebergDataSource)
    t = _eqdel_table_for(spark, SF_DIR)
    return spark.read.format("icegopher").option("location", t.location)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=predicate_trees())
def test_datasource_eqdelete_read_matches_duckdb(spark, eqdel_reader, oracle_con, tree):
    """Pushed-filter pruning composed with the Arrow eq-delete mask must
    equal DuckDB applying the same predicate over the undeleted rows."""
    _expr, sql = tree
    rows = eqdel_reader.load().filter(sql).select("l_orderkey").collect()
    n, s = len(rows), sum(r[0] for r in rows)
    want_n, want_s = oracle_con.execute(
        "SELECT COUNT(*), COALESCE(SUM(l_orderkey), 0) FROM lineitem "
        f"WHERE l_orderkey % 100 <> 7 AND ({sql})"
    ).fetchone()
    assert (n, s or 0) == (want_n, int(want_s)), sql
