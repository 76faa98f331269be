"""Delta batch DataSource face: parity with read_delta, pushed-filter
file pruning, DV + column-mapping composition through the shared
stream-kernel."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from icegopher_spark.delta_dsv2 import DeltaBatchDataSource

    spark.dataSource.register(DeltaBatchDataSource)


def _fmt(spark, loc, **opts):
    r = spark.read.format("icegopher_delta").option("location", loc)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_parity_with_read_delta(spark):
    from icegopher_spark.delta import read_delta
    from icegopher_spark.delta_queries import delta_fixture_path

    loc = delta_fixture_path(SF)
    a = {tuple(r) for r in _fmt(spark, loc).collect()}
    b = {tuple(r) for r in read_delta(spark, loc).collect()}
    assert a == b


def test_time_travel_option(spark):
    from icegopher_spark.delta import read_delta
    from icegopher_spark.delta_queries import delta_fixture_path

    loc = delta_fixture_path(SF)
    assert (
        _fmt(spark, loc, version="1").count()
        == read_delta(spark, loc, version=1).count()
    )


def test_pushed_partition_filter_prunes_files(spark):
    from icegopher_spark.delta_dsv2 import _DeltaPushdownBatchReader
    from icegopher_spark.delta_queries import delta_fixture_path

    loc = delta_fixture_path(SF)
    r = _DeltaPushdownBatchReader({"location": loc})
    all_parts = r.partitions()

    class _Eq:
        def __init__(self):
            self.attribute = ("o_orderpriority",)
            self.value = "1-URGENT"

    _Eq.__name__ = "EqualTo"
    r2 = _DeltaPushdownBatchReader({"location": loc})
    r2.pushFilters([_Eq()])
    pruned = r2.partitions()
    assert 0 < len(pruned) < len(all_parts)
    assert all(p.pv["o_orderpriority"] == "1-URGENT" for p in pruned)


def test_dv_and_mapping_through_format(spark):
    from icegopher_spark.delta import read_delta
    from icegopher_spark.delta_queries import (
        delta_cm_fixture_path,
        delta_dv_fixture_path,
    )

    dv = delta_dv_fixture_path(SF)
    assert _fmt(spark, dv).count() == read_delta(spark, dv).count()
    cm = delta_cm_fixture_path(SF)
    got = _fmt(spark, cm)
    assert got.columns[0] == "o_orderkey"  # logical names
    assert got.count() == read_delta(spark, cm).count()


def test_filter_results_identical_with_pruning(spark):
    """Pruning drops whole files only — row-level results match the
    function API under the same predicate."""
    from pyspark.sql import functions as F

    from icegopher_spark.delta import read_delta
    from icegopher_spark.delta_queries import delta_fixture_path

    loc = delta_fixture_path(SF)
    pred = F.col("o_orderpriority") == "3-MEDIUM"
    a = {tuple(r) for r in _fmt(spark, loc).filter(pred).collect()}
    b = {tuple(r) for r in read_delta(spark, loc).filter(pred).collect()}
    assert a == b and a


def test_stats_data_skipping(spark, tmp_path):
    """add.stats min/max (written by this repo's writer from parquet
    footers) prune files for range predicates on NON-partition columns;
    results stay identical because Spark re-applies every filter."""
    from pyspark.sql import functions as F

    from icegopher_spark.delta_dsv2 import _DeltaPushdownBatchReader
    from icegopher_spark.delta_write import append_delta, create_delta_table

    loc = str(tmp_path / "t")
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    create_delta_table(loc, df.schema)
    # 4 files with disjoint k ranges
    append_delta(spark, loc, df.repartitionByRange(4, "k"))

    r = _DeltaPushdownBatchReader({"location": loc})
    assert len(r.partitions()) == 4

    class _Gt:
        attribute = ("k",)
        value = 900

    _Gt.__name__ = "GreaterThan"
    r2 = _DeltaPushdownBatchReader({"location": loc})
    r2.pushFilters([_Gt()])
    pruned = r2.partitions()
    assert len(pruned) == 1  # only the top range file survives

    got = (
        _fmt(spark, loc).filter(F.col("k") > 900).count()
    )
    assert got == 99


def test_stats_skipping_sound_with_dvs(spark, tmp_path):
    """DV-carrying files keep their (superset) stats — skipping must
    never drop a file whose live rows match."""
    from pyspark.sql import functions as F

    from icegopher_spark.delta_write import (
        append_delta,
        create_delta_table,
        delete_where_delta,
    )

    loc = str(tmp_path / "t")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    create_delta_table(loc, df.schema)
    append_delta(spark, loc, df.repartitionByRange(2, "k"))
    delete_where_delta(spark, loc, F.col("k") % 10 == 0)
    got = _fmt(spark, loc).filter(F.col("k") >= 55).count()
    assert got == 41  # 55..99 minus 60,70,80,90
