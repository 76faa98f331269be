"""Differential coverage of DSv2 partitioned writes vs the native
append path: for every supported (source type, transform) pair the
manifest partition values committed by df.write.format('icegopher')
must equal the native W.append encoding — on data that includes NULL
sources, pre-epoch values, far-range temporals (9999-12-31, outside
the datetime64[ns] range), and int64 values above 2^53.

This is the defect class round 6 kept finding one bug at a time
(np.datetime64 missing from _coerce, pandas groupby float-coercing
object keys, datetime64[ns] wraparound, float64 int roundtrip), so it
gets systematic coverage: any representation drift between the two
write paths shows up as a partition-dict mismatch, and any encode
corruption shows up as a pruning mismatch on the dsv2-written table.
"""

from __future__ import annotations

import datetime as dt

import pytest

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.table import Table
from icegopher_spark.iceberg.transforms import (
    PartitionField,
    PartitionSpec,
    parse_transform,
)
from icegopher_spark.iceberg.types import (
    DateType,
    LongType,
    NestedField,
    StringType,
    TimestampType,
)

BIG = 2**53 + 1  # exceeds float64 integer precision

ROWS = [
    (1, "alpha", dt.date(2024, 1, 1), dt.datetime(2024, 1, 1, 5)),
    (BIG, "beta", dt.date(1969, 12, 31), dt.datetime(1969, 12, 31, 23, 59, 59)),
    (-7, None, dt.date(9999, 12, 31), dt.datetime(9999, 12, 31)),
    (None, "alpha", None, None),
]

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), False),
        NestedField(2, "s", StringType(), False),
        NestedField(3, "d", DateType(), False),
        NestedField(4, "ts", TimestampType(), False),
    ),
    schema_id=0,
)

CASES = [
    ("k", 1, "identity"),
    ("k", 1, "bucket[4]"),
    ("k", 1, "truncate[100]"),
    ("s", 2, "identity"),
    ("s", 2, "bucket[4]"),
    ("s", 2, "truncate[2]"),
    ("d", 3, "identity"),
    ("d", 3, "month"),
    ("d", 3, "bucket[8]"),
    ("ts", 4, "identity"),
    ("ts", 4, "day"),
    ("ts", 4, "hour"),
    ("ts", 4, "year"),
    ("ts", 4, "bucket[8]"),
]


@pytest.fixture(scope="module")
def src_df(spark):
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    return spark.createDataFrame(
        ROWS, "k long, s string, d date, ts timestamp_ntz"
    ).coalesce(1)


@pytest.mark.parametrize("src,fid,trname", CASES, ids=[f"{c[0]}-{c[2]}" for c in CASES])
def test_dsv2_partition_encoding_matches_native(spark, tmp_path, src_df, src, fid, trname):
    spec = PartitionSpec([PartitionField(fid, 1000, "p", parse_transform(trname))])

    loc_ds = str(tmp_path / "ds")
    W.create_table(loc_ds, SCHEMA, spec)
    src_df.write.format("icegopher").option("location", loc_ds).mode("append").save()
    t_ds = Table.from_location(loc_ds)

    loc_nat = str(tmp_path / "nat")
    t_nat = W.create_table(loc_nat, SCHEMA, spec)
    t_nat = W.append(t_nat, src_df)

    parts_ds = sorted(str(task.file.partition) for task in t_ds.scan().plan_files())
    parts_nat = sorted(str(task.file.partition) for task in t_nat.scan().plan_files())
    assert parts_ds == parts_nat

    # every row survives the round trip (no file silently lost)
    got = {r["k"] for r in t_ds.scan().to_df(spark).select("k").collect()}
    assert got == {r[0] for r in ROWS}
