"""Iceberg V3 default values (table spec Appendix D): JSON single-value
serde round-trips, add_column(default=...) metadata, initial-default
scan fill for pre-evolution files (native + DSv2 faces), and
write-default fill for frames that omit the column."""

import datetime as dt
import uuid
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.evolve import update_schema
from icegopher_spark.iceberg.literals import (
    json_single_value,
    parse_json_single_value,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    IntegerType,
    ListType,
    LongType,
    MapType,
    NestedField,
    StringType,
    StructType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)

SCHEMA = Schema(
    (
        NestedField(1, "id", LongType(), True),
        NestedField(2, "name", StringType(), False),
    ),
    schema_id=0,
)


# ---------------------------------------------------------------- serde


@pytest.mark.parametrize(
    "t,internal,json_form",
    [
        (BooleanType(), True, True),
        (IntegerType(), -7, -7),
        (LongType(), 2**40, 2**40),
        (DoubleType(), 1.5, 1.5),
        (DecimalType(9, 2), Decimal("14.20"), "14.20"),
        (DateType(), 18262, "2020-01-01"),
        (TimeType(), 81068123456, "22:31:08.123456"),
        (TimestampType(), 1577836800000000, "2020-01-01T00:00:00.000000"),
        (TimestampTzType(), 1577836800000001, "2020-01-01T00:00:00.000001+00:00"),
        (StringType(), "hi", "hi"),
        (
            UUIDType(),
            uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"),
            "f79c3e09-677c-4bbd-a479-3f349cb785e7",
        ),
        (FixedType(3), b"\x00\x01\xff", "0001ff"),
        (BinaryType(), b"\xde\xad", "dead"),
        (
            ListType(10, LongType(), False),
            [1, None, 3],
            [1, None, 3],
        ),
        (
            MapType(11, StringType(), 12, LongType(), False),
            [("a", 1), ("b", None)],
            {"keys": ["a", "b"], "values": [1, None]},
        ),
        (
            StructType(
                (
                    NestedField(20, "x", LongType(), True),
                    NestedField(21, "y", StringType(), False),
                )
            ),
            {20: 5, 21: "z"},
            {"20": 5, "21": "z"},
        ),
    ],
)
def test_json_single_value_roundtrip(t, internal, json_form):
    enc = json_single_value(t, internal)
    assert enc == json_form
    assert parse_json_single_value(t, enc) == internal


def test_json_single_value_rejects():
    with pytest.raises(ValueError):
        json_single_value(IntegerType(), 2**40)  # int overflow
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            # spec JSON form is a number; NaN/Inf have no encoding
            json_single_value(DoubleType(), bad)
    with pytest.raises(TypeError):
        json_single_value(DoubleType(), True)
    with pytest.raises(TypeError):
        json_single_value(LongType(), True)  # bool is not an int default
    with pytest.raises(ValueError):
        json_single_value(StringType(), None)  # null: omit instead
    with pytest.raises(TypeError):
        json_single_value(StringType(), 7)
    with pytest.raises(ValueError):
        json_single_value(FixedType(4), b"ab")  # wrong length
    with pytest.raises(ValueError):
        # struct default missing a required sub-field
        json_single_value(
            StructType((NestedField(1, "x", LongType(), True),)), {}
        )
    with pytest.raises(ValueError):
        parse_json_single_value(IntegerType(), 2**40)
    with pytest.raises(ValueError):
        parse_json_single_value(DecimalType(4, 2), "123.456")  # overflow


# ------------------------------------------------------- schema evolution


def test_add_column_default_requires_v3(tmp_path, spark):
    t = W.create_table(str(tmp_path / "t"), SCHEMA)  # v2
    with pytest.raises(ValueError, match="format-version 3"):
        update_schema(t).add_column("c", LongType(), default=1)
    with pytest.raises(ValueError, match="default"):
        update_schema(t).add_column("c", LongType(), required=True)


def test_add_column_default_metadata(tmp_path):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, format_version=3)
    t = (
        update_schema(t)
        .add_column("score", DoubleType(), default=0.5)
        .add_column("tag", StringType(), required=True, default="none")
        .add_column("since", DateType(), default=dt.date(2020, 1, 1))
        .commit()
    )
    by_name = {f.name: f for f in t.schema.fields}
    assert by_name["score"].initial_default == 0.5
    assert by_name["score"].write_default == 0.5
    assert by_name["tag"].required and by_name["tag"].initial_default == "none"
    assert by_name["since"].initial_default == "2020-01-01"
    # defaults survive a rename and a promotion
    t2 = (
        update_schema(t)
        .rename_column("tag", "label")
        .commit()
    )
    lbl = next(f for f in t2.schema.fields if f.name == "label")
    assert lbl.initial_default == "none" and lbl.write_default == "none"


def _base_table(tmp_path, spark, n=6):
    rows = [(i, f"n{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, name string")
    t = W.create_table(str(tmp_path / "t"), SCHEMA, format_version=3)
    return W.append(t, df)


def test_initial_default_scan_fill(tmp_path, spark):
    t = _base_table(tmp_path, spark)
    t = (
        update_schema(t)
        .add_column("score", DoubleType(), default=0.5)
        .add_column("tag", StringType(), required=True, default="none")
        .add_column("since", DateType(), default=dt.date(2020, 1, 1))
        .add_column(
            "seen", TimestampType(), default=dt.datetime(2021, 6, 1, 12, 30, 0, 250)
        )
        .add_column("price", DecimalType(9, 2), default=Decimal("14.20"))
        .commit()
    )
    # new-file rows carry explicit values
    new = spark.createDataFrame(
        [(100, "x", 9.0, "real", dt.date(2024, 2, 2),
          dt.datetime(2024, 2, 2, 0, 0, 0), Decimal("1.00"))],
        "id bigint, name string, score double, tag string, since date, "
        "seen timestamp_ntz, price decimal(9,2)",
    )
    t = W.append(t, new)
    got = {r["id"]: r for r in t.scan().to_df(spark).collect()}
    assert len(got) == 7
    old = got[0]
    assert old["score"] == 0.5
    assert old["tag"] == "none"
    assert old["since"] == dt.date(2020, 1, 1)
    assert old["seen"] == dt.datetime(2021, 6, 1, 12, 30, 0, 250)
    assert old["price"] == Decimal("14.20")
    assert got[100]["tag"] == "real" and got[100]["score"] == 9.0
    # filters over the defaulted column see the default
    n = t.scan().to_df(spark).filter(F.col("tag") == "none").count()
    assert n == 6


def test_write_default_fills_missing_column(tmp_path, spark):
    t = _base_table(tmp_path, spark, n=2)
    t = update_schema(t).add_column("tag", StringType(), default="auto").commit()
    # frame WITHOUT the new column: write-default fills it
    t = W.append(t, spark.createDataFrame([(50, "y")], "id bigint, name string"))
    got = {r["id"]: r["tag"] for r in t.scan().to_df(spark).collect()}
    assert got[50] == "auto" and got[0] == "auto"
    # a column with no write-default still errors when absent
    t2 = update_schema(t).add_column("opt", LongType()).commit()
    with pytest.raises(Exception):
        W.append(t2, spark.createDataFrame([(51, "z")], "id bigint, name string"))


def test_initial_default_dsv2_read(tmp_path, spark):
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    t = _base_table(tmp_path, spark, n=4)
    t = (
        update_schema(t)
        .add_column("score", DoubleType(), default=2.5)
        .add_column("when", TimestampTzType(),
                    default=dt.datetime(2022, 3, 4, 5, 6, 7, tzinfo=dt.timezone.utc))
        .commit()
    )
    t = W.append(
        t,
        spark.createDataFrame(
            [(10, "q", 7.0, dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc))],
            "id bigint, name string, score double, `when` timestamp",
        ),
    )
    df = spark.read.format("icegopher").option("location", t.location).load()
    got = {r["id"]: (r["score"], r["when"]) for r in df.collect()}
    assert got[0] == (2.5, dt.datetime(2022, 3, 4, 5, 6, 7))
    assert got[10][0] == 7.0


def test_nested_default_scan_fill(tmp_path, spark):
    t = _base_table(tmp_path, spark, n=2)
    stype = StructType(
        (
            NestedField(100, "x", LongType(), True),
            NestedField(101, "y", StringType(), False),
        )
    )
    ltype = ListType(102, LongType(), False)
    t = (
        update_schema(t)
        .add_column("pt", stype, default={100: 3, 101: "s"})
        .add_column("xs", ltype, default=[1, 2, None])
        .commit()
    )
    row = t.scan().to_df(spark).filter(F.col("id") == 0).collect()[0]
    assert row["pt"]["x"] == 3 and row["pt"]["y"] == "s"
    assert row["xs"] == [1, 2, None]


def test_default_metadata_json_roundtrip(tmp_path, spark):
    from icegopher_spark.iceberg.table import Table

    t = _base_table(tmp_path, spark, n=1)
    t = update_schema(t).add_column("tag", StringType(), default="d").commit()
    # reload from disk: defaults must survive the metadata JSON round-trip
    t2 = Table.from_location(t.location)
    fld = next(f for f in t2.schema.fields if f.name == "tag")
    assert fld.initial_default == "d" and fld.write_default == "d"
    assert t2.scan().to_df(spark).collect()[0]["tag"] == "d"


def test_add_column_temporal_default_type_directed(tmp_path):
    t = W.create_table(str(tmp_path / "t"), SCHEMA, format_version=3)
    us = update_schema(t)
    with pytest.raises(ValueError, match="is a date"):
        us.add_column("ts", TimestampType(), default=dt.date(2020, 1, 1))
    with pytest.raises(ValueError, match="datetime"):
        us.add_column("d", DateType(), default=dt.datetime(2020, 1, 1))
    with pytest.raises(ValueError, match="tz-aware"):
        us.add_column(
            "ts2", TimestampType(),
            default=dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
        )
    with pytest.raises(ValueError, match="naive"):
        us.add_column("tz", TimestampTzType(), default=dt.datetime(2020, 1, 1))


def test_write_default_fills_dsv2_write(tmp_path, spark):
    from icegopher_spark.iceberg.dsv2 import IcebergDataSource
    from icegopher_spark.iceberg.table import Table

    spark.dataSource.register(IcebergDataSource)
    t = _base_table(tmp_path, spark, n=2)
    t = (
        update_schema(t)
        .add_column("tag", StringType(), required=True, default="auto")
        .commit()
    )
    # frame WITHOUT the required defaulted column through the DSv2 face
    spark.createDataFrame([(50, "y")], "id bigint, name string").write.format(
        "icegopher"
    ).option("location", t.location).mode("append").save()
    t2 = Table.from_location(t.location)
    got = {r["id"]: r["tag"] for r in t2.scan().to_df(spark).collect()}
    assert got == {0: "auto", 1: "auto", 50: "auto"}
    # a missing column with NO write-default refuses loudly
    t3 = update_schema(t2).add_column("opt", LongType()).commit()
    with pytest.raises(Exception, match="write-default|lacks column"):
        spark.createDataFrame([(51, "z")], "id bigint, name string").write.format(
            "icegopher"
        ).option("location", t3.location).mode("append").save()


def test_ns_timestamp_defaults_truncate_to_micros(spark):
    """r9 review: a V3 ns-timestamp column default is stored as int
    NANOS; both the Column and arrow paths must floorDiv to the µs
    Spark surface — the raw int previously hit
    F.lit(int).cast(timestamp_ntz), which Spark refuses, so ADDING a
    ns column with a default made the whole table unscannable."""
    from datetime import datetime

    from icegopher_spark.iceberg.defaults import (
        default_arrow_value,
        default_column,
    )
    from icegopher_spark.iceberg.types import (
        NestedField,
        TimestampNsType,
        TimestampTzNsType,
    )

    f = NestedField(
        1, "ts", TimestampNsType(), False,
        initial_default="2021-01-01T00:00:00.123456789",
    )
    got = spark.range(1).select(default_column(f, "initial").alias("d")).collect()[0]["d"]
    assert got == datetime(2021, 1, 1, 0, 0, 0, 123456)
    assert default_arrow_value(f, "initial") == 1609459200123456  # µs

    f2 = NestedField(
        2, "tz", TimestampTzNsType(), False,
        initial_default="2021-01-01T00:00:00.123456789+00:00",
    )
    got2 = spark.range(1).select(default_column(f2, "initial").alias("d")).collect()[0]["d"]
    assert got2.replace(tzinfo=None) == datetime(2021, 1, 1, 0, 0, 0, 123456)
    assert default_arrow_value(f2, "initial") == 1609459200123456


def test_add_ns_column_with_datetime_default_end_to_end(spark, tmp_path):
    """r9 review: adding a V3 ns-timestamp column with a natural
    datetime default stores int NANOS and scans back at the µs Spark
    surface for pre-existing rows."""
    from datetime import datetime

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.evolve import update_schema
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import (
        LongType,
        NestedField,
        TimestampNsType,
    )

    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    t = W.create_table(str(tmp_path / "ns"), sch, format_version=3)
    t = W.append(t, spark.range(3).selectExpr("id AS k"))
    dt = datetime(2024, 6, 1, 12, 30, 0, 123456)
    t = update_schema(t).add_column("seen_at", TimestampNsType(), default=dt).commit()
    f = t.schema.find_field("seen_at")
    # stored default is the ISO string; internal rep carries nanos
    from icegopher_spark.iceberg.literals import parse_json_single_value

    assert parse_json_single_value(TimestampNsType(), f.initial_default) % 1000 == 0
    got = {r["seen_at"] for r in t.scan().to_df(spark).collect()}
    assert got == {dt}
