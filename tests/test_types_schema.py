"""Schema/type tests patterned on the reference's schema_test.go
fixtures (nested table schema with list/map/struct; same shapes, not
the same code)."""

import json

import pytest
from pyspark.sql import types as T

from icegopher_spark.iceberg.schema import Schema, index_by_id, index_by_name, prune_columns
from icegopher_spark.iceberg.types import (
    BooleanType,
    DecimalType,
    FixedType,
    IntegerType,
    ListType,
    LongType,
    MapType,
    NestedField,
    StringType,
    StructType,
    type_from_json,
    type_to_json,
    to_spark_type,
)


def nested_schema() -> Schema:
    """Mirror of the reference's tableSchemaNested fixture shape
    (schema_test.go:31-88)."""
    return Schema(
        (
            NestedField(1, "foo", StringType(), False),
            NestedField(2, "bar", IntegerType(), True),
            NestedField(3, "baz", BooleanType(), False),
            NestedField(4, "qux", ListType(5, StringType(), True), True),
            NestedField(
                6,
                "quux",
                MapType(7, StringType(), 8, MapType(9, StringType(), 10, IntegerType(), True), True),
                True,
            ),
            NestedField(
                11,
                "location",
                ListType(
                    12,
                    StructType(
                        (
                            NestedField(13, "latitude", StringType(), False),
                            NestedField(14, "longitude", StringType(), False),
                        )
                    ),
                    True,
                ),
                True,
            ),
            NestedField(
                15,
                "person",
                StructType(
                    (
                        NestedField(16, "name", StringType(), False),
                        NestedField(17, "age", IntegerType(), True),
                    )
                ),
                False,
            ),
        ),
        schema_id=1,
    )


def test_primitive_json_roundtrip():
    for name in [
        "boolean",
        "int",
        "long",
        "float",
        "double",
        "date",
        "time",
        "timestamp",
        "timestamptz",
        "string",
        "uuid",
        "binary",
    ]:
        t = type_from_json(name)
        assert type_to_json(t) == name


def test_fixed_decimal_parse():
    assert type_from_json("fixed[22]") == FixedType(22)
    assert type_from_json("decimal(19, 25)") == DecimalType(19, 25)
    with pytest.raises(ValueError):
        type_from_json("fixed(22)")
    with pytest.raises(ValueError):
        type_from_json("decimal(19 25)")


def test_nested_field_str():
    f = NestedField(1, "foo", StringType(), False, doc="foo doc")
    assert str(f) == "1: foo: optional string (foo doc)"
    f2 = NestedField(2, "bar", IntegerType(), True)
    assert str(f2) == "2: bar: required int"


def test_schema_json_roundtrip():
    s = nested_schema()
    again = Schema.from_json(s.to_json())
    assert again == s
    assert again.schema_id == 1


def test_index_by_id():
    idx = index_by_id(nested_schema())
    assert idx[1].name == "foo"
    assert idx[5].name == "element"
    assert idx[7].name == "key"
    assert idx[8].name == "value"
    assert idx[13].name == "latitude"
    assert idx[17].name == "age"


def test_index_by_name_paths():
    idx = index_by_name(nested_schema())
    assert idx["foo"] == 1
    assert idx["person.name"] == 16
    assert idx["location.element.latitude"] == 13
    assert idx["quux.value.value"] == 10


def test_find_field_case_insensitive():
    s = nested_schema()
    assert s.find_field("FOO", case_sensitive=False).field_id == 1
    assert s.find_field("FOO", case_sensitive=True) is None


def test_highest_field_id():
    assert nested_schema().highest_field_id == 17


def test_select_flat():
    s = nested_schema()
    sel = s.select("foo", "bar")
    assert [f.field_id for f in sel.fields] == [1, 2]


def test_select_missing_raises():
    with pytest.raises(ValueError):
        nested_schema().select("nope")


def test_prune_nested_struct_field():
    s = nested_schema()
    pruned = prune_columns(s, {16})
    assert len(pruned.fields) == 1
    person = pruned.fields[0]
    assert person.field_id == 15
    assert [f.field_id for f in person.field_type.fields] == [16]


def test_prune_list_of_struct():
    s = nested_schema()
    pruned = prune_columns(s, {13})
    loc = pruned.fields[0]
    assert loc.field_id == 11
    assert [f.field_id for f in loc.field_type.element_type.fields] == [13]


def test_accessors():
    s = nested_schema()
    acc = s.accessor_for(17)  # person.age
    row = ["foo-val", 1, True, [], {}, [], ["alice", 42]]
    assert acc.get(row) == 42
    assert s.accessor_for(1).get(row) == "foo-val"


def test_to_spark_schema():
    st = to_spark_type(nested_schema().as_struct)
    assert isinstance(st, T.StructType)
    assert st["bar"].dataType == T.IntegerType()
    assert not st["bar"].nullable
    assert st["bar"].metadata["iceberg.field-id"] == 2
    assert isinstance(st["qux"].dataType, T.ArrayType)
    assert isinstance(st["quux"].dataType, T.MapType)


def test_schema_json_matches_spec_keys():
    d = nested_schema().to_json_dict()
    assert d["type"] == "struct"
    assert d["schema-id"] == 1
    blob = json.dumps(d)
    assert "element-id" in blob and "key-id" in blob


def test_time_type_annotation_survives_to_spark_schema():
    """Spark has no TIME type: `time` maps to LongType, but the logical
    type must stay visible — StructField metadata carries iceberg.type
    = time and the µs-since-midnight unit (r3 verdict #9)."""
    from pyspark.sql import types as ST

    from icegopher_spark.iceberg import types as it
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import to_spark_type

    s = Schema(
        (
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "wake", it.TimeType(), False),
        ),
        schema_id=0,
    )
    spark_t = to_spark_type(s.as_struct)
    wake = spark_t["wake"]
    assert wake.dataType == ST.LongType()
    assert wake.metadata["iceberg.type"] == "time"
    assert wake.metadata["iceberg.unit"] == "micros-since-midnight"
    # non-time fields carry only the field id
    assert "iceberg.type" not in spark_t["id"].metadata


# --- V3 type plane (r7): unknown, ns timestamps, loud refusals -----------


def test_v3_ns_and_unknown_roundtrip():
    from icegopher_spark.iceberg.types import (
        TimestampNsType,
        TimestampTzNsType,
        UnknownType,
        type_from_json,
        type_to_json,
    )

    for name, cls in (
        ("timestamp_ns", TimestampNsType),
        ("timestamptz_ns", TimestampTzNsType),
        ("unknown", UnknownType),
    ):
        t = type_from_json(name)
        assert isinstance(t, cls)
        assert type_to_json(t) == name


def test_v3_unsupported_types_parse_but_refuse_conversion():
    """r9 (r8 verdict #1b): geometry/geography PARSE into a placeholder
    (deselect tolerance — the table stays loadable) and refuse loudly,
    with the type named, only when converted to a Spark type (i.e.
    when the column is actually selected or written). The placeholder
    round-trips the original type string byte-exactly."""
    from icegopher_spark.iceberg.types import (
        UnsupportedGeoType,
        UnsupportedTypeError,
        to_spark_type,
        type_from_json,
        type_to_json,
    )

    for s in (
        "geometry",
        "geography",
        "geometry(srid:4326)",
        "geography(srid:4326, spherical)",
    ):
        t = type_from_json(s)
        assert isinstance(t, UnsupportedGeoType)
        assert type_to_json(t) == s  # byte-exact re-serialization
        with pytest.raises(UnsupportedTypeError, match="not supported") as ei:
            to_spark_type(t)
        assert s.split("(")[0] in str(ei.value)
    # unrecognized strings still get the generic error, not the V3 one
    from icegopher_spark.iceberg.types import UnsupportedTypeError as UTE

    with pytest.raises(ValueError) as ei:
        type_from_json("frobnicate")
    assert not isinstance(ei.value, UTE)


def test_v3_required_unknown_rejected():
    from icegopher_spark.iceberg.types import field_from_json

    with pytest.raises(ValueError, match="must be optional"):
        field_from_json({"id": 7, "name": "u", "type": "unknown", "required": True})
    f = field_from_json({"id": 7, "name": "u", "type": "unknown", "required": False})
    assert f.field_type.name == "unknown"


def test_v3_spark_mapping():
    from icegopher_spark.iceberg.types import (
        NestedField,
        StructType,
        TimestampNsType,
        TimestampTzNsType,
        UnknownType,
        to_spark_type,
    )

    st = to_spark_type(
        StructType(
            (
                NestedField(1, "ns", TimestampNsType(), False),
                NestedField(2, "tzns", TimestampTzNsType(), False),
                NestedField(3, "u", UnknownType(), False),
            )
        )
    )
    assert isinstance(st["ns"].dataType, T.TimestampNTZType)
    assert isinstance(st["tzns"].dataType, T.TimestampType)
    assert isinstance(st["u"].dataType, T.NullType)
    # the logical ns type is annotated so truncation is visible
    assert st["ns"].metadata["iceberg.type"] == "timestamp_ns"


def test_v3_ns_literal_casts_and_serde():
    from icegopher_spark.iceberg.literals import (
        L,
        Literal,
        LongAboveMax,
        literal_from_bytes,
        literal_to_bytes,
    )
    from icegopher_spark.iceberg.types import (
        DateType,
        TimestampNsType,
        TimestampType,
    )

    ns = Literal(1_500, TimestampNsType())       # 1.5 µs past epoch
    assert ns.to(TimestampType()).value == 1     # floor, not round
    neg = Literal(-1_500, TimestampNsType())
    assert neg.to(TimestampType()).value == -2   # floor toward -inf
    us = Literal(7, TimestampType())
    assert us.to(TimestampNsType()).value == 7_000
    # µs -> ns overflow surfaces the long sentinel (year ~2262+)
    big = Literal(2**62, TimestampType())
    assert big.to(TimestampNsType()) is LongAboveMax
    # binary single-value round-trip (int64 little-endian nanos)
    b = literal_to_bytes(ns)
    assert len(b) == 8
    assert literal_from_bytes(b, TimestampNsType()).value == 1_500
    # ns -> date floors whole days
    day_ns = Literal(-1, TimestampNsType())
    assert day_ns.to(DateType()).value == -1


def test_v3_ns_json_single_value_roundtrip():
    from icegopher_spark.iceberg.literals import (
        json_single_value,
        parse_json_single_value,
    )
    from icegopher_spark.iceberg.types import TimestampNsType, TimestampTzNsType

    v = 1_510_871_468_000_000_001  # 2017-11-16T22:31:08.000000001
    j = json_single_value(TimestampNsType(), v)
    assert j.endswith(".000000001")
    assert parse_json_single_value(TimestampNsType(), j) == v
    jz = json_single_value(TimestampTzNsType(), v)
    assert jz.endswith("+00:00")
    assert parse_json_single_value(TimestampTzNsType(), jz) == v
    # sub-µs fractions parse exactly (datetime.fromisoformat caps at 6)
    assert (
        parse_json_single_value(TimestampNsType(), "1970-01-01T00:00:00.123456789")
        == 123_456_789
    )


def test_v3_metadata_with_ns_and_unknown_parses():
    """A V3 metadata JSON from another engine using ns timestamps and an
    unknown column loads end-to-end: schema parses, Spark schema maps,
    and a `variant` column maps to Spark-native VariantType; geometry
    still fails naming the type."""
    from icegopher_spark.iceberg.metadata import parse_metadata
    from icegopher_spark.iceberg.types import UnsupportedTypeError

    def md_with(fields):
        return {
            "format-version": 3,
            "table-uuid": "9c12e441-d0c6-4b2f-9e84-5e9d7c0a1c00",
            "location": "/tmp/v3types",
            "last-updated-ms": 1,
            "last-column-id": 9,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "properties": {},
            "current-snapshot-id": -1,
            "snapshots": [],
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "next-row-id": 0,
        }

    md = parse_metadata(
        md_with(
            [
                {"id": 1, "name": "ev_ns", "type": "timestamp_ns", "required": False},
                {"id": 2, "name": "ev_tzns", "type": "timestamptz_ns", "required": False},
                {"id": 3, "name": "maybe", "type": "unknown", "required": False},
            ]
        )
    )
    spark_schema = md.current_schema.to_spark()
    assert isinstance(spark_schema["ev_ns"].dataType, T.TimestampNTZType)
    assert isinstance(spark_schema["maybe"].dataType, T.NullType)

    # variant is a supported type since r8 — a V3 metadata JSON with a
    # variant field parses and maps to Spark's native VariantType
    vmd = parse_metadata(
        md_with([{"id": 1, "name": "v", "type": "variant", "required": False}])
    )
    assert isinstance(vmd.current_schema.to_spark()["v"].dataType, T.VariantType)
    # geometry PARSES (deselect tolerance, r9) but refuses per-column
    # at Spark conversion with the column named
    gmd = parse_metadata(
        md_with([{"id": 1, "name": "g", "type": "geometry", "required": False}])
    )
    with pytest.raises(UnsupportedTypeError, match="'g'.*geometry"):
        gmd.current_schema.to_spark()


def test_v3_ns_filter_compiles_to_datetime_literal():
    """r7 review: the exact Spark re-filter compared a TimestampNTZ
    column to a raw int64-nanos literal (DATATYPE_MISMATCH). The
    compiled literal must be a datetime over the truncated µs plane."""
    from datetime import datetime

    from icegopher_spark.iceberg.expressions import _lit_value
    from icegopher_spark.iceberg.literals import Literal
    from icegopher_spark.iceberg.types import TimestampNsType, TimestampTzNsType

    v = _lit_value(Literal(1_500_000_000_123_456_789, TimestampNsType()))
    assert isinstance(v, datetime) and v.tzinfo is None
    assert v.microsecond == 123_456  # floor truncation of ...789 ns
    vz = _lit_value(Literal(1_500_000_000_123_456_789, TimestampTzNsType()))
    assert isinstance(vz, datetime) and vz.tzinfo is not None


def test_v3_string_to_ns_overflow_folds_to_sentinel():
    from icegopher_spark.iceberg.literals import L, LongAboveMax
    from icegopher_spark.iceberg.types import StringType, TimestampNsType

    lit = L("9999-12-31T23:59:59", StringType())
    assert lit.to(TimestampNsType()) is LongAboveMax  # ~year 2262 cap
    ok = L("2100-01-01T00:00:00", StringType()).to(TimestampNsType())
    assert ok.value == 4_102_444_800_000_000_000


def test_variant_type_parses_and_maps_to_spark():
    """r7 verdict #3: `variant` is a real type now — parses from
    metadata JSON, maps to Spark's native VariantType, round-trips
    through schema JSON; geometry/geography stay loudly refused."""
    import pytest
    from pyspark.sql import types as ST

    from icegopher_spark.iceberg.types import (
        UnsupportedTypeError,
        VariantType,
        to_spark_type,
        type_from_json,
    )

    v = type_from_json("variant")
    assert isinstance(v, VariantType)
    assert to_spark_type(v) == ST.VariantType()
    # geometry/geography parse to a placeholder (deselect tolerance,
    # r9) and refuse loudly at Spark conversion
    for bad in ("geometry", "geography", "geometry(srid:3857)"):
        with pytest.raises(UnsupportedTypeError):
            to_spark_type(type_from_json(bad))


def test_variant_table_scan_and_deselect(spark, tmp_path):
    """A v3 table with a variant column is scannable: other columns
    with the variant DESELECTED (the r7 verdict's minimum), and the
    variant itself through Spark's native read + variant_get."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.table import Table
    from icegopher_spark.iceberg.types import (
        LongType,
        NestedField,
        StringType,
        VariantType,
    )

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "name", StringType(), False),
            NestedField(3, "payload", VariantType(), False),
        ),
        schema_id=0,
    )
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        F.parse_json(
            F.to_json(F.struct((F.col("id") * 2).alias("q")))
        ).alias("payload"),
    )
    loc = str(tmp_path / "var")
    t = W.create_table(loc, sch, format_version=3)
    t = W.append(t, df.coalesce(2))

    # record counts came through the footer fallback (pyarrow cannot
    # open these footers at all)
    tasks = t.scan().plan_files()
    assert sum(task.file.record_count for task in tasks) == 20
    # variant columns carry no bounds/counts — unprunable, not wrong
    assert all(3 not in (task.file.value_counts or {}) for task in tasks)

    # deselect-tolerant scan
    got = t.scan(selected_fields=("k", "name")).to_df(spark)
    assert got.count() == 20 and got.columns == ["k", "name"]

    # full scan + typed extraction; metadata JSON round-trip via reload
    t2 = Table.from_location(loc)
    vals = {
        r["k"]: r["q"]
        for r in t2.scan()
        .to_df(spark)
        .select("k", F.try_variant_get("payload", "$.q", "long").alias("q"))
        .collect()
    }
    assert vals == {i: 2 * i for i in range(20)}


def test_footer_num_rows_matches_pyarrow():
    """The thrift-compact fallback parser agrees with pyarrow on every
    test table (it is only USED when pyarrow refuses the footer, but it
    must be byte-exact on anything)."""
    import glob

    import pyarrow.parquet as pq

    from icegopher_spark.iceberg.write import _footer_num_rows

    paths = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    assert paths
    for p in paths:
        assert _footer_num_rows(p) == pq.ParquetFile(p).metadata.num_rows


def test_variant_table_lineage_preserving_compaction(spark, tmp_path):
    """r8 review: the variant footer fallback must reconstruct the
    reserved-column value_counts, or a lineage-preserving compaction of
    a variant table silently reassigns every row's _row_id (the
    allocator re-consumes and scans synthesize ids instead of reading
    the materialized column)."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.maintenance import compact_data_files
    from icegopher_spark.iceberg.manifests import has_materialized_row_ids
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField, VariantType

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "v", VariantType(), False),
        ),
        schema_id=0,
    )
    loc = str(tmp_path / "varcomp")
    t = W.create_table(loc, sch, format_version=3)
    for lo in (0, 10):
        df = spark.range(lo, lo + 10).select(
            F.col("id").alias("k"),
            F.parse_json(
                F.concat(F.lit('{"q": '), F.col("id").cast("string"), F.lit("}"))
            ).alias("v"),
        )
        t = W.append(t, df.coalesce(1))
    before = {
        r["k"]: r["_row_id"]
        for r in t.scan(with_lineage=True).to_df(spark).collect()
    }
    assert sorted(before.values()) == list(range(20))

    t = compact_data_files(t, spark, small_file_threshold=10**9)
    # the rewritten (variant-bearing) file is detected as id-carrying
    tasks = t.scan().plan_files()
    assert any(has_materialized_row_ids(task.file) for task in tasks)
    after = {
        r["k"]: r["_row_id"]
        for r in t.scan(with_lineage=True).to_df(spark).collect()
    }
    assert after == before  # lineage survived the rewrite byte-exactly


def test_geo_table_deselect_tolerant_scan(spark, tmp_path):
    """r8 verdict #1b: a table containing ONE geo column must not be
    entirely unloadable. The table loads, non-geo columns scan
    normally (data files adopted via add_files carry the geo column
    physically as WKB binary, exactly the V3 on-disk representation),
    and selecting the geo column — explicitly or via the default
    ``*`` projection — refuses with the column and type named."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.table import Table
    from icegopher_spark.iceberg.types import (
        DoubleType,
        LongType,
        NestedField,
        UnsupportedTypeError,
        type_from_json,
    )

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "geo", type_from_json("geometry(srid:4326)"), False),
            NestedField(3, "val", DoubleType(), False),
        ),
        schema_id=0,
    )
    # data file as another engine would write it: geometry physically
    # stored as WKB binary
    df = spark.range(30).select(
        F.col("id").alias("k"),
        F.encode(F.lit("\x01\x01WKB-ish"), "utf-8").alias("geo"),
        (F.col("id") * 1.5).alias("val"),
    )
    path = str(tmp_path / "geo_data")
    df.coalesce(1).write.parquet(path)
    import glob

    files = sorted(glob.glob(f"{path}/*.parquet"))

    loc = str(tmp_path / "geo_table")
    t = W.create_table(loc, sch, format_version=3)
    t = W.add_files(t, files)

    # metadata JSON round-trip: reloading from disk preserves the geo
    # type string byte-exactly
    t2 = Table.from_location(loc)
    assert str(t2.schema.find_field(2).field_type) == "geometry(srid:4326)"

    # deselect-tolerant scan of the non-geo columns
    got = t2.scan(selected_fields=("k", "val")).to_df(spark)
    assert got.columns == ["k", "val"]
    assert got.count() == 30
    assert got.agg(F.sum("val")).collect()[0][0] == sum(i * 1.5 for i in range(30))

    # selecting the geo column refuses with column + type named
    with pytest.raises(UnsupportedTypeError, match="'geo'.*geometry"):
        t2.scan(selected_fields=("k", "geo")).to_df(spark)
    with pytest.raises(UnsupportedTypeError, match="geometry"):
        t2.scan().to_df(spark)  # default * projection selects geo

    # writes into a geo table refuse too (cannot encode the column)
    with pytest.raises(UnsupportedTypeError):
        W.append(t2, df)


def test_shredded_variant_reads_back_identically(spark, tmp_path):
    """r8 verdict #1a: a variant column whose data files are SHREDDED
    (typed_value subcolumns per the V3 shredding spec) must read back
    value-identically to the unshredded layout, including paths NOT in
    the shredding schema (they fall back to the residual `value`
    field). Deselect of the variant column works on shredded files
    too."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.table import strip_file_scheme
    from icegopher_spark.iceberg.types import (
        LongType,
        NestedField,
        VariantType,
    )

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "payload", VariantType(), False),
        ),
        schema_id=0,
    )
    # q is in the shredding schema; extra is NOT (exercises the
    # residual value path of the reassembly)
    df = spark.range(25).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.to_json(
                F.struct(
                    (F.col("id") * 3).alias("q"),
                    F.concat(F.lit("x"), F.col("id").cast("string")).alias("extra"),
                )
            )
        ).alias("payload"),
    )
    loc = str(tmp_path / "shred")
    t = W.create_table(loc, sch, format_version=3)
    key = "spark.sql.variant.forceShreddingSchemaForTest"
    spark.conf.set(key, "q long")
    try:
        t = W.append(t, df.coalesce(2))
    finally:
        spark.conf.set(key, "")

    tasks = t.scan().plan_files()
    assert tasks
    for task in tasks:  # files are REALLY shredded
        with open(strip_file_scheme(task.file.file_path), "rb") as f:
            assert b"typed_value" in f.read()
    # footer fallback still counts rows on shredded footers
    assert sum(task.file.record_count for task in tasks) == 25

    got = {
        r["k"]: (r["q"], r["extra"])
        for r in t.scan()
        .to_df(spark)
        .select(
            "k",
            F.try_variant_get("payload", "$.q", "long").alias("q"),
            F.try_variant_get("payload", "$.extra", "string").alias("extra"),
        )
        .collect()
    }
    assert got == {i: (3 * i, f"x{i}") for i in range(25)}

    # deselect tolerance holds on shredded files
    slim = t.scan(selected_fields=("k",)).to_df(spark)
    assert slim.columns == ["k"] and slim.count() == 25
