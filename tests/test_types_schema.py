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
