"""Partition spec evolution: new default spec for future writes, old
files planned under their original spec, pruning correct across eras,
maintenance actions spec-aware."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import maintenance as M
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.evolve import update_spec
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.transforms import PartitionField, PartitionSpec, parse_transform
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = Schema(
    (
        NestedField(1, "l_orderkey", LongType(), True),
        NestedField(2, "l_quantity", DoubleType(), False),
        NestedField(3, "l_returnflag", StringType(), False),
    ),
    schema_id=0,
)


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )


def test_spec_evolution_end_to_end(spark, tmp_path, lineitem):
    # era 1: unpartitioned
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 2 == 0))
    # evolve: partition by return flag
    t = update_spec(t).add_field("l_returnflag", "identity", name="flag").commit()
    assert t.spec.spec_id == 1
    assert t.metadata.default_spec_id == 1
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 2 == 1))

    # full scan unions both eras
    n_total = lineitem.count()
    assert t.scan().to_df(spark).count() == n_total

    # a flag filter prunes era-2 files by partition but must NOT drop
    # era-1 files (unpartitioned, only stats-prunable)
    scan = t.scan(row_filter=E.equal_to("l_returnflag", "R"))
    expect = lineitem.filter(F.col("l_returnflag") == "R").count()
    assert scan.to_df(spark).count() == expect
    tasks = scan.plan_files()
    # era-2 contributed exactly 1 file (flag=R partition); era-1 file kept
    era2 = [t_ for t_ in tasks if "flag=" in t_.file.file_path]
    assert len(era2) == 1 and "flag=R" in era2[0].file.file_path


def test_spec_field_id_reuse(tmp_path, spark, lineitem):
    spec = PartitionSpec([PartitionField(3, 1000, "flag", parse_transform("identity"))])
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA, spec=spec)
    t = update_spec(t).remove_field("flag").commit()
    t = update_spec(t).add_field("l_returnflag", "identity", name="flag").commit()
    # same (source, transform) -> same partition field id as spec 0
    assert t.spec.fields[0].field_id == 1000
    assert t.spec.spec_id == 2


def test_spec_evolution_validation(tmp_path, spark):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    with pytest.raises(ValueError, match="not found"):
        update_spec(t).add_field("nope", "identity")
    u = update_spec(t).add_field("l_orderkey", "bucket[4]")
    with pytest.raises(ValueError, match="duplicate"):
        u.add_field("l_orderkey", "bucket[4]", name="other")
    with pytest.raises(ValueError, match="not found"):
        update_spec(t).remove_field("ghost")


def test_maintenance_skips_foreign_spec_manifests(spark, tmp_path, lineitem):
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 4 == 0))
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 4 == 1))
    t = update_spec(t).add_field("l_returnflag", "identity", name="flag").commit()
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 4 == 2))
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 4 == 3))
    n = t.scan().to_df(spark).count()

    # compaction rewrites only the era-2 (current spec) small files; the
    # two era-1 manifests survive untouched
    t2 = M.compact_data_files(t, spark, target_file_size=64 * 1024 * 1024)
    assert t2.scan().to_df(spark).count() == n
    from icegopher_spark.iceberg.manifests import ManifestContent, read_manifest_list

    manifests = read_manifest_list(t2.io.read(t2.current_snapshot().manifest_list))
    spec_ids = sorted(m.partition_spec_id for m in manifests if m.content != ManifestContent.DELETES)
    assert 0 in spec_ids and 1 in spec_ids  # both eras still present

    t3 = M.rewrite_manifests(t2)
    assert t3.scan().to_df(spark).count() == n


def test_equality_deletes_cross_spec_eras(spark, tmp_path, lineitem):
    """Eq-deletes committed after a spec change must apply to files of
    BOTH partition eras, and era-2 partition pruning must still apply
    the deletes to its surviving files."""
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 2 == 0))  # era 1: unpartitioned
    t = update_spec(t).add_field("l_returnflag", "identity", name="flag").commit()
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 2 == 1))  # era 2: by flag
    keys = lineitem.filter(F.col("l_orderkey") % 100 == 7).select("l_orderkey").distinct()
    t = W.delete_keys(t, spark, keys, ["l_orderkey"])

    expect_all = lineitem.filter("l_orderkey % 100 <> 7").count()
    assert t.scan().to_df(spark).count() == expect_all
    # deleted keys are gone from both eras (7 mod 100 hits even AND odd keys)
    got = t.scan().to_df(spark)
    assert got.filter("l_orderkey % 100 = 7").count() == 0
    assert got.filter("l_orderkey % 2 = 0").count() > 0
    assert got.filter("l_orderkey % 2 = 1").count() > 0
    # pruned era-2 scan still applies the deletes
    pruned = t.scan(row_filter=E.equal_to("l_returnflag", "R")).to_df(spark)
    expect_r = lineitem.filter("l_returnflag = 'R' AND l_orderkey % 100 <> 7").count()
    assert pruned.count() == expect_r


def test_cow_delete_after_spec_evolution_preserves_old_partitions(spark, tmp_path):
    """delete_where on a spec-evolved table must NOT re-encode old-spec
    entries under the new spec (r5 review: partition values silently
    nulled, breaking pruning). Foreign-spec manifests carry forward —
    rewritten under their OWN spec when they lose files."""
    from icegopher_spark.iceberg import expressions as E
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.evolve import update_spec
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.table import Table
    from icegopher_spark.iceberg.transforms import (
        PartitionField,
        PartitionSpec,
        parse_transform,
    )
    from icegopher_spark.iceberg.types import LongType, NestedField, StringType

    sch = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "g", StringType(), False),
        ),
        schema_id=0,
    )
    spec0 = PartitionSpec([PartitionField(2, 1000, "g_p", parse_transform("identity"))])
    t = W.create_table(str(tmp_path / "ev"), sch, spec0)
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)], "k long, g string"
    )
    t = W.append(t, df)
    # evolve to bucket(k) and append more rows under the new spec
    t = update_spec(t).add_field("k", "bucket[4]", "k_b").remove_field("g_p").commit()
    t = W.append(
        t,
        spark.createDataFrame([(i, "c") for i in range(100, 110)], "k long, g string"),
    )
    # k=0 lies outside the g_p='b' file's [1,19] bounds and the new
    # era's [100,109], so ONLY the old g_p='a' file is affected — the
    # foreign-spec manifest must be rewritten under ITS OWN spec with
    # the surviving g_p='b' entry intact
    t = W.delete_where(t, spark, E.equal_to("k", 0))
    rows = sorted(r.k for r in t.scan().to_df(spark).collect())
    assert rows == [i for i in range(1, 20)] + [i for i in range(100, 110)]
    # the UNTOUCHED old-era file (g_p='b') still carries its partition
    # value (the affected g_p='a' file was legitimately rewritten into
    # the current spec); pruning on the old partition still works
    old_tasks = [
        task
        for task in t.scan(row_filter=E.equal_to("g", "b")).plan_files()
        if "g_p" in task.file.partition
    ]
    assert old_tasks and all(task.file.partition["g_p"] == "b" for task in old_tasks)
    got = t.scan(row_filter=E.equal_to("g", "b")).to_df(spark)
    assert sorted(r.k for r in got.collect()) == [i for i in range(20) if i % 2 == 1]


def test_replace_sort_order(spark, tmp_path, lineitem):
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.evolve import replace_sort_order

    t = W.create_table(str(tmp_path / "so"), SCHEMA)
    assert t.metadata.default_sort_order_id == 0
    t = replace_sort_order(t, ("l_quantity", "desc"), "l_orderkey")
    order = t.metadata.default_sort_order
    assert order.order_id == 1 and len(order.fields) == 2
    assert order.fields[0].direction == "desc"
    assert order.fields[0].null_order == "nulls-last"  # spec default for desc
    assert order.fields[1].direction == "asc"

    # identical replacement is a no-op (no new commit, same id)
    v = t.metadata_location
    t2 = replace_sort_order(t, ("l_quantity", "desc"), "l_orderkey")
    assert t2.metadata_location == v

    # switching back to a previously-defined order reuses its id
    t3 = replace_sort_order(t, "l_orderkey")
    t3 = replace_sort_order(t3, ("l_quantity", "desc"), "l_orderkey")
    assert t3.metadata.default_sort_order_id == 1
    assert len(t3.metadata.sort_orders) == 3  # unsorted + two defined

    # writes under the new order tighten per-file quantity bounds:
    # the sort applies within write tasks (coalesce to 1 task, 2 files
    # via range split is not guaranteed here — just assert scan works
    # and metadata round-trips through a reload)
    t4 = W.append(t3, lineitem.limit(100))
    from icegopher_spark.iceberg.table import Table

    fresh = Table.from_location(t4.metadata.location)
    assert fresh.metadata.default_sort_order_id == 1
    assert fresh.scan().to_df(spark).count() == 100

    # unknown column / bad direction fail loudly
    import pytest as _pt

    with _pt.raises(ValueError, match="not in current schema"):
        replace_sort_order(t, "nope")
    with _pt.raises(ValueError, match="direction"):
        replace_sort_order(t, ("l_orderkey", "sideways"))


def test_replace_sort_order_to_unsorted_from_custom_created(tmp_path):
    """r7 review: a table CREATED with a custom order never wrote order
    0; resetting to UNSORTED must add it, not dangle the default id."""
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.evolve import replace_sort_order
    from icegopher_spark.iceberg.metadata import SortField, SortOrder

    so = SortOrder(order_id=1, fields=(SortField(source_id=1),))
    t = W.create_table(str(tmp_path / "so0"), SCHEMA, sort_order=so)
    assert [o.order_id for o in t.metadata.sort_orders] == [1]
    t = replace_sort_order(t)  # -> UNSORTED
    assert t.metadata.default_sort_order_id == 0
    assert any(
        o.order_id == 0 and not o.fields for o in t.metadata.sort_orders
    ), "order 0 must exist in sort-orders"
    # round-trips through a strict reload
    from icegopher_spark.iceberg.table import Table

    assert Table.from_location(t.metadata.location).metadata.default_sort_order_id == 0


def test_range_partitions_property_validation(spark, tmp_path, lineitem):
    from icegopher_spark.iceberg import write as W

    t = W.create_table(
        str(tmp_path / "rp"),
        SCHEMA,
        properties={"write.distribution-mode": "range", "write.range-partitions": "0"},
    )
    from icegopher_spark.iceberg.evolve import replace_sort_order

    t = replace_sort_order(t, "l_quantity")
    t = W.append(t, lineitem.limit(50))  # '0' = unset: planner decides
    assert t.scan().to_df(spark).count() == 50

    t2 = W.create_table(
        str(tmp_path / "rp2"),
        SCHEMA,
        properties={"write.distribution-mode": "range", "write.range-partitions": "lots"},
    )
    t2 = replace_sort_order(t2, "l_quantity")
    with pytest.raises(ValueError, match="write.range-partitions"):
        W.append(t2, lineitem.limit(10))
