"""Branch/tag write API + retention-aware expiration (reference models
refs read-side only, table/refs.go:25-44)."""

import time

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import maintenance as M
from icegopher_spark.iceberg import refs as R
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.schema import Schema
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
def table(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    t = W.append(t, li.limit(100))
    t = W.append(t, li.offset(100).limit(200))
    t = W.append(t, li.offset(300).limit(100))
    return t


def test_create_and_scan_tag_and_branch(spark, table):
    first = table.metadata.snapshots[0].snapshot_id
    t = R.create_tag(table, "v1.0", first)
    t = R.create_branch(t, "audit", t.metadata.snapshots[1].snapshot_id)
    assert t.metadata.refs["v1.0"].snapshot_ref_type == "tag"
    assert t.metadata.refs["audit"].snapshot_ref_type == "branch"
    # scans through the ref resolve the pinned snapshot
    assert t.scan().use_ref("v1.0").to_df(spark).count() == 100
    assert t.scan().use_ref("audit").to_df(spark).count() == 300
    assert t.scan().to_df(spark).count() == 400


def test_ref_validation(table):
    with pytest.raises(ValueError, match="already exists"):
        t = R.create_tag(table, "x")
        R.create_tag(t, "x")
    with pytest.raises(ValueError, match="unknown snapshot"):
        R.create_tag(table, "y", 123456789)
    with pytest.raises(ValueError, match="main"):
        R.drop_ref(table, "main")
    with pytest.raises(ValueError, match="not found"):
        R.drop_ref(table, "ghost")


def test_replace_and_drop_ref(spark, table):
    s1, s2 = (s.snapshot_id for s in table.metadata.snapshots[:2])
    t = R.create_branch(table, "dev", s1)
    t = R.replace_ref(t, "dev", s2)  # fast-forward
    assert t.metadata.refs["dev"].snapshot_id == s2
    assert t.scan().use_ref("dev").to_df(spark).count() == 300
    t = R.drop_ref(t, "dev")
    assert "dev" not in t.metadata.refs


def test_expire_honors_tag_and_drops_aged_refs(spark, table):
    s1 = table.metadata.snapshots[0].snapshot_id
    s2 = table.metadata.snapshots[1].snapshot_id
    t = R.create_tag(table, "keepme", s1)
    # a tag already older than its max-ref-age: snapshot is releasable
    t = R.create_tag(t, "stale", s2, max_ref_age_ms=0)
    time.sleep(0.01)
    t = M.expire_snapshots(t, retain_last=1)
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert s1 in kept  # pinned by live tag
    assert s2 not in kept  # its only ref aged out
    assert "stale" not in t.metadata.refs
    assert t.scan().use_ref("keepme").to_df(spark).count() == 100


def test_branch_min_snapshots_to_keep(spark, table):
    head = table.metadata.snapshots[-1].snapshot_id
    t = R.create_branch(table, "hist", head, min_snapshots_to_keep=3)
    t = M.expire_snapshots(t, retain_last=1)
    # branch ancestry (3 snapshots) fully retained despite retain_last=1
    assert len(t.metadata.snapshots) == 3
    assert t.scan().use_ref("hist").to_df(spark).count() == 400


def test_rollback_to_snapshot(spark, tmp_path):
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.refs import rollback_to
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField

    schema = Schema((NestedField(1, "x", LongType(), True),), schema_id=0)
    t = W.create_table(str(tmp_path / "rb"), schema)
    t = W.append(t, spark.range(10).select(F.col("id").alias("x")))
    s1 = t.current_snapshot().snapshot_id
    t = W.append(t, spark.range(10, 30).select(F.col("id").alias("x")))
    assert t.scan().to_df(spark).count() == 30
    t = rollback_to(t, s1)
    assert t.current_snapshot().snapshot_id == s1
    assert t.scan().to_df(spark).count() == 10
    # abandoned snapshot still reachable by explicit id (reversible)
    both = {s.snapshot_id for s in t.metadata.snapshots}
    assert len(both) == 2
    # writing after rollback forks from the rolled-back state
    t = W.append(t, spark.range(100, 105).select(F.col("id").alias("x")))
    assert t.scan().to_df(spark).count() == 15
    import pytest as _pt

    with _pt.raises(ValueError):
        rollback_to(t, 424242)


def test_write_audit_publish(spark, tmp_path):
    """WAP: stage appends on a branch, audit them, publish by
    fast-forwarding main; main is invisible to the change until then."""
    from pyspark.sql import functions as F

    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.refs import create_branch, rollback_to
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.types import LongType, NestedField

    schema = Schema((NestedField(1, "x", LongType(), True),), schema_id=0)
    t = W.create_table(str(tmp_path / "wap"), schema)
    t = W.append(t, spark.range(10).select(F.col("id").alias("x")))
    base = t.current_snapshot().snapshot_id
    t = create_branch(t, "audit")

    # stage TWO batches on the branch
    t = W.append(t, spark.range(10, 25).select(F.col("id").alias("x")), branch="audit")
    t = W.append(t, spark.range(25, 30).select(F.col("id").alias("x")), branch="audit")

    # main unchanged; branch sees staged data; lineage chains on the branch
    assert t.current_snapshot().snapshot_id == base
    assert t.scan().to_df(spark).count() == 10
    assert t.scan().use_ref("audit").to_df(spark).count() == 30
    head = t.metadata.snapshot_by_id(t.metadata.refs["audit"].snapshot_id)
    assert t.metadata.snapshot_by_id(head.parent_snapshot_id).parent_snapshot_id == base

    # audit passes -> publish = fast-forward main to the branch head
    t = rollback_to(t, t.metadata.refs["audit"].snapshot_id)
    assert t.scan().to_df(spark).count() == 30
    assert t.current_snapshot().snapshot_id == t.metadata.refs["audit"].snapshot_id
