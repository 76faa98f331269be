"""SqlCatalog (sqlite-backed JDBC-catalog model): CRUD, namespaces,
CAS commits through the write path, conflict detection, registration.
Closes the 'sql' member of the reference's CatalogType enum
(table/catalog/catalog.go:16-24) that it never implemented."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.catalog import (
    CatalogError,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    load_catalog,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.sqlcatalog import SqlCatalog
from icegopher_spark.iceberg.types import (
    DoubleType,
    LongType,
    NestedField,
    StringType,
    TimestampType,
)

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = Schema(
    (
        NestedField(1, "l_orderkey", LongType(), True),
        NestedField(2, "l_quantity", DoubleType(), False),
        NestedField(3, "l_returnflag", StringType(), False),
        NestedField(4, "l_shipdate", TimestampType(), False),
    ),
    schema_id=0,
    identifier_field_ids=(),
)


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
        F.col("l_shipdate").cast("timestamp_ntz").alias("l_shipdate"),
    )


@pytest.fixture()
def cat(tmp_path):
    c = load_catalog(
        "test",
        f"sqlite:{tmp_path}/catalog.db",
        {"warehouse": str(tmp_path / "wh")},
    )
    assert isinstance(c, SqlCatalog)  # inferred from the sqlite: scheme
    c.create_namespace("db")
    return c


def test_namespace_crud(cat):
    assert cat.list_namespaces() == [("db",)]
    with pytest.raises(NamespaceAlreadyExistsError):
        cat.create_namespace("db")
    cat.create_namespace("other", {"owner": "alice"})
    assert cat.load_namespace_properties("other") == {"owner": "alice"}
    out = cat.update_namespace_properties("other", removals=["owner", "ghost"], updates={"x": "1"})
    assert out == {"removed": ["owner"], "updated": ["x"], "missing": ["ghost"]}
    assert cat.load_namespace_properties("other") == {"x": "1"}
    cat.drop_namespace("other")
    with pytest.raises(NoSuchNamespaceError):
        cat.load_namespace_properties("other")


def test_table_crud_and_scan(cat, spark, lineitem):
    with pytest.raises(NoSuchNamespaceError):
        cat.create_table("nope.t", SCHEMA)
    t = cat.create_table("db.li", SCHEMA)
    with pytest.raises(CatalogError):
        cat.create_table("db.li", SCHEMA)
    t = W.append(t, lineitem.limit(100))
    assert cat.load_table("db.li").scan().to_df(spark).count() == 100
    assert cat.list_tables("db") == [("db", "li")]
    cat.rename_table("db.li", "db.li2")
    assert cat.table_exists("db.li2") and not cat.table_exists("db.li")
    # non-empty namespace refuses to drop
    with pytest.raises(CatalogError):
        cat.drop_namespace("db")
    cat.drop_table("db.li2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.li2")


def test_cas_commit_and_pointer_history(cat, spark, lineitem):
    t = cat.create_table("db.cas", SCHEMA)
    v0 = t.metadata_location
    t = W.append(t, lineitem.limit(50))
    assert t.metadata_location != v0
    # pointer row advanced and previous_metadata_location tracks v0
    row = cat._db.execute(
        "SELECT metadata_location, previous_metadata_location FROM iceberg_tables"
        " WHERE table_name='cas'"
    ).fetchone()
    assert row == (t.metadata_location, v0)
    # second append stacks a second snapshot on the catalog's copy
    t = W.append(t, lineitem.limit(25))
    fresh = cat.load_table("db.cas")
    assert len(fresh.metadata.snapshots) == 2
    assert fresh.scan().to_df(spark).count() == 75


def test_concurrent_commit_conflict(cat, spark, lineitem):
    t1 = cat.create_table("db.conflict", SCHEMA)
    t2 = cat.load_table("db.conflict")
    W.append(t1, lineitem.limit(10))
    with pytest.raises(W.CommitFailedError):
        W.append(t2, lineitem.limit(10))
    # refresh + retry wins
    t2.refresh()
    W.append(t2, lineitem.limit(10))
    assert cat.load_table("db.conflict").scan().to_df(spark).count() == 20


def test_register_existing_table(cat, tmp_path, spark, lineitem):
    loose = W.create_table(str(tmp_path / "loose"), SCHEMA)
    loose = W.append(loose, lineitem.limit(30))
    t = cat.register_table("db.adopted", loose.metadata_location)
    assert t.scan().to_df(spark).count() == 30
    # registered table commits through the catalog from now on
    t = W.append(t, lineitem.limit(5))
    assert cat.load_table("db.adopted").scan().to_df(spark).count() == 35


def test_cli_add_files_and_register(cat, tmp_path, spark, lineitem, capsys):
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.cli import main as cli_main

    loose = W.create_table(str(tmp_path / "cli_loose"), SCHEMA)
    loose = W.append(loose, lineitem.limit(20))
    db = str(tmp_path / "catalog.db")
    wh = str(tmp_path / "wh")
    base = ["--catalog", f"sqlite:{db}", "--warehouse", wh]
    assert cli_main([*base, "register", "db.cli_t", loose.metadata_location]) == 0
    extra = tmp_path / "extra"
    lineitem.limit(7).coalesce(1).write.parquet(str(extra))
    pq_files = sorted(str(p) for p in extra.glob("*.parquet"))
    assert cli_main([*base, "add-files", "db.cli_t", *pq_files]) == 0
    out = capsys.readouterr().out
    assert "registered db.cli_t" in out and "added 1 files" in out
    # rows are scoped by catalog NAME; read back under the CLI's name
    cli_cat = load_catalog("cli", f"sqlite:{db}", {"warehouse": wh})
    assert cli_cat.load_table("db.cli_t").scan().to_df(spark).count() == 27


def test_cli_compact_and_zorder(cat, tmp_path, spark, lineitem, capsys):
    """The two data-moving CLI verbs (round-5): bin-pack compaction and
    z-order clustering through the same maintenance path the library
    exposes."""
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.cli import main as cli_main

    loose = W.create_table(str(tmp_path / "cli_z"), SCHEMA)
    for i in range(4):  # four small files
        loose = W.append(loose, lineitem.limit(10))
    db = str(tmp_path / "catalog.db")
    wh = str(tmp_path / "wh")
    base = ["--catalog", f"sqlite:{db}", "--warehouse", wh]
    assert cli_main([*base, "register", "db.cli_z", loose.metadata_location]) == 0
    assert cli_main([*base, "compact", "db.cli_z"]) == 0
    out = capsys.readouterr().out
    assert "compacted:" in out
    cli_cat = load_catalog("cli", f"sqlite:{db}", {"warehouse": wh})
    t = cli_cat.load_table("db.cli_z")
    assert t.scan().to_df(spark).count() == 40
    assert cli_main([*base, "zorder", "db.cli_z", "l_orderkey", "l_quantity"]) == 0
    out = capsys.readouterr().out
    assert "z-ordered on (l_orderkey, l_quantity)" in out
    t = cli_cat.load_table("db.cli_z")
    assert t.current_snapshot().summary["operation"] == "replace"
    assert t.scan().to_df(spark).count() == 40


def test_cli_compact_empty_table_noop(cat, tmp_path, capsys):
    """compact/zorder on a table with NO snapshots: clean no-op message,
    not an AttributeError on current_snapshot().summary."""
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.cli import main as cli_main

    loose = W.create_table(str(tmp_path / "cli_empty"), SCHEMA)
    db = str(tmp_path / "catalog.db")
    wh = str(tmp_path / "wh")
    base = ["--catalog", f"sqlite:{db}", "--warehouse", wh]
    assert cli_main([*base, "register", "db.cli_empty", loose.metadata_location]) == 0
    assert cli_main([*base, "compact", "db.cli_empty"]) == 0
    assert cli_main([*base, "zorder", "db.cli_empty", "l_orderkey"]) == 0
    out = capsys.readouterr().out
    assert out.count("empty table") == 2


def test_ref_evolve_expire_commits_reach_the_catalog_pointer(spark, tmp_path):
    """r6: refs/evolve/expire commits previously wrote new metadata via
    the version-hint path WITHOUT moving the SQL catalog's pointer, so
    the next load_table() silently lost the change."""
    from icegopher_spark.iceberg import refs, write as W
    from icegopher_spark.iceberg.evolve import UpdateSchema
    from icegopher_spark.iceberg.maintenance import expire_snapshots
    from icegopher_spark.iceberg.schema import Schema
    from icegopher_spark.iceberg.sqlcatalog import SqlCatalog
    from icegopher_spark.iceberg.types import LongType, NestedField, StringType

    cat = SqlCatalog(
        "c", f"sqlite:{tmp_path}/cat.db", {"warehouse": str(tmp_path / "wh")}
    )
    cat.create_namespace(("db",))
    sch = Schema((NestedField(1, "k", LongType(), True),), schema_id=0)
    t = cat.create_table(("db", "t"), sch)
    t = W.append(t, spark.range(5).selectExpr("id AS k"))
    t = W.append(t, spark.range(5, 9).selectExpr("id AS k"))

    refs.create_tag(t, "v1")
    assert "v1" in cat.load_table(("db", "t")).metadata.refs  # pointer moved

    t = cat.load_table(("db", "t"))
    UpdateSchema(t).add_column("note", StringType()).commit()
    assert "note" in [
        f.name for f in cat.load_table(("db", "t")).schema.fields
    ]

    t = cat.load_table(("db", "t"))
    first = t.metadata.snapshots[0].snapshot_id
    refs.drop_ref(t, "v1")
    t = cat.load_table(("db", "t"))
    expire_snapshots(t, retain_last=1)
    fresh = cat.load_table(("db", "t"))
    assert fresh.metadata.snapshot_by_id(first) is None  # expiry visible
    assert "v1" not in fresh.metadata.refs

    # rollback via replace_ref('main', ...) keeps the invariant AND the pointer
    t = cat.load_table(("db", "t"))
    cur = t.current_snapshot().snapshot_id
    refs.replace_ref(t, "main", cur)  # no-op retarget must not raise
    assert cat.load_table(("db", "t")).current_snapshot().snapshot_id == cur


def test_jdbc_sqlite_uri_spelling(tmp_path):
    from icegopher_spark.iceberg.sqlcatalog import SqlCatalog

    cat = SqlCatalog(
        "c", f"jdbc:sqlite:{tmp_path}/jc.db", {"warehouse": str(tmp_path / "wh")}
    )
    cat.create_namespace(("db",))
    assert ("db",) in cat.list_namespaces()
    import os
    assert os.path.exists(f"{tmp_path}/jc.db")  # not a literal 'jdbc:sqlite:' dir


def test_first_branch_commit_on_catalog_table(cat, spark, lineitem):
    """r6: the CAS requirement for a not-yet-existing branch must
    assert ABSENCE (snapshot-id null) — sending main's head made the
    first commit to a new branch always fail on catalog tables while
    succeeding on filesystem tables."""
    t = cat.create_table("db.branchy", SCHEMA)
    t = W.append(t, lineitem.limit(60))
    # no create_branch: the append itself creates 'audit'
    t = W.append(t, lineitem.limit(40), branch="audit")
    t = cat.load_table("db.branchy")
    assert "audit" in t.metadata.refs
    audit_head = t.metadata.refs["audit"].snapshot_id
    assert audit_head != t.current_snapshot().snapshot_id
    # main still sees only the first append
    assert t.scan().to_df(spark).count() == 60
    assert t.scan(snapshot_id=audit_head).to_df(spark).count() == 100


def test_cli_partition_stats(cat, tmp_path, spark, lineitem, capsys):
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.cli import main as cli_main
    from icegopher_spark.iceberg.partition_stats import read_partition_stats

    loose = W.create_table(str(tmp_path / "cli_ps"), SCHEMA)
    loose = W.append(loose, lineitem.limit(25))
    db = str(tmp_path / "catalog.db")
    wh = str(tmp_path / "wh")
    base = ["--catalog", f"sqlite:{db}", "--warehouse", wh]
    assert cli_main([*base, "register", "db.cli_ps", loose.metadata_location]) == 0
    assert cli_main([*base, "partition-stats", "db.cli_ps"]) == 0
    out = capsys.readouterr().out
    assert "partition statistics for snapshot" in out
    cli_cat = load_catalog("cli", f"sqlite:{db}", {"warehouse": wh})
    t = cli_cat.load_table("db.cli_ps")
    stats = read_partition_stats(t, spark)
    assert stats.agg(F.sum("data_record_count")).collect()[0][0] == 25


def test_commit_with_retry_two_interleaved_committers(cat, spark, lineitem):
    """Two writers holding handles at the same base version both land:
    the loser's commit_with_retry refreshes to the winner's head and
    re-applies, producing three snapshots and all 30 rows."""
    t1 = cat.create_table("db.retry", SCHEMA)
    t2 = cat.load_table("db.retry")
    W.append(t1, lineitem.limit(10))
    # t2 is now stale; a plain append conflicts, the retry loop wins
    t2 = W.commit_with_retry(t2, lambda t: W.append(t, lineitem.offset(10).limit(20)))
    fresh = cat.load_table("db.retry")
    assert fresh.scan().to_df(spark).count() == 30
    assert len(fresh.metadata.snapshots) == 2


def test_commit_with_retry_exhausts_and_raises(cat, lineitem):
    t1 = cat.create_table("db.retry2", SCHEMA)

    calls = []

    def always_conflicts(t):
        calls.append(1)
        raise W.CommitFailedError("simulated concurrent writer")

    with pytest.raises(W.CommitFailedError, match="simulated"):
        W.commit_with_retry(t1, always_conflicts, attempts=3)
    assert len(calls) == 3
    with pytest.raises(ValueError, match="attempts"):
        W.commit_with_retry(t1, always_conflicts, attempts=0)
