"""HiveCatalog over a mocked thrift wire (hms_fixture.MockHMSServer):
create/load/commit round-trips, CAS conflicts enforced by the SERVER's
expected-parameter check, namespace CRUD, rename, registration — the
HMS twin of test_sql_catalog.py, closing the reference's CatalogHive
enum member (table/catalog/catalog.go:40-47, never implemented there).

Every assertion crosses a real TCP socket with strict thrift binary
framing on both sides — nothing is stubbed above the wire.
"""

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
from icegopher_spark.iceberg.hivecatalog import HiveCatalog
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import (
    DoubleType,
    LongType,
    NestedField,
    StringType,
    TimestampType,
)

from hms_fixture import MockHMSServer

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
def server():
    srv = MockHMSServer()
    yield srv
    srv.stop()


@pytest.fixture()
def cat(server, tmp_path):
    c = load_catalog(
        "test",
        f"thrift://127.0.0.1:{server.port}",
        {"warehouse": str(tmp_path / "wh")},
    )
    assert isinstance(c, HiveCatalog)  # inferred from the thrift: scheme
    c.create_namespace("db")
    return c


def test_explicit_type_property_dispatch(server, tmp_path):
    c = load_catalog(
        "t2",
        properties={
            "type": "hive",
            "uri": f"thrift://127.0.0.1:{server.port}",
            "warehouse": str(tmp_path / "wh"),
        },
    )
    assert isinstance(c, HiveCatalog)


def test_namespace_crud(cat):
    assert cat.list_namespaces() == [("db",)]
    with pytest.raises(NamespaceAlreadyExistsError):
        cat.create_namespace("db")
    cat.create_namespace("other", {"owner": "alice"})
    assert cat.load_namespace_properties("other") == {"owner": "alice"}
    cat.drop_namespace("other")
    with pytest.raises(NoSuchNamespaceError):
        cat.load_namespace_properties("other")
    with pytest.raises(NoSuchNamespaceError):
        cat.drop_namespace("ghost")


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
    with pytest.raises(CatalogError):  # non-empty namespace refuses drop
        cat.drop_namespace("db")
    cat.drop_table("db.li2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.li2")


def test_cas_commit_and_pointer_history(cat, server, spark, lineitem):
    t = cat.create_table("db.cas", SCHEMA)
    v0 = t.metadata_location
    t = W.append(t, lineitem.limit(50))
    assert t.metadata_location != v0
    # HMS row advanced; previous_metadata_location tracks v0
    row = server.state.tables[("db", "cas")]["parameters"]
    assert row["metadata_location"] == t.metadata_location
    assert row["previous_metadata_location"] == v0
    assert row["table_type"] == "ICEBERG"
    t = W.append(t, lineitem.limit(25))
    fresh = cat.load_table("db.cas")
    assert len(fresh.metadata.snapshots) == 2
    assert fresh.scan().to_df(spark).count() == 75


def test_concurrent_commit_conflict(cat, server, spark, lineitem):
    """Two writers from the same snapshot: the loser fails against the
    HMS row's CURRENT metadata during the requirements check (its ref
    moved), BEFORE any alter reaches the wire — the server-side
    expected-parameter CAS (pinned separately below) covers only the
    narrower get_table→alter race window."""
    t1 = cat.create_table("db.conflict", SCHEMA)
    t2 = cat.load_table("db.conflict")
    W.append(t1, lineitem.limit(10))
    n_alters = server.state.calls.count("alter_table_with_environment_context")
    with pytest.raises(W.CommitFailedError):
        W.append(t2, lineitem.limit(10))
    assert (
        server.state.calls.count("alter_table_with_environment_context") == n_alters
    ), "a losing commit must never alter the HMS row"
    # refresh + retry wins
    t2.refresh()
    W.append(t2, lineitem.limit(10))
    assert cat.load_table("db.conflict").scan().to_df(spark).count() == 20


def test_cas_lost_race_is_server_enforced(cat, server, spark, lineitem, monkeypatch):
    """The get_table→alter window: another committer swaps the pointer
    AFTER this writer's requirements check passed. Only the server's
    expected-parameter check can catch that — simulate by moving the
    pointer between the client's get_table and its alter."""
    from icegopher_spark.iceberg import hivecatalog as HC

    t = cat.create_table("db.race", SCHEMA)
    t = W.append(t, lineitem.limit(5))

    real_call = cat._client.call
    raced = {"done": False}

    def racing_call(method, **kwargs):
        out = real_call(method, **kwargs)
        if method == "get_table" and not raced["done"]:
            # interloper commits between our read and our alter
            raced["done"] = True
            key = (kwargs["dbname"], kwargs["tbl_name"])
            row = server.state.tables[key]
            row["parameters"] = {
                **row["parameters"],
                "metadata_location": row["parameters"]["metadata_location"]
                + ".interloper",
            }
        return out

    monkeypatch.setattr(cat._client, "call", racing_call)
    with pytest.raises(W.CommitFailedError, match="concurrent update"):
        cat.commit_table(
            t,
            [{"type": "assert-table-uuid", "uuid": t.metadata.table_uuid}],
            [{"action": "set-properties", "updates": {"k": "v"}}],
        )


def test_alter_expected_parameter_check_in_mock(cat, server, lineitem):
    """Direct wire-level pin of the HIVE-26882 contract the commit path
    relies on: an alter whose expected metadata_location is stale gets
    a MetaException, and the table is left untouched."""
    from icegopher_spark.iceberg import hms

    cat.create_table("db.raw", SCHEMA)
    cur = cat._client.call("get_table", dbname="db", tbl_name="raw")
    stale = dict(cur)
    stale["parameters"] = {**cur["parameters"], "metadata_location": "/elsewhere"}
    with pytest.raises(hms.MetaException):
        cat._client.call(
            "alter_table_with_environment_context",
            dbname="db",
            tbl_name="raw",
            new_tbl=stale,
            environment_context={
                "properties": {
                    "expected_parameter_key": "metadata_location",
                    "expected_parameter_value": "/not-the-current-pointer",
                }
            },
        )
    unchanged = cat._client.call("get_table", dbname="db", tbl_name="raw")
    assert unchanged["parameters"] == cur["parameters"]


def test_register_existing_table(cat, tmp_path, spark, lineitem):
    loose = W.create_table(str(tmp_path / "loose"), SCHEMA)
    loose = W.append(loose, lineitem.limit(30))
    t = cat.register_table("db.adopted", loose.metadata_location)
    assert t.scan().to_df(spark).count() == 30
    t = W.append(t, lineitem.limit(5))
    assert cat.load_table("db.adopted").scan().to_df(spark).count() == 35


def test_non_iceberg_table_refused(cat, server):
    server.state.tables[("db", "plainhive")] = {
        "tableName": "plainhive",
        "dbName": "db",
        "parameters": {"table_type": "MANAGED"},
    }
    with pytest.raises(CatalogError, match="not an Iceberg table"):
        cat.load_table("db.plainhive")


def test_thrift_struct_roundtrip_with_unknown_fields():
    """Wire-format pin: a server sending EXTRA fields (newer IDL) must
    decode cleanly — unknown fields skip by type."""
    import io

    from icegopher_spark.iceberg import thrift_proto as T

    w = T.BinaryWriter()
    # a FieldSchema struct with an extra i64 field 99 and a nested
    # unknown struct field 98
    w.write_field_begin(T.STRING, 1)
    w.write_string("col_a")
    w.write_field_begin(T.I64, 99)
    w.write_i64(12345)
    w.write_field_begin(T.STRUCT, 98)
    w.write_field_begin(T.LIST, 1)
    w.write_list_begin(T.STRING, 2)
    w.write_string("x")
    w.write_string("y")
    w.write_field_stop()
    w.write_field_begin(T.STRING, 2)
    w.write_string("bigint")
    w.write_field_stop()

    from icegopher_spark.iceberg.hms import FIELD_SCHEMA

    r = T.BinaryReader(io.BytesIO(w.getvalue()))
    out = T.read_struct(r, FIELD_SCHEMA)
    assert out == {"name": "col_a", "type": "bigint"}


def test_cli_over_hive_catalog(cat, server, spark, lineitem, capsys):
    """The CLI's --catalog thrift://… infers the hive catalog and the
    verbs round-trip against the mock HMS; --property passes arbitrary
    catalog properties through."""
    from icegopher_spark.iceberg.cli import main as cli_main

    t = cat.create_table("db.cli_t", SCHEMA)
    W.append(t, lineitem.limit(10))
    base = [
        "--catalog",
        f"thrift://127.0.0.1:{server.port}",
        "--warehouse",
        cat.warehouse,
    ]
    assert cli_main([*base, "list", "db"]) == 0
    out = capsys.readouterr().out
    assert "cli_t" in out
    assert cli_main([*base, "location", "db.cli_t"]) == 0
    out = capsys.readouterr().out
    assert "cli_t" in out
    # --property K=V reaches load_catalog (bad value fails loudly)
    assert cli_main(["--property", "notkv", "list", "db"]) == 1


def test_two_interleaved_committers_retry_to_union(cat, server, spark, lineitem):
    """r12 verdict task #7: drive the refresh-and-retry loop end to end
    — the loser (stale handle) conflicts, refreshes to the winner's
    head, re-applies; both commits land on one linear snapshot chain,
    and the losing attempt never alters the HMS row."""
    t1 = cat.create_table("db.interleave", SCHEMA)
    t2 = cat.load_table("db.interleave")
    W.commit_with_retry(t1, lambda t: W.append(t, lineitem.limit(10)))
    n_alters = server.state.calls.count("alter_table_with_environment_context")
    W.commit_with_retry(t2, lambda t: W.append(t, lineitem.offset(10).limit(20)))
    assert (
        server.state.calls.count("alter_table_with_environment_context")
        == n_alters + 1
    ), "only the retried (winning) attempt may alter the HMS row"
    fresh = cat.load_table("db.interleave")
    assert fresh.scan().to_df(spark).count() == 30
    snaps = fresh.metadata.snapshots
    assert len(snaps) == 2
    by_id = {s.snapshot_id: s for s in snaps}
    head = fresh.current_snapshot()
    assert head.parent_snapshot_id in by_id
    assert by_id[head.parent_snapshot_id].parent_snapshot_id is None
