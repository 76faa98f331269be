"""REST catalog INTEGRATION tests: the full write path (data files +
manifests + snapshot commit) driven through a stateful REST catalog
service — load/commit/conflict semantics, not request shapes (those
live in test_rest_catalog.py).

By default the tests run against the in-process stateful fixture
(tests/rest_fixture.py), so they are green locally with no external
dependencies. Set ICEBERG_REST_URI (and optionally
ICEBERG_REST_TOKEN / ICEBERG_REST_CREDENTIAL) to run the identical
flow against a real third-party Iceberg REST service instead; the
fixture is skipped in that case.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.catalog import RestCatalog
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField
from icegopher_spark.iceberg.write import CommitFailedError

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "v", DoubleType(), False),
    ),
    schema_id=0,
)


@pytest.fixture()
def catalog():
    uri = os.environ.get("ICEBERG_REST_URI")
    if uri:
        props: dict[str, str] = {}
        if os.environ.get("ICEBERG_REST_TOKEN"):
            props["token"] = os.environ["ICEBERG_REST_TOKEN"]
        elif os.environ.get("ICEBERG_REST_CREDENTIAL"):
            props["credential"] = os.environ["ICEBERG_REST_CREDENTIAL"]
        yield RestCatalog("external", uri, props)
        return
    from rest_fixture import StatefulRestServer

    with StatefulRestServer() as srv:
        # OAuth2 client-credentials flow against the service, like the
        # reference client (rest.go:201-242) — not a pre-baked token
        yield RestCatalog("fixture", srv.uri, {"credential": "cid:secret"})


@pytest.fixture()
def namespace(catalog):
    ns = f"it_{uuid.uuid4().hex[:8]}"
    catalog.create_namespace(ns)
    yield ns
    try:
        for ident in catalog.list_tables(ns):
            catalog.drop_table(ident)
        catalog.drop_namespace(ns)
    except Exception:  # noqa: BLE001 — best-effort cleanup on external services
        pass


def test_namespace_and_table_lifecycle(catalog, namespace, tmp_path):
    assert (namespace,) in catalog.list_namespaces()
    t = catalog.create_table(
        (namespace, "t1"), SCHEMA, location=f"file://{tmp_path}/t1"
    )
    assert (namespace, "t1") in catalog.list_tables(namespace)
    loaded = catalog.load_table((namespace, "t1"))
    assert [f.name for f in loaded.schema.fields] == ["k", "v"]
    assert loaded.metadata.table_uuid == t.metadata.table_uuid
    catalog.drop_table((namespace, "t1"))
    assert (namespace, "t1") not in catalog.list_tables(namespace)


def test_append_commits_through_rest(spark, catalog, namespace, tmp_path):
    """W.append on a catalog-attached table: data files and manifests
    land at the table location, the snapshot commit goes through the
    REST UpdateTable protocol, and a reload from the catalog sees it."""
    catalog.create_table((namespace, "t2"), SCHEMA, location=f"file://{tmp_path}/t2")
    t = catalog.load_table((namespace, "t2"))
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
    )
    t = W.append(t, df)
    assert t.current_snapshot() is not None
    fresh = catalog.load_table((namespace, "t2"))
    assert fresh.current_snapshot().snapshot_id == t.current_snapshot().snapshot_id
    back = fresh.scan().to_df(spark)
    assert back.count() == 100
    assert back.agg(F.sum("k")).collect()[0][0] == 4950


def test_concurrent_commit_conflict_and_retry(spark, catalog, namespace, tmp_path):
    """Optimistic concurrency end to end: two handles at the same
    parent; the second commit must be rejected with CommitFailedError
    (server-side assert-ref-snapshot-id), and succeeds after refresh."""
    catalog.create_table((namespace, "t3"), SCHEMA, location=f"file://{tmp_path}/t3")
    t_a = catalog.load_table((namespace, "t3"))
    t_b = catalog.load_table((namespace, "t3"))
    df1 = spark.range(10).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    df2 = spark.range(20).select(F.col("id").alias("k"), F.lit(2.0).alias("v"))

    t_a = W.append(t_a, df1)  # advances main

    with pytest.raises(CommitFailedError):
        W.append(t_b, df2)  # stale parent -> server 409

    t_b = catalog.load_table((namespace, "t3"))  # refresh, then retry
    t_b = W.append(t_b, df2)
    assert len(t_b.metadata.snapshots) == 2
    assert t_b.current_snapshot().parent_snapshot_id == t_a.current_snapshot().snapshot_id
    assert catalog.load_table((namespace, "t3")).scan().to_df(spark).count() == 30


def test_external_uri_env_wiring(monkeypatch, tmp_path):
    """The ICEBERG_REST_URI escape hatch: catalog construction from the
    env vars (URI + bearer token) must drive the same lifecycle flow —
    exercised here against a fixture server reached ONLY through the
    env path, so the wiring can't rot until a real service shows up."""
    from rest_fixture import StatefulRestServer

    with StatefulRestServer() as srv:
        monkeypatch.setenv("ICEBERG_REST_URI", srv.uri)
        monkeypatch.delenv("ICEBERG_REST_TOKEN", raising=False)
        monkeypatch.setenv("ICEBERG_REST_CREDENTIAL", "cid:secret")
        # mirror the fixture's env branch exactly
        uri = os.environ["ICEBERG_REST_URI"]
        props: dict[str, str] = {}
        if os.environ.get("ICEBERG_REST_TOKEN"):
            props["token"] = os.environ["ICEBERG_REST_TOKEN"]
        elif os.environ.get("ICEBERG_REST_CREDENTIAL"):
            props["credential"] = os.environ["ICEBERG_REST_CREDENTIAL"]
        cat = RestCatalog("external", uri, props)
        ns = f"env_{uuid.uuid4().hex[:6]}"
        cat.create_namespace(ns)
        t = cat.create_table((ns, "t"), SCHEMA, location=f"file://{tmp_path}/t")
        assert cat.load_table((ns, "t")).metadata.table_uuid == t.metadata.table_uuid
        cat.drop_table((ns, "t"))
        cat.drop_namespace(ns)


def test_partition_stats_commit_through_rest(spark, catalog, namespace, tmp_path):
    """compute_partition_stats on a catalog-attached table routes the
    set-partition-statistics action through the REST commit; expire
    replays the remove action; a reload sees both states."""
    from icegopher_spark.iceberg.maintenance import expire_snapshots
    from icegopher_spark.iceberg.partition_stats import (
        compute_partition_stats,
        read_partition_stats,
    )

    catalog.create_table((namespace, "t4"), SCHEMA, location=f"file://{tmp_path}/t4")
    t = catalog.load_table((namespace, "t4"))
    df = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 0.5).alias("v"))
    t = W.append(t, df)
    t = compute_partition_stats(t)
    fresh = catalog.load_table((namespace, "t4"))
    assert len(fresh.metadata.partition_statistics) == 1
    assert (
        read_partition_stats(fresh, spark).agg(F.sum("data_record_count")).collect()[0][0]
        == 40
    )
    old_snap = t.current_snapshot().snapshot_id
    t = W.append(t, df)
    t = expire_snapshots(t, retain_last=1)
    fresh = catalog.load_table((namespace, "t4"))
    assert all(
        e.get("snapshot-id") != old_snap
        for e in fresh.metadata.partition_statistics
    )


def test_list_pagination_2500_tables_across_3_pages():
    """The public REST spec paginates ListTables/ListNamespaces via
    next-page-token (the reference's single-shot GET, rest.go:463-520,
    silently truncates); the client must follow every page."""
    from rest_fixture import StatefulRestServer

    from icegopher_spark.iceberg.catalog import RestCatalog

    with StatefulRestServer() as srv:
        srv.state.page_size = 1000
        srv.state.namespaces[("db",)] = {}
        # inject listings directly (pagination of the LIST is what's
        # under test, not table creation)
        for i in range(2500):
            srv.state.tables[("db", f"t{i:04d}")] = {"metadata": {}, "location": ""}
        for ns in [("a",), ("b",), ("c",)] * 400:  # 3 extra namespaces
            srv.state.namespaces[ns] = {}

        cat = RestCatalog("fixture", srv.uri, {"credential": "cid:secret"})
        got = cat.list_tables(("db",))
        assert len(got) == 2500
        assert got[0] == ("db", "t0000") and got[-1] == ("db", "t2499")
        assert srv.state.list_requests == 3  # 1000 + 1000 + 500

        # namespaces paginate through the same loop (4 < page size: one page)
        assert len(cat.list_namespaces()) == 4

        # page-size hint is forwarded; server still slices by its own size
        cat2 = RestCatalog(
            "fixture", srv.uri, {"credential": "cid:secret", "rest.page-size": "500"}
        )
        assert len(cat2.list_tables(("db",))) == 2500
