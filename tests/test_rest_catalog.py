"""REST catalog against a threaded mock server asserting paths, auth
headers, and the \\x1f namespace separator (reference rest_test.go:53-
486 patterns: OAuth, config merge, namespace CRUD, table load, error
codes)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import unquote

import pytest

from icegopher_spark.iceberg.catalog import (
    CatalogError,
    NamespaceAlreadyExistsError,
    NoSuchTableError,
    RestCatalog,
    load_catalog,
)

TEST_TOKEN = "token123"
METADATA = {
    "format-version": 2,
    "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
    "location": "file:///tmp/nowhere",
    "last-updated-ms": 1,
    "last-column-id": 1,
    "current-schema-id": 0,
    "schemas": [
        {
            "type": "struct",
            "schema-id": 0,
            "fields": [{"id": 1, "name": "x", "required": True, "type": "long"}],
        }
    ],
    "default-spec-id": 0,
    "partition-specs": [{"spec-id": 0, "fields": []}],
    "last-partition-id": 999,
    "current-snapshot-id": -1,
    "snapshots": [],
    "sort-orders": [{"order-id": 0, "fields": []}],
    "default-sort-order-id": 0,
}


class Handler(BaseHTTPRequestHandler):
    requests: list[tuple[str, str, dict]] = []

    def log_message(self, *a):  # silence
        pass

    def _json(self, code: int, body: dict):
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        Handler.requests.append(("GET", self.path, dict(self.headers)))
        if self.path.startswith("/v1/config"):
            return self._json(
                200, {"defaults": {"warehouse": "default_wh"}, "overrides": {"prefix": "pre"}}
            )
        auth = self.headers.get("Authorization", "")
        if auth != f"Bearer {TEST_TOKEN}":
            return self._json(401, {"error": "unauthorized"})
        if self.path == "/v1/pre/namespaces":
            return self._json(200, {"namespaces": [["db"], ["other"]]})
        if self.path == "/v1/pre/namespaces/db/tables":
            return self._json(
                200, {"identifiers": [{"namespace": ["db"], "name": "tbl"}]}
            )
        if self.path == "/v1/pre/namespaces/db/tables/tbl":
            return self._json(
                200, {"metadata-location": "s3://b/meta.json", "metadata": METADATA}
            )
        if self.path == "/v1/pre/namespaces/db":
            return self._json(200, {"namespace": ["db"], "properties": {"owner": "alice"}})
        if unquote(self.path) == "/v1/pre/namespaces/a\x1fb":
            return self._json(200, {"namespace": ["a", "b"], "properties": {}})
        return self._json(404, {"error": "not found"})

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        Handler.requests.append(("POST", self.path, dict(self.headers)))
        if self.path == "/v1/oauth/tokens":
            assert "client_credentials" in body
            assert "client_id=user" in body and "client_secret=pass" in body
            return self._json(200, {"access_token": TEST_TOKEN, "token_type": "bearer"})
        if self.path == "/v1/pre/namespaces":
            payload = json.loads(body)
            if payload["namespace"] == ["db"]:
                return self._json(409, {"error": "exists"})
            return self._json(200, {"namespace": payload["namespace"], "properties": {}})
        if self.path == "/v1/pre/namespaces/db/properties":
            payload = json.loads(body)
            return self._json(
                200,
                {
                    "removed": [k for k in payload.get("removals", []) if k == "owner"],
                    "updated": list(payload.get("updates", {})),
                    "missing": [k for k in payload.get("removals", []) if k != "owner"],
                },
            )
        if self.path == "/v1/pre/tables/rename":
            return self._json(200, {})
        return self._json(404, {"error": "not found"})

    def do_DELETE(self):
        Handler.requests.append(("DELETE", self.path, dict(self.headers)))
        if self.path == "/v1/pre/namespaces/db/tables/tbl":
            return self._json(204, {})
        return self._json(404, {"error": "no"})


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


@pytest.fixture()
def cat(server):
    Handler.requests.clear()
    return RestCatalog("test", server, {"credential": "user:pass"})


def test_oauth_and_config_merge(cat, server):
    # token fetched with client credentials, config defaults+overrides merged
    assert cat.session.headers["Authorization"] == f"Bearer {TEST_TOKEN}"
    assert cat.properties["warehouse"] == "default_wh"
    assert cat.prefix == "pre"  # override wins


def test_factory_infers_rest(server):
    c = load_catalog("x", server, {"credential": "user:pass"})
    assert isinstance(c, RestCatalog)


def test_list_namespaces_and_tables(cat):
    assert cat.list_namespaces() == [("db",), ("other",)]
    assert cat.list_tables("db") == [("db", "tbl")]


def test_load_table(cat):
    t = cat.load_table("db.tbl")
    assert t.metadata.table_uuid == METADATA["table-uuid"]
    assert t.metadata_location == "s3://b/meta.json"
    assert t.schema.fields[0].name == "x"
    assert t.catalog is cat


def test_load_table_404(cat):
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.nope")


def test_create_namespace_conflict(cat):
    with pytest.raises(NamespaceAlreadyExistsError):
        cat.create_namespace("db")
    cat.create_namespace("fresh")  # 200


def test_namespace_properties_roundtrip(cat):
    props = cat.load_namespace_properties("db")
    assert props == {"owner": "alice"}
    out = cat.update_namespace_properties("db", removals=["owner", "ghost"], updates={"x": "1"})
    assert out == {"removed": ["owner"], "updated": ["x"], "missing": ["ghost"]}


def test_namespace_separator_is_x1f(cat):
    cat.load_namespace_properties(("a", "b"))
    paths = [unquote(p) for (_, p, _) in Handler.requests]
    assert any("a\x1fb" in p for p in paths)


def test_drop_and_rename(cat):
    cat.drop_table("db.tbl")
    cat.rename_table("db.tbl", "db.tbl2")
    methods = [(m, p) for (m, p, _) in Handler.requests]
    assert ("DELETE", "/v1/pre/namespaces/db/tables/tbl") in methods
    assert ("POST", "/v1/pre/tables/rename") in methods


def test_auth_header_on_every_call(cat):
    cat.list_namespaces()
    data_calls = [
        h for (m, p, h) in Handler.requests if "/namespaces" in p and "config" not in p
    ]
    assert all(h.get("Authorization") == f"Bearer {TEST_TOKEN}" for h in data_calls)


def test_error_maps_to_catalog_error(cat, server):
    bad = RestCatalog("bad", server, {"token": "wrong"})
    with pytest.raises(CatalogError):
        bad.list_namespaces()


# -- REST commit (UpdateTableRequest) ---------------------------------------
#
# A stateful handler slice: applies add-snapshot / set-snapshot-ref
# updates to an in-memory table, enforces assert-ref-snapshot-id
# atomically, and answers 409 on mismatch — the contract
# write.py::_commit_snapshot relies on when a table came from a
# RestCatalog (reference enumerates ErrCommitFailed, rest.go:51-52).

COMMIT_STATE = {"metadata": None}


def _commit_handler(handler, body):
    payload = json.loads(body)
    md = COMMIT_STATE["metadata"]
    current = md.get("current-snapshot-id", -1)
    for req in payload["requirements"]:
        if req["type"] == "assert-table-uuid" and req["uuid"] != md["table-uuid"]:
            return handler._json(409, {"error": "uuid mismatch"})
        if req["type"] == "assert-ref-snapshot-id":
            expect = req.get("snapshot-id")
            have = None if current in (None, -1) else current
            if expect != have:
                return handler._json(409, {"error": "ref moved"})
    for upd in payload["updates"]:
        if upd["action"] == "add-snapshot":
            md.setdefault("snapshots", []).append(upd["snapshot"])
            md["last-sequence-number"] = max(
                md.get("last-sequence-number", 0), upd["snapshot"]["sequence-number"]
            )
        elif upd["action"] == "set-snapshot-ref":
            md["current-snapshot-id"] = upd["snapshot-id"]
            md.setdefault("refs", {})[upd["ref-name"]] = {
                "snapshot-id": upd["snapshot-id"],
                "type": upd["type"],
            }
    return handler._json(
        200, {"metadata-location": "s3://b/meta-2.json", "metadata": md}
    )


_orig_post = Handler.do_POST


def _patched_post(self):
    length = int(self.headers.get("Content-Length", 0))
    body = self.rfile.read(length).decode()
    Handler.requests.append(("POST", self.path, dict(self.headers)))
    if self.path == "/v1/pre/namespaces/db/tables/committable" and COMMIT_STATE["metadata"]:
        return _commit_handler(self, body)
    # re-dispatch to the original handlers (they re-read the body, so
    # fake the stream)
    import io as _io

    self.rfile = _io.BytesIO(body.encode())
    self.headers.replace_header("Content-Length", str(len(body.encode())))
    return _orig_post(self)


Handler.do_POST = _patched_post


@pytest.fixture()
def committable(cat, tmp_path):
    import copy

    from icegopher_spark.iceberg.metadata import parse_metadata
    from icegopher_spark.iceberg.table import Table

    md = copy.deepcopy(METADATA)
    md["location"] = str(tmp_path / "tbl")
    COMMIT_STATE["metadata"] = copy.deepcopy(md)
    t = Table(("db", "committable"), parse_metadata(md), "s3://b/meta.json", catalog=cat)
    yield t
    COMMIT_STATE["metadata"] = None


def test_rest_commit_append(spark, committable):
    from icegopher_spark.iceberg import write as W

    df = spark.range(5).selectExpr("id AS x")
    t = W.append(committable, df)
    # server-applied metadata came back: snapshot added, main ref set
    assert t.metadata.current_snapshot_id is not None
    assert len(t.metadata.snapshots) == 1
    assert t.metadata_location == "s3://b/meta-2.json"
    ops = [(m, p) for (m, p, _) in Handler.requests]
    assert ("POST", "/v1/pre/namespaces/db/tables/committable") in ops


def test_rest_commit_conflict(spark, committable):
    from icegopher_spark.iceberg import write as W
    from icegopher_spark.iceberg.write import CommitFailedError

    df = spark.range(3).selectExpr("id AS x")
    # another writer moved the ref after we loaded
    COMMIT_STATE["metadata"]["current-snapshot-id"] = 999
    COMMIT_STATE["metadata"]["snapshots"] = [
        {
            "snapshot-id": 999,
            "sequence-number": 1,
            "timestamp-ms": 2,
            "manifest-list": "file:///nope.avro",
            "summary": {"operation": "append"},
        }
    ]
    with pytest.raises(CommitFailedError):
        W.append(committable, df)
