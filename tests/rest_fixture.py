"""Stateful in-process Iceberg REST catalog service for integration
tests.

Unlike the request-shape mock in test_rest_catalog.py (canned
responses asserting paths/headers), this fixture IMPLEMENTS the
catalog: it stores real metadata documents per table, constructs
CreateTable responses from the posted schema, and applies
UpdateTable commits atomically under a lock with spec requirement
checking (assert-table-uuid, assert-ref-snapshot-id) — so tests
exercise load/commit/conflict SEMANTICS end to end over real HTTP.
Behavior is modeled on the REST catalog spec the reference client
targets (rest.go:201-557) and on how Polaris/Lakekeeper-style services
answer the same endpoints; point tests at a real third-party service
via ICEBERG_REST_URI to run the identical flow against it.
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

TOKEN = "fixture-token"
SEP = "\x1f"


class _State:
    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.namespaces: dict[tuple[str, ...], dict] = {}
        self.tables: dict[tuple[str, ...], dict] = {}  # ident -> {"metadata","location"}
        self.commits = 0
        # pagination mode: when set, list endpoints return at most this
        # many items per response plus a next-page-token (opaque offset)
        self.page_size = 0
        self.list_requests = 0


def _new_metadata(name: str, body: dict) -> dict:
    schema = dict(body["schema"])
    schema.setdefault("schema-id", 0)
    last_col = max((f.get("id", 0) for f in schema.get("fields", [])), default=0)
    spec = body.get("partition-spec") or {"spec-id": 0, "fields": []}
    last_pid = max((f.get("field-id", 999) for f in spec.get("fields", [])), default=999)
    return {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": body.get("location") or f"file:///tmp/rest_fixture/{name}",
        "last-updated-ms": 0,
        "last-column-id": last_col,
        "current-schema-id": schema["schema-id"],
        "schemas": [schema],
        "default-spec-id": spec["spec-id"],
        "partition-specs": [spec],
        "last-partition-id": last_pid,
        "last-sequence-number": 0,
        "current-snapshot-id": -1,
        "snapshots": [],
        "refs": {},
        "snapshot-log": [],
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": dict(body.get("properties") or {}),
    }


def _apply_commit(entry: dict, payload: dict) -> tuple[int, dict]:
    """Check requirements then apply updates; caller holds the lock.
    Returns (status, body)."""
    md = entry["metadata"]
    for r in payload.get("requirements", []):
        t = r.get("type")
        if t == "assert-table-uuid":
            if r.get("uuid") != md["table-uuid"]:
                return 409, {"error": "table uuid mismatch"}
        elif t == "assert-ref-snapshot-id":
            have = (md.get("refs") or {}).get(r.get("ref"), {}).get("snapshot-id")
            if r.get("snapshot-id") != have:
                return 409, {
                    "error": f"requirement failed: ref {r.get('ref')} at "
                    f"{have}, expected {r.get('snapshot-id')}"
                }
        elif t == "assert-create":
            return 409, {"error": "table already exists"}
        # unknown requirements: spec says fail safe
        elif t not in ("assert-table-uuid", "assert-ref-snapshot-id"):
            return 400, {"error": f"unsupported requirement {t}"}
    for u in payload.get("updates", []):
        a = u.get("action")
        if a == "add-snapshot":
            snap = u["snapshot"]
            if any(
                sn.get("snapshot-id") == snap["snapshot-id"] for sn in md["snapshots"]
            ) or snap.get("sequence-number", 0) <= md.get("last-sequence-number", 0):
                return 409, {"error": "snapshot id/sequence collision"}
            md["snapshots"].append(snap)
            md["last-sequence-number"] = max(
                md.get("last-sequence-number", 0), snap.get("sequence-number", 0)
            )
        elif a == "set-snapshot-ref":
            ref = {"snapshot-id": u["snapshot-id"], "type": u.get("type", "branch")}
            md.setdefault("refs", {})[u["ref-name"]] = ref
            if u["ref-name"] == "main":
                md["current-snapshot-id"] = u["snapshot-id"]
                md.setdefault("snapshot-log", []).append(
                    {"snapshot-id": u["snapshot-id"], "timestamp-ms": md["last-updated-ms"] + 1}
                )
        elif a == "remove-snapshot-ref":
            md.get("refs", {}).pop(u.get("ref-name"), None)
        elif a == "remove-snapshots":
            gone = set(u.get("snapshot-ids", []))
            md["snapshots"] = [
                s for s in md.get("snapshots", []) if s.get("snapshot-id") not in gone
            ]
            md["snapshot-log"] = [
                e for e in md.get("snapshot-log", []) if e.get("snapshot-id") not in gone
            ]
        elif a == "add-schema":
            md["schemas"] = md.get("schemas", []) + [u["schema"]]
            if "last-column-id" in u:
                md["last-column-id"] = max(md.get("last-column-id", 0), u["last-column-id"])
        elif a == "set-current-schema":
            md["current-schema-id"] = u["schema-id"]
        elif a == "add-spec":
            md["partition-specs"] = md.get("partition-specs", []) + [u["spec"]]
            if "last-partition-id" in u:
                md["last-partition-id"] = max(
                    md.get("last-partition-id", 0), u["last-partition-id"]
                )
        elif a == "set-default-spec":
            md["default-spec-id"] = u["spec-id"]
        elif a == "set-properties":
            md.setdefault("properties", {}).update(u.get("updates", {}))
        elif a == "remove-properties":
            for k in u.get("removals", []):
                md.get("properties", {}).pop(k, None)
        elif a == "set-location":
            md["location"] = u["location"]
        elif a in ("set-statistics", "set-partition-statistics"):
            key = "statistics" if a == "set-statistics" else "partition-statistics"
            entry_u = u.get(key) or u.get("statistics-file")
            if not entry_u or entry_u.get("snapshot-id") is None:
                return 400, {"error": f"{a} requires an entry with snapshot-id"}
            md[key] = [
                e
                for e in md.get(key, [])
                if e.get("snapshot-id") != entry_u.get("snapshot-id")
            ] + [entry_u]
        elif a in ("remove-statistics", "remove-partition-statistics"):
            key = "statistics" if a == "remove-statistics" else "partition-statistics"
            md[key] = [
                e
                for e in md.get(key, [])
                if e.get("snapshot-id") != u.get("snapshot-id")
            ]
        else:
            return 400, {"error": f"unsupported update {a}"}
    md["last-updated-ms"] = md.get("last-updated-ms", 0) + 1
    entry["location"] = f"{md['location']}/metadata/{uuid.uuid4().hex}.metadata.json"
    return 200, {"metadata-location": entry["location"], "metadata": md}


class StatefulRestServer:
    """Threaded HTTP server owning a _State; use as a context manager."""

    def __init__(self) -> None:
        self.state = _State()
        state = self.state

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 — silence
                pass

            def _json(self, code: int, body: dict) -> None:
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    return json.loads(raw)
                except ValueError:
                    return {}

            def _authed(self) -> bool:
                return self.headers.get("Authorization") == f"Bearer {TOKEN}"

            def _parts(self) -> list[str]:
                return [unquote(p) for p in self.path.split("?")[0].split("/") if p]

            def _query(self) -> dict:
                from urllib.parse import parse_qs

                q = self.path.split("?", 1)
                return (
                    {k: v[0] for k, v in parse_qs(q[1]).items()}
                    if len(q) > 1
                    else {}
                )

            def _page(self, items: list) -> tuple[list, str | None]:
                """Slice a sorted listing by the opaque offset token;
                non-paginating mode returns everything, no token."""
                if not state.page_size:
                    return items, None
                start = int(self._query().get("pageToken", "0") or 0)
                end = start + state.page_size
                return items[start:end], (str(end) if end < len(items) else None)

            def do_POST(self):  # noqa: N802
                p = self._parts()
                if p[:3] == ["v1", "oauth", "tokens"]:
                    return self._json(200, {"access_token": TOKEN, "token_type": "bearer"})
                if not self._authed():
                    return self._json(401, {"error": "unauthorized"})
                if p[-1] == "namespaces":
                    body = self._body()
                    ns = tuple(body.get("namespace", []))
                    with state.lock:
                        if ns in state.namespaces:
                            return self._json(409, {"error": "namespace exists"})
                        state.namespaces[ns] = dict(body.get("properties") or {})
                    return self._json(200, {"namespace": list(ns)})
                if len(p) >= 2 and p[-1] == "tables" and p[-3] == "namespaces":
                    ns = tuple(p[-2].split(SEP))
                    body = self._body()
                    ident = (*ns, body["name"])
                    with state.lock:
                        if ns not in state.namespaces:
                            return self._json(404, {"error": "no such namespace"})
                        if ident in state.tables:
                            return self._json(409, {"error": "table exists"})
                        md = _new_metadata("/".join(ident), body)
                        entry = {
                            "metadata": md,
                            "location": f"{md['location']}/metadata/00000.metadata.json",
                        }
                        state.tables[ident] = entry
                        return self._json(
                            200,
                            {"metadata-location": entry["location"], "metadata": md},
                        )
                if len(p) >= 3 and p[-2] == "tables":  # commit
                    ns = tuple(p[-3].split(SEP))
                    ident = (*ns, p[-1])
                    payload = self._body()
                    with state.lock:
                        entry = state.tables.get(ident)
                        if entry is None:
                            return self._json(404, {"error": "no such table"})
                        code, body = _apply_commit(entry, payload)
                        if code == 200:
                            state.commits += 1
                        return self._json(code, body)
                return self._json(404, {"error": f"unhandled POST {self.path}"})

            def do_GET(self):  # noqa: N802
                p = self._parts()
                if p[:2] == ["v1", "config"]:
                    return self._json(200, {"defaults": {}, "overrides": {}})
                if not self._authed():
                    return self._json(401, {"error": "unauthorized"})
                if p[-1] == "namespaces":
                    with state.lock:
                        page, nxt = self._page(sorted(state.namespaces))
                        body = {"namespaces": [list(ns) for ns in page]}
                        if nxt is not None:
                            body["next-page-token"] = nxt
                        return self._json(200, body)
                if p[-1] == "tables" and p[-3] == "namespaces":
                    ns = tuple(p[-2].split(SEP))
                    with state.lock:
                        state.list_requests += 1
                        idents = sorted(i for i in state.tables if i[:-1] == ns)
                        page, nxt = self._page(idents)
                        body = {
                            "identifiers": [
                                {"namespace": list(i[:-1]), "name": i[-1]}
                                for i in page
                            ]
                        }
                        if nxt is not None:
                            body["next-page-token"] = nxt
                        return self._json(200, body)
                if len(p) >= 3 and p[-2] == "tables":
                    ns = tuple(p[-3].split(SEP))
                    ident = (*ns, p[-1])
                    with state.lock:
                        entry = state.tables.get(ident)
                        if entry is None:
                            return self._json(404, {"error": "no such table"})
                        return self._json(
                            200,
                            {
                                "metadata-location": entry["location"],
                                "metadata": entry["metadata"],
                            },
                        )
                if p[-2] == "namespaces":
                    ns = tuple(p[-1].split(SEP))
                    with state.lock:
                        if ns not in state.namespaces:
                            return self._json(404, {"error": "no such namespace"})
                        return self._json(
                            200, {"namespace": list(ns), "properties": state.namespaces[ns]}
                        )
                return self._json(404, {"error": f"unhandled GET {self.path}"})

            def do_DELETE(self):  # noqa: N802
                p = self._parts()
                if not self._authed():
                    return self._json(401, {"error": "unauthorized"})
                with state.lock:
                    if len(p) >= 3 and p[-2] == "tables":
                        ns = tuple(p[-3].split(SEP))
                        if state.tables.pop((*ns, p[-1]), None) is None:
                            return self._json(404, {"error": "no such table"})
                        return self._json(204, {})
                    if p[-2] == "namespaces":
                        ns = tuple(p[-1].split(SEP))
                        if state.namespaces.pop(ns, None) is None:
                            return self._json(404, {"error": "no such namespace"})
                        return self._json(204, {})
                return self._json(404, {"error": f"unhandled DELETE {self.path}"})

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.uri = f"http://127.0.0.1:{self._server.server_port}"

    def __enter__(self) -> "StatefulRestServer":
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
