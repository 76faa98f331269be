"""In-process mock AWS Glue Data Catalog speaking the real Glue JSON
protocol (X-Amz-Target dispatch, __type error marshalling) over HTTP —
boto3 talks to it through endpoint_url exactly as it would to AWS, so
the catalog tests exercise the full SDK serialize → HTTP → dispatch →
deserialize path, including VersionId optimistic locking on
UpdateTable (ConcurrentModificationException on a stale version, the
contract iceberg-aws commits rely on)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class GlueState:
    def __init__(self) -> None:
        self.databases: dict[str, dict] = {}
        # (db, name) -> {"table": <Table dict>, "version": int}
        self.tables: dict[tuple[str, str], dict] = {}
        self.lock = threading.Lock()
        self.calls: list[str] = []


class _GlueError(Exception):
    def __init__(self, etype: str, message: str):
        super().__init__(message)
        self.etype = etype
        self.message = message


class _Ops:
    def __init__(self, state: GlueState):
        self.s = state

    # -- databases -----------------------------------------------------
    def CreateDatabase(self, body):
        name = body["DatabaseInput"]["Name"]
        if name in self.s.databases:
            raise _GlueError("AlreadyExistsException", f"Database {name} exists")
        self.s.databases[name] = body["DatabaseInput"]
        return {}

    def GetDatabase(self, body):
        db = self.s.databases.get(body["Name"])
        if db is None:
            raise _GlueError("EntityNotFoundException", f"Database {body['Name']}")
        return {"Database": db}

    def GetDatabases(self, body):
        return {"DatabaseList": [self.s.databases[n] for n in sorted(self.s.databases)]}

    def DeleteDatabase(self, body):
        name = body["Name"]
        if name not in self.s.databases:
            raise _GlueError("EntityNotFoundException", f"Database {name}")
        del self.s.databases[name]
        return {}

    # -- tables --------------------------------------------------------
    def CreateTable(self, body):
        db = body["DatabaseName"]
        if db not in self.s.databases:
            raise _GlueError("EntityNotFoundException", f"Database {db}")
        name = body["TableInput"]["Name"]
        key = (db, name)
        if key in self.s.tables:
            raise _GlueError("AlreadyExistsException", f"Table {db}.{name} exists")
        self.s.tables[key] = {"table": dict(body["TableInput"]), "version": 1}
        return {}

    def GetTable(self, body):
        key = (body["DatabaseName"], body["Name"])
        row = self.s.tables.get(key)
        if row is None:
            raise _GlueError(
                "EntityNotFoundException", f"Table {key[0]}.{key[1]} not found"
            )
        t = dict(row["table"])
        t.setdefault("DatabaseName", key[0])
        t["VersionId"] = str(row["version"])
        return {"Table": t}

    def GetTables(self, body):
        db = body["DatabaseName"]
        out = [
            {**row["table"], "DatabaseName": d, "VersionId": str(row["version"])}
            for (d, n), row in sorted(self.s.tables.items())
            if d == db
        ]
        return {"TableList": out}

    def UpdateTable(self, body):
        db = body["DatabaseName"]
        name = body["TableInput"]["Name"]
        key = (db, name)
        row = self.s.tables.get(key)
        if row is None:
            raise _GlueError("EntityNotFoundException", f"Table {db}.{name}")
        want = body.get("VersionId")
        if want is not None and want != str(row["version"]):
            # Glue's optimistic locking (iceberg-aws commit contract):
            # checked atomically under the server lock
            raise _GlueError(
                "ConcurrentModificationException",
                f"Table version {want} is stale; current is {row['version']}",
            )
        row["table"] = dict(body["TableInput"])
        row["version"] += 1
        return {}

    def DeleteTable(self, body):
        key = (body["DatabaseName"], body["Name"])
        if key not in self.s.tables:
            raise _GlueError("EntityNotFoundException", f"Table {key}")
        del self.s.tables[key]
        return {}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        target = self.headers.get("X-Amz-Target", "")
        op = target.split(".")[-1]
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        state: GlueState = self.server.state
        ops = _Ops(state)
        with state.lock:
            state.calls.append(op)
            try:
                fn = getattr(ops, op, None)
                if fn is None:
                    raise _GlueError(
                        "InvalidInputException", f"unknown operation {op}"
                    )
                out = fn(body)
                code, payload = 200, out
            except _GlueError as e:
                code, payload = 400, {"__type": e.etype, "Message": e.message}
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


class MockGlueServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self):
        self.state = GlueState()
        super().__init__(("127.0.0.1", 0), _Handler)
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
