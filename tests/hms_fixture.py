"""In-process mock Hive Metastore speaking real thrift binary over a
TCP socket — the HMS twin of rest_fixture.py's stateful REST mock.

The server decodes/encodes with the same strict-binary rules the
client uses (icegopher_spark.iceberg.thrift_proto), so every test
round-trip exercises the full wire path: socket → message envelope →
struct codec → dispatcher → reply, including declared-exception replies
and the HIVE-26882 expected-parameter CAS on alter_table (checked
atomically under the server lock, exactly the contract HMS 4 gives
Iceberg commits).
"""

from __future__ import annotations

import socket
import socketserver
import threading

from icegopher_spark.iceberg import hms as H
from icegopher_spark.iceberg import thrift_proto as T


class MockHMSState:
    def __init__(self) -> None:
        self.databases: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}
        self.lock = threading.Lock()
        self.calls: list[str] = []  # observability for assertions


class _Dispatcher:
    """One method per HMS verb; returns the success value, or raises
    _Declared to signal a declared (IDL) exception reply."""

    class _Declared(Exception):
        def __init__(self, exc_name: str, message: str):
            super().__init__(message)
            self.exc_name = exc_name
            self.message = message

    def __init__(self, state: MockHMSState):
        self.s = state

    def get_database(self, name):
        db = self.s.databases.get(name)
        if db is None:
            raise self._Declared("NoSuchObjectException", f"database {name}")
        return db

    def get_all_databases(self):
        return sorted(self.s.databases)

    def create_database(self, database):
        name = database.get("name")
        if name in self.s.databases:
            raise self._Declared("AlreadyExistsException", f"database {name}")
        self.s.databases[name] = database

    def drop_database(self, name, deleteData=False, cascade=False):
        if name not in self.s.databases:
            raise self._Declared("NoSuchObjectException", f"database {name}")
        tbls = [k for k in self.s.tables if k[0] == name]
        if tbls and not cascade:
            raise self._Declared(
                "InvalidOperationException", f"database {name} is not empty"
            )
        for k in tbls:
            del self.s.tables[k]
        del self.s.databases[name]

    def get_table(self, dbname, tbl_name):
        t = self.s.tables.get((dbname, tbl_name))
        if t is None:
            raise self._Declared(
                "NoSuchObjectException", f"{dbname}.{tbl_name} table not found"
            )
        return t

    def get_all_tables(self, db_name):
        return sorted(t for d, t in self.s.tables if d == db_name)

    def create_table(self, tbl):
        key = (tbl.get("dbName"), tbl.get("tableName"))
        if key[0] not in self.s.databases:
            raise self._Declared("NoSuchObjectException", f"database {key[0]}")
        if key in self.s.tables:
            raise self._Declared("AlreadyExistsException", f"{key[0]}.{key[1]}")
        self.s.tables[key] = tbl

    def drop_table(self, dbname, name, deleteData=False):
        key = (dbname, name)
        if key not in self.s.tables:
            raise self._Declared("NoSuchObjectException", f"{dbname}.{name}")
        del self.s.tables[key]

    def alter_table_with_environment_context(
        self, dbname, tbl_name, new_tbl, environment_context=None
    ):
        key = (dbname, tbl_name)
        cur = self.s.tables.get(key)
        if cur is None:
            raise self._Declared(
                "InvalidOperationException", f"{dbname}.{tbl_name} not found"
            )
        props = (environment_context or {}).get("properties") or {}
        exp_key = props.get("expected_parameter_key")
        if exp_key is not None:
            # HIVE-26882 server-side CAS: the named parameter must still
            # hold the expected value, checked atomically (the caller
            # holds self.s.lock for the whole request)
            have = (cur.get("parameters") or {}).get(exp_key)
            want = props.get("expected_parameter_value")
            if have != want:
                raise self._Declared(
                    "MetaException",
                    f"The table has been modified. The parameter value for "
                    f"key '{exp_key}' is '{have}'. The expected was value "
                    f"was '{want}'",
                )
        new_key = (new_tbl.get("dbName", dbname), new_tbl.get("tableName", tbl_name))
        if new_key != key and new_key in self.s.tables:
            raise self._Declared("InvalidOperationException", f"{new_key} exists")
        del self.s.tables[key]
        self.s.tables[new_key] = new_tbl


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        rfile = self.request.makefile("rb")
        dispatcher = _Dispatcher(self.server.state)
        while True:
            r = T.BinaryReader(rfile)
            try:
                method, mtype, seqid = r.read_message_begin()
            except T.ThriftProtocolError:
                return  # client hung up
            spec = H.SERVICE.get(method)
            w = T.BinaryWriter()
            if spec is None:
                r.skip(T.STRUCT)
                w.write_message_begin(method, T.EXCEPTION, seqid)
                T.write_struct(
                    w,
                    T.APPLICATION_EXCEPTION_SPEC,
                    {"message": f"unknown method {method}", "type": 1},
                )
            else:
                args_spec, result_spec = spec
                args = T.read_struct(r, args_spec)
                with self.server.state.lock:
                    self.server.state.calls.append(method)
                    try:
                        success = getattr(dispatcher, method)(**args)
                        reply: dict = {}
                        if success is not None:
                            reply["success"] = success
                    except _Dispatcher._Declared as e:
                        reply = {e.exc_name: {"message": e.message}}
                w.write_message_begin(method, T.REPLY, seqid)
                T.write_struct(w, result_spec, reply)
            try:
                self.request.sendall(w.getvalue())
            except OSError:
                return


class MockHMSServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.state = MockHMSState()
        super().__init__(("127.0.0.1", 0), _Handler)
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self.server_address[1]

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
