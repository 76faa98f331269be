"""Hive Metastore thrift client (pure Python, stdlib sockets).

Speaks the ThriftHiveMetastore service subset an Iceberg catalog needs
— get_table / create_table / drop_table /
alter_table_with_environment_context / get_all_tables / database CRUD —
using the strict binary protocol from ``thrift_proto``. Struct layouts
follow the public hive_metastore.thrift IDL (field ids are the wire
contract; unknown fields from newer servers are skipped on decode).

Iceberg-on-HMS storage convention (public: apache/iceberg
HiveTableOperations): the table's ``parameters`` map carries
``metadata_location`` / ``previous_metadata_location`` and
``table_type=ICEBERG``; a commit is an alter_table that swaps
``metadata_location``. The CAS precondition rides in the
EnvironmentContext as ``expected_parameter_key`` /
``expected_parameter_value`` — the server-side expected-parameter
check (HIVE-26882) that HMS 4 applies atomically under its table lock.

Reference parity: table/catalog/catalog.go:40-47 declares CatalogHive
and never implements it; this module + hivecatalog.py close that enum
member the same way sqlcatalog.py closed CatalogSQL.
"""

from __future__ import annotations

import socket
import threading

from . import thrift_proto as T

# -- struct specs (field ids from hive_metastore.thrift) ---------------------

FIELD_SCHEMA: T.StructSpec = {
    1: ("name", T.STRING, None),
    2: ("type", T.STRING, None),
    3: ("comment", T.STRING, None),
}

SERDE_INFO: T.StructSpec = {
    1: ("name", T.STRING, None),
    2: ("serializationLib", T.STRING, None),
    3: ("parameters", T.MAP, (T.STRING, T.STRING, None)),
}

ORDER: T.StructSpec = {
    1: ("col", T.STRING, None),
    2: ("order", T.I32, None),
}

STORAGE_DESCRIPTOR: T.StructSpec = {
    1: ("cols", T.LIST, (T.STRUCT, FIELD_SCHEMA)),
    2: ("location", T.STRING, None),
    3: ("inputFormat", T.STRING, None),
    4: ("outputFormat", T.STRING, None),
    5: ("compressed", T.BOOL, None),
    6: ("numBuckets", T.I32, None),
    7: ("serdeInfo", T.STRUCT, SERDE_INFO),
    8: ("bucketCols", T.LIST, (T.STRING, None)),
    9: ("sortCols", T.LIST, (T.STRUCT, ORDER)),
    10: ("parameters", T.MAP, (T.STRING, T.STRING, None)),
}

TABLE: T.StructSpec = {
    1: ("tableName", T.STRING, None),
    2: ("dbName", T.STRING, None),
    3: ("owner", T.STRING, None),
    4: ("createTime", T.I32, None),
    5: ("lastAccessTime", T.I32, None),
    6: ("retention", T.I32, None),
    7: ("sd", T.STRUCT, STORAGE_DESCRIPTOR),
    8: ("partitionKeys", T.LIST, (T.STRUCT, FIELD_SCHEMA)),
    9: ("parameters", T.MAP, (T.STRING, T.STRING, None)),
    10: ("viewOriginalText", T.STRING, None),
    11: ("viewExpandedText", T.STRING, None),
    12: ("tableType", T.STRING, None),
}

DATABASE: T.StructSpec = {
    1: ("name", T.STRING, None),
    2: ("description", T.STRING, None),
    3: ("locationUri", T.STRING, None),
    4: ("parameters", T.MAP, (T.STRING, T.STRING, None)),
}

ENVIRONMENT_CONTEXT: T.StructSpec = {
    1: ("properties", T.MAP, (T.STRING, T.STRING, None)),
}

_EXC: T.StructSpec = {1: ("message", T.STRING, None)}  # all HMS excs: 1=message


class HMSError(Exception):
    pass


class NoSuchObjectException(HMSError):
    pass


class AlreadyExistsException(HMSError):
    pass


class InvalidOperationException(HMSError):
    pass


class MetaException(HMSError):
    pass


class InvalidObjectException(HMSError):
    pass


_EXC_BY_NAME = {
    "NoSuchObjectException": NoSuchObjectException,
    "AlreadyExistsException": AlreadyExistsException,
    "InvalidOperationException": InvalidOperationException,
    "MetaException": MetaException,
    "InvalidObjectException": InvalidObjectException,
}

# method -> (args spec keyed by position-id, result spec)
# result spec: field 0 = success (absent for void), fields 1.. = the
# declared exceptions as (exception name, _EXC) pairs.
SERVICE: dict[str, tuple[T.StructSpec, dict]] = {
    "get_table": (
        {1: ("dbname", T.STRING, None), 2: ("tbl_name", T.STRING, None)},
        {
            0: ("success", T.STRUCT, TABLE),
            1: ("MetaException", T.STRUCT, _EXC),
            2: ("NoSuchObjectException", T.STRUCT, _EXC),
        },
    ),
    "create_table": (
        {1: ("tbl", T.STRUCT, TABLE)},
        {
            1: ("AlreadyExistsException", T.STRUCT, _EXC),
            2: ("InvalidObjectException", T.STRUCT, _EXC),
            3: ("MetaException", T.STRUCT, _EXC),
            4: ("NoSuchObjectException", T.STRUCT, _EXC),
        },
    ),
    "drop_table": (
        {
            1: ("dbname", T.STRING, None),
            2: ("name", T.STRING, None),
            3: ("deleteData", T.BOOL, None),
        },
        {
            1: ("NoSuchObjectException", T.STRUCT, _EXC),
            2: ("MetaException", T.STRUCT, _EXC),
        },
    ),
    "alter_table_with_environment_context": (
        {
            1: ("dbname", T.STRING, None),
            2: ("tbl_name", T.STRING, None),
            3: ("new_tbl", T.STRUCT, TABLE),
            4: ("environment_context", T.STRUCT, ENVIRONMENT_CONTEXT),
        },
        {
            1: ("InvalidOperationException", T.STRUCT, _EXC),
            2: ("MetaException", T.STRUCT, _EXC),
        },
    ),
    "get_all_tables": (
        {1: ("db_name", T.STRING, None)},
        {
            0: ("success", T.LIST, (T.STRING, None)),
            1: ("MetaException", T.STRUCT, _EXC),
        },
    ),
    "create_database": (
        {1: ("database", T.STRUCT, DATABASE)},
        {
            1: ("AlreadyExistsException", T.STRUCT, _EXC),
            2: ("InvalidObjectException", T.STRUCT, _EXC),
            3: ("MetaException", T.STRUCT, _EXC),
        },
    ),
    "get_database": (
        {1: ("name", T.STRING, None)},
        {
            0: ("success", T.STRUCT, DATABASE),
            1: ("NoSuchObjectException", T.STRUCT, _EXC),
            2: ("MetaException", T.STRUCT, _EXC),
        },
    ),
    "get_all_databases": (
        {},
        {
            0: ("success", T.LIST, (T.STRING, None)),
            1: ("MetaException", T.STRUCT, _EXC),
        },
    ),
    "drop_database": (
        {
            1: ("name", T.STRING, None),
            2: ("deleteData", T.BOOL, None),
            3: ("cascade", T.BOOL, None),
        },
        {
            1: ("NoSuchObjectException", T.STRUCT, _EXC),
            2: ("InvalidOperationException", T.STRUCT, _EXC),
            3: ("MetaException", T.STRUCT, _EXC),
        },
    ),
}


class HMSClient:
    """One socket, sequential calls (a catalog is driver-side and
    single-threaded per operation; a lock serializes accidental
    sharing). Connects lazily, reconnects after an IO error."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.host, self.port, self.timeout = host, port, timeout
        self._sock: socket.socket | None = None
        self._rfile = None
        self._seq = 0
        self._lock = threading.Lock()

    def _connect(self) -> None:
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )
        self._rfile = self._sock.makefile("rb")

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock, self._rfile = None, None

    def call(self, method: str, **kwargs):
        args_spec, result_spec = SERVICE[method]
        with self._lock:
            if self._sock is None:
                self._connect()
            self._seq += 1
            w = T.BinaryWriter()
            w.write_message_begin(method, T.CALL, self._seq)
            T.write_struct(w, args_spec, kwargs)
            try:
                self._sock.sendall(w.getvalue())
                r = T.BinaryReader(self._rfile)
                name, mtype, seqid = r.read_message_begin()
                if mtype == T.EXCEPTION:
                    exc = T.read_struct(r, T.APPLICATION_EXCEPTION_SPEC)
                    raise T.TApplicationError(
                        exc.get("message", "unknown"), exc.get("type", 0)
                    )
                if mtype != T.REPLY or name != method or seqid != self._seq:
                    raise T.ThriftProtocolError(
                        f"out-of-order reply: {name}/{mtype}/{seqid}"
                    )
                result = T.read_struct(r, result_spec)
            except T.TApplicationError:
                raise  # full exception struct consumed — stream is aligned
            except (OSError, T.ThriftProtocolError):
                # covers failures ANYWHERE in the read, including a
                # timeout mid-result-struct: the stream position is
                # unknown, so the next call must not parse leftover
                # reply bytes as a message header
                self.close()
                raise
        for fid, (exc_name, _, _) in result_spec.items():
            if fid == 0:
                continue
            if exc_name in result:
                cls = _EXC_BY_NAME.get(exc_name, HMSError)
                raise cls(result[exc_name].get("message", exc_name))
        return result.get("success")
