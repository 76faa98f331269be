"""Minimal Apache Thrift binary protocol (pure Python, stdlib only).

Implements exactly the subset the Hive Metastore client needs: the
strict TBinaryProtocol framing (message envelope, struct/field
encoding, the container types) over an unframed socket transport —
the HMS default wire format. Written from the public Thrift protocol
specification (thrift/doc/specs/thrift-binary-protocol.md); no
generated code, no thrift pip dependency (the sandbox has none).

Values map to plain Python: structs are dicts keyed by field NAME
(driven by spec tables, see ``StructSpec``), maps are dicts, lists are
lists. Unknown fields on decode are skipped per the protocol's
skip-by-type rule, so a real HMS server's wider structs parse fine.

The reference stops at the catalog-type enum for Hive
(table/catalog/catalog.go:40-47: CatalogHive declared, never
implemented); this module is the wire layer that closes that member.
"""

from __future__ import annotations

import struct
from typing import Any

# TType ids (protocol constants)
STOP = 0
BOOL = 2
BYTE = 3
DOUBLE = 4
I16 = 6
I32 = 8
I64 = 10
STRING = 11
STRUCT = 12
MAP = 13
SET = 14
LIST = 15

# message types
CALL = 1
REPLY = 2
EXCEPTION = 3
ONEWAY = 4

VERSION_1 = 0x80010000
VERSION_MASK = 0xFFFF0000


class ThriftProtocolError(Exception):
    pass


class BinaryWriter:
    """Accumulates strict-binary-protocol bytes."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def getvalue(self) -> bytes:
        return bytes(self._buf)

    # -- primitives --------------------------------------------------
    def write_bool(self, v: bool) -> None:
        self._buf.append(1 if v else 0)

    def write_byte(self, v: int) -> None:
        self._buf += struct.pack("!b", v)

    def write_i16(self, v: int) -> None:
        self._buf += struct.pack("!h", v)

    def write_i32(self, v: int) -> None:
        self._buf += struct.pack("!i", v)

    def write_i64(self, v: int) -> None:
        self._buf += struct.pack("!q", v)

    def write_double(self, v: float) -> None:
        self._buf += struct.pack("!d", v)

    def write_string(self, v: str | bytes) -> None:
        b = v.encode("utf-8") if isinstance(v, str) else v
        self.write_i32(len(b))
        self._buf += b

    # -- composite ---------------------------------------------------
    def write_message_begin(self, name: str, mtype: int, seqid: int) -> None:
        self._buf += struct.pack("!I", VERSION_1 | mtype)
        self.write_string(name)
        self.write_i32(seqid)

    def write_field_begin(self, ftype: int, fid: int) -> None:
        self.write_byte(ftype)
        self.write_i16(fid)

    def write_field_stop(self) -> None:
        self.write_byte(STOP)

    def write_map_begin(self, ktype: int, vtype: int, size: int) -> None:
        self.write_byte(ktype)
        self.write_byte(vtype)
        self.write_i32(size)

    def write_list_begin(self, etype: int, size: int) -> None:
        self.write_byte(etype)
        self.write_i32(size)


class BinaryReader:
    """Decodes strict-binary-protocol bytes from a file-like object
    (socket.makefile('rb') for the wire, io.BytesIO for tests)."""

    def __init__(self, stream) -> None:
        self._s = stream

    def _read(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self._s.read(n - len(out))
            if not chunk:
                raise ThriftProtocolError("connection closed mid-message")
            out += chunk
        return out

    # -- primitives --------------------------------------------------
    def read_bool(self) -> bool:
        return self._read(1) != b"\x00"

    def read_byte(self) -> int:
        return struct.unpack("!b", self._read(1))[0]

    def read_i16(self) -> int:
        return struct.unpack("!h", self._read(2))[0]

    def read_i32(self) -> int:
        return struct.unpack("!i", self._read(4))[0]

    def read_i64(self) -> int:
        return struct.unpack("!q", self._read(8))[0]

    def read_double(self) -> float:
        return struct.unpack("!d", self._read(8))[0]

    def read_string(self) -> str:
        n = self.read_i32()
        if n < 0:
            raise ThriftProtocolError(f"negative string length {n}")
        return self._read(n).decode("utf-8")

    # -- composite ---------------------------------------------------
    def read_message_begin(self) -> tuple[str, int, int]:
        first = struct.unpack("!I", self._read(4))[0]
        if first & VERSION_MASK != VERSION_1:
            raise ThriftProtocolError(
                f"bad version 0x{first:08x} (old-style/unframed mismatch?)"
            )
        mtype = first & 0xFF
        name = self.read_string()
        seqid = self.read_i32()
        return name, mtype, seqid

    def read_field_begin(self) -> tuple[int, int]:
        ftype = self.read_byte()
        if ftype == STOP:
            return STOP, 0
        return ftype, self.read_i16()

    def read_map_begin(self) -> tuple[int, int, int]:
        return self.read_byte(), self.read_byte(), self.read_i32()

    def read_list_begin(self) -> tuple[int, int]:
        return self.read_byte(), self.read_i32()

    def skip(self, ftype: int) -> None:
        """Skip one value of the given type (forward compatibility)."""
        if ftype == BOOL or ftype == BYTE:
            self._read(1)
        elif ftype == I16:
            self._read(2)
        elif ftype == I32:
            self._read(4)
        elif ftype in (I64, DOUBLE):
            self._read(8)
        elif ftype == STRING:
            n = self.read_i32()
            if n < 0:
                # same guard as read_string: a negative length silently
                # skipping 0 bytes would leave the stream misaligned and
                # later fields decoding as garbage instead of failing
                raise ThriftProtocolError(f"negative string length {n}")
            self._read(n)
        elif ftype == STRUCT:
            while True:
                ft, _ = self.read_field_begin()
                if ft == STOP:
                    break
                self.skip(ft)
        elif ftype == MAP:
            kt, vt, n = self.read_map_begin()
            for _ in range(n):
                self.skip(kt)
                self.skip(vt)
        elif ftype in (LIST, SET):
            et, n = self.read_list_begin()
            for _ in range(n):
                self.skip(et)
        else:
            raise ThriftProtocolError(f"cannot skip type {ftype}")


# ---------------------------------------------------------------------------
# Spec-driven struct codec.
#
# A StructSpec is {field_id: (name, ttype, subspec)} where subspec is
#   STRUCT -> a StructSpec
#   LIST/SET -> (elem_ttype, elem_subspec)
#   MAP -> (key_ttype, val_ttype, val_subspec)   (string keys only here)
#   scalars -> None
# Encoded/decoded values are dicts keyed by field NAME; absent/None
# fields are simply not written (thrift optionality).

StructSpec = dict


def write_value(w: BinaryWriter, ttype: int, sub, value: Any) -> None:
    if ttype == BOOL:
        w.write_bool(bool(value))
    elif ttype == BYTE:
        w.write_byte(int(value))
    elif ttype == I16:
        w.write_i16(int(value))
    elif ttype == I32:
        w.write_i32(int(value))
    elif ttype == I64:
        w.write_i64(int(value))
    elif ttype == DOUBLE:
        w.write_double(float(value))
    elif ttype == STRING:
        w.write_string(value)
    elif ttype == STRUCT:
        write_struct(w, sub, value)
    elif ttype in (LIST, SET):
        et, esub = sub
        items = list(value)
        w.write_list_begin(et, len(items))
        for item in items:
            write_value(w, et, esub, item)
    elif ttype == MAP:
        kt, vt, vsub = sub
        w.write_map_begin(kt, vt, len(value))
        for k, v in value.items():
            write_value(w, kt, None, k)
            write_value(w, vt, vsub, v)
    else:
        raise ThriftProtocolError(f"cannot write type {ttype}")


def write_struct(w: BinaryWriter, spec: StructSpec, value: dict) -> None:
    for fid, (name, ttype, sub) in spec.items():
        v = value.get(name)
        if v is None:
            continue
        w.write_field_begin(ttype, fid)
        write_value(w, ttype, sub, v)
    w.write_field_stop()


def read_value(r: BinaryReader, ttype: int, sub) -> Any:
    if ttype == BOOL:
        return r.read_bool()
    if ttype == BYTE:
        return r.read_byte()
    if ttype == I16:
        return r.read_i16()
    if ttype == I32:
        return r.read_i32()
    if ttype == I64:
        return r.read_i64()
    if ttype == DOUBLE:
        return r.read_double()
    if ttype == STRING:
        return r.read_string()
    if ttype == STRUCT:
        return read_struct(r, sub)
    if ttype in (LIST, SET):
        et, esub = sub
        got_et, n = r.read_list_begin()
        out = []
        for _ in range(n):
            if got_et == et:
                out.append(read_value(r, et, esub))
            else:  # mismatched element type: skip, keep stream aligned
                r.skip(got_et)
        return out
    if ttype == MAP:
        kt, vt, vsub = sub
        got_kt, got_vt, n = r.read_map_begin()
        out = {}
        for _ in range(n):
            if got_kt == kt and got_vt == vt:
                # key MUST be pulled off the stream before the value —
                # `out[f()] = g()` evaluates g() first in Python
                k = read_value(r, kt, None)
                out[k] = read_value(r, vt, vsub)
            else:
                r.skip(got_kt)
                r.skip(got_vt)
        return out
    raise ThriftProtocolError(f"cannot read type {ttype}")


def read_struct(r: BinaryReader, spec: StructSpec) -> dict:
    out: dict = {}
    while True:
        ftype, fid = r.read_field_begin()
        if ftype == STOP:
            return out
        entry = spec.get(fid)
        if entry is None or entry[1] != ftype:
            r.skip(ftype)  # unknown or re-typed field: forward compat
            continue
        name, _, sub = entry
        out[name] = read_value(r, ftype, sub)


# TApplicationException (protocol-level errors)
APPLICATION_EXCEPTION_SPEC: StructSpec = {
    1: ("message", STRING, None),
    2: ("type", I32, None),
}


class TApplicationError(ThriftProtocolError):
    def __init__(self, message: str, code: int = 0):
        super().__init__(message)
        self.code = code
