"""Minimal Avro Object Container File (OCF) reader/writer, pure Python.

Implements the subset of Avro 1.x needed for Iceberg manifest lists and
manifest files (per the public Avro spec): records, unions, arrays,
maps, fixed, and all primitives; null/deflate codecs; zigzag-varint
encoding. No third-party Avro library is available in this environment,
and manifests are small driver-side metadata — a few KB each — so pure
Python is the right cost profile (reference reads them the same way,
single-threaded: manifest.go:206-296).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# Primitive codecs
# --------------------------------------------------------------------------


def _read_varint(buf: BinaryIO) -> int:
    shift = 0
    result = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("unexpected end of Avro data")
        byte = b[0]
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return result


def read_long(buf: BinaryIO) -> int:
    n = _read_varint(buf)
    return (n >> 1) ^ -(n & 1)  # zigzag decode


def write_long(out: io.BytesIO, value: int) -> None:
    # refuse out-of-int64 rather than mask: the old "clamp" silently
    # encoded 2**80 as 0 and corrupted the file undetectably
    if not (-(1 << 63) <= value < (1 << 63)):
        raise OverflowError(f"avro long out of int64 range: {value}")
    n = (value << 1) ^ (value >> 63) if value < 0 else value << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def read_bytes(buf: BinaryIO) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("short read")
    return data


def write_bytes(out: io.BytesIO, value: bytes) -> None:
    write_long(out, len(value))
    out.write(value)


# --------------------------------------------------------------------------
# Schema-driven decode/encode
# --------------------------------------------------------------------------


def _read_block_count(buf: BinaryIO) -> int:
    """Avro block count: negative means |count| items preceded by a
    byte-size prefix (read and discarded). One helper for the four
    sites that previously copy-pasted the idiom (r8 wave 4)."""
    count = read_long(buf)
    if count < 0:
        count = -count
        read_long(buf)  # block byte size, unused
    return count


def _decode(schema: Any, buf: BinaryIO) -> Any:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: zigzag index then value
        idx = read_long(buf)
        if not 0 <= idx < len(schema):
            # a corrupt index must fail loudly — Python's negative
            # indexing would silently pick a branch from the END and
            # misalign the whole stream (r8 review wave 4)
            raise ValueError(f"avro union branch {idx} out of range")
        return _decode(schema[idx], buf)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1)[0] != 0
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        data = buf.read(schema["size"])
        if len(data) != schema["size"]:
            raise EOFError("short read in avro fixed")  # like read_bytes
        return data
    if t == "enum":
        sym = read_long(buf)
        if not 0 <= sym < len(schema["symbols"]):
            raise ValueError(f"avro enum index {sym} out of range")
        return schema["symbols"][sym]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            count = _read_block_count(buf)
            if count == 0:
                break
            for _ in range(count):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            count = _read_block_count(buf)
            if count == 0:
                break
            for _ in range(count):
                k = read_bytes(buf).decode("utf-8")
                out_m[k] = _decode(schema["values"], buf)
        return out_m
    raise ValueError(f"unsupported Avro type: {t!r}")


def _union_index(schema: list, value: Any) -> int:
    """Pick the union branch for a value; Iceberg manifests only use
    [null, X] unions, so the logic is simple."""
    for i, branch in enumerate(schema):
        bt = branch if isinstance(branch, str) else branch.get("type")
        if value is None and bt == "null":
            return i
        if value is not None and bt != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def _encode(schema: Any, value: Any, out: io.BytesIO) -> None:
    if isinstance(schema, list):
        idx = _union_index(schema, value)
        write_long(out, idx)
        _encode(schema[idx], value, out)
        return
    t = schema if isinstance(schema, str) else schema["type"]

    if t == "null":
        return
    if t == "boolean":
        if value is None:
            # a missing required boolean must crash like long/string do
            # (int(None)/None.encode), not silently encode false — the
            # .get-null corruption class from the r5 review (r8 wave 4)
            raise TypeError("required avro boolean is None")
        out.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        write_long(out, int(value))
        return
    if t == "float":
        out.write(struct.pack("<f", value))
        return
    if t == "double":
        out.write(struct.pack("<d", value))
        return
    if t == "bytes":
        write_bytes(out, bytes(value))
        return
    if t == "string":
        write_bytes(out, value.encode("utf-8"))
        return
    if t == "fixed":
        out.write(bytes(value))
        return
    if t == "enum":
        write_long(out, schema["symbols"].index(value))
        return
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out)
        return
    if t == "array":
        items = list(value or ())
        if items:
            write_long(out, len(items))
            for item in items:
                _encode(schema["items"], item, out)
        write_long(out, 0)
        return
    if t == "map":
        entries = dict(value or {})
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out)
        write_long(out, 0)
        return
    raise ValueError(f"unsupported Avro type: {t!r}")


# --------------------------------------------------------------------------
# OCF container
# --------------------------------------------------------------------------


def read_ocf(data: bytes) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Decode an OCF → (schema, file metadata, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_block_count(buf)
        if count == 0:
            break
        for _ in range(count):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)

    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n_records = read_long(buf)
        block_len = read_long(buf)
        if n_records < 0 or block_len < 0:
            raise ValueError(
                f"corrupt Avro OCF block header: n_records={n_records} "
                f"block_len={block_len}"
            )
        block = buf.read(block_len)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(n_records):
            records.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, meta, records


def count_ocf_rows(path: str) -> int:
    """Row count from OCF block headers alone — payload blocks are
    seeked over, never decompressed or decoded, so commit-time stats for
    executor-written Avro data files stay metadata-only on the driver."""
    total = 0
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError("not an Avro object container file")
        while True:
            count = _read_block_count(fh)
            if count == 0:
                break
            for _ in range(count):
                read_bytes(fh)  # key
                read_bytes(fh)  # value
        sync = fh.read(16)
        while True:
            head = fh.read(1)
            if not head:
                break
            fh.seek(-1, os.SEEK_CUR)
            n_records = read_long(fh)
            block_len = read_long(fh)
            # a single flipped varint bit can decode negative: trusting
            # it would undercount (negative total +=) or seek BACKWARD
            # into already-read bytes and false-match the sync
            if n_records < 0 or block_len < 0:
                raise ValueError(f"corrupt Avro OCF block header in {path}")
            fh.seek(block_len, os.SEEK_CUR)  # skip payload, never decode
            # seeking past EOF is legal, so a blind seek would turn a
            # truncated file into a silent undercount — instead read the
            # 16-byte trailer and demand the header's sync marker
            if fh.read(16) != sync:
                raise ValueError(f"truncated or corrupt Avro OCF: {path}")
            total += n_records
    return total


def write_ocf(
    schema: dict | str,
    records: list[dict],
    metadata: dict[str, bytes] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> bytes:
    """Encode records into an OCF byte string.

    ``sync`` defaults to a fresh random 16-byte marker per file, as the
    Avro spec requires — a constant all-zero marker would let the
    truncation check in ``count_ocf_rows`` false-pass on zero runs and
    confuse external sync-scanning splittable readers."""
    if sync is None:
        sync = os.urandom(16)
    if isinstance(schema, str):
        schema_obj = json.loads(schema)
        schema_str = schema
    else:
        schema_obj = schema
        schema_str = json.dumps(schema)
    out = io.BytesIO()
    out.write(MAGIC)
    meta: dict[str, bytes] = {
        "avro.schema": schema_str.encode("utf-8"),
        "avro.codec": codec.encode(),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    write_long(out, len(meta))
    for k, v in meta.items():
        write_bytes(out, k.encode("utf-8"))
        write_bytes(out, v)
    write_long(out, 0)
    out.write(sync)

    body = io.BytesIO()
    for rec in records:
        _encode(schema_obj, rec, body)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    write_long(out, len(records))
    write_long(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()
