"""Puffin file format + Iceberg V3 deletion vectors.

The reference (iceberg-go at the surveyed revision) predates V3 and has
no deletion-vector support — this module is beyond-reference surface,
implemented from the public Apache Iceberg Puffin spec and the V3 table
spec's "Deletion vectors" section.

Why DVs exist at 100 TB: V2 positional deletes are parquet files of
(file_path, pos) rows, applied as an anti-join keyed by a *string path*
plus a position — the delete state for one data file is scattered
across many delete files, grows with every delete commit, and the join
re-shuffles full path strings. A deletion vector is ONE compressed
roaring bitmap per data file, matched by manifest metadata
(`referenced_data_file`) instead of a join key, applied as a per-file
row-index mask inside the scan. Delete state per file is O(bitmap),
lookups are O(1), and repeated deletes compact instead of accumulate.

Byte formats implemented here (all public specs):

* Puffin file (Apache Iceberg Puffin spec v1):
  ``Magic "PFA1" | blob₁ … blobₙ | Magic | FooterPayload(JSON) |
  FooterPayloadSize (4 LE) | Flags (4) | Magic``.
  Footer JSON: ``{"blobs": [{type, fields, snapshot-id,
  sequence-number, offset, length, properties}], "properties": {}}``.
  We always write an uncompressed footer (flags = 0) and uncompressed
  blobs; the reader rejects compressed footers loudly.

* ``deletion-vector-v1`` blob (Iceberg V3 spec):
  ``len(magic+vector) (4 BE) | magic D1 D3 39 64 | vector |
  crc32(magic+vector) (4 BE)`` where ``vector`` is a 64-bit roaring
  bitmap in the portable format.

* Roaring bitmap portable format (RoaringFormatSpec):
  64-bit = ``u64 LE bucket count``, then per bucket (ascending):
  ``u32 LE high key | 32-bit roaring portable``. 32-bit = cookie
  header (12346 = no run containers, else 12347 with a run-flag
  bitset), descriptive header of (u16 key, u16 cardinality-1) pairs,
  an offset header, then array (sorted u16s), bitset (1024 u64 LE =
  65536 bits LSB-first), or run (u16 count, then (start, len-1) u16
  pairs) containers. The writer emits array/bitset containers only
  (cookie 12346 — always valid); the reader accepts all three
  container kinds so bitmaps produced by CRoaring/Java readers'
  run-compressed output still decode.

Everything is numpy-vectorized: serialization cost is O(positions)
with no per-position Python; a 10M-row delete vector round-trips in
milliseconds (see tests/test_puffin.py benchmarks).
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DV_BLOB_TYPE = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
_BITSET_BYTES = 8192


# -- roaring 32-bit ---------------------------------------------------------


def _serialize_roaring32(vals: np.ndarray) -> bytes:
    """``vals``: sorted unique uint32 low-words. Cookie 12346 layout."""
    key16 = (vals >> np.uint32(16)).astype(np.uint16)
    low16 = (vals & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(key16, return_index=True)
    bounds = np.append(starts, len(vals))
    n = len(keys)
    desc = bytearray()
    containers: list[bytes] = []
    for i in range(n):
        c = low16[bounds[i] : bounds[i + 1]]
        card = len(c)
        desc += struct.pack("<HH", int(keys[i]), card - 1)
        if card <= _ARRAY_MAX:
            containers.append(c.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[c] = True
            containers.append(np.packbits(bits, bitorder="little").tobytes())
    # offset header is mandatory for cookie 12346
    base = 8 + 4 * n + 4 * n
    offsets = bytearray()
    off = base
    for blob in containers:
        offsets += struct.pack("<I", off)
        off += len(blob)
    return (
        struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
        + bytes(desc)
        + bytes(offsets)
        + b"".join(containers)
    )


def _deserialize_roaring32(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    """Decode one 32-bit roaring bitmap starting at ``off``; returns
    (sorted uint32 values, offset past the bitmap). Containers are laid
    out back-to-back in key order, so the offset header (when present)
    is skipped and decoding proceeds sequentially — robust to writers
    that emit offsets relative to either the stream or the bitmap."""
    (cookie,) = struct.unpack_from("<I", buf, off)
    off += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = np.frombuffer(buf, np.uint8, nbytes, off)
        off += nbytes
        is_run = np.unpackbits(run_flags, bitorder="little")[:n].astype(bool)
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        is_run = np.zeros(n, dtype=bool)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap: cookie {cookie}")
    desc = np.frombuffer(buf, "<u2", 2 * n, off).reshape(n, 2)
    off += 4 * n
    keys = desc[:, 0].astype(np.uint32)
    cards = desc[:, 1].astype(np.int64) + 1
    if has_offsets:
        off += 4 * n
    parts: list[np.ndarray] = []
    for i in range(n):
        if is_run[i]:
            (nruns,) = struct.unpack_from("<H", buf, off)
            off += 2
            runs = np.frombuffer(buf, "<u2", 2 * nruns, off).reshape(nruns, 2)
            off += 4 * nruns
            vals = (
                np.concatenate(
                    [
                        np.arange(int(s), int(s) + int(ln) + 1, dtype=np.uint32)
                        for s, ln in runs
                    ]
                )
                if nruns
                else np.empty(0, np.uint32)
            )
        elif cards[i] > _ARRAY_MAX:
            raw = np.frombuffer(buf, np.uint8, _BITSET_BYTES, off)
            off += _BITSET_BYTES
            vals = np.nonzero(np.unpackbits(raw, bitorder="little"))[0].astype(
                np.uint32
            )
        else:
            vals = np.frombuffer(buf, "<u2", int(cards[i]), off).astype(np.uint32)
            off += 2 * int(cards[i])
        parts.append(vals + (keys[i] << np.uint32(16)))
    out = np.concatenate(parts) if parts else np.empty(0, np.uint32)
    return out, off


# -- roaring 64-bit portable ------------------------------------------------


def serialize_roaring64(positions, assume_sorted_unique: bool = False) -> bytes:
    """Sorted-unique uint64 positions → 64-bit portable roaring bytes.
    ``assume_sorted_unique`` skips the normalization sort when the
    caller already deduped (dv_blob: the second O(n log n) pass on
    multi-million-position vectors was pure waste — r8 wave 4)."""
    pos = np.asarray(positions, dtype=np.uint64)
    if not assume_sorted_unique:
        pos = np.unique(pos)
    high = (pos >> np.uint64(32)).astype(np.uint32)
    low = (pos & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    keys, starts = np.unique(high, return_index=True)
    bounds = np.append(starts, len(pos))
    out = [struct.pack("<Q", len(keys))]
    for i, k in enumerate(keys):
        out.append(struct.pack("<I", int(k)))
        out.append(_serialize_roaring32(low[bounds[i] : bounds[i + 1]]))
    return b"".join(out)


def deserialize_roaring64(buf: bytes, off: int = 0) -> np.ndarray:
    """64-bit portable roaring bytes → sorted uint64 positions."""
    (nbuckets,) = struct.unpack_from("<Q", buf, off)
    off += 8
    parts: list[np.ndarray] = []
    for _ in range(nbuckets):
        (key,) = struct.unpack_from("<I", buf, off)
        off += 4
        low, off = _deserialize_roaring32(buf, off)
        parts.append(low.astype(np.uint64) + (np.uint64(key) << np.uint64(32)))
    return np.concatenate(parts) if parts else np.empty(0, np.uint64)


# -- deletion-vector-v1 blob ------------------------------------------------


def dv_blob(positions) -> tuple[bytes, int]:
    """Encode deleted positions as a deletion-vector-v1 blob.

    Returns (blob bytes, cardinality). Layout per the Iceberg V3 spec:
    4-byte BE length of magic+vector, magic D1D33964, the portable
    roaring64 vector, 4-byte BE CRC-32 of magic+vector."""
    pos = np.unique(np.asarray(positions, dtype=np.uint64))
    body = DV_MAGIC + serialize_roaring64(pos, assume_sorted_unique=True)
    return (
        struct.pack(">i", len(body)) + body + struct.pack(">I", zlib.crc32(body)),
        len(pos),
    )


def decode_dv_blob(buf: bytes) -> np.ndarray:
    """Decode a deletion-vector-v1 blob → sorted uint64 positions.
    Verifies the magic and CRC — a torn/corrupt vector must fail the
    scan loudly, never silently resurrect deleted rows."""
    if len(buf) < 12:
        raise ValueError("deletion vector blob too short")
    (length,) = struct.unpack_from(">i", buf, 0)
    if length < 4 or 4 + length + 4 > len(buf):
        raise ValueError(f"deletion vector length {length} out of bounds")
    body = buf[4 : 4 + length]
    if body[:4] != DV_MAGIC:
        raise ValueError("deletion vector magic mismatch")
    (crc,) = struct.unpack_from(">I", buf, 4 + length)
    if zlib.crc32(body) != crc:
        raise ValueError("deletion vector CRC mismatch")
    return deserialize_roaring64(body, 4)


# -- puffin files -----------------------------------------------------------


def write_puffin(blobs: list[tuple[bytes, dict]]) -> tuple[bytes, list[dict]]:
    """Assemble a Puffin file from (blob bytes, metadata) pairs.

    Metadata dicts need ``type`` (plus any of snapshot-id /
    sequence-number / fields / properties); ``offset``/``length`` are
    filled in here. Returns (file bytes, completed blob metadata)."""
    parts = [MAGIC]
    off = len(MAGIC)
    metas: list[dict] = []
    for data, meta in blobs:
        m = {"fields": [], **meta, "offset": off, "length": len(data)}
        metas.append(m)
        parts.append(data)
        off += len(data)
    payload = json.dumps(
        {"blobs": metas, "properties": {"created-by": "icegopher-spark"}}
    ).encode()
    parts += [
        MAGIC,
        payload,
        struct.pack("<i", len(payload)),
        b"\x00\x00\x00\x00",
        MAGIC,
    ]
    return b"".join(parts), metas


def read_puffin_footer(data: bytes) -> dict:
    """Parse a Puffin file's footer payload JSON."""
    if len(data) < 12 + 2 * len(MAGIC) or data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("not a puffin file (magic mismatch)")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise ValueError("compressed puffin footers are not supported")
    (payload_size,) = struct.unpack_from("<i", data, len(data) - 12)
    payload_end = len(data) - 12
    payload_start = payload_end - payload_size
    if payload_start < 8 or data[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError("puffin footer payload framing invalid")
    return json.loads(data[payload_start:payload_end].decode())


def read_dv(data: bytes, offset: int, length: int) -> np.ndarray:
    """Decode the DV blob at (offset, length) of a Puffin file's bytes —
    the (content_offset, content_size_in_bytes) coordinates a manifest
    entry carries, so readers slice the blob without parsing the
    footer."""
    return decode_dv_blob(data[offset : offset + length])
