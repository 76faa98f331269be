"""Puffin / roaring / deletion-vector byte-format tests.

The writer and reader are both ours, so round-trip alone can't catch a
systematically-wrong layout; these tests therefore also pin the exact
bytes of hand-computed small bitmaps against the public
RoaringFormatSpec, and decode hand-built run-container buffers the
writer never emits."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from icegopher_spark.iceberg.puffin import (
    DV_MAGIC,
    decode_dv_blob,
    deserialize_roaring64,
    dv_blob,
    read_dv,
    read_puffin_footer,
    serialize_roaring64,
    write_puffin,
)


def rt(positions):
    return deserialize_roaring64(serialize_roaring64(positions))


class TestRoaring64RoundTrip:
    def test_empty(self):
        out = rt([])
        assert out.dtype == np.uint64 and len(out) == 0

    def test_small_array_container(self):
        assert rt([0, 1, 5, 65535]).tolist() == [0, 1, 5, 65535]

    def test_duplicates_collapse(self):
        assert rt([7, 7, 7, 3]).tolist() == [3, 7]

    def test_array_bitset_boundary(self):
        # 4096 values stays an array container; 4097 flips to bitset
        v_arr = np.arange(0, 8192, 2, dtype=np.uint64)  # 4096
        v_bit = np.arange(0, 8194, 2, dtype=np.uint64)  # 4097
        assert np.array_equal(rt(v_arr), v_arr)
        assert np.array_equal(rt(v_bit), v_bit)
        # (4096 u16s and the 8 KiB bitset are the same size — the
        # boundary is pinned by the round-trips above, not by length)

    def test_multiple_key16_containers(self):
        v = np.array([1, 65536, 65537, 131072 + 9], dtype=np.uint64)
        assert np.array_equal(rt(v), v)

    def test_multiple_high32_buckets(self):
        v = np.array([5, 2**32, 2**32 + 1, 2**33 + 7, 2**40], dtype=np.uint64)
        assert np.array_equal(rt(v), v)

    def test_dense_full_container(self):
        v = np.arange(65536, dtype=np.uint64)
        assert np.array_equal(rt(v), v)

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**34),
            min_size=0,
            max_size=500,
        )
    )
    def test_hypothesis_round_trip(self, vals):
        v = np.unique(np.asarray(vals, dtype=np.uint64))
        assert np.array_equal(rt(v), v)


class TestRoaringSpecBytes:
    """Pin exact bytes against the public RoaringFormatSpec."""

    def test_single_array_container_layout(self):
        buf = serialize_roaring64([3, 1000])
        # u64 LE bucket count = 1
        assert buf[:8] == struct.pack("<Q", 1)
        # u32 LE high key = 0
        assert buf[8:12] == struct.pack("<I", 0)
        # cookie 12346, 1 container
        assert buf[12:20] == struct.pack("<II", 12346, 1)
        # descriptive header: key16=0, cardinality-1=1
        assert buf[20:24] == struct.pack("<HH", 0, 1)
        # offset header: container starts at 8+4+4=16 into the 32-bit stream
        assert buf[24:28] == struct.pack("<I", 16)
        # array container: sorted u16s
        assert buf[28:32] == struct.pack("<HH", 3, 1000)
        assert len(buf) == 32

    def test_bitset_container_bit_positions(self):
        v = np.arange(0, 2 * 4097, 2, dtype=np.uint64)
        buf = serialize_roaring64(v)
        # container bytes start after u64+u32 + cookie(8)+desc(4)+offset(4)
        bits = np.unpackbits(
            np.frombuffer(buf, np.uint8, 8192, 28), bitorder="little"
        )
        assert np.array_equal(np.nonzero(bits)[0], v.astype(np.int64))

    def test_run_container_decode(self):
        # Hand-build: cookie 12347, 1 container, run-flagged, runs
        # [(10, len 5), (100, len 1)] → {10..14, 100}
        cookie = struct.pack("<I", 12347 | ((1 - 1) << 16))
        runflags = bytes([0b1])
        desc = struct.pack("<HH", 0, 6 - 1)
        body = struct.pack("<H", 2) + struct.pack("<HHHH", 10, 4, 100, 0)
        r32 = cookie + runflags + desc + body  # n<4 → no offset header
        buf = struct.pack("<Q", 1) + struct.pack("<I", 7) + r32
        out = deserialize_roaring64(buf)
        expect = (np.array([10, 11, 12, 13, 14, 100], dtype=np.uint64)
                  + np.uint64(7 << 32))
        assert np.array_equal(out, expect)

    def test_run_container_with_offsets(self):
        # 4 containers (>= NO_OFFSET_THRESHOLD) under cookie 12347 → the
        # offset header IS present and must be skipped
        n = 4
        cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
        runflags = bytes([0b0001])  # only container 0 is runs
        desc = b"".join(
            struct.pack("<HH", k, c - 1)
            for k, c in [(0, 3), (1, 2), (2, 1), (3, 1)]
        )
        conts = [
            struct.pack("<H", 1) + struct.pack("<HH", 5, 2),  # {5,6,7}
            struct.pack("<HH", 1, 9),
            struct.pack("<H", 42),
            struct.pack("<H", 7),
        ]
        base = 4 + 1 + 4 * n + 4 * n
        offs, off = bytearray(), base
        for c in conts:
            offs += struct.pack("<I", off)
            off += len(c)
        r32 = cookie + runflags + desc + bytes(offs) + b"".join(conts)
        buf = struct.pack("<Q", 1) + struct.pack("<I", 0) + r32
        out = deserialize_roaring64(buf)
        expect = np.array(
            [5, 6, 7, 65537, 65545, 2 * 65536 + 42, 3 * 65536 + 7],
            dtype=np.uint64,
        )
        assert np.array_equal(out, expect)


class TestDvBlob:
    def test_round_trip_and_cardinality(self):
        blob, card = dv_blob([9, 2, 2, 5])
        assert card == 3
        assert decode_dv_blob(blob).tolist() == [2, 5, 9]

    def test_layout(self):
        blob, _ = dv_blob([1])
        (length,) = struct.unpack_from(">i", blob, 0)
        body = blob[4 : 4 + length]
        assert body[:4] == DV_MAGIC
        assert struct.unpack_from(">I", blob, 4 + length)[0] == zlib.crc32(body)
        assert len(blob) == 4 + length + 4

    def test_crc_detects_corruption(self):
        blob, _ = dv_blob([1, 2, 3])
        bad = bytearray(blob)
        bad[10] ^= 0xFF
        with pytest.raises(ValueError):
            decode_dv_blob(bytes(bad))

    def test_truncation_detected(self):
        blob, _ = dv_blob([1, 2, 3])
        with pytest.raises(ValueError):
            decode_dv_blob(blob[: len(blob) - 6])


class TestPuffinFile:
    def test_write_read_footer_and_blobs(self):
        b1, c1 = dv_blob([1, 5])
        b2, c2 = dv_blob([2**33, 4])
        data, metas = write_puffin(
            [
                (b1, {"type": "deletion-vector-v1",
                      "properties": {"referenced-data-file": "/d/a.parquet",
                                     "cardinality": str(c1)}}),
                (b2, {"type": "deletion-vector-v1",
                      "properties": {"referenced-data-file": "/d/b.parquet",
                                     "cardinality": str(c2)}}),
            ]
        )
        footer = read_puffin_footer(data)
        assert [b["type"] for b in footer["blobs"]] == ["deletion-vector-v1"] * 2
        got1 = read_dv(data, metas[0]["offset"], metas[0]["length"])
        got2 = read_dv(data, metas[1]["offset"], metas[1]["length"])
        assert got1.tolist() == [1, 5]
        assert got2.tolist() == [4, 2**33]
        # blob coordinates from the FOOTER agree with the writer's
        fb = footer["blobs"]
        assert (fb[0]["offset"], fb[0]["length"]) == (
            metas[0]["offset"], metas[0]["length"])

    def test_not_a_puffin(self):
        with pytest.raises(ValueError):
            read_puffin_footer(b"NOPE" + b"\x00" * 40)

    def test_large_vector_perf_sane(self):
        # 1M scattered positions round-trip without per-row Python cost
        rng = np.random.default_rng(7)
        v = np.unique(rng.integers(0, 2**33, size=1_000_000).astype(np.uint64))
        blob, card = dv_blob(v)
        assert card == len(v)
        assert np.array_equal(decode_dv_blob(blob), v)
