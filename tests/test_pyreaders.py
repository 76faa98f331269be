"""Arrow-reader paths: MOR positional deletes over ORC data files, and
Avro DATA file reads (pure-Python OCF, distributed via mapInPandas) —
closing the two format gaps Spark's bundled sources leave open."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.manifests import DataFile
from icegopher_spark.iceberg.pyreaders import (
    read_avro_files,
    read_orc_with_pos,
    write_avro_data_file,
)
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = Schema(
    (
        NestedField(1, "l_orderkey", LongType(), True),
        NestedField(2, "l_quantity", DoubleType(), False),
        NestedField(3, "l_returnflag", StringType(), False),
    ),
    schema_id=0,
)


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )


def test_orc_reader_positions_match_spark_order(spark, tmp_path, lineitem):
    out = str(tmp_path / "orc")
    lineitem.limit(500).coalesce(1).write.mode("overwrite").orc(out)
    import glob

    path = glob.glob(f"{out}/*.orc")[0]
    df = read_orc_with_pos(spark, [path], lineitem.schema)
    rows = df.orderBy("_pos").collect()
    expect = spark.read.orc(path).collect()  # single split => file order
    assert [r["_pos"] for r in rows] == list(range(len(expect)))
    assert [r["l_orderkey"] for r in rows] == [r["l_orderkey"] for r in expect]


def test_mor_delete_over_orc_table(spark, tmp_path, lineitem):
    t = W.create_table(
        str(tmp_path / "tbl"), SCHEMA, properties={"write.format.default": "orc"}
    )
    t = W.append(t, lineitem)
    n_all = lineitem.count()
    assert all(f.endswith(".orc") for f in _paths(t))

    t = W.delete_where_mor(t, spark, E.equal_to("l_returnflag", "R"))
    expect = lineitem.filter(F.col("l_returnflag") != "R")
    got = t.scan().to_df(spark)
    assert got.count() == expect.count() < n_all
    assert got.filter(F.col("l_returnflag") == "R").count() == 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def _paths(t):
    from icegopher_spark.iceberg.manifests import ManifestContent, fetch_entries, read_manifest_list

    out = []
    for m in read_manifest_list(t.io.read(t.current_snapshot().manifest_list)):
        if m.content == ManifestContent.DELETES:
            continue
        for e in fetch_entries(m, t.io.read(m.manifest_path), discard_deleted=True):
            out.append(e.data_file.file_path)
    return out


def test_avro_data_file_scan(spark, tmp_path, lineitem):
    """An Iceberg table whose data files are Avro OCF: written with the
    pure-Python codec, scanned distributed through mapInPandas."""
    rows = [r.asDict() for r in lineitem.limit(300).collect()]
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    path = f"{t.location}/data/part-0.avro"
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_avro_data_file(path, SCHEMA, rows)
    dfile = DataFile(
        file_path=path,
        file_format="AVRO",
        record_count=len(rows),
        file_size_in_bytes=os.path.getsize(path),
        partition={},
    )
    t = W._commit_snapshot(t, [dfile], "append")

    got = t.scan().to_df(spark)
    assert got.count() == 300
    assert sorted(map(tuple, got.collect())) == sorted(
        (r["l_orderkey"], r["l_quantity"], r["l_returnflag"]) for r in rows
    )
    # filters still apply (re-applied exactly after planning)
    f = t.scan(row_filter=E.less_than("l_quantity", 10.0)).to_df(spark)
    assert f.count() == sum(1 for r in rows if r["l_quantity"] < 10.0)


def test_avro_reader_with_pos(spark, tmp_path, lineitem):
    rows = [r.asDict() for r in lineitem.limit(50).collect()]
    path = str(tmp_path / "f.avro")
    write_avro_data_file(path, SCHEMA, rows)
    df = read_avro_files(spark, [path], SCHEMA.to_spark(), with_pos=True)
    got = df.orderBy("_pos").collect()
    assert [r["_pos"] for r in got] == list(range(50))
    assert [r["l_orderkey"] for r in got] == [r["l_orderkey"] for r in rows]


def test_mixed_format_table_scan(spark, tmp_path, lineitem):
    """One table, two eras: parquet files then (after a property flip)
    ORC files — to_df groups by file format and unions, so a format
    migration never requires a rewrite."""
    t = W.create_table(str(tmp_path / "tbl"), SCHEMA)
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 2 == 0))
    t.metadata.properties["write.format.default"] = "orc"
    t = W.append(t, lineitem.filter(F.col("l_orderkey") % 2 == 1))
    exts = {p.rsplit(".", 1)[-1] for p in _paths(t)}
    assert exts == {"parquet", "orc"}
    got = t.scan().to_df(spark)
    assert got.count() == lineitem.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, lineitem.collect()))
    # MOR delete across both formats at once
    t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 5.0))
    expect = lineitem.filter(F.col("l_quantity") >= 5.0)
    got = t.scan().to_df(spark)
    assert got.count() == expect.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_distributed_avro_write_roundtrip(spark, tmp_path, lineitem):
    """Executor-side OCF bulk write (mapInPandas) -> distributed read:
    values survive the round trip and block-header row counting matches
    without decoding payloads."""
    from icegopher_spark.iceberg.avro_io import count_ocf_rows
    from icegopher_spark.iceberg.pyreaders import write_avro_files

    src = lineitem.limit(400).repartition(4)
    out = str(tmp_path / "avro_out")
    paths = write_avro_files(src, SCHEMA, out)
    assert len(paths) >= 1
    assert sum(count_ocf_rows(p) for p in paths) == 400
    back = read_avro_files(spark, paths, SCHEMA.to_spark())
    a = sorted(src.collect(), key=lambda r: (r[0], r[1], r[2]))
    b = sorted(back.collect(), key=lambda r: (r[0], r[1], r[2]))
    assert a == b


def test_distributed_avro_write_partition_dirs(spark, tmp_path, lineitem):
    """With partition_cols, files land in hive-style dirs by value."""
    import os

    from icegopher_spark.iceberg.pyreaders import write_avro_files

    src = lineitem.limit(300).withColumn("flag", F.col("l_returnflag"))
    out = str(tmp_path / "avro_part")
    paths = write_avro_files(src.repartition("flag"), SCHEMA, out, partition_cols=["flag"])
    dirs = {os.path.basename(os.path.dirname(p)) for p in paths}
    flags = {r[0] for r in src.select("flag").distinct().collect()}
    assert dirs == {f"flag={f}" for f in flags}


def test_avro_table_write_is_executor_side(spark, tmp_path, lineitem):
    """A table with write.format.default=avro appends through the
    distributed OCF writer and scans back identical rows."""
    from icegopher_spark.iceberg.table import Table

    loc = str(tmp_path / "avro_table")
    t = W.create_table(loc, SCHEMA, properties={"write.format.default": "avro"})
    t = W.append(t, lineitem.limit(250))
    files = [e.file for e in t.scan().plan_files()]
    assert files and all(f.file_format == "AVRO" for f in files)
    assert sum(f.record_count for f in files) == 250
    back = t.scan().to_df(spark)
    assert back.count() == 250


def test_avro_write_commit_protocol_ignores_orphans(spark, tmp_path, lineitem):
    """A file left behind by a failed/speculative attempt must never be
    harvested: write_avro_files promotes only successful-attempt paths,
    cleans its staging tree, and the partitioned commit path builds the
    manifest from the returned list, not a directory walk."""
    import os

    from icegopher_spark.iceberg.pyreaders import write_avro_files

    out = str(tmp_path / "avro_orphan")
    # plant an orphan where a naive os.walk harvest would find it
    os.makedirs(f"{out}/flag=A", exist_ok=True)
    with open(f"{out}/flag=A/deadbeef-orphan.avro", "wb") as fh:
        fh.write(b"Obj\x01garbage-from-failed-attempt")

    src = lineitem.limit(200).withColumn("flag", F.col("l_returnflag"))
    paths = write_avro_files(src.repartition("flag"), SCHEMA, out, partition_cols=["flag"])
    assert all("orphan" not in os.path.basename(p) for p in paths)
    assert all("_staging" not in p for p in paths)
    # staging tree is gone
    assert not [d for d in os.listdir(out) if d.startswith("_staging")]
    # full table write path: manifest entries == returned files only
    from icegopher_spark.iceberg.table import Table

    loc = str(tmp_path / "avro_orphan_table")
    t = W.create_table(loc, SCHEMA, properties={"write.format.default": "avro"})
    t = W.append(t, lineitem.limit(100))
    data_dir = f"{loc}/data"
    # plant an orphan between commits
    sub = next(os.walk(data_dir))[1][0] if next(os.walk(data_dir))[1] else ""
    victim_dir = os.path.join(data_dir, sub) if sub else data_dir
    with open(os.path.join(victim_dir, "zzzz-orphan.avro"), "wb") as fh:
        fh.write(b"Objx")
    t = W.append(t, lineitem.limit(50))
    files = [e.file.file_path for e in t.scan().plan_files()]
    assert all("orphan" not in os.path.basename(f) for f in files)
    assert sum(e.file.record_count for e in t.scan().plan_files()) == 150


def test_count_ocf_rows_rejects_truncation(tmp_path):
    """A truncated OCF must raise, not undercount (ADVICE r3)."""
    import pytest as _pytest

    from icegopher_spark.iceberg.avro_io import count_ocf_rows, write_ocf

    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    data = write_ocf(schema, [{"x": i} for i in range(1000)])
    good = tmp_path / "good.avro"
    good.write_bytes(data)
    assert count_ocf_rows(str(good)) == 1000
    bad = tmp_path / "bad.avro"
    bad.write_bytes(data[:-25])  # chop into the last block+sync
    with _pytest.raises(ValueError, match="truncated or corrupt"):
        count_ocf_rows(str(bad))


def test_avro_date_column_roundtrip(spark, tmp_path):
    """Avro data files with DATE columns must be readable (r6): the
    epoch-day ints in the file have no int64->date32 Arrow cast, so the
    reader converts to date objects; nulls survive."""
    from datetime import date

    from icegopher_spark.iceberg.pyreaders import write_avro_files
    from icegopher_spark.iceberg.types import DateType

    schema = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "d", DateType(), False),
        ),
        schema_id=0,
    )
    src = spark.createDataFrame(
        [(1, date(2024, 3, 1)), (2, date(1969, 12, 31)), (3, None)],
        "k long, d date",
    )
    paths = write_avro_files(src.coalesce(1), schema, str(tmp_path / "d"))
    back = {r["k"]: r["d"] for r in read_avro_files(spark, paths, schema.to_spark()).collect()}
    assert back == {1: date(2024, 3, 1), 2: date(1969, 12, 31), 3: None}


def test_avro_timestamptz_utc_micros_under_local_session(spark, tmp_path):
    """Iceberg timestamptz stores UTC micros: writing under a non-UTC
    session timezone must encode the same instant a UTC session would
    (r6 — the old path wrote session-local-epoch micros, 8h off)."""
    from icegopher_spark.iceberg.avro_io import read_ocf
    from icegopher_spark.iceberg.pyreaders import write_avro_files
    from icegopher_spark.iceberg.types import TimestampTzType

    schema = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "ts", TimestampTzType(), False),
        ),
        schema_id=0,
    )
    rows = [(1, "2024-06-01 12:00:00")]

    def _write(tz: str) -> int:
        old = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", tz)
        try:
            src = spark.createDataFrame(rows, "k long, ts string").select(
                "k", F.col("ts").cast("timestamp").alias("ts")
            )
            paths = write_avro_files(src.coalesce(1), schema, str(tmp_path / tz.replace("/", "_")))
            with open(paths[0], "rb") as fh:
                _s, _m, recs = read_ocf(fh.read())
            return recs[0]["ts"]
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)

    utc = _write("UTC")
    la = _write("America/Los_Angeles")
    # same wall-clock string in LA is 7h LATER as an instant (PDT)
    assert la - utc == 7 * 3600 * 1_000_000

    # and the full round trip under the LA session returns the wall time
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        src = spark.createDataFrame(rows, "k long, ts string").select(
            "k", F.col("ts").cast("timestamp").alias("ts")
        )
        paths = write_avro_files(src.coalesce(1), schema, str(tmp_path / "rt"))
        back = read_avro_files(spark, paths, schema.to_spark())
        got = back.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).first()[0]
        assert got == "2024-06-01 12:00:00"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_avro_partition_values_with_special_chars(spark, tmp_path):
    """Partition values containing '/', '%' or '=' must percent-escape
    in the hive dir (r6): unescaped they corrupt the dir structure and
    the manifest partition value after unquote()."""
    import os

    from urllib.parse import unquote

    from icegopher_spark.iceberg.pyreaders import write_avro_files

    schema = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "tag", StringType(), False),
        ),
        schema_id=0,
    )
    src = spark.createDataFrame(
        [(1, "a/b"), (2, "100%41"), (3, "x=y")], "k long, tag string"
    )
    out = str(tmp_path / "esc")
    paths = write_avro_files(src.repartition("tag"), schema, out, partition_cols=["tag"])
    vals = set()
    for p in paths:
        comp = os.path.basename(os.path.dirname(p))
        assert comp.count("=") == 1  # 'tag=<escaped>' stays one component
        k, v = comp.split("=", 1)
        assert "/" not in v
        vals.add(unquote(v))
    assert vals == {"a/b", "100%41", "x=y"}
    # values survive the read back
    back = {r["k"]: r["tag"] for r in read_avro_files(spark, paths, schema.to_spark()).collect()}
    assert back == {1: "a/b", 2: "100%41", 3: "x=y"}


def test_write_long_refuses_out_of_int64():
    import io

    from icegopher_spark.iceberg.avro_io import write_long

    with pytest.raises(OverflowError):
        write_long(io.BytesIO(), 2**80)
    with pytest.raises(OverflowError):
        write_long(io.BytesIO(), -(2**70))


def test_ocf_rejects_negative_block_header(tmp_path):
    """A corrupted varint that decodes negative must raise, not
    undercount or seek backwards (r6)."""
    import io

    from icegopher_spark.iceberg.avro_io import (
        count_ocf_rows,
        read_ocf,
        write_long,
        write_ocf,
    )

    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    data = write_ocf(schema, [{"x": i} for i in range(10)], codec="null")
    # locate the first block header (right after the header sync) and
    # overwrite n_records with -1
    hdr_end = data.index(b"\x00", data.index(b"avro.codec")) # not robust; recompute below
    # robust: find where read_ocf starts the block = after magic+meta+sync.
    # Reuse the writer: encode the same header and measure its length.
    buf = io.BytesIO(data)
    assert buf.read(4) == b"Obj\x01"
    from icegopher_spark.iceberg.avro_io import read_bytes, read_long

    while True:
        count = read_long(buf)
        if count == 0:
            break
        if count < 0:
            count = -count
            read_long(buf)
        for _ in range(count):
            read_bytes(buf)
            read_bytes(buf)
    buf.read(16)  # sync
    pos = buf.tell()
    neg = io.BytesIO()
    write_long(neg, -1)
    corrupted = data[:pos] + neg.getvalue() + data[pos + 1 :]
    with pytest.raises(ValueError, match="corrupt"):
        read_ocf(corrupted)
    bad = tmp_path / "neg.avro"
    bad.write_bytes(corrupted)
    with pytest.raises(ValueError, match="corrupt"):
        count_ocf_rows(str(bad))


def test_ocf_sync_marker_is_random():
    from icegopher_spark.iceberg.avro_io import write_ocf

    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    a = write_ocf(schema, [{"x": 1}])
    b = write_ocf(schema, [{"x": 1}])
    assert a[-16:] != b"\x00" * 16
    assert a[-16:] != b[-16:]  # fresh marker per file


def test_avro_far_range_temporals_roundtrip(spark, tmp_path):
    """r6: the 9999-12-31 'no expiry' sentinel is outside
    datetime64[ns]'s 2262 bound — pd.to_datetime on the read side and
    pd.Timestamp(...).value on the write side both blew up. Temporal
    coercions must use exact µs/ordinal arithmetic end to end."""
    from datetime import date, datetime

    from icegopher_spark.iceberg.pyreaders import write_avro_data_file
    from icegopher_spark.iceberg.types import DateType, TimestampType

    schema = Schema(
        (
            NestedField(1, "k", LongType(), True),
            NestedField(2, "ts", TimestampType(), False),
            NestedField(3, "d", DateType(), False),
        ),
        schema_id=0,
    )
    far_us = (
        datetime(9999, 12, 31, tzinfo=__import__("datetime").timezone.utc)
        - datetime(1970, 1, 1, tzinfo=__import__("datetime").timezone.utc)
    ) // __import__("datetime").timedelta(microseconds=1)
    far_days = (date(9999, 12, 31) - date(1970, 1, 1)).days
    rows = [
        {"k": 1, "ts": far_us, "d": far_days},
        {"k": 2, "ts": 1_000_000, "d": 1},
        {"k": 3, "ts": None, "d": None},
    ]
    import os

    t = W.create_table(str(tmp_path / "tbl"), schema)
    path = f"{t.location}/data/part-0.avro"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_avro_data_file(path, schema, rows)
    dfile = DataFile(
        file_path=path,
        file_format="AVRO",
        record_count=len(rows),
        file_size_in_bytes=os.path.getsize(path),
        partition={},
    )
    t = W._commit_snapshot(t, [dfile], "append")
    got = {r["k"]: (r["ts"], r["d"]) for r in t.scan().to_df(spark).collect()}
    assert got[1] == (datetime(9999, 12, 31), date(9999, 12, 31))
    assert got[2] == (datetime(1970, 1, 1, 0, 0, 1), date(1970, 1, 2))
    assert got[3] == (None, None)
