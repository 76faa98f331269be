"""Schema-adaptive events loader: the driver has regenerated
events.parquet with different physical ts layouts across rounds
(TIMESTAMP(NANOS) in rounds 1-, timestamp[us] in round 2+), and a
hard-coded layout silently corrupted streaming timestamps by 1000×.
These tests pin the contract: whatever the file stores, batch and
streaming loads agree and `ts` surfaces as TimestampType with the
correct instants."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from icegopher_spark.events_io import events_stream_schema, events_ts_unit, load_events
from icegopher_spark.streaming import pipelines as P

ROWS = [
    (1, 101, "view", datetime.datetime(2024, 3, 1, 12, 0, 0)),
    (2, 101, "purchase", datetime.datetime(2024, 3, 1, 12, 5, 30)),
    (3, 102, "view", datetime.datetime(2024, 3, 2, 8, 30, 15)),
]


def _write(path: str, ts_type: pa.DataType) -> None:
    ids, users, kinds, times = zip(*ROWS)
    if pa.types.is_timestamp(ts_type):
        ts_arr = pa.array(list(times), type=ts_type)
    else:  # raw int64 epoch nanos
        ts_arr = pa.array(
            [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000_000) for t in times],
            type=pa.int64(),
        )
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(kinds, pa.string()),
            "ts": ts_arr,
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "ts_type,unit",
    [
        (pa.timestamp("us"), "us"),
        (pa.timestamp("ns"), "ns"),
        (pa.int64(), "long"),
    ],
    ids=["timestamp_us", "timestamp_ns", "int64_nanos"],
)
def test_batch_load_normalizes_every_layout(spark, tmp_path, ts_type, unit):
    path = str(tmp_path / "events.parquet")
    _write(path, ts_type)
    assert events_ts_unit(path) == unit
    df = load_events(spark, path)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == sorted(t for *_x, t in ROWS)


@pytest.mark.parametrize(
    "ts_type", [pa.timestamp("us"), pa.int64()], ids=["timestamp_us", "int64_nanos"]
)
def test_stream_matches_batch_instants(spark, tmp_path, ts_type):
    """The round-2 corruption mode: a pinned LongType stream schema read
    µs physical values as nanos, compressing all timestamps 1000×. The
    derived stream schema must yield the same instants as batch."""
    path = str(tmp_path / "events.parquet")
    _write(path, ts_type)
    schema, needs_div = events_stream_schema(path)
    assert needs_div == (ts_type == pa.int64())
    stream = P.read_events_stream(spark, path)
    out = P.run_stream_to_table(stream.select("event_id", "ts"), spark)
    got = {r["event_id"]: r["ts"] for r in out.collect()}
    want = {i: t for i, _u, _k, t in ROWS}
    assert got == want


def test_int96_spark_written_events_roundtrip(spark, tmp_path):
    """Spark's default parquet writer stores timestamps as INT96, which
    pyarrow surfaces as timestamp[ns] — the probe must classify it by
    PHYSICAL type ('us': Spark reads INT96 natively) or the loader
    would divide a timestamp column by 1000 (r4 scale-bench failure)."""
    from icegopher_spark.events_io import events_ts_unit, load_events
    from icegopher_spark.queries import load

    src = load(spark, "/root/testdata/sf0.001", "events").limit(100)
    out = str(tmp_path / "events.parquet")
    src.write.parquet(out)
    assert events_ts_unit(out) == "us"
    back = load_events(spark, out)
    assert dict(back.dtypes)["ts"].startswith("timestamp")
    a = sorted(r["ts"] for r in src.select("ts").collect())
    b = sorted(r["ts"] for r in back.select("ts").collect())
    assert a == b


def test_no_parquet_files_raises_clearly(tmp_path):
    """A directory holding only _SUCCESS/metadata (failed or in-progress
    write) must fail the footer probe with a clear message, not an
    ArrowInvalid on the directory path itself (r6 review)."""
    import pytest

    from icegopher_spark.events_io import events_ts_unit

    d = tmp_path / "events.parquet"
    d.mkdir()
    (d / "_SUCCESS").touch()
    with pytest.raises(FileNotFoundError, match="no parquet files"):
        events_ts_unit(str(d))


def test_get_spark_reapplies_runtime_confs(spark):
    """getOrCreate returns a pre-existing session unchanged, so the
    correctness-load-bearing SQL confs (UTC timezone, filter pushdown)
    must be re-applied via conf.set on every get_spark call (r6
    review: a notebook-created local-TZ session would silently skew
    every timestamp gate)."""
    from icegopher_spark.session import get_spark

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    s2 = get_spark("reapply-test")
    assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
    assert s2.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
