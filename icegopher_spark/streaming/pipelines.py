"""Structured Streaming pipelines over the events table: watermarked
tumbling/sliding/session windows, stream dedup, and a custom stateful
operator via applyInPandasWithState.

[S/X] surface (SURVEY.md §2.9): the reference is a batch metadata
library; streaming capability comes from Spark. Each pipeline is a
function from a (streaming) DataFrame to a (streaming) DataFrame, so
the same code runs on any source — Kafka, files landing on S3, or an
Iceberg append stream (incremental snapshot diffs, table.py). Tests and
the correctness gate drive them with the file source + availableNow
trigger, which replays the events table as a bounded stream.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the events table via the parquet file source.

    At production scale the same pipeline reads Kafka or a cloud-files
    source; the file source is the bounded-replay stand-in. The file
    source needs an explicit schema, and the driver's events.parquet has
    shipped ts both as TIMESTAMP(NANOS) and as timestamp[us] across
    builds — so the schema is derived from the file footer
    (events_io.events_stream_schema) instead of pinned, and ts is
    normalized to TimestampType either way. Round 2 pinned LongType
    while the file held µs timestamps: the source silently read µs
    physical values as nanos, compressing every timestamp 1000× and
    corrupting two gate queries — never force a layout the file doesn't
    declare.
    """
    from ..events_io import _enable_nanos_as_long, events_stream_schema

    schema, needs_div = events_stream_schema(sf_dir)
    if needs_div:
        _enable_nanos_as_long(spark)
    path = sf_dir if not sf_dir.endswith(".parquet") else _stage_dir(sf_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if needs_div:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _stage_dir(file_path: str, variant: str = "") -> str:
    """The file streaming source wants a directory; stage a single file
    behind a symlink dir (cached per source path + variant; variants
    keep e.g. a deliberately-duplicated replay isolated from the
    plain one)."""
    import hashlib
    import os

    key = hashlib.md5(f"{file_path}|{variant}".encode()).hexdigest()[:12]
    d = f"/tmp/icegopher_stream/{key}"
    os.makedirs(d, exist_ok=True)
    link = f"{d}/{os.path.basename(file_path)}"
    # lexists + EEXIST tolerance: exists() FOLLOWS the link, so a
    # dangling target or a concurrent stager both crashed symlink()
    # with FileExistsError (r6 review)
    if not os.path.lexists(link):
        try:
            os.symlink(file_path, link)
        except FileExistsError:
            pass  # concurrent stager won the race — same target
    return d


# -- windowed pipelines -----------------------------------------------------


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows with late-data watermark: the streaming
    twin of the batch events_hourly_rollup query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal sum: exact, order-independent (float sums are not)
            F.sum(F.col("value").cast("decimal(14,4)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round("total_value", 2).cast("double").alias("total_value"),
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: gap-based sessionization as a native
    streaming state operator (batch twin: events_sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once by event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


# -- custom stateful operator ----------------------------------------------


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running totals via applyInPandasWithState — the custom
    stateful-operator escape hatch for semantics the built-in windows
    can't express (here: monotone cumulative state per key, emitted
    once per trigger)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total_i long"

    def update(key, pdfs, state: GroupState):
        n, total_i = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # accumulate exact int64 ten-thousandths, not a float sum:
            # values are 4-decimal, so v*10000 is within 1e-6 of an
            # integer and round() recovers it exactly — a float
            # accumulator is arrival-order-dependent and can flip a
            # half-cent rounding boundary vs the oracle (r6 review).
            # dropna first: a NULL value is NaN here and the int64
            # cast raises on non-finite — SUM semantics skip nulls.
            vals = pdf["value"].dropna()
            total_i += int((vals * 10000).round().astype("int64").sum())
        state.update((n, total_i))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total_i / 10000.0]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def custom_sessionizer(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful operator with an
    EVENT-TIME TIMEOUT — the escape hatch for session semantics the
    built-in ``session_window`` can't express (e.g. emitting per-session
    aggregates only when the session CLOSES, with arbitrary per-session
    state).

    Per user: state accumulates (start, last, count); each batch sets
    the timeout to last_ts + gap. When the watermark passes that point
    with no new events, Spark calls the function once more with
    ``state.hasTimedOut`` and the closed session is emitted. Mirrors
    ``session_rollup`` (native session_window) so the two can be
    differentially compared.

    ``watermark`` defaults to the session gap, NOT 0 seconds: with an
    event-time timeout Spark DROPS rows older than the global watermark
    before update() runs, so a 0s watermark under multi-batch replay of
    out-of-time-order files silently lost every event older than the
    previous batch's max — undercounting sessions vs the batch
    sessionizer (r6 review). A gap-sized watermark tolerates exactly
    the disorder the session semantics already absorb."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start long, last long, n long"
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last + gap_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        # interval merge over (stored session + batch events) sorted by
        # start: a cross-batch late event EARLIER than the stored start
        # must extend the session backward (or form its own earlier
        # session) — the old forward-only loop never lowered `start`,
        # so session_start diverged from the native session_window
        # (r8 review wave 6)
        intervals = [(t, t, 1) for t in sorted(ts_us)]
        if state.exists:
            intervals.append(tuple(state.get))
            intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[list[int]] = []
        for st, en, cnt in intervals:
            if merged and st - merged[-1][1] < gap_us:
                merged[-1][1] = max(merged[-1][1], en)
                merged[-1][2] += cnt
            else:
                merged.append([st, en, cnt])
        sessions = [tuple(iv) for iv in merged[:-1]]
        start, last, n = merged[-1]
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _l, _n in sessions],
                    "session_end": [pd.Timestamp(l + gap_us, unit="us") for _s, l, _n in sessions],
                    "n_events": [n for _s, _l, n in sessions],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- execution helper -------------------------------------------------------


def run_stream_to_table(
    sdf: DataFrame,
    spark: SparkSession,
    output_mode: str = "append",
    state_partitions: int = 8,
) -> DataFrame:
    """Run a (bounded) stream to completion with the availableNow
    trigger into an in-memory sink; returns the materialized result.
    This is how the correctness gate replays streaming pipelines
    deterministically.

    ``state_partitions`` sizes the state store (shuffle partitions are
    fixed per streaming query at first start): per-partition
    open/commit overhead dominates at gate data sizes — measured 2×
    going 32→8 on the hourly rollup — while a high-cardinality
    production stream raises it to spread state. The session value is
    restored after the (bounded) run.

    The result is materialized locally and the memory-sink temp view
    dropped before returning: the sink otherwise pins the full result
    set in driver memory for the session's lifetime, one leaked table
    per call (r6 review)."""
    name = f"s{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    sink = spark.table(name)
    # Arrow round-trip, NOT collect()+createDataFrame(rows): Row
    # objects convert timestamps through the driver's OS-local
    # timezone (fromtimestamp/mktime), which collapses DST-ambiguous
    # window boundaries when the OS TZ isn't UTC; Arrow carries exact
    # UTC micros both ways (r6 review)
    tbl = sink.toArrow()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(tbl)


def static_enriched_rollup(
    events: DataFrame,
    dim: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static dimension enrichment: join the event stream to a
    batch dimension table, then aggregate per dimension attribute.

    The classic CDC/enrichment shape Spark executes without stream
    state on the join itself: the static side is (re)planned per
    micro-batch, so a dimension refresh lands on the next batch. The
    broadcast hint keeps the stream side shuffle-free — correct as long
    as the dimension is executor-memory-sized; for a 100 TB fact stream
    the dimension (customers) is still the small side by orders of
    magnitude. Aggregation state is per nation (bounded, tiny).
    """
    joined = events.withWatermark("ts", watermark).join(
        F.broadcast(dim), events.user_id == dim.c_custkey
    )
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(14,4)")), 2)
        .cast("double")
        .alias("total_value"),
    )
