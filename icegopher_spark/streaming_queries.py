"""Streaming queries for the correctness gate: each runs a REAL
Structured Streaming query (file source, availableNow trigger, memory
sink, checkpointed) over the events table and returns the materialized
result; the oracle computes the batch-equivalent answer in SQL. This
checks watermark/window/state semantics, not just DataFrame algebra."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import QUERIES, register
from .streaming import pipelines as P


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.read_events_stream(spark, f"{sf_dir}/events.parquet")


stream_hourly_oracle = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_hourly_rollup",
    stream_hourly_oracle,
    "streaming tumbling-window agg == batch rollup (availableNow replay)",
)
def stream_hourly(spark: SparkSession, sf: str) -> DataFrame:
    # complete mode: the memory sink holds the FINAL state only — under
    # a multi-batch replay, update mode appends one row per (key,
    # trigger) and the sink no longer equals the batch oracle (r6
    # review; single-file replay happens to be one batch today)
    return P.run_stream_to_table(P.hourly_rollup(_events_stream(spark, sf)), spark, "complete")


stream_sliding_oracle = """
SELECT ws AS window_start, event_type, COUNT(*) AS n_events
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws, event_type
  FROM events
) t
GROUP BY 1, 2
"""


@register(
    "stream_sliding_window",
    stream_sliding_oracle,
    "sliding 1h/30m window counts (each event in 2 windows)",
)
def stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    # complete mode: final state only (see stream_hourly)
    return P.run_stream_to_table(P.sliding_counts(_events_stream(spark, sf)), spark, "complete")


stream_dedup_oracle = """
SELECT COUNT(*) AS n_unique, CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM (SELECT DISTINCT event_id FROM events) t
"""


@register(
    "stream_dedup",
    stream_dedup_oracle,
    "dropDuplicatesWithinWatermark over a doubled replay -> distinct set",
)
def stream_dedup_q(spark: SparkSession, sf: str) -> DataFrame:
    # stage the file TWICE (own variant dir) so the stream actually
    # contains duplicates; other streaming queries keep the clean replay
    src = f"{sf}/events.parquet"
    d = P._stage_dir(src, variant="doubled")
    dup = f"{d}/events_dup.parquet"
    # lexists + EEXIST tolerance, same as _stage_dir: exists() follows
    # the link, so a dangling target or a concurrent stager both
    # crashed symlink() with FileExistsError (r6 review)
    if not os.path.lexists(dup):
        try:
            os.symlink(src, dup)
        except FileExistsError:
            pass
    ev = P.read_events_stream(spark, d)
    out = P.run_stream_to_table(P.stream_dedup(ev), spark, "append")
    return out.agg(
        F.count(F.lit(1)).alias("n_unique"), F.sum("event_id").alias("sum_ids")
    )


stream_totals_oracle = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
"""


@register(
    "stream_running_totals",
    stream_totals_oracle,
    "applyInPandasWithState per-user running totals == batch groupBy",
)
def stream_totals(spark: SparkSession, sf: str) -> DataFrame:
    out = P.run_stream_to_table(
        P.running_user_totals(_events_stream(spark, sf)), spark, "update"
    )
    # update mode emits one row per (user, trigger); the FINAL state is
    # the row with the largest n_events (state is monotone), so the
    # argmax makes the gate multi-batch-safe (r6 review) — complete
    # mode isn't available for applyInPandasWithState
    final = out.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.round("s.total_value", 2).cast("double").alias("total_value"),
    )


session_windows_oracle = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
                   OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
-- append-mode emission: only sessions CLOSED by the final watermark
-- (watermark delay 0s ⇒ watermark = max event time) are in the sink
HAVING MAX(ts) + INTERVAL '30 minutes' <= (SELECT MAX(ts) FROM events)
"""


@register(
    "stream_session_windows",
    session_windows_oracle,
    "session_window sessionization (append mode, watermark-closed sessions)",
)
def stream_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle note: Spark session windows are [first_ts, last_ts + gap)
    half-open — an event exactly gap after the previous one starts a NEW
    session (hence >= in the oracle's gap test) — and append mode emits
    exactly the windows whose end <= final watermark."""
    return P.run_stream_to_table(
        P.session_rollup(_events_stream(spark, sf), watermark="0 seconds"), spark, "append"
    )


ss_join_oracle = """
SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
"""


@register(
    "stream_stream_join",
    ss_join_oracle,
    "watermarked stream-stream interval join (view -> purchase within 10min)",
)
def stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events_stream(spark, sf)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    out = P.run_stream_to_table(joined, spark, "append")
    return out.select("view_id", "purchase_id", "user_id")


sink_oracle = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@register(
    "stream_iceberg_sink",
    sink_oracle,
    "streaming foreachBatch -> Iceberg snapshot-per-batch sink, scanned back",
)
def stream_iceberg_sink(spark: SparkSession, sf: str) -> DataFrame:
    """Events replayed as a stream, appended into an Iceberg table
    (exactly-once batch protocol), then answered from a full metadata
    scan of the sink table."""
    t = _sink_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


def _sink_table_for(spark: SparkSession, sf_dir: str):
    from .iceberg import write as W
    from .iceberg.schema import Schema
    from .iceberg.types import DoubleType, LongType, NestedField, StringType
    from .iceberg_queries import _cached_table
    from .streaming.iceberg_sink import write_stream_to_iceberg

    def build(loc: str):
        schema = Schema(
            (
                NestedField(1, "event_id", LongType(), True),
                NestedField(2, "user_id", LongType(), False),
                NestedField(3, "event_type", StringType(), False),
                NestedField(4, "value", DoubleType(), False),
            ),
            schema_id=0,
        )
        t = W.create_table(loc, schema)
        stream = _events_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        )
        import tempfile

        with tempfile.TemporaryDirectory(prefix="sinkckpt_") as ckpt:
            write_stream_to_iceberg(stream, t, ckpt, query_id="gate")
        t.refresh()
        return t

    return _cached_table(
        sf_dir, "events_sink", lambda t: t.current_snapshot() is not None, build
    )


ss_left_join_oracle = """
WITH v AS (
  SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT v.view_id, p.purchase_id, v.user_id
  FROM v JOIN p ON v.user_id = p.user_id
   AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 10 MINUTE
)
SELECT view_id, purchase_id, user_id FROM m
UNION ALL
SELECT v.view_id, CAST(NULL AS BIGINT) AS purchase_id, v.user_id
FROM v
WHERE v.view_id NOT IN (SELECT view_id FROM m)
  -- null emission: the join window [ts, ts+10min] must be fully
  -- closed by the FINAL query watermark. Spark takes the MIN of the
  -- per-input watermarks (each side's max event time - 1h delay), so
  -- the rarer purchase stream, whose max ts lags the view stream's,
  -- sets the cutoff.
  AND v.ts + INTERVAL 10 MINUTE < (
    SELECT LEAST(
      (SELECT MAX(ts) FROM events WHERE event_type = 'view'),
      (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
    ) - INTERVAL 1 HOUR)
"""


@register(
    "stream_stream_left_join",
    ss_left_join_oracle,
    "watermarked stream-stream LEFT OUTER join: matches + watermark-expired nulls",
)
def stream_stream_left_join(spark: SparkSession, sf: str) -> DataFrame:
    """Outer-join state semantics under bounded replay: matched pairs
    emit like the inner join; an unmatched view emits (view_id, NULL)
    only once the watermark passes its join-window upper bound — views
    whose window is still open at end-of-stream stay unemitted, which
    the oracle models with the final-watermark cutoff."""
    ev = _events_stream(spark, sf)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    )
    out = P.run_stream_to_table(joined, spark, "append")
    return out.select("view_id", "purchase_id", "user_id")


ss_full_join_oracle = """
WITH v AS (
  SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT v.view_id, p.purchase_id, v.user_id
  FROM v JOIN p ON v.user_id = p.user_id
   AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 10 MINUTE
), wm AS (
  -- final query watermark: MIN of the per-input watermarks
  SELECT LEAST(
    (SELECT MAX(ts) FROM events WHERE event_type = 'view'),
    (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
  ) - INTERVAL 1 HOUR AS w
)
SELECT view_id, purchase_id, user_id FROM m
UNION ALL
-- unmatched view: emitted once the watermark closes [ts, ts+10min]
SELECT v.view_id, CAST(NULL AS BIGINT) AS purchase_id, v.user_id
FROM v
WHERE v.view_id NOT IN (SELECT view_id FROM m)
  AND v.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)
UNION ALL
-- unmatched purchase: its candidate views lie in [ts-10min, ts), so
-- state expires once the watermark passes ts itself
SELECT CAST(NULL AS BIGINT) AS view_id, p.purchase_id, p.user_id
FROM p
WHERE p.purchase_id NOT IN (SELECT purchase_id FROM m)
  AND p.ts < (SELECT w FROM wm)
"""


@register(
    "stream_stream_full_join",
    ss_full_join_oracle,
    "watermarked stream-stream FULL OUTER join: matches + both-side expired nulls",
)
def stream_stream_full_join(spark: SparkSession, sf: str) -> DataFrame:
    """The remaining stream-join mode (CDC/enrichment): both sides emit
    watermark-expired null rows. A view's join window is (ts, ts+10min]
    forward; a purchase's is [ts-10min, ts) backward — so their state
    expires at watermark > ts+10min and watermark > ts respectively,
    which the oracle models against the final replay watermark."""
    ev = _events_stream(spark, sf)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")),
        "fullOuter",
    )
    out = P.run_stream_to_table(joined, spark, "append")
    return out.select(
        "view_id", "purchase_id", F.coalesce("user_id", "p_user").alias("user_id")
    )


@register(
    "stream_custom_sessionizer",
    session_windows_oracle,
    "applyInPandasWithState + EventTimeTimeout sessionizer == native session windows",
)
def stream_custom_sessionizer(spark: SparkSession, sf: str) -> DataFrame:
    """The custom-stateful-operator escape hatch carrying real session
    semantics: per-user state with an event-time timeout that closes a
    session when the watermark passes last_ts + gap. Same oracle as
    stream_session_windows — the two paths must agree exactly."""
    out = P.run_stream_to_table(
        P.custom_sessionizer(_events_stream(spark, sf), gap_minutes=30, watermark="0 seconds"),
        spark,
        "append",
    )
    return out.select("user_id", "session_start", "session_end", "n_events")


stream_static_oracle = """
SELECT c.c_nationkey AS nationkey, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@register(
    "stream_static_join",
    stream_static_oracle,
    "stream-static dimension enrichment join + per-nation rollup",
)
def stream_static_join_q(spark: SparkSession, sf: str) -> DataFrame:
    """The remaining streaming join mode: a streaming fact joined to a
    batch dimension (re-planned per micro-batch, broadcast, no join
    state), then a stateful per-nation aggregation. Oracle is the plain
    batch join."""
    from .queries import load

    dim = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    # complete mode: final state only (see stream_hourly)
    return P.run_stream_to_table(
        P.static_enriched_rollup(_events_stream(spark, sf), dim), spark, "complete"
    )


ice_stream_src_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_stream_source",
    ice_stream_src_oracle,
    "Iceberg table as a streaming SOURCE (Python DataSource API, snapshot tailing)",
)
def iceberg_stream_source_q(spark: SparkSession, sf: str) -> DataFrame:
    """Tails a 3-append Iceberg table through
    spark.readStream.format('icegopher_appends') (executor-side Arrow
    file reads, offsets = snapshot indices) and aggregates; the oracle
    is the batch aggregate of everything appended — equality proves the
    source replays the full snapshot log exactly once."""
    from pyspark.sql import functions as FF

    from .iceberg import write as W
    from .iceberg.schema import Schema
    from .iceberg.types import DoubleType, LongType, NestedField, StringType
    from .iceberg_queries import _cached_table
    from .streaming.iceberg_source import IcebergAppendStreamSource

    def build(loc: str):
        li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_returnflag"
        )
        sch = Schema(
            (
                NestedField(1, "l_orderkey", LongType(), True),
                NestedField(2, "l_quantity", DoubleType(), False),
                NestedField(3, "l_returnflag", StringType(), False),
            ),
            schema_id=0,
        )
        t = W.create_table(loc, sch)
        for i in range(3):
            t = W.append(t, li.filter(FF.col("l_orderkey") % 3 == i))
        return t

    t = _cached_table(
        sf, "lineitem_stream_src", lambda t: len(t.metadata.snapshots) == 3, build
    )

    spark.dataSource.register(IcebergAppendStreamSource)
    sdf = spark.readStream.format("icegopher_appends").option("location", t.location).load()
    agg = sdf.groupBy("l_returnflag").agg(
        FF.count(FF.lit(1)).alias("n_rows"),
        FF.round(FF.sum(FF.col("l_quantity").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        FF.sum("l_orderkey").alias("sum_okey"),
    )
    # complete mode: the 3-snapshot tail replays as MULTIPLE micro-
    # batches by design; update mode emitted one row per (flag, batch)
    # and only single-batch coincidence kept the old sink equal (the
    # source emits all snapshots in one availableNow batch today)
    return P.run_stream_to_table(agg, spark, "complete")


ice_stream_writer_oracle = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(14,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@register(
    "iceberg_stream_writer",
    ice_stream_writer_oracle,
    "writeStream.format('icegopher'): snapshot-per-microbatch exactly-once sink",
)
def iceberg_stream_writer_q(spark: SparkSession, sf: str) -> DataFrame:
    """The fourth DataSource quadrant: the events stream lands in an
    Iceberg table via writeStream (one snapshot per micro-batch,
    batch-id replay protection in the snapshot summary), and the gate
    aggregates the TABLE — equality with the batch oracle proves the
    sink committed every micro-batch exactly once."""
    import shutil as _sh

    from pyspark.sql import functions as FF

    from .iceberg import write as W
    from .iceberg.dsv2 import IcebergDataSource
    from .iceberg.schema import Schema
    from .iceberg.types import (
        DoubleType,
        LongType,
        NestedField,
        StringType,
        TimestampType,
    )

    spark.dataSource.register(IcebergDataSource)
    # deterministic per-sf workspace, wiped at the start of each run:
    # mkdtemp-per-run accumulated a full events copy in /tmp per gate
    # execution (r6 review). The current run's files must outlive this
    # function (the returned DataFrame is lazy), so cleanup happens at
    # the NEXT run's start — bounding /tmp to one copy.
    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/stream_writer_gate"
    _sh.rmtree(work, ignore_errors=True)
    loc = f"{work}/t"
    sch = Schema(
        (
            NestedField(1, "event_id", LongType(), True),
            NestedField(2, "ts", TimestampType(), False),
            NestedField(3, "user_id", LongType(), False),
            NestedField(4, "event_type", StringType(), False),
            NestedField(5, "value", DoubleType(), False),
        ),
        schema_id=0,
    )
    W.create_table(loc, sch)
    ev = _events_stream(spark, sf).select(
        "event_id",
        FF.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    ckpt = f"{work}/ckpt"
    q = (
        ev.writeStream.format("icegopher")
        .option("location", loc)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from .iceberg.table import Table

    out = (
        Table.from_location(loc)
        .scan()
        .to_df(spark)
        .groupBy("event_type")
        .agg(
            FF.count(FF.lit(1)).alias("n_events"),
            FF.round(FF.sum(FF.col("value").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    return out


# oracle shared with the batch LSH gate: index-only dedup must find the
# SAME exact-Jaccard pair set (recall 1.0 differential gate)
from .queries import jaccard_oracle as _jaccard_oracle  # noqa: E402


@register(
    "stream_minhash_index",
    _jaccard_oracle,
    "streamed MinHash index maintenance -> index-only dedup equals exact Jaccard",
)
def stream_minhash_index_q(spark: SparkSession, sf: str) -> DataFrame:
    """The continuous-ingestion dedup loop end-to-end: documents arrive
    as a STREAM, each micro-batch's banded signatures append to the
    Iceberg index table (idempotent snapshot-per-batch, the
    foreach_batch_appender replay protocol), and near-dup pairs are
    then computed from the INDEX ALONE (no signature recompute;
    operators/dedup.py:minhash_dedup_from_index). Streaming indexing
    skips the corpus-dependent stop-shingle cap (a per-batch doc-freq
    is meaningless; extra candidates only add verify work). Oracle =
    the batch exact-Jaccard pair SQL — equality proves exactly-once
    index maintenance AND candidate recall through the streamed index.
    """
    import shutil as _sh

    from .operators import dedup as _dedup
    from .streaming.iceberg_sink import foreach_batch_appender

    docs_path = f"{sf}/documents.parquet"
    schema = spark.read.parquet(docs_path).schema
    # the parquet STREAM source wants a directory; reuse the cached
    # symlink stager (mkdtemp-per-run leaked a dir per execution, r6)
    stream_dir = P._stage_dir(os.path.abspath(docs_path), variant="minhash")
    sdocs = spark.readStream.schema(schema).parquet(stream_dir)

    # deterministic wiped-per-run workspace (see iceberg_stream_writer_q)
    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/minhash_stream_gate"
    _sh.rmtree(work, ignore_errors=True)
    loc = f"{work}/t"
    t = _dedup.minhash_index_create(loc)
    app = foreach_batch_appender(t, "minhash-index")

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        entries = _dedup.minhash_band_entries(batch_df, max_doc_freq=None).select(
            F.col("band").cast("int").alias("band"), "key", "id"
        )
        app(entries, batch_id)

    ckpt = f"{work}/ckpt"
    q = (
        sdocs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t.refresh()
    docs = spark.read.parquet(docs_path)
    return _dedup.minhash_dedup_from_index(spark, t, docs, threshold=0.5)


# Stream fixture = the cached DV table (one append of the full slice,
# then DV deletes of flag='R' and quantity<5). CDC emissions: every row
# as insert; flag='R' rows as deletes (first DV commit); quantity<5
# rows NOT already deleted (flag<>'R') as deletes (second DV commit —
# replacement supersets must emit only the NEWLY-deleted positions).
cdc_stream_oracle = """
WITH ins AS (
  SELECT 'insert' AS change_type, l_returnflag, l_quantity, l_orderkey FROM lineitem
), del AS (
  SELECT 'delete', l_returnflag, l_quantity, l_orderkey FROM lineitem
  WHERE l_returnflag = 'R'
  UNION ALL
  SELECT 'delete', l_returnflag, l_quantity, l_orderkey FROM lineitem
  WHERE l_quantity < 5 AND l_returnflag <> 'R'
), u AS (SELECT * FROM ins UNION ALL SELECT * FROM del)
SELECT change_type, l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM u GROUP BY change_type, l_returnflag
"""


@register(
    "stream_cdc_changelog",
    cdc_stream_oracle,
    "CDC streaming source over a DV table: inserts + newly-deleted "
    "rows per snapshot, exactly once (replacement DVs must emit only "
    "the delta)",
)
def stream_cdc_q(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level CDC as a STREAM: `readStream.format("icegopher_cdc")`
    tails the DV fixture table and emits inserts plus per-snapshot
    newly-deleted rows (streaming/iceberg_cdc_source.py); the oracle
    recomputes the exact change set from the fixture's construction.
    A second DV delete supersedes the first file-by-file, so emitting
    a replacement bitmap wholesale (instead of its delta vs the prior
    state) double-counts flag='R' rows and fails the hash."""
    import shutil as _sh

    from .iceberg_queries import _dv_table_for
    from .streaming.iceberg_cdc_source import IcebergCdcStreamSource

    t = _dv_table_for(spark, sf)
    spark.dataSource.register(IcebergCdcStreamSource)

    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/cdc_stream_gate"
    _sh.rmtree(work, ignore_errors=True)
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", t.location)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy(F.col("_change_type").alias("change_type"), "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


@register(
    "stream_cdc_mv",
    # the MV maintained from the CDC stream must equal the TABLE's
    # final state (same oracle shape as iceberg_dv_delete): inserts
    # minus both DV deletes, never recomputed from a table scan
    """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_returnflag <> 'R' AND l_quantity >= 5
GROUP BY l_returnflag
""",
    "incremental materialized view maintained by folding the CDC "
    "stream's inserts/deletes — never a table rescan",
)
def stream_cdc_mv_q(spark: SparkSession, sf: str) -> DataFrame:
    """The full CDC loop: `icegopher_cdc` streams row-level changes off
    the DV fixture table and each micro-batch folds into a persisted
    COUNT/SUM aggregate via changelog.apply_changes_to_aggregate
    (+1/-1 signed folds in DECIMAL) — the MV's final state must equal
    the table's, proving insert/delete deltas are exactly-once and
    complete. Cost per refresh is O(changed rows), never a rescan."""
    import shutil as _sh

    from pyspark.sql import types as T

    from .iceberg.changelog import apply_changes_to_aggregate
    from .iceberg_queries import _dv_table_for
    from .streaming.iceberg_cdc_source import IcebergCdcStreamSource

    t = _dv_table_for(spark, sf)
    spark.dataSource.register(IcebergCdcStreamSource)

    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/cdc_mv_gate"
    _sh.rmtree(work, ignore_errors=True)
    state = f"{work}/mv"
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("l_returnflag", T.StringType()),
                T.StructField("n_rows", T.LongType()),
                T.StructField("qty_sum", T.DecimalType(38, 4)),
            ]
        ),
    )
    empty.write.mode("overwrite").parquet(state)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mv = spark.read.parquet(state)
        new = apply_changes_to_aggregate(
            mv,
            batch_df,
            keys=["l_returnflag"],
            count_col="n_rows",
            sum_specs={"qty_sum": "l_quantity"},
        )
        # state swap via a staging dir: overwriting the parquet we are
        # lazily reading from would truncate our own input mid-job
        new.write.mode("overwrite").parquet(f"{work}/stage")
        _sh.rmtree(state)
        _sh.move(f"{work}/stage", state)

    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", t.location)
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state).select(
        "l_returnflag",
        "n_rows",
        F.round(F.col("qty_sum"), 2).cast("double").alias("sum_qty"),
    )


# Post-migration change set only (the stream is anchored at the
# migration snapshot): the DV delete removes every live flag='R' row —
# live state at the anchor is the full corpus each row exactly once
# (eq-deleted okey%10==4 rows were re-inserted verbatim) — and the
# final append re-inserts every quantity<5 row.
cdc_after_eq_oracle = """
WITH del AS (
  SELECT 'delete' AS change_type, l_returnflag, l_quantity, l_orderkey
  FROM lineitem WHERE l_returnflag = 'R'
), ins AS (
  SELECT 'insert', l_returnflag, l_quantity, l_orderkey
  FROM lineitem WHERE l_quantity < 5
), u AS (SELECT * FROM del UNION ALL SELECT * FROM ins)
SELECT change_type, l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM u GROUP BY change_type, l_returnflag
"""


@register(
    "stream_cdc_after_eq_migrate",
    cdc_after_eq_oracle,
    "CDC stream over a table whose lineage carries an equality-delete "
    "snapshot: rewrite_equality_deletes + a fresh checkpoint anchored "
    "at the migration streams post-migration changes exactly (the "
    "documented workaround, composed end-to-end)",
)
def stream_cdc_after_eq_migrate_q(spark: SparkSession, sf: str) -> DataFrame:
    """The migrate-then-stream composition (r7 verdict #2): the fixture
    table's main lineage still contains the poison equality-delete
    snapshot — an unanchored fresh checkpoint would replay history into
    it and refuse (pinned in tests/test_streaming.py) — so the stream
    starts with option starting-snapshot-id = the migration commit (the
    CDC bootstrap pattern: batch-read state at the anchor, stream
    changes after it). Post-anchor changes are a replacement-DV delete
    whose delta must subtract the MIGRATION's DVs as prior state, and a
    plain append (streaming/iceberg_cdc_source.py,
    iceberg_queries._eqstream_table_for)."""
    import shutil as _sh

    from .iceberg_queries import _eqstream_table_for, eq_migration_snapshot_id
    from .streaming.iceberg_cdc_source import IcebergCdcStreamSource

    t = _eqstream_table_for(spark, sf)
    spark.dataSource.register(IcebergCdcStreamSource)

    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/cdc_eq_stream_gate"
    _sh.rmtree(work, ignore_errors=True)
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", t.location)
        .option("starting-snapshot-id", str(eq_migration_snapshot_id(t)))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy(F.col("_change_type").alias("change_type"), "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


# Expected pairing for the CoW update fixture (iceberg_queries.
# _cow_update_table_for): snapshot 1 inserts every row; snapshot 2 is
# a copy-on-write UPDATE (qty += 100 where flag='R') whose carryover
# delete+insert pairs must VANISH and whose changed rows must pair
# into update_preimage (old qty) / update_postimage (new qty).
cdc_updates_oracle = """
WITH ins AS (
  SELECT 'insert' AS change_type, l_returnflag, l_quantity, l_orderkey
  FROM lineitem
), pre AS (
  SELECT 'update_preimage', l_returnflag, l_quantity, l_orderkey
  FROM lineitem WHERE l_returnflag = 'R'
), post AS (
  SELECT 'update_postimage', l_returnflag, l_quantity + 100, l_orderkey
  FROM lineitem WHERE l_returnflag = 'R'
), u AS (
  SELECT * FROM ins UNION ALL SELECT * FROM pre UNION ALL SELECT * FROM post
)
SELECT change_type, l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM u GROUP BY change_type, l_returnflag
"""


@register(
    "stream_cdc_updates",
    cdc_updates_oracle,
    "CDC stream with identifier-field UPDATE pairing: per-commit "
    "delete+insert rows fold into update_preimage/update_postimage "
    "and copy-on-write carryover pairs vanish (changelog.pair_updates "
    "inside foreachBatch)",
)
def stream_cdc_updates_q(spark: SparkSession, sf: str) -> DataFrame:
    """UPDATE_BEFORE/AFTER on the STREAM face (r8 verdict #7, upstream
    Iceberg's changelog.identifier-fields): the CDC stream emits raw
    insert+delete rows; each micro-batch folds them through
    changelog.pair_updates keyed on (l_orderkey, l_shipdate) — valid
    because stream offsets are whole snapshots, so a commit is never
    split across batches. Carryover rows of the CoW rewrite (identical
    pre/post) must produce NOTHING; real updates must pair. The oracle
    recomputes all three change classes from the fixture's
    construction."""
    import shutil as _sh

    from .iceberg.changelog import pair_updates
    from .iceberg_queries import _cow_update_table_for
    from .streaming.iceberg_cdc_source import IcebergCdcStreamSource

    t = _cow_update_table_for(spark, sf)
    spark.dataSource.register(IcebergCdcStreamSource)

    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/cdc_updates_gate"
    _sh.rmtree(work, ignore_errors=True)
    out, ckpt = f"{work}/out", f"{work}/ckpt"

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # io_only (r13, guide §1.2): the CDC source emits ONLY
        # insert/delete rows (iceberg_cdc_source._read_cdc_partition),
        # so pair_updates skips its passthrough subtree and consumes
        # the batch through ONE chain — the Python CDC source scan runs
        # exactly once per batch and the localCheckpoint that existed
        # to stop the two-subtree double scan (an extra full
        # write+read of the batch) is gone.
        pair_updates(
            batch_df, ["l_orderkey", "l_shipdate"], io_only=True
        ).write.mode("append").parquet(out)

    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", t.location)
        .load()
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy(F.col("_change_type").alias("change_type"), "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


@register(
    "stream_scd2_history",
    # the BATCH gate's oracle verbatim: the stream face must produce
    # the identical SCD2 history — stream/batch parity is the point.
    # Lazy thunk, NOT a module-scope import: iceberg_queries also
    # imports this package, so an eager __import__ here explodes when
    # iceberg_queries is imported first (r9 verdict task #1).
    lambda: __import__(
        "icegopher_spark.iceberg_queries", fromlist=["cdc_scd2_oracle"]
    ).cdc_scd2_oracle,
    "SCD2 dimension history maintained from the CDC STREAM: replayed "
    "insert+CoW-update+CoW-delete commits fold through pair_updates + "
    "scd2_from_changelog into the same history the batch changelog "
    "produces",
)
def stream_scd2_history_q(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-face SCD2 (closes the CDC family loop): a fresh
    icegopher_cdc checkpoint replays the orders fixture's full history
    — append, copy-on-write UPDATE, copy-on-write DELETE — the raw
    insert+delete rows accumulate per micro-batch, then fold through
    the same pair_updates -> scd2_from_changelog pipeline as the batch
    gate and must hash-match its oracle exactly. Exercises the CDC
    source's CoW-delete emission (removed-file live rows) that
    stream_cdc_updates' fixture lacks."""
    import shutil as _sh

    from .iceberg.changelog import pair_updates, scd2_from_changelog
    from .iceberg_queries import _scd2_table_for
    from .streaming.iceberg_cdc_source import IcebergCdcStreamSource

    t = _scd2_table_for(spark, sf)
    spark.dataSource.register(IcebergCdcStreamSource)

    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/scd2_stream_gate"
    _sh.rmtree(work, ignore_errors=True)
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    q = (
        spark.readStream.format("icegopher_cdc")
        .option("location", t.location)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    changes = spark.read.parquet(out)
    # one linear chain, no materialization (r13): the raw CDC parquet
    # holds only insert/delete rows (io_only skips the passthrough
    # subtree) and scd2_from_changelog now consumes the paired frame
    # once (single conditional projection instead of opens∪closes)
    paired = pair_updates(changes, ["o_orderkey"], io_only=True)
    scd2 = scd2_from_changelog(paired, ["o_orderkey"])
    seq_map = spark.createDataFrame(
        [(s.snapshot_id, s.sequence_number) for s in t.metadata.snapshots],
        "snap_id long, seq long",
    )
    return (
        scd2.join(F.broadcast(seq_map), scd2["valid_from"] == seq_map["snap_id"], "left")
        .drop("valid_from", "snap_id")
        .withColumnRenamed("seq", "valid_from")
        .join(
            F.broadcast(seq_map.withColumnRenamed("seq", "seq_to")),
            scd2["valid_to"] == seq_map["snap_id"],
            "left",
        )
        .drop("valid_to", "snap_id")
        .withColumnRenamed("seq_to", "valid_to")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("valid_from").cast("bigint").alias("valid_from"),
            F.col("valid_to").cast("bigint").alias("valid_to"),
            "is_current",
        )
    )


# ------------------------------------------------ Delta stream source (r9)

stream_delta_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "stream_delta_source",
    stream_delta_oracle,
    "Delta log tailed as a stream: per-commit adds, change commits skipped",
)
def stream_delta_source_q(spark: SparkSession, sf: str) -> DataFrame:
    """Tail the hand-authored Delta fixture from version 0 with
    skip-change-commits: the stream emits every commit's ADDS (v0+v1+v3
    = the full orders table, since the append view never retracts) and
    skips the v2 DELETE commit — per-commit attribution straight from
    the JSON log. Partition values come back as constant Arrow columns
    on the executor."""
    import shutil as _sh

    from .delta_queries import delta_fixture_path
    from .streaming.delta_source import DeltaAppendStreamSource

    spark.dataSource.register(DeltaAppendStreamSource)
    loc = delta_fixture_path(sf)
    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/delta_stream_gate"
    _sh.rmtree(work, ignore_errors=True)
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    q = (
        spark.readStream.format("icegopher_delta_stream")
        .option("location", loc)
        .option("starting-version", "0")
        .option("skip-change-commits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    df = spark.read.parquet(out)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@register(
    "stream_delta_cdf",
    None,  # replaced right below with the batch CDF oracle
    "Delta CDF as a stream: per-commit inserts + recovered deletes",
)
def stream_delta_cdf_q(spark: SparkSession, sf: str) -> DataFrame:
    """The CDF stream must fold to exactly the batch read_changes
    result (stream/batch parity, same contract as the Iceberg CDC
    pair stream_cdc_changelog / iceberg_changelog)."""
    import shutil as _sh

    from .delta_queries import delta_fixture_path
    from .streaming.delta_source import DeltaAppendStreamSource

    spark.dataSource.register(DeltaAppendStreamSource)
    loc = delta_fixture_path(sf)
    key = sf.strip("/").replace("/", "_")
    work = f"/tmp/icegopher_tables/{key}/delta_cdf_stream_gate"
    _sh.rmtree(work, ignore_errors=True)
    out, ckpt = f"{work}/out", f"{work}/ckpt"
    q = (
        spark.readStream.format("icegopher_delta_stream")
        .option("location", loc)
        .option("starting-version", "0")
        .option("read-change-feed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    df = spark.read.parquet(out)
    return df.groupBy("_change_type", "_commit_version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# stream/batch parity: the batch CDF oracle is attached by
# delta_queries.py at import time (importing it here would be circular
# — queries.py imports this module before delta_queries)


@register(
    "stream_delta_sink",
    sink_oracle,  # the Iceberg sink gate's oracle verbatim: same input
    "streaming foreachBatch -> Delta commit-per-batch sink with txn "
    "exactly-once identifiers, read back via the Delta reader",
)
def stream_delta_sink(spark: SparkSession, sf: str) -> DataFrame:
    """Events replayed as a stream, appended into a DELTA table — one
    commit per micro-batch carrying a txn (appId, batch) identifier —
    then answered from the independent Delta reader.  Sink/sink parity:
    this gate and stream_iceberg_sink share one oracle, so both
    exactly-once protocols are adjudicated against the same truth."""
    import os as _os
    import shutil as _sh
    import tempfile as _tmp

    from .delta import read_delta
    from .delta_queries import _CACHE_ROOT
    from .delta_write import create_delta_table
    from .streaming.delta_sink import write_stream_to_delta

    key = sf.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/events_delta_sink"
    ok = _os.path.join(loc, "_FIXTURE_OK")
    marker = "delta-sink@v1"
    rebuild = True
    if _os.path.exists(ok):
        try:
            with open(ok) as f:
                rebuild = f.read().strip() != marker
        except OSError:
            rebuild = True
    if rebuild:
        _sh.rmtree(loc, ignore_errors=True)
        stream = _events_stream(spark, sf).select(
            "event_id", "user_id", "event_type", "value"
        )
        create_delta_table(loc, stream.schema)
        with _tmp.TemporaryDirectory(prefix="deltasinkckpt_") as ckpt:
            write_stream_to_delta(stream, loc, ckpt, query_id="gate")
        with open(ok, "w") as f:
            f.write(marker + "\n")
    return (
        read_delta(spark, loc)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
