"""Iceberg-plane queries for the driver's correctness gate: each one
builds (once, cached per sf_dir) a real partitioned Iceberg table from
the synthetic lineitem data, then answers through the full metadata
path — snapshot resolution, manifest pruning, stats pruning, Spark
hand-off — so the gate hash-checks the engine end to end, not just the
DataFrame layer. Oracles run the equivalent SQL on the raw parquet."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .iceberg import expressions as E
from .iceberg import write as W
from .iceberg.schema import Schema
from .iceberg.table import Table
from .iceberg.transforms import PartitionField, PartitionSpec, parse_transform
from .iceberg.types import DoubleType, LongType, NestedField, StringType, TimestampType
from .queries import register

_CACHE_ROOT = "/tmp/icegopher_tables"

_SCHEMA = Schema(
    (
        NestedField(1, "l_orderkey", LongType(), True),
        NestedField(2, "l_quantity", DoubleType(), False),
        NestedField(3, "l_returnflag", StringType(), False),
        NestedField(4, "l_shipdate", TimestampType(), False),
    ),
    schema_id=0,
)
_SPEC = PartitionSpec(
    [
        PartitionField(3, 1000, "flag", parse_transform("identity")),
        PartitionField(1, 1001, "okb", parse_transform("bucket[4]")),
    ]
)


def _li4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared 4-column lineitem projection every fixture builds from."""
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
        F.col("l_shipdate").cast("timestamp_ntz").alias("l_shipdate"),
    )


def _cached_table(sf_dir: str, suffix: str, is_valid, build) -> Table:
    """Build-or-load a /tmp-cached fixture table.

    `is_valid` must reject every PARTIALLY-built state, not just corrupt
    metadata: the builders commit in steps, and a crash mid-build leaves
    a perfectly loadable table that would otherwise poison the cache on
    every later run (two such holes found in r6 review: expire's
    1-snapshot check matched the pre-overwrite state, specevo's 2-spec
    check matched the pre-second-append state). Each builder therefore
    pins its FULL commit sequence. Invalid or unreadable caches are
    wiped and rebuilt — the gate self-heals instead of staying red."""
    key = sf_dir.strip("/").replace("/", "_")
    loc = f"{_CACHE_ROOT}/{key}/{suffix}"
    if os.path.exists(f"{loc}/metadata/version-hint.text"):
        try:
            t = Table.from_location(loc)
            if is_valid(t):
                return t
        except Exception:  # noqa: BLE001 — stale/corrupt cache
            pass
    shutil.rmtree(loc, ignore_errors=True)
    return build(loc)


def _table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Two appends (even/odd orderkeys) so time travel has a meaningful
    first snapshot. Commit timestamps are forced DISTINCT: with both
    appends in one millisecond, timestamp-as-of(first.ts) correctly
    resolves to the SECOND snapshot (latest with ts <= given) and the
    as-of gate's even-keys expectation flips (r6 review)."""

    def build(loc: str) -> Table:
        import time

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        ts1 = t.metadata.snapshots[-1].timestamp_ms
        while int(time.time() * 1000) <= ts1:
            time.sleep(0.001)
        return W.append(t, li.filter(F.col("l_orderkey") % 2 == 1))

    return _cached_table(
        sf_dir,
        "lineitem_ice",
        lambda t: len(t.metadata.snapshots) == 2
        and t.metadata.snapshots[0].timestamp_ms
        < t.metadata.snapshots[1].timestamp_ms,
        build,
    )


ice_pruned_oracle = """
SELECT l_returnflag,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity < 10
GROUP BY l_returnflag
"""


@register(
    "iceberg_scan_pruned",
    ice_pruned_oracle,
    "partition+stats-pruned Iceberg scan -> agg (manifest pruning end-to-end)",
)
def iceberg_scan_pruned(spark: SparkSession, sf: str) -> DataFrame:
    t = _table_for(spark, sf)
    scan = t.scan(
        row_filter=E.equal_to("l_returnflag", "R") & E.less_than("l_quantity", 10)
    )
    return (
        scan.to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ice_tt_oracle = """
SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem WHERE l_orderkey % 2 = 0
"""


@register(
    "iceberg_time_travel",
    ice_tt_oracle,
    "snapshot-id time travel reads exactly the first append",
)
def iceberg_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    t = _table_for(spark, sf)
    first = t.metadata.snapshots[0]
    df = t.scan(snapshot_id=first.snapshot_id).to_df(spark)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey")
    )


ice_bucket_oracle = """
SELECT l_orderkey, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
FROM lineitem WHERE l_orderkey IN (1, 500, 1234)
GROUP BY l_orderkey
"""


@register(
    "iceberg_bucket_point_lookup",
    ice_bucket_oracle,
    "IN-list point lookup through bucket-transform pruning",
)
def iceberg_bucket_lookup(spark: SparkSession, sf: str) -> DataFrame:
    t = _table_for(spark, sf)
    scan = t.scan(row_filter=E.is_in("l_orderkey", 1, 500, 1234))
    return (
        scan.to_df(spark)
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("qty")
        )
    )


ice_inc_oracle = """
SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem WHERE l_orderkey % 2 = 1
"""


@register(
    "iceberg_incremental_scan",
    ice_inc_oracle,
    "snapshot-diff incremental read: files ADDED between snapshots 1->2",
)
def iceberg_incremental(spark: SparkSession, sf: str) -> DataFrame:
    t = _table_for(spark, sf)
    s1, s2 = (s.snapshot_id for s in t.metadata.snapshots[:2])
    df = t.scan().incremental_to_df(spark, s1, s2)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey")
    )


ice_mor_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_returnflag <> 'R'
GROUP BY l_returnflag
"""


@register(
    "iceberg_mor_delete",
    ice_mor_oracle,
    "merge-on-read positional deletes applied as left-anti join on (file,pos)",
)
def iceberg_mor(spark: SparkSession, sf: str) -> DataFrame:
    t = _mor_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
    )


def _mor_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """lineitem table with a merge-on-read delete of flag='R' applied.
    Two commit steps of one snapshot each, so snapshot count == 2 pins
    the complete build."""

    def build(loc: str) -> Table:
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, _li4(spark, sf_dir))
        return W.delete_where_mor(t, spark, E.equal_to("l_returnflag", "R"))

    return _cached_table(
        sf_dir, "lineitem_mor", lambda t: len(t.metadata.snapshots) == 2, build
    )


ice_dv_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_returnflag <> 'R' AND l_quantity >= 5
GROUP BY l_returnflag
"""


@register(
    "iceberg_dv_delete",
    ice_dv_oracle,
    "V3 deletion vectors: two MOR deletes -> one roaring-bitmap DV per "
    "file (replacement union), applied as a per-file position mask",
)
def iceberg_dv(spark: SparkSession, sf: str) -> DataFrame:
    t = _dv_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
    )


def _dv_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """lineitem table with TWO deletion-vector deletes (flag='R', then
    l_quantity<5): the second supersedes the first file-by-file, so the
    read path exercises replacement DVs, not just fresh ones. Three
    commit steps -> snapshot count == 3 pins the complete build."""

    def build(loc: str) -> Table:
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, _li4(spark, sf_dir))
        t = W.delete_where_dv(t, spark, E.equal_to("l_returnflag", "R"))
        return W.delete_where_dv(t, spark, E.less_than("l_quantity", 5.0))

    def valid(t: Table) -> bool:
        if len(t.metadata.snapshots) != 3:
            return False
        # r8: DV entries must carry their referenced file's partition
        # (spec partition-scoped delete pruning) — caches written by
        # the pre-stamping writer rebuild
        from .iceberg.manifests import (
            DataFileContent,
            ManifestContent,
            fetch_entries,
            read_manifest_list,
        )

        for m in read_manifest_list(t.io.read(t.current_snapshot().manifest_list)):
            if m.content != ManifestContent.DELETES:
                continue
            for e in fetch_entries(m, t.io.read(m.manifest_path), True):
                if e.data_file.content == DataFileContent.POSITION_DELETES:
                    # pre-stamping caches decode as all-None values
                    return any(
                        v is not None
                        for v in (e.data_file.partition or {}).values()
                    )
        return False

    return _cached_table(sf_dir, "lineitem_dv", valid, build)


# V3 row lineage: the table is built so every _row_id is derivable in
# pure SQL — two single-file appends each sorted by o_orderkey, so
# _row_id = (position within the sorted even/odd slice), with the odd
# slice offset by the even count; _last_updated_sequence_number is the
# append's data sequence (1 or 2). The DV delete (seq 3) and the
# lineage-preserving compaction (seq 4) must leave both untouched.
ice_lineage_oracle = """
WITH evens AS (
  SELECT o_orderkey, o_orderstatus,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid,
         CAST(1 AS BIGINT) AS lseq
  FROM orders WHERE o_orderkey % 2 = 0
), odds AS (
  SELECT o_orderkey, o_orderstatus,
         (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0)
           + ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid,
         CAST(2 AS BIGINT) AS lseq
  FROM orders WHERE o_orderkey % 2 = 1
), ranked AS (
  SELECT * FROM evens UNION ALL SELECT * FROM odds
)
SELECT lseq, COUNT(*) AS n_rows,
       CAST(SUM(rid) AS BIGINT) AS sum_rid,
       CAST(MIN(rid) AS BIGINT) AS min_rid,
       CAST(MAX(rid) AS BIGINT) AS max_rid,
       CAST(SUM(rid * (o_orderkey % 1000)) AS BIGINT) AS rid_okey_chk
FROM ranked WHERE o_orderstatus <> 'F'
GROUP BY lseq
"""


@register(
    "iceberg_row_lineage",
    ice_lineage_oracle,
    "V3 row lineage: first-row-id assignment across two appends, "
    "stability through a DV delete and a lineage-preserving compaction; "
    "rid_okey_chk binds each _row_id to its row, not just the id set",
)
def iceberg_row_lineage(spark: SparkSession, sf: str) -> DataFrame:
    t = _lineage_table_for(spark, sf)
    df = t.scan(with_lineage=True).to_df(spark)
    return df.groupBy(
        F.col("_last_updated_sequence_number").alias("lseq")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_row_id").cast("long").alias("sum_rid"),
        F.min("_row_id").alias("min_rid"),
        F.max("_row_id").alias("max_rid"),
        F.sum(F.col("_row_id") * (F.col("o_orderkey") % 1000))
        .cast("long")
        .alias("rid_okey_chk"),
    )


_ORDERS_SCHEMA = Schema(
    (
        NestedField(1, "o_orderkey", LongType(), True),
        NestedField(2, "o_orderstatus", StringType(), False),
        NestedField(3, "o_totalprice", DoubleType(), False),
    ),
    schema_id=0,
)


def _lineage_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """v3 orders table with deterministic row positions: each append is
    repartition(1) + sortWithinPartitions(o_orderkey) -> exactly one
    file in known row order, so _row_id is oracle-derivable. Then a DV
    delete and a full compaction, neither of which may move an id.
    Validation pins the complete 4-commit sequence ending in replace."""
    from .iceberg.maintenance import compact_data_files

    def build(loc: str) -> Table:
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = W.create_table(loc, _ORDERS_SCHEMA, format_version=3)
        for par in (0, 1):
            t = W.append(
                t,
                od.filter(F.col("o_orderkey") % 2 == par)
                .repartition(1)
                .sortWithinPartitions("o_orderkey"),
            )
        t = W.delete_where_dv(t, spark, E.equal_to("o_orderstatus", "F"))
        return compact_data_files(t, spark, target_file_size=1 << 30)

    return _cached_table(
        sf_dir,
        "orders_lineage",
        lambda t: t.metadata.format_version == 3
        and len(t.metadata.snapshots) == 4
        and t.current_snapshot().operation == "replace",
        build,
    )


# V3 default values: rows from files that predate the added columns
# read the initial-defaults ('legacy' / 0.25); post-evolution rows carry
# explicit values. 0.25 and qty*0.5 are binary-exact, so the decimal
# casts agree bit-for-bit across engines.
# Partition statistics file: per-partition record counts persisted at
# metadata/ and registered under partition-statistics; the day
# transform is SQL-derivable so the oracle recomputes every partition's
# count from the raw rows.
ice_pstats_oracle = """
SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS day,
       COUNT(*) AS record_count
FROM lineitem
GROUP BY 1
"""


@register(
    "iceberg_partition_stats",
    ice_pstats_oracle,
    "persisted partition-statistics file (spec): manifest-aggregated "
    "per-partition counts round-tripped through parquet + metadata",
)
def iceberg_partition_stats(spark: SparkSession, sf: str) -> DataFrame:
    from .iceberg.partition_stats import read_partition_stats

    t = _daypart_table_for(spark, sf)
    return read_partition_stats(t, spark).select(
        # dates hash-mismatch between engines (python date vs pandas
        # datetime64) — cast BOTH sides to timestamp
        F.col("partition.ship_day").cast("timestamp_ntz").alias("day"),
        F.col("data_record_count").alias("record_count"),
    )


def _daypart_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """day(l_shipdate)-partitioned lineitem with computed partition
    statistics; validation requires the registration to exist AND point
    at the current snapshot (a crash between append and compute leaves
    a loadable-but-unregistered table)."""
    from .iceberg.partition_stats import compute_partition_stats

    spec = PartitionSpec(
        [PartitionField(4, 1000, "ship_day", parse_transform("day"))]
    )

    def build(loc: str) -> Table:
        t = W.create_table(loc, _SCHEMA, spec)
        t = W.append(t, _li4(spark, sf_dir))
        return compute_partition_stats(t)

    def valid(t: Table) -> bool:
        snap = t.current_snapshot()
        return (
            snap is not None
            and len(t.metadata.snapshots) == 1
            and any(
                e.get("snapshot-id") == snap.snapshot_id
                for e in t.metadata.partition_statistics
            )
        )

    return _cached_table(sf_dir, "lineitem_daypart_stats", valid, build)


# Lineage CDC: diff the table between the first append and HEAD, keyed
# on _row_id. Relative to snapshot 1 (evens only): odd non-F rows are
# inserts (P rows already carrying the updated price), even F rows are
# deletes, even P rows are update pre/post pairs; rows compaction or
# CoW carried over must NOT appear. int_price_chk counts only
# integral-valued prices (exact in both engines): original cents-valued
# prices mostly drop out, the okey*2 updates always count.
ice_cdc_oracle = """
WITH evens AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
  FROM orders WHERE o_orderkey % 2 = 0
), odds AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0)
           + ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
  FROM orders WHERE o_orderkey % 2 = 1
), ranked AS (
  SELECT * FROM evens UNION ALL SELECT * FROM odds
), changes AS (
  SELECT 'insert' AS change_type, rid, o_orderkey,
         CASE WHEN o_orderstatus = 'P'
              THEN CAST(o_orderkey * 2 AS DOUBLE) ELSE o_totalprice END AS price
  FROM ranked WHERE o_orderkey % 2 = 1 AND o_orderstatus <> 'F'
  UNION ALL
  SELECT 'delete', rid, o_orderkey, o_totalprice
  FROM ranked WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'F'
  UNION ALL
  SELECT 'update_preimage', rid, o_orderkey, o_totalprice
  FROM ranked WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'P'
  UNION ALL
  SELECT 'update_postimage', rid, o_orderkey, CAST(o_orderkey * 2 AS DOUBLE)
  FROM ranked WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'P'
)
SELECT change_type, COUNT(*) AS n_rows,
       CAST(SUM(rid) AS BIGINT) AS sum_rid,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey,
       CAST(SUM(CASE WHEN price = FLOOR(price)
                     THEN CAST(price AS BIGINT) ELSE 0 END) AS BIGINT)
         AS int_price_chk
FROM changes
GROUP BY change_type
"""


@register(
    "iceberg_lineage_changelog",
    ice_cdc_oracle,
    "V3 lineage CDC: changelog_by_lineage emits insert/delete/update "
    "pre+post pairs keyed on _row_id; carryover rewrites emit nothing",
)
def iceberg_lineage_changelog(spark: SparkSession, sf: str) -> DataFrame:
    from .iceberg.changelog import changelog_by_lineage

    t = _cdc_table_for(spark, sf)
    first = min(t.metadata.snapshots, key=lambda s: s.sequence_number)
    df = changelog_by_lineage(t, spark, first.snapshot_id)
    return df.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_row_id").cast("long").alias("sum_rid"),
        F.sum("o_orderkey").cast("long").alias("sum_okey"),
        F.sum(
            F.when(
                F.col("o_totalprice") == F.floor("o_totalprice"),
                F.col("o_totalprice").cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("int_price_chk"),
    )


def _cdc_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """v3 orders table with deterministic row ids (sorted single-file
    appends), then a CoW update (P rows: price -> okey*2, _row_id kept,
    seq bumped) and a DV delete (F rows). 4-commit sequence pinned."""

    def build(loc: str) -> Table:
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = W.create_table(loc, _ORDERS_SCHEMA, format_version=3)
        for par in (0, 1):
            t = W.append(
                t,
                od.filter(F.col("o_orderkey") % 2 == par)
                .repartition(1)
                .sortWithinPartitions("o_orderkey"),
            )
        t = W.update_where(
            t,
            spark,
            E.equal_to("o_orderstatus", "P"),
            {"o_totalprice": F.col("o_orderkey") * 2},
        )
        return W.delete_where_dv(t, spark, E.equal_to("o_orderstatus", "F"))

    return _cached_table(
        sf_dir,
        "orders_cdc",
        lambda t: t.metadata.format_version == 3
        and len(t.metadata.snapshots) == 4
        and [s.operation for s in t.metadata.snapshots][-2:] == ["overwrite", "delete"],
        build,
    )


ice_default_oracle = """
SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'legacy' ELSE 'new' END AS tag,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(CASE WHEN l_orderkey % 2 = 0 THEN 0.25
                                ELSE l_quantity * 0.5 END AS DECIMAL(18,4))), 4)
            AS DOUBLE) AS sum_adj
FROM lineitem
GROUP BY 1
"""


@register(
    "iceberg_default_values",
    ice_default_oracle,
    "V3 default values: initial-default fill for pre-evolution files "
    "(required string + double defaults), explicit values after",
)
def iceberg_default_values(spark: SparkSession, sf: str) -> DataFrame:
    t = _defaults_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("adj").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("sum_adj"),
        )
    )


def _defaults_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """v3 partitioned table evolved BETWEEN two appends: the second
    append's schema adds a required string column and a double column,
    both with defaults, so the first append's files must fill them at
    read time from initial-default (never from data)."""
    from .iceberg.evolve import update_schema

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC, format_version=3)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = (
            update_schema(t)
            .add_column("tag", StringType(), required=True, default="legacy")
            .add_column("adj", DoubleType(), default=0.25)
            .commit()
        )
        return W.append(
            t,
            li.filter(F.col("l_orderkey") % 2 == 1)
            .withColumn("tag", F.lit("new"))
            .withColumn("adj", F.col("l_quantity") * 0.5),
        )

    return _cached_table(
        sf_dir,
        "lineitem_defaults",
        lambda t: t.metadata.format_version == 3
        and len(t.metadata.snapshots) == 2
        and any(f.name == "tag" for f in t.schema.fields),
        build,
    )


ice_evo_oracle = """
SELECT l_returnflag,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_notes
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_schema_evolution",
    ice_evo_oracle,
    "rename+add column mid-table; ID-based reads unify old and new files",
)
def iceberg_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    t = _evolved_table_for(spark, sf)
    df = t.scan().to_df(spark)
    return df.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("qty").cast("decimal(12,2)")), 2).cast("double").alias("sum_qty"),
        F.count("note").alias("n_notes"),
    )


def _evolved_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Table that was renamed (l_quantity -> qty) and widened (note)
    between two appends: the first file set predates the evolution."""
    from .iceberg.evolve import update_schema

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = (
            update_schema(t)
            .rename_column("l_quantity", "qty")
            .add_column("note", StringType())
            .commit()
        )
        return W.append(
            t,
            li.filter(F.col("l_orderkey") % 2 == 1)
            .withColumnRenamed("l_quantity", "qty")
            .withColumn("note", F.lit("x")),
        )

    # 2 snapshots alone can't occur before the schema commit (it sits
    # between the appends), but check `note` anyway for belt-and-braces
    return _cached_table(
        sf_dir,
        "lineitem_evo",
        lambda t: len(t.metadata.snapshots) == 2
        and t.schema.find_field("note") is not None,
        build,
    )


ice_eq_oracle = """
SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem WHERE l_orderkey % 100 <> 7
"""


@register(
    "iceberg_equality_delete",
    ice_eq_oracle,
    "equality-delete file applied as broadcast anti-join on key field ids",
)
def iceberg_eq_delete(spark: SparkSession, sf: str) -> DataFrame:
    t = _eqdel_table_for(spark, sf)
    df = t.scan().to_df(spark)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey")
    )


def _eqdel_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Table with an equality delete of every orderkey ≡ 7 (mod 100)."""

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, li)
        keys = li.filter(F.col("l_orderkey") % 100 == 7).select("l_orderkey").distinct()
        return W.delete_keys(t, spark, keys, ["l_orderkey"])

    return _cached_table(
        sf_dir, "lineitem_eqdel", lambda t: len(t.metadata.snapshots) == 2, build
    )


ice_compact_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(TRUE AS BOOLEAN) AS compacted
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_compaction",
    ice_compact_oracle,
    "bin-pack small-file compaction: 4 appends -> replace snapshot; values preserved",
)
def iceberg_compaction(spark: SparkSession, sf: str) -> DataFrame:
    t = _compacted_table_for(spark, sf)
    # the `compacted` flag asserts the REPLACE snapshot actually shrank
    # the file count (metadata-level proof the rewrite happened)
    snaps = t.metadata.snapshots
    pre = next(s for s in reversed(snaps) if s.summary.get("operation") != "replace")
    post = snaps[-1]
    shrank = int(post.summary["total-data-files"]) < int(pre.summary["total-data-files"])
    same_rows = int(post.summary["total-records"]) == int(pre.summary["total-records"])
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.lit(bool(shrank and same_rows)).alias("compacted"),
        )
    )


def _compacted_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Unpartitioned lineitem table built from 4 quarter-appends then
    bin-pack compacted (maintenance.compact_data_files)."""
    from .iceberg.maintenance import compact_data_files

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA)  # unpartitioned: pure bin-pack
        for q in range(4):
            t = W.append(t, li.filter(F.col("l_orderkey") % 4 == q))
        return compact_data_files(t, spark)

    # 5 snapshots = 4 appends + the replace; any crash leaves fewer
    return _cached_table(
        sf_dir, "lineitem_compact", lambda t: len(t.metadata.snapshots) == 5, build
    )


ice_expire_oracle = """
SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
       CAST(TRUE AS BOOLEAN) AS history_pruned
FROM lineitem WHERE l_orderkey % 2 = 1
"""


@register(
    "iceberg_expire_snapshots",
    ice_expire_oracle,
    "snapshot expiration: unreachable files deleted, head scan unchanged",
)
def iceberg_expire(spark: SparkSession, sf: str) -> DataFrame:
    t = _expired_table_for(spark, sf)
    pruned = len(t.metadata.snapshots) == 1
    return (
        t.scan()
        .to_df(spark)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_orderkey").alias("sum_okey"),
            F.lit(bool(pruned)).alias("history_pruned"),
        )
    )


def _expired_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Even-keys append, then overwrite with odd keys, then expire all
    but the head — the even-key files become unreachable and are
    physically removed."""
    from .iceberg.maintenance import expire_snapshots
    from .iceberg.metadata import OP_OVERWRITE

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = W.overwrite(t, li.filter(F.col("l_orderkey") % 2 == 1))
        return expire_snapshots(t, retain_last=1)

    # 1 snapshot alone matches the crashed-after-first-append state too
    # (even keys, wrong data, permanently red gate — r6 review); only
    # the OVERWRITE head proves the full append→overwrite→expire ran
    return _cached_table(
        sf_dir,
        "lineitem_expire",
        lambda t: len(t.metadata.snapshots) == 1
        and t.metadata.snapshots[0].summary.get("operation") == OP_OVERWRITE,
        build,
    )


ice_specevo_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_returnflag
"""


@register(
    "iceberg_partition_evolution",
    ice_specevo_oracle,
    "spec evolution mid-table: old files planned under old spec, new under new",
)
def iceberg_partition_evolution(spark: SparkSession, sf: str) -> DataFrame:
    t = _specevo_table_for(spark, sf)
    scan = t.scan(row_filter=E.equal_to("l_returnflag", "R"))
    return (
        scan.to_df(spark)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey"))
    )


def _specevo_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Era 1 unpartitioned, then evolve to partition by return flag,
    era 2 partitioned — the filtered scan prunes era-2 files by
    partition while keeping era-1 files (stats-pruned only)."""
    from .iceberg.evolve import update_spec

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, Schema(_SCHEMA.fields, schema_id=0))
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = update_spec(t).add_field("l_returnflag", "identity", name="flag").commit()
        return W.append(t, li.filter(F.col("l_orderkey") % 2 == 1))

    # 2 specs alone also matches the crashed-after-spec-commit state
    # (one snapshot, even keys only — r6 review); require both appends
    return _cached_table(
        sf_dir,
        "lineitem_specevo",
        lambda t: len(t.metadata.partition_specs) == 2
        and len(t.metadata.snapshots) == 2,
        build,
    )


ice_eqdel_specevo_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem
WHERE l_returnflag = 'R' AND l_orderkey % 100 <> 7
GROUP BY l_returnflag
"""


@register(
    "iceberg_eqdelete_spec_evolution",
    ice_eqdel_specevo_oracle,
    "equality deletes crossing a partition-spec change: per-era pruning + delete apply",
)
def iceberg_eqdelete_spec_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Eq-deletes land AFTER the spec evolved, keyed on rows from both
    eras: era-1 files (unpartitioned spec) are stats-pruned only, era-2
    files prune by the flag partition, and the delete anti-join must
    apply to survivors of both plans."""
    t = _eqdel_specevo_table_for(spark, sf)
    scan = t.scan(row_filter=E.equal_to("l_returnflag", "R"))
    return (
        scan.to_df(spark)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey"))
    )


def _eqdel_specevo_table_for(spark: SparkSession, sf_dir: str) -> Table:
    from .iceberg.evolve import update_spec

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, Schema(_SCHEMA.fields, schema_id=0))
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = update_spec(t).add_field("l_returnflag", "identity", name="flag").commit()
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 1))
        keys = li.filter(F.col("l_orderkey") % 100 == 7).select("l_orderkey").distinct()
        return W.delete_keys(t, spark, keys, ["l_orderkey"])

    return _cached_table(
        sf_dir,
        "lineitem_eqdel_specevo",
        lambda t: len(t.metadata.partition_specs) == 2
        and len(t.metadata.snapshots) == 3,
        build,
    )


ice_asof_oracle = """
SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem WHERE l_orderkey % 2 = 0
"""


@register(
    "iceberg_timestamp_as_of",
    ice_asof_oracle,
    "timestamp-based time travel: scan the snapshot current AS OF a past time",
)
def iceberg_timestamp_as_of(spark: SparkSession, sf: str) -> DataFrame:
    t = _table_for(spark, sf)
    first = t.metadata.snapshots[0]
    snap = t.metadata.snapshot_as_of(first.timestamp_ms)
    df = t.scan(snapshot_id=snap.snapshot_id).to_df(spark)
    return df.agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey"))


changelog_oracle = """
WITH src_keys AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey % 50 = 3
),
changes AS (
  SELECT 'delete' AS change_type, l_orderkey, l_quantity
  FROM lineitem WHERE l_orderkey % 50 = 3
  UNION ALL
  SELECT 'insert' AS change_type, l_orderkey, CAST(777 AS DOUBLE) AS l_quantity
  FROM src_keys
)
SELECT change_type,
       COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_qty
FROM changes
GROUP BY change_type
"""


@register(
    "iceberg_changelog",
    changelog_oracle,
    "CDC changelog: per-row inserts+deletes emitted by the MERGE snapshot",
)
def iceberg_changelog_q(spark: SparkSession, sf: str) -> DataFrame:
    from .iceberg.changelog import changelog_df

    t = _merge_table_for(spark, sf)
    first = t.metadata.snapshots[0]
    ch = changelog_df(t, spark, from_snapshot_id=first.snapshot_id)
    return ch.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("sum_okey"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )


ice_merge_oracle = """
WITH src_keys AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey % 50 = 3
),
merged AS (
  SELECT l_orderkey, l_quantity FROM lineitem
  WHERE l_orderkey NOT IN (SELECT l_orderkey FROM src_keys)
  UNION ALL
  SELECT l_orderkey, CAST(777 AS DOUBLE) AS l_quantity FROM src_keys
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_qty
FROM merged
"""


@register(
    "iceberg_merge_upsert",
    ice_merge_oracle,
    "MERGE upsert: eq-delete + append in ONE snapshot (update keys, keep rest)",
)
def iceberg_merge(spark: SparkSession, sf: str) -> DataFrame:
    t = _merge_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_orderkey").alias("sum_okey"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
    )


def _merge_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """lineitem upserted: every orderkey ≡ 3 (mod 50) collapses to one
    row with quantity 777; everything else untouched."""
    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA)
        t = W.append(t, li)
        src = (
            li.filter(F.col("l_orderkey") % 50 == 3)
            .select("l_orderkey")
            .distinct()
            .select(
                "l_orderkey",
                F.lit(777.0).alias("l_quantity"),
                F.lit("U").alias("l_returnflag"),
                F.lit(None).cast("timestamp_ntz").alias("l_shipdate"),
            )
        )
        return W.merge_upsert(t, spark, src, ["l_orderkey"])

    return _cached_table(
        sf_dir, "lineitem_merge", lambda t: len(t.metadata.snapshots) == 2, build
    )


_MRGX_SCHEMA = Schema(
    (
        NestedField(1, "o_orderkey", LongType(), True),
        NestedField(2, "o_custkey", LongType(), False),
        NestedField(3, "o_totalprice", DoubleType(), False),
    ),
    schema_id=0,
    identifier_field_ids=(),
)


def _merge_matrix_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """orders merged with the full WHEN-clause matrix — the Iceberg twin
    of the Delta gate's fixture (same clause semantics, same oracle):
    matched keys (≡3 mod 10) delete when the source marks o_custkey
    negative (keys ≡3 mod 40) else update o_totalprice to the doubled
    source price; 5 new keys insert only when odd; target keys ≡0
    mod 97 with no source row are swept by the by-source delete."""

    def build(loc: str) -> Table:
        from .queries import load as _load

        orders = _load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        t = W.create_table(loc, _MRGX_SCHEMA)
        t = W.append(t, orders)
        src = orders.filter(F.col("o_orderkey") % 10 == 3).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 40 == 3, F.lit(-1).cast("long"))
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        ).unionByName(
            spark.createDataFrame(
                [(10_000_000 + i, -1, 777.0) for i in range(5)],
                "o_orderkey long, o_custkey long, o_totalprice double",
            )
        )
        return W.merge_matrix_mor(
            t,
            spark,
            src,
            ["o_orderkey"],
            when_matched_update={"o_totalprice": "s.o_totalprice"},
            matched_condition="s.o_custkey >= 0",
            when_matched_delete="s.o_custkey < 0",
            when_not_matched_insert=True,
            not_matched_condition="s.o_orderkey % 2 = 1",
            when_not_matched_by_source_delete="t.o_orderkey % 97 = 0",
        )

    return _cached_table(
        sf_dir,
        "orders_merge_matrix",
        lambda t: len(t.metadata.snapshots) == 2,
        build,
    )


def _merge_matrix_oracle() -> str:
    from .delta_queries import delta_merge_matrix_oracle

    return delta_merge_matrix_oracle


@register(
    "iceberg_merge_matrix",
    _merge_matrix_oracle,
    "Full MERGE WHEN-clause matrix on the MOR path: pos-deletes for "
    "matched/by-source deletes + updates, new files for post-images "
    "and conditional inserts, one snapshot (same oracle as the Delta "
    "twin)",
)
def iceberg_merge_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Shares the Delta twin's oracle verbatim — the two faces must
    agree bit-for-bit on every clause outcome."""
    t = _merge_matrix_table_for(spark, sf)
    df = t.scan().to_df(spark)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.sum(F.col("o_custkey") % 1000).cast("bigint").alias("ckey_chk"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(13,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


def _merge_matrix_v3_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """The merge-matrix fixture on a FORMAT-V3 ROW-LINEAGE table (r12
    verdict task #4 — previously a documented refusal): one sorted
    single-file append (so _row_id = rank by o_orderkey, oracle-
    derivable), then the exact same MERGE clause matrix. Updated rows
    must carry their original _row_id with the committing sequence (2);
    untouched rows keep id and sequence 1; the inserted rows draw the
    next fresh ids (N, N+1); deletes land as deletion vectors."""

    def build(loc: str) -> Table:
        from .queries import load as _load

        orders = _load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        t = W.create_table(loc, _MRGX_SCHEMA, format_version=3)
        t = W.append(
            t, orders.repartition(1).sortWithinPartitions("o_orderkey")
        )
        src = orders.filter(F.col("o_orderkey") % 10 == 3).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 40 == 3, F.lit(-1).cast("long"))
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        ).unionByName(
            spark.createDataFrame(
                [(10_000_000 + i, -1, 777.0) for i in range(5)],
                "o_orderkey long, o_custkey long, o_totalprice double",
            )
        )
        return W.merge_matrix_mor(
            t,
            spark,
            src,
            ["o_orderkey"],
            when_matched_update={"o_totalprice": "s.o_totalprice"},
            matched_condition="s.o_custkey >= 0",
            when_matched_delete="s.o_custkey < 0",
            when_not_matched_insert=True,
            not_matched_condition="s.o_orderkey % 2 = 1",
            when_not_matched_by_source_delete="t.o_orderkey % 97 = 0",
        )

    return _cached_table(
        sf_dir,
        "orders_merge_matrix_v3",
        lambda t: t.metadata.format_version == 3
        and len(t.metadata.snapshots) == 2,
        build,
    )


# Oracle reconstructs every survivor's _row_id in pure SQL: the single
# sorted initial file makes rid = rank(o_orderkey) - 1; updates carry
# rid with lseq 2; untouched rows keep (rid, lseq 1); the two inserted
# odd keys draw the fresh ids {N, N+1} (assignment order between them
# is not pinned, so ins rows contribute 0 to rid_chk and are checked
# via sum/min/max instead).
ice_mrgx_v3_oracle = """
WITH base AS (
  SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS price,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
  FROM orders
), n AS (SELECT COUNT(*) AS cnt FROM orders),
survivors AS (
  SELECT CASE WHEN okey % 10 = 3 THEN 'upd' ELSE 'keep' END AS cls,
         okey, ckey,
         CASE WHEN okey % 10 = 3 THEN price * 2 ELSE price END AS price,
         rid,
         CASE WHEN okey % 10 = 3 THEN 2 ELSE 1 END AS lseq
  FROM base
  WHERE NOT (okey % 10 = 3 AND okey % 40 = 3)
    AND NOT (okey % 97 = 0 AND okey % 10 <> 3)
  UNION ALL
  SELECT 'ins', 10000001 + 2 * v.i, -1, 777.0,
         (SELECT cnt FROM n) + v.i, 2
  FROM (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS v(i)
)
SELECT cls, COUNT(*) AS n_rows,
       CAST(SUM(rid) AS BIGINT) AS sum_rid,
       CAST(MIN(rid) AS BIGINT) AS min_rid,
       CAST(MAX(rid) AS BIGINT) AS max_rid,
       CAST(SUM(CASE WHEN cls = 'ins' THEN 0
                     ELSE rid * (okey % 1000) END) AS BIGINT) AS rid_chk,
       CAST(SUM(lseq) AS BIGINT) AS lseq_chk,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(13,2))), 2) AS DOUBLE) AS price_chk
FROM survivors GROUP BY cls
"""


@register(
    "iceberg_merge_matrix_v3",
    ice_mrgx_v3_oracle,
    "MERGE WHEN-clause matrix on a v3 row-lineage table: updates carry "
    "_row_id with the committing sequence, inserts draw fresh ids, "
    "deletes land as deletion vectors (refusal lifted, r12 task #4)",
)
def iceberg_merge_matrix_v3(spark: SparkSession, sf: str) -> DataFrame:
    t = _merge_matrix_v3_table_for(spark, sf)
    df = t.scan(with_lineage=True).to_df(spark)
    cls = (
        F.when(F.col("o_orderkey") >= 10_000_000, F.lit("ins"))
        .when(F.col("o_orderkey") % 10 == 3, F.lit("upd"))
        .otherwise(F.lit("keep"))
    )
    return (
        df.withColumn("cls", cls)
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_row_id").cast("bigint").alias("sum_rid"),
            F.min("_row_id").cast("bigint").alias("min_rid"),
            F.max("_row_id").cast("bigint").alias("max_rid"),
            F.sum(
                F.when(F.col("cls") == "ins", F.lit(0)).otherwise(
                    F.col("_row_id") * (F.col("o_orderkey") % 1000)
                )
            )
            .cast("bigint")
            .alias("rid_chk"),
            F.sum("_last_updated_sequence_number")
            .cast("bigint")
            .alias("lseq_chk"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(13,2)")), 2)
            .cast("double")
            .alias("price_chk"),
        )
    )


avro_rt_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_avro_roundtrip",
    avro_rt_oracle,
    "executor-side Avro OCF bulk write -> partitioned table -> distributed scan",
)
def iceberg_avro_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Round trip through the pure-Python Avro data plane, fully
    distributed on both sides: W.append encodes OCF files executor-side
    via mapInPandas (pyreaders.write_avro_files — nothing materializes
    on the driver; commit stats come from block headers only), the scan
    reads them back through pyreaders.read_avro_files."""
    def build(loc: str) -> Table:
        spec = PartitionSpec(
            [PartitionField(3, 1000, "flag", parse_transform("identity"))]
        )
        t = W.create_table(
            loc, _SCHEMA, spec=spec, properties={"write.format.default": "avro"}
        )
        return W.append(t, _li4(spark, sf))

    t = _cached_table(
        sf,
        "lineitem_avro",
        # bounds requirement self-heals pre-r13 caches built before the
        # distributed stats pass existed (record-count-only entries)
        lambda t: t.current_snapshot() is not None
        and all(x.file.lower_bounds for x in t.scan().plan_files()),
        build,
    )
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum("l_orderkey").alias("sum_okey"),
        )
    )


orc_rt_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem
WHERE l_orderkey > (SELECT CAST(FLOOR(MAX(l_orderkey) / 2) AS BIGINT) FROM lineitem)
GROUP BY l_returnflag
"""


@register(
    "iceberg_orc_roundtrip",
    orc_rt_oracle,
    "ORC data-file writes (r12 task #5): native Spark ORC write -> "
    "distributed per-file stats pass -> manifest bounds -> filtered "
    "scan (bounds must not over-prune)",
)
def iceberg_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Write-side ORC: W.append writes via Spark's native ORC source
    under write.format.default=orc; column stats come from ONE
    distributed aggregation over the written files (write.py
    ``_orc_avro_file_stats`` — pyarrow has no ORC column-stats API),
    landing in the same manifest stats surface parquet uses. The scan
    filter is served by those bounds: wrong bounds either over-prune
    (rows vanish -> hash mismatch) or merely under-prune (correct but
    slower), so the gate pins the sound direction. Range distribution
    on l_orderkey gives files disjoint key spans — the layout the
    filter actually prunes against."""

    def build(loc: str) -> Table:
        from .iceberg.metadata import SortField, SortOrder

        t = W.create_table(
            loc,
            _SCHEMA,
            properties={
                "write.format.default": "orc",
                "write.distribution-mode": "range",
            },
            sort_order=SortOrder(
                fields=(SortField(source_id=1, transform="identity"),),
                order_id=1,
            ),
        )
        return W.append(t, _li4(spark, sf))

    t = _cached_table(
        sf,
        "lineitem_orc",
        lambda t: t.current_snapshot() is not None
        and all(x.file.lower_bounds for x in t.scan().plan_files()),
        build,
    )
    mid = (
        _li4(spark, sf)
        .agg((F.max("l_orderkey") / 2).cast("long"))
        .collect()[0][0]
    )
    return (
        t.scan(row_filter=E.greater_than("l_orderkey", int(mid)))
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum("l_orderkey").alias("sum_okey"),
        )
    )


# -- z-order clustering rewrite + two-column stats pruning ------------------

_Z_SCHEMA = Schema(
    (
        NestedField(1, "l_partkey", LongType(), True),
        NestedField(2, "l_suppkey", LongType(), True),
        NestedField(3, "l_quantity", DoubleType(), False),
    ),
    schema_id=0,
)


def _zorder_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Unpartitioned (partkey, suppkey, qty) table: one append, then a
    z-order clustering rewrite (maintenance.rewrite_clustered) so file
    min/max bounds are tight on BOTH key columns."""
    from .iceberg.maintenance import rewrite_clustered

    def build(loc: str) -> Table:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_suppkey", "l_quantity"
        )
        t = W.create_table(loc, _Z_SCHEMA)
        t = W.append(t, li)
        return rewrite_clustered(t, spark, "l_partkey", "l_suppkey", n_files=8)

    return _cached_table(
        sf_dir, "lineitem_zorder", lambda t: len(t.metadata.snapshots) == 2, build
    )


ice_zorder_oracle = """
SELECT COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(TRUE AS BOOLEAN) AS pruned
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 299 AND l_suppkey BETWEEN 10 AND 39
"""


@register(
    "iceberg_zorder_pruned",
    ice_zorder_oracle,
    "z-order rewrite -> two-column box query prunes files by stats",
)
def iceberg_zorder_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """A two-column box predicate on the z-ordered table: the `pruned`
    flag asserts the metrics evaluator actually skipped files (file
    bounds are tight on both columns only because of the Morton
    clustering — the whole point of the rewrite)."""
    t = _zorder_table_for(spark, sf)
    flt = (
        E.greater_than_or_equal("l_partkey", 100)
        & E.less_than_or_equal("l_partkey", 299)
        & E.greater_than_or_equal("l_suppkey", 10)
        & E.less_than_or_equal("l_suppkey", 39)
    )
    scan = t.scan(row_filter=flt)
    tasks = scan.plan_files()
    planned = len(tasks)
    total = int(t.current_snapshot().summary.get("total-data-files", "0"))
    return (
        scan.to_df(spark, tasks=tasks)  # reuse the plan, don't re-walk manifests
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.lit(bool(planned < total)).alias("pruned"),
        )
    )


@register(
    "iceberg_incremental_mv",
    ice_mor_oracle,
    "incremental materialized-view refresh from the CDC changelog",
)
def iceberg_incremental_mv(spark: SparkSession, sf: str) -> DataFrame:
    """Maintain a per-flag COUNT/SUM aggregate incrementally: seed the
    MV at the first snapshot, then fold ONLY the changelog deltas (the
    MOR delete's pre-images) into it — never rescanning the table. The
    oracle is the full recompute of the final state, so the hash match
    proves incremental == full. Cost is O(changed rows): the CDC
    surface (changelog.py) reads exactly the files the delete snapshot
    touched."""
    from .iceberg.changelog import apply_changes_to_aggregate, changelog_df

    t = _mor_table_for(spark, sf)
    s0 = t.metadata.snapshots[0]
    mv0 = (
        t.scan(snapshot_id=s0.snapshot_id)
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("qty_sum"),
        )
    )
    changes = changelog_df(t, spark, from_snapshot_id=s0.snapshot_id)
    mv = apply_changes_to_aggregate(
        mv0,
        changes,
        keys=["l_returnflag"],
        count_col="n_rows",
        sum_specs={"qty_sum": "l_quantity"},
    )
    return mv.select(
        "l_returnflag",
        "n_rows",
        F.round(F.col("qty_sum"), 2).cast("double").alias("sum_qty"),
    )


ice_dsv2_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity < 10
GROUP BY l_returnflag
"""


@register(
    "iceberg_datasource_roundtrip",
    ice_dsv2_oracle,
    "standard df.write/spark.read .format('icegopher') round-trip with pushed filter",
)
def iceberg_datasource_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """The Python-DataSource face of the engine: two appends through
    df.write.format('icegopher') (executor parquet writes + task-commit
    harvest + add_files adoption), read back through
    spark.read.format('icegopher') with the quantity filter pushed into
    scan planning (iceberg/dsv2.py). Oracle is the raw-parquet SQL."""
    from .iceberg.dsv2 import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)

    def build(loc: str) -> Table:
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
        W.create_table(loc, sch)
        for i in range(2):
            li.filter(F.col("l_orderkey") % 2 == i).write.format("icegopher").option(
                "location", loc
            ).mode("append").save()
        return Table.from_location(loc)

    t = _cached_table(
        sf, "lineitem_dsv2", lambda t: len(t.metadata.snapshots) == 2, build
    )
    return (
        spark.read.format("icegopher")
        .option("location", t.location)
        .load()
        .filter(F.col("l_quantity") < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
    )


ice_wap_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
       CAST(TRUE AS BOOLEAN) AS staged_invisible
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_wap_publish",
    ice_wap_oracle,
    "write-audit-publish: branch-staged appends invisible until fast-forward",
)
def iceberg_wap_publish(spark: SparkSession, sf: str) -> DataFrame:
    """The WAP flow end to end: first half appends to main, second half
    stages on an 'audit' branch (two commits chaining on the branch
    head), the gate CHECKS main still sees only the first half
    (staged_invisible pins it), then publishes by fast-forwarding main
    and aggregates the published state — which the oracle recomputes as
    the full table."""
    from .iceberg.refs import create_branch, rollback_to

    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )

    def build(loc: str) -> Table:
        sch = Schema(
            (
                NestedField(1, "l_orderkey", LongType(), True),
                NestedField(2, "l_quantity", DoubleType(), False),
                NestedField(3, "l_returnflag", StringType(), False),
            ),
            schema_id=0,
        )
        t = W.create_table(loc, sch)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = create_branch(t, "audit")
        t = W.append(t, li.filter((F.col("l_orderkey") % 2 == 1) & (F.col("l_orderkey") % 4 == 1)), branch="audit")
        return W.append(t, li.filter((F.col("l_orderkey") % 2 == 1) & (F.col("l_orderkey") % 4 == 3)), branch="audit")

    # the publish below PERSISTS (fast-forward is a metadata commit) —
    # a previous run leaves main == audit head, so the staged-invisible
    # phase needs a fresh build
    t = _cached_table(
        sf,
        "lineitem_wap",
        lambda t: len(t.metadata.snapshots) == 3
        and "audit" in t.metadata.refs
        and t.current_snapshot().snapshot_id != t.metadata.refs["audit"].snapshot_id,
        build,
    )

    n_main_before = t.scan().to_df(spark).count()
    n_even = li.filter(F.col("l_orderkey") % 2 == 0).count()
    staged_invisible = bool(n_main_before == n_even)
    published = rollback_to(t, t.metadata.refs["audit"].snapshot_id)
    return (
        published.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_orderkey").alias("sum_okey"),
            F.lit(staged_invisible).alias("staged_invisible"),
        )
    )


ice_eqdel_ds_oracle = """
SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
FROM lineitem WHERE l_orderkey % 100 <> 7
"""


@register(
    "iceberg_eqdelete_datasource",
    ice_eqdel_ds_oracle,
    "equality deletes applied inside the DataSource Arrow reader (round-5)",
)
def iceberg_eqdelete_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """spark.read.format('icegopher') over a table carrying an
    equality-delete file: the key-membership mask runs executor-side in
    the Arrow reader (dsv2._apply_eq_deletes) with sequence-number
    scoping resolved at plan time — previously a documented refusal.
    Same table + oracle as iceberg_equality_delete, so any divergence
    between the native anti-join and the Arrow mask reddens exactly one
    of the two gates."""
    from .iceberg.dsv2 import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    t = _eqdel_table_for(spark, sf)
    df = spark.read.format("icegopher").option("location", t.location).load()
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_orderkey").alias("sum_okey")
    )


_ZP_SCHEMA = Schema(
    (
        NestedField(1, "l_partkey", LongType(), True),
        NestedField(2, "l_suppkey", LongType(), True),
        NestedField(3, "l_quantity", DoubleType(), False),
        NestedField(4, "l_returnflag", StringType(), False),
    ),
    schema_id=0,
)


def _zorder_part_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Identity-partitioned (by l_returnflag) table, z-order rewritten
    on (l_partkey, l_suppkey) WITHIN each partition — round-5: the
    partitioned rewrite path (maintenance.rewrite_clustered routes
    through the normal partitioned write with joint (partition, z)
    range distribution)."""
    from .iceberg.maintenance import rewrite_clustered

    def build(loc: str) -> Table:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"
        )
        spec = PartitionSpec(
            [PartitionField(4, 1000, "l_returnflag_p", parse_transform("identity"))]
        )
        t = W.create_table(loc, _ZP_SCHEMA, spec)
        t = W.append(t, li)
        return rewrite_clustered(t, spark, "l_partkey", "l_suppkey", n_files=8)

    return _cached_table(
        sf_dir, "lineitem_zorder_part", lambda t: len(t.metadata.snapshots) == 2, build
    )


ice_zorder_part_oracle = """
SELECT COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(TRUE AS BOOLEAN) AS pruned
FROM lineitem
WHERE l_returnflag = 'R'
  AND l_partkey BETWEEN 100 AND 299 AND l_suppkey BETWEEN 10 AND 39
"""


@register(
    "iceberg_zorder_partitioned",
    ice_zorder_part_oracle,
    "z-order rewrite WITHIN partitions -> partition + two-column stats pruning",
)
def iceberg_zorder_partitioned(spark: SparkSession, sf: str) -> DataFrame:
    """Box query inside one partition of the partitioned z-ordered
    table: the scan must prune BOTH by partition value (flag) and by
    per-file min/max on the clustered columns; `pruned` pins that the
    planner skipped files beyond the partition filter alone."""
    t = _zorder_part_table_for(spark, sf)
    part_flt = E.equal_to("l_returnflag", "R")
    box_flt = (
        part_flt
        & E.greater_than_or_equal("l_partkey", 100)
        & E.less_than_or_equal("l_partkey", 299)
        & E.greater_than_or_equal("l_suppkey", 10)
        & E.less_than_or_equal("l_suppkey", 39)
    )
    scan = t.scan(row_filter=box_flt)
    tasks = scan.plan_files()
    planned = len(tasks)
    part_only = len(t.scan(row_filter=part_flt).plan_files())
    return scan.to_df(spark, tasks=tasks).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.lit(bool(planned < part_only)).alias("pruned"),
    )


# --- V3 positional-delete -> deletion-vector migration -------------------

ice_dv_migrate_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM lineitem WHERE l_quantity >= 3 AND l_returnflag <> 'A'
GROUP BY l_returnflag
"""


@register(
    "iceberg_dv_migrate",
    ice_dv_migrate_oracle,
    "V2 table with two scattered MOR positional-delete commits, "
    "upgrade_format_version(3), then rewrite_position_delete_files -> "
    "one roaring DV per data file; scan must hash-match the pre-"
    "migration semantics with zero surviving positional-delete entries",
)
def iceberg_dv_migrate(spark: SparkSession, sf: str) -> DataFrame:
    t = _dv_migrated_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


def _dv_migrated_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """V2 lineitem with two MOR delete commits (quantity<3, flag='A'),
    upgraded to v3 and migrated: positional-delete files replaced by one
    DV per data file in a replace commit. Four snapshots + the summary
    marker pin the complete build (the upgrade is metadata-only)."""

    def build(loc: str) -> Table:
        from .iceberg.evolve import upgrade_format_version
        from .iceberg.maintenance import rewrite_position_delete_files

        t = W.create_table(loc, _SCHEMA, _SPEC, format_version=2)
        t = W.append(t, _li4(spark, sf_dir))
        t = W.delete_where_mor(t, spark, E.less_than("l_quantity", 3.0))
        t = W.delete_where_mor(t, spark, E.equal_to("l_returnflag", "A"))
        t = upgrade_format_version(t, 3)
        return rewrite_position_delete_files(t, spark)

    def valid(t: Table) -> bool:
        snap = t.current_snapshot()
        return (
            t.metadata.format_version == 3
            and len(t.metadata.snapshots) == 4
            and snap is not None
            and (snap.summary or {}).get("rewrite") == "position-deletes->dv"
        )

    return _cached_table(sf_dir, "lineitem_dv_migrated", valid, build)


# --- sort-order evolution -> stats-pruned scan ----------------------------

ice_sortorder_oracle = """
SELECT COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk,
       TRUE AS pruned
FROM lineitem WHERE l_quantity < 5
"""


@register(
    "iceberg_sortorder_pruned",
    ice_sortorder_oracle,
    "replace_sort_order + range distribution-mode -> per-file quantity "
    "bounds are disjoint and the metrics evaluator prunes most files",
)
def iceberg_sortorder_pruned(spark: SparkSession, sf: str) -> DataFrame:
    t = _sorted_table_for(spark, sf)
    flt = E.less_than("l_quantity", 5.0)
    scan = t.scan(row_filter=flt)
    tasks = scan.plan_files()
    total = len(t.scan().plan_files())
    return scan.to_df(spark, tasks=tasks).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        F.lit(bool(len(tasks) < total)).alias("pruned"),
    )


def _sorted_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Unpartitioned lineitem under write.distribution-mode=range with a
    post-create replace_sort_order(l_quantity): one append range-
    partitions rows by quantity so per-file min/max bounds are disjoint
    — the metrics evaluator must prune files for a quantity predicate.
    One snapshot + default order id 1 pins the complete build."""

    def build(loc: str) -> Table:
        from .iceberg.evolve import replace_sort_order
        from .iceberg.transforms import PartitionSpec as PS

        t = W.create_table(
            loc, _SCHEMA, PS(), properties={"write.distribution-mode": "range", "write.range-partitions": "8"}
        )
        t = replace_sort_order(t, "l_quantity")
        return W.append(t, _li4(spark, sf_dir))

    def valid(t: Table) -> bool:
        return (
            t.metadata.default_sort_order_id == 1
            and len(t.metadata.snapshots) == 1
        )

    return _cached_table(sf_dir, "lineitem_sorted", valid, build)


# --- equality-delete -> deletion-vector conversion ------------------------

# The fixture deletes okey%10==4 then RE-INSERTS exactly those rows in
# a later append (higher data seq -> the eq delete must not touch it),
# so the correct scan is the FULL corpus, each row exactly once: an
# over-applied DV loses the re-inserts, a dropped-but-unmaterialized
# eq delete double-counts them — both flip okey_chk/n_rows.
ice_eqmigrate_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_eqdelete_migrate",
    ice_eqmigrate_oracle,
    "equality deletes materialized into one DV per affected data file "
    "(convert_equality_deletes); the post-delete append's re-inserted "
    "keys must survive (seq scoping) and zero eq entries remain",
)
def iceberg_eqdelete_migrate(spark: SparkSession, sf: str) -> DataFrame:
    t = _eqmigrated_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


def _eqmigrated_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """v3 lineitem: append ALL rows, equality-delete okey%10==4, then
    RE-INSERT exactly those rows (the eq delete's seq scoping must
    leave the later append untouched), then rewrite_equality_deletes —
    correct result is the full corpus, each row exactly once. Four
    snapshots + the summary marker pin the complete build."""

    def build(loc: str) -> Table:
        from .iceberg.maintenance import rewrite_equality_deletes

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC, format_version=3)
        t = W.append(t, li)
        keys = (
            li.filter(F.col("l_orderkey") % 10 == 4)
            .select("l_orderkey")
            .distinct()
        )
        t = W.delete_keys(t, spark, keys, ["l_orderkey"])
        t = W.append(t, li.filter(F.col("l_orderkey") % 10 == 4))
        return rewrite_equality_deletes(t, spark)

    def valid(t: Table) -> bool:
        snap = t.current_snapshot()
        return (
            len(t.metadata.snapshots) == 4
            and snap is not None
            and (snap.summary or {}).get("rewrite") == "equality-deletes->dv"
        )

    return _cached_table(sf_dir, "lineitem_eq_migrated", valid, build)


def _eqstream_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """The migrate-then-stream composition (r7 verdict #2): a v3
    lineitem table whose MAIN lineage still carries a poison
    equality-delete snapshot, followed by the sanctioned
    ``rewrite_equality_deletes`` migration, followed by TWO
    post-migration commits a CDC stream anchored past the migration
    must emit — a DV delete of flag='R' (replacement supersets over
    the migration's DVs: the delta is flag='R' rows not already
    eq-deleted-and-not-reinserted) and an append of quantity<5 rows.
    Six snapshots pin the complete build."""

    def build(loc: str) -> Table:
        from .iceberg.maintenance import rewrite_equality_deletes

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC, format_version=3)
        t = W.append(t, li)
        keys = (
            li.filter(F.col("l_orderkey") % 10 == 4)
            .select("l_orderkey")
            .distinct()
        )
        t = W.delete_keys(t, spark, keys, ["l_orderkey"])
        t = W.append(t, li.filter(F.col("l_orderkey") % 10 == 4))
        t = rewrite_equality_deletes(t, spark)
        t = W.delete_where_dv(t, spark, E.equal_to("l_returnflag", "R"))
        return W.append(t, li.filter(F.col("l_quantity") < 5))

    def valid(t: Table) -> bool:
        snaps = t.metadata.snapshots
        return len(snaps) == 6 and any(
            (s.summary or {}).get("rewrite") == "equality-deletes->dv"
            for s in snaps
        )

    return _cached_table(sf_dir, "lineitem_eq_stream", valid, build)


def eq_migration_snapshot_id(t: Table) -> int:
    """The snapshot committed by rewrite_equality_deletes — the CDC
    bootstrap anchor for a migrated table."""
    return next(
        s.snapshot_id
        for s in t.metadata.snapshots
        if (s.summary or {}).get("rewrite") == "equality-deletes->dv"
    )


# --- batch CDC DataSource face --------------------------------------------

ice_changes_ds_oracle = """
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
    "iceberg_changes_datasource",
    ice_changes_ds_oracle,
    "batch CDC via spark.read.format('icegopher_changes'): the SQL-"
    "friendly face of the change log, same planner/kernel as the stream",
)
def iceberg_changes_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """Full-range batch CDC read over the DV fixture through the
    DataSource face (streaming/iceberg_cdc_source.py:
    IcebergChangesDataSource) — identical change set to the stream
    gate, through the batch reader path."""
    from .streaming.iceberg_cdc_source import IcebergChangesDataSource

    t = _dv_table_for(spark, sf)
    spark.dataSource.register(IcebergChangesDataSource)
    return (
        spark.read.format("icegopher_changes")
        .option("location", t.location)
        .load()
        .groupBy(F.col("_change_type").alias("change_type"), "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


# --- V3 variant column (round-8) -------------------------------------------

def _variant_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """v3 documents table with a VARIANT payload column: doc metadata
    packed as JSON (to_json of a struct — quoting-safe) and parsed into
    Spark's native VariantType at write time. The parquet files carry
    the `variant` logical-type annotation, which pyarrow cannot even
    open — the footer-stats fallback (write.py:_footer_num_rows) keeps
    the commit path working; Spark reads the files natively."""
    from .iceberg.types import VariantType

    schema = Schema(
        (
            NestedField(1, "doc_id", LongType(), True),
            NestedField(2, "lang", StringType(), False),
            NestedField(3, "payload", VariantType(), False),
        ),
        schema_id=0,
    )

    def build(loc: str) -> Table:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id",
            "lang",
            F.parse_json(
                F.to_json(F.struct("source", "n_chars"))
            ).alias("payload"),
        )
        t = W.create_table(loc, schema, format_version=3)
        return W.append(t, docs)

    return _cached_table(
        sf_dir, "documents_variant", lambda t: len(t.metadata.snapshots) == 1, build
    )


ice_variant_oracle = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang, source
"""


@register(
    "iceberg_variant_read",
    ice_variant_oracle,
    "V3 variant column: written as Spark-native VariantType, scanned "
    "back and extracted with variant_get (typed paths) — footer stats "
    "survive pyarrow's refusal of the variant logical type",
)
def iceberg_variant_read(spark: SparkSession, sf: str) -> DataFrame:
    """Full variant loop: JSON-packed doc metadata written into an
    Iceberg v3 VariantType column, read back through the scan path,
    and extracted with typed variant_get paths; the oracle recomputes
    the same aggregate from the original flat columns. Deselect
    tolerance (scanning the OTHER columns of a variant table) is
    pinned in tests/test_types_schema.py (iceberg/types.py:VariantType,
    write.py:_footer_num_rows)."""
    t = _variant_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .select(
            "lang",
            F.try_variant_get("payload", "$.source", "string").alias("source"),
            F.try_variant_get("payload", "$.n_chars", "long").alias("n_chars"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# --- V3 SHREDDED variant column (round-9) -----------------------------------

def _shredded_file_check(t: Table) -> bool:
    """True when every data file of ``t`` is a SHREDDED variant file
    (typed_value subcolumns present in the parquet footer per the V3
    shredding spec). Raw-bytes probe: pyarrow cannot open
    variant-annotated footers at all."""
    try:
        tasks = t.scan().plan_files()
        if not tasks:
            return False
        for task in tasks:
            from .iceberg.table import strip_file_scheme

            with open(strip_file_scheme(task.file.file_path), "rb") as f:
                if b"typed_value" not in f.read():
                    return False
        return True
    except Exception:  # noqa: BLE001 — unreadable cache
        return False


def _variant_shredded_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """v3 documents table whose variant payload files are SHREDDED
    (typed_value subcolumns per the V3/parquet variant shredding spec
    — what another engine's shredding writer produces). Spark 4's
    reader reassembles shredded variant natively
    (spark.sql.variant.allowReadingShredded, default on); the fixture
    forces shredding at write time via
    spark.sql.variant.forceShreddingSchemaForTest and VERIFIES the
    footers really carry typed_value, so the gate can't silently pass
    on unshredded files (r8 verdict #1a)."""
    from .iceberg.types import VariantType

    schema = Schema(
        (
            NestedField(1, "doc_id", LongType(), True),
            NestedField(2, "lang", StringType(), False),
            NestedField(3, "payload", VariantType(), False),
        ),
        schema_id=0,
    )

    def build(loc: str) -> Table:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id",
            "lang",
            F.parse_json(
                F.to_json(F.struct("source", "n_chars"))
            ).alias("payload"),
        )
        t = W.create_table(loc, schema, format_version=3)
        conf_key = "spark.sql.variant.forceShreddingSchemaForTest"
        prev = spark.conf.get(conf_key, "")
        spark.conf.set(conf_key, "source string, n_chars bigint")
        try:
            t = W.append(t, docs)
        finally:
            spark.conf.set(conf_key, prev or "")
        if not _shredded_file_check(t):
            raise RuntimeError(
                "shredded-variant fixture wrote UNSHREDDED files — the "
                "gate would not be testing shredded reassembly"
            )
        return t

    return _cached_table(
        sf_dir,
        "documents_variant_shredded",
        lambda t: len(t.metadata.snapshots) == 1 and _shredded_file_check(t),
        build,
    )


@register(
    "iceberg_variant_shredded",
    ice_variant_oracle,
    "V3 SHREDDED variant read: data files carry typed_value subcolumns "
    "per the shredding spec; the scan reassembles them into Spark "
    "VariantType natively and variant_get extracts typed paths — same "
    "oracle as the unshredded gate, so shredding must be "
    "value-invisible",
)
def iceberg_variant_shredded(spark: SparkSession, sf: str) -> DataFrame:
    """Shredded-variant read (r8 verdict #1a): another engine shredding
    the variant column (typed_value subcolumns) must read back
    identically to the unshredded layout. The fixture builder asserts
    the footers are really shredded; the oracle recomputes the
    aggregate from the original flat columns. Semantics anchor:
    types.go:61-135 (type JSON dispatch) + the parquet variant
    shredding spec."""
    t = _variant_shredded_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .select(
            "lang",
            F.try_variant_get("payload", "$.source", "string").alias("source"),
            F.try_variant_get("payload", "$.n_chars", "long").alias("n_chars"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# --- auto manifest-merge (round-8) -----------------------------------------

def _merged_manifests_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """lineitem split into 12 single-slice appends with
    commit.manifest.min-count-to-merge=4: the commit path auto-merges
    carried manifests (write.py:_maybe_merge_manifests), so the final
    snapshot plans over a BOUNDED manifest list whose merged manifests
    hold EXISTING entries with their original sequence numbers."""

    def build(loc: str) -> Table:
        li = _li4(spark, sf_dir)
        t = W.create_table(
            loc,
            _SCHEMA,
            _SPEC,
            format_version=3,
            properties={"commit.manifest.min-count-to-merge": "4"},
        )
        for i in range(12):
            t = W.append(t, li.filter(F.col("l_orderkey") % 12 == i))
        return t

    def valid(t: Table) -> bool:
        from .iceberg.manifests import read_manifest_list

        snap = t.current_snapshot()
        if snap is None or len(t.metadata.snapshots) != 12:
            return False
        manifests = read_manifest_list(t.io.read(snap.manifest_list))
        # the merge must actually have bounded the list (12 appends
        # would otherwise carry 12 manifests)
        return len(manifests) < 8 and any(
            m.existing_files_count > 0 for m in manifests
        )

    return _cached_table(sf_dir, "lineitem_manifest_merge", valid, build)


ice_manifest_merge_oracle = """
SELECT l_returnflag,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity < 10
GROUP BY l_returnflag
"""


@register(
    "iceberg_manifest_merge",
    ice_manifest_merge_oracle,
    "auto manifest-merge on commit: 12 appends plan over a bounded "
    "manifest list; merged EXISTING entries keep original seq ids and "
    "partition summaries still prune the flag='R' scan",
)
def iceberg_manifest_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Scan over auto-merged manifests with a partition-pruned filter:
    the merged manifests' partition summaries must prune exactly like
    the originals and every row must appear exactly once across the
    merged + fresh manifests (write.py:_maybe_merge_manifests; same
    filter shape as iceberg_scan_pruned)."""
    t = _merged_manifests_table_for(spark, sf)
    flt = E.equal_to("l_returnflag", "R") & E.less_than("l_quantity", 10.0)
    return (
        t.scan(row_filter=flt)
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


# --- metadata tables, oracled (round-8) -------------------------------------

# The DV fixture's file inventory is fully derivable from lineitem:
# data files hold every row (partitioned by flag identity + okey
# bucket), and each file's CURRENT deletion vector holds its total
# deleted positions — flag='R' rows plus quantity<5 rows (the second
# replacement DV supersedes the first per file, so a stale or
# double-counted DV entry flips n_rows).
ice_files_meta_oracle = """
SELECT 0 AS content, l_returnflag AS flag, COUNT(*) AS n_rows
FROM lineitem GROUP BY 2
UNION ALL
SELECT 1 AS content, l_returnflag AS flag, COUNT(*) AS n_rows
FROM lineitem WHERE l_returnflag = 'R' OR l_quantity < 5
GROUP BY 2
"""


@register(
    "iceberg_files_metadata",
    ice_files_meta_oracle,
    "files/partitions metadata tables, oracled: per-(content, flag "
    "partition) record counts over the DV fixture — live data entries "
    "plus the CURRENT (replacement-superseding) deletion vectors",
)
def iceberg_files_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """The inspection plane under an oracle (was pytest-only, SURVEY
    §2.10): `table.inspect.files()` rows aggregated per content type
    and flag partition must reproduce counts derivable from the source
    table — data record counts per partition, and DV record counts
    equal to the per-file deleted-position totals after replacement
    supersession (iceberg/inspect.py:files)."""
    t = _dv_table_for(spark, sf)
    files = t.inspect.files(spark)
    return (
        files.select(
            F.col("content"),
            F.col("partition")["flag"].alias("flag"),
            "record_count",
        )
        .groupBy("content", "flag")
        .agg(F.sum("record_count").cast("bigint").alias("n_rows"))
    )


# --- snapshots metadata table, oracled (round-9) ----------------------------

def _snapmeta_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Three-snapshot fixture whose SnapshotSummary numbers are all
    SQL-derivable (no file-boundary dependence): append the full slice,
    ONE deletion-vector delete of flag='R' (first delete ⇒ no
    replacement-superset carry), then append the qty<5 rows again."""

    def build(loc: str) -> Table:
        from .iceberg.expressions import equal_to

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, format_version=3)
        t = W.append(t, li)
        t = W.delete_where_dv(t, spark, equal_to("l_returnflag", "R"))
        return W.append(t, li.filter(F.col("l_quantity") < 5))

    return _cached_table(
        sf_dir,
        "lineitem_snapmeta",
        lambda t: len(t.metadata.snapshots) == 3,
        build,
    )


ice_snapshots_oracle = """
SELECT CAST(1 AS BIGINT) AS seq, 'append' AS operation,
       CAST(COUNT(*) AS BIGINT) AS added_records,
       CAST(0 AS BIGINT) AS added_position_deletes
FROM lineitem
UNION ALL
SELECT CAST(2 AS BIGINT), 'delete', CAST(0 AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_returnflag = 'R'
UNION ALL
SELECT CAST(3 AS BIGINT), 'append', CAST(COUNT(*) AS BIGINT),
       CAST(0 AS BIGINT)
FROM lineitem WHERE l_quantity < 5
"""


@register(
    "iceberg_snapshots_metadata",
    ice_snapshots_oracle,
    "snapshots metadata table: operation + spec SnapshotSummary "
    "counters (added-records, added-position-deletes) recomputed "
    "row-exactly by the oracle from the fixture's construction",
)
def iceberg_snapshots_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """The snapshots inspection table (upstream's
    `table$snapshots`; reference surfaces snapshot state via
    table.go/metadata.go but has no metadata-table face): per-snapshot
    operation and the spec's SnapshotSummary delete counters, stamped
    at commit (write.py:_commit_snapshot, r9) and verified against
    SQL-recomputed expectations. File counts are intentionally NOT
    gated — they depend on write parallelism."""
    from .iceberg.inspect import InspectTables

    t = _snapmeta_table_for(spark, sf)
    snaps = InspectTables(t).snapshots(spark)
    return snaps.select(
        F.col("sequence_number").alias("seq"),
        "operation",
        F.element_at("summary", "added-records").cast("bigint").alias("added_records"),
        F.element_at("summary", "added-position-deletes")
        .cast("bigint")
        .alias("added_position_deletes"),
    )


# --- SCD2 dimension history from the changelog (round-9) --------------------

def _scd2_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Orders dimension with a deterministic 3-commit history:
    append all, CoW UPDATE (+10 on o_totalprice where status 'F'),
    CoW DELETE (o_orderkey < 1000). Keys are unique (o_orderkey), so
    the paired changelog is SCD2-legal."""

    def build(loc: str) -> Table:
        from .iceberg.expressions import equal_to, less_than

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = W.create_table(loc, _ORDERS_SCHEMA)
        t = W.append(t, orders)
        t = W.update_where(
            t,
            spark,
            equal_to("o_orderstatus", "F"),
            {"o_totalprice": F.col("o_totalprice") + 10.0},
        )
        return W.delete_where(t, spark, less_than("o_orderkey", 1000))

    return _cached_table(
        sf_dir, "orders_scd2", lambda t: len(t.metadata.snapshots) == 3, build
    )


# Expected SCD2 over the fixture, with commits mapped to their
# sequence numbers (1=append, 2=update, 3=delete):
#   v1 (original price): valid_from 1; closes at 2 if status='F',
#      else at 3 if okey<1000, else current.
#   v2 (price+10, only status='F'): valid_from 2; closes at 3 if
#      okey<1000, else current.
cdc_scd2_oracle = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         CAST(1 AS BIGINT) AS valid_from,
         CASE WHEN o_orderstatus = 'F' THEN CAST(2 AS BIGINT)
              WHEN o_orderkey < 1000 THEN CAST(3 AS BIGINT)
              ELSE CAST(NULL AS BIGINT) END AS valid_to
  FROM orders
), v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice + 10.0 AS DOUBLE) AS o_totalprice,
         CAST(2 AS BIGINT) AS valid_from,
         CASE WHEN o_orderkey < 1000 THEN CAST(3 AS BIGINT)
              ELSE CAST(NULL AS BIGINT) END AS valid_to
  FROM orders WHERE o_orderstatus = 'F'
), u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT *, valid_to IS NULL AS is_current FROM u
"""


@register(
    "cdc_scd2_history",
    cdc_scd2_oracle,
    "SCD2 dimension history built from the paired changelog: version "
    "intervals per key with valid_from/valid_to/is_current, carryover "
    "rewrites invisible",
)
def cdc_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """The full CDC composition: changelog (un-netted) -> pair_updates
    (identifier o_orderkey) -> scd2_from_changelog. Copy-on-write
    carryover noise must vanish (a carried row would fabricate a
    version split); snapshot ids map to their sequence numbers so the
    oracle can state the expected intervals literally
    (iceberg/changelog.py:pair_updates, scd2_from_changelog)."""
    from .iceberg.changelog import (
        COMMIT_SNAPSHOT,
        changelog_df,
        pair_updates,
        scd2_from_changelog,
    )

    t = _scd2_table_for(spark, sf)
    first = t.metadata.snapshots[0]
    raw = changelog_df(t, spark, from_snapshot_id=first.snapshot_id, net=False)
    # include the first snapshot's inserts: changelog_df is exclusive
    # of from_snapshot_id, so re-read its rows as inserts via a scan
    # pinned at that snapshot
    base = (
        t.scan(snapshot_id=first.snapshot_id)
        .to_df(spark)
        .select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(first.snapshot_id).cast("long").alias(COMMIT_SNAPSHOT),
        )
    )
    # one linear chain end to end (r13, guide §1.2): changelog_df tags
    # only insert/delete, so pair_updates(io_only=True) skips its
    # passthrough subtree, and scd2_from_changelog is now a single
    # conditional projection instead of opens∪closes — the whole
    # changelog lineage (Puffin DV decodes, per-snapshot unions)
    # executes exactly once per action with NO localCheckpoint
    # write+read cycles (previously two)
    changes = base.unionByName(raw)
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


# --- CoW update fixture for CDC update pairing (round-9) --------------------

def _cow_update_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Unpartitioned lineitem slice with ONE copy-on-write UPDATE
    commit (update_where: l_quantity += 100 where l_returnflag = 'R').
    The CDC stream sees the overwrite snapshot as removed-file rows
    (deletes, pre-update values) + added-file rows (inserts,
    post-update values); carryover rows of the rewritten files emit as
    identical delete+insert pairs. Exactly the shape
    changelog.pair_updates exists to fold (r8 verdict #7)."""

    def build(loc: str) -> Table:
        from .iceberg.expressions import equal_to

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA)
        t = W.append(t, li)
        return W.update_where(
            t,
            spark,
            equal_to("l_returnflag", "R"),
            {"l_quantity": F.col("l_quantity") + 100},
        )

    return _cached_table(
        sf_dir,
        "lineitem_cow_update",
        lambda t: len(t.metadata.snapshots) == 2,
        build,
    )


# --- orphan-file cleanup, oracled (round-8) ---------------------------------

def _orphan_cleaned_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """A copy of the two-append fixture with planted orphan junk (a
    fake data parquet, an abandoned temp, a stray metadata avro — the
    debris failed commits leave), then remove_orphan_files with
    older_than_ms=0. A cleanup that misclassifies a LIVE file as orphan
    breaks the scan; one that misses the junk leaves it for the
    validity check to catch."""

    def build(loc: str) -> Table:
        import os as _os

        from .iceberg.maintenance import remove_orphan_files

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 1))
        junk = [
            f"{loc}/data/zz-orphan-{i}.parquet" for i in range(2)
        ] + [f"{loc}/data/part-tmp-abandoned.parquet.tmp-deadbeef"]
        for p in junk:
            with open(p, "wb") as f:
                f.write(b"not a real parquet")
        # spark= engages the DISTRIBUTED discovery path (r8 verdict
        # #2): the gate now proves the executor-side manifest decode +
        # parallel walk + anti-join classify exactly like the driver
        # walk did
        removed = remove_orphan_files(t, older_than_ms=0, spark=spark)
        assert all(not _os.path.exists(p) for p in junk), removed
        return t

    def valid(t: Table) -> bool:
        import os as _os

        if len(t.metadata.snapshots) != 2:
            return False
        return not any(
            fn.startswith(("zz-orphan", "part-tmp-abandoned"))
            for fn in _os.listdir(f"{t.location}/data")
        )

    return _cached_table(sf_dir, "lineitem_orphan_clean", valid, build)


ice_orphan_oracle = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(SUM(l_orderkey % 1000) AS BIGINT) AS okey_chk
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "iceberg_orphan_cleanup",
    ice_orphan_oracle,
    "remove_orphan_files deletes planted junk and ONLY junk: the "
    "post-cleanup scan still returns every live row exactly once",
)
def iceberg_orphan_cleanup(spark: SparkSession, sf: str) -> DataFrame:
    """Orphan GC under an oracle (was pytest-only): junk files planted
    under the table location are removed, live data files are not, and
    the scan over the cleaned table reproduces the full corpus
    (iceberg/maintenance.py:orphan_files — reachability from metadata
    alone, mtime-guarded for in-flight writers)."""
    t = _orphan_cleaned_table_for(spark, sf)
    return (
        t.scan()
        .to_df(spark)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_orderkey") % 1000).cast("bigint").alias("okey_chk"),
        )
    )


# --- table statistics (ANALYZE / NDV), round-8 ------------------------------

def _stats_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Two-append lineitem with a registered Puffin statistics file:
    per-column EXACT NDV blobs for the current snapshot
    (maintenance.compute_table_stats)."""

    def build(loc: str) -> Table:
        from .iceberg.maintenance import compute_table_stats

        li = _li4(spark, sf_dir)
        t = W.create_table(loc, _SCHEMA, _SPEC)
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 0))
        t = W.append(t, li.filter(F.col("l_orderkey") % 2 == 1))
        return compute_table_stats(t, spark)

    def valid(t: Table) -> bool:
        snap = t.current_snapshot()
        return (
            len(t.metadata.snapshots) == 2
            and snap is not None
            and any(
                s.get("snapshot-id") == snap.snapshot_id
                for s in t.metadata.statistics
            )
        )

    return _cached_table(sf_dir, "lineitem_stats", valid, build)


ice_table_stats_oracle = """
SELECT 'l_orderkey' AS col, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv FROM lineitem
UNION ALL
SELECT 'l_quantity', CAST(COUNT(DISTINCT l_quantity) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'l_returnflag', CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'l_shipdate', CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) FROM lineitem
"""


@register(
    "iceberg_table_stats",
    ice_table_stats_oracle,
    "ANALYZE: per-column NDV written as a Puffin statistics file, "
    "registered in metadata (StatisticsFile), read back via the blob "
    "ndv properties — exact distinct counts",
)
def iceberg_table_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The CBO statistics hook under an oracle: compute_table_stats
    writes one NDV blob per column into a Puffin file and registers it
    under metadata `statistics`; table_ndv reads the registration back
    the way a cost model would — values must equal exact COUNT(DISTINCT)
    (iceberg/maintenance.py:compute_table_stats/table_ndv)."""
    from .iceberg.maintenance import table_ndv

    t = _stats_table_for(spark, sf)
    ndv = table_ndv(t)
    return spark.createDataFrame(
        sorted(ndv.items()), "col string, ndv bigint"
    )


# ----------------------------------------------- in-place adoption (r9)


def _adopted_table_for(spark: SparkSession, sf_dir: str) -> Table:
    """Iceberg table whose ONLY data file is the raw testdata
    orders.parquet, adopted in place via add_files (write.py:2375) —
    zero data movement, footer stats land in the manifest. The 100 TB
    onboarding path: O(#files) metadata work."""

    def build(loc: str) -> Table:
        schema = Schema(
            (
                NestedField(1, "o_orderkey", LongType(), True),
                NestedField(2, "o_custkey", LongType(), False),
                NestedField(3, "o_orderstatus", StringType(), False),
                NestedField(4, "o_totalprice", DoubleType(), False),
                NestedField(5, "o_orderdate", TimestampType(), False),
                NestedField(6, "o_orderpriority", StringType(), False),
            ),
            schema_id=0,
        )
        t = W.create_table(loc, schema)
        src = f"{sf_dir}/orders.parquet"
        if os.path.isdir(src):
            # scaled copies are Spark-written DIRECTORIES of part files
            paths = sorted(
                os.path.join(src, fn)
                for fn in os.listdir(src)
                if fn.endswith(".parquet")
            )
        else:
            paths = [src]
        return W.add_files(t, paths)

    return _cached_table(
        sf_dir,
        "orders_adopted",
        lambda t: len(t.metadata.snapshots) == 1
        and len(list(t.scan().plan_files())) >= 1,
        build,
    )


add_files_oracle = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey < 5000
GROUP BY o_orderstatus
"""


@register(
    "iceberg_add_files",
    add_files_oracle,
    "in-place parquet adoption (add_files): footer stats drive pruning",
)
def iceberg_add_files(spark: SparkSession, sf: str) -> DataFrame:
    t = _adopted_table_for(spark, sf)
    df = t.scan(row_filter=E.less_than("o_orderkey", 5000)).to_df(spark)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )
