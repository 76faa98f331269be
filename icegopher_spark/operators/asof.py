"""As-of join (point-in-time join) as a composition of built-in ops.

Spark has no native ASOF JOIN; the scalable pattern is union + window
rather than an inequality join (which Catalyst can only run as a
broadcast-nested-loop): tag both sides, sort within each key partition
by time, and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)``. One shuffle on the join key, no BNLJ,
no per-group Python.

At 100 TB both sides hash-partition on the key; skewed keys are handled
by AQE. Semantics: for each left row, the latest right row with
right_ts <= left_ts (backward as-of, ties take the right row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join.

    Returns `left.*` plus ``payload_cols`` from the latest right row
    with ``right[right_ts] <= left[left_ts]`` and matching ``on`` key
    (nulls when no prior right row exists). With ``tolerance_seconds``,
    a match older than the tolerance yields nulls too — the point-in-
    time lookup expires. Tolerance costs nothing extra at scale: the
    carried right timestamp rides the same window pass and the expiry
    check is a map-side CASE after it.
    """
    left_cols = left.columns
    # ONE struct carries (rts, all payloads) through a single
    # last(ignorenulls): per-column fills tore rows apart — a
    # legitimately-NULL payload in the latest right row was replaced by
    # a stale value from an older row, and different columns (incl. the
    # tolerance timestamp) could come from different right rows (r6
    # review). A null STRUCT (left rows) is skipped by ignorenulls; a
    # struct with null fields is a real match and carries its nulls.
    rp_type = right.select(
        F.struct(
            F.col(right_ts).cast("timestamp").cast("double").alias("_rts"),
            *[F.col(c).alias(c) for c in payload_cols],
        )
    ).schema[0].dataType
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # events sort after orders at equal ts → <= semantics
        F.struct(*left_cols).alias("_l"),
        F.lit(None).cast(rp_type).alias("_rp"),
        F.lit(0).cast("bigint").alias("_tb"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left_cols)).schema[0].dataType).alias("_l"),
        F.struct(
            F.col(right_ts).cast("timestamp").cast("double").alias("_rts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_rp"),
        # deterministic tie-break among right rows with EQUAL (key, ts):
        # without it, which duplicate wins depends on shuffle order and
        # differs across runs/retries/AQE plans (r6 review)
        F.xxhash64(*[F.col(c) for c in payload_cols]).alias("_tb"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_ts",
        "_l",
        F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
    )
    fresh = (
        F.lit(True)
        if tolerance_seconds is None
        else (F.col("_ts").cast("timestamp").cast("double") - F.col("_rp")["_rts"])
        <= F.lit(float(tolerance_seconds))
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left_cols],
        *[F.when(fresh, F.col("_rp")[c]).alias(c) for c in payload_cols],
    )
    return out
