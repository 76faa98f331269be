"""Time-series / event-analytics operators: gap-filled rollups (LOCF),
ordered funnel stages, and cohort retention.

[X] extension surface (SURVEY.md §2.9) — the reference has no data
plane; these are the hypertable-style operators (timescale's
``time_bucket_gapfill``/``locf``, product-analytics funnels and
retention) a user of an events table runs daily. All three are pure
DataFrame compositions (joins + windows + conditional aggregation):
no UDFs, nothing driver-side, each with an exact SQL oracle.

Scale posture:
  * gapfill materializes the (series-key x bucket) grid — size is
    |keys| x |time range / bucket|, independent of event count, so at
    100 TB the grid is tiny next to the fact table; the LOCF window
    partitions per series key and sorts only the bucketed rollup.
  * funnel reduces each stage to (user, min_ts) BEFORE joining, so
    stage joins move one narrow row per user, not per event.
  * retention reduces to distinct (user, day) then equi-joins on exact
    day offsets — no inequality/range join anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key bucketed series over the table's global time
    range, missing buckets filled by last-observation-carried-forward.

    Returns (key, bucket, value_filled, was_gap). Buckets before a
    key's first observation fill with 0.

    EAGER-EXECUTION NOTE (r13 ADVICE): building this frame runs a Spark
    job immediately — the per-(key, bucket) rollup is localCheckpoint'd
    at plan-construction time (it feeds three consumers: bounds, key
    list, and the grid join). localCheckpoint output is not
    fault-tolerant (a lost executor cannot recompute its lineage);
    callers doing plan-only inspection should expect the eager job.
    """
    # date_trunc accepts more units than INTERVAL arithmetic does
    # (e.g. 'quarter'); validate up front so an unsupported bucket
    # fails with a clear message, not a plan-time ParseException on
    # the interval literal (r8 review wave 5)
    _INTERVAL_BUCKETS = {
        "year", "month", "week", "day", "hour", "minute", "second"
    }
    if bucket.lower() not in _INTERVAL_BUCKETS:
        raise ValueError(
            f"gapfill bucket {bucket!r} not supported: pick one of "
            f"{sorted(_INTERVAL_BUCKETS)} (INTERVAL has no such unit)"
        )
    b = F.date_trunc(bucket, F.col(ts_col))
    # ONE events pass (r13 batch 9, guide §5/§2.3): bounds and the key
    # list are pure functions of the rollup — min/max over per-(key,
    # bucket) rows equal min/max over raw events after date_trunc, and
    # groupBy emits every key (NULL included) — so both derive from the
    # materialized rollup instead of re-scanning events (the previous
    # shape scanned + re-aggregated events three times per action).
    # The rollup is |keys × buckets| narrow rows.
    hourly = (
        events.groupBy(F.col(key_col), b.alias("bucket"))
        .agg(F.sum(F.col(value_col).cast("decimal(14,4)")).alias("total"))
        .localCheckpoint(eager=True)
    )
    bounds = hourly.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {bucket}"))).alias("bucket")
    )
    keys = hourly.select(key_col).distinct()
    grid = keys.crossJoin(hours)
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # null-safe on the key: a NULL event_type is a real group (the grid
    # carries its row via distinct), but plain equality never matched it
    # back to its totals — the whole NULL series silently zeroed (r6)
    h = hourly.select(
        F.col(key_col).alias("_h_k"), F.col("bucket").alias("_h_b"), "total"
    )
    joined = grid.join(
        h,
        F.col(key_col).eqNullSafe(F.col("_h_k")) & (F.col("bucket") == F.col("_h_b")),
        "left",
    ).drop("_h_k", "_h_b")
    return joined.select(
        key_col,
        "bucket",
        F.round(F.coalesce(F.last("total", ignorenulls=True).over(w), F.lit(0)), 2)
        .cast("double")
        .alias("value_filled"),
        F.col("total").isNull().alias("was_gap"),
    )


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches stage k iff they have a
    stage-k event strictly after their (greedy, earliest-completion)
    stage-(k-1) time. Returns one row: n_<stage> per stage.

    Greedy semantics (first qualifying event per stage) make the result
    a pure function of the event set. Each stage reduces to one narrow
    (user, ts) row per user before the next join.
    """
    if not stages:
        raise ValueError("funnel_counts needs at least one stage")
    # Single-consumption chain (r13 batch 9, guide §5): the previous
    # shape joined each stage's frame into BOTH the next stage and a
    # separate per_user outcome join, so stage k's subtree (scan +
    # aggregate) re-executed (len(stages) - k) times per action — 6
    # events scans for 3 stages. Each stage now LEFT-joins its events
    # onto the running (u, t0..t_{k-1}) frame and extends it with
    # t_k = min(t | t > t_{k-1}) in one grouped aggregate, so every
    # stage subtree is consumed exactly once and the outcome frame IS
    # the chain's tail. Semantics unchanged: a user missing stage k
    # gets a NULL t_k (no rows survive the when()), exactly like the
    # old inner-join-then-left-join shape, and NULL t_{k-1} propagates
    # (t > NULL is never true).
    per_user: DataFrame | None = None
    for i, stage in enumerate(stages):
        ev = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("_eu"), F.col(ts_col).alias("t")
        )
        if per_user is None:
            per_user = (
                ev.groupBy(F.col("_eu").alias("u")).agg(F.min("t").alias("t0"))
            )
        else:
            prev = [f"t{j}" for j in range(i)]
            per_user = (
                per_user.join(ev, per_user["u"] == ev["_eu"], "left")
                .groupBy("u", *prev)
                .agg(
                    F.min(
                        F.when(F.col("t") > F.col(f"t{i - 1}"), F.col("t"))
                    ).alias(f"t{i}")
                )
            )
    return per_user.agg(
        *[F.count(F.col(f"t{i}")).alias(f"n_{s}") for i, s in enumerate(stages)]
    )


def retention_cohorts(
    events: DataFrame,
    offsets: tuple[int, ...] = (7, 14),
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity day;
    for each offset d, how many were active exactly d days later.

    Returns (cohort_day, n_users, n_day<d>...). Exact-day equality
    joins only (no ranges): distinct (user, day) equi-joined against
    (user, cohort_day + d).
    """
    day = F.to_date(F.col(ts_col))
    # Two shuffles total (r13 batch 9, guide §2.3/§5): the previous
    # semi-join shape consumed the distinct (user, day) frame through
    # 1 + 2·|offsets| subtrees — five full events scans + distincts for
    # two offsets. Per user, one grouped aggregate now yields the
    # cohort day AND the (bounded: ≤ days-since-launch) set of active
    # days; each offset is then an array_contains indicator summed in
    # the per-cohort rollup. Exact-equality semantics unchanged: a user
    # retains at offset d iff (d0 + d) is among their active days.
    per_user = (
        events.select(F.col(user_col).alias("u"), day.alias("d"))
        .groupBy("u")
        .agg(F.min("d").alias("d0"), F.collect_set("d").alias("days"))
    )
    # the isNotNull guard replicates the semi-join shape exactly: a
    # NULL user id was counted in its cohort's n_users but could never
    # equi-match itself back, so it never retained
    aggs = [F.count(F.lit(1)).alias("n_users")] + [
        F.coalesce(
            F.sum(
                (
                    F.col("u").isNotNull()
                    & F.array_contains(F.col("days"), F.date_add(F.col("d0"), off))
                ).cast("int")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias(f"n_day{off}")
        for off in offsets
    ]
    out = per_user.groupBy("d0").agg(*aggs)
    cols = [F.col("d0").cast("timestamp").alias("cohort_day"), F.col("n_users")] + [
        F.col(f"n_day{o}") for o in offsets
    ]
    return out.select(*cols)


def hourly_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Z-score anomaly flags over the bucketed series: an hour is
    anomalous for a key when its total deviates more than ``threshold``
    population standard deviations from that key's mean hourly total.

    One aggregation to build the series, one window per key to attach
    the mean/stddev — the window input is the rollup (|keys| x |hours|
    rows), never the events. Returns only the anomalous
    (key, bucket, total, z) rows, z rounded for engine-stable output.

    Engine-determinism note (this powers a cross-engine gate): mean
    and stddev are derived from EXACT decimal sums (S, SS) — never
    from avg()/stddev_pop() over doubles, whose result depends on
    summation order — then the same IEEE formula produces
    bit-identical mu/sigma/z in any engine fed the same series.
    """
    tot_dec = F.sum(F.col(value_col).cast("decimal(14,4)")).alias("total_dec")
    hourly = events.groupBy(
        F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(tot_dec)
    w = Window.partitionBy(key_col)
    s = F.sum("total_dec").over(w).cast("double")
    # square a decimal(18,4): its ideal product type (37,8) fits inside
    # Spark's 38-digit cap, so the square stays EXACT. Squaring the
    # window-sum's decimal(24,4) directly truncated to decimal(38,6)
    # under allowPrecisionLoss — a silent scale-6 rounding DuckDB's
    # exact scale-8 square doesn't do (r6 review; cross-engine gate).
    # Domain: hourly totals < 10^14, far beyond any gate corpus.
    sq = F.col("total_dec").cast("decimal(18,4)")
    ss = F.sum((sq * sq).cast("decimal(38,8)")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    stats = hourly.select(
        key_col,
        "bucket",
        F.col("total_dec").cast("double").alias("total"),
        (s / n).alias("mu"),
        F.sqrt((ss - s * s / n) / n).alias("sigma"),
    )
    return stats.filter(
        (F.col("sigma") > 0) & (F.abs(F.col("total") - F.col("mu")) > threshold * F.col("sigma"))
    ).select(
        key_col,
        "bucket",
        F.round("total", 2).alias("total"),
        F.round((F.col("total") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
    )
