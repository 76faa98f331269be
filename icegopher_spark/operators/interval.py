"""Range joins (point-in-interval and interval-overlap) as bucketized
equi-joins.

Spark has no native range join: a raw inequality condition runs as a
BroadcastNestedLoopJoin (or a cartesian product when neither side
fits in memory) — O(N·M) compares and a single-task disaster at
100 TB.  The scalable re-expression is the classic *bin join* (the
same technique behind Databricks' RANGE_JOIN hint and KDB's window
joins): quantize the range dimension into fixed-width buckets, explode
each interval to the buckets it covers, and equi-join on the bucket id
plus any equality keys, with the exact range predicate as a residual
filter.  Every pair then meets in a hash join:

  * a point lives in exactly ONE bucket → point-interval pairs are
    emitted exactly once, no dedup pass;
  * two intervals meet in every shared bucket → overlap pairs keep
    only the bucket containing ``greatest(a.start, b.start)``, which
    both explosions are guaranteed to cover, so each pair survives
    exactly once without a distinct.

Cost model: the interval side inflates by ceil(len/width) rows.  Pick
``bucket_width`` near the TYPICAL interval length — width ≪ length
explodes the build side, width ≫ length turns the residual filter
into the whole join.  The explode is a generator (no shuffle); the
join shuffles (or broadcasts) on (keys…, bucket) like any equi-join,
so AQE's skew handling applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["point_interval_join", "interval_overlap_join"]


def _as_double(c: Column) -> Column:
    """Range dimension → double: timestamps become epoch seconds,
    numerics pass through (DATE columns: cast to timestamp first —
    Spark has no date→double cast). One numeric domain keeps the
    bucket math uniform."""
    return c.cast("double")


def _bucket(c: Column, width: float) -> Column:
    return F.floor(_as_double(c) / F.lit(width)).cast("long")


def _explode_buckets(
    df: DataFrame, start: str, end: str, width: float, out: str
) -> DataFrame:
    """One row per bucket the half-open interval [start, end) covers.
    ``sequence`` is a JVM-side generator — no Python, no shuffle.
    Empty/negative intervals (end <= start) vanish here, which is the
    correct join result for them."""
    first = _bucket(F.col(start), width)
    # half-open: a point equal to `end` does NOT match, so the last
    # bucket is the one containing the largest value < end
    last = F.floor(
        (_as_double(F.col(end)) - F.lit(1e-9)) / F.lit(width)
    ).cast("long")
    return df.where(_as_double(F.col(end)) > _as_double(F.col(start))).withColumn(
        out, F.explode(F.sequence(first, last))
    )


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose half-open range
    ``[start_col, end_col)`` contains ``point_col`` (plus optional
    equality keys ``on``).  ``how`` ∈ {inner, left}: left keeps
    unmatched points with null interval columns.

    Returns points.* + intervals.* (minus duplicated key columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on or [])
    dup = set(points.columns) & (set(intervals.columns) - set(on))
    if dup:
        raise ValueError(
            f"column name collision between sides: {sorted(dup)} — "
            "rename before joining"
        )

    b = "__range_bucket"
    p = points.withColumn(b, _bucket(F.col(point_col), bucket_width))
    iv = _explode_buckets(intervals, start_col, end_col, bucket_width, b)
    cond = [p[k] == iv[k] for k in on] + [
        p[b] == iv[b],
        _as_double(p[point_col]) >= _as_double(iv[start_col]),
        _as_double(p[point_col]) < _as_double(iv[end_col]),
    ]
    joined = p.join(iv, cond, how)
    keep = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bucket_width: float,
    on: list[str] | None = None,
    antisymmetric_key: tuple[str, str] | None = None,
) -> DataFrame:
    """Pairs (l, r) whose half-open ranges overlap:
    ``l.start < r.end AND r.start < l.end`` (plus equality keys).

    Each overlapping pair meets in every shared bucket; only the
    bucket containing ``greatest(l.start, r.start)`` survives, so the
    output is exactly-once WITHOUT a distinct (that dedup shuffle
    would dwarf the join at scale).  ``antisymmetric_key=(lcol, rcol)``
    additionally keeps only ``l[lcol] < r[rcol]`` — the usual self-join
    guard emitting each unordered pair once.
    """
    on = list(on or [])
    ls, le = left_range
    rs, re_ = right_range
    dup = set(left.columns) & (set(right.columns) - set(on))
    if dup:
        raise ValueError(
            f"column name collision between sides: {sorted(dup)} — "
            "rename before joining"
        )

    bl, br = "__bucket_l", "__bucket_r"
    lx = _explode_buckets(left, ls, le, bucket_width, bl)
    rx = _explode_buckets(right, rs, re_, bucket_width, br)
    cond = [lx[k] == rx[k] for k in on] + [
        lx[bl] == rx[br],
        _as_double(lx[ls]) < _as_double(rx[re_]),
        _as_double(rx[rs]) < _as_double(lx[le]),
        # exactly-once: the overlap's first bucket
        lx[bl]
        == F.floor(
            F.greatest(_as_double(lx[ls]), _as_double(rx[rs])) / F.lit(bucket_width)
        ).cast("long"),
    ]
    if antisymmetric_key is not None:
        lk, rk = antisymmetric_key
        cond.append(lx[lk] < rx[rk])
    joined = lx.join(rx, cond, "inner")
    keep = [lx[c] for c in left.columns] + [
        rx[c] for c in right.columns if c not in on
    ]
    return joined.select(*keep)
