"""Range-join operators: semantics (half-open edges, exactly-once
pairs, left join) checked against a naive nested-loop reference on
random data, and the no-BNLJ plan property pinned."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from icegopher_spark.operators.interval import (
    interval_overlap_join,
    point_interval_join,
)


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


@pytest.fixture(scope="module")
def rng_data(spark):
    rng = random.Random(42)
    points = [(i, rng.uniform(0, 100.0), i % 4) for i in range(300)]
    intervals = []
    for j in range(60):
        s = rng.uniform(-5, 95.0)
        intervals.append((j, s, s + rng.uniform(0, 12.0), j % 4))
    p = spark.createDataFrame(points, "pid long, x double, k long")
    iv = spark.createDataFrame(intervals, "iid long, s double, e double, k long")
    return points, intervals, p, iv


@pytest.mark.parametrize("width", [1.0, 5.0, 50.0])
def test_point_interval_matches_nested_loop(rng_data, width):
    points, intervals, p, iv = rng_data
    expect = {
        (pid, iid)
        for pid, x, pk in points
        for iid, s, e, ik in intervals
        if s <= x < e
    }
    got = {
        (r["pid"], r["iid"])
        for r in point_interval_join(
            p.drop("k"), iv.drop("k"), "x", "s", "e", width
        ).collect()
    }
    assert got == expect  # exactly-once, no dedup pass needed


def test_point_interval_with_key_and_left(rng_data):
    points, intervals, p, iv = rng_data
    expect = {
        (pid, iid)
        for pid, x, pk in points
        for iid, s, e, ik in intervals
        if s <= x < e and pk == ik
    }
    inner = point_interval_join(p, iv, "x", "s", "e", 5.0, on=["k"])
    assert {(r["pid"], r["iid"]) for r in inner.collect()} == expect

    left = point_interval_join(p, iv, "x", "s", "e", 5.0, on=["k"], how="left")
    rows = left.collect()
    matched = {r["pid"] for r in rows if r["iid"] is not None}
    unmatched = {r["pid"] for r in rows if r["iid"] is None}
    assert matched == {a for a, _ in expect}
    assert unmatched == {pid for pid, _, _ in points} - matched
    assert len(rows) == len(expect) + len(unmatched)


def test_half_open_edges(spark):
    p = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid long, x double")
    iv = spark.createDataFrame([(7, 10.0, 20.0)], "iid long, s double, e double")
    got = point_interval_join(p, iv, "x", "s", "e", 10.0).collect()
    # start inclusive, end exclusive
    assert [r["pid"] for r in got] == [1]


def test_empty_and_negative_intervals_match_nothing(spark):
    p = spark.createDataFrame([(1, 10.0)], "pid long, x double")
    iv = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 12.0, 8.0)], "iid long, s double, e double"
    )
    assert point_interval_join(p, iv, "x", "s", "e", 1.0).count() == 0


def test_column_collision_rejected(spark):
    p = spark.createDataFrame([(1, 1.0)], "pid long, x double")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "pid long, s double, e double")
    with pytest.raises(ValueError, match="collision"):
        point_interval_join(p, iv, "x", "s", "e", 1.0)


@pytest.mark.parametrize("width", [2.0, 13.0])
def test_overlap_join_matches_nested_loop(rng_data, width):
    _, intervals, _, iv = rng_data
    expect = {
        (a[0], b[0])
        for a in intervals
        for b in intervals
        if a[0] < b[0] and a[3] == b[3] and a[1] < b[2] and b[1] < a[2]
    }
    left = iv.select(
        F.col("iid").alias("i1"), F.col("s").alias("s1"), F.col("e").alias("e1"), "k"
    )
    right = iv.select(
        F.col("iid").alias("i2"), F.col("s").alias("s2"), F.col("e").alias("e2"), "k"
    )
    got_rows = interval_overlap_join(
        left, right, ("s1", "e1"), ("s2", "e2"), width, on=["k"],
        antisymmetric_key=("i1", "i2"),
    ).collect()
    got = [(r["i1"], r["i2"]) for r in got_rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == expect


def test_no_nested_loop_in_plan(rng_data):
    _, _, p, iv = rng_data
    plan = _plan(point_interval_join(p.drop("k"), iv.drop("k"), "x", "s", "e", 5.0))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    left = iv.select(
        F.col("iid").alias("i1"), F.col("s").alias("s1"), F.col("e").alias("e1"), "k"
    )
    right = iv.select(
        F.col("iid").alias("i2"), F.col("s").alias("s2"), F.col("e").alias("e2"), "k"
    )
    plan2 = _plan(
        interval_overlap_join(
            left, right, ("s1", "e1"), ("s2", "e2"), 5.0, on=["k"]
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan2
    assert "CartesianProduct" not in plan2
