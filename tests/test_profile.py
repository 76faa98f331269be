"""Profiler + PSI drift: approx-vs-exact NDV bound, mixed types,
PSI invariants (0 for identical data, positive and large for a shift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icegopher_spark.operators.profile import drift_psi, profile_columns

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_profile_exact_counts(spark, orders):
    rows = {
        r["column"]: r
        for r in profile_columns(
            orders, ["o_orderkey", "o_orderpriority"], mode="exact"
        ).collect()
    }
    n = orders.count()
    assert rows["o_orderkey"]["n_rows"] == n
    assert rows["o_orderkey"]["n_nulls"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderpriority"]["mean"] is None  # non-numeric
    assert rows["o_orderpriority"]["min_value"] == "1-URGENT"
    assert rows["o_orderpriority"]["max_value"] == "5-LOW"


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 5.0), (None, 7.0)], "a int, b double"
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert rows["a"]["n_nulls"] == 1 and rows["a"]["n_distinct"] == 3
    assert rows["b"]["n_nulls"] == 1 and rows["b"]["n_distinct"] == 2
    assert rows["b"]["mean"] == pytest.approx((5 + 5 + 7) / 3, abs=1e-4)


def test_profile_approx_within_rsd(spark, orders):
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile_columns(orders, ["o_custkey"], mode="exact").collect()
    }
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_columns(
            orders, ["o_custkey"], mode="approx", approx_rsd=0.02
        ).collect()
    }
    nd, na = exact["o_custkey"], approx["o_custkey"]
    assert abs(na - nd) <= max(5, 0.1 * nd)  # 5× rsd safety margin


def test_profile_rejects_bad_input(spark, orders):
    with pytest.raises(ValueError, match="mode"):
        profile_columns(orders, mode="maybe")
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_columns(orders, ["nope"])


def test_psi_zero_for_identical(spark, orders):
    df = orders.select("o_totalprice")
    [r] = drift_psi(df, df, "o_totalprice").collect()
    assert r["psi"] == 0.0
    assert r["n_ref"] == r["n_cur"]


def test_psi_detects_shift(spark):
    import random

    rng = random.Random(7)
    ref = spark.createDataFrame([(rng.gauss(0, 1),) for _ in range(2000)], "v double")
    same = spark.createDataFrame([(rng.gauss(0, 1),) for _ in range(2000)], "v double")
    shifted = spark.createDataFrame(
        [(rng.gauss(2.5, 1),) for _ in range(2000)], "v double"
    )
    [stable] = drift_psi(ref, same, "v").collect()
    [moved] = drift_psi(ref, shifted, "v").collect()
    assert stable["psi"] < 0.1  # same distribution: conventional "stable"
    assert moved["psi"] > 0.25  # 2.5σ shift: conventional "action"


def test_psi_grouped_keys_kept(spark):
    ref = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(100)]
        + [("b", float(i % 10)) for i in range(100)],
        "g string, v double",
    )
    cur = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(100)]
        + [("b", float(i % 3)) for i in range(100)],  # b drifts
        "g string, v double",
    )
    rows = {r["g"]: r["psi"] for r in drift_psi(ref, cur, "v", ["g"]).collect()}
    assert rows["a"] == 0.0
    assert rows["b"] > 0.25
