"""PageRank invariants: mass conservation, dangling redistribution,
agreement with a NumPy power iteration on a random graph."""

from __future__ import annotations

import random

import pytest

from icegopher_spark.operators.graph import pagerank


def test_rank_mass_conserved(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    rows = pagerank(edges, iterations=5).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_zero_iterations_uniform(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    rows = pagerank(edges, iterations=0).collect()
    assert all(r["rank"] == pytest.approx(1 / 3) for r in rows)


def test_dangling_mass_redistributed(spark):
    # b is dangling; without redistribution total mass decays
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    rows = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    assert rows["b"] > rows["a"]  # b receives a's full deterministic flow


def test_matches_numpy_power_iteration(spark):
    import numpy as np

    rng = random.Random(5)
    raw = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    # the operator's node universe is nodes APPEARING IN EDGES — use the
    # same universe in the reference (isolated ids would change N)
    ids = sorted({x for e in raw for x in e})
    ix = {v: i for i, v in enumerate(ids)}
    edges = [(ix[s], ix[t]) for s, t in raw]
    n = len(ids)
    d = 0.85
    it = 4
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(it):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    df = spark.createDataFrame(
        [(f"n{s}", f"n{t}") for s, t in edges], "src string, dst string"
    )
    got = {row["node"]: row["rank"] for row in pagerank(df, iterations=it).collect()}
    assert len(got) == n
    for i in range(n):
        assert got[f"n{i}"] == pytest.approx(r[i], abs=1e-9), i


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iterations=3).count() == 0
