"""Persisted IVF ANN index over an Iceberg table: cell-partitioned
write, partition-pruned probe scan, recall vs brute force."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("ivf") / "emb_ivf")
    return S.ivf_index_write(spark, corpus, loc, n_lists=8)


def test_index_layout(spark, index):
    t = index
    assert t.properties["ivf.n-lists"] == "8"
    # one partition dir per cell, all rows present
    df = t.scan().to_df(spark)
    assert df.count() == 500
    cells = sorted(r["cell"] for r in df.select("cell").distinct().collect())
    assert len(cells) >= 4  # kmeans found real structure
    # every cell's rows live in cell-partitioned files
    tasks = t.scan().plan_files()
    assert all("cell=" in task.file.file_path for task in tasks)


def test_probe_scan_is_partition_pruned(spark, index, corpus):
    from icegopher_spark.iceberg import expressions as E

    t = index
    all_files = len(t.scan().plan_files())
    pruned = t.scan(row_filter=E.is_in("cell", 0, 1)).plan_files()
    assert 0 < len(pruned) < all_files
    assert all(("cell=0" in p.file.file_path) or ("cell=1" in p.file.file_path) for p in pruned)


def test_search_recall_vs_bruteforce(spark, index, corpus):
    queries = corpus.limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = S.brute_force_topk(corpus, queries, k=5)
    approx = S.ivf_index_search(spark, index, queries, k=5, n_probe=4)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5  # near-uniform synthetic vectors, 4/8 cells probed
    # sanity: the index never returns the query itself
    assert all(q != v for q, v in ap)


def test_centroids_invariant_to_partitioning(spark, corpus):
    """The quantizer sample is a content-hash filter, not df.sample —
    centroids must not move when the corpus is repartitioned (ADVICE
    r3: sample(fraction, seed) folds in the partition index)."""
    a = S._kmeans_centroids(corpus.repartition(1), "embedding", 4, seed=42, sample_cap=100)
    b = S._kmeans_centroids(corpus.repartition(13), "embedding", 4, seed=42, sample_cap=100)
    assert a == b


def test_nearest_cells_arrow_bitmatch(spark, corpus):
    """The Arrow-batched cell assigner must pick the SAME cells as the
    round-4 literal-expression construction (bit-identical cosine fold),
    so the pinned recall gates cannot move."""
    cents = S._kmeans_centroids(corpus, "embedding", 8, 42)

    def literal_cells(vec, n):  # the replaced O(n_lists×dim)-literal plan
        dists = F.array(
            *[
                F.struct(
                    (-S.cosine(vec, F.array(*[F.lit(float(x)) for x in c]))).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(cents)
            ]
        )
        return F.slice(F.array_sort(dists), 1, n).getField("cell")

    got = corpus.select(
        "vec_id",
        S.nearest_cells_arrow(F.col("embedding"), cents, 3).alias("a"),
        literal_cells(F.col("embedding"), 3).alias("b"),
    ).collect()
    assert len(got) == 500
    for r in got:
        assert list(r.a) == list(r.b), r.vec_id


def test_nearest_cells_arrow_plan_bounded(spark, corpus):
    """Plan size must be independent of n_lists: at n_lists=1024 the
    old construction carried ~65k literal nodes; the UDF plan must stay
    small and still execute."""
    import numpy as np

    rng = np.random.default_rng(3)
    cents = rng.standard_normal((1024, 64)).tolist()
    df = corpus.limit(20).select(
        "vec_id", S.nearest_cells_arrow(F.col("embedding"), cents, 4).alias("cells")
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20_000, len(plan)
    rows = df.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.cells) == 4
        assert all(0 <= c < 1024 for c in r.cells)
