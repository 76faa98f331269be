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


def test_centroids_sidecar_keeps_metadata_small(spark, corpus, tmp_path_factory):
    """r9 verdict #2: centroids live in a content-hashed parquet
    sidecar, NOT in table properties — properties are copied into every
    metadata.json version and every LoadTable response forever, so a
    big-JSON codebook there is a metadata-plane scale landmine."""
    import json
    import os

    loc = str(tmp_path_factory.mktemp("ivf_meta") / "emb_ivf_sidecar")
    t = S.ivf_index_write(spark, corpus, loc, n_lists=32)

    assert "ivf.centroids" not in t.properties
    sidecar = t.properties["ivf.centroids-path"]
    assert "/metadata/ivf-centroids-" in sidecar and os.path.exists(sidecar)
    # every metadata.json version stays O(KB)
    mdir = os.path.join(loc, "metadata")
    for fn in os.listdir(mdir):
        if fn.endswith(".metadata.json"):
            size = os.path.getsize(os.path.join(mdir, fn))
            assert size < 64 * 1024, f"{fn} is {size}B — centroids leaked?"
    # the sidecar round-trips and matches what the search path uses
    cents = S.load_ivf_centroids(t)
    assert len(cents) == int(t.properties["ivf.n-lists"])

    # checksum verification: a corrupted sidecar refuses loudly
    with open(sidecar, "r+b") as f:
        f.seek(100)
        b = f.read(1)
        f.seek(100)
        f.write(bytes([b[0] ^ 0xFF]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="checksum"):
        S.load_ivf_centroids(t)


def test_legacy_centroids_property_still_loads():
    """kernel-v1 indexes (centroids JSON in properties) keep working."""
    import json

    class _T:
        properties = {"ivf.centroids": json.dumps([[1.0, 0.0], [0.0, 1.0]])}

    assert S.load_ivf_centroids(_T()) == [[1.0, 0.0], [0.0, 1.0]]


def test_hard_negatives_ivf_no_cartesian(spark, corpus):
    """r9 verdict #5: the large-corpus miner path routes candidates
    through the IVF cell equi-join — NO cartesian in the physical plan.
    Probing ALL cells makes IVF candidate-complete, so the result must
    equal the exact broadcast path row for row (same rounding, same
    tie-break) — parity is structural, not sampled."""
    emb = corpus.join(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "label"),
        "vec_id",
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    exact = S.hard_negatives(emb, q, k=3, method="broadcast")
    approx = S.hard_negatives(emb, q, k=3, method="ivf", n_lists=8, n_probe=8)

    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    ex = {tuple(r) for r in exact.collect()}
    ap = {tuple(r) for r in approx.collect()}
    assert ex == ap  # all-cells probe == exact, via a hash join only


def test_hard_negatives_auto_small_corpus_exact(spark, corpus):
    """auto picks the exact broadcast path under the threshold."""
    emb = corpus.join(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "label"),
        "vec_id",
    )
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    auto = {tuple(r) for r in S.hard_negatives(emb, q, k=2).collect()}
    exact = {tuple(r) for r in S.hard_negatives(emb, q, k=2, method="broadcast").collect()}
    assert auto == exact


# -- metadata-priced semdedup (r11 verdict task #3) ---------------------------


def test_metadata_row_count_exact_for_table_backed_frames(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = S._metadata_row_count(df)
    assert n == df.count()
    # survives column pruning and a repartition (the load() path shape)
    pruned = df.select("vec_id", "embedding").repartition(8)
    assert S._metadata_row_count(pruned) == n


def test_metadata_row_count_refuses_row_changing_plans(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert S._metadata_row_count(df.filter(F.col("vec_id") > 10)) is None
    assert S._metadata_row_count(df.limit(5)) is None
    assert S._metadata_row_count(df.join(df.select("vec_id"), "vec_id")) is None
    # ad-hoc local frames have no parquet files behind them
    assert S._metadata_row_count(spark.range(10).toDF("vec_id")) is None


def test_metadata_row_count_runs_no_spark_job(spark):
    """The pricing pass must be metadata-only for table-backed input:
    footers are read on the driver, no scan job is submitted."""
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    assert S._metadata_row_count(df) is not None
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "metadata pricing submitted a Spark job"


def test_semdedup_prices_table_backed_corpus_without_count(spark, corpus):
    """Poison the INPUT frame's count(): semdedup must price a pure
    table scan from footer metadata. (_kmeans_centroids' own count
    runs on a derived non-null frame — a different DataFrame object —
    so instance-level poisoning isolates exactly the pricing pass.)"""
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def boom():
        raise AssertionError("semdedup priced a table-backed corpus with count()")

    df.count = boom
    out = S.semdedup(df, threshold=0.99)
    assert {"id", "cluster", "keep"} <= set(out.columns)


def test_centroids_undercap_probe_matches_overcap_semantics(spark, corpus):
    """r13: the under-cap path collects via limit(cap+1) with no count
    job; because the probe only truncates when the corpus exceeds the
    cap, the under-cap sample is the complete set and centroids stay
    invariant to partitioning and to the cap as long as n <= cap."""
    a = S._kmeans_centroids(
        corpus.repartition(1), "embedding", 4, seed=42, sample_cap=1_000_000
    )
    b = S._kmeans_centroids(
        corpus.repartition(13), "embedding", 4, seed=42, sample_cap=2_000_000
    )
    assert a == b
