"""Training-data curation operators beyond scoring/dedup: sequence
packing and deterministic weighted sampling.

[X] extension surface (SURVEY.md §2.9) — no counterpart in the
reference, which has no data plane. Both operators are pure codegen
expressions (window cumsum / integer hashing): no UDFs, no driver
loops, and both have exact SQL oracles in the gate registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count

# Knuth multiplicative hash constant (2^32 / golden ratio), applied in
# exact 64-bit integer arithmetic so DuckDB reproduces it bit-for-bit.
_HASH_MULT = 2654435761
_HASH_MOD = 2**32
# Bucketing uses F.pmod so a negative id still lands in [0, 2^32) —
# Spark's sign-preserving % would make every negative bucket pass any
# `< threshold` filter. Cross-engine oracle equality (DuckDB's
# sign-preserving %) additionally requires ids nonnegative and small
# enough that id*MULT fits int64 (id < ~3.5e9): DuckDB promotes to
# HUGEINT where Spark wraps silently. All gate corpora satisfy both.


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins.

    Contiguous-fill packing: docs are sharded by hash (``doc_id %
    n_shards``) and packed in id order within each shard; a doc's bin
    is ``floor(cum_tokens_before / max_tokens)``. This is the
    streaming-packing strategy real pipelines use — each of the
    ``n_shards`` workers packs its shard independently, so the only
    shuffle is the shard partitioning and the window sort is per-shard,
    never global (a global orderBy would serialize the corpus through
    one task at 100 TB; at scale set n_shards ≈ executor count).

    Returns (doc_id, shard, bin_id, n_tokens).
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return toks.select(
        id_col,
        "shard",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(max_tokens)
        )
        .cast("bigint")
        .alias("bin_id"),
        "n_tokens",
    )


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group subsampling (training-mix reweighting):
    keep a row iff ``hash(id) < rate[group] * 2^32``, with a Knuth
    multiplicative hash in exact integer arithmetic.

    No RNG state, no sampling operator: the decision is a pure function
    of (id, group rate), so it is reproducible across engines, runs,
    and partitionings — and the filter is a codegen expression the
    scanner can evaluate, touching nothing but the id and group
    columns.
    """
    bucket = F.pmod(F.col(id_col).cast("bigint") * F.lit(_HASH_MULT), F.lit(_HASH_MOD))
    rate = F.lit(float(default_rate))
    for k, r in sorted(rates.items()):
        rate = F.when(F.col(key_col) == k, F.lit(float(r))).otherwise(rate)
    threshold = F.floor(rate * F.lit(float(_HASH_MOD))).cast("bigint")
    return df.filter(bucket < threshold)


def assign_splits(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: the id's Knuth-hash
    bucket falls into cumulative fraction ranges.

    The split is a pure function of the id — stable across runs,
    engines, partitionings, and corpus growth (a doc never changes
    split when new docs arrive, the property that keeps eval sets
    uncontaminated as a 100 TB corpus is re-snapshotted). Pure codegen:
    one integer multiply + compares, evaluable at the scan.

    Returns df plus a ``split`` column."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = F.pmod(F.col(id_col).cast("bigint") * F.lit(_HASH_MULT), F.lit(_HASH_MOD))
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        bound = F.lit(int(cum * _HASH_MOD))
        expr = F.when(bucket < bound, F.lit(name)) if expr is None else expr.when(
            bucket < bound, F.lit(name)
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    quota: int,
    key_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quota sampling: keep the ``quota`` rows with
    the smallest Knuth-hash buckets in each stratum (eval-set
    construction, per-language balancing).

    Unlike ``weighted_sample`` (rate-based, approximate counts) the
    quota is exact, and unlike ``df.sampleBy`` it is a pure function of
    the id — the same rows are chosen regardless of partitioning,
    engine, or corpus order, and re-running on a grown corpus only
    swaps rows whose hash displaces a previous member (bounded eval-set
    churn).

    Scale posture: the window sorts only (bucket, id) pairs — the
    projection drops every payload column before the shuffle, so a
    skewed stratum (``en`` at 60% of a 100 TB corpus) sorts 16-byte
    rows, not documents. Join the result back on ``id_col`` to recover
    payloads for the sampled slice only.

    Returns (id_col, key_col, sample_rank) with sample_rank in
    [1, quota] by hash order.
    """
    bucket = F.pmod(F.col(id_col).cast("bigint") * F.lit(_HASH_MULT), F.lit(_HASH_MOD))
    w = Window.partitionBy(key_col).orderBy("bucket", id_col)
    return (
        df.select(id_col, key_col)
        .withColumn("bucket", bucket)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= quota)
        .drop("bucket")
    )


def temperature_mix(
    df: DataFrame,
    target_num: int = 1,
    target_den: int = 2,
    key_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Square-root temperature mixture resampling (multilingual-LM
    training-mix reweighting): group g's share of the kept corpus is
    proportional to sqrt(n_g) instead of n_g, flattening head languages
    and boosting the tail; total kept ≈ ``target_num/target_den`` of
    the corpus.

    Exact-arithmetic construction (every step reproduces bit-for-bit in
    any engine): w_g = floor(sqrt(n_g)) (integer temperature weight;
    sqrt is correctly-rounded IEEE so the floor is exact), quota_g =
    (floor(N·num/den) · w_g) div Σw — all int64 — then each group keeps
    its quota_g members with the smallest Knuth-hash buckets (a group
    smaller than its boosted quota keeps all its rows — no replication).
    Selection is a pure function of the ids: stable across engines,
    runs, partitionings.

    Scale posture: one narrow count per group, the quota map is
    |groups|-sized (broadcast), and the per-group ranking window sorts
    payload-free (bucket, id) pairs — the stratified_sample shuffle
    shape. int64 exactness holds while target_total·w_g < 2^63 (a 1e12-
    row corpus with 1e6-row groups is ~1e18 — inside the bound).

    Returns (id_col, key_col) — the kept rows' identities.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    weights = counts.withColumn("w", F.floor(F.sqrt(F.col("n"))).cast("bigint"))
    tot = weights.agg(
        F.sum("n").alias("nn"), F.sum("w").alias("ws")
    )  # 1 row; cross join below broadcasts it
    quotas = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn(
            "quota",
            F.expr(f"((nn * {int(target_num)} div {int(target_den)}) * w) div ws"),
        )
        .select(key_col, "quota")
    )
    bucket = F.pmod(F.col(id_col).cast("bigint") * F.lit(_HASH_MULT), F.lit(_HASH_MOD))
    w = Window.partitionBy(key_col).orderBy("bucket", id_col)
    ranked = (
        df.select(id_col, key_col)
        .withColumn("bucket", bucket)
        .withColumn("r", F.row_number().over(w).cast("bigint"))
    )
    return (
        ranked.join(F.broadcast(quotas), key_col)
        .filter(F.col("r") <= F.col("quota"))
        .select(id_col, key_col)
    )


def length_trim(
    df: DataFrame,
    lo_pct: int = 5,
    hi_pct: int = 95,
    key_col: str = "lang",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Per-group outlier trimming by length percentile: drop each
    group's shortest ``lo_pct``% and longest ``100-hi_pct``% documents
    (the truncated-distribution cleaning step before training-mix
    assembly — clipped boilerplate stubs and runaway concatenations).

    Percentiles are defined by RANK, not interpolation: with r =
    row_number ordered by (length, id) and n = group size, a row is
    kept iff n·lo div 100 < r ≤ n·hi div 100 — pure integer
    arithmetic, so the kept set is identical in any engine (no
    percentile_cont interpolation or approx-quantile divergence).

    Scale posture: the ranking window sorts (length, id) pairs with the
    group key — payloads are projected away before the shuffle; join
    back on the id for surviving payloads.
    """
    w = Window.partitionBy(key_col).orderBy(len_col, id_col)
    return (
        df.select(id_col, key_col, len_col)
        .withColumn("r", F.row_number().over(w).cast("bigint"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        .filter(
            (F.col("r") > F.expr(f"(n * {int(lo_pct)}) div 100"))
            & (F.col("r") <= F.expr(f"(n * {int(hi_pct)}) div 100"))
        )
        .select(id_col, key_col, len_col)
    )
