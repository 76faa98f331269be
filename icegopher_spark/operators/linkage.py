"""Entity resolution: fuzzy (edit-distance) joins without all-pairs.

A naive fuzzy join is a cartesian product with a ``levenshtein() <= d``
filter — O(N·M) string comparisons and a BNLJ plan.  The scalable
shape, same family as the n-gram Jaccard dedup (`dedup.py`):

  1. work on DISTINCT strings — candidate generation cost scales with
     vocabulary, not corpus; originals re-attach with hash joins at
     the end;
  2. q-gram inverted index: two strings within edit distance ``d``
     share at least ``max(len) − q + 1 − d·q`` positional q-grams, so
     whenever ``max(len) ≥ q·(d+1)`` they share ≥ 1 gram and meet in
     an equi-join on the gram;
  3. the few strings SHORTER than ``q·(d+1)`` can be within distance
     ``d`` while sharing no gram — they pair up in a bounded
     short×short cross join instead (a partner of a short string is
     at most ``d`` longer, hence also short: the block is vocabulary-
     tiny by construction, and it broadcasts);
  4. exact ``levenshtein`` verification (JVM codegen, no UDF) with a
     length pre-filter ``|len(s) − len(t)| ≤ d``.

Skew note: a gram shared by K distinct strings contributes K² candidate
rows ("Customer#" prefixes, common words).  ``max_gram_freq`` drops
grams above a document frequency cap — opt-in, because dropping grams
weakens the ≥1-shared-gram guarantee to "≥1 shared NON-STOP gram"
(documented recall tradeoff, exactly like dedup.py's stop-shingle cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join", "fuzzy_self_pairs"]


def _gram_array(col: str, q: int):
    """Distinct positional q-grams of a string column as an array
    (empty when len < q — guard needed because sequence(1, 0) in Spark
    infers step -1 and would emit bogus pseudo-grams). sequence() +
    transform() + substr stay in codegen — no Python."""
    s = F.col(col)
    n = F.length(s) - (q - 1)
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: s.substr(i, F.lit(q)))
    )
    return F.when(n >= 1, grams).otherwise(F.array().cast("array<string>"))


def _candidate_pairs(
    vocab_l: DataFrame,
    vocab_r: DataFrame,
    max_distance: int,
    q: int,
    max_gram_freq: int | None,
) -> DataFrame:
    """Distinct candidate (s, t) pairs over the two vocabularies
    (columns: __s / __t), guaranteed to contain every pair within
    edit distance ``max_distance`` (when max_gram_freq is None).

    Three disjoint tiers keyed on the PAIR's max(len) (d = distance):
      * max(len) ≥ q·(d+1): q-gram equi-join — the count bound
        ``shared ≥ max(len) − q + 1 − d·q ≥ 1`` guarantees a meeting
        gram, and the shorter side (≥ max(len) − d ≥ q) has grams;
      * d < max(len) < q·(d+1): 1-gram (character) equi-join — the
        q=1 bound gives ``shared chars ≥ max(len) − d ≥ 1``;
      * max(len) ≤ d: EVERY pair is within distance d (delete one
        string, insert the other), so the all-pairs block here is the
        answer itself, not a shortcut — and it only holds strings of
        ≤ d characters, a set that is tiny by construction.
    """
    d = max_distance
    long_cut = q * (d + 1)

    def _tier_join(gl, gr, lo_excl: int, hi_incl: int | None) -> DataFrame:
        mx = F.greatest(F.length("__s"), F.length("__t"))
        cond = mx > lo_excl if hi_incl is None else (mx > lo_excl) & (mx <= hi_incl)
        return gl.join(gr, "g").where(cond).select("__s", "__t")

    def _grams(df, col, qq):
        return df.select(F.col(col), F.explode(_gram_array(col, qq)).alias("g"))

    lq, rq = _grams(vocab_l, "__s", q), _grams(vocab_r, "__t", q)
    if max_gram_freq is not None:
        # document frequency over BOTH sides: a gram ultra-frequent on
        # only one side still explodes the index (self-review r9)
        freq = (
            lq.select("g").unionByName(rq.select("g"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("nf"))
            .filter(F.col("nf") > max_gram_freq)
            .select("g")
        )
        lq = lq.join(freq, "g", "left_anti")
        rq = rq.join(freq, "g", "left_anti")
    long_pairs = _tier_join(lq, rq, long_cut - 1, None)

    mid_l = vocab_l.where(F.length("__s") < long_cut)
    mid_r = vocab_r.where(F.length("__t") < long_cut)
    mid_pairs = _tier_join(
        _grams(mid_l, "__s", 1), _grams(mid_r, "__t", 1), d, long_cut - 1
    )

    ultra_l = vocab_l.where(F.length("__s") <= d)
    ultra_r = vocab_r.where(F.length("__t") <= d)
    ultra_pairs = ultra_l.crossJoin(F.broadcast(ultra_r)).select("__s", "__t")

    return (
        long_pairs.unionByName(mid_pairs).unionByName(ultra_pairs).distinct()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    q: int = 3,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Inner join of ``left`` × ``right`` on
    ``levenshtein(left_col, right_col) <= max_distance``, returning
    left.* + right.* + ``distance`` — without a cartesian product.

    Exact (recall 1.0) when ``max_gram_freq`` is None; setting it
    trades recall on pairs whose ONLY shared grams are ultra-frequent
    for an upper bound on index skew.
    """
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(
            f"column name collision between sides: {sorted(dup)} — rename first"
        )
    if "distance" in left.columns or "distance" in right.columns:
        raise ValueError(
            "a 'distance' column already exists on an input; rename it — "
            "fuzzy_join appends its own"
        )
    vl = left.select(F.col(left_col).alias("__s")).where(
        F.col("__s").isNotNull()
    ).distinct()
    vr = right.select(F.col(right_col).alias("__t")).where(
        F.col("__t").isNotNull()
    ).distinct()
    cand = _candidate_pairs(vl, vr, max_distance, q, max_gram_freq)
    verified = (
        cand.where(
            F.abs(F.length("__s") - F.length("__t")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("__s", "__t"))
        .where(F.col("distance") <= max_distance)
    )
    out = left.join(verified, left[left_col] == verified["__s"]).join(
        right, verified["__t"] == right[right_col]
    )
    return out.select(*left.columns, *right.columns, "distance")


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    max_distance: int = 2,
    q: int = 3,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Unordered pairs of DISTINCT values of ``col`` within edit
    distance (excluding identical values): (value_a, value_b,
    distance) with value_a < value_b — the near-duplicate-name report.
    """
    v = df.select(F.col(col).alias("__s")).where(F.col("__s").isNotNull()).distinct()
    cand = _candidate_pairs(
        v, v.select(F.col("__s").alias("__t")), max_distance, q, max_gram_freq
    )
    return (
        cand.where(F.col("__s") < F.col("__t"))
        .where(F.abs(F.length("__s") - F.length("__t")) <= max_distance)
        .withColumn("distance", F.levenshtein("__s", "__t"))
        .where(F.col("distance") <= max_distance)
        .select(
            F.col("__s").alias("value_a"),
            F.col("__t").alias("value_b"),
            "distance",
        )
    )
