"""Fuzzy join: recall-1.0 property vs a brute-force reference on random
strings (incl. strings shorter than the q-gram guarantee), collision
guard, and the stop-gram cap's documented recall tradeoff."""

from __future__ import annotations

import random

import pytest

from icegopher_spark.operators.linkage import fuzzy_join, fuzzy_self_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def vocab():
    rng = random.Random(99)
    alpha = "abcde"  # tiny alphabet → dense near-neighbor structure
    base = ["".join(rng.choices(alpha, k=rng.randint(1, 12))) for _ in range(80)]
    # guarantee some true matches: 1-2 edit corruptions of base strings
    corr = []
    for s in base[:40]:
        t = list(s)
        if t:
            t[rng.randrange(len(t))] = rng.choice(alpha)
        corr.append("".join(t) + (rng.choice(alpha) if rng.random() < 0.5 else ""))
    return sorted(set(base)), sorted(set(corr))


@pytest.mark.parametrize("d,q", [(1, 3), (2, 3), (2, 2)])
def test_fuzzy_join_recall_one_vs_bruteforce(spark, vocab, d, q):
    base, corr = vocab
    left = spark.createDataFrame([(s,) for s in corr], "lname string")
    right = spark.createDataFrame([(s,) for s in base], "rname string")
    got = {
        (r["lname"], r["rname"], r["distance"])
        for r in fuzzy_join(left, right, "lname", "rname", d, q=q).collect()
    }
    expect = {
        (a, b, _lev(a, b)) for a in corr for b in base if _lev(a, b) <= d
    }
    assert got == expect


def test_self_pairs_vs_bruteforce(spark, vocab):
    base, _ = vocab
    df = spark.createDataFrame([(s,) for s in base], "name string")
    got = {
        (r["value_a"], r["value_b"], r["distance"])
        for r in fuzzy_self_pairs(df, "name", max_distance=2, q=3).collect()
    }
    expect = {
        (a, b, _lev(a, b))
        for a in base
        for b in base
        if a < b and _lev(a, b) <= 2
    }
    assert got == expect


def test_short_strings_still_match(spark):
    # len < q*(d+1): no shared gram possible — the short×short block
    left = spark.createDataFrame([("ab",), ("a",)], "l string")
    right = spark.createDataFrame([("ba",), ("",)], "r string")
    got = {
        (r["l"], r["r"])
        for r in fuzzy_join(left, right, "l", "r", 2, q=3).collect()
    }
    assert ("ab", "ba") in got and ("a", "") in got


def test_duplicates_join_per_row_not_per_value(spark):
    left = spark.createDataFrame([(1, "abc"), (2, "abc")], "id long, l string")
    right = spark.createDataFrame([("abd",)], "r string")
    rows = fuzzy_join(left, right, "l", "r", 1, q=2).collect()
    assert sorted(r["id"] for r in rows) == [1, 2]


def test_column_collision_rejected(spark):
    df = spark.createDataFrame([("x",)], "name string")
    with pytest.raises(ValueError, match="collision"):
        fuzzy_join(df, df, "name", "name", 1)


def test_stop_gram_cap_trades_recall_not_precision(spark, vocab):
    base, corr = vocab
    left = spark.createDataFrame([(s,) for s in corr], "lname string")
    right = spark.createDataFrame([(s,) for s in base], "rname string")
    capped = {
        (r["lname"], r["rname"])
        for r in fuzzy_join(
            left, right, "lname", "rname", 2, q=2, max_gram_freq=3
        ).collect()
    }
    exact = {
        (a, b) for a in corr for b in base if _lev(a, b) <= 2
    }
    # never a false positive; may miss pairs (documented tradeoff)
    assert capped <= exact


def test_three_tier_coverage_edges(spark):
    """Pairs that each tier uniquely covers: ultra (both <= d, share no
    char), mid (share a char but no q-gram), long (share a q-gram)."""
    left = spark.createDataFrame([("xy",), ("abcde",), ("abcdefghij",)], "l string")
    right = spark.createDataFrame([("zw",), ("abdce",), ("abcdefghXj",)], "r string")
    got = {
        (r["l"], r["r"])
        for r in fuzzy_join(left, right, "l", "r", 2, q=3).collect()
    }
    assert ("xy", "zw") in got          # ultra: distance 2, zero shared chars
    assert ("abcde", "abdce") in got    # mid: transposition, no shared 3-gram run needed
    assert ("abcdefghij", "abcdefghXj") in got  # long: q-gram tier


def test_empty_string_matches_ultra_short(spark):
    left = spark.createDataFrame([("",)], "l string")
    right = spark.createDataFrame([("ab",), ("abc",)], "r string")
    got = {
        (r["l"], r["r"], r["distance"])
        for r in fuzzy_join(left, right, "l", "r", 2, q=3).collect()
    }
    # "" -> "ab" is 2 inserts (= d); "" -> "abc" is 3 (> d)
    assert got == {("", "ab", 2)}


def test_distance_column_collision_guard(spark):
    l = spark.createDataFrame([("a", 1)], "name string, distance int")
    r = spark.createDataFrame([("b",)], "other string")
    import pytest as _p

    with _p.raises(ValueError, match="'distance' column"):
        fuzzy_join(l, r, "name", "other", 1)
