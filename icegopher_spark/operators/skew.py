"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in the session factory) handles
most runtime skew; this module is the EXPLICIT tool for the cases AQE
can't fix: a priori known hot keys (power-law user_ids, null-heavy
foreign keys) where even one map task's input for a single key exceeds
a partition, or where the skewed side feeds a mandatory shuffle that
AQE only splits after materializing.

``salted_join`` rewrites `left ⋈ right ON key` as

    left:  key → (key, salt = hash(row) % S)
    right: key → explode to all S salts
    join on (key, salt)

so one hot key's rows spread over S reducers. Cost: the right side
replicates ×S — use with a small-to-medium right side and S sized to
the worst key (rows_of_hottest_key / target_rows_per_task). The salt is
round-robin within each input partition (monotonically_increasing_id,
no Math.random): content-derived salts gave IDENTICAL rows identical
salts, so a hot key made of duplicate rows — the null-heavy-FK shape
this module exists for — still funneled through one reducer (r6
review). Join correctness never depends on the salt value, and a task
replay re-reads its partition in the same order, so retries stay
consistent within the attempt.

The reference has no execution engine; this is [X] scale
infrastructure (SURVEY.md §4: skew → salting or AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join; result is column-identical to
    ``left.join(right, on, how)``.

    Supported ``how``: inner / left — the salted right side replicates
    rows, which is transparent for these join types because every
    (key, salt) bucket sees the full right payload for the key.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    # round-robin per-row salt on the LEFT (the big/skewed side) —
    # spreads even byte-identical duplicate rows of a hot key
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    lhs = left.withColumn(SALT_COL, salt)

    rhs = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(s) for s in range(num_salts)]))
    )
    # Force a SHUFFLED hash join on the salted key (guide §3.1): the
    # whole point of salting is to spread a hot key's rows over
    # num_salts reduce partitions, which only happens when both sides
    # hash-partition on (key, salt). Left to itself the planner
    # broadcast-joins whenever the exploded right side fits under the
    # threshold — a num_salts-times-larger single-threaded hash
    # relation build that the salting buys nothing for (measured 2.2 s
    # of a 2.4 s gate at sf0.1). The hint builds the hash table from
    # the smaller per-partition right slice in parallel instead.
    out = lhs.join(rhs.hint("shuffle_hash"), keys + [SALT_COL], how)
    return out.drop(SALT_COL)
