"""Randomized differential test: seeded random operation sequences
(append / CoW delete / MOR delete / equality delete / merge upsert /
compaction / manifest rewrite) checked against a Python multiset model
after EVERY step, plus the changelog-replay invariant at the end.

This is the harness that caught the CoW-on-MOR resurrection bug —
single-op unit tests never compose operations deeply enough.
"""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.changelog import changelog_df
from icegopher_spark.iceberg.maintenance import compact_data_files, rewrite_manifests
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField, StringType

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "v", DoubleType(), False),
        NestedField(3, "tag", StringType(), False),
    ),
    schema_id=0,
)

TAGS = ["a", "b", "c"]


def _scan_counter(t, spark) -> Counter:
    return Counter(map(tuple, t.scan().to_df(spark).collect()))


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    next_k = [0]

    def fresh_rows(n):
        rows = [
            (next_k[0] + i, float(rng.randint(0, 9)), rng.choice(TAGS)) for i in range(n)
        ]
        next_k[0] += n
        return rows

    t = W.create_table(str(tmp_path / f"model_{seed}"), SCHEMA)
    model: Counter = Counter()

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v double, tag string").coalesce(1)

    # seed content
    rows = fresh_rows(30)
    t = W.append(t, df_of(rows))
    model.update(map(tuple, rows))

    for step in range(8):
        op = rng.choice(
            ["append", "cow_delete", "mor_delete", "dv_delete", "eq_delete", "merge", "compact", "rewrite"]
        )
        if op == "append":
            rows = fresh_rows(rng.randint(1, 10))
            t = W.append(t, df_of(rows))
            model.update(map(tuple, rows))
        elif op == "cow_delete":
            tag = rng.choice(TAGS)
            t = W.delete_where(t, spark, E.equal_to("tag", tag))
            model = Counter({r: c for r, c in model.items() if r[2] != tag})
        elif op == "mor_delete":
            cut = rng.randint(0, next_k[0])
            t = W.delete_where_mor(t, spark, E.less_than("k", cut))
            model = Counter({r: c for r, c in model.items() if r[0] >= cut})
        elif op == "dv_delete":
            # V3 deletion vectors composed with every other op kind —
            # including on top of / under V2 positional deletes
            lo = rng.randint(0, max(next_k[0] - 1, 0))
            hi = lo + rng.randint(1, 8)
            t = W.delete_where_dv(
                t, spark, E.greater_than_or_equal("k", lo) & E.less_than("k", hi)
            )
            model = Counter({r: c for r, c in model.items() if not (lo <= r[0] < hi)})
        elif op == "eq_delete":
            ks = [r[0] for r in model][: rng.randint(1, 5)]
            if not ks:
                continue
            t = W.delete_keys(t, spark, df_of([(k, 0.0, "x") for k in ks]).select("k"), ["k"])
            model = Counter({r: c for r, c in model.items() if r[0] not in set(ks)})
        elif op == "merge":
            existing = [r[0] for r in model][: rng.randint(1, 4)]
            new = [next_k[0] + 1000 + i for i in range(rng.randint(1, 3))]
            src_rows = [(k, 111.0, "m") for k in [*existing, *new]]
            t = W.merge_upsert(t, spark, df_of(src_rows), ["k"])
            keys = {k for k, _, _ in src_rows}
            model = Counter({r: c for r, c in model.items() if r[0] not in keys})
            model.update(map(tuple, src_rows))
        elif op == "compact":
            t = compact_data_files(
                t, spark, target_file_size=1 << 20, small_file_threshold=1 << 20
            )
        else:
            t = rewrite_manifests(t)
        got = _scan_counter(t, spark)
        assert got == model, f"seed={seed} step={step} op={op}"

    # changelog replay over the whole history reconstructs the table
    ch = changelog_df(t, spark, from_snapshot_id=0)
    ins = ch.filter(F.col("_change_type") == "insert").drop(
        "_change_type", "_commit_snapshot_id"
    )
    dels = ch.filter(F.col("_change_type") == "delete").drop(
        "_change_type", "_commit_snapshot_id"
    )
    rebuilt = Counter(map(tuple, ins.exceptAll(dels).collect()))
    assert rebuilt == model, f"seed={seed} changelog replay"
