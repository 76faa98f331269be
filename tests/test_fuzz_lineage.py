"""Randomized lineage-invariant fuzz (V3 row lineage composed with
every op kind): seeded random sequences of append / CoW delete / CoW
update / MOR delete / DV delete / merge upsert / compaction / manifest
rewrite on a format-v3 table, asserting after EVERY step:

  1. row multiset matches a Python model (values + update arithmetic),
  2. every surviving row keeps the _row_id it was first observed with
     (rewrites of any kind never move ids),
  3. _row_id is globally unique and < next-row-id,
  4. next-row-id never decreases,
  5. _last_updated_sequence_number bumps exactly for updated rows and
     is carried unchanged by deletes/compaction/rewrites,
  6. merge-upsert (delete+insert semantics) gives replaced keys a
     FRESH id at or above the pre-op next-row-id.
"""

import random

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
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


def _lineage_state(t, spark):
    rows = t.scan(with_lineage=True).to_df(spark).collect()
    return {
        r["k"]: (r["v"], r["tag"], r["_row_id"], r["_last_updated_sequence_number"])
        for r in rows
    }


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_random_ops_keep_lineage_invariants(spark, tmp_path, seed):
    rng = random.Random(seed)
    next_k = [0]

    def fresh_rows(n):
        rows = [
            (next_k[0] + i, float(rng.randint(0, 9)), rng.choice(TAGS))
            for i in range(n)
        ]
        next_k[0] += n
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v double, tag string").coalesce(1)

    t = W.create_table(str(tmp_path / f"lin_{seed}"), SCHEMA, format_version=3)
    # model: k -> [v, tag, expected_seq]; rid learned on first sight
    model: dict[int, list] = {}
    rids: dict[int, int] = {}

    rows = fresh_rows(25)
    t = W.append(t, df_of(rows))
    for k, v, tag in rows:
        model[k] = [v, tag, t.metadata.last_sequence_number]

    for step in range(10):
        op = rng.choice(
            [
                "append",
                "cow_delete",
                "update",
                "mor_delete",
                "dv_delete",
                "merge",
                "compact",
                "rewrite",
            ]
        )
        next_before = t.metadata.next_row_id
        merged_keys: set = set()
        if op == "append":
            rows = fresh_rows(rng.randint(1, 8))
            t = W.append(t, df_of(rows))
            seq = t.metadata.last_sequence_number
            for k, v, tag in rows:
                model[k] = [v, tag, seq]
        elif op == "cow_delete":
            tag = rng.choice(TAGS)
            t = W.delete_where(t, spark, E.equal_to("tag", tag))
            for k in [k for k, m in model.items() if m[1] == tag]:
                model.pop(k)
                rids.pop(k, None)
        elif op == "update":
            tag = rng.choice(TAGS)
            t = W.update_where(
                t, spark, E.equal_to("tag", tag), {"v": F.col("v") + 100.0}
            )
            seq = t.metadata.last_sequence_number
            for m in model.values():
                if m[1] == tag:
                    m[0] += 100.0
                    m[2] = seq
        elif op == "mor_delete":
            cut = rng.randint(0, next_k[0])
            t = W.delete_where_mor(t, spark, E.less_than("k", cut))
            for k in [k for k in model if k < cut]:
                model.pop(k)
                rids.pop(k, None)
        elif op == "dv_delete":
            lo = rng.randint(0, max(next_k[0] - 1, 0))
            hi = lo + rng.randint(1, 6)
            t = W.delete_where_dv(
                t, spark, E.greater_than_or_equal("k", lo) & E.less_than("k", hi)
            )
            for k in [k for k in model if lo <= k < hi]:
                model.pop(k)
                rids.pop(k, None)
        elif op == "merge":
            existing = sorted(model)[: rng.randint(1, 3)]
            new = [next_k[0] + 1000 + step * 10 + i for i in range(rng.randint(1, 2))]
            src = [(k, 111.0, "m") for k in [*existing, *new]]
            t = W.merge_upsert(t, spark, df_of(src), ["k"])
            seq = t.metadata.last_sequence_number
            merged_keys = set()
            for k, v, tag in src:
                model[k] = [v, tag, seq]
                rids.pop(k, None)  # replaced/new keys are NEW rows
                merged_keys.add(k)
        elif op == "compact":
            t = compact_data_files(
                t, spark, target_file_size=1 << 20, small_file_threshold=1 << 20
            )
        else:
            t = rewrite_manifests(t)

        assert t.metadata.next_row_id >= next_before, f"seed={seed} step={step}"
        got = _lineage_state(t, spark)
        ctx = f"seed={seed} step={step} op={op}"
        assert {k: (m[0], m[1]) for k, m in model.items()} == {
            k: (v, tag) for k, (v, tag, _rid, _seq) in got.items()
        }, ctx
        seen_rids = [rid for _v, _t2, rid, _s in got.values()]
        assert all(r is not None for r in seen_rids), ctx
        assert len(seen_rids) == len(set(seen_rids)), f"{ctx}: duplicate _row_id"
        assert all(0 <= r < t.metadata.next_row_id for r in seen_rids), ctx
        for k, (_v, _tag, rid, seq) in got.items():
            if k in rids:
                assert rid == rids[k], f"{ctx}: _row_id moved for k={k}"
            else:
                rids[k] = rid
            assert seq == model[k][2], f"{ctx}: seq mismatch for k={k}"
        for k in merged_keys:
            # merge models update as delete+insert: the replacement row
            # is NEW and must take a fresh id, never recycle the old one
            assert got[k][2] >= next_before, f"{ctx}: merged k={k} reused an id"
