"""Cross-face differential fuzz: the SAME random DML program runs
against a Delta table and an Iceberg table, and after every step the
two faces must read back identical row sets.

The two planes share nothing below the DataFrame API — Delta commits
DV swaps + JSON log actions, Iceberg commits positional/equality
deletes + Avro manifests — so agreement after arbitrary interleavings
of append / delete / full-matrix MERGE is evidence the SEMANTICS are
right, not just that each plane is self-consistent (the per-plane
fuzzes already pin those against dict simulators)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import DoubleType, LongType, NestedField

ICE_SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "grp", LongType(), False),
        NestedField(3, "v", DoubleType(), False),
    ),
    schema_id=0,
    identifier_field_ids=(),
)
SPARK_SCHEMA = "k long, grp long, v double"


def _frame(spark, rows):
    return spark.createDataFrame(
        [(int(k), int(g), float(v)) for k, g, v in rows], SPARK_SCHEMA
    )


def _delta_state(spark, loc):
    from icegopher_spark.delta import read_delta

    return {
        int(r["k"]): (int(r["grp"]), float(r["v"]))
        for r in read_delta(spark, loc).collect()
    }


def _ice_state(spark, table):
    return {
        int(r["k"]): (int(r["grp"]), float(r["v"]))
        for r in table.scan().to_df(spark).collect()
    }


@pytest.mark.parametrize("seed", [5, 29, 101])
def test_same_dml_program_same_rows(spark, tmp_path, seed):
    from icegopher_spark.delta_write import (
        append_delta,
        create_delta_table,
        delete_where_delta,
        merge_delta,
    )

    rng = random.Random(seed)
    dloc = str(tmp_path / "d")
    iloc = str(tmp_path / "i")
    base = [(k, k % 5, float(k)) for k in range(60)]
    df0 = _frame(spark, base)
    create_delta_table(dloc, df0.schema)
    append_delta(spark, dloc, df0)
    it = W.create_table(iloc, ICE_SCHEMA)
    it = W.append(it, df0)

    next_key = 1000
    for step in range(6):
        op = rng.choice(["append", "delete", "merge"])
        if op == "append":
            rows = [
                (next_key + i, rng.randrange(5), float(rng.randrange(100)))
                for i in range(rng.randrange(1, 8))
            ]
            next_key += 50
            f = _frame(spark, rows)
            append_delta(spark, dloc, f)
            it = W.append(it, f)
        elif op == "delete":
            mod = rng.choice([7, 9, 11])
            pred = (F.col("k") % mod == 0) & (F.col("grp") == rng.randrange(5))
            delete_where_delta(spark, dloc, pred)
            it = W.delete_where_mor(it, spark, pred)
        else:  # full-matrix merge with a random clause mix
            cur = sorted(_delta_state(spark, dloc))
            picked = rng.sample(cur, min(len(cur), rng.randrange(3, 10)))
            src_rows = [
                (k, rng.choice([-1, rng.randrange(5)]), float(rng.randrange(500)))
                for k in picked
            ] + [
                (next_key + i, -1, 777.0) for i in range(rng.randrange(0, 4))
            ]
            next_key += 50
            src = _frame(spark, src_rows)
            clauses = dict(
                when_matched_update={"v": "s.v + 0.5"},
                matched_condition="s.grp >= 0 AND s.v > t.v",
                when_matched_delete="s.grp < 0",
                when_not_matched_insert=rng.random() < 0.8,
                not_matched_condition=rng.choice([None, "s.k % 2 = 1"]),
                when_not_matched_by_source_delete=rng.choice(
                    [None, "t.k % 13 = 0"]
                ),
            )
            merge_delta(spark, dloc, src, ["k"], **clauses)
            it = W.merge_matrix_mor(it, spark, src, ["k"], **clauses)
        ds, is_ = _delta_state(spark, dloc), _ice_state(spark, it)
        assert ds == is_, (
            f"faces diverged at step {step} ({op}, seed {seed}): "
            f"delta-only={sorted(set(ds) - set(is_))[:5]} "
            f"iceberg-only={sorted(set(is_) - set(ds))[:5]} "
            f"value-diffs={[k for k in set(ds) & set(is_) if ds[k] != is_[k]][:5]}"
        )


@pytest.mark.parametrize("seed", [11, 47])
def test_same_dml_program_v2_vs_v3_lineage_face(spark, tmp_path, seed):
    """Differential fuzz WITHIN the Iceberg plane (r13): the same
    random program runs on a format-v2 table (pos-delete MOR merge)
    and a format-v3 row-lineage table (DV deletes, lineage-carrying
    merge). Row sets must stay identical at every step, and the v3
    face's _row_id column must remain unique and fully assigned — the
    allocator invariant MERGE's mixed materialized/fresh files lean
    on."""
    rng = random.Random(seed)
    t2 = W.create_table(str(tmp_path / "v2"), ICE_SCHEMA)
    t3 = W.create_table(str(tmp_path / "v3"), ICE_SCHEMA, format_version=3)
    base = [(k, k % 5, float(k)) for k in range(60)]
    df0 = _frame(spark, base)
    t2 = W.append(t2, df0)
    t3 = W.append(t3, df0)

    next_key = 1000
    for step in range(6):
        op = rng.choice(["append", "delete", "merge"])
        if op == "append":
            rows = [
                (next_key + i, rng.randrange(5), float(rng.randrange(100)))
                for i in range(rng.randrange(1, 8))
            ]
            next_key += 50
            f = _frame(spark, rows)
            t2 = W.append(t2, f)
            t3 = W.append(t3, f)
        elif op == "delete":
            mod = rng.choice([7, 9, 11])
            pred = (F.col("k") % mod == 0) & (F.col("grp") == rng.randrange(5))
            t2 = W.delete_where_mor(t2, spark, pred)
            # v3 face deletes through deletion vectors (the spec forbids
            # new v2 positional-delete files on v3) — also exercises the
            # DV supersede interplay with the merge step's DVs
            t3 = W.delete_where_dv(t3, spark, pred)
        else:
            cur = sorted(_ice_state(spark, t2))
            picked = rng.sample(cur, min(len(cur), rng.randrange(3, 10)))
            src_rows = [
                (k, rng.choice([-1, rng.randrange(5)]), float(rng.randrange(500)))
                for k in picked
            ] + [(next_key + i, -1, 777.0) for i in range(rng.randrange(0, 4))]
            next_key += 50
            src = _frame(spark, src_rows)
            clauses = dict(
                when_matched_update={"v": "s.v + 0.5"},
                matched_condition="s.grp >= 0 AND s.v > t.v",
                when_matched_delete="s.grp < 0",
                when_not_matched_insert=rng.random() < 0.8,
                not_matched_condition=rng.choice([None, "s.k % 2 = 1"]),
                when_not_matched_by_source_delete=rng.choice([None, "t.k % 13 = 0"]),
            )
            t2 = W.merge_matrix_mor(t2, spark, src, ["k"], **clauses)
            t3 = W.merge_matrix_mor(t3, spark, src, ["k"], **clauses)
        s2, s3 = _ice_state(spark, t2), _ice_state(spark, t3)
        assert s2 == s3, (
            f"v2/v3 diverged at step {step} ({op}, seed {seed}): "
            f"v2-only={sorted(set(s2) - set(s3))[:5]} "
            f"v3-only={sorted(set(s3) - set(s2))[:5]} "
            f"value-diffs={[k for k in set(s2) & set(s3) if s2[k] != s3[k]][:5]}"
        )
        rids = [
            r["_row_id"]
            for r in t3.scan(with_lineage=True).to_df(spark).collect()
        ]
        assert None not in rids, f"unassigned _row_id at step {step}"
        assert len(rids) == len(set(rids)), f"duplicate _row_id at step {step}"
