"""Cross-FORMAT differential fuzz (r13): the same random program runs
against three tables that differ only in write.format.default —
parquet (native writes + footer stats), ORC (native writes +
distributed stats pass), Avro (pure-Python OCF codec + distributed
stats pass). After every step all three faces must read back identical
rows, under both full scans and bound-predicate scans — so the
ORC/Avro stats pass can never over-prune (bounds too narrow lose rows
ONLY on the face that produced them) and the Avro NaN/null masks can
never swap a NaN for a null unnoticed.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from icegopher_spark.iceberg import expressions as E
from icegopher_spark.iceberg import write as W
from icegopher_spark.iceberg.schema import Schema
from icegopher_spark.iceberg.types import (
    DoubleType,
    LongType,
    NestedField,
    StringType,
)

SCHEMA = Schema(
    (
        NestedField(1, "k", LongType(), True),
        NestedField(2, "v", DoubleType(), False),
        NestedField(3, "s", StringType(), False),
    ),
    schema_id=0,
)
SPARK_SCHEMA = "k long, v double, s string"

FORMATS = ("parquet", "orc", "avro")


def _rand_rows(rng, start, n):
    rows = []
    for i in range(n):
        r = rng.random()
        v = (
            float("nan")
            if r < 0.15
            else None
            if r < 0.3
            else float(rng.randrange(1000)) / 7
        )
        rows.append((start + i, v, rng.choice(["alpha", "beta", "gamma", ""])))
    return rows


def _frame(spark, rows):
    return spark.createDataFrame(rows, SPARK_SCHEMA)


def _norm(rows):
    out = {}
    for r in rows:
        v = r["v"]
        if v is not None and math.isnan(v):
            v = "NaN"
        out[int(r["k"])] = (v, r["s"])
    return out


@pytest.mark.parametrize("seed", [3, 71])
def test_same_program_same_rows_across_formats(spark, tmp_path, seed):
    rng = random.Random(seed)
    tables = {}
    base = _rand_rows(rng, 0, 80)
    df0 = _frame(spark, base)
    for fmt in FORMATS:
        t = W.create_table(
            str(tmp_path / fmt),
            SCHEMA,
            properties={"write.format.default": fmt},
        )
        tables[fmt] = W.append(t, df0)

    next_key = 1000
    for step in range(5):
        op = rng.choice(["append", "delete", "append"])
        if op == "append":
            rows = _rand_rows(rng, next_key, rng.randrange(1, 12))
            next_key += 50
            f = _frame(spark, rows)
            for fmt in FORMATS:
                tables[fmt] = W.append(tables[fmt], f)
        else:
            mod = rng.choice([5, 7, 9])
            pred = F.col("k") % mod == 0
            for fmt in FORMATS:
                tables[fmt] = W.delete_where_mor(tables[fmt], spark, pred)

        states = {
            fmt: _norm(tables[fmt].scan().to_df(spark).collect())
            for fmt in FORMATS
        }
        assert states["orc"] == states["parquet"], (
            f"orc diverged at step {step} (seed {seed})"
        )
        assert states["avro"] == states["parquet"], (
            f"avro diverged at step {step} (seed {seed})"
        )

        # bound-predicate scan: served by the manifest stats each face
        # produced — over-pruning loses rows only on the guilty face
        thr = rng.randrange(0, next_key)
        filt = {
            fmt: _norm(
                tables[fmt]
                .scan(row_filter=E.greater_than("k", thr))
                .to_df(spark)
                .collect()
            )
            for fmt in FORMATS
        }
        expect = {k: v for k, v in states["parquet"].items() if k > thr}
        for fmt in FORMATS:
            assert filt[fmt] == expect, (
                f"{fmt} filtered scan wrong at step {step} "
                f"(thr {thr}, seed {seed}): missing="
                f"{sorted(set(expect) - set(filt[fmt]))[:5]} extra="
                f"{sorted(set(filt[fmt]) - set(expect))[:5]}"
            )
