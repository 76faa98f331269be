"""Differential fuzz for the Delta DML plane: a random sequence of
append / DV-delete / update / merge / optimize / restore against a
small table, mirrored step by step in a plain Python dict simulator — after
every commit the independent reader must equal the simulator exactly.

This is the write-path twin of test_fuzz_delta_log.py (which fuzzes
LOG REPLAY with hand-written actions); here the repo's own WRITER
produces the log, so the fuzz exercises the full verb surface
composing — repeated DVs unioning, post-image staging, partition
moves, dataChange=false compaction, version rollback."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

SF_SCHEMA = "k long, side string, v double"


def _read_state(spark, loc) -> dict:
    from icegopher_spark.delta import read_delta

    return {
        int(r["k"]): (r["side"], float(r["v"]))
        for r in read_delta(spark, loc).collect()
    }


@pytest.mark.parametrize("seed", [3, 17, 71])
def test_random_dml_matches_simulator(spark, tmp_path, seed):
    from icegopher_spark.delta_write import (
        append_delta,
        create_delta_table,
        delete_where_delta,
        merge_upsert_delta,
        optimize_delta,
        restore_delta,
        update_where_delta,
    )

    rng = random.Random(seed)
    loc = str(tmp_path / f"t{seed}")
    df0 = spark.createDataFrame(
        [(k, str(k % 2), 1.0) for k in range(30)], SF_SCHEMA
    )
    create_delta_table(loc, df0.schema, ["side"])
    append_delta(spark, loc, df0)

    from icegopher_spark.delta import load_delta

    sim: dict[int, tuple[str, float]] = {k: (str(k % 2), 1.0) for k in range(30)}
    # state BY VERSION (no-op verbs — matchless DML, nothing-to-compact
    # optimize — commit no version, so the map is keyed by the table's
    # actual version, not by step count)
    history: dict[int, dict] = {load_delta(loc).version: dict(sim)}
    next_key = 30

    for _step in range(rng.randint(6, 10)):
        op = rng.choice(
            ["append", "delete", "update", "merge", "optimize", "restore"]
        )
        if op == "append":
            rows = [(next_key + i, str(rng.randrange(2)), 1.0) for i in range(3)]
            next_key += 3
            append_delta(spark, loc, spark.createDataFrame(rows, SF_SCHEMA))
            sim.update({k: (s, v) for k, s, v in rows})
        elif op == "delete":
            m = rng.randrange(2, 6)
            delete_where_delta(spark, loc, F.col("k") % m == 0)
            sim = {k: sv for k, sv in sim.items() if k % m != 0}
        elif op == "update":
            m = rng.randrange(2, 6)
            bump = float(rng.randrange(1, 9))
            update_where_delta(
                spark, loc, F.col("k") % m == 0, {"v": F.col("v") + F.lit(bump)}
            )
            sim = {
                k: ((s, v + bump) if k % m == 0 else (s, v))
                for k, (s, v) in sim.items()
            }
        elif op == "merge":
            keys = rng.sample(sorted(sim) or [0], min(3, max(1, len(sim))))
            rows = [(k, str(rng.randrange(2)), 77.0) for k in keys] + [
                (next_key, "m", 77.0)
            ]
            next_key += 1
            merge_upsert_delta(
                spark, loc, spark.createDataFrame(rows, SF_SCHEMA), ["k"]
            )
            sim.update({k: (s, v) for k, s, v in rows})
        elif op == "optimize":
            optimize_delta(spark, loc, target_file_bytes=1 << 30)
            # row set unchanged by construction
        elif op == "restore":
            # mid-sequence restore — the r10 advice case: a path whose
            # DV differs between versions must get the full
            # remove(current dv)+add(old dv) swap, or replay keyed by
            # (path, dv uniqueId) keeps both instances live
            target = rng.choice(sorted(history))
            restore_delta(loc, target)
            sim = dict(history[target])
        history[load_delta(loc).version] = dict(sim)
        assert _read_state(spark, loc) == sim, f"seed={seed} after {op}"

    # restore to a random recorded version: the reader must reproduce
    # that version's exact simulator state
    target_v = rng.choice(sorted(history))
    restore_delta(loc, target_v)
    assert _read_state(spark, loc) == history[target_v], f"seed={seed} restore"

    # and time travel across the whole history still reconstructs
    from icegopher_spark.delta import read_delta

    for v, expect in sorted(history.items()):
        got = {
            int(r["k"]): (r["side"], float(r["v"]))
            for r in read_delta(spark, loc, version=v).collect()
        }
        assert got == expect, f"seed={seed} time travel v={v}"
