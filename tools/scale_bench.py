"""Scale self-check: does every headline query scale ~linearly?

The per-round bench only sees sf0.1, where an accidentally O(n²) plan
or a skew hotspot can hide inside fixed overheads. This tool builds a
K×-scaled copy of the sf0.1 tables (default K=10 → sf1-equivalent) and
times the headline suite at both scales, flagging any query whose
runtime grows worse than ~linear×log.

The scale-up is key-space aware so query COST stays linear by
construction (anything super-linear is therefore the plan's fault):
  * every key column is shifted by replica×stride, consistently across
    fact/dim tables, so joins match only within a replica;
  * document text gets a per-replica prefix token, so dedup groups
    never span replicas (naive replication would grow pair counts
    quadratically in K);
  * embeddings are rotated by the replica index — random vectors under
    distinct rotations are uncorrelated, so near-dup/ANN candidate
    structure stays per-replica.
nation/region are dimensions and stay fixed.

Usage:  python tools/scale_bench.py [--k 10] [--out BENCH_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402

# round-4 operators whose cost scales with events/documents/embeddings:
# covered by the superlinearity guard even though the per-round bench
# keeps its query list stable for baseline comparability
EXTRA_SCALE_QUERIES = [
    "q21_waiting_supplier",
    "q12_late_shipment_priority",
    "events_gapfill_locf",
    "events_funnel",
    "events_retention",
    "corpus_stratified_sample",
    "sim_quantize_int8",
    "dedup_substring_spans",
    "dedup_substring_intervals",
    "events_anomalies",
    # round-5 operators
    "corpus_temperature_mix",
    "corpus_length_trim",
    "dedup_minhash_incremental",
    "iceberg_eqdelete_datasource",
    "iceberg_zorder_partitioned",
    "vocab_bpe_merges",
    "stream_minhash_index",
    "mm_audio_features",
    "events_windowed_topk",
    # round-6 operators (V3 deletion vectors, row lineage, defaults)
    "iceberg_dv_delete",
    "iceberg_row_lineage",
    "iceberg_default_values",
    "iceberg_lineage_changelog",
    "iceberg_partition_stats",
    # round-7 operators (DV migration, rule filters, BPE encode)
    "iceberg_dv_migrate",
    "text_gopher_filter",
    "text_repetition_filter",
    "text_top_ngram",
    "vocab_bpe_encode",
    "dedup_source_overlap",
    "iceberg_eqdelete_migrate",
    "iceberg_sortorder_pruned",
    "corpus_chunk_documents",
    "vocab_oov_stats",
    "dedup_neardup_select",
    "stream_cdc_changelog",
    "stream_cdc_mv",
    "iceberg_changes_datasource",
    # round-8 operators (strict repetition, CDC bootstrap, variant)
    "text_repetition_strict",
    "stream_cdc_after_eq_migrate",
    "iceberg_variant_read",
    "iceberg_manifest_merge",
    "iceberg_files_metadata",
    "dedup_containment",
    "text_char_diversity",
    "corpus_shuffle_shard",
    "iceberg_orphan_cleanup",
    "iceberg_table_stats",
    # round-9 operators (shredded variant, CDC update pairing, C4,
    # bigram LM, snapshots metadata, SCD2)
    "iceberg_variant_shredded",
    "stream_cdc_updates",
    "text_c4_filter",
    "text_bigram_stats",
    "iceberg_snapshots_metadata",
    "cdc_scd2_history",
    "text_winnow_fingerprints",
    "sim_semdedup",
    "text_lm_filter",
    "stream_scd2_history",
    "text_paragraph_dedup",
    # round-9 operators (Delta reader, range joins, fuzzy joins,
    # profiling/drift, PageRank, filter sweep, in-place adoption)
    "delta_read",
    "delta_to_iceberg_migrate",
    "delta_export_roundtrip",
    "delta_vacuum_preview",
    "stream_delta_source",
    "delta_cdf_read",
    "stream_delta_cdf",
    "sim_hard_negatives",
    "interval_join_campaigns",
    # interval_overlap_cohorts is deliberately NOT here: with the
    # synthetic data every user's span covers the whole month, so the
    # ANSWER is quadratic in users-per-cohort (10x users -> ~100x
    # pairs). The operator emits each pair exactly once (linear in
    # output size, pytest-pinned); timing a query whose result set
    # grows 100x tells you about the data, not the plan.
    "fuzzy_match_partnames",
    "fuzzy_name_pairs",
    "profile_columns_exact",
    "events_drift_psi",
    "graph_pagerank",
    "text_filter_sweep",
    "iceberg_add_files",
    # round-10 additions: the Delta DV/column-mapping planes + the
    # persisted-IVF probe (fixture builds are part of the timed cost —
    # they scan the scaled base tables, so they must scale linearly too)
    "delta_dv_read",
    "delta_dv_cdf",
    "delta_column_mapping_read",
    "delta_dv_delete_write",
    "delta_optimize_roundtrip",
    "sim_ivf_index_topk",
    # round-11 additions: v2-checkpoint seed, ICT travel, nested-mapped
    # write, zero-copy Delta→Iceberg link (fixture builds scan the
    # scaled base tables — timed cost)
    "delta_v2_checkpoint_read",
    "delta_ict_timestamp_travel",
    "delta_cm_nested_write",
    "delta_link_import",
    "delta_update_cdf",
    "delta_row_ids",
    "delta_type_widening",
    "delta_variant_read",
    # round-12 operators
    "delta_zorder_optimize",
    "delta_merge_matrix",
    "iceberg_merge_matrix",
    "delta_vacuum_execute",
    # round-13 operators
    "iceberg_merge_matrix_v3",
    "iceberg_orc_roundtrip",
]
SCALE_QUERIES = BENCH_QUERIES + EXTRA_SCALE_QUERIES
from icegopher_spark.queries import QUERIES, load  # noqa: E402
from icegopher_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# key column -> (stride source table, stride source column)
_KEYS = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

_COPY = ("region", "nation")
_SCALED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _strides(spark) -> dict[str, int]:
    out: dict[str, int] = {}
    for key, (tbl, col) in _KEYS.items():
        cache_key = (tbl, col)
        if cache_key not in out:
            out[cache_key] = int(
                load(spark, BASE, tbl).agg(F.max(col)).collect()[0][0]
            ) + 1
        out[key] = out[cache_key]
    return out


def build_scaled(spark, k: int) -> str:
    out_dir = f"/tmp/icegopher_scale/x{k}"
    marker = f"{out_dir}/_BUILT"
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(spark)
    for tbl in _COPY:
        load(spark, BASE, tbl).write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )
    for tbl in _SCALED:
        base = load(spark, BASE, tbl)
        reps = []
        for r in range(k):
            cols = []
            for c in base.columns:
                col = F.col(c)
                if c in _KEYS:
                    col = (col + F.lit(r * strides[c])).alias(c)
                elif tbl == "documents" and c == "text":
                    # prefix EVERY word with a replica marker (w{r}<word>).
                    # A single doc-prefix token is NOT enough — SimHash
                    # signatures of one-token-different docs stay within
                    # hamming 3, so cross-replica copies remained
                    # near-dups. A CONSTANT interleave marker (the r4–r7
                    # form, " w{r} ") is not enough either: it makes every
                    # other 3-shingle the degenerate (w{r} word w{r}) —
                    # identical across ALL docs of a replica containing
                    # that word, under the stop-shingle df cap, so the
                    # inverted-index join's co-pair count grew ~k² (caught
                    # by the r8 dedup_containment flag: 29× at k=10); and
                    # any interleave DOUBLES shingles/doc (~4× co-pairs
                    # per replica — still a flag at 22×). Per-word
                    # prefixing is a 1:1 token isomorphism with the base
                    # corpus: per-replica shingle structure, df
                    # distribution, and co-pair count are EXACTLY the
                    # base's (measured: 11533 == 11533 per replica, 2
                    # replicas == 2.00×), so any residual super-linearity
                    # is the plan's fault, not the harness's.
                    # the trailing '_' keeps markers prefix-free for
                    # ANY k (r8 review wave 2: at k=11, replica 1's
                    # digit-leading word '0foo' would collide with
                    # replica 10's 'foo' as 'w10foo')
                    col = F.regexp_replace(col, r"(\S+)", f"w{r}_$1").alias(c)
                elif tbl == "embeddings" and c == "embedding" and r > 0:
                    # rotate dims by r: uncorrelated across replicas
                    n = 64
                    col = F.concat(
                        F.slice(col, r + 1, n - r), F.slice(col, 1, r)
                    ).alias(c)
                else:
                    col = col.alias(c)
                cols.append(col)
            reps.append(base.select(*cols))
        scaled = reps[0]
        for rep in reps[1:]:
            scaled = scaled.unionByName(rep)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
    Path(marker).touch()
    return out_dir


def _warm(spark, sf_dir: str) -> None:
    """Unbilled one-time costs: iceberg table construction + JIT."""
    from icegopher_spark.iceberg_queries import (
        _compacted_table_for,
        _merge_table_for,
        _mor_table_for,
        _table_for,
    )

    load(spark, sf_dir, "lineitem").groupBy("l_returnflag").count().count()
    _table_for(spark, sf_dir)
    _mor_table_for(spark, sf_dir)
    _compacted_table_for(spark, sf_dir)
    _merge_table_for(spark, sf_dir)


def run_suite(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, float]:
    _warm(spark, sf_dir)
    times: dict[str, float] = {}
    for name in names if names is not None else SCALE_QUERIES:
        t0 = time.time()
        QUERIES[name].fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=str(_REPO / "BENCH_SCALE.json"))
    # r11 verdict #7: spot-check the worst 10x growers at a deeper K
    # (e.g. --k 30 --only sim_semdedup salted_join_revenue ...) to
    # confirm the curves stay subquadratic before trusting the 100-TB
    # story. --only restricts the suite; the artifact carries the
    # subset and is written to --out (pick a non-default name so the
    # full-suite BENCH_SCALE.json isn't clobbered by a subset run).
    ap.add_argument("--only", nargs="+", default=None, metavar="QUERY")
    args = ap.parse_args()
    selected = args.only or SCALE_QUERIES
    unknown = [n for n in selected if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("scale-bench")

    scaled_dir = build_scaled(spark, args.k)
    base_times = run_suite(spark, BASE, selected)
    scaled_times = run_suite(spark, scaled_dir, selected)

    # linear×log budget: K × (1 + log10 K) plus a floor for fixed
    # overhead — a query under 0.5 s at base is overhead-dominated and
    # judged against an absolute bound instead of the ratio.
    budget = args.k * (1 + __import__("math").log10(args.k))
    # Per-family tightening (r6 verdict #8): the generic 20× budget is
    # loose enough to hide a 10× constant blowup in families whose
    # worst REAL grower is well under it — regressions should surface
    # as flags, not judge archaeology. Factors of the generic budget,
    # calibrated to measured headroom. dedup_ sits at 0.75 (15× at
    # k=10): the inverted-index pair pipeline's true ratio is 6-7× and
    # this VM shows up to ~3× run-to-run noise — 10× flagged healthy
    # runs (r7: source_overlap 12.8× post-fix), while 15× still caught
    # both real r7 regressions (un-checkpointed component loop 16.8×
    # pre-fix / 26.9× end-to-end).
    FAMILY_BUDGET_FACTOR = {
        "dedup_": 0.75,
        "text_": 0.5,    # pure codegen column ops, no joins
        "vocab_": 0.5,   # one word-count shuffle + bounded collect
        # r10 verdict #5: the Delta plane's worst real grower is ~5x at
        # k=10 (delta_dv_delete_write 4.87x) — the generic 20x budget
        # would hide a 3x constant blowup; 10x still clears 3x VM noise
        "delta_": 0.5,
        "stream_delta_": 0.5,
    }
    rows = {}
    flags = []
    for name in selected:
        b, s = base_times[name], scaled_times[name]
        ratio = round(s / max(b, 1e-3), 2)
        factor = next(
            (f for pre, f in FAMILY_BUDGET_FACTOR.items() if name.startswith(pre)),
            1.0,
        )
        q_budget = budget * factor
        ok = (s <= max(b, 0.5) * q_budget)
        rows[name] = {
            "base_sec": b,
            "scaled_sec": s,
            "ratio": ratio,
            "budget_ratio": round(q_budget, 2),
            "ok": ok,
        }
        if not ok:
            flags.append(name)
    artifact = {
        "metric": "scale_check",
        "base_sf_dir": BASE,
        "scale_k": args.k,
        "budget_ratio": round(budget, 2),
        "base_total_sec": round(sum(base_times.values()), 3),
        "scaled_total_sec": round(sum(scaled_times.values()), 3),
        "flagged_superlinear": flags,
        "queries": rows,
    }
    # drift self-flagging (r7 verdict #1): a stale shipped artifact —
    # queries appended to SCALE_QUERIES after the last run — must fail
    # loudly here AND be detectable from the artifact alone, so the
    # query list is embedded and asserted on write.
    artifact["query_set"] = sorted(selected)
    if args.only:
        artifact["subset_of_full_suite"] = True
    Path(args.out).write_text(json.dumps(artifact, indent=1))
    assert set(artifact["queries"]) == set(selected), (
        "scale artifact drifted from the selected query set"
    )
    print(json.dumps({k: v for k, v in artifact.items() if k not in ("queries", "query_set")}))


if __name__ == "__main__":
    main()
