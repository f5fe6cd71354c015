#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "scale_check": {...}}.

Every query executes end-to-end into a noop sink (full compute, no
result materialization on the driver), after a warm-up that triggers
JVM + codegen warm paths.

The ``scale_check`` block is the 1×/K× wall-clock ratio table for the
scale-path operators (see scale_check.py) with its SCALE_BOUNDS
violations — so scaling regressions (a new shuffle, a lost broadcast,
a pair-space blowup) are recorded mechanically in every BENCH_r{N},
not just in README prose. Latency alone can look fine while a plan
goes quadratic; the ratio table is the early alarm. Control via
$SPARK_GRAFT_BENCH_SCALE (default "1"; "0" skips the ~4-5 min block)
and $SPARK_GRAFT_BENCH_SCALE_K (default 10). Standalone bound-assert
mode (non-zero exit on violation) remains
``python scale_check.py [K] --assert``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from graphragpart1datapipeline_spark.session import get_spark

# Headline set: the heavy representatives of each operator family
# (joins/aggs, rollup, windows, sessionization, dedup families, text
# analysis, vector search, graph traversal). Only SCALE paths belong
# here: q53 (LSH-bucketed embedding near-dup) and q66 (blocked k-NN
# join) represent their families — the exact crossJoin twins (q36/q65)
# are correctness oracles and stay out of the bench.
HEADLINE = [
    "q01_pricing_summary",
    "q02_release_catalog",
    "q03_segment_revenue_topn",
    "q05_regional_revenue",
    "q07_dedupe_priority",
    "q12_top_words",
    "q18_hourly_windows",
    "q19_sessionization",
    "q20_exact_dedup",
    "q22_language_id",
    "q24_minhash_lsh",
    "q25_vector_topk",
    "q27_moving_agg",
    "q31_multi_hop_graph",
    "q53_embedding_near_dup_lsh",
    "q66_knn_join_blocked",
    "q37_section_split",
    "q38_media_metadata",
    "q40_community_rollup",
    "q42_ivf_topk",
    # round-2 additions: the training-data scale paths
    "q78_global_shuffle_shards",
    "q80_kmeans_clustering",
    "q81_incremental_near_dup",
    "q82_pagerank",
    "q84_kmv_distinct",
    "q85_repeated_passages",
    "q86_sampled_percentiles",
    "q87_leakage_safe_split",
    "q88_bpe_train",
    "q94_label_propagation",
    # round-3 additions: ranked retrieval, fusion, graph cohesion, LM
    # scoring, layout stats — all scale paths
    "q103_bm25_topk",
    "q104_hybrid_rrf",
    "q105_triangle_counts",
    "q107_bigram_lm_score",
    "q108_zorder_layout",
    "q112_resample_locf",
    "q114_cdc_apply",
    # round-3 batch 2: exact ER, heavy hitters, weighted sampling,
    # phrase retrieval, decayed time series
    "q120_ewma_user_value",
    # q122 runs on a deliberately adversarial low-cardinality key space
    # (true pair structure is quadratic: 1M pairs from 20k records at
    # sf0.1) — correctness-gated at sf0.01; the realistic ER regime is
    # scale_check's "set_similarity" (vocab proportional to corpus).
    "q123_phrase_search",
    "q124_heavy_hitters_words",
    "q125_weighted_order_sample",
    # round-3 batch 3: diversity scoring, profiling, robust outliers —
    # linear scale paths (q152 linkpred stays out: the co-purchase
    # graph's wedge volume at sf0.1 is adversarially dense, like q122)
    "q153_token_diversity",
    "q154_numeric_histogram",
    "q155_mad_outliers",
    "q157_equidepth_histogram",
    "q127_sorted_neighborhood",
    "q134_debounce_events",
    "q136_embedding_centroids",
    "q140_exact_kth_values",
    "q146_orderkey_gaps",
    # round-4 additions: distributed Leiden, retrieval quality, SCD2
    # time travel, auto-salted skew join — all scale paths. The
    # incremental ER joins (q161-q163) stay out for the same reason as
    # their batch twins (q122/q156/q158): the part/doc key spaces are
    # adversarially duplicate-heavy at sf0.1; their realistic regime
    # is scale_check's incremental entries.
    "q159_leiden_distributed",
    "q160_ann_recall",
    "q164_scd2_time_travel",
    "q165_salted_join_auto",
    "q166_personalized_pagerank",
    "q167_winnow_fingerprints",
]

# Repetitions per query; report the min. The ambient swing on a shared
# box is ~2x (JVM/codegen/scan-cache setup dominates first runs); min-of-3
# is the stable plan cost and makes round-over-round deltas meaningful.
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark(app_name="graphrag-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm-up: JVM, codegen, parquet footer caches, and the Python
    # worker pool (first mapInPandas otherwise pays worker spawn).
    run_query(queries["q01_pricing_summary"](spark, sf_dir))

    def _ident(batches):
        yield from batches

    run_query(
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_ident, schema="id long")
    )

    # Full warm-up pass: each headline query once, untimed. JIT of the
    # codegen'd expression chains (md5/shingle minhash most of all)
    # takes several executions to reach steady state; timing cold runs
    # measures the JVM, not the plan.
    for name in HEADLINE:
        run_query(queries[name](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(max(REPS, 1)):
            t0 = time.perf_counter()
            run_query(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1") != "0":
        from scale_check import BENCH_SUBSET, scale_block

        # K=4 on the regression-prone subset keeps the whole bench
        # inside the per-round time envelope; a quadratic regression
        # still shows ~16x and trips every bound. The standalone
        # calibration run is the full set at K=10
        # (`python scale_check.py 10 --assert`).
        k = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_K", "4"))
        out["scale_check"] = scale_block(
            spark, sf_dir, k, do_assert=True, only=BENCH_SUBSET
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
