#!/usr/bin/env python
"""Benchmark harness — the driver runs this per-round (BENCH_r{N}.json).

Runs every registry query tagged ``bench=True`` (the headline set) against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Timing is end-to-end per query: plan construction + execution to an
order-insensitive count-style action. Each query runs exactly once (same
as the reference's one-shot jobs — reference
test1-1_thread_1_process.cpp runs each golden job exactly once), but the
harness first runs an explicit warm-up block (JVM/codegen, Python daemon
workers, parquet FS metadata, a broadcast codepath) so per-query timings
exclude one-time infra initialization that a long-lived cluster would
already have paid. Data itself is NOT pre-read into cache; each query
still scans its sources. (Warm-up added in round 4 — r02/r03 numbers
include those one-time costs in their first queries.)

Query ORDER is pinned (``BENCH_ORDER``, = BENCH_r03's list) so per-query
timings are comparable across rounds: registry iteration order rotates
with the driver's correctness window, and letting the bench follow it put
a different query first each round — that query then absorbed whatever
one-time cost the warm-up missed (r03: join_range_binned 3.1s first vs
0.58s mid-run in r02). New bench-tagged queries append after the pinned
list, sorted by name.
"""

from __future__ import annotations

import json
import os
import sys
import time

# BENCH_r03.json's exact query order — append-only; never reorder.
BENCH_ORDER = (
    "join_range_binned",
    "tpch_q1_pricing",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q18_large_orders",
    "window_topk_per_group",
    "window_range_frame",
    "streaming_tumbling_counts",
    "udf_pandas_grouped_agg",
    "graph_pagerank_trade",
    "cdc_merge_orders",
    "ann_cosine_ivf",
    "embedding_quantize_int8",
    "kmeans_quantized_clusters",
    "multimodal_decode_features",
    "text_bm25_topk",
    "text_tfidf_top_terms",
    "pipeline_curate_corpus",
    "events_tumbling_counts",
    "events_session_windows",
    "events_sessionize_gaps",
    "char_counts",
    "word_counts",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "ann_cosine_bruteforce",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from mapreduceframework_spark.plans.registry import all_queries
    from mapreduceframework_spark.session import get_session

    spark = get_session(app_name="mapreduceframework_spark-bench")
    # Absorb one-time infra warmup so the first query of each kind
    # reflects the query, not initialization: JVM/codegen, and the
    # per-core Python daemon workers every pandas-UDF stage reuses
    # (spark.python.worker.reuse) — on a long-lived cluster both are
    # already warm.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.range(n).repartition(n).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # Touch the parquet source path once (schema inference + FS metadata +
    # a broadcast-join codepath) so the first timed query doesn't pay it.
    from mapreduceframework_spark.sources import load_table

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation.join(region.hint("broadcast"), nation.n_regionkey == region.r_regionkey).count()

    specs = {n: s for n, s in all_queries().items() if s.bench}
    extra = sorted(n for n in specs if n not in BENCH_ORDER)
    ordered = [n for n in BENCH_ORDER if n in specs] + extra
    timings: dict[str, float] = {}
    for name in ordered:
        spec = specs[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # Force full execution of every operator in the plan (count() alone
        # would let Catalyst prune aggregations); summing a hash of all
        # columns cannot be optimized away and is order-insensitive.
        df.selectExpr("sum(hash(*)) AS h").collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
