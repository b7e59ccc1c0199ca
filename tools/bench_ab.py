#!/usr/bin/env python
"""Same-session A/B evidence harness for per-query perf adjudication.

The host shows >2x per-query run-to-run variance on identical code
(BASELINE.md "Methodology notes"), so a single-shot bench row cannot
adjudicate the driver's 2x rule. This tool times the named queries
N times each, INTERLEAVED round-robin in one Spark session (so a
transient host spike lands on at most one sample per query, and all
queries sample the same host conditions), and prints per-query
median / min / max plus the ratio of the median to a supplied anchor.

Usage:
    python tools/bench_ab.py [--n 9] [--sf-dir /root/testdata/sf0.1] \
        name=anchor_sec [name=anchor_sec ...]

Example (the three rows flagged weak in round 5, vs their BASELINE.md
round-1 anchors):
    python tools/bench_ab.py kmeans_quantized_clusters=2.0 \
        dedup_clusters=2.9 join_range_binned=0.5
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    n = 9
    sf_dir = "/root/testdata/sf0.1"
    targets: dict[str, float] = {}
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            name, _, anchor = args[i].partition("=")
            targets[name] = float(anchor) if anchor else float("nan")
            i += 1
    if not targets:
        print(__doc__)
        return 2

    from mapreduceframework_spark.plans.registry import all_queries
    from mapreduceframework_spark.session import get_session

    queries = all_queries()
    spark = get_session(app_name="bench-ab")
    # Same warm-up as bench.py: JVM/codegen + Python workers + FS metadata.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.range(parts).repartition(parts).mapInPandas(
        lambda it: it, "id long"
    ).count()

    samples: dict[str, list[float]] = {name: [] for name in targets}
    for rep in range(n):
        for name in targets:
            spec = queries[name]
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).selectExpr("sum(hash(*)) AS h").collect()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"# pass {rep + 1}/{n} {name}: {dt:.3f}s", file=sys.stderr)

    out = {}
    worst = 0.0
    for name, ts in samples.items():
        med = statistics.median(ts)
        anchor = targets[name]
        ratio = med / anchor if anchor == anchor else None
        out[name] = {
            "median": round(med, 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
            "anchor": anchor,
            "ratio_vs_anchor": round(ratio, 3) if ratio else None,
            "samples": [round(t, 3) for t in ts],
        }
        if ratio:
            worst = max(worst, ratio)
    print(json.dumps({"n": n, "sf_dir": sf_dir, "queries": out}))
    return 0 if worst <= 2.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
