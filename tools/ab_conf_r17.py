#!/usr/bin/env python
"""Same-session interleaved A/B of a RUNTIME SQL conf (r17, VERDICT
item 1: adjudicate the AQE coalescePartitions.minPartitionSize=64k
floor on the beyond-drift rows before any engine change).

Protocol: ONE Spark session; for every rep, each query runs once under
conf value A and once under value B, back to back (A/B order alternates
per rep so warm-cache asymmetry cancels). The conf is a runtime SQL
conf, so `spark.conf.set` between executions is a true session-level
A/B without process restarts — a transient host spike lands on at most
one (query, value) sample, and the median discards it.

Usage:
    python tools/ab_conf_r17.py --conf spark.sql.adaptive.\
coalescePartitions.minPartitionSize --a 64k --b 1m \
        [--n 7] [--sf-dir /root/testdata/sf0.1] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from mapreduceframework_spark.plans.registry import all_queries
    from mapreduceframework_spark.session import get_session

    queries = all_queries()
    spark = get_session(app_name="ab-conf-r17")
    # Same warm-up as bench.py.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.range(parts).repartition(parts).mapInPandas(
        lambda it: it, "id long"
    ).count()

    default = spark.conf.get(args.conf, None)
    samples: dict[tuple[str, str], list[float]] = {
        (n, v): [] for n in args.names for v in (args.a, args.b)
    }

    def run(name: str, value: str) -> float:
        spark.conf.set(args.conf, value)
        t0 = time.perf_counter()
        queries[name].fn(spark, args.sf_dir).selectExpr(
            "sum(hash(*)) AS h"
        ).collect()
        return time.perf_counter() - t0

    for rep in range(args.n):
        order = (args.a, args.b) if rep % 2 == 0 else (args.b, args.a)
        for name in args.names:
            for value in order:
                dt = run(name, value)
                samples[(name, value)].append(dt)
                print(
                    f"# rep {rep + 1}/{args.n} {name} {args.conf}="
                    f"{value}: {dt:.3f}s",
                    file=sys.stderr,
                )
    if default is not None:
        spark.conf.set(args.conf, default)

    out: dict[str, dict] = {}
    for name in args.names:
        a = samples[(name, args.a)]
        b = samples[(name, args.b)]
        med_a, med_b = statistics.median(a), statistics.median(b)
        out[name] = {
            f"median_{args.a}": round(med_a, 3),
            f"median_{args.b}": round(med_b, 3),
            "b_over_a": round(med_b / med_a, 3) if med_a else None,
            f"samples_{args.a}": [round(t, 3) for t in a],
            f"samples_{args.b}": [round(t, 3) for t in b],
        }
    print(
        json.dumps(
            {
                "conf": args.conf,
                "a": args.a,
                "b": args.b,
                "n": args.n,
                "sf_dir": args.sf_dir,
                "queries": out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
