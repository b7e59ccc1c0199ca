#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure
first). For each named registry query this times, separately,

  - plan construction (the Python/py4j + analysis cost of building the
    DataFrame — part of every bench sample),
  - execution to the bench's own timed action
    (``sum(hash(*))``.collect() — forces every column of every row),

and then attributes executor time to STAGES via the Spark UI REST API
(jobs are labelled with setJobDescription, so stages map back to
queries). Output per query: total / plan / exec seconds and the top
stages by executor run time with their shuffle read/write and input
bytes — i.e. where the time actually goes, not where we guess it goes.

Usage:
    python tools/profile_r16.py [--sf-dir /root/testdata/sf0.1]
        [--reps 3] [--explain-dir plans/r16 --explain-suffix _before]
        name [name ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import statistics
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

UI_PORT = 4047


def fetch(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="_before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from mapreduceframework_spark.plans.registry import all_queries
    from mapreduceframework_spark.session import get_session

    spark = get_session(
        app_name="profile-r16",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    sc = spark.sparkContext
    specs = all_queries()

    # Same warm-up block as bench.py so sample 1 is comparable.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.range(n).repartition(n).mapInPandas(lambda it: it, "id long").count()
    from mapreduceframework_spark.sources import load_table

    nation = load_table(spark, args.sf_dir, "nation")
    region = load_table(spark, args.sf_dir, "region")
    nation.join(
        region.hint("broadcast"), nation.n_regionkey == region.r_regionkey
    ).count()

    plan_ts: dict[str, list[float]] = {q: [] for q in args.names}
    exec_ts: dict[str, list[float]] = {q: [] for q in args.names}

    for rep in range(args.reps):
        for name in args.names:
            spec = specs[name]
            sc.setJobDescription(f"{name}#rep{rep}")
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.selectExpr("sum(hash(*)) AS h").collect()
            t2 = time.perf_counter()
            plan_ts[name].append(t1 - t0)
            exec_ts[name].append(t2 - t1)
            sc.setJobDescription(None)
            if rep == 0 and args.explain_dir:
                out = Path(args.explain_dir)
                out.mkdir(parents=True, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                (out / f"{name}{args.explain_suffix}.txt").write_text(
                    buf.getvalue()
                )
        spark.catalog.clearCache()
        sc._jvm.System.gc()

    # ---- stage attribution via the REST API ----
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = fetch(base)
    app_id = apps[0]["id"]
    jobs = fetch(f"{base}/{app_id}/jobs?status=succeeded")
    stages = {
        s["stageId"]: s
        for s in fetch(f"{base}/{app_id}/stages?status=COMPLETE")
    }
    per_query: dict[str, dict[int, dict]] = {q: {} for q in args.names}
    for j in jobs:
        desc = j.get("description") or ""
        qname = desc.split("#rep")[0]
        if qname not in per_query:
            continue
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if s is not None:
                per_query[qname][sid] = s

    report: dict[str, dict] = {}
    for name in args.names:
        med_plan = statistics.median(plan_ts[name])
        med_exec = statistics.median(exec_ts[name])
        srows = []
        for sid, s in sorted(
            per_query[name].items(),
            key=lambda kv: -kv[1]["executorRunTime"],
        ):
            srows.append(
                {
                    "stage": sid,
                    "name": s["name"].split("\n")[0][:90],
                    "tasks": s["numCompleteTasks"],
                    "run_ms": s["executorRunTime"],
                    "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                    "input_mb": round(s["inputBytes"] / 1e6, 1),
                    "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                    "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                }
            )
        report[name] = {
            "plan_s": round(med_plan, 3),
            "exec_s": round(med_exec, 3),
            "total_s": round(med_plan + med_exec, 3),
            "plan_samples": [round(t, 3) for t in plan_ts[name]],
            "exec_samples": [round(t, 3) for t in exec_ts[name]],
            "n_stages_all_reps": len(srows),
            "stages": srows[:14],
        }
        print(f"\n=== {name}: plan {med_plan:.3f}s exec {med_exec:.3f}s "
              f"(total {med_plan + med_exec:.3f}s)")
        for r in report[name]["stages"]:
            print(
                f"  stage {r['stage']:>4} run {r['run_ms']:>7}ms cpu "
                f"{r['cpu_ms']:>7}ms tasks {r['tasks']:>3} in "
                f"{r['input_mb']:>7}MB shR {r['sh_read_mb']:>8}MB shW "
                f"{r['sh_write_mb']:>8}MB  {r['name']}"
            )
    Path("/tmp/profile_r16.json").write_text(json.dumps(report, indent=1))
    print("\nwrote /tmp/profile_r16.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
