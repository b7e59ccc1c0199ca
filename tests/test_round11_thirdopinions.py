"""Round-11 third opinions for r05-cohort rows whose only prior
evidence was the two-engine oracle compare (the r10 convention:
an engine-independent reconstruction per row, so a shared
misunderstanding between the Spark plan and its DuckDB oracle cannot
hide).

- join_asof: brute-force pure-Python scan (for each event, the max
  order date at-or-before it for the same user) — independent of BOTH
  engines AND of pd.merge_asof, which the Spark operator itself wraps;
- timeseries_ohlc: pure-Python first/last/extremes per (type, hour);
- events_retention_cohorts: pure-Python cohort matrix;
- sketch_countmin_heavy: pure-Python count-min build + probe with the
  repo's fixed hash constants (the pipeline logic — explode, count,
  cell fold, min-over-rows, overcount — reconstructed outside any SQL
  engine).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.operators.sketches import (
    CMS_A,
    CMS_B,
    CMS_WIDTH,
)
from tests.mirrors import JAVA_WS as _JAVA_WS, P, ts_us as _us, word_hash
from mapreduceframework_spark.plans.registry import REGISTRY
from mapreduceframework_spark.plans.sketch_queries import HEAVY_MIN
import mapreduceframework_spark.plans.join_queries  # noqa: F401
import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.sketch_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]



@pytest.mark.parametrize("sf_dir", SFS)
def test_join_asof_matches_bruteforce_scan(spark, sf_dir):
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    od = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    orders_by_user: dict[int, list[int]] = defaultdict(list)
    for cust, d in zip(
        od["o_custkey"].to_numpy(), _us(od["o_orderdate"])
    ):
        orders_by_user[int(cust)].append(int(d))
    expected: dict[int, int] = {}
    for eid, uid, ts in zip(
        ev["event_id"].to_numpy(), ev["user_id"].to_numpy(), _us(ev["ts"])
    ):
        best = None
        for d in orders_by_user.get(int(uid), ()):
            if d <= ts and (best is None or d > best):
                best = d
        if best is not None:  # inner-join semantics: unmatched dropped
            expected[int(eid)] = best

    rows = REGISTRY["join_asof"].fn(spark, sf_dir).collect()
    got = {
        r["event_id"]: int(
            np.datetime64(r["asof_date"], "us").astype(np.int64)
        )
        for r in rows
    }
    assert got == expected


@pytest.mark.parametrize("sf_dir", SFS)
def test_timeseries_ohlc_matches_python_scan(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    ts = _us(t["ts"])
    HOUR = 3_600_000_000
    groups: dict[tuple[str, int], list[tuple[int, int, float]]] = (
        defaultdict(list)
    )
    for et, u, eid, v in zip(
        t["event_type"].to_pylist(), ts, t["event_id"].to_numpy(),
        t["value"].to_numpy(),
    ):
        groups[(et, (int(u) // HOUR) * HOUR)].append(
            (int(u), int(eid), float(v))
        )
    expected = {}
    for k, rows_ in groups.items():
        rows_.sort()  # (ts_us, event_id, value) lexicographic
        vals = [v for _, _, v in rows_]
        expected[k] = (
            rows_[0][2], max(vals), min(vals), rows_[-1][2], len(rows_)
        )

    out = REGISTRY["timeseries_ohlc"].fn(spark, sf_dir).collect()
    got = {
        (r["event_type"], r["bucket_us"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_ticks"]
        )
        for r in out
    }
    assert got == expected


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_retention_cohorts_matches_python_scan(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    DAY = 86_400_000_000
    days = (_us(t["ts"]) // DAY) * DAY
    users = t["user_id"].to_numpy()
    first: dict[int, int] = {}
    active: set[tuple[int, int]] = set()
    for u, d in zip(users, days):
        u, d = int(u), int(d)
        active.add((u, d))
        if u not in first or d < first[u]:
            first[u] = d
    cohort_users: dict[tuple[int, int], set[int]] = defaultdict(set)
    for u, d in active:
        c = first[u]
        cohort_users[(c, (d - c) // DAY)].add(u)
    expected = {k: len(v) for k, v in cohort_users.items()}

    out = REGISTRY["events_retention_cohorts"].fn(spark, sf_dir).collect()
    got = {
        (r["cohort_day_us"], r["day_offset"]): r["n_users"] for r in out
    }
    assert got == expected


@pytest.mark.parametrize("sf_dir", SFS)
def test_sketch_countmin_heavy_matches_python_cms(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    wc: Counter[str] = Counter()
    for text in t["text"].to_pylist():
        if text is None or not text.strip():
            continue
        wc.update(_JAVA_WS.split(text.strip()))

    wh = word_hash

    cells: dict[tuple[int, int], int] = defaultdict(int)
    for w, c in wc.items():
        h = wh(w)
        for row, (a, b) in enumerate(zip(CMS_A, CMS_B)):
            cells[(row, (a * h + b) % P % CMS_WIDTH)] += c
    expected = {}
    for w, c in wc.items():
        if c < HEAVY_MIN:
            continue
        h = wh(w)
        est = min(
            cells[(row, (a * h + b) % P % CMS_WIDTH)]
            for row, (a, b) in enumerate(zip(CMS_A, CMS_B))
        )
        expected[w] = (c, est, est - c)

    out = REGISTRY["sketch_countmin_heavy"].fn(spark, sf_dir).collect()
    got = {
        r["word"]: (r["true_cnt"], r["est_cnt"], r["overcount"])
        for r in out
    }
    assert got == expected
    assert expected, "heavy-hitter set empty — the check proved nothing"
    # CMS's defining one-sided guarantee, asserted independently.
    assert all(est >= c for c, est, _ in expected.values())
