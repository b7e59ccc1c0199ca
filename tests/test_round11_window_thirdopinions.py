"""Round-11 third opinions, part 10 — window/session/UDTF rows from
the r07 refresh cohort reconstructed in pure Python:

- window_topk_per_group: per-customer top-3 with the
  (total DESC, orderkey) tiebreak;
- window_running_sum: sequential left-to-right prefix sums of doubles
  in the window's exact order (an ordered-frame sum IS sequential, so
  the IEEE accumulation mirrors bit-for-bit before the 2dp rounding);
- events_sessionize_gaps: 30-minute gaps-and-islands sessionization
  (strict > boundary) with per-session purchase counts;
- udtf_bigram_counts: the mapInPandas generator's own Python
  tokenization (str.strip().split() — NOT the Java split) re-run
  outside Spark.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from tests.mirrors import round_half_up, ts_us
from mapreduceframework_spark.plans.analytics_queries import _GAP_US
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.udf_queries  # noqa: F401
import mapreduceframework_spark.plans.window_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SFS)
def test_window_topk_per_group_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    per_cust: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for ck, ok, p in zip(
        t["o_custkey"].to_numpy(), t["o_orderkey"].to_numpy(),
        t["o_totalprice"].to_numpy(),
    ):
        per_cust[int(ck)].append((float(p), int(ok)))
    expected = {}
    for ck, rows_ in per_cust.items():
        rows_.sort(key=lambda po: (-po[0], po[1]))
        for rn, (p, ok) in enumerate(rows_[:3], start=1):
            expected[(ck, ok)] = (round_half_up(p, 2), rn)

    out = REGISTRY["window_topk_per_group"].fn(spark, sf_dir).collect()
    got = {
        (r["o_custkey"], r["o_orderkey"]): (r["total"], r["rn"])
        for r in out
    }
    assert got == expected


@pytest.mark.parametrize("sf_dir", SFS)
def test_window_running_sum_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    d = ts_us(t["o_orderdate"])
    per_cust: dict[int, list[tuple[int, int, float]]] = defaultdict(list)
    for ck, ok, dt, p in zip(
        t["o_custkey"].to_numpy(), t["o_orderkey"].to_numpy(), d,
        t["o_totalprice"].to_numpy(),
    ):
        per_cust[int(ck)].append((int(dt), int(ok), float(p)))
    expected = {}
    for ck, rows_ in per_cust.items():
        rows_.sort()  # (o_orderdate, o_orderkey) — the window's order
        acc = 0.0
        for dt, ok, p in rows_:
            acc = acc + p  # sequential: the ordered frame's own order
            expected[(ck, ok)] = round_half_up(acc, 2)

    out = REGISTRY["window_running_sum"].fn(spark, sf_dir).collect()
    got = {
        (r["o_custkey"], r["o_orderkey"]): r["running_spend"] for r in out
    }
    assert got == expected


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_sessionize_gaps_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts"],
    )
    us = ts_us(t["ts"])
    per_user: dict[int, list[tuple[int, int, str]]] = defaultdict(list)
    for u, eid, et, x in zip(
        t["user_id"].to_numpy(), t["event_id"].to_numpy(),
        t["event_type"].to_pylist(), us,
    ):
        per_user[int(u)].append((int(x), int(eid), et))
    expected = {}
    for u, rows_ in per_user.items():
        rows_.sort()  # (ts, event_id) — the boundary window's order
        seq, prev = 0, None
        agg: dict[int, list] = {}
        for x, _eid, et in rows_:
            if prev is None or x - prev > _GAP_US:  # STRICT >
                seq += 1
                agg[seq] = [0, x, x, 0]
            a = agg[seq]
            a[0] += 1
            a[2] = x
            a[3] += et == "purchase"
            prev = x
        for s, (n, lo, hi, np_) in agg.items():
            expected[(u, s)] = (n, lo, hi, hi - lo, np_)

    out = REGISTRY["events_sessionize_gaps"].fn(spark, sf_dir).collect()
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["session_start_us"],
            r["session_end_us"],
            r["duration_us"],
            r["n_purchases"],
        )
        for r in out
    }
    assert got == expected
    # Sessionization must actually split streams for the check to bite.
    assert any(s > 1 for _u, s in expected)


@pytest.mark.parametrize("sf_dir", SFS)
def test_udtf_bigram_counts_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    cnt: Counter[str] = Counter()
    for text in t["text"].to_pylist():
        if text is None or not text.strip():
            continue
        # The UDTF's OWN tokenization: Python str.strip().split().
        words = text.strip().split()
        for i in range(len(words) - 1):
            cnt[words[i] + " " + words[i + 1]] += 1
    expected = dict(cnt)

    out = REGISTRY["udtf_bigram_counts"].fn(spark, sf_dir).collect()
    got = {r["bigram"]: r["cnt"] for r in out}
    assert got == expected
    assert expected
