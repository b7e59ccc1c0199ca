"""Round-12 third opinions, part 2 — the rest of the window's refresh
rows whose math is one construction deep and had no independent
derivation yet, reconstructed in pure Python from the raw parquet
tables and asserted equal to the engine at sf0.001 AND sf0.01:

- events_funnel_stages: the ordered 4-stage funnel walked per user
  with plain min-after-timestamp chaining;
- events_streak_longest: gaps-and-islands re-derived from per-user
  day sets with a direct consecutive-run walk (no row-number trick);
- join_asof_nearest: brute-force nearest-click scan per purchase with
  the backward tie convention;
- agg_percent_of_total: exact-cents shares;
- division_priority_complete: relational division evaluated as the
  literal double-for-all definition (for every priority there exists
  an order), NOT the count-equality rewrite the engine uses — the
  mirror checks the rewrite, not just the arithmetic;
- lakehouse_incremental_agg: the maintained view recomputed FRESH over
  (base minus retractions) union inserts — the invariant the +1/-1
  delta merge must preserve;
- join_bloom_pruned: the plain join with no Bloom anywhere — set
  equality proves the bloom prune is semantically transparent (no
  false negatives dropped rows, the join removed all false positives).
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.join_queries  # noqa: F401
import mapreduceframework_spark.plans.lakehouse_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

FUNNEL = ["signup", "view", "click", "purchase"]


def _events(sf_dir: str, cols: list[str]):
    return pq.read_table(f"{sf_dir}/events.parquet", columns=cols)


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_funnel_stages_matches_python_walk(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "event_type", "ts"])
    by_user: dict[int, dict[str, list[int]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for u, typ, us in zip(
        t["user_id"].to_pylist(), t["event_type"].to_pylist(),
        ts_us(t["ts"]).tolist(),
    ):
        by_user[u][typ].append(us)
    counts = [0, 0, 0, 0]
    for stages in by_user.values():
        prev_t = None
        for i, stage in enumerate(FUNNEL):
            cand = [
                us
                for us in stages.get(stage, [])
                if prev_t is None or us > prev_t
            ]
            if not cand:
                break
            prev_t = min(cand)
            counts[i] += 1
    want = {
        (i + 1, stage): counts[i] for i, stage in enumerate(FUNNEL)
    }

    out = REGISTRY["events_funnel_stages"].fn(spark, sf_dir).collect()
    got = {(r["step"], r["stage"]): r["users"] for r in out}
    assert got == want
    # Funnel monotonicity: each stage can only lose users.
    assert counts[0] >= counts[1] >= counts[2] >= counts[3]


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_streak_longest_matches_python_runs(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "ts"])
    days: dict[int, set] = defaultdict(set)
    for u, us in zip(t["user_id"].to_pylist(), ts_us(t["ts"]).tolist()):
        days[u].add(us // 86_400_000_000)  # epoch day of the UTC ts
    want = {}
    for u, ds in days.items():
        best_len, best_start, run_len, run_start = 0, None, 0, None
        prev = None
        for d in sorted(ds):
            if prev is not None and d == prev + 1:
                run_len += 1
            else:
                run_len, run_start = 1, d
            prev = d
            # Strict > keeps the EARLIEST start among equal lengths.
            if run_len > best_len:
                best_len, best_start = run_len, run_start
        want[u] = (
            best_len,
            datetime.fromtimestamp(
                best_start * 86_400, tz=timezone.utc
            ).strftime("%Y-%m-%d"),
        )

    out = REGISTRY["events_streak_longest"].fn(spark, sf_dir).collect()
    got = {r["user_id"]: (r["longest_streak"], r["start_day"]) for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_join_asof_nearest_matches_bruteforce(spark, sf_dir):
    t = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    clicks: dict[int, list[int]] = defaultdict(list)
    purchases: list[tuple[int, int, int]] = []
    for eid, u, typ, us in zip(
        t["event_id"].to_pylist(), t["user_id"].to_pylist(),
        t["event_type"].to_pylist(), ts_us(t["ts"]).tolist(),
    ):
        if typ == "click":
            clicks[u].append(us)
        elif typ == "purchase":
            purchases.append((eid, u, us))
    want = {}
    for eid, u, pt in purchases:
        bwd = max((c for c in clicks.get(u, []) if c <= pt), default=None)
        fwd = min((c for c in clicks.get(u, []) if c >= pt), default=None)
        if bwd is not None and (fwd is None or (pt - bwd) <= (fwd - pt)):
            ct = bwd  # equidistant ties go BACKWARD, per the contract
        else:
            ct = fwd
        if ct is not None:
            want[eid] = (u, pt, ct, abs(pt - ct))

    out = REGISTRY["join_asof_nearest"].fn(spark, sf_dir).collect()
    got = {
        r["event_id"]: (
            r["user_id"], r["purchase_us"], r["click_us"], r["gap_us"]
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_percent_of_total_matches_python_cents(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    cents: dict[str, int] = defaultdict(int)
    n: dict[str, int] = defaultdict(int)
    total = 0
    for p, x in zip(
        t["o_orderpriority"].to_pylist(), t["o_totalprice"].to_pylist()
    ):
        c = int(round_half_up(x * 100, 0))
        cents[p] += c
        n[p] += 1
        total += c
    want = {
        p: (
            n[p],
            cents[p] / 100.0,
            int(round_half_up(cents[p] * 1000000.0 / total, 0)) / 1000000.0,
        )
        for p in cents
    }

    out = REGISTRY["agg_percent_of_total"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["revenue"], r["share_of_total"])
        for r in out
    }
    assert got == want
    # Shares sum to ~1 (integer-unit rounding drift only).
    assert abs(sum(s for _, _, s in got.values()) - 1.0) <= len(got) * 5e-7


@pytest.mark.parametrize("sf_dir", SFS)
def test_division_priority_complete_matches_forall_definition(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    prios_of: dict[int, set[str]] = defaultdict(set)
    n_orders: dict[int, int] = defaultdict(int)
    all_prios: set[str] = set()
    for c, p in zip(
        t["o_custkey"].to_pylist(), t["o_orderpriority"].to_pylist()
    ):
        prios_of[c].add(p)
        n_orders[c] += 1
        all_prios.add(p)
    # The literal ∀-definition, not the engine's count-equality rewrite.
    want = {
        c: n_orders[c]
        for c, ps in prios_of.items()
        if all(p in ps for p in all_prios)
    }

    out = REGISTRY["division_priority_complete"].fn(spark, sf_dir).collect()
    got = {r["custkey"]: r["n_orders"] for r in out}
    assert got == want
    assert len(got) > 0  # non-degenerate at both SFs


@pytest.mark.parametrize("sf_dir", SFS)
def test_lakehouse_incremental_agg_matches_fresh_recompute(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate",
                 "o_totalprice"],
    )
    agg: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for k, p, d, x in zip(
        t["o_orderkey"].to_pylist(), t["o_orderpriority"].to_pylist(),
        t["o_orderdate"].to_pylist(), t["o_totalprice"].to_pylist(),
    ):
        in_base = k % 10 != 0
        # Final corpus = (base \ retractions) ∪ inserts: base keys
        # keep rows not retracted (%13), %10 keys are the inserts.
        if in_base and k % 13 == 0:
            continue
        cell = agg[(p, d.strftime("%Y-%m-%d"))]
        cell[0] += 1
        cell[1] += int(round_half_up(x * 100, 0))
    want = {
        key: (c[0], c[1]) for key, c in agg.items() if c[0] > 0
    }

    out = REGISTRY["lakehouse_incremental_agg"].fn(spark, sf_dir).collect()
    got = {
        (r["priority"], r["day"]): (r["n_orders"], r["sum_cents"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_join_bloom_pruned_matches_plain_join(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    lo = datetime(1995, 1, 1)
    hi = datetime(1995, 2, 1)
    build = {
        int(k)
        for k, p, d in zip(
            o["o_orderkey"].to_pylist(), o["o_orderpriority"].to_pylist(),
            o["o_orderdate"].to_pylist(),
        )
        if p == "1-URGENT" and lo <= d < hi
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    revs = [
        ep * (1 - dc)
        for k, ep, dc in zip(
            li["l_orderkey"].to_pylist(), li["l_extendedprice"].to_pylist(),
            li["l_discount"].to_pylist(),
        )
        if int(k) in build
    ]
    want = {"1995-01": (len(revs), round_half_up(math.fsum(revs), 2))}

    out = REGISTRY["join_bloom_pruned"].fn(spark, sf_dir).collect()
    got = {r["order_month"]: (r["n_lineitems"], r["revenue"]) for r in out}
    # No Bloom anywhere in the mirror: equality proves the bloom prune
    # dropped no true match and the join removed every false positive.
    assert got == want
