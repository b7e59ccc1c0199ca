"""Round-12 third opinions, part 4 — front-loading the r08 cohort that
fills round 13's remaining refresh slots: pure-Python reconstructions
asserted equal to the engine at sf0.001 AND sf0.01:

- agg_mode_exact: deterministic mode (count desc, value asc) + the
  lower-median order statistic, both walked over plain dicts;
- agg_weighted_median: the 2*cumweight >= total selection rule;
- events_anomaly_mad: both lower-median order statistics and the
  3-MAD filter, with the MAD=0 exclusion;
- events_cohort_ltv: the exact-cents cohort/offset revenue triangle;
- events_top_paths: first-8-steps path assembly and the (count desc,
  path) top-20 cut;
- mining_association_rules: support/confidence/lift in the engine's
  exact float expression order over the top-20 pair cut;
- join_attribution_first_touch: earliest click in the 7-day lookback
  with the (click_ts, click_id) tie-break;
- layout_zorder_clustering: an independent Morton interleave and the
  per-z-range min/max rectangles.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.join_queries  # noqa: F401
import mapreduceframework_spark.plans.lakehouse_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

US_PER_DAY = 86_400_000_000


def _lower_median(weighted: dict[int, int]) -> int:
    """Smallest value whose cumulative count reaches (n+1)//2 — the
    lower-median / percentile_disc(0.5) convention."""
    n = sum(weighted.values())
    target = (n + 1) // 2
    cw = 0
    for v in sorted(weighted):
        cw += weighted[v]
        if cw >= target:
            return v
    raise AssertionError("empty group")


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_mode_exact_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    status: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    cents: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for p, s, x in zip(
        t["o_orderpriority"].to_pylist(), t["o_orderstatus"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        status[p][s] += 1
        cents[p][int(round_half_up(x * 100, 0))] += 1
    want = {}
    for p in status:
        mode_s, mode_c = min(
            status[p].items(), key=lambda sc: (-sc[1], sc[0])
        )
        want[p] = (
            mode_s,
            mode_c,
            _lower_median(cents[p]),
            sum(cents[p].values()),
        )

    out = REGISTRY["agg_mode_exact"].fn(spark, sf_dir).collect()
    got = {
        r["priority"]: (
            r["mode_status"], r["mode_count"], r["median_cents"], r["n_orders"]
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_weighted_median_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    wsum: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for f_, x, q in zip(
        t["l_returnflag"].to_pylist(), t["l_extendedprice"].to_pylist(),
        t["l_quantity"].to_pylist(),
    ):
        wsum[f_][int(round_half_up(x * 100, 0))] += int(q)
    want = {}
    for f_, by_cents in wsum.items():
        tw = sum(by_cents.values())
        cw = 0
        for c in sorted(by_cents):
            cw += by_cents[c]
            if 2 * cw >= tw:  # first value reaching half the weight
                want[f_] = (tw, c)
                break

    out = REGISTRY["agg_weighted_median"].fn(spark, sf_dir).collect()
    got = {
        r["l_returnflag"]: (r["total_weight"], r["wmedian_cents"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_anomaly_mad_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    rows = [
        (eid, typ, int(round_half_up(v * 10_000, 0)))
        for eid, typ, v in zip(
            t["event_id"].to_pylist(), t["event_type"].to_pylist(),
            t["value"].to_pylist(),
        )
    ]
    by_type: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for _, typ, v4 in rows:
        by_type[typ][v4] += 1
    med = {typ: _lower_median(c) for typ, c in by_type.items()}
    mad = {}
    for typ, c in by_type.items():
        dev: dict[int, int] = defaultdict(int)
        for v4, n in c.items():
            dev[abs(v4 - med[typ])] += n
        mad[typ] = _lower_median(dev)
    want = {
        eid: (typ, v4, med[typ], mad[typ])
        for eid, typ, v4 in rows
        if mad[typ] > 0 and abs(v4 - med[typ]) > 3 * mad[typ]
    }

    out = REGISTRY["events_anomaly_mad"].fn(spark, sf_dir).collect()
    got = {
        r["event_id"]: (r["event_type"], r["v_e4"], r["med_e4"], r["mad_e4"])
        for r in out
    }
    assert got == want
    assert got, "no MAD outliers — the check proved nothing"


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_cohort_ltv_matches_python_triangle(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "value"],
    )
    p = [
        (u, us // US_PER_DAY, int(round_half_up(v * 100, 0)))
        for u, typ, us, v in zip(
            t["user_id"].to_pylist(), t["event_type"].to_pylist(),
            ts_us(t["ts"]).tolist(), t["value"].to_pylist(),
        )
        if typ == "purchase"
    ]
    cohort = {}
    for u, d, _ in p:
        cohort[u] = min(cohort.get(u, d), d)
    size: dict[int, int] = defaultdict(int)
    for c in cohort.values():
        size[c] += 1
    cell: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for u, d, cents in p:
        k = (cohort[u], d - cohort[u])
        cell[k][0] += 1
        cell[k][1] += cents
    want = {}
    for c in size:
        cum = 0
        for off in sorted(off for (cc, off) in cell if cc == c):
            n_p, rev = cell[(c, off)]
            cum += rev
            day = datetime.fromtimestamp(
                c * 86_400, tz=timezone.utc
            ).strftime("%Y-%m-%d")
            want[(day, off)] = (n_p, rev, cum, size[c])

    out = REGISTRY["events_cohort_ltv"].fn(spark, sf_dir).collect()
    got = {
        (r["cohort"], r["offset_days"]): (
            r["n_purchases"], r["rev_e2"], r["cum_rev_e2"], r["cohort_size"]
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_top_paths_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    sess: dict[tuple[int, int], list[tuple[int, int, str]]] = defaultdict(list)
    for u, us, eid, typ in zip(
        t["user_id"].to_pylist(), ts_us(t["ts"]).tolist(),
        t["event_id"].to_pylist(), t["event_type"].to_pylist(),
    ):
        sess[(u, us // US_PER_DAY)].append((us, eid, typ))
    counts: dict[str, int] = defaultdict(int)
    for rows in sess.values():
        path = ">".join(typ for _, _, typ in sorted(rows)[:8])
        counts[path] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = dict(top)

    out = REGISTRY["events_top_paths"].fn(spark, sf_dir).collect()
    got = {r["path"]: r["n_sessions"] for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_mining_association_rules_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    baskets: dict[int, set[int]] = defaultdict(set)
    for o, pk in zip(
        t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()
    ):
        baskets[o].add(pk)
    n_orders = len(baskets)
    item: dict[int, int] = defaultdict(int)
    pair: dict[tuple[int, int], int] = defaultdict(int)
    for parts in baskets.values():
        sp = sorted(parts)
        for i, a in enumerate(sp):
            item[a] += 1
            for b in sp[i + 1:]:
                pair[(a, b)] += 1
    top = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {}
    for (a, b), n_ab in top:
        want[(a, b)] = (
            n_ab,
            item[a],
            item[b],
            int(round_half_up(1000000.0 * n_ab / n_orders, 0)),
            int(round_half_up(1000000.0 * n_ab / item[a], 0)),
            # The engine's exact expression order: ((1e6*n_ab)*n)/(na*nb).
            int(
                round_half_up(
                    1000000.0 * n_ab * n_orders / (item[a] * item[b]), 0
                )
            ),
        )

    out = REGISTRY["mining_association_rules"].fn(spark, sf_dir).collect()
    got = {
        (r["part_a"], r["part_b"]): (
            r["n_ab"], r["n_a"], r["n_b"],
            r["support_e6"], r["conf_ab_e6"], r["lift_e6"],
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_join_attribution_first_touch_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    clicks: dict[int, list[tuple[int, int]]] = defaultdict(list)
    purchases = []
    for eid, u, typ, us, v in zip(
        t["event_id"].to_pylist(), t["user_id"].to_pylist(),
        t["event_type"].to_pylist(), ts_us(t["ts"]).tolist(),
        t["value"].to_pylist(),
    ):
        if typ == "click":
            clicks[u].append((us, eid))
        elif typ == "purchase":
            purchases.append(
                (eid, u, us, int(round_half_up(v * 10_000, 0)))
            )
    want = {}
    for pid, u, pt, v4 in purchases:
        cand = [
            (cus, cid)
            for cus, cid in clicks.get(u, [])
            if pt - 7 * US_PER_DAY <= cus <= pt
        ]
        if cand:
            cus, cid = min(cand)  # earliest click, click_id tie-break
            ts_str = datetime.fromtimestamp(
                cus // 1_000_000, tz=timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S")
            want[pid] = (u, cid, ts_str, v4)

    out = REGISTRY["join_attribution_first_touch"].fn(spark, sf_dir).collect()
    got = {
        r["purchase_id"]: (
            r["user_id"], r["first_click_id"], r["first_click_ts"],
            r["value_e4"],
        )
        for r in out
    }
    assert got == want


def _morton16(px: int, sx: int) -> int:
    """Independent Morton interleave: bit i of px -> z bit 2i, bit i of
    sx -> z bit 2i+1 (deliberately NOT the production _z_expr string)."""
    z = 0
    for i in range(8):
        z |= ((px >> i) & 1) << (2 * i)
        z |= ((sx >> i) & 1) << (2 * i + 1)
    return z


@pytest.mark.parametrize("sf_dir", SFS)
def test_layout_zorder_matches_python_morton(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    agg: dict[int, list[int]] = {}
    for pk, sk in zip(
        t["l_partkey"].to_pylist(), t["l_suppkey"].to_pylist()
    ):
        px, sx = pk % 256, sk % 256
        zb = _morton16(px, sx) // 2048  # 65536 / 32 buckets
        if zb not in agg:
            agg[zb] = [0, px, px, sx, sx]
        a = agg[zb]
        a[0] += 1
        a[1] = min(a[1], px)
        a[2] = max(a[2], px)
        a[3] = min(a[3], sx)
        a[4] = max(a[4], sx)
    want = {zb: tuple(a) for zb, a in agg.items()}

    out = REGISTRY["layout_zorder_clustering"].fn(spark, sf_dir).collect()
    got = {
        r["zbucket"]: (
            r["n_rows"], r["min_part"], r["max_part"],
            r["min_supp"], r["max_supp"],
        )
        for r in out
    }
    assert got == want
    # The clustering claim, as bit arithmetic: a 2048-wide z range
    # fixes z bits 11-15, i.e. px bits 6-7 and sx bits 5-7, so every
    # bucket's rectangle spans < 2^6 on px and < 2^5 on sx — small on
    # BOTH dimensions, which is the whole point of Morton layout.
    for _, mnp, mxp, mns, mxs in got.values():
        assert mxp - mnp < 64 and mxs - mns < 32