"""Round-12 third opinions, part 19 — the TPC-H suite (Q2..Q22, minus
the Q1/Q6 pair mirrored in part 16) reconstructed with plain dict
joins and EXACT integer money arithmetic, asserted equal to the engine
at sf0.001 AND sf0.01. These oracles are textbook SQL, so the marginal
risk looked low — and yet this module's first (fsum-based) draft
found TWO real defects: the Q6 empty-window NULL, and the Q8
ASIA/1999 revenue total landing EXACTLY on a half-cent boundary
(102470172.5450) where ROUND(SUM(double), 2) was decided by float
noise on both engines. The whole family now sums exact e4 integers
(plans/exact.py rev_e4), and these mirrors replay that contract
symbol for symbol; every mirror also asserts its filter or join
genuinely selects rows at both SFs.
"""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up

import mapreduceframework_spark.plans.join_queries  # noqa: F401
import mapreduceframework_spark.plans.tpch_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _t(sf_dir, name, cols):
    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=cols)


def _rows(tbl, cols):
    return list(zip(*[tbl[c].to_pylist() for c in cols]))


def _run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


def _cents(x: float) -> int:
    return int(round_half_up(x * 100, 0))


def _rev4(p: float, d: float) -> int:
    """Exact e4 revenue term: cents * (100 - discount_pct) — the
    round-12 hardened contract (plans/exact.py rev_e4)."""
    return _cents(p) * (100 - _cents(d))


def _fin2(se4: int) -> float:
    """int_round_div(s, 100) / 100.0 replayed — integer-domain
    half-up away from zero, exact at any magnitude."""
    q = (abs(se4) + 50) // 100
    return (-q if se4 < 0 else q) / 100.0


@pytest.mark.parametrize("sf_dir", SFS)
def test_q2_min_cost_supplier(spark, sf_dir):
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]),
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    cost: dict[tuple[int, int], float] = {}
    for pk, sk, p, q in li:
        uc = p / q
        k = (pk, sk)
        if k not in cost or uc < cost[k]:
            cost[k] = uc
    n = _rows(_t(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
              ["n_nationkey", "n_regionkey"])
    r = _rows(_t(sf_dir, "region", ["r_regionkey", "r_name"]),
              ["r_regionkey", "r_name"])
    eur_regions = {rk for rk, nm in r if nm == "EUROPE"}
    eur_nations = {nk for nk, rk in n if rk in eur_regions}
    s = _rows(
        _t(sf_dir, "supplier",
           ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]),
        ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    )
    eur = {sk: (nm, ab) for sk, nm, ab, nk in s if nk in eur_nations}
    ce: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for (pk, sk), uc in cost.items():
        if sk in eur:
            ce[pk].append((uc, sk))
    p = _rows(
        _t(sf_dir, "part", ["p_partkey", "p_name", "p_size"]),
        ["p_partkey", "p_name", "p_size"],
    )
    pinfo = {pk: nm for pk, nm, sz in p if sz < 10}
    want = set()
    for pk, lst in ce.items():
        if pk not in pinfo:
            continue
        mn = min(uc for uc, _ in lst)
        for uc, sk in lst:
            if uc == mn:
                nm, ab = eur[sk]
                want.add((pk, pinfo[pk], nm, ab, uc))
    got = {
        (x["p_partkey"], x["p_name"], x["s_name"], x["s_acctbal"],
         x["min_cost"])
        for x in _run(spark, sf_dir, "tpch_q2_min_cost_supplier")
    }
    assert got == want
    assert want


@pytest.mark.parametrize("sf_dir", SFS)
def test_q3_q5_q7_revenue_joins(spark, sf_dir):
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate"]),
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"],
    )
    o = _rows(
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    order_info = {ok: (ck, od) for ok, ck, od in o}
    c = _rows(
        _t(sf_dir, "customer",
           ["c_custkey", "c_mktsegment", "c_nationkey"]),
        ["c_custkey", "c_mktsegment", "c_nationkey"],
    )
    cust_seg = {ck: seg for ck, seg, _ in c}
    cust_nat = {ck: nk for ck, _, nk in c}
    s = _rows(_t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
              ["s_suppkey", "s_nationkey"])
    supp_nat = dict(s)
    nn = _rows(_t(sf_dir, "nation",
                  ["n_nationkey", "n_name", "n_regionkey"]),
               ["n_nationkey", "n_name", "n_regionkey"])
    nat_name = {nk: nm for nk, nm, _ in nn}

    # Q3
    cut = _ts(1998, 3, 15)
    rev3: dict[int, int] = defaultdict(int)
    for ok, sk, p, d, sd in li:
        ck, od = order_info[ok]
        if cust_seg.get(ck) == "BUILDING" and od < cut and sd > cut:
            rev3[ok] += _rev4(p, d)
    scored = sorted(
        ((_fin2(v), ok) for ok, v in rev3.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    want3 = [(ok, rev) for rev, ok in scored]
    got3 = [
        (x["o_orderkey"], x["revenue"])
        for x in sorted(
            _run(spark, sf_dir, "tpch_q3_shipping"),
            key=lambda x: (-x["revenue"], x["o_orderkey"]),
        )
    ]
    assert got3 == want3 and want3

    # Q5: same-nation customer+supplier, order date window
    lo, hi = _ts(1996, 1, 1), _ts(1998, 1, 1)
    rev5: dict[str, int] = defaultdict(int)
    for ok, sk, p, d, _ in li:
        ck, od = order_info[ok]
        snk = supp_nat.get(sk)
        if snk is None or cust_nat.get(ck) != snk:
            continue
        if lo <= od < hi:
            rev5[nat_name[snk]] += _rev4(p, d)
    want5 = {nm: _fin2(v) for nm, v in rev5.items()}
    got5 = {
        x["n_name"]: x["revenue"]
        for x in _run(spark, sf_dir, "tpch_q5_local_volume")
    }
    assert got5 == want5 and want5

    # Q7: supp/cust nation pairs < 5, distinct, per order year
    rev7: dict[tuple, int] = defaultdict(int)
    for ok, sk, p, d, _ in li:
        ck, od = order_info[ok]
        n1 = supp_nat.get(sk)
        n2 = cust_nat.get(ck)
        if n1 is None or n2 is None:
            continue
        if n1 < 5 and n2 < 5 and n1 != n2:
            rev7[(nat_name[n1], nat_name[n2], od.year)] += _rev4(p, d)
    want7 = {k: _fin2(v) for k, v in rev7.items()}
    got7 = {
        (x["supp_nation"], x["cust_nation"], x["o_year"]): x["revenue"]
        for x in _run(spark, sf_dir, "tpch_q7_nation_volume")
    }
    assert got7 == want7 and want7


@pytest.mark.parametrize("sf_dir", SFS)
def test_q4_q12_q13_priority_counts(spark, sf_dir):
    o = _rows(
        _t(sf_dir, "orders",
           ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_shipdate", "l_returnflag"]),
        ["l_orderkey", "l_shipdate", "l_returnflag"],
    )
    ships: dict[int, list] = defaultdict(list)
    for ok, sd, _ in li:
        ships[ok].append(sd)

    # Q4
    lo, hi = _ts(1997, 1, 1), _ts(1997, 4, 1)
    want4: dict[str, int] = defaultdict(int)
    for ok, _, od, pr in o:
        if lo <= od < hi and any(
            sd > od + datetime.timedelta(days=30)
            for sd in ships.get(ok, ())
        ):
            want4[pr] += 1
    got4 = {
        x["o_orderpriority"]: x["order_count"]
        for x in _run(spark, sf_dir, "tpch_q4_priority_count")
    }
    assert got4 == dict(want4) and want4

    # Q12
    prio = {ok: pr for ok, _, _, pr in o}
    lo, hi = _ts(1997, 1, 1), _ts(1998, 1, 1)
    want12: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for ok, sd, fl in li:
        if lo <= sd < hi:
            c = want12[fl]
            if prio[ok] in ("1-URGENT", "2-HIGH"):
                c[0] += 1
            else:
                c[1] += 1
    got12 = {
        x["ship_class"]: [x["high_line_count"], x["low_line_count"]]
        for x in _run(spark, sf_dir, "tpch_q12_shipmode_priority")
    }
    assert got12 == dict(want12) and want12

    # Q13
    ckeys = _t(sf_dir, "customer", ["c_custkey"])["c_custkey"].to_pylist()
    per_cust = {ck: 0 for ck in ckeys}
    for ok, ck, _, pr in o:
        if pr != "1-URGENT" and ck in per_cust:
            per_cust[ck] += 1
    want13: dict[int, int] = defaultdict(int)
    for n in per_cust.values():
        want13[n] += 1
    got13 = {
        x["c_count"]: x["custdist"]
        for x in _run(spark, sf_dir, "tpch_q13_custdist")
    }
    assert got13 == dict(want13)


@pytest.mark.parametrize("sf_dir", SFS)
def test_q8_q9_q14_part_joins(spark, sf_dir):
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate"]),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount", "l_shipdate"],
    )
    o = _rows(_t(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]),
              ["o_orderkey", "o_custkey", "o_orderdate"])
    order_info = {ok: (ck, od) for ok, ck, od in o}
    cust_nat = dict(
        _rows(_t(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
              ["c_custkey", "c_nationkey"])
    )
    supp_nat = dict(
        _rows(_t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
              ["s_suppkey", "s_nationkey"])
    )
    nn = _rows(_t(sf_dir, "nation",
                  ["n_nationkey", "n_name", "n_regionkey"]),
               ["n_nationkey", "n_name", "n_regionkey"])
    nat_name = {nk: nm for nk, nm, _ in nn}
    nat_region = {nk: rk for nk, _, rk in nn}
    r = _rows(_t(sf_dir, "region", ["r_regionkey", "r_name"]),
              ["r_regionkey", "r_name"])
    region_name = dict(r)
    p = _rows(
        _t(sf_dir, "part", ["p_partkey", "p_name", "p_type",
                            "p_retailprice"]),
        ["p_partkey", "p_name", "p_type", "p_retailprice"],
    )
    part_name = {pk: nm for pk, nm, _, _ in p}
    part_type = {pk: ty for pk, _, ty, _ in p}
    part_retail = {pk: rp for pk, _, _, rp in p}

    # Q8: ASIA-region customers; nation_vol for supplier nation 2
    nat8: dict[int, int] = defaultdict(int)
    tot8: dict[int, int] = defaultdict(int)
    for ok, pk, sk, q, pr, d, sd in li:
        ck, od = order_info[ok]
        cnk = cust_nat.get(ck)
        if cnk is None or region_name.get(nat_region[cnk]) != "ASIA":
            continue
        if sk not in supp_nat:
            continue
        amt = _rev4(pr, d)
        tot8[od.year] += amt
        if supp_nat[sk] == 2:
            nat8[od.year] += amt
    want8 = {}
    for y, vs in tot8.items():
        nv = _fin2(nat8.get(y, 0))
        tv = _fin2(vs)
        want8[y] = (nv, tv, nv / tv)
    got8 = {
        x["o_year"]: (x["nation_vol"], x["total_vol"], x["mkt_share"])
        for x in _run(spark, sf_dir, "tpch_q8_market_share")
    }
    assert got8 == want8 and want8

    # Q9: parts LIKE %red%, profit per (supplier nation, year)
    prof: dict[tuple, int] = defaultdict(int)
    for ok, pk, sk, q, pr, d, _ in li:
        if "red" not in part_name[pk]:
            continue
        if sk not in supp_nat:
            continue
        _, od = order_info[ok]
        prof[(nat_name[supp_nat[sk]], od.year)] += (
            _rev4(pr, d) - _cents(part_retail[pk]) * int(q) * 10
        )
    want9 = {k: _fin2(v) for k, v in prof.items()}
    got9 = {
        (x["nation"], x["o_year"]): x["profit"]
        for x in _run(spark, sf_dir, "tpch_q9_product_profit")
    }
    assert got9 == want9 and want9

    # Q14: PROMO share in 1997-01
    lo, hi = _ts(1997, 1, 1), _ts(1997, 2, 1)
    promo = total = 0
    n_in_window = 0
    for ok, pk, sk, q, pr, d, sd in li:
        if lo <= sd < hi:
            n_in_window += 1
            amt = _rev4(pr, d)
            total += amt
            if part_type[pk] == "PROMO":
                promo += amt
    pv = _fin2(promo)
    tv = _fin2(total)
    out = _run(spark, sf_dir, "tpch_q14_promo_revenue")
    assert len(out) == 1
    assert (out[0]["promo"], out[0]["total"], out[0]["promo_pct"]) == (
        pv, tv, 100.0 * pv / tv,
    )
    assert n_in_window


@pytest.mark.parametrize("sf_dir", SFS)
def test_q10_q15_q16_supplier_customer_rollups(spark, sf_dir):
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
            "l_discount", "l_returnflag", "l_shipdate"]),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount", "l_returnflag", "l_shipdate"],
    )
    o = _rows(_t(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
              ["o_orderkey", "o_custkey"])
    order_cust = dict(o)
    cust_name = dict(
        _rows(_t(sf_dir, "customer", ["c_custkey", "c_name"]),
              ["c_custkey", "c_name"])
    )

    # Q10: returned revenue top-20
    rev: dict[int, int] = defaultdict(int)
    for ok, pk, sk, pr, d, fl, sd in li:
        if fl == "R":
            rev[order_cust[ok]] += _rev4(pr, d)
    scored = sorted(
        ((float(v) / 10000.0, ck) for ck, v in rev.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    want10 = [(ck, cust_name[ck], r) for r, ck in scored]
    got10 = [
        (x["c_custkey"], x["c_name"], x["revenue"])
        for x in sorted(
            _run(spark, sf_dir, "tpch_q10_returned_revenue"),
            key=lambda x: (-x["revenue"], x["c_custkey"]),
        )
    ]
    assert got10 == want10 and want10

    # Q15: top supplier by windowed revenue
    lo, hi = _ts(1997, 1, 1), _ts(1997, 4, 1)
    srev: dict[int, int] = defaultdict(int)
    for ok, pk, sk, pr, d, fl, sd in li:
        if lo <= sd < hi:
            srev[sk] += _rev4(pr, d)
    totals = {sk: _fin2(v) for sk, v in srev.items()}
    mx = max(totals.values())
    s = _rows(_t(sf_dir, "supplier", ["s_suppkey", "s_name"]),
              ["s_suppkey", "s_name"])
    sname = dict(s)
    want15 = {
        (sk, sname[sk], tv) for sk, tv in totals.items() if tv == mx
    }
    got15 = {
        (x["s_suppkey"], x["s_name"], x["total_rev"])
        for x in _run(spark, sf_dir, "tpch_q15_top_supplier")
    }
    assert got15 == want15 and want15

    # Q16: supplier counts per (brand, type, size)
    p = _rows(
        _t(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]),
        ["p_partkey", "p_brand", "p_type", "p_size"],
    )
    part_info = {pk: (br, ty, sz) for pk, br, ty, sz in p}
    sneg = {
        sk
        for sk, ab in _rows(
            _t(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]),
            ["s_suppkey", "s_acctbal"],
        )
        if ab < 0
    }
    supp_sets: dict[tuple, set[int]] = defaultdict(set)
    for ok, pk, sk, pr, d, fl, sd in li:
        br, ty, sz = part_info[pk]
        if br == "Brand#1" or sk in sneg:
            continue
        supp_sets[(br, ty, sz)].add(sk)
    want16 = {k: len(v) for k, v in supp_sets.items()}
    got16 = {
        (x["p_brand"], x["p_type"], x["p_size"]): x["supplier_cnt"]
        for x in _run(spark, sf_dir, "tpch_q16_supplier_cnt")
    }
    assert got16 == want16 and want16


@pytest.mark.parametrize("sf_dir", SFS)
def test_q17_q18_q19_quantity_shapes(spark, sf_dir):
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
            "l_discount"]),
        ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
         "l_discount"],
    )

    # Q17
    per_part: dict[int, list[float]] = defaultdict(list)
    for ok, pk, q, pr, d in li:
        per_part[pk].append(q)
    cut = {
        pk: 0.5 * (math.fsum(qs) / len(qs)) for pk, qs in per_part.items()
    }
    small = [_cents(pr) for ok, pk, q, pr, d in li if q < cut[pk]]
    want17 = (float(sum(small)) / 100.0) / 7.0
    out17 = _run(spark, sf_dir, "tpch_q17_small_qty_revenue")
    assert len(out17) == 1 and out17[0]["avg_yearly"] == want17
    assert small

    # Q18
    qsum: dict[int, list[float]] = defaultdict(list)
    for ok, pk, q, pr, d in li:
        qsum[ok].append(q)
    big = {ok for ok, qs in qsum.items() if math.fsum(qs) > 250}
    o = _rows(
        _t(sf_dir, "orders",
           ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust_name = dict(
        _rows(_t(sf_dir, "customer", ["c_custkey", "c_name"]),
              ["c_custkey", "c_name"])
    )
    want18 = {}
    for ok, ck, od, tp in o:
        if ok in big:
            want18[ok] = (
                cust_name[ck],
                ck,
                od,
                round_half_up(tp, 2),
                round_half_up(math.fsum(qsum[ok]), 2),
            )
    got18 = {
        x["o_orderkey"]: (x["c_name"], x["c_custkey"], x["o_orderdate"],
                          x["total"], x["sum_qty"])
        for x in _run(spark, sf_dir, "tpch_q18_large_orders")
    }
    assert got18 == want18 and want18

    # Q19
    p = _rows(
        _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]),
        ["p_partkey", "p_brand", "p_size"],
    )
    pinfo = {pk: (br, sz) for pk, br, sz in p}
    terms = []
    for ok, pk, q, pr, d in li:
        br, sz = pinfo[pk]
        if (
            (br == "Brand#1" and 1 <= sz <= 15 and 1 <= q <= 11)
            or (br == "Brand#2" and 1 <= sz <= 25 and 10 <= q <= 20)
            or (br == "Brand#3" and 1 <= sz <= 35 and 20 <= q <= 30)
        ):
            terms.append(_rev4(pr, d))
    out19 = _run(spark, sf_dir, "tpch_q19_disjunctive")
    assert len(out19) == 1
    assert (out19[0]["revenue"], out19[0]["n_items"]) == (
        _fin2(sum(terms)),
        len(terms),
    )
    assert terms


@pytest.mark.parametrize("sf_dir", SFS)
def test_q20_q21_q22_exists_shapes(spark, sf_dir):
    li = _rows(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_shipdate"]),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_shipdate"],
    )
    p = _rows(_t(sf_dir, "part", ["p_partkey", "p_name"]),
              ["p_partkey", "p_name"])
    red_parts = {pk for pk, nm in p if nm.startswith("red")}
    s = _rows(
        _t(sf_dir, "supplier",
           ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]),
        ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    )
    nn = _rows(_t(sf_dir, "nation", ["n_nationkey", "n_name"]),
               ["n_nationkey", "n_name"])
    nat_name = dict(nn)

    # Q20
    qlists: dict[tuple[int, int], list[float]] = defaultdict(list)
    for ok, pk, sk, q, sd in li:
        if pk in red_parts:
            qlists[(sk, pk)].append(q)
    excess = {
        sk for (sk, pk), qs in qlists.items() if math.fsum(qs) > 100
    }
    want20 = {
        (nm, ab)
        for sk, nm, ab, nk in s
        if nat_name.get(nk) == "NATION_3" and sk in excess
    }
    got20 = {
        (x["s_name"], x["s_acctbal"])
        for x in _run(spark, sf_dir, "tpch_q20_excess_shippers")
    }
    assert got20 == want20 and want20

    # Q21
    o = _rows(
        _t(sf_dir, "orders",
           ["o_orderkey", "o_orderstatus", "o_orderdate"]),
        ["o_orderkey", "o_orderstatus", "o_orderdate"],
    )
    order_stat = {ok: (st, od) for ok, st, od in o}
    by_order: dict[int, list[tuple[int, object]]] = defaultdict(list)
    for ok, pk, sk, q, sd in li:
        by_order[ok].append((sk, sd))
    sname = {sk: nm for sk, nm, _, _ in s}
    want21: dict[str, int] = defaultdict(int)
    for ok, lines in by_order.items():
        st, od = order_stat[ok]
        if st != "F":
            continue
        cut = od + datetime.timedelta(days=60)
        for sk, sd in lines:
            if sd <= cut:
                continue
            others = [x for x in lines if x[0] != sk]
            if others and not any(osd > cut for _, osd in others):
                want21[sname[sk]] += 1
    got21 = {
        x["s_name"]: x["numwait"]
        for x in _run(spark, sf_dir, "tpch_q21_waiting_supplier")
    }
    assert got21 == dict(want21) and want21

    # Q22
    c = _rows(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        ["c_custkey", "c_nationkey", "c_acctbal"],
    )
    pos = [ab for _, _, ab in c if ab > 0]
    avg = math.fsum(pos) / len(pos)
    op = _rows(
        _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"]),
        ["o_custkey", "o_orderpriority"],
    )
    urgent = {ck for ck, pr in op if pr == "1-URGENT"}
    cells: dict[int, list] = defaultdict(lambda: [0, 0])
    for ck, nk, ab in c:
        if ab > avg and ck not in urgent:
            cell = cells[nk]
            cell[0] += 1
            cell[1] += int(round_half_up(ab * 100, 0))
    want22 = {
        nk: (n, float(cents) / 100.0) for nk, (n, cents) in cells.items()
    }
    got22 = {
        x["c_nationkey"]: (x["n_cust"], x["total_bal"])
        for x in _run(spark, sf_dir, "tpch_q22_idle_rich_customers")
    }
    assert got22 == want22 and want22
