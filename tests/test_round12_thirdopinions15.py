"""Round-12 third opinions, part 15 — the join/subquery family
reconstructed with plain dicts from raw parquet, asserted equal to the
engine at sf0.001 AND sf0.01. The salted/two-path rows matter most: the
engine routes them through custom skew machinery, and the mirror proves
the routed plans still compute the plain join:

- join_inner / join_left_agg / join_semi / join_anti / join_broadcast /
  join_theta / join_cross / join_full_outer;
- join_null_safe (<=> peers the NULL keys) and join_not_in_null_aware
  (the NOT IN three-valued-logic trap, empty-vs-nonempty null set);
- join_salted_skew and join_skew_two_path (hot-key top-10 router) —
  both must equal the unsalted, unrouted dict join;
- join_range_bands / join_range_binned (band predicates replayed
  literally, including the overlap in the binned grid);
- join_asof_forward_gap (strictly-later nearest order per customer);
- lateral_last_ship / subquery_exists_late_ship /
  subquery_scalar_above_avg / udf_cogrouped_reconcile;
- union_by_name_evolved (schema-evolution NULL fill).
"""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.extension_queries  # noqa: F401
import mapreduceframework_spark.plans.join_queries  # noqa: F401
import mapreduceframework_spark.plans.tpch_queries  # noqa: F401
import mapreduceframework_spark.plans.udf_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _cents(x: float) -> int:
    return int(round_half_up(x * 100, 0))


def _orders(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/orders.parquet", columns=cols)


def _customer(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/customer.parquet", columns=cols)


@pytest.mark.parametrize("sf_dir", SFS)
def test_basic_join_family_matches_python(spark, sf_dir):
    o = _orders(sf_dir, ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _customer(sf_dir, ["c_custkey", "c_name", "c_nationkey"])
    cust_name = dict(
        zip(c["c_custkey"].to_pylist(), c["c_name"].to_pylist())
    )
    orows = list(
        zip(
            o["o_orderkey"].to_pylist(),
            o["o_custkey"].to_pylist(),
            o["o_totalprice"].to_pylist(),
        )
    )

    want_inner = sorted(
        (ok, cust_name[ck], round_half_up(tp, 2))
        for ok, ck, tp in orows
        if ck in cust_name
    )
    got_inner = sorted(
        (r["o_orderkey"], r["c_name"], r["total"])
        for r in REGISTRY["join_inner"].fn(spark, sf_dir).collect()
    )
    assert got_inner == want_inner

    per_cust: dict[int, int] = {ck: 0 for ck in cust_name}
    for _, ck, _ in orows:
        if ck in per_cust:
            per_cust[ck] += 1
    got_left = {
        r["c_custkey"]: r["n_orders"]
        for r in REGISTRY["join_left_agg"].fn(spark, sf_dir).collect()
    }
    assert got_left == per_cust

    big_buyers = {ck for _, ck, tp in orows if tp > 300000}
    want_semi = {
        (ck, cust_name[ck]) for ck in big_buyers if ck in cust_name
    }
    got_semi = {
        (r["c_custkey"], r["c_name"])
        for r in REGISTRY["join_semi"].fn(spark, sf_dir).collect()
    }
    assert got_semi == want_semi

    buyers = {ck for _, ck, _ in orows}
    want_anti = {
        (ck, nm) for ck, nm in cust_name.items() if ck not in buyers
    }
    got_anti = {
        (r["c_custkey"], r["c_name"])
        for r in REGISTRY["join_anti"].fn(spark, sf_dir).collect()
    }
    assert got_anti == want_anti


@pytest.mark.parametrize("sf_dir", SFS)
def test_broadcast_theta_cross_fullouter_match_python(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey"],
    )
    p = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    brand = {
        pk: br
        for pk, br, sz in zip(
            p["p_partkey"].to_pylist(),
            p["p_brand"].to_pylist(),
            p["p_size"].to_pylist(),
        )
        if sz > 40
    }
    want_b = sorted(
        (ok, ln, brand[pk])
        for ok, ln, pk in zip(
            li["l_orderkey"].to_pylist(),
            li["l_linenumber"].to_pylist(),
            li["l_partkey"].to_pylist(),
        )
        if pk in brand
    )
    got_b = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["p_brand"])
        for r in REGISTRY["join_broadcast"].fn(spark, sf_dir).collect()
    )
    assert got_b == want_b

    s = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_acctbal", "s_nationkey"],
    )
    c = _customer(sf_dir, ["c_custkey", "c_acctbal", "c_nationkey"])
    cbals = sorted(c["c_acctbal"].to_pylist())
    import bisect

    want_t = {}
    for sk, sb in zip(
        s["s_suppkey"].to_pylist(), s["s_acctbal"].to_pylist()
    ):
        n = len(cbals) - bisect.bisect_right(cbals, sb)
        if n > 0:
            want_t[sk] = n
    got_t = {
        r["s_suppkey"]: r["n_richer"]
        for r in REGISTRY["join_theta"].fn(spark, sf_dir).collect()
    }
    assert got_t == want_t

    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_name"])
    names = reg["r_name"].to_pylist()
    want_x = sorted((a, b) for a in names for b in names)
    got_x = sorted(
        (r["a"], r["b"])
        for r in REGISTRY["join_cross"].fn(spark, sf_dir).collect()
    )
    assert got_x == want_x

    cn: dict[int, int] = defaultdict(int)
    sn: dict[int, int] = defaultdict(int)
    for nk in c["c_nationkey"].to_pylist():
        cn[nk] += 1
    for nk in s["s_nationkey"].to_pylist():
        sn[nk] += 1
    want_f = {
        nk: (cn.get(nk, 0), sn.get(nk, 0)) for nk in set(cn) | set(sn)
    }
    got_f = {
        r["nk"]: (r["n_cust"], r["n_supp"])
        for r in REGISTRY["join_full_outer"].fn(spark, sf_dir).collect()
    }
    assert got_f == want_f


@pytest.mark.parametrize("sf_dir", SFS)
def test_null_aware_joins_match_python(spark, sf_dir):
    c = _customer(sf_dir, ["c_custkey", "c_mktsegment", "c_acctbal"])
    segs = [
        None if seg == "BUILDING" else seg
        for seg in c["c_mktsegment"].to_pylist()
    ]
    counts: dict[object, int] = defaultdict(int)
    for seg in segs:
        counts[seg] += 1
    want_ns = dict(counts)
    got_ns = {
        r["seg"]: r["n"]
        for r in REGISTRY["join_null_safe"].fn(spark, sf_dir).collect()
    }
    assert got_ns == want_ns
    assert None in want_ns  # the null-peer genuinely exercised

    # NOT IN with NULLIF buckets: a NULL probe row never passes NOT IN
    # (three-valued logic), and the subquery side here excludes 0 and
    # NULLs by construction, so the comparison is the non-null set.
    bad = {
        ck % 100
        for ck, ab in zip(
            c["c_custkey"].to_pylist(), c["c_acctbal"].to_pylist()
        )
        if ab < 0 and ck % 100 != 0
    }
    o = _orders(sf_dir, ["o_orderpriority", "o_custkey"])
    want_ni: dict[str, int] = defaultdict(int)
    for pr, ck in zip(
        o["o_orderpriority"].to_pylist(), o["o_custkey"].to_pylist()
    ):
        bucket = ck % 100
        if bucket == 0:  # NULLIF -> NULL -> never passes NOT IN
            continue
        if bucket not in bad:
            want_ni[pr] += 1
    got_ni = {
        r["o_orderpriority"]: r["n_orders"]
        for r in REGISTRY["join_not_in_null_aware"].fn(spark, sf_dir)
        .collect()
    }
    assert got_ni == dict(want_ni)


@pytest.mark.parametrize("sf_dir", SFS)
def test_skew_joins_equal_plain_dict_join(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice"],
    )
    s = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    name = dict(zip(s["s_suppkey"].to_pylist(), s["s_name"].to_pylist()))
    agg: dict[int, list] = defaultdict(lambda: [0, 0])
    for sk, p in zip(
        li["l_suppkey"].to_pylist(), li["l_extendedprice"].to_pylist()
    ):
        if sk in name:
            c = agg[sk]
            c[0] += _cents(p)
            c[1] += 1
    want_salted = {
        name[sk]: (round_half_up(float(pc) / 100.0, 4), n)
        for sk, (pc, n) in agg.items()
    }
    got_salted = {
        r["s_name"]: (r["revenue"], r["n_items"])
        for r in REGISTRY["join_salted_skew"].fn(spark, sf_dir).collect()
    }
    assert got_salted == want_salted

    counts = {sk: n for sk, (_, n) in agg.items()}
    # include suppliers with zero items? hot list ranks lineitem counts
    # only — keys absent from lineitem can't be hot.
    licounts: dict[int, int] = defaultdict(int)
    for sk in li["l_suppkey"].to_pylist():
        licounts[sk] += 1
    hot = {
        sk
        for sk, _ in sorted(
            licounts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:10]
    }
    want_two = {
        (name[sk], 1 if sk in hot else 0): (
            n,
            round_half_up(float(pc) / 100.0, 4),
        )
        for sk, (pc, n) in agg.items()
    }
    got_two = {
        (r["s_name"], r["is_hot"]): (r["n_items"], r["revenue"])
        for r in REGISTRY["join_skew_two_path"].fn(spark, sf_dir).collect()
    }
    assert got_two == want_two


@pytest.mark.parametrize("sf_dir", SFS)
def test_range_joins_match_python_predicates(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    rows = list(
        zip(li["l_quantity"].to_pylist(), li["l_extendedprice"].to_pylist())
    )
    bands = [
        ("low", 0.0, 10.0),
        ("mid", 10.0, 25.0),
        ("high", 25.0, 40.0),
        ("top", 40.0, 51.0),
    ]
    agg: dict[str, list] = defaultdict(lambda: [0, 0])
    for q, p in rows:
        for b, lo, hi in bands:
            if lo <= q < hi:
                c = agg[b]
                c[0] += 1
                c[1] += _cents(p)
    want = {
        b: (n, round_half_up(float(pc) / 100.0, 2))
        for b, (n, pc) in agg.items()
    }
    got = {
        r["band"]: (r["n"], r["revenue"])
        for r in REGISTRY["join_range_bands"].fn(spark, sf_dir).collect()
    }
    assert got == want

    agg2: dict[int, list] = defaultdict(lambda: [0, 0])
    for q, p in rows:
        # band i covers [i*0.25, i*0.25 + 0.75): overlapping grid, each
        # row can land in up to 3 bands.
        for i in range(0, 204):
            if i * 0.25 <= q < i * 0.25 + 0.75:
                c = agg2[i]
                c[0] += 1
                c[1] += _cents(p)
    want2 = {
        i: (n, round_half_up(float(pc) / 100.0, 2))
        for i, (n, pc) in agg2.items()
    }
    got2 = {
        r["band_id"]: (r["n"], r["revenue"])
        for r in REGISTRY["join_range_binned"].fn(spark, sf_dir).collect()
    }
    assert got2 == want2


@pytest.mark.parametrize("sf_dir", SFS)
def test_asof_forward_gap_matches_python(spark, sf_dir):
    o = _orders(sf_dir, ["o_orderkey", "o_custkey", "o_orderdate"])
    per_cust: dict[int, list] = defaultdict(list)
    rows = list(
        zip(
            o["o_orderkey"].to_pylist(),
            o["o_custkey"].to_pylist(),
            o["o_orderdate"].to_pylist(),
        )
    )
    for ok, ck, od in rows:
        per_cust[ck].append(od)
    for v in per_cust.values():
        v.sort()
    import bisect

    want = {}
    for ok, ck, od in rows:
        dates = per_cust[ck]
        i = bisect.bisect_right(dates, od)
        if i < len(dates):
            want[ok] = (dates[i] - od).days
    out = REGISTRY["join_asof_forward_gap"].fn(spark, sf_dir).collect()
    got = {r["o_orderkey"]: r["days_to_next"] for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_lateral_exists_scalar_subqueries_match_python(spark, sf_dir):
    o = _orders(
        sf_dir,
        ["o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"],
    )
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    ship_by_order: dict[int, list] = defaultdict(list)
    for ok, sd in zip(
        li["l_orderkey"].to_pylist(), li["l_shipdate"].to_pylist()
    ):
        ship_by_order[ok].append(sd)

    want_lat = {}
    for ok, pr, tp, _ in zip(
        o["o_orderkey"].to_pylist(),
        o["o_orderpriority"].to_pylist(),
        o["o_totalprice"].to_pylist(),
        o["o_orderdate"].to_pylist(),
    ):
        if tp > 400000:
            ships = ship_by_order.get(ok, [])
            want_lat[ok] = (
                pr,
                max(ships) if ships else None,
                len(ships),
            )
    out = REGISTRY["lateral_last_ship"].fn(spark, sf_dir).collect()
    got_lat = {
        r["o_orderkey"]: (r["o_orderpriority"], r["last_ship"],
                          r["n_lines"])
        for r in out
    }
    assert got_lat == want_lat

    want_ex: dict[str, int] = defaultdict(int)
    for ok, pr, _, od in zip(
        o["o_orderkey"].to_pylist(),
        o["o_orderpriority"].to_pylist(),
        o["o_totalprice"].to_pylist(),
        o["o_orderdate"].to_pylist(),
    ):
        cut = od + datetime.timedelta(days=90)
        if any(sd > cut for sd in ship_by_order.get(ok, ())):
            want_ex[pr] += 1
    out2 = REGISTRY["subquery_exists_late_ship"].fn(spark, sf_dir).collect()
    got_ex = {r["o_orderpriority"]: r["n_orders"] for r in out2}
    assert got_ex == dict(want_ex)

    p = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    prices = p["p_retailprice"].to_pylist()
    avg = math.fsum(prices) / len(prices)
    want_sc = {
        (pk, nm, pr)
        for pk, nm, pr in zip(
            p["p_partkey"].to_pylist(), p["p_name"].to_pylist(), prices
        )
        if pr > avg
    }
    out3 = REGISTRY["subquery_scalar_above_avg"].fn(spark, sf_dir).collect()
    got_sc = {
        (r["p_partkey"], r["p_name"], r["p_retailprice"]) for r in out3
    }
    assert got_sc == want_sc


@pytest.mark.parametrize("sf_dir", SFS)
def test_union_by_name_and_cogrouped_match_python(spark, sf_dir):
    d = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )
    want_u = set()
    for did, lg, src, nc in zip(
        d["doc_id"].to_pylist(),
        d["lang"].to_pylist(),
        d["source"].to_pylist(),
        d["n_chars"].to_pylist(),
    ):
        if did % 2 == 0:
            want_u.add((did, lg, None, None))
        else:
            want_u.add((did, lg, src, nc))
    out = REGISTRY["union_by_name_evolved"].fn(spark, sf_dir).collect()
    got_u = {
        (r["doc_id"], r["lang"], r["source"], r["n_chars"]) for r in out
    }
    assert got_u == want_u

    o = _orders(sf_dir, ["o_orderkey"])
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_discount"],
    )
    per: dict[int, list] = defaultdict(lambda: [0, None, 0])
    ship_us = ts_us(li["l_shipdate"]).tolist()
    for ok, us, disc in zip(
        li["l_orderkey"].to_pylist(), ship_us, li["l_discount"].to_pylist()
    ):
        c = per[ok]
        c[0] += 1
        c[1] = us if c[1] is None else max(c[1], us)
        if disc > 0:
            c[2] += 1
    want_c = {}
    for ok in o["o_orderkey"].to_pylist():
        n, mx, nd = per.get(ok, (0, None, 0))
        want_c[ok] = (n, mx, nd)
    out2 = REGISTRY["udf_cogrouped_reconcile"].fn(spark, sf_dir).collect()
    got_c = {
        r["o_orderkey"]: (r["n_lines"], r["last_ship_us"],
                          r["n_discounted"])
        for r in out2
    }
    assert got_c == want_c
