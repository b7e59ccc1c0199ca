"""Round-12 third opinions, part 14 — the O3/O5/O10-class core operator
rows and the grouping-set family, reconstructed in pure Python from raw
parquet and asserted equal to the engine at sf0.001 AND sf0.01. These
are deliberately small mirrors: the rows are SQL-simple, but a dict
reconstruction still removes the one failure mode the DuckDB oracle
shares with the engine (a common misreading of the query's intent):

- projection / filter_predicate / distinct_keys_mod100 / topk_orders /
  sort_partition_local (bag semantics);
- flatmap_explode_words (single-space split, empties kept) and
  flatmap_posexplode (positional provenance);
- the set-op family including the ALL variants' bag arithmetic
  (min/max-of-multiplicity via the actual counts);
- agg_argmax_struct (lexicographic struct max);
- cube_grouping_id / grouping_sets_explicit / rollup_revenue — all
  grouping combinations, GROUPING() flags, exact sums behind the
  rounded contracts;
- timeseries_seasonal_profile (Sunday=0 dow convention, exact e4
  sums);
- text_token_stats (whitespace tokens + the BPE-ish regex lexer).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us, words_of, ws_token_count

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.extension_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401
import mapreduceframework_spark.plans.window_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _cents(x: float) -> int:
    return int(round_half_up(x * 100, 0))


@pytest.mark.parametrize("sf_dir", SFS)
def test_projection_filter_distinct_topk_sortlocal(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity", "l_shipdate"],
    )
    rows = list(
        zip(
            li["l_orderkey"].to_pylist(),
            li["l_linenumber"].to_pylist(),
            li["l_extendedprice"].to_pylist(),
            li["l_quantity"].to_pylist(),
            li["l_shipdate"].to_pylist(),
        )
    )

    want_proj = sorted((ok, ln, p) for ok, ln, p, _, _ in rows)
    got_proj = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["l_extendedprice"])
        for r in REGISTRY["projection"].fn(spark, sf_dir).collect()
    )
    assert got_proj == want_proj

    import datetime

    cut = datetime.datetime(1998, 1, 1)
    want_filt = sorted(
        (ok, ln, q)
        for ok, ln, _, q, sd in rows
        if q > 45 and sd >= cut
    )
    got_filt = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["l_quantity"])
        for r in REGISTRY["filter_predicate"].fn(spark, sf_dir).collect()
    )
    assert got_filt == want_filt

    # sort_partition_local: rows unchanged, compared as a bag.
    want_bag = sorted((ok, ln, sd) for ok, ln, _, _, sd in rows)
    got_bag = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["l_shipdate"])
        for r in REGISTRY["sort_partition_local"].fn(spark, sf_dir).collect()
    )
    assert got_bag == want_bag

    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    orows = list(
        zip(o["o_orderkey"].to_pylist(), o["o_totalprice"].to_pylist())
    )
    want_keys = {ok % 100 for ok, _ in orows}
    got_keys = {
        r["key"]
        for r in REGISTRY["distinct_keys_mod100"].fn(spark, sf_dir).collect()
    }
    assert got_keys == want_keys

    want_top = sorted(orows, key=lambda r: (-r[1], r[0]))[:10]
    got_top = [
        (r["o_orderkey"], r["o_totalprice"])
        for r in sorted(
            REGISTRY["topk_orders"].fn(spark, sf_dir).collect(),
            key=lambda r: (-r["o_totalprice"], r["o_orderkey"]),
        )
    ]
    assert got_top == want_top


@pytest.mark.parametrize("sf_dir", SFS)
def test_flatmap_rows_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    want = Counter()
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        # split on the single space character, boundary/interior
        # empties KEPT (Spark split limit -1 == DuckDB string_split).
        for w in (text or "").split(" "):
            want[(did, w)] += 1
    got = Counter(
        (r["doc_id"], r["word"])
        for r in REGISTRY["flatmap_explode_words"].fn(spark, sf_dir).collect()
    )
    assert got == want

    want_pos = set()
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = words_of(text)
        if ws is None:
            continue
        for i, w in enumerate(ws):
            want_pos.add((did, i, w))
    out = REGISTRY["flatmap_posexplode"].fn(spark, sf_dir).collect()
    got_pos = {(r["doc_id"], r["pos"], r["word"]) for r in out}
    assert len(out) == len(got_pos)
    assert got_pos == want_pos


@pytest.mark.parametrize("sf_dir", SFS)
def test_set_ops_match_python_bags(spark, sf_dir):
    c = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    s = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
    cb = Counter(c["c_nationkey"].to_pylist())
    sb = Counter(s["s_nationkey"].to_pylist())

    cases = {
        "set_union": set(cb) | set(sb),
        "set_intersect": set(cb) & set(sb),
        "set_except": set(cb) - set(sb),
    }
    for name, want in cases.items():
        got = {r["nk"] for r in REGISTRY[name].fn(spark, sf_dir).collect()}
        assert got == want, name

    # ALL variants: bag min / bag difference of multiplicities.
    want_ia = Counter(
        {k: min(cb[k], sb[k]) for k in set(cb) & set(sb)}
    )
    got_ia = Counter(
        r["nk"] for r in REGISTRY["set_intersect_all"].fn(spark, sf_dir)
        .collect()
    )
    assert got_ia == +want_ia

    want_ea = Counter(
        {k: cb[k] - sb.get(k, 0) for k in cb if cb[k] > sb.get(k, 0)}
    )
    got_ea = Counter(
        r["nk"] for r in REGISTRY["set_except_all"].fn(spark, sf_dir)
        .collect()
    )
    assert got_ea == +want_ea


@pytest.mark.parametrize("sf_dir", SFS)
def test_argmax_struct_matches_python(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    best: dict[int, tuple[float, int]] = {}
    for ck, ok, tp in zip(
        o["o_custkey"].to_pylist(),
        o["o_orderkey"].to_pylist(),
        o["o_totalprice"].to_pylist(),
    ):
        cand = (round_half_up(tp, 2), ok)
        if ck not in best or cand > best[ck]:
            best[ck] = cand
    want = {ck: v for ck, v in best.items()}
    out = REGISTRY["agg_argmax_struct"].fn(spark, sf_dir).collect()
    got = {r["c_custkey"]: (r["best_price"], r["best_orderkey"])
           for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_grouping_set_family_matches_python(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )
    cube: dict[tuple, int] = defaultdict(int)
    for st, pr in zip(
        o["o_orderstatus"].to_pylist(), o["o_orderpriority"].to_pylist()
    ):
        for key, gs, gp in (
            ((st, pr), 0, 0),
            ((st, None), 0, 1),
            ((None, pr), 1, 0),
            ((None, None), 1, 1),
        ):
            cube[(key[0], key[1], gs, gp)] += 1
    out = REGISTRY["cube_grouping_id"].fn(spark, sf_dir).collect()
    got = {
        (r["o_orderstatus"], r["o_orderpriority"], r["g_status"],
         r["g_prio"]): r["n"]
        for r in out
    }
    assert got == dict(cube)

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"],
    )
    qty: dict[tuple, int] = defaultdict(int)
    rev: dict[tuple, int] = defaultdict(int)
    for fl, st, q, p in zip(
        li["l_returnflag"].to_pylist(),
        li["l_linestatus"].to_pylist(),
        li["l_quantity"].to_pylist(),
        li["l_extendedprice"].to_pylist(),
    ):
        qi, pc = int(q), _cents(p)
        for k in ((fl, None), (None, st), (None, None)):
            qty[k] += qi
        for k, gf, gs in (
            ((fl, st), 0, 0),
            ((fl, None), 0, 1),
            ((None, None), 1, 1),
        ):
            rev[(k[0], k[1], gf, gs)] += pc

    out2 = REGISTRY["grouping_sets_explicit"].fn(spark, sf_dir).collect()
    got2 = {
        (r["l_returnflag"], r["l_linestatus"]): r["qty"] for r in out2
    }
    assert got2 == {
        k: round_half_up(float(v), 2) for k, v in qty.items()
    }

    out3 = REGISTRY["rollup_revenue"].fn(spark, sf_dir).collect()
    got3 = {
        (r["l_returnflag"], r["l_linestatus"], r["g_flag"],
         r["g_status"]): r["revenue"]
        for r in out3
    }
    assert got3 == {
        k: round_half_up(float(v) / 100.0, 2) for k, v in rev.items()
    }


@pytest.mark.parametrize("sf_dir", SFS)
def test_seasonal_profile_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    import numpy as np

    cells: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for ty, us, val in zip(
        t["event_type"].to_pylist(),
        ts_us(t["ts"]).tolist(),
        t["value"].to_pylist(),
    ):
        dt = np.datetime64(us, "us").item()
        dow = (dt.weekday() + 1) % 7  # Sunday = 0
        c = cells[(ty, dow, dt.hour)]
        c[0] += 1
        c[1] += int(round_half_up(val * 10_000, 0))
    want = {
        k: (n, s, float(s) / (10000.0 * n))
        for k, (n, s) in cells.items()
    }
    out = REGISTRY["timeseries_seasonal_profile"].fn(spark, sf_dir).collect()
    got = {
        (r["event_type"], r["dow"], r["hour"]): (
            r["n"], r["sum_e4"], r["mean_v"]
        )
        for r in out
    }
    assert got == want


BPE_LEX = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]")


@pytest.mark.parametrize("sf_dir", SFS)
def test_token_stats_match_python_lexer(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    want = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        want[did] = (
            ws_token_count(text),
            len(BPE_LEX.findall(text or "")),
        )
    out = REGISTRY["text_token_stats"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in out}
    assert got == want
