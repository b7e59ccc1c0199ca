"""Round-12 third opinions, part 17 — the scalar-function family
(SURVEY §2.2 "Scalar fns" row) reconstructed with Python's own
string/math/date/json/hash machinery from raw parquet, asserted equal
to the engine at sf0.001 AND sf0.01. Each mirror is a third
implementation of the function semantics (CPython's str.upper,
hashlib, json, datetime), so a convention the two engines happen to
share by accident would still be caught:

- scalar_math_funcs: abs/floor/ceil/sqrt/ln at their rounding grains;
- scalar_string_funcs: upper/substr/length/concat/replace;
- scalar_date_funcs: date parts, ISO rendering, day diffs;
- scalar_hash_funcs: md5/sha256 hex digests and the keyed pseudonym;
- scalar_array_funcs: dim/head/sequential-fold sum/max with the
  negative-zero normalization (+ 0.0);
- scalar_array_setops: distinct tokens vs the stopword list;
- scalar_json_funcs: $.k extraction;
- scalar_struct_funcs: lexicographic struct comparison and struct-
  array sorting;
- scalar_map_funcs / scalar_map_hof_funcs: map construction order and
  the filter/transform/sort HOF chain.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, words_of

import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.extension_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "it"}


def _r(x: float, places: int) -> float:
    return round_half_up(x, places) + 0.0  # normalize -0.0


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_math_funcs_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity", "l_discount"],
    )
    want = sorted(
        (
            ok,
            ln,
            _r(abs(p - 1000.0), 2),
            int(math.floor(q)),
            int(math.ceil(d * 100)),
            _r(math.sqrt(p), 4),
            _r(math.log(p + 1), 4),
            ok % 7,
        )
        for ok, ln, p, q, d in zip(
            t["l_orderkey"].to_pylist(),
            t["l_linenumber"].to_pylist(),
            t["l_extendedprice"].to_pylist(),
            t["l_quantity"].to_pylist(),
            t["l_discount"].to_pylist(),
        )
    )
    out = REGISTRY["scalar_math_funcs"].fn(spark, sf_dir).collect()
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["dist"], r["qfloor"],
         r["dpct"], r["root"], r["logp"], r["mod7"])
        for r in out
    )
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_string_funcs_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_type", "p_brand"],
    )
    want = {
        pk: (
            nm.upper(),
            ty[:5],
            len(nm),
            f"{br}#{ty}",
            nm.replace(" ", "_"),
        )
        for pk, nm, ty, br in zip(
            t["p_partkey"].to_pylist(),
            t["p_name"].to_pylist(),
            t["p_type"].to_pylist(),
            t["p_brand"].to_pylist(),
        )
    }
    out = REGISTRY["scalar_string_funcs"].fn(spark, sf_dir).collect()
    got = {
        r["p_partkey"]: (r["uname"], r["t5"], r["nlen"], r["brand_type"],
                         r["snake"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_date_funcs_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    epoch = datetime.date(1995, 1, 1)
    want = {}
    for ok, od in zip(
        t["o_orderkey"].to_pylist(), t["o_orderdate"].to_pylist()
    ):
        d = od.date() if isinstance(od, datetime.datetime) else od
        want[ok] = (
            d.year,
            d.month,
            d.day,
            d.isoformat(),
            (d - epoch).days,
        )
    out = REGISTRY["scalar_date_funcs"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (r["y"], r["m"], r["d"], r["odate"],
                          r["days_since"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_hash_funcs_match_hashlib(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    want = {}
    for ck, nm in zip(t["c_custkey"].to_pylist(), t["c_name"].to_pylist()):
        want[ck] = (
            hashlib.md5(nm.encode()).hexdigest(),
            hashlib.sha256(nm.encode()).hexdigest(),
            hashlib.md5(f"{nm}:{ck}".encode()).hexdigest(),
        )
    out = REGISTRY["scalar_hash_funcs"].fn(spark, sf_dir).collect()
    got = {
        r["c_custkey"]: (r["name_md5"], r["name_sha256"],
                         r["keyed_pseudonym"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_array_funcs_match_python_fold(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    want = {}
    for vid, emb in zip(
        t["vec_id"].to_pylist(), t["embedding"].to_pylist()
    ):
        x = [float(e) for e in emb]
        acc = 0.0
        for v in x:
            acc = acc + v
        want[vid] = (len(x), _r(x[0], 4), _r(acc, 4), _r(max(x), 4))
    out = REGISTRY["scalar_array_funcs"].fn(spark, sf_dir).collect()
    got = {
        r["vec_id"]: (r["dim"], r["e1"], r["esum"], r["emax"]) for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_array_setops_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    want = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = words_of(text)
        if ws is None:
            continue
        distinct = list(dict.fromkeys(ws))
        ns = sum(1 for w in distinct if w in STOPWORDS)
        want[did] = (len(distinct), ns, len(distinct) - ns)
    out = REGISTRY["scalar_array_setops"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_distinct"], r["n_stop"], r["n_content"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_json_funcs_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )
    want = {
        eid: json.loads(props)["k"]
        for eid, props in zip(
            t["event_id"].to_pylist(), t["props"].to_pylist()
        )
    }
    out = REGISTRY["scalar_json_funcs"].fn(spark, sf_dir).collect()
    got = {r["event_id"]: r["prop_k"] for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_struct_funcs_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    want = {}
    for ok, st, tp in zip(
        t["o_orderkey"].to_pylist(),
        t["o_orderstatus"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        cents = int(round_half_up(tp * 100, 0))
        below = (st, cents) < ("O", 5_000_000)
        pair = sorted(
            [(cents, "price"), (ok % 100_000, "key")]
        )
        want[ok] = (cents, below, pair[0][1], pair[0][0])
    out = REGISTRY["scalar_struct_funcs"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (r["cents_field"], r["below_limit"], r["first_v"],
                          r["first_k"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_scalar_map_rows_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority",
                 "o_custkey"],
    )
    want_m = {}
    want_h = {}
    for ok, st, pr, ck in zip(
        t["o_orderkey"].to_pylist(),
        t["o_orderstatus"].to_pylist(),
        t["o_orderpriority"].to_pylist(),
        t["o_custkey"].to_pylist(),
    ):
        want_m[ok] = (st, 2, "status,priority")
        entries = [("key", ok), ("cust", ck), ("mod", ok % 7)]
        odd = sorted(
            f"{k}={v * 3}" for k, v in entries if v % 2 == 1
        )
        want_h[ok] = ",".join(odd)
    out = REGISTRY["scalar_map_funcs"].fn(spark, sf_dir).collect()
    got_m = {
        r["o_orderkey"]: (r["status_from_map"], r["n_keys"],
                          r["keys_joined"])
        for r in out
    }
    assert got_m == want_m

    out2 = REGISTRY["scalar_map_hof_funcs"].fn(spark, sf_dir).collect()
    got_h = {r["o_orderkey"]: r["odd_tripled"] for r in out2}
    assert got_h == want_h
