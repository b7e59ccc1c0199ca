"""Round-12 third opinions, part 13 — the classic-aggregate family, the
Pandas-UDF rows, and the remaining text rows, reconstructed in pure
Python from raw parquet and asserted equal to the engine at sf0.001 AND
sf0.01:

- agg_algebraic / conditional_case_agg / agg_null_semantics /
  unpivot_price_components: exact-cents sums and means behind the
  rounded float contracts;
- agg_full_group / agg_collect_sorted: sorted full-group payloads;
- agg_count_distinct / agg_approx_count_distinct: distinct sets (and
  the HLL row's exact columns + in-tolerance flags);
- agg_statistical: sample stddev/variance/correlation/covariance from
  exact integer moments plus the R-7 interpolated percentiles;
- udf_pandas_scalar: the Arrow-batched scalar expression replayed
  row by row (multiset compare — (orderkey, linenumber) is not a key);
- udf_pandas_grouped_agg: the weighted mean at its 4dp grain;
- udtf_native_token_runs: the run-length encoder rebuilt on Python's
  own str.split (the UDTF's exact tokenizer);
- text_quality_classifier: dyadic hashing-trick weights (order-free
  exact float sums), score and keep flag;
- text_bigram_lm_score: the MLE transition table and per-doc integer
  mean score, NULL for <2-token docs;
- text_chunk_sliding: chunk grid arithmetic and md5 chunk identities;
- text_boilerplate_ngrams: the top-256 DF list with its (nd DESC, s)
  tie-break and per-doc boilerplate mass;
- quality_report_tables: null/range/orphan tallies for both tables.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, string_shingles, words_of

import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.extension_queries  # noqa: F401
import mapreduceframework_spark.plans.sampling_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401
import mapreduceframework_spark.plans.udf_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

CLASSIFIER_BUCKETS = 32
CLASSIFIER_WEIGHTS = tuple(((j * 37) % 19 - 9) / 16.0 for j in range(32))
CHUNK_SIZE, CHUNK_STRIDE, CHUNK_CEIL_BIAS = 16, 12, 5


def _cents(x: float) -> int:
    return int(round_half_up(x * 100, 0))


def _lineitem(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/lineitem.parquet", columns=cols)


def _md5_bucket(s: str, buckets: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % buckets


# ---------------------------------------------------------------------------
# classic aggregates
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_algebraic_matches_python_exact_moments(spark, sf_dir):
    t = _lineitem(
        sf_dir,
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax"],
    )
    g: dict[tuple, list] = {}
    for fl, st, q, p, d, tx in zip(
        t["l_returnflag"].to_pylist(),
        t["l_linestatus"].to_pylist(),
        t["l_quantity"].to_pylist(),
        t["l_extendedprice"].to_pylist(),
        t["l_discount"].to_pylist(),
        t["l_tax"].to_pylist(),
    ):
        c = g.setdefault((fl, st), [0, 0, d, tx, 0])
        c[0] += int(q)  # integer-valued: exact in any order
        c[1] += _cents(p)
        c[2] = min(c[2], d)
        c[3] = max(c[3], tx)
        c[4] += 1
    # avg_price replays the r13 integer-domain mean finisher
    # (plans/exact.py int_round_mean): ROUND(pc / n) half-up as
    # (2*pc + n) // (2*n) — no double anywhere.
    want = {
        k: (
            round_half_up(float(sq), 2),
            ((2 * pc + n) // (2 * n)) / 100.0,
            round_half_up(mn, 2),
            round_half_up(mx, 2),
            n,
        )
        for k, (sq, pc, mn, mx, n) in g.items()
    }

    out = REGISTRY["agg_algebraic"].fn(spark, sf_dir).collect()
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"], r["avg_price"], r["min_disc"], r["max_tax"],
            r["n_rows"],
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_full_group_and_collect_sorted_match_python(spark, sf_dir):
    t = _lineitem(sf_dir, ["l_returnflag", "l_quantity"])
    groups: dict[str, list[int]] = defaultdict(list)
    for fl, q in zip(
        t["l_returnflag"].to_pylist(), t["l_quantity"].to_pylist()
    ):
        groups[fl].append(int(q))
    want = {
        fl: ",".join(str(q) for q in sorted(qs)) for fl, qs in groups.items()
    }
    out = REGISTRY["agg_full_group"].fn(spark, sf_dir).collect()
    got = {r["l_returnflag"]: r["qty_list"] for r in out}
    assert got == want

    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    pr: dict[int, list[str]] = defaultdict(list)
    for ck, p in zip(
        o["o_custkey"].to_pylist(), o["o_orderpriority"].to_pylist()
    ):
        pr[ck].append(p)
    want2 = {ck: ",".join(sorted(ps)) for ck, ps in pr.items()}
    out2 = REGISTRY["agg_collect_sorted"].fn(spark, sf_dir).collect()
    got2 = {r["o_custkey"]: r["priorities"] for r in out2}
    assert got2 == want2


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_count_distinct_and_approx_match_python(spark, sf_dir):
    t = _lineitem(sf_dir, ["l_returnflag", "l_partkey", "l_suppkey"])
    parts: dict[str, set] = defaultdict(set)
    supps: dict[str, set] = defaultdict(set)
    for fl, pk, sk in zip(
        t["l_returnflag"].to_pylist(),
        t["l_partkey"].to_pylist(),
        t["l_suppkey"].to_pylist(),
    ):
        parts[fl].add(pk)
        supps[fl].add(sk)
    want = {fl: (len(parts[fl]), len(supps[fl])) for fl in parts}
    out = REGISTRY["agg_count_distinct"].fn(spark, sf_dir).collect()
    got = {r["l_returnflag"]: (r["n_parts"], r["n_supps"]) for r in out}
    assert got == want

    out2 = REGISTRY["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    got2 = {r["l_returnflag"]: r["exact_nd"] for r in out2}
    assert got2 == {fl: len(s) for fl, s in parts.items()}
    assert all(r["sketch_within_15pct"] for r in out2)


@pytest.mark.parametrize("sf_dir", SFS)
def test_conditional_case_agg_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    g: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0])
    for pr, st, tp in zip(
        t["o_orderpriority"].to_pylist(),
        t["o_orderstatus"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        c = g[pr]
        if st == "F":
            c[0] += 1
        if tp > 200000:
            c[1] += 1
        if st == "O":
            c[2] += _cents(tp)
            c[3] += 1
    want = {
        pr: (
            nf,
            nb,
            round_half_up(float(oc) / (100.0 * on), 2) if on else None,
        )
        for pr, (nf, nb, oc, on) in g.items()
    }
    out = REGISTRY["conditional_case_agg"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderpriority"]: (r["n_finished"], r["n_big"],
                               r["avg_open_price"])
        for r in out
    }
    assert got == want


def _r7(vals, p):
    h = (len(vals) - 1) * p
    lo = math.floor(h)
    if lo + 1 >= len(vals):
        return vals[-1]
    return vals[lo] + (h - lo) * (vals[lo + 1] - vals[lo])


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_statistical_matches_python_exact_moments(spark, sf_dir):
    t = _lineitem(
        sf_dir, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    g: dict[str, list] = defaultdict(list)
    for fl, q, p in zip(
        t["l_returnflag"].to_pylist(),
        t["l_quantity"].to_pylist(),
        t["l_extendedprice"].to_pylist(),
    ):
        g[fl].append((int(q), _cents(p), p))

    want = {}
    for fl, rows in g.items():
        n = len(rows)
        sx = sum(q for q, _, _ in rows)
        sy = sum(c for _, c, _ in rows)
        sxx = sum(q * q for q, _, _ in rows)
        syy = sum(c * c for _, c, _ in rows)
        sxy = sum(q * c for q, c, _ in rows)
        # price stats in raw units: cents / 100 scaling applied at the
        # end of each exact-integer identity.
        var_p = (float(syy) - float(sy) * float(sy) / n) / (n - 1) / 10000.0
        var_q = (float(sxx) - float(sx) * float(sx) / n) / (n - 1)
        cov = (float(sxy) - float(sx) * float(sy) / n) / (n - 1) / 100.0
        corr = (n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        prices = sorted(p for _, _, p in rows)
        want[fl] = (
            round_half_up(math.sqrt(var_p), 4),
            round_half_up(var_q, 4),
            round_half_up(corr, 6),
            round_half_up(cov, 2),
            round_half_up(_r7(prices, 0.5), 4),
            round_half_up(_r7(prices, 0.9), 4),
        )

    out = REGISTRY["agg_statistical"].fn(spark, sf_dir).collect()
    got = {
        r["l_returnflag"]: (
            r["price_stddev"], r["qty_var"], r["qty_price_corr"],
            r["qty_price_covar"], r["price_median"], r["price_p90"],
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_null_semantics_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )
    g: dict[str, list] = defaultdict(lambda: [0, 0, 0])
    for seg, ab in zip(
        t["c_mktsegment"].to_pylist(), t["c_acctbal"].to_pylist()
    ):
        c = g[seg]
        c[0] += 1
        if ab >= 0:
            c[1] += 1
            c[2] += _cents(ab)
    want = {
        seg: (
            n_all,
            nn,
            round_half_up(float(sc) / (100.0 * nn), 4) if nn else None,
            round_half_up(float(sc) / 100.0, 2) if nn else None,
        )
        for seg, (n_all, nn, sc) in g.items()
    }
    out = REGISTRY["agg_null_semantics"].fn(spark, sf_dir).collect()
    got = {
        r["c_mktsegment"]: (r["n_all"], r["n_nonnull"], r["avg_v"],
                            r["sum_v"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_unpivot_totals_match_python_cents(spark, sf_dir):
    t = _lineitem(sf_dir, ["l_extendedprice", "l_discount", "l_tax"])
    sums = {"extendedprice": 0, "discount": 0, "tax": 0}
    for p, d, tx in zip(
        t["l_extendedprice"].to_pylist(),
        t["l_discount"].to_pylist(),
        t["l_tax"].to_pylist(),
    ):
        sums["extendedprice"] += _cents(p)
        sums["discount"] += _cents(d)
        sums["tax"] += _cents(tx)
    want = {
        k: round_half_up(float(v) / 100.0, 2) for k, v in sums.items()
    }
    out = REGISTRY["unpivot_price_components"].fn(spark, sf_dir).collect()
    got = {r["component"]: r["total"] for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# Pandas-UDF / UDTF rows
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_udf_scalar_matches_python_ieee(spark, sf_dir):
    t = _lineitem(
        sf_dir,
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    want = sorted(
        (ok, ln, p * (1.0 - d))
        for ok, ln, p, d in zip(
            t["l_orderkey"].to_pylist(),
            t["l_linenumber"].to_pylist(),
            t["l_extendedprice"].to_pylist(),
            t["l_discount"].to_pylist(),
        )
    )
    out = REGISTRY["udf_pandas_scalar"].fn(spark, sf_dir).collect()
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["disc_price"]) for r in out
    )
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_udf_grouped_agg_matches_python_fsum(spark, sf_dir):
    t = _lineitem(
        sf_dir, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    g: dict[str, list] = defaultdict(lambda: [0.0, 0.0])
    for fl, q, p in zip(
        t["l_returnflag"].to_pylist(),
        t["l_quantity"].to_pylist(),
        t["l_extendedprice"].to_pylist(),
    ):
        c = g[fl]
        c[0] += p * q
        c[1] += q
    want = {fl: round_half_up(pq_ / q_, 4) for fl, (pq_, q_) in g.items()}
    out = REGISTRY["udf_pandas_grouped_agg"].fn(spark, sf_dir).collect()
    got = {r["l_returnflag"]: r["w_avg_price"] for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_udtf_token_runs_match_python_rle(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    want = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if text is None or not text.strip():
            continue
        # The UDTF's own tokenizer: Python str.split (unicode ws).
        words = text.strip().split()
        i = 0
        while i < len(words):
            j = i
            while j < len(words) and words[j] == words[i]:
                j += 1
            want.append((did, i + 1, words[i], j - i))
            i = j
    want.sort()

    out = REGISTRY["udtf_native_token_runs"].fn(spark, sf_dir).collect()
    got = sorted(
        (r["doc_id"], r["run_start"], r["token"], r["run_len"]) for r in out
    )
    assert got == want


# ---------------------------------------------------------------------------
# text remainder
# ---------------------------------------------------------------------------


def _doc_words(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = words_of(text)
        if ws is not None:
            out.append((did, ws))
    return out


@pytest.mark.parametrize("sf_dir", SFS)
def test_quality_classifier_matches_python_dyadic(spark, sf_dir):
    want = {}
    for did, ws in _doc_words(sf_dir):
        # Dyadic weights: the sum is exact in ANY association order, so
        # a plain Python sum equals the engines' sequential folds.
        total = sum(
            CLASSIFIER_WEIGHTS[_md5_bucket(w, CLASSIFIER_BUCKETS)]
            for w in ws
        )
        n = len(ws)
        want[did] = (n, total / n, total >= 0.0)
    out = REGISTRY["text_quality_classifier"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["keep"]) for r in out
    }
    assert got == want
    assert any(k for _, _, k in want.values())
    assert any(not k for _, _, k in want.values())


@pytest.mark.parametrize("sf_dir", SFS)
def test_bigram_lm_score_matches_python_mle(spark, sf_dir):
    import re

    split_ws = re.compile(r"[ \t\n\r\f]+")
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    toks = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks[did] = split_ws.split((text or "").strip(" "))
    cu: dict[str, int] = defaultdict(int)
    cb: dict[tuple[str, str], int] = defaultdict(int)
    for ws in toks.values():
        for w in ws:
            cu[w] += 1
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
    want = {}
    for did, ws in toks.items():
        if len(ws) < 2:
            want[did] = (None, None)
            continue
        p6s = [
            int(round_half_up(1000000.0 * cb[(a, b)] / cu[a], 0))
            for a, b in zip(ws, ws[1:])
        ]
        want[did] = (
            len(p6s),
            int(round_half_up(sum(p6s) / len(p6s), 0)),
        )

    out = REGISTRY["text_bigram_lm_score"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score_e6"]) for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_chunk_sliding_matches_python_grid(spark, sf_dir):
    want = {}
    for did, ws in _doc_words(sf_dir):
        n = len(ws)
        last = (
            0 if n <= CHUNK_SIZE else (n - CHUNK_CEIL_BIAS) // CHUNK_STRIDE
        )
        for ci in range(last + 1):
            win = ws[ci * CHUNK_STRIDE : ci * CHUNK_STRIDE + CHUNK_SIZE]
            want[(did, ci)] = (
                ci * CHUNK_STRIDE,
                len(win),
                hashlib.md5(" ".join(win).encode()).hexdigest(),
            )
    out = REGISTRY["text_chunk_sliding"].fn(spark, sf_dir).collect()
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_tok"], r["n_toks"], r["chunk_hash"]
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_boilerplate_ngrams_match_python_topk(spark, sf_dir):
    per_doc: dict[int, list[str]] = {}
    dfreq: dict[str, int] = defaultdict(int)
    for did, ws in _doc_words(sf_dir):
        # The engine's string_shingles is array_distinct over the
        # positional list — DISTINCT per doc, first occurrence kept.
        sh = list(dict.fromkeys(string_shingles(ws, 3)))
        if not sh:
            continue
        per_doc[did] = sh
        for s in sh:
            dfreq[s] += 1
    top = {
        s
        for s, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[
            :256
        ]
    }
    want = {}
    for did, sh in per_doc.items():
        n = len(sh)
        nc = sum(1 for s in sh if s in top)
        want[did] = (n, nc, nc / n, nc * 8 >= n)
    out = REGISTRY["text_boilerplate_ngrams"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (
            r["n_shingles"], r["n_common"], r["boilerplate_frac"],
            r["is_boilerplate"],
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_quality_report_matches_python_tallies(spark, sf_dir):
    li = _lineitem(
        sf_dir,
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )
    c = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    okeys = set(o["o_orderkey"].to_pylist())
    ckeys = set(c["c_custkey"].to_pylist())

    li_nulls = li_range = li_orph = 0
    for ok, q, p, d in zip(
        li["l_orderkey"].to_pylist(),
        li["l_quantity"].to_pylist(),
        li["l_extendedprice"].to_pylist(),
        li["l_discount"].to_pylist(),
    ):
        if q is None or p is None:
            li_nulls += 1
        if (q is not None and (q < 1 or q > 50)) or (
            d is not None and (d < 0 or d > 1)
        ):
            li_range += 1
        if ok not in okeys:
            li_orph += 1

    o_nulls = o_range = o_orph = 0
    for ck, tp, od in zip(
        o["o_custkey"].to_pylist(),
        o["o_totalprice"].to_pylist(),
        o["o_orderdate"].to_pylist(),
    ):
        if tp is None or od is None:
            o_nulls += 1
        if tp is not None and tp <= 0:
            o_range += 1
        if ck not in ckeys:
            o_orph += 1

    want = {
        "lineitem": (li.num_rows, li_nulls, li_range, li_orph),
        "orders": (o.num_rows, o_nulls, o_range, o_orph),
    }
    out = REGISTRY["quality_report_tables"].fn(spark, sf_dir).collect()
    got = {
        r["tbl"]: (
            r["n_rows"], r["n_null_required"], r["n_out_of_range"],
            r["n_orphans"],
        )
        for r in out
    }
    assert got == want
