"""Round-12 third opinions, part 10 — the iterative-clustering pair and
the remaining one-formula-deep agg/feature/lakehouse rows, reconstructed
in pure Python from raw parquet and asserted equal to the engine at
sf0.001 AND sf0.01:

- kmeans_quantized_clusters: the FULL serial Lloyd trace (quantize,
  first-k seed, three assignment passes with sequential-fold IEEE
  distances and (dist, cid) tie-break, exact-integer centroid updates,
  empty-cluster carryover, truncated-modulo centroid digests) — the
  PageRank bit-for-bit discipline applied to the second iterative
  family;
- embedding_quantize_int8: scale, fold digest, exact max
  reconstruction error;
- feature_hashing_trick: hash buckets, the next-bit sign, collision
  cancellation, zero-weight drop;
- feature_quantile_buckets / feature_quantile_sketch: R-7 interpolated
  exact quartiles (integer-valued domain), bucket tallies, and the
  sketch row's exact columns + in-tolerance flags;
- graph_degree_stats: out/in/reciprocal degrees over the distinct
  trade edge set re-derived by the shared 5-way walk;
- agg_bitwise: bit_and/or/xor folds per priority;
- agg_distinct_bitmap: BOTH routes — the plain distinct count and an
  independent Python bitmap (shift/OR/popcount, bit 63 included);
- agg_decimal_exact: decimal.Decimal sums with the 2dp half-up cast
  and the exact 0.07 tax product;
- agg_salted_two_stage: fsum revenue at the 4dp grain + exact counts;
- cdc_snapshot_diff: the %-pattern round-trip batch (D/U/I rows, the
  max-key offset for inserts);
- lakehouse_zone_map_prune: both layouts' zone min/max audits and the
  read-amplification rollup.
"""

from __future__ import annotations

import datetime
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, trade_edge_counts, word_hash, words_of

import mapreduceframework_spark.plans.ann_queries  # noqa: F401
import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.extension_queries  # noqa: F401
import mapreduceframework_spark.plans.graph_queries  # noqa: F401
import mapreduceframework_spark.plans.lakehouse_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

M = 1_000_000_007
FH_BUCKETS = 64
ZONE_ORDERKEYS = 1024
ZONE_DAYS = 28
ZONE_PRED_LO = datetime.date(1996, 3, 1)
ZONE_PRED_HI = datetime.date(1996, 8, 31)


def _quantized(sf_dir):
    """(vec_id, x, scale, qv) for non-zero embeddings — the
    embedding_quantize_int8 / _embeddings_q8 mirror."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = []
    for vid, emb in zip(
        t["vec_id"].to_pylist(), t["embedding"].to_pylist()
    ):
        x = [float(e) for e in emb]  # float32 -> float64, exact
        absmax = max(abs(v) for v in x)
        if absmax <= 0:
            continue
        scale = absmax / 127.0
        qv = [int(math.floor(v / scale + 0.5)) for v in x]
        out.append((vid, x, scale, qv))
    return out


def _tmod(x: int) -> int:
    """Truncated (sign-of-dividend) modulo M — Spark/DuckDB `%`;
    Python's own % floors, which differs on negatives."""
    r = abs(x) % M
    return r if x >= 0 else -r


# ---------------------------------------------------------------------------
# embedding_quantize_int8
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_quantize_int8_matches_python(spark, sf_dir):
    want = {}
    for vid, x, scale, qv in _quantized(sf_dir):
        acc = 0
        for qq in qv:
            acc = (acc * 31 + qq + 128) % M
        err = max(abs(qq * scale - v) for qq, v in zip(qv, x))
        want[vid] = (scale, acc, err)
        # int8 range and the quantization guarantee itself.
        assert all(-127 <= qq <= 127 for qq in qv)
        assert err <= scale / 2 + 1e-12

    out = REGISTRY["embedding_quantize_int8"].fn(spark, sf_dir).collect()
    got = {
        r["vec_id"]: (r["scale"], r["q_digest"], r["max_abs_err"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# kmeans_quantized_clusters — serial Lloyd, bit for bit
# ---------------------------------------------------------------------------


def serial_kmeans8(sf_dir):
    """The full serial Lloyd trace (k=8, two updates + final assign)
    over the quantized embeddings — shared with the SemDeDup mirror in
    part 16. Returns (final assignment vid->cid, centroids, the sorted
    (vid, qv) list)."""
    vecs = sorted((vid, qv) for vid, _, _, qv in _quantized(sf_dir))
    cents = [[float(v) for v in qv] for _, qv in vecs[:8]]

    def assign(cs):
        a = {}
        for vid, qv in vecs:
            best = None
            for cid, c in enumerate(cs):
                acc = 0.0
                for av, bv in zip(qv, c):
                    d = av - bv
                    acc = acc + d * d
                if best is None or (acc, cid) < best:
                    best = (acc, cid)
            a[vid] = best[1]
        return a

    for _ in range(2):
        a = assign(cents)
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = defaultdict(int)
        for vid, qv in vecs:
            cid = a[vid]
            counts[cid] += 1
            s = sums.setdefault(cid, [0] * len(qv))
            for i, v in enumerate(qv):
                s[i] += v
        cents = [
            [float(s) / float(counts[cid]) for s in sums[cid]]
            if cid in sums
            else old  # empty cluster keeps its previous centroid
            for cid, old in enumerate(cents)
        ]
    return assign(cents), cents, vecs


@pytest.mark.parametrize("sf_dir", SFS)
def test_kmeans_matches_serial_lloyd(spark, sf_dir):
    final, cents, vecs = serial_kmeans8(sf_dir)
    digests = {}
    for cid, c in enumerate(cents):
        acc = 0
        for v in c:
            acc = _tmod(acc * 31 + int(math.floor(v * 1000 + 0.5)))
        digests[cid] = acc

    want: dict[int, list[int]] = {}
    for vid, _ in vecs:
        cid = final[vid]
        c = want.setdefault(cid, [0, 0, digests[cid]])
        c[0] += 1
        c[1] += vid

    out = REGISTRY["kmeans_quantized_clusters"].fn(spark, sf_dir).collect()
    got = {
        r["cid"]: [r["n_members"], r["sum_vec_ids"], r["centroid_digest"]]
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# feature_hashing_trick
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_hashing_trick_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    want: dict[tuple[int, int], int] = defaultdict(int)
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = words_of(text)
        if ws is None:
            continue
        for w in ws:
            wh = word_hash(w)
            sign = 1 if (wh // FH_BUCKETS) % 2 == 0 else -1
            want[(did, wh % FH_BUCKETS)] += sign
    want = {k: v for k, v in want.items() if v != 0}

    out = REGISTRY["feature_hashing_trick"].fn(spark, sf_dir).collect()
    got = {(r["doc_id"], r["bucket"]): r["weight"] for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# feature_quantile_buckets / feature_quantile_sketch
# ---------------------------------------------------------------------------


def _r7(vals: list[float], p: float) -> float:
    h = (len(vals) - 1) * p
    lo = math.floor(h)
    if lo + 1 >= len(vals):
        return vals[-1]
    return vals[lo] + (h - lo) * (vals[lo + 1] - vals[lo])


@pytest.mark.parametrize("sf_dir", SFS)
def test_quantile_buckets_match_python_r7(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    vals = sorted(t["l_quantity"].to_pylist())
    q1, q2, q3 = (_r7(vals, p) for p in (0.25, 0.50, 0.75))

    cells: dict[int, list] = defaultdict(lambda: [0, None, None])
    for v in vals:
        b = 0 if v <= q1 else (1 if v <= q2 else (2 if v <= q3 else 3))
        c = cells[b]
        c[0] += 1
        c[1] = v if c[1] is None else min(c[1], v)
        c[2] = v if c[2] is None else max(c[2], v)
    want = {
        b: (n, round_half_up(lo, 2), round_half_up(hi, 2))
        for b, (n, lo, hi) in cells.items()
    }

    out = REGISTRY["feature_quantile_buckets"].fn(spark, sf_dir).collect()
    got = {r["bucket"]: (r["n"], r["lo"], r["hi"]) for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_quantile_sketch_exact_columns_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    groups: dict[str, list[float]] = defaultdict(list)
    for fl, q in zip(
        t["l_returnflag"].to_pylist(), t["l_quantity"].to_pylist()
    ):
        groups[fl].append(q)
    want = {}
    for fl, vs in groups.items():
        vs.sort()
        want[fl] = tuple(
            round_half_up(_r7(vs, p), 2) for p in (0.25, 0.50, 0.75)
        )

    out = REGISTRY["feature_quantile_sketch"].fn(spark, sf_dir).collect()
    got = {
        r["l_returnflag"]: (r["exact_q1"], r["exact_q2"], r["exact_q3"])
        for r in out
    }
    assert got == want
    assert all(r["sketch_within_tol"] for r in out)


# ---------------------------------------------------------------------------
# graph_degree_stats
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_degree_stats_match_python_edge_walk(spark, sf_dir):
    edges = set(trade_edge_counts(sf_dir))
    out_deg: dict[str, int] = defaultdict(int)
    in_deg: dict[str, int] = defaultdict(int)
    recip: dict[str, int] = defaultdict(int)
    for s, d in edges:
        out_deg[s] += 1
        in_deg[d] += 1
        if s != d and (d, s) in edges:
            recip[s] += 1
    want = {
        n: (out_deg.get(n, 0), in_deg.get(n, 0), recip.get(n, 0))
        for n in set(out_deg) | set(in_deg)
    }

    out = REGISTRY["graph_degree_stats"].fn(spark, sf_dir).collect()
    got = {
        r["id"]: (r["out_deg"], r["in_deg"], r["reciprocal_deg"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# agg_bitwise / agg_distinct_bitmap / agg_decimal_exact / agg_salted
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_agg_bitwise_matches_python_folds(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    acc: dict[str, list] = {}
    for ok, pr in zip(
        t["o_orderkey"].to_pylist(), t["o_orderpriority"].to_pylist()
    ):
        if pr not in acc:
            acc[pr] = [ok, ok, ok, 1]
        else:
            a = acc[pr]
            a[0] &= ok
            a[1] |= ok
            a[2] ^= ok
            a[3] += 1
    want = {pr: tuple(a) for pr, a in acc.items()}

    out = REGISTRY["agg_bitwise"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderpriority"]: (r["key_and"], r["key_or"], r["key_xor"],
                               r["n"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_distinct_bitmap_matches_both_python_routes(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    plain: dict[str, set[int]] = defaultdict(set)
    words: dict[tuple[str, int], int] = defaultdict(int)
    for ck, pr in zip(
        t["o_custkey"].to_pylist(), t["o_orderpriority"].to_pylist()
    ):
        plain[pr].add(ck)
        words[(pr, ck // 64)] |= 1 << (ck % 64)
    bitmap: dict[str, int] = defaultdict(int)
    for (pr, _), w in words.items():
        bitmap[pr] += bin(w & ((1 << 64) - 1)).count("1")
    # The two independent routes must agree with each other first.
    assert {p: len(s) for p, s in plain.items()} == dict(bitmap)

    out = REGISTRY["agg_distinct_bitmap"].fn(spark, sf_dir).collect()
    got = {r["o_orderpriority"]: r["n_customers"] for r in out}
    assert got == {p: len(s) for p, s in plain.items()}


@pytest.mark.parametrize("sf_dir", SFS)
def test_decimal_exact_matches_python_decimal(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )
    cents = Decimal("0.01")
    tax_rate = Decimal("0.07")
    sums: dict[str, list[Decimal]] = defaultdict(
        lambda: [Decimal(0), Decimal(0)]
    )
    for st, tp in zip(
        t["o_orderstatus"].to_pylist(), t["o_totalprice"].to_pylist()
    ):
        d = Decimal(repr(tp)).quantize(cents, rounding=ROUND_HALF_UP)
        s = sums[st]
        s[0] += d
        s[1] += d * tax_rate
    want = {st: (float(s[0]), float(s[1])) for st, s in sums.items()}

    out = REGISTRY["agg_decimal_exact"].fn(spark, sf_dir).collect()
    got = {r["o_orderstatus"]: (r["total_price"], r["tax"]) for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_salted_two_stage_matches_python_fsum(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    groups: dict[str, list[float]] = defaultdict(list)
    for pr, tp in zip(
        t["o_orderpriority"].to_pylist(), t["o_totalprice"].to_pylist()
    ):
        groups[pr].append(tp)
    want = {
        pr: (round_half_up(math.fsum(vs), 4), len(vs))
        for pr, vs in groups.items()
    }

    out = REGISTRY["agg_salted_two_stage"].fn(spark, sf_dir).collect()
    got = {r["o_orderpriority"]: (r["revenue"], r["n_orders"]) for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# cdc_snapshot_diff
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_cdc_snapshot_diff_matches_python_patterns(spark, sf_dir):
    keys = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])[
        "o_orderkey"
    ].to_pylist()
    off = max(keys) + 1
    want = {}
    for k in keys:
        if k % 13 == 0:
            want[(k, "D")] = None
        elif k % 7 == 0:
            want[(k, "U")] = "X"
        if k % 10 == 0:
            want[(k + off, "I")] = "N"

    out = REGISTRY["cdc_snapshot_diff"].fn(spark, sf_dir).collect()
    got = {(r["o_orderkey"], r["op"]): r["o_orderstatus"] for r in out}
    assert got == want
    # All three change classes genuinely present.
    assert {op for _, op in got} == {"I", "U", "D"}


# ---------------------------------------------------------------------------
# lakehouse_zone_map_prune
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_zone_map_prune_matches_python_audit(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    okeys = t["l_orderkey"].to_pylist()
    # The column is timestamp-typed in parquet; both engines compare it
    # as a DATE — mirror that cast.
    ships = [
        sd.date() if isinstance(sd, datetime.datetime) else sd
        for sd in t["l_shipdate"].to_pylist()
    ]
    epoch = datetime.date(1992, 1, 1)

    def audit(zone_of, layout):
        zones: dict[int, list] = {}
        for ok, sd in zip(okeys, ships):
            z = zone_of(ok, sd)
            c = zones.setdefault(z, [sd, sd, 0, 0])
            c[0] = min(c[0], sd)
            c[1] = max(c[1], sd)
            c[2] += 1
            if ZONE_PRED_LO <= sd <= ZONE_PRED_HI:
                c[3] += 1
        scanned = [
            c for c in zones.values()
            if c[0] <= ZONE_PRED_HI and c[1] >= ZONE_PRED_LO
        ]
        return (
            layout,
            len(zones),
            len(scanned),
            sum(c[2] for c in scanned),
            sum(c[3] for c in zones.values()),
        )

    nat = audit(lambda ok, sd: ok // ZONE_ORDERKEYS, "natural")
    clu = audit(lambda ok, sd: (sd - epoch).days // ZONE_DAYS, "clustered")
    want = {r[0]: r[1:] for r in (nat, clu)}

    out = REGISTRY["lakehouse_zone_map_prune"].fn(spark, sf_dir).collect()
    got = {
        r["layout"]: (
            r["zones_total"],
            r["zones_scanned"],
            r["rows_scanned"],
            r["rows_matched"],
        )
        for r in out
    }
    assert got == want
    # The layout argument itself, now genuinely engaged (the original
    # 1994 predicate window predated every shipdate in this corpus, so
    # the row pinned only zeros — found by this mirror, fixed in
    # plans/lakehouse_queries.py): both layouts agree on the true
    # match count, the predicate selects rows, and the clustered
    # layout reads strictly fewer rows than the natural one.
    assert got["clustered"][3] == got["natural"][3] > 0
    assert got["clustered"][2] < got["natural"][2]
