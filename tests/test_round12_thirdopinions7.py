"""Round-12 third opinions, part 7 — the sketch-probe family and three
scan-side analytics rows reconstructed in pure Python from raw parquet,
asserted equal to the engine at sf0.001 AND sf0.01:

- sketch_bloom_probe: the m=4096/k=3 bit set built with dict/set ops
  over the pinned hash family, probed token by token — verdicts, true
  membership, AND the false-positive flags must agree bit for bit;
- sketch_topk_misra_gries: the order-free MG summary (exact shard
  counts minus the (m+1)-th largest, positive remainders survive),
  merged by summing, with the (est DESC, w) top-10 cut and the
  Delta error bound recomputed with plain dicts;
- sketch_kmv_setops: per-source 16-smallest-hash sketches as Python
  sets, treewise union sketch, the (k-1)*P // h_k estimator and the
  Beyer rho intersection estimator in exact ints, both CASE branches;
- sketch_hll_rolling_users: the exact 7-day rolling distinct count
  (the sketch estimate is approximate by contract, so the mirror pins
  exact_7d, the day set, and that every within-10pct flag is TRUE);
- quality_char_entropy: per-doc character counts and the
  quantize-then-multiply entropy identity, with an explicit
  boundary-distance guard proving CPython's libm ln cannot round a
  ln_e6 cell differently from the JVM's on THIS corpus's count domain
  (the TF-IDF last-ulp lesson made checkable);
- reco_user_similarity: baskets, the [2, cap] popularity prune, pair
  intersections, and the integer round-half-up Jaccard top-20;
- events_anomaly_zscore: fsum mean / sample std rounded to the 6dp
  grain, the 2.5-sigma cut, and the 4dp z-scores.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import P, round_half_up, word_hash, words_of

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.sketch_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# The sketch hash families, re-stated as data (equality against the
# production constants is pinned in tests/test_mirror_constants.py
# style: a drifted constant fails the value asserts below anyway).
BLOOM_A = (2003, 2339, 2713)
BLOOM_B = (571, 761, 919)
BLOOM_BITS = 4096
KMV_K = 16
MG_SHARDS = 8
MG_CAP = 8
MG_TOPK = 10


def _doc_words(sf_dir):
    """(doc_id, source, words) for non-blank docs — the _docs mirror."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    out = []
    for did, src, text in zip(
        t["doc_id"].to_pylist(),
        t["source"].to_pylist(),
        t["text"].to_pylist(),
    ):
        w = words_of(text)
        if w is not None:
            out.append((did, src, w))
    return out


def _bloom_bits_of(wh: int) -> list[int]:
    return [(a * wh + b) % P % BLOOM_BITS for a, b in zip(BLOOM_A, BLOOM_B)]


def _kmv_hash(wh: int) -> int:
    return (48_271 * wh + 11) % P


# ---------------------------------------------------------------------------
# sketch_bloom_probe
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_bloom_probe_matches_python_bitset(spark, sf_dir):
    vocab = {w for _, _, words in _doc_words(sf_dir) for w in words}
    bits = {b for w in vocab for b in _bloom_bits_of(word_hash(w))}

    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_name"])
    probe = set()
    for name in pt["p_name"].to_pylist():
        w = words_of(name)
        if w is not None:
            probe.update(w)

    want = {}
    for w in probe:
        in_bloom = all(b in bits for b in _bloom_bits_of(word_hash(w)))
        is_member = w in vocab
        want[w] = (in_bloom, is_member, in_bloom and not is_member)

    out = REGISTRY["sketch_bloom_probe"].fn(spark, sf_dir).collect()
    got = {
        r["word"]: (r["in_bloom"], r["is_member"], r["false_positive"])
        for r in out
    }
    assert got == want
    # The filter is far from saturated (vocab << m), so at these SFs
    # there are NO false positives — the row's checkable content is
    # that the k=3 probe verdicts agree bit for bit, including the
    # true-negative rejections. Assert the probe set genuinely
    # exercises both verdict classes and the bit set is unsaturated.
    assert any(m for _, m, _ in want.values())
    assert any(not m for _, m, _ in want.values())
    assert len(bits) < BLOOM_BITS


# ---------------------------------------------------------------------------
# sketch_topk_misra_gries
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_misra_gries_topk_matches_python_summaries(spark, sf_dir):
    shard_counts: dict[int, dict[str, int]] = defaultdict(
        lambda: defaultdict(int)
    )
    true_cnt: dict[str, int] = defaultdict(int)
    for did, _, words in _doc_words(sf_dir):
        sh = did % MG_SHARDS
        for w in words:
            shard_counts[sh][w] += 1
            true_cnt[w] += 1

    merged: dict[str, int] = defaultdict(int)
    err_bound = 0
    for sh, cnts in shard_counts.items():
        # (m+1)-th largest count under (c DESC, w) ordering; 0 if the
        # shard has <= m distinct words.
        ordered = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
        t = ordered[MG_CAP][1] if len(ordered) > MG_CAP else 0
        err_bound += t
        for w, c in cnts.items():
            if c > t:
                merged[w] += c - t
    topk = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:MG_TOPK]
    want = {
        w: (est, true_cnt[w], err_bound) for w, est in topk
    }

    out = REGISTRY["sketch_topk_misra_gries"].fn(spark, sf_dir).collect()
    got = {
        r["word"]: (r["est"], r["true_cnt"], r["err_bound"]) for r in out
    }
    assert got == want
    # The MG guarantee, re-proven on the mirror itself: every estimate
    # undercounts by at most Delta, and est <= true always.
    for w, (est, tc, eb) in want.items():
        assert tc - eb <= est <= tc


# ---------------------------------------------------------------------------
# sketch_kmv_setops
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_kmv_setops_matches_python_sketch_algebra(spark, sf_dir):
    words_by_src: dict[str, set[str]] = defaultdict(set)
    for _, src, words in _doc_words(sf_dir):
        words_by_src[src].update(words)

    sk: dict[str, list[int]] = {}
    for src, ws in words_by_src.items():
        hs = sorted({_kmv_hash(word_hash(w)) for w in ws})
        sk[src] = hs[:KMV_K]

    want = {}
    srcs = sorted(words_by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            ska, skb = set(sk[a]), set(sk[b])
            u_all = sorted(ska | skb)
            exact_inter = len(words_by_src[a] & words_by_src[b])
            exact_union = len(words_by_src[a] | words_by_src[b])
            if len(u_all) < KMV_K:
                est_union = len(u_all)
                est_inter = len(ska & skb)
            else:
                est_union = (KMV_K - 1) * P // u_all[KMV_K - 1]
                matches = len(set(u_all[:KMV_K]) & ska & skb)
                est_inter = matches * est_union // KMV_K
            want[(a, b)] = (est_union, exact_union, est_inter, exact_inter)

    out = REGISTRY["sketch_kmv_setops"].fn(spark, sf_dir).collect()
    got = {
        (r["source_a"], r["source_b"]): (
            r["est_union"],
            r["exact_union"],
            r["est_inter"],
            r["exact_inter"],
        )
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# sketch_hll_rolling_users — the exact columns of the approx contract
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_hll_rolling_exact_columns_match_python(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    day_users: dict[int, set[str]] = defaultdict(set)
    days_np = (
        t["ts"].cast("timestamp[us]").to_numpy().astype("datetime64[D]")
    )
    for d, u in zip(days_np.astype("int64").tolist(),
                    t["user_id"].to_pylist()):
        day_users[d].add(u)

    import numpy as np

    want = {}
    for d in day_users:
        users = set()
        for k in range(7):
            users |= day_users.get(d - k, set())
        day_str = str(np.datetime64(d, "D"))
        want[day_str] = len(users)

    out = REGISTRY["sketch_hll_rolling_users"].fn(spark, sf_dir).collect()
    got = {r["day"]: r["exact_7d"] for r in out}
    assert got == want
    # The estimate itself is approximate by contract; the value-checked
    # claim is that every lgK=12 union landed within 10%.
    assert all(r["sketch_within_10pct"] for r in out)


# ---------------------------------------------------------------------------
# quality_char_entropy
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_char_entropy_matches_python_identity(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def ln_e6(c: int) -> int:
        x = math.log(float(c)) * 1_000_000
        # Boundary guard: the engines round JVM/DuckDB libm results.
        # CPython's log differs from Java's in the last ulp on parts
        # of the domain (BASELINE.md, the TF-IDF measurement), which
        # only matters if ln(c)*1e6 sits within an ulp of a .5
        # boundary. An ulp at this magnitude is ~2e-9; assert every
        # count this corpus produces is > 1e-6 away from a boundary,
        # so the mirror's rounding provably agrees with both engines.
        frac = abs(x - math.floor(x) - 0.5)
        assert c == 1 or frac > 1e-6, f"ln_e6 boundary hazard at c={c}"
        return int(round_half_up(x, 0))

    want = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if text is None or len(text) == 0:
            continue
        cnt: dict[str, int] = defaultdict(int)
        for ch in text:
            cnt[ch] += 1
        n = sum(cnt.values())
        s_e6 = sum(c * ln_e6(c) for c in cnt.values())
        num = n * ln_e6(n) - s_e6
        want[did] = (n, num, float(num) / float(n * 1_000_000))

    out = REGISTRY["quality_char_entropy"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n"], r["entropy_num_e6"], r["entropy_nats"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# reco_user_similarity
# ---------------------------------------------------------------------------

_RECO_CAP = 40


@pytest.mark.parametrize("sf_dir", SFS)
def test_reco_user_similarity_matches_python_baskets(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    order_cust = dict(
        zip(o["o_orderkey"].to_pylist(), o["o_custkey"].to_pylist())
    )
    part_custs: dict[int, set[int]] = defaultdict(set)
    for ok, pk in zip(
        li["l_orderkey"].to_pylist(), li["l_partkey"].to_pylist()
    ):
        part_custs[pk].add(order_cust[ok])

    kept = {
        p: cs for p, cs in part_custs.items() if 2 <= len(cs) <= _RECO_CAP
    }
    basket_size: dict[int, int] = defaultdict(int)
    for cs in kept.values():
        for c in cs:
            basket_size[c] += 1
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for cs in kept.values():
        cl = sorted(cs)
        for i, a in enumerate(cl):
            for b in cl[i + 1 :]:
                inter[(a, b)] += 1

    scored = []
    for (a, b), n_sh in inter.items():
        uni = basket_size[a] + basket_size[b] - n_sh
        jac_e6 = (2_000_000 * n_sh + uni) // (2 * uni)
        scored.append((jac_e6, a, b, n_sh, uni))
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = [
        (a, b, n_sh, uni, jac_e6)
        for jac_e6, a, b, n_sh, uni in scored[:20]
    ]

    out = REGISTRY["reco_user_similarity"].fn(spark, sf_dir).collect()
    got = [
        (r["cust_a"], r["cust_b"], r["inter"], r["uni"], r["jaccard_e6"])
        for r in out
    ]
    assert got == want


# ---------------------------------------------------------------------------
# events_anomaly_zscore
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_anomaly_zscore_matches_python_fsum_stats(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    by_type: dict[str, list[float]] = defaultdict(list)
    rows = list(
        zip(
            t["event_id"].to_pylist(),
            t["event_type"].to_pylist(),
            t["value"].to_pylist(),
        )
    )
    for _, typ, v in rows:
        by_type[typ].append(v)

    stats = {}
    for typ, vs in by_type.items():
        n = len(vs)
        m = math.fsum(vs) / n
        var = math.fsum((v - m) * (v - m) for v in vs) / (n - 1)
        stats[typ] = (
            round_half_up(m, 6),
            round_half_up(math.sqrt(var), 6),
        )

    want = {}
    for eid, typ, v in rows:
        mean6, std6 = stats[typ]
        z = (v - mean6) / std6
        if abs(z) > 2.5:
            want[eid] = (typ, round_half_up(z, 4))

    out = REGISTRY["events_anomaly_zscore"].fn(spark, sf_dir).collect()
    got = {r["event_id"]: (r["event_type"], r["zscore"]) for r in out}
    assert got == want
