"""Round-12 third opinions, part 11 — the similarity-join / ANN
remainder and the bucket-decomposed global rank, reconstructed in pure
Python from raw parquet and asserted equal to the engine at sf0.001 AND
sf0.01:

- sort_global_ranked: a plain serial sort vs the bucketed two-phase
  global row_number (the decomposition identity checked end to end);
- similarity_join_minhash: even/odd-corpus LSH candidates + exact
  Jaccard >= 0.5 (reusing the shared minhash mirror);
- dedup_clusters: union-find connected components with min-label
  cluster ids, sizes, canonical flags;
- split_leakage_safe: the same components pushed through the shared
  80/10/10 group-keyed split — plus the leakage property itself
  (no near-dup pair straddles two splits) re-proven on the mirror;
- ann_cosine_bruteforce: exact top-5 sequential-fold cosine ranking;
- ann_cosine_lsh: the 4-table sign-LSH candidate sets (reusing the r11
  bucket mirror) + exact cosine ranking over candidates only;
- ann_lsh_recall_report: recall@5 recomputed from the two mirrors
  above — the ground-truth join done with sets;
- ann_mmr_rerank: the 20-candidate pool, pairwise cosines, and the
  greedy lambda=1/2 marginal-relevance selection;
- ann_cosine_pq: the full product-quantization trace — 8x8 subspace
  split, 16 stratified seeds, one exact Lloyd refinement with the
  FLOOR(double) centroid update and seed fallback, code assignment,
  and asymmetric-distance top-3.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.operators.dedup import MINHASH_A, MINHASH_B
from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import (
    hashed_shingles,
    minhash_candidates,
    round_half_up,
    seq_cosine,
    words_of,
)
from tests.test_round11_embedding_thirdopinions import _load, _table_buckets
from tests.test_round12_thirdopinions8 import _split_of

import mapreduceframework_spark.plans.ann_queries  # noqa: F401
import mapreduceframework_spark.plans.core_queries  # noqa: F401
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.sampling_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


# ---------------------------------------------------------------------------
# sort_global_ranked
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_global_rank_matches_serial_sort(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    rows = sorted(
        zip(t["o_totalprice"].to_pylist(), t["o_orderkey"].to_pylist()),
        key=lambda r: (-r[0], r[1]),
    )
    want = {ok: rn for rn, (_, ok) in enumerate(rows, start=1)}

    out = REGISTRY["sort_global_ranked"].fn(spark, sf_dir).collect()
    got = {r["o_orderkey"]: r["rn"] for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# shared MinHash-pipeline mirror pieces
# ---------------------------------------------------------------------------


def _doc_shingles(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sh = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = words_of(text)
        if ws is None:
            continue
        hs = hashed_shingles(ws)
        if hs:
            sh[did] = hs
    return sh


def _jac(a: set[int], b: set[int]) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _near_dup_pairs(sh) -> dict[tuple[int, int], float]:
    return {
        (a, b): _jac(sh[a], sh[b])
        for a, b in minhash_candidates(sh, MINHASH_A, MINHASH_B)
        if _jac(sh[a], sh[b]) >= 0.5
    }


def _components(pairs) -> dict[int, int]:
    """Min-label connected components over the pair set (union-find)."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


# ---------------------------------------------------------------------------
# similarity_join_minhash
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_similarity_join_minhash_matches_python(spark, sf_dir):
    sh = _doc_shingles(sf_dir)
    # The candidate rule differs from the intra-corpus one: pairs are
    # (even, odd) across the parity split, not doc_a < doc_b.
    from collections import defaultdict as dd
    from tests.mirrors import P

    buckets: dict[tuple[int, int], list[int]] = dd(list)
    for did, s in sh.items():
        sig = [
            min((x * a + b) % P for x in s)
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
        for band in range(len(MINHASH_A) // 2):
            buckets[(band, sig[2 * band] * P + sig[2 * band + 1])].append(
                did
            )
    want = {}
    for ids in buckets.values():
        evens = [i for i in ids if i % 2 == 0]
        odds = [i for i in ids if i % 2 == 1]
        for left in evens:
            for right in odds:
                j = _jac(sh[left], sh[right])
                if j >= 0.5:
                    want[(left, right)] = j

    out = REGISTRY["similarity_join_minhash"].fn(spark, sf_dir).collect()
    got = {(r["left_id"], r["right_id"]): r["jac"] for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# dedup_clusters / split_leakage_safe
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_dedup_clusters_match_python_union_find(spark, sf_dir):
    sh = _doc_shingles(sf_dir)
    pairs = _near_dup_pairs(sh)
    comp = _components(pairs)
    sizes: dict[int, int] = defaultdict(int)
    for _, lab in comp.items():
        sizes[lab] += 1
    want = {
        d: (lab, sizes[lab], d == lab) for d, lab in comp.items()
    }

    out = REGISTRY["dedup_clusters"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"],
                      r["is_canonical"])
        for r in out
    }
    assert got == want
    assert len(pairs) > 0  # the clustering genuinely engaged


@pytest.mark.parametrize("sf_dir", SFS)
def test_split_leakage_safe_matches_python_and_is_leak_free(spark, sf_dir):
    all_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pylist()
    sh = _doc_shingles(sf_dir)
    pairs = _near_dup_pairs(sh)
    comp = _components(pairs)
    want = {}
    for d in all_ids:
        group = comp.get(d, d)
        want[d] = (group, _split_of(group))

    out = REGISTRY["split_leakage_safe"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["group_id"], r["split"]) for r in out}
    assert got == want
    # The property the row exists for, re-proven on the mirror: no
    # near-dup pair straddles two splits.
    for a, b in pairs:
        assert want[a][1] == want[b][1]


# ---------------------------------------------------------------------------
# ANN family
# ---------------------------------------------------------------------------


def _bf_top5(vecs):
    """Exact top-5 cosine neighbors for queries vec_id < 10."""
    want = {}
    for q in sorted(vecs):
        if q >= 10:
            continue
        scored = sorted(
            (
                (-seq_cosine(vecs[q], vecs[n]), n)
                for n in vecs
                if n != q
            ),
        )[:5]
        for rank, (neg, n) in enumerate(scored, start=1):
            want[(q, n)] = (-neg, rank)
    return want


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_bruteforce_matches_python_seq_cosine(spark, sf_dir):
    vecs, _ = _load(sf_dir)
    want = _bf_top5(vecs)
    out = REGISTRY["ann_cosine_bruteforce"].fn(spark, sf_dir).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"])
        for r in out
    }
    assert got == want


def _lsh_top5(vecs):
    """Sign-LSH candidate top-5 for queries vec_id < 10."""
    buckets: dict[tuple[int, int], set[int]] = defaultdict(set)
    for vid, v in vecs.items():
        for t, b in enumerate(_table_buckets(v)):
            buckets[(t, b)].add(vid)
    want = {}
    for q in sorted(vecs):
        if q >= 10:
            continue
        cand = set()
        for t, b in enumerate(_table_buckets(vecs[q])):
            cand |= buckets[(t, b)]
        cand.discard(q)
        scored = sorted(
            ((-seq_cosine(vecs[q], vecs[n]), n) for n in cand)
        )[:5]
        for rank, (neg, n) in enumerate(scored, start=1):
            want[(q, n)] = (-neg, rank)
    return want


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_lsh_matches_python_buckets(spark, sf_dir):
    vecs, _ = _load(sf_dir)
    want = _lsh_top5(vecs)
    out = REGISTRY["ann_cosine_lsh"].fn(spark, sf_dir).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_recall_report_matches_python_set_join(spark, sf_dir):
    vecs, _ = _load(sf_dir)
    bf = _bf_top5(vecs)
    ls = _lsh_top5(vecs)
    per_q: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for (q, n) in bf:
        c = per_q[q]
        c[0] += 1
        if (q, n) in ls:
            c[1] += 1
    want = {q: (k, h, h * 20) for q, (k, h) in per_q.items()}

    out = REGISTRY["ann_lsh_recall_report"].fn(spark, sf_dir).collect()
    got = {
        r["query_id"]: (r["bf_k"], r["hits"], r["recall_pct"]) for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_mmr_matches_python_greedy(spark, sf_dir):
    vecs, _ = _load(sf_dir)
    qv = vecs[0]
    rel = {
        vid: seq_cosine(qv, v) for vid, v in vecs.items() if vid != 0
    }
    pool = sorted(rel, key=lambda vid: (-rel[vid], vid))[:20]
    picked: list[int] = []
    want = []
    for step in range(1, 6):
        best = None
        for vid in sorted(pool):
            if vid in picked:
                continue
            if picked:
                score = (
                    rel[vid]
                    - max(seq_cosine(vecs[vid], vecs[s]) for s in picked)
                    / 2
                )
            else:
                score = rel[vid]
            if best is None or score > best[1]:
                best = (vid, score)
        picked.append(best[0])
        want.append(
            (
                step,
                best[0],
                round_half_up(rel[best[0]], 6),
                round_half_up(best[1], 6),
            )
        )

    out = REGISTRY["ann_mmr_rerank"].fn(spark, sf_dir).collect()
    got = [
        (r["step"], r["vec_id"], r["rel"], r["mmr"])
        for r in sorted(out, key=lambda r: r["step"])
    ]
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_pq_matches_python_codebook_trace(spark, sf_dir):
    vecs, _ = _load(sf_dir)
    qvs = {
        vid: [int(round_half_up(x * 1000, 0)) for x in v]
        for vid, v in vecs.items()
    }
    subs = {
        vid: [qv[j * 8 : j * 8 + 8] for j in range(8)]
        for vid, qv in qvs.items()
    }

    def sq(a, b):
        acc = 0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    seeds = {
        j: {t: subs[t][j] for t in sorted(subs) if t < 16}
        for j in range(8)
    }

    def assign(cbooks):
        codes = {}
        for vid in subs:
            for j in range(8):
                best = min(
                    (sq(subs[vid][j], cv), t)
                    for t, cv in cbooks[j].items()
                )
                codes[(vid, j)] = best[1]
        return codes

    c1 = assign(seeds)
    books = {}
    for j in range(8):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = defaultdict(int)
        for vid in subs:
            t = c1[(vid, j)]
            counts[t] += 1
            s = sums.setdefault(t, [0] * 8)
            for c, x in enumerate(subs[vid][j]):
                s[c] += x
        # FLOOR of the exact-integer sum over count as ONE double
        # division (the engines' convention) — back to exact BIGINTs.
        books[j] = {
            t: (
                [
                    int(math.floor(float(sums[t][c]) / float(counts[t])))
                    for c in range(8)
                ]
                if t in sums
                else list(seeds[j][t])
            )
            for t in seeds[j]
        }
    codes = assign(books)

    want = {}
    for q in sorted(subs):
        if q >= 8:
            continue
        scored = []
        for n in subs:
            if n == q:
                continue
            adist = 0
            for j in range(8):
                adist += sq(subs[q][j], books[j][codes[(n, j)]])
            scored.append((adist, n))
        scored.sort()
        for rank, (adist, n) in enumerate(scored[:3], start=1):
            want[(q, n)] = (adist, rank)

    out = REGISTRY["ann_cosine_pq"].fn(spark, sf_dir).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["adist"], r["rank"])
        for r in out
    }
    assert got == want
