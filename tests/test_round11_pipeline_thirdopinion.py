"""Round-11 third opinions, part 4 — the MinHash near-dup path and the
curation capstone reconstructed end-to-end in pure Python:

- dedup_minhash_lsh: word-hash -> 3-gram shingle fold -> 8-perm
  signature -> 4x2 LSH bands -> candidate pairs -> exact Jaccard
  (threshold checked in EXACT integer arithmetic: jac >= 0.5 iff
  3*shared >= |A| + |B|);
- pipeline_curate_corpus: the full compose — C4-style quality filter
  (ratio terms mirrored op-for-op, HALF_UP rounding via Decimal of the
  shortest repr, matching Java BigDecimal.valueOf), exact md5 dedup,
  near-dup cluster removal (connected components over the pairs
  above), deterministic split, per-split doc/token stats.

Everything the pipeline composes is re-derived here from the raw
parquet, so agreement means the Spark plan, the DuckDB oracle, AND an
independent implementation concur on the whole curation pass.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.operators.dedup import MINHASH_A, MINHASH_B
from mapreduceframework_spark.operators.text import STOPWORDS
from tests.mirrors import (
    JAVA_WS as _JAVA_WS,
    hashed_shingles as _shingles,
    minhash_candidates,
    round_half_up as _round_half_up,
    words_of as _words,
    ws_token_count as _ws_tokens,
)
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.sampling_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_NON_ALNUM_WS = re.compile(r"[^A-Za-z0-9 \t\n\x0B\f\r]")


def _minhash_pairs_py(sf_dir: str):
    """(pairs {(a, b): (shared, na, nb)}, shingle sets per doc)."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sh: dict[int, set[int]] = {}
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        ws = _words(text)
        if ws is None:
            continue
        s = _shingles(ws)
        if s:
            sh[int(did)] = s
    cand = minhash_candidates(sh, MINHASH_A, MINHASH_B)
    pairs = {}
    for a, b in cand:
        shared = len(sh[a] & sh[b])
        na, nb = len(sh[a]), len(sh[b])
        # jac >= 0.5  <=>  3*shared >= na + nb (exact integers; IEEE
        # division is correctly rounded so the engines' double compare
        # cannot disagree with this for set sizes << 2^53).
        if 3 * shared >= na + nb:
            pairs[(a, b)] = (shared, na, nb)
    return pairs, sh


@pytest.mark.parametrize("sf_dir", SFS)
def test_dedup_minhash_lsh_matches_python(spark, sf_dir):
    pairs, _sh = _minhash_pairs_py(sf_dir)
    expected = {
        (a, b): shared / (na + nb - shared)
        for (a, b), (shared, na, nb) in pairs.items()
    }
    out = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jac"] for r in out}
    assert got == expected  # identical IEEE quotient of identical ints
    assert expected, "no near-dup pairs — the check proved nothing"


def _quality(text: str) -> float:
    n = len(text)
    len_term = min(n / 200.0, 1.0)
    if n == 0:
        punct = 0.0
    else:
        punct = (n - len(_NON_ALNUM_WS.sub("", text))) / n
    punct_term = 1.0 - min(punct * 4, 1.0)
    ws = _JAVA_WS.split(text.strip(" "))
    total = len(ws)
    stop = (
        0.0
        if total == 0
        else sum(1 for w in ws if w in STOPWORDS) / total
    )
    stop_term = min(stop * 5, 1.0)
    return _round_half_up((len_term + punct_term + stop_term) / 3.0, 6)


@pytest.mark.parametrize("sf_dir", SFS)
def test_pipeline_curate_corpus_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    docs = {
        int(d): txt
        for d, txt in zip(t["doc_id"].to_numpy(), t["text"].to_pylist())
    }
    qual = {d: _quality(txt) for d, txt in docs.items()}
    passing = {d for d, q in qual.items() if q >= 0.5}

    # Exact dedup: min doc_id per md5(text) among quality-passing docs.
    by_digest: dict[str, int] = {}
    for d in sorted(passing):
        dig = hashlib.md5(docs[d].encode("utf-8")).hexdigest()
        by_digest.setdefault(dig, d)
    keepers = set(by_digest.values())

    # Near-dup clusters: connected components over the MinHash pairs;
    # non-canonical members (id != min of component) are dropped.
    pairs, _sh = _minhash_pairs_py(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = defaultdict(list)
    for x in list(parent):
        members[find(x)].append(x)
    noncanon = {
        m for root, ms in members.items() for m in ms if m != min(ms)
    }

    kept = sorted(passing & keepers - noncanon)
    agg: dict[str, list] = defaultdict(lambda: [0, 0, []])
    for d in kept:
        b = (d * 2654435761 + 40503) % 1000
        split = "train" if b < 800 else ("val" if b < 900 else "test")
        a = agg[split]
        a[0] += 1
        a[1] += _ws_tokens(docs[d])
        a[2].append(qual[d])

    out = REGISTRY["pipeline_curate_corpus"].fn(spark, sf_dir).collect()
    got = {
        r["split"]: (r["n_docs"], r["n_tokens"], r["avg_quality"])
        for r in out
    }
    assert set(got) == set(agg)
    for split, (n, toks, qs) in agg.items():
        gn, gt, gq = got[split]
        assert (gn, gt) == (n, toks), split
        # avg over rounded-6dp qualities, re-rounded to 4dp: sum-order
        # ULP drift means exact equality is not a valid claim here —
        # half a unit in the 4th decimal is.
        assert abs(gq - _round_half_up(sum(qs) / n, 4)) <= 5e-5, split
