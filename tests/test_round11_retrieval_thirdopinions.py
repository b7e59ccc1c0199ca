"""Round-11 third opinions, part 9 — the retrieval-scoring rows
reconstructed in pure Python:

- text_tfidf_top_terms: tf/df/smoothed-idf and the per-doc top-3 with
  the (tfidf DESC, term) tiebreak. Terms and ranks compare exactly;
  the score compares within a few ulp — measured here: CPython's libm
  log differs from Java's Math.log (and DuckDB, which agrees with
  Java on this host) in the LAST ULP on ~20% of this df domain, the
  very hazard the repo's exact-integer contracts exist to avoid;
- text_bm25_topk: the fully-RATIONAL BM25 variant (no log by design),
  every score the identical IEEE expression tree — single-space
  tokenization with boundary empties, fixed-order term summation, and
  the deterministic top-20 cut, compared bit-for-bit.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from tests.mirrors import words_of
from mapreduceframework_spark.plans.registry import REGISTRY
from mapreduceframework_spark.plans.text_queries import BM25_TERMS
import mapreduceframework_spark.plans.text_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _docs_py(sf_dir: str) -> dict[int, str]:
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return {
        int(d): txt
        for d, txt in zip(t["doc_id"].to_numpy(), t["text"].to_pylist())
    }


@pytest.mark.parametrize("sf_dir", SFS)
def test_text_tfidf_top_terms_matches_python(spark, sf_dir):
    docs = _docs_py(sf_dir)
    tf: dict[int, Counter] = {}
    df: Counter = Counter()
    for did, text in docs.items():
        ws = words_of(text)
        if ws is None:
            continue
        c = Counter(ws)
        tf[did] = c
        df.update(c.keys())
    n_docs = len(tf)

    expected = {}
    for did, c in tf.items():
        scored = [
            # op order mirrored: (1.0 + float(n)) / (1.0 + df) then ln,
            # then int * float.
            (t, cnt * math.log((1.0 + float(n_docs)) / (1.0 + df[t])))
            for t, cnt in c.items()
        ]
        scored.sort(key=lambda ts: (-ts[1], ts[0]))
        for rnk, (t, s) in enumerate(scored[:3], start=1):
            expected[(did, t)] = (s, rnk)

    out = REGISTRY["text_tfidf_top_terms"].fn(spark, sf_dir).collect()
    got = {
        (r["doc_id"], r["term"]): (r["tfidf"], r["rnk"]) for r in out
    }
    # Selection and ranking must agree exactly; scores within 4 ulp
    # (Java Math.log vs CPython libm differ in the last ulp on ~20%
    # of this df domain — measured, not hypothetical).
    assert set(got) == set(expected)
    for k, (s, rnk) in expected.items():
        gs, grnk = got[k]
        assert grnk == rnk, k
        assert math.isclose(gs, s, rel_tol=1e-15, abs_tol=0.0), (
            k, gs, s,
        )


@pytest.mark.parametrize("sf_dir", SFS)
def test_text_bm25_topk_matches_python(spark, sf_dir):
    docs = _docs_py(sf_dir)
    # Single-space split over length>0 docs, boundary/consecutive
    # empties INCLUDED in dlen — the query's exact tokenization.
    toks = {
        did: text.split(" ") for did, text in docs.items() if len(text) > 0
    }
    dl = {did: len(ws) for did, ws in toks.items()}
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / n_docs
    tf: dict[int, dict[str, int]] = defaultdict(dict)
    df: Counter = Counter()
    for did, ws in toks.items():
        c = Counter(w for w in ws if w in BM25_TERMS)
        for w, n in c.items():
            tf[did][w] = n
            df[w] += 1

    def s(did: int, w: str) -> float:
        t = tf[did][w]
        return (
            ((n_docs - df[w] + 0.5) / (df[w] + 0.5))
            * (t * 2.2)
            / (t + 1.2 * (0.25 + 0.75 * (dl[did] / avgdl)))
        )

    scores = []
    for did, terms in tf.items():
        total = 0.0
        for w in BM25_TERMS:  # fixed pivot order — float + is not
            total = total + (s(did, w) if w in terms else 0.0)
        scores.append((did, total))
    scores.sort(key=lambda ds: (-ds[1], ds[0]))
    expected = scores[:20]

    out = REGISTRY["text_bm25_topk"].fn(spark, sf_dir).collect()
    got = [(r["doc_id"], r["score"]) for r in out]
    assert got == expected  # bit-for-bit: rational scores, fixed order
    assert len(expected) == 20
