"""Round-11 third opinions, part 6 — the embedding-family window rows
reconstructed in pure Python with the exact IEEE operation sequence
(sequential-fold dot products, op-for-op cosine), so candidate sets,
cosine values, and rank tiebreaks must match bit-for-bit:

- dedup_embedding_cosine: 4-table x 4-plane sign-LSH candidates, exact
  cosine >= 0.4 verification;
- ann_topk_join: label centroids (means rounded to 6), 2-probe IVF,
  per-query top-3 with the (cos DESC, neighbor_id) tiebreak.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from tests.mirrors import (
    round_half_up as _round_half_up,
    seq_cosine as _cosine,
)

from mapreduceframework_spark.operators.vectors import (
    L_TABLES,
    PLANE_HALF,
    PLANE_MOD,
    PLANE_MULT,
    PLANE_STEP,
    PLANES_PER_TABLE,
)
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.ann_queries  # noqa: F401
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _load(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    vecs = {}
    labels = {}
    for vid, emb, lab in zip(
        t["vec_id"].to_numpy(), t["embedding"].to_pylist(),
        t["label"].to_pylist(),
    ):
        # float32 -> float64 widening is exact, matching the engine's
        # cast(embedding as array<double>).
        vecs[int(vid)] = [float(x) for x in emb]
        labels[int(vid)] = lab
    return vecs, labels


def _sign(i: int, plane: int) -> float:
    """plane_sign at 1-based dimension i."""
    return (
        1.0
        if (i * PLANE_MULT + plane * PLANE_STEP) % PLANE_MOD < PLANE_HALF
        else -1.0
    )


def _table_buckets(v: list[float]) -> list[int]:
    out = []
    for t in range(L_TABLES):
        bucket = 0
        for p in range(PLANES_PER_TABLE):
            plane = t * PLANES_PER_TABLE + p
            acc = 0.0
            for i, x in enumerate(v, start=1):
                acc = acc + x * _sign(i, plane)
            if acc > 0:
                bucket += 1 << p
        out.append(bucket)
    return out


@pytest.mark.parametrize("sf_dir", SFS)
def test_dedup_embedding_cosine_matches_python(spark, sf_dir):
    vecs, _labels = _load(sf_dir)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for vid, v in vecs.items():
        for t, b in enumerate(_table_buckets(v)):
            buckets[(t, b)].append(vid)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cand.add((a, b))
    expected = {}
    for a, b in cand:
        cos = _cosine(vecs[a], vecs[b])
        # None = zero-norm vector, the mirror's "excluded" convention —
        # matching the engine, where cos is x/0 -> NULL and the
        # >= 0.4 filter drops the NULL row.
        if cos is not None and cos >= 0.4:
            expected[(a, b)] = cos

    out = REGISTRY["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cos"] for r in out}
    assert got == expected  # bit-identical IEEE sequences
    assert expected, "no near-dup vectors — the check proved nothing"


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_topk_join_matches_python(spark, sf_dir):
    vecs, labels = _load(sf_dir)
    corpus = {v: vec for v, vec in vecs.items() if v >= 20}
    queries = {v: vec for v, vec in vecs.items() if v < 20}

    by_label: dict[str, list[int]] = defaultdict(list)
    for vid in corpus:
        by_label[labels[vid]].append(vid)
    dims = len(next(iter(vecs.values())))
    cent = {
        lab: [
            # fsum then round(.,6): summation-order drift (~1e-13) is
            # far below the rounding grain, so this equals both
            # engines' rounded AVG.
            _round_half_up(
                math.fsum(vecs[m][d] for m in members) / len(members), 6
            )
            for d in range(dims)
        ]
        for lab, members in by_label.items()
    }

    expected = {}
    for qid, qv in queries.items():
        # Precondition: no zero-norm query/centroid/corpus vectors in
        # this testdata (asserted below), so _cosine never returns its
        # None "excluded" marker inside these sort keys.
        assert any(x != 0.0 for x in qv)
        ranked_labels = sorted(
            cent,
            key=lambda lab: (-_cosine(qv, cent[lab]), lab),
        )[:2]
        scored = [
            (vid, _cosine(qv, corpus[vid]))
            for lab in ranked_labels
            for vid in by_label[lab]
        ]
        scored.sort(key=lambda vc: (-vc[1], vc[0]))
        for rank, (vid, cos) in enumerate(scored[:3], start=1):
            expected[(qid, vid)] = (cos, rank)

    out = REGISTRY["ann_topk_join"].fn(spark, sf_dir).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"])
        for r in out
    }
    assert got == expected
