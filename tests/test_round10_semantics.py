"""Round-10 independent cross-checks. The driver contract already
hash-compares every query against its DuckDB oracle; these tests check
what a two-engine comparison cannot:

- sketch_quantile_kll: the claimed ERROR GUARANTEE holds against an
  engine-independent numpy reconstruction, the summary really is
  mergeable (built per shard, merged by plain union), and the exact
  rank error — not just the value bracket — is within slack;
- graph_hits: the unnormalized scores equal a pure-Python fixpoint
  over the weighted edge multiset;
- ann_filtered_ivf: the whole filtered-retrieval pipeline reproduces
  under numpy (centroids, probes, pre-filter, top-5 tiebreaks).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from mapreduceframework_spark.plans.sketch_queries import (
    KLLQ_PCTS,
    KLLQ_SHARDS,
    KLLQ_SLACK,
    KLLQ_STRIDE,
)
import mapreduceframework_spark.plans.sketch_queries  # noqa: F401


def _numpy_reference(sf_dir: str) -> dict[int, dict]:
    """Rebuild the whole sketch in numpy: per-shard sort, every C-th
    rank kept with weight C, union, rank-select — plus the exact order
    statistics the bracket compares against."""
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    # Drop NULL values like the query's explicit IS NOT NULL guard —
    # an unfiltered read would turn a future NULL into NaN garbage and
    # misdiagnose the engines as wrong.
    valid = t["value"].combine_chunks().is_valid().to_numpy(
        zero_copy_only=False
    )
    eid = t["event_id"].to_numpy()[valid]
    # snap_units is ROUND-half-AWAY-from-zero on both engines; np.rint
    # rounds half to even, so mirror with floor(x + 0.5) (values are
    # strictly positive in this table).
    v = np.floor(
        t["value"].to_numpy(zero_copy_only=False)[valid] * 10_000 + 0.5
    ).astype(np.int64)
    n = len(v)
    order = np.lexsort((eid, v))  # global (v, eid) order
    sv, se = v[order], eid[order]

    kept = []
    for s in range(KLLQ_SHARDS):
        m = se % KLLQ_SHARDS == s  # shard slice, already (v, eid)-sorted
        sh_v, sh_e = sv[m], se[m]
        idx = np.arange(1, len(sh_v) + 1)
        keep = idx % KLLQ_STRIDE == 0
        kept.append(np.stack([sh_v[keep], sh_e[keep]], axis=1))
    merged = np.concatenate(kept)  # mergeability: plain union of shards
    morder = np.lexsort((merged[:, 1], merged[:, 0]))
    mk_v = merged[morder, 0]
    kept_cnt = len(mk_v)

    out = {}
    for q in KLLQ_PCTS:
        tau = (q * n + 99) // 100
        k_eff = min((tau + KLLQ_STRIDE - 1) // KLLQ_STRIDE, kept_cnt)
        out[q] = {
            "n": n,
            "tau": tau,
            "est": int(mk_v[k_eff - 1]),
            "lo": int(sv[max(1, tau - KLLQ_SLACK) - 1]),
            "hi": int(sv[min(n, tau + KLLQ_SLACK) - 1]),
        }
    return out


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        # sf0.1 too: the driver's hash compare proves the ENGINES agree
        # on within_bound, not that it is true — only this numpy
        # reconstruction asserts the guarantee itself at each scale.
        "/root/testdata/sf0.1",
    ],
)
def test_kll_quantile_matches_numpy_and_holds_bound(spark, sf_dir):
    rows = {
        r["q_pct"]: r
        for r in REGISTRY["sketch_quantile_kll"].fn(spark, sf_dir).collect()
    }
    ref = _numpy_reference(sf_dir)
    assert set(rows) == set(KLLQ_PCTS)
    for q in KLLQ_PCTS:
        r, e = rows[q], ref[q]
        # Engine-independent third opinion on every output column.
        assert r["n"] == e["n"] and r["tau"] == e["tau"], q
        assert r["est_e4"] == e["est"], q
        assert r["lo_e4"] == e["lo"] and r["hi_e4"] == e["hi"], q
        # The guarantee itself — not just cross-engine agreement.
        assert r["within_bound"] is True, q
        assert e["lo"] <= e["est"] <= e["hi"], q


def test_kll_summary_rank_error_within_slack(spark, sf_dir):
    """Stronger than the value bracket: the estimate's exact rank is
    within tau +/- slack (the docstring's actual claim; the value
    bracket is what the SQL can check cheaply)."""
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["value"]
    )
    valid = t["value"].combine_chunks().is_valid().to_numpy(
        zero_copy_only=False
    )
    v = np.sort(
        np.floor(
            t["value"].to_numpy(zero_copy_only=False)[valid] * 10_000 + 0.5
        ).astype(np.int64)
    )
    n = len(v)
    rows = REGISTRY["sketch_quantile_kll"].fn(spark, sf_dir).collect()
    for r in rows:
        est = r["est_e4"]
        # Exact rank range occupied by est in the sorted data.
        first = int(np.searchsorted(v, est, side="left")) + 1
        last = int(np.searchsorted(v, est, side="right"))
        tau = r["tau"]
        # The interval [first, last] must intersect tau +/- slack.
        assert first <= tau + KLLQ_SLACK, (r["q_pct"], first, tau)
        assert last >= tau - KLLQ_SLACK, (r["q_pct"], last, tau)
        assert r["n"] == n


# --------------------------------------------------------------------
# Third opinions for rows whose only prior evidence was the two-engine
# oracle compare: a pure-Python HITS fixpoint and a full-numpy
# reconstruction of the filtered-ANN pipeline.
# --------------------------------------------------------------------


def test_hits_matches_pure_python_fixpoint(spark, sf_dir):
    """graph_hits claims its unnormalized scores are exact-integer path
    counts of the alternating out/in walk. Recompute the fixpoint in
    plain Python over the (weighted) collected edge multiset — the
    trade graph is multi-edge, so multiplicities weight each hop —
    and compare every node's hub/auth score exactly."""
    from mapreduceframework_spark.plans.graph_queries import (
        HITS_ROUNDS,
        _trade_edges,
    )
    from mapreduceframework_spark.plans.registry import REGISTRY
    import mapreduceframework_spark.plans.graph_queries  # noqa: F401

    edges = {}  # (src, dst) -> multiplicity
    for r in (
        _trade_edges(spark, sf_dir).groupBy("src", "dst").count().collect()
    ):
        edges[(r["src"], r["dst"])] = r["count"]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    h = {v: 1 for v in nodes}
    a = {}
    for _ in range(HITS_ROUNDS):
        a = {}
        for (s, d), m in edges.items():
            a[d] = a.get(d, 0) + m * h[s]
        h = {}
        for (s, d), m in edges.items():
            if d in a:
                h[s] = h.get(s, 0) + m * a[d]
    got = {
        r["nation"]: (r["hub_score"], r["auth_score"])
        for r in REGISTRY["graph_hits"].fn(spark, sf_dir).collect()
    }
    assert set(got) == nodes
    for v in nodes:
        assert got[v] == (h.get(v, 0), a.get(v, 0)), v


def test_filtered_ivf_matches_numpy(spark, sf_dir):
    """Full numpy reconstruction of ann_filtered_ivf: per-label mean
    centroids rounded to 6, 3 probed lists per query, lang='en'
    pre-filter, exact cosine, top-5 with (cos DESC, id ASC) tiebreak.
    Pins the neighbor SETS and ranks; cosine values are compared to
    within float repro tolerance (numpy sums in a different order than
    the engines' sequential fold, so bitwise equality is not the
    claim here — the engines' mutual bit-equality is the driver's)."""
    from mapreduceframework_spark.plans.registry import REGISTRY
    import mapreduceframework_spark.plans.ann_queries  # noqa: F401

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_id = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    V = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    allowed = set(
        int(d)
        for d, l in zip(
            docs["doc_id"].to_numpy(), docs["lang"].to_pylist()
        )
        if l == "en"
    )

    cents = {}
    for lab in np.unique(labels):
        cents[int(lab)] = np.round(V[labels == lab].mean(axis=0), 6)

    def cos(x, y):
        return float(
            np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y))
        )

    expect = {}
    for qi in np.where(vec_id < 10)[0]:
        qid = int(vec_id[qi])
        probed = sorted(
            cents, key=lambda lab: (-cos(V[qi], cents[lab]), lab)
        )[:3]
        cand = [
            (-cos(V[qi], V[j]), int(vec_id[j]))
            for j in range(len(vec_id))
            if int(labels[j]) in probed
            and int(vec_id[j]) != qid
            and int(vec_id[j]) in allowed
        ]
        cand.sort()
        expect[qid] = [(nid, -negc) for negc, nid in cand[:5]]

    rows = REGISTRY["ann_filtered_ivf"].fn(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos"])
        )
    assert set(got) == set(expect)
    for qid, exp in expect.items():
        g = [
            (nid, c) for _, nid, c in sorted(got[qid])
        ]
        assert [n for n, _ in g] == [n for n, _ in exp], qid
        for (gn, gc), (en, ec) in zip(g, exp):
            assert abs(gc - ec) < 1e-9, (qid, gn)


def test_cross_correlation_matches_exact_python(spark, sf_dir):
    """timeseries_cross_correlation under a pure-Python mirror: daily
    e4 sums, mean-clearing by each side's own n (all exact ints —
    Python's bignums play the DECIMAL(38,0) role), num/sqrt(denx*deny)
    as the single double division, ROUND-half-away to e6. Every
    (type_a, type_b, lag) row must match exactly — including which
    degenerate rows are excluded by the den<>0 predicate."""
    import math
    from collections import defaultdict
    from datetime import date

    from mapreduceframework_spark.plans.analytics_queries import CCF_LAGS
    from mapreduceframework_spark.plans.registry import REGISTRY
    import mapreduceframework_spark.plans.analytics_queries  # noqa: F401

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    epoch = date(2024, 1, 1)
    daily = defaultdict(int)  # (type, day) -> exact e4 sum
    for et, ts, val in zip(
        t["event_type"].to_pylist(),
        t["ts"].to_pylist(),
        t["value"].to_pylist(),
    ):
        d = (ts.date() - epoch).days
        e4 = math.floor(val * 10_000 + 0.5)  # positive values only
        daily[(et, d)] += e4
    series = defaultdict(dict)  # type -> {day: v}
    for (et, d), v in daily.items():
        series[et][d] = v
    stats = {
        et: (len(days), sum(days.values()))
        for et, days in series.items()
    }

    def round_away(x: float) -> int:
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    expect = {}
    for ta, da in series.items():
        na, sa = stats[ta]
        for tb, db in series.items():
            if ta == tb:
                continue
            nb, sb = stats[tb]
            for lag in CCF_LAGS:
                num = denx = deny = 0
                n_overlap = 0
                for d, va in da.items():
                    vb = db.get(d + lag)
                    if vb is None:
                        continue
                    xa = na * va - sa
                    xb = nb * vb - sb
                    num += xa * xb
                    denx += xa * xa
                    deny += xb * xb
                    n_overlap += 1
                if denx == 0 or deny == 0:
                    continue  # the exact-predicate exclusion
                ccf = round_away(
                    float(num) / math.sqrt(float(denx) * float(deny))
                    * 1_000_000
                )
                expect[(ta, tb, lag)] = (n_overlap, ccf)

    got = {
        (r["type_a"], r["type_b"], r["lag"]): (r["n_overlap"], r["ccf_e6"])
        for r in REGISTRY["timeseries_cross_correlation"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
