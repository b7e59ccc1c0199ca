"""Independent cross-checks for the round-10 mergeable quantile sketch
(sketch_quantile_kll). The driver contract already hash-compares the
Spark pipeline against the DuckDB oracle; these tests check the parts a
two-engine comparison cannot — that the claimed ERROR GUARANTEE holds
against an engine-independent numpy reconstruction, and that the
summary really is mergeable (built per shard, merged by plain union).
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
    eid = t["event_id"].to_numpy()
    # snap_units is ROUND-half-AWAY-from-zero on both engines; np.rint
    # rounds half to even, so mirror with floor(x + 0.5) (values are
    # strictly positive in this table).
    v = np.floor(t["value"].to_numpy() * 10_000 + 0.5).astype(np.int64)
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
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
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
    v = np.sort(
        np.floor(t["value"].to_numpy() * 10_000 + 0.5).astype(np.int64)
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
