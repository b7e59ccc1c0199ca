"""Round-11 independent cross-checks.

- sketch_quantile_kll_twolevel: the COMPOSED two-level error guarantee
  (slack2 = C1*C2 + C1 + C1*B2*(C2-1) + B1*(C1-1)) holds against an
  engine-independent numpy reconstruction at every scale factor, both
  levels merge by plain union, and the exact rank error — not just the
  value bracket — is within slack2. The driver's hash compare proves
  the ENGINES agree on within_bound; only this reconstruction asserts
  the guarantee itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from mapreduceframework_spark.plans.sketch_queries import (
    KLL2_B1,
    KLL2_B2,
    KLL2_C1,
    KLL2_C2,
    KLL2_SLACK,
    KLL2_W,
    KLLQ_PCTS,
)
import mapreduceframework_spark.plans.sketch_queries  # noqa: F401


def _compact_np(v: np.ndarray, e: np.ndarray, shards: int, stride: int):
    """One deterministic KLL compaction level in numpy: per-shard
    (eid % shards) sort by (v, eid), keep every stride-th rank —
    merged by PLAIN UNION of the per-shard kept sets."""
    kept = []
    for s in range(shards):
        m = e % shards == s
        sh_v, sh_e = v[m], e[m]
        o = np.lexsort((sh_e, sh_v))
        sh_v, sh_e = sh_v[o], sh_e[o]
        idx = np.arange(1, len(sh_v) + 1)
        keep = idx % stride == 0
        kept.append(np.stack([sh_v[keep], sh_e[keep]], axis=1))
    merged = np.concatenate(kept)
    return merged[:, 0], merged[:, 1]


def _load_events(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(eid, value) with NULL values dropped — mirroring the query's
    explicit ``value IS NOT NULL`` guard (the exact hazard the guard
    exists for: an unfiltered read would turn a future NULL into NaN
    garbage here and misdiagnose the engines as wrong)."""
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    valid = t["value"].combine_chunks().is_valid().to_numpy(
        zero_copy_only=False
    )
    eid = t["event_id"].to_numpy()[valid]
    val = t["value"].to_numpy(zero_copy_only=False)[valid]
    return eid, val


def _numpy_reference(sf_dir: str) -> dict[int, dict]:
    eid, val = _load_events(sf_dir)
    # snap_units is ROUND-half-AWAY-from-zero on both engines; np.rint
    # rounds half to even, so mirror with floor(x + 0.5) (values are
    # strictly positive in this table).
    v = np.floor(val * 10_000 + 0.5).astype(np.int64)
    n = len(v)
    sv = np.sort(v)

    k1v, k1e = _compact_np(v, eid, KLL2_B1, KLL2_C1)
    k2v, k2e = _compact_np(k1v, k1e, KLL2_B2, KLL2_C2)
    o = np.lexsort((k2e, k2v))
    mk_v = k2v[o]
    kept_cnt = len(mk_v)

    out = {}
    for q in KLLQ_PCTS:
        tau = (q * n + 99) // 100
        k_eff = min((tau + KLL2_W - 1) // KLL2_W, kept_cnt)
        out[q] = {
            "n": n,
            "tau": tau,
            "est": int(mk_v[k_eff - 1]),
            "lo": int(sv[max(1, tau - KLL2_SLACK) - 1]),
            "hi": int(sv[min(n, tau + KLL2_SLACK) - 1]),
        }
    return out


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        # sf0.1 too: sf0.01-green-but-sf0.1-fragile has happened; the
        # guarantee must hold at every scale the driver benches.
        "/root/testdata/sf0.1",
    ],
)
def test_kll2_matches_numpy_and_holds_composed_bound(spark, sf_dir):
    rows = {
        r["q_pct"]: r
        for r in REGISTRY["sketch_quantile_kll_twolevel"]
        .fn(spark, sf_dir)
        .collect()
    }
    ref = _numpy_reference(sf_dir)
    assert set(rows) == set(KLLQ_PCTS)
    for q in KLLQ_PCTS:
        r, e = rows[q], ref[q]
        # Engine-independent third opinion on every output column.
        assert r["n"] == e["n"] and r["tau"] == e["tau"], q
        assert r["est_e4"] == e["est"], q
        assert r["lo_e4"] == e["lo"] and r["hi_e4"] == e["hi"], q
        # The composed guarantee itself — not just engine agreement.
        assert r["within_bound"] is True, q
        assert e["lo"] <= e["est"] <= e["hi"], q


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_kll2_exact_rank_error_within_composed_slack(spark, sf_dir):
    """Stronger than the value bracket: the estimate's exact rank
    interval intersects tau +/- slack2 (the docstring's actual claim) —
    at every scale factor, like the bracket test above."""
    _eid, val = _load_events(sf_dir)
    v = np.sort(np.floor(val * 10_000 + 0.5).astype(np.int64))
    n = len(v)
    rows = (
        REGISTRY["sketch_quantile_kll_twolevel"].fn(spark, sf_dir).collect()
    )
    for r in rows:
        est = r["est_e4"]
        first = int(np.searchsorted(v, est, side="left")) + 1
        last = int(np.searchsorted(v, est, side="right"))
        tau = r["tau"]
        assert first <= tau + KLL2_SLACK, (r["q_pct"], first, tau)
        assert last >= tau - KLL2_SLACK, (r["q_pct"], last, tau)
        assert r["n"] == n


def test_kll2_slack_composition_constant():
    """Pin the composed-slack formula the docstring proves, so a
    parameter edit cannot silently detach the constant from the
    derivation."""
    assert KLL2_SLACK == (
        KLL2_C1 * KLL2_C2
        + KLL2_C1
        + KLL2_C1 * KLL2_B2 * (KLL2_C2 - 1)
        + KLL2_B1 * (KLL2_C1 - 1)
    )
    assert KLL2_W == KLL2_C1 * KLL2_C2
