"""Round-12 third opinions, part 5 — the rest of the r08 cohort's
reconstructable rows, asserted equal to the engine at sf0.001 AND
sf0.01:

- join_interval_overlap: both gaps-and-islands interval sets walked
  serially, then the literal quadratic overlap scan (checking the
  1-hour bucket join's losslessness AND the island derivation);
- events_rfm_segments: per-user R/F/M goodness, the exact ceil(k*n/3)
  tertile cutoffs, scoring, and the 27-cell cube;
- lakehouse_incremental_join: the joined view recomputed fresh over
  (base minus retractions) union inserts — the invariant the
  delta-join merge must preserve;
- cdc_merkle_reconcile: source and drifted target materialized as
  dicts, then diffed row-by-row — every op re-derived from actual row
  payloads rather than the oracle's %-pattern shortcut;
- embedding_centroid_drift: label and global centroids via the
  FLOOR-of-exact-double mean convention, drift as exact squared L2.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.ann_queries  # noqa: F401
import mapreduceframework_spark.plans.lakehouse_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

US_PER_DAY = 86_400_000_000


def _islands_py(
    rows: list[tuple], gap_us: int
) -> dict[tuple, tuple[int, int]]:
    """(key, seq) -> [s_us, e_us] islands over (key, ts_us, event_id)
    rows, split where the gap is STRICTLY greater than gap_us — the
    plans/_islands recipe walked serially."""
    by_key: dict = defaultdict(list)
    for key, us, eid in rows:
        by_key[key].append((us, eid))
    out: dict[tuple, tuple[int, int]] = {}
    for key, evs in by_key.items():
        seq = 0
        prev = None
        start = None
        last = None
        for us, _eid in sorted(evs):
            if prev is None or us - prev > gap_us:
                if seq:
                    out[(key, seq)] = (start, last)
                seq += 1
                start = us
            prev = us
            last = us
        out[(key, seq)] = (start, last)
    return out


@pytest.mark.parametrize("sf_dir", SFS)
def test_join_interval_overlap_matches_quadratic(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "event_id", "ts"],
    )
    users, types, eids = (
        t["user_id"].to_pylist(), t["event_type"].to_pylist(),
        t["event_id"].to_pylist(),
    )
    uss = ts_us(t["ts"]).tolist()
    sess = _islands_py(
        list(zip(users, uss, eids)), 30 * 60 * 1_000_000
    )
    burst = _islands_py(
        list(zip(types, uss, eids)), 10 * 60 * 1_000_000
    )
    want = {
        (u, sseq, ty, bseq): min(ae, be) - max(as_, bs)
        for (u, sseq), (as_, ae) in sess.items()
        for (ty, bseq), (bs, be) in burst.items()
        if as_ <= be and bs <= ae
    }

    out = REGISTRY["join_interval_overlap"].fn(spark, sf_dir).collect()
    got = {
        (r["user_id"], r["session_seq"], r["event_type"], r["burst_seq"]):
        r["overlap_us"]
        for r in out
    }
    # Equality against the quadratic scan = the hour-bucket candidate
    # join is lossless and duplicate-free.
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_rfm_segments_matches_python_tertiles(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "value"],
    )
    us_all = ts_us(t["ts"]).tolist()
    p = [
        (u, us, int(round_half_up(v * 100, 0)))
        for u, typ, us, v in zip(
            t["user_id"].to_pylist(), t["event_type"].to_pylist(),
            us_all, t["value"].to_pylist(),
        )
        if typ == "purchase"
    ]
    gus = max(us for _, us, _ in p)
    last: dict[int, int] = {}
    freq: dict[int, int] = defaultdict(int)
    mon: dict[int, int] = defaultdict(int)
    for u, us, cents in p:
        last[u] = max(last.get(u, us), us)
        freq[u] += 1
        mon[u] += cents
    g = {
        u: (-((gus - last[u]) // US_PER_DAY), freq[u], mon[u])
        for u in last
    }
    n = len(g)

    def cuts(vals: list[int]) -> tuple[int, int]:
        s = sorted(vals)
        # c_k = smallest value whose cumulative count reaches
        # ceil(k*n/3) — 1-based rank (k*n + 2) // 3 in the sorted list.
        return s[(n + 2) // 3 - 1], s[(2 * n + 2) // 3 - 1]

    c1 = [cuts([v[d] for v in g.values()]) for d in range(3)]
    cube: dict[tuple[int, int, int], list[int]] = defaultdict(
        lambda: [0, 0]
    )
    for u, vals in g.items():
        score = tuple(
            1 + (vals[d] > c1[d][0]) + (vals[d] > c1[d][1]) for d in range(3)
        )
        cube[score][0] += 1
        cube[score][1] += mon[u]
    want = {k: tuple(v) for k, v in cube.items()}

    out = REGISTRY["events_rfm_segments"].fn(spark, sf_dir).collect()
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (
            r["n_users"], r["monetary_e2"]
        )
        for r in out
    }
    assert got == want
    # Tertile sanity: every score is 1..3 and users partition exactly.
    assert all(1 <= s <= 3 for k in got for s in k)
    assert sum(nu for nu, _ in got.values()) == n


@pytest.mark.parametrize("sf_dir", SFS)
def test_lakehouse_incremental_join_matches_fresh_recompute(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = dict(
        zip(c["c_custkey"].to_pylist(), c["c_mktsegment"].to_pylist())
    )
    agg: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for k, ck, d, x in zip(
        o["o_orderkey"].to_pylist(), o["o_custkey"].to_pylist(),
        o["o_orderdate"].to_pylist(), o["o_totalprice"].to_pylist(),
    ):
        in_base = k % 10 != 0
        if in_base and k % 13 == 0:
            continue  # retracted
        cell = agg[(seg[ck], d.strftime("%Y-%m-%d"))]
        cell[0] += 1
        cell[1] += int(round_half_up(x * 100, 0))
    want = {key: tuple(v) for key, v in agg.items() if v[0] > 0}

    out = REGISTRY["lakehouse_incremental_join"].fn(spark, sf_dir).collect()
    got = {
        (r["segment"], r["day"]): (r["n_orders"], r["sum_cents"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_cdc_merkle_reconcile_matches_row_diff(spark, sf_dir):
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=cols)
    rows = list(zip(*[t[c].to_pylist() for c in cols]))
    source = {r[0]: r for r in rows}
    # The drifted target, rebuilt by _mutated_orders' rules from raw
    # rows (keys %997 -> status X, %1499 minus those -> deleted,
    # %1001 -> re-keyed insert with status N).
    off = max(source) + 1
    target: dict[int, tuple] = {}
    for k, r in source.items():
        if k % 997 == 0:
            target[k] = (r[0], r[1], "X", *r[3:])
        elif k % 1499 == 0:
            continue
        else:
            target[k] = r
    for k, r in source.items():
        if k % 1001 == 0:
            target[k + off] = (k + off, r[1], "N", *r[3:])
    # Row-by-row diff of the materialized dicts — ops derived from the
    # actual payloads, not the %-pattern shortcut the oracle states.
    want = {}
    for k in source.keys() | target.keys():
        s, g = source.get(k), target.get(k)
        if g is None:
            want[k] = ("D", k % 256)
        elif s is None:
            want[k] = ("I", k % 256)
        elif s != g:
            want[k] = ("U", k % 256)

    out = REGISTRY["cdc_merkle_reconcile"].fn(spark, sf_dir).collect()
    got = {r["o_orderkey"]: (r["op"], r["bucket"]) for r in out}
    assert got == want
    assert {op for op, _ in got.values()} == {"U", "D", "I"}


@pytest.mark.parametrize("sf_dir", SFS)
def test_embedding_centroid_drift_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )
    s: dict[tuple[int, int], int] = defaultdict(int)
    n: dict[int, int] = defaultdict(int)
    for v, lab in zip(
        t["embedding"].to_pylist(), t["label"].to_pylist()
    ):
        n[lab] += 1
        for pos, x in enumerate(v):
            s[(lab, pos)] += int(round_half_up(x * 1000, 0))
    dims = 64
    import math

    gcent = {
        pos: math.floor(
            sum(s[(lab, pos)] for lab in n) / sum(n.values())
        )
        for pos in range(dims)
    }
    want = {}
    for lab in n:
        drift = sum(
            (math.floor(s[(lab, pos)] / n[lab]) - gcent[pos]) ** 2
            for pos in range(dims)
        )
        want[lab] = (n[lab], drift)

    out = REGISTRY["embedding_centroid_drift"].fn(spark, sf_dir).collect()
    got = {r["label"]: (r["n_vectors"], r["drift_sq"]) for r in out}
    assert got == want
