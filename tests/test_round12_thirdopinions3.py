"""Round-12 third opinions, part 3 — front-loading the refresh cohort
that leads round 13 (the r07 remainder), the proven round-11 pattern:
pure-Python reconstructions of the rows whose math is one formula deep
and has never had an independent derivation, asserted equal to the
engine at sf0.001 AND sf0.01:

- timeseries_ewma: the dyadic alpha=1/2 fold replayed as a plain
  Python float loop (bit-identical IEEE halvings);
- timeseries_forward_fill / timeseries_interpolate: the sparse grid,
  LOCF, and linear interpolation re-derived with dicts;
- stats_ks_two_sample: the pooled-support sup |F1 - F2| in exact ints;
- stats_chi_square_independence: the (o*n - rt*ct)^2/(rt*ct*n) fold in
  the engine's exact (f, s)-sorted IEEE summation order;
- stats_bootstrap_poisson_ci: all 64 deterministic Poisson replicates
  replayed (hash, inverse CDF, weighted means, rank-2/63 bounds);
- window_rolling_distinct_users: the 7-day DAU window as set unions;
- skyline_pareto_frontier: the literal quadratic dominance definition
  (checking the per-size-class rewrite the engine uses);
- quality_label_balance: exact shares + the rational Gini.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401
import mapreduceframework_spark.plans.ann_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_POIS_T = (367879, 735759, 919699, 981012, 996340, 999406)


def _events(sf_dir: str, cols: list[str]):
    return pq.read_table(f"{sf_dir}/events.parquet", columns=cols)


def _snap_e4(x: float) -> int:
    return int(round_half_up(x * 10_000, 0))


@pytest.mark.parametrize("sf_dir", SFS)
def test_timeseries_ewma_matches_python_fold(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "ts", "event_id", "value"])
    per_user: dict[int, list[tuple[int, int, float]]] = defaultdict(list)
    for u, us, eid, v in zip(
        t["user_id"].to_pylist(), ts_us(t["ts"]).tolist(),
        t["event_id"].to_pylist(), t["value"].to_pylist(),
    ):
        per_user[u].append((us, eid, v))
    want = {}
    for u, rows in per_user.items():
        vals = [v for _, _, v in sorted(rows)]
        s = vals[0]
        for x in vals[1:]:
            s = (s + x) / 2  # dyadic halving: bit-identical IEEE
        want[u] = (len(vals), s)

    out = REGISTRY["timeseries_ewma"].fn(spark, sf_dir).collect()
    got = {r["user_id"]: (r["n_events"], r["ewma"]) for r in out}
    assert got == want


def _sparse_grid_py(sf_dir: str):
    """(type -> {bucket_s: v4}) plus each type's dense bucket list —
    the _SPARSE_GRID_SQL recipe with dicts."""
    t = _events(sf_dir, ["event_type", "ts", "value"])
    cells: dict[tuple[str, int], list[int]] = defaultdict(list)
    for typ, us, v in zip(
        t["event_type"].to_pylist(), ts_us(t["ts"]).tolist(),
        t["value"].to_pylist(),
    ):
        cells[(typ, (us // 300_000_000) * 300)].append(_snap_e4(v))
    sparse: dict[str, dict[int, int]] = defaultdict(dict)
    for (typ, b), vs in cells.items():
        # Exact half-up integer mean — the (2s + n) // (2n) identity,
        # same as the engine's int_round_mean finisher (round 14); a
        # float-quotient round here would reintroduce the 1-ulp class
        # the conversion killed.
        sparse[typ][b] = (2 * sum(vs) + len(vs)) // (2 * len(vs))
    grids = {
        typ: list(range(min(bs), max(bs) + 1, 300))
        for typ, bs in sparse.items()
    }
    return sparse, grids


@pytest.mark.parametrize("sf_dir", SFS)
def test_timeseries_forward_fill_matches_python_locf(spark, sf_dir):
    sparse, grids = _sparse_grid_py(sf_dir)
    want = {}
    for typ, grid in grids.items():
        last = None
        for b in grid:
            v4 = sparse[typ].get(b)
            if v4 is not None:
                last = v4
            want[(typ, b)] = (last / 10000.0, v4 is not None)

    out = REGISTRY["timeseries_forward_fill"].fn(spark, sf_dir).collect()
    got = {
        (r["event_type"], r["bucket_s"]): (r["filled"], r["observed"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_timeseries_interpolate_matches_python_linear(spark, sf_dir):
    sparse, grids = _sparse_grid_py(sf_dir)
    want = {}
    for typ, grid in grids.items():
        obs = sorted(sparse[typ])
        for b in grid:
            v4 = sparse[typ].get(b)
            if v4 is not None:
                i4 = v4
            else:
                prev_b = max(x for x in obs if x < b)  # grid starts observed
                nxt = [x for x in obs if x > b]
                if not nxt:
                    i4 = sparse[typ][prev_b]  # trailing gap: LOCF
                else:
                    next_b = nxt[0]
                    p4, n4 = sparse[typ][prev_b], sparse[typ][next_b]
                    i4 = p4 + int(
                        round_half_up(
                            ((n4 - p4) * (b - prev_b)) / (next_b - prev_b), 0
                        )
                    )
            want[(typ, b)] = (i4 / 10000.0, v4 is not None)

    out = REGISTRY["timeseries_interpolate"].fn(spark, sf_dir).collect()
    got = {
        (r["event_type"], r["bucket_s"]): (r["interp"], r["observed"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_stats_ks_two_sample_matches_python_ecdf(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "value"])
    a: dict[int, int] = defaultdict(int)
    b: dict[int, int] = defaultdict(int)
    for typ, v in zip(
        t["event_type"].to_pylist(), t["value"].to_pylist()
    ):
        if typ == "click":
            a[_snap_e4(v)] += 1
        elif typ == "view":
            b[_snap_e4(v)] += 1
    n1, n2 = sum(a.values()), sum(b.values())
    c1 = c2 = 0
    dnum = 0
    for v in sorted(set(a) | set(b)):
        c1 += a.get(v, 0)
        c2 += b.get(v, 0)
        dnum = max(dnum, abs(c1 * n2 - c2 * n1))
    want = (n1, n2, int(round_half_up(1000000.0 * dnum / (n1 * n2), 0)))

    out = REGISTRY["stats_ks_two_sample"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n1"], r["n2"], r["ks_d_e6"]) == want
    # KS is a normalized sup-difference: 0 <= D <= 1.
    assert 0 <= r["ks_d_e6"] <= 1_000_000


@pytest.mark.parametrize("sf_dir", SFS)
def test_stats_chi_square_matches_python_fold(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus"],
    )
    obs: dict[tuple[str, str], int] = defaultdict(int)
    for f_, s_ in zip(
        t["l_returnflag"].to_pylist(), t["l_linestatus"].to_pylist()
    ):
        obs[(f_, s_)] += 1
    rt: dict[str, int] = defaultdict(int)
    ct: dict[str, int] = defaultdict(int)
    for (f_, s_), o in obs.items():
        rt[f_] += o
        ct[s_] += o
    n = sum(obs.values())
    chi2 = 0.0
    # The engine folds the (f, s)-sorted term array sequentially —
    # replay the identical IEEE summation order.
    for f_, s_ in sorted(obs):
        d = float(obs[(f_, s_)] * n - rt[f_] * ct[s_])
        den = float(rt[f_] * ct[s_] * n)
        chi2 = chi2 + (d * d / den)
    want = (
        int(round_half_up(chi2 * 1000000, 0)),
        (len(rt) - 1) * (len(ct) - 1),
    )

    out = REGISTRY["stats_chi_square_independence"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    assert (out[0]["chi2_e6"], out[0]["dof"]) == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_stats_bootstrap_poisson_ci_matches_python_replay(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    rows = list(
        zip(
            t["o_orderkey"].to_pylist(), t["o_orderpriority"].to_pylist(),
            t["o_totalprice"].to_pylist(),
        )
    )

    def pois_w(m: int) -> int:
        for k, thr in enumerate(_POIS_T):
            if m < thr:
                return k
        return 6

    ws: dict[tuple[str, int], int] = defaultdict(int)
    wn: dict[tuple[str, int], int] = defaultdict(int)
    s_cents: dict[str, int] = defaultdict(int)
    n_ord: dict[str, int] = defaultdict(int)
    for k, p, x in rows:
        c = int(round_half_up(x * 100, 0))
        s_cents[p] += c
        n_ord[p] += 1
        for rep in range(1, 65):
            w = pois_w((k * 2654435761 + rep * 40503) % 1000000)
            ws[(p, rep)] += w * c
            wn[(p, rep)] += w
    want = {}
    for p in n_ord:
        ests = sorted(
            (ws[(p, rep)] / (100.0 * wn[(p, rep)]), rep)
            for rep in range(1, 65)
            if wn[(p, rep)] > 0
        )
        want[p] = (
            n_ord[p],
            s_cents[p] / (100.0 * n_ord[p]),
            ests[1][0],   # rank 2 of 64
            ests[62][0],  # rank 63 of 64
        )

    out = REGISTRY["stats_bootstrap_poisson_ci"].fn(spark, sf_dir).collect()
    got = {
        r["priority"]: (r["n_orders"], r["point_mean"], r["ci_lo"], r["ci_hi"])
        for r in out
    }
    assert got == want
    # A bootstrap CI must bracket sanely: lo <= hi.
    for _, _, lo, hi in got.values():
        assert lo <= hi


@pytest.mark.parametrize("sf_dir", SFS)
def test_window_rolling_distinct_users_matches_python_sets(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "ts"])
    by_day: dict[int, set[int]] = defaultdict(set)
    for u, us in zip(t["user_id"].to_pylist(), ts_us(t["ts"]).tolist()):
        by_day[us // 86_400_000_000].add(u)
    from datetime import datetime, timezone

    want = {}
    for d in by_day:
        users: set[int] = set()
        for k in range(d - 6, d + 1):
            users |= by_day.get(k, set())
        day = datetime.fromtimestamp(d * 86_400, tz=timezone.utc).strftime(
            "%Y-%m-%d"
        )
        want[day] = len(users)

    out = REGISTRY["window_rolling_distinct_users"].fn(spark, sf_dir).collect()
    got = {r["day"]: r["users_7d"] for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_skyline_matches_quadratic_dominance(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    )
    pts = list(
        zip(
            t["p_partkey"].to_pylist(), t["p_size"].to_pylist(),
            t["p_retailprice"].to_pylist(),
        )
    )
    # The literal ICDE'01 definition, not the per-size-class rewrite.
    want = {
        (k, s, pr)
        for k, s, pr in pts
        if not any(
            qp <= pr and qs >= s and (qp < pr or qs > s)
            for _, qs, qp in pts
        )
    }

    out = REGISTRY["skyline_pareto_frontier"].fn(spark, sf_dir).collect()
    got = {(r["p_partkey"], r["p_size"], r["p_retailprice"]) for r in out}
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("sf_dir", SFS)
def test_quality_label_balance_matches_python_gini(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["label"])
    c: dict[int, int] = defaultdict(int)
    for lab in t["label"].to_pylist():
        c[lab] += 1
    n = sum(c.values())
    sq = sum(x * x for x in c.values())
    gini = int(round_half_up(1000000.0 * (n * n - sq) / (n * n), 0))
    want = {
        lab: (
            x,
            int(round_half_up(1000000.0 * x / n, 0)),
            gini,
        )
        for lab, x in c.items()
    }

    out = REGISTRY["quality_label_balance"].fn(spark, sf_dir).collect()
    got = {
        r["label"]: (r["n_label"], r["share_e6"], r["gini_e6"]) for r in out
    }
    assert got == want
