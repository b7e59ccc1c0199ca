"""Round-12 third opinions, part 6 — the stats/events rows whose math
is one formula deep but had no engine-independent derivation yet
(the Mann-Whitney lesson applied to the rest of its own family),
reconstructed in pure Python from the raw parquet tables and asserted
equal to the engine at sf0.001 AND sf0.01:

- stats_mann_whitney_u: the row that burned us in r11 finally gets a
  full mirror — the histogram-pair U2 formula recomputed with dicts,
  PLUS a second independent derivation of the same quantity through
  pooled MIDRANKS (2U = 2R_B - nb(nb+1)), the combined tie correction
  summed over (pair, value) groups, and the z tree replayed on the
  exact integers;
- stats_welch_ttest: exact (n, Σv, Σv²) moments and the identical
  IEEE expression trees for t and the Welch–Satterthwaite df;
- stats_cusum_drift: the SERIAL recursion S_i = max(0, S_{i-1} + y_i)
  — the definition the engine's bucketed prefix-sum identity must
  reproduce — walked row by row in time order;
- events_peak_concurrency: the serial sweep-line (sort endpoints,
  running sum, max) the bucketed two-phase stitch must equal;
- timeseries_autocorrelation: the n²-cleared ACF numerator/denominator
  accumulated as exact Python ints per (type, day, lag);
- regression_by_event_type: the five exact moments and the closed-form
  slope, including the den = 0 NULL convention;
- events_diff_in_diff: treated-set membership, pre/post split, exact
  e4 cell means via floor(s/n + 0.5), and the integer 2x2 contrast.

Every float expression replays the engine's exact IEEE tree over the
same exact integers (Python doubles are the same IEEE-754 doubles),
and every final rounding uses the shared HALF_UP-by-shortest-repr
mirror, so the asserts are equality, not tolerance.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.analytics_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _events(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/events.parquet", columns=cols)


def _snap(x: float, scale: int) -> int:
    """snap_units mirror: ROUND(x * scale) as BIGINT, half-up by
    shortest decimal repr (plans/exact.py)."""
    return int(round_half_up(x * scale, 0))


# ---------------------------------------------------------------------------
# stats_mann_whitney_u
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_mann_whitney_matches_python_histogram_and_midranks(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "value"])
    hist: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for typ, val in zip(
        t["event_type"].to_pylist(), t["value"].to_pylist()
    ):
        hist[typ][_snap(val, 100)] += 1

    types = sorted(hist)
    want = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ha, hb = hist[ta], hist[tb]
            vals = sorted(set(ha) | set(hb))
            na = sum(ha.values())
            nb = sum(hb.values())
            # Route 1: the histogram-pair formula (engine's own shape,
            # recomputed with plain ints).
            u2a = 0
            tie3 = 0
            cum_a = 0
            # Route 2: pooled midranks — 2*R_B in doubled units.
            two_rb = 0
            cum_all = 0
            for v in vals:
                ca, cb = ha.get(v, 0), hb.get(v, 0)
                u2a += cb * (2 * cum_a + ca)
                tt = ca + cb
                tie3 += tt * tt * tt - tt
                two_rb += cb * (2 * cum_all + tt + 1)
                cum_a += ca
                cum_all += tt
            # The two independent derivations must agree EXACTLY:
            # U2_A = 2*(R_B - nb(nb+1)/2).
            assert u2a == two_rb - nb * (nb + 1)
            n = na + nb
            if not (na > 0 and nb > 0 and tie3 < n**3 - n):
                continue
            sigma = math.sqrt(
                (float(na) * float(nb) / 12.0)
                * (
                    float(n + 1)
                    - float(tie3) / (float(n) * float(n - 1))
                )
            )
            z = (float(u2a) - float(na) * float(nb)) / (2.0 * sigma)
            want[(ta, tb)] = (
                na,
                nb,
                u2a,
                int(round_half_up(z * 1_000_000, 0)),
            )

    out = REGISTRY["stats_mann_whitney_u"].fn(spark, sf_dir).collect()
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_a"],
            r["n_b"],
            r["u2a"],
            r["z_e6"],
        )
        for r in out
    }
    assert got == want
    # All 5 types present at every SF -> all 10 pairs survive the
    # degenerate-variance filter in this corpus.
    assert len(got) == len(types) * (len(types) - 1) // 2


# ---------------------------------------------------------------------------
# stats_welch_ttest
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_welch_ttest_matches_python_moments(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "value"])
    mom: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for typ, val in zip(
        t["event_type"].to_pylist(), t["value"].to_pylist()
    ):
        v = _snap(val, 100)
        m = mom[typ]
        m[0] += 1
        m[1] += v
        m[2] += v * v

    stats = {}
    for typ, (n, s1, s2) in mom.items():
        nd = float(n)
        mean_e2 = float(s1) / nd
        var_e4 = (float(s2) - float(s1) * float(s1) / nd) / float(n - 1)
        stats[typ] = (n, mean_e2, var_e4)

    want = {}
    for ta in sorted(stats):
        for tb in sorted(stats):
            if not ta < tb:
                continue
            na, ma, va = stats[ta]
            nb, mb, vb = stats[tb]
            sa = va / float(na)
            sb = vb / float(nb)
            se2 = sa + sb
            if not (na > 1 and nb > 1 and se2 > 0):
                continue
            t_stat = round_half_up((ma - mb) / math.sqrt(se2), 6)
            df = round_half_up(
                se2 * se2
                / (sa * sa / float(na - 1) + sb * sb / float(nb - 1)),
                6,
            )
            want[(ta, tb)] = (na, nb, t_stat, df)

    out = REGISTRY["stats_welch_ttest"].fn(spark, sf_dir).collect()
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_a"],
            r["n_b"],
            r["t_stat"],
            r["df_welch"],
        )
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# stats_cusum_drift — the serial recursion vs the prefix-sum identity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_cusum_drift_matches_serial_recursion(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "ts", "event_id", "value"])
    rows = sorted(
        zip(
            t["event_type"].to_pylist(),
            ts_us(t["ts"]).tolist(),
            t["event_id"].to_pylist(),
            t["value"].to_pylist(),
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )
    want: dict[str, tuple[int, int, int]] = {}
    state: dict[str, list[int]] = {}
    for typ, _, _, val in rows:
        y = _snap(val, 10_000) - 500_000
        n, s, mx = state.get(typ, (0, 0, 0))
        # Page's CUSUM recursion, literally.
        s = max(0, s + y)
        state[typ] = [n + 1, s, max(mx, s)]
    for typ, (n, s, mx) in state.items():
        want[typ] = (n, s, mx)

    out = REGISTRY["stats_cusum_drift"].fn(spark, sf_dir).collect()
    got = {
        r["event_type"]: (r["n"], r["final_cusum_e4"], r["max_cusum_e4"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# events_peak_concurrency — the serial sweep line
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_peak_concurrency_matches_serial_sweep(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "ts"])
    endpoints: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for typ, ts in zip(t["event_type"].to_pylist(), ts_us(t["ts"]).tolist()):
        endpoints[typ].append((ts, 1))
        endpoints[typ].append((ts + 1_800_000_000, -1))
    want = {}
    for typ, pts in endpoints.items():
        # (t, delta) order: closes before opens at the same instant —
        # half-open interval semantics.
        pts.sort()
        c = peak = 0
        for _, d in pts:
            c += d
            peak = max(peak, c)
        assert c == 0  # every open interval closes
        want[typ] = (peak, len(pts) // 2)

    out = REGISTRY["events_peak_concurrency"].fn(spark, sf_dir).collect()
    got = {
        r["event_type"]: (r["peak_concurrency"], r["n_intervals"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# timeseries_autocorrelation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_autocorrelation_matches_python_exact_moments(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "ts", "event_id", "value"])
    tsv = ts_us(t["ts"])
    series: dict[tuple[str, str], list[tuple[int, int, int]]] = defaultdict(
        list
    )
    for typ, us, eid, val in zip(
        t["event_type"].to_pylist(),
        tsv.tolist(),
        t["event_id"].to_pylist(),
        t["value"].to_pylist(),
    ):
        day = str(np.datetime64(us, "us").astype("datetime64[D]"))
        series[(typ, day)].append((us, eid, _snap(val, 100)))

    want = {}
    for (typ, day), rows in series.items():
        rows.sort()
        v = [x[2] for x in rows]
        n = len(v)
        s = sum(v)
        den = sum((n * x - s) ** 2 for x in v)
        for lag in (1, 2, 3):
            if n <= lag or den == 0:
                continue
            num = sum(
                (n * v[i] - s) * (n * v[i - lag] - s)
                for i in range(lag, n)
            )
            want[(typ, day, lag)] = (
                n,
                int(round_half_up(float(num) / float(den) * 1_000_000, 0)),
            )

    out = REGISTRY["timeseries_autocorrelation"].fn(spark, sf_dir).collect()
    got = {
        (r["event_type"], r["day"], r["lag"]): (r["n"], r["acf_e6"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# regression_by_event_type
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_regression_slope_matches_python_exact_moments(spark, sf_dir):
    t = _events(sf_dir, ["event_type", "ts", "value"])
    pts: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for typ, us, val in zip(
        t["event_type"].to_pylist(),
        ts_us(t["ts"]).tolist(),
        t["value"].to_pylist(),
    ):
        # unix_micros(ts) DIV 1000000 — floor division, exact.
        pts[typ].append((us // 1_000_000, _snap(val, 10_000)))

    want = {}
    for typ, rows in pts.items():
        t0 = min(x for x, _ in rows)
        n = len(rows)
        sx = sy = sxy = sxx = 0
        for xs, y in rows:
            x = xs - t0
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = (
            int(
                round_half_up(
                    float(num) / float(den) * 86400 * 1_000_000, 0
                )
            )
            if den != 0
            else None
        )
        want[typ] = (n, slope)

    out = REGISTRY["regression_by_event_type"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: (r["n"], r["slope_per_day_e10"]) for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# events_diff_in_diff
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_diff_in_diff_matches_python_cells(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "event_type", "ts", "value"])
    types = t["event_type"].to_pylist()
    users = t["user_id"].to_pylist()
    tsv = ts_us(t["ts"])
    vals = t["value"].to_pylist()

    # r13 treatment definition: EARLY ADOPTERS — first signup before
    # 2024-01-03 (the r12 ever-signed-up definition left control empty
    # at every SF; VERDICT r12 gap 3).
    adopt_cutoff_us = int(
        np.datetime64("2024-01-03", "us").astype("datetime64[us]").astype(
            np.int64
        )
    )
    first_signup: dict[int, int] = {}
    for u, ty, us in zip(users, types, tsv.tolist()):
        if ty == "signup" and (u not in first_signup or us < first_signup[u]):
            first_signup[u] = us
    treated = {u for u, us in first_signup.items() if us < adopt_cutoff_us}
    cutoff_us = int(
        np.datetime64("2024-01-16", "us").astype("datetime64[us]").astype(
            np.int64
        )
    )
    cells: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for u, ty, us, val in zip(users, types, tsv.tolist(), vals):
        if ty != "purchase":
            continue
        grp = "treated" if u in treated else "control"
        period = "post" if us >= cutoff_us else "pre"
        c = cells[(grp, period)]
        c[0] += _snap(val, 10_000)
        c[1] += 1

    def mean_e4(grp, period):
        if (grp, period) not in cells:
            return None
        s, n = cells[(grp, period)]
        # r13 integer-domain half-up mean (plans/exact.py
        # int_round_mean): (2*s + n) // (2*n), no double anywhere.
        return (2 * s + n) // (2 * n)

    mt_pre = mean_e4("treated", "pre")
    mt_post = mean_e4("treated", "post")
    mc_pre = mean_e4("control", "pre")
    mc_post = mean_e4("control", "post")
    n_purchases = sum(n for _, n in cells.values())
    did = (
        (mt_post - mt_pre) - (mc_post - mc_pre)
        if None not in (mt_pre, mt_post, mc_pre, mc_post)
        else None
    )
    # The whole point of the r13 fix: all FOUR cells are live at every
    # SF, so the DiD contrast itself engages (did is a real number).
    assert None not in (mt_pre, mt_post, mc_pre, mc_post)
    assert did is not None

    out = REGISTRY["events_diff_in_diff"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r["mt_pre"],
        r["mt_post"],
        r["mc_pre"],
        r["mc_post"],
        r["n_purchases"],
        r["did_e4"],
    ) == (mt_pre, mt_post, mc_pre, mc_post, n_purchases, did)
