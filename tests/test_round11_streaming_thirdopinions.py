"""Round-11 third opinions for the streaming family (this round's
refresh cohort): pure-Python reconstructions of the event-time window
SEMANTICS — tumbling alignment, sliding two-window expansion with the
exact integer mean, 6-hour session merging, and the 30-minute
stream-stream interval join. The true-streaming rows share these
oracles with their batch twins, so one engine-independent mirror
triangulates batch DataFrame, the streaming engine, and DuckDB at
once.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.mirrors import ts_us
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.streaming_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

MIN5 = 5 * 60 * 1_000_000
MIN30 = 30 * 60 * 1_000_000
HOUR6 = 6 * 3_600 * 1_000_000


def _events(sf_dir: str, cols: list[str]):
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=cols)
    out = {}
    for c in cols:
        if c == "ts":
            out[c] = ts_us(t["ts"])
        elif c in ("event_type",):
            out[c] = t[c].to_pylist()
        else:
            out[c] = t[c].to_numpy()
    return out


def _e4(values: np.ndarray) -> np.ndarray:
    # snap_units: ROUND half-away-from-zero (values strictly positive
    # in this table, so floor(x + 0.5) mirrors it).
    return np.floor(values * 10_000 + 0.5).astype(np.int64)


@pytest.mark.parametrize("sf_dir", SFS)
def test_tumbling_counts_match_python(spark, sf_dir):
    ev = _events(sf_dir, ["ts", "event_type", "value"])
    v4 = _e4(ev["value"])
    agg: dict[tuple[int, str], list[int]] = defaultdict(lambda: [0, 0])
    for u, et, v in zip(ev["ts"], ev["event_type"], v4):
        k = ((int(u) // MIN5) * MIN5, et)
        agg[k][0] += 1
        agg[k][1] += int(v)
    expected = {k: (c, s / 10000.0) for k, (c, s) in agg.items()}

    for name in ("events_tumbling_counts", "streaming_tumbling_counts"):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        got = {
            (
                int(
                    np.datetime64(r["win_start"], "us").astype(np.int64)
                ),
                r["event_type"],
            ): (r["cnt"], r["sum_value"])
            for r in rows
        }
        assert got == expected, name


@pytest.mark.parametrize("sf_dir", SFS)
def test_sliding_window_avgs_match_python(spark, sf_dir):
    ev = _events(sf_dir, ["ts", "event_type", "value"])
    v4 = _e4(ev["value"])
    agg: dict[tuple[int, str], list[int]] = defaultdict(lambda: [0, 0])
    for u, et, v in zip(ev["ts"], ev["event_type"], v4):
        b = (int(u) // MIN5) * MIN5
        for start in (b, b - MIN5):  # every event in exactly 2 windows
            agg[(start, et)][0] += 1
            agg[(start, et)][1] += int(v)
    # Exact integer mean in e4 units: round-half-up on a nonnegative
    # ratio (both engines compute ROUND(s/c) on exact ints).
    expected = {
        k: (c, ((2 * s + c) // (2 * c)) / 10000.0)
        for k, (c, s) in agg.items()
    }

    for name in ("events_sliding_windows", "streaming_sliding_avgs"):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        got = {
            (
                int(
                    np.datetime64(r["win_start"], "us").astype(np.int64)
                ),
                r["event_type"],
            ): (r["cnt"], r["avg_value"])
            for r in rows
        }
        assert got == expected, name


def _sessions(sf_dir: str) -> dict[tuple[int, int, int], int]:
    """{(user, session_start_us, session_end_us): n_events} with the
    6-hour-gap merge rule (new session when ts - prev >= gap; end =
    last ts + gap — Spark session_window's half-open overlap rule)."""
    ev = _events(sf_dir, ["user_id", "ts"])
    per_user: dict[int, list[int]] = defaultdict(list)
    for u, ts in zip(ev["user_id"], ev["ts"]):
        per_user[int(u)].append(int(ts))
    out: dict[tuple[int, int, int], int] = {}
    for u, tss in per_user.items():
        tss.sort()
        start, prev, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if ts - prev >= HOUR6:
                out[(u, start, prev + HOUR6)] = n
                start, n = ts, 0
            n += 1
            prev = ts
        out[(u, start, prev + HOUR6)] = n
    return out


@pytest.mark.parametrize("sf_dir", SFS)
def test_session_windows_match_python(spark, sf_dir):
    expected = _sessions(sf_dir)
    for name in ("events_session_windows", "streaming_session_counts"):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        got = {
            (
                r["user_id"],
                int(
                    np.datetime64(r["session_start"], "us").astype(
                        np.int64
                    )
                ),
                int(
                    np.datetime64(r["session_end"], "us").astype(np.int64)
                ),
            ): r["n_events"]
            for r in rows
        }
        assert got == expected, name


@pytest.mark.parametrize("sf_dir", SFS)
def test_click_purchase_interval_join_matches_python(spark, sf_dir):
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])
    clicks: dict[int, list[tuple[int, int]]] = defaultdict(list)
    purchases: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for u, ts, et, eid in zip(
        ev["user_id"], ev["ts"], ev["event_type"], ev["event_id"]
    ):
        if et == "click":
            clicks[int(u)].append((int(ts), int(eid)))
        elif et == "purchase":
            purchases[int(u)].append((int(ts), int(eid)))
    expected = set()
    for u, cl in clicks.items():
        for cts, cid in cl:
            for pts, pid in purchases.get(u, ()):
                if cts <= pts <= cts + MIN30:
                    expected.add((u, cid, pid))

    rows = (
        REGISTRY["streaming_click_purchase_join"]
        .fn(spark, sf_dir)
        .collect()
    )
    got = {(r["user_id"], r["click_id"], r["purchase_id"]) for r in rows}
    assert got == expected
    assert expected, "no click->purchase pairs — the check proved nothing"
