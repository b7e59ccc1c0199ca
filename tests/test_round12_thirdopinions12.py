"""Round-12 third opinions, part 12 — the remaining TRUE-streaming rows
triangulated a third way: the r11 program pinned tumbling / sliding /
session / inner-interval-join; this module reconstructs the other six
streaming value contracts in pure Python from raw parquet and asserts
the STREAMING engine's final emission equals the serial reconstruction
at sf0.001 AND sf0.01:

- streaming_user_counts_stateful: per-user running counts (the
  applyInPandasWithState fold's final state);
- streaming_dedup_keys: first-event-per-(user, type) dedup state;
- streaming_static_enrich: the stream-static dimension join rolled up
  per nation;
- streaming_click_purchase_left_join / _full_join: the interval join
  matrix's eviction-driven null emissions, including the watermark
  cutoff trim (min of both sides' max event time - 61 min) applied
  exactly as the registered queries apply it;
- streaming_threshold_alerts: the ordered per-user cumulative spend
  fold and the first >= 500.0 crossing, alerted-once semantics;
- streaming_foreachbatch_upsert: per-type totals with the
  deliveries = 1 idempotence pin.

These are genuinely third opinions: the driver compares the streaming
engine against DuckDB SQL; here the same emission is recomputed with
dicts and loops, so a shared misreading of the SQL cannot hide.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.streaming_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

THIRTY_MIN_US = 30 * 60 * 1_000_000
CUTOFF_SLACK_US = 61 * 60 * 1_000_000


def _events(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/events.parquet", columns=cols)


@pytest.mark.parametrize("sf_dir", SFS)
def test_stateful_user_counts_match_python(spark, sf_dir):
    t = _events(sf_dir, ["user_id"])
    want: dict[str, int] = defaultdict(int)
    for u in t["user_id"].to_pylist():
        want[u] += 1

    out = REGISTRY["streaming_user_counts_stateful"].fn(spark, sf_dir)
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    assert got == dict(want)


@pytest.mark.parametrize("sf_dir", SFS)
def test_streaming_dedup_matches_python_set(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "event_type"])
    want = set(zip(t["user_id"].to_pylist(), t["event_type"].to_pylist()))

    out = REGISTRY["streaming_dedup_keys"].fn(spark, sf_dir).collect()
    got = {(r["user_id"], r["event_type"]) for r in out}
    assert len(out) == len(got)  # no duplicate emissions
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_static_enrich_matches_python_join(spark, sf_dir):
    t = _events(sf_dir, ["user_id"])
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation_of = dict(
        zip(c["c_custkey"].to_pylist(), c["c_nationkey"].to_pylist())
    )
    want: dict[int, int] = defaultdict(int)
    for u in t["user_id"].to_pylist():
        nk = nation_of.get(u)
        if nk is not None:
            want[nk] += 1

    out = REGISTRY["streaming_static_enrich"].fn(spark, sf_dir).collect()
    got = {r["c_nationkey"]: r["n_events"] for r in out}
    assert got == dict(want)


def _clicks_purchases(sf_dir):
    t = _events(sf_dir, ["user_id", "event_id", "event_type", "ts"])
    clicks, purchases = [], []
    for u, eid, ty, us in zip(
        t["user_id"].to_pylist(),
        t["event_id"].to_pylist(),
        t["event_type"].to_pylist(),
        ts_us(t["ts"]).tolist(),
    ):
        if ty == "click":
            clicks.append((u, eid, us))
        elif ty == "purchase":
            purchases.append((u, eid, us))
    return clicks, purchases


def _sortkey(row):
    return tuple((x is None, x) for x in row)


@pytest.mark.parametrize("sf_dir", SFS)
def test_left_interval_join_matches_python(spark, sf_dir):
    clicks, purchases = _clicks_purchases(sf_dir)
    cutoff = (
        min(max(us for _, _, us in clicks),
            max(us for _, _, us in purchases))
        - CUTOFF_SLACK_US
    )
    by_user: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for u, eid, us in purchases:
        by_user[u].append((us, eid))
    want = []
    for u, cid, cus in clicks:
        if cus > cutoff:
            continue
        matches = [
            pid
            for pus, pid in by_user.get(u, ())
            if cus <= pus <= cus + THIRTY_MIN_US
        ]
        if matches:
            want.extend((u, cid, pid) for pid in matches)
        else:
            want.append((u, cid, None))
    want.sort(key=_sortkey)

    out = (
        REGISTRY["streaming_click_purchase_left_join"]
        .fn(spark, sf_dir)
        .collect()
    )
    got = sorted(
        ((r["user_id"], r["click_id"], r["purchase_id"]) for r in out),
        key=_sortkey,
    )
    assert got == want
    # The eviction semantics genuinely exercised: some clicks have no
    # purchase and emit a null row.
    assert any(pid is None for _, _, pid in want)


@pytest.mark.parametrize("sf_dir", SFS)
def test_full_interval_join_matches_python(spark, sf_dir):
    clicks, purchases = _clicks_purchases(sf_dir)
    cutoff = (
        min(max(us for _, _, us in clicks),
            max(us for _, _, us in purchases))
        - CUTOFF_SLACK_US
    )
    rows = []
    matched_purchases = set()
    p_by_user: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for u, eid, us in purchases:
        p_by_user[u].append((us, eid))
    for u, cid, cus in clicks:
        matches = [
            (pid, pus)
            for pus, pid in p_by_user.get(u, ())
            if cus <= pus <= cus + THIRTY_MIN_US
        ]
        if matches:
            for pid, pus in matches:
                matched_purchases.add(pid)
                rows.append((u, cid, cus, pid, pus))
        else:
            rows.append((u, cid, cus, None, None))
    for u, pid, pus in purchases:
        if pid not in matched_purchases:
            rows.append((u, None, None, pid, pus))
    # Output trim: EVERY non-null event time in the row is stable.
    want = sorted(
        (
            (u, cid, pid)
            for u, cid, cus, pid, pus in rows
            if (cus is None or cus <= cutoff)
            and (pus is None or pus <= cutoff)
        ),
        key=_sortkey,
    )

    out = (
        REGISTRY["streaming_click_purchase_full_join"]
        .fn(spark, sf_dir)
        .collect()
    )
    got = sorted(
        ((r["user_id"], r["click_id"], r["purchase_id"]) for r in out),
        key=_sortkey,
    )
    assert got == want
    # Both eviction directions exercised.
    assert any(cid is None for _, cid, _ in want)
    assert any(pid is None for _, _, pid in want)


@pytest.mark.parametrize("sf_dir", SFS)
def test_threshold_alerts_match_python_fold(spark, sf_dir):
    t = _events(sf_dir, ["user_id", "event_id", "event_type", "ts", "value"])
    per_user: dict[str, list[tuple[int, int, int]]] = defaultdict(list)
    for u, eid, ty, us, val in zip(
        t["user_id"].to_pylist(),
        t["event_id"].to_pylist(),
        t["event_type"].to_pylist(),
        ts_us(t["ts"]).tolist(),
        t["value"].to_pylist(),
    ):
        if ty == "purchase":
            per_user[u].append(
                (us, eid, int(round_half_up(val * 10_000, 0)))
            )
    want = {}
    for u, rows in per_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        cum = 0
        crossings = []
        for _, eid, v in rows:
            cum += v
            if cum >= 5_000_000:
                crossings.append((cum, eid))
        if crossings:
            cum_e4, eid = min(crossings)
            want[u] = (eid, cum_e4)

    out = REGISTRY["streaming_threshold_alerts"].fn(spark, sf_dir).collect()
    got = {
        r["user_id"]: (r["crossing_event_id"], r["cum_e4"]) for r in out
    }
    assert got == want
    assert len(want) > 0  # the alert path genuinely fires


@pytest.mark.parametrize("sf_dir", SFS)
def test_foreachbatch_upsert_matches_python_totals(spark, sf_dir):
    t = _events(sf_dir, ["event_type"])
    want: dict[str, tuple[int, int]] = {}
    counts: dict[str, int] = defaultdict(int)
    for ty in t["event_type"].to_pylist():
        counts[ty] += 1
    for ty, n in counts.items():
        want[ty] = (n, 1)  # deliveries = 1: the idempotence pin

    out = (
        REGISTRY["streaming_foreachbatch_upsert"].fn(spark, sf_dir).collect()
    )
    got = {r["event_type"]: (r["n_events"], r["deliveries"]) for r in out}
    assert got == want
