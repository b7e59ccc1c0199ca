"""Round-11 third opinions, part 5 — simhash, repetition ratio,
profiling histogram, and lag/lead gaps reconstructed in pure Python.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.operators.dedup import SIMHASH_BITS
from tests.mirrors import (
    round_half_up as _round_half_up,
    string_shingles,
    ts_us,
    word_hash32 as _wh32,
    words_of as _words,
)
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401
import mapreduceframework_spark.plans.window_queries  # noqa: F401
import mapreduceframework_spark.plans.analytics_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

SIMHASH_BAND_BITS = 8


@pytest.mark.parametrize("sf_dir", SFS)
def test_dedup_simhash_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sims: dict[int, int] = {}
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        ws = _words(text)
        if ws is None:
            continue
        hs = [_wh32(w) for w in ws]
        n = len(hs)
        sim = 0
        for b in range(SIMHASH_BITS):
            hits = sum(1 for x in hs if (x >> b) & 1)
            if 2 * hits > n:  # tie -> clear, multiplicity-weighted
                sim |= 1 << b
        sims[int(did)] = sim
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for did, sim in sims.items():
        for band in range(SIMHASH_BITS // SIMHASH_BAND_BITS):
            buckets[
                (band, (sim >> (band * SIMHASH_BAND_BITS)) % 256)
            ].append(did)
    expected = {}
    seen: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                h = bin(sims[a] ^ sims[b]).count("1")
                if h <= 3:
                    expected[(a, b)] = h

    out = REGISTRY["dedup_simhash"].fn(spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert got == expected
    assert expected, "no simhash pairs — the check proved nothing"


@pytest.mark.parametrize("sf_dir", SFS)
def test_text_repetition_ratio_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    expected = {}
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        ws = _words(text)
        if ws is None:
            continue
        sh = string_shingles(ws, 3)
        total, dis = len(sh), len(set(sh))
        ratio = 0.0 if total == 0 else _round_half_up(
            1.0 - dis / float(total), 6
        )
        expected[int(did)] = (total, dis, ratio)

    out = REGISTRY["text_repetition_ratio"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_distinct"], r["rep_ratio"])
        for r in out
    }
    assert got == expected
    # The signal's point: some documents actually repeat.
    assert any(r[2] > 0 for r in expected.values())


@pytest.mark.parametrize("sf_dir", SFS)
def test_profile_numeric_histogram_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )
    v = t["o_totalprice"].to_numpy()
    lo, hi = float(v.min()), float(v.max())
    width = max((hi - lo) / 20.0, 1e-12)
    agg: dict[int, list] = defaultdict(lambda: [0, 0.0])
    for x in v:
        b = min(int(math.floor((float(x) - lo) / width)), 19)
        agg[b][0] += 1
        agg[b][1] += float(x)

    out = (
        REGISTRY["profile_numeric_histogram"].fn(spark, sf_dir).collect()
    )
    got = {r["bin"]: (r["n_orders"], r["total_price"]) for r in out}
    assert set(got) == set(agg)
    for b, (n, s) in agg.items():
        gn, gs = got[b]
        assert gn == n, b
        # Rounded-2dp sum of doubles: summation order is engine
        # nondeterminism, so half a cent is the honest claim.
        assert abs(gs - _round_half_up(s, 2)) <= 0.005 + 1e-9, b


@pytest.mark.parametrize("sf_dir", SFS)
def test_window_lag_lead_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    ts = ts_us(t["ts"])
    per_user: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for u, eid, x in zip(
        t["user_id"].to_numpy(), t["event_id"].to_numpy(), ts
    ):
        per_user[int(u)].append((int(x), int(eid)))
    expected = {}
    for u, rows_ in per_user.items():
        rows_.sort()  # (ts, event_id) — the window's order
        for i, (x, eid) in enumerate(rows_):
            prev = rows_[i - 1][0] if i > 0 else None
            nxt = rows_[i + 1][0] if i + 1 < len(rows_) else None
            expected[(u, eid)] = (
                None if prev is None else x - prev,
                None if nxt is None else nxt - x,
            )

    out = REGISTRY["window_lag_lead"].fn(spark, sf_dir).collect()
    got = {
        (r["user_id"], r["event_id"]): (r["gap_prev_us"], r["gap_next_us"])
        for r in out
    }
    assert got == expected
