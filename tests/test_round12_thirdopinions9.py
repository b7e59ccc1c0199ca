"""Round-12 third opinions, part 9 — the window-function family
reconstructed in pure Python from raw parquet, asserted equal to the
engine at sf0.001 AND sf0.01:

- window_rank_dense_percent: rank / dense_rank / percent_rank /
  cume_dist / ntile(4) recomputed from first principles over the
  (price DESC, key) total order;
- window_ntile_cume: the ntile bucket-size rule ((n mod k) leading
  buckets get one extra row) and exact-ratio cume_dist;
- window_moving_avg: the 4-row bounded frame over exact cents with
  the full 4-key total order (the non-unique-ORDER-BY lesson), ma4
  compared as a row multiset because (suppkey, orderkey, linenumber)
  is not a key;
- window_range_frame: the 5-minute RANGE frame including equal-ts
  peers AFTER the current row (the peers-share-frames semantics a
  ROWS mirror would get wrong), exact BIGINT rolling sums;
- window_value_functions: first/last/nth_value(2) over the unbounded
  frame per customer;
- cube_counts / pivot_status_by_priority: all four grouping sets and
  the explicit-value pivot recomputed with dicts (exact counts only —
  the float-sum grouping rows are oracle territory).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, ts_us

import mapreduceframework_spark.plans.window_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _ntile_of(rn: int, n: int, k: int) -> int:
    """Bucket of 1-based row number rn among n rows split into k tiles:
    the first n % k buckets hold n//k + 1 rows."""
    big = n // k + 1
    cut = (n % k) * big
    if rn <= cut:
        return (rn - 1) // big + 1
    return (rn - cut - 1) // (n // k) + 1 + n % k


# ---------------------------------------------------------------------------
# window_rank_dense_percent / window_ntile_cume
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_rank_family_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    parts: dict[str, list[tuple[float, int]]] = defaultdict(list)
    for ok, pr, tp in zip(
        t["o_orderkey"].to_pylist(),
        t["o_orderpriority"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        parts[pr].append((tp, ok))

    want = {}
    for pr, rows in parts.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        n = len(rows)
        for i, (tp, ok) in enumerate(rows, start=1):
            # Peer groups are the FULL ORDER BY tuple (price DESC,
            # key), and the key makes the ordering total — so every
            # row is its own peer group and the whole rank family
            # degenerates to positional forms: rank = dense_rank =
            # row_number = i, percent_rank = (i-1)/(n-1), cume_dist =
            # i/n. (A price-only peer model disagrees the moment two
            # orders share a price, which happens at sf0.01 — the
            # engines' semantics are tuple-peers, verified here.)
            prnk = 0.0 if n == 1 else (i - 1) / (n - 1)
            want[ok] = (
                i,
                i,
                round_half_up(prnk, 6),
                round_half_up(i / n, 6),
                _ntile_of(i, n, 4),
            )

    out = REGISTRY["window_rank_dense_percent"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (
            r["rnk"],
            r["drnk"],
            r["prnk"],
            r["cdist"],
            r["quartile"],
        )
        for r in out
    }
    assert got == want


def test_rank_tie_semantics_on_synthetic_peers(spark):
    """The registry row's ORDER BY includes the unique key, so its
    rank/dense_rank degenerate to row_number (asserted above) and tie
    semantics are never exercised there. Pin the classic tied-peer
    behavior on a synthetic frame so a regression in the rank family
    itself cannot hide behind the total ordering."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 20), ("d", 30)], ["k", "v"]
    )
    w = Window.orderBy("v")
    out = {
        r["k"]: (r["rnk"], r["drnk"], r["prnk"], r["cdist"])
        for r in df.select(
            "k",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
        ).collect()
    }
    assert out == {
        "a": (1, 1, 0.0, 0.25),
        "b": (2, 2, 1 / 3, 0.75),  # peers: last-peer position 3 of 4
        "c": (2, 2, 1 / 3, 0.75),
        "d": (4, 3, 1.0, 1.0),
    }


@pytest.mark.parametrize("sf_dir", SFS)
def test_ntile_cume_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    parts: dict[str, list[tuple[float, int]]] = defaultdict(list)
    for ok, pr, tp in zip(
        t["o_orderkey"].to_pylist(),
        t["o_orderpriority"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        parts[pr].append((tp, ok))
    want = {}
    for pr, rows in parts.items():
        rows.sort()
        n = len(rows)
        for i, (tp, ok) in enumerate(rows, start=1):
            want[ok] = (_ntile_of(i, n, 4), i / n)

    out = REGISTRY["window_ntile_cume"].fn(spark, sf_dir).collect()
    got = {r["o_orderkey"]: (r["quartile"], r["cume"]) for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# window_moving_avg — multiset compare, the output id is not a key
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_moving_avg_matches_python_frames(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_extendedprice",
        ],
    )
    ship = t["l_shipdate"].to_pylist()
    parts: dict[int, list] = defaultdict(list)
    for sk, ok, ln, sd, ep in zip(
        t["l_suppkey"].to_pylist(),
        t["l_orderkey"].to_pylist(),
        t["l_linenumber"].to_pylist(),
        ship,
        t["l_extendedprice"].to_pylist(),
    ):
        cents = int(round_half_up(ep * 100, 0))
        parts[sk].append((sd, ok, ln, cents))

    want = []
    for sk, rows in parts.items():
        rows.sort()
        for i, (sd, ok, ln, cents) in enumerate(rows):
            frame = rows[max(0, i - 3) : i + 1]
            s = sum(r[3] for r in frame)
            ma4 = round_half_up(float(s) / float(len(frame) * 100), 4)
            want.append((sk, ok, ln, ma4))
    want.sort()

    out = REGISTRY["window_moving_avg"].fn(spark, sf_dir).collect()
    got = sorted(
        (r["l_suppkey"], r["l_orderkey"], r["l_linenumber"], r["ma4"])
        for r in out
    )
    assert got == want


# ---------------------------------------------------------------------------
# window_range_frame — peers at equal ts share frames
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_range_frame_matches_python_intervals(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    per_user: dict[str, list[tuple[int, int, int]]] = defaultdict(list)
    for eid, uid, us, val in zip(
        t["event_id"].to_pylist(),
        t["user_id"].to_pylist(),
        ts_us(t["ts"]).tolist(),
        t["value"].to_pylist(),
    ):
        per_user[uid].append((us, eid, int(round_half_up(val * 10_000, 0))))

    want = {}
    for uid, rows in per_user.items():
        rows.sort()
        tss = [r[0] for r in rows]
        import bisect

        for us, eid, _ in rows:
            lo = bisect.bisect_left(tss, us - 300_000_000)
            hi = bisect.bisect_right(tss, us)  # includes equal-ts peers
            s = sum(r[2] for r in rows[lo:hi])
            want[eid] = (float(s) / 10000.0, hi - lo)

    out = REGISTRY["window_range_frame"].fn(spark, sf_dir).collect()
    got = {r["event_id"]: (r["val_5min"], r["n_5min"]) for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# window_value_functions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_value_functions_match_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    parts: dict[int, list] = defaultdict(list)
    for ok, ck, od, tp in zip(
        t["o_orderkey"].to_pylist(),
        t["o_custkey"].to_pylist(),
        t["o_orderdate"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        parts[ck].append((od, ok, tp))

    want = {}
    for ck, rows in parts.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        first = round_half_up(rows[0][2], 2)
        last = round_half_up(rows[-1][2], 2)
        second = (
            round_half_up(rows[1][2], 2) if len(rows) >= 2 else None
        )
        for _, ok, _ in rows:
            want[ok] = (first, last, second)

    out = REGISTRY["window_value_functions"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (r["first_price"], r["last_price"],
                          r["second_price"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# cube_counts / pivot_status_by_priority
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_cube_counts_matches_python_grouping_sets(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )
    want: dict[tuple, int] = defaultdict(int)
    for st, pr in zip(
        t["o_orderstatus"].to_pylist(), t["o_orderpriority"].to_pylist()
    ):
        for key in ((st, pr), (st, None), (None, pr), (None, None)):
            want[key] += 1

    out = REGISTRY["cube_counts"].fn(spark, sf_dir).collect()
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): r["n"] for r in out
    }
    assert got == dict(want)


@pytest.mark.parametrize("sf_dir", SFS)
def test_pivot_matches_python_counts(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for st, pr in zip(
        t["o_orderstatus"].to_pylist(), t["o_orderpriority"].to_pylist()
    ):
        idx = {"F": 0, "O": 1, "P": 2}.get(st)
        if idx is not None:
            want[pr][idx] += 1

    out = REGISTRY["pivot_status_by_priority"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderpriority"]: [r["f_cnt"], r["o_cnt"], r["p_cnt"]]
        for r in out
    }
    assert got == dict(want)
