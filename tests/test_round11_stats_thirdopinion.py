"""Round-11 third opinion for the Theil-Sen robust regression — the
last stats-family row without an engine-independent reconstruction
(Welch has a numpy cross-check in tests/test_chunk_welch_split.py,
Mann-Whitney a midrank mirror in tests/test_extensions.py). The whole
estimator is rebuilt in pure Python from the raw parquet: exact e4
daily totals, FLOOR(diff/gap + 0.5) slope snapping over the identical
IEEE double division, and the LOWER-median convention (1-based element
(n+1)//2 of the sorted list — never an average of middle pairs).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.mirrors import ts_us
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.analytics_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_EPOCH_1995 = np.datetime64("1995-01-01").astype(
    "datetime64[us]"
).astype(np.int64)
_DAY_US = 86_400_000_000


def _lower_median(values: list[int]) -> int:
    s = sorted(values)
    return s[(len(s) + 1) // 2 - 1]


@pytest.mark.parametrize("sf_dir", SFS)
def test_theil_sen_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    us = ts_us(t["ts"])
    vals = np.floor(
        t["value"].to_numpy(zero_copy_only=False) * 10_000 + 0.5
    ).astype(np.int64)
    daily: dict[tuple[str, int], int] = defaultdict(int)
    for et, u, v in zip(t["event_type"].to_pylist(), us, vals):
        d = (int(u) - _EPOCH_1995) // _DAY_US
        daily[(et, d)] += int(v)

    by_type: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (et, d), s in daily.items():
        by_type[et].append((d, s))

    expected = {}
    for et, pts in by_type.items():
        pts.sort()
        import math

        slopes = [
            # FLOOR over the identical IEEE double division — ints
            # here are far below 2^53, so float(s2-s1)/(d2-d1) is the
            # same double both engines compute.
            int(math.floor(float(s2 - s1) / (d2 - d1) + 0.5))
            for i, (d1, s1) in enumerate(pts)
            for d2, s2 in pts[i + 1:]
        ]
        if not slopes:
            continue
        slope = _lower_median(slopes)
        resid = [s - slope * d for d, s in pts]
        expected[et] = (len(slopes), slope, _lower_median(resid))

    out = REGISTRY["stats_theil_sen"].fn(spark, sf_dir).collect()
    got = {
        r["event_type"]: (r["n_pairs"], r["slope_e4"], r["intercept_e4"])
        for r in out
    }
    assert got == expected
    # Robustness sanity: the estimator must be exercised on real
    # multi-day series, not degenerate singletons.
    assert all(n >= 3 for n, _s, _i in expected.values())
