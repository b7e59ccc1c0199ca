"""Property-based fuzzing for the round-11 construction whose
correctness rests on a written proof: the COMPOSED two-level KLL
rank-error guarantee (slack2 = C1*C2 + C1 + C1*B2*(C2-1) + B1*(C1-1),
sketch_quantile_kll_twolevel's docstring), exercised by a pure-Python
simulation of the exact construction on adversarial integer
distributions far outside what the fixed events table can show —
heavy ties, constants, skew, and the clamped-summary regime where the
level-2 kept set barely exists.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mapreduceframework_spark.plans.sketch_queries import (
    KLL2_B1,
    KLL2_B2,
    KLL2_C1,
    KLL2_C2,
    KLL2_SLACK,
    KLL2_W,
)


def _compact(
    rows: list[tuple[int, int]], shards: int, stride: int
) -> list[tuple[int, int]]:
    """One deterministic compaction level over (v, id)-sorted rows:
    per-shard (id % shards) every-stride-th rank kept, merged by plain
    union — the exact registered construction."""
    kept: list[tuple[int, int]] = []
    for s in range(shards):
        shard = [(v, i) for v, i in rows if i % shards == s]
        kept.extend(
            shard[r - 1]
            for r in range(stride, len(shard) + 1, stride)
        )
    kept.sort()
    return kept


def _kll2_simulate(values: list[int]) -> None:
    """Run the exact sketch_quantile_kll_twolevel construction in pure
    Python and assert the composed rank bracket for every target."""
    n = len(values)
    rows = sorted((v, i) for i, v in enumerate(values))
    sv = [v for v, _ in rows]

    kept1 = _compact(rows, KLL2_B1, KLL2_C1)
    kept2 = _compact(kept1, KLL2_B2, KLL2_C2)
    if not kept2:
        return  # summary empty: the query would emit no estimate rows
    for q in (1, 10, 25, 50, 75, 90, 99, 100):
        tau = (q * n + 99) // 100
        k_eff = min((tau + KLL2_W - 1) // KLL2_W, len(kept2))
        est = kept2[k_eff - 1][0]
        lo = sv[max(1, tau - KLL2_SLACK) - 1]
        hi = sv[min(n, tau + KLL2_SLACK) - 1]
        assert lo <= est <= hi, (q, n, est, lo, hi)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=4000,
    )
)
def test_kll2_composed_bound_holds_on_random_data(values):
    _kll2_simulate(values)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=4000),
    st.integers(min_value=-5, max_value=5),
)
def test_kll2_composed_bound_holds_on_constant_series(n, c):
    # All-ties: every quantile's exact value IS c and the bracket must
    # still contain the estimate.
    _kll2_simulate([c] * n)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=600, max_value=4000))
def test_kll2_composed_bound_holds_on_heavy_skew(n):
    # 99% of mass on one value plus a thin tail — stresses the
    # clamped-k_eff path and the hi-rank saturation at n, through TWO
    # rounds of per-shard flooring.
    values = [0] * (n * 99 // 100) + list(range(1, n - n * 99 // 100 + 1))
    _kll2_simulate(values)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=2500))
def test_kll2_composed_bound_holds_near_summary_birth(n):
    # n around B1*C1*C2-ish: the level-2 summary is empty or a handful
    # of elements — the regime where both clamping branches and the
    # per-shard floor losses dominate the slack budget.
    _kll2_simulate(list(range(n)))
