"""Property-based fuzzing for the two round-10 constructions whose
correctness rests on a written proof:

1. BPE encoder interchangeability — the pure-Python min-rank encoder
   (the 50k-merge scale path) against the DuckDB rendering of the
   rank-ordered global-replace encoder, on RANDOM strings. No Spark
   session needed, so hypothesis can afford hundreds of examples; the
   Spark column is pinned equal to the DuckDB rendering elsewhere
   (tests/test_text_semantics.py), so transitivity covers all three.

2. The KLL rank-error guarantee — the docstring's tau +/- 2*B*(C-1)
   bound, exercised by a pure-Python simulation of the exact
   construction on adversarial integer distributions (heavy ties,
   constants, skew) far outside what the fixed events table can show.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from mapreduceframework_spark.operators.text import (
    bpe_token_count_py,
    bpe_token_count_sql,
)
from mapreduceframework_spark.plans.sketch_queries import (
    KLLQ_SHARDS,
    KLLQ_SLACK,
    KLLQ_STRIDE,
)

# Alphabet chosen to hit every encoder code path: merge-table letters
# (deep chains around 'order'/'vector'/'merge'), the '|' delimiter,
# counted and UNcounted whitespace, digits/punct units, NUL, and a
# non-ascii letter.
_BPE_ALPHABET = "ovectrmgsl aeiou|\t\n\r\x0b\x00.,3é"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_BPE_ALPHABET, max_size=60))
def test_bpe_python_encoder_matches_duckdb_rendering(s):
    # The rendering interpolates its argument several times, so bind
    # the string once through a one-row relation, not a '?' literal.
    con = duckdb.connect()
    (n,) = con.execute(
        f"SELECT {bpe_token_count_sql('t.s')} FROM (SELECT ? AS s) t",
        [s],
    ).fetchone()
    con.close()
    assert n == bpe_token_count_py(s), repr(s)


def _kll_simulate(values: list[int]) -> None:
    """Run the exact sketch_quantile_kll construction in pure Python
    and assert the rank bracket for every percentile target."""
    n = len(values)
    rows = sorted((v, i) for i, v in enumerate(values))
    sv = [v for v, _ in rows]

    kept: list[tuple[int, int]] = []
    for s in range(KLLQ_SHARDS):
        shard = [(v, i) for v, i in rows if i % KLLQ_SHARDS == s]
        kept.extend(
            shard[r - 1] for r in range(KLLQ_STRIDE, len(shard) + 1,
                                        KLLQ_STRIDE)
        )
    kept.sort()
    if not kept:
        return  # n < C per shard: summary empty, nothing to claim
    for q in (1, 10, 25, 50, 75, 90, 99, 100):
        tau = (q * n + 99) // 100
        k_eff = min((tau + KLLQ_STRIDE - 1) // KLLQ_STRIDE, len(kept))
        est = kept[k_eff - 1][0]
        lo = sv[max(1, tau - KLLQ_SLACK) - 1]
        hi = sv[min(n, tau + KLLQ_SLACK) - 1]
        assert lo <= est <= hi, (q, n, est, lo, hi)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=3000,
    )
)
def test_kll_rank_bound_holds_on_random_data(values):
    _kll_simulate(values)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=3000),
    st.integers(min_value=-5, max_value=5),
)
def test_kll_rank_bound_holds_on_constant_series(n, c):
    # All-ties: the worst case for rank arguments — every quantile's
    # exact value IS c, and the bracket must still contain the
    # estimate (both are c whenever the summary is non-empty).
    _kll_simulate([c] * n)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=400, max_value=2000))
def test_kll_rank_bound_holds_on_heavy_skew(n):
    # 99% of mass on one value plus a thin tail — stresses the
    # clamped-k_eff path and the hi-rank saturation at n.
    values = [0] * (n * 99 // 100) + list(range(1, n - n * 99 // 100 + 1))
    _kll_simulate(values)
