"""Independent semantic cross-checks for the round-9 additions.

The oracle parity harness proves Spark == DuckDB; these tests prove the
SHARED convention is the intended algorithm, against references that
share no code with either rendering (numpy / pure-Python brute force) —
the same discipline as test_text_semantics (BPE vs a reference encoder)
and the Mann-Whitney midrank cross-check.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from mapreduceframework_spark.plans.registry import REGISTRY, all_queries

all_queries()  # side-effectful import of every query module


def _run(spark, sf_dir, name) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


# --------------------------------------------------------------------
# stats_regression_multi vs numpy least squares
# --------------------------------------------------------------------


def test_regression_multi_matches_numpy_lstsq(spark, sf_dir, oracle_con):
    got = _run(spark, sf_dir, "stats_regression_multi").set_index(
        "event_type"
    )
    pts = oracle_con.execute(
        """
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x1,
               CAST(hour(ts) AS BIGINT) AS x2,
               CAST(ROUND(value * 10000) AS BIGINT) AS y
        FROM events
        """
    ).fetchdf()
    for etype, g in pts.groupby("event_type"):
        X = np.column_stack(
            [np.ones(len(g)), g.x1.to_numpy(float), g.x2.to_numpy(float)]
        )
        # Skip groups the query excludes (collinear/degenerate).
        if etype not in got.index:
            assert np.linalg.matrix_rank(X) < 3
            continue
        b, *_ = np.linalg.lstsq(X, g.y.to_numpy(float), rcond=None)
        for col, ref in zip(["b0_e10", "b1_e10", "b2_e10"], b):
            # e6 snap of e4 units; lstsq is float so allow 1 unit slack.
            assert abs(got.loc[etype, col] - ref * 1e6) <= max(
                1.0, abs(ref * 1e6) * 1e-9
            ), (etype, col)


# --------------------------------------------------------------------
# stats_theil_sen vs a brute-force pure-Python reference
# --------------------------------------------------------------------


def test_theil_sen_matches_bruteforce(spark, sf_dir, oracle_con):
    got = _run(spark, sf_dir, "stats_theil_sen").set_index("event_type")
    daily = oracle_con.execute(
        """
        SELECT event_type,
               CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
                   AS s
        FROM events GROUP BY 1, 2
        """
    ).fetchdf()
    for etype, g in daily.groupby("event_type"):
        rows = sorted(zip(g.d.tolist(), g.s.tolist()))
        slopes = [
            math.floor((s2 - s1) / (d2 - d1) + 0.5)
            for i, (d1, s1) in enumerate(rows)
            for (d2, s2) in rows[i + 1 :]
        ]
        slopes.sort()
        slope = slopes[(len(slopes) - 1) // 2]  # lower median
        resid = sorted(s - slope * d for d, s in rows)
        intercept = resid[(len(resid) - 1) // 2]
        assert got.loc[etype, "n_pairs"] == len(slopes)
        assert got.loc[etype, "slope_e4"] == slope
        assert got.loc[etype, "intercept_e4"] == intercept


# --------------------------------------------------------------------
# pack_binpack_harmonic invariants: capacity respected, class sizing
# --------------------------------------------------------------------


def test_binpack_bins_respect_budget_and_class(spark, sf_dir):
    from mapreduceframework_spark.plans.text_queries import PACK_BUDGET

    bins = _run(spark, sf_dir, "pack_binpack_harmonic")
    assert (bins.tokens + bins.waste == PACK_BUDGET).all()
    assert (bins.waste >= 0).all()
    assert (bins.n_docs <= bins.k).all()
    # Within each (shard, class) only the HIGHEST bin id may be partial.
    for (_, _), g in bins.groupby(["shard", "k"]):
        partial = g[g.n_docs < g.k]
        assert len(partial) <= 1
        if len(partial):
            assert partial.bin_id.iloc[0] == g.bin_id.max()


# --------------------------------------------------------------------
# events_attribution_time_decay: credits of one conversion sum to ~1e6
# --------------------------------------------------------------------


def test_attribution_credit_conserved(spark, sf_dir, oracle_con):
    got = _run(spark, sf_dir, "events_attribution_time_decay")
    total_credit = got.credit_e6.sum()
    # Number of distinct purchases that received ANY touch attribution:
    # for each, the un-rounded type shares sum to exactly 1, and at most
    # 3 half-up roundings move the total by <= 1.5 units — so the grand
    # total sits within 2 * n_attributed of 1e6 * n_attributed.
    n_attr = oracle_con.execute(
        """
        SELECT COUNT(DISTINCT p.event_id) FROM events p
        WHERE p.event_type = 'purchase' AND EXISTS (
            SELECT 1 FROM events t
            WHERE t.user_id = p.user_id
              AND t.event_type IN ('view', 'click', 'signup')
              AND epoch_us(t.ts) <= epoch_us(p.ts)
              AND epoch_us(t.ts) >= epoch_us(p.ts) - 604800000000)
        """
    ).fetchone()[0]
    assert abs(total_credit - 1_000_000 * n_attr) <= 2 * n_attr


# --------------------------------------------------------------------
# graph_kcore invariant: surviving nodes have >= K surviving degree
# --------------------------------------------------------------------


def test_kcore_invariant(spark, sf_dir):
    from mapreduceframework_spark.plans.graph_queries import KCORE_K

    got = _run(spark, sf_dir, "graph_kcore")
    core = got[got.in_core == 1]
    assert (core.deg_last >= KCORE_K).all()
    removed = got[got.in_core == 0]
    assert ((removed.deg_last < KCORE_K) | (removed.deg_last == 0)).all()


# --------------------------------------------------------------------
# events_pattern_match_regex vs Python re over the same sequences
# --------------------------------------------------------------------


def test_pattern_match_matches_python_re(spark, sf_dir, oracle_con):
    from mapreduceframework_spark.plans.analytics_queries import (
        PATTERN_FUNNEL,
    )

    got = _run(spark, sf_dir, "events_pattern_match_regex")
    seqs = oracle_con.execute(
        """
        SELECT user_id, STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY 1, 2
        """
    ).fetchdf()
    pat = re.compile(PATTERN_FUNNEL)
    ref = {
        (r.user_id, r.day): len(pat.findall(r.seq))
        for r in seqs.itertuples()
        if pat.search(r.seq)
    }
    assert len(got) == len(ref)
    for r in got.itertuples():
        assert ref[(r.user_id, r.day)] == r.n_matches
        assert r.n_matches >= 1


# --------------------------------------------------------------------
# sketch_ams_f2: partition-mergeability of Z (the whole point)
# --------------------------------------------------------------------


def test_ams_z_is_sum_of_sign_stream(spark, sf_dir, oracle_con):
    from mapreduceframework_spark.operators.dedup import P
    from mapreduceframework_spark.operators.sketches import AMS_A, AMS_B

    got = (
        _run(spark, sf_dir, "sketch_ams_f2")
        .set_index("row_id")
        .sort_index()
    )
    words = oracle_con.execute(
        """
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0
        """
    ).fetchdf()["w"]

    def wh(w: str) -> int:
        return (
            len(w) * 2654435761 + ord(w[0]) * 97 + ord(w[-1])
        ) % 65536

    hs = words.map(wh).to_numpy()
    true_f2 = int(
        (pd.Series(hs).groupby(words.to_numpy()).size() ** 2).sum()
    )
    ests = []
    for r, (a, b) in enumerate(zip(AMS_A, AMS_B)):
        z = int((1 - 2 * ((a * hs + b) % P % 2)).sum())
        assert got.loc[r, "z_val"] == z
        ests.append(z * z)
    assert got.true_f2.iloc[0] == true_f2
    assert got.med_est.iloc[0] == sorted(ests)[2]


# --------------------------------------------------------------------
# text_keywords_rake vs a pure-Python RAKE reference
# --------------------------------------------------------------------


def test_rake_matches_pure_python(spark, sf_dir, oracle_con):
    from mapreduceframework_spark.plans.text_queries import (
        RAKE_STOPWORDS,
        RAKE_TOP_K,
    )

    got = _run(spark, sf_dir, "text_keywords_rake")
    docs = oracle_con.execute(
        "SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0"
    ).fetchdf()
    ref_rows = {}
    for r in docs.itertuples():
        words = r.text.strip().split()
        phrases, cur = [], []
        for w in words:
            if w in RAKE_STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        freq, degree = {}, {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                degree[w] = degree.get(w, 0) + len(p)
        scored = sorted(
            ((degree[w] * 1_000_000 // freq[w], w) for w in freq),
            key=lambda t: (-t[0], t[1]),
        )[:RAKE_TOP_K]
        for score, w in scored:
            ref_rows[(r.doc_id, w)] = (freq[w], degree[w], score)
    assert len(got) == len(ref_rows)
    for r in got.itertuples():
        assert ref_rows[(r.doc_id, r.word)] == (
            r.freq,
            r.degree,
            r.score_e6,
        )
