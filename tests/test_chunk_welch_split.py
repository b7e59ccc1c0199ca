"""Semantic contracts for the round-8 additions: sliding-window
chunking (coverage + identity), the pairwise Welch t-test (numpy
cross-check), the leakage-safe split (no near-dup pair may ever
straddle a split boundary — the property the query exists for), and
RFM segmentation (independent pandas exact-tertile reference)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.registry import all_queries
from mapreduceframework_spark.sources import load_table

SIZE, STRIDE = 16, 12


def test_chunk_sliding_covers_every_token(spark, sf_dir):
    """Chunk starts advance by exactly STRIDE, chunk 0 starts at 0, the
    last chunk reaches the final token, and every chunk identity is
    md5 of the space-joined window — recomputed independently in
    Python over the raw text."""
    q = all_queries()["text_chunk_sliding"]
    rows = q.fn(spark, sf_dir).toPandas()
    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip())
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "text")
        .collect()
    }
    assert set(rows["doc_id"]) == set(docs)
    for doc_id, grp in rows.groupby("doc_id"):
        toks = docs[doc_id]
        g = grp.sort_values("chunk_idx").reset_index(drop=True)
        assert list(g["chunk_idx"]) == list(range(len(g)))
        assert list(g["start_tok"]) == [i * STRIDE for i in range(len(g))]
        # Full coverage: the last chunk's window reaches the last token.
        last = g.iloc[-1]
        assert last["start_tok"] + last["n_toks"] == len(toks)
        for _, r in g.iterrows():
            window = toks[r["start_tok"] : r["start_tok"] + SIZE]
            assert r["n_toks"] == len(window)
            expect = hashlib.md5(" ".join(window).encode()).hexdigest()
            assert r["chunk_hash"] == expect, (doc_id, r["chunk_idx"])


def test_welch_ttest_matches_numpy(spark, sf_dir):
    """t and the Welch–Satterthwaite df must agree with an independent
    numpy computation over the same exact e2 integers (scipy-free
    reimplementation of scipy.stats.ttest_ind(equal_var=False))."""
    q = all_queries()["stats_welch_ttest"]
    got = q.fn(spark, sf_dir).toPandas().set_index(["type_a", "type_b"])
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.round(F.col("value") * 100).alias("v"))
        .toPandas()
    )
    groups = {
        t: g["v"].to_numpy(dtype=np.float64)
        for t, g in ev.groupby("event_type")
    }
    types = sorted(groups)
    n_pairs = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            a, b = groups[ta], groups[tb]
            va = a.var(ddof=1)
            vb = b.var(ddof=1)
            sa, sb = va / len(a), vb / len(b)
            t = (a.mean() - b.mean()) / np.sqrt(sa + sb)
            df = (sa + sb) ** 2 / (
                sa**2 / (len(a) - 1) + sb**2 / (len(b) - 1)
            )
            row = got.loc[(ta, tb)]
            assert row["n_a"] == len(a) and row["n_b"] == len(b)
            assert abs(row["t_stat"] - t) < 1e-5, (ta, tb)
            assert abs(row["df_welch"] - df) < 1e-3, (ta, tb)
            n_pairs += 1
    assert len(got) == n_pairs == len(types) * (len(types) - 1) // 2


def test_leakage_safe_split_never_splits_a_near_dup_pair(spark, sf_dir):
    """THE property: both endpoints of every MinHash near-dup pair get
    the same split label (checked over the exact pair set the dedup
    family verifies), assignments cover the corpus exactly once, and
    the bucket hash matches the registry's affine formula."""
    from mapreduceframework_spark.plans.dedup_queries import _minhash_pairs

    q = all_queries()["split_leakage_safe"]
    asg = q.fn(spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(asg) == n_docs and asg["doc_id"].is_unique

    split_of = dict(zip(asg["doc_id"], asg["split"]))
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    assert pairs, "fixture should contain planted near-dups"
    for r in pairs:
        assert split_of[r["doc_a"]] == split_of[r["doc_b"]], (
            r["doc_a"],
            r["doc_b"],
        )

    buckets = (asg["group_id"] * 2654435761 + 40503) % 1000
    expect = pd.cut(
        buckets,
        [-1, 799, 899, 999],
        labels=["train", "val", "test"],
    ).astype(str)
    assert (asg["split"] == expect).all()


def test_rfm_segments_match_pandas_reference(spark, sf_dir):
    """The segment cube must equal an independent pandas computation
    of the same exact-tertile rule (c_k = smallest goodness value
    whose cumulative user count reaches ceil(k*n/3); score =
    1 + [g > c1] + [g > c2])."""
    q = all_queries()["events_rfm_segments"]
    got = (
        q.fn(spark, sf_dir)
        .toPandas()
        .sort_values(["r_score", "f_score", "m_score"])
        .reset_index(drop=True)
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .toPandas()
    )
    gus = ev["us"].max()
    u = ev.groupby("user_id").agg(
        lus=("us", "max"), g_f=("us", "size"), g_m=("v", "sum")
    )
    u["g_r"] = -((gus - u["lus"]) // 86_400_000_000)
    n = len(u)

    def cutoffs(s):
        vc = s.value_counts().sort_index().cumsum()
        c1 = vc.index[vc >= (n + 2) // 3][0]
        c2 = vc.index[vc >= (2 * n + 2) // 3][0]
        return c1, c2

    for dim, col in (("r", "g_r"), ("f", "g_f"), ("m", "g_m")):
        c1, c2 = cutoffs(u[col])
        u[f"{dim}_score"] = 1 + (u[col] > c1) + (u[col] > c2)
    expect = (
        u.groupby(["r_score", "f_score", "m_score"])
        .agg(n_users=("g_m", "size"), monetary_e2=("g_m", "sum"))
        .reset_index()
        .sort_values(["r_score", "f_score", "m_score"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    for c in ("r_score", "f_score", "m_score", "n_users", "monetary_e2"):
        assert list(got[c]) == list(expect[c]), c
