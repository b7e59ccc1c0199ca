"""Round-11 third opinions, part 11 — Gopher rule filtering, PII
scrubbing, funnel conversion, and the CDC MERGE reconstructed in pure
Python:

- quality_gopher_rules: the full rule battery (word-count bounds,
  mean-word-length, symbol ratio via non-overlapping '...' removal,
  alpha-word fraction, stopword floor) with every ratio an identical
  single int/int IEEE division, compared exactly;
- text_scrub_redact: digit-run redaction counts + md5 of the scrubbed
  string;
- events_funnel_conversion: the 30-minute click->purchase semi-join
  funnel with its exact-integer conversion ratio;
- cdc_merge_orders: the deterministic change batch (%7 updates, %13
  deletes, %10 offset-key inserts) applied by a plain dict MERGE.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.operators.text import STOPWORDS
from tests.mirrors import ts_us, words_of
from mapreduceframework_spark.plans.registry import REGISTRY
import mapreduceframework_spark.plans.lakehouse_queries  # noqa: F401
import mapreduceframework_spark.plans.streaming_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_HAS_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT_RUN = re.compile(r"[0-9]+")
MIN30_US = 30 * 60 * 1_000_000


@pytest.mark.parametrize("sf_dir", SFS)
def test_quality_gopher_rules_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    expected = {}
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        ws = words_of(text)
        if ws is None:
            continue
        wc = len(ws)
        char_sum = sum(len(w) for w in ws)
        n_hash = text.count("#")
        # replace-all of '...' is LEFT-TO-RIGHT NON-OVERLAPPING in both
        # engines and in str.replace — '....' counts once.
        n_ellipsis = (len(text) - len(text.replace("...", ""))) // 3
        n_alpha = sum(1 for w in ws if _HAS_ALPHA.search(w))
        stop_hits = sum(1 for w in ws if w in STOPWORDS)
        mwl = char_sum / wc
        sym = (n_hash + n_ellipsis) / wc
        alpha = n_alpha / wc
        keep = (
            50 <= wc <= 100000
            and 3.0 <= mwl <= 10.0
            and sym <= 0.1
            and alpha >= 0.8
            and stop_hits >= 2
        )
        expected[int(did)] = (wc, mwl, sym, alpha, stop_hits, keep)

    out = REGISTRY["quality_gopher_rules"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (
            r["word_count"],
            r["mean_word_len"],
            r["symbol_ratio"],
            r["alpha_ratio"],
            r["stop_hits"],
            r["keep"],
        )
        for r in out
    }
    assert got == expected  # single int/int divisions — exact doubles
    # Both verdicts must occur or the rule battery proved nothing.
    verdicts = {k[-1] for k in expected.values()}
    assert verdicts == {True, False}


@pytest.mark.parametrize("sf_dir", SFS)
def test_text_scrub_redact_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    expected = {}
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        scrubbed = _DIGIT_RUN.sub("<NUM>", text)
        expected[int(did)] = (
            len(_DIGIT_RUN.findall(text)),
            hashlib.md5(scrubbed.encode("utf-8")).hexdigest(),
        )

    out = REGISTRY["text_scrub_redact"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_redacted"], r["scrubbed_digest"]) for r in out
    }
    assert got == expected
    # Corpus shape: the synthetic documents contain no digit runs, so
    # every count is 0 and the digests hash unmodified text — the
    # replacement SEMANTICS are pinned on digit-bearing inputs below.
    assert expected and all(n == 0 for n, _d in expected.values())
    # Exercise the actual redaction on synthetic digit-bearing rows
    # through the same Spark expressions the query uses.
    df = spark.createDataFrame(
        [(1, "call 555 0123 now"), (2, "a1b22c333"), (3, "...")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    rows = {
        r["doc_id"]: (r["n"], r["dig"])
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit("[0-9]+"))
            .cast("long")
            .alias("n"),
            F.md5(
                F.regexp_replace("text", "[0-9]+", "<NUM>")
            ).alias("dig"),
        ).collect()
    }
    for did, text in [
        (1, "call 555 0123 now"), (2, "a1b22c333"), (3, "..."),
    ]:
        assert rows[did] == (
            len(_DIGIT_RUN.findall(text)),
            hashlib.md5(
                _DIGIT_RUN.sub("<NUM>", text).encode()
            ).hexdigest(),
        ), did


@pytest.mark.parametrize("sf_dir", SFS)
def test_events_funnel_conversion_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    us = ts_us(t["ts"])
    clicks: dict[int, list[int]] = defaultdict(list)
    purchases: dict[int, list[int]] = defaultdict(list)
    for u, et, x in zip(
        t["user_id"].to_numpy(), t["event_type"].to_pylist(), us
    ):
        if et == "click":
            clicks[int(u)].append(int(x))
        elif et == "purchase":
            purchases[int(u)].append(int(x))
    n_clickers = len(clicks)
    n_converters = sum(
        1
        for u, cl in clicks.items()
        if any(
            c <= p <= c + MIN30_US
            for c in cl
            for p in purchases.get(u, ())
        )
    )
    conv_pct = 100.0 * n_converters / n_clickers

    row = (
        REGISTRY["events_funnel_conversion"].fn(spark, sf_dir).collect()
    )[0]
    assert row["n_clickers"] == n_clickers
    assert row["n_converters"] == n_converters
    assert row["conv_pct"] == conv_pct
    assert 0 < n_converters < n_clickers  # non-degenerate funnel


@pytest.mark.parametrize("sf_dir", SFS)
def test_cdc_merge_orders_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    dates = ts_us(t["o_orderdate"])
    snap = {}
    for ok, ck, st, tp, d, pr in zip(
        t["o_orderkey"].to_numpy(), t["o_custkey"].to_numpy(),
        t["o_orderstatus"].to_pylist(), t["o_totalprice"].to_numpy(),
        dates, t["o_orderpriority"].to_pylist(),
    ):
        snap[int(ok)] = (int(ck), st, float(tp), int(d), pr)

    max_key = max(snap) if snap else -1
    offset = max_key + 1
    merged = dict(snap)
    for k in list(snap):
        if k % 13 == 0:
            del merged[k]  # D
        elif k % 7 == 0:  # U (D wins the %91 overlap, as in the batch)
            ck, _st, tp, d, pr = snap[k]
            merged[k] = (ck, "X", tp, d, pr)
    for k, row in snap.items():
        if k % 10 == 0:  # I with offset key — collision-free
            ck, _st, tp, d, pr = row
            merged[k + offset] = (ck, "N", tp, d, pr)
    expected = merged

    out = REGISTRY["cdc_merge_orders"].fn(spark, sf_dir).collect()
    got = {
        r["o_orderkey"]: (
            r["o_custkey"],
            r["o_orderstatus"],
            r["o_totalprice"],
            int(
                __import__("numpy").datetime64(r["o_orderdate"], "us")
                .astype(__import__("numpy").int64)
            ),
            r["o_orderpriority"],
        )
        for r in out
    }
    assert got == expected
    # All three ops must have fired.
    assert any(k % 13 == 0 for k in snap)
    assert any(st == "X" for _c, st, _t, _d, _p in expected.values())
    assert any(st == "N" for _c, st, _t, _d, _p in expected.values())
