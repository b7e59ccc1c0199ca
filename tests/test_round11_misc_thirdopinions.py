"""Round-11 third opinions, part 12 — readability grading and the KMV
distinct sketch reconstructed in pure Python:

- text_readability_scores: vowel-group/sentence/word counts with the
  query's own explicit character classes (note n_words uses
  [ \\t\\n\\r\\f]+ — deliberately NOT Java's \\s, which adds \\x0B),
  and the Flesch-Kincaid double tree rounded half-away-from-zero;
- sketch_kmv_distinct: per-source k-minimum-values estimate
  (k-1)*P // h_k with the under-filled fallback, against exact
  distinct counts.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from tests.mirrors import P, round_half_up, word_hash, words_of
from mapreduceframework_spark.plans.registry import REGISTRY
from mapreduceframework_spark.plans.sketch_queries import KMV_K
import mapreduceframework_spark.plans.sketch_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_RD_WS = re.compile(r"[ \t\n\r\f]+")  # the query's class — no \x0B
_SENT = re.compile(r"[.!?]+")
_VOWEL = re.compile(r"[aeiouy]+")


@pytest.mark.parametrize("sf_dir", SFS)
def test_text_readability_scores_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    expected = {}
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        trimmed = text.strip(" ")
        n_words = 0 if trimmed == "" else len(_RD_WS.split(trimmed))
        n_sent = len(_SENT.findall(text))
        n_vow = len(_VOWEL.findall(text.lower()))
        if n_words > 0 and n_sent > 0:
            grade = int(
                round_half_up(
                    1000
                    * (
                        0.39 * (float(n_words) / float(n_sent))
                        + 11.8 * (float(n_vow) / float(n_words))
                        - 15.59
                    ),
                    0,
                )
            )
        else:
            grade = None
        expected[int(did)] = (n_words, n_sent, n_vow, grade)

    out = REGISTRY["text_readability_scores"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_vowel_groups"],
            r["fk_grade_e3"],
        )
        for r in out
    }
    assert got == expected
    # Corpus shape: the synthetic documents contain no [.!?] at all, so
    # every n_sentences is 0 and every grade is NULL by the degenerate
    # -doc contract (counts still fully verified above). Pin the grade
    # ARITHMETIC on synthetic punctuated rows through the same Spark
    # expressions the query uses.
    assert all(s == 0 for _w, s, _v, _g in expected.values())
    from pyspark.sql import functions as F

    probe = [
        (1, "The quick brown fox jumps over the lazy dog. It runs!"),
        (2, "One two three. Four five? Six!"),
        (3, "   "),  # blank -> 0 words, NULL grade
    ]
    df = spark.createDataFrame(probe, "doc_id long, text string")
    n_words = F.when(
        F.trim("text") == "", F.lit(0).cast("long")
    ).otherwise(
        F.size(F.split(F.trim("text"), r"[ \t\n\r\f]+")).cast("long")
    )
    n_sent = F.size(
        F.expr("regexp_extract_all(text, '[.!?]+', 0)")
    ).cast("long")
    n_vow = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("long")
    grade = F.round(
        F.lit(1000)
        * (
            F.lit(0.39) * (n_words.cast("double") / n_sent.cast("double"))
            + F.lit(11.8) * (n_vow.cast("double") / n_words.cast("double"))
            - F.lit(15.59)
        )
    ).cast("long")
    rows = {
        r["doc_id"]: (r["w"], r["s"], r["v"], r["g"])
        for r in df.select(
            "doc_id",
            n_words.alias("w"),
            n_sent.alias("s"),
            n_vow.alias("v"),
            F.when((n_words > 0) & (n_sent > 0), grade).alias("g"),
        ).collect()
    }
    seen_grades = set()
    for did, text in probe:
        trimmed = text.strip(" ")
        nw = 0 if trimmed == "" else len(_RD_WS.split(trimmed))
        ns = len(_SENT.findall(text))
        nv = len(_VOWEL.findall(text.lower()))
        g = None
        if nw > 0 and ns > 0:
            g = int(
                round_half_up(
                    1000
                    * (
                        0.39 * (float(nw) / float(ns))
                        + 11.8 * (float(nv) / float(nw))
                        - 15.59
                    ),
                    0,
                )
            )
            seen_grades.add(g)
        assert rows[did] == (nw, ns, nv, g), did
    assert len(seen_grades) > 1  # the grade discriminates


@pytest.mark.parametrize("sf_dir", SFS)
def test_sketch_kmv_distinct_matches_python(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    words_by_source: dict[str, set[str]] = defaultdict(set)
    for src, text in zip(
        t["source"].to_pylist(), t["text"].to_pylist()
    ):
        ws = words_of(text)
        if ws is None:
            continue
        words_by_source[src].update(ws)
    expected = {}
    for src, ws in words_by_source.items():
        hashes = sorted({(48_271 * word_hash(w) + 11) % P for w in ws})
        if len(hashes) >= KMV_K:
            est = (KMV_K - 1) * P // hashes[KMV_K - 1]
        else:
            est = len(hashes)
        expected[src] = (len(ws), est)

    out = REGISTRY["sketch_kmv_distinct"].fn(spark, sf_dir).collect()
    got = {
        r["source"]: (r["exact_words"], r["est_distinct"]) for r in out
    }
    assert got == expected
    # The sketch path (not just the fallback) must have fired.
    assert any(
        len({(48_271 * word_hash(w) + 11) % P for w in ws}) >= KMV_K
        for ws in words_by_source.values()
    )
