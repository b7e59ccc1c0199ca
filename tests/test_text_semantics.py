"""Cross-engine + cross-implementation contracts for the text family's
exact BPE tokenizer (operators/text.py BPE_MERGES / bpe_token_count).

The column implementation encodes by applying merges RANK BY RANK as
global left-to-right string replaces; the classic encoder (Sennrich
apply_bpe / GPT-2) iterates per word, always merging the LOWEST-RANK
pair present. Those are equivalent only when the merge table is
well-formed (every pattern token is a single character or the output
of an earlier merge) — this module pins both the precondition and the
equivalence: an independent word-at-a-time min-rank encoder must agree
with the Spark column AND the DuckDB oracle rendering on the real
corpus and on adversarial strings."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from mapreduceframework_spark.operators.text import (
    BPE_MERGES,
    bpe_token_count,
    bpe_token_count_sql,
)

# --------------------------------------------------------------------
# Independent reference implementation (word-at-a-time, min-rank
# iterative — the GPT-2/Sennrich formulation, deliberately NOT the
# rank-ordered global-replace strategy the column uses).
# --------------------------------------------------------------------

_RANK = {pair: r for r, pair in enumerate(BPE_MERGES)}
_COUNTED_WS = set(" \t\n\r")  # the exact class bpe_token_count subtracts


def _encode_word(word: str) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = _RANK.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = BPE_MERGES[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def ref_bpe_token_count(text: str) -> int:
    """Tokenizer normalization (lowercase, strip the '|' delimiter),
    then: maximal [a-z] runs encode via min-rank BPE, every other
    character is its own token, and the four counted whitespace
    characters are separators, not tokens."""
    t = text.lower().replace("|", "")
    n, word = 0, []
    for ch in t:
        if "a" <= ch <= "z":
            word.append(ch)
            continue
        if word:
            n += len(_encode_word("".join(word)))
            word = []
        # Every non-letter unit is one token — including a literal
        # NUL — except the four counted whitespace separators.
        if ch not in _COUNTED_WS:
            n += 1
    if word:  # flush a trailing letter run
        n += len(_encode_word("".join(word)))
    return n


# --------------------------------------------------------------------
# Precondition: the merge table is well-formed.
# --------------------------------------------------------------------

def test_merge_table_well_formed():
    """Every pattern token must be a single character or the output of
    an EARLIER merge, outputs must be unique, and the alphabet is
    lowercase letters only. This is the precondition under which
    applying merges rank-by-rank (the column's global-replace
    strategy) equals the min-rank iterative encoder: a merge's output
    token can only be consumed by LATER-rank patterns, so by the time
    rank r runs, no earlier-rank pair exists or can reappear."""
    known = set()
    for r, (a, b) in enumerate(BPE_MERGES):
        for tok in (a, b):
            assert len(tok) == 1 or tok in known, (
                f"rank {r}: pattern token {tok!r} is neither a single "
                f"char nor an earlier merge output"
            )
            assert tok.isascii() and tok.islower() and tok.isalpha()
        out = a + b
        assert out not in known, f"rank {r}: duplicate output {out!r}"
        known.add(out)
    # No self-pair (a, a): left-to-right non-overlapping replacement of
    # |a||a| would otherwise need the overlap argument spelled out.
    assert all(a != b for a, b in BPE_MERGES)


# --------------------------------------------------------------------
# Equivalence on adversarial strings — Spark column, DuckDB rendering,
# and the independent reference must agree exactly.
# --------------------------------------------------------------------

ADVERSARIAL = [
    "",
    " ",
    " \t\n\r ",
    "|",
    "||merge||",
    "a",
    "order vector merge",  # deep merge chains
    "customer filter small slow",  # full-table words
    "merger",  # 'mer'+'ge' consumes the 'er' that 'merger' also wants
    "ererer er rer",  # repeated overlapping pair material
    "ordered disorder reorder",  # merges inside larger words
    "Vector ORDER Column",  # lowercase normalization
    "a|b||c|||d",  # delimiter stripping
    "x1y2z3 42 3.14, odd-ball! (parens) [maps]",  # digits/punct units
    "tab\tsep\nnewline\rcr",  # counted whitespace classes
    "vert\x0bical form\x0cfeed",  # UNcounted control chars = tokens
    "nul\x00inside\x00 runs",  # literal NUL is a regular 1-token unit
    "éclair naïve ünïcode",  # non-ascii letters are single units
    "joinjoinjoin hashhash rowrowrow",
    "stcolumnst custcustomer",  # pattern prefixes/suffixes abutting
]


def test_spark_column_matches_reference_on_adversarial(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "i long, text string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    for i, s in enumerate(ADVERSARIAL):
        assert got[i] == ref_bpe_token_count(s), repr(s)


def test_duckdb_rendering_matches_reference_on_adversarial():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(ADVERSARIAL)))
        + ") v(i, text)",
        ADVERSARIAL,
    )
    rows = con.execute(
        f"SELECT i, {bpe_token_count_sql('text')} AS n FROM t ORDER BY i"
    ).fetchall()
    for i, n in rows:
        assert n == ref_bpe_token_count(ADVERSARIAL[i]), repr(ADVERSARIAL[i])


# --------------------------------------------------------------------
# Equivalence on the real corpus (every document at the test SF).
# --------------------------------------------------------------------

def test_spark_column_matches_reference_on_corpus(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "text", bpe_token_count(F.col("text")).alias("n")
        )
        .collect()
    )
    assert len(rows) > 0
    mismatches = [
        (r["doc_id"], r["n"], ref_bpe_token_count(r["text"]))
        for r in rows
        if r["n"] != ref_bpe_token_count(r["text"])
    ]
    assert mismatches == []


def test_bpe_counts_strictly_refine_char_counts(spark, sf_dir):
    """Sanity bounds: token count is at most the non-whitespace char
    count (merges only shrink) and at least the whitespace word count
    (a word is >= 1 token) — catches sign/off-by-one bugs in the
    length arithmetic independent of the reference encoder."""
    bad = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            bpe_token_count(F.col("text")).alias("n"),
            F.length(
                F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\r]", "")
            ).alias("chars"),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("words"),
        )
        .filter((F.col("n") > F.col("chars")) | (F.col("n") < F.col("words")))
        .count()
    )
    assert bad == 0


# --------------------------------------------------------------------
# The decomposition identity the vocab-table plan relies on.
# --------------------------------------------------------------------

def test_bpe_doc_count_decomposes_into_word_counts(spark, sf_dir):
    """text_bpe_vocab_counts' whole premise: because no merge pair
    contains a whitespace unit, a document's BPE count equals the sum
    of its whitespace-words' counts. Both registered rows must agree
    doc-for-doc on the non-blank corpus (the vocab row's scope)."""
    from mapreduceframework_spark.plans.registry import REGISTRY
    import mapreduceframework_spark.plans.text_queries  # noqa: F401

    full = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in REGISTRY["text_bpe_tokenize"].fn(spark, sf_dir).collect()
    }
    vocab = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in REGISTRY["text_bpe_vocab_counts"].fn(spark, sf_dir).collect()
    }
    assert vocab  # non-blank docs exist at every SF
    for doc_id, counts in vocab.items():
        assert full[doc_id] == counts, doc_id
    # Blank docs are exactly the difference in coverage.
    assert all(
        full[d] == (0, 0) for d in set(full) - set(vocab)
    )


# --------------------------------------------------------------------
# The realistic-vocab (50k-merge) encoder seam: the Arrow-batched
# pandas-UDF encoder must equal the codegen expression encoder.
# --------------------------------------------------------------------

def test_bpe_pandas_encoder_matches_expression_encoder(spark, sf_dir):
    """operators/text.py's bpe_token_count_arrow() is the encoder the
    vocab-table plan deploys when the merge table is production-sized
    (50k chained string passes cannot be an expression tree). On the
    full 48-merge table it must agree with the expression encoder on
    every adversarial string AND every distinct corpus word — proving
    the two encoders are interchangeable at the text_bpe_vocab_counts
    seam."""
    from mapreduceframework_spark.operators.text import (
        bpe_token_count_arrow,
        bpe_token_count_py,
    )

    # Adversarial strings (plus a NULL row — both encoders must
    # propagate NULL, not coerce to 0), both the pandas UDF (executor
    # path) and the plain-Python form (driver path) vs the codegen
    # expression.
    cases = [(i, s) for i, s in enumerate(ADVERSARIAL)]
    cases.append((len(cases), None))
    df = spark.createDataFrame(cases, "i long, text string")
    rows = df.select(
        "i",
        "text",
        bpe_token_count(F.col("text")).alias("expr_n"),
        bpe_token_count_arrow()(F.col("text")).alias("arrow_n"),
    ).collect()
    for r in rows:
        assert r["expr_n"] == r["arrow_n"], repr(r["text"])
        if r["text"] is None:
            assert r["expr_n"] is None
        else:
            assert bpe_token_count_py(r["text"]) == r["expr_n"], repr(
                r["text"]
            )

    # Every distinct whitespace-word of the corpus — exactly the rows
    # the scale path would feed the pandas encoder.
    words = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
        .select(
            "w",
            bpe_token_count(F.col("w")).alias("expr_n"),
            bpe_token_count_arrow()(F.col("w")).alias("arrow_n"),
        )
    )
    assert words.count() > 0
    assert words.filter(F.col("expr_n") != F.col("arrow_n")).count() == 0
