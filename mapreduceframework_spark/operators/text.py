"""Text-analysis operators for training-data pipelines.

The reference's char-frequency client (SampleClient.cpp:32-66) is the
seed of this family; everything here stays in JVM whole-stage codegen
(pyspark.sql.functions only — no Python in the hot path), so each
operator is a single scan + optional O(groups) shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic marker-word sets per language for the heuristic
# language-ID scorer. On real corpora these would be stopword tables;
# the mechanism (per-language token-hit scoring, argmax) is the operator.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish pre-tokenization: word pieces, numbers, or single non-space
# symbols — the GPT-2 pretokenizer's shape without the lookbehinds.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp_count stays JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace."""
    n = F.length(text)
    n_punct = n - F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_punct / n)


def _membership(values: tuple[str, ...]):
    """Single-arg lambda factory for F.filter. NB: a default-arg idiom
    (``lambda w, m=values: ...``) must NOT be used here — PySpark binds
    2-parameter lambdas as (element, index) and the captured value
    silently becomes the array index."""
    return lambda w: w.isin(*values)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    words = F.split(F.trim(text), r"\s+")
    hits = F.size(F.filter(words, _membership(stopwords)))
    total = F.size(words)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits / total)


def mean_word_length(text: Column) -> Column:
    words = F.split(F.trim(text), r"\s+")
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(words)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation,
    some stopword mass — the C4-style cheap filter, all codegen'd."""
    len_term = F.least(F.length(text) / F.lit(200.0), F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(text) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over whitespace tokens."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    return {
        lang: F.size(F.filter(words, _membership(markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language by marker hits; deterministic tie-break on the
    language code; 'und' when nothing matches."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(c.alias("score"), F.lit(lang).alias("lang"))
            for lang, c in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)  # struct compare: score, then lang
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


# Hashed-feature linear classifier (the fastText-style bag-of-words
# quality scorer shape: hashing trick -> bucket weights -> mean score).
# Weights are DYADIC rationals (k/16, exactly representable in binary
# floating point) so a sum of them is EXACT in any association order —
# the Spark sequential fold and the oracle's list_sum cannot diverge.
CLASSIFIER_BUCKETS = 32
CLASSIFIER_WEIGHTS: tuple[float, ...] = tuple(
    ((j * 37) % 19 - 9) / 16.0 for j in range(CLASSIFIER_BUCKETS)
)


def token_bucket(w: Column, buckets: int = CLASSIFIER_BUCKETS) -> Column:
    """Hashing-trick feature bucket: first 8 hex chars of md5(token) as
    an integer, mod ``buckets``. md5 is bit-identical across engines
    (unlike engine-native ``hash()``), so the bucket assignment is
    portable; see :func:`token_bucket_sql` for the oracle rendering."""
    return (
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % buckets
    )


def token_bucket_sql(w: str, buckets: int = CLASSIFIER_BUCKETS) -> str:
    """DuckDB rendering of :func:`token_bucket` (kept adjacent so the
    two formulas cannot drift apart)."""
    return f"(('0x' || substring(md5({w}), 1, 8))::BIGINT % {buckets})"


def classifier_weights_sql() -> str:
    """The weight table as a DuckDB DOUBLE[] literal. ``repr`` of a
    dyadic float is exact decimal, so the literal round-trips bit-for-
    bit; the explicit cast stops DuckDB typing it DECIMAL[] (whose
    arithmetic would diverge from Spark doubles)."""
    vals = ", ".join(repr(x) for x in CLASSIFIER_WEIGHTS)
    return f"[{vals}]::DOUBLE[]"


def rolling_fingerprint(text: Column, modulus: int = 1_000_000_007) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    whitespace tokens, h = (h*31 + len(w)*997 + ascii(w[0])) mod M.

    Stays in codegen via F.aggregate; mod at every step keeps the value
    in BIGINT range (ANSI mode would error on overflow otherwise).
    """
    words = F.split(F.trim(text), r"\s+")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(
            acc * 31 + F.length(w) * 997 + F.ascii(F.substring(w, 1, 1)),
            F.lit(modulus),
        ),
    )
