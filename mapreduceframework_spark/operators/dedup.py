"""Deduplication operators for training-data pipelines.

The reference's only dedup is the comparator-keyed unique-key set built
during shuffle (reference JobContext.h:78, JobContext.cpp:347-353 — exact
key dedup). This module keeps that (exact, hash-based) and adds the
near-duplicate family a 100 TB corpus pipeline needs: n-gram Jaccard,
MinHash+LSH, SimHash, and embedding-cosine.

Design rules:

- Every primitive is a deterministic integer/string formula expressible
  identically in Spark (`pyspark.sql.functions` higher-order functions,
  JVM codegen) and ANSI-ish SQL (the DuckDB oracle) — engine-native
  ``hash()`` differs between engines, so we never use it where an oracle
  must agree. Collisions are acceptable (dedup hashing is approximate by
  construction); cross-engine divergence is not.
- No Python in the hot path: everything below is Column-level
  (transform/filter/aggregate/array_*), so plans stay in whole-stage
  codegen and scale is bounded by shuffles, not serialization.
- All-pairs comparison is never materialized. Candidates come from an
  inverted index (shared shingle), LSH band buckets, or SimHash nibble
  bands (pigeonhole for Hamming<=3) — each turns O(n^2) into
  O(sum of bucket^2), the standard shape that survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Large prime modulus for shingle/MinHash arithmetic; every partial
# product below stays under 2^63 (documented per call site).
P = 1_000_000_007
# Word-hash range: 16 bits, so a 3-gram shingle hash fits in 48 bits
# before the mod.
WORD_HASH_MOD = 65_536
# MinHash permutation coefficients (a*x + b) % P — fixed, so signatures
# are reproducible across engines and across rounds.
MINHASH_A = (907, 1129, 1439, 1733, 2003, 2339, 2713, 3023)
MINHASH_B = (17, 89, 233, 409, 571, 761, 919, 1103)
SIMHASH_BITS = 32


def words_of(text: Column) -> Column:
    """Whitespace tokens (callers must pre-filter empty/blank text)."""
    return F.split(F.trim(text), r"\s+")


def word_hash(w: Column) -> Column:
    """Deterministic 16-bit token hash from (length, first char, last
    char) — weak by design but identical in Spark and the SQL oracle
    (engine-native hash functions differ). ``(len*2654435761 +
    first*97 + last) % 65536``; max intermediate ~1e13 < 2^63."""
    return (
        F.length(w) * F.lit(2654435761)
        + F.ascii(F.substring(w, 1, 1)) * 97
        + F.ascii(w.substr(F.length(w), F.lit(1)))
    ) % WORD_HASH_MOD


def word_hash_sql(w: str) -> str:
    """DuckDB rendering of :func:`word_hash` (kept adjacent so the two
    formulas cannot drift apart silently)."""
    return (
        f"(length({w})*2654435761 + ascii(substr({w},1,1))*97"
        f" + ascii(substr({w},length({w}),1))) % {WORD_HASH_MOD}"
    )


def string_shingles_all(words: Column, n: int = 3) -> Column:
    """ALL word n-gram shingles as strings (space-joined), duplicates
    kept in positional order — the input to repetition metrics where
    the duplicate count IS the signal.

    Perf-critical shape: built from n shifted slices combined with
    zip_with, so every lambda body touches ONLY lambda variables.
    A lambda that references an outer column (e.g. ``transform(seq,
    i -> slice(words, i, n))``) is re-evaluated per element — and HOFs
    are CodegenFallback (interpreted), so after CollapseProject inlines
    ``words = split(...)`` the per-row cost turns quadratic in document
    length. Measured 25x slower at sf0.1."""
    count = F.size(words) - (n - 1)
    out = F.slice(words, 1, count)
    for k in range(1, n):
        out = F.zip_with(
            out, F.slice(words, k + 1, count), lambda p, w: F.concat_ws(" ", p, w)
        )
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(out)


def string_shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (see :func:`string_shingles_all`
    for the shape rationale)."""
    return F.array_distinct(string_shingles_all(words, n))


def string_shingles_all_sql(words: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`string_shingles_all` (duplicates
    kept) — kept adjacent so the two formulas cannot drift apart."""
    return (
        f"CASE WHEN len({words}) < {n} THEN []::VARCHAR[] ELSE "
        f"[array_to_string({words}[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({words}) - {n - 2})] END"
    )


def string_shingles_sql(words: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`string_shingles` (distinct)."""
    return (
        f"CASE WHEN len({words}) < {n} THEN []::VARCHAR[] ELSE "
        f"list_distinct([array_to_string({words}[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({words}) - {n - 2})]) END"
    )


def hashed_shingles(words: Column, n: int = 3) -> Column:
    """Distinct 3-gram shingle hashes: fold the 16-bit word hashes with
    base 65536 then mod P. Max pre-mod value < 2^48.

    Same zip_with-over-slices shape as :func:`string_shingles` (see its
    perf note): lambda bodies reference only lambda variables, so the
    word-hash array is evaluated O(n) times per row, never per
    element."""
    wh = F.transform(words, word_hash)
    count = F.size(words) - (n - 1)
    out = F.slice(wh, 1, count)
    for k in range(1, n):
        out = F.zip_with(
            out,
            F.slice(wh, k + 1, count),
            lambda acc, h: acc * WORD_HASH_MOD + h,
        )
    return F.when(count <= 0, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(F.transform(out, lambda s: s % P))
    )


def hashed_shingles_sql(wh: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`hashed_shingles`, over a word-hash
    array column ``wh`` (define it in a prior CTE via
    ``list_transform(words, w -> word_hash_sql('w'))``)."""
    acc = f"{wh}[i]"
    for k in range(1, n):
        acc = f"({acc}*{WORD_HASH_MOD} + {wh}[i+{k}])"
    return (
        f"CASE WHEN len({wh}) < {n} THEN []::BIGINT[] ELSE "
        f"list_distinct([{acc} % {P} "
        f"for i in range(1, len({wh}) - {n - 2})]) END"
    )


def minhash_signature(shingle_hashes: Column) -> Column:
    """MinHash signature: array of len(MINHASH_A) minima of (a*s+b)%P
    over the shingle-hash set. a*s < 3023*P ~ 3e12 < 2^63. Empty
    shingle set -> array of nulls (callers drop those docs)."""
    def perm(a: int, b: int):
        # Closure factory, NOT a default-arg lambda: PySpark binds a
        # 2+-parameter lambda as (element, index, ...), which would
        # silently turn the coefficients into the array index.
        return lambda s: (s * a + b) % P

    return F.array(
        *[
            F.array_min(F.transform(shingle_hashes, perm(a, b)))
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
    )


def minhash_signature_sql(shingles: str) -> str:
    mins = ", ".join(
        f"list_min(list_transform({shingles}, s -> (s*{a} + {b}) % {P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"[{mins}]"


def lsh_band_keys(signature: Column, rows_per_band: int = 2) -> Column:
    """Band the signature for LSH: key_b = sig[2b]*P + sig[2b+1]
    (< P^2 ~ 1e18 < 2^63). Docs agreeing on ANY band key become
    candidates — the classic b-bands-of-r-rows S-curve."""
    n_bands = len(MINHASH_A) // rows_per_band
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.element_at(signature, b * rows_per_band + 1) * P
                    + F.element_at(signature, b * rows_per_band + 2)
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )


def lsh_band_keys_sql(sig: str, rows_per_band: int = 2) -> str:
    n_bands = len(MINHASH_A) // rows_per_band
    items = ", ".join(
        f"{{'band': {b}, 'key': {sig}[{b * rows_per_band + 1}]*{P}"
        f" + {sig}[{b * rows_per_band + 2}]}}"
        for b in range(n_bands)
    )
    return f"[{items}]"


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def jaccard_sql(a: str, b: str) -> str:
    return (
        f"len(list_intersect({a}, {b})) * 1.0 / "
        f"(len({a}) + len({b}) - len(list_intersect({a}, {b})))"
    )


def word_hash32(w: Column) -> Column:
    """16-bit word hash spread to 32 bits with a Knuth multiplicative
    step (x*2654435761 % 2^32) so every simhash bit carries signal."""
    return (word_hash(w) * F.lit(2654435761)) % F.lit(4294967296)


def simhash_from_wh32(wh32: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over a PRE-MATERIALIZED 32-bit token-hash array column
    (compute ``transform(words, word_hash32)`` and put an exchange
    between it and this — the expression below references the array
    twice, and an inlined transform would be recomputed): bit b is set
    when more tokens have bit b set than clear (tie -> clear), weighted
    by multiplicity.

    Scalar (single-Column) form — used by tests and one-off columns.
    The corpus-scale path is :func:`simhash_by_doc`: every HOF here is
    CodegenFallback (interpreted), so per-token work in this expression
    costs ~10x the same arithmetic in whole-stage codegen. Two
    interpreted rewrites were measured and REJECTED at sf0.1 before
    settling on explode+groupBy for the query path: a 32-counter-array
    accumulator (zip_with inside the merge = 64+ lambda calls/token,
    25s) and a packed struct-of-longs accumulator (one lambda/token but
    a ~150-node interpreted merge tree, 24.6s) vs 8.8s for this form —
    lambda/node dispatch dominates, not pass count."""
    n = F.size(wh32)

    def bit_test(b: int):
        # Closure factory (see minhash_signature for why not default-arg).
        return lambda x: F.shiftright(x, b) % 2 == 1

    out = F.lit(0)
    for b in range(bits):
        hits = F.size(F.filter(wh32, bit_test(b)))
        out = out + F.when(hits * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
    return out.cast("long")


def simhash_by_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    wh32_col: str = "wh32",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Corpus-scale SimHash: one (id, sim) row per input row.

    Relational formulation: explode the token-hash array and compute
    the ``bits`` per-bit counters as conditional SUMs in a single
    ``groupBy(id)`` — every operator (Generate, the shift/mod
    projection, partial + final HashAggregate) is whole-stage codegen,
    so per-token cost is JVM arithmetic, not interpreted HOF dispatch.
    Map-side partial aggregation collapses each document's tokens to
    one 33-column row before the shuffle (a document's tokens all sit
    in its own input row, so the partial agg is fully local); shuffle
    volume is O(docs), independent of document length. Measured 9x
    faster than the scalar-HOF form at sf0.1 (8.8s -> <1s for the
    hash stage) — see :func:`simhash_from_wh32` for the rejected
    interpreted alternatives.

    Row-count preserving: ``explode_outer`` keeps empty/null arrays as
    one NULL-token row; the NULL-ignoring conditional SUMs then yield
    sim=0 for them — the same answer the scalar ``simhash_from_wh32``
    gives, so the two forms stay interchangeable for any caller.
    """
    tok = df.select(id_col, F.explode_outer(wh32_col).alias("x"))
    counted = tok.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("x"), b) % 2).alias(f"_b{b}")
            for b in range(bits)
        ],
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"_b{b}") * 2 > F.col("n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return counted.select(id_col, sim.alias("sim"))


def simhash(words: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash straight from a words column (single-expression form,
    used by tests; the scaled query path goes through word_hash32 +
    a barrier + simhash_from_wh32 — see dedup_simhash)."""
    return simhash_from_wh32(F.transform(words, word_hash32), bits)


def word_hash32_sql(wh: str) -> str:
    """DuckDB: spread a 16-bit word-hash array to 32 bits (matches the
    Knuth multiplicative step inside :func:`simhash`)."""
    return f"list_transform({wh}, h -> (h * 2654435761) % 4294967296)"


def simhash_sql(wh32: str, bits: int = SIMHASH_BITS) -> str:
    """DuckDB rendering of :func:`simhash` over a PRE-SPREAD 32-bit
    word-hash array column (define it via :func:`word_hash32_sql` in a
    prior CTE)."""
    terms = " + ".join(
        f"CASE WHEN 2*len(list_filter({wh32}, x -> (x >> {b}) % 2 = 1))"
        f" > len({wh32}) THEN {1 << b} ELSE 0 END"
        for b in range(bits)
    )
    return f"({terms})::BIGINT"


SIMHASH_BAND_BITS = 8  # 4 bands of 8 bits over the 32-bit hash


def simhash_nibble_bands(sim: Column, bits: int = SIMHASH_BITS) -> Column:
    """Split a SimHash into 8-bit bands. Two hashes within Hamming
    distance 3 must agree on >=1 of the 4 bands (pigeonhole: 3 flipped
    bits touch at most 3 bands), so a band-equality join finds ALL such
    pairs without O(n^2). Band width is the bucket-count knob: 4-bit
    bands gave only 16 buckets per band and the self-join degenerated
    toward all-pairs (22s at sf0.1); 8-bit bands -> 256 buckets, 30x
    fewer candidates, same exactness."""
    w = SIMHASH_BAND_BITS
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                (F.shiftright(sim, i * w) % (1 << w)).alias("key"),
            )
            for i in range(bits // w)
        ]
    )


def simhash_nibble_bands_sql(sim: str, bits: int = SIMHASH_BITS) -> str:
    w = SIMHASH_BAND_BITS
    items = ", ".join(
        f"{{'band': {i}, 'key': ({sim} >> {i * w}) % {1 << w}}}"
        for i in range(bits // w)
    )
    return f"[{items}]"


def exact_dedup(df: DataFrame, cols: list[str], keep_order_col: str) -> DataFrame:
    """Exact dedup: one surviving row per distinct ``cols`` combination
    (lowest ``keep_order_col`` wins). Hash-shuffle on the dedup key —
    the Spark-native form of the reference's unique-key set (reference
    JobContext.cpp:347-353), but partial-aggregated map-side first."""
    return df.groupBy(*cols).agg(
        F.min(keep_order_col).alias("keeper"), F.count("*").alias("n_copies")
    )


def banded_rep_pairs(reps, band_keys, hash_cols: list[str]):
    """Banded-LSH candidate pairs between cluster representatives — the
    shared tail of every fingerprint-dedup family (image dHash, audio
    delta-sign, and any future hash): explode the per-rep band keys,
    self-join on (band_id, key) with the rep< tie-break, de-duplicate
    multi-band hits, and carry the hash columns through as
    ``{col}_a``/``{col}_b`` so the caller can apply its own Hamming
    verify. ``reps`` must have columns ``rep``, ``cnt`` and
    ``hash_cols``; ``band_keys`` is an array<struct<band_id, key>>
    column expression."""
    from pyspark.sql import functions as F

    bands = reps.select(
        "rep", *hash_cols, "cnt", F.explode(band_keys).alias("bk")
    ).select("rep", *hash_cols, "cnt", "bk.band_id", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    sel = [
        F.col("a.rep").alias("doc_a"),
        F.col("b.rep").alias("doc_b"),
        F.col("a.cnt").alias("cnt_a"),
        F.col("b.cnt").alias("cnt_b"),
    ]
    for c in hash_cols:
        sel.append(F.col(f"a.{c}").alias(f"{c}_a"))
        sel.append(F.col(f"b.{c}").alias(f"{c}_b"))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .select(*sel)
        .distinct()
    )
