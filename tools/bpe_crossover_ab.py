#!/usr/bin/env python
"""Measure the codegen-vs-Arrow BPE encoder crossover (VERDICT r10
item 6).

`operators/text.py` ships two interchangeable encoders for the
vocab-table BPE plan (encode DISTINCT words once, join counts back):

- the EXPRESSION encoder (`bpe_encode`): one codegen string pass per
  merge — cost grows linearly with the merge-table size M;
- the ARROW encoder (`bpe_token_count_arrow`): min-rank greedy loop
  with dict lookups — cost is O(applied merges x word length) per
  word, INDEPENDENT of M.

This tool times both on the same distinct-word workload (sf0.1
documents vocabulary) across a ladder of merge-table sizes, so the
"swap encoders at production vocab size" recommendation in the seam
comment is a measured crossover, not an assertion. Merge tables beyond
the repo's 48 are learned here with the classic Sennrich trainer over
the corpus word frequencies — real merges, so the greedy loop does
representative work (a synthetic non-matching table would flatter the
Arrow path).

Usage:
    python tools/bpe_crossover_ab.py [--n 5] [--max-merges 1024] \
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON line per (M, encoder) cell: median/min/max seconds,
plus a final summary naming the crossover M. Results recorded in
BASELINE.md ("Arrow-BPE crossover" note).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def train_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE trainer (Sennrich et al. 2016): count adjacent
    symbol pairs over the word-frequency table, merge the most
    frequent, repeat; ties broken count-DESC then pair-ASC — the same
    convention the repo's 48-merge table was learned with
    (operators/text.py:170)."""
    vocab = {tuple(w): c for w, c in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def greedy_tokens(word: str, rank: dict[tuple[str, str], int]) -> int:
    """Min-rank greedy merge loop (the Arrow path's per-word kernel,
    parameterized by rank table instead of the module global)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = rank.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def main() -> int:
    args = sys.argv[1:]
    n, max_merges, sf_dir = 5, 1024, "/root/testdata/sf0.1"
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        elif args[i] == "--max-merges":
            max_merges = int(args[i + 1])
            i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            print(__doc__)
            return 2

    from pyspark.sql import functions as F

    from mapreduceframework_spark.plans.corpus import _docs
    from mapreduceframework_spark.session import get_session

    spark = get_session(app_name="bpe-crossover-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # The vocab-table workload both encoders run on: distinct lowercase
    # letter runs of the corpus with their frequencies (the
    # text_bpe_vocab_counts plan's inner table).
    words = (
        _docs(spark, sf_dir)
        .select(F.explode("words").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = [(r["w"], r["cnt"]) for r in words.collect()]
    print(
        f"# vocab: {len(vocab)} distinct words, "
        f"{sum(c for _, c in vocab)} occurrences",
        file=sys.stderr,
    )
    merges = train_merges(vocab, max_merges)
    print(f"# trained {len(merges)} merges", file=sys.stderr)

    ladder = [m for m in (48, 128, 256, 512, 1024) if m <= len(merges)]
    if len(merges) not in ladder and len(merges) < max_merges:
        ladder.append(len(merges))  # trainer exhausted pairs early

    # Re-materialize the word table once as parquet so every timed cell
    # pays the identical scan (not a cached/uncached asymmetry).
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bpe_ab_")
    words.write.mode("overwrite").parquet(f"{tmp}/vocab")

    def expr_cell(m: int) -> float:
        df = spark.read.parquet(f"{tmp}/vocab")
        s = F.regexp_replace(F.lower(F.col("w")), r"\|", "")
        s = F.regexp_replace(s, "(?s)(.)", "|$1|")
        for a, b in merges[:m]:
            s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
        units = (
            F.length(s)
            - F.length(F.replace(s, F.lit("||"), F.lit("|")))
            + 1
        )
        t0 = time.monotonic()
        df.select(
            F.sum(F.col("cnt") * units).alias("total")
        ).collect()
        return time.monotonic() - t0

    def arrow_cell(m: int) -> float:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        rank = {p: r for r, p in enumerate(merges[:m])}

        @pandas_udf("long")
        def tok(ws: pd.Series) -> pd.Series:
            return ws.map(lambda w: greedy_tokens(w, rank)).astype(
                "Int64"
            )

        df = spark.read.parquet(f"{tmp}/vocab")
        t0 = time.monotonic()
        df.select(
            F.sum(F.col("cnt") * tok(F.col("w"))).alias("total")
        ).collect()
        return time.monotonic() - t0

    # Correctness guard: both encoders must agree on total tokens at
    # every ladder point before their timings mean anything.
    for m in ladder:
        rank = {p: r for r, p in enumerate(merges[:m])}
        py_total = sum(c * greedy_tokens(w, rank) for w, c in vocab)
        df = spark.read.parquet(f"{tmp}/vocab")
        s = F.regexp_replace(F.lower(F.col("w")), r"\|", "")
        s = F.regexp_replace(s, "(?s)(.)", "|$1|")
        for a, b in merges[:m]:
            s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
        units = (
            F.length(s)
            - F.length(F.replace(s, F.lit("||"), F.lit("|")))
            + 1
        )
        spark_total = df.select(
            F.sum(F.col("cnt") * units)
        ).collect()[0][0]
        assert spark_total == py_total, (m, spark_total, py_total)
    print("# encoder equality holds at every ladder point", file=sys.stderr)

    results: dict[int, dict[str, float]] = {}
    for m in ladder:
        cells: dict[str, list[float]] = {"expr": [], "arrow": []}
        for _ in range(n):  # interleaved: same host conditions per pair
            cells["expr"].append(expr_cell(m))
            cells["arrow"].append(arrow_cell(m))
        row = {}
        for k, v in cells.items():
            row[k] = statistics.median(v)
            print(
                json.dumps(
                    {
                        "merges": m,
                        "encoder": k,
                        "median": round(statistics.median(v), 3),
                        "min": round(min(v), 3),
                        "max": round(max(v), 3),
                        "n": n,
                    }
                )
            )
        results[m] = row

    crossover = next(
        (m for m in ladder if results[m]["expr"] > results[m]["arrow"]),
        None,
    )
    print(
        json.dumps(
            {
                "summary": "bpe-crossover",
                "ladder": ladder,
                "crossover_merges": crossover,
                "ratios_expr_over_arrow": {
                    m: round(r["expr"] / r["arrow"], 2)
                    for m, r in results.items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
