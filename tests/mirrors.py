"""Shared pure-Python mirrors for the third-opinion test modules.

These deliberately RE-IMPLEMENT engine semantics (they are the
independent opinion — importing the production kernels would defeat
the point), but each mirror is written exactly once here so the test
modules cannot drift from each other.

Semantics pinned here, learned the hard way:
- Spark ``F.trim`` strips ASCII space (0x20) ONLY — not \\t/\\n;
- Spark ``F.split(str, regex)`` runs with limit -1, so EMPTY strings
  at either boundary survive (``re.split`` matches this exactly);
- Java's ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` — Python's ``\\s`` adds
  unicode spaces, so the explicit class is used everywhere;
- Spark ``F.round`` on doubles is BigDecimal-of-shortest-repr
  HALF_UP — ``Decimal(repr(x))``, never ``Decimal(x)``;
- ``F.aggregate`` dot products are SEQUENTIAL left folds — mirrored
  with a plain loop so IEEE sequences (and therefore thresholds and
  tiebreaks) match bit-for-bit; numpy's pairwise ``dot`` does NOT.
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")

WORD_HASH_MOD = 65_536
P = 1_000_000_007


def words_of(text: str | None) -> list[str] | None:
    """DOCS_CTE tokenization: None for blank docs (filtered out), else
    the Java-split token list with boundary empties kept."""
    t = text.strip(" ") if text is not None else ""
    if not t:
        return None
    return JAVA_WS.split(t)


def ws_token_count(text: str | None) -> int:
    """operators/text.whitespace_token_count's exact semantics."""
    t = text.strip(" ") if text is not None else ""
    if not t:
        return 0
    return len(JAVA_WS.split(t))


def word_hash(w: str) -> int:
    """operators/dedup.word_hash: (len*2654435761 + first*97 + last)
    % 65536, with ascii('') == 0 as in both engines."""
    first = ord(w[0]) if w else 0
    last = ord(w[-1]) if w else 0
    return (len(w) * 2654435761 + first * 97 + last) % WORD_HASH_MOD


def word_hash32(w: str) -> int:
    """operators/dedup.word_hash32: Knuth spread to 32 bits."""
    return (word_hash(w) * 2654435761) % 4294967296


def hashed_shingles(words: list[str], n: int = 3) -> set[int]:
    """operators/dedup.hashed_shingles: DISTINCT base-65536 folds of
    n consecutive word hashes, mod P."""
    hs = [word_hash(w) for w in words]
    if len(hs) < n:
        return set()
    out = set()
    for i in range(len(hs) - n + 1):
        acc = hs[i]
        for k in range(1, n):
            acc = acc * WORD_HASH_MOD + hs[i + k]
        out.add(acc % P)
    return out


def string_shingles(words: list[str], n: int = 3) -> list[str]:
    """operators/dedup.string_shingles_all: space-joined n-grams, in
    order, duplicates KEPT."""
    if len(words) < n:
        return []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def round_half_up(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def seq_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def seq_cosine(a: list[float], b: list[float]) -> float | None:
    """Sequential-fold cosine, IEEE-identical to the engines' plans.

    Returns None for a zero-norm vector — the production queries
    exclude degenerate embeddings with an exact norm>0 predicate on
    both engine sides (the Welch divide-by-zero convention), so the
    mirror reports "excluded" rather than raising ZeroDivisionError.
    """
    import math

    denom = math.sqrt(seq_dot(a, a)) * math.sqrt(seq_dot(b, b))
    if denom == 0.0:
        return None
    return seq_dot(a, b) / denom


def trade_edge_counts(sf_dir: str) -> dict[tuple[str, str], int]:
    """(customer-nation -> supplier-nation) trade-pair row counts via
    the same 5-way star join the graph queries derive edges from,
    evaluated with plain dicts. ``set(result)`` is the DISTINCT edge
    list (TRADE_EDGES_CTE); ``1 + cnt % 7`` is the SSSP edge weight
    (TRADE_WEDGES_CTE) — both derivations cross-checked from one walk."""
    import pyarrow.parquet as pq
    from collections import Counter

    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    s = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    n = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nation = dict(zip(n["n_nationkey"].to_pylist(), n["n_name"].to_pylist()))
    cust_nation = {
        int(k): nation[nk]
        for k, nk in zip(
            c["c_custkey"].to_pylist(), c["c_nationkey"].to_pylist()
        )
    }
    supp_nation = {
        int(k): nation[nk]
        for k, nk in zip(
            s["s_suppkey"].to_pylist(), s["s_nationkey"].to_pylist()
        )
    }
    order_cust = {
        int(ok): int(ck)
        for ok, ck in zip(
            o["o_orderkey"].to_pylist(), o["o_custkey"].to_pylist()
        )
    }
    counts: Counter[tuple[str, str]] = Counter()
    for ok, sk in zip(
        li["l_orderkey"].to_pylist(), li["l_suppkey"].to_pylist()
    ):
        ck = order_cust.get(int(ok))
        if ck is None:
            continue
        counts[(cust_nation[ck], supp_nation[int(sk)])] += 1
    return dict(counts)


def bounded_relax(
    edges: dict[tuple[str, str], int], rounds: int
) -> dict[str, int | None]:
    """Serial bounded Bellman-Ford mirror of the graph_bfs_distances /
    graph_sssp_weighted recurrence: d0 = 0 at the lexicographically
    smallest node, None elsewhere; d_{t+1}(v) = min(d_t(v),
    min over in-edges (u, v, w) of d_t(u) + w). BFS is the w ≡ 1
    special case. Exact integers throughout."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    seed = nodes[0]
    d: dict[str, int | None] = {v: (0 if v == seed else None) for v in nodes}
    for _ in range(rounds):
        nd: dict[str, int] = {}
        for (u, v), w in edges.items():
            du = d[u]
            if du is None:
                continue
            cand = du + w
            if v not in nd or cand < nd[v]:
                nd[v] = cand
        d = {
            v: (
                min(x for x in (d[v], nd.get(v)) if x is not None)
                if (d[v] is not None or v in nd)
                else None
            )
            for v in nodes
        }
    return d


def ts_us(arrow_col) -> np.ndarray:
    """Arrow timestamp column -> int64 epoch microseconds."""
    return (
        arrow_col.cast("timestamp[us]").to_numpy()
        .astype("datetime64[us]").astype(np.int64)
    )


def minhash_candidates(
    doc_shingles: dict[int, set[int]],
    a_coeffs: tuple[int, ...],
    b_coeffs: tuple[int, ...],
) -> set[tuple[int, int]]:
    """LSH band-bucket candidate pairs (doc_a < doc_b) over hashed
    shingle sets: 8-perm signature, bands of 2 rows, pairs sharing any
    (band, key) bucket — the shared front half of the MinHash family."""
    from collections import defaultdict

    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for did, s in doc_shingles.items():
        sig = [
            min((x * a + b) % P for x in s)
            for a, b in zip(a_coeffs, b_coeffs)
        ]
        for band in range(len(a_coeffs) // 2):
            buckets[
                (band, sig[2 * band] * P + sig[2 * band + 1])
            ].append(did)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cand.add((a, b))
    return cand


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (the single standard definition both
    engines implement)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]
