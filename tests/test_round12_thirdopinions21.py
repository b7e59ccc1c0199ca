"""Round-12 third opinions, part 21 — the BPE-consuming rows and the
substring-dedup pair, completing the registry's mirror coverage.
The BPE routes reuse tests/test_text_semantics.py's independent
min-rank reference encoder (already proven equal to the engines'
49-pass replace chain on the corpus AND on adversarial inputs), so
each row here is triangulated: replace-chain engine vs replace-chain
DuckDB vs the greedy reference tokenizer. Asserted equal at sf0.001
AND sf0.01:

- text_bpe_tokenize: per-doc whitespace + BPE token counts;
- text_bpe_vocab_counts: the vocabulary-table decomposition (per-word
  encodes summed per doc) — the 100 TB plan shape;
- pack_bpe_chunks: the shard-cumulative packing manifest budgeted in
  exact BPE tokens;
- dedup_substring_chunks: stride-8 chunk grids, global first-occurrence
  keeps, md5 kept-digests;
- dedup_substring_phase_pairs: the stride-8 index x stride-1 probe
  join with per-pair distinct chunk/window counts.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import words_of, ws_token_count
from tests.test_text_semantics import ref_bpe_token_count

import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.text_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

PACK_BUDGET = 256
PACK_SHARDS = 8
C = 8  # SUBSTRING_CHUNK


def _docs(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.mark.parametrize("sf_dir", SFS)
def test_bpe_tokenize_matches_reference_encoder(spark, sf_dir):
    want = {
        did: (ws_token_count(text), ref_bpe_token_count(text or ""))
        for did, text in _docs(sf_dir)
    }
    out = REGISTRY["text_bpe_tokenize"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_bpe_vocab_counts_match_reference_decomposition(spark, sf_dir):
    want = {}
    for did, text in _docs(sf_dir):
        ws = words_of(text)
        if ws is None:
            continue
        want[did] = (
            len(ws),
            sum(ref_bpe_token_count(w) for w in ws),
        )
    out = REGISTRY["text_bpe_vocab_counts"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in out}
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_pack_bpe_chunks_match_reference_manifest(spark, sf_dir):
    shards: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for did, text in _docs(sf_dir):
        shards[did % PACK_SHARDS].append(
            (did, ref_bpe_token_count(text or ""))
        )
    want: dict[tuple[int, int], list] = {}
    for sh, rows in shards.items():
        rows.sort()
        cum = 0
        for did, toks in rows:
            cum += toks
            if toks <= 0:
                continue
            cid = (cum - 1) // PACK_BUDGET
            c = want.setdefault((sh, cid), [0, 0, did, did])
            c[0] += 1
            c[1] += toks
            c[2] = min(c[2], did)
            c[3] = max(c[3], did)
    out = REGISTRY["pack_bpe_chunks"].fn(spark, sf_dir).collect()
    got = {
        (r["shard"], r["chunk_id"]): [
            r["n_docs"], r["total_tokens"], r["first_doc"], r["last_doc"]
        ]
        for r in out
    }
    assert got == {k: list(v) for k, v in want.items()}


def _chunk_grid(ws: list[str]) -> list[str]:
    """ceil-grid stride-C chunks, trailing short chunk kept."""
    n = (len(ws) + C - 1) // C
    return [" ".join(ws[i * C : (i + 1) * C]) for i in range(n)]


@pytest.mark.parametrize("sf_dir", SFS)
def test_substring_chunk_dedup_matches_python(spark, sf_dir):
    grids = {}
    for did, text in _docs(sf_dir):
        ws = words_of(text)
        if ws is None:
            continue
        grids[did] = _chunk_grid(ws)
    # Global first occurrence per chunk text, ordered by (doc_id, pos).
    first: dict[str, tuple[int, int]] = {}
    for did in sorted(grids):
        for pos, ch in enumerate(grids[did], start=1):
            if ch not in first or (did, pos) < first[ch]:
                first[ch] = (did, pos)
    want = {}
    for did, chunks in grids.items():
        kept = [
            ch
            for pos, ch in enumerate(chunks, start=1)
            if first[ch] == (did, pos)
        ]
        digest = hashlib.md5(" ".join(kept).encode()).hexdigest() if kept \
            else hashlib.md5(b"").hexdigest()
        want[did] = (len(chunks), len(kept), digest)
    out = REGISTRY["dedup_substring_chunks"].fn(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_digest"])
        for r in out
    }
    assert got == want
    # dedup genuinely fires: some doc loses a chunk to an earlier one.
    assert any(nk < nc for nc, nk, _ in want.values())


@pytest.mark.parametrize("sf_dir", SFS)
def test_substring_phase_pairs_match_python(spark, sf_dir):
    words = {}
    for did, text in _docs(sf_dir):
        ws = words_of(text)
        if ws is not None:
            words[did] = ws
    # index: FULL stride-C chunks only (len//C), 1-based pos
    index: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for did, ws in words.items():
        for i in range(1, len(ws) // C + 1):
            index[" ".join(ws[(i - 1) * C : i * C])].append((did, i))
    want: dict[tuple[int, int], list[set]] = defaultdict(
        lambda: [set(), set()]
    )
    for did, ws in words.items():
        if len(ws) < C:
            continue
        for j in range(1, len(ws) - C + 2):
            gram = " ".join(ws[j - 1 : j - 1 + C])
            for src, pos in index.get(gram, ()):
                if did > src:
                    c = want[(src, did)]
                    c[0].add(pos)
                    c[1].add(j)
    out = (
        REGISTRY["dedup_substring_phase_pairs"].fn(spark, sf_dir).collect()
    )
    got = {
        (r["doc_src"], r["doc_dup"]): (r["n_src_chunks"],
                                       r["n_dup_windows"])
        for r in out
    }
    assert got == {
        k: (len(a), len(b)) for k, (a, b) in want.items()
    }
    assert got  # planted near-dups exist at both SFs
