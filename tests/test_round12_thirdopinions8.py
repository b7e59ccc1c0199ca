"""Round-12 third opinions, part 8 — the deterministic-sampling family
reconstructed in pure Python from raw parquet (every row is RNG-free by
design: affine hashes and salted md5 unit-hashes, so a dict-and-hashlib
reconstruction must agree bit for bit), asserted equal to the engine at
sf0.001 AND sf0.01:

- sample_deterministic: the affine ~10% hash bucket;
- split_train_val_test: the shared 80/10/10 bucket thresholds and the
  per-split doc/char tallies;
- sample_mixture_by_source: tiered keep rates over the same bucket;
- sample_temperature_mixture: sqrt-weight e6 quantization, the exact
  integer normalizer, the salted md5 unit-hash keep rule;
- sample_negative_pairs: the 4-slot affine negative draw with
  self-collision drop;
- sample_weighted_reservoir: Efraimidis-Spirakis keys ln(u)/w over the
  10,000-value md5 grid, per-source top-3 with the doc_id tie-break;
- sample_epoch_shuffle: epoch-salted affine keys, shard assignment,
  and within-shard positions;
- sample_importance_dsir: hashing-trick unigram+bigram features, the
  add-1 quantized log-likelihood-ratio model, per-doc mean-LLR
  scoring, deterministic top-100.

hashlib.md5 is the third engine's md5; math.log/math.sqrt carry the
same boundary-distance argument as the entropy mirror (asserted where
a rounding boundary could bite).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up

import mapreduceframework_spark.plans.sampling_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

TEMP_TARGET = 250
RESERVOIR_K = 3
SHUFFLE_EPOCHS = 3
SHUFFLE_SHARDS = 16
DSIR_BUCKETS = 8192
DSIR_TOPK = 100
SPLIT_WS = re.compile(r"[ \t\n\r\f]+")  # the DSIR split class (no \x0B)


def _docs_table(sf_dir, cols):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=cols)


def _bucket(doc_id: int) -> int:
    return (doc_id * 2654435761 + 40503) % 1000


def _split_of(key: int) -> str:
    b = _bucket(key)
    return "train" if b < 800 else ("val" if b < 900 else "test")


def _md5_unit_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ln_e6(x: float) -> int:
    v = math.log(x) * 1_000_000
    frac = abs(v - math.floor(v) - 0.5)
    assert v == 0.0 or frac > 1e-6, f"ln_e6 boundary hazard at {x}"
    return int(round_half_up(v, 0))


# ---------------------------------------------------------------------------
# sample_deterministic / split_train_val_test / sample_mixture_by_source
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_sample_deterministic_matches_python_bucket(spark, sf_dir):
    ids = _docs_table(sf_dir, ["doc_id"])["doc_id"].to_pylist()
    want = {d: _bucket(d) for d in ids if _bucket(d) < 100}
    out = REGISTRY["sample_deterministic"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: r["bucket"] for r in out}
    assert got == want
    # ~10% of the corpus, genuinely exercised.
    assert 0 < len(want) < len(ids)


@pytest.mark.parametrize("sf_dir", SFS)
def test_split_train_val_test_matches_python_tallies(spark, sf_dir):
    t = _docs_table(sf_dir, ["doc_id", "n_chars"])
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for d, nc in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
        c = want[_split_of(d)]
        c[0] += 1
        c[1] += nc
    out = REGISTRY["split_train_val_test"].fn(spark, sf_dir).collect()
    got = {r["split"]: [r["n_docs"], r["n_chars"]] for r in out}
    assert got == dict(want)
    assert set(got) == {"train", "val", "test"}


@pytest.mark.parametrize("sf_dir", SFS)
def test_mixture_by_source_matches_python_tiers(spark, sf_dir):
    t = _docs_table(sf_dir, ["doc_id", "source"])
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for d, src in zip(t["doc_id"].to_pylist(), t["source"].to_pylist()):
        sid = int(src[3:])
        rate = 900 if sid < 5 else (500 if sid < 10 else (200 if sid < 15
                                                          else 50))
        c = want[src]
        c[0] += 1
        if _bucket(d) < rate:
            c[1] += 1
    out = REGISTRY["sample_mixture_by_source"].fn(spark, sf_dir).collect()
    got = {r["source"]: [r["n_total"], r["n_kept"]] for r in out}
    assert got == dict(want)


# ---------------------------------------------------------------------------
# sample_temperature_mixture
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_temperature_mixture_matches_python_weights(spark, sf_dir):
    t = _docs_table(sf_dir, ["doc_id", "lang"])
    ids = t["doc_id"].to_pylist()
    langs = t["lang"].to_pylist()
    cnt: dict[str, int] = defaultdict(int)
    for lg in langs:
        cnt[lg] += 1
    w_e6 = {
        lg: int(round_half_up(math.sqrt(float(c)) * 1_000_000, 0))
        for lg, c in cnt.items()
    }
    tot_e6 = sum(w_e6.values())

    want: dict[str, list[int]] = {}
    for d, lg in zip(ids, langs):
        unit = (_md5_unit_int("t" + str(d)) % 10000) / 10000.0
        keep_prob = min(
            1.0,
            float(TEMP_TARGET * w_e6[lg]) / float(tot_e6 * cnt[lg]),
        )
        if unit < keep_prob:
            c = want.setdefault(lg, [cnt[lg], w_e6[lg], 0, 0])
            c[2] += 1
            c[3] += d

    out = REGISTRY["sample_temperature_mixture"].fn(spark, sf_dir).collect()
    got = {
        r["lang"]: [r["n_before"], r["w_e6"], r["n_kept"], r["kept_id_sum"]]
        for r in out
    }
    assert got == want
    # The temperature recipe's point: the dominant language is kept at
    # a strictly lower rate than the rarest one.
    rates = {
        lg: want[lg][2] / want[lg][0] for lg in want if want[lg][0] > 0
    }
    big = max(cnt, key=lambda lg: cnt[lg])
    small = min(cnt, key=lambda lg: cnt[lg])
    if big in rates and small in rates and cnt[big] > 2 * cnt[small]:
        assert rates[big] < rates[small]


# ---------------------------------------------------------------------------
# sample_negative_pairs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_negative_pairs_matches_python_affine_draw(spark, sf_dir):
    ids = _docs_table(sf_dir, ["doc_id"])["doc_id"].to_pylist()
    n = len(ids)
    want = {
        (d, slot): (d * 2654435761 + slot * 40503) % n
        for d in ids
        for slot in (1, 2, 3, 4)
        if (d * 2654435761 + slot * 40503) % n != d
    }
    out = REGISTRY["sample_negative_pairs"].fn(spark, sf_dir).collect()
    got = {(r["doc_id"], r["slot"]): r["neg_id"] for r in out}
    assert got == want


# ---------------------------------------------------------------------------
# sample_weighted_reservoir
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_weighted_reservoir_matches_python_es_keys(spark, sf_dir):
    t = _docs_table(sf_dir, ["doc_id", "source", "n_chars"])
    per_src: dict[str, list] = defaultdict(list)
    for d, src, nc in zip(
        t["doc_id"].to_pylist(),
        t["source"].to_pylist(),
        t["n_chars"].to_pylist(),
    ):
        if nc <= 0:
            continue
        k = _md5_unit_int("r" + str(d)) % 10000 + 1
        ln_key = _ln_e6(k / 10001.0)
        per_src[src].append((d, nc, ln_key))

    want = {}
    for src, rows in per_src.items():
        # Order by ln_key/w DESC then doc_id: float of exact ints, the
        # same IEEE division the engines run.
        rows.sort(key=lambda r: (-(float(r[2]) / float(r[1])), r[0]))
        for rk, (d, nc, ln_key) in enumerate(rows[:RESERVOIR_K], start=1):
            want[(src, d)] = (nc, ln_key, rk)

    out = REGISTRY["sample_weighted_reservoir"].fn(spark, sf_dir).collect()
    got = {
        (r["source"], r["doc_id"]): (r["weight"], r["ln_key_e6"], r["rk"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# sample_epoch_shuffle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_epoch_shuffle_matches_python_manifest(spark, sf_dir):
    ids = _docs_table(sf_dir, ["doc_id"])["doc_id"].to_pylist()
    shards: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    for d in ids:
        for ep in range(SHUFFLE_EPOCHS):
            kh = (d * 2654435761 + ep * 1000003 + 40503) % 1000000007
            shards[(ep, kh % SHUFFLE_SHARDS)].append((kh, d))
    want = {}
    for (ep, sh), rows in shards.items():
        rows.sort()
        for pos, (_, d) in enumerate(rows, start=1):
            want[(ep, d)] = (sh, pos)

    out = REGISTRY["sample_epoch_shuffle"].fn(spark, sf_dir).collect()
    got = {(r["epoch"], r["doc_id"]): (r["shard"], r["pos"]) for r in out}
    assert got == want
    # Fresh permutation per epoch: at least one doc changes shard.
    assert any(
        want[(0, d)][0] != want[(1, d)][0] for d in ids
    )


# ---------------------------------------------------------------------------
# sample_importance_dsir
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_dsir_matches_python_llr_model(spark, sf_dir):
    t = _docs_table(sf_dir, ["doc_id", "lang", "text"])
    feats: list[tuple[int, str, int]] = []  # (doc_id, lang, bucket)
    for d, lg, text in zip(
        t["doc_id"].to_pylist(),
        t["lang"].to_pylist(),
        t["text"].to_pylist(),
    ):
        s = (text or "").strip(" ")
        if not s:
            continue
        ws = SPLIT_WS.split(s)
        grams = list(ws)
        grams += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        for g in grams:
            feats.append((d, lg, _md5_unit_int(g) % DSIR_BUCKETS))

    c_raw: dict[int, int] = defaultdict(int)
    c_tgt: dict[int, int] = defaultdict(int)
    for _, lg, hb in feats:
        c_raw[hb] += 1
        if lg == "en":
            c_tgt[hb] += 1
    model = {
        hb: _ln_e6(float(c_tgt.get(hb, 0) + 1)) - _ln_e6(float(cr + 1))
        for hb, cr in c_raw.items()
    }

    per_doc: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for d, _, hb in feats:
        c = per_doc[d]
        c[0] += 1
        c[1] += model[hb]
    scored = [
        (d, n, s, float(s) / float(n * 1_000_000))
        for d, (n, s) in per_doc.items()
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    want = [(d, n, s, llr) for d, n, s, llr in scored[:DSIR_TOPK]]

    out = REGISTRY["sample_importance_dsir"].fn(spark, sf_dir).collect()
    got = [
        (r["doc_id"], r["n_feats"], r["sum_w_e6"], r["llr_per_feat"])
        for r in out
    ]
    assert got == want
