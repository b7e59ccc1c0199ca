"""Round-12 third opinions, part 16 — the clustering-composed rows, the
IVF probe, the flagship TPC-H pair, and a genuinely independent decoder
for the audio rows, asserted equal to the engine at sf0.001 AND sf0.01:

- dedup_semantic_clusters: the SemDeDup prune recomputed on the shared
  serial-Lloyd trace (part 10's mirror) with the exact-integer
  squared-cosine threshold and the min-id representative rule;
- ann_cosine_ivf: 6dp label centroids, 3-probe selection, exact cosine
  ranking over the probed lists only;
- tpch_q1_pricing / tpch_q6_forecast_revenue: the headline bench rows'
  sums and filters replayed with fsum at their rounding grains;
- multimodal_audio_decode / multimodal_audio_energy: the production
  RIFF writer's actual bytes decoded with the STDLIB ``wave`` module —
  a third decoder implementation — and compared sample-for-sample to
  the analytic formula, then the 32-sample energy/zero-crossing
  windows rebuilt from those samples.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY
from tests.mirrors import round_half_up, seq_cosine
from tests.test_round11_embedding_thirdopinions import _load
from tests.test_round12_thirdopinions10 import serial_kmeans8

import mapreduceframework_spark.plans.ann_queries  # noqa: F401
import mapreduceframework_spark.plans.dedup_queries  # noqa: F401
import mapreduceframework_spark.plans.extension_queries  # noqa: F401
import mapreduceframework_spark.plans.join_queries  # noqa: F401
import mapreduceframework_spark.plans.multimodal_queries  # noqa: F401
import mapreduceframework_spark.plans.tpch_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

SEMDEDUP_EPS2_E6 = 160_000
AUD_RATES = (8000, 16000, 22050, 44100)


# ---------------------------------------------------------------------------
# dedup_semantic_clusters
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_semantic_clusters_match_serial_semdedup(spark, sf_dir):
    final, _, vecs = serial_kmeans8(sf_dir)
    qv_of = dict(vecs)
    by_cluster: dict[int, list[int]] = defaultdict(list)
    for vid, _ in vecs:
        by_cluster[final[vid]].append(vid)
    n2 = {vid: sum(x * x for x in qv) for vid, qv in vecs}

    dup = set()
    for cid, ids in by_cluster.items():
        ids.sort()
        for i, a in enumerate(ids):
            qa = qv_of[a]
            for b in ids[i + 1 :]:
                if b in dup:
                    continue
                dot = sum(x * y for x, y in zip(qa, qv_of[b]))
                if (
                    dot > 0
                    and 1_000_000 * dot * dot
                    >= SEMDEDUP_EPS2_E6 * n2[a] * n2[b]
                ):
                    dup.add(b)
    want = {vid: (final[vid], 1 if vid in dup else 0) for vid, _ in vecs}

    out = REGISTRY["dedup_semantic_clusters"].fn(spark, sf_dir).collect()
    got = {r["vec_id"]: (r["cid"], r["is_dup"]) for r in out}
    assert got == want
    assert any(d for _, d in want.values())  # the prune genuinely fires


# ---------------------------------------------------------------------------
# ann_cosine_ivf
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_ann_ivf_matches_python_probes(spark, sf_dir):
    vecs, labels = _load(sf_dir)
    by_label: dict[str, list[int]] = defaultdict(list)
    dims: dict[str, list[list[float]]] = defaultdict(list)
    for vid, v in vecs.items():
        by_label[labels[vid]].append(vid)
        dims[labels[vid]].append(v)
    cents = {
        lab: [
            round_half_up(math.fsum(v[i] for v in vs) / len(vs), 6)
            for i in range(len(vs[0]))
        ]
        for lab, vs in dims.items()
    }

    want = {}
    for q in sorted(vecs):
        if q >= 10:
            continue
        probes = sorted(
            cents,
            key=lambda lab: (-seq_cosine(vecs[q], cents[lab]), lab),
        )[:3]
        cand = [n for lab in probes for n in by_label[lab] if n != q]
        scored = sorted(
            ((-seq_cosine(vecs[q], vecs[n]), n) for n in cand)
        )[:5]
        for rank, (neg, n) in enumerate(scored, start=1):
            want[(q, n)] = (-neg, rank)

    out = REGISTRY["ann_cosine_ivf"].fn(spark, sf_dir).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"])
        for r in out
    }
    assert got == want


# ---------------------------------------------------------------------------
# tpch_q1 / tpch_q6
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_tpch_q1_matches_python_fsum(spark, sf_dir):
    import datetime

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    cut = datetime.datetime(2000, 9, 2)
    # The round-12 hardened exact contract (plans/exact.py): integer
    # sums in 1/1e2/1e4/1e6 units with ROUND-to-integer finishers.
    g: dict[tuple, list] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for fl, st, q, p, d, tx, sd in zip(
        t["l_returnflag"].to_pylist(),
        t["l_linestatus"].to_pylist(),
        t["l_quantity"].to_pylist(),
        t["l_extendedprice"].to_pylist(),
        t["l_discount"].to_pylist(),
        t["l_tax"].to_pylist(),
        t["l_shipdate"].to_pylist(),
    ):
        if sd > cut:
            continue
        c = g[(fl, st)]
        cents = int(round_half_up(p * 100, 0))
        d2 = int(round_half_up(d * 100, 0))
        t2 = int(round_half_up(tx * 100, 0))
        c[0] += int(round_half_up(q, 0))
        c[1] += cents
        c[2] += cents * (100 - d2)
        c[3] += cents * (100 - d2) * (100 + t2)
        c[4] += d2
        c[5] += 1

    def ihalf(s, div):
        # integer-domain half-up (plans/exact.py int_round_div)
        q = (abs(s) + div // 2) // div
        return -q if s < 0 else q

    def imean(s, mult, n):
        # r13 integer-domain mean finisher replay (plans/exact.py
        # int_round_mean): ROUND(s * mult / n) half-up with NO double
        # anywhere — (2*mult*s + n) // (2*n) on non-negative operands.
        return (2 * mult * s + n) // (2 * n)

    want = {}
    for k, (sq, sc, se4, se6, sd2, n) in g.items():
        want[k] = (
            float(sq),
            float(sc) / 100,
            ihalf(se4, 100) / 100.0,
            ihalf(se6, 10000) / 100.0,
            imean(sq, 10000, n) / 10000.0,
            imean(sc, 100, n) / 10000.0,
            imean(sd2, 100, n) / 10000.0,
            n,
        )
    out = REGISTRY["tpch_q1_pricing"].fn(spark, sf_dir).collect()
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"], r["sum_base_price"], r["sum_disc_price"],
            r["sum_charge"], r["avg_qty"], r["avg_price"], r["avg_disc"],
            r["count_order"],
        )
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_tpch_q6_matches_python_fsum(spark, sf_dir):
    import datetime

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    )
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    terms = [
        int(round_half_up(p * 100, 0)) * int(round_half_up(d * 100, 0))
        for sd, d, q, p in zip(
            t["l_shipdate"].to_pylist(),
            t["l_discount"].to_pylist(),
            t["l_quantity"].to_pylist(),
            t["l_extendedprice"].to_pylist(),
        )
        if lo <= sd < hi and 0.02 <= d <= 0.09 and q < 24
    ]
    want = (abs(sum(terms)) + 50) // 100 / 100.0
    out = REGISTRY["tpch_q6_forecast_revenue"].fn(spark, sf_dir).collect()
    assert len(out) == 1 and out[0]["revenue"] == want
    assert len(terms) > 0  # the filter selects something at every SF


# ---------------------------------------------------------------------------
# multimodal audio — stdlib wave as the third decoder
# ---------------------------------------------------------------------------


def _analytic_samples(doc_id: int) -> tuple[int, int, int, list[int]]:
    """(rate, channels, frames, u16 samples) per the documented
    contract: samples are (doc_id*31 + i*17) % 65536."""
    frames = doc_id % 50 + 10
    ch = doc_id % 2 + 1
    rate = AUD_RATES[doc_id % 4]
    n = frames * ch
    return rate, ch, frames, [(doc_id * 31 + i * 17) % 65536
                              for i in range(n)]


@pytest.mark.parametrize("sf_dir", SFS)
def test_audio_synth_decodes_with_stdlib_wave(spark, sf_dir):
    """The engine's RIFF writer and chunk-walking reader are currently
    only checked against EACH OTHER plus the analytic digest. Decode
    the writer's actual bytes with the stdlib ``wave`` module — a third,
    independent RIFF implementation — and compare sample-for-sample."""
    from pyspark.sql import functions as F

    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # Bounded collect: 500 tiny WAV payloads, test-side only.
    rows = M.synth_audio(docs.filter(F.col("doc_id") < 500)).collect()
    assert rows
    for r in rows:
        rate, ch, frames, want_u16 = _analytic_samples(r["doc_id"])
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getframerate() == rate
            assert w.getnchannels() == ch
            assert w.getnframes() == frames
            assert w.getsampwidth() == 2
            raw = w.readframes(frames)
        got_i16 = struct.unpack(f"<{frames * ch}h", raw)
        # wave yields signed 16-bit; the contract is the u16 stream.
        assert [x & 0xFFFF for x in got_i16] == want_u16


@pytest.mark.parametrize("sf_dir", SFS)
def test_audio_energy_matches_python_windows(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    want = {}
    for did in t["doc_id"].to_pylist():
        _, _, _, u16 = _analytic_samples(did)
        v = [x - 32768 for x in u16]
        for win in range((len(v) + 31) // 32):
            seg = v[win * 32 : win * 32 + 32]
            crossings = sum(
                1
                for a, b in zip(seg, seg[1:])
                if (a >= 0) != (b >= 0)
            )
            want[(did, win)] = (
                len(seg),
                sum(x * x for x in seg),
                crossings,
            )
    out = REGISTRY["multimodal_audio_energy"].fn(spark, sf_dir).collect()
    got = {
        (r["doc_id"], r["win_id"]): (
            r["n_samples"], r["energy"], r["crossings"]
        )
        for r in out
    }
    assert got == want


# (multimodal_audio_decode moved to the round-14 audio codec matrix
# — PCM16 / G.711 / IMA ADPCM; its mirror now lives in
# tests/test_round14_multimodal.py. The stdlib-wave and energy mirrors
# above still pin the PCM16 writer/decoder pair.)
