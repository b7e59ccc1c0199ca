"""Round-12 third opinions, part 18 — the multimodal family,
reconstructed in pure Python from the analytic pixel/sample contracts
AND (for the image codecs) re-decoded with an INDEPENDENT PNG/PPM
reader written here from the file-format specs (zlib + the five
scanline filters; netpbm tokenizer) — a third codec implementation
against the production writer's actual bytes, the image analogue of
part 16's stdlib-wave check. Asserted equal to the engine at sf0.001
AND sf0.01:

- multimodal_decode_features / multimodal_frame_sample /
  multimodal_scene_cuts / multimodal_resize: the byte-level plumbing
  contracts (checksums, frame grids, lag thresholds, block means);
- multimodal_image_decode: the analytic pixel digest, plus the
  independent decoder comparing every pixel of every synthesized
  payload;
- multimodal_phash_dedup: the full analytic dHash (grid, grayscale,
  bit packing), exact clustering, 4x16-bit banding, Hamming verify;
- multimodal_audio_fingerprint: the seeded delta-sign fingerprint,
  2x16-bit banding, Hamming verify.
"""

from __future__ import annotations

import zlib
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mapreduceframework_spark.plans.registry import REGISTRY

import mapreduceframework_spark.plans.multimodal_queries  # noqa: F401

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

M31 = 1_000_000_007


def _docs_text(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return list(
        zip(
            t["doc_id"].to_pylist(),
            t["text"].to_pylist(),
            t["n_chars"].to_pylist(),
        )
    )


# ---------------------------------------------------------------------------
# plumbing rows (byte-level contracts)
# ---------------------------------------------------------------------------


# (multimodal_decode_features moved to the round-14 image codec
# matrix; its mirror now lives in tests/test_round14_multimodal.py.)


def _frames_of(text: str) -> list[bytes]:
    bs = text.encode()
    return [bs[f * 16 : f * 16 + 16] for f in range((len(bs) + 15) // 16)]


@pytest.mark.parametrize("sf_dir", SFS)
def test_frame_sample_and_scene_cuts_match_python(spark, sf_dir):
    want_fs = {}
    want_sc = {}
    for did, text, _ in _docs_text(sf_dir):
        frames = _frames_of(text)
        cks = [sum(f) % 256 for f in frames]
        for i, f in enumerate(frames):
            if i % 2 == 0:
                want_fs[(did, i)] = (len(f), cks[i])
        for i in range(1, len(cks)):
            delta = abs(cks[i] - cks[i - 1])
            if delta > 160:
                want_sc[(did, i)] = (cks[i - 1], cks[i], delta)

    out = REGISTRY["multimodal_frame_sample"].fn(spark, sf_dir).collect()
    got_fs = {
        (r["doc_id"], r["frame_idx"]): (r["frame_bytes"],
                                        r["frame_checksum"])
        for r in out
    }
    assert got_fs == want_fs

    out2 = REGISTRY["multimodal_scene_cuts"].fn(spark, sf_dir).collect()
    got_sc = {
        (r["doc_id"], r["frame_idx"]): (r["prev_cks"], r["cks"], r["delta"])
        for r in out2
    }
    assert got_sc == want_sc
    assert want_sc  # the threshold genuinely fires somewhere


@pytest.mark.parametrize("sf_dir", SFS)
def test_resize_matches_python_block_means(spark, sf_dir):
    want = {}
    for did, text, _ in _docs_text(sf_dir):
        bs = text.encode()
        n = len(bs)
        if n < 8:
            continue
        digest = 0
        for j in range(8):
            lo, hi = (j * n) // 8, ((j + 1) * n) // 8
            mean = sum(bs[lo:hi]) // (hi - lo)
            digest = digest * 31 + mean
        want[did] = digest
    out = REGISTRY["multimodal_resize"].fn(spark, sf_dir).collect()
    got = {r["doc_id"]: r["resize_digest"] for r in out}
    assert all(r["out_w"] == 8 for r in out)
    assert got == want


# ---------------------------------------------------------------------------
# image decode — analytic digest + an independent PNG/PPM decoder
# ---------------------------------------------------------------------------


def _analytic_pixels(doc_id: int) -> tuple[int, int, bytes]:
    w = doc_id % 13 + 4
    h = doc_id % 7 + 3
    return w, h, bytes(
        (doc_id * 7 + i * 13) % 256 for i in range(w * h * 3)
    )


def _decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """Independent netpbm P6 reader: magic, whitespace-separated
    w/h/maxval, ONE whitespace byte, raw RGB."""
    assert data[:2] == b"P6"
    pos = 2
    fields = []
    while len(fields) < 3:
        while data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # netpbm comment: skip the line
            while data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    assert maxval == 255
    return w, h, data[pos : pos + w * h * 3]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Independent minimal PNG reader (spec-derived, not the
    production chunk walker): signature, IHDR, concatenated IDAT,
    zlib inflate, all five scanline filters."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            assert body[8] == 8 and body[9] == 2  # 8-bit RGB
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + body + crc
    raw = zlib.decompress(idat)
    stride = w * 3
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(h):
        filt = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if filt == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            assert filt == 0
        out += line
        prev = bytes(line)
    return w, h, bytes(out)


# (multimodal_image_decode moved to the round-14 image codec matrix;
# its mirror now lives in tests/test_round14_multimodal.py. The
# independent PNG/PPM reader below still pins the fixture WRITERS.)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_image_synth_decodes_with_independent_reader(spark, sf_dir):
    """The production PNG writer (cycling all five filters) and PPM
    writer, decoded by the spec-derived reader above — pixel for
    pixel against the analytic contract."""
    from pyspark.sql import functions as F

    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    rows = M.synth_images(docs.filter(F.col("doc_id") < 300)).collect()
    assert rows
    saw_png = saw_ppm = False
    for r in rows:
        did = r["doc_id"]
        w0, h0, px0 = _analytic_pixels(did)
        payload = bytes(r["payload"])
        if did % 2 == 0:
            w, h, px = _decode_png(payload)
            saw_png = True
        else:
            w, h, px = _decode_ppm(payload)
            saw_ppm = True
        assert (w, h) == (w0, h0)
        assert px == px0, f"pixel mismatch doc {did}"
    assert saw_png and saw_ppm


# ---------------------------------------------------------------------------
# perceptual-hash dedup / audio fingerprint — analytic + banded pairs
# ---------------------------------------------------------------------------


def _banded_rep_pairs(reps, band_keys_of):
    """reps: {rep: (hash_tuple, cnt)}; band_keys_of(hash) -> list of
    (band_id, key). Returns the distinct rep pairs sharing a bucket."""
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for rep, (hsh, _) in reps.items():
        for bk in band_keys_of(hsh):
            buckets[bk].append(rep)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                pairs.add((a, b))
    return pairs


def _popcount(x: int) -> int:
    return bin(x).count("1")


@pytest.mark.parametrize("sf_dir", SFS)
def test_phash_dedup_matches_python_dhash(spark, sf_dir):
    ids = [d for d, _, _ in _docs_text(sf_dir)]
    hashes = {}
    for did in ids:
        s, br = did % 293, (did // 293) % 5
        w, h = s % 13 + 4, s % 7 + 3
        a = []
        for y in range(8):
            for x in range(9):
                pi = (y * h // 8) * w + (x * w // 9)
                g = (
                    sum((s * 7 + (pi * 3 + c) * 13 + br) % 256
                        for c in range(3))
                ) // 3
                a.append(g)
        lo = hi = 0
        for k in range(32):
            if a[(k // 8) * 9 + (k % 8) + 1] > a[(k // 8) * 9 + (k % 8)]:
                lo |= 1 << k
        for k in range(32):
            kk = k + 32
            if a[(kk // 8) * 9 + (kk % 8) + 1] > a[(kk // 8) * 9 + (kk % 8)]:
                hi |= 1 << k
        hashes[did] = (lo, hi)

    groups: dict[tuple, list[int]] = defaultdict(list)
    for did, lh in hashes.items():
        groups[lh].append(did)
    reps = {
        min(dids): (lh, len(dids)) for lh, dids in groups.items()
    }
    rep_info = {rep: v for rep, v in reps.items()}

    def band_keys(lh):
        lo, hi = lh
        return [
            (0, lo % 65536), (1, lo // 65536),
            (2, hi % 65536), (3, hi // 65536),
        ]

    want = {}
    for a, b in _banded_rep_pairs(rep_info, band_keys):
        (lo_a, hi_a), cnt_a = rep_info[a]
        (lo_b, hi_b), cnt_b = rep_info[b]
        ham = _popcount(lo_a ^ lo_b) + _popcount(hi_a ^ hi_b)
        if ham <= 6:
            want[(a, b)] = (ham, cnt_a, cnt_b)

    out = REGISTRY["multimodal_phash_dedup"].fn(spark, sf_dir).collect()
    got = {
        (r["doc_a"], r["doc_b"]): (r["hamming"], r["cnt_a"], r["cnt_b"])
        for r in out
    }
    assert got == want


@pytest.mark.parametrize("sf_dir", SFS)
def test_audio_fingerprint_matches_python_deltas(spark, sf_dir):
    ids = [d for d, _, _ in _docs_text(sf_dir)]
    fps = {}
    for did in ids:
        s, g = did % 181, (did // 181) % 4
        n, ch = s % 50 + 10, s % 2 + 1
        fp = 0
        for j in range(32):
            v1 = (s * 31 + (((j + 1) * n // 33) * ch) * 4099 + g * 1024) \
                % 65536
            v0 = (s * 31 + ((j * n // 33) * ch) * 4099 + g * 1024) % 65536
            if v1 > v0:
                fp |= 1 << j
        fps[did] = fp

    groups: dict[int, list[int]] = defaultdict(list)
    for did, fp in fps.items():
        groups[fp].append(did)
    rep_info = {min(dids): ((fp,), len(dids)) for fp, dids in groups.items()}

    def band_keys(hsh):
        (fp,) = hsh
        return [(0, fp % 65536), (1, fp // 65536)]

    want = {}
    for a, b in _banded_rep_pairs(rep_info, band_keys):
        (fa,), cnt_a = rep_info[a]
        (fb,), cnt_b = rep_info[b]
        ham = _popcount(fa ^ fb)
        if ham <= 4:
            want[(a, b)] = (ham, cnt_a, cnt_b)

    out = REGISTRY["multimodal_audio_fingerprint"].fn(spark, sf_dir).collect()
    got = {
        (r["doc_a"], r["doc_b"]): (r["hamming"], r["cnt_a"], r["cnt_b"])
        for r in out
    }
    assert got == want
