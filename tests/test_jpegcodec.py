"""Round-13 tests for the pure-Python baseline JPEG codec
(operators/imagecodec.py) — the JPEG half of the external-codec seam,
closed the way r10 closed PNG.

Evidence layers:
- a THIRD-OPINION IDCT: the decoder's 8x8 inverse transform checked
  against a from-the-formula naive O(64^2) implementation written
  here (independent code path, same T.81 A.3.3 definition);
- encoder->decoder round trips at tolerances DERIVED from the quant
  tables (solid blocks must be exact: the DC step at the default
  quality is <= 16, and a solid block's only nonzero coefficient is
  DC, so reconstruction error <= step/16 < 1);
- stream-feature coverage the fixture corpus can't give: 4:2:0
  subsampled chroma, restart markers (DRI/RSTn with predictor reset),
  16-bit DQT re-serialization, multi-table DHT segments;
- the documented seam: progressive SOF2 raises NotImplementedError;
- the Spark side: decode through the same mapInPandas plumbing the
  multimodal family uses.
"""

from __future__ import annotations

import math
import struct

import pytest

from mapreduceframework_spark.operators import imagecodec as IC
from mapreduceframework_spark.operators.multimodal import (
    decode_image,
    decode_payload,
)


def _maxerr(a: bytes, b: bytes) -> int:
    assert len(a) == len(b)
    return max(abs(x - y) for x, y in zip(a, b))


def _naive_idct(coef):
    """Independent IDCT straight from T.81 A.3.3 — no shared tables
    with the production code (recomputes every cosine)."""
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                for v in range(8):
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u * 8 + v]
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                    )
            out[y * 8 + x] = s / 4.0
    return out


def test_idct_matches_independent_formula():
    # Deterministic pseudo-random coefficient block (no RNG state).
    coef = [((i * 37 + 11) % 101) - 50.0 for i in range(64)]
    got = IC._idct_block(coef)
    want = _naive_idct(coef)
    assert max(abs(g - w) for g, w in zip(got, want)) < 1e-9


def test_fdct_idct_are_inverses():
    blk = [((i * 53 + 7) % 256) - 128.0 for i in range(64)]
    back = IC._idct_block(IC._fdct_block(blk))
    assert max(abs(a - b) for a, b in zip(blk, back)) < 1e-9


def test_zigzag_is_a_permutation_with_standard_head():
    assert len(IC._ZIGZAG) == 64
    assert len(set(IC._ZIGZAG)) == 64
    # The standard scan's first diagonal steps (T.81 Figure A.6).
    assert IC._ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert IC._ZIGZAG[-1] == (7, 7)


@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (10, 6), (17, 23)])
def test_gray_solid_blocks_roundtrip_exact(w, h):
    # Solid block -> only the DC coefficient is nonzero; DC quant step
    # at the default quality is <= 16 so the error is < 1 -> exact.
    for val in (0, 77, 128, 255):
        j = IC.encode_jpeg(w, h, bytes([val] * (w * h)), channels=1)
        assert IC.decode_jpeg(j) == (w, h, 1, bytes([val] * (w * h)))


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_rgb_solid_roundtrip_within_color_convert_grain(subsampling):
    px = bytes([200, 30, 90] * (19 * 13))
    j = IC.encode_jpeg(19, 13, px, subsampling=subsampling)
    w, h, c, out = IC.decode_jpeg(j)
    assert (w, h, c) == (19, 13, 3)
    # YCbCr forward+inverse rounding costs at most 2 per channel on a
    # solid image (no DCT error: all blocks constant).
    assert _maxerr(out, px) <= 2


def test_gray_gradient_high_quality_tight():
    w, h = 33, 17
    px = bytes(min(255, x * 3 + y * 5) for y in range(h) for x in range(w))
    j = IC.encode_jpeg(w, h, px, channels=1, quality=95)
    _, _, _, out = IC.decode_jpeg(j)
    assert _maxerr(out, px) <= 2


def test_restart_markers_decode_identically():
    w, h = 33, 17
    px = bytes(min(255, x * 3 + y * 5) for y in range(h) for x in range(w))
    plain = IC.encode_jpeg(w, h, px, channels=1, quality=95)
    rst = IC.encode_jpeg(
        w, h, px, channels=1, quality=95, restart_interval=3
    )
    assert rst != plain  # DRI segment + RSTn markers present
    assert b"\xff\xdd" in rst  # DRI
    assert IC.decode_jpeg(rst) == IC.decode_jpeg(plain)


def test_420_subsampling_decodes_with_bounded_chroma_error():
    w, h = 34, 18
    px = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (min(255, x * 7), min(255, y * 13), 128)
    )
    j = IC.encode_jpeg(w, h, px, subsampling="4:2:0", quality=95)
    W, H, C, out = IC.decode_jpeg(j)
    assert (W, H, C) == (w, h, 3)
    # Chroma is box-averaged 2x2 then replicated back: on a ramp of
    # slope <= 13/channel the worst pixel is half a 2x2 cell away from
    # its reconstructed average -> error <= ~slope + DCT grain.
    assert _maxerr(out, px) <= 16
    # Luma (gray projection) stays tight: compare luminance.
    lum_in = [
        round(0.299 * px[3 * i] + 0.587 * px[3 * i + 1] + 0.114 * px[3 * i + 2])
        for i in range(w * h)
    ]
    lum_out = [
        round(
            0.299 * out[3 * i] + 0.587 * out[3 * i + 1] + 0.114 * out[3 * i + 2]
        )
        for i in range(w * h)
    ]
    assert max(abs(a - b) for a, b in zip(lum_in, lum_out)) <= 4


def _replace_dqt_with_16bit(buf: bytes) -> bytes:
    """Re-serialize every 8-bit DQT segment as 16-bit precision (Pq=1)
    — a stream shape our encoder never emits but real encoders do."""
    out = bytearray()
    i = 0
    out += buf[:2]
    i = 2
    while i < len(buf):
        marker = buf[i + 1]
        if marker == 0xDA:  # copy the rest verbatim from SOS on
            out += buf[i:]
            break
        (ln,) = struct.unpack(">H", buf[i + 2 : i + 4])
        body = buf[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            new_body = bytearray()
            j = 0
            while j < len(body):
                tq = body[j] & 0xF
                vals = body[j + 1 : j + 65]
                j += 65
                new_body.append(0x10 | tq)  # Pq=1
                for v in vals:
                    new_body += struct.pack(">H", v)
            payload = bytes(new_body)
            out += bytes([0xFF, 0xDB]) + struct.pack(">H", len(payload) + 2)
            out += payload
        else:
            out += buf[i : i + 2 + ln]
        i += 2 + ln
    return bytes(out)


def test_16bit_dqt_streams_decode_identically():
    w, h = 17, 9
    px = bytes(min(255, x * 9 + y * 4) for y in range(h) for x in range(w))
    j = IC.encode_jpeg(w, h, px, channels=1)
    j16 = _replace_dqt_with_16bit(j)
    assert j16 != j
    assert IC.decode_jpeg(j16) == IC.decode_jpeg(j)


def test_arithmetic_sof9_raises_the_documented_seam():
    # Progressive (SOF2) decodes for real since late r13; the seam has
    # narrowed to arithmetic-coded / hierarchical / lossless processes.
    j = bytearray(IC.encode_jpeg(8, 8, bytes(64), channels=1))
    k = bytes(j).index(b"\xff\xc0")
    j[k + 1] = 0xC9  # SOF9: extended sequential, arithmetic coding
    with pytest.raises(NotImplementedError, match="SOF9"):
        IC.decode_jpeg(bytes(j))


def test_corrupt_streams_raise_value_error_not_crashes():
    j = IC.encode_jpeg(10, 10, bytes([9] * 100), channels=1)
    with pytest.raises(ValueError):
        IC.decode_jpeg(b"\x00\x01" + j)  # no SOI
    with pytest.raises(ValueError):
        IC.decode_jpeg(j[: len(j) // 2])  # truncated mid-stream


def test_decode_image_seam_routes_jpeg():
    px = bytes([5, 200, 100] * (9 * 7))
    j = IC.encode_jpeg(9, 7, px)
    w, h, c, out = decode_image(j, "image/jpeg")
    assert (w, h, c) == (9, 7, 3)
    assert decode_payload(j, "image/jpeg") == out
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "video/mp4")


def test_jpeg_decode_through_mapinpandas(spark):
    """The multimodal hot path: JPEG payloads decoded inside an
    Arrow-batched mapInPandas, exactly like the registered decode
    queries do for PNG/PPM — proving the new codec drops into the
    same Spark-side plumbing (schema, batch shape, partitioning)."""
    import pandas as pd

    rows = []
    for i in range(6):
        w, h = 8 + i, 6 + (i % 3)
        px = bytes((i * 31 + k * 7) % 256 for k in range(w * h))
        rows.append((i, IC.encode_jpeg(w, h, px, channels=1), w, h))
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, w long, h long"
    ).repartition(2)

    def batches(it):
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, pix = decode_image(bytes(payload), "image/jpeg")
                out.append(
                    (int(doc_id), w, h, c, int(pix[0]), len(pix))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "w", "h", "channels", "first_px", "n_bytes"
                ],
            )

    got = {
        r["doc_id"]: (r["w"], r["h"], r["channels"], r["n_bytes"])
        for r in df.mapInPandas(
            batches,
            "doc_id long, w long, h long, channels long, first_px long,"
            " n_bytes long",
        ).collect()
    }
    for i, _, w, h in rows:
        assert got[i] == (w, h, 1, w * h)


# ---------------------------------------------------------------------------
# Format-level third opinion: streams assembled BYTE BY BYTE here (no
# encoder involved), with expected pixels derived by hand from the
# T.81 IDCT formula — if decode_jpeg shared a wrong convention with
# encode_jpeg (zigzag order, EXTEND, canonical code assembly), the
# round-trip tests above would still pass; these cannot.
# ---------------------------------------------------------------------------


def _minimal_stream(entropy: bytes, qdc: int = 16) -> bytes:
    """One 8x8 gray component; quant table all ``qdc``; DC Huffman
    table = categories [0,1,2] with canonical codes 0 / 10 / 11; AC
    table = EOB only, code 0."""
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = bytes([0x00]) + bytes([qdc] * 64)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00, 1, 2] + [0] * 14) + bytes([0, 1, 2])
    dht_ac = bytes([0x10, 1] + [0] * 15) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )


def test_handcrafted_dc_only_block_positive():
    # Bits: DC category 2 = code '11', magnitude '10' (EXTEND -> +2),
    # EOB = '0'; padded with 1s -> 11100111 = 0xE7.
    w, h, c, out = IC.decode_jpeg(_minimal_stream(bytes([0xE7])))
    # DC coefficient 2 * qstep 16 = 32; DC-only IDCT = 32/8 = +4.
    assert (w, h, c) == (8, 8, 1)
    assert set(out) == {132}


def test_handcrafted_dc_only_block_negative():
    # Magnitude bits '01' EXTEND at size 2 -> 1 - 4 + 1 = -2.
    # Bits: 11 01 0 + pad 111 -> 11010111 = 0xD7.
    w, h, c, out = IC.decode_jpeg(_minimal_stream(bytes([0xD7])))
    assert set(out) == {124}  # 128 - 32/8


def test_handcrafted_zero_diff_uses_category_zero():
    # DC category 0 = code '0' (no magnitude bits), EOB '0' -> 00
    # + pad 111111 -> 0x3F. All-zero block -> flat 128.
    w, h, c, out = IC.decode_jpeg(_minimal_stream(bytes([0x3F])))
    assert set(out) == {128}


def test_handcrafted_stuffed_ff_byte_in_entropy():
    # Force the entropy stream to CONTAIN a 0xFF data byte so decode
    # must unstuff FF00: DC cat 2 '11', magnitude '11' (EXTEND -> +3),
    # EOB '0', pad '11' -> 11111011? No: 11 11 0 + 111 = 11110111
    # = 0xF7; choose qdc so the pixel value is distinct.
    w, h, c, out = IC.decode_jpeg(_minimal_stream(bytes([0xF7]), qdc=16))
    assert set(out) == {134}  # 128 + 3*16/8
    # Now an actual FF in the byte stream: bits 11 11 1 -> invalid
    # (category 3 not in table) — instead craft FF via padding: DC
    # cat 2 '11', magnitude '11', EOB '0' gives F7 above; stuffing is
    # separately exercised by byte value 0xFF followed by 0x00:
    stream = _minimal_stream(bytes([0xFF, 0x00]), qdc=16)
    # 0xFF unstuffed = bits 11111111: DC cat 2 '11', magnitude '11'
    # (+3), EOB would need '0' but next bits are 1111 -> the AC table
    # has maxcode 0 at length 1, so '1' cannot decode -> ValueError.
    with pytest.raises(ValueError):
        IC.decode_jpeg(stream)
    # A decodable stuffed case: entropy 0xFD 0x00 is not stuffed (FD
    # != FF); use 0xFF 0x00 followed by a byte completing EOB with 0:
    # bits of 0xFF: 11 11 (DC cat2, +3) then '1','1','1','1' remain.
    # Simpler decodable proof: 2-byte entropy 0xF7 0xFF/0x00 unused
    # tail is fine because decoding stops after EOB.
    w2, h2, c2, out2 = IC.decode_jpeg(
        _minimal_stream(bytes([0xF7, 0xFF, 0x00]), qdc=16)
    )
    assert set(out2) == {134}


def test_handcrafted_single_ac_coefficient():
    # DC cat 0 ('0'), then one AC: but the minimal AC table only has
    # EOB — extend it: AC table with EOB ('0' at len 1) and RS=0x01
    # (run 0, size 1) at len 2 code '10'. Canonical: len1: [0x00]
    # code 0; len2: [0x01] code 10.
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00, 1, 2] + [0] * 14) + bytes([0, 1, 2])
    dht_ac = bytes([0x10, 1, 1] + [0] * 14) + bytes([0x00, 0x01])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # Bits: DC '0' (cat 0), AC '10' (rs 0x01) + magnitude '1'
    # (EXTEND size1 -> +1), EOB '0' -> 0 10 1 0 + pad 111 -> 01010111
    # = 0x57. Coefficient lands at ZIGZAG[1] = (0,1): S(0,1) = 16.
    stream = (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
        + seg(0xC4, dht_dc) + seg(0xC4, dht_ac) + seg(0xDA, sos)
        + bytes([0x57]) + b"\xff\xd9"
    )
    w, h, c, out = IC.decode_jpeg(stream)
    assert (w, h, c) == (8, 8, 1)
    # Hand-derived: s(y,x) = 0.25 * (1/sqrt2) * 16 * cos((2x+1)pi/16),
    # constant down columns; clamp(round(128 + s)).
    for x in range(8):
        expected = int(
            0.25 * (1 / math.sqrt(2)) * 16 * math.cos((2 * x + 1) * math.pi / 16)
            + 128.5
        )
        col = {out[y * 8 + x] for y in range(8)}
        assert col == {expected}, (x, col, expected)


# ---------------------------------------------------------------------------
# Progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------
# THE oracle: progressive encoding is a LOSSLESS rearrangement of the
# same quantized coefficients, so progressive decode must equal
# baseline decode of the same image BIT FOR BIT — any asymmetry in
# EOB-run bookkeeping, refinement bit order, point transforms, or scan
# coverage breaks exact equality somewhere in this grid.


def _img(w, h, ch, kind):
    n = w * h * ch
    if kind == "noise":
        return bytes((k * 2654435761 + k * k * 97) % 256 for k in range(n))
    if kind == "smooth":
        return bytes(
            int(127 + 120 * math.sin((k % w) / 9) * math.cos((k // w) / 7))
            % 256
            for k in range(n)
        )
    if kind == "sparse":  # long EOB runs + isolated spikes
        b = bytearray([128] * n)
        for k in range(0, n, 97):
            b[k] = 255
        return bytes(b)
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["noise", "smooth", "sparse"])
@pytest.mark.parametrize("w,h,ch,sub,levels", [
    (24, 16, 1, "4:4:4", 1),
    (25, 17, 3, "4:4:4", 2),
    (40, 26, 3, "4:2:0", 3),
])
def test_progressive_equals_baseline_bitwise(kind, w, h, ch, sub, levels):
    px = _img(w, h, ch, kind)
    base = IC.decode_jpeg(
        IC.encode_jpeg(w, h, px, channels=ch, subsampling=sub)
    )
    prog = IC.decode_jpeg(
        IC.encode_jpeg_progressive(
            w, h, px, channels=ch, subsampling=sub, levels=levels
        )
    )
    assert base == prog


def test_progressive_stream_is_sof2_with_many_scans():
    j = IC.encode_jpeg_progressive(16, 16, bytes(256), channels=1, levels=2)
    assert b"\xff\xc2" in j and b"\xff\xc0" not in j
    # 1 DC first + 2 DC refines + 2 AC bands + 2 AC refines = 7 scans.
    assert j.count(b"\xff\xda") == 7


def test_handcrafted_progressive_dc_only_stream():
    # A progressive stream containing ONLY a DC scan (Al=0) then EOI —
    # legal (a truncated-delivery shape); AC stays zero so the image
    # is the DC-only reconstruction, same as the baseline handcrafted
    # case: quant 16, DC diff +2 -> flat 132.
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = bytes([0x00]) + bytes([16] * 64)
    sof2 = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00, 1, 2] + [0] * 14) + bytes([0, 1, 2])
    sos = bytes([1, 1, 0x00, 0, 0, 0x00])  # Ss=0 Se=0 Ah=0 Al=0
    # DC cat 2 = '11', magnitude '10' (EXTEND -> +2), pad 111 -> 0xD7?
    # bits: 11 10 + 1111 -> 11101111 = 0xEF.
    stream = (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof2)
        + seg(0xC4, dht_dc) + seg(0xDA, sos)
        + bytes([0xEF]) + b"\xff\xd9"
    )
    w, h, c, out = IC.decode_jpeg(stream)
    assert (w, h, c) == (8, 8, 1)
    assert set(out) == {132}


def test_handcrafted_progressive_dc_successive_approximation():
    # DC first scan at Al=1 sends +1 (coef 1<<1 = 2); the refinement
    # scan at Al=0 adds the low bit -> coefficient 3 -> 3*16/8 = +6.
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = bytes([0x00]) + bytes([16] * 64)
    sof2 = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00, 1, 2] + [0] * 14) + bytes([0, 1, 2])
    sos1 = bytes([1, 1, 0x00, 0, 0, 0x01])  # Ah=0 Al=1
    # DC cat 1 = code '10', magnitude '1' (EXTEND size1 -> +1), pad:
    # 10 1 + 11111 -> 10111111 = 0xBF.
    sos2 = bytes([1, 1, 0x00, 0, 0, 0x10])  # Ah=1 Al=0
    # refinement: 1 bit '1', pad -> 11111111 = stuffed FF 00.
    stream = (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof2)
        + seg(0xC4, dht_dc)
        + seg(0xDA, sos1) + bytes([0xBF])
        + seg(0xDA, sos2) + bytes([0xFF, 0x00])
        + b"\xff\xd9"
    )
    w, h, c, out = IC.decode_jpeg(stream)
    assert set(out) == {134}  # 128 + 3*16/8


def test_progressive_through_the_multimodal_seam():
    px = bytes([5, 200, 100] * (9 * 7))
    j = IC.encode_jpeg_progressive(9, 7, px)
    w, h, c, out = decode_image(j, "image/jpeg")
    assert (w, h, c) == (9, 7, 3)
    assert out == decode_image(IC.encode_jpeg(9, 7, px), "image/jpeg")[3]


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: the video container walk, real end to end
# ---------------------------------------------------------------------------


def _mjpeg_avi(n_frames=7, w=16, h=12):
    frames = []
    for i in range(n_frames):
        px = bytes(((i * 40) + k) % 256 for k in range(w * h))
        enc = IC.encode_jpeg if i % 2 == 0 else IC.encode_jpeg_progressive
        frames.append(enc(w, h, px, channels=1))
    return frames, IC.encode_avi_mjpeg(w, h, frames, fps_num=30)


def test_avi_container_roundtrip_preserves_frames_bytewise():
    frames, avi = _mjpeg_avi()
    w, h, num, den, got = IC.decode_avi_mjpeg(avi)
    assert (w, h, num, den) == (16, 12, 30, 1)
    assert got == frames  # byte-identical payload extraction


def test_avi_frame_sampling_decodes_strided_frames():
    frames, avi = _mjpeg_avi(9)
    out = IC.sample_avi_frames(avi, 4)
    assert [t[0] for t in out] == [0, 4, 8]
    for idx, w, h, c, px in out:
        assert (w, h, c) == (16, 12, 1)
        # Sampled frame pixels equal a direct decode of that payload
        # (mixed baseline/progressive frames both decode).
        assert px == IC.decode_jpeg(frames[idx])[3]


def test_avi_non_mjpeg_codec_raises_the_video_seam():
    frames, avi = _mjpeg_avi(2)
    bad = avi.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        IC.decode_avi_mjpeg(bad)


def test_avi_truncation_is_value_error():
    _, avi = _mjpeg_avi(3)
    with pytest.raises(ValueError):
        IC.decode_avi_mjpeg(avi[: len(avi) // 2])
    with pytest.raises(ValueError):
        IC.decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")


def test_decode_video_frames_seam_and_spark_path(spark):
    import pandas as pd

    from mapreduceframework_spark.operators.multimodal import (
        decode_video_frames,
    )

    with pytest.raises(NotImplementedError, match="video/h264"):
        decode_video_frames(b"x", "video/h264")

    rows = []
    for d in range(4):
        frames, avi = _mjpeg_avi(5 + d, w=8 + d, h=8)
        rows.append((d, avi, 5 + d))
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, n_frames long"
    ).repartition(2)

    def batches(it):
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, w, h, c, px in decode_video_frames(
                    bytes(payload), "video/avi-mjpeg", stride=2
                ):
                    out.append((int(doc_id), idx, w, h, len(px)))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame", "w", "h", "n_bytes"]
            )

    got = df.mapInPandas(
        batches, "doc_id long, frame long, w long, h long, n_bytes long"
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["frame"])
    for d in range(4):
        assert sorted(by_doc[d]) == list(range(0, 5 + d, 2))


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF: sample-table-driven extraction + JPEG-in-MP4 decode
# ---------------------------------------------------------------------------


def _jpeg_mp4(n_frames=8, w=12, h=10, chunk_size=3):
    frames = [
        IC.encode_jpeg(
            w, h, bytes(((i * 50) + k) % 256 for k in range(w * h)),
            channels=1,
        )
        for i in range(n_frames)
    ]
    return frames, IC.encode_mp4_jpeg(
        w, h, frames, timescale=30, chunk_size=chunk_size
    )


def test_mp4_sample_extraction_is_byte_identical():
    frames, mp4 = _jpeg_mp4()
    fourcc, w, h, ts, deltas, got = IC.decode_mp4_samples(mp4)
    assert (fourcc, w, h, ts) == (b"jpeg", 12, 10, 30)
    assert deltas == [1] * 8
    assert got == frames


@pytest.mark.parametrize("n,chunk", [(1, 3), (6, 3), (7, 3), (8, 1), (9, 4)])
def test_mp4_chunking_shapes_reconstruct_exactly(n, chunk):
    # Exercises the stsc run-length expansion: full chunks, a short
    # tail chunk, chunk-per-sample, and a single-frame file.
    frames, mp4 = _jpeg_mp4(n_frames=n, chunk_size=chunk)
    assert IC.decode_mp4_samples(mp4)[5] == frames


def test_mp4_stride_sampling_decodes_jpeg_samples():
    frames, mp4 = _jpeg_mp4(9)
    out = IC.sample_mp4_frames(mp4, 4)
    assert [t[0] for t in out] == [0, 4, 8]
    for idx, w, h, c, px in out:
        assert px == IC.decode_jpeg(frames[idx])[3]


def test_mp4_compressed_codec_extracts_but_does_not_decode():
    frames, mp4 = _jpeg_mp4(3)
    avc = mp4.replace(b"jpeg", b"avc1")  # fourcc appears once, in stsd
    # Extraction is codec-agnostic:
    fourcc, _, _, _, _, got = IC.decode_mp4_samples(avc)
    assert fourcc == b"avc1" and got == frames
    # Decode hits the documented seam:
    with pytest.raises(NotImplementedError, match="avc1"):
        IC.sample_mp4_frames(avc, 1)
    from mapreduceframework_spark.operators.multimodal import (
        decode_video_frames,
    )
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_video_frames(avc, "video/mp4")


def test_mp4_structural_damage_is_value_error():
    frames, mp4 = _jpeg_mp4(4)
    with pytest.raises(ValueError):
        IC.decode_mp4_samples(b"\x00\x00\x00\x08free" + mp4[8:])  # no ftyp
    with pytest.raises(ValueError):
        IC.decode_mp4_samples(mp4[: len(mp4) - 40])  # truncated moov
    # Corrupt a chunk offset so a sample extent runs past EOF.
    k = mp4.index(b"stco")
    bad = bytearray(mp4)
    bad[k + 12 : k + 16] = struct.pack(">I", len(mp4) - 2)
    with pytest.raises(ValueError, match="extent past end"):
        IC.decode_mp4_samples(bytes(bad))


def test_mp4_through_the_video_seam():
    from mapreduceframework_spark.operators.multimodal import (
        decode_video_frames,
    )

    frames, mp4 = _jpeg_mp4(6)
    out = decode_video_frames(mp4, "video/mp4", stride=2)
    assert [t[0] for t in out] == [0, 2, 4]


# ---------------------------------------------------------------------------
# Continuous fuzz: the lossless-rearrangement oracle under hypothesis
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    data=st.binary(min_size=16 * 16, max_size=16 * 16),
    levels=st.integers(min_value=1, max_value=3),
    quality=st.integers(min_value=40, max_value=98),
)
def test_progressive_equals_baseline_fuzz(data, levels, quality):
    base = IC.decode_jpeg(
        IC.encode_jpeg(16, 16, data, channels=1, quality=quality)
    )
    prog = IC.decode_jpeg(
        IC.encode_jpeg_progressive(
            16, 16, data, channels=1, quality=quality, levels=levels
        )
    )
    assert base == prog


def test_fill_bytes_before_restart_markers_decode():
    # Round-14 review find: T.81 B.1.1.2 allows fill bytes before ANY
    # marker, including RSTn inside entropy data. Insert one 0xFF fill
    # byte before the first restart marker; decode must be unchanged
    # (exercises _BitReader._fill and align_to_marker, not just the
    # segment-level marker walk).
    w, h = 32, 8
    px = bytes(min(255, x * 3 + y * 5) for y in range(h) for x in range(w))
    j = IC.encode_jpeg(w, h, px, channels=1, restart_interval=1)
    want = IC.decode_jpeg(j)
    # Find the first RST marker (FF D0..D7) after SOS entropy start.
    sos = j.find(b"\xff\xda")
    assert sos > 0
    k = sos
    while not (j[k] == 0xFF and 0xD0 <= j[k + 1] <= 0xD7):
        k += 1
    padded = j[:k] + b"\xff" + j[k:]
    assert IC.decode_jpeg(padded) == want
    # And a fill-byte RUN before a restart marker.
    padded3 = j[:k] + b"\xff\xff\xff" + j[k:]
    assert IC.decode_jpeg(padded3) == want


def test_gif_opaque_gce_clears_pending_transparency():
    # Round-14 review find: the LAST GCE before an image wins — an
    # opaque GCE (flag=0) must clear a prior GCE's transparent index.
    px = bytes([9, 9, 9]) * 4
    g = bytearray(IC.encode_gif(2, 2, [px]))
    # Prepend a transparent GCE before the encoder's opaque one (which
    # sits immediately before the image descriptor).
    at = bytes(g).index(b"\x21\xf9")
    g[at:at] = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    _, _, frames = IC.decode_gif(bytes(g))
    assert frames[0][5] is None
