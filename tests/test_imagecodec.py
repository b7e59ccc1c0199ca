"""Unit tests for the pure-Python image codecs behind the multimodal
decode seam (operators/imagecodec.py): PNG chunk walk + zlib inflate +
all five scanline un-filters, netpbm header grammar, and the error
paths a malformed 100 TB corpus will inevitably hit."""

from __future__ import annotations

import struct
import zlib

import pytest

from mapreduceframework_spark.operators import imagecodec as IC


def _pix(n: int, seed: int = 1) -> bytes:
    return bytes((seed * 7 + i * 13) % 256 for i in range(n))


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("w,h", [(1, 1), (3, 5), (16, 9), (7, 11)])
def test_png_round_trip(channels, w, h):
    # h >= 5 cases exercise every filter type (encoder cycles row % 5).
    pix = _pix(w * h * channels)
    assert IC.decode_png(IC.encode_png(w, h, pix, channels)) == (
        w, h, channels, pix,
    )


def test_png_every_filter_row_differs():
    # Sanity that the cycling encoder actually produces 5 distinct
    # filter bytes — otherwise the round trip proves less than claimed.
    w, h = 8, 5
    buf = IC.encode_png(w, h, _pix(w * h * 3), 3)
    # find IDAT, inflate, read the per-row filter bytes
    i = 8
    idat = b""
    while i < len(buf):
        (length,) = struct.unpack(">I", buf[i : i + 4])
        if buf[i + 4 : i + 8] == b"IDAT":
            idat += buf[i + 8 : i + 8 + length]
        i += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    ftypes = [raw[r * (stride + 1)] for r in range(h)]
    assert ftypes == [0, 1, 2, 3, 4]


def test_png_rejects_bad_crc():
    buf = bytearray(IC.encode_png(4, 4, _pix(48), 3))
    buf[20] ^= 0xFF  # corrupt a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        IC.decode_png(bytes(buf))


def test_png_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        IC.decode_png(b"GIF89a" + b"\x00" * 20)


def test_ppm_round_trip_with_comment_header():
    pix = _pix(6 * 4 * 3)
    buf = IC.encode_ppm(6, 4, pix)
    assert b"#" in buf  # encoder embeds a comment; tokenizer must skip it
    assert IC.decode_pnm(buf) == (6, 4, 3, pix)


def test_pgm_round_trip():
    pix = _pix(5 * 3)
    assert IC.decode_pnm(IC.encode_pgm(5, 3, pix)) == (5, 3, 1, pix)


def test_pnm_rejects_truncated_raster():
    buf = IC.encode_ppm(4, 4, _pix(48))[:-5]
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_pnm(buf)


def test_pnm_rejects_wrong_magic():
    # ASCII P1/P2/P3 decode since round 15; P3 now round-trips
    assert IC.decode_pnm(b"P3\n1 1\n255\n1 2 3") == (1, 1, 3, b"\x01\x02\x03")
    # P7/PAM decodes since round 16 — only a MALFORMED header rejects
    with pytest.raises(ValueError, match="ENDHDR|PAM"):
        IC.decode_pnm(b"P7\n1 1\n255\n\x00\x00\x00")
    with pytest.raises(ValueError, match="magic"):
        IC.decode_pnm(b"P8\n1 1\n255\n\x00\x00\x00")


def test_decode_payload_dispatch():
    from mapreduceframework_spark.operators.multimodal import decode_payload

    pix = _pix(4 * 3 * 3)
    assert decode_payload(IC.encode_png(4, 3, pix, 3), "image/png") == pix
    assert decode_payload(IC.encode_ppm(4, 3, pix), "image/ppm") == pix
    # image/jpeg routes to the REAL baseline decoder since r13: a valid
    # stream decodes, a truncated one is a corrupt-payload ValueError
    # (not the NotImplementedError seam, which is reserved for codecs
    # that genuinely need external libraries).
    j = IC.encode_jpeg(4, 3, pix)
    assert len(decode_payload(j, "image/jpeg")) == 4 * 3 * 3
    with pytest.raises(ValueError):
        decode_payload(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x00\x00", "video/mp4")


def test_pixel_digest_matches_duckdb_fold():
    import duckdb

    pix = _pix(300)
    want = duckdb.sql(
        "SELECT list_reduce(list_prepend(0, ["
        "(1 * 7 + i * 13) % 256 for i in range(0, 300)"
        "]), (acc, v) -> (acc * 31 + v) % 1000000007) AS d"
    ).fetchone()[0]
    assert IC.pixel_digest(pix) == want


def test_wav_round_trip():
    samples = b"".join(
        ((5 * 31 + i * 17) % 65536).to_bytes(2, "little") for i in range(40)
    )
    buf = IC.encode_wav(22050, 2, samples)
    assert IC.decode_wav(buf) == (22050, 2, 20, samples)


def test_wav_decoder_walks_past_list_chunk():
    buf = IC.encode_wav(8000, 1, b"\x01\x02\x03\x04")
    assert b"LIST" in buf  # encoder inserts one; decoder must skip it
    rate, ch, frames, samples = IC.decode_wav(buf)
    assert (rate, ch, frames) == (8000, 1, 2)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError, match="RIFF"):
        IC.decode_wav(b"OggS" + b"\x00" * 40)


def test_wav_rejects_non_pcm():
    # IEEE float (3) decodes since round 15; MS ADPCM (2) is still
    # the documented seam, and a float tag with 16-bit samples is
    # malformed rather than unimplemented.
    buf = bytearray(IC.encode_wav(8000, 1, b"\x00\x00"))
    i = buf.index(b"fmt ") + 8
    buf[i] = 2
    with pytest.raises(NotImplementedError, match="format tag"):
        IC.decode_wav(bytes(buf))
    buf[i] = 3
    with pytest.raises(ValueError, match="float PCM"):
        IC.decode_wav(bytes(buf))


def test_sample_digest_matches_duckdb_fold():
    import duckdb

    samples = b"".join(
        ((9 * 31 + i * 17) % 65536).to_bytes(2, "little") for i in range(60)
    )
    want = duckdb.sql(
        "SELECT list_reduce(list_prepend(0, ["
        "(9 * 31 + i * 17) % 65536 for i in range(0, 60)"
        "]), (acc, v) -> (acc * 31 + v) % 1000000007) AS d"
    ).fetchone()[0]
    assert IC.sample_digest_u16(samples) == want


# ---- property-based round trips (hypothesis) ----

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    channels=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
def test_png_round_trip_property(w, h, channels, data):
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    assert IC.decode_png(IC.encode_png(w, h, pix, channels)) == (
        w, h, channels, pix,
    )


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), data=st.data())
def test_ppm_round_trip_property(w, h, data):
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert IC.decode_pnm(IC.encode_ppm(w, h, pix)) == (w, h, 3, pix)


@settings(max_examples=40, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    channels=st.integers(1, 2),
    frames=st.integers(0, 64),
    data=st.data(),
)
def test_wav_round_trip_property(rate, channels, frames, data):
    n = frames * channels * 2
    samples = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    assert IC.decode_wav(IC.encode_wav(rate, channels, samples)) == (
        rate, channels, frames, samples,
    )


def test_wav_rejects_zero_channels():
    buf = bytearray(IC.encode_wav(8000, 1, b"\x00\x00"))
    i = buf.index(b"fmt ") + 8
    buf[i + 2] = 0  # channels field -> 0
    with pytest.raises(ValueError, match="channels"):
        IC.decode_wav(bytes(buf))


# --------------------------------------------------------------------------
# Malformed-corpus error paths: every corrupt payload must surface as
# ValueError (distinguishable data problem), never a raw struct.error /
# zlib.error leaking from the parser internals — mapInPandas callers
# route the two differently (skip-and-log vs crash).
# --------------------------------------------------------------------------


def test_png_truncated_mid_chunk_header_is_valueerror():
    buf = IC.encode_png(4, 4, _pix(48), 3)
    with pytest.raises(ValueError, match="chunk header cut short"):
        IC.decode_png(buf[:10])  # signature + 2 bytes of IHDR length


def test_png_truncated_chunk_body_is_valueerror():
    buf = IC.encode_png(4, 4, _pix(48), 3)
    with pytest.raises(ValueError, match="cut short"):
        IC.decode_png(buf[:-5])  # IEND CRC cut off


def test_png_corrupt_idat_stream_is_valueerror():
    # Valid chunk framing and CRCs, but the IDAT payload is not a zlib
    # stream — the inflate failure must be wrapped, not raw zlib.error.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    buf = (
        IC._PNG_SIG
        + IC._chunk(b"IHDR", ihdr)
        + IC._chunk(b"IDAT", b"garbage-not-zlib")
        + IC._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        IC.decode_png(buf)


def test_png_bad_ihdr_length_is_valueerror():
    buf = (
        IC._PNG_SIG
        + IC._chunk(b"IHDR", b"\x00\x00\x00\x01")  # 4 bytes, not 13
        + IC._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="malformed IHDR"):
        IC.decode_png(buf)


def test_wav_truncated_data_chunk_is_valueerror():
    samples = bytes(range(80))
    buf = IC.encode_wav(8000, 1, samples)
    with pytest.raises(ValueError, match="cut short"):
        IC.decode_wav(buf[:-7])


def test_wav_short_fmt_chunk_is_valueerror():
    fmt = struct.pack("<HH", 1, 1)  # 4 bytes — no sample rate/bits
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    buf = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="malformed fmt"):
        IC.decode_wav(buf)


# ---------------------------------------------------------------------------
# Adam7 interlacing (r13): lossless => interlaced == sequential exactly
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("w,h", [
    (1, 1), (2, 2), (3, 5), (7, 7), (8, 8), (9, 10), (16, 9), (33, 21),
    (5, 1), (1, 9),
])
def test_png_adam7_equals_sequential(channels, w, h):
    # Shapes chosen so several Adam7 passes are EMPTY (w or h below a
    # pass origin) — empty passes must contribute zero scanlines.
    pix = _pix(w * h * channels, seed=w * 31 + h)
    seq = IC.decode_png(IC.encode_png(w, h, pix, channels))
    lac = IC.decode_png(IC.encode_png(w, h, pix, channels, interlace=True))
    assert seq == lac == (w, h, channels, pix)


def test_png_adam7_stream_is_actually_interlaced():
    pix = _pix(16 * 16 * 3)
    seq = IC.encode_png(16, 16, pix, 3)
    lac = IC.encode_png(16, 16, pix, 3, interlace=True)
    assert seq != lac
    # IHDR interlace byte (13th byte of the IHDR data, after the
    # 8-byte signature + 8-byte chunk header).
    assert lac[16 + 12] == 1 and seq[16 + 12] == 0


def test_png_adam7_truncated_pass_is_value_error():
    pix = _pix(16 * 16)
    lac = IC.encode_png(16, 16, pix, 1, interlace=True)
    # Re-deflate a truncated scanline stream so the CRC and zlib layers
    # pass but the pass accounting must catch the shortfall.
    i = 8
    ihdr_chunk = b""
    idat = b""
    while i < len(lac):
        (length,) = struct.unpack(">I", lac[i : i + 4])
        cc = lac[i + 4 : i + 8]
        if cc == b"IHDR":
            ihdr_chunk = lac[i : i + 12 + length]
        elif cc == b"IDAT":
            idat += lac[i + 8 : i + 8 + length]
        i += 12 + length
    raw = zlib.decompress(idat)
    rebuilt = (
        lac[:8]
        + ihdr_chunk
        + IC._chunk(b"IDAT", zlib.compress(raw[:-5]))
        + IC._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        IC.decode_png(rebuilt)


# ---------------------------------------------------------------------------
# GIF (r13): real LZW + palettes + interlace + animation frames
# ---------------------------------------------------------------------------


def _paletted(w, h, ncolors, seed=0):
    return bytes(
        ((seed + (k // 3)) % ncolors) * (255 // max(1, ncolors - 1)) % 256
        for k in range(w * h * 3)
    )


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("w,h,ncolors", [
    (1, 1, 1), (13, 9, 5), (16, 16, 2), (31, 17, 255),
])
def test_gif_round_trip(w, h, ncolors, interlace):
    px = _paletted(w, h, ncolors)
    sw, sh, frames = IC.decode_gif(
        IC.encode_gif(w, h, [px], interlace=interlace)
    )
    assert (sw, sh) == (w, h)
    assert frames == [(0, 0, w, h, px, None)]


def test_gif_animation_frames_round_trip():
    w, h = 24, 18
    f1 = _paletted(w, h, 7)
    f2 = _paletted(w, h, 7, seed=3)
    sw, sh, frames = IC.decode_gif(IC.encode_gif(w, h, [f1, f2]))
    assert [f[4] for f in frames] == [f1, f2]


def test_gif_lzw_survives_dictionary_overflow():
    # 64x64 with ~256 colors in a non-repeating pattern forces the LZW
    # dictionary past 4096 entries -> CLEAR mid-stream on encode, which
    # decode must honor.
    w, h = 64, 64
    px = bytes(
        (k * 7) % 256 if k % 3 == 0
        else ((k // 3) % 16) * 16 if k % 3 == 1
        else 77
        for k in range(w * h * 3)
    )
    g = IC.encode_gif(w, h, [px])
    assert IC.decode_gif(g)[2][0][4] == px


def test_gif_lzw_raw_stream_properties():
    # KwKwK pattern (aaa...), empty input, and a long high-entropy
    # stream with multiple dictionary resets.
    for data in (b"aaaaaaaaaa", b"", bytes(50000)):
        assert IC._lzw_decode(IC._lzw_encode(data, 8), 8, len(data)) == data
    data = bytes((k * k * 31 + k * 17) % 251 for k in range(50000))
    assert IC._lzw_decode(IC._lzw_encode(data, 8), 8, len(data)) == data


def test_gif_error_paths():
    with pytest.raises(ValueError, match="not a GIF"):
        IC.decode_gif(b"PNG\x00" * 4)
    g = IC.encode_gif(8, 8, [_paletted(8, 8, 4)])
    with pytest.raises(ValueError):
        IC.decode_gif(g[: len(g) // 2])
    many = bytearray()
    for i in range(32 * 32):  # 1024 guaranteed-distinct colors
        many += bytes([i % 256, (i // 256) % 256, i % 251])
    with pytest.raises(ValueError, match="256 distinct"):
        IC.encode_gif(32, 32, [bytes(many)])


def test_gif_through_the_image_seam():
    from mapreduceframework_spark.operators.multimodal import (
        decode_image, decode_payload,
    )

    px = _paletted(9, 7, 6)
    g = IC.encode_gif(9, 7, [px])
    assert decode_image(g, "image/gif") == (9, 7, 3, px)
    assert decode_payload(g, "image/gif") == px


def test_gif_transparency_surfaced_per_frame():
    # Round-14 ADVICE fix: the graphic-control transparency flag is
    # parsed and the transparent palette index surfaces in the frame
    # tuple (None for opaque frames); GCE scope ends at its image.
    w, h = 6, 4
    t_color = bytes([255, 0, 255])
    f1 = (t_color + bytes([10, 20, 30]) * (w * h - 1))
    f2 = bytes([10, 20, 30]) * (w * h)  # no transparent color present
    g = IC.encode_gif(w, h, [f1, f2], transparent_color=t_color)
    _, _, frames = IC.decode_gif(g)
    assert frames[0][5] == 0  # t_color is palette index 0 in frame 1
    assert frames[0][4] == f1  # pixels still palette-mapped RGB
    assert frames[1][5] is None
    # Without the option the GCE stays opaque.
    _, _, plain = IC.decode_gif(IC.encode_gif(w, h, [f1]))
    assert plain[0][5] is None


def test_jpeg_fill_bytes_before_markers_decode():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    # marker. Inject fill bytes before every segment marker of a real
    # stream; decode must be unchanged (round-14 ADVICE fix).
    w, h = 10, 6
    px = bytes([77] * (w * h))
    j = IC.encode_jpeg(w, h, px, channels=1)
    want = IC.decode_jpeg(j)
    # Rebuild the stream with FF padding before each marker: walk the
    # segments structurally (SOI, then length-prefixed segments until
    # SOS) and splice fill bytes ahead of each FF.
    out = bytearray(j[:2])  # SOI
    pos = 2
    while True:
        assert j[pos] == 0xFF
        marker = j[pos + 1]
        ln = int.from_bytes(j[pos + 2 : pos + 4], "big")
        out += b"\xff\xff\xff" + j[pos : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDA:  # entropy data + EOI follow verbatim
            out += j[pos:]
            break
    assert IC.decode_jpeg(bytes(out)) == want


def test_jpeg_single_component_scan_ignores_sampling_factors():
    # T.81 A.2: a single-component scan is non-interleaved — declared
    # 2x2 sampling factors must not switch the traversal to 4-block
    # MCUs (round-14 ADVICE fix). Rewrite the SOF of a grayscale
    # stream to claim 2x2 and re-encode the entropy data in the
    # component's own block-grid order.
    w, h = 24, 16  # 3x2 blocks
    px = bytes((x * 5 + y * 9) % 256 for y in range(h) for x in range(w))
    base = IC.encode_jpeg(w, h, px, channels=1, quality=90)
    want = IC.decode_jpeg(base)
    # Patch hv byte in SOF0: find FFC0, component spec at body[6..8].
    i = base.find(b"\xff\xc0")
    assert i > 0
    patched = bytearray(base)
    hv_off = i + 4 + 5 + 1  # marker(2)+len(2)+prec(1)+dims(4)+nf(1) -> cid
    assert patched[hv_off - 1 - 4 - 1] == 8  # precision sanity
    patched[hv_off + 1] = 0x22  # hs=2, vs=2
    got = IC.decode_jpeg(bytes(patched))
    # Non-interleaved single-component decode ignores the factors, so
    # the pixels are identical to the unpatched stream's.
    assert got == want


# --------------------------------------------------------------------------
# Round 14: paletted (color type 3) + gray-alpha (type 4) PNG
# --------------------------------------------------------------------------


def _pal_fixture(w, h, ncolors, depth):
    cap = min(ncolors, 1 << depth)
    idx = bytes((k * 7 + 3) % cap for k in range(w * h))
    palette = [
        bytes([(c * 53) % 256, (c * 31 + 7) % 256, (c * 11 + 99) % 256])
        for c in range(cap)
    ]
    return idx, palette


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("w,h", [(1, 1), (13, 9), (17, 5)])
def test_png_palette_round_trip(w, h, depth, interlace):
    idx, palette = _pal_fixture(w, h, 256, depth)
    buf = IC.encode_png_palette(
        w, h, idx, palette, bit_depth=depth, interlace=interlace
    )
    got_w, got_h, ch, px = IC.decode_png(buf)
    want = b"".join(palette[i] for i in idx)
    assert (got_w, got_h, ch) == (w, h, 3)
    assert px == want


def test_png_palette_trns_expands_to_rgba():
    idx, palette = _pal_fixture(9, 7, 8, 8)
    trns = bytes([0, 128, 255])  # entries 3.. default opaque per spec
    buf = IC.encode_png_palette(9, 7, idx, palette, trns=trns)
    w, h, ch, px = IC.decode_png(buf)
    assert ch == 4
    for k, ci in enumerate(idx):
        assert px[4 * k : 4 * k + 3] == palette[ci]
        assert px[4 * k + 3] == (trns[ci] if ci < 3 else 255)


def test_png_gray_alpha_round_trip():
    w, h = 11, 6
    px = _pix(w * h * 2)
    assert IC.decode_png(IC.encode_png(w, h, px, channels=2)) == (
        w, h, 2, px,
    )


def test_png_palette_error_paths():
    idx, palette = _pal_fixture(8, 8, 4, 8)
    buf = bytearray(IC.encode_png_palette(8, 8, idx, palette))
    # strip PLTE: paletted stream without a palette is a ValueError
    p = buf.index(b"PLTE") - 4
    (ln,) = struct.unpack(">I", buf[p : p + 4])
    del buf[p : p + 12 + ln]
    with pytest.raises(ValueError, match="PLTE"):
        IC.decode_png(bytes(buf))
    with pytest.raises(ValueError, match="capacity"):
        IC.encode_png_palette(2, 1, bytes([0, 3]), palette[:2])
    with pytest.raises(ValueError, match="bit depth"):
        IC.encode_png_palette(2, 1, bytes([0, 1]), palette, bit_depth=3)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    depth=st.sampled_from([1, 2, 4, 8]),
    interlace=st.booleans(),
    data=st.data(),
)
def test_png_palette_round_trip_property(w, h, depth, interlace, data):
    cap = 1 << depth
    idx = bytes(
        data.draw(
            st.lists(st.integers(0, cap - 1), min_size=w * h,
                     max_size=w * h)
        )
    )
    palette = [bytes([c, (c * 3) % 256, 255 - c]) for c in range(cap)]
    buf = IC.encode_png_palette(
        w, h, idx, palette, bit_depth=depth, interlace=interlace
    )
    assert IC.decode_png(buf) == (
        w, h, 3, b"".join(palette[i] for i in idx),
    )


# --------------------------------------------------------------------------
# Round 14: 16-bit PNG (decode reduces to the MSB per sample)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_16bit_decodes_to_msb(channels, interlace):
    w, h = 11, 7
    n = w * h * channels
    # Big-endian 16-bit samples with DISTINCT high/low bytes so an
    # endianness or offset slip shows immediately.
    hi = [(k * 7 + 13) % 256 for k in range(n)]
    lo = [(k * 29 + 5) % 256 for k in range(n)]
    px16 = bytes(b for k in range(n) for b in (hi[k], lo[k]))
    buf = IC.encode_png(
        w, h, px16, channels=channels, interlace=interlace, bit_depth=16
    )
    assert IC.decode_png(buf) == (w, h, channels, bytes(hi))


def test_png_16bit_filters_step_two_bytes():
    # The encoder cycles all five filters; a decoder filtering at
    # bpp=channels (bytes) instead of channels*2 would corrupt rows
    # 1.. — the round trip above catches it, this pins the stream
    # really declares depth 16.
    buf = IC.encode_png(5, 6, bytes(5 * 6 * 3 * 2), channels=3,
                        bit_depth=16)
    # IHDR body: w(4) h(4) depth(1)... depth at offset 8+8+8
    assert buf[8 + 8 + 8] == 16


def test_png_rejects_odd_bit_depths_still():
    with pytest.raises(ValueError, match="bit depth"):
        IC.encode_png(2, 2, bytes(12), channels=3, bit_depth=4)


# --------------------------------------------------------------------------
# Round 14: deterministic corruption sweep across EVERY codec family.
# The error contract at 100 TB: a corrupt payload must surface as
# ValueError (data problem, skip-and-log) or NotImplementedError (seam),
# never a raw IndexError/struct.error/zlib.error leaking parser
# internals (code bug, crash). Found two real leaks when introduced
# (progressive-SOS component overrun, MP4 stts overrun) — both fixed.
# --------------------------------------------------------------------------


def _codec_fixture_matrix():
    d = 37
    w, h = 9, 6
    rgb = bytes((d * 7 + i * 13) % 256 for i in range(w * h * 3))
    gray = bytes((d * 7 + i * 13) % 256 for i in range(16 * 8))
    idx = bytes((d * 7 + k * 13) % 17 for k in range(w * h))
    pal = [
        bytes(((d + c * 53) % 256, (d * 3 + c * 31) % 256,
               (d * 5 + c * 11) % 256))
        for c in range(17)
    ]
    pcm = bytes(range(80))
    frames = [IC.encode_jpeg(16, 8, gray, channels=1) for _ in range(3)]
    return [
        ("png", IC.encode_png(w, h, rgb, 3), IC.decode_png),
        ("png16", IC.encode_png(w, h, bytes(w * h * 6), 3, bit_depth=16),
         IC.decode_png),
        ("png-adam7", IC.encode_png(w, h, rgb, 3, interlace=True),
         IC.decode_png),
        ("png-pal", IC.encode_png_palette(w, h, idx, pal, trns=bytes(5)),
         IC.decode_png),
        ("png-pal2", IC.encode_png_palette(
            w, h, bytes(i % 4 for i in idx), pal[:4], bit_depth=2,
            interlace=True), IC.decode_png),
        ("ppm", IC.encode_ppm(w, h, rgb), IC.decode_pnm),
        ("jpeg", IC.encode_jpeg(16, 8, gray, channels=1), IC.decode_jpeg),
        ("jpeg-rst", IC.encode_jpeg(16, 8, gray, channels=1,
                                    restart_interval=1), IC.decode_jpeg),
        ("jpeg-prog", IC.encode_jpeg_progressive(16, 8, gray, channels=1),
         IC.decode_jpeg),
        ("gif", IC.encode_gif(w, h, [rgb]), IC.decode_gif),
        ("wav", IC.encode_wav(8000, 2, pcm), IC.decode_wav),
        ("wav-f32", IC.encode_wav_float(
            8000, 1, [s / 32768.0 for s in range(-20, 20)]),
         IC.decode_wav),
        ("wav-pcm24-ext", IC.encode_wav_pcm(
            8000, 2, pcm, bits=24, extensible=True), IC.decode_wav),
        ("g711", IC.encode_wav_g711(8000, 1, pcm, "ulaw"), IC.decode_wav),
        ("adpcm", IC.encode_wav_ima_adpcm_stream(
            8000, -5, 3, [i % 16 for i in range(16)]), IC.decode_wav),
        ("avi", IC.encode_avi_mjpeg(16, 8, frames), IC.decode_avi_mjpeg),
        ("mp4", IC.encode_mp4_jpeg(16, 8, frames),
         lambda b: IC.decode_mp4_samples(b)),
    ]


_CODEC_MATRIX = _codec_fixture_matrix()  # built ONCE at collection


@pytest.mark.parametrize(
    "name,buf,dec",
    _CODEC_MATRIX,
    ids=[t[0] for t in _CODEC_MATRIX],
)
def test_corruption_never_leaks_raw_exceptions(name, buf, dec):
    # Strided (bounded-runtime) slice of the exhaustive sweep that was
    # run once offline; offsets co-prime to common field sizes so the
    # sample walks all alignments across fixtures.
    for cut in range(0, len(buf), 3):
        try:
            dec(buf[:cut])
        except (ValueError, NotImplementedError):
            pass
    for k in range(0, len(buf), 3):
        m = bytearray(buf)
        m[k] ^= 0x5A
        try:
            dec(bytes(m))
        except (ValueError, NotImplementedError):
            pass
    for k in range(1, len(buf) - 1, 7):
        m = bytearray(buf)
        m[k] ^= 0xFF
        m[k + 1] ^= 0x81
        try:
            dec(bytes(m))
        except (ValueError, NotImplementedError):
            pass


def test_crafted_jpeg_segment_truncations_raise_value_error():
    # Round-14 second-review finds: segment bodies the strided XOR
    # sweep cannot synthesize — each must be ValueError, never a raw
    # IndexError/struct.error.
    cases = [
        b"\xff\xd8\xff\xc0\x00\x02",              # SOF, empty body
        b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x08",  # SOF, ln=5 (short dims)
        b"\xff\xd8\xff\xdb\x00\x04\x10\x00",      # 16-bit DQT, truncated
        b"\xff\xd8\xff\xdd\x00\x03\x00",          # DRI, 1-byte body
        b"\xff\xd8\xff\xc4\x00\x04\x00\x00",      # DHT, short BITS
        # SOF claiming 3 components with specs cut short
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x08\x00\x08\x03",
    ]
    for buf in cases:
        with pytest.raises(ValueError):
            IC.decode_jpeg(buf)


def test_crafted_mp4_table_bombs_raise_value_error():
    # stsc with a huge second first_chunk must raise, not allocate the
    # implied 200M-entry per-chunk table (the run-length twin of the
    # stts/stsz guards).
    gray = bytes(16 * 8)
    frames = [IC.encode_jpeg(16, 8, gray, channels=1) for _ in range(4)]
    buf = bytearray(IC.encode_mp4_jpeg(16, 8, frames, chunk_size=3))
    i = buf.index(b"stsc")
    # box: size(4) + 'stsc' + verflags(4) + count(4) + entries(12 each)
    n = struct.unpack(">I", buf[i + 8 : i + 12])[0]
    assert n >= 2  # 4 frames, chunk_size 3 -> full run + short tail
    # second entry's first_chunk := 200,000,000
    struct.pack_into(">I", buf, i + 12 + 12, 200_000_000)
    with pytest.raises(ValueError, match="stsc|stco|inconsistent"):
        IC.decode_mp4_samples(bytes(buf))
    # and a truncated trailing mdhd is a ValueError, not struct.error
    g2 = bytearray(IC.encode_mp4_jpeg(16, 8, frames))
    j = g2.index(b"mdhd")
    struct.pack_into(">I", g2, j - 4, 12)  # shrink mdhd box to 4-byte body
    try:
        IC.decode_mp4_samples(bytes(g2))
    except (ValueError, NotImplementedError):
        pass
