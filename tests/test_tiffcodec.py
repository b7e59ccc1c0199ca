"""Round-14 baseline-TIFF tests (operators/imagecodec.py decode_tiff):
IFD walk in both byte orders, multi-strip assembly, PackBits, the four
photometric classes, error paths, and the corruption-sweep contract."""

from __future__ import annotations

import struct

import pytest

from mapreduceframework_spark.operators import imagecodec as IC


def _pix(n: int, seed: int = 5) -> bytes:
    return bytes((seed * 17 + i * 11) % 256 for i in range(n))


@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_tiff_round_trip_matrix(channels, big_endian, packbits):
    w, h = 7, 8  # rows_per_strip=3 -> 3 strips incl. a short tail
    px = _pix(w * h * channels)
    buf = IC.encode_tiff(
        w, h, px, channels=channels, big_endian=big_endian,
        packbits=packbits,
    )
    assert IC.decode_tiff(buf) == (w, h, channels, px)


def test_tiff_multi_strip_is_real():
    w, h = 5, 8
    buf = IC.encode_tiff(w, h, _pix(w * h * 3), rows_per_strip=3)
    # StripByteCounts (tag 279) must list 3 strips
    e = "<"
    (n_entries,) = struct.unpack(e + "H", buf[8:10])
    found = None
    for k in range(n_entries):
        tag, typ, cnt = struct.unpack(
            e + "HHI", buf[10 + 12 * k : 18 + 12 * k]
        )
        if tag == 279:
            found = cnt
    assert found == 3


def test_tiff_palette_expands_colormap_high_byte():
    w, h = 6, 5
    cmap = [((c * 257) & 0xFFFF, (c * 123) & 0xFFFF, (c * 77) & 0xFFFF)
            for c in range(256)]
    idx = bytes((k * 7) % 256 for k in range(w * h))
    buf = IC.encode_tiff(w, h, idx, channels=1, colormap=cmap)
    got = IC.decode_tiff(buf)
    assert got[:3] == (w, h, 3)
    px = got[3]
    for k, ci in enumerate(idx):
        assert px[3 * k] == cmap[ci][0] >> 8
        assert px[3 * k + 1] == cmap[ci][1] >> 8
        assert px[3 * k + 2] == cmap[ci][2] >> 8


def test_tiff_white_is_zero_inverts():
    # hand-patch photometric 1 -> 0 on a gray fixture
    w, h = 4, 3
    px = _pix(w * h, seed=9)
    buf = bytearray(IC.encode_tiff(w, h, px, channels=1))
    e = "<"
    (n_entries,) = struct.unpack(e + "H", buf[8:10])
    for k in range(n_entries):
        off = 10 + 12 * k
        tag, typ, cnt = struct.unpack(e + "HHI", buf[off : off + 8])
        if tag == 262:
            struct.pack_into(e + "H", buf, off + 8, 0)
    assert IC.decode_tiff(bytes(buf)) == (
        w, h, 1, bytes(255 - v for v in px),
    )


def test_packbits_raw_stream_properties():
    for data in (b"", b"a" * 300, bytes(range(128)) * 3,
                 b"abc" + b"d" * 10 + b"efg"):
        assert IC._packbits_decode(
            IC._packbits_encode(data), len(data)
        ) == data


def test_tiff_error_and_seam_paths():
    with pytest.raises(ValueError, match="byte-order"):
        IC.decode_tiff(b"PK\x03\x04" + b"\x00" * 20)
    good = IC.encode_tiff(4, 4, _pix(48))
    with pytest.raises(ValueError):
        IC.decode_tiff(good[:20])
    # CCITT compression (2) is a documented seam (LZW decodes for
    # real since round 16, so it moved out of this test)
    b2 = bytearray(good)
    e = "<"
    (n_entries,) = struct.unpack(e + "H", b2[8:10])
    for k in range(n_entries):
        off = 10 + 12 * k
        tag = struct.unpack(e + "H", b2[off : off + 2])[0]
        if tag == 259:
            struct.pack_into(e + "H", b2, off + 8, 2)
    with pytest.raises(NotImplementedError, match="compression 2"):
        IC.decode_tiff(bytes(b2))
    # flipping an UNCOMPRESSED stream's tag to LZW (5) must fail the
    # LZW code-sequence validation, not crash or mis-decode
    b2b = bytearray(good)
    for k in range(n_entries):
        off = 10 + 12 * k
        tag = struct.unpack(e + "H", b2b[off : off + 2])[0]
        if tag == 259:
            struct.pack_into(e + "H", b2b, off + 8, 5)
    with pytest.raises(ValueError, match="LZW"):
        IC.decode_tiff(bytes(b2b))
    # dimension bomb must raise, not allocate
    b3 = bytearray(good)
    for k in range(n_entries):
        off = 10 + 12 * k
        tag = struct.unpack(e + "H", b3[off : off + 2])[0]
        if tag == 256:
            struct.pack_into(e + "H", b3, off + 8, 60000)
        if tag == 257:
            struct.pack_into(e + "H", b3, off + 8, 60000)
    with pytest.raises(ValueError, match="implausible|truncated|mismatch"):
        IC.decode_tiff(bytes(b3))


def test_tiff_through_the_image_seam():
    from mapreduceframework_spark.operators.multimodal import (
        decode_image, decode_payload,
    )

    px = _pix(4 * 3 * 3)
    t = IC.encode_tiff(4, 3, px)
    assert decode_image(t, "image/tiff") == (4, 3, 3, px)
    assert decode_payload(t, "image/tiff") == px


def test_tiff_corruption_never_leaks_raw_exceptions():
    cmap = [(c << 8, c << 8, c << 8) for c in range(256)]
    fixtures = [
        IC.encode_tiff(6, 5, _pix(90)),
        IC.encode_tiff(6, 5, _pix(90), big_endian=True, packbits=True),
        IC.encode_tiff(6, 5, _pix(30), channels=1, colormap=cmap),
        # round-15 paths: tiled (padded edge tiles, both compressions)
        # and planar configuration 2
        IC.encode_tiff(7, 5, _pix(105), tiles=(4, 3)),
        IC.encode_tiff(7, 5, _pix(105), tiles=(4, 3), packbits=True,
                       big_endian=True),
        IC.encode_tiff(6, 5, _pix(90), planar=True, packbits=True),
    ]
    for buf in fixtures:
        for cut in range(len(buf)):
            try:
                IC.decode_tiff(buf[:cut])
            except (ValueError, NotImplementedError):
                pass
        for k in range(len(buf)):
            m = bytearray(buf)
            m[k] ^= 0x5A
            try:
                IC.decode_tiff(bytes(m))
            except (ValueError, NotImplementedError):
                pass


def test_jpeg_strip_mcu_padding_cropped():
    """A spec-valid JPEG-in-TIFF whose LAST strip's JPEG is MCU-padded
    past ImageLength (h not a multiple of 8) must decode with the pad
    rows cropped (round 16, per the r15 ADVICE); a strip padded by a
    full MCU or more is a geometry error, not padding."""
    w, h = 16, 10
    pix = bytes(
        (3 * 7 + ((y // 8) * (w // 8) + x // 8) * 13) % 256
        for y in range(h) for x in range(w)
    )
    good = IC.encode_tiff(w, h, pix, channels=1, rows_per_strip=8,
                          jpeg=True)
    assert IC.decode_tiff(good) == (w, h, 1, pix)

    def swap_last_strip(jpeg_bytes: bytes) -> bytes:
        e = "<"
        (n_entries,) = struct.unpack(e + "H", good[8:10])
        tags = {}
        for k in range(n_entries):
            off = 10 + 12 * k
            tag = struct.unpack(e + "H", good[off : off + 2])[0]
            tags[tag] = off
        (ptr_off,) = struct.unpack(
            e + "I", good[tags[273] + 8 : tags[273] + 12]
        )
        (ptr_cnt,) = struct.unpack(
            e + "I", good[tags[279] + 8 : tags[279] + 12]
        )
        offsets = struct.unpack(e + "2I", good[ptr_off : ptr_off + 8])
        counts = struct.unpack(e + "2I", good[ptr_cnt : ptr_cnt + 8])
        assert offsets[1] + counts[1] == len(good)
        new = bytearray(good[: offsets[1]]) + jpeg_bytes
        struct.pack_into(e + "I", new, ptr_cnt + 4, len(jpeg_bytes))
        return bytes(new)

    last_rows = pix[8 * w : 10 * w]
    padded = IC.encode_jpeg(
        w, 8, last_rows + last_rows[-w:] * 6, channels=1
    )
    assert IC.decode_tiff(swap_last_strip(padded)) == (w, h, 1, pix)
    way_padded = IC.encode_jpeg(
        w, 24, last_rows + last_rows[-w:] * 22, channels=1
    )
    with pytest.raises(ValueError, match="geometry"):
        IC.decode_tiff(swap_last_strip(way_padded))


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize(
    "comp", [{}, {"packbits": True}, {"lzw": True},
             {"tiles": (6, 4)}, {"tiles": (6, 4), "lzw": True}]
)
def test_tiff_wide16_roundtrip(big_endian, comp):
    """16-bit samples (round 16): fixtures store v*257 (both bytes v,
    byte-order agnostic on disk) and the decoder's high-byte reduction
    returns v exactly — across compressions and tiling."""
    px = _pix(20 * 9 * 3)
    buf = IC.encode_tiff(20, 9, px, channels=3, big_endian=big_endian,
                         wide16=True, rows_per_strip=4, **comp)
    assert IC.decode_tiff(buf) == (20, 9, 3, px)
    # BitsPerSample really says 16
    e = ">" if big_endian else "<"
    (n_entries,) = struct.unpack(e + "H", buf[8:10])
    for k in range(n_entries):
        off = 10 + 12 * k
        tag, typ, cnt = struct.unpack(e + "HHI", buf[off : off + 8])
        if tag == 258:
            assert cnt == 3


def test_tiff_wide16_high_byte_convention_and_seams():
    # a NON-lattice 16-bit sample reduces to its high byte, honoring
    # the file byte order (II stores low byte first)
    buf = bytearray(IC.encode_tiff(1, 1, b"\x00", channels=1,
                                   wide16=True))
    buf[-2:] = b"\xab\x34"  # II: low=0xab, high=0x34
    assert IC.decode_tiff(bytes(buf))[3] == b"\x34"
    mm = bytearray(IC.encode_tiff(1, 1, b"\x00", channels=1,
                                  wide16=True, big_endian=True))
    mm[-2:] = b"\x34\xab"  # MM: high first
    assert IC.decode_tiff(bytes(mm))[3] == b"\x34"
    # planar 16-bit works; palette/JPEG combinations with 16-bit stay
    # explicit seams or encode errors
    px = _pix(10 * 4 * 3)
    buf = IC.encode_tiff(10, 4, px, channels=3, wide16=True,
                         planar=True, packbits=True, rows_per_strip=2)
    assert IC.decode_tiff(buf) == (10, 4, 3, px)
    # predictor 2 over 16-bit decodes since late round 16 — word-level
    # differencing in file byte order
    for be in (False, True):
        buf = IC.encode_tiff(10, 4, px, channels=3, wide16=True,
                             predictor=2, lzw=True, big_endian=be)
        assert IC.decode_tiff(buf) == (10, 4, 3, px)
    # mixed widths stay a seam
    g = IC.encode_tiff(10, 4, px, channels=3, lzw=True, predictor=2)
    (n_entries,) = struct.unpack("<H", g[8:10])
    b2 = bytearray(g)
    for k in range(n_entries):
        off = 10 + 12 * k
        tag = struct.unpack("<H", b2[off : off + 2])[0]
        if tag == 258:
            (voff,) = struct.unpack("<I", b2[off + 8 : off + 12])
            struct.pack_into("<H", b2, voff, 16)  # only sample 0
    with pytest.raises(NotImplementedError, match="bits-per-sample"):
        IC.decode_tiff(bytes(b2))


def test_tiff_wide16_truncation_rejects():
    px = _pix(8 * 3 * 3)
    buf = IC.encode_tiff(8, 3, px, channels=3, wide16=True)
    # chop half the (doubled) raster: must reject, not half-decode
    with pytest.raises(ValueError):
        IC.decode_tiff(buf[: len(buf) - 8 * 3 * 3])


def _block_solid16(w, h, seed=3, ch=1):
    bw = w // 8
    px = bytes(
        (seed * 7 + ((y // 8) * bw + x // 8) * 13) % 256
        for y in range(h) for x in range(w)
    )
    if ch == 3:
        px = b"".join(bytes((v, v, v)) for v in px)
    return px


@pytest.mark.parametrize("big_endian", [False, True])
def test_jpeg_tables_strips_roundtrip(big_endian):
    """Round 16: abbreviated JPEGTables (tag 347) streams — tables
    split into the shared tag, strips abbreviated, decode splices
    them back (TIFF TechNote 2 override semantics)."""
    w, h = 24, 16
    px = _block_solid16(w, h)
    buf = IC.encode_tiff(w, h, px, channels=1, rows_per_strip=8,
                         jpeg=True, jpeg_tables=True,
                         big_endian=big_endian)
    assert IC.decode_tiff(buf) == (w, h, 1, px)
    # the strips really are abbreviated: no DQT marker after the
    # JPEGTables payload ends (the tag block precedes strip data)
    e = ">" if big_endian else "<"
    (n_entries,) = struct.unpack(e + "H", buf[8:10])
    jt_off = jt_len = None
    for k in range(n_entries):
        off = 10 + 12 * k
        tag, typ, cnt = struct.unpack(e + "HHI", buf[off : off + 8])
        if tag == 347:
            assert typ == 7
            (jt_off,) = struct.unpack(e + "I", buf[off + 8 : off + 12])
            jt_len = cnt
    assert jt_off is not None
    jt = buf[jt_off : jt_off + jt_len]
    assert jt[:2] == b"\xff\xd8" and jt[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in jt and b"\xff\xc4" in jt
    assert b"\xff\xdb" not in buf[jt_off + jt_len :]


@pytest.mark.parametrize("jpeg_tables", [False, True])
def test_jpeg_tiled_roundtrip(jpeg_tables):
    """Round 16: tiled JPEG-in-TIFF — each tile a complete (or
    abbreviated) JPEG stream at the tile extent."""
    w, h = 32, 24
    px = _block_solid16(w, h)
    buf = IC.encode_tiff(w, h, px, channels=1, jpeg=True,
                         tiles=(16, 8), jpeg_tables=jpeg_tables)
    assert IC.decode_tiff(buf) == (w, h, 1, px)


def test_jpeg_tables_rgb_tolerance_and_guards():
    px = _block_solid16(16, 8, seed=5, ch=3)
    buf = IC.encode_tiff(16, 8, px, channels=3, rows_per_strip=8,
                         jpeg=True, jpeg_tables=True)
    got = IC.decode_tiff(buf)
    assert got[:3] == (16, 8, 3)
    assert max(abs(a - b) for a, b in zip(got[3], px)) <= 1
    with pytest.raises(ValueError, match="jpeg_tables requires"):
        IC.encode_tiff(16, 8, px, channels=3, jpeg_tables=True)
    # malformed JPEGTables payload (no SOI) must reject cleanly
    buf2 = bytearray(
        IC.encode_tiff(16, 8, _block_solid16(16, 8), channels=1,
                       rows_per_strip=8, jpeg=True, jpeg_tables=True)
    )
    i = buf2.find(b"\xff\xd8", 2)
    buf2[i] = 0x00
    with pytest.raises(ValueError, match="JPEGTables"):
        IC.decode_tiff(bytes(buf2))


def test_jpeg_tables_corruption_never_leaks():
    buf = IC.encode_tiff(24, 16, _block_solid16(24, 16), channels=1,
                         rows_per_strip=8, jpeg=True, jpeg_tables=True)
    for cut in range(0, len(buf), 3):
        try:
            IC.decode_tiff(buf[:cut])
        except (ValueError, NotImplementedError):
            pass
    for k in range(0, len(buf), 3):
        m = bytearray(buf)
        m[k] ^= 0x5A
        try:
            IC.decode_tiff(bytes(m))
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize(
    "comp", [{}, {"lzw": True}, {"deflate": True}, {"packbits": True},
             {"tiles": (6, 4), "deflate": True}]
)
def test_tiff_deflate_and_wide16_predictor2(big_endian, comp):
    """Round 16 late adds: Adobe Deflate (8/32946, stdlib zlib) and
    Predictor 2 over 16-bit samples (word-level differencing in the
    file byte order) — a full matrix against both byte orders."""
    px = _pix(20 * 9 * 3)
    buf = IC.encode_tiff(20, 9, px, channels=3, big_endian=big_endian,
                         wide16=True, predictor=2, rows_per_strip=4,
                         **comp)
    assert IC.decode_tiff(buf) == (20, 9, 3, px)
    # plain 8-bit deflate too
    if comp.get("deflate"):
        buf = IC.encode_tiff(20, 9, px, channels=3,
                             big_endian=big_endian, deflate=True,
                             predictor=2, rows_per_strip=4)
        assert IC.decode_tiff(buf) == (20, 9, 3, px)


def test_tiff_deflate_legacy_code_and_corruption():
    px = _pix(12 * 6 * 3)
    buf = bytearray(IC.encode_tiff(12, 6, px, channels=3,
                                   deflate=True, rows_per_strip=2))
    (n_entries,) = struct.unpack("<H", buf[8:10])
    for k in range(n_entries):
        off = 10 + 12 * k
        if struct.unpack("<H", buf[off : off + 2])[0] == 259:
            struct.pack_into("<H", buf, off + 8, 32946)  # legacy code
    assert IC.decode_tiff(bytes(buf)) == (12, 6, 3, px)
    good = bytes(buf)
    for cut in range(8, len(good), 7):
        try:
            out = IC.decode_tiff(good[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert out == (12, 6, 3, px)
    for k in range(0, len(good), 5):
        m = bytearray(good)
        m[k] ^= 0x5A
        try:
            IC.decode_tiff(bytes(m))
        except (ValueError, NotImplementedError):
            pass


def test_undiff16_manual_vector():
    # one row, 2 samples/pixel, 3 px: words diff against the word one
    # PIXEL back (delta=2 samples), little-endian
    import struct as _s
    vals = [1000, 50000, 1300, 49500, 1900, 50500]
    diffed = [1000, 50000,
              (1300 - 1000) & 0xFFFF, (49500 - 50000) & 0xFFFF,
              (1900 - 1300) & 0xFFFF, (50500 - 49500) & 0xFFFF]
    chunk = bytearray(b"".join(_s.pack("<H", v) for v in vals))
    IC._tiff_diff16(chunk, len(chunk), 2, "<")
    assert [
        _s.unpack_from("<H", chunk, 2 * i)[0] for i in range(6)
    ] == diffed
    IC._tiff_undiff16(chunk, len(chunk), 2, "<")
    assert [
        _s.unpack_from("<H", chunk, 2 * i)[0] for i in range(6)
    ] == vals


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize(
    "comp", [{}, {"packbits": True}, {"lzw": True}, {"deflate": True},
             {"tiles": (8, 4), "lzw": True},
             {"tiles": (16, 5), "deflate": True}]
)
def test_tiff_bilevel_roundtrip(big_endian, comp):
    """Round 16: 1-bit bilevel TIFF (scanned-document class) —
    MSB-first packed byte-aligned rows, photometric 0 mapping
    1=black=0, across compressions/tiling/byte orders. Width 21 is
    deliberately not byte-aligned (pad bits exercised)."""
    w, h = 21, 9
    bits = bytes(
        1 if (i * 7 + (i // w) * 13) % 5 < 2 else 0
        for i in range(w * h)
    )
    want = bytes(0 if b else 255 for b in bits)
    buf = IC.encode_tiff(w, h, bits, channels=1, bilevel=True,
                         big_endian=big_endian, rows_per_strip=3,
                         **comp)
    assert IC.decode_tiff(buf) == (w, h, 1, want)


def test_tiff_bilevel_conventions_and_crosscheck():
    w, h = 21, 9
    bits = bytes(
        1 if (i * 11 + (i // w) * 3) % 7 < 3 else 0
        for i in range(w * h)
    )
    # photometric 1 (BlackIsZero) flips the mapping: hand-patch
    b = bytearray(IC.encode_tiff(w, h, bits, channels=1, bilevel=True))
    (n_entries,) = struct.unpack("<H", b[8:10])
    for k in range(n_entries):
        off = 10 + 12 * k
        if struct.unpack("<H", b[off : off + 2])[0] == 262:
            struct.pack_into("<H", b, off + 8, 1)
    want0 = bytes(0 if v else 255 for v in bits)
    assert IC.decode_tiff(bytes(b)) == (
        w, h, 1, bytes(255 - v for v in want0),
    )
    # cross-check the packed-row layout against the in-repo PBM P4
    # path: same bits, identical decoded bytes
    p4 = IC.decode_pnm(IC.encode_pbm(w, h, bits, packed=True))
    t = IC.decode_tiff(IC.encode_tiff(w, h, bits, channels=1,
                                      bilevel=True))
    assert p4 == t
    # non-byte-aligned bilevel tiles + JPEG-over-1-bit reject
    with pytest.raises(ValueError, match="byte-aligned"):
        IC.encode_tiff(w, h, bits, channels=1, bilevel=True,
                       tiles=(12, 4))
    with pytest.raises(ValueError):
        IC.encode_tiff(w, h, bits, channels=1, bilevel=True, jpeg=True)


def test_tiff_bilevel_corruption_never_leaks():
    w, h = 16, 6
    bits = bytes(1 if (i * 5) % 3 == 0 else 0 for i in range(w * h))
    for comp in ({}, {"lzw": True}, {"tiles": (8, 3), "deflate": True}):
        buf = IC.encode_tiff(w, h, bits, channels=1, bilevel=True,
                             rows_per_strip=2, **comp)
        for cut in range(len(buf)):
            try:
                IC.decode_tiff(buf[:cut])
            except (ValueError, NotImplementedError):
                pass
        for k in range(len(buf)):
            m = bytearray(buf)
            m[k] ^= 0x5A
            try:
                IC.decode_tiff(bytes(m))
            except (ValueError, NotImplementedError):
                pass
