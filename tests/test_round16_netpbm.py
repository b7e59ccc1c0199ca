"""Round-16 netpbm closures: P7/PAM headers, 16-bit samples
(high-byte reduction), and the P1 packed-digit parse that the ADVICE
flagged (spec-legal ``0110`` rows with no separators).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduceframework_spark.operators import imagecodec as IC


def _pix(n: int) -> bytes:
    return bytes((i * 13 + 5) % 256 for i in range(n))


# ---------------------------------------------------------------------------
# P7 / PAM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_pam_roundtrip_all_depths(channels):
    px = _pix(6 * 4 * channels)
    buf = IC.encode_pam(6, 4, px, channels)
    assert IC.decode_pnm(buf) == (6, 4, channels, px)


def test_pam_wide_roundtrip():
    px = _pix(5 * 3 * 3)
    buf = IC.encode_pam(5, 3, px, 3, wide=True)
    assert IC.decode_pnm(buf) == (5, 3, 3, px)
    # the raster really is 2 bytes/sample
    assert buf.endswith(bytes(b for v in px for b in (v, v)))


def test_pam_header_grammar():
    px = _pix(2 * 2 * 3)
    # reordered keys + comments + blank lines are all legal
    buf = (b"P7\n# comment\nMAXVAL 255\n\nDEPTH 3\nHEIGHT 2\n"
           b"WIDTH 2\nTUPLTYPE RGB\nENDHDR\n" + px)
    assert IC.decode_pnm(buf) == (2, 2, 3, px)
    with pytest.raises(ValueError, match="missing ENDHDR"):
        IC.decode_pnm(b"P7\nWIDTH 2\nHEIGHT 2\nDEPTH 3\nMAXVAL 255\n")
    with pytest.raises(ValueError, match="PAM header missing"):
        IC.decode_pnm(b"P7\nWIDTH 2\nHEIGHT 2\nDEPTH 3\nENDHDR\n" + px)
    with pytest.raises(ValueError, match="unknown PAM header key"):
        IC.decode_pnm(b"P7\nWIDTH 2\nBOGUS 1\nENDHDR\n")
    with pytest.raises(ValueError, match="bad PAM header line"):
        IC.decode_pnm(b"P7\nWIDTH two\nENDHDR\n")
    with pytest.raises(ValueError, match="PAM depth"):
        IC.decode_pnm(
            b"P7\nWIDTH 2\nHEIGHT 2\nDEPTH 9\nMAXVAL 255\nENDHDR\n"
        )
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_pnm(
            b"P7\nWIDTH 9\nHEIGHT 9\nDEPTH 3\nMAXVAL 255\nENDHDR\nxy"
        )


# ---------------------------------------------------------------------------
# 16-bit samples (binary + ASCII): the v*257 lattice is exact
# ---------------------------------------------------------------------------

def test_wide_binary_roundtrip_p6():
    px = _pix(7 * 5 * 3)
    buf = IC.encode_ppm(7, 5, px, wide=True)
    assert IC.decode_pnm(buf) == (7, 5, 3, px)


def test_wide_ascii_roundtrip_p3():
    px = _pix(4 * 3 * 3)
    buf = IC.encode_pnm_ascii(4, 3, px, rgb=True, wide=True)
    assert b"65535" in buf
    assert IC.decode_pnm(buf) == (4, 3, 3, px)


def test_wide_high_byte_convention():
    # a NON-lattice 16-bit sample reduces to its high byte, exactly
    # like PNG 16-bit / TIFF ColorMap 8-bit renderings do in this repo
    buf = b"P5\n2 1\n65535\n" + bytes([0x12, 0x34, 0xAB, 0xCD])
    assert IC.decode_pnm(buf) == (2, 1, 1, bytes([0x12, 0xAB]))
    # ASCII twin
    buf = b"P2\n2 1\n65535\n%d %d\n" % (0x1234, 0xABCD)
    assert IC.decode_pnm(buf) == (2, 1, 1, bytes([0x12, 0xAB]))


def test_wide_truncation_and_maxval_checks():
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_pnm(b"P5\n2 2\n65535\n" + b"\x00" * 7)
    with pytest.raises(ValueError, match="exceeds maxval"):
        IC.decode_pnm(b"P2\n2 1\n300\n5 301\n")
    with pytest.raises(ValueError, match="bad maxval"):
        IC.decode_pnm(b"P5\n2 1\n65536\n" + b"\x00" * 4)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=6, max_size=90))
def test_wide_lattice_property(data):
    n = len(data) - len(data) % 3
    px = data[:n]
    if n == 0:
        return
    w, h = n // 3, 1
    assert IC.decode_pnm(IC.encode_ppm(w, h, px, wide=True)) == (
        w, h, 3, px,
    )
    assert IC.decode_pnm(IC.encode_pam(w, h, px, 3, wide=True)) == (
        w, h, 3, px,
    )


# ---------------------------------------------------------------------------
# P1 packed digits (the ADVICE item)
# ---------------------------------------------------------------------------

def test_p1_packed_digit_rows():
    # many writers emit '0110' with no separators — spec-legal
    buf = b"P1\n4 2\n0110\n1001\n"
    assert IC.decode_pnm(buf) == (
        4, 2, 1, bytes([255, 0, 0, 255, 0, 255, 255, 0]),
    )
    # mixed packed + separated + comment mid-raster
    buf = b"P1\n4 2\n01 10\n# note\n1 001\n"
    assert IC.decode_pnm(buf) == (
        4, 2, 1, bytes([255, 0, 0, 255, 0, 255, 255, 0]),
    )


def test_p1_separated_still_works_and_bad_digits_reject():
    buf = b"P1\n2 2\n0 1\n1 0\n"
    assert IC.decode_pnm(buf) == (2, 2, 1, bytes([255, 0, 0, 255]))
    with pytest.raises(ValueError, match="out of range"):
        IC.decode_pnm(b"P1\n2 2\n0 2\n1 0\n")
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_pnm(b"P1\n2 2\n0 1\n")


def test_p1_packed_equals_p4_packed():
    # the same bitmap through both PBM forms decodes identically
    bits = bytes([0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0])
    w, h = 4, 3
    ascii_packed = b"P1\n%d %d\n" % (w, h) + b"".join(
        b"%d" % b for b in bits
    )
    p4 = IC.encode_pbm(w, h, bits, packed=True)
    assert IC.decode_pnm(ascii_packed) == IC.decode_pnm(p4)


# ---------------------------------------------------------------------------
# dispatch integration (the matrix's image/ppm arm covers P7 + wide)
# ---------------------------------------------------------------------------

def test_pam_and_wide_through_decode_image():
    from mapreduceframework_spark.operators.multimodal import decode_image

    px = _pix(6 * 3 * 3)
    assert decode_image(IC.encode_pam(6, 3, px, 3), "image/ppm") == (
        6, 3, 3, px,
    )
    assert decode_image(
        IC.encode_ppm(6, 3, px, wide=True), "image/ppm"
    ) == (6, 3, 3, px)


# ---------------------------------------------------------------------------
# round-16 hypothesis properties for the new TIFF paths (placed here
# to keep all round-16 codec properties in one module)
# ---------------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(st.integers(1, 30), st.integers(1, 10), st.integers(0, 2 ** 32))
def test_bilevel_tiff_roundtrip_property(w, h, seed):
    import random

    rng = random.Random(seed)
    bits = bytes(rng.randrange(2) for _ in range(w * h))
    want = bytes(0 if b else 255 for b in bits)
    comp = rng.choice(
        [{}, {"packbits": True}, {"lzw": True}, {"deflate": True}]
    )
    buf = IC.encode_tiff(w, h, bits, channels=1, bilevel=True,
                         big_endian=bool(seed % 2),
                         rows_per_strip=rng.randrange(1, h + 1), **comp)
    assert IC.decode_tiff(buf) == (w, h, 1, want)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 8), st.binary(min_size=0),
       st.booleans(), st.booleans())
def test_deflate_wide16_tiff_roundtrip_property(w, h, data, be, pred):
    px = (data * ((w * h * 3) // max(1, len(data)) + 1))[: w * h * 3]
    if len(px) < w * h * 3:
        px = px + bytes(w * h * 3 - len(px))
    buf = IC.encode_tiff(w, h, px, channels=3, big_endian=be,
                         wide16=True, deflate=True,
                         predictor=2 if pred else 1, rows_per_strip=2)
    assert IC.decode_tiff(buf) == (w, h, 3, px)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 8),
       st.integers(1, 4), st.binary(min_size=0), st.booleans())
def test_pam_roundtrip_property(w, h, channels, data, wide):
    n = w * h * channels
    px = (data * (n // max(1, len(data)) + 1))[:n]
    if len(px) < n:
        px = px + bytes(n - len(px))
    buf = IC.encode_pam(w, h, px, channels, wide=wide)
    assert IC.decode_pnm(buf) == (w, h, channels, px)
