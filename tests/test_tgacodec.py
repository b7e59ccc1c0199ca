"""Round-14 TGA decoder tests (operators/imagecodec.py decode_tga):
gray / 24- and 32-bit truecolor / paletted, uncompressed and RLE
(run + raw packets), bottom-up and top-down origins, error paths, and
the corruption-sweep contract."""

from __future__ import annotations

import pytest

from mapreduceframework_spark.operators import imagecodec as IC


def _pix(n: int, seed: int = 4) -> bytes:
    return bytes((seed * 13 + i * 5) % 256 for i in range(n))


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_tga_round_trip_matrix(channels, top_down, rle):
    w, h = 7, 5
    px = _pix(w * h * channels)
    buf = IC.encode_tga(
        w, h, px, channels=channels, rle=rle, top_down=top_down
    )
    assert IC.decode_tga(buf) == (w, h, channels, px)


@pytest.mark.parametrize("rle", [False, True])
def test_tga_palette_round_trip(rle):
    w, h = 8, 6
    pal = [bytes(((c * 31) % 256, (c * 7 + 3) % 256, (c * 53) % 256))
           for c in range(32)]
    idx = bytes((k // 5) % 32 if k % 9 < 6 else (k * 11) % 32
                for k in range(w * h))
    buf = IC.encode_tga(w, h, b"", palette=pal, indices=idx, rle=rle)
    want = b"".join(pal[i] for i in idx)
    assert IC.decode_tga(buf) == (w, h, 3, want)


def test_tga_rle_actually_compresses_runs():
    w, h = 64, 3
    px = bytes([200] * (w * h * 3))  # solid -> long runs
    rle_buf = IC.encode_tga(w, h, px, rle=True)
    raw_buf = IC.encode_tga(w, h, px, rle=False)
    assert len(rle_buf) < len(raw_buf) // 4
    assert IC.decode_tga(rle_buf) == IC.decode_tga(raw_buf)


def test_tga_through_the_image_seam():
    from mapreduceframework_spark.operators.multimodal import (
        decode_image, decode_payload,
    )

    px = _pix(5 * 4 * 3)
    t = IC.encode_tga(5, 4, px)
    assert decode_image(t, "image/tga") == (5, 4, 3, px)
    assert decode_payload(t, "image/x-tga") == px


def test_tga_error_and_seam_paths():
    with pytest.raises(ValueError, match="truncated TGA header"):
        IC.decode_tga(b"\x00" * 10)
    good = IC.encode_tga(4, 4, _pix(48))
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_tga(good[: len(good) - 8])
    # 15/16-bit ARGB1555 decodes since round 15
    # (tests/test_round15_codec_corners.py); an off-matrix depth is
    # still the documented seam.
    b12 = bytearray(good)
    b12[16] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        IC.decode_tga(bytes(b12))
    bomb = bytearray(good)
    import struct
    struct.pack_into("<HH", bomb, 12, 65535, 65535)
    with pytest.raises(ValueError, match="implausible|truncated"):
        IC.decode_tga(bytes(bomb))


def test_tga_corruption_never_leaks_raw_exceptions():
    pal = [bytes((c, 255 - c, c)) for c in range(16)]
    idx = bytes((k * 3) % 16 for k in range(7 * 4))
    fixtures = [
        IC.encode_tga(6, 4, _pix(72)),
        IC.encode_tga(6, 4, _pix(96), channels=4, rle=True),
        IC.encode_tga(6, 4, _pix(24), channels=1, top_down=True),
        IC.encode_tga(7, 4, b"", palette=pal, indices=idx, rle=True),
        # round-15 paths: 16-bit ARGB1555 (plain + RLE) and the
        # legacy interleaved row orders
        IC.encode_tga(6, 4, _pix(72), bits16=True),
        IC.encode_tga(6, 4, _pix(72), bits16=True, rle=True, interleave=1),
        IC.encode_tga(5, 7, _pix(105), interleave=2, top_down=True),
    ]
    for buf in fixtures:
        for cut in range(len(buf)):
            try:
                IC.decode_tga(buf[:cut])
            except (ValueError, NotImplementedError):
                pass
        for k in range(len(buf)):
            m = bytearray(buf)
            m[k] ^= 0x5A
            try:
                IC.decode_tga(bytes(m))
            except (ValueError, NotImplementedError):
                pass
