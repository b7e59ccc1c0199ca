"""Round-14 BMP decoder tests (operators/imagecodec.py decode_bmp):
24-bit BI_RGB (bottom-up AND top-down, row padding), 8-bit paletted,
BI_RLE8 (encoded runs, absolute segments with word alignment,
end-of-line / end-of-bitmap escapes), error paths, and the corruption
sweep contract."""

from __future__ import annotations

import struct

import pytest

from mapreduceframework_spark.operators import imagecodec as IC


def _pix(n: int, seed: int = 3) -> bytes:
    return bytes((seed * 11 + i * 7) % 256 for i in range(n))


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w,h", [(1, 1), (5, 4), (6, 3), (7, 7)])
def test_bmp_24bit_round_trip(w, h, top_down):
    # w=5,7 force nonzero row padding (stride 4-alignment).
    px = _pix(w * h * 3)
    buf = IC.encode_bmp(w, h, px, top_down=top_down)
    assert IC.decode_bmp(buf) == (w, h, 3, px)


@pytest.mark.parametrize("rle", [False, True])
def test_bmp_8bit_palette_round_trip(rle):
    w, h = 9, 6
    pal = [bytes(((c * 37) % 256, (c * 5 + 9) % 256, (c * 91) % 256))
           for c in range(16)]
    # mix of runs (RLE path) and noise (absolute path)
    idx = bytes(
        (k // 7) % 16 if k % 11 < 7 else (k * 13) % 16
        for k in range(w * h)
    )
    buf = IC.encode_bmp(w, h, b"", palette=pal, indices=idx, rle=rle)
    want = b"".join(pal[i] for i in idx)
    assert IC.decode_bmp(buf) == (w, h, 3, want)


def test_bmp_rle_solid_runs_compress_and_decode():
    w, h = 64, 4
    pal = [bytes((c, c, c)) for c in range(4)]
    idx = bytes((k // 64) % 4 for k in range(w * h))  # solid rows
    rle_buf = IC.encode_bmp(w, h, b"", palette=pal, indices=idx, rle=True)
    raw_buf = IC.encode_bmp(w, h, b"", palette=pal, indices=idx, rle=False)
    assert len(rle_buf) < len(raw_buf)  # runs actually compress
    assert IC.decode_bmp(rle_buf) == IC.decode_bmp(raw_buf)


def test_bmp_through_the_image_seam():
    from mapreduceframework_spark.operators.multimodal import (
        decode_image, decode_payload,
    )

    px = _pix(4 * 3 * 3)
    buf = IC.encode_bmp(4, 3, px)
    assert decode_image(buf, "image/bmp") == (4, 3, 3, px)
    assert decode_payload(buf, "image/x-ms-bmp") == px


def test_bmp_error_paths():
    with pytest.raises(ValueError, match="BM magic"):
        IC.decode_bmp(b"PNG\x00" * 20)
    good = IC.encode_bmp(4, 4, _pix(48))
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_bmp(good[: len(good) - 10])
    # 16-bit BMP stays the documented seam
    b16 = bytearray(good)
    struct.pack_into("<H", b16, 28, 16)
    with pytest.raises(NotImplementedError, match="bpp 16"):
        IC.decode_bmp(bytes(b16))
    # corrupt-header dimension bomb must raise, not allocate
    bomb = bytearray(good)
    struct.pack_into("<ii", bomb, 18, 60000, 60000)
    with pytest.raises(ValueError, match="implausible|truncated"):
        IC.decode_bmp(bytes(bomb))


def test_bmp_corruption_never_leaks_raw_exceptions():
    pal = [bytes((c, 0, 255 - c)) for c in range(8)]
    idx = bytes((k * 3) % 8 for k in range(8 * 5))
    fixtures = [
        IC.encode_bmp(6, 4, _pix(72)),
        IC.encode_bmp(6, 4, _pix(72), top_down=True),
        IC.encode_bmp(8, 5, b"", palette=pal, indices=idx, rle=False),
        IC.encode_bmp(8, 5, b"", palette=pal, indices=idx, rle=True),
    ]
    for buf in fixtures:
        for cut in range(len(buf)):
            try:
                IC.decode_bmp(buf[:cut])
            except (ValueError, NotImplementedError):
                pass
        for k in range(len(buf)):
            m = bytearray(buf)
            m[k] ^= 0x5A
            try:
                IC.decode_bmp(bytes(m))
            except (ValueError, NotImplementedError):
                pass
