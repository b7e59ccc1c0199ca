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
    # 16-bit decodes since round 16 (implied 555) — flipping a 24-bit
    # file's bpp to 16 now re-reads the raster as 555 rows or rejects
    # on size, but never mis-raises; a truly unsupported depth (2)
    # stays the documented seam
    b2 = bytearray(good)
    struct.pack_into("<H", b2, 28, 2)
    with pytest.raises(NotImplementedError, match="bpp 2"):
        IC.decode_bmp(bytes(b2))
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


def test_bmp_bitfields_roundtrip_and_conventions():
    """Round 16: BI_BITFIELDS (masked 16/32-bit, the screenshot
    class) + plain 16-bit BI_RGB's implied X1R5G5B5 default. Width-8
    masks are exact for any RGB; narrower masks round-trip on the
    bit-replication lattice ((c<<3)|(c>>2) at width 5 — the repo's
    15/16-bit convention, shared with TGA)."""
    import struct

    from mapreduceframework_spark.operators import imagecodec as IC

    def expand(cv, wd):
        vv, ww = cv, wd
        while ww < 8:
            vv = (vv << wd) | cv
            ww += wd
        return vv >> (ww - 8)

    w, h = 13, 6
    src = bytes((i * 29 + 17) % 256 for i in range(w * h * 3))
    for masks in ((0x00FF0000, 0x0000FF00, 0x000000FF),
                  (0x000000FF, 0x0000FF00, 0x00FF0000)):
        for td in (False, True):
            buf = IC.encode_bmp(w, h, src, top_down=td, bpp=32,
                                bitfields=masks)
            assert IC.decode_bmp(buf) == (w, h, 3, src)
    for masks, widths in (((0xF800, 0x07E0, 0x001F), (5, 6, 5)),
                          ((0x7C00, 0x03E0, 0x001F), (5, 5, 5))):
        lat = bytes(
            expand(v >> (8 - wd), wd)
            for i in range(w * h)
            for v, wd in zip(src[i * 3 : i * 3 + 3], widths)
        )
        buf = IC.encode_bmp(w, h, lat, bpp=16, bitfields=masks)
        assert IC.decode_bmp(buf) == (w, h, 3, lat)
    # plain 16-bit BI_RGB = 555 default
    lat555 = bytes(expand(v >> 3, 5) for v in src)
    buf = bytearray(IC.encode_bmp(w, h, lat555, bpp=16,
                                  bitfields=(0x7C00, 0x03E0, 0x001F)))
    struct.pack_into("<I", buf, 30, 0)
    assert IC.decode_bmp(bytes(buf)) == (w, h, 3, lat555)
    # mask validation: overlapping / non-contiguous / zero reject
    for bad in ((0xFF00, 0x0FF0, 0x00FF), (0xF0F0, 0x0F00, 0x000F),
                (0, 0x07E0, 0x001F)):
        b2 = bytearray(IC.encode_bmp(w, h, src, bpp=32,
                                     bitfields=(0xFF0000, 0xFF00, 0xFF)))
        struct.pack_into("<III", b2, 54, *bad)
        with pytest.raises(ValueError):
            IC.decode_bmp(bytes(b2))


def test_bmp_bitfields_corruption_never_leaks():
    from mapreduceframework_spark.operators import imagecodec as IC

    w, h = 9, 5
    src = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    for bpp, masks in ((32, (0xFF0000, 0xFF00, 0xFF)),
                       (16, (0xF800, 0x07E0, 0x001F))):
        buf = IC.encode_bmp(w, h, src, bpp=bpp, bitfields=masks)
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


def test_bmp_bitfields_random_mask_property():
    """Random contiguous non-overlapping masks at widths 1..8, both
    bpps: encode on the replication lattice, decode must invert."""
    import random

    from mapreduceframework_spark.operators import imagecodec as IC

    def expand(cv, wd):
        vv, ww = cv, wd
        while ww < 8:
            vv = (vv << wd) | cv
            ww += wd
        return vv >> (ww - 8)

    rng = random.Random(1606)
    for _ in range(40):
        bpp = rng.choice((16, 32))
        # carve three disjoint contiguous fields into bpp bits
        while True:
            widths = [rng.randrange(1, 9) for _ in range(3)]
            if sum(widths) <= bpp:
                break
        # adjacent fields starting at bit 0 (disjoint by layout);
        # random gaps add nothing the mask validator doesn't cover
        shifts = []
        pos = 0
        for wd in widths:
            shifts.append(pos)
            pos += wd
        masks = tuple(((1 << wd) - 1) << sh
                      for wd, sh in zip(widths, shifts))
        w, h = rng.randrange(1, 12), rng.randrange(1, 8)
        lat = bytes(
            expand(rng.randrange(1 << wd), wd)
            for _ in range(w * h) for wd in widths
        )
        buf = IC.encode_bmp(w, h, lat, bpp=bpp, bitfields=masks,
                            top_down=bool(rng.getrandbits(1)))
        assert IC.decode_bmp(buf) == (w, h, 3, lat), (masks, bpp)
