"""Pure-Python image codecs for the multimodal decode seam.

Real decoders, no external imaging library required:

- **PPM/PGM (P6/P5)**: full netpbm binary parser — header tokenizer
  with ``#`` comments, arbitrary whitespace, maxval validation.
- **PNG**: real PNG decoding via the stdlib ``zlib`` inflate — chunk
  walk (IHDR/IDAT/IEND with CRC check), concatenated-IDAT inflate, and
  scanline UN-filtering for all five filter types (None/Sub/Up/
  Average/Paeth) on 8-bit gray/RGB/RGBA.
- **WAV (RIFF PCM)**: chunk-walking RIFF parser for 16-bit PCM audio —
  the audio modality's real decoder (fmt/data located positionally
  -independently, LIST/INFO chunks tolerated, word alignment handled).

These plug into ``operators/multimodal.py::decode_payload``; the
mapInPandas plumbing there is format-agnostic. Encoders live here too so
tests and the oracle-checked round-trip query can synthesize valid files
deterministically (the PNG encoder cycles through all five filter types
so a decode bug in any one of them breaks the value hash).

Scale: decode is per-payload Python inside an Arrow batch — the standard
multimodal hot path (a C-extension codec swaps in at the same seam).
Nothing here touches Spark; it's plain bytes -> (w, h, channels, pixels).
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# --------------------------------------------------------------------------


def _pnm_tokens(buf: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens starting at
    ``start``, skipping ``#`` comments (netpbm header grammar)."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i] == ord("#"):
            while i < len(buf) and buf[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(buf[i:j]))
        i = j
    return toks, i


def decode_pnm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode binary PPM (P6, RGB) or PGM (P5, gray).

    Returns ``(width, height, channels, pixels)`` with ``pixels`` in
    row-major interleaved order, exactly ``w*h*channels`` bytes.
    """
    if buf[:2] == b"P6":
        channels = 3
    elif buf[:2] == b"P5":
        channels = 1
    else:
        raise ValueError(f"not a binary PPM/PGM: magic {buf[:2]!r}")
    (w, h, maxval), i = _pnm_tokens(buf, 3, 2)
    if not (0 < maxval < 65536):
        raise ValueError(f"bad maxval {maxval}")
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    i += 1  # single whitespace byte after maxval, then raster
    need = w * h * channels
    pixels = buf[i : i + need]
    if len(pixels) != need:
        raise ValueError(f"raster truncated: want {need}, got {len(pixels)}")
    return w, h, channels, pixels


def encode_ppm(w: int, h: int, pixels: bytes) -> bytes:
    """Binary P6 with a comment line (exercises the tokenizer)."""
    if len(pixels) != w * h * 3:
        raise ValueError("pixel buffer size mismatch")
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + pixels


def encode_pgm(w: int, h: int, pixels: bytes) -> bytes:
    if len(pixels) != w * h:
        raise ValueError("pixel buffer size mismatch")
    return b"P5\n%d %d\n255\n" % (w, h) + pixels


# --------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, all five scanline filters)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, truecolor, truecolor+alpha


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit non-interlaced PNG (gray / RGB / RGBA).

    Real decode path: chunk walk with CRC verification, zlib inflate of
    the concatenated IDAT stream, then per-scanline un-filtering of all
    five PNG filter types. Returns ``(w, h, channels, pixels)``.
    """
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    i = 8
    w = h = bit_depth = color_type = -1
    idat = bytearray()
    while i < len(buf):
        # Bounds-check before slicing: a buffer truncated mid-chunk must
        # surface as ValueError (corrupt payload), never a raw
        # struct.error (code bug) — mapInPandas callers distinguish the
        # two.
        if i + 8 > len(buf):
            raise ValueError("truncated PNG: chunk header cut short")
        (length,) = struct.unpack(">I", buf[i : i + 4])
        ctype = buf[i + 4 : i + 8]
        if i + 12 + length > len(buf):
            raise ValueError(f"truncated PNG: {ctype!r} chunk body cut short")
        data = buf[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", buf[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError(f"malformed IHDR: length {length}")
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth}")
            if color_type not in _COLOR_CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise NotImplementedError("nonstandard compression/interlace")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if w < 0:
        raise ValueError("missing IHDR")
    channels = _COLOR_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("inflated size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                c = prev[x - channels] if x >= channels else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return w, h, channels, bytes(out)


def _filter_line(
    ftype: int, line: bytes, prev: bytes, channels: int
) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    stride = len(line)
    out = bytearray(stride)
    for x in range(stride):
        a = line[x - channels] if x >= channels else 0
        b = prev[x]
        c = prev[x - channels] if x >= channels else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    w: int, h: int, pixels: bytes, channels: int = 3
) -> bytes:
    """Encode an 8-bit PNG, cycling the filter type per row (row r uses
    filter r % 5) so a decoder must implement ALL filters correctly to
    reproduce the pixels."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = w * channels
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    prev = bytes(stride)
    for row in range(h):
        line = pixels[row * stride : (row + 1) * stride]
        ftype = row % 5
        raw.append(ftype)
        raw += _filter_line(ftype, line, prev, channels)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio modality's real decoder
# --------------------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a RIFF/WAVE file with 16-bit PCM samples.

    Real RIFF chunk walk: validates the RIFF/WAVE header, locates the
    ``fmt `` and ``data`` chunks wherever they appear (files in the
    wild carry LIST/INFO chunks in between), checks PCM/16-bit, and
    returns ``(sample_rate, channels, n_frames, samples)`` with
    ``samples`` as the raw little-endian int16 frame data.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    sample_rate = channels = bits = -1
    data: bytes | None = None
    while i + 8 <= len(buf):
        ctype = buf[i : i + 4]
        (length,) = struct.unpack("<I", buf[i + 4 : i + 8])
        if i + 8 + length > len(buf):
            raise ValueError(f"truncated WAV: {ctype!r} chunk body cut short")
        body = buf[i + 8 : i + 8 + length]
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError(f"malformed fmt chunk: length {length}")
            fmt_tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1:
                raise NotImplementedError(f"non-PCM format tag {fmt_tag}")
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit PCM not supported")
        elif ctype == b"data":
            data = body
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate < 0 or data is None:
        raise ValueError("missing fmt or data chunk")
    if channels < 1:
        raise ValueError(f"malformed fmt chunk: channels={channels}")
    frame_bytes = 2 * channels
    if len(data) % frame_bytes:
        raise ValueError("data chunk not a whole number of frames")
    return sample_rate, channels, len(data) // frame_bytes, data


def encode_wav(
    sample_rate: int, channels: int, samples: bytes
) -> bytes:
    """Encode 16-bit PCM frames as RIFF/WAVE, with a LIST chunk between
    fmt and data so decoders must actually walk chunks rather than
    assume fixed offsets."""
    if len(samples) % (2 * channels):
        raise ValueError("sample buffer not a whole number of frames")
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    info = b"INFOISFT\x0e\x00\x00\x00synthetic/v1\x00\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def sample_digest_u16(samples: bytes) -> int:
    """31x fold over the little-endian uint16 reinterpretation of the
    PCM stream — unsigned so the oracle's analytic formula needs no
    sign gymnastics; same modulo convention as :func:`pixel_digest`."""
    acc = 0
    for k in range(0, len(samples), 2):
        v = samples[k] | (samples[k + 1] << 8)
        acc = (acc * 31 + v) % DIGEST_MOD
    return acc


# --------------------------------------------------------------------------
# Cross-engine digest (same fold as the kmeans centroid digest)
# --------------------------------------------------------------------------

DIGEST_MOD = 1000000007


def pixel_digest(pixels: bytes) -> int:
    """31x fold over pixel bytes with truncated (sign-of-dividend)
    modulo — matches Spark's and DuckDB's ``%``, so the oracle can
    reproduce it with list_reduce over the same byte sequence."""
    acc = 0
    for v in pixels:
        acc = acc * 31 + v
        acc = acc % DIGEST_MOD if acc >= 0 else -((-acc) % DIGEST_MOD)
    return acc
