"""Pure-Python image codecs for the multimodal decode seam.

Real decoders, no external imaging library required:

- **netpbm (P1–P7)**: the full family — binary P6/P5, ASCII P3/P2/P1
  (incl. packed digit rows), packed P4, and (r16) P7/PAM key-value
  headers; header tokenizer with ``#`` comments, arbitrary
  whitespace, maxval validation, 16-bit samples reduced to their
  high byte (the PNG/TIFF 8-bit rendering convention).
- **PNG**: real PNG decoding via the stdlib ``zlib`` inflate — chunk
  walk (IHDR/IDAT/IEND with CRC check), concatenated-IDAT inflate, and
  scanline UN-filtering for all five filter types (None/Sub/Up/
  Average/Paeth) on 8-bit gray/RGB/RGBA, sequential or Adam7
  -interlaced (seven independently-filtered scattered passes, r13).
- **WAV (RIFF)**: chunk-walking RIFF parser — the audio modality's
  real decoder (fmt/fact/data located positionally-independently,
  LIST/INFO chunks tolerated, word alignment handled). Decodes 16-bit
  PCM and, since r13, the COMPRESSED formats G.711 A-law/mu-law
  (codeword tables cross-checked against CPython's independent
  audioop C implementation over the entire int16 domain) and IMA
  ADPCM (per-block predictor headers, interleaved nibble words, fact
  -chunk truncation).
- **JPEG (baseline + progressive)**: see the r13 sections below —
  marker walk, in-stream tables, restarts, IDCT, subsampled chroma,
  spectral-selection/successive-approximation multi-scan decode.
- **AVI (MJPEG)**: RIFF container walk to per-frame JPEG payloads —
  the video modality end to end, with container-level stride sampling
  so only sampled frames pay the decode.
- **GIF (87a/89a)**: real variable-width LZW (dictionary growth,
  CLEAR handling, the KwKwK case), global/local palettes, four-pass
  row interlace, multi-frame animation extraction.
- **MP4 / ISO BMFF**: box-tree walk + sample-table reconstruction
  (stsd/stts/stsc/stsz/stco) to codec-agnostic per-sample byte
  extents; 'jpeg' sample entries decode end to end, compressed codecs
  extract but keep the decode seam explicit.

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

import math
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


_PAM_INT_KEYS = (b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL")


def _pam_header(buf: bytes) -> tuple[int, int, int, int, int]:
    """Parse a P7/PAM header (round 16): key-value lines WIDTH /
    HEIGHT / DEPTH / MAXVAL / TUPLTYPE up to ENDHDR, '#' comment lines
    skipped. Returns ``(w, h, depth, maxval, raster_offset)``."""
    pos = 2
    fields: dict[bytes, int] = {}
    while True:
        nl = buf.find(b"\n", pos)
        if nl < 0:
            raise ValueError("PAM header missing ENDHDR")
        line = buf[pos:nl].strip()
        pos = nl + 1
        if not line or line.startswith(b"#"):
            continue
        parts = line.split()
        key = parts[0].upper()
        if key == b"ENDHDR":
            break
        if key == b"TUPLTYPE":
            continue  # informative only; DEPTH is authoritative here
        if key in _PAM_INT_KEYS:
            if len(parts) != 2 or not parts[1].isdigit():
                raise ValueError(f"bad PAM header line {line!r}")
            fields[key] = int(parts[1])
            continue
        raise ValueError(f"unknown PAM header key {key!r}")
    missing = [k for k in _PAM_INT_KEYS if k not in fields]
    if missing:
        raise ValueError(f"PAM header missing {missing}")
    return (fields[b"WIDTH"], fields[b"HEIGHT"], fields[b"DEPTH"],
            fields[b"MAXVAL"], pos)


def decode_pnm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode any netpbm raster: binary PPM/PGM (P6/P5), their ASCII
    twins (P3/P2, round 15), bitmap PBM in both forms (P1 ASCII —
    including PACKED digit rows like ``0110`` with no separators,
    which many writers emit — / P4 packed MSB-first rows; 1 = black
    maps to gray 0, 0 = white to 255, the bilevel convention), and —
    round 16 — P7/PAM (DEPTH 1/2/3/4) plus 16-bit samples in every
    non-bitmap form (maxval > 255: two-byte big-endian samples
    reduced to their high byte, the same 8-bit rendering convention
    as PNG 16-bit and the TIFF ColorMap).

    Returns ``(width, height, channels, pixels)`` with ``pixels`` in
    row-major interleaved order, exactly ``w*h*channels`` bytes.
    """
    magic = buf[:2]
    if magic == b"P7":
        kind = 7
        w, h, channels, maxval, i = _pam_header(buf)
        if channels not in (1, 2, 3, 4):
            raise ValueError(f"PAM depth {channels}")
        bitmap = False
    elif magic in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        kind = magic[1] - ord("0")
        channels = 3 if kind in (3, 6) else 1
        bitmap = kind in (1, 4)
        if bitmap:
            maxval = 1
            (w, h), i = _pnm_tokens(buf, 2, 2)
        else:
            (w, h, maxval), i = _pnm_tokens(buf, 3, 2)
    else:
        raise ValueError(f"not a netpbm file: magic {magic!r}")
    if not bitmap and not (0 < maxval < 65536):
        raise ValueError(f"bad maxval {maxval}")
    wide = maxval > 255
    if w <= 0 or h <= 0:
        raise ValueError(f"netpbm dimensions {w}x{h}")
    if w * h > 64 * max(1, len(buf)):
        raise ValueError("implausible netpbm dimensions for file size")
    need = w * h * channels
    if kind in (5, 6, 7):  # binary gray/RGB/PAM raster
        if kind != 7:
            i += 1  # single whitespace byte after maxval, then raster
        if wide:
            raw = buf[i : i + 2 * need]
            if len(raw) != 2 * need:
                raise ValueError(
                    f"raster truncated: want {2 * need}, got {len(raw)}"
                )
            return w, h, channels, raw[0::2]  # big-endian high bytes
        pixels = buf[i : i + need]
        if len(pixels) != need:
            raise ValueError(
                f"raster truncated: want {need}, got {len(pixels)}"
            )
        return w, h, channels, pixels
    if kind == 4:  # packed bitmap: MSB-first, rows byte-padded
        i += 1
        stride = (w + 7) // 8
        if i + stride * h > len(buf):
            raise ValueError("packed PBM raster truncated")
        out = bytearray(need)
        for y in range(h):
            row = buf[i + y * stride :]
            for x in range(w):
                bit = (row[x // 8] >> (7 - x % 8)) & 1
                out[y * w + x] = 0 if bit else 255
        return w, h, 1, bytes(out)
    if kind == 1:
        # ASCII bitmap: samples are single characters and the spec
        # does NOT require separators between them — scan characters,
        # skipping whitespace and '#' comments (round 16; the
        # token-based parse rejected packed '0110' rows).
        out = bytearray()
        j = i
        n = len(buf)
        while len(out) < need and j < n:
            c = buf[j]
            if c == ord("#"):
                while j < n and buf[j] != ord("\n"):
                    j += 1
                continue
            j += 1
            if c == ord("0"):
                out.append(255)
            elif c == ord("1"):
                out.append(0)
            elif not buf[j - 1 : j].isspace():
                raise ValueError("PBM sample out of range")
        if len(out) < need:
            raise ValueError("ascii PBM raster truncated")
        return w, h, 1, bytes(out)
    # ASCII rasters (P2/P3)
    vals, _ = _pnm_tokens(buf, need, i)
    if any(not 0 <= v <= maxval for v in vals):
        raise ValueError("netpbm sample exceeds maxval")
    if wide:
        return w, h, channels, bytes(v >> 8 for v in vals)
    return w, h, channels, bytes(vals)


def encode_ppm(w: int, h: int, pixels: bytes, wide: bool = False) -> bytes:
    """Binary P6 with a comment line (exercises the tokenizer).
    ``wide`` (round 16) writes 16-bit samples v*257 big-endian —
    maxval 65535 with the value in BOTH bytes, so the decoder's
    high-byte reduction returns the exact 8-bit input (the G.711
    decoder-output-lattice trick applied to sample width)."""
    if len(pixels) != w * h * 3:
        raise ValueError("pixel buffer size mismatch")
    if wide:
        raster = bytes(b for v in pixels for b in (v, v))
        return b"P6\n# synthetic\n%d %d\n65535\n" % (w, h) + raster
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + pixels


def encode_pgm(w: int, h: int, pixels: bytes) -> bytes:
    if len(pixels) != w * h:
        raise ValueError("pixel buffer size mismatch")
    return b"P5\n%d %d\n255\n" % (w, h) + pixels


def encode_pnm_ascii(
    w: int, h: int, pixels: bytes, rgb: bool, wide: bool = False
) -> bytes:
    """ASCII netpbm fixture (P3 RGB / P2 gray, round 15): one sample
    per token, a comment mid-header, line-wrapped raster. ``wide``
    (round 16) writes tokens v*257 under maxval 65535 (high-byte
    reduction returns the 8-bit input exactly)."""
    if len(pixels) != w * h * (3 if rgb else 1):
        raise ValueError("pixel buffer size mismatch")
    mul = 257 if wide else 1
    body = b"\n".join(
        b" ".join(b"%d" % (v * mul) for v in pixels[k : k + 12])
        for k in range(0, len(pixels), 12)
    )
    return b"%s\n# ascii fixture\n%d %d\n%d\n%s\n" % (
        b"P3" if rgb else b"P2", w, h, 65535 if wide else 255, body,
    )


def encode_pam(
    w: int, h: int, pixels: bytes, channels: int = 3, wide: bool = False
) -> bytes:
    """P7/PAM fixture (round 16): key-value header (with a comment
    line and the informative TUPLTYPE) + binary raster; ``wide``
    writes 16-bit v*257 samples under MAXVAL 65535."""
    if channels not in (1, 2, 3, 4):
        raise ValueError(f"PAM depth {channels}")
    if len(pixels) != w * h * channels:
        raise ValueError("pixel buffer size mismatch")
    tupltype = {
        1: b"GRAYSCALE", 2: b"GRAYSCALE_ALPHA",
        3: b"RGB", 4: b"RGB_ALPHA",
    }[channels]
    hdr = (
        b"P7\n# pam fixture\nWIDTH %d\nHEIGHT %d\nDEPTH %d\n"
        b"MAXVAL %d\nTUPLTYPE %s\nENDHDR\n"
        % (w, h, channels, 65535 if wide else 255, tupltype)
    )
    if wide:
        return hdr + bytes(b for v in pixels for b in (v, v))
    return hdr + pixels


def encode_pbm(w: int, h: int, bits: bytes, packed: bool = True) -> bytes:
    """Bitmap PBM fixture (round 15): ``bits`` holds one 0/1 byte per
    pixel (1 = black); ``packed`` picks P4 (MSB-first byte-padded
    rows) vs ASCII P1."""
    if len(bits) != w * h or any(b not in (0, 1) for b in bits):
        raise ValueError("bit buffer must be w*h bytes of 0/1")
    if not packed:
        body = b"\n".join(
            b" ".join(b"%d" % v for v in bits[y * w : (y + 1) * w])
            for y in range(h)
        )
        return b"P1\n%d %d\n%s\n" % (w, h, body)
    stride = (w + 7) // 8
    rows = bytearray()
    for y in range(h):
        row = bytearray(stride)
        for x in range(w):
            if bits[y * w + x]:
                row[x // 8] |= 0x80 >> (x % 8)
        rows += row
    return b"P4\n%d %d\n" % (w, h) + bytes(rows)


# --------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, all five scanline filters)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# gray, truecolor, gray+alpha, truecolor+alpha (paletted type 3 is
# handled separately: one index per pixel, PLTE-mapped after unfilter)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _unpack_indices(line: bytes, w: int, depth: int) -> bytes:
    """Unpack ``w`` palette indices from a packed scanline (PNG packs
    1/2/4-bit indices MSB-first within each byte; rows are padded to a
    whole byte independently)."""
    if depth == 8:
        return line[:w]
    per = 8 // depth
    mask = (1 << depth) - 1
    return bytes(
        (line[k // per] >> (8 - depth * (k % per + 1))) & mask
        for k in range(w)
    )


def _palette_expand(
    idx: bytes, pal: list[bytes], trns: bytes | None
) -> tuple[int, bytes]:
    """Map an index plane through the PLTE palette. Returns
    ``(channels, pixels)`` — RGBA when a tRNS chunk supplies per-entry
    alpha (entries past its end are opaque, per the spec), RGB
    otherwise."""
    npal = len(pal)
    if trns is None:
        out = bytearray(len(idx) * 3)
        for i, ci in enumerate(idx):
            if ci >= npal:
                raise ValueError(f"PNG palette index {ci} out of range")
            out[3 * i : 3 * i + 3] = pal[ci]
        return 3, bytes(out)
    out = bytearray(len(idx) * 4)
    nt = len(trns)
    for i, ci in enumerate(idx):
        if ci >= npal:
            raise ValueError(f"PNG palette index {ci} out of range")
        out[4 * i : 4 * i + 3] = pal[ci]
        out[4 * i + 3] = trns[ci] if ci < nt else 255
    return 4, bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG — gray / RGB / gray+alpha / RGBA at 8 or 16 bits,
    or PALETTED (color type 3) at 1/2/4/8-bit depth with optional
    tRNS transparency — sequential or Adam7-interlaced (r13; palette,
    gray-alpha and 16-bit r14: the classes a scraped web corpus is
    full of).

    Real decode path: chunk walk with CRC verification, zlib inflate
    of the concatenated IDAT stream, per-scanline un-filtering of all
    five PNG filter types (per-pass filter state for Adam7; byte step
    = bytes per pixel, so 16-bit filters correctly), the seven-pass
    scatter for interlaced streams, MSB-first sub-byte index
    unpacking, and PLTE/tRNS expansion (RGBA when tRNS is present,
    RGB otherwise). 16-bit samples reduce to their most significant
    byte — the spec-sanctioned scale-down an 8-bit pixel API applies
    (what stb_image's 8-bit entry points do). Returns
    ``(w, h, channels, pixels)``.
    """
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    i = 8
    w = h = bit_depth = color_type = -1
    pal: list[bytes] | None = None
    trns: bytes | None = None
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
            if color_type == 3:
                if bit_depth not in (1, 2, 4, 8):
                    raise NotImplementedError(
                        f"paletted bit depth {bit_depth}"
                    )
            elif color_type in _COLOR_CHANNELS:
                if bit_depth not in (8, 16):
                    raise NotImplementedError(f"bit depth {bit_depth}")
            else:
                raise NotImplementedError(f"color type {color_type}")
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise NotImplementedError("nonstandard compression/filter")
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError(f"malformed PLTE: length {length}")
            pal = [data[3 * k : 3 * k + 3] for k in range(length // 3)]
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if w < 0:
        raise ValueError("missing IHDR")
    paletted = color_type == 3
    if paletted:
        if not pal:
            raise ValueError("paletted PNG missing PLTE chunk")
        bits_pp = bit_depth  # bits per pixel: one packed index
        fbpp = 1  # filter byte step (max(1, bits//8), PNG 9.2)
    else:
        channels = _COLOR_CHANNELS[color_type]
        bits_pp = bit_depth * channels
        fbpp = max(1, bits_pp // 8)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e

    def row_bytes(width: int) -> int:
        return (width * bits_pp + 7) // 8

    if interlace == 0:
        stride = row_bytes(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("inflated size mismatch")
        lines, _ = _unfilter_lines(raw, 0, h, stride, fbpp)
        if paletted:
            idx = b"".join(
                _unpack_indices(line, w, bit_depth) for line in lines
            )
            nch, px = _palette_expand(idx, pal, trns)
            return w, h, nch, px
        if bit_depth == 16:
            # 16->8 MSB reduction (the spec-sanctioned scale-down an
            # 8-bit pixel API applies; samples are big-endian).
            lines = [line[::2] for line in lines]
        return w, h, channels, b"".join(lines)
    # Adam7: seven sub-images, each independently filtered, scattered
    # onto the full-resolution grid (of indices for paletted streams,
    # of channel bytes otherwise). Validate the total raw size BEFORE
    # allocating the full-resolution plane, so corrupt IHDR dimensions
    # raise instead of allocating w*h first.
    expected = sum(
        ph * (row_bytes(pw) + 1)
        for pw, ph in (
            ((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
        )
        if pw > 0 and ph > 0
    )
    if len(raw) != expected:
        raise ValueError("inflated size mismatch (interlaced)")
    if paletted:
        plane = bytearray(w * h)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            lines, off = _unfilter_lines(raw, off, ph, row_bytes(pw), 1)
            for j, line in enumerate(lines):
                ids = _unpack_indices(line, pw, bit_depth)
                y = y0 + j * dy
                for i in range(pw):
                    plane[y * w + x0 + i * dx] = ids[i]
        if off != len(raw):
            raise ValueError("inflated size mismatch (interlaced)")
        nch, px = _palette_expand(bytes(plane), pal, trns)
        return w, h, nch, px
    out = bytearray(w * h * channels)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes no scanlines
        lines, off = _unfilter_lines(raw, off, ph, row_bytes(pw), fbpp)
        if bit_depth == 16:
            lines = [line[::2] for line in lines]
        for j, line in enumerate(lines):
            y = y0 + j * dy
            for i in range(pw):
                x = x0 + i * dx
                dst = (y * w + x) * channels
                src = i * channels
                out[dst : dst + channels] = line[src : src + channels]
    if off != len(raw):
        raise ValueError("inflated size mismatch (interlaced)")
    return w, h, channels, bytes(out)


# Adam7 pass grid: (x_origin, y_origin, x_step, y_step), PNG 13.8.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter_lines(raw, off, n_rows, stride, channels):
    """Un-filter ``n_rows`` scanlines of ``stride`` bytes starting at
    ``off`` in the inflated stream (each prefixed by its filter-type
    byte, previous-row state starting at zeros — the per-pass reset
    interlacing relies on). Returns (rows, next offset)."""
    need = n_rows * (stride + 1)
    if off + need > len(raw):
        raise ValueError("inflated size mismatch")
    rows = []
    prev = bytearray(stride)
    for r in range(n_rows):
        base = off + r * (stride + 1)
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
        rows.append(bytes(line))
        prev = line
    return rows, off + need


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
    w: int, h: int, pixels: bytes, channels: int = 3,
    interlace: bool = False, bit_depth: int = 8,
) -> bytes:
    """Encode an 8- or 16-bit PNG (gray / gray+alpha / RGB / RGBA by
    channel count; 16-bit samples big-endian in ``pixels``), cycling
    the filter type per row (row r uses filter r % 5) so a decoder
    must implement ALL filters correctly to reproduce the pixels.
    With ``interlace=True`` the stream is Adam7: seven independently
    -filtered sub-images (fixture source for the interlaced decode
    path — PNG is lossless, so interlaced and sequential encodings of
    the same pixels must decode identically, which is the test
    oracle)."""
    if bit_depth not in (8, 16):
        raise ValueError(f"bit depth {bit_depth}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels * bit_depth // 8  # filter byte step = bytes/pixel
    stride = w * bpp
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer size mismatch")

    def filter_rows(rows, row_stride):
        raw = bytearray()
        prev = bytes(row_stride)
        for ri, line in enumerate(rows):
            ftype = ri % 5
            raw.append(ftype)
            raw += _filter_line(ftype, line, prev, bpp)
            prev = line
        return raw

    if not interlace:
        rows = [
            pixels[r * stride : (r + 1) * stride] for r in range(h)
        ]
        raw = filter_rows(rows, stride)
    else:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows = []
            for j in range(ph):
                y = y0 + j * dy
                line = bytearray(pw * bpp)
                for i in range(pw):
                    x = x0 + i * dx
                    src = (y * w + x) * bpp
                    line[i * bpp : (i + 1) * bpp] = pixels[
                        src : src + bpp
                    ]
                rows.append(bytes(line))
            raw += filter_rows(rows, pw * bpp)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    w: int,
    h: int,
    indices: bytes,
    palette: list[bytes],
    bit_depth: int = 8,
    interlace: bool = False,
    trns: bytes | None = None,
) -> bytes:
    """Encode a PALETTED PNG (color type 3) at 1/2/4/8-bit depth,
    cycling all five filters per row (over the PACKED bytes, bpp=1 —
    the spec's filter unit for sub-byte depths), optional Adam7 and
    tRNS. Fixture source for the r14 paletted decode path."""
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError(f"bit depth {bit_depth}")
    if len(indices) != w * h:
        raise ValueError("index buffer size mismatch")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must have 1..256 entries")
    if max(indices) >= min(len(palette), 1 << bit_depth):
        raise ValueError("index exceeds palette/depth capacity")

    def pack_row(ids: bytes) -> bytes:
        if bit_depth == 8:
            return ids
        per = 8 // bit_depth
        out = bytearray((len(ids) + per - 1) // per)
        for k, ci in enumerate(ids):
            out[k // per] |= ci << (8 - bit_depth * (k % per + 1))
        return bytes(out)

    def filter_rows(rows):
        raw = bytearray()
        prev = bytes(len(rows[0])) if rows else b""
        for ri, line in enumerate(rows):
            ftype = ri % 5
            raw.append(ftype)
            raw += _filter_line(ftype, line, prev, 1)
            prev = line
        return raw

    if not interlace:
        rows = [
            pack_row(indices[r * w : (r + 1) * w]) for r in range(h)
        ]
        raw = filter_rows(rows)
    else:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows = []
            for j in range(ph):
                y = y0 + j * dy
                rows.append(
                    pack_row(
                        bytes(
                            indices[y * w + x0 + i * dx] for i in range(pw)
                        )
                    )
                )
            raw += filter_rows(rows)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, 3, 0, 0, 1 if interlace else 0
    )
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", b"".join(palette))
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    return out + _chunk(b"IEND", b"")


# --------------------------------------------------------------------------
# BMP (Windows DIB) — round 14: the legacy raster format old web
# scrapes are full of. Spec-mechanical: BITMAPFILEHEADER +
# BITMAPINFOHEADER (BI_RGB or BI_RLE8), bottom-up or top-down rows,
# 4-byte row padding, BGR(A) channel order, palette for <= 8-bit.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# TGA (Truevision Targa) — round 14: the last common legacy raster in
# old archives. 18-byte header, optional image ID + palette, image
# types 1/2/3 (palette / truecolor / gray, uncompressed) and 9/10/11
# (their RLE forms), bottom-up or top-down via descriptor bit 5.
# --------------------------------------------------------------------------


def _tga_expand5(c: int) -> int:
    """5-bit -> 8-bit channel expansion by bit replication
    ((c << 3) | (c >> 2)) — maps 0 -> 0 and 31 -> 255 exactly, the
    standard convention for 15/16-bit ARGB1555 pixels."""
    return (c << 3) | (c >> 2)


def decode_tga(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a TGA. Returns ``(w, h, channels, pixels)`` — gray (1)
    for 8-bit grayscale, RGB (3) for 15/16/24-bit / paletted, RGBA
    (4) for 32-bit; stored BGR(A) order converted, ARGB1555 channels
    expanded by bit replication, 15/16-bit color-map entries
    likewise. Legacy two-way / four-way interleaved storage
    (descriptor bits 6-7) is de-interleaved."""
    if len(buf) < 18:
        raise ValueError("truncated TGA header")
    id_len, cmap_type, img_type = buf[0], buf[1], buf[2]
    cmap_first, cmap_len = struct.unpack("<HH", buf[3:7])
    cmap_bits = buf[7]
    w, h = struct.unpack("<HH", buf[12:16])
    pix_bits, desc = buf[16], buf[17]
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise NotImplementedError(f"TGA image type {img_type}")
    ileave = (desc >> 6) & 0x3  # 0 none, 1 two-way, 2 four-way
    if ileave == 3:
        raise ValueError("TGA interleave flag 3 is reserved")
    if w <= 0 or h <= 0:
        raise ValueError(f"TGA dimensions {w}x{h}")
    if w * h > 64 * max(1, len(buf)):
        raise ValueError("implausible TGA dimensions for file size")
    top_down = bool(desc & 0x20)
    rle = img_type >= 9
    paletted = img_type in (1, 9)
    gray = img_type in (3, 11)
    pos = 18 + id_len
    pal: list[bytes] = []
    if cmap_type == 1:
        if cmap_bits in (15, 16):
            entry = 2
        elif cmap_bits in (24, 32):
            entry = cmap_bits // 8
        else:
            raise NotImplementedError(f"TGA palette depth {cmap_bits}")
        if pos + entry * cmap_len > len(buf):
            raise ValueError("truncated TGA color map")
        for c in range(cmap_len):
            if entry == 2:
                (v,) = struct.unpack(
                    "<H", buf[pos + 2 * c : pos + 2 * c + 2]
                )
                pal.append(bytes((
                    _tga_expand5((v >> 10) & 31),
                    _tga_expand5((v >> 5) & 31),
                    _tga_expand5(v & 31),
                )))
            else:
                b_, g_, r_ = buf[pos + entry * c : pos + entry * c + 3]
                pal.append(bytes((r_, g_, b_)))
        pos += entry * cmap_len
    if paletted:
        if cmap_type != 1 or not pal:
            raise ValueError("paletted TGA missing color map")
        if pix_bits != 8:
            raise NotImplementedError(f"paletted TGA {pix_bits}-bit")
        nb = 1
    elif gray:
        if pix_bits != 8:
            raise NotImplementedError(f"gray TGA {pix_bits}-bit")
        nb = 1
    else:
        if pix_bits in (15, 16):
            nb = 2
        elif pix_bits in (24, 32):
            nb = pix_bits // 8
        else:
            raise NotImplementedError(f"truecolor TGA {pix_bits}-bit")
    n_px = w * h
    raw = bytearray()
    if not rle:
        need = n_px * nb
        if pos + need > len(buf):
            raise ValueError("truncated TGA pixel data")
        raw += buf[pos : pos + need]
    else:
        while len(raw) < n_px * nb:
            if pos >= len(buf):
                raise ValueError("truncated TGA RLE stream")
            hdr = buf[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                if pos + nb > len(buf):
                    raise ValueError("truncated TGA RLE run")
                raw += buf[pos : pos + nb] * count
                pos += nb
            else:  # raw packet: count literal pixels
                if pos + nb * count > len(buf):
                    raise ValueError("truncated TGA RLE literals")
                raw += buf[pos : pos + nb * count]
                pos += nb * count
        if len(raw) > n_px * nb:
            # packets may not cross the image end (TGA spec 2.0 allows
            # crossing scan lines but not the image)
            raise ValueError("TGA RLE data overruns image")
    # assemble output rows (stored bottom-up unless bit 5 set;
    # interleaved storage lists origin rows in 2 or 4 passes)
    out_ch = 1 if gray else (4 if (not paletted and nb == 4) else 3)
    out = bytearray(n_px * out_ch)
    npal = len(pal)
    if ileave:
        f = 2 if ileave == 1 else 4
        storage_of = [0] * h
        i = 0
        for p in range(f):
            for r in range(p, h, f):
                storage_of[r] = i
                i += 1
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        if ileave:
            src_y = storage_of[src_y]
        for x in range(w):
            s = (src_y * w + x) * nb
            d = (y * w + x) * out_ch
            if gray:
                out[d] = raw[s]
            elif paletted:
                ci = raw[s]
                if ci < cmap_first or ci - cmap_first >= npal:
                    raise ValueError(f"TGA palette index {ci} out of range")
                out[d : d + 3] = pal[ci - cmap_first]
            elif nb == 2:  # ARGB1555, little-endian
                v = raw[s] | (raw[s + 1] << 8)
                out[d] = _tga_expand5((v >> 10) & 31)
                out[d + 1] = _tga_expand5((v >> 5) & 31)
                out[d + 2] = _tga_expand5(v & 31)
            elif nb == 3:
                out[d], out[d + 1], out[d + 2] = (
                    raw[s + 2], raw[s + 1], raw[s],
                )
            else:
                out[d], out[d + 1], out[d + 2], out[d + 3] = (
                    raw[s + 2], raw[s + 1], raw[s], raw[s + 3],
                )
    return w, h, out_ch, bytes(out)


def encode_tga(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 3,
    rle: bool = False,
    top_down: bool = False,
    palette: list[bytes] | None = None,
    indices: bytes | None = None,
    bits16: bool = False,
    interleave: int = 0,
) -> bytes:
    """Encode a TGA fixture: gray (channels=1), truecolor 24/32-bit
    (channels=3/4, stored BGR(A)) or 16-bit ARGB1555 (``bits16``,
    channels=3 — 8-bit input channels truncated to 5 bits, so decode's
    bit replication returns (c & ~7) | (c >> 5)), or paletted via
    ``palette``+``indices``; optional RLE (run + raw packets),
    top-down origin, and legacy two-/four-way ``interleave`` (1/2)."""
    if interleave not in (0, 1, 2):
        raise ValueError("interleave must be 0 (none), 1 (two-way), 2 (four-way)")
    if bits16 and (palette is not None or channels != 3):
        raise ValueError("bits16 applies to truecolor channels=3 only")
    if palette is not None:
        if indices is None or len(indices) != w * h:
            raise ValueError("index buffer size mismatch")
        if not 1 <= len(palette) <= 256 or max(indices) >= len(palette):
            raise ValueError("palette/index mismatch")
        img_type, nb, cmap_type = 1, 1, 1
        stored = bytes(indices)
        cmap = b"".join(bytes((p[2], p[1], p[0])) for p in palette)
        cmap_len, cmap_bits = len(palette), 24
    else:
        if len(pixels) != w * h * channels:
            raise ValueError("pixel buffer size mismatch")
        cmap, cmap_len, cmap_bits, cmap_type = b"", 0, 0, 0
        if channels == 1:
            img_type, nb = 3, 1
            stored = bytes(pixels)
        elif bits16:
            img_type, nb = 2, 2
            s = bytearray()
            for k in range(w * h):
                r_, g_, b_ = pixels[k * 3 : k * 3 + 3]
                v = ((r_ >> 3) << 10) | ((g_ >> 3) << 5) | (b_ >> 3)
                s += struct.pack("<H", v)
            stored = bytes(s)
        else:
            img_type, nb = 2, channels
            s = bytearray()
            for k in range(w * h):
                p = pixels[k * channels : (k + 1) * channels]
                s += bytes((p[2], p[1], p[0])) + (
                    p[3:4] if channels == 4 else b""
                )
            stored = bytes(s)
    # row order on disk: bottom-up unless top_down, then the legacy
    # pass interleave (origin rows in 2 or 4 passes)
    rows = [stored[y * w * nb : (y + 1) * w * nb] for y in range(h)]
    origin_rows = rows if top_down else rows[::-1]
    if interleave:
        f = 2 * interleave
        origin_rows = [
            origin_rows[r] for p in range(f) for r in range(p, h, f)
        ]
    disk = b"".join(origin_rows)
    if rle:
        enc = bytearray()
        px = [disk[k * nb : (k + 1) * nb] for k in range(w * h)]
        i, n = 0, len(px)
        while i < n:
            run = 1
            while i + run < n and run < 128 and px[i + run] == px[i]:
                run += 1
            if run >= 2:
                enc += bytes([0x80 | (run - 1)]) + px[i]
                i += run
            else:
                j = i
                while (
                    j < n and j - i < 128
                    and not (j + 1 < n and px[j] == px[j + 1])
                ):
                    j += 1
                enc += bytes([j - i - 1]) + b"".join(px[i:j])
                i = j
        disk = bytes(enc)
    hdr = struct.pack(
        "<BBBHHBHHHHBB",
        0, cmap_type, img_type + (8 if rle else 0),
        0, cmap_len, cmap_bits,
        0, 0, w, h, 8 * nb,
        (0x20 if top_down else 0) | (interleave << 6),
    )
    return hdr + cmap + disk


# --------------------------------------------------------------------------
# TIFF (baseline) — round 14: the scan/dataset-dump format. Real IFD
# walk in BOTH byte orders (II little / MM big), strip assembly
# (StripOffsets/StripByteCounts/RowsPerStrip), Compression 1 (none)
# and 32773 (PackBits), photometric gray (0/1), RGB(A) (2, via
# SamplesPerPixel + ExtraSamples), and palette (3, 16-bit ColorMap
# entries reduced to their high byte per the spec's 8-bit rendering).
# Round 15 adds TILED layout (TileWidth/Length/Offsets/ByteCounts,
# edge-tile pad cropped) and planar configuration 2 (plane-major
# strip sequences interleaved on output) plus new-style JPEG strips.
# Round 16 closes the LZW seam (Compression 5: MSB-first packing,
# early-change width schedule per TIFF 6.0 §13) with Predictor 2
# horizontal differencing (§14) — validated against hand-assembled
# spec byte vectors AND cross-checked against the in-repo GIF LZW's
# shared greedy-parse mechanics in tests/test_tiffcodec.py — plus
# 16-bit samples (high-byte reduction in file byte order; predictor
# 2 runs word-level in byte order), Deflate (8/32946 via stdlib
# zlib), shared JPEGTables (347) abbreviated streams (spliced ahead
# of each chunk, the TechNote 2 override semantics), and tiled JPEG.
# Remaining seams: CCITT (2/3/4), planar JPEG, mixed bit widths —
# the rare/external class.
# --------------------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits: n in 0..127 -> copy n+1 literals; n in -127..-1
    (two's complement) -> repeat next byte 1-n times; -128 is a noop."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # replicate run of 257 - n
            if i >= len(data):
                raise ValueError("truncated PackBits replicate run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop
    if len(out) < expected:
        raise ValueError("PackBits stream shorter than strip")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """PackBits fixture encoder: real replicate runs (>= 3) and
    literal segments, both of which decode must handle."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i
            while (
                j < n and j - i < 128
                and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
            ):
                j += 1
            seg = data[i:j]
            out += bytes([len(seg) - 1]) + seg
            i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first code packing and the EARLY-CHANGE
    width schedule — codes start at 9 bits and the width grows when
    the next free table slot reaches ``(1 << width) - 1`` (one code
    EARLIER than the GIF variant's ``1 << width``; TIFF 6.0 §13
    pseudocode / the libtiff convention, where maxcode is
    ``MAXCODE(nbits) - 1``). Clear = 256, EOI = 257, first dynamic
    code 258; writers emit Clear when the next slot would be 4094, so
    the table never holds codes past 4093. The dictionary mechanics
    (greedy parse, KwKwK) are IDENTICAL to the in-repo GIF decoder —
    tests/test_tiffcodec.py cross-checks the two on shared parses plus
    hand-assembled spec byte vectors."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0
    pos = 0
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    width = 9
    prev: bytes | None = None
    next_code = 258
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream exhausted early")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == clear:
            table = {i: bytes([i]) for i in range(256)}
            width = 9
            next_code = 258
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= 256:
                raise ValueError(
                    f"TIFF LZW code {code} out of sequence after clear"
                )
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"TIFF LZW code {code} out of sequence")
        out += entry
        if prev is not None and next_code < 4094:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1  # early change: one code before GIF would
        prev = entry
    if len(out) < n_expected:
        raise ValueError(
            f"TIFF LZW underrun: {len(out)} of {n_expected} bytes"
        )
    return bytes(out[:n_expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW fixture compressor — the exact inverse contract of
    :func:`_tiff_lzw_decode` (MSB-first packing, early-change widths,
    Clear at slot 4094). Like the GIF twin, the width schedule is
    driven by a simulation of the DECODER's table count, which runs
    one entry behind the encoder's (the classic LZW desync
    off-by-one)."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    en = 258  # encoder's next table code
    dn = 258  # decoder's mirrored entry count (one behind)
    first = True

    def emit(code: int) -> None:
        nonlocal dn, width, first
        put(code)
        if first:
            first = False
        else:
            dn += 1  # the decoder defines an entry on this code
            if dn == (1 << width) - 1 and width < 12:
                width += 1  # early change

    def do_clear() -> None:
        nonlocal table, en, dn, width, first
        put(clear)
        table = {bytes([i]): i for i in range(256)}
        width = 9
        en = 258
        dn = 258
        first = True

    put(clear)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if en < 4094:
            table[cand] = en
            en += 1
        else:
            do_clear()
        run = bytes([b])
    if run:
        emit(table[run])
    put(eoi)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _split_jpeg_tables(buf: bytes) -> tuple[bytes, bytes]:
    """Split a complete JPEG stream into (tables, abbreviated image):
    ``tables`` is an SOI + DQT/DHT + EOI abbreviated-table stream fit
    for the TIFF JPEGTables (347) tag; the image stream keeps every
    other segment. Fixture-side inverse of the decode splice (round
    16)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    tables = bytearray()
    image = bytearray(b"\xff\xd8")
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated JPEG: marker segment cut short")
        marker = buf[pos + 1]
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        seg = buf[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            image += seg
        pos += 2 + ln
        if marker == 0xDA:  # SOS: entropy data + EOI follow verbatim
            image += buf[pos:]
            break
    return bytes(b"\xff\xd8" + tables + b"\xff\xd9"), bytes(image)


def _tiff_undiff(
    chunk: bytearray, row_stride: int, delta: int
) -> None:
    """Undo TIFF Predictor 2 (horizontal differencing, TIFF 6.0 §14)
    in place: within each row, every sample is stored as the delta
    from the same sample one pixel left; ``delta`` is the interleaved
    sample distance (SamplesPerPixel for chunky data, 1 for a planar
    plane or palette indices)."""
    for r0 in range(0, len(chunk), row_stride):
        end = min(r0 + row_stride, len(chunk))
        for j in range(r0 + delta, end):
            chunk[j] = (chunk[j] + chunk[j - delta]) & 0xFF


def _tiff_diff(chunk: bytearray, row_stride: int, delta: int) -> None:
    """Apply Predictor 2 differencing (the encode direction of
    :func:`_tiff_undiff`), walking each row right-to-left."""
    for r0 in range(0, len(chunk), row_stride):
        end = min(r0 + row_stride, len(chunk))
        for j in range(end - 1, r0 + delta - 1, -1):
            chunk[j] = (chunk[j] - chunk[j - delta]) & 0xFF


def _tiff_undiff16(
    chunk: bytearray, row_stride_bytes: int, delta: int, e: str
) -> None:
    """Predictor 2 over 16-BIT samples (round 16): differencing runs
    on the 16-bit VALUES in the file byte order, one word per sample,
    ``delta`` samples back (= SamplesPerPixel for chunky data)."""
    fmt = e + "H"
    step = 2 * delta
    for r0 in range(0, len(chunk), row_stride_bytes):
        end = min(r0 + row_stride_bytes, len(chunk))
        for j in range(r0 + step, end - 1, 2):
            prev = struct.unpack_from(fmt, chunk, j - step)[0]
            cur = struct.unpack_from(fmt, chunk, j)[0]
            struct.pack_into(fmt, chunk, j, (cur + prev) & 0xFFFF)


def _tiff_diff16(
    chunk: bytearray, row_stride_bytes: int, delta: int, e: str
) -> None:
    """Encode direction of :func:`_tiff_undiff16` (right-to-left)."""
    fmt = e + "H"
    step = 2 * delta
    for r0 in range(0, len(chunk), row_stride_bytes):
        end = min(r0 + row_stride_bytes, len(chunk))
        last = end - 2
        for j in range(last, r0 + step - 1, -2):
            prev = struct.unpack_from(fmt, chunk, j - step)[0]
            cur = struct.unpack_from(fmt, chunk, j)[0]
            struct.pack_into(fmt, chunk, j, (cur - prev) & 0xFFFF)


def decode_tiff(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline TIFF (first IFD). Returns ``(w, h, channels,
    pixels)`` — gray(1)/RGB(3)/RGBA(4) interleaved; paletted images
    expand through the ColorMap to RGB. See the section comment for
    the supported matrix and the documented seam."""
    if len(buf) < 8:
        raise ValueError("truncated TIFF header")
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(e + "H", buf[2:4])
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    (ifd_off,) = struct.unpack(e + "I", buf[4:8])
    if ifd_off + 2 > len(buf):
        raise ValueError("truncated TIFF: IFD offset past end")
    (n_entries,) = struct.unpack(e + "H", buf[ifd_off : ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries > len(buf):
        raise ValueError("truncated TIFF: IFD entries cut short")

    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}

    def read_values(entry_off: int) -> tuple[int, list[int]]:
        tag, typ, cnt = struct.unpack(
            e + "HHI", buf[entry_off : entry_off + 8]
        )
        if typ not in _TYPE_SIZE:
            return tag, []
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            voff = entry_off + 8
        else:
            (voff,) = struct.unpack(
                e + "I", buf[entry_off + 8 : entry_off + 12]
            )
            if voff + size > len(buf):
                raise ValueError(f"truncated TIFF: tag {tag} values")
        if typ == 3:
            vals = [
                struct.unpack(e + "H", buf[voff + 2 * k : voff + 2 * k + 2])[0]
                for k in range(cnt)
            ]
        elif typ == 4:
            vals = [
                struct.unpack(e + "I", buf[voff + 4 * k : voff + 4 * k + 4])[0]
                for k in range(cnt)
            ]
        elif typ in (1, 2, 7):  # BYTE / ASCII / UNDEFINED (JPEGTables)
            vals = list(buf[voff : voff + cnt])
        else:  # RATIONAL: numerator only (resolution tags, unused)
            vals = [
                struct.unpack(e + "I", buf[voff + 8 * k : voff + 8 * k + 4])[0]
                for k in range(cnt)
            ]
        return tag, vals

    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        tag, vals = read_values(ifd_off + 2 + 12 * k)
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0:
        raise ValueError(f"TIFF dimensions {w}x{h}")
    if w * h > 64 * max(1, len(buf)):
        raise ValueError("implausible TIFF dimensions for file size")
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258) or [8]  # empty/corrupt tag -> spec default
    if (bits != [8] * len(bits) and bits != [16] * len(bits)
            and bits != [1]):
        raise NotImplementedError(f"TIFF bits-per-sample {bits}")
    wide = bits[0] == 16  # r16: 16-bit samples reduce to the high
    # byte (the PNG/netpbm/ColorMap 8-bit rendering convention),
    # honoring the file byte order
    bilevel = bits[0] == 1  # r16: 1-bit scanned-document class —
    # MSB-first packed rows (byte-aligned per row, the PBM P4
    # layout), photometric 0/1 mapped to 0/255 gray
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF planar configuration {planar}")
    tiled = 322 in tags or 323 in tags
    if tiled and planar == 2:
        raise NotImplementedError("tiled TIFF with planar configuration 2")
    if compression == 32946:
        compression = 8  # legacy Deflate code, identical stream
    if compression not in (1, 5, 7, 8, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression}: none (1), LZW (5),"
            " new-style JPEG (7), Deflate (8/32946), and PackBits"
            " (32773) decode here"
        )
    predictor = one(317, 1)
    if predictor == 3:
        raise NotImplementedError(
            "TIFF floating-point predictor (3) needs non-8-bit samples"
        )
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor}")
    if predictor == 2 and compression == 7:
        raise ValueError("TIFF predictor 2 is invalid with JPEG strips")
    if wide:
        if compression == 7:
            raise NotImplementedError("16-bit JPEG-in-TIFF")
        if photometric == 3:
            raise ValueError("paletted TIFF requires 8-bit indices")
    if bilevel:
        if spp != 1:
            raise ValueError("bilevel TIFF needs SamplesPerPixel 1")
        if photometric not in (0, 1):
            raise ValueError(f"bilevel TIFF photometric {photometric}")
        if compression == 7:
            raise ValueError("JPEG strips cannot carry 1-bit samples")
        if predictor == 2:
            raise NotImplementedError("predictor 2 over 1-bit samples")
        if tiled and one(322) % 8 != 0:
            raise NotImplementedError(
                "bilevel tiles need byte-aligned TileWidth"
            )
    jpeg_tables = b""
    if compression == 7:
        # New-style JPEG-in-TIFF (round 15): every strip/tile is a
        # JPEG stream handed to the in-repo decoder (which is pinned
        # independently, so — unlike LZW — no external test vector is
        # needed). Round 16 adds the shared-JPEGTables (347) form —
        # an abbreviated tables stream (SOI, DQT/DHT, EOI) spliced
        # ahead of each strip's abbreviated image stream, which gives
        # exactly the TIFF TechNote 2 override semantics (chunk-local
        # tables land later in the marker walk, so they win) — and
        # TILED JPEG (each tile its own stream at the tile extent).
        # Planar-2 JPEG stays the explicit seam.
        if planar == 2:
            raise NotImplementedError("planar JPEG-in-TIFF")
        if photometric not in (1, 2, 6):
            raise NotImplementedError(
                f"JPEG-in-TIFF photometric {photometric}"
            )
        if 347 in tags:
            jt = bytes(tags[347])
            if jt[:2] != b"\xff\xd8" or jt[-2:] != b"\xff\xd9":
                raise ValueError(
                    "JPEGTables must be an abbreviated SOI..EOI stream"
                )
            jpeg_tables = jt[:-2]  # keep SOI + table segments

    def read_chunk(
        off: int, cnt: int, expected: int,
        row_stride: int, delta: int,
    ) -> bytes:
        if off + cnt > len(buf):
            raise ValueError("TIFF strip/tile extent past end of file")
        chunk = buf[off : off + cnt]
        # ``expected`` counts OUTPUT (8-bit) samples; 16-bit files
        # carry twice the bytes, reduced to high bytes after
        # decompression (II stores low byte first, MM high first).
        want = expected * 2 if wide else expected
        if compression == 32773:
            chunk = _packbits_decode(chunk, want)
        elif compression == 5:
            chunk = _tiff_lzw_decode(chunk, want)
        elif compression == 8:  # Adobe Deflate (r16): stdlib zlib
            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as exc:
                raise ValueError(f"TIFF Deflate strip: {exc}") from None
            if len(chunk) < want:
                raise ValueError("TIFF Deflate strip shorter than rows")
            chunk = chunk[:want]
        elif compression == 7:
            if jpeg_tables:
                if chunk[:2] != b"\xff\xd8":
                    raise ValueError(
                        "abbreviated JPEG strip missing SOI"
                    )
                chunk = jpeg_tables + chunk[2:]
            jw, jh, jch, pix = decode_jpeg(chunk)
            # The chunk's pixel width: the image width for strips,
            # the tile extent for tiles (row_stride is already the
            # right stride for either).
            cw = row_stride // spp
            # A chunk's JPEG may be MCU-padded PAST the IFD row count
            # (h not a multiple of the MCU height): spec-valid, so
            # accept jh >= n_rows and crop the pad rows (round 16,
            # per the r15 ADVICE). The pad is bounded by one MCU
            # (< 16 rows) — more than that is a geometry error, not
            # padding.
            n_rows = expected // row_stride
            if (jw != cw or jch != spp or jh < n_rows
                    or jh - n_rows >= 16):
                raise ValueError(
                    f"JPEG strip geometry {jw}x{jh}x{jch} does not"
                    f" match the IFD ({cw} wide, {n_rows} rows,"
                    f" {spp} samples)"
                )
            return pix[:expected]
        else:
            if len(chunk) < want:
                raise ValueError("truncated TIFF strip/tile")
            chunk = chunk[:want]
        if wide:
            if predictor == 2:
                und = bytearray(chunk)
                _tiff_undiff16(und, row_stride * 2, delta, e)
                chunk = bytes(und)
            chunk = chunk[0::2] if e == ">" else chunk[1::2]
        elif predictor == 2:
            und = bytearray(chunk)
            _tiff_undiff(und, row_stride, delta)
            chunk = bytes(und)
        return chunk

    # row stride in STORED bytes: packed for 1-bit (rows byte-aligned
    # per the spec, the PBM P4 layout), samples otherwise
    stride = (w + 7) // 8 if bilevel else w * spp
    if tiled:
        # tiles left-to-right, top-to-bottom; edge tiles padded to
        # the full tile extent (pad cropped on assembly)
        tw, th = one(322), one(323)
        if tw <= 0 or th <= 0:
            raise ValueError(f"TIFF tile extent {tw}x{th}")
        offsets = tags.get(324)
        counts = tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing/mismatched tile tables")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(offsets) != across * down:
            raise ValueError("TIFF tile count does not cover the image")
        raw = bytearray(h * stride)
        trs = tw // 8 if bilevel else tw * spp  # tile row stride
        tile_bytes = th * trs
        unit = 1 if bilevel else spp  # bytes per copy unit
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            tile = read_chunk(off, cnt, tile_bytes, trs, spp)
            ty, tx = divmod(ti, across)
            n_rows = min(th, h - ty * th)
            if bilevel:
                # tw % 8 == 0 enforced: byte-granular splice; edge
                # columns keep the tile's pad bits, masked at unpack
                n_units = min(trs, stride - tx * trs)
            else:
                n_units = min(tw, w - tx * tw)
            for r in range(n_rows):
                d = ((ty * th + r) * stride
                     + tx * trs) if bilevel else (
                    ((ty * th + r) * w + tx * tw) * spp)
                s = r * trs
                raw[d : d + n_units * unit] = tile[s : s + n_units * unit]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing/mismatched strip tables")
        rows_per_strip = one(278, h)
        if planar == 2 and spp > 1:
            # plane-major strips: every sample's rows form their own
            # strip sequence; interleave planes into chunky output
            per_plane = (h + rows_per_strip - 1) // rows_per_strip
            if len(offsets) != spp * per_plane:
                raise ValueError(
                    "TIFF planar strip count does not cover all planes"
                )
            planes: list[bytearray] = []
            for p in range(spp):
                plane = bytearray()
                for si in range(per_plane):
                    n_rows = min(rows_per_strip, h - si * rows_per_strip)
                    if n_rows <= 0:
                        raise ValueError("TIFF has more strips than rows")
                    k = p * per_plane + si
                    plane += read_chunk(
                        offsets[k], counts[k], n_rows * w, w, 1
                    )
                planes.append(plane)
            raw = bytearray(h * stride)
            for k in range(w * h):
                for p in range(spp):
                    raw[k * spp + p] = planes[p][k]
        else:
            raw = bytearray()
            for si, (off, cnt) in enumerate(zip(offsets, counts)):
                n_rows = min(rows_per_strip, h - si * rows_per_strip)
                if n_rows <= 0:
                    raise ValueError("TIFF has more strips than rows")
                raw += read_chunk(off, cnt, n_rows * stride, stride, spp)
    if len(raw) != h * stride:
        raise ValueError("TIFF strip data size mismatch")
    if bilevel:
        # unpack MSB-first bits to 0/255 gray; photometric 0
        # (WhiteIsZero, the fax default): 1 = black = 0
        out = bytearray(w * h)
        on, off_v = (0, 255) if photometric == 0 else (255, 0)
        for y in range(h):
            base = y * stride
            for x in range(w):
                bit = (raw[base + x // 8] >> (7 - x % 8)) & 1
                out[y * w + x] = on if bit else off_v
        return w, h, 1, bytes(out)
    if photometric in (1, 2) or (photometric == 6 and compression == 7):
        # gray black-is-zero / RGB(A); photometric 6 is YCbCr, which
        # the JPEG decoder already converted to RGB
        return w, h, spp, bytes(raw)
    if photometric == 0:  # gray white-is-zero: invert
        if spp != 1:
            raise ValueError("white-is-zero with multiple samples")
        return w, h, 1, bytes(255 - v for v in raw)
    if photometric == 3:  # palette: 16-bit ColorMap, high byte
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("paletted TIFF missing 256-entry ColorMap")
        out = bytearray(w * h * 3)
        for k, ci in enumerate(raw):
            out[3 * k] = cmap[ci] >> 8
            out[3 * k + 1] = cmap[256 + ci] >> 8
            out[3 * k + 2] = cmap[512 + ci] >> 8
        return w, h, 3, bytes(out)
    raise NotImplementedError(f"TIFF photometric {photometric}")


def encode_tiff(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 3,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int = 3,
    colormap: list[tuple[int, int, int]] | None = None,
    planar: bool = False,
    tiles: tuple[int, int] | None = None,
    jpeg: bool = False,
    lzw: bool = False,
    predictor: int = 1,
    wide16: bool = False,
    jpeg_tables: bool = False,
    deflate: bool = False,
    bilevel: bool = False,
) -> bytes:
    """Encode a baseline TIFF fixture: multi-strip (rows_per_strip
    forces a real strip walk), II or MM byte order, optional PackBits
    or ``lzw`` (round 16: TIFF 6.0 §13 MSB-first early-change LZW,
    optionally with ``predictor=2`` horizontal differencing), optional
    256-entry 16-bit ColorMap (channels=1 indices + photometric 3),
    optional ``planar`` configuration 2 (plane-major strip sequences),
    optional ``tiles=(tw, th)`` tiled layout (zero-padded edge tiles),
    optional new-style ``jpeg`` compression (each strip a complete
    JPEG stream; use grayscale block-solid pixels and 8-row strips for
    a bit-exact round trip). Fixture source for :func:`decode_tiff`."""
    e = ">" if big_endian else "<"
    if len(pixels) != w * h * channels:
        raise ValueError("pixel buffer size mismatch")
    if planar and tiles is not None:
        raise ValueError("tiled planar TIFF is the documented seam")
    if planar and channels < 2:
        raise ValueError("planar needs channels >= 2")
    if jpeg and (planar or packbits or lzw
                 or colormap is not None or channels not in (1, 3)):
        raise ValueError(
            "jpeg strips need chunky non-PackBits gray/RGB layout"
        )
    if jpeg_tables and not jpeg:
        raise ValueError("jpeg_tables requires jpeg strips")
    if sum((packbits, lzw, deflate, jpeg)) > 1:
        raise ValueError(
            "pick one compression: packbits, lzw, deflate, or jpeg"
        )
    if predictor not in (1, 2):
        raise ValueError(f"predictor {predictor} not encodable")
    if predictor == 2 and jpeg:
        raise ValueError("predictor 2 is invalid with JPEG strips")
    if wide16 and (jpeg or colormap is not None):
        raise ValueError("wide16 fixtures are plain gray/RGB(A)")
    if bilevel:
        # ``pixels`` holds one 0/1 byte per pixel (1 = black, encoded
        # photometric 0 White-Is-Zero — the fax convention); rows
        # pack MSB-first, byte-aligned, BEFORE strip/tile splitting.
        if channels != 1 or wide16 or jpeg or colormap is not None \
                or planar or predictor == 2:
            raise ValueError(
                "bilevel fixtures are chunky 1-channel predictor-1"
            )
        if any(b not in (0, 1) for b in pixels):
            raise ValueError("bilevel pixels must be 0/1 bytes")
        if tiles is not None and tiles[0] % 8 != 0:
            raise ValueError("bilevel tiles need byte-aligned width")
    stride = w * channels

    def prep(seg: bytes, row_stride: int, delta: int) -> bytes:
        """Difference (predictor 2) then compress one strip/tile.
        ``wide16`` (round 16) widens each 8-bit sample to the 16-bit
        lattice value v*257 FIRST — high and low byte both v, so the
        on-disk stream is byte-order agnostic and the decoder's
        high-byte reduction returns v exactly."""
        if wide16:
            seg = bytes(b for v in seg for b in (v, v))
            if predictor == 2:
                d = bytearray(seg)
                _tiff_diff16(d, row_stride * 2, delta, e)
                seg = bytes(d)
        elif predictor == 2:
            d = bytearray(seg)
            _tiff_diff(d, row_stride, delta)
            seg = bytes(d)
        if lzw:
            return _tiff_lzw_encode(seg)
        if deflate:
            return zlib.compress(seg)
        return _packbits_encode(seg) if packbits else seg
    strips: list[bytes] = []
    if bilevel:
        sb = (w + 7) // 8
        packed = bytearray(sb * h)
        for y in range(h):
            for x in range(w):
                if pixels[y * w + x]:
                    packed[y * sb + x // 8] |= 0x80 >> (x % 8)
        if tiles is not None:
            tw, th = tiles
            twb = tw // 8
            across = (w + tw - 1) // tw
            down = (h + th - 1) // th
            for ty in range(down):
                for tx in range(across):
                    tile = bytearray()
                    for r in range(th):
                        y = ty * th + r
                        row = bytearray(twb)
                        if y < h:
                            n_b = min(twb, sb - tx * twb)
                            s = y * sb + tx * twb
                            row[:n_b] = packed[s : s + n_b]
                        tile += row
                    strips.append(prep(bytes(tile), twb, 1))
        else:
            for y0 in range(0, h, rows_per_strip):
                seg = bytes(
                    packed[y0 * sb : min(y0 + rows_per_strip, h) * sb]
                )
                strips.append(prep(seg, sb, 1))
    elif tiles is not None:
        tw, th = tiles
        if tw <= 0 or th <= 0:
            raise ValueError("tile extents must be positive")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        for ty in range(down):
            for tx in range(across):
                tile = bytearray()
                for r in range(th):
                    y = ty * th + r
                    row = bytearray(tw * channels)
                    if y < h:
                        n_cols = min(tw, w - tx * tw)
                        s = (y * w + tx * tw) * channels
                        row[: n_cols * channels] = pixels[
                            s : s + n_cols * channels
                        ]
                    tile += row
                strips.append(
                    encode_jpeg(tw, th, bytes(tile), channels=channels)
                    if jpeg
                    else prep(bytes(tile), tw * channels, channels)
                )
    elif planar:
        for p in range(channels):
            plane = bytes(
                pixels[k * channels + p] for k in range(w * h)
            )
            for y0 in range(0, h, rows_per_strip):
                seg = plane[y0 * w : min(y0 + rows_per_strip, h) * w]
                strips.append(prep(seg, w, 1))
    elif jpeg:
        for y0 in range(0, h, rows_per_strip):
            n_rows = min(rows_per_strip, h - y0)
            strips.append(
                encode_jpeg(
                    w, n_rows,
                    pixels[y0 * stride : (y0 + n_rows) * stride],
                    channels=channels,
                )
            )
    else:
        for y0 in range(0, h, rows_per_strip):
            rows = pixels[
                y0 * stride : min(y0 + rows_per_strip, h) * stride
            ]
            strips.append(prep(rows, stride, channels))

    jt_stream = b""
    if jpeg_tables:
        # pull the (identical, fixed-table) DQT/DHT segments out of
        # every chunk into the shared JPEGTables stream — the
        # abbreviated-stream form real writers emit (TIFF TechNote 2)
        tables_seen = set()
        abbreviated = []
        for s in strips:
            t, img = _split_jpeg_tables(s)
            tables_seen.add(t)
            abbreviated.append(img)
        if len(tables_seen) != 1:
            raise ValueError("jpeg_tables needs identical chunk tables")
        jt_stream = next(iter(tables_seen))
        strips = abbreviated

    if bilevel:
        photometric = 0  # WhiteIsZero, the fax convention
    elif colormap is not None:
        if channels != 1 or len(colormap) != 256:
            raise ValueError("colormap needs channels=1 and 256 entries")
        photometric = 3
    elif jpeg and channels == 3:
        photometric = 6  # YCbCr, per the JPEG-in-TIFF convention
    else:
        photometric = {1: 1, 3: 2, 4: 2}[channels]

    entries: list[tuple[int, int, int, bytes | int]] = []
    extra: bytearray = bytearray()
    header_size = 8

    def add(tag: int, typ: int, vals: list[int]) -> None:
        entries.append((tag, typ, len(vals), vals))

    add(256, 3, [w])
    add(257, 3, [h])
    add(258, 3, [1 if bilevel else 16 if wide16 else 8] * channels)
    add(259, 3, [7 if jpeg else 5 if lzw else 8 if deflate
                 else 32773 if packbits else 1])
    if predictor == 2:
        add(317, 3, [2])
    add(262, 3, [photometric])
    add(277, 3, [channels])
    if channels == 4:
        add(338, 3, [2])  # ExtraSamples: unassociated alpha
    if planar:
        add(284, 3, [2])
    off_tag, cnt_tag = (324, 325) if tiles is not None else (273, 279)
    if tiles is not None:
        add(322, 3, [tiles[0]])
        add(323, 3, [tiles[1]])
    else:
        add(278, 3, [min(rows_per_strip, h)])
    n_strip_placeholder = [0] * len(strips)
    add(off_tag, 4, n_strip_placeholder)  # offsets (patched below)
    add(cnt_tag, 4, [len(s) for s in strips])
    if colormap is not None:
        cmap_vals = (
            [c[0] for c in colormap]
            + [c[1] for c in colormap]
            + [c[2] for c in colormap]
        )
        add(320, 3, cmap_vals)
    if jt_stream:
        add(347, 7, list(jt_stream))  # UNDEFINED bytes
    entries.sort(key=lambda t: t[0])

    ifd_off = header_size
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_size
    # lay out out-of-line value blocks, then strips
    blocks: list[bytes] = []
    pos = data_off
    sizes = {3: 2, 4: 4, 7: 1}
    encoded_entries = []
    strip_off_patch = None
    for tag, typ, cnt, vals in entries:
        size = sizes[typ] * cnt
        if typ == 7:
            payload = bytes(vals)
        else:
            fmt = "H" if typ == 3 else "I"
            payload = b"".join(struct.pack(e + fmt, v) for v in vals)
        if size <= 4:
            encoded_entries.append(
                (tag, typ, cnt, payload + b"\x00" * (4 - size), None)
            )
        else:
            blocks.append(payload)
            encoded_entries.append((tag, typ, cnt, None, pos))
            if tag == off_tag:
                strip_off_patch = (len(blocks) - 1, pos)
            pos += size
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # patch StripOffsets / TileOffsets
    for i, (tag, typ, cnt, inline, _off) in enumerate(encoded_entries):
        if tag == off_tag:
            payload = b"".join(
                struct.pack(e + "I", v) for v in strip_offsets
            )
            if inline is not None:  # single strip fits inline
                encoded_entries[i] = (
                    tag, typ, cnt, payload + b"\x00" * (4 - len(payload)),
                    None,
                )
            else:
                blocks[strip_off_patch[0]] = payload
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(encoded_entries))
    for tag, typ, cnt, inline, off in encoded_entries:
        out += struct.pack(e + "HHI", tag, typ, cnt)
        out += inline if inline is not None else struct.pack(e + "I", off)
    out += struct.pack(e + "I", 0)  # no next IFD
    for b in blocks:
        out += b
    for s in strips:
        out += s
    return bytes(out)


def decode_bmp(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP: 24/32-bit BI_RGB, 16-bit BI_RGB (implied
    X1R5G5B5, round 16), 16/32-bit BI_BITFIELDS (masked channels with
    bit-replication expansion — the screenshot class, round 16),
    1/4/8-bit paletted BI_RGB (sub-byte indices MSB-first, round 15),
    8-bit BI_RLE8 and 4-bit BI_RLE4 (both absolute and encoded runs —
    RLE4 alternating nibbles — end-of-line / end-of-bitmap / delta
    escapes). Returns ``(w, h, channels, pixels)`` with pixels
    interleaved RGB (32-bit input drops the rarely-meaningful fourth
    byte; palette maps to RGB). Negative biHeight (top-down) handled;
    other bit depths / compressions raise NotImplementedError — BMP
    variants beyond these are rare even in old corpora."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP: missing BM magic")
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack("<I", buf[10:14])
    (hdr_size,) = struct.unpack("<I", buf[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", buf[18:26])
    planes, bpp = struct.unpack("<HH", buf[26:30])
    (compression,) = struct.unpack("<I", buf[30:34])
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"BMP dimensions {w}x{h_raw}")
    if planes != 1:
        raise ValueError(f"BMP planes {planes}")
    # Sanity: dimensions must be consistent with the file size (the
    # memory-bomb guard — a corrupt header must not allocate GBs).
    if w * h > 64 * max(1, len(buf)):
        raise ValueError("implausible BMP dimensions for file size")
    pal: list[bytes] = []
    if bpp in (1, 4, 8):
        (n_colors,) = struct.unpack("<I", buf[46:50])
        n_colors = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(buf):
            raise ValueError("truncated BMP palette")
        pal = [
            bytes(
                (buf[pal_off + 4 * c + 2], buf[pal_off + 4 * c + 1],
                 buf[pal_off + 4 * c])
            )  # stored BGRX
            for c in range(n_colors)
        ]
    out = bytearray(w * h * 3)

    def put_row_rgb(y: int, rgb_row: bytes) -> None:
        dst_y = y if top_down else h - 1 - y
        out[dst_y * w * 3 : (dst_y + 1) * w * 3] = rgb_row

    if compression == 0 and bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        if data_off + stride * h > len(buf):
            raise ValueError("truncated BMP pixel data")
        for y in range(h):
            row = buf[data_off + y * stride :][: w * nb]
            rgb = bytearray(w * 3)
            for x in range(w):
                b_, g_, r_ = row[x * nb], row[x * nb + 1], row[x * nb + 2]
                rgb[3 * x : 3 * x + 3] = (r_, g_, b_)
            put_row_rgb(y, bytes(rgb))
        return w, h, 3, bytes(out)
    if (compression == 3 and bpp in (16, 32)) or (
            compression == 0 and bpp == 16):
        # r16: BI_BITFIELDS (masked 16/32-bit — the screenshot class)
        # and plain 16-bit BI_RGB, which the spec defaults to X1R5G5B5.
        # Channels expand to 8 bits by bit replication (the repo's
        # 15/16-bit convention, exact at widths 8).
        if compression == 3:
            if len(buf) < 66:
                raise ValueError("truncated BMP BITFIELDS masks")
            masks = struct.unpack("<III", buf[54:66])
        else:
            masks = (0x7C00, 0x03E0, 0x001F)
        if (masks[0] & masks[1]) or (masks[0] & masks[2]) \
                or (masks[1] & masks[2]):
            raise ValueError("BMP overlapping channel masks")
        infos = []
        for m in masks:
            if m == 0 or m >= (1 << bpp):
                raise ValueError(f"BMP channel mask {m:#x} invalid")
            shift = (m & -m).bit_length() - 1
            width = (m >> shift).bit_length()
            if (m >> shift) != (1 << width) - 1:
                raise ValueError(
                    f"BMP non-contiguous channel mask {m:#x}"
                )
            infos.append((m, shift, width))
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        if data_off + stride * h > len(buf):
            raise ValueError("truncated BMP pixel data")
        for y in range(h):
            row = buf[data_off + y * stride :][: w * nb]
            rgb = bytearray(w * 3)
            for x in range(w):
                v = int.from_bytes(row[x * nb : (x + 1) * nb], "little")
                for c, (m, sh, wd) in enumerate(infos):
                    cv = (v & m) >> sh
                    if wd >= 8:
                        rgb[3 * x + c] = cv >> (wd - 8)
                    else:
                        # bit replication: repeat the field until at
                        # least 8 bits, keep the top byte (width 5
                        # reduces to the classic (c<<3)|(c>>2))
                        vv, ww = cv, wd
                        while ww < 8:
                            vv = (vv << wd) | cv
                            ww += wd
                        rgb[3 * x + c] = vv >> (ww - 8)
            put_row_rgb(y, bytes(rgb))
        return w, h, 3, bytes(out)
    if bpp in (1, 4, 8) and compression == 0:
        stride = ((w * bpp + 31) // 32) * 4
        if data_off + stride * h > len(buf):
            raise ValueError("truncated BMP pixel data")
        npal = len(pal)
        for y in range(h):
            row = buf[data_off + y * stride :][:stride]
            rgb = bytearray(w * 3)
            for x in range(w):
                if bpp == 8:
                    ci = row[x]
                elif bpp == 4:  # high nibble first
                    ci = (row[x // 2] >> (4 if x % 2 == 0 else 0)) & 0xF
                else:  # 1-bit, MSB first
                    ci = (row[x // 8] >> (7 - x % 8)) & 1
                if ci >= npal:
                    raise ValueError(f"BMP palette index {ci} out of range")
                rgb[3 * x : 3 * x + 3] = pal[ci]
            put_row_rgb(y, bytes(rgb))
        return w, h, 3, bytes(out)
    if bpp == 4 and compression == 2:  # BI_RLE4
        npal = len(pal)
        idx = bytearray(w * h)  # top-left-origin index plane
        x = y = 0  # bottom-up coordinates per the spec
        i = data_off
        while True:
            if i + 2 > len(buf):
                raise ValueError("truncated BMP RLE4 stream")
            n, v = buf[i], buf[i + 1]
            i += 2
            if n:  # encoded run: n pixels alternating v's nibbles
                if x + n > w or y >= h:
                    raise ValueError("BMP RLE4 run past row end")
                dst_y = y if top_down else h - 1 - y
                for j in range(n):
                    idx[dst_y * w + x + j] = (
                        (v >> 4) if j % 2 == 0 else v
                    ) & 0xF
                x += n
            elif v == 0:  # end of line
                x, y = 0, y + 1
            elif v == 1:  # end of bitmap
                break
            elif v == 2:  # delta
                if i + 2 > len(buf):
                    raise ValueError("truncated BMP RLE4 delta")
                x += buf[i]
                y += buf[i + 1]
                i += 2
                if x > w or y > h:
                    raise ValueError("BMP RLE4 delta out of bounds")
            else:  # absolute: v nibble-packed pixels, word-aligned
                nbytes = (v + 1) // 2
                if i + nbytes > len(buf) or x + v > w or y >= h:
                    raise ValueError("BMP RLE4 absolute run out of bounds")
                dst_y = y if top_down else h - 1 - y
                for j in range(v):
                    b = buf[i + j // 2]
                    idx[dst_y * w + x + j] = (
                        (b >> 4) if j % 2 == 0 else b
                    ) & 0xF
                x += v
                i += (nbytes + 1) & ~1
        rgb = bytearray(w * h * 3)
        for k, ci in enumerate(idx):
            if ci >= npal:
                raise ValueError(f"BMP palette index {ci} out of range")
            rgb[3 * k : 3 * k + 3] = pal[ci]
        return w, h, 3, bytes(rgb)
    if bpp == 8 and compression == 1:  # BI_RLE8
        npal = len(pal)
        idx = bytearray(w * h)  # top-left-origin index plane
        x = y = 0  # (x, y) in BOTTOM-UP coordinates per the spec
        i = data_off
        while True:
            if i + 2 > len(buf):
                raise ValueError("truncated BMP RLE stream")
            n, v = buf[i], buf[i + 1]
            i += 2
            if n:  # encoded run: n copies of index v
                if x + n > w or y >= h:
                    raise ValueError("BMP RLE run past row end")
                dst_y = y if top_down else h - 1 - y
                idx[dst_y * w + x : dst_y * w + x + n] = bytes([v]) * n
                x += n
            elif v == 0:  # end of line
                x, y = 0, y + 1
            elif v == 1:  # end of bitmap
                break
            elif v == 2:  # delta
                if i + 2 > len(buf):
                    raise ValueError("truncated BMP RLE delta")
                x += buf[i]
                y += buf[i + 1]
                i += 2
                if x > w or y > h:
                    raise ValueError("BMP RLE delta out of bounds")
            else:  # absolute mode: v literal indices, word-aligned
                if i + v > len(buf) or x + v > w or y >= h:
                    raise ValueError("BMP RLE absolute run out of bounds")
                dst_y = y if top_down else h - 1 - y
                idx[dst_y * w + x : dst_y * w + x + v] = buf[i : i + v]
                x += v
                i += v + (v & 1)
        rgb = bytearray(w * h * 3)
        for k, ci in enumerate(idx):
            if ci >= npal:
                raise ValueError(f"BMP palette index {ci} out of range")
            rgb[3 * k : 3 * k + 3] = pal[ci]
        return w, h, 3, bytes(rgb)
    raise NotImplementedError(
        f"BMP bpp {bpp} / compression {compression}: only 16/24/32-bit"
        " BI_RGB, 16/32-bit BI_BITFIELDS, 1/4/8-bit paletted BI_RGB,"
        " BI_RLE8, and BI_RLE4 decode here"
    )


def encode_bmp(
    w: int,
    h: int,
    pixels: bytes,
    top_down: bool = False,
    palette: list[bytes] | None = None,
    indices: bytes | None = None,
    rle: bool = False,
    bpp: int = 8,
    bitfields: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode a BMP fixture: 24-bit BI_RGB from RGB ``pixels``, or —
    with ``palette``+``indices`` — 1/4/8-bit paletted (sub-byte
    indices packed MSB-first), optionally BI_RLE8 / BI_RLE4 (runs +
    absolute segments + end-of-line/bitmap escapes, the branches
    decode must handle; RLE needs bpp 8 or 4). ``bitfields`` (r16)
    writes BI_BITFIELDS at ``bpp`` 16/32 with the given (r, g, b)
    masks — each 8-bit channel is reduced to the mask's top bits, so
    the round trip is exact for values on the replication lattice
    (always, for width-8 masks)."""
    if bitfields is not None:
        if palette is not None or rle:
            raise ValueError("bitfields BMP is direct-color, non-RLE")
        if bpp not in (16, 32):
            raise ValueError(f"BI_BITFIELDS bpp {bpp}")
        if len(pixels) != w * h * 3:
            raise ValueError("pixel buffer size mismatch")
        infos = []
        for m in bitfields:
            if m == 0 or m >= (1 << bpp):
                raise ValueError(f"channel mask {m:#x} out of range")
            shift = (m & -m).bit_length() - 1
            width = (m >> shift).bit_length()
            if (m >> shift) != (1 << width) - 1 or width > 8:
                raise ValueError(f"channel mask {m:#x} not encodable")
            infos.append((shift, width))
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = bytearray()
        order = range(h) if top_down else range(h - 1, -1, -1)
        for y in order:
            row = bytearray()
            for x in range(w):
                v = 0
                for c, (shift, width) in enumerate(infos):
                    v |= (pixels[(y * w + x) * 3 + c]
                          >> (8 - width)) << shift
                row += v.to_bytes(nb, "little")
            rows += row + b"\x00" * (stride - len(row))
        data = bytes(rows)
        # 40-byte info header + the 12-byte mask block decode reads
        # at offset 54 (the V3 layout real writers emit)
        hdr_size = 40
        mask_block = struct.pack("<III", *bitfields)
        off = 14 + hdr_size + len(mask_block)
        hdr = b"BM" + struct.pack(
            "<IHHI", off + len(data), 0, 0, off
        )
        info = struct.pack(
            "<IiiHHIIiiII", hdr_size, w, -h if top_down else h, 1,
            bpp, 3, len(data), 2835, 2835, 0, 0,
        )
        return hdr + info + mask_block + data
    if palette is not None and bpp not in (1, 4, 8):
        raise ValueError(f"paletted BMP bpp {bpp}")
    if rle and bpp not in (4, 8):
        raise ValueError("BMP RLE needs bpp 8 (RLE8) or 4 (RLE4)")
    if palette is None:
        if len(pixels) != w * h * 3:
            raise ValueError("pixel buffer size mismatch")
        stride = (w * 3 + 3) & ~3
        rows = bytearray()
        order = range(h) if top_down else range(h - 1, -1, -1)
        for y in order:
            row = bytearray()
            for x in range(w):
                r_, g_, b_ = pixels[(y * w + x) * 3 : (y * w + x) * 3 + 3]
                row += bytes((b_, g_, r_))
            rows += row + b"\x00" * (stride - len(row))
        data = bytes(rows)
        bpp, n_colors, pal_bytes = 24, 0, b""
    else:
        if indices is None or len(indices) != w * h:
            raise ValueError("index buffer size mismatch")
        if not 1 <= len(palette) <= 256:
            raise ValueError("palette must have 1..256 entries")
        if max(indices) >= len(palette):
            raise ValueError("index exceeds palette")
        n_colors = len(palette)
        pal_bytes = b"".join(
            bytes((p[2], p[1], p[0], 0)) for p in palette
        )
        order = range(h) if top_down else range(h - 1, -1, -1)
        if max(indices) >= (1 << bpp):
            raise ValueError(f"index does not fit in {bpp} bits")
        if not rle:
            stride = ((w * bpp + 31) // 32) * 4
            rows = bytearray()
            for y in order:
                idx_row = indices[y * w : (y + 1) * w]
                if bpp == 8:
                    packed = bytes(idx_row)
                else:
                    per = 8 // bpp
                    packed = bytes(
                        sum(
                            (idx_row[k + j] if k + j < w else 0)
                            << (8 - bpp * (j + 1))
                            for j in range(per)
                        )
                        for k in range(0, w, per)
                    )
                rows += packed + b"\x00" * (stride - len(packed))
            data = bytes(rows)
        elif bpp == 4:  # BI_RLE4
            enc = bytearray()
            for y in order:
                row = indices[y * w : (y + 1) * w]
                x = 0
                while x < w:
                    run = 1
                    while (
                        x + run < w and run < 255
                        and row[x + run] == row[x]
                    ):
                        run += 1
                    if run >= 3 or x + run >= w:
                        enc += bytes((run, (row[x] << 4) | row[x]))
                        x += run
                    else:
                        j = x
                        while (
                            j < w and j - x < 255
                            and not (
                                j + 2 < w
                                and row[j] == row[j + 1] == row[j + 2]
                            )
                        ):
                            j += 1
                        seg = row[x:j]
                        if len(seg) < 3:  # too short for absolute mode
                            for ci in seg:
                                enc += bytes((1, ci << 4))
                        else:
                            packed = bytearray()
                            for k in range(0, len(seg), 2):
                                b = seg[k] << 4
                                if k + 1 < len(seg):
                                    b |= seg[k + 1]
                                packed.append(b)
                            enc += bytes((0, len(seg))) + packed
                            if len(packed) & 1:
                                enc += b"\x00"
                        x = j
                enc += b"\x00\x00"  # end of line
            enc += b"\x00\x01"  # end of bitmap
            data = bytes(enc)
        else:
            enc = bytearray()
            for y in order:
                row = indices[y * w : (y + 1) * w]
                x = 0
                while x < w:
                    run = 1
                    while (
                        x + run < w and run < 255
                        and row[x + run] == row[x]
                    ):
                        run += 1
                    if run >= 3 or x + run >= w:
                        enc += bytes((run, row[x]))
                        x += run
                    else:
                        # absolute segment up to the next run of >= 3
                        j = x
                        while (
                            j < w and j - x < 255
                            and not (
                                j + 2 < w
                                and row[j] == row[j + 1] == row[j + 2]
                            )
                        ):
                            j += 1
                        seg = row[x:j]
                        if len(seg) < 3:  # too short for absolute mode
                            for ci in seg:
                                enc += bytes((1, ci))
                        else:
                            enc += bytes((0, len(seg))) + seg
                            if len(seg) & 1:
                                enc += b"\x00"
                        x = j
                enc += b"\x00\x00"  # end of line
            enc += b"\x00\x01"  # end of bitmap
            data = bytes(enc)
    hdr_size = 40
    data_off = 14 + hdr_size + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        hdr_size, w, (-h if top_down else h), 1, bpp,
        (1 if bpp == 8 else 2) if (palette is not None and rle) else 0,
        len(data), 2835, 2835, n_colors, 0,
    )
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off
    )
    return file_hdr + info + pal_bytes + data


# --------------------------------------------------------------------------
# WAV (RIFF) — the audio modality's real decoder: 16-bit PCM since r8;
# G.711 mu-law/A-law and IMA ADPCM (the COMPRESSED-audio formats) r13
# --------------------------------------------------------------------------

# G.711 per Sun Microsystems' public-domain g711.c (the canonical
# CCITT reference implementation); cross-checked in tests against
# CPython's independent C implementation (stdlib audioop, 3.11).
_ALAW_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def ulaw_to_linear(u: int) -> int:
    """One mu-law codeword -> int16 sample (G.711 decode)."""
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


_ULAW_SEG_END = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)


def linear_to_ulaw(pcm: int) -> int:
    """int16 sample -> mu-law codeword (G.711 encode), the 14-bit
    -domain variant (arithmetic >>2 first) — the mapping deployed in
    Sun's updated g711.c and CPython's audioop, bit-for-bit (the
    original 16-bit-domain variant differs by one codeword for some
    negative inputs because the arithmetic shift floors before
    negation)."""
    p = pcm >> 2
    if p < 0:
        p = -p
        mask = 0x7F
    else:
        mask = 0xFF
    if p > 8158:
        p = 8158  # clip so p + BIAS stays inside the last segment
    p += 33  # BIAS in the 14-bit domain
    for seg, end in enumerate(_ULAW_SEG_END):
        if p <= end:
            break
    return ((seg << 4) | ((p >> (seg + 1)) & 0x0F)) ^ mask


def alaw_to_linear(a: int) -> int:
    """One A-law codeword -> int16 sample (G.711 decode)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def linear_to_alaw(pcm: int) -> int:
    """int16 sample -> A-law codeword (G.711 encode)."""
    p = pcm >> 3  # 16-bit to the 13-bit domain g711.c works in
    if p >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        p = -p - 1
    for seg, end in enumerate(_ALAW_SEG_END):
        if p <= end:
            break
    else:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (p >> 1) & 0x0F if seg < 2 else (p >> seg) & 0x0F
    return aval ^ mask


# IMA/DVI ADPCM (the WAV fmt 0x11 block format) — step/index tables
# from the IMA ADPCM reference algorithm (public, also in RFC 3551
# and CPython's audioop).
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)


def _ima_decode_nibble(n: int, pred: int, index: int) -> tuple[int, int]:
    step = _IMA_STEP[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    pred = -32768 if pred < -32768 else 32767 if pred > 32767 else pred
    index += _IMA_INDEX[n]
    index = 0 if index < 0 else 88 if index > 88 else index
    return pred, index


def _ima_encode_sample(s: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample against the predictor; returns
    (nibble, new_pred, new_index) — the encoder mirrors the decoder's
    reconstruction so predictor state never drifts."""
    step = _IMA_STEP[index]
    delta = s - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    return n, *_ima_decode_nibble(n, pred, index)


def _decode_ima_block(
    body: bytes, channels: int, samples_per_block: int
) -> list[int]:
    """One IMA ADPCM block -> interleaved int16 samples. Per channel:
    a 4-byte header (int16 predictor == sample 0, step index, pad),
    then 4-byte words of 8 nibbles (low first), words interleaved
    across channels."""
    preds, idxs, chans = [], [], []
    for ch in range(channels):
        p, ix, _ = struct.unpack_from("<hBB", body, 4 * ch)
        if ix > 88:
            raise ValueError(f"IMA ADPCM step index {ix} out of range")
        preds.append(p)
        idxs.append(ix)
        chans.append([p])
    pos = 4 * channels
    while len(chans[0]) < samples_per_block:
        for ch in range(channels):
            if pos + 4 > len(body):
                raise ValueError("IMA ADPCM block truncated")
            word = body[pos : pos + 4]
            pos += 4
            for b in word:
                for n in (b & 0x0F, b >> 4):
                    preds[ch], idxs[ch] = _ima_decode_nibble(
                        n, preds[ch], idxs[ch]
                    )
                    chans[ch].append(preds[ch])
    out = []
    for k in range(samples_per_block):
        for ch in range(channels):
            out.append(chans[ch][k])
    return out


def decode_wav(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a RIFF/WAVE file to 16-bit PCM.

    Real RIFF chunk walk: validates the RIFF/WAVE header, locates the
    ``fmt ``/``fact``/``data`` chunks wherever they appear (files in
    the wild carry LIST/INFO chunks in between) and returns
    ``(sample_rate, channels, n_frames, samples)`` with ``samples`` as
    little-endian int16 frame data. Formats decoded FOR REAL: integer
    PCM (tag 1 — 16-bit verbatim; round 15 adds 8-bit unsigned,
    (b - 128) << 8, and 24-bit signed, top two bytes kept), IEEE
    float PCM (tag 3, 32- and 64-bit — round 15:
    v = clamp(round_half_up(f * 32768), -32768, 32767), exact on the
    int16 lattice f = s/32768; non-finite samples are rejected), G.711
    A-law (6) and mu-law (7), IMA ADPCM (0x11, per-block predictor
    headers + interleaved nibble words), and WAVE_FORMAT_EXTENSIBLE
    (0xFFFE — round 15: the 16-byte SubFormat GUID's leading tag
    unwraps to any of the above; the wrapper every multi-channel or
    >16-bit writer emits). Anything else (MPEG, ...) raises
    NotImplementedError — the remaining documented audio seam."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    sample_rate = channels = bits = fmt_tag = -1
    block_align = samples_per_block = fact_frames = -1
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
            (block_align,) = struct.unpack("<H", body[12:14])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: cbSize(2) + valid bits(2) +
                # channel mask(4) + SubFormat GUID whose first two
                # bytes are the wrapped format tag.
                if length < 40:
                    raise ValueError(
                        f"EXTENSIBLE fmt chunk too short: {length}"
                    )
                (fmt_tag,) = struct.unpack("<H", body[24:26])
                if body[26:40] != (
                    b"\x00\x00\x00\x00\x10\x00\x80\x00"
                    b"\x00\xaa\x00\x38\x9b\x71"
                ):
                    raise ValueError(
                        "EXTENSIBLE SubFormat GUID is not a"
                        " KSDATAFORMAT_SUBTYPE"
                    )
                if fmt_tag not in (1, 3):
                    raise NotImplementedError(
                        f"EXTENSIBLE wrapping format tag {fmt_tag}"
                    )
            if fmt_tag == 1:
                if bits not in (8, 16, 24):
                    raise NotImplementedError(f"{bits}-bit PCM not supported")
            elif fmt_tag == 3:
                if bits not in (32, 64):
                    raise ValueError(f"IEEE float PCM with {bits} bits")
            elif fmt_tag in (6, 7):
                if bits != 8:
                    raise ValueError(f"G.711 with {bits}-bit samples")
            elif fmt_tag == 0x11:
                if bits != 4:
                    raise NotImplementedError(
                        f"{bits}-bit IMA ADPCM not supported"
                    )
                if length >= 20:
                    (samples_per_block,) = struct.unpack("<H", body[18:20])
            else:
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag}: requires an external "
                    "decoder; supported: PCM16, A-law, mu-law, IMA ADPCM"
                )
        elif ctype == b"fact":
            (fact_frames,) = struct.unpack("<I", body[:4])
        elif ctype == b"data":
            data = body
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate < 0 or data is None:
        raise ValueError("missing fmt or data chunk")
    if channels < 1:
        raise ValueError(f"malformed fmt chunk: channels={channels}")
    if fmt_tag == 1:
        sb = bits // 8
        frame_bytes = sb * channels
        if len(data) % frame_bytes:
            raise ValueError("data chunk not a whole number of frames")
        if bits == 16:
            return sample_rate, channels, len(data) // frame_bytes, data
        n = len(data) // sb
        pcm = bytearray(2 * n)
        if bits == 8:  # unsigned byte -> int16
            for k in range(n):
                struct.pack_into("<h", pcm, 2 * k, (data[k] - 128) << 8)
        else:  # 24-bit little-endian signed -> top two bytes
            pcm = bytearray(data[k] for j in range(n)
                            for k in (3 * j + 1, 3 * j + 2))
        return sample_rate, channels, n // channels, bytes(pcm)
    if fmt_tag == 3:  # IEEE float PCM -> int16
        sb = bits // 8
        frame_bytes = sb * channels
        if len(data) % frame_bytes:
            raise ValueError("data chunk not a whole number of frames")
        n = len(data) // sb
        vals = struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", data)
        pcm = bytearray(2 * n)
        for k, f in enumerate(vals):
            if f != f or f in (float("inf"), float("-inf")):
                raise ValueError("non-finite float PCM sample")
            v = math.floor(f * 32768.0 + 0.5)
            struct.pack_into(
                "<h", pcm, 2 * k, min(32767, max(-32768, v))
            )
        return sample_rate, channels, n // channels, bytes(pcm)
    if fmt_tag in (6, 7):
        table = alaw_to_linear if fmt_tag == 6 else ulaw_to_linear
        if len(data) % channels:
            raise ValueError("data chunk not a whole number of frames")
        pcm = bytearray(2 * len(data))
        for k, b in enumerate(data):
            struct.pack_into("<h", pcm, 2 * k, table(b))
        return sample_rate, channels, len(data) // channels, bytes(pcm)
    # IMA ADPCM
    if block_align <= 4 * channels:
        raise ValueError(f"IMA ADPCM block_align {block_align} too small")
    if samples_per_block < 0:
        # Derive from block geometry: header sample + 8 nibbles per
        # 4-byte word per channel.
        samples_per_block = (
            (block_align - 4 * channels) * 8 // (4 * channels)
        ) * 4 + 1
    out: list[int] = []
    total = fact_frames if fact_frames >= 0 else None
    for off in range(0, len(data), block_align):
        body = data[off : off + block_align]
        if len(body) < 4 * channels:
            raise ValueError("IMA ADPCM trailing partial block header")
        n_this = samples_per_block
        if total is not None:
            remaining = total - len(out) // channels
            if remaining <= 0:
                break
            n_this = min(samples_per_block, remaining)
        out.extend(
            _decode_ima_block(body, channels, samples_per_block)[
                : n_this * channels
            ]
        )
    pcm = bytearray(2 * len(out))
    for k, s in enumerate(out):
        struct.pack_into("<h", pcm, 2 * k, s)
    return sample_rate, channels, len(out) // channels, bytes(pcm)


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


def encode_wav_g711(
    sample_rate: int, channels: int, samples: bytes, law: str = "ulaw"
) -> bytes:
    """Encode int16 PCM frames as a G.711 (A-law/mu-law) RIFF/WAVE —
    fmt tag 6/7, 8 bits per sample, with the fact chunk real decoders
    expect for compressed formats."""
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law {law!r}")
    if len(samples) % (2 * channels):
        raise ValueError("sample buffer not a whole number of frames")
    conv = linear_to_ulaw if law == "ulaw" else linear_to_alaw
    n = len(samples) // 2
    data = bytes(
        conv(struct.unpack_from("<h", samples, 2 * k)[0]) for k in range(n)
    )
    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * channels,
        channels, 8,
    )
    fact = struct.pack("<I", n // channels)
    pad = b"\x00" if len(data) & 1 else b""
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


_EXT_GUID_TAIL = (
    b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def _wav_fmt_chunk(
    tag: int, channels: int, rate: int, bits: int, extensible: bool
) -> bytes:
    """fmt chunk bytes: plain 16-byte PCM layout, or the 40-byte
    WAVE_FORMAT_EXTENSIBLE wrapper (cbSize 22, valid bits = bits,
    channel mask 0, SubFormat GUID = KSDATAFORMAT_SUBTYPE_<tag>)."""
    sb = bits // 8
    body = struct.pack(
        "<HHIIHH", 0xFFFE if extensible else tag, channels, rate,
        rate * channels * sb, channels * sb, bits,
    )
    if extensible:
        body += struct.pack("<HHI", 22, bits, 0)
        body += struct.pack("<H", tag) + _EXT_GUID_TAIL
    return b"fmt " + struct.pack("<I", len(body)) + body


def encode_wav_pcm(
    sample_rate: int,
    channels: int,
    samples: bytes,
    bits: int = 16,
    extensible: bool = False,
) -> bytes:
    """Encode int16 LE frame data as integer PCM at 8/16/24 bits
    (8-bit stores the unsigned top byte, so decode inverts exactly
    when the int16 low byte is zero; 24-bit stores s << 8, which
    decode inverts exactly for every int16), optionally inside the
    WAVE_FORMAT_EXTENSIBLE wrapper."""
    if bits not in (8, 16, 24):
        raise ValueError(f"PCM bits {bits}")
    if len(samples) % (2 * channels):
        raise ValueError("sample buffer not a whole number of frames")
    n = len(samples) // 2
    if bits == 16:
        data = samples
    elif bits == 8:
        data = bytes(
            ((struct.unpack_from("<h", samples, 2 * k)[0] >> 8) + 128)
            & 0xFF
            for k in range(n)
        )
    else:
        out = bytearray()
        for k in range(n):
            (s,) = struct.unpack_from("<h", samples, 2 * k)
            out += struct.pack("<i", s << 8)[:3]
        data = bytes(out)
    pad = b"\x00" if len(data) & 1 else b""
    chunks = (
        _wav_fmt_chunk(1, channels, sample_rate, bits, extensible)
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_float(
    sample_rate: int,
    channels: int,
    values: list[float],
    bits: int = 32,
    extensible: bool = False,
) -> bytes:
    """Encode float frames as an IEEE float PCM RIFF/WAVE (fmt tag 3,
    32- or 64-bit, optionally inside the WAVE_FORMAT_EXTENSIBLE
    wrapper), with the fact chunk non-PCM formats carry. To make
    decode's int16 conversion exact, draw values from the int16
    lattice (``s / 32768.0`` — every int16 is exactly representable in
    float32 and the power-of-two divide is exact), the same
    decoder-output-lattice trick the G.711 fixtures use."""
    if bits not in (32, 64):
        raise ValueError(f"float WAV bits {bits}")
    if len(values) % channels:
        raise ValueError("sample buffer not a whole number of frames")
    data = struct.pack(
        f"<{len(values)}{'f' if bits == 32 else 'd'}", *values
    )
    fact = struct.pack("<I", len(values) // channels)
    chunks = (
        _wav_fmt_chunk(3, channels, sample_rate, bits, extensible)
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_ima_adpcm(
    sample_rate: int,
    channels: int,
    samples: bytes,
    samples_per_block: int = 505,
) -> bytes:
    """Encode int16 PCM frames as IMA ADPCM RIFF/WAVE (fmt 0x11) with
    the standard per-block per-channel predictor headers and
    interleaved 4-byte nibble words. ``samples_per_block`` must be
    1 + a multiple of 8 (one header sample, then whole nibble words).
    The tail block is zero-padded; the fact chunk records the true
    frame count so decode returns exactly the input length."""
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + 8k")
    if len(samples) % (2 * channels):
        raise ValueError("sample buffer not a whole number of frames")
    n_frames = len(samples) // (2 * channels)
    pcm = [
        struct.unpack_from("<h", samples, 2 * k)[0]
        for k in range(len(samples) // 2)
    ]
    # De-interleave per channel.
    chans = [pcm[ch::channels] for ch in range(channels)]
    block_align = 4 * channels + (samples_per_block - 1) // 2 * channels
    data = bytearray()
    idxs = [0] * channels
    for start in range(0, n_frames, samples_per_block):
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for ch in range(channels):
            seq = chans[ch][start : start + samples_per_block]
            seq = seq + [seq[-1]] * (samples_per_block - len(seq))
            pred = seq[0]
            data += struct.pack("<hBB", pred, idxs[ch], 0)
            for s in seq[1:]:
                n, pred, idxs[ch] = _ima_encode_sample(s, pred, idxs[ch])
                nibbles[ch].append(n)
        # Interleave per 8-nibble word across channels.
        nwords = len(nibbles[0]) // 8
        for wi in range(nwords):
            for ch in range(channels):
                grp = nibbles[ch][8 * wi : 8 * wi + 8]
                for k in range(0, 8, 2):
                    data.append(grp[k] | (grp[k + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, channels, sample_rate,
        sample_rate * block_align // samples_per_block,
        block_align, 4, 2, samples_per_block,
    )
    fact = struct.pack("<I", n_frames)
    pad = b"\x00" if len(data) & 1 else b""
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data) + pad
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_ima_adpcm_stream(
    sample_rate: int, pred0: int, index0: int, nibbles: list[int]
) -> bytes:
    """Assemble a mono single-block IMA ADPCM RIFF/WAVE directly from a
    NIBBLE stream (no encoder in the loop): block header carries
    ``pred0``/``index0`` verbatim, the data words carry ``nibbles``
    (low nibble first), and the fact chunk records the true frame
    count (1 header sample + len(nibbles)). Fixture source for
    oracle-checked ADPCM decode: the decoded PCM is a pure function of
    (pred0, index0, nibbles) that an analytic oracle can replay, which
    an encode->decode round trip (quantization in the loop) cannot
    give. ``len(nibbles)`` must be a multiple of 8 (whole 4-byte data
    words)."""
    if len(nibbles) % 8:
        raise ValueError("nibble count must be a multiple of 8")
    if not -32768 <= pred0 <= 32767:
        raise ValueError(f"pred0 {pred0} outside int16")
    if not 0 <= index0 <= 88:
        raise ValueError(f"index0 {index0} outside 0..88")
    frames = len(nibbles) + 1
    data = bytearray(struct.pack("<hBB", pred0, index0, 0))
    for k in range(0, len(nibbles), 2):
        data.append((nibbles[k] & 0x0F) | ((nibbles[k + 1] & 0x0F) << 4))
    block_align = 4 + len(nibbles) // 2
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate, sample_rate * block_align // frames,
        block_align, 4, 2, frames,
    )
    fact = struct.pack("<I", frames)
    pad = b"\x00" if len(data) & 1 else b""
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data) + pad
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


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT, 8-bit) — round 13
# --------------------------------------------------------------------------
# A real pure-Python baseline JPEG codec, closing the JPEG half of the
# external-codec seam the way r10 closed PNG: decode walks the actual
# marker stream (DQT/DHT/SOF0/DRI/SOS with restart markers), entropy
# -decodes the Huffman/RLE coefficient stream with FF00 unstuffing,
# dequantizes through the stream's own tables, runs a true 2-D IDCT,
# and handles subsampled chroma (any h/v factors 1..2: 4:4:4, 4:2:2,
# 4:2:0) with replication upsampling. Only the BASELINE process is
# implemented — progressive (SOF2), arithmetic coding, hierarchical
# and 12-bit streams still raise NotImplementedError: that narrower
# seam is where a C-extension codec would swap in at scale.
#
# The encoder exists so tests and fixtures can synthesize valid
# streams deterministically (the container has no imaging library to
# make JPEGs with): 4:4:4, custom deterministic quant tables, and
# canonical fixed-length Huffman tables WRITTEN INTO the stream's DHT
# segments — the decoder must parse real tables from the stream, not
# share Python constants with the encoder. No Annex-K "typical"
# tables are copied from anywhere; both table families are generated.

_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):  # anti-diagonals of the 8x8 block
    _d = [(i, _s - i) for i in range(max(0, _s - 7), min(8, _s + 1))]
    _ZIGZAG += _d[::-1] if _s % 2 == 0 else _d  # up-right on even diags

_COS = [
    [__import__("math").cos((2 * x + 1) * u * __import__("math").pi / 16)
     for x in range(8)]
    for u in range(8)
]
_INV_SQRT2 = 1.0 / __import__("math").sqrt(2.0)


def _quant_tables(quality: int) -> tuple[list[int], list[int]]:
    """Deterministic quant tables (natural order), scaled by quality
    1..100 (higher = finer). Not the Annex-K examples — generated:
    luma grows with frequency from 8, chroma from 12, both clamped to
    [1, 255]. q=87 leaves luma DC at step 8 (<= 16), which the
    round-trip tests exploit: a solid block reconstructs exactly."""
    if not (1 <= quality <= 100):
        raise ValueError(f"quality {quality} outside 1..100")
    scale = (5000 // quality if quality < 50 else 200 - 2 * quality) / 100.0
    luma, chroma = [], []
    for i in range(8):
        for j in range(8):
            luma.append(min(255, max(1, int((8 + 2 * (i + j)) * scale))))
            chroma.append(min(255, max(1, int((12 + 3 * (i + j)) * scale))))
    return luma, chroma


def _fdct_block(block: list[float]) -> list[float]:
    """8x8 forward DCT-II (T.81 A.3.3), input level-shifted samples."""
    out = [0.0] * 64
    for u in range(8):
        cu = _INV_SQRT2 if u == 0 else 1.0
        for v in range(8):
            cv = _INV_SQRT2 if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * _COS[v][x] * _COS[u][y]
            out[u * 8 + v] = 0.25 * cu * cv * s
    return out


def _idct_block(coef: list[float]) -> list[float]:
    """8x8 inverse DCT (T.81 A.3.3)."""
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = _INV_SQRT2 if u == 0 else 1.0
                for v in range(8):
                    cv = _INV_SQRT2 if v == 0 else 1.0
                    s += cu * cv * coef[u * 8 + v] * _COS[v][x] * _COS[u][y]
            out[y * 8 + x] = 0.25 * s
    return out


def _mag_category(v: int) -> int:
    """JPEG magnitude category: bits needed for |v| (0 for v == 0)."""
    return 0 if v == 0 else abs(v).bit_length()


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` raw bits to the signed value."""
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:  # pad with 1s per spec
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops AT any
    real marker (FF xx, xx != 0) and reports it for RST handling."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data exhausted at marker")
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("truncated JPEG entropy data")
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = (
                    self.buf[self.pos + 1]
                    if self.pos + 1 < len(self.buf)
                    else None
                )
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF: data byte 0xFF
                    break
                if nxt == 0xFF:
                    # T.81 B.1.1.2 fill byte preceding a marker — not
                    # entropy data; skip so the REAL marker is seen.
                    self.pos += 1
                    continue
                self.marker = nxt
                raise ValueError("entropy data exhausted at marker")
            self.pos += 1
            break
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the pending/next marker byte and return it."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            self.pos += 2
            return m
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF:
                nxt = self.buf[self.pos + 1]
                if nxt == 0xFF:
                    self.pos += 1  # B.1.1.2 fill byte before the marker
                    continue
                if nxt != 0x00:
                    self.pos += 2
                    return nxt
            self.pos += 1
        raise ValueError("no marker found in entropy data")


class _HuffTable:
    """Canonical JPEG Huffman table from DHT (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        if sum(bits) != len(vals):
            raise ValueError("DHT: BITS/HUFFVAL length mismatch")
        # (first_code, first_index) per length — T.81 F.2.2.3 DECODE.
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1
        self.enc = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.enc[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[ln] >= 0 and code <= self.maxcode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("invalid Huffman code in entropy data")


def _fixed_huff_tables() -> tuple[list[int], list[int], list[int], list[int]]:
    """The encoder's generated tables as (BITS, HUFFVAL) pairs.

    DC: 12 magnitude categories, all 5-bit canonical codes (max code
    01011 — never all-ones). AC: 255 run/size symbols at 9 bits plus
    one at 10 (a DHT BITS entry is a single byte, so one length holds
    at most 255 codes; the 10-bit tail code 0111111110 is still not
    all-ones). Deliberately shape-trivial: compression ratio is not
    this codec's job, parsing REAL tables from the stream is."""
    dc_bits = [0, 0, 0, 0, 12] + [0] * 11
    dc_vals = list(range(12))
    ac_bits = [0] * 8 + [255, 1] + [0] * 6
    ac_vals = list(range(256))
    return dc_bits, dc_vals, ac_bits, ac_vals


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    c = lambda v: min(255, max(0, int(v + 0.5)))  # noqa: E731
    return c(y), c(cb), c(cr)


def _encode_block(bw, plane, pw, bx0, by0, q, pred_val, dc_tab, ac_tab):
    """FDCT + quantize + Huffman-encode one 8x8 block; returns the new
    DC predictor for this component."""
    blk = [
        float(plane[(by0 + yy) * pw + bx0 + xx]) - 128.0
        for yy in range(8)
        for xx in range(8)
    ]
    coef = _fdct_block(blk)
    zz = [int(round(coef[i * 8 + j] / q[i * 8 + j])) for (i, j) in _ZIGZAG]
    diff = zz[0] - pred_val
    size = _mag_category(diff)
    c, ln = dc_tab.enc[size]
    bw.put(c, ln)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab.enc[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        size = _mag_category(v)
        c, ln = ac_tab.enc[(run << 4) | size]
        bw.put(c, ln)
        bw.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_tab.enc[0x00]  # EOB
        bw.put(c, ln)
    return zz[0]


def _encode_setup(w, h, pixels, channels, quality, subsampling):
    """Shared encoder front half: validate, build quant tables and the
    component spec, color-convert, box-average-downsample and edge-pad
    each component plane to the MCU grid. Returns
    (comps, qtabs, [(plane, padded_width)], mcux, mcuy)."""
    if channels not in (1, 3):
        raise ValueError(f"channels {channels} not supported")
    if len(pixels) != w * h * channels:
        raise ValueError("pixel buffer size mismatch")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling {subsampling!r} not supported")
    luma_q, chroma_q = _quant_tables(quality)
    qtabs = [luma_q] if channels == 1 else [luma_q, chroma_q]

    # (id, hs, vs, quant-table) per component.
    if channels == 1:
        comps = [(1, 1, 1, 0)]
    elif subsampling == "4:4:4":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # Full-resolution YCbCr (or gray) planes.
    fulls = [[0] * (w * h) for _ in range(channels)]
    if channels == 1:
        fulls[0] = list(pixels)
    else:
        for i in range(w * h):
            r, g, b = pixels[3 * i : 3 * i + 3]
            yy, cb, cr = _rgb_to_ycbcr(r, g, b)
            fulls[0][i] = yy
            fulls[1][i] = cb
            fulls[2][i] = cr

    # Per component: box-average downsample, edge-pad to the MCU grid.
    planes = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        sx, sy = hmax // hs, vmax // vs
        cw = (w + sx - 1) // sx
        ch = (h + sy - 1) // sy
        pw = mcux * hs * 8
        ph = mcuy * vs * 8
        plane = [0] * (pw * ph)
        src = fulls[ci]
        for y in range(ph):
            cy = min(y, ch - 1)
            for x in range(pw):
                cx = min(x, cw - 1)
                acc = cnt = 0
                for oy in range(sy):
                    yy = cy * sy + oy
                    if yy >= h:
                        continue
                    for ox in range(sx):
                        xx = cx * sx + ox
                        if xx >= w:
                            continue
                        acc += src[yy * w + xx]
                        cnt += 1
                plane[y * pw + x] = (acc + cnt // 2) // cnt
        planes.append((plane, pw))
    return comps, qtabs, planes, mcux, mcuy


def encode_jpeg(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 87,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode a baseline JFIF JPEG with generated quant + Huffman
    tables carried in-stream. ``channels`` 1 (gray) or 3 (RGB
    interleaved); ``subsampling`` '4:4:4' or '4:2:0' (box-average
    chroma downsampling, luma 2x2 MCUs); ``restart_interval`` > 0
    writes a DRI segment and RSTn markers every that many MCUs (the
    decoder's resync + predictor-reset path)."""
    comps, qtabs, planes, mcux, mcuy = _encode_setup(
        w, h, pixels, channels, quality, subsampling
    )

    dc_bits, dc_vals, ac_bits, ac_vals = _fixed_huff_tables()
    dc_tab = _HuffTable(dc_bits, dc_vals)
    ac_tab = _HuffTable(ac_bits, ac_vals)

    bw = _BitWriter()
    pred = [0] * channels
    chunks = []  # entropy segments between restart markers
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                chunks.append(bw.flush())
                m = (mcu_count // restart_interval - 1) % 8
                chunks.append(bytes([0xFF, 0xD0 + m]))
                bw = _BitWriter()
                pred = [0] * channels
            for ci, (_, hs, vs, tq) in enumerate(comps):
                plane, pw = planes[ci]
                q = qtabs[tq]
                for v in range(vs):
                    for hblk in range(hs):
                        pred[ci] = _encode_block(
                            bw,
                            plane,
                            pw,
                            (mx * hs + hblk) * 8,
                            (my * vs + v) * 8,
                            q,
                            pred[ci],
                            dc_tab,
                            ac_tab,
                        )
            mcu_count += 1
    chunks.append(bw.flush())
    entropy = b"".join(chunks)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        zzq = bytes(q[i * 8 + j] for (i, j) in _ZIGZAG)
        out += seg(0xDB, bytes([ti]) + zzq)
    comp_specs = bytearray()
    for cid, hs, vs, tq in comps:
        comp_specs += bytes([cid, (hs << 4) | vs, tq])
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([channels]) + comp_specs,
    )
    packed_bits = lambda bits, vals: bytes(bits) + bytes(vals)  # noqa: E731
    out += seg(0xC4, bytes([0x00]) + packed_bits(dc_bits, dc_vals))
    out += seg(0xC4, bytes([0x10]) + packed_bits(ac_bits, ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential (SOF0/1) or progressive (SOF2)
    Huffman JPEG. Returns ``(w, h, channels, pixels)`` — gray (1) or
    RGB (3) interleaved.

    Implements the real decode pipeline: marker walk, stream-carried
    quant/Huffman tables, interleaved-MCU entropy decode with DC
    prediction + EXTEND, restart-marker handling (DRI/RSTn), dequant,
    inverse zigzag, 2-D IDCT, replication upsampling of subsampled
    chroma, JFIF YCbCr->RGB. Progressive streams additionally carry
    spectral-selection and successive-approximation scans (DC/AC
    first + refinement passes, cross-block EOB runs) accumulated into
    per-component coefficient stores before one shared finish.
    Arithmetic-coded / hierarchical / lossless / 12-bit streams raise
    NotImplementedError (the remaining documented codec seam)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (w, h, [(cid, hs, vs, tq)])
    progressive = False
    while True:
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG: marker segment cut short")
        if buf[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — skip them so spec-valid streams don't misparse the
        # fill as a marker and read garbage as a segment length.
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(buf):
            raise ValueError("truncated JPEG: marker segment cut short")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("EOI before any scan")
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG: segment body cut short")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = list(body[i : i + 64])
                    i += 64
                elif pq == 1:
                    if i + 128 > len(body):
                        raise ValueError("truncated 16-bit DQT table")
                    vals = [
                        struct.unpack(">H", body[i + 2 * k : i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if len(vals) != 64:
                    raise ValueError("truncated DQT table")
                nat = [0] * 64
                for k, (r, c) in enumerate(_ZIGZAG):
                    nat[r * 8 + c] = vals[k]
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT value table")
                vals = list(body[i + 17 : i + 17 + n])
                i += 17 + n
                tab = _HuffTable(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            if body[0] != 8:
                raise NotImplementedError(f"{body[0]}-bit precision")
            fh, fw = struct.unpack(">HH", body[1:5])
            nf = body[5]
            if len(body) < 6 + 3 * nf:
                raise ValueError("truncated SOF component specs")
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (only baseline and"
                f" progressive Huffman DCT are implemented — the"
                f" documented codec seam)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if progressive:
                # Hand the whole remaining stream (from this SOS on) to
                # the multi-scan decoder — DHT/DQT/DRI between scans
                # are parsed there against the same table state.
                return _decode_progressive(
                    buf, pos, frame, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ns = body[0] if body else 0
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("malformed SOS: component specs cut short")
            scan_tabs = {}
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs[cs] = (tdta >> 4, tdta & 0xF)
            pos = pos + 2 + ln
            return _decode_scan(
                buf, pos, frame, scan_tabs, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos = pos + 2 + ln


def _decode_scan(buf, pos, frame, scan_tabs, qt, huff_dc, huff_ac, dri):
    fw, fh, comps = frame
    if not (1 <= len(comps) <= 3) or len(comps) == 2:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # data units traverse the component's own ceil(w/8) x ceil(h/8)
        # block grid and the frame's declared sampling factors are
        # ignored. Normalizing to 1x1 makes the MCU loop below exactly
        # that grid (one block per MCU, restart counting per data
        # unit), matching _decode_prog_scan's non-interleaved path.
        cid, _, _, tq0 = comps[0]
        comps = [(cid, 1, 1, tq0)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, hs, vs, _ in comps:
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise NotImplementedError(f"sampling factors {hs}x{vs}")
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for _, hs, vs, _ in comps:
        planes.append([0] * (mcux * hs * 8 * mcuy * vs * 8))
    br = _BitReader(buf, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got FF{m:02X}")
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                if cid not in scan_tabs:
                    raise ValueError(f"scan omits component {cid}")
                td, ta = scan_tabs[cid]
                if td not in huff_dc or ta not in huff_ac:
                    raise ValueError("scan references missing Huffman table")
                if tq not in qt:
                    raise ValueError(f"missing quant table {tq}")
                q = qt[tq]
                pw = mcux * hs * 8
                for v in range(vs):
                    for hblk in range(hs):
                        zz = [0] * 64
                        size = huff_dc[td].decode(br)
                        if size > 11:
                            raise ValueError(f"bad DC size {size}")
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_ac[ta].decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        _place_block(
                            planes[ci], pw,
                            (mx * hs + hblk) * 8, (my * vs + v) * 8, zz, q,
                        )
            mcu_count += 1
    return _planes_to_image(planes, comps, fw, fh, hmax, vmax, mcux, mcuy)


def _place_block(plane, pw, bx0, by0, zz, q):
    """Dequantize one zigzag coefficient block, IDCT it, and write the
    level-shifted clamped pixels into the component plane."""
    coef = [0.0] * 64
    for kk, (r_, c_) in enumerate(_ZIGZAG):
        coef[r_ * 8 + c_] = zz[kk] * q[r_ * 8 + c_]
    px = _idct_block(coef)
    for yy in range(8):
        row = (by0 + yy) * pw + bx0
        for xx in range(8):
            val = int(px[yy * 8 + xx] + 128.5)
            plane[row + xx] = 0 if val < 0 else 255 if val > 255 else val


def _planes_to_image(planes, comps, fw, fh, hmax, vmax, mcux, mcuy):
    """Shared decode tail: replication-upsample each component plane to
    full resolution and color-convert (JFIF YCbCr->RGB for 3
    components, pass-through for gray)."""
    nch = len(comps)
    out = bytearray(fw * fh * nch)
    full = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        pw = mcux * hs * 8
        sx = hmax // hs
        sy = vmax // vs
        plane = planes[ci]
        fullp = [0] * (fw * fh)
        for y in range(fh):
            srow = (y // sy) * pw
            frow = y * fw
            for x in range(fw):
                fullp[frow + x] = plane[srow + x // sx]
        full.append(fullp)
    if nch == 1:
        return fw, fh, 1, bytes(full[0])
    yy, cb, cr = full
    for i in range(fw * fh):
        yv, cbv, crv = yy[i], cb[i] - 128, cr[i] - 128
        r = int(yv + 1.402 * crv + 0.5)
        g = int(yv - 0.344136 * cbv - 0.714136 * crv + 0.5)
        b = int(yv + 1.772 * cbv + 0.5)
        out[3 * i] = 0 if r < 0 else 255 if r > 255 else r
        out[3 * i + 1] = 0 if g < 0 else 255 if g > 255 else g
        out[3 * i + 2] = 0 if b < 0 else 255 if b > 255 else b
    return fw, fh, 3, bytes(out)


# --------------------------------------------------------------------------
# Progressive JPEG (SOF2, Huffman) — round 13, second half of the seam
# --------------------------------------------------------------------------
# Spectral selection AND successive approximation, both directions.
# Decode follows T.81 G.2 (the stb_image/libjpeg-proven control flow
# for AC refinement); the encoder mirrors libjpeg's jcphuff scan
# discipline (cross-block EOB runs with buffered correction bits) so
# fixtures exercise every decode branch. The load-bearing test oracle:
# progressive encoding is a LOSSLESS rearrangement of the same
# quantized coefficients, so progressive decode must equal baseline
# decode of the same image BIT FOR BIT (tests/test_jpegcodec.py).


def _comp_block_dims(fw, fh, hs, vs, hmax, vmax):
    """True (non-MCU-padded) block grid of a component — the grid
    non-interleaved scans cover (T.81 A.2.2)."""
    cw = (fw * hs + hmax - 1) // hmax
    ch = (fh * vs + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _decode_progressive(buf, pos, frame, qt, huff_dc, huff_ac, dri):
    fw, fh, comps = frame
    if not (1 <= len(comps) <= 3) or len(comps) == 2:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, hs, vs, _ in comps:
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise NotImplementedError(f"sampling factors {hs}x{vs}")
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # Zigzag-ordered coefficient store, MCU-padded grid per component.
    blocks = []
    for _, hs, vs, _ in comps:
        blocks.append(
            [[0] * 64 for _ in range((mcux * hs) * (mcuy * vs))]
        )
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}

    while True:
        if pos + 2 > len(buf):
            raise ValueError("truncated progressive JPEG: no EOI")
        if buf[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        # T.81 B.1.1.2 fill bytes, same as the baseline marker walk.
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(buf):
            raise ValueError("truncated progressive JPEG segment")
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated progressive JPEG segment body")
        if marker == 0xC4:  # DHT between scans
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT value table")
                vals = list(body[i + 17 : i + 17 + n])
                i += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
            pos += 2 + ln
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (dri,) = struct.unpack(">H", body[:2])
            pos += 2 + ln
        elif marker == 0xDA:
            ns = body[0] if body else 0
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("malformed SOS: component specs cut short")
            scan = []  # (ci, td, ta)
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in cid_to_ci:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((cid_to_ci[cs], tdta >> 4, tdta & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _decode_prog_scan(
                buf, pos + 2 + ln, frame, scan, blocks, huff_dc, huff_ac,
                ss, se, ah, al, dri, hmax, vmax, mcux, mcuy,
            )
        else:  # DQT/APPn/COM between scans
            if marker == 0xDB:
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0xF
                    i += 1
                    if pq == 0:
                        vals = list(body[i : i + 64])
                        if len(vals) != 64:
                            raise ValueError("truncated DQT table")
                        i += 64
                    else:
                        if i + 128 > len(body):
                            raise ValueError("truncated 16-bit DQT table")
                        vals = [
                            struct.unpack(
                                ">H", body[i + 2 * k : i + 2 * k + 2]
                            )[0]
                            for k in range(64)
                        ]
                        i += 128
                    nat = [0] * 64
                    for k, (r, c) in enumerate(_ZIGZAG):
                        nat[r * 8 + c] = vals[k]
                    qt[tq] = nat
            pos += 2 + ln

    # All scans accumulated: dequantize + IDCT + assemble.
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError(f"missing quant table {tq}")
        q = qt[tq]
        bw = mcux * hs
        pw = bw * 8
        plane = [0] * (pw * mcuy * vs * 8)
        for bi, zz in enumerate(blocks[ci]):
            _place_block(plane, pw, (bi % bw) * 8, (bi // bw) * 8, zz, q)
        planes.append(plane)
    return _planes_to_image(planes, comps, fw, fh, hmax, vmax, mcux, mcuy)


def _decode_prog_scan(
    buf, pos, frame, scan, blocks, huff_dc, huff_ac,
    ss, se, ah, al, dri, hmax, vmax, mcux, mcuy,
):
    """Decode one progressive scan's entropy data; returns the stream
    position of the next marker."""
    fw, fh, comps = frame
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not (0 <= al <= 13 and se <= 63 and ss <= se):
        raise ValueError(f"bad scan parameters Ss={ss} Se={se} Al={al}")
    br = _BitReader(buf, pos)
    state = {"eob_run": 0}
    pred = [0] * len(comps)

    def restart(unit_count):
        if dri and unit_count and unit_count % dri == 0:
            m = br.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got FF{m:02X}")
            for i in range(len(pred)):
                pred[i] = 0
            state["eob_run"] = 0

    if ss == 0 and len(scan) > 1:
        # Interleaved DC scan: MCU traversal.
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(n)
                for ci, td, _ in scan:
                    _, hs, vs, _ = comps[ci]
                    bw = mcux * hs
                    for v in range(vs):
                        for hb in range(hs):
                            bi = (my * vs + v) * bw + mx * hs + hb
                            _prog_dc(
                                br, blocks[ci][bi], huff_dc, td, ah, al,
                                pred, ci,
                            )
                n += 1
    else:
        # Non-interleaved scan (single component): true block raster.
        ci, td, ta = scan[0]
        _, hs, vs, _ = comps[ci]
        bw = mcux * hs
        cbw, cbh = _comp_block_dims(fw, fh, hs, vs, hmax, vmax)
        n = 0
        for by in range(cbh):
            for bx in range(cbw):
                restart(n)
                blk = blocks[ci][by * bw + bx]
                if ss == 0:
                    _prog_dc(br, blk, huff_dc, td, ah, al, pred, ci)
                elif ah == 0:
                    _prog_ac_first(br, blk, huff_ac, ta, ss, se, al, state)
                else:
                    _prog_ac_refine(br, blk, huff_ac, ta, ss, se, al, state)
                n += 1
    # Skip to the next marker (pad bits / pending marker).
    if br.marker is not None:
        return br.pos
    p = br.pos
    while p + 1 < len(buf) and not (
        buf[p] == 0xFF and buf[p + 1] != 0x00
    ):
        p += 1
    return p


def _prog_dc(br, blk, huff_dc, td, ah, al, pred, ci):
    if ah == 0:  # first DC scan: point-transformed diffs
        if td not in huff_dc:
            raise ValueError("scan references missing DC Huffman table")
        size = huff_dc[td].decode(br)
        if size > 11:
            raise ValueError(f"bad DC size {size}")
        diff = _extend(br.bits(size), size) if size else 0
        pred[ci] += diff
        blk[0] = pred[ci] << al
    else:  # refinement: one bit per block
        if br.bit():
            blk[0] |= 1 << al


def _prog_ac_first(br, blk, huff_ac, ta, ss, se, al, state):
    if state["eob_run"] > 0:
        state["eob_run"] -= 1
        return
    if ta not in huff_ac:
        raise ValueError("scan references missing AC Huffman table")
    tab = huff_ac[ta]
    k = ss
    while k <= se:
        rs = tab.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                state["eob_run"] = (1 << r) - 1
                if r:
                    state["eob_run"] += br.bits(r)
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1


def _prog_ac_refine(br, blk, huff_ac, ta, ss, se, al, state):
    bit = 1 << al

    def correct(k):
        if br.bit() and not (blk[k] & bit):
            blk[k] += bit if blk[k] > 0 else -bit

    if state["eob_run"] > 0:
        state["eob_run"] -= 1
        for k in range(ss, se + 1):
            if blk[k] != 0:
                correct(k)
        return
    if ta not in huff_ac:
        raise ValueError("scan references missing AC Huffman table")
    tab = huff_ac[ta]
    k = ss
    while k <= se:
        rs = tab.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                state["eob_run"] = (1 << r) - 1
                if r:
                    state["eob_run"] += br.bits(r)
                r = 64  # sweep corrections to band end, place nothing
            coef_val = 0
        elif s == 1:
            coef_val = bit if br.bit() else -bit
        else:
            raise ValueError(f"bad refinement magnitude size {s}")
        while k <= se:
            if blk[k] != 0:
                correct(k)
            else:
                if r == 0:
                    if coef_val:
                        blk[k] = coef_val
                    k += 1
                    break
                r -= 1
            k += 1


def _quantize_block_zz(plane, pw, bx0, by0, q):
    """FDCT + quantize one 8x8 block; returns the 64 zigzag-ordered
    integer coefficients (the shared front half of baseline and
    progressive encoding)."""
    blk = [
        float(plane[(by0 + yy) * pw + bx0 + xx]) - 128.0
        for yy in range(8)
        for xx in range(8)
    ]
    coef = _fdct_block(blk)
    return [int(round(coef[i * 8 + j] / q[i * 8 + j])) for (i, j) in _ZIGZAG]


class _ProgACState:
    """Cross-block AC-scan state (libjpeg jcphuff discipline): the EOB
    run counter plus the refinement correction bits BOUND TO THE RUN
    (run_bits, emitted right after the EOBn symbol — the decoder reads
    them while replaying the run's blocks). The CURRENT block's
    correction bits are a separate buffer owned by the scan loop: they
    are emitted after the next newly-significant coefficient's
    symbol+sign (or join run_bits if the block ends in an EOB)."""

    def __init__(self, bw, ac_tab):
        self.bw = bw
        self.ac = ac_tab
        self.eob_run = 0
        self.run_bits: list[int] = []

    def emit_sym(self, sym):
        c, ln = self.ac.enc[sym]
        self.bw.put(c, ln)

    def emit_bits(self, bits):
        for b in bits:
            self.bw.put(b, 1)

    def flush_eob(self):
        if self.eob_run > 0:
            r = self.eob_run.bit_length() - 1
            self.emit_sym(r << 4)
            if r:
                self.bw.put(self.eob_run - (1 << r), r)
            self.eob_run = 0
        self.emit_bits(self.run_bits)
        self.run_bits = []

    def bump_eob(self, block_bits=()):
        self.eob_run += 1
        self.run_bits.extend(block_bits)
        if self.eob_run == 0x7FFF:
            self.flush_eob()


def _pt_ac(v, al):
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.1 — NOT an arithmetic shift for negatives)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 87,
    subsampling: str = "4:4:4",
    levels: int = 1,
) -> bytes:
    """Encode a PROGRESSIVE (SOF2) JFIF JPEG with a libjpeg-style scan
    script: DC first scan at Al=levels + DC refinements down to 0,
    then per component two spectral-selection AC bands at Al=levels
    and full-band AC refinements stepping Al down to 0 (``levels`` >= 1
    successive-approximation steps). Same quantized coefficients as
    :func:`encode_jpeg` — progressive is a lossless rearrangement, so
    decoding both must give identical pixels (the test oracle)."""
    if not 1 <= levels <= 10:
        raise ValueError(f"levels {levels} outside 1..10")
    comps, qtabs, planes, mcux, mcuy = _encode_setup(
        w, h, pixels, channels, quality, subsampling
    )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # Quantized zigzag coefficients for every (padded-grid) block.
    blocks = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        plane, pw = planes[ci]
        bw_blocks = mcux * hs
        bh_blocks = mcuy * vs
        q = qtabs[tq]
        blocks.append(
            [
                _quantize_block_zz(
                    plane, pw, (bi % bw_blocks) * 8, (bi // bw_blocks) * 8, q
                )
                for bi in range(bw_blocks * bh_blocks)
            ]
        )

    dc_bits, dc_vals, ac_bits, ac_vals = _fixed_huff_tables()
    dc_tab = _HuffTable(dc_bits, dc_vals)
    ac_tab = _HuffTable(ac_bits, ac_vals)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos_header(scan_cids, ss, se, ah, al):
        body = bytes([len(scan_cids)])
        for cid in scan_cids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_first_scan(al):
        bw = _BitWriter()
        pred = [0] * len(comps)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (_, hs, vs, _) in enumerate(comps):
                    bwb = mcux * hs
                    for v in range(vs):
                        for hb in range(hs):
                            blk = blocks[ci][(my * vs + v) * bwb + mx * hs + hb]
                            val = blk[0] >> al  # DC PT is arithmetic shift
                            diff = val - pred[ci]
                            pred[ci] = val
                            size = _mag_category(diff)
                            c, ln = dc_tab.enc[size]
                            bw.put(c, ln)
                            if size:
                                bw.put(
                                    diff if diff > 0
                                    else diff + (1 << size) - 1,
                                    size,
                                )
        return bw.flush()

    def dc_refine_scan(al):
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (_, hs, vs, _) in enumerate(comps):
                    bwb = mcux * hs
                    for v in range(vs):
                        for hb in range(hs):
                            blk = blocks[ci][(my * vs + v) * bwb + mx * hs + hb]
                            bw.put((blk[0] >> al) & 1, 1)
        return bw.flush()

    def ac_first_scan(ci, ss, se, al):
        _, hs, vs, _ = comps[ci]
        bwb = mcux * hs
        cbw, cbh = _comp_block_dims(w, h, hs, vs, hmax, vmax)
        bw = _BitWriter()
        st = _ProgACState(bw, ac_tab)
        for by in range(cbh):
            for bx in range(cbw):
                blk = blocks[ci][by * bwb + bx]
                band = [_pt_ac(blk[k], al) for k in range(ss, se + 1)]
                if not any(band):
                    st.bump_eob()
                    continue
                st.flush_eob()
                last_nz = max(i for i, v in enumerate(band) if v)
                r = 0
                for i in range(last_nz + 1):
                    v = band[i]
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        st.emit_sym(0xF0)  # ZRL
                        r -= 16
                    size = _mag_category(v)
                    st.emit_sym((r << 4) | size)
                    bw.put(v if v > 0 else v + (1 << size) - 1, size)
                    r = 0
                if last_nz < len(band) - 1:
                    st.bump_eob()
        st.flush_eob()
        return bw.flush()

    def ac_refine_scan(ci, ss, se, al):
        _, hs, vs, _ = comps[ci]
        bwb = mcux * hs
        cbw, cbh = _comp_block_dims(w, h, hs, vs, hmax, vmax)
        bw = _BitWriter()
        st = _ProgACState(bw, ac_tab)
        for by in range(cbh):
            for bx in range(cbw):
                blk = blocks[ci][by * bwb + bx]
                absv = [abs(_pt_ac(blk[k], al)) for k in range(ss, se + 1)]
                # Index of the LAST newly-significant coefficient —
                # zero runs beyond it fold into the EOB run instead of
                # costing ZRL symbols.
                eob_idx = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eob_idx = i
                r = 0
                cur_bits: list[int] = []  # this block's corrections
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob_idx:
                        st.flush_eob()
                        st.emit_sym(0xF0)
                        r -= 16
                        st.emit_bits(cur_bits)
                        cur_bits = []
                    if t > 1:
                        # Already-significant history: buffer its
                        # correction bit for the next emission point.
                        cur_bits.append(t & 1)
                        continue
                    # Newly significant (+-1 at this precision).
                    st.flush_eob()
                    st.emit_sym((r << 4) | 1)
                    bw.put(1 if blk[ss + i] > 0 else 0, 1)
                    st.emit_bits(cur_bits)
                    cur_bits = []
                    r = 0
                if r > 0 or cur_bits:
                    st.bump_eob(cur_bits)
        st.flush_eob()
        return bw.flush()

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        zzq = bytes(q[i * 8 + j] for (i, j) in _ZIGZAG)
        out += seg(0xDB, bytes([ti]) + zzq)
    comp_specs = bytearray()
    for cid, hs, vs, tq in comps:
        comp_specs += bytes([cid, (hs << 4) | vs, tq])
    out += seg(
        0xC2,  # SOF2: progressive, Huffman
        bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
        + comp_specs,
    )
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    all_cids = [c[0] for c in comps]
    out += sos_header(all_cids, 0, 0, 0, levels) + dc_first_scan(levels)
    for al in range(levels - 1, -1, -1):
        out += sos_header(all_cids, 0, 0, al + 1, al) + dc_refine_scan(al)
    for ci, (cid, _, _, _) in enumerate(comps):
        out += sos_header([cid], 1, 5, 0, levels) + ac_first_scan(
            ci, 1, 5, levels
        )
        out += sos_header([cid], 6, 63, 0, levels) + ac_first_scan(
            ci, 6, 63, levels
        )
    for al in range(levels - 1, -1, -1):
        for ci, (cid, _, _, _) in enumerate(comps):
            out += sos_header([cid], 1, 63, al + 1, al) + ac_refine_scan(
                ci, 1, 63, al
            )
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# AVI (RIFF) container with MJPEG video — round 13
# --------------------------------------------------------------------------
# The video-modality container walk, made real: AVI is RIFF (the same
# chunk grammar the WAV decoder walks) and Motion-JPEG frames are
# plain JPEG streams — so the full in-repo codec stack decodes a
# video end to end: container walk -> per-frame JPEG decode. The
# scale-relevant operation is frame SAMPLING: the container walk finds
# every frame's byte extent without decoding, so a stride-N sample
# decodes only N-th frames (operators/multimodal.py sample_frames'
# contract). Compressed non-MJPEG codecs (H.264, VP9, ...) remain the
# documented NotImplementedError seam.


def _riff_lists(body: bytes, offset: int = 0):
    """Yield (fourcc, start, end) for each chunk in a RIFF body;
    LIST chunks yield their list-type as fourcc with the inner span."""
    i = offset
    while i + 8 <= len(body):
        cc = body[i : i + 4]
        (ln,) = struct.unpack("<I", body[i + 4 : i + 8])
        if i + 8 + ln > len(body):
            raise ValueError(f"truncated AVI: {cc!r} chunk cut short")
        if cc == b"LIST":
            yield body[i + 8 : i + 12], i + 12, i + 8 + ln
        else:
            yield cc, i + 8, i + 8 + ln
        i += 8 + ln + (ln & 1)


def decode_avi_mjpeg(buf: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse an AVI container with an MJPEG video stream. Returns
    ``(width, height, fps_num, fps_den, frames)`` where ``frames`` are
    the raw per-frame JPEG payloads (NOT decoded — decode is the
    caller's per-frame choice, which is what makes stride sampling
    cheap). Non-MJPEG streams raise NotImplementedError."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = -1
    rate = scale = 0
    handler_ok = False
    frames: list[bytes] = []
    for cc, a, b in _riff_lists(buf, 12):
        if cc == b"hdrl":
            for cc2, a2, b2 in _riff_lists(buf[:b], a):
                if cc2 == b"avih":
                    if b2 - a2 < 40:
                        raise ValueError("malformed avih header")
                    w, h = struct.unpack("<II", buf[a2 + 32 : a2 + 40])
                elif cc2 == b"strl":
                    fcc_type = fcc_handler = b""
                    for cc3, a3, b3 in _riff_lists(buf[:b2], a2):
                        if cc3 == b"strh":
                            fcc_type = buf[a3 : a3 + 4]
                            fcc_handler = buf[a3 + 4 : a3 + 8]
                            scale, rate = struct.unpack(
                                "<II", buf[a3 + 20 : a3 + 28]
                            )
                        elif cc3 == b"strf" and fcc_type == b"vids":
                            compression = buf[a3 + 16 : a3 + 20]
                            if compression not in (b"MJPG", b"mjpg"):
                                raise NotImplementedError(
                                    f"AVI video codec {compression!r}: only"
                                    " MJPEG decodes in-repo — the"
                                    " documented video seam"
                                )
                            handler_ok = True
                    if fcc_type == b"vids" and fcc_handler not in (
                        b"MJPG", b"mjpg", b"\x00\x00\x00\x00"
                    ):
                        raise NotImplementedError(
                            f"AVI video handler {fcc_handler!r}"
                        )
        elif cc == b"movi":
            for cc2, a2, b2 in _riff_lists(buf[:b], a):
                # 00dc/00db: stream-0 compressed/uncompressed frame.
                if cc2 in (b"00dc", b"00db"):
                    frames.append(buf[a2:b2])
    if w < 0:
        raise ValueError("missing avih header")
    if not handler_ok:
        raise ValueError("no MJPEG video stream in AVI")
    return w, h, rate or 25, scale or 1, frames


def encode_avi_mjpeg(
    w: int,
    h: int,
    frames: list[bytes],
    fps_num: int = 25,
    fps_den: int = 1,
) -> bytes:
    """Assemble JPEG frame payloads into a minimal standard AVI
    (RIFF: hdrl(avih, strl(strh 'vids'/'MJPG', strf MJPG
    BITMAPINFOHEADER)), movi(00dc...), idx1)."""

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    us_per_frame = 1_000_000 * fps_den // max(1, fps_num)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, fps_den, fps_num,
                      0, len(frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list start).
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_avi_frames(
    buf: bytes, stride: int
) -> list[tuple[int, int, int, int, bytes]]:
    """Decode every ``stride``-th MJPEG frame of an AVI: the
    container-level frame sampler — only sampled frames pay the JPEG
    decode. Returns [(frame_idx, w, h, channels, pixels)]."""
    if stride < 1:
        raise ValueError(f"stride {stride} < 1")
    _, _, _, _, frames = decode_avi_mjpeg(buf)
    out = []
    for i in range(0, len(frames), stride):
        w, h, c, px = decode_jpeg(frames[i])
        out.append((i, w, h, c, px))
    return out


# --------------------------------------------------------------------------
# MP4 / ISO BMFF container — round 13
# --------------------------------------------------------------------------
# The dominant training-data video container, walked for real: box
# tree (moov/trak/mdia/minf/stbl), sample description (stsd fourcc +
# dimensions), and the sample tables (stsc chunk mapping, stsz sizes,
# stco/co64 chunk offsets, stts timing) reconstructed into absolute
# per-sample byte extents. Extraction is CODEC-AGNOSTIC — samples come
# back as opaque payloads without decoding, which is the point at
# scale: stride-sample first, decode only what survives. 'jpeg'
# sample entries decode end to end via decode_jpeg; compressed codecs
# (avc1/hvc1/vp09, ...) stay the documented NotImplementedError seam
# at DECODE time while extraction still works.

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf"}

# Memory-bomb guard: a corrupt stsz/stts count field must raise, not
# allocate gigabytes (the uniform-size and run-length forms expand
# counts without consuming proportional box bytes).
_MP4_MAX_SAMPLES = 1 << 26


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a span."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        fourcc = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise ValueError("truncated MP4: largesize cut short")
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            body = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError(f"truncated MP4: box {fourcc!r} cut short")
        yield fourcc, body, i + size
        i += size


def _mp4_find(buf, start, end, path):
    """Walk a '/'-separated box path; yields matching (start, end)."""
    head, _, rest = path.partition(b"/")
    for cc, a, b in _mp4_boxes(buf, start, end):
        if cc == head:
            if rest:
                yield from _mp4_find(buf, a, b, rest)
            else:
                yield a, b


def decode_mp4_samples(
    buf: bytes,
) -> tuple[bytes, int, int, int, list[int], list[bytes]]:
    """Parse an ISO BMFF (MP4) video track. Returns
    ``(codec_fourcc, width, height, timescale, sample_deltas,
    samples)`` — sample payloads extracted by the stbl tables, NOT
    decoded (codec-agnostic extraction; decode is per-sample and the
    caller's stride choice). Uses the first video ('vide' handler)
    track; raises ValueError on structural damage."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (missing ftyp)")
    for trak_a, trak_b in _mp4_find(buf, 0, len(buf), b"moov/trak"):
        # Only video tracks (hdlr handler_type == 'vide').
        is_video = False
        for a, b in _mp4_find(buf, trak_a, trak_b, b"mdia/hdlr"):
            if buf[a + 8 : a + 12] == b"vide":
                is_video = True
        if not is_video:
            continue
        timescale = 0
        for a, b in _mp4_find(buf, trak_a, trak_b, b"mdia/mdhd"):
            version = buf[a]
            ts_off = a + (20 if version == 1 else 12)
            if ts_off + 4 > b:
                raise ValueError("truncated MP4: mdhd box")
            timescale = struct.unpack(">I", buf[ts_off : ts_off + 4])[0]
        stbl = None
        for a, b in _mp4_find(buf, trak_a, trak_b, b"mdia/minf/stbl"):
            stbl = (a, b)
        if stbl is None:
            raise ValueError("video trak missing stbl")
        fourcc = b""
        w = h = 0
        sizes: list[int] = []
        chunk_offsets: list[int] = []
        stsc: list[tuple[int, int]] = []  # (first_chunk, samples_per)
        deltas: list[int] = []
        for cc, a, b in _mp4_boxes(buf, *stbl):
            body = buf[a:b]
            if cc == b"stsd":
                if len(body) < 16 + 28:
                    raise ValueError("truncated MP4: stsd entry")
                (n_entries,) = struct.unpack(">I", body[4:8])
                if n_entries < 1:
                    raise ValueError("empty stsd")
                fourcc = body[12:16]
                # VisualSampleEntry: entry box body starts at stsd body
                # offset 16 (4 version/flags + 4 entry_count + 8 entry
                # box header); width/height sit 24 bytes in (6 reserved
                # + 2 data_ref_index + 16 pre_defined/reserved).
                w, h = struct.unpack(">HH", body[16 + 24 : 16 + 28])
            elif cc == b"stsz":
                if len(body) < 12:
                    raise ValueError("truncated MP4: stsz header")
                (uniform, n) = struct.unpack(">II", body[4:12])
                if n > _MP4_MAX_SAMPLES:
                    raise ValueError(f"implausible MP4 stsz count {n}")
                if uniform:
                    sizes = [uniform] * n
                else:
                    if len(body) < 12 + 4 * n:
                        raise ValueError("truncated MP4: stsz size table")
                    sizes = [
                        struct.unpack(">I", body[12 + 4 * k : 16 + 4 * k])[0]
                        for k in range(n)
                    ]
            elif cc in (b"stco", b"co64"):
                if len(body) < 8:
                    raise ValueError(f"truncated MP4: {cc.decode()} header")
                (n,) = struct.unpack(">I", body[4:8])
                width_ = 4 if cc == b"stco" else 8
                if len(body) < 8 + width_ * n:
                    raise ValueError(
                        f"truncated MP4: {cc.decode()} offset table"
                    )
                fmt = ">I" if cc == b"stco" else ">Q"
                chunk_offsets = [
                    struct.unpack(
                        fmt, body[8 + width_ * k : 8 + width_ * (k + 1)]
                    )[0]
                    for k in range(n)
                ]
            elif cc == b"stsc":
                if len(body) < 8:
                    raise ValueError("truncated MP4: stsc header")
                (n,) = struct.unpack(">I", body[4:8])
                if len(body) < 8 + 12 * n:
                    raise ValueError("truncated MP4: stsc run table")
                for k in range(n):
                    first, per, _desc = struct.unpack(
                        ">III", body[8 + 12 * k : 20 + 12 * k]
                    )
                    stsc.append((first, per))
            elif cc == b"stts":
                if len(body) < 8:
                    raise ValueError("truncated MP4: stts header")
                (n,) = struct.unpack(">I", body[4:8])
                if len(body) < 8 + 8 * n:
                    raise ValueError("truncated MP4: stts entry table")
                for k in range(n):
                    cnt, delta = struct.unpack(
                        ">II", body[8 + 8 * k : 16 + 8 * k]
                    )
                    if len(deltas) + cnt > _MP4_MAX_SAMPLES:
                        raise ValueError(
                            f"implausible MP4 stts expansion past "
                            f"{_MP4_MAX_SAMPLES} samples"
                        )
                    deltas.extend([delta] * cnt)
        if not sizes or not chunk_offsets or not stsc:
            raise ValueError("video trak missing sample tables")
        # Expand stsc runs: samples-per-chunk for every chunk. Guard
        # the run-length expansion like stts/stsz — a corrupt
        # first_chunk field must raise, not allocate gigabytes.
        per_chunk = []
        for i, (first, per) in enumerate(stsc):
            last = (
                stsc[i + 1][0] - 1 if i + 1 < len(stsc)
                else len(chunk_offsets)
            )
            n_run = last - first + 1
            if n_run < 0 or len(per_chunk) + n_run > _MP4_MAX_SAMPLES:
                raise ValueError(
                    f"implausible MP4 stsc chunk run {first}..{last}"
                )
            per_chunk.extend([per] * n_run)
        samples = []
        si = 0
        for ci, off in enumerate(chunk_offsets):
            pos = off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= len(sizes):
                    break
                sz = sizes[si]
                if pos + sz > len(buf):
                    raise ValueError("MP4 sample extent past end of file")
                samples.append(buf[pos : pos + sz])
                pos += sz
                si += 1
        if si != len(sizes):
            raise ValueError(
                f"MP4 sample tables inconsistent: placed {si} of "
                f"{len(sizes)} samples"
            )
        return fourcc, w, h, timescale, deltas, samples
    raise ValueError("no video track in MP4")


def sample_mp4_frames(
    buf: bytes, stride: int
) -> list[tuple[int, int, int, int, bytes]]:
    """Stride-sample an MP4's video samples and DECODE the sampled
    ones — only possible for in-repo-decodable sample entries
    ('jpeg'); compressed codecs raise NotImplementedError here while
    :func:`decode_mp4_samples` extraction still works for them."""
    if stride < 1:
        raise ValueError(f"stride {stride} < 1")
    fourcc, w, h, _, _, samples = decode_mp4_samples(buf)
    if fourcc not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"MP4 sample codec {fourcc!r}: extraction works, decode "
            "requires an external library — the documented video seam"
        )
    out = []
    for i in range(0, len(samples), stride):
        fw, fh, c, px = decode_jpeg(samples[i])
        out.append((i, fw, fh, c, px))
    return out


def encode_mp4_jpeg(
    w: int,
    h: int,
    frames: list[bytes],
    timescale: int = 30,
    delta: int = 1,
    chunk_size: int = 3,
) -> bytes:
    """Assemble JPEG frames into a minimal valid ISO BMFF file:
    ftyp + mdat (chunked samples) + moov with real sample tables
    (stsd 'jpeg' VisualSampleEntry, stts, stsc with a non-trivial
    chunking so decoders must expand the run-length mapping, stsz,
    stco). Fixture source for the container walk."""

    def box(cc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + cc + body

    def full(cc: bytes, body: bytes, version=0, flags=0) -> bytes:
        return box(cc, struct.pack(">I", (version << 24) | flags) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    mdat_body_off = len(ftyp) + 8  # absolute offset of first sample

    n = len(frames)
    chunks = [frames[i : i + chunk_size] for i in range(0, n, chunk_size)]
    chunk_offs = []
    pos = mdat_body_off
    for c in chunks:
        chunk_offs.append(pos)
        pos += sum(len(f) for f in c)
    # stsc runs: full chunks share one run; a short tail chunk gets
    # its own so the mapping is a real run-length table.
    stsc_entries = [(1, chunk_size)]
    if chunks and len(chunks[-1]) != chunk_size:
        stsc_entries = (
            [(1, chunk_size), (len(chunks), len(chunks[-1]))]
            if len(chunks) > 1
            else [(1, len(chunks[-1]))]
        )

    stsd_entry = (
        struct.pack(">I", 86 + 8)[0:0]  # (size computed by box())
        + b""
    )
    vse = (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + box(b"jpeg", vse))
    stts = full(b"stts", struct.pack(">II", 1, 0) if n == 0 else
                struct.pack(">I", 1) + struct.pack(">II", n, delta))
    stsc = full(
        b"stsc",
        struct.pack(">I", len(stsc_entries))
        + b"".join(
            struct.pack(">III", first, per, 1)
            for first, per in stsc_entries
        ),
    )
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = full(
        b"stco",
        struct.pack(">I", len(chunk_offs))
        + b"".join(struct.pack(">I", o) for o in chunk_offs),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = full(b"dref", struct.pack(">I", 1) + full(b"url ", b"", flags=1))
    dinf = box(b"dinf", dref)
    vmhd = full(b"vmhd", b"\x00" * 8, flags=1)
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    mdhd = full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta)
        + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, n * delta)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
        flags=7,
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# GIF (87a/89a) — round 13: real LZW, palettes, interlacing, frames
# --------------------------------------------------------------------------
# The remaining ubiquitous legacy raster format in web-scraped
# training corpora. Decode is the real pipeline: header + logical
# screen descriptor, global/local color tables, extension-block walk
# (graphic control parsed, others skipped), variable-width LSB-first
# LZW with dictionary growth to 12 bits and CLEAR handling, and the
# four-pass GIF row interlace. Multi-frame (animated) streams return
# every frame with its placement rect; frame COMPOSITION (disposal
# methods) is deliberately the caller's concern — extraction and
# decode are the per-payload work, composition is pipeline policy.

_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> bytes:
    """GIF LZW: LSB-first variable-width codes, dict growth to 4096,
    CLEAR resets, EOI terminates."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    pos = 0

    def base_dict():
        return {i: bytes([i]) for i in range(clear)}

    table = base_dict()
    width = min_code + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted early")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = base_dict()
            width = min_code + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of sequence")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError(
            f"GIF LZW underrun: {len(out)} of {n_expected} pixels"
        )
    return bytes(out[:n_expected])


def _lzw_encode(data: bytes, min_code: int) -> bytes:
    """Real GIF LZW compression (string-table greedy match), emitting
    CLEAR at dictionary overflow — the inverse contract of
    :func:`_lzw_decode`.

    The code-width schedule is driven by a SIMULATION OF THE DECODER'S
    dictionary count, not the encoder's: the decoder defines one entry
    per received code starting from the SECOND code after a clear, so
    it runs one entry behind — widening on the encoder's own count
    would desync the streams one code early (the classic LZW
    off-by-one; the first draft had it and the round-trip caught it
    immediately)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    en = eoi + 1  # encoder's next table code
    dn = eoi + 1  # decoder's mirrored entry count
    first = True

    def emit(code):
        nonlocal dn, width, first
        put(code)
        if first:
            first = False
        else:
            dn += 1  # the decoder defines an entry on this code
            if dn == (1 << width) and width < 12:
                width += 1

    def do_clear():
        nonlocal table, en, dn, width, first
        put(clear)
        table = {bytes([i]): i for i in range(clear)}
        width = min_code + 1
        en = eoi + 1
        dn = eoi + 1
        first = True

    put(clear)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if en < 4096:
            table[cand] = en
            en += 1
        else:
            do_clear()
        run = bytes([b])
    if run:
        emit(table[run])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(
    buf: bytes,
) -> tuple[int, int, list[tuple[int, int, int, int, bytes, int | None]]]:
    """Decode a GIF87a/89a. Returns ``(screen_w, screen_h, frames)``
    with each frame ``(left, top, w, h, rgb_pixels, transparent_idx)``
    — palette-mapped to interleaved RGB, de-interlaced if flagged.
    ``transparent_idx`` is the graphic-control transparent palette
    index (None when the frame has no transparency); pixels at that
    index come back as the palette color, and the caller decides how
    to composite — surfacing the index instead of silently flattening
    is what keeps downstream phash/dedup aware of transparency."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF: header {buf[:6]!r}")
    if len(buf) < 13:
        raise ValueError("truncated GIF: logical screen descriptor")
    sw, sh = struct.unpack("<HH", buf[6:10])
    packed = buf[10]
    pos = 13
    gct: list[bytes] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(buf):
            raise ValueError("truncated GIF: global color table")
        gct = [buf[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
        pos += 3 * n
    frames = []
    transparent: int | None = None  # pending GCE, applies to next image
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: introducer, label, sub-blocks
            label = buf[pos + 1] if pos + 1 < len(buf) else -1
            pos += 2
            # Graphic Control Extension (89a): transparency flag (bit
            # 0 of the packed byte) + transparent palette index apply
            # to the NEXT image descriptor only.
            if (
                label == 0xF9
                and pos < len(buf)
                and buf[pos] >= 4
                and pos + 4 < len(buf)
            ):
                if buf[pos + 1] & 0x01:
                    transparent = buf[pos + 4]
                else:
                    # The LAST GCE before an image wins: an opaque GCE
                    # clears any pending transparent index.
                    transparent = None
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(buf):
                raise ValueError("truncated GIF: image descriptor")
            left, top, fw, fh = struct.unpack("<HHHH", buf[pos + 1 : pos + 9])
            ip = buf[pos + 9]
            pos += 10
            pal = gct
            if ip & 0x80:  # local color table
                n = 2 << (ip & 0x07)
                if pos + 3 * n > len(buf):
                    raise ValueError("truncated GIF: local color table")
                pal = [buf[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
                pos += 3 * n
            if not pal:
                raise ValueError("GIF image with no color table")
            interlaced = bool(ip & 0x40)
            if pos >= len(buf):
                raise ValueError("truncated GIF: missing LZW code size")
            min_code = buf[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(buf) and buf[pos] != 0:
                ln = buf[pos]
                if pos + 1 + ln > len(buf):
                    raise ValueError("truncated GIF: data sub-block")
                lzw += buf[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(buf):
                raise ValueError("GIF image data unterminated")
            pos += 1  # block terminator
            idx = _lzw_decode(bytes(lzw), min_code, fw * fh)
            if interlaced:
                rows = [idx[r * fw : (r + 1) * fw] for r in range(fh)]
                deint: list[bytes] = [b""] * fh
                ri = 0
                for start, step in _GIF_INTERLACE:
                    for y in range(start, fh, step):
                        deint[y] = rows[ri]
                        ri += 1
                idx = b"".join(deint)
            rgb = bytearray(fw * fh * 3)
            npal = len(pal)
            for i, ci in enumerate(idx):
                if ci >= npal:
                    raise ValueError(f"GIF palette index {ci} out of range")
                rgb[3 * i : 3 * i + 3] = pal[ci]
            frames.append((left, top, fw, fh, bytes(rgb), transparent))
            transparent = None  # GCE scope ends at its image
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
    if not frames:
        raise ValueError("GIF contains no image")
    return sw, sh, frames


def encode_gif(
    w: int,
    h: int,
    frames: list[bytes],
    interlace: bool = False,
    transparent_color: bytes | None = None,
) -> bytes:
    """Encode index-free RGB frames as an animated GIF89a: an adaptive
    per-frame LOCAL 256-color table (first-come palette; raises if a
    frame has more than 256 distinct colors — fixtures control their
    palettes), real LZW compression, optional four-pass interlacing.
    ``transparent_color`` marks that RGB triple's palette index
    transparent in each frame's graphic-control extension (frames not
    containing the color stay opaque). Fixture source for
    :func:`decode_gif`."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no GCT
    for fi, px in enumerate(frames):
        if len(px) != w * h * 3:
            raise ValueError("frame pixel buffer size mismatch")
        palette: dict[bytes, int] = {}
        idx = bytearray()
        for i in range(w * h):
            c = bytes(px[3 * i : 3 * i + 3])
            if c not in palette:
                if len(palette) == 256:
                    raise ValueError("frame exceeds 256 distinct colors")
                palette[c] = len(palette)
            idx.append(palette[c])
        # Color-table size: power of two >= max(2, len(palette)).
        size_exp = max(1, (max(2, len(palette)) - 1).bit_length())
        n = 1 << size_exp
        # graphic control extension (delay 10cs) — exercises the
        # extension walk on decode; carries the transparency flag +
        # index when the frame contains the requested color.
        t_idx = (
            palette.get(transparent_color)
            if transparent_color is not None
            else None
        )
        if t_idx is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 10, 0, t_idx, 0])
        else:
            out += bytes([0x21, 0xF9, 4, 0x00, 10, 0, 0, 0])
        flags = 0x80 | (size_exp - 1)
        if interlace:
            flags |= 0x40
            rows = [bytes(idx[r * w : (r + 1) * w]) for r in range(h)]
            ordered = bytearray()
            for start, step in _GIF_INTERLACE:
                for y in range(start, h, step):
                    ordered += rows[y]
            idx = ordered
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([flags])
        for c, _ in sorted(palette.items(), key=lambda kv: kv[1]):
            out += c
        out += b"\x00" * (3 * (n - len(palette)))
        min_code = max(2, size_exp)
        out += bytes([min_code])
        lzw = _lzw_encode(bytes(idx), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
