"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's contract for image/audio/video at 100 TB: the payload is an
opaque ``binary`` column (never parsed by Catalyst), metadata travels in
a typed struct next to it, and all per-item decoding runs as
Arrow-batched pandas over ``mapInPandas`` — whole batches of payloads
cross the JVM->Python boundary as Arrow buffers, never row by row.

Decoding is REAL for PNG (stdlib zlib inflate + all five scanline
filters), netpbm PPM/PGM, and — since round 13 — both baseline
sequential AND progressive JPEG (marker walk, stream-carried
Huffman/quant tables, restart markers, spectral-selection +
successive-approximation scans, IDCT, 4:2:0/4:2:2 chroma upsampling)
— plus GIF and Adam7-interlaced PNG — pure-Python codecs in
``operators/imagecodec.py``, no imaging library needed. The
byte-level 'fake/v1' codec remains for payloads that are not images;
what still genuinely needs external libraries (arithmetic-coded
JPEG, MPEG audio, compressed video codecs like H.264/VP9)
raises ``NotImplementedError`` so that seam stays explicit; G.711 and
IMA ADPCM WAVs decode for real through the same ``decode_wav`` entry,
and MJPEG-in-AVI and MP4 'jpeg'-sample video decode end to end
(container walk + per-frame JPEG, ``decode_video_frames``) — all r13.

Scale notes: mapInPandas preserves partitioning (no shuffle); batch size
is bounded by spark.sql.execution.arrow.maxRecordsPerBatch (session.py),
which is the knob that keeps executor Python memory flat when payloads
are megabytes each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len long, first_byte long, checksum long, thumb_w long"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Stand-in multimodal table: UTF-8 bytes of ``text`` as the opaque
    payload plus a typed metadata struct — the real pipeline would read
    (payload, meta) straight from parquet the same way."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("codec"),
            (F.col("n_chars") % 64 + 1).cast("long").alias("width"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, codec: str) -> tuple[int, int, int, bytes]:
    """REAL image decode: returns (width, height, channels, pixels).

    PNG (sequential or Adam7-interlaced; gray / RGB / gray+alpha /
    RGBA / paletted / 16-bit) goes through the full chunk-walk +
    zlib-inflate + un-filter path; PPM/PGM through the netpbm header
    tokenizer + raster slice; baseline AND progressive JPEG (r13)
    through the marker walk + stream-carried Huffman/quant tables +
    IDCT + chroma upsampling; GIF (r13) through the real
    LZW/palette/interlace pipeline; BMP (r14) through the DIB header
    walk (24/32-bit, 1/4/8-bit paletted, RLE4/8); TIFF (r14-r16)
    through the IFD walk (II/MM byte orders, strips/tiles/planar-2,
    PackBits, LZW + Predictor 2, 16-bit samples, JPEG strips and
    tiles incl. shared JPEGTables, gray/RGB(A)/palette); TGA (r14)
    with gray/truecolor/palette and run+raw RLE packets — all
    operators/imagecodec.py, pure Python, no imaging library.
    Arithmetic-coded JPEG, CCITT TIFF, and planar JPEG-in-TIFF raise
    NotImplementedError from inside the decoders — the remaining
    documented codec seams.
    """
    from mapreduceframework_spark.operators import imagecodec as IC

    if codec == "image/png":
        return IC.decode_png(payload)
    if codec in ("image/ppm", "image/pgm"):
        return IC.decode_pnm(payload)
    if codec in ("image/jpeg", "image/jpg"):
        return IC.decode_jpeg(payload)
    if codec in ("image/bmp", "image/x-ms-bmp"):
        return IC.decode_bmp(payload)
    if codec in ("image/tiff", "image/tif"):
        return IC.decode_tiff(payload)
    if codec in ("image/tga", "image/x-tga"):
        return IC.decode_tga(payload)
    if codec == "image/gif":
        # Single-image contract: the FIRST frame (full multi-frame
        # access — and per-frame transparency — is
        # operators.imagecodec.decode_gif).
        _, _, frames = IC.decode_gif(payload)
        left, top, fw, fh, rgb, _transparent = frames[0]
        return fw, fh, 3, rgb
    raise NotImplementedError(f"image codec {codec!r} not supported")


def decode_video_frames(
    payload: bytes, codec: str, stride: int = 1
) -> list[tuple[int, int, int, int, bytes]]:
    """REAL video decode (r13): MJPEG-in-AVI walks the RIFF container
    to every frame's byte extent and JPEG-decodes only every
    ``stride``-th frame — the container-level sampling contract that
    makes frame sampling cheap at 100 TB (the walk is O(container),
    the decode O(sampled)). Returns [(frame_idx, w, h, channels,
    pixels)]. Other video codecs (H.264, VP9, ...) raise
    NotImplementedError — the documented seam."""
    from mapreduceframework_spark.operators import imagecodec as IC

    if codec in ("video/avi-mjpeg", "video/x-motion-jpeg"):
        return IC.sample_avi_frames(payload, stride)
    if codec in ("video/mp4", "video/mp4-jpeg"):
        return IC.sample_mp4_frames(payload, stride)
    raise NotImplementedError(
        f"video codec {codec!r}: requires an external decoder library; "
        "supported here: video/avi-mjpeg, video/mp4 (jpeg samples)"
    )


# The image codecs decode_payload dispatches on — single source for
# both the dispatch and the NotImplementedError capability list, so
# the error message cannot drift from what actually decodes.
IMAGE_CODECS = (
    "image/png", "image/ppm", "image/pgm", "image/jpeg", "image/jpg",
    "image/gif", "image/bmp", "image/x-ms-bmp", "image/tiff",
    "image/tif", "image/tga", "image/x-tga",
)


def decode_payload(payload: bytes, codec: str) -> bytes:
    """Decode seam. Real codecs implemented here: PNG (zlib inflate +
    all five scanline filters, incl. Adam7 interlace), netpbm PPM/PGM,
    baseline AND progressive JPEG, and GIF (r13) return raw
    interleaved pixel bytes; 'fake/v1' passes bytes through. Codecs
    needing external libraries (arithmetic-coded JPEG, MPEG audio,
    H.264/VP9 video) stay explicitly unimplemented; G.711/IMA-ADPCM
    (r13) and IEEE-float (r15) WAVs decode for real via decode_wav."""
    if codec == "fake/v1":
        return payload
    if codec in IMAGE_CODECS:
        return decode_image(payload, codec)[3]
    raise NotImplementedError(
        f"codec {codec!r}: requires an external decoder library not "
        f"present in this container; supported here: fake/v1, "
        f"{', '.join(IMAGE_CODECS)}"
    )


# Deterministic synthetic-image parameters — mirrored literally in the
# multimodal_image_decode oracle SQL; change both together.
IMG_W_MOD, IMG_W_BASE = 13, 4  # width  = doc_id % 13 + 4
IMG_H_MOD, IMG_H_BASE = 7, 3  # height = doc_id % 7 + 3
IMG_PIX_A, IMG_PIX_B = 7, 13  # pixel[i] = (doc_id*7 + i*13) % 256

SYNTH_SCHEMA = "doc_id long, payload binary, meta struct<codec:string>"


def synth_images(docs: DataFrame) -> DataFrame:
    """Encode a real image file per document — PNG for even doc_ids
    (cycling all five scanline filters), binary PPM for odd — with
    dimensions and pixels that are pure integer functions of doc_id, so
    an oracle can predict the decoded output analytically. The encoder
    is test-harness data synthesis; the DECODE side is the product."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = d % IMG_W_MOD + IMG_W_BASE
                h = d % IMG_H_MOD + IMG_H_BASE
                pix = bytes(
                    (d * IMG_PIX_A + i * IMG_PIX_B) % 256
                    for i in range(w * h * 3)
                )
                if d % 2 == 0:
                    payload, codec = IC.encode_png(w, h, pix, 3), "image/png"
                else:
                    payload, codec = IC.encode_ppm(w, h, pix), "image/ppm"
                rows["doc_id"].append(d)
                rows["payload"].append(payload)
                rows["meta"].append({"codec": codec})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH_SCHEMA)


# Codec-matrix synthesis (round 14; widened to %14 across rounds 15-16): one
# registered fixture family that exercises EVERY in-repo image decode
# path — sequential PNG, binary PPM, baseline JPEG, GIF, progressive
# JPEG, Adam7-interlaced PNG, 8-bit paletted PNG with tRNS
# transparency (RGBA out), 2-bit paletted Adam7 PNG (sub-byte index
# unpacking), 8-bit paletted BI_RLE8 BMP (bottom-up), big-endian
# PackBits paletted TIFF (IFD walk + strip assembly + 16-bit
# ColorMap), RLE truecolor TGA (bottom-up BGR), 4-bit paletted BMP
# (RLE4 / sub-byte rows), and new-style JPEG-in-TIFF — chosen per
# doc_id % 14 (r16 adds 1-bit bilevel TIFF). JPEG variants are
# GRAYSCALE BLOCK-SOLID images (every
# 8x8 block one constant value): a solid block's only nonzero DCT
# coefficient is DC and the default-quality DC step keeps the
# reconstruction error under half a level, so baseline AND
# progressive round-trip BIT-EXACTLY (pinned for all 256 values in
# tests/test_jpegcodec.py) — which is what lets a DuckDB oracle
# predict real lossy-codec decode output analytically. Palette
# variants map idx(k) = (d*7 + k*13) % cap through an analytic
# palette (r,g,b) = ((d + c*53), (d*3 + c*31), (d*5 + c*11)) % 256;
# variant 6 carries tRNS alpha (d + c*37) % 256 over the first
# PAL_TRNS entries (the rest opaque, per spec); the BMP/TIFF palette
# variants (8, 9) share the cap-17 index map and decode to plain RGB;
# variant 11 (4-bit BMP) uses the cap-11 map (PAL_CAP_4).
# Constants are mirrored literally in the multimodal_image_decode /
# multimodal_decode_features oracle SQL; change both together.
IMG_MATRIX_VARIANTS = (
    "png", "ppm", "jpeg-baseline", "gif", "jpeg-progressive", "png-adam7",
    "png-palette", "png-palette-sub", "bmp-rle8", "tiff-packbits",
    "tga-rle", "bmp-4bit", "tiff-jpeg", "tiff-bilevel",
)
IMG_MATRIX_MOD = len(IMG_MATRIX_VARIANTS)  # 14 (r16 adds bilevel)
# tiff-bilevel (m=13, round 16): 1-bit scanned-document class.
# bit(k) = [(d*7 + k*13) % 5 < 2] gives varied 1-2-long runs (real
# packing stress, unlike a plain checkerboard); photometric 0 maps
# bit 1 -> black -> gray 0, so g(k) = 0 when the predicate holds,
# else 255. Mirrored literally in the oracle; change both together.
BILEVEL_MOD, BILEVEL_LT = 5, 2
PAL_CAP_4 = 11  # bmp-4bit palette size (sub-byte indices, cap <= 16).
# MUST stay coprime to the shared index step IMG_PIX_B=13: round 16
# fixed the r15 value (13) where k*13 % 13 == 0 made every pixel the
# same palette index — a monochrome fixture whose value hash was blind
# to nibble order, sub-byte packing, and RLE4 absolute-mode bugs.
IMG_JPEG_BW_MOD = 3  # jpeg width  = (d % 3 + 1) * 8   (1..3 block cols)
IMG_JPEG_BH_MOD = 2  # jpeg height = (d % 2 + 1) * 8   (1..2 block rows)
PAL_CAP_8, PAL_CAP_2 = 17, 4  # palette sizes (8-bit / 2-bit depth)
PAL_TRNS = 9  # variant 6: first 9 palette entries carry tRNS alpha


def _pal_rgb(d: int, c: int) -> bytes:
    return bytes(
        ((d + c * 53) % 256, (d * 3 + c * 31) % 256, (d * 5 + c * 11) % 256)
    )

SYNTH2_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<codec:string,variant:string>"
)


def synth_images_matrix(docs: DataFrame) -> DataFrame:
    """Encode one real image file per document across the full codec
    matrix (doc_id % 14): sequential PNG, binary PPM, baseline JPEG,
    GIF, progressive JPEG, Adam7-interlaced PNG, 8-bit paletted PNG
    with tRNS (decodes to RGBA), 2-bit paletted Adam7 PNG (sub-byte
    unpacking), 8-bit paletted BI_RLE8 BMP, big-endian PackBits
    paletted TIFF, RLE truecolor TGA, 4-bit paletted BMP (RLE4 or
    sub-byte rows), new-style JPEG-in-TIFF, 1-bit bilevel TIFF
    (r16). Pixels are integer
    functions of
    doc_id (block-solid grayscale for the lossy JPEGs — see the
    module comment for why that makes them exact), so the decode
    oracle is analytic for every variant."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % IMG_MATRIX_MOD
                variant = IMG_MATRIX_VARIANTS[m]
                if m in (2, 4, 12):  # grayscale block-solid JPEG
                    # (m=12: the same exact-round-trip stream inside
                    # new-style JPEG-in-TIFF strips, 8 rows each —
                    # byte-order knob on the containing IFD)
                    w = (d % IMG_JPEG_BW_MOD + 1) * 8
                    h = (d % IMG_JPEG_BH_MOD + 1) * 8
                    bw = w // 8
                    pix = bytes(
                        (d * IMG_PIX_A + ((y // 8) * bw + x // 8)
                         * IMG_PIX_B) % 256
                        for y in range(h)
                        for x in range(w)
                    )
                    if m == 12:
                        # Layout knobs (oracle-invariant: gray
                        # block-solid JPEG decodes bit-exactly and
                        # the 8x8 tiles align with the blocks):
                        # byte order, shared-JPEGTables abbreviation
                        # (r16), and strip vs tiled chunking (r16).
                        payload = IC.encode_tiff(
                            w, h, pix, channels=1,
                            big_endian=bool((d // 13) % 2),
                            rows_per_strip=8, jpeg=True,
                            jpeg_tables=bool((d // 26) % 2),
                            tiles=(8, 8) if (d // 52) % 2 else None,
                        )
                        codec = "image/tiff"
                    else:
                        enc = (
                            IC.encode_jpeg if m == 2
                            else IC.encode_jpeg_progressive
                        )
                        payload, codec = (
                            enc(w, h, pix, channels=1), "image/jpeg",
                        )
                elif m in (8, 9):  # paletted BMP (RLE8) / TIFF (PackBits)
                    w = d % IMG_W_MOD + IMG_W_BASE
                    h = d % IMG_H_MOD + IMG_H_BASE
                    idx = bytes(
                        (d * IMG_PIX_A + k * IMG_PIX_B) % PAL_CAP_8
                        for k in range(w * h)
                    )
                    # Layout knobs vary per doc but never change the
                    # DECODED bytes, so the oracle is layout-blind
                    # while the driver's value hash walks every path.
                    if m == 8:
                        # Layout knob (r16, oracle-invariant): RLE8
                        # paletted (both origins) or a 32-bit
                        # BI_BITFIELDS file carrying the SAME
                        # palette-mapped RGB directly (width-8 masks
                        # expand identically; mask order alternates).
                        layout = (d // 11) % 3
                        if layout == 2:
                            rgb = b"".join(_pal_rgb(d, ci) for ci in idx)
                            masks = (
                                (0x00FF0000, 0x0000FF00, 0x000000FF)
                                if (d // 33) % 2
                                else (0x000000FF, 0x0000FF00, 0x00FF0000)
                            )
                            payload = IC.encode_bmp(
                                w, h, rgb, bpp=32, bitfields=masks,
                                top_down=bool((d // 66) % 2),
                            )
                        else:
                            payload = IC.encode_bmp(
                                w, h, b"",
                                top_down=bool(layout),
                                palette=[
                                    _pal_rgb(d, c)
                                    for c in range(PAL_CAP_8)
                                ],
                                indices=idx, rle=True,
                            )
                        codec = "image/bmp"
                    else:
                        # 16-bit ColorMap entries: v8 * 257 puts v8 in
                        # the high byte, which is what decode keeps.
                        # Layout knob cycles strip+PackBits / TILED
                        # PackBits / LZW strips (round 16, alternating
                        # Predictor 2) / direct 16-BIT RGB (round 16:
                        # the palette-mapped RGB values stored as
                        # v*257 wide samples, byte order alternating)
                        # — decoded RGB identical through all four,
                        # so the knob is oracle-invariant while the
                        # value hash walks every compression and
                        # sample-width path.
                        layout = (d // 11) % 4
                        if layout == 3:
                            rgb = b"".join(
                                _pal_rgb(d, ci) for ci in idx
                            )
                            # sub-knob (d//88)%2: plain 16-bit vs
                            # Deflate + word-level Predictor 2 —
                            # decoded RGB identical (late r16)
                            wp = bool((d // 88) % 2)
                            payload = IC.encode_tiff(
                                w, h, rgb, channels=3,
                                big_endian=bool((d // 44) % 2),
                                wide16=True,
                                deflate=wp,
                                predictor=2 if wp else 1,
                            )
                        else:
                            payload = IC.encode_tiff(
                                w, h, idx, channels=1, big_endian=True,
                                packbits=layout < 2,
                                tiles=(4, 3) if layout == 1 else None,
                                lzw=layout == 2,
                                predictor=2 if layout == 2
                                and (d // 33) % 2 else 1,
                                colormap=[
                                    tuple(v * 257 for v in _pal_rgb(d, c))
                                    for c in range(256)
                                ],
                            )
                        codec = "image/tiff"
                elif m == 11:  # 4-bit paletted BMP (round 15)
                    # Layout knobs (oracle-invariant): RLE4 vs
                    # uncompressed sub-byte rows, and both origins —
                    # identical decoded RGB either way.
                    w = d % IMG_W_MOD + IMG_W_BASE
                    h = d % IMG_H_MOD + IMG_H_BASE
                    idx = bytes(
                        (d * IMG_PIX_A + k * IMG_PIX_B) % PAL_CAP_4
                        for k in range(w * h)
                    )
                    payload = IC.encode_bmp(
                        w, h, b"", bpp=4,
                        rle=(d // 12) % 2 == 0,
                        top_down=bool((d // 24) % 2),
                        palette=[_pal_rgb(d, c) for c in range(PAL_CAP_4)],
                        indices=idx,
                    )
                    codec = "image/bmp"
                elif m == 13:  # 1-bit bilevel TIFF (round 16)
                    # Layout knobs (oracle-invariant): compression
                    # cycles none/PackBits/LZW/Deflate, byte order
                    # alternates, and half the docs store 8-wide
                    # tiles — decoded gray identical throughout.
                    w = d % IMG_W_MOD + IMG_W_BASE
                    h = d % IMG_H_MOD + IMG_H_BASE
                    bits = bytes(
                        1 if (d * IMG_PIX_A + k * IMG_PIX_B)
                        % BILEVEL_MOD < BILEVEL_LT else 0
                        for k in range(w * h)
                    )
                    comp = (d // 14) % 4
                    payload = IC.encode_tiff(
                        w, h, bits, channels=1, bilevel=True,
                        big_endian=bool((d // 28) % 2),
                        packbits=comp == 1,
                        lzw=comp == 2,
                        deflate=comp == 3,
                        tiles=(8, 4) if (d // 56) % 2 else None,
                        rows_per_strip=3,
                    )
                    codec = "image/tiff"
                elif m == 10:  # RLE truecolor TGA (BGR), varied layout
                    w = d % IMG_W_MOD + IMG_W_BASE
                    h = d % IMG_H_MOD + IMG_H_BASE
                    pix = bytes(
                        (d * IMG_PIX_A + i * IMG_PIX_B) % 256
                        for i in range(w * h * 3)
                    )
                    payload, codec = (
                        IC.encode_tga(
                            w, h, pix, 3, rle=True,
                            top_down=bool((d // 33) % 2),
                            interleave=(d // 11) % 3,
                        ),
                        "image/tga",
                    )
                elif m in (6, 7):  # paletted PNG
                    w = d % IMG_W_MOD + IMG_W_BASE
                    h = d % IMG_H_MOD + IMG_H_BASE
                    cap = PAL_CAP_8 if m == 6 else PAL_CAP_2
                    idx = bytes(
                        (d * IMG_PIX_A + k * IMG_PIX_B) % cap
                        for k in range(w * h)
                    )
                    palette = [_pal_rgb(d, c) for c in range(cap)]
                    if m == 6:
                        payload = IC.encode_png_palette(
                            w, h, idx, palette,
                            trns=bytes(
                                (d + c * 37) % 256 for c in range(PAL_TRNS)
                            ),
                        )
                    else:
                        payload = IC.encode_png_palette(
                            w, h, idx, palette, bit_depth=2, interlace=True
                        )
                    codec = "image/png"
                else:  # lossless RGB variants share the classic pixel fn
                    w = d % IMG_W_MOD + IMG_W_BASE
                    h = d % IMG_H_MOD + IMG_H_BASE
                    pix = bytes(
                        (d * IMG_PIX_A + i * IMG_PIX_B) % 256
                        for i in range(w * h * 3)
                    )
                    if m == 0:
                        payload, codec = (
                            IC.encode_png(w, h, pix, 3), "image/png",
                        )
                    elif m == 1:
                        # Layout knob (oracle-invariant): binary P6 /
                        # ASCII P3 / P7 PAM (r16) / 16-bit P6 (r16,
                        # samples v*257 so the high-byte reduction
                        # returns v exactly) — identical decoded
                        # bytes through all four forms.
                        form = (d // 12) % 4
                        if form == 1:
                            payload = IC.encode_pnm_ascii(
                                w, h, pix, rgb=True
                            )
                        elif form == 2:
                            payload = IC.encode_pam(w, h, pix, 3)
                        elif form == 3:
                            payload = IC.encode_ppm(w, h, pix, wide=True)
                        else:
                            payload = IC.encode_ppm(w, h, pix)
                        codec = "image/ppm"
                    elif m == 3:
                        payload, codec = (
                            IC.encode_gif(w, h, [pix]), "image/gif",
                        )
                    else:  # m == 5
                        payload, codec = (
                            IC.encode_png(w, h, pix, 3, interlace=True),
                            "image/png",
                        )
                rows["doc_id"].append(d)
                rows["payload"].append(payload)
                rows["meta"].append({"codec": codec, "variant": variant})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH2_SCHEMA)


# Audio codec matrix (round 14), doc_id % 4: PCM16, G.711 mu-law,
# G.711 A-law, IMA ADPCM. The G.711 fixtures draw their PCM from the
# decoder-output lattice (pcm = law_to_linear(codeword)), on which
# encode inverts decode EXACTLY (pinned over the full codeword domain
# in tests; mu-law excludes codeword 127 — the negative-zero alias
# that re-encodes as 255). The ADPCM fixture bypasses the encoder
# entirely: the WAV carries a synthesized NIBBLE stream + header
# state, so the decoded PCM is the reference recurrence replayed —
# the oracle SQL mirrors that recurrence (step/index tables inline)
# via a struct-fold. Constants mirrored in the oracle; change both
# together.
AUD_MATRIX_VARIANTS = (
    "pcm16", "g711-ulaw", "g711-alaw", "ima-adpcm", "float32",
)
AUD_MATRIX_MOD = len(AUD_MATRIX_VARIANTS)  # 5 since round 15
# float32 (m=4, round 15): IEEE float PCM drawn from the int16
# lattice f = s/32768 with s = ((d*31 + i*17) % 65536) - 32768, so
# decode's round-half-up conversion returns s exactly and the uint16
# digest word is ((d*31 + i*17) + 32768) % 65536 — deliberately NOT
# the pcm16 formula, so a float path that aliased the int path would
# break the hash.
ADPCM_NIB_MOD = 5  # nibbles = 8 * (d % 5 + 1); frames = nibbles + 1
ADPCM_NIB_A, ADPCM_NIB_B = 13, 7  # nibble[i] = (d*13 + i*7) % 16


def synth_audio_matrix(docs: DataFrame) -> DataFrame:
    """Encode one real RIFF/WAVE per document across the audio codec
    matrix (doc_id % 5): 16-bit PCM, G.711 mu-law, G.711 A-law, IMA
    ADPCM, IEEE float32 PCM — every sample an integer (or exact
    int16-lattice float) function of doc_id so the decode oracle is
    analytic for every variant (see the matrix comment)."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % AUD_MATRIX_MOD
                rate = AUD_RATES[(d // 4) % 4]
                if m == 4:  # IEEE float PCM from the int16 lattice
                    # Layout knobs (oracle-invariant — the lattice is
                    # exact at both widths and the EXTENSIBLE wrapper
                    # never changes decoded values): 32- vs 64-bit per
                    # (d//5)%2, plain vs wrapped fmt per (d//10)%2.
                    frames = d % AUD_N_MOD + AUD_N_BASE
                    ch = (d // 4) % AUD_CH_MOD + 1
                    payload = IC.encode_wav_float(
                        rate,
                        ch,
                        [
                            (((d * AUD_S_A + i * AUD_S_B) % 65536) - 32768)
                            / 32768.0
                            for i in range(frames * ch)
                        ],
                        bits=64 if (d // 5) % 2 else 32,
                        extensible=bool((d // 10) % 2),
                    )
                elif m == 3:  # IMA ADPCM: raw nibble stream, mono
                    nn = 8 * (d % ADPCM_NIB_MOD + 1)
                    payload = IC.encode_wav_ima_adpcm_stream(
                        rate,
                        ((d * AUD_S_A) % 65536) - 32768,
                        d % 89,
                        [
                            (d * ADPCM_NIB_A + i * ADPCM_NIB_B) % 16
                            for i in range(nn)
                        ],
                    )
                else:
                    frames = d % AUD_N_MOD + AUD_N_BASE
                    ch = (d // 4) % AUD_CH_MOD + 1
                    n = frames * ch
                    if m == 0:  # integer PCM, width knob (d//5)%3
                        # sub 0: the classic 16-bit-with-LIST-chunk
                        # file; sub 1: the SAME stream stored as
                        # 24-bit PCM (s << 8 on disk, top two bytes
                        # back on decode — bit-exact, oracle
                        # -invariant); sub 2 (round 16): 8-bit PCM
                        # with samples drawn from the 256-value
                        # decode lattice s = hi << 8 (the G.711
                        # decoder-output-lattice trick), so encode
                        # inverts decode exactly — its samples
                        # DIFFER from sub 0/1, mirrored by the
                        # (doc_id // 5) % 3 = 2 oracle arm. Subs 1/2
                        # alternate the EXTENSIBLE wrapper.
                        sub = (d // 5) % 3
                        if sub == 2:
                            pcm = b"".join(
                                ((((d * AUD_S_A + i * AUD_S_B) % 256)
                                  << 8) & 0xFFFF)
                                .to_bytes(2, "little")
                                for i in range(n)
                            )
                            payload = IC.encode_wav_pcm(
                                rate, ch, pcm, bits=8,
                                extensible=bool((d // 10) % 2),
                            )
                        else:
                            pcm = b"".join(
                                ((d * AUD_S_A + i * AUD_S_B) % 65536)
                                .to_bytes(2, "little")
                                for i in range(n)
                            )
                            if sub == 1:
                                payload = IC.encode_wav_pcm(
                                    rate, ch, pcm, bits=24,
                                    extensible=bool((d // 10) % 2),
                                )
                            else:
                                payload = IC.encode_wav(rate, ch, pcm)
                    else:  # G.711: PCM from the decoder-output lattice
                        if m == 1:
                            cws = [
                                (r + 1 if r >= 127 else r)
                                for r in (
                                    (d * AUD_S_A + i * AUD_S_B) % 255
                                    for i in range(n)
                                )
                            ]
                            vals = [IC.ulaw_to_linear(c) for c in cws]
                            law = "ulaw"
                        else:
                            cws = [
                                (d * AUD_S_A + i * AUD_S_B) % 256
                                for i in range(n)
                            ]
                            vals = [IC.alaw_to_linear(c) for c in cws]
                            law = "alaw"
                        pcm = b"".join(
                            (v & 0xFFFF).to_bytes(2, "little") for v in vals
                        )
                        payload = IC.encode_wav_g711(rate, ch, pcm, law)
                rows["doc_id"].append(d)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {"codec": "audio/wav", "variant": AUD_MATRIX_VARIANTS[m]}
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH2_SCHEMA)


# Deterministic synthetic-audio parameters — mirrored in the
# multimodal_audio_decode oracle SQL; change both together.
AUD_N_MOD, AUD_N_BASE = 50, 10  # frames   = doc_id % 50 + 10
AUD_CH_MOD = 2  # channels = doc_id % 2 + 1
AUD_RATES = (8000, 16000, 22050, 44100)  # rate = RATES[doc_id % 4]
AUD_S_A, AUD_S_B = 31, 17  # sample[i] = (doc_id*31 + i*17) % 65536


def synth_audio(docs: DataFrame) -> DataFrame:
    """Encode a real RIFF/WAVE file per document (16-bit PCM, mono or
    stereo, varying sample rates, with a LIST chunk so the decoder must
    genuinely walk chunks). Samples are integer functions of doc_id so
    the decode oracle is analytic."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = d % AUD_N_MOD + AUD_N_BASE
                ch = d % AUD_CH_MOD + 1
                rate = AUD_RATES[d % 4]
                n_u16 = frames * ch
                samples = b"".join(
                    ((d * AUD_S_A + i * AUD_S_B) % 65536).to_bytes(2, "little")
                    for i in range(n_u16)
                )
                rows["doc_id"].append(d)
                rows["payload"].append(IC.encode_wav(rate, ch, samples))
                rows["meta"].append({"codec": "audio/wav"})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH_SCHEMA)


AUDIO_DECODE_SCHEMA = (
    "doc_id long, variant string, sample_rate long, channels long, "
    "n_frames long, sample_digest long"
)


def decode_audio(with_audio: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: each payload goes through the
    RIFF chunk walker (PCM16 / G.711 A-law+mu-law expansion / IMA
    ADPCM block recurrence, whichever the fmt tag says) and comes back
    as (variant, sample_rate, channels, n_frames, fold digest of the
    decoded PCM stream). Partition-preserving mapInPandas — same seam
    a libsndfile/ffmpeg binding swaps into."""
    from mapreduceframework_spark.operators.imagecodec import (
        decode_wav,
        sample_digest_u16,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "variant": [], "sample_rate": [],
                "channels": [], "n_frames": [], "sample_digest": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "audio/wav":
                    raise NotImplementedError(meta["codec"])
                rate, ch, frames, samples = decode_wav(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["variant"].append(meta.get("variant") or "pcm16")
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_frames"].append(frames)
                out["sample_digest"].append(sample_digest_u16(samples))
            yield pd.DataFrame(out)

    return with_audio.mapInPandas(batches, AUDIO_DECODE_SCHEMA)


IMAGE_DECODE_SCHEMA = (
    "doc_id long, variant string, width long, height long, n_bytes long, "
    "pix_digest long"
)


def decode_images(with_images: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode over (doc_id, payload, meta):
    each payload is parsed by the actual PNG/PPM/JPEG/GIF decoder and
    the decoded dimensions + a pixel-byte fold digest come back as
    typed columns ("variant" names the fixture's codec variant — e.g.
    jpeg-baseline vs jpeg-progressive, which share a MIME type).
    Partition-preserving mapInPandas — the exact seam a C-extension
    codec (PIL/libvips) swaps into at production scale."""
    from mapreduceframework_spark.operators.imagecodec import pixel_digest

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:  # one output frame per Arrow batch: memory stays flat
            out: dict[str, list] = {
                "doc_id": [], "variant": [], "width": [], "height": [],
                "n_bytes": [], "pix_digest": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, ch, pix = decode_image(bytes(payload), meta["codec"])
                out["doc_id"].append(int(doc_id))
                out["variant"].append(
                    meta.get("variant") or meta["codec"].split("/")[1]
                )
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(pix))
                out["pix_digest"].append(pixel_digest(pix))
            yield pd.DataFrame(out)

    return with_images.mapInPandas(batches, IMAGE_DECODE_SCHEMA)


PIXEL_FEATURES_SCHEMA = (
    "doc_id long, variant string, byte_len long, first_byte long, "
    "checksum long, thumb_w long"
)


def decode_pixel_features(with_images: DataFrame) -> DataFrame:
    """Arrow-batched decode + byte-feature extraction over REAL image
    payloads: each payload decodes through the in-repo codec and the
    features are computed on the DECODED pixel bytes (length, first
    pixel byte, byte-sum checksum, thumbnail width) — the
    feature-extract stage of the decode/feature/resize/frame-sample
    quartet, now running on real codec output instead of the fake/v1
    byte plumbing. Partition-preserving mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "variant": [], "byte_len": [],
                "first_byte": [], "checksum": [], "thumb_w": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, ch, pix = decode_image(bytes(payload), meta["codec"])
                out["doc_id"].append(int(doc_id))
                out["variant"].append(
                    meta.get("variant") or meta["codec"].split("/")[1]
                )
                out["byte_len"].append(len(pix))
                out["first_byte"].append(pix[0] if pix else -1)
                out["checksum"].append(int(sum(pix)) % 256)
                out["thumb_w"].append(min(w, 16))
            yield pd.DataFrame(out)

    return with_images.mapInPandas(batches, PIXEL_FEATURES_SCHEMA)


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': per-payload byte features via
    mapInPandas. The pandas function receives an iterator of DataFrames
    (one per Arrow batch) — the exact shape a real image decoder /
    resizer / frame-sampler plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                decode_payload(p, m["codec"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in payloads],
                    "first_byte": [p[0] if len(p) else -1 for p in payloads],
                    "checksum": [int(sum(p)) % 256 for p in payloads],
                    "thumb_w": [
                        min(int(m["width"]), 16) for m in pdf["meta"]
                    ],
                }
            )

    return with_payload.mapInPandas(batches, DECODED_SCHEMA)


# Video-ish frame sampling: payload treated as fixed-size frames, every
# STRIDE-th frame decoded. Constants are mirrored literally in the query
# oracle (plans/extension_queries.py) — change both together.
FRAME_BYTES = 16
FRAME_STRIDE = 2

FRAMES_SCHEMA = (
    "doc_id long, frame_idx long, frame_bytes long, frame_checksum long"
)


def sample_frames(with_payload: DataFrame, stride: int | None = None) -> DataFrame:
    """Frame sampling as 1-to-many mapInPandas: each payload is cut
    into FRAME_BYTES-sized frames and every FRAME_STRIDE-th frame is
    'decoded' (byte checksum stands in for the pixel work). This is
    the table-generating shape a real video sampler plugs into — same
    Arrow batch flow as decode_features, but emitting 0..n rows per
    input; partitioning is preserved, no shuffle."""

    step = FRAME_STRIDE if stride is None else stride

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list[int]] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_checksum": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                data = decode_payload(payload, meta["codec"])
                n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, n_frames, step):
                    fr = data[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["frame_bytes"].append(len(fr))
                    out["frame_checksum"].append(int(sum(fr)) % 256)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(batches, FRAMES_SCHEMA)


# Resize: block-mean pooling of the payload byte stream to a fixed
# OUT_W-bucket thumbnail. Integer arithmetic end to end so the SQL
# oracle reproduces it exactly; a real image resize (PIL/cv2) plugs into
# the same batch loop at the decode_payload seam.
RESIZE_OUT_W = 8

RESIZED_SCHEMA = "doc_id long, out_w long, resize_digest long"


def resize_payloads(with_payload: DataFrame) -> DataFrame:
    """'Resize' each payload to RESIZE_OUT_W block-mean buckets:
    bucket j spans bytes [floor(j*L/W), floor((j+1)*L/W)) and its value
    is the floor-mean of those bytes — the 1-D integer skeleton of area
    resampling. Emits a 31x fold digest of the bucket values (the
    cross-engine array convention). Payloads shorter than one byte per
    bucket are dropped, mirroring the oracle's length filter.
    Partition-preserving mapInPandas, no shuffle; numpy does the block
    sums vectorized per Arrow batch."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = RESIZE_OUT_W
        for pdf in it:
            out: dict[str, list[int]] = {
                "doc_id": [],
                "out_w": [],
                "resize_digest": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                data = decode_payload(payload, meta["codec"])
                length = len(data)
                if length < w:
                    continue
                b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                edges = (np.arange(w + 1) * length) // w
                sums = np.add.reduceat(b, edges[:-1])
                widths = edges[1:] - edges[:-1]
                vals = sums // widths
                digest = 0
                for v in vals:
                    digest = digest * 31 + int(v)
                out["doc_id"].append(int(doc_id))
                out["out_w"].append(w)
                out["resize_digest"].append(digest)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(batches, RESIZED_SCHEMA)


# Seeded near-dup image synthesis + perceptual hash. Constants are
# mirrored in the multimodal_phash_dedup oracle SQL; change both
# together. The seed period makes every 293rd document the SAME base
# image; the brightness term adds a constant (mod 256) to every pixel,
# which a difference hash is invariant to EXCEPT where the addition
# wraps — producing genuine near-duplicates (small, deterministic
# Hamming distances), not just exact copies.
PHASH_SEED_MOD = 293  # base image repeats every 293 docs
PHASH_BRIGHT_MOD = 5  # brightness = (doc_id // 293) % 5
PHASH_GRID_W, PHASH_GRID_H = 9, 8  # dHash samples a 9x8 grid -> 64 bits

PHASH_SCHEMA = "doc_id long, lo long, hi long"


def synth_images_seeded(docs: DataFrame) -> DataFrame:
    """Encode a real image per document from a SEEDED pixel function:
    base pixels depend on doc_id % PHASH_SEED_MOD, plus a small
    brightness offset from doc_id // PHASH_SEED_MOD — so the corpus
    contains deterministic clusters of exact and near duplicate images.
    PNG for even doc_ids, binary PPM for odd (same codec coverage as
    synth_images)."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                s = d % PHASH_SEED_MOD
                br = (d // PHASH_SEED_MOD) % PHASH_BRIGHT_MOD
                w = s % IMG_W_MOD + IMG_W_BASE
                h = s % IMG_H_MOD + IMG_H_BASE
                pix = bytes(
                    (s * IMG_PIX_A + i * IMG_PIX_B + br) % 256
                    for i in range(w * h * 3)
                )
                if d % 2 == 0:
                    payload, codec = IC.encode_png(w, h, pix, 3), "image/png"
                else:
                    payload, codec = IC.encode_ppm(w, h, pix), "image/ppm"
                rows["doc_id"].append(d)
                rows["payload"].append(payload)
                rows["meta"].append({"codec": codec})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH_SCHEMA)


def dhash_images(with_images: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hash (dHash) over decoded images: REAL
    codec decode -> integer grayscale (r+g+b)//3 -> 9x8 nearest-neighbor
    downsample -> 64 adjacent-comparison bits, returned as two unsigned
    32-bit halves in BIGINTs (lo = bits 0..31, hi = bits 32..63) so no
    value ever touches the BIGINT sign bit on either engine.

    Every arithmetic step is integer (floor-division grayscale,
    floor-mapped nearest neighbor, strict > comparison), so an oracle
    that knows the pixel function can predict both halves exactly —
    the decode/hash path has no float anywhere."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gw, gh = PHASH_GRID_W, PHASH_GRID_H
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "lo": [], "hi": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, ch, pix = decode_image(bytes(payload), meta["codec"])
                gray = [
                    [
                        (
                            pix[((y * h // gh) * w + (x * w // gw)) * 3]
                            + pix[((y * h // gh) * w + (x * w // gw)) * 3 + 1]
                            + pix[((y * h // gh) * w + (x * w // gw)) * 3 + 2]
                        )
                        // 3
                        for x in range(gw)
                    ]
                    for y in range(gh)
                ]
                lo = hi = 0
                for k in range(64):
                    y, x = k // 8, k % 8
                    if gray[y][x + 1] > gray[y][x]:
                        if k < 32:
                            lo |= 1 << k
                        else:
                            hi |= 1 << (k - 32)
                out["doc_id"].append(int(doc_id))
                out["lo"].append(lo)
                out["hi"].append(hi)
            yield pd.DataFrame(out)

    return with_images.mapInPandas(batches, PHASH_SCHEMA)


# Seeded near-dup audio synthesis + sign-of-delta fingerprint (the
# audio analogue of the dHash path). Constants mirrored in the
# multimodal_audio_fingerprint oracle SQL; change both together. A
# constant offset (gain bias) added to every PCM sample mod 2^16 leaves
# the delta-sign fingerprint invariant except where the addition wraps
# — deterministic near-duplicates, exactly like the image brightness
# trick.
AFP_SEED_MOD = 181  # base clip repeats every 181 docs
AFP_GAIN_MOD = 4  # gain bias = (doc_id // 181) % 4, scaled by 1024
AFP_S_B = 4099  # per-index sample step — coprime to 2^16, so base
# samples span the full uint16 range and the gain bias actually wraps
AFP_POS = 33  # fingerprint samples 33 positions -> 32 bits

AFP_SCHEMA = "doc_id long, fp long"


def synth_audio_seeded(docs: DataFrame) -> DataFrame:
    """Encode a real RIFF/WAVE clip per document from a SEEDED sample
    function: base samples depend on doc_id % AFP_SEED_MOD, plus a
    small gain bias from doc_id // AFP_SEED_MOD — deterministic
    clusters of exact and near duplicate clips."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                s = d % AFP_SEED_MOD
                g = (d // AFP_SEED_MOD) % AFP_GAIN_MOD
                frames = s % AUD_N_MOD + AUD_N_BASE
                ch = s % AUD_CH_MOD + 1
                rate = AUD_RATES[s % 4]
                n_u16 = frames * ch
                samples = b"".join(
                    ((s * AUD_S_A + i * AFP_S_B + g * 1024) % 65536).to_bytes(
                        2, "little"
                    )
                    for i in range(n_u16)
                )
                rows["doc_id"].append(d)
                rows["payload"].append(IC.encode_wav(rate, ch, samples))
                rows["meta"].append({"codec": "audio/wav"})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH_SCHEMA)


def fingerprint_audio(with_audio: DataFrame) -> DataFrame:
    """Arrow-batched audio fingerprint: REAL RIFF/WAVE decode ->
    channel-0 frame stream -> 33 floor-mapped sample positions -> 32
    adjacent-comparison bits packed into one unsigned 32-bit value in a
    BIGINT. All-integer (uint16 samples, floor index mapping, strict >)
    so an oracle that knows the sample function predicts the value
    exactly."""
    from mapreduceframework_spark.operators.imagecodec import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "fp": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, n_frames, data = decode_wav(bytes(payload))
                # channel-0 uint16 sample of frame f
                def fr(f: int) -> int:
                    k = f * ch * 2
                    return data[k] | (data[k + 1] << 8)

                pos = [j * n_frames // AFP_POS for j in range(AFP_POS)]
                fp = 0
                for j in range(AFP_POS - 1):
                    if fr(pos[j + 1]) > fr(pos[j]):
                        fp |= 1 << j
                out["doc_id"].append(int(doc_id))
                out["fp"].append(fp)
            yield pd.DataFrame(out)

    return with_audio.mapInPandas(batches, AFP_SCHEMA)


# Video fixtures (round 14): per-doc MJPEG-in-AVI and MP4('jpeg')
# containers whose frames are grayscale BLOCK-SOLID JPEGs (16x8 = two
# 8x8 blocks), the same exact-round-trip trick as the image codec
# matrix — so the frame-sample oracle predicts every decoded pixel.
# Constants mirrored in the video_frame_sample_* oracle SQL; change
# both together.
VID_W, VID_H = 16, 8  # two 8x8 blocks per frame (b = x // 8)
VID_AVI_N_MOD = 5  # avi frames = d % 5 + 2
VID_MP4_N_MOD = 7  # mp4 frames = d % 7 + 2 (spans >1 stsc chunk)
VID_AVI_F_A, VID_AVI_F_B = 7, 11  # avi v(b) = (d*7 + f*11 + b*13) % 256
VID_MP4_F_A, VID_MP4_F_B = 11, 7  # mp4 v(b) = (d*11 + f*7 + b*13) % 256
VID_B = 13
VID_STRIDE = 2


def _blocksolid_jpeg_frame(a: int, b_: int, d: int, f: int) -> bytes:
    """One 16x8 grayscale block-solid baseline JPEG frame with block
    value v(b) = (d*a + f*b_ + b*13) % 256."""
    from mapreduceframework_spark.operators import imagecodec as IC

    pix = bytes(
        (d * a + f * b_ + (x // 8) * VID_B) % 256
        for _y in range(VID_H)
        for x in range(VID_W)
    )
    return IC.encode_jpeg(VID_W, VID_H, pix, channels=1)


def synth_videos_avi(docs: DataFrame) -> DataFrame:
    """Assemble a real MJPEG-in-AVI container per document (d % 5 + 2
    frames), each frame a block-solid grayscale JPEG — the oracle
    predicts every sampled frame's pixels analytically."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = [
                    _blocksolid_jpeg_frame(VID_AVI_F_A, VID_AVI_F_B, d, f)
                    for f in range(d % VID_AVI_N_MOD + 2)
                ]
                rows["doc_id"].append(d)
                rows["payload"].append(
                    IC.encode_avi_mjpeg(VID_W, VID_H, frames)
                )
                rows["meta"].append(
                    {"codec": "video/avi-mjpeg", "variant": "avi-mjpeg"}
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH2_SCHEMA)


def synth_videos_mp4(docs: DataFrame) -> DataFrame:
    """Assemble a real MP4/ISO-BMFF container per document (d % 7 + 2
    'jpeg' samples, chunked 3-per-stsc-run so the decoder must expand
    the run-length sample-to-chunk table), each sample a block-solid
    grayscale JPEG."""
    from mapreduceframework_spark.operators import imagecodec as IC

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = [
                    _blocksolid_jpeg_frame(VID_MP4_F_A, VID_MP4_F_B, d, f)
                    for f in range(d % VID_MP4_N_MOD + 2)
                ]
                rows["doc_id"].append(d)
                rows["payload"].append(
                    IC.encode_mp4_jpeg(VID_W, VID_H, frames, chunk_size=3)
                )
                rows["meta"].append(
                    {"codec": "video/mp4", "variant": "mp4-jpeg"}
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(batches, SYNTH2_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "doc_id long, frame_idx long, width long, height long, pix_digest long"
)


def sample_video_frames(
    with_videos: DataFrame, stride: int = VID_STRIDE
) -> DataFrame:
    """Arrow-batched REAL video frame sampling: each payload's
    container (AVI or MP4, per meta.codec) is walked to per-frame byte
    extents and only every ``stride``-th frame pays the JPEG decode —
    the container-level sampling contract that keeps frame sampling
    O(sampled), not O(stored), at 100 TB. Emits one row per SAMPLED
    frame with the decoded dimensions and pixel fold digest.
    Partition-preserving mapInPandas, 1-to-many."""
    from mapreduceframework_spark.operators.imagecodec import pixel_digest

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "width": [], "height": [],
                "pix_digest": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                for f, w, h, _ch, pix in decode_video_frames(
                    bytes(payload), meta["codec"], stride
                ):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["pix_digest"].append(pixel_digest(pix))
            yield pd.DataFrame(out)

    return with_videos.mapInPandas(batches, VIDEO_FRAMES_SCHEMA)


VIDEO_SIGS_SCHEMA = "doc_id long, frame_idx long, sig long"


def video_frame_signatures(with_videos: DataFrame) -> DataFrame:
    """Decode EVERY frame (stride 1) to an exact-integer signature —
    the sum of decoded pixel bytes, the integer skeleton of the frame
    -difference histogram a real shot-boundary detector uses. One row
    per frame; the scene-cut query LAGs these per asset."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "sig": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                for f, _w, _h, _ch, pix in decode_video_frames(
                    bytes(payload), meta["codec"], 1
                ):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["sig"].append(int(sum(pix)))
            yield pd.DataFrame(out)

    return with_videos.mapInPandas(batches, VIDEO_SIGS_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, win_id long, n_samples long, energy long, crossings long"
)

AUDIO_WINDOW = 32  # interleaved samples per feature window


def audio_window_features(with_audio: DataFrame) -> DataFrame:
    """Arrow-batched windowed DSP features over REALLY-decoded PCM:
    each payload decodes through the RIFF chunk walker, the interleaved
    u16 stream centers to signed (s - 32768), and every AUDIO_WINDOW
    -sample window emits exact-integer energy (sum of squares) and the
    in-window zero-crossing count (sign transitions between adjacent
    samples; window-boundary pairs excluded so windows are independent
    — the property that makes the framing embarrassingly parallel).
    Partition-preserving mapInPandas, the same seam a real DSP binding
    (librosa/torchaudio) swaps into."""
    import numpy as np

    from mapreduceframework_spark.operators.imagecodec import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "win_id": [], "n_samples": [],
                "energy": [], "crossings": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["codec"] != "audio/wav":
                    raise NotImplementedError(meta["codec"])
                _, _, _, samples = decode_wav(bytes(payload))
                # samples is the raw little-endian 16-bit PCM stream.
                c = (
                    np.frombuffer(samples, dtype="<u2").astype(np.int64)
                    - 32768
                )
                for w in range(0, len(c), AUDIO_WINDOW):
                    seg = c[w : w + AUDIO_WINDOW]
                    nonneg = seg >= 0
                    out["doc_id"].append(int(doc_id))
                    out["win_id"].append(w // AUDIO_WINDOW)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int((seg * seg).sum()))
                    out["crossings"].append(
                        int((nonneg[1:] != nonneg[:-1]).sum())
                    )
            yield pd.DataFrame(out)

    return with_audio.mapInPandas(batches, AUDIO_WINDOW_SCHEMA)
