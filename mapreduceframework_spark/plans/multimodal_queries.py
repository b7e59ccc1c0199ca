"""Multimodal-column queries (SURVEY.md section 2.2 ⊕ rows): binary
image/audio/video payloads with typed metadata, decoded by the real
in-repo codecs (operators/imagecodec.py) inside partition-preserving
mapInPandas — Arrow-batched, never per-row Python. Since round 14 the
REGISTERED decode queries exercise the full codec matrix end to end:
sequential + Adam7 + paletted PNG, PPM, baseline + progressive JPEG,
GIF, RLE8 BMP, PackBits TIFF, RLE TGA, 4-bit BMP, JPEG-in-TIFF on the
image side (14 variants: 13 by late round 15, tiff-bilevel in round 16); PCM16, G.711
A-law/mu-law, IMA ADPCM, IEEE float32 WAV on the audio side (5
variants since round 15); MJPEG-AVI and
MP4('jpeg') containers on the video side — every path under a full
DuckDB value-hash oracle. The remaining NotImplementedError seam is
what genuinely needs external libraries: arithmetic-coded JPEG, MPEG
audio, compressed video codecs (H.264/VP9).

Split out of extension_queries.py in round 7 (pure move, zero renames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceframework_spark.plans.registry import query
from mapreduceframework_spark.sources import load_table


# --------------------------------------------------------------------------
# Multimodal columns
# --------------------------------------------------------------------------

# Shared head of the image-codec-matrix oracles: per-doc variant
# selector + decoded dimensions + decoded channel count. Mirrors
# operators/multimodal.py synth_images_matrix (doc_id % 14; JPEG
# variants 2/4/12 grayscale block-solid at (d%3+1)*8 x (d%2+1)*8, the
# rest at the classic (d%13+4) x (d%7+3) — note the WIDTH modulus is
# 13 by coincidence, independent of the 14-way variant selector;
# variant 6 decodes to RGBA via tRNS; the BMP/TIFF palette variants
# 8/9/11 and the TGA variant 10 decode to plain RGB; variant 13 is
# 1-bit bilevel gray); change both together.
_IMG_MATRIX_P_CTE = """p AS (
            SELECT doc_id, doc_id % 14 AS m,
                   CASE WHEN doc_id % 14 IN (2, 4, 12)
                        THEN (doc_id % 3 + 1) * 8
                        ELSE doc_id % 13 + 4 END AS width,
                   CASE WHEN doc_id % 14 IN (2, 4, 12)
                        THEN (doc_id % 2 + 1) * 8
                        ELSE doc_id % 7 + 3 END AS height,
                   CASE WHEN doc_id % 14 IN (2, 4, 12, 13) THEN 1
                        WHEN doc_id % 14 = 6 THEN 4
                        ELSE 3 END AS nch
            FROM documents)"""

_IMG_MATRIX_VARIANT_SQL = """CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'ppm'
                    WHEN 2 THEN 'jpeg-baseline' WHEN 3 THEN 'gif'
                    WHEN 4 THEN 'jpeg-progressive' WHEN 5 THEN 'png-adam7'
                    WHEN 6 THEN 'png-palette' WHEN 7 THEN 'png-palette-sub'
                    WHEN 8 THEN 'bmp-rle8' WHEN 9 THEN 'tiff-packbits'
                    WHEN 10 THEN 'tga-rle' WHEN 11 THEN 'bmp-4bit'
                    WHEN 12 THEN 'tiff-jpeg' ELSE 'tiff-bilevel' END"""

# Decoded pixel-byte lists per variant family: grayscale block-solid
# for the JPEGs (pixel = block value), interleaved RGB fn of the byte
# index for the lossless truecolor codecs, palette-mapped (+tRNS
# alpha for variant 6) for the paletted PNGs. The JPEG list is EXACT
# decode output because a solid block quantizes losslessly at the
# default quality (pinned for all 256 values in
# tests/test_jpegcodec.py).
_IMG_GRAY_PIXELS = """[ (doc_id * 7 + (((i // width) // 8) * (width // 8)
                                   + (i % width) // 8) * 13) % 256
                    for i in range(0, width * height) ]"""
_IMG_RGB_PIXELS = """[ (doc_id * 7 + i * 13) % 256
                    for i in range(0, width * height * 3) ]"""
_IMG_PAL8_PIXELS = """flatten([ [
                      [ (doc_id + ci * 53) % 256,
                        (doc_id * 3 + ci * 31) % 256,
                        (doc_id * 5 + ci * 11) % 256,
                        CASE WHEN ci < 9 THEN (doc_id + ci * 37) % 256
                             ELSE 255 END ]
                      for ci in [ (doc_id * 7 + k * 13) % 17 ] ][1]
                    for k in range(0, width * height) ])"""
_IMG_PAL2_PIXELS = """flatten([ [
                      [ (doc_id + ci * 53) % 256,
                        (doc_id * 3 + ci * 31) % 256,
                        (doc_id * 5 + ci * 11) % 256 ]
                      for ci in [ (doc_id * 7 + k * 13) % 4 ] ][1]
                    for k in range(0, width * height) ])"""
# Variants 8 (BMP RLE8) and 9 (TIFF PackBits ColorMap) share the
# cap-17 index map and decode palette-mapped plain RGB.
_IMG_PAL17_PIXELS = """flatten([ [
                      [ (doc_id + ci * 53) % 256,
                        (doc_id * 3 + ci * 31) % 256,
                        (doc_id * 5 + ci * 11) % 256 ]
                      for ci in [ (doc_id * 7 + k * 13) % 17 ] ][1]
                    for k in range(0, width * height) ])"""

# Variant 11 (4-bit BMP, round 15): cap-11 palette-mapped plain RGB
# (cap fixed 13 -> 11 in round 16 so the k*13 step is coprime to it
# and the fixture is no longer monochrome per doc).
_IMG_PAL11_PIXELS = """flatten([ [
                      [ (doc_id + ci * 53) % 256,
                        (doc_id * 3 + ci * 31) % 256,
                        (doc_id * 5 + ci * 11) % 256 ]
                      for ci in [ (doc_id * 7 + k * 13) % 11 ] ][1]
                    for k in range(0, width * height) ])"""

# Variant 13 (1-bit bilevel TIFF, round 16): photometric 0 maps
# bit 1 -> black -> 0, else white 255; varied 1-2-long runs.
_IMG_BILEVEL_PIXELS = """[ CASE WHEN (doc_id * 7 + k * 13) % 5 < 2
                           THEN 0 ELSE 255 END
                    for k in range(0, width * height) ]"""

# One CASE selecting the decoded byte list per variant — shared by the
# digest (fold) and feature (sum/first) oracles. Variant 10 (TGA RLE
# truecolor) shares the classic RGB byte function with 0/1/3/5.
_IMG_MATRIX_PIXLIST = f"""CASE WHEN m IN (2, 4, 12) THEN {_IMG_GRAY_PIXELS}
                   WHEN m = 6 THEN {_IMG_PAL8_PIXELS}
                   WHEN m = 7 THEN {_IMG_PAL2_PIXELS}
                   WHEN m IN (8, 9) THEN {_IMG_PAL17_PIXELS}
                   WHEN m = 11 THEN {_IMG_PAL11_PIXELS}
                   WHEN m = 13 THEN {_IMG_BILEVEL_PIXELS}
                   ELSE {_IMG_RGB_PIXELS} END"""


@query(
    "multimodal_decode_features",
    bench=True,
    oracle=f"""
        WITH {_IMG_MATRIX_P_CTE}
        SELECT doc_id,
               {_IMG_MATRIX_VARIANT_SQL} AS variant,
               CAST(width * height * nch AS BIGINT) AS byte_len,
               CAST(CASE WHEN m IN (6, 8, 9)
                         THEN (doc_id + ((doc_id * 7) % 17) * 53) % 256
                         WHEN m = 7
                         THEN (doc_id + ((doc_id * 7) % 4) * 53) % 256
                         WHEN m = 11
                         THEN (doc_id + ((doc_id * 7) % 11) * 53) % 256
                         WHEN m = 13
                         THEN CASE WHEN (doc_id * 7) % 5 < 2
                                   THEN 0 ELSE 255 END
                         ELSE (doc_id * 7) % 256 END AS BIGINT)
                   AS first_byte,
               CAST(list_sum({_IMG_MATRIX_PIXLIST}) % 256 AS BIGINT)
                   AS checksum,
               CAST(least(width, 16) AS BIGINT) AS thumb_w
        FROM p
    """,
    tags=("multimodal", "extension", "codec"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction over the FULL image codec matrix
    (round 14 re-point; widened to 14 variants across rounds 15-16 — the
    features are computed on REAL decoded pixel bytes, not the
    fake/v1 byte plumbing): every document's payload is one of
    sequential PNG / PPM / baseline JPEG / GIF / progressive JPEG /
    Adam7 PNG / 8-bit paletted PNG with tRNS (RGBA) / 2-bit paletted
    Adam7 PNG / paletted BI_RLE8 BMP / big-endian PackBits paletted
    TIFF / RLE truecolor TGA / 4-bit paletted BMP (RLE4) /
    JPEG-in-TIFF, decoded through the pure-Python codecs
    in an Arrow-batched mapInPandas stage, emitting per-item byte
    features (decoded length, first pixel byte, byte-sum checksum,
    thumbnail width). Pixels are integer functions of doc_id —
    block-solid grayscale for the lossy JPEGs, which round-trip
    bit-exactly — so the oracle predicts every feature analytically;
    a decode bug in ANY of the fourteen paths breaks the value hash.
    Partition-preserving: synth and decode share the task, no
    shuffle."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    # Parallelize the Python decode stage: one input split would mean
    # one Python worker for the whole corpus.
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.decode_pixel_features(M.synth_images_matrix(docs))


@query(
    "multimodal_image_decode",
    oracle=f"""
        WITH {_IMG_MATRIX_P_CTE}
        SELECT doc_id,
               {_IMG_MATRIX_VARIANT_SQL} AS variant,
               CAST(width AS BIGINT) AS width,
               CAST(height AS BIGINT) AS height,
               CAST(width * height * nch AS BIGINT) AS n_bytes,
               CAST(list_reduce(
                   list_prepend(0, {_IMG_MATRIX_PIXLIST}),
                   (acc, v) -> (acc * 31 + v) % 1000000007
               ) AS BIGINT) AS pix_digest
        FROM p
    """,
    tags=("multimodal", "extension", "codec"),
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode across the full codec matrix, value-checked
    end to end (round 14 re-point; widened to 14 variants across
    rounds 15-16): per doc_id % 14 the payload is a sequential PNG (encoder
    cycles all five scanline filters), a binary PPM, a baseline JPEG
    (marker walk, stream-carried Huffman/quant tables, IDCT), a GIF
    (real LZW, palette), a PROGRESSIVE JPEG (spectral selection +
    successive approximation scans), an Adam7-INTERLACED PNG
    (seven-pass scatter), an 8-bit PALETTED PNG with tRNS
    transparency (PLTE map + RGBA expansion), a 2-bit paletted Adam7
    PNG (MSB-first sub-byte index unpacking), an 8-bit paletted
    BI_RLE8 BMP (run/absolute/EOL/EOB escapes, bottom-up row flip),
    a big-endian PackBits paletted TIFF (IFD walk, multi-strip
    assembly, 16-bit ColorMap high-byte reduction), or an RLE
    truecolor TGA (run + raw packets, bottom-up BGR->RGB) — and the
    engine decodes every payload back through the pure-Python codecs
    in one Arrow-batched mapInPandas stage. The lossy JPEG fixtures
    are grayscale block-solid images, which round-trip BIT-EXACTLY
    (every 8x8 block's only nonzero DCT coefficient is DC; pinned for
    all 256 values in tests/test_jpegcodec.py) — that is what lets
    the DuckDB oracle predict real lossy-codec decode output
    analytically. Any parser bug in any of the fourteen paths breaks
    the value hash. Partition-preserving: synth and decode run in the
    same task, no shuffle."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.decode_images(M.synth_images_matrix(docs))


# IMA ADPCM step/index tables (public reference algorithm, RFC 3551)
# inlined as SQL literals so the oracle replays the decoder recurrence
# independently. Single-element list comprehensions bind s/df/np once
# per fold step (DuckDB lambdas are single expressions); field order
# in the struct literal keeps every a.* read before its own field is
# written (the documented list_reduce partial-update trap).
_IMA_STEP_SQL = (
    "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,60,"
    "66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,307,337,"
    "371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,1411,"
    "1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,"
    "5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,"
    "16818,18500,20350,22385,24623,27086,29794,32767]"
)
_IMA_INDEX_SQL = "[-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8]"

# G.711 expansion formulas (ITU G.711 segment layout) as SQL — the
# decoded int16 folded as uint16. mu-law: u = ~c; A-law: a = c ^ 0x55.
_ULAW_U16_SQL = """[ [ CASE WHEN u >= 128
                 THEN (132 - (((u % 16) * 8 + 132) << ((u // 16) % 8))
                       + 65536) % 65536
                 ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132 END
               for u in [ 255 - c ] ][1]
             for c in [ CASE WHEN (doc_id * 31 + i * 17) % 255 >= 127
                             THEN (doc_id * 31 + i * 17) % 255 + 1
                             ELSE (doc_id * 31 + i * 17) % 255 END ] ][1]"""
_ALAW_U16_SQL = """[ [ CASE WHEN a >= 128 THEN t2 ELSE 65536 - t2 END
               for t2 in [ CASE WHEN (a // 16) % 8 = 0
                                THEN (a % 16) * 16 + 8
                                WHEN (a // 16) % 8 = 1
                                THEN (a % 16) * 16 + 264
                                ELSE ((a % 16) * 16 + 264)
                                     << ((a // 16) % 8 - 1) END ] ][1]
             for a in [ xor((doc_id * 31 + i * 17) % 256, 85) ] ][1]"""


@query(
    "multimodal_audio_decode",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, doc_id % 5 AS m,
                   (doc_id // 4) % 2 + 1 AS ch2,
                   CASE (doc_id // 4) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 22050 ELSE 44100 END AS rate,
                   doc_id % 50 + 10 AS frames2,
                   8 * (doc_id % 5 + 1) AS nn
            FROM documents)
        SELECT doc_id,
               CASE m WHEN 0 THEN 'pcm16' WHEN 1 THEN 'g711-ulaw'
                      WHEN 2 THEN 'g711-alaw' WHEN 3 THEN 'ima-adpcm'
                      ELSE 'float32' END AS variant,
               CAST(rate AS BIGINT) AS sample_rate,
               CAST(CASE WHEN m = 3 THEN 1 ELSE ch2 END AS BIGINT)
                   AS channels,
               CAST(CASE WHEN m = 3 THEN nn + 1 ELSE frames2 END AS BIGINT)
                   AS n_frames,
               CAST(CASE m
                 WHEN 0 THEN list_reduce(list_prepend(0,
                     [ CASE WHEN (doc_id // 5) % 3 = 2
                            THEN (doc_id * 31 + i * 17) % 256 * 256
                            ELSE (doc_id * 31 + i * 17) % 65536 END
                       for i in range(0, frames2 * ch2) ]),
                     (acc, v) -> (acc * 31 + v) % 1000000007)
                 WHEN 4 THEN list_reduce(list_prepend(0,
                     [ (doc_id * 31 + i * 17 + 32768) % 65536
                       for i in range(0, frames2 * ch2) ]),
                     (acc, v) -> (acc * 31 + v) % 1000000007)
                 WHEN 1 THEN list_reduce(list_prepend(0,
                     [ {_ULAW_U16_SQL}
                       for i in range(0, frames2 * ch2) ]),
                     (acc, v) -> (acc * 31 + v) % 1000000007)
                 WHEN 2 THEN list_reduce(list_prepend(0,
                     [ {_ALAW_U16_SQL}
                       for i in range(0, frames2 * ch2) ]),
                     (acc, v) -> (acc * 31 + v) % 1000000007)
                 ELSE list_reduce(
                     list_prepend(
                         {{'p': ((doc_id * 31) % 65536) - 32768,
                           'x': doc_id % 89,
                           'g': ((doc_id * 31) % 65536 - 32768 + 65536)
                                % 65536 }},
                         [ {{'p': (doc_id * 13 + i * 7) % 16,
                             'x': 0, 'g': 0 }}
                           for i in range(0, nn) ]),
                     (a, b) -> [
                       [
                         [ {{'p': np,
                             'x': least(88, greatest(0,
                                  a.x + {_IMA_INDEX_SQL}[b.p + 1])),
                             'g': (a.g * 31 + (np + 65536) % 65536)
                                  % 1000000007 }}
                           for np in [ least(32767, greatest(-32768,
                               CASE WHEN b.p >= 8 THEN a.p - df
                                    ELSE a.p + df END)) ] ][1]
                         for df in [ (s >> 3)
                             + CASE WHEN b.p % 2 = 1 THEN s >> 2
                                    ELSE 0 END
                             + CASE WHEN (b.p // 2) % 2 = 1 THEN s >> 1
                                    ELSE 0 END
                             + CASE WHEN (b.p // 4) % 2 = 1 THEN s
                                    ELSE 0 END ] ][1]
                       for s in [ {_IMA_STEP_SQL}[a.x + 1] ] ][1]
                 ).g
               END AS BIGINT) AS sample_digest
        FROM p
    """,
    tags=("multimodal", "extension", "codec", "audio"),
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode across the full WAV codec matrix,
    value-checked end to end (round 14 re-point; widened to 5
    variants in round 15): per doc_id % 5 the payload is 16-bit PCM
    (with a LIST chunk so fixed-offset parsing fails), G.711 mu-law,
    G.711 A-law, IMA ADPCM, or IEEE FLOAT32 PCM — and the engine
    decodes every payload back through the pure-Python RIFF chunk
    walker (operators/imagecodec.py decode_wav: fmt-tag dispatch,
    G.711 expansion, per-block ADPCM predictor recurrence, float
    -to-int16 conversion) in one Arrow-batched mapInPandas stage. The
    G.711 fixtures draw PCM from the decoder-output lattice (encode
    inverts decode exactly there; mu-law skips codeword 127, the
    negative-zero alias); the pcm16 variant's width knob stores the
    stream at 16, 24 (s << 8, bit-exact), or — round 16 — 8 bits,
    the last with samples drawn from the 256-value decode lattice
    hi << 8 so the unsigned-byte round trip is exact (mirrored by the
    (doc_id // 5) % 3 = 2 oracle arm); the float fixture draws from
    the int16 lattice f = s/32768 (exact in float32, so the round-half-up
    conversion inverts exactly — and its digest formula is offset by
    +32768 from pcm16's, so a float path aliasing the int path breaks
    the hash); the ADPCM fixture carries a synthesized nibble stream
    whose decode the oracle REPLAYS — the full step/index recurrence
    as a DuckDB struct fold with inline tables. Any decode bug in any
    of the five paths breaks the value hash. Partition-preserving, no
    shuffle."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.decode_audio(M.synth_audio_matrix(docs))


@query(
    "multimodal_frame_sample",
    oracle="""
        WITH f AS (
            SELECT doc_id, t.f AS frame_idx,
                   substring(text, (t.f * 16)::INT + 1, 16) AS frame
            FROM documents,
                 unnest(range(0, (strlen(text) + 15) // 16)) AS t(f)
            WHERE t.f % 2 = 0)
        SELECT doc_id, frame_idx,
               strlen(frame)::BIGINT AS frame_bytes,
               (list_sum(list_transform(string_split(frame, ''),
                                        c -> ascii(c))) % 256)::BIGINT
                   AS frame_checksum
        FROM f
    """,
    tags=("multimodal", "extension"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over multimodal payloads: 16-byte 'frames', every
    2nd frame decoded — the 1-to-many (UDTF-shaped) variant of the
    multimodal plumbing, via the same Arrow-batched mapInPandas path
    (operators/multimodal.py sample_frames). Same ASCII-corpus
    equivalence as multimodal_decode_features; a real video sampler
    swaps the checksum for pixel work, the batch shape is identical."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.sample_frames(M.attach_payload(docs))


@query(
    "multimodal_resize",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   [ascii(text[i]) for i in range(1, len(text) + 1)] AS bs
            FROM documents WHERE length(text) >= 8),
        r AS (
            SELECT doc_id,
                   [CAST(floor(
                        list_sum(bs[(j * len(bs)) // 8 + 1
                                    : ((j + 1) * len(bs)) // 8])
                        / (((j + 1) * len(bs)) // 8 - (j * len(bs)) // 8))
                        AS BIGINT)
                    for j in range(0, 8)] AS rv
            FROM b)
        SELECT doc_id, CAST(8 AS BIGINT) AS out_w,
               list_reduce(list_prepend(CAST(0 AS BIGINT), rv),
                           (a, e) -> a * 31 + e) AS resize_digest
        FROM r
    """,
    tags=("extension", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal RESIZE plumbing (the brief's decode / feature-extract
    / resize / frame-sample quartet): block-mean pooling of each binary
    payload to 8 buckets inside the same Arrow-batched mapInPandas seam
    a real PIL/cv2 resize would occupy (operators/multimodal.py
    resize_payloads). All-integer math — byte sums and floor-means —
    so the DuckDB oracle reproduces the resampled values exactly;
    payload bytes are the documents' ASCII codes (guarded by
    tests/test_extensions.py's ASCII invariant)."""
    from mapreduceframework_spark.operators.multimodal import (
        attach_payload,
        resize_payloads,
    )

    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return resize_payloads(attach_payload(docs))


def _banded_pairs_ctes(n_bands: int, key_case_sql: str, hash_cols: list[str]) -> str:
    """bands/cand CTE pair shared by the fingerprint-dedup oracles —
    the SQL mirror of operators/dedup.py::banded_rep_pairs (expects a
    ``reps`` CTE with rep, cnt and ``hash_cols``; ends with
    cand(doc_a, doc_b, {col}_a/_b..., cnt_a, cnt_b))."""
    carry = ", ".join(hash_cols)
    pairs = ", ".join(
        f"a.{c} AS {c}_a, b.{c} AS {c}_b" for c in hash_cols
    )
    return f"""bands AS (
            SELECT rep, {carry}, cnt, b.b AS band_id,
                   {key_case_sql} AS key
            FROM reps, range(0, {n_bands}) b(b)),
        cand AS (
            SELECT DISTINCT a.rep AS doc_a, b.rep AS doc_b,
                   {pairs}, a.cnt AS cnt_a, b.cnt AS cnt_b
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.key = b.key AND a.rep < b.rep)"""


# DuckDB CTE chain reproducing the engine's decode->dHash path
# analytically (dims/grid/gray/arrs/hashes; ends with hashes(doc_id,
# lo, hi)). Shared by multimodal_phash_dedup and the multimodal
# curation capstone so the two oracles cannot drift apart.
PHASH_HASHES_CTES = """dims AS (
            SELECT doc_id, doc_id % 293 AS s, (doc_id // 293) % 5 AS br,
                   (doc_id % 293) % 13 + 4 AS w,
                   (doc_id % 293) % 7 + 3 AS h
            FROM documents),
        grid AS (
            SELECT doc_id, gy.y AS y, gx.x AS x, s, br,
                   ((gy.y * h // 8) * w + (gx.x * w // 9)) AS pi
            FROM dims, range(0, 9) gx(x), range(0, 8) gy(y)),
        gray AS (
            SELECT doc_id, y, x,
                   ((s*7 + (pi*3 + 0)*13 + br) % 256
                    + (s*7 + (pi*3 + 1)*13 + br) % 256
                    + (s*7 + (pi*3 + 2)*13 + br) % 256) // 3 AS g
            FROM grid),
        arrs AS (
            SELECT doc_id, list(g ORDER BY y, x) AS a
            FROM gray GROUP BY doc_id),
        hashes AS (
            SELECT doc_id,
                   list_sum(list_transform(range(32), k ->
                       CASE WHEN a[(k//8)*9 + (k%8) + 2]
                                 > a[(k//8)*9 + (k%8) + 1]
                            THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS lo,
                   list_sum(list_transform(range(32), k ->
                       CASE WHEN a[((k+32)//8)*9 + ((k+32)%8) + 2]
                                 > a[((k+32)//8)*9 + ((k+32)%8) + 1]
                            THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS hi
            FROM arrs)"""


@query(
    "multimodal_phash_dedup",
    bench=True,
    oracle=f"""
        WITH {PHASH_HASHES_CTES},
        reps AS (
            SELECT lo, hi, MIN(doc_id) AS rep, COUNT(*)::BIGINT AS cnt
            FROM hashes GROUP BY lo, hi),
        {_banded_pairs_ctes(4, "CASE b.b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536 WHEN 2 THEN hi % 65536 ELSE hi // 65536 END", ["lo", "hi"])}
        SELECT doc_a, doc_b,
               (bit_count(xor(lo_a, lo_b))
                + bit_count(xor(hi_a, hi_b)))::BIGINT AS hamming,
               cnt_a, cnt_b
        FROM cand
        WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 6
    """,
    tags=("multimodal", "dedup", "extension", "codec"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection end to end: REAL codec decode
    (PNG chunk-walk/inflate/un-filter, PPM tokenizer) -> integer
    grayscale -> 9x8 nearest-neighbor downsample -> 64-bit dHash ->
    exact-duplicate clustering on the hash -> banded (4x16-bit LSH)
    near-dup pair generation between cluster representatives with a
    Hamming <= 6 verify — the image-dedup pipeline a multimodal corpus
    runs, composed from the same shapes dedup_simhash uses for text.

    The seeded synthesis plants real near-dups: every 293rd doc shares
    a base image and a brightness offset (constant add mod 256) leaves
    the difference hash invariant EXCEPT at wrap pixels, so variants
    land a few deterministic bits apart. The oracle predicts both hash
    halves analytically from the pixel function — a bug anywhere in
    decode, grayscale, resize, or bit packing breaks the value hash.

    Scale: decode+hash is partition-preserving mapInPandas (the
    PIL/libvips seam); clustering is one partial-agged groupBy on the
    64-bit key; candidate pairs come ONLY from band-bucket equi-joins
    between cluster representatives (bounded at 4 keys/rep — never
    all-pairs), with the standard LSH caveat that >4-band-spread bit
    flips can miss a pair (both engines apply the identical banding, so
    recall is part of the contract, not noise)."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    hashes = M.dhash_images(M.synth_images_seeded(docs))
    reps = hashes.groupBy("lo", "hi").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("cnt")
    )
    band_keys = F.array(
        F.struct(F.lit(0).alias("band_id"), (F.col("lo") % 65536).alias("key")),
        F.struct(
            F.lit(1).alias("band_id"), F.expr("lo DIV 65536").alias("key")
        ),
        F.struct(F.lit(2).alias("band_id"), (F.col("hi") % 65536).alias("key")),
        F.struct(
            F.lit(3).alias("band_id"), F.expr("hi DIV 65536").alias("key")
        ),
    )
    from mapreduceframework_spark.operators.dedup import banded_rep_pairs

    cand = banded_rep_pairs(reps, band_keys, ["lo", "hi"])
    ham = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return cand.select(
        "doc_a",
        "doc_b",
        ham.cast("long").alias("hamming"),
        "cnt_a",
        "cnt_b",
    ).filter(F.col("hamming") <= 6)


# DuckDB CTE chain reproducing the engine's WAV-decode->fingerprint
# path analytically (p/fps; ends with fps(doc_id, fp)). Shared by
# multimodal_audio_fingerprint and the curation capstone.
AFP_FPS_CTES = """p AS (
            SELECT doc_id, doc_id % 181 AS s, (doc_id // 181) % 4 AS g,
                   (doc_id % 181) % 50 + 10 AS n,
                   (doc_id % 181) % 2 + 1 AS ch
            FROM documents),
        fps AS (
            SELECT doc_id,
                   list_sum(list_transform(range(32), j ->
                       CASE WHEN (s*31 + (((j+1)*n//33)*ch)*4099 + g*1024)
                                     % 65536
                               > (s*31 + ((j*n//33)*ch)*4099 + g*1024) % 65536
                            THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS fp
            FROM p)"""


@query(
    "multimodal_audio_fingerprint",
    oracle=f"""
        WITH {AFP_FPS_CTES},
        reps AS (
            SELECT fp, MIN(doc_id) AS rep, COUNT(*)::BIGINT AS cnt
            FROM fps GROUP BY fp),
        {_banded_pairs_ctes(2, "CASE b.b WHEN 0 THEN fp % 65536 ELSE fp // 65536 END", ["fp"])}
        SELECT doc_a, doc_b,
               bit_count(xor(fp_a, fp_b))::BIGINT AS hamming, cnt_a, cnt_b
        FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 4
    """,
    tags=("multimodal", "dedup", "extension", "codec"),
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection — the WAV analogue of
    multimodal_phash_dedup: REAL RIFF/WAVE decode (chunk walk, PCM16
    frames) -> channel-0 sample stream -> 33 floor-mapped positions ->
    32-bit sign-of-delta fingerprint -> exact clusters on the
    fingerprint -> 2x16-bit banded near-dup pairs between cluster
    representatives with a Hamming <= 4 verify.

    Seeded synthesis plants the near-dups: every 181st doc shares a
    base clip; a gain bias (constant add mod 2^16) leaves the
    delta-sign fingerprint invariant except at wrap samples, putting
    variants a few deterministic bits apart. The oracle predicts the
    fingerprint analytically from the sample function, so decode,
    channel/frame indexing, and bit packing are all value-checked.

    Scale: decode+fingerprint is partition-preserving mapInPandas;
    clustering is one partial-agged groupBy; candidates are band-keyed
    equi-joins between representatives only — the same bounded-fan-out
    discipline as every dedup family member."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    fps = M.fingerprint_audio(M.synth_audio_seeded(docs))
    reps = fps.groupBy("fp").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("cnt")
    )
    band_keys = F.array(
        F.struct(F.lit(0).alias("band_id"), (F.col("fp") % 65536).alias("key")),
        F.struct(
            F.lit(1).alias("band_id"), F.expr("fp DIV 65536").alias("key")
        ),
    )
    from mapreduceframework_spark.operators.dedup import banded_rep_pairs

    cand = banded_rep_pairs(reps, band_keys, ["fp"])
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select(
        "doc_a",
        "doc_b",
        ham.cast("long").alias("hamming"),
        "cnt_a",
        "cnt_b",
    ).filter(F.col("hamming") <= 4)


@query(
    "pipeline_multimodal_curate",
    oracle=None,  # replaced below — needs cross-module CTE imports
    tags=("multimodal", "pipeline", "extension", "codec"),
)
def pipeline_multimodal_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation capstone — one composed plan that does what
    a real multimodal training-data job does per document batch: text
    passes the Gopher rule battery, the image payload decodes through
    the real PNG/PPM codec into a dHash and only the exact-duplicate
    cluster representative survives, the audio payload decodes through
    the real RIFF/WAVE codec into a delta-sign fingerprint and only
    ITS cluster representative survives; the curated manifest is the
    intersection, carrying the dedup keys and copy counts forward for
    downstream near-dup passes.

    Reuses the registered quality_gopher_rules plan and the
    synth/decode/hash operators verbatim (the ann_lsh_recall_report
    discipline: composed queries share the exact artifacts the
    component queries verify, so the capstone cannot drift from its
    parts). Oracle: conjunction of the three analytic CTE chains.

    Scale: two partition-preserving mapInPandas decode stages, two
    O(distinct-hash) groupBys, and doc_id-keyed joins of rep-sized
    tables — the text rules are a zero-shuffle scan; nothing is ever
    corpus x corpus."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.plans.text_queries import (
        quality_gopher_rules,
    )
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    gq = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", "word_count", "keep"
    )
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    preps = (
        M.dhash_images(M.synth_images_seeded(docs))
        .groupBy("lo", "hi")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("img_copies"))
    )
    areps = (
        M.fingerprint_audio(M.synth_audio_seeded(docs))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("aud_copies"))
    )
    return (
        gq.filter(F.col("keep"))
        .select("doc_id", "word_count")
        .join(preps, "doc_id")
        .join(areps, "doc_id")
        .select(
            "doc_id", "word_count", "lo", "hi", "img_copies", "fp",
            "aud_copies",
        )
    )


# The capstone oracle composes the three shared CTE chains; assembled
# after registration because GOPHER_KEEP_CTES lives in text_queries.
def _curate_oracle() -> str:
    from mapreduceframework_spark.plans.text_queries import GOPHER_KEEP_CTES

    return f"""
        WITH {GOPHER_KEEP_CTES},
        {PHASH_HASHES_CTES},
        {AFP_FPS_CTES},
        preps AS (
            SELECT MIN(doc_id) AS doc_id, lo, hi,
                   COUNT(*)::BIGINT AS img_copies
            FROM hashes GROUP BY lo, hi),
        areps AS (
            SELECT MIN(doc_id) AS doc_id, fp,
                   COUNT(*)::BIGINT AS aud_copies
            FROM fps GROUP BY fp)
        SELECT g.doc_id, g.word_count, p.lo, p.hi, p.img_copies,
               a.fp, a.aud_copies
        FROM gkeep g
        JOIN preps p USING (doc_id)
        JOIN areps a USING (doc_id)
        WHERE g.keep
    """


def _install_curate_oracle() -> None:
    from dataclasses import replace

    from mapreduceframework_spark.plans.registry import REGISTRY

    spec = REGISTRY["pipeline_multimodal_curate"]
    REGISTRY["pipeline_multimodal_curate"] = replace(
        spec, oracle=_curate_oracle()
    )


_install_curate_oracle()


@query(
    "multimodal_scene_cuts",
    oracle="""
        WITH f AS (
            SELECT doc_id, t.f AS frame_idx,
                   (list_sum(list_transform(string_split(
                        substring(text, (t.f * 16)::INT + 1, 16), ''),
                        c -> ascii(c))) % 256)::BIGINT AS cks
            FROM documents,
                 unnest(range(0, (strlen(text) + 15) // 16)) AS t(f)),
        lagged AS (
            SELECT doc_id, frame_idx, cks,
                   LAG(cks) OVER (PARTITION BY doc_id
                                  ORDER BY frame_idx) AS prev_cks
            FROM f)
        SELECT doc_id, frame_idx, prev_cks, cks,
               ABS(cks - prev_cks) AS delta
        FROM lagged
        WHERE prev_cks IS NOT NULL AND ABS(cks - prev_cks) > 160
    """,
    tags=("multimodal", "timeseries", "extension"),
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene-cut) detection over a frame stream — the
    video-pipeline op that decides where to cut clips for sampling:
    every frame 'decodes' to a signature (byte checksum standing in
    for a pixel histogram; the mapInPandas seam is where a real
    frame-difference metric plugs in), and a frame whose signature
    jumps more than a threshold from its predecessor marks a cut.

    Composition: reuses the frame sampler verbatim at stride 1, then a
    doc-partitioned LAG window — the same shape a real pipeline runs
    (sample -> per-asset ordered diff -> threshold). All-integer
    signatures, so the threshold compare is exact on both engines.

    Scale: frame expansion is partition-preserving mapInPandas; the
    only shuffle is the per-doc window partition, keyed on the asset —
    never a global ordering."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    frames = M.sample_frames(M.attach_payload(docs), stride=1)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagged = frames.select(
        "doc_id",
        "frame_idx",
        F.col("frame_checksum").alias("cks"),
        F.lag("frame_checksum").over(w).alias("prev_cks"),
    )
    return lagged.filter(
        F.col("prev_cks").isNotNull()
        & (F.abs(F.col("cks") - F.col("prev_cks")) > 160)
    ).select(
        "doc_id",
        "frame_idx",
        "prev_cks",
        "cks",
        F.abs(F.col("cks") - F.col("prev_cks")).alias("delta"),
    )


@query(
    "multimodal_audio_energy",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   doc_id % 50 + 10 AS n_frames,
                   doc_id % 2 + 1 AS channels
            FROM documents),
        s AS (
            SELECT doc_id,
                   unnest(range(0, n_frames * channels)) AS i
            FROM p),
        c AS (
            SELECT doc_id, i, i // 32 AS win_id, i % 32 AS pos,
                   (doc_id * 31 + i * 17) % 65536 - 32768 AS v
            FROM s),
        lagged AS (
            SELECT *, LAG(v) OVER (PARTITION BY doc_id ORDER BY i)
                          AS prev
            FROM c)
        SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(v * v) AS BIGINT) AS energy,
               CAST(SUM(CASE WHEN pos > 0
                              AND (v >= 0) <> (prev >= 0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS crossings
        FROM lagged GROUP BY doc_id, win_id
    """,
    tags=("multimodal", "extension", "codec", "audio"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio DSP features over REALLY-decoded PCM — the
    feature-extraction stage after multimodal_audio_decode: every
    document's RIFF/WAVE payload decodes through the pure-Python chunk
    walker, and each 32-sample window of the centered signed stream
    emits exact-integer ENERGY (sum of squares — the loudness/VAD
    signal) and the in-window ZERO-CROSSING count (the cheap
    pitch/noisiness proxy). PCM samples are integer functions of
    doc_id, so the oracle re-derives every window analytically — the
    decode path, the framing, and the feature math are all inside the
    value hash.

    Scale shape: decode + framing is partition-preserving Arrow
    mapInPandas with ZERO shuffles (windows never straddle payloads,
    and boundary pairs are excluded so windows are independent);
    feature rows stream straight to the sink. The NotImplementedError
    seam for compressed codecs stays explicit in the operator."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.audio_window_features(M.synth_audio(docs))


# --------------------------------------------------------------------------
# Video (round 14): real container walks + stride frame sampling
# --------------------------------------------------------------------------

# Per-frame decoded pixel digest for the block-solid video fixtures:
# 16x8 grayscale, block value v(b) = (doc_id*A + frame*B + b*13) % 256
# with b = x // 8. Mirrors operators/multimodal.py VID_* constants.
def _vid_digest_sql(a: int, b: int) -> str:
    return f"""CAST(list_reduce(list_prepend(0,
                   [ (doc_id * {a} + frame_idx * {b}
                      + ((i % 16) // 8) * 13) % 256
                     for i in range(0, 128) ]),
                   (acc, v) -> (acc * 31 + v) % 1000000007)
               AS BIGINT)"""


@query(
    "video_frame_sample_avi",
    oracle=f"""
        WITH p AS (SELECT doc_id, doc_id % 5 + 2 AS n FROM documents),
        f AS (
            SELECT doc_id, t.f AS frame_idx
            FROM p, unnest(range(0, n)) AS t(f)
            WHERE t.f % 2 = 0)
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
               {_vid_digest_sql(7, 11)} AS pix_digest
        FROM f
    """,
    tags=("multimodal", "extension", "codec", "video"),
)
def video_frame_sample_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling over MJPEG-in-AVI, value-checked end
    to end (round 14): every document gets an actual AVI container
    (RIFF hdrl/movi/idx1, 2..6 frames) whose frames are block-solid
    grayscale JPEGs, and the engine walks the container to per-frame
    byte extents and JPEG-decodes only every 2nd frame
    (operators/imagecodec.py decode_avi_mjpeg + decode_jpeg via
    decode_video_frames) in an Arrow-batched mapInPandas stage. The
    container-level stride is the 100 TB contract: the walk is
    O(container), the decode O(sampled). Block-solid frames round-trip
    bit-exactly, so the oracle predicts each sampled frame's pixel
    fold digest analytically — a bug in the RIFF walk, frame
    indexing, or JPEG decode breaks the value hash.
    Partition-preserving, 1-to-many, no shuffle."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.sample_video_frames(M.synth_videos_avi(docs), stride=2)


@query(
    "video_frame_sample_mp4",
    oracle=f"""
        WITH p AS (SELECT doc_id, doc_id % 7 + 2 AS n FROM documents),
        f AS (
            SELECT doc_id, t.f AS frame_idx
            FROM p, unnest(range(0, n)) AS t(f)
            WHERE t.f % 2 = 0)
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
               {_vid_digest_sql(11, 7)} AS pix_digest
        FROM f
    """,
    tags=("multimodal", "extension", "codec", "video"),
)
def video_frame_sample_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling over MP4/ISO-BMFF, value-checked end
    to end (round 14): every document gets an actual MP4 (ftyp + mdat
    + moov with full sample tables; 2..8 'jpeg' samples chunked
    3-per-stsc-run so the run-length sample-to-chunk mapping must
    really expand), and the engine reconstructs per-sample byte
    extents from stsc/stsz/stco and JPEG-decodes every 2nd sample
    (operators/imagecodec.py decode_mp4_samples via
    decode_video_frames). Extraction is codec-agnostic; decode is
    per-sample — the same stride economics as the AVI row. The oracle
    predicts each sampled frame's pixel digest analytically.
    Partition-preserving, 1-to-many, no shuffle."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    return M.sample_video_frames(M.synth_videos_mp4(docs), stride=2)


@query(
    "video_scene_cuts_mjpeg",
    oracle="""
        WITH p AS (SELECT doc_id, doc_id % 5 + 2 AS n FROM documents),
        f AS (
            SELECT doc_id, t.f AS frame_idx,
                   list_sum([ (doc_id * 7 + t.f * 11
                               + ((i % 16) // 8) * 13) % 256
                              for i in range(0, 128) ]) AS sig
            FROM p, unnest(range(0, n)) AS t(f)),
        lagged AS (
            SELECT doc_id, frame_idx, sig,
                   LAG(sig) OVER (PARTITION BY doc_id
                                  ORDER BY frame_idx) AS prev_sig
            FROM f)
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(prev_sig AS BIGINT) AS prev_sig,
               CAST(sig AS BIGINT) AS sig,
               CAST(ABS(sig - prev_sig) AS BIGINT) AS delta
        FROM lagged
        WHERE prev_sig IS NOT NULL AND ABS(sig - prev_sig) > 3000
    """,
    tags=("multimodal", "timeseries", "extension", "codec", "video"),
)
def video_scene_cuts_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REALLY-decoded MJPEG-AVI frames
    (round 14 — the real-codec sibling of multimodal_scene_cuts): every
    frame of each AVI decodes to an exact-integer signature (sum of
    decoded pixel bytes — the integer skeleton of a frame-difference
    histogram), and a frame whose signature jumps more than 3000 from
    its predecessor marks a cut. With the block-solid fixtures the
    inter-frame step is +11 per block value mod 256, so deltas are
    1408 (no wrap) or >= 14000 (a block value wrapped) — the
    threshold separates them deterministically and the oracle replays
    the arithmetic. Scale: frame decode is partition-preserving
    mapInPandas; the only shuffle is the per-asset window partition —
    never a global ordering."""
    from mapreduceframework_spark.operators import multimodal as M
    from mapreduceframework_spark.sources.registry import ensure_min_partitions

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"), spark)
    sigs = M.video_frame_signatures(M.synth_videos_avi(docs))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagged = sigs.select(
        "doc_id",
        "frame_idx",
        "sig",
        F.lag("sig").over(w).alias("prev_sig"),
    )
    return lagged.filter(
        F.col("prev_sig").isNotNull()
        & (F.abs(F.col("sig") - F.col("prev_sig")) > 3000)
    ).select(
        "doc_id",
        "frame_idx",
        "prev_sig",
        "sig",
        F.abs(F.col("sig") - F.col("prev_sig")).alias("delta"),
    )
