"""Round-13 tests for the compressed-audio WAV decoders
(operators/imagecodec.py): G.711 A-law / mu-law and IMA ADPCM — the
"compressed audio" slice of the external-codec seam, now real.

The third opinion here is unusually strong: CPython 3.11 still ships
``audioop`` (an INDEPENDENT C implementation of G.711), so both
companders are checked codeword-for-codeword over the ENTIRE int16
domain — encode — and all 256 codewords — decode. IMA ADPCM is pinned
by encoder/decoder state-mirroring round trips (the encoder feeds its
own reconstruction back, so predictor state cannot drift), step-table
spot values from the published reference table, and block-boundary /
stereo-interleave cases the corpus can't produce.
"""

from __future__ import annotations

import math
import struct
import warnings

import pytest

from mapreduceframework_spark.operators import imagecodec as IC
from mapreduceframework_spark.operators.multimodal import decode_audio  # noqa: F401

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import audioop  # deprecated in 3.11, removed in 3.13 — gate if absent


def _pcm16(vals):
    return b"".join(struct.pack("<h", v) for v in vals)


def _unpack16(buf):
    return [struct.unpack_from("<h", buf, 2 * k)[0] for k in range(len(buf) // 2)]


# ---------------------------------------------------------------------------
# G.711 vs the independent C implementation — exhaustive
# ---------------------------------------------------------------------------


def test_ulaw_encode_matches_audioop_entire_domain():
    mism = [
        s
        for s in range(-32768, 32768)
        if audioop.lin2ulaw(struct.pack("<h", s), 2)[0]
        != IC.linear_to_ulaw(s)
    ]
    assert mism == []


def test_alaw_encode_matches_audioop_entire_domain():
    mism = [
        s
        for s in range(-32768, 32768)
        if audioop.lin2alaw(struct.pack("<h", s), 2)[0]
        != IC.linear_to_alaw(s)
    ]
    assert mism == []


@pytest.mark.parametrize("law,dec,au", [
    ("ulaw", IC.ulaw_to_linear, lambda b: audioop.ulaw2lin(bytes([b]), 2)),
    ("alaw", IC.alaw_to_linear, lambda b: audioop.alaw2lin(bytes([b]), 2)),
])
def test_g711_decode_matches_audioop_all_codewords(law, dec, au):
    for b in range(256):
        assert dec(b) == struct.unpack("<h", au(b))[0], (law, b)


@pytest.mark.parametrize("law,enc,dec", [
    ("ulaw", IC.linear_to_ulaw, IC.ulaw_to_linear),
    ("alaw", IC.linear_to_alaw, IC.alaw_to_linear),
])
def test_g711_codewords_are_fixed_points(law, enc, dec):
    # Each codeword decodes to its quantization representative, which
    # must re-encode to the same codeword — the classic G.711
    # idempotence identity. The single exception is mu-law's negative
    # zero (0x7F): it decodes to 0, which re-encodes as positive zero
    # (0xFF) — audioop violates the identity at exactly the same
    # codeword, so the exception is the format's, not ours.
    for b in range(256):
        if law == "ulaw" and b == 0x7F:
            assert dec(b) == 0 and enc(dec(b)) == 0xFF
            continue
        assert enc(dec(b)) == b, (law, b)


# ---------------------------------------------------------------------------
# G.711 WAV container round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
@pytest.mark.parametrize("channels", [1, 2])
def test_g711_wav_roundtrip(law, channels):
    n = 240
    pcm = _pcm16(
        [int(12000 * math.sin(k / 7.0)) for k in range(n * channels)]
    )
    wav = IC.encode_wav_g711(8000, channels, pcm, law=law)
    rate, ch, frames, out = IC.decode_wav(wav)
    assert (rate, ch, frames) == (8000, channels, n)
    # Logarithmic companding: relative error <= ~1/16 at any magnitude
    # (4-bit mantissa); check against the per-sample bound.
    for a, b in zip(_unpack16(pcm), _unpack16(out)):
        assert abs(a - b) <= max(32, abs(a) // 12), (a, b)


def test_g711_wav_is_half_the_bytes_of_pcm():
    pcm = _pcm16([0] * 1000)
    g = IC.encode_wav_g711(8000, 1, pcm, law="ulaw")
    p = IC.encode_wav(8000, 1, pcm)
    assert len(g) < len(p) * 0.6  # 8-bit codewords vs 16-bit samples


# ---------------------------------------------------------------------------
# IMA ADPCM
# ---------------------------------------------------------------------------


def test_ima_step_table_reference_values():
    # Endpoints and a few interior values of the published table.
    assert IC._IMA_STEP[0] == 7
    assert IC._IMA_STEP[44] == 494
    assert IC._IMA_STEP[88] == 32767
    assert len(IC._IMA_STEP) == 89
    assert IC._IMA_INDEX == (-1, -1, -1, -1, 2, 4, 6, 8) * 2


def test_ima_nibble_decoder_matches_reference_recursion():
    # Independent replay of the reference pseudocode on a fixed nibble
    # sequence (diff = step/8 + bits·step terms, clamp, index walk).
    pred, idx = 0, 0
    seq = [3, 7, 12, 8, 15, 0, 1, 9, 4, 11]
    mine = []
    for n in seq:
        pred, idx = IC._ima_decode_nibble(n, pred, idx)
        mine.append((pred, idx))
    p2, i2 = 0, 0
    want = []
    for n in seq:
        step = IC._IMA_STEP[i2]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        p2 = p2 - diff if n & 8 else p2 + diff
        p2 = max(-32768, min(32767, p2))
        i2 = max(0, min(88, i2 + IC._IMA_INDEX[n]))
        want.append((p2, i2))
    assert mine == want


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_wav_roundtrip_tracks_smooth_signal(channels):
    n = 1200
    vals = []
    for k in range(n):
        for ch in range(channels):
            vals.append(int(9000 * math.sin(k / 20.0 + ch)))
    pcm = _pcm16(vals)
    wav = IC.encode_wav_ima_adpcm(
        16000, channels, pcm, samples_per_block=249
    )
    rate, ch, frames, out = IC.decode_wav(wav)
    assert (rate, ch, frames) == (16000, channels, n)
    a, b = _unpack16(pcm), _unpack16(out)
    # Skip the adaptation ramp (index starts at 0 = tiny steps);
    # steady-state tracking of a slope<=450/sample signal is tight.
    tail_err = [abs(x - y) for x, y in zip(a[64 * channels:], b[64 * channels:])]
    assert max(tail_err) <= 256, max(tail_err)
    assert sum(tail_err) / len(tail_err) <= 64


def test_ima_adpcm_block_boundaries_and_fact_truncation():
    # 100 frames with 1+8k block size 17 -> 6 blocks, last one padded;
    # the fact chunk must truncate decode back to exactly 100 frames.
    n = 100
    pcm = _pcm16([((k * 37) % 200 - 100) * 50 for k in range(n)])
    wav = IC.encode_wav_ima_adpcm(8000, 1, pcm, samples_per_block=17)
    rate, ch, frames, out = IC.decode_wav(wav)
    assert frames == n
    assert len(out) == 2 * n


def test_ima_adpcm_compresses_4x():
    pcm = _pcm16([0] * 4040)
    a = IC.encode_wav_ima_adpcm(8000, 1, pcm, samples_per_block=505)
    p = IC.encode_wav(8000, 1, pcm)
    assert len(a) < len(p) * 0.3  # ~4 bits vs 16 per sample


def test_ima_adpcm_first_sample_is_exact():
    # The block header carries sample 0 verbatim (int16 predictor).
    pcm = _pcm16([-12345] + [0] * 16)
    wav = IC.encode_wav_ima_adpcm(8000, 1, pcm, samples_per_block=17)
    _, _, _, out = IC.decode_wav(wav)
    assert _unpack16(out)[0] == -12345


def test_wav_unknown_format_tag_still_raises_the_seam():
    # Build a fmt tag 0x55 (MP3-in-WAV) header: still the documented
    # NotImplementedError seam.
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(NotImplementedError, match="format tag 85"):
        IC.decode_wav(wav)


def test_ima_adpcm_corrupt_step_index_raises_value_error():
    pcm = _pcm16([0] * 17)
    wav = bytearray(IC.encode_wav_ima_adpcm(8000, 1, pcm, samples_per_block=17))
    k = wav.index(b"data") + 8 + 2  # step-index byte of block 0
    wav[k] = 120  # > 88
    with pytest.raises(ValueError, match="out of range"):
        IC.decode_wav(bytes(wav))


def test_ima_adpcm_stream_fixture_writer_contract():
    """Round-14 raw-nibble fixture writer: header state verbatim, low
    nibble first, fact-counted frames — decoded PCM equals the
    reference recursion replayed from (pred0, index0, nibbles)."""
    nibs = [(i * 5 + 3) % 16 for i in range(16)]
    wav = IC.encode_wav_ima_adpcm_stream(16000, -1234, 37, nibs)
    rate, ch, frames, pcm = IC.decode_wav(wav)
    assert (rate, ch, frames) == (16000, 1, 17)
    samples = _unpack16(pcm)
    assert samples[0] == -1234  # header predictor IS sample 0
    pred, idx = -1234, 37
    for got, n in zip(samples[1:], nibs):
        pred, idx = IC._ima_decode_nibble(n, pred, idx)
        assert got == pred
    # error paths: whole 4-byte words, int16 predictor, 0..88 index
    with pytest.raises(ValueError, match="multiple of 8"):
        IC.encode_wav_ima_adpcm_stream(8000, 0, 0, [0] * 7)
    with pytest.raises(ValueError, match="outside int16"):
        IC.encode_wav_ima_adpcm_stream(8000, 40000, 0, [0] * 8)
    with pytest.raises(ValueError, match="outside 0..88"):
        IC.encode_wav_ima_adpcm_stream(8000, 0, 89, [0] * 8)
