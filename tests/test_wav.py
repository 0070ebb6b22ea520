"""WAV/PCM codec tests (operators/wav.py): round trips at every bit
depth, RIFF chunk-walk robustness, truncated tails, and the Spark
audio_pcm_stats_df leg (exact integer statistics, honest NULLs for
non-WAV payloads).

Reference parity note: the reference engine (duzun/hQuery.php) sniffs
content types before parsing (hQuery.php:136-226) but has no audio
codec — this is beyond-reference multimodal surface under the same
fault-tolerance doctrine (decode what you can, NULL what you cannot).
"""

import struct

import numpy as np
import pytest

from hquery_php_spark.operators.wav import decode_wav, encode_wav, wav_meta
from hquery_php_spark.operators.multimodal import sniff_media_type


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-wav-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2, 3])
def test_roundtrip_exact(bits, ch):
    rng = np.random.RandomState(bits * 10 + ch)
    lo, hi = (-128, 127) if bits == 8 else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    s = rng.randint(lo, hi + 1, size=(97, ch)).astype(np.int64)
    rate, dec = decode_wav(encode_wav(s, 44100, bits))
    assert rate == 44100
    assert dec.shape == (97, ch)
    assert (dec == s).all()


def test_mono_1d_input_and_meta():
    s = np.arange(-16, 17)
    p = encode_wav(s, 8000, 16)
    assert sniff_media_type(p) == "audio/wav"
    assert wav_meta(p) == (8000, 1, 16, 33)
    _, dec = decode_wav(p)
    assert (dec[:, 0] == s).all()


def test_odd_byte_body_is_word_padded():
    # 33 8-bit mono samples → odd data chunk; RIFF pads to word boundary
    p = encode_wav(np.zeros(33, np.int64), 8000, 8)
    assert len(p) % 2 == 0
    _, dec = decode_wav(p)
    assert dec.shape == (33, 1)


def test_extra_chunks_are_skipped():
    s = np.array([[5, -5], [100, -100]], np.int64)
    p = bytearray(encode_wav(s, 16000, 16))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    p2 = bytes(p[:fmt_end]) + extra + bytes(p[fmt_end:])
    p2 = b"RIFF" + struct.pack("<I", len(p2) - 8) + p2[8:]
    rate, dec = decode_wav(p2)
    assert rate == 16000 and (dec == s).all()


def test_truncated_tail_frame_dropped():
    s = np.arange(10)[:, None].astype(np.int64)
    p = encode_wav(s, 8000, 16)
    rate, dec = decode_wav(p[:-1])  # half a sample missing
    assert dec.shape == (9, 1)
    assert (dec[:, 0] == np.arange(9)).all()


def test_rejections():
    assert decode_wav(None) is None
    assert decode_wav(b"") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    assert decode_wav(b"\x89PNG\r\n\x1a\nrest") is None
    # non-PCM format tag (3 = IEEE float) rejected, not crashed
    p = bytearray(encode_wav(np.zeros(4, np.int64), 8000, 16))
    p[20] = 3
    assert decode_wav(bytes(p)) is None
    # unsupported bit depth
    p = bytearray(encode_wav(np.zeros(4, np.int64), 8000, 16))
    p[34] = 12
    assert decode_wav(bytes(p)) is None


def test_24bit_sign_extension_boundaries():
    s = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [0], [1]], np.int64)
    _, dec = decode_wav(encode_wav(s, 8000, 24))
    assert (dec == s).all()


def test_audio_pcm_stats_df_exact_and_null(spark):
    from hquery_php_spark.operators.multimodal import audio_pcm_stats_df

    s = np.array([[10, -20], [30, -40], [-50, 60]], np.int64)
    rows = [
        ("w1", bytearray(encode_wav(s, 22050, 16))),
        ("junk", bytearray(b"OggSnot-really-audio")),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r for r in audio_pcm_stats_df(df).collect()}
    r = got["w1"]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (22050, 2, 3)
    assert r.sum_val == int(s.sum())
    assert r.sum_abs == int(np.abs(s).sum())
    assert r.sum_sq == int((s * s).sum())
    assert r.peak == 60
    assert got["junk"].mime == "audio/ogg"
    assert got["junk"].sum_val is None  # honest NULL, no codec lib
    assert got["none"].mime is None


# ---------------------------------------------------------------- G.711

def test_g711_canonical_values():
    """Pin the CCITT reference expansion at its published anchor
    points: both zero codes, full-scale ±32124 (µ) / ±32256 (A), and
    the A-law ±8 minimum magnitude."""
    from hquery_php_spark.operators.wav import alaw_to_linear, ulaw_to_linear

    assert ulaw_to_linear([0xFF, 0x7F]).tolist() == [0, 0]
    assert ulaw_to_linear([0x00, 0x80]).tolist() == [-32124, 32124]
    assert alaw_to_linear([0x55, 0xD5]).tolist() == [-8, 8]
    assert alaw_to_linear([0x2A, 0xAA]).tolist() == [-32256, -32256 * -1]


def test_g711_symmetry_and_monotone():
    """Each law is odd-symmetric (sign bit flips the value) and
    magnitude-monotone within the positive half."""
    from hquery_php_spark.operators.wav import alaw_to_linear, ulaw_to_linear

    codes = np.arange(128, dtype=np.uint8)
    u_neg, u_pos = ulaw_to_linear(codes), ulaw_to_linear(codes + 128)
    assert (u_neg == -u_pos).all()
    # µ-law positive half decodes descending as the code grows
    assert (np.diff(u_pos) <= 0).all()
    a = alaw_to_linear(np.arange(256, dtype=np.uint8))
    flip = alaw_to_linear((np.arange(256) ^ 0x80).astype(np.uint8))
    assert (a == -flip).all()


@pytest.mark.parametrize("law,tag", [("u", 7), ("a", 6)])
def test_g711_wav_roundtrip(law, tag):
    from hquery_php_spark.operators.wav import (
        alaw_to_linear,
        encode_wav_g711,
        ulaw_to_linear,
    )

    codes = (np.arange(300, dtype=np.int64) * 37 % 256).astype(np.uint8)
    codes = codes.reshape(-1, 2)
    w = encode_wav_g711(codes, 8000, law)
    assert struct.unpack_from("<H", w, 20)[0] == tag
    assert sniff_media_type(w) == "audio/wav"
    rate, s = decode_wav(w)
    table = ulaw_to_linear if law == "u" else alaw_to_linear
    assert rate == 8000 and (s == table(codes)).all()


def test_g711_truncated_tail_and_bad_bits():
    from hquery_php_spark.operators.wav import encode_wav_g711

    codes = np.zeros((10, 2), np.uint8)
    w = encode_wav_g711(codes, 8000, "u")
    # chop one byte: the dangling half-frame is dropped
    w2 = w[:-1]
    patched = w2[:4] + struct.pack("<I", len(w2) - 8) + w2[8:]
    body = patched.replace(
        b"data" + struct.pack("<I", 20), b"data" + struct.pack("<I", 19)
    )
    rate, s = decode_wav(body)
    assert s.shape == (9, 2)
    # a G.711 fmt claiming 16 bits is malformed → None
    bad = w.replace(struct.pack("<HH", 1, 8), struct.pack("<HH", 1, 16), 1)
    # (the bits field lives at offset 34; rewrite it directly)
    bad = bytearray(w)
    struct.pack_into("<H", bad, 34, 16)
    assert decode_wav(bytes(bad)) is None


# ------------------------------------------------------------ IMA ADPCM

def test_adpcm_oracle_constants_rederive():
    """The audio_stats twin embeds the ADPCM walk constants as SQL
    literals; re-derive them from the decoder so codec and oracle can
    never drift apart silently."""
    import __spark_entry__ as entry
    from hquery_php_spark.operators.wav import build_adpcm_wav

    w = build_adpcm_wav(entry._ADPCM_NIBBLES, 0 + 3000, 30, 11025)
    rate, s = decode_wav(w)
    p = s[:, 0].astype(np.int64) - 3000
    assert rate == 11025 and s.shape == (entry._ADPCM_N, 1)
    assert int(p.sum()) == entry._ADPCM_S1
    assert int((p * p).sum()) == entry._ADPCM_S2
    assert int(p.max()) == entry._ADPCM_PMAX
    # clamp-free affinity across the generator's whole pred0 range,
    # and strictly positive samples (so sum_abs == sum_val)
    for pred0 in (3000, 4499):
        _, s2 = decode_wav(build_adpcm_wav(entry._ADPCM_NIBBLES, pred0, 30))
        assert (s2[:, 0] == p + pred0).all()
        assert (s2 > 0).all()


def test_adpcm_known_walk():
    """Hand-computed first steps of the IMA algorithm: index 30
    (step 130), nibble 4 adds step>>3 + step = 146… verified against
    the published step/index tables."""
    from hquery_php_spark.operators.wav import build_adpcm_wav

    w = build_adpcm_wav([4, 12] * 4, 1000, 30)
    _, s = decode_wav(w)
    # nibble 4 @idx30 (step 130): diff = 130>>3 + 130 = 146, +, idx 32
    # nibble 12 @idx32 (step 157): diff = 157>>3 + 157 = 176, -, idx 34
    # nibble 4 @idx34 (step 190): diff = 190>>3 + 190 = 213, +, idx 36
    assert s[:4, 0].tolist() == [1000, 1146, 970, 1183]


def test_adpcm_encoder_roundtrip_tracks_signal():
    from hquery_php_spark.operators.wav import encode_wav_adpcm

    t = np.arange(3000)
    x = (7000 * np.sin(t / 25.0)).astype(np.int64)
    x2 = np.stack([x, x // 3 + 100], axis=1)
    w = encode_wav_adpcm(x2, 16000, samples_per_block=249)
    rate, y = decode_wav(w)
    assert rate == 16000 and y.shape == x2.shape
    # IMA tracks a smooth signal within ~2 steps after adaptation
    assert np.abs(y[50:] - x2[50:]).max() < 1200
    assert np.abs(y - x2).mean() < 60


def test_adpcm_clamp_and_index_bounds():
    """Saturating input drives the predictor into the int16 clamp and
    the index to 88 without wrapping."""
    from hquery_php_spark.operators.wav import encode_wav_adpcm

    x = np.tile([32767, -32768], 600)[:, None].astype(np.int64)
    w = encode_wav_adpcm(x, 8000, samples_per_block=505)
    _, y = decode_wav(w)
    assert y.min() >= -32768 and y.max() <= 32767


def test_adpcm_multiblock_and_fact_truncation():
    from hquery_php_spark.operators.wav import encode_wav_adpcm

    x = (np.arange(700, dtype=np.int64) * 11 % 3000)[:, None]
    w = encode_wav_adpcm(x, 8000, samples_per_block=249)
    _, y = decode_wav(w)
    # fact chunk says 700 samples even though 3 blocks hold 747 slots
    assert y.shape == (700, 1)


def test_adpcm_truncated_final_block_survives():
    from hquery_php_spark.operators.wav import build_adpcm_wav

    w = build_adpcm_wav([4, 12] * 16, 500, 20)
    # drop the RIFF pad + last 3 data bytes and fix up chunk sizes
    cut = 5
    body = bytearray(w[: len(w) - cut])
    struct.pack_into("<I", body, 4, len(body) - 8)
    # find the data chunk and shrink its declared size
    off = body.find(b"data")
    (dsz,) = struct.unpack_from("<I", body, off + 4)
    struct.pack_into("<I", body, off + 4, dsz - cut)
    rate, s = decode_wav(bytes(body))
    # whole 4-byte nibble groups only: samples come in 1 + 8k
    assert s.shape[0] >= 1 and (s.shape[0] - 1) % 8 == 0
